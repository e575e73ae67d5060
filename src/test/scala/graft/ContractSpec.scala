package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards — cheap invariants over SparkEntry itself
  * (no Spark session needed). */
class ContractSpec extends AnyFunSuite {

  /** Queries deliberately checked rows-only (approx sketches whose
    * internals differ per engine); everything else MUST have an
    * oracle, and every oracle must point at a real query — a typo'd
    * key would silently weaken the driver's correctness gate. */
  private val rowsOnly = Set("q37_approx_distinct", "q38_approx_median")

  test("every query has a DuckDB oracle unless deliberately rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == rowsOnly, s"queries missing oracles: ${q -- o -- rowsOnly}")
    assert((o -- q).isEmpty, s"orphan oracles (typo'd key?): ${o -- q}")
  }

  test("query names are stable snake_case qNN_ identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d{2}_[a-z0-9_]+"), s"bad query name: $k")
    }
  }

  test("bench JSON line fits the harness output-tail capture budget") {
    // The harness keeps only the tail of captured stdout; round 1's
    // full-precision two-map line (~5 KB) was front-truncated and
    // failed its JSON parse, so Bench now prints ONE steady-state map
    // (cold times go to stderr). Reconstruct the worst case of the
    // CURRENT format and keep headroom under a conservative 3.5 KB.
    val names = SparkEntry.queries.keys.toSeq
    val map = names.map(n => s""""$n":999.999""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"steady_total","value":9999.999,"unit":"sec",""" +
        s""""queries":$map,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 3500,
      s"bench line ${line.length}B — trim digits or split maps before adding more queries")
  }
}
