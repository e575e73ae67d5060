package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards — cheap invariants over SparkEntry itself
  * (no Spark session needed). */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle (no rows-only checks remain)") {
    // Since round 4 even the approx sketches (q37/q38) are
    // hash-checked via exact-twin + bounded-verdict outputs; every
    // query MUST have an oracle, and every oracle must point at a
    // real query — a typo'd key would silently weaken the driver's
    // correctness gate.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"orphan oracles (typo'd key?): ${o -- q}")
  }

  test("query names are stable snake_case qNN_ identifiers; short ids unique") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d{2}_[a-z0-9_]+"), s"bad query name: $k")
    }
    // Bench keys its JSON maps by the qNN prefix — a collision would
    // silently drop a query from the result line
    val short = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(short.distinct.size == short.size, "short query ids collide")
  }

  test("bench JSON line fits the harness output-tail capture budget") {
    // The harness keeps only the tail of captured stdout; round 1's
    // full-precision two-map line (~5 KB) was front-truncated and
    // failed its JSON parse. The current format prints ONE line with
    // short-id keys: a 2-decimal steady-seconds map and a K-scaled
    // io [rows, shuffle_write] pair map (read stays on stderr).
    // Reconstruct the worst case — 999.99 s per query, 1 B input
    // rows (kceil → 7 digits), 1 GB shuffle write (kceil → 7 digits;
    // bench-observed maximum is ~9 MB, so >100× headroom) — and keep
    // it under 4 KB, comfortably inside the ~5 KB known-bad point.
    val ids = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val qmap = ids.map(n => s""""$n":999.99""").mkString("{", ",", "}")
    val iomap = ids.map(n => s""""$n":[1000000,1048576]""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"steady_total","value":9999.999,"unit":"sec",""" +
        s""""queries":$qmap,"io":$iomap,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 4000,
      s"bench line ${line.length}B — trim digits or split maps before adding more queries")
  }
}
