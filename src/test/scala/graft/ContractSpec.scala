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
      assert(k.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad query name: $k")
    }
    // Bench keys its JSON maps by the qNN prefix — a collision would
    // silently drop a query from the result line
    val short = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(short.distinct.size == short.size, "short query ids collide")
  }

  test("bench JSON line fits the harness output-tail capture budget") {
    // MEASURED budget (BENCH_r04 "tail"): the harness keeps the LAST
    // 2000 chars of stdout, and sbt prints a ~75-char "[success]"
    // line after ours. Anything longer than ~1900 chars is
    // front-truncated → "parsed": null (rounds 1-4 all hit this; the
    // old guard's 4 KB budget was a guess, and wrong). Current format:
    // ONE line with a 2-decimal short-id steady map plus a single
    // aggregate io_total pair; per-query io lives on stderr.
    // Worst case reconstruction: 999.99 s per query, 10 B total input
    // rows, 100 GB total shuffle write (kceil → 8 digits each).
    val ids = SparkEntry.queries.keys.toSeq
      .map(_.takeWhile(_ != '_').stripPrefix("q"))
    val qmap = ids.map(n => s""""$n":999.99""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"steady_total","value":99999.999,"unit":"sec",""" +
        s""""queries":$qmap,"io_total":[10000000,104857600],"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1850,
      s"bench line ${line.length}B vs 2000B captured tail minus sbt epilogue — " +
        "trim digits or move the queries map to stderr before adding more queries")
  }
}
