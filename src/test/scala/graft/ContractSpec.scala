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

  test("bench JSON line fits the harness output-tail capture budget under ANY digits") {
    // MEASURED budget (BENCH_r04 "tail"): the harness keeps the LAST
    // 2000 chars of stdout, and sbt prints a ~75-char "[success]"
    // line after ours — anything longer is front-truncated →
    // "parsed": null (rounds 1-4 all hit this). The builder enforces
    // it MECHANICALLY: when the per-query map would overflow, it
    // falls back to stderr and the line keeps the aggregate fields.
    val ids = SparkEntry.queries.keys.toSeq
      .map(_.takeWhile(_ != '_').stripPrefix("q"))
    // adversarial digits: the fallback must engage and still fit,
    // WITH a worst-case top-20 map and artifacts_sec on the line
    val worst = ids.map(n => s""""$n":999.99""").mkString("{", ",", "}")
    val worstTop = ids.take(20).map(n => s""""$n":999.99""")
      .mkString("{", ",", "}")
    val (wLine, wOverflow) = Bench.stdoutLine("99999.999", worst,
      "[10000000,104857600]", "/root/testdata/sf0.1", "[999.99,999.99]",
      worstTop, "9999.999")
    assert(wLine.length <= 1850, s"fallback line still too long: ${wLine.length}B")
    assert(wLine.contains("\"value\":99999.999"), wLine)
    assert(wLine.contains("\"load\":[999.99,999.99]"), wLine)
    // r10-verdict item 3/6: the fallback keeps a per-query signal
    // (top-20 slowest) and the amortized artifact-build total visible
    assert(wLine.contains("\"top\":{"), wLine)
    assert(wLine.contains("\"artifacts_sec\":9999.999"), wLine)
    // realistic digits: past ~160 queries even a compact map exceeds
    // the tail budget — the fallback MUST engage (aggregate line stays
    // parseable, full map reaches the driver via the stderr tail)
    val real = ids.map(n => s""""$n":9.99""").mkString("{", ",", "}")
    val (rLine, rOverflow) = Bench.stdoutLine("999.999", real,
      "[10000,100000]", "/root/testdata/sf0.1")
    assert(rLine.length <= 1850, s"${rLine.length}B")
    assert(rOverflow.isDefined || rLine.contains("\"queries\":{"),
      s"map neither inline nor in stderr: $rLine")
    assert(rLine.contains("\"value\":999.999"), rLine)
    // the inline path still works at the size it was designed for
    val sub = ids.take(120).map(n => s""""$n":9.99""").mkString("{", ",", "}")
    val (sLine, sOverflow) = Bench.stdoutLine("999.999", sub,
      "[10000,100000]", "/root/testdata/sf0.1")
    assert(sOverflow.isEmpty && sLine.contains("\"queries\":{"),
      s"120-query map should stay inline: $sLine")
    assert(wOverflow.isDefined || wLine.contains("\"queries\":{"))
  }

  test("bench history roundtrips and a write preserves other sf sections") {
    // the contention-defense cross-run trigger reads what the prior
    // FULL run wrote; a write that dropped the other sf's section
    // would blind the next driver run after any dev run at sf0.01
    val sfA = "test://contract-sf-a"
    val sfB = "test://contract-sf-b"
    Bench.writeHistory(sfA, Seq(("q01_x", 1.234567, 100L, 2048L)))
    Bench.writeHistory(sfB, Seq(("q02_y", 0.5, 7L, 0L)))
    val a = Bench.readHistory(sfA)
    assert(a == Map("q01_x" -> ((1.235, 100L, 2048L))), a.toString)
    assert(Bench.readHistory(sfB) == Map("q02_y" -> ((0.5, 7L, 0L))))
    assert(Bench.readHistory("test://missing").isEmpty)
  }

  test("bench.json mirror artifact is written with the full map") {
    // README "Benchmark artifacts": target/bench.json is the
    // per-query comparison surface now that stdout permanently rides
    // the queries_in_stderr fallback past ~160 queries
    // a scratch path: clobbering the REAL target/bench.json from a
    // test would destroy the driver's artifact if tests run after Bench
    val json = """{"metric":"steady_total","value":1.0,"unit":"sec","queries":{"01":1.00},"io_total":[1,1],"sf":"test"}"""
    val path = "target/bench-contract-test.json"
    Bench.writeMirror(json, path)
    val p = java.nio.file.Paths.get(path)
    assert(java.nio.file.Files.exists(p))
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == json)
  }
}
