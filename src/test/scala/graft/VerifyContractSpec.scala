package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verify used to swallow per-query exceptions and write nothing —
  * which is why 16 aborted queries simply VANISHED from
  * CORRECTNESS_r04.json instead of showing up red. The contract now:
  * every attempted query ends up either as a parquet output directory
  * or as a named entry in the returned failure map (main() persists it
  * as _failed.json beside oracle_sql.json). */
class VerifyContractSpec extends SparkSpec {

  test("Verify.run accounts for every query: outputs ∪ failed == attempted") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") }),
      "boom_query" -> ((_, _) => throw new IllegalStateException("synthetic failure")))
    val failed = Verify.run(spark, sf, out, queries)
    val written = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(written == Set("ok_query"))
    assert(failed.keySet == Set("boom_query"))
    assert(failed("boom_query").contains("synthetic failure"))
    assert(written ++ failed.keySet == queries.keySet)
  }

  test("writeJson escapes quotes, backslashes, and control characters") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    val path = s"$out/esc.json"
    val ctl = 1.toChar
    Verify.writeJson(path, Seq("k\"1" -> ("a\tb\nc\\d" + ctl + "e")))
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val expected =
      "{\"k\\\"1\": \"a\\tb\\nc\\\\d" + "\\" + "u0001e\"}"
    assert(txt == expected)
  }
}
