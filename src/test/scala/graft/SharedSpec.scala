package graft

import org.apache.spark.sql.functions._
import graft.ops.Shared

/** The ops.Shared artifact registry's lifecycle contract: build-once
  * memoization, and — the production failure mode — invalidate +
  * rebuild mid-session. localCheckpoint blocks die with their
  * executors (Shared.scala prescribes `checkpoint`/parquet landing on
  * a real cluster); what the library must guarantee is that a session
  * that loses its artifacts and rebuilds them gets IDENTICAL answers,
  * both from the raw artifact and from family queries derived off it.
  */
class SharedSpec extends SparkSpec {
  import spark.implicits._

  test("memo builds once per key; invalidate forces a rebuild with identical values") {
    var builds = 0
    def build() = {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    }
    val key = "sharedspec_probe"
    val first = Shared.memo(spark, key)(build())
    val again = Shared.memo(spark, key)(build())
    assert(builds == 1, "second memo must serve the cached artifact")
    assert(again.collect().map(_.toString).sorted.sameElements(
      first.collect().map(_.toString).sorted))
    Shared.invalidate(spark)
    val rebuilt = Shared.memo(spark, key)(build())
    assert(builds == 2, "invalidate must drop the entry")
    assert(rebuilt.collect().map(_.toString).sorted.sameElements(
      first.collect().map(_.toString).sorted))
    Shared.invalidate(spark) // leave no fixture entries behind
  }

  test("family queries survive invalidate + rebuild with identical answers") {
    // q200 (publishes the Z-order cell artifact) and q42 (aggregates
    // the near-dup cluster artifact): run, kill the session's
    // artifacts, run again — the rebuild path must reproduce the
    // answer bit-for-bit, proving correctness does not depend on
    // WHICH build produced the blocks (the executor-loss recovery
    // guarantee; perf is the artifact's job, correctness is this one)
    // q321/q307 additionally exercise the layered calendar artifacts
    // (day_revenue → day_revenue_dense → stl_remainder): the rebuild
    // must regenerate the whole chain, not serve a half-dead layer
    val names = Seq("q200_zorder_cells", "q42_neardup_clusters",
      "q321_deseasonalized_cusum", "q307_runs_test")
    def run(n: String): Seq[String] =
      SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    val before = names.map(n => n -> run(n)).toMap
    Shared.invalidate(spark)
    names.foreach { n =>
      assert(run(n) == before(n), s"$n changed across an artifact rebuild")
    }
    Shared.invalidate(spark)
  }
}
