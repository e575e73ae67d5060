package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // collect_set/collect_list aggregates (bounded per-group sets:
      // <=25 nation tokens, <=5 event types, fixed-width minhash sigs)
      // otherwise fall back to sort-based aggregation after only 128
      // distinct groups per task -- a full sort of the fact table.
      // 256k in-memory groups x ~100 B of set payload stays well under
      // executor memory at 32 tasks while keeping the agg hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: exercise the parquet-scan → shuffle-agg → noop-sink path
    // once so the first timed query doesn't pay JVM/codegen/reader init.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // drop caches a previous run pinned (ops own persist() but can't
      // unpersist after returning a lazy frame) so each pass measures
      // the query, not a cache hit, and storage memory doesn't fill
      // with dead entries over 30+ queries
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink materializes EVERY output column (count() would let
      // Catalyst prune the aggregates themselves out of the plan).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // pass 1 = cold (includes per-query codegen); pass 2 = steady state
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, once(name, fn), once(name, fn))
    }
    // 3-decimal times: full-precision doubles once made this line
    // ~5 KB and the harness's captured-output tail truncated its FRONT,
    // breaking the JSON parse (round-1 BENCH has parsed:null). Millis
    // resolution is below run-to-run noise anyway.
    def f(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val steady = results.map { case (k, _, w) => s"\"" + k + "\":" + f(w) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val steadyTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"steady_total":${f(steadyTotal)},"steady_queries":$steady,"sf":"$sfDir"}""")
    spark.stop()
  }
}
