package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time of one
  * `SparkEntry.queries` entry (or all, with no args).
  *
  *   sbt "runMain graft.Explain q06_top_sessions_per_category [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) Seq(args(0)) else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      spark.catalog.clearCache() // ops persist() internally; don't accumulate
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
