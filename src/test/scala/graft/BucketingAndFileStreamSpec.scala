package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing
import graft.tables.Tables

/** Storage-layout (bucketed co-located join) and file-based streaming
  * source coverage. */
class BucketingAndFileStreamSpec extends SparkSpec {

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val ord = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_bkt", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "li_bkt")
        .join(Bucketing.table(spark, "ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned sorted sink: partition pruning + sorted row groups") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq(
      ("2024-01-01", 3L, "a"), ("2024-01-01", 1L, "b"),
      ("2024-01-02", 2L, "c"), ("2024-01-01", 2L, "d")
    ).toDF("dt", "k", "v")
    Bucketing.writeDatePartitioned(df, out, "dt", "k")
    // layout: one directory per day
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("dt=2024-01-01", "dt=2024-01-02"))
    // a date filter prunes to one partition directory (plan-level)
    val back = spark.read.parquet(out).filter(col("dt") === "2024-01-01")
    assert(back.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "date predicate did not become a partition filter")
    assert(back.count() == 3)
    // rows inside a partition file come back sorted by k
    val ks = spark.read.parquet(s"$out/dt=2024-01-01").select("k").as[Long].collect()
    assert(ks.toSeq == ks.sorted.toSeq, s"not sorted: ${ks.mkString(",")}")
  }

  test("file streaming source: events replayed as a stream through adStats") {
    val s = spark
    // stage a copy of the ad-click lines as a file-based stream input
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ck").toString
    val lines = graft.ops.AdAnalytics.eventsAsAdClicks(
      Tables(s, sf, "events"), Tables(s, sf, "customer"),
      Tables(s, sf, "nation"), Tables(s, sf, "region"))
    lines.write.mode("overwrite").parquet(inDir)

    val streamed = s.readStream
      .schema(lines.schema)
      .parquet(inDir)
    val q = graft.ops.AdAnalytics.adStats(streamed)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(s"file_stats_${System.nanoTime()}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val got = s.table(q.name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)) -> r.getLong(4))
        .toMap
      val want = graft.ops.AdAnalytics.adStats(lines).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)) -> r.getLong(4))
        .toMap
      assert(got == want)
    } finally q.stop()
  }
}
