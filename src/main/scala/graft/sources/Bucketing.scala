package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the co-located-join tool for fact⋈fact at scale.
  *
  * A 100 TB lineitem⋈orders on orderkey is the one join in this
  * engine's workload that cannot broadcast; bucketing BOTH sides on
  * the join key at write time makes every subsequent join a zero-
  * shuffle zip of co-numbered buckets (plus in-bucket sort). The
  * reference had no storage layout control at all — its fix for big
  * joins was manual salting (SURVEY §2.3 J3/J4), which AQE + layout
  * make unnecessary.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table) // managed — lives in spark.sql.warehouse.dir

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Date-partitioned, sorted parquet layout — the OUTPUT side of a
    * 100 TB pipeline. The repartition on the date clusters each day
    * into one task (WITHOUT it, every upstream task writes its own
    * file into every date directory — the small-files explosion);
    * partition pruning then makes every downstream date-range scan
    * touch only its days; in-file sorting by `sortCol` gives parquet
    * min/max row-group statistics their selectivity (a point lookup
    * reads one row group, not the file); `maxRecordsPerFile` re-splits
    * a hot day instead of minting one unsplittable giant file. */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String,
      sortCol: String, maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(org.apache.spark.sql.functions.col(dateCol))
      .sortWithinPartitions(dateCol, sortCol)
      .write
      .partitionBy(dateCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
