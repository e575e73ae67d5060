package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling scratchpad — not part of the library surface. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime(); val n = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime - s) / 1e9}%8.3f s  rows=$n")
    }
    val docs = graft.tables.Tables(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm
    t("minhash pairs")(graft.ops.Dedup.minhashDedupPairs(docs, 8000L).count())
    t("minhash pairs again")(graft.ops.Dedup.minhashDedupPairs(docs, 8000L).count())
    val pairs = graft.ops.Dedup.minhashDedupPairs(docs, 8000L)
      .select(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
    t("cc only")(graft.ops.Clustering.connectedComponents(pairs).count())
    t("full q42")(graft.ops.Clustering.nearDupClusters(docs).count())
    t("q40 uva")(SparkEntry.queries("q40_user_visit_action")(spark, dir).count())
    t("q69 quality_classifier")(SparkEntry.queries("q69_quality_classifier")(spark, dir).count())
    t("q08 area_top3")(SparkEntry.queries("q08_area_top3_products")(spark, dir).count())
    t("q12 stratified")(SparkEntry.queries("q12_stratified_sample")(spark, dir).count())
    t("q50 incr_dedup")(SparkEntry.queries("q50_incremental_dedup")(spark, dir).count())
    spark.stop()
  }
}
