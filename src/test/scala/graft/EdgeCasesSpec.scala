package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._

/** Degenerate-input robustness: empty frames, single rows, and
  * all-identical values through every major operator. At 100 TB some
  * partition, some day, some stratum is always empty — operators must
  * return empty/identity results, not throw. */
class EdgeCasesSpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("props", StringType), StructField("value", DoubleType)))

  private def emptyEvents = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eventSchema)

  private def oneEvent = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
      1L, new Timestamp(1767225600000L), 7L, "click", """{"k":"3"}""", 1.0))),
    eventSchema)

  test("sessionize chain on empty and single-event input") {
    assert(Sessionize(emptyEvents).count() == 0)
    val one = Sessionize(oneEvent).collect()
    assert(one.length == 1)
    assert(one.head.getAs[Long]("step_length") == 1L)
    assert(one.head.getAs[Long]("visit_length_s") == 0L)
  }

  test("session stats on zero sessions: count 0, ratios defined") {
    val stats = SessionStats(Sessionize(emptyEvents)).collect()
    assert(stats.length == 1)
    assert(stats.head.getAs[Long]("session_count") == 0L)
    // 0/0 ratios must not be NaN-typed longs or throw — null is correct
    assert(stats.head.isNullAt(stats.head.fieldIndex("visit_1s_3s_bp")))
  }

  test("funnel on input with no matching splits") {
    val out = PageFunnel(spark, Sessionize.assignSessions(oneEvent),
      Seq("view", "click", "purchase")).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("convert_rate_bp") == 0L))
  }

  test("topK on empty and on fewer categories than N") {
    assert(TopK.topCategories(emptyEvents).count() == 0)
    assert(TopK.topCategories(oneEvent, n = 10).count() == 1)
    assert(TopK.topSessionsPerCategory(
      Sessionize.assignSessions(oneEvent)).count() == 1)
  }

  test("stratified extract on empty sessions") {
    assert(StratifiedExtract(Sessionize(emptyEvents)).count() == 0)
  }

  test("dedup ops on empty and single-word docs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "word", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(Dedup.exactDedup(empty).count() == 0)
    assert(Dedup.exactDedup(docs).count() == 1)
    // single word → no shingles → null signature → no pairs, doc kept
    assert(Dedup.minhashDedupPairs(docs).count() == 0)
    assert(Dedup.ngramDedupKept(docs).count() == 1)
    assert(Dedup.simhash(docs).count() == 1)
    assert(Dedup.simhashPairs(docs).count() == 0)
  }

  test("similarity ops with no queries and zero vectors") {
    val s = spark
    import s.implicits._
    val emb = Seq((1L, Array(0.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    // zero-norm vector: cos_bp defined as 0, never divides by zero
    val knn = Similarity.knnBruteForce(emb, col("vec_id") === 1, k = 5).collect()
    assert(knn.forall(_.getAs[Long]("cos_bp") == 0L))
    // empty query set → empty result, no crash
    assert(Similarity.knnBruteForce(emb, col("vec_id") === 99).count() == 0)
    assert(Similarity.ivfAnn(emb, col("vec_id") === 99).count() == 0)
  }

  test("multimodal ops on empty-text payloads") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val media = Multimodal.packMedia(docs)
    assert(Multimodal.mediaMetadata(media).head().getAs[Long]("byte_length") == 0L)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.head.byte_count == 0L && feats.head.hist.sum == 0L)
    assert(Multimodal.frameSample(media).count() == 0)
  }

  test("round-3 operators on empty and degenerate inputs") {
    val s = spark
    import s.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val oneDoc = Seq((1L, "word", "en", "s")).toDF("doc_id", "text", "lang", "source")
    // clustering: no pairs → every doc its own singleton cluster
    assert(Clustering.nearDupClusters(emptyDocs).count() == 0)
    val solo = Clustering.nearDupClusters(oneDoc).head()
    assert(solo.getAs[Long]("component") == 1L && solo.getAs[Long]("cluster_size") == 1L)
    // as-of / range join: empty build side → nulls / zeros, not a crash
    assert(AsOfJoin.clickLastPurchase(emptyEvents).count() == 0)
    val asof = AsOfJoin.clickLastPurchase(oneEvent).head() // click, no purchases
    assert(asof.isNullAt(asof.fieldIndex("purchase_event_id")))
    val rj = RangeJoin.purchasesBeforeClicks(oneEvent).head()
    assert(rj.getAs[Long]("n_purchases") == 0L)
    // text cleaning on empty tables
    assert(TextClean.dedupLines(emptyDocs).count() == 0)
    assert(TextClean.piiScrub(emptyDocs).count() == 0)
    assert(TextClean.repetitionMetrics(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabTop(emptyDocs).count() == 0)
    // incremental dedup: empty corpus keeps the whole batch
    assert(Dedup.incrementalDedupKept(oneDoc, emptyDocs).count() == 1)
    assert(Dedup.incrementalDedupKept(emptyDocs, oneDoc).count() == 0)
    // corpus select on empty input: zero groups, no division blowups
    assert(CorpusPipeline.corpusSelect(emptyDocs).count() == 0)
  }

  test("training-prep operators on empty and degenerate inputs") {
    val s = spark
    import s.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val oneDoc = Seq((1L, "word", "en", "s")).toDF("doc_id", "text", "lang", "source")
    // contamination: empty benchmark flags nothing; empty train flags nothing
    assert(Contamination.flagged(oneDoc, emptyDocs, n = 1).count() == 0)
    assert(Contamination.flagged(emptyDocs, oneDoc, n = 1).count() == 0)
    // a bloom built from an EMPTY benchmark passes everything
    val emptyBloom = Contamination.benchBloom(emptyDocs, expectedGrams = 1L)
    assert(Contamination.bloomGate(oneDoc, emptyBloom).count() == 1)
    // packing/chunking/split/mix are total on empty frames
    assert(TrainingPrep.packSequences(emptyDocs).count() == 0)
    assert(TrainingPrep.chunk(emptyDocs).count() == 0)
    assert(TrainingPrep.split(emptyDocs).count() == 0)
    assert(TrainingPrep.epochMix(emptyDocs, Map("s" -> 3)).count() == 0)
    // a single one-token doc: one chunk, one packed row at offset 0
    assert(TrainingPrep.chunk(oneDoc).count() == 1)
    val packed = TrainingPrep.packSequences(oneDoc, shards = 4).head()
    assert(packed.getAs[Long]("start_offset") == 0L &&
      packed.getAs[Long]("seq_id") == 0L)
    // distinctive terms: empty corpus → no rows (no div-by-zero on n_docs)
    assert(TextAnalysis.distinctiveTerms(emptyDocs).count() == 0)
    // PQ on an empty query set: empty result, not a crash
    val emb = graft.tables.Tables(spark, sf, "embeddings")
    assert(ProductQuant.adcTopK(emb, lit(false)).count() == 0)
  }

  test("kmeans tolerates k larger than the corpus and empty clusters") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    // k=8 > n=3: init leaves 5 clusters empty; centroids exist only
    // for non-empty clusters and every vector still gets assigned
    val out = KMeans.fit(emb, k = 8, iters = 2).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L, 3L))
  }

  test("ad analytics on empty stream batch shape") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[String].toDF("value")
    val parsed = graft.ops.AdAnalytics.parseAdLog(empty)
    assert(graft.ops.AdAnalytics.adStats(parsed).count() == 0)
    assert(graft.ops.AdAnalytics.blacklist(parsed).count() == 0)
    assert(graft.ops.AdAnalytics.provinceTopAds(parsed).count() == 0)
  }

  test("AreaTopProducts refuses a >63-key nation domain instead of silently aliasing") {
    val s = spark
    import s.implicits._
    val li = Seq((1L, 10L)).toDF("l_orderkey", "l_partkey")
    val ord = Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, 70)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((70, "FARLAND", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((1, "NOWHERE")).toDF("r_regionkey", "r_name")
    val part = Seq((10L, "widget", 2)).toDF("p_partkey", "p_name", "p_size")
    val e = intercept[Exception] {
      graft.ops.AreaTopProducts(li, ord, cust, nat, reg, part).collect()
    }
    assert(e.getMessage.contains("64-bit mask") ||
      Option(e.getCause).exists(_.getMessage.contains("64-bit mask")), e.getMessage)
  }

  // The q28-q30/q34 oracles equate DuckDB character positions/codes
  // with Spark byte offsets (Winnow hashes UTF-8 bytes, the media
  // oracles use substr/ord). That equivalence holds iff documents.text
  // is pure ASCII — asserted here against the actual testdata instead
  // of only in comments. Non-ASCII corpora need byte-based oracles
  // (encode() + code-point arithmetic) before reusing those queries.
  test("testdata documents.text is pure ASCII (byte==char oracle precondition)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nonAscii = docs.filter(col("text").isNotNull &&
      (octet_length(col("text")) =!= length(col("text")) ||
        col("text").rlike("[^\\x00-\\x7F]")))
    assert(nonAscii.count() == 0,
      "documents.text contains non-ASCII; q28-q30/q34 oracles assume byte==char")
  }
}
