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

  // ---- multilingual byte-correctness (the former byte==char gap) ----
  //
  // The q28-q30/q34 oracles are now BYTE-based (hex(encode(text))
  // nibble parsing in DuckDB), so they no longer require ASCII input.
  // These tests prove the Spark side itself is byte-correct on CJK /
  // Cyrillic / accented text by checking media + winnow ops against an
  // INDEPENDENT plain-JVM recompute over getBytes(UTF-8). Every
  // fixture text has octet_length > char length — the byte==char
  // shortcut can't silently pass. (Fixture stays in the basic
  // multilingual plane: Spark's split(s, '') works on UTF-16 units so
  // non-BMP code points would split into surrogate halves — a
  // documented engine-wide tokenization caveat, not a media/winnow
  // one.)

  private val cjkTexts: Map[Long, String] = Map(
    5L -> "自营商品 第三方商品 データ 分析 エンジン 性能 測定",     // video (5 % 3 == 2)
    6L -> "Привет мир это тест кодировки текста",                   // image
    7L -> "Größe straße über café naïve déjà vu Ω ω",               // audio
    8L -> "한국어 텍스트 품질 점수 측정 테스트 구간 경계 확인",     // video
    11L -> ("日本語テキスト 処理 " * 24).trim)                      // video, multi-frame
  private def cjkDocs = {
    val s = spark
    import s.implicits._
    cjkTexts.toSeq.sortBy(_._1)
      .map { case (id, t) => (id, t, "xx", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }
  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString
  private def hexUpper(b: Array[Byte]): String =
    b.map(x => f"$x%02X").mkString

  test("fixture really is multi-byte: every text has more bytes than chars") {
    cjkTexts.values.foreach(t => assert(t.getBytes("UTF-8").length > t.length, t))
  }

  test("media metadata (q28 twin) is byte-true on CJK text") {
    val meta = Multimodal.mediaMetadata(Multimodal.packMedia(cjkDocs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    cjkTexts.foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val r = meta(id)
      assert(r.getAs[Long]("byte_length") == b.length.toLong, s"doc $id")
      assert(r.getAs[String]("checksum") == md5hex(b), s"doc $id")
      assert(r.getAs[Long]("height") == math.ceil(b.length / 16.0).toLong)
    }
  }

  test("frame sampling (q29 twin) slices BYTES (not chars) on CJK text") {
    val frames = Multimodal.frameSample(Multimodal.packMedia(cjkDocs))
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val videoIds = cjkTexts.keySet.filter(_ % 3 == 2)
    assert(frames.keySet == videoIds)
    videoIds.foreach { id =>
      val b = cjkTexts(id).getBytes("UTF-8")
      val expectIdx = 0 until math.ceil(b.length / 64.0).toInt by 4
      val got = frames(id).sortBy(_.getAs[Long]("frame_idx"))
      assert(got.map(_.getAs[Long]("frame_idx")).toSeq == expectIdx.map(_.toLong))
      got.foreach { f =>
        val i = f.getAs[Long]("frame_idx").toInt
        val slice = b.slice(i * 64, math.min((i + 1) * 64, b.length))
        assert(f.getAs[Long]("frame_bytes") == slice.length.toLong)
        // frame checksum convention: md5 over the uppercase hex of the
        // byte slice (the slice may split a UTF-8 code point)
        assert(f.getAs[String]("frame_checksum") ==
          md5hex(hexUpper(slice).getBytes("US-ASCII")), s"doc $id frame $i")
      }
    }
  }

  test("media features (q30 twin) decode UTF-8 BYTES on CJK text") {
    val feats = Multimodal.decodeFeatures(Multimodal.packMedia(cjkDocs))
      .collect().map(f => f.doc_id -> f).toMap
    cjkTexts.foreach { case (id, t) =>
      val codes = t.getBytes("UTF-8").map(_ & 0xff)
      val f = feats(id)
      assert(f.byte_count == codes.length.toLong, s"doc $id")
      assert(f.byte_sum == codes.map(_.toLong).sum, s"doc $id")
      val hist = new Array[Long](Multimodal.HistBins)
      codes.foreach(c => hist(c * Multimodal.HistBins / 256) += 1)
      assert(f.hist.toSeq == hist.toSeq, s"doc $id")
    }
  }

  test("pii prevalence (q103 twin) is regex-true on CJK + null text") {
    // The PII patterns are ASCII character classes scanned over
    // unicode text: a CJK document must contribute exactly the ASCII
    // matches embedded in it (emails, digit runs, space-delimited
    // deny-list words), and null text must count as a zero-hit doc,
    // not poison the aggregate. Documented caveat pinned below: \b's
    // word-char set is UNICODE in Java regex (the engine) but ASCII
    // in RE2 (the oracle), so a deny term ABUTTING a CJK char matches
    // in RE2 only — the engine's (Java) no-match behavior is the
    // pinned semantics, and the oracle gate is safe because the
    // generated corpus never puts a deny term flush against a
    // non-ASCII word char (see TextClean.PiiTermPattern scaladoc).
    val s = spark
    import s.implicits._
    val texts = Map(
      1L -> "联系 方式 alice.w@example.com 电话 12345678 ssn身份证",
      2L -> "パスワード account 番号 9999999 メール bob@test.jp です",
      3L -> "깨끗한 문서 내용 전화 없음 이메일 없음 12345",
      4L -> null.asInstanceOf[String])
    val docs = texts.toSeq.sortBy(_._1)
      .map { case (id, t) => (id, t, "xx", if (id <= 2) "srcA" else "srcB") }
      .toDF("doc_id", "text", "lang", "source")
    // independent recompute with java.util.regex (the engine Spark's
    // regexp_extract_all compiles to) over the SAME pattern strings
    def hits(t: String, p: String): Long =
      if (t == null) 0L
      else { val m = java.util.regex.Pattern.compile(p).matcher(t)
        var n = 0L; while (m.find()) n += 1; n }
    val out = TextClean.piiPrevalence(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("srcA", "srcB"))
    Seq("srcA" -> Seq(1L, 2L), "srcB" -> Seq(3L, 4L)).foreach { case (src, ids) =>
      val ts = ids.map(texts)
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == ids.size.toLong, src)
      assert(r.getAs[Long]("email_hits") ==
        ts.map(hits(_, TextClean.PiiEmailPattern)).sum, src)
      assert(r.getAs[Long]("number_hits") ==
        ts.map(hits(_, TextClean.PiiDigitPattern)).sum, src)
      assert(r.getAs[Long]("term_hits") ==
        ts.map(hits(_, TextClean.PiiTermPattern)).sum, src)
      assert(r.getAs[Long]("pii_hits") ==
        ts.map(hits(_, TextClean.PiiPattern)).sum, src)
      assert(r.getAs[Long]("n_flagged") ==
        ts.count(t => hits(t, TextClean.PiiPattern) > 0L).toLong, src)
    }
    // the \b caveat, pinned: "ssn身份证" does NOT match in Java regex
    // (身 is a Unicode word char, so there is no trailing boundary);
    // RE2 would match (ASCII \b). A space-delimited deny word inside
    // Japanese text matches in both engines (doc 2 "account").
    assert(hits(texts(1L), TextClean.PiiTermPattern) == 0L)
    assert(hits(texts(2L), TextClean.PiiTermPattern) == 1L)
    // srcA: doc1 email+digits+term, doc2 email+digits+term → both flagged
    assert(out("srcA").getAs[Long]("n_flagged") == 2L)
    // srcB: "12345" is under the 7-digit floor and null is zero-hit
    assert(out("srcB").getAs[Long]("n_flagged") == 0L)
    assert(out("srcB").getAs[Long]("flagged_bp") == 0L)
  }

  test("tokenizer fertility + length histogram (q108/q110 twins) on CJK + null text") {
    // BpePattern's third alternative ([^a-z0-9\s]) makes each CJK
    // character its own pre-token — exactly the high-fertility signal
    // the diagnostic exists to surface. Java \s is ASCII, split(' ')
    // is ASCII space: both deterministic on unicode text. length()
    // counts code points.
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "你好 世界abc 123", "zh", "cjk", 0L), // words 3; btoks 你,好,世,界,abc,123 = 6; chars 12
      (2L, null, "zh", "cjk", 0L))               // dropped everywhere
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fert = TextAnalysis.tokenizerFertility(d)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(fert == (("zh", 1L, 3L, 6L, 12L, 20000L, 20000L)))
    val hist = TextAnalysis.lengthHistogram(d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(hist == Seq(("cjk", 1L, 1L, 3L, 10000L))) // ⌊log2 3⌋ = 1
  }

  test("fuzzy decontamination (q101 twin) flags an exact CJK duplicate; clean + null pass") {
    // Shingling runs on the space tokenizer over unicode strings: an
    // eval doc texturally identical to a train doc has an identical
    // shingle SET, hence identical minhash signature, hence matches in
    // every LSH band — flagging is deterministic (no probabilistic
    // miss) and containment is exactly 10000 bp. A disjoint CJK doc
    // and a null-text doc (no shingles → null band hash) never pair.
    val s = spark
    import s.implicits._
    val contaminated = "自营 商品 与 第三方 商品 在 区域 热门 商品 统计 中 的 区分 方式 说明"
    val train = Seq(
      (10L, contaminated),
      (11L, "한국어 텍스트 품질 점수 측정 테스트 구간 경계 확인 데이터 추가 문장"),
      (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bench = Seq((100L, contaminated)).toDF("doc_id", "text")
    val out = Contamination.fuzzyFlagged(train, bench).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_doc_id"),
        r.getAs[Long]("cont_bp"))).toSet
    assert(out == Set((10L, 100L, 10000L)))
  }

  test("winnow fingerprints (q34 twin) hash UTF-8 BYTES on CJK text") {
    // independent recompute: direct per-gram polynomial (not the
    // rolling update the expression uses)
    def expected(t: String, k: Int, w: Int): Seq[Long] = {
      val bs = t.getBytes("UTF-8").map(_ & 0xffL)
      val grams = bs.sliding(k).map(g =>
        g.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)).toArray
      if (grams.length < w) Seq.empty
      else grams.sliding(w).map(_.min).toSeq.distinct.sorted
    }
    val out = TextAnalysis.winnowFingerprints(cjkDocs)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp")).toSeq.sorted }
    cjkTexts.foreach { case (id, t) =>
      assert(out.getOrElse(id, Seq.empty) == expected(t, 5, 4), s"doc $id")
    }
  }

  test("props schema (q138 twin) on CJK keys/values, null values, garbage and null props") {
    val s = spark
    import s.implicits._
    // the producer zoo: well-formed CJK maps, a JSON-null value (key
    // present, value NULL — counted present, excluded from
    // n_values/min/max), a NULL props, unparseable garbage, and the
    // empty map. The last three contribute to total_rows only.
    val ev = Seq(
      """{"颜色":"红色","尺寸":"大"}""",
      """{"颜色":"蓝色"}""",
      null.asInstanceOf[String],
      "not json at all",
      "{}",
      """{"颜色":null}""")
      .toDF("props")
    val out = Profile.propsSchema(ev).collect()
      .map(r => r.getAs[String]("key") -> ((r.getAs[Long]("n_present"),
        r.getAs[Long]("n_values"), r.getAs[String]("min_value"),
        r.getAs[String]("max_value"), r.getAs[Long]("present_bp"))))
      .toMap
    // min/max compare UTF-8 bytes: 红 (E7 BA A2) < 蓝 (E8 93 9D)
    assert(out == Map(
      "颜色" -> ((3L, 2L, "红色", "蓝色", 5000L)),
      "尺寸" -> ((1L, 1L, "大", "大", 1666L))))
  }

  test("round-5 text ops (q123/q125/q126 twins) on CJK + null text") {
    val s = spark
    import s.implicits._
    // boilerplate: two docs share the CJK 2-token window "自营 商品"
    val bp = Seq(
      (1L, "自营 商品 其他 字", "web"),
      (2L, "自营 商品 另外 内容", "web"),
      (3L, null.asInstanceOf[String], "web"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("zh"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(0L))
    val lines = graft.ops.TextClean.boilerplateLines(bp, lineTokens = 2,
      minDocs = 2L, k = 5).collect()
      .map(r => (r.getAs[String]("line"), r.getAs[Long]("n_docs")))
    assert(lines.toSeq == Seq(("自营 商品", 2L)))

    // novelty: identical 9-token CJK docs zero out; a distinct one is novel
    val nine = "一 二 三 四 五 六 七 八 九"
    val nv = Seq((1L, nine), (2L, nine),
      (3L, "甲 乙 丙 丁 戊 己 庚 辛 壬"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("zh"))
      .withColumn("source", org.apache.spark.sql.functions.lit("cjk"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(0L))
    val novelty = graft.ops.Dedup.docNovelty(nv, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Long]("novelty_bp"))).toMap
    assert(novelty == Map(1L -> Some(0L), 2L -> Some(0L),
      3L -> Some(10000L)))

    // surprisal: CJK tokens hash/count like any other string
    val sp = Seq((1L, "你 你 你"), (2L, "好"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("zh"))
      .withColumn("source", org.apache.spark.sql.functions.lit("cjk"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(0L))
    val su = graft.ops.TextAnalysis.surprisal(sp, headK = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("token_count"), r.getAs[Long]("total_log2")))).toMap
    assert(su == Map(1L -> ((3L, 0L)), 2L -> ((1L, 2L))))
  }

  test("engagement gini (q176): empty frame and all-null keys report zeros") {
    val s = spark
    import s.implicits._
    val empty = Profile.engagementInequality(
      emptyEvents.select(col("user_id").as("k")), "k").collect().head
    assert((empty.getAs[Long]("n_keys"), empty.getAs[Long]("n_rows"),
      empty.getAs[Long]("gini_bp"), empty.getAs[Long]("top_decile_bp")) ==
      ((0L, 0L, 0L, 0L)))
    val nulls = Profile.engagementInequality(
      Seq[Option[Long]](None, None).toDF("k"), "k").collect().head
    assert(nulls.getAs[Long]("n_keys") == 0L &&
      nulls.getAs[Long]("n_rows") == 0L)
    // one key owns everything: gini over n=1 is 0, top decile is 100%
    val one = Profile.engagementInequality(
      Seq(5L, 5L, 5L).toDF("k"), "k").collect().head
    assert((one.getAs[Long]("n_keys"), one.getAs[Long]("gini_bp"),
      one.getAs[Long]("top_decile_bp")) == ((1L, 0L, 10000L)))
  }

  test("next-item backtest (q177): empty halves report zero accuracy, not a crash") {
    // all events AFTER the split: empty model, everything cold
    val afterOnly = graft.ops.Market.nextItemBacktest(oneEvent, "2020-01-01")
      .collect().head
    assert(afterOnly.getAs[Long]("n_covered") == 0L &&
      afterOnly.getAs[Long]("acc_bp") == 0L)
    // all events BEFORE the split: nothing to score
    val beforeOnly = graft.ops.Market.nextItemBacktest(oneEvent, "2030-01-01")
      .collect().head
    assert(beforeOnly.getAs[Long]("n_test") == 0L &&
      beforeOnly.getAs[Long]("acc_bp") == 0L)
  }

  test("TPC-H shapes (q179/q180/q181) on empty lineitem: empty or zero-row reports") {
    val s = spark
    import s.implicits._
    val emptyLi = Seq.empty[(Long, Long, Long, Double, Double, Double, Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
    val sup = Seq((1L, "s1")).toDF("s_suppkey", "s_name")
    assert(AreaTopProducts.topSupplier(emptyLi, sup,
      "1996-01-01", "1997-01-01").count() == 0)
    val sq = AreaTopProducts.smallQuantityRevenue(emptyLi).collect().head
    assert((sq.getAs[Long]("n_items"), sq.getAs[Long]("revenue_cents")) ==
      ((0L, 0L)))
    val ord = Seq.empty[(Long, Long, Timestamp, Double)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, "c1")).toDF("c_custkey", "c_name")
    assert(AreaTopProducts.largeOrders(emptyLi, ord, cust, 1L).count() == 0)
  }

  test("dedup threshold curve (q178): empty corpus keeps every threshold row at zero") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val out = Dedup.dedupThresholdCurve(empty, Seq(5000L, 10000L)).collect()
      .map(r => r.getAs[Long]("threshold_bp") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_dropped"),
          r.getAs[Long]("drop_bp")))).toMap
    assert(out == Map(5000L -> ((0L, 0L, 0L)), 10000L -> ((0L, 0L, 0L))))
  }

  test("round-7 operators on empty and degenerate inputs") {
    val s = spark
    import s.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.bfsReach(noEdges, 3).count() == 0)
    val noPairs = Seq.empty[(Long, Long, Long)]
      .toDF("item_a", "item_b", "pair_sessions")
    assert(Graph.componentSizes(noPairs).count() == 0)
    val noVals = Seq.empty[Long].toDF("v")
    assert(Percentiles.equiDepthBins(noVals, "v", 5).count() == 0)
    // single value: rank 1 of 1 → bin (1−1)·nb div 1 + 1 = 1
    val one = Percentiles.equiDepthBins(Seq(7L).toDF("v"), "v", 4).collect()
    assert(one.length == 1 && one.head.getAs[Long]("bin") == 1L)
    val noStrata = Seq.empty[(String, Long)].toDF("stratum", "cents")
    assert(StratifiedExtract.neymanAllocation(noStrata, "stratum", "cents",
      10L).count() == 0)
    // budget 0: every stratum reports 0 draws
    val zeroBudget = StratifiedExtract.neymanAllocation(
      Seq(("A", 1L), ("A", 3L)).toDF("stratum", "cents"),
      "stratum", "cents", 0L).collect()
    assert(zeroBudget.map(_.getAs[Long]("alloc")).toSeq == Seq(0L))
    val noOrders = Seq.empty[(Long, Long, String, Double,
        java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    assert(Retention.seasonalDeviation(noOrders).count() == 0)
    assert(Retention.revenueAcf(noOrders).count() == 0)
    // theil-sen on an empty series: one row, null slope, zero counts
    val ts0 = Retention.theilSenTrend(noOrders).collect().head
    assert(ts0.getAs[Long]("n_days") == 0L && ts0.isNullAt(2))
    val noEvents = emptyEvents
    assert(Retention.growthAccounting(noEvents).count() == 0)
    assert(Retention.robustVolumeAnomaly(noEvents).count() == 0)
    assert(Retention.anomalySessionOverlap(noEvents).count() == 0)
    assert(graft.ops.TrainingPrep.churnFeatures(noEvents, "2024-01-20", 7)
      .count() == 0)
    assert(graft.ops.Market.tripleItemsets(noEvents).count() == 0)
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Profile.sourceDatacard(noDocs).count() == 0)
    val noXY = Seq.empty[(Long, Long)].toDF("xx", "yy")
    assert(Layout.zorderCells(noXY, "xx", "yy").count() == 0)
    val noScores = Seq.empty[(Long, Long)].toDF("score", "label")
    assert(graft.ops.Experiment.gainsTable(noScores, "score", "label", 5)
      .count() == 0)
    assert(Retention.cusumRevenue(noOrders).count() == 0)
    assert(Retention.seasonalBacktest(noOrders).head.getAs[Long]("n_months")
      == 0L)
    val noCents = Seq.empty[Long].toDF("cents")
    val bf = Profile.benfordAudit(noCents, "cents").collect()
    assert(bf.length == 9 && bf.forall(_.getAs[Long]("share_bp") == 0L))
    val noQi = Seq.empty[(String, String)].toDF("qi", "sens")
    assert(Profile.kAnonymityProfile(noQi, Seq("qi"), 5L).count() == 0)
    assert(Profile.lDiversityProfile(noQi, Seq("qi"), "sens", 3L).count() == 0)
    val noLines = Seq.empty[(Double, Double)].toDF("l_discount", "l_quantity")
    val el = AreaTopProducts.discountElasticity(noLines).collect().head
    assert(el.getAs[Long]("n_rows") == 0L && el.isNullAt(1))
    assert(Retention.dowTypeLift(noEvents).count() == 0)
  }

  test("round-7 second-wave ops on empty inputs: empty (never erroring) reports") {
    val s = spark
    import s.implicits._
    val emptyLi = Seq.empty[(Long, Long, Long, Double, Double, Double, Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
    val emptyOrd = Seq.empty[(Long, Timestamp, Double)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val part = Seq((1L, "red widget", "Brand#1", "SMALL", 2, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val sup = Seq((1L, "s1", 0, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((0, "NATION_0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "ASIA")).toDF("r_regionkey", "r_name")
    assert(AreaTopProducts.minCostSupplier(emptyLi, part, sup, nat, reg,
      "ASIA", Seq(2), "SMALL").count() == 0)
    assert(AreaTopProducts.productProfit(emptyLi, emptyOrd, part, sup, nat,
      "red").count() == 0)
    assert(AreaTopProducts.importantParts(emptyLi, sup, nat,
      "NATION_0").count() == 0)
    assert(AreaTopProducts.partSupplierCounts(emptyLi, part, sup,
      "Brand#13", "PROMO", Seq(2)).count() == 0)
    assert(AreaTopProducts.excessSuppliers(emptyLi, sup, nat,
      "NATION_0").count() == 0)
    assert(Layout.pruningAudit(emptyLi, "l_partkey", "l_suppkey")
      .count() == 0) // null bounds → every probe dropped
    assert(Retention.orderBacklog(emptyLi, emptyOrd).count() == 0)
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(Dedup.lshPlanner(emptyDocs).count() == 0)
    assert(Retrieval.docKeywords(emptyDocs).count() == 0)
    assert(Retrieval.vocabGrowth(emptyDocs).count() == 0)
    val emptyPairs = Seq.empty[(Long, Long, Long)]
      .toDF("item_a", "item_b", "pair_sessions")
    assert(Graph.clusteringCoefficient(emptyPairs).count() == 0)
    val noQi2 = Seq.empty[(String, String)].toDF("qi", "sens")
    assert(Profile.tClosenessProfile(noQi2, Seq("qi"), "sens").count() == 0)
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.ops.ProductQuant.distortion(emptyEmb).count() == 0)
    assert(graft.ops.Similarity.ivfProbeCurve(emptyEmb,
      col("vec_id") === 0L).collect()
      .forall(r => r.getAs[Long]("n_truth") == 0L &&
        r.getAs[Long]("recall_bp") == 0L))
    val gsEmpty = Percentiles.groupingSetsTotals(
      Seq.empty[(String, String, Double)]
        .toDF("o_orderpriority", "o_orderstatus", "o_totalprice"),
      "o_orderpriority", "o_orderstatus", "o_totalprice")
    // grand-total row survives (0 rows, null cents) — SQL semantics
    assert(gsEmpty.count() == 1)
  }
}
