package graft

import org.apache.spark.sql.functions._
import graft.ops._
import graft.tables.Tables

/** Edge cases the DuckDB oracle can't exercise: short/degenerate docs,
  * planted duplicates, and invariants of the dedup/similarity family. */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("shingles: short docs yield empty sets, no crash") {
    val df = Dedup.withShingles(docs(1L -> "a b", 2L -> "one", 3L -> "a b c d"))
    val got = df.select(col("doc_id"), size(col("shingles")))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 2))
  }

  test("exactDedup groups identical texts under the min doc_id") {
    val out = Dedup.exactDedup(docs(5L -> "x y z", 9L -> "x y z", 7L -> "other"))
      .select(col("canonical_doc_id"), col("dup_count")).as[(Long, Long)]
      .collect().toSet
    assert(out == Set((5L, 2L), (7L, 1L)))
  }

  test("canonicalBySource: highest-priority source wins, not lowest doc_id") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "same text", "crawl"),    // lowest id but lowest priority
      (8L, "same text", "curated"),  // priority 3 → canonical despite id 8
      (5L, "same text", "licensed"), // priority 2
      (3L, "unique", "crawl"),
      (4L, null.asInstanceOf[String], "crawl")) // null text dropped
      .toDF("doc_id", "text", "source")
    val out = Dedup.canonicalBySource(d,
        Map("curated" -> 3L, "licensed" -> 2L), defaultPriority = 1L)
      .select("canonical_doc_id", "canonical_priority", "dup_count")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((8L, 3L, 3L), (3L, 1L, 1L)))
    // equal priority falls back to min doc_id (exactDedup semantics)
    val tie = Dedup.canonicalBySource(
        d.filter(col("source") === "crawl"), Map.empty)
      .select("canonical_doc_id").as[Long].collect().toSet
    assert(tie == Set(1L, 3L))
  }

  test("minhash LSH finds an exact duplicate pair (jaccard 10000)") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val out = Dedup.minhashDedupPairs(
      docs(1L -> t, 2L -> t, 3L -> "completely different words here entirely now"))
      .select(col("doc_a"), col("doc_b"), col("jaccard_bp"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 10000L)))
  }

  test("simhash is identical for identical texts, differs across texts") {
    val out = Dedup.simhash(docs(
      1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "epsilon zeta eta theta iota kappa"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("bpeTokenStats splits letter runs, digit runs, and punctuation") {
    val out = graft.ops.TextAnalysis.bpeTokenStats(
      Seq((1L, "abc12 de-f, x7", "en")).toDF("doc_id", "text", "lang"))
      .head()
    // tokens: abc,12,de,-,f,",",x,7 → 8 total, all distinct, 12 chars
    assert(out.getAs[Long]("bpe_token_count") == 8L)
    assert(out.getAs[Long]("bpe_distinct_count") == 8L)
    assert(out.getAs[Long]("bpe_token_chars") == 12L)
  }

  test("simhashPairs reports hamming 0 for duplicates") {
    val out = Dedup.simhashPairs(docs(
      1L -> "alpha beta gamma delta epsilon", 2L -> "alpha beta gamma delta epsilon"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 0L)))
  }

  test("knnBruteForce: identical vector ranks first with cos_bp 10000") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f), 0),
      (1L, Array(1.0f, 0.0f, 0.5f), 0),   // identical to query
      (2L, Array(-1.0f, 0.2f, 0.0f), 0),  // opposite-ish
      (3L, Array(0.9f, 0.1f, 0.4f), 0)    // close
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnBruteForce(emb, col("vec_id") === 0, k = 3)
      .orderBy(col("rank"))
      .select(col("neighbor_id"), col("cos_bp")).as[(Long, Long)].collect()
    assert(got.head == ((1L, 10000L)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L))
    // ranks are strictly ordered by cos_bp desc
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
  }

  test("ivfAnn probes the nearest label list and ranks exactly within it") {
    val emb = Seq(
      // list 0 clusters near +x; list 1 near -x
      (0L, Array(1.0f, 0.1f), 0), (1L, Array(0.9f, 0.2f), 0),
      (2L, Array(0.8f, 0.0f), 0),
      (10L, Array(-1.0f, 0.1f), 1), (11L, Array(-0.9f, 0.0f), 1),
      // query: +x direction, stored in list 1 — probing must still pick list 0
      (50L, Array(0.95f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfAnn(emb, col("vec_id") === 50, k = 2)
      .orderBy(col("rank"))
      .select(col("label"), col("neighbor_id")).as[(Int, Long)].collect()
    assert(got.map(_._1).forall(_ == 0), s"probed wrong list: ${got.toSeq}")
    assert(got.map(_._2).toSet.subsetOf(Set(0L, 1L, 2L)))
    assert(got.length == 2)
  }

  test("ivfAnn nProbe: recall grows monotonically; probing all lists == brute force") {
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 100 === 0
    def hits(nProbe: Int): Set[(Long, Long)] =
      Similarity.ivfAnn(emb, pred, k = 3, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val exact = Similarity.knnBruteForce(emb, pred, k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val h1 = hits(1); val h3 = hits(3); val hAll = hits(10) // 10 labels in testdata
    // recall vs brute force is monotone in nProbe...
    assert((h1 intersect exact).size <= (h3 intersect exact).size)
    assert((h3 intersect exact).size <= (hAll intersect exact).size)
    // ...and probing EVERY list scores the whole corpus = exact search
    assert(hAll == exact, s"nProbe=all diverged from brute force")
  }

  test("sign-bucket LSH co-buckets sign-identical vectors") {
    val emb = Seq(
      (0L, Array.fill(8)(0.3f), 0),
      (1L, Array.fill(8)(0.9f), 0),          // same signs → same bucket
      (2L, Array.fill(8)(-0.4f), 0)          // different bucket
    ).toDF("vec_id", "embedding", "label")
    val b = Similarity.withSignBucket(emb)
      .select(col("vec_id"), col("bucket")).as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L) && b(0L) != b(2L))
  }

  test("textQuality flags degenerate short-token docs") {
    val out = TextAnalysis.textQuality(
      docs(1L -> Seq.fill(30)("meaningful words expand the corpus").mkString(" "),
           2L -> Seq.fill(30)("a b c d").mkString(" ")))
      .select(col("doc_id"), col("quality_ok")).as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 0))
  }

  test("langId picks dictionary-matching language with asc tie-break") {
    val out = TextAnalysis.langId(docs(
      1L -> "the cat of the house is big and the dog is small",
      2L -> "el perro y la casa es de la familia y es grande"))
      .select(col("doc_id"), col("predicted_lang")).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
  }

  test("heavyHitters equals the exact vocabTop ranking; counts are exact") {
    val d = Tables(spark, sf, "documents")
    val exact = TextAnalysis.vocabTop(d, k = 10)
      .select("token", "term_freq").as[(String, Long)].collect().toSeq
    val hh = TextAnalysis.heavyHitters(d, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(hh == exact)
  }

  test("heavyHitters honors the Misra-Gries bound under heavy eviction") {
    // n=120, m=2: the summary guarantees only tokens with freq >
    // n/(m+1) = 40. 'hot' (50) must survive with an EXACT recount;
    // 'warm' (30) is below the bar and the 40 singletons evict it.
    val d = docs(
      1L -> (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
        (1 to 40).map(i => s"cold$i")).mkString(" "))
    val hh = TextAnalysis.heavyHitters(d, k = 2, m = 2)
      .as[(String, Long)].collect().toMap
    assert(hh.get("hot").contains(50L))
    assert(hh.values.forall(_ > 0L))
  }

  test("vocabTop ranks by term_freq with token tie-break; doc_freq is distinct") {
    val out = TextAnalysis.vocabTop(docs(
      1L -> "b a a c c",
      2L -> "a b"), k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // a: tf 3 df 2; b: tf 2 df 2; c: tf 2 df 1 (b before c on the tie)
    assert(out == Seq(("a", 3L, 2L), ("b", 2L, 2L), ("c", 2L, 1L)))
  }

  test("kmeans: every vector assigned once; Lloyd objective is monotone in iters") {
    val emb = Tables(spark, sf, "embeddings")
    def totalDist(iters: Int): Long =
      KMeans.fit(emb, k = 4, iters = iters)
        .agg(sum(col("dist"))).as[Long].head()
    val out = KMeans.fit(emb, k = 4, iters = 2)
    assert(out.count() == emb.count())
    assert(out.select("vec_id").distinct().count() == emb.count())
    assert(out.select("cluster").distinct().count() <= 4L)
    assert(out.filter(col("dist") < 0).isEmpty) // ||a-c||² is non-negative
    // each Lloyd round can only improve the (integer-floored) objective;
    // allow equality (converged), require no regression
    assert(totalDist(2) <= totalDist(1))
  }

  test("semDedupKept drops the larger id of a same-cluster near-identical pair") {
    val emb = Seq(
      (1L, Array.fill(8)(0.5f), 0),
      (2L, Array.fill(8)(0.5f), 0),                       // identical to 1 -> drop
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 0.7f else -0.7f), 0)
    ).toDF("vec_id", "embedding", "label")
    val kept = KMeans.semDedupKept(emb, k = 2, iters = 1, thresholdBp = 9000L)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("incrementalDedupKept: exact replays and near-dups drop, novel docs pass") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(2L -> base, 4L -> "a short corpus doc here now")
    val batch = Seq(
      (1L, base, "en", "s", 0L),                       // exact replay -> drop
      (3L, base.replace("w30", "zz"), "en", "s", 0L),  // near-dup -> drop
      (5L, (1 to 35).map(i => s"only$i").mkString(" "), "en", "s", 0L), // novel
      (7L, null.asInstanceOf[String], "en", "s", 0L)   // null text -> kept
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.incrementalDedupKept(batch, corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(5L, 7L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val s = spark
    import s.implicits._
    def snap(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "text", "source")
    val old = snap(
      (1L, "keep me", "web"), (2L, "edit me", "web"),
      (3L, "drop me", "book"), (5L, null, "web"))
    val nw = snap(
      (1L, "keep me", "web"),          // unchanged
      (2L, "edit me v2", "web"),       // changed
      (4L, "brand new", "book"),       // added
      (5L, null, "web"))               // null in BOTH → unchanged
    val out = graft.ops.CorpusPipeline.snapshotDiff(old, nw)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == Map(
      "web" -> ((0L, 0L, 1L, 2L)),
      "book" -> ((1L, 1L, 0L, 0L))))
  }

  test("corpusSelect with gates wide open reduces to the dedup-kept set") {
    val d = Tables(spark, sf, "documents")
    val open = CorpusPipeline.corpusSelect(d,
      minTokens = 0L, maxShortBp = 10000L, maxPiiHits = Long.MaxValue)
      .agg(sum(col("n_docs"))).as[Long].head()
    val keptNonNull = Dedup.ngramDedupKept(d).join(
      d.filter(col("text").isNotNull).select("doc_id"), "doc_id").count()
    assert(open == keptNonNull)
  }

  test("corpusSelect gates are monotone: tighter thresholds keep fewer docs") {
    val d = Tables(spark, sf, "documents")
    def total(minTok: Long, pii: Long): Long =
      CorpusPipeline.corpusSelect(d, minTokens = minTok, maxPiiHits = pii)
        .agg(coalesce(sum(col("n_docs")), lit(0L))).as[Long].head()
    assert(total(20L, 2L) <= total(20L, 100L))
    assert(total(50L, 2L) <= total(20L, 2L))
  }

  test("quantizeInt8: codes are floor(x*127/maxabs); zero vectors code to zeros") {
    val emb = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0),
      (2L, null.asInstanceOf[Array[Float]], 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.quantizeInt8(emb)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    // vec 0: scale=1.0 ⇒ codes floor(63.5)=63, -127, floor(31.75)=31
    assert(out.filter(_._1 == 0L).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((1000000L, 0L, 63L), (1000000L, 1L, -127L), (1000000L, 2L, 31L)))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(0L, 0L, 0L))
    assert(!out.exists(_._1 == 2L)) // null embedding contributes nothing
    // every code is a valid int8 value
    assert(out.forall(r => r._4 >= -128L && r._4 <= 127L))
  }

  test("PQ: copies of a seed vector are its query-copy's ADC neighbors at distance 0") {
    import ProductQuant._
    // ADC distance is query-exact vs candidate-QUANTIZED, so it hits 0
    // exactly when the candidate encodes losslessly — i.e. is a seed
    // (or a copy of one). vec 40 copies seed 3; query 100 is a third copy.
    val rnd = new scala.util.Random(7)
    val base = (0L until 16L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), 0))
    val emb = (base :+ (40L, base(3)._2.clone(), 0) :+ (100L, base(3)._2.clone(), 0))
      .toDF("vec_id", "embedding", "label")
    val out = adcTopK(emb, col("vec_id") === 100, m = 4, k = 16, topK = 3)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    // both zero-distance copies lead, id-asc tie-broken
    assert(out.take(2).map(r => (r._2, r._3)).toSeq == Seq((3L, 0L), (40L, 0L)))
    assert(out(2)._3 > 0L)
  }

  test("PQ: Lloyd-refined codebook does not increase total quantization distortion") {
    import ProductQuant._
    val emb = Tables(spark, sf, "embeddings")
    def distortion(book: org.apache.spark.sql.DataFrame): Long =
      subvectors(emb, 8).join(broadcast(book), Seq("sub"))
        .withColumn("dist", col("n2s") + col("c_n2") -
          lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
        .groupBy(col("vec_id"), col("sub")).agg(min(col("dist")).as("d"))
        .agg(sum(col("d"))).as[Long].head()
    val seed = distortion(seedCodebook(emb, 8, 16))
    val trained = distortion(trainedCodebook(emb, 8, 16, iters = 1))
    assert(trained <= seed, s"refinement worsened distortion: $seed -> $trained")
  }

  test("PQ: trained-book ADC survives a SPARSE codebook (dead seed code)") {
    val s = spark
    import s.implicits._
    // vec 0 and vec 1 identical → seed code 1 ties code 0 on every
    // assignment, the code-asc tie-break starves it, and
    // refineCodebook drops it — the LUT must key partial distances by
    // code VALUE (a positional lookup would misalign every surviving
    // code above the gap and null out the top one)
    val base = (1 to 8).map(_.toFloat)
    val emb = Seq(
      0L -> base, 1L -> base,
      2L -> base.map(_ + 1f), 3L -> base.map(_ * 2f),
      4L -> base.map(_ + 3f), 5L -> base.map(9f - _))
      .map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
    val book = ProductQuant.trainedCodebook(emb, m = 2, k = 4, iters = 1)
    assert(book.count() < 2 * 4, "fixture failed to produce a sparse book")
    val out = ProductQuant.adcTopK(emb, col("vec_id") === 0L, m = 2, k = 4,
      topK = 5, book0 = Some(book)).collect()
    assert(out.length == 5)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("adc_dist"))),
      "null adc_dist — LUT lookup misaligned with sparse codes")
    // the identical twin shares vec 0's codes exactly → nearest
    assert(out.minBy(_.getAs[Long]("adc_dist")).getAs[Long]("neighbor_id") == 1L)
  }

  test("PQ: a vector dim not divisible by m RAISES instead of silently truncating") {
    val s = spark
    import s.implicits._
    // dim 10, m 3: the old slice arithmetic would drop the last
    // component of every vector and quietly skew all distances
    val ragged = Seq((1L, (1 to 10).map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      ProductQuant.subvectors(ragged, m = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("not divisible")), ex.toString)
  }

  test("PQ: ADC top-10 recalls most of the exact integer-L2 top-10") {
    import ProductQuant._
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 50 === 0
    val exact = Similarity.quantized(emb).select(col("vec_id"), col("q"), col("n2"))
    val qs = exact.filter(pred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d").asc, col("vec_id").asc)
    val exactTop = exact.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d", col("n2") + col("qn2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("q"), col("qq")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    def recall(book: Option[org.apache.spark.sql.DataFrame]): Double = {
      val pq = adcTopK(emb, pred, m = 8, k = 16, topK = 10, book0 = book)
        .select(col("query_id"), col("neighbor_id"))
      pq.intersect(exactTop).count().toDouble / (qs.count() * 10)
    }
    val seedR = recall(None)
    val trainedR = recall(Some(trainedCodebook(emb, 8, 16, iters = 2)))
    info(f"recall@10 seed=$seedR%.2f trained=$trainedR%.2f")
    // coarse 16-entry codebooks — pin floors, not perfection
    assert(seedR >= 0.15, s"seed-codebook recall $seedR")
    assert(trainedR >= 0.25, s"trained-codebook recall $trainedR")
  }

  test("rerank: exact re-rank of the ADC shortlist beats (or ties) raw ADC recall; subset + order invariants") {
    import ProductQuant._
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 50 === 0
    // cosine ground truth (the q25 convention the re-rank scores with)
    val exact = Similarity.quantized(emb)
    val qs = exact.filter(pred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("c").desc, col("vec_id").asc)
    val truth = exact.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("c", Similarity.cosBp(
        graft.expressions.DotProductLong.dot(col("q"), col("qq")),
        col("n2"), col("qn2")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val nQ = qs.count().toDouble
    val reranked = rerankTopK(emb, pred, shortlist = 30)
    val rerankRecall = reranked.select("query_id", "neighbor_id")
      .intersect(truth).count() / (nQ * 10)
    // raw ADC ranked by compressed distance, same cosine truth
    val adcRecall = adcTopK(emb, pred, topK = 10)
      .select("query_id", "neighbor_id").intersect(truth).count() / (nQ * 10)
    info(f"cosine recall@10 adc=$adcRecall%.2f reranked=$rerankRecall%.2f")
    assert(rerankRecall >= adcRecall,
      s"re-ranking lost recall: $rerankRecall < $adcRecall")
    // every re-ranked hit came from the stage-1 shortlist, and the
    // final order is exactly cosine-desc (ties by id) within a query
    val sl = adcTopK(emb, pred, topK = 30).select("query_id", "neighbor_id")
    assert(reranked.select("query_id", "neighbor_id").exceptAll(sl).isEmpty)
    val rows = reranked.collect()
      .groupBy(_.getAs[Long]("query_id")).values
    rows.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      val resorted = g.sortBy(r =>
        (-r.getAs[Long]("cos_bp"), r.getAs[Long]("neighbor_id")))
      assert(byRank.toSeq == resorted.toSeq)
    }
  }

  test("ivfPq: probing every list degenerates to plain ADC top-k") {
    import ProductQuant._
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 50 === 0
    val viaIvf = ivfPqTopK(emb, pred, nProbe = 1000)
      .select("query_id", "neighbor_id", "adc_dist", "rank")
    val plain = adcTopK(emb, pred)
    assert(viaIvf.exceptAll(plain).isEmpty && plain.exceptAll(viaIvf).isEmpty)
    assert(plain.count() > 0)
  }

  test("distinctiveTerms df-gates ubiquitous tokens and ranks by tf with tie-break") {
    // 10 en docs: "common" in all 10 (df 10000 bp — gated out);
    // "rare" appears 3× in one doc (df 1000 bp — kept, tf 3);
    // "raro" ties tf with "rara" — token asc breaks the tie.
    val rows = (1L to 10L).map { i =>
      val extra = if (i == 1) " rare rare rare raro raro rara rara" else ""
      (i, s"common filler$i$extra", "en", "src0", 0L)
    }
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.distinctiveTerms(d, k = 3, maxDfBp = 1000L)
      .select("token", "term_freq", "rank").as[(String, Long, Long)]
      .collect().sortBy(_._3)
    assert(out.toSeq == Seq(("rare", 3L, 1L), ("rara", 2L, 2L), ("raro", 2L, 3L)))
  }

  test("oovRate scores docs against the frequency-ranked vocab head; null text excluded") {
    // tf: a=2, b=2, c=1; (tf desc, token asc) head at V=1 is {a}
    val d = Seq(
      (1L, "a a b", "en", "src0", 5L),
      (2L, "b c", "en", "src0", 3L),
      (3L, null, "en", "src0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.oovRate(d, vocabSize = 1)
      .select("doc_id", "token_count", "oov_count", "oov_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 1L, 3333L), (2L, 2L, 2L, 10000L)))
  }

  test("cooccurrence scores bigram pairs by fixed-point PMI rank; support floor prunes") {
    // bigrams: (x,y)=3 [doc1 twice, doc2 once], (y,x)=1, (y,z)=1 → N=5
    // uni: x=3, y=3, z=1; only (x,y) survives minCount=2:
    // floor(10000·3·5 / (3·3)) = 16666
    val d = docs(1L -> "x y x y", 2L -> "x y z")
    val out = TextAnalysis.cooccurrence(d, minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("x", "y", 3L, 3L, 3L, 16666L)))
    // single-token docs produce no pairs (the zip_with slice edge)
    assert(TextAnalysis.cooccurrence(docs(1L -> "solo"), 1L, 10).isEmpty)
  }

  test("labelOutliers ranks by exact distance to the floor-mean centroid; nulls excluded") {
    // label 0 centroid is (0,0); vecs 1 and 3 tie at 1e12, vec_id breaks
    val emb = Seq(
      (1L, Some(Array(1.0f, 0f)), Some(0)),
      (2L, Some(Array(0f, 0f)), Some(0)),
      (3L, Some(Array(-1.0f, 0f)), Some(0)),
      (4L, None: Option[Array[Float]], Some(0)),
      (5L, Some(Array(1f, 1f)), None: Option[Int])
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(emb, k = 2)
      .select("label", "vec_id", "dist", "rank")
      .as[(Int, Long, Long, Int)].collect().toSeq.sortBy(_._4)
    assert(out == Seq((0, 1L, 1000000000000L, 1), (0, 3L, 1000000000000L, 2)))
    // null-ELEMENT vectors are excluded too (Spark would NULL the
    // dist, the oracle's SUM would skip the dim — neither answer)
    val withNullElem = emb.unionByName(spark.sql(
      """SELECT 8L AS vec_id,
        |       array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding,
        |       0 AS label""".stripMargin))
    val all = Similarity.labelOutliers(withNullElem, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("labelOutliers centroid components floor toward -inf on negative sums") {
    // sum = -500000 over n=2 → c = floor(-250000.0) = -250000;
    // both vectors sit 750000 from it → equal dists, id tie-break
    val emb = Seq(
      (6L, Some(Array(0.5f)), Some(1)),
      (7L, Some(Array(-1.0f)), Some(1))
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(emb, k = 2)
      .select("vec_id", "dist", "rank").as[(Long, Long, Int)]
      .collect().toSeq.sortBy(_._3)
    assert(out == Seq((6L, 562500000000L, 1), (7L, 562500000000L, 2)))
  }

  // ---- containment pairs ----

  /** Independent shingle-containment recompute (3-word shingles,
    * the Dedup.withShingles definition). */
  private def contRef(a: String, b: String): (Long, Long, Long, Long, Long) = {
    def sh(t: String): Set[String] = {
      val w = t.split(' ')
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set.empty
    }
    val (sa, sb) = (sh(a), sh(b))
    val inter = (sa & sb).size.toLong
    def bp(n: Long, d: Long) = if (d == 0L) 0L else math.floor(10000.0 * n / d).toLong
    (inter, sa.size.toLong, sb.size.toLong, bp(inter, sa.size), bp(inter, sb.size))
  }

  test("containmentPairs: duplicates score 10000 both ways; values match brute force") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = t1 + " iota" // strict shingle superset of t1
    val texts = Map(5L -> t1, 30L -> t1, 20L -> t2)
    val d = texts.toSeq.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.containmentPairs(d, thresholdBp = 8000L)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b",
        "cont_ab_bp", "cont_ba_bp")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // the duplicate pair always surfaces via the intra path
    assert(got.exists(r => r._1 == 5L && r._2 == 30L && r._6 == 10000L && r._7 == 10000L))
    // every reported row matches the direct pairwise computation —
    // including (20,30), whose member order INVERTS the rep order
    // (rep pair is 5<20; member 30>20), exercising the column swap
    got.foreach { case (a, b, inter, sa, sb, cab, cba) =>
      assert(a < b)
      val (ri, rsa, rsb, rcab, rcba) = contRef(texts(a), texts(b))
      assert((inter, sa, sb, cab, cba) == ((ri, rsa, rsb, rcab, rcba)),
        s"pair ($a,$b)")
    }
    // the superset pair must co-band here (t1's shingles ⊆ t2's, so
    // every minhash and band collides) and be reported both ways
    assert(got.map(r => (r._1, r._2)).toSet == Set((5L, 20L), (5L, 30L), (20L, 30L)))
  }

  test("containmentPairs finds high-containment pairs below the Jaccard bar") {
    // A ⊂ B with |A|=3 shingles, |B|=13: jaccard = 3/13 ≈ 2307 bp
    // (q22 at 8000 would drop it) but cont(A→B) = 10000.
    // A's shingle minhashes dominate B's only if equal sets... here A's
    // shingles ⊆ B's AND B's extra shingles never beat A's minima is
    // NOT guaranteed — so assert only IF a pair is returned its values
    // are right, and that the duplicate anchor pair IS returned.
    val a = "one two three four five"
    val b = a + " six seven eight nine ten eleven twelve thirteen fourteen fifteen"
    val d = Seq((1L, a, "en", "s", 0L), (2L, b, "en", "s", 0L),
      (3L, a, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.containmentPairs(d, thresholdBp = 9000L)
      .select("doc_a", "doc_b", "cont_ab_bp", "cont_ba_bp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.exists(r => r._1 == 1L && r._2 == 3L))
    got.filter(r => Set((1L, 2L), (2L, 3L)).contains((r._1, r._2))).foreach { r =>
      // the contained side is the smaller text whichever slot it lands in
      assert(r._3 == 10000L || r._4 == 10000L)
    }
  }

  // ---- cross-source overlap matrix ----

  test("sourceOverlap counts distinct shared grams with containment bp") {
    // n=3: srcA doc has grams {a b c, b c d}; srcB shares exactly
    // {a b c} (twice, in two docs — still ONE distinct gram);
    // srcC shares nothing long enough.
    val d = Seq(
      (1L, "a b c d", "en", "srcA", 0L),
      (2L, "a b c", "en", "srcB", 0L),
      (3L, "x a b c", "en", "srcB", 0L),
      (4L, "p q", "en", "srcC", 0L),
      (5L, null.asInstanceOf[String], "en", "srcA", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.sourceOverlap(d, n = 3)
      .select("source_a", "source_b", "shared_grams", "grams_a", "grams_b",
        "overlap_ab_bp", "overlap_ba_bp")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // srcA grams: {abc, bcd} (2); srcB grams: {abc, xab} (2)
    assert(got == Seq(("srcA", "srcB", 1L, 2L, 2L, 5000L, 5000L)))
  }

  test("sourceDiversity: hand-computed TTR/hapax/bigram panel per source") {
    val d = Seq(
      (1L, "a b a", "en", "srcA", 0L),
      (2L, "c", "en", "srcA", 0L),
      (3L, "z", "en", "srcB", 0L),
      (4L, null.asInstanceOf[String], "en", "srcB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.sourceDiversity(d)
      .select("source", "tokens", "types", "hapax", "bigrams", "bigram_types",
        "ttr_bp", "hapax_bp", "bigram_ttr_bp")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    // srcA: tokens {a,b,a,c} → 4 tokens, 3 types, hapax {b,c}=2;
    //   bigrams {a b, b a} → 2/2 distinct. srcB: one 1-token doc.
    assert(got == Set(
      ("srcA", 4L, 3L, 2L, 2L, 2L, 7500L, 6666L, 10000L),
      ("srcB", 1L, 1L, 1L, 0L, 0L, 10000L, 10000L, 0L)))
  }

  test("sourceOverlap: identical corpora in two sources → 10000 bp both ways") {
    val d = Seq(
      (1L, "t1 t2 t3 t4", "en", "a", 0L),
      (2L, "t1 t2 t3 t4", "en", "b", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.sourceOverlap(d, n = 4)
      .select("shared_grams", "overlap_ab_bp", "overlap_ba_bp")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10000L, 10000L)))
  }

  test("annRecall matches a naive recomputation from the two rankings") {
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 100 === 0
    val truth = Similarity.knnBruteForce(emb, pred, k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).map { case (q, xs) =>
        q -> xs.map(_._2).toSet }
    val ann = Similarity.annLsh(emb, pred, k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).map { case (q, xs) =>
        q -> xs.map(_._2).toSet }
    val got = Similarity.annRecall(emb, pred, k = 3)
      .select("query_id", "n_truth", "n_ann", "n_hits", "recall_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == truth.keySet) // every query reported
    got.foreach { case (q, nTruth, nAnn, nHits, bp) =>
      val t = truth(q); val a = ann.getOrElse(q, Set.empty[Long])
      assert(nTruth == t.size && nAnn == a.size && nHits == (t & a).size,
        s"query $q accounting")
      assert(bp == math.floor(10000.0 * (t & a).size / t.size).toLong)
    }
    // on this fixture the LSH index must find at least SOMETHING
    assert(got.map(_._4).sum > 0L)
  }

  test("rrfFusion matches a JVM refold of the two rankings; fused top-k by integer ppm") {
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 100 === 0
    val k = 3
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
      df.select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long"))
        .as[(Long, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (q, xs) =>
          q -> xs.map(t => (t._2, t._3)).sortBy(_._2) }
    val lsh = ranks(Similarity.annLsh(emb, pred, k))
    val ivf = ranks(Similarity.ivfAnn(emb, pred, k))
    val truth = Similarity.knnBruteForce(emb, pred, k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    def fusedOf(q: Long): Set[Long] = {
      val lm = lsh.getOrElse(q, Nil).toMap
      val im = ivf.getOrElse(q, Nil).toMap
      (lm.keySet ++ im.keySet).toSeq
        .map { id =>
          val ppm = lm.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L) +
            im.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L)
          (id, ppm)
        }
        .sortBy { case (id, ppm) => (-ppm, id) }.take(k).map(_._1).toSet
    }
    val got = Queries.rrfFusion(spark, sf).collect().map { r =>
      ((r.getAs[Long]("query_id"), r.getAs[String]("method")),
        (r.getAs[Long]("n_returned"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_truth"), r.getAs[Long]("recall_bp")))
    }.toMap
    // shared-artifact wrapper == direct op (pred and k line up by contract)
    assert(Queries.KnnQueryMod == 50L && Queries.AnnRecallK == k)
    val direct = Similarity.rrfFusion(emb, col("vec_id") % 50 === 0, k)
    val gotDirect = direct.collect().map { r =>
      ((r.getAs[Long]("query_id"), r.getAs[String]("method")),
        (r.getAs[Long]("n_returned"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_truth"), r.getAs[Long]("recall_bp")))
    }.toMap
    assert(got == gotDirect, "shared ANN artifact must not change the report")
    // refold on the % 100 probe subset: those queries' rows must agree
    truth.keys.foreach { q =>
      val t = truth(q)
      val sets = Map(
        "lsh" -> lsh.getOrElse(q, Nil).map(_._1).toSet,
        "ivf" -> ivf.getOrElse(q, Nil).map(_._1).toSet,
        "rrf" -> fusedOf(q))
      sets.foreach { case (m, s) =>
        val (nRet, nHits, nTruth, bp) = got((q, m))
        assert(nRet == s.size && nHits == (t & s).size && nTruth == t.size,
          s"($q, $m) accounting")
        assert(bp == math.floor(10000.0 * (t & s).size / t.size).toLong)
      }
    }
    // every reported method row belongs to a live probe query
    assert(got.keySet.map(_._2) == Set("lsh", "ivf", "rrf"))
  }

  test("annMrr matches a naive recomputation; missed truth scores 0") {
    val emb = Tables(spark, sf, "embeddings")
    val pred = col("vec_id") % 100 === 0
    val truth1 = Similarity.knnBruteForce(emb, pred, k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toMap
    val annRank = Similarity.annLsh(emb, pred, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect()
      .map { case (q, n, r) => (q, n) -> r.toLong }.toMap
    val got = Similarity.annMrr(emb, pred, k = 3)
      .select("query_id", "truth_id", "ann_rank", "rr_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == truth1.keySet) // every query reported
    got.foreach { case (q, t, r, rr) =>
      assert(t == truth1(q), s"query $q truth id")
      val want = annRank.getOrElse((q, t), 0L)
      assert(r == want, s"query $q rank")
      assert(rr == (if (want == 0L) 0L else 1000000L / want), s"query $q rr")
    }
  }

  test("fuzzyFlagged: verbatim eval copy flags at 10000 bp; unrelated text doesn't") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // = eval doc 100
      (2L, "totally different words with no overlap at all")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = Contamination.fuzzyFlagged(train, eval_)
      .select("doc_id", "eval_doc_id", "inter", "size_eval", "cont_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L, 4L, 4L, 10000L)))
  }

  test("fuzzyFlagged: empty benchmark / short or null texts never flag") {
    val train = Seq((1L, "a b c d e"), (2L, null.asInstanceOf[String]),
      (3L, "x y")).toDF("doc_id", "text")
    val none = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Contamination.fuzzyFlagged(train, none).count() == 0L)
    // null/short eval docs have empty shingle sets -> null band hashes
    // -> no candidates (and a 0-size eval set could never reach the
    // containment threshold anyway)
    val degenerate = Seq((9L, null.asInstanceOf[String]), (10L, "p q"))
      .toDF("doc_id", "text")
    assert(Contamination.fuzzyFlagged(train, degenerate).count() == 0L)
  }

  // ---- ivfBalance ----

  test("ivfBalance: singleton/coherent lists score 10000, a split list scores its exact mean") {
    val emb = Seq(
      // list 0: two identical vectors — centroid IS the vector
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      // list 1: orthogonal pair — centroid [5e5, 5e5], cos = 7071 bp each
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfBalance(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("share_bp"),
          r.getAs[Long]("mean_cos_bp")))).toMap
    assert(out(0) == ((2L, 5000L, 10000L)))
    // dot = 1e6*5e5; n2 = 1e12; c_n2 = 5e11 → floor(7071.06…) = 7071
    assert(out(1) == ((2L, 5000L, 7071L)))
  }

  test("ivfBalance shares sum to ~10000 bp and counts conserve the corpus") {
    val emb = Tables(spark, sf, "embeddings")
    val rows = Similarity.ivfBalance(emb).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == emb.count())
    val shareSum = rows.map(_.getAs[Long]("share_bp")).sum
    assert(shareSum <= 10000L && shareSum > 10000L - rows.length,
      s"floored shares out of range: $shareSum")
  }

  // ---- verdictFusion ----

  test("verdictFusion: exact dups land in (1,1,1); near-dups split by method; totals conserve") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta",
      2L -> "alpha beta gamma delta epsilon zeta eta", // exact dup of 1
      7L -> base,
      8L -> base.replace("w30", "zz"))                 // near-dup of 7
    val out = Dedup.verdictFusion(d).collect()
      .map(r => (r.getAs[Int]("exact_dup"), r.getAs[Int]("mh_dup"),
        r.getAs[Int]("sh_dup")) -> r.getAs[Long]("n_pairs")).toMap
    // identical texts: jaccard 10000 and hamming 0 by construction
    assert(out((1, 1, 1)) == 1L)
    // the near-dup pair is NOT exact; it must appear in some (0,·,·)
    val nearCells = out.collect { case ((0, m, s), n) => ((m, s), n) }
    assert(nearCells.values.sum == 1L, s"cells: $out")
    // an exact pair can never score below either approximate detector
    assert(!out.keySet.exists { case (e, m, s) => e == 1 && (m == 0 || s == 0) })
    // universe conservation vs the pair machinery it rides
    assert(out.values.sum == Dedup.minhashDedupPairs(d, 1L).count())
  }

  // ---- centroidDrift ----

  test("centroidDrift: unchanged lists score 10000; a post-build shift shows; new lists are NULL") {
    // built = vec_id % 3 != 0 (ids 0, 3, 6, 9 arrived after the build)
    val emb = Seq(
      // label 0: every row was in the build → old == now → 10000
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      // label 1: built on +x, a post-build orthogonal row moves it
      (4L, Array(1.0f, 0.0f), 1), (5L, Array(1.0f, 0.0f), 1),
      (6L, Array(0.0f, 1.0f), 1),
      // label 2: ONLY post-build rows → no old centroid
      (9L, Array(0.5f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(emb, col("vec_id") % 3 =!= 0)
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_built"), r.getAs[Long]("n_total"),
          Option(r.getAs[java.lang.Long]("drift_cos_bp"))))).toMap
    assert(out(0) == ((2L, 2L, Some(10000L))))
    // label 1: old centroid (1e6, 0); new (floor(2e6/3), floor(1e6/3))
    // → cos < 10000 but well above 0
    val (nb, nt, drift) = out(1)
    assert(nb == 2L && nt == 3L && drift.exists(d => d > 8000L && d < 10000L))
    assert(out(2) == ((0L, 1L, None)))
  }

  // ---- signalAgreement ----

  test("signalAgreement matches the q18 × q69 verdicts recomputed via a doc_id join") {
    val docsT = Tables(spark, sf, "documents")
    val want = TextAnalysis.textQuality(docsT)
      .select(col("doc_id"), col("token_count"), col("quality_ok"))
      .join(TextAnalysis.qualityClassifier(docsT)
        .select(col("doc_id"), col("keep")), "doc_id")
      .groupBy(col("quality_ok").as("heuristic_ok"),
        col("keep").as("classifier_keep"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_count")).as("tokens"))
      .collect()
      .map(r => (r.getAs[Int]("heuristic_ok"), r.getAs[Int]("classifier_keep")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))).toMap
    val got = TextAnalysis.signalAgreement(docsT).collect()
      .map(r => (r.getAs[Int]("heuristic_ok"), r.getAs[Int]("classifier_keep")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))).toMap
    assert(got == want)
  }

  test("signalAgreement: agree flags the diagonal, shares are floored of total") {
    val docsT = Tables(spark, sf, "documents")
    val rows = TextAnalysis.signalAgreement(docsT).collect()
    rows.foreach { r =>
      val expect = if (r.getAs[Int]("heuristic_ok") ==
        r.getAs[Int]("classifier_keep")) 1 else 0
      assert(r.getAs[Int]("agree") == expect)
    }
    val bpSum = rows.map(_.getAs[Long]("docs_bp")).sum
    assert(bpSum <= 10000L && bpSum > 10000L - rows.length)
  }

  // ---- scriptMix ----

  test("scriptMix: hand-computed char classes incl. CJK and the mixed-script flag") {
    val d = Seq(
      (1L, "abc 12", "s1"),   // 6 chars: 3 letters, 2 digits, 1 space
      (2L, "你好 ab", "s1"),  // 5 chars: 2 letters, 1 space, 2 non-ascii (mixed)
      (3L, "", "s2"))         // empty text: all-zero source via the 0-guard
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(0L))
    val out = graft.ops.TextAnalysis.scriptMix(d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("chars"), r.getAs[Long]("letters"),
          r.getAs[Long]("digits"), r.getAs[Long]("spaces"),
          r.getAs[Long]("non_ascii"), r.getAs[Long]("n_mixed"),
          r.getAs[Long]("mixed_bp")))).toMap
    assert(out("s1") == ((11L, 5L, 2L, 2L, 2L, 1L, 5000L)))
    assert(out("s2") == ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    val s2 = graft.ops.TextAnalysis.scriptMix(d)
      .filter(col("source") === "s2").head()
    assert(s2.getAs[Long]("letter_bp") == 0L) // 0/0 guard, not null/NaN
  }

  // ---- docNovelty ----

  test("docNovelty: copies zero out, unique docs hit 10000, short docs report NULL novelty") {
    val d = docs(
      1L -> "a b c d e f g h i",        // 9 tokens → 2 grams, both copied by doc 2
      2L -> "a b c d e f g h i",        // exact copy
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8",  // 1 gram, unique
      4L -> "x y")                      // < 8 tokens → no grams
    val out = graft.ops.Dedup.docNovelty(d, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("total_grams"), r.getAs[Long]("novel_grams"),
          Option(r.getAs[java.lang.Long]("novelty_bp"))))).toMap
    assert(out(1L) == ((2L, 0L, Some(0L))))
    assert(out(2L) == ((2L, 0L, Some(0L))))
    assert(out(3L) == ((1L, 1L, Some(10000L))))
    assert(out(4L) == ((0L, 0L, None))) // undefined, not 0
  }

  test("docNovelty: within-doc repeats don't lose novelty (distinct-per-doc grams)") {
    // the doc repeats its own 8-gram; no OTHER doc carries it → novel
    val d = docs(1L -> "p1 p2 p3 p4 p5 p6 p7 p8 p1 p2 p3 p4 p5 p6 p7 p8")
    val row = graft.ops.Dedup.docNovelty(d, n = 8).head()
    assert(row.getAs[Long]("novel_grams") == row.getAs[Long]("total_grams"))
    assert(row.getAs[Long]("novelty_bp") == 10000L)
  }

  // ---- surprisal ----

  test("surprisal: head tokens score ⌊log2(T/freq)⌋, OOV floors at freq 1") {
    // corpus: doc1 "a a a", doc2 "b" → T=4; head(1) = {a: 3}
    // a: ⌊log2(4/3)⌋ = 0; b (OOV): ⌊log2(4/1)⌋ = 2
    val d = docs(1L -> "a a a", 2L -> "b")
    val out = graft.ops.TextAnalysis.surprisal(d, headK = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("token_count"), r.getAs[Long]("total_log2"),
          r.getAs[Long]("avg_log2_bp")))).toMap
    assert(out(1L) == ((3L, 0L, 0L)))
    assert(out(2L) == ((1L, 2L, 20000L)))
  }

  test("surprisal: widening the head never increases any doc's score") {
    val docsT = Tables(spark, sf, "documents")
    val small = graft.ops.TextAnalysis.surprisal(docsT, headK = 50)
      .select(col("doc_id"), col("total_log2").as("s_small"))
    val large = graft.ops.TextAnalysis.surprisal(docsT, headK = 5000)
      .select(col("doc_id"), col("total_log2").as("s_large"))
    val worse = small.join(large, "doc_id")
      .filter(col("s_large") > col("s_small")).count()
    assert(worse == 0L, "a token got MORE surprising with a bigger head")
  }

  // ---- boilerplateLines ----

  test("boilerplateLines finds cross-doc windows, ignores within-doc repeats, ranks by count") {
    val d = Seq(
      (1L, "nav bar foo baa", "web"),
      (2L, "nav bar baz qux", "web"),
      (3L, "nav bar nav bar", "web"),  // distinct-per-doc: counts ONCE
      (4L, "unique words here now", "web"),
      (5L, "foo baa only here", "web"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(0L))
    val out = graft.ops.TextClean.boilerplateLines(d, lineTokens = 2,
      minDocs = 2L, k = 5).collect()
      .map(r => (r.getAs[String]("line"),
        r.getAs[Long]("n_docs"), r.getAs[Int]("rank")))
    // "nav bar": docs 1,2,3 → 3; "foo baa": docs 1,5 → 2; others < 2 gone
    assert(out.toSet == Set(("nav bar", 3L, 1), ("foo baa", 2L, 2)))
  }

  test("minhashCalibration: identical texts land at 16/16 with zero error") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "umber vole wombat xylem yarrow zephyr")
    val got = graft.ops.Dedup.minhashCalibration(d).collect()
      .map(r => r.getAs[Long]("matches") ->
        ((r.getAs[Long]("est_bp"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("mean_jaccard_bp"),
          r.getAs[Long]("mean_abs_err_bp")))).toMap
    // the identical pair MUST be a candidate (all bands agree) and
    // calibrate perfectly; the unrelated doc shares no band
    assert(got(16L) == ((10000L, 1L, 10000L, 0L)))
    assert(got.keySet == Set(16L))
  }

  test("pqDistortion: hand-checkable errors; codebook members quantize to zero error") {
    // m=1, k=2: vecs 0,1 ARE the codes (err 0). float32 rounds just
    // BELOW the decimal values, so the 1e6 floor-quantization gives
    // q = [0,0], [1,0], [3,0]: vec 2 picks code 1 at squared distance
    // (3-1)² = 4; signal energy 0+1+9 = 10.
    val emb = Seq(
      (0L, Array(0.000001f, 0.0f), 0), (1L, Array(0.000002f, 0.0f), 0),
      (2L, Array(0.000004f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = ProductQuant.distortion(emb, m = 1, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // mean = floor(4/3) = 1; noise = floor(10000*4/10) = 4000
    assert(got == Seq((0L, 3L, 1L, 4L, 4000L)))
  }

  test("ivfProbeCurve: recall climbs with probe depth and hits 10000 at all lists") {
    // list 0 = +x cluster; list 1 mixes -x vectors with a +x truth
    // neighbor (12) AND the query — depth 1 probes list 0 only and
    // misses 12; depth 2 scores everything.
    val emb = Seq(
      (0L, Array(1.0f, 0.1f), 0), (1L, Array(0.9f, 0.2f), 0),
      (2L, Array(0.8f, 0.0f), 0),
      (10L, Array(-1.0f, 0.1f), 1), (11L, Array(-0.9f, 0.0f), 1),
      (12L, Array(0.97f, 0.1f), 1),
      (50L, Array(0.95f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfProbeCurve(emb, col("vec_id") === 50, k = 2,
      probes = Seq(1, 2))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // (n_probe, n_queries, n_truth, n_hits, n_candidates, recall_bp)
    // depth 2 scores list 0 (3) + list 1 minus self (3) = 6 candidates
    assert(got == Seq(
      (1L, 1L, 2L, 1L, 3L, 5000L),
      (2L, 1L, 2L, 2L, 6L, 10000L)), got.toString)
  }

  test("lshPlanner: an identical pair is caught at p=1 by every factorization") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "umber vole wombat xylem yarrow zephyr")
    // s = 1.0 → s^r = 1, (1−s^r)^b = 0, p = 1 for every (r, b)
    val got = graft.ops.Dedup.lshPlanner(d).collect()
      .map(r => (r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_bands"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_false"), r.getAs[java.lang.Long]("recall_bp"),
        r.getAs[java.lang.Long]("fp_bp"),
        r.getAs[Long]("exp_cand_bp_sum"))).toSeq
    val expect = Seq(1L -> 16L, 2L -> 8L, 4L -> 4L, 8L -> 2L, 16L -> 1L)
      .map { case (r, b) =>
        (r, b, 1L, 1L, 0L, java.lang.Long.valueOf(10000L),
          null.asInstanceOf[java.lang.Long], 10000L)
      }
    assert(got == expect)
  }

  test("lshPlanner: a pair below tau lands on the false side with null recall") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta")
    // tau above any reachable jaccard → the (exact-dup) pair is a
    // "false" collision: recall undefined, fp mass = its p = 1
    val got = graft.ops.Dedup.lshPlanner(d, tauBp = 10001L).collect()
      .map(r => (r.getAs[Long]("n_true"), r.getAs[Long]("n_false"),
        r.getAs[java.lang.Long]("recall_bp"),
        r.getAs[java.lang.Long]("fp_bp"))).toSeq
    assert(got.size == 5 && got.forall(_ ==
      ((0L, 1L, null.asInstanceOf[java.lang.Long],
        java.lang.Long.valueOf(10000L)))))
  }

  // ---- shared ANN index artifact (ops.Shared seam) ----

  test("ANN reports over a shared quantized index equal the standalone entries") {
    // the ops.Shared contract for the similarity family: build the
    // quantized corpus (bucket + codes + norms) and the IVF centroids
    // ONCE, feed every entry point through its quant0/cents0 seam —
    // results must be IDENTICAL to the standalone (rebuild-everything)
    // paths, including on a null-embedding row the index carries
    val emb = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.2f, -0.1f, 0.4f), 0),
      (1L, Array(0.9f, 0.2f, 0.1f, 0.1f, -0.2f, 0.3f), 0),
      (2L, Array(0.8f, 0.0f, -0.2f, 0.3f, 0.1f, 0.2f), 0),
      (10L, Array(-1.0f, 0.1f, 0.3f, -0.2f, 0.2f, -0.4f), 1),
      (11L, Array(-0.9f, 0.0f, 0.2f, -0.1f, 0.3f, -0.3f), 1),
      (12L, Array(-0.8f, -0.1f, 0.25f, -0.3f, 0.1f, -0.2f), 1),
      (20L, Array(0.0f, 1.0f, 1.0f, 0.5f, 0.5f, 0.1f), 2),
      (21L, null.asInstanceOf[Array[Float]], 2)
    ).toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") % 10 === 0
    val index = Some(Similarity.quantizedCorpus(emb).localCheckpoint())
    val cents = Some(
      Similarity.ivfCentroidsFromQuantized(index.get).localCheckpoint())
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Similarity.knnBruteForce(emb, pred, 3, index)) ==
      rows(Similarity.knnBruteForce(emb, pred, 3)))
    assert(rows(Similarity.annLsh(emb, pred, 3, index)) ==
      rows(Similarity.annLsh(emb, pred, 3)))
    assert(rows(Similarity.annRecall(emb, pred, 3, index)) ==
      rows(Similarity.annRecall(emb, pred, 3)))
    assert(rows(Similarity.annMrr(emb, pred, 3, index)) ==
      rows(Similarity.annMrr(emb, pred, 3)))
    assert(rows(Similarity.hardNegatives(emb, pred, 2, index)) ==
      rows(Similarity.hardNegatives(emb, pred, 2)))
    assert(rows(Similarity.nearDupPairs(emb, 2000L, index)) ==
      rows(Similarity.nearDupPairs(emb, 2000L)))
    assert(rows(Similarity.ivfAnn(emb, pred, 2, 2, index, cents)) ==
      rows(Similarity.ivfAnn(emb, pred, 2, 2)))
    assert(rows(Similarity.ivfBalance(emb, index, cents)) ==
      rows(Similarity.ivfBalance(emb)))
    assert(rows(Similarity.ivfProbeCurve(emb, pred, 2, Seq(1, 2), index, cents)) ==
      rows(Similarity.ivfProbeCurve(emb, pred, 2, Seq(1, 2))))
    assert(rows(Similarity.centroidDrift(emb, col("vec_id") % 3 =!= 0,
      index, cents)) ==
      rows(Similarity.centroidDrift(emb, col("vec_id") % 3 =!= 0)))
    assert(rows(Similarity.labelOutliers(emb, 2, index)) ==
      rows(Similarity.labelOutliers(emb, 2)))
  }

  test("spanCorruption: JVM twin of the md5 span mask and length accounting") {
    val s2 = spark
    import s2.implicits._
    val docs = (1L to 40L)
      .map(i => (i, (0 until 30).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.ops.TrainingPrep.spanCorruption(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    def md5hex8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(8), 16)
    }
    val expect = (1L to 40L).map { d =>
      val n = 30
      val draws = (0 until n).map(p => md5hex8(s"$d:$p"))
      val start = draws.map(dr => dr % 10000 < 500)
      val len = draws.zip(start).map { case (dr, st) =>
        if (st) dr % 5 + 1 else 0L }
      val masked = (0 until n).map(i => (0 until 5).exists(k =>
        i - k >= 0 && start(i - k) && len(i - k) > k))
      val nm = masked.count(identity).toLong
      val ns = (0 until n).count(i =>
        masked(i) && (i == 0 || !masked(i - 1))).toLong
      (d, n.toLong, nm, ns, n - nm + ns, nm + ns + 1L, 10000L * nm / n)
    }
    assert(got == expect)
  }

  test("prioritySample: JVM twin of the integer priorities, τ, and HT weights") {
    val s2 = spark
    import s2.implicits._
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}", 100L * i))
      .toDF("doc_id", "source", "n_chars")
    val k = 5
    val got = graft.ops.TrainingPrep.prioritySample(docs, k)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // independent reimplementation: 40-bit md5 nibbles + 1, q = w·2^40/h
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(10)
      java.lang.Long.parseLong(hex, 16) + 1L
    }
    val twin = (1L to 30L).map { i =>
      val w = 100L * i
      (i, s"src${i % 3}", w,
        (BigInt(w) * BigInt(1099511627776L) / h(i)).toLong)
    }.sortBy { case (id, _, _, q) => (-q, id) }
    val tau = twin(k)._4
    val expect = twin.take(k).map { case (id, src, w, q) =>
      (id, src, w, q, math.max(w, tau)) }
    assert(got == expect)
    // small-n case: corpus fits in k → τ = 0, HT weight = own weight
    val tiny = Seq((1L, "s", 50L), (2L, "s", 70L))
      .toDF("doc_id", "source", "n_chars")
    val all = graft.ops.TrainingPrep.prioritySample(tiny, k)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(all.size == 2 && all.forall(r => r._5 == r._3))
  }
}
