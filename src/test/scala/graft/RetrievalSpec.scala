package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Percentiles, Retrieval, TextAnalysis, TrainingPrep}

/** Round-3 additions: BM25 retrieval, substring-span dedup, cube
  * totals, curriculum buckets. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", s"src${id % 4}", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- BM25 ----

  /** The operator's exact scoring, reproduced independently:
    * rational idf (2(N-df)+1)/(2df+1), k1=1.5, b=0.75, per-term
    * fixed-point floor before the sum. */
  private def bm25Ref(corpus: Seq[(Long, String)],
      queries: Seq[(Long, Seq[String])]): Map[(Long, Long), Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split(' ').toSeq }.toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    (for {
      (qid, terms) <- queries
      (did, ts) <- toks
      score = terms.map { term =>
        val tf = ts.count(_ == term).toLong
        if (tf == 0L) 0L
        else {
          val d = df(term).toLong
          val idf = (2.0 * (n - d) + 1.0) / (2.0 * d + 1.0)
          val sat = (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * (ts.size / avgdl)))
          math.floor(1000000.0 * idf * sat).toLong
        }
      }.sum
      if score > 0L
    } yield (qid, did) -> score).toMap
  }

  test("bm25 matches the independent per-pair reference scoring") {
    val corpus = Seq(
      1L -> "spark join hash spark spark",
      2L -> "join hash table scan filter",
      3L -> "window batch stream window stream",
      4L -> "hash hash hash hash hash hash hash",
      5L -> "unrelated words only here")
    val qs = Seq(1L -> Seq("spark", "join"), 2L -> Seq("hash"))
    val queries = qs.flatMap { case (id, ts) => ts.map(id -> _) }
      .toDF("query_id", "token")
    val out = Retrieval.bm25TopK(docs(corpus: _*), queries, k = 10)
      .select("query_id", "doc_id", "score_fp").as[(Long, Long, Long)]
      .collect().map { case (q, d, s) => (q, d) -> s }.toMap
    assert(out == bm25Ref(corpus, qs))
  }

  test("bm25 ranks dense by (score desc, doc_id) and respects k") {
    val corpus = (1L to 8L).map(i => i -> ("hash " * i.toInt).trim)
    val queries = Seq((1L, "hash")).toDF("query_id", "token")
    val out = Retrieval.bm25TopK(docs(corpus: _*), queries, k = 3)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    assert(out.length == 3)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L)) // dense ranks
    // more occurrences of the only query term ⇒ higher score (tf
    // saturation never inverts on same-length-profile docs here)
    assert(out.map(_._4).toSeq == out.map(_._4).sortBy(-_).toSeq)
  }

  test("bm25: a doc containing no query term never surfaces") {
    val corpus = Seq(1L -> "spark join", 2L -> "other words")
    val queries = Seq((1L, "spark")).toDF("query_id", "token")
    val out = Retrieval.bm25TopK(docs(corpus: _*), queries)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  // ---- substring duplicate spans ----

  test("substring spans: shared 3-gram marks exactly its token cover") {
    val out = Dedup.substringDupSpans(docs(
      1L -> "a b c d e f",     // "a b c" shared with doc 2 → pos 1-3
      2L -> "x a b c y z",     // → pos 2-4
      3L -> "p q r s t u"),    // unique
      n = 3).as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 3L, 5000L)))
    assert(out(2L) == ((6L, 3L, 5000L)))
    assert(out(3L) == ((6L, 0L, 0L)))
  }

  test("substring spans: overlapping dup grams merge their cover") {
    // docs share a 4-token run "a b c d" ⇒ two overlapping 3-grams
    // ("a b c", "b c d") covering positions 1-4, counted once each
    val out = Dedup.substringDupSpans(docs(
      1L -> "a b c d x y",
      2L -> "z a b c d w"), n = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> 4L, 2L -> 4L))
  }

  test("substring spans: within-doc repetition is duplication too") {
    val out = Dedup.substringDupSpans(docs(
      1L -> "a b c x x a b c"), n = 3) // "a b c" twice in ONE doc
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((1L, 8L, 6L, 7500L))) // pos 1-3 and 6-8
  }

  test("substring spans: docs shorter than n contribute and cover nothing") {
    val out = Dedup.substringDupSpans(docs(
      1L -> "a b", 2L -> "a b"), n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 0L, 0L), (2L, 2L, 0L, 0L)))
  }

  test("substring scrub: drops exactly the covered tokens, keeps the rest in order") {
    val out = Dedup.substringScrub(docs(
      1L -> "a b c d e f",     // "a b c" shared → pos 1-3 dropped
      2L -> "x a b c y z",     // → pos 2-4 dropped
      3L -> "p q r s t u"),    // untouched
      n = 3).as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((3L, "d e f")))
    assert(out(2L) == ((3L, "x y z")))
    assert(out(3L) == ((6L, "p q r s t u")))
  }

  test("substring scrub: a fully-duplicated doc scrubs to the empty string") {
    val out = Dedup.substringScrub(docs(
      1L -> "a b c", 2L -> "a b c"), n = 3)
      .as[(Long, Long, Long, String)].collect()
    assert(out.forall(r => r._3 == 0L && r._4 == ""))
  }

  // ---- cube totals ----

  test("cube adds the cross-slices rollup omits, same totals") {
    val df = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0))
      .toDF("f", "s", "v")
    val cube = Percentiles.cubeTotals(df, "f", "s", "v")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(cube.size == 8) // 3 leaves + 2 f-slices + 2 s-slices + grand
    assert(cube(("ALL", "ALL")) == ((3L, 700L)))
    assert(cube(("A", "ALL")) == ((2L, 300L)))
    assert(cube(("ALL", "x")) == ((2L, 500L))) // the slice rollup lacks
    assert(cube(("ALL", "y")) == ((1L, 200L)))
    val rollup = Percentiles.rollupTotals(df, "f", "s", "v")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(!rollup.contains(("ALL", "x")))
    assert(cube.keySet.intersect(rollup) == rollup)
  }

  // ---- curriculum buckets ----

  test("curriculum buckets: quartiles by ttr desc, ties share a bucket") {
    // 8 docs, two per distinct ttr level ⇒ clean quartiles
    val d = docs(
      1L -> "a b c d", 2L -> "e f g h",              // ttr 10000
      3L -> "a a b c", 4L -> "d d e f",              // ttr 7500
      5L -> "a a b b", 6L -> "c c d d",              // ttr 5000
      7L -> "a a a a", 8L -> "c c c c")              // ttr 2500
    val out = TrainingPrep.curriculumBuckets(d, buckets = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))
  }

  test("curriculum buckets: a dominant tie class floods one bucket") {
    val d = docs((1L to 6L).map(i => i -> "a b c d"): _*) // all ttr 10000
    val out = TrainingPrep.curriculumBuckets(d, buckets = 4)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 6 && out.forall(_._3 == 0L)) // all tie → bucket 0
  }

  // ---- cohort retention ----

  test("retention: cohort = first day; offsets counted once per user-day") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L // 2026-01-01 UTC
    def t(day: Int, h: Int = 1) =
      new java.sql.Timestamp(T0 + day * 86400000L + h * 3600000L)
    val events = Seq(
      (1L, t(0)), (1L, t(0, 5)), (1L, t(2)),   // user 1: cohort d0, back d2
      (2L, t(0)), (2L, t(1)),                  // user 2: cohort d0, back d1
      (3L, t(2)), (3L, t(20))                  // user 3: cohort d2; d20 > horizon
    ).toDF("user_id", "ts")
    val out = graft.ops.Retention.cohortRetention(events,
        ("2026-01-01", "2026-12-31"), maxOffsetDays = 14)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      ("2026-01-01", 0L) -> 2L,  // users 1+2 (dup same-day events collapse)
      ("2026-01-01", 1L) -> 1L,  // user 2
      ("2026-01-01", 2L) -> 1L,  // user 1
      ("2026-01-03", 0L) -> 1L)) // user 3; its d20 return is past the horizon
  }

  test("ltvCurve: per-cohort cumulative cents by age; window and horizon gates") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L // 2026-01-01 UTC
    def t(day: Int) = new java.sql.Timestamp(T0 + day * 86400000L + 3600000L)
    val events = Seq(
      (1L, t(0), 1.50), (1L, t(1), 2.25),   // user 1: cohort d0
      (2L, t(0), 3.10),                     // user 2: cohort d0, day 0 only
      (2L, t(20), 99.0),                    // past the 14-day horizon
      (3L, t(40), 50.0))                    // outside the analysis window
      .toDF("user_id", "ts", "value")
    val out = graft.ops.Retention.ltvCurve(events,
        ("2026-01-01", "2026-01-31"), maxOffsetDays = 14)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(
      ("2026-01-01", 0L) -> ((2L, 460L, 460L)),  // 150 + 310 cents
      ("2026-01-01", 1L) -> ((1L, 225L, 685L))))
  }

  test("returnTimes: hand-computed away buckets; single-session users contribute nothing") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L
    def t(hours: Double) = new java.sql.Timestamp(T0 + (hours * 3600000L).toLong)
    val evs = Seq(
      // user 1: sessions at 0h, 2.5h (away 2h → bucket 1), 50h (away
      // 47h → bucket 5)
      (0L, t(0), 1L), (1L, t(0.1), 1L), (2L, t(2.5), 1L), (3L, t(50), 1L),
      // user 2: one session only → no return
      (4L, t(0), 2L),
      // user 3: return after 40 min → sub-hour bucket −1
      (5L, t(0), 3L), (6L, t(0.9), 3L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val out = graft.ops.Retention.returnTimes(evs).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_returns"), r.getAs[Long]("min_hours"),
          r.getAs[Long]("max_hours")))).toMap
    assert(out(-1L) == ((1L, 0L, 0L)))   // user 3's 54-min away
    assert(out(1L) == ((1L, 2L, 2L)))    // 2.4h → 2 full hours
    assert(out(5L) == ((1L, 47L, 47L)))  // 47h → ⌊log2 47⌋ = 5
    assert(out.size == 3)
  }

  test("hourlyProfile: shares per type sum to ~10000; exactly one peak per type, tie → earliest hour") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L
    def at(h: Int) = new java.sql.Timestamp(T0 + h * 3600000L)
    val evs = Seq(
      (0L, at(9), "view"), (1L, at(9), "view"), (2L, at(17), "view"),
      (3L, at(3), "click"), (4L, at(21), "click")) // tie → peak hour 3
      .toDF("event_id", "ts", "event_type")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val rows = graft.ops.Retention.hourlyProfile(evs).collect()
    val peaks = rows.filter(_.getAs[Int]("is_peak") == 1)
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("hour")).toMap
    assert(peaks == Map("view" -> 9L, "click" -> 3L))
    Seq("view", "click").foreach { t =>
      val bp = rows.filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("share_bp")).sum
      assert(bp > 10000L - 24 && bp <= 10000L, t)
    }
  }

  test("retention: the required window bounds per-user state and re-cohorts") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L // 2026-01-01 UTC
    def t(day: Int) = new java.sql.Timestamp(T0 + day * 86400000L + 3600000L)
    // user 1 has a long history; only the window [d10, d30] counts,
    // and their cohort inside the window is d10 (not d0)
    val events = Seq(
      (1L, t(0)), (1L, t(5)), (1L, t(10)), (1L, t(12)), (1L, t(40)))
      .toDF("user_id", "ts")
    val out = graft.ops.Retention.cohortRetention(events,
        ("2026-01-11", "2026-01-31"), maxOffsetDays = 14)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(("2026-01-11", 0L) -> 1L, ("2026-01-11", 2L) -> 1L))
  }

  test("active users: trailing window counts a user once; stickiness floors") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L
    def t(day: Int) = new java.sql.Timestamp(T0 + day * 86400000L + 3600000L)
    val events = Seq(
      (1L, t(0)), (1L, t(1)), (2L, t(0)), (3L, t(1)), (1L, t(9)))
      .toDF("user_id", "ts")
    val out = graft.ops.Retention.activeUsers(events, windowDays = 7)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // d0: dau {1,2}; wau {1,2}. d1: dau {1,3}; wau(d0-d1) {1,2,3}.
    // d9: dau {1}; wau(d3-d9) {1}. No report rows for absent days.
    assert(out == Map(
      "2026-01-01" -> ((2L, 2L, 10000L)),
      "2026-01-02" -> ((2L, 3L, 6666L)),
      "2026-01-10" -> ((1L, 1L, 10000L))))
  }

  test("quantileCents: p100 is the max; p-quantile matches a sorted-seq reference") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.5), ("g", 10.0))
      .toDF("grp", "v")
    def q(p: Long) = graft.ops.Percentiles.quantileCents(df, "grp", "v", p)
      .as[(String, Long, Long)].head()._2
    // sorted: 1, 2, 2, 3.5, 10 (n=5); rank = ceil(p*n)
    assert(q(10000L) == 1000L) // rank 5 → 10.0
    assert(q(9500L) == 1000L)  // ceil(4.75)=5 → 10.0
    assert(q(8000L) == 350L)   // rank 4 → 3.5
    assert(q(5000L) == 200L)   // ceil(2.5)=3 → 2.0
    assert(q(1L) == 100L)      // rank 1 → 1.0
  }

  // ---- dataset profiling ----

  test("profile: null/distinct/min-max accounting per column") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null), (2L, "y"),
      (null, "x")).toDF("id", "v")
    val out = graft.ops.Profile.profile(df, Seq("id", "v"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 4L, 1L, 2L, "1", "2")))
    assert(out("v") == (("v", 4L, 1L, 2L, "x", "y")))
  }

  test("profileApprox matches exact counts on a small-cardinality table") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (i % 7, s"s${i % 13}")).toDF("a", "b")
    val exact = graft.ops.Profile.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    val approx = graft.ops.Profile.profileApprox(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // HLL is exact at these cardinalities (sparse mode)
    assert(approx == exact)
  }

  // ---- contrastive hard negatives ----

  test("hard negatives: never the anchor's label, densely ranked by similarity") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // anchor (query pred: vec_id % 50 == 0)
      (1L, Seq(0.9f, 0.1f), 1),   // same label — must be excluded
      (2L, Seq(0.8f, 0.2f), 2),   // different label, most similar
      (3L, Seq(0.0f, 1.0f), 2),   // different label, orthogonal
      (4L, Seq(-1.0f, 0.0f), 3))  // different label, opposite
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.hardNegatives(emb, col("vec_id") === 0L, k = 3)
      .orderBy("rank").as[(Long, Long, Int, Long, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 4L)) // by similarity desc
    assert(out.forall(_._3 != 1)) // anchor label excluded
    assert(out.map(_._5).toSeq == Seq(1, 2, 3))
    assert(out.head._4 > out(1)._4 && out(1)._4 > out(2)._4)
  }

  test("eval sample: exact k per group, identical under repartitioning") {
    val d = docs((1L to 20L).map(i => i -> s"text $i"): _*)
    val a = TrainingPrep.evalSample(d, k = 3, groupCol = "source")
      .as[(String, Long, Long)].collect().toSet
    val b = TrainingPrep.evalSample(d.repartition(7), k = 3, groupCol = "source")
      .as[(String, Long, Long)].collect().toSet
    assert(a == b) // layout-independent draw
    // every source has 5 candidates ≥ k=3 ⇒ EXACTLY k rows, dense ranks
    assert(a.groupBy(_._1).size == 4)
    assert(a.groupBy(_._1).forall { case (_, rows) =>
      rows.size == 3 && rows.map(_._2).toSeq.sorted == Seq(1L, 2L, 3L) })
  }

  // ---- mixture allocation ----

  test("mixture plan: caps at availability, leaves a deficit, rates in [0, 10000]") {
    val d = docs(
      1L -> "a b c d e f g h i j",   // src1: 10 tokens
      2L -> "a b c d e f g h i j",   // src2: 10 tokens
      3L -> "a b",                   // src3: 2 tokens
      4L -> "a b c d e f g h")       // src0: 8 tokens
    // weights: src1 heavy (demands more than its 10 tokens), others 1
    val out = TrainingPrep.mixturePlan(d, Map("src1" -> 30L), budgetTokens = 20L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val (_, avail1, _, desired1, keep1, planned1, deficit1) = out("src1")
    assert(avail1 == 10L && keep1 == 10000L && planned1 == 10L)
    assert(deficit1 == desired1 - 10L && deficit1 > 0L)
    out.values.foreach { case (_, avail, _, _, keep, planned, _) =>
      assert(keep >= 0L && keep <= 10000L)
      assert(planned <= avail)
    }
  }

  test("mixture plan: uniform weights and ample budget sample everything") {
    val d = docs(1L -> "a b c", 2L -> "d e f", 3L -> "g h i", 4L -> "j k l")
    val out = TrainingPrep.mixturePlan(d, Map.empty, budgetTokens = 1000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 4)
    out.foreach { case (_, avail, targetBp, _, keep, planned, _) =>
      assert(targetBp == 2500L)
      assert(keep == 10000L && planned == avail)
    }
  }

  // ---- hashed quality classifier ----

  test("quality classifier: inline stand-in weights ≡ the weight-table path") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "spark join hash table scan",
      3L -> "one token",
      4L -> "repeated repeated repeated repeated")
    val inline = TextAnalysis.qualityClassifier(d)
      .as[(Long, Long, Long, Int)].collect().toSet
    val viaTable = TextAnalysis.classifyWithWeights(d,
      TextAnalysis.standInWeights(spark))
      .select("doc_id", "token_count", "score", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(inline == viaTable)
    assert(inline.forall { case (_, _, s, k) => (s >= 0) == (k == 1) })
  }

  test("quality classifier: a SPARSE weight table keeps every doc (absent bucket = 0)") {
    val s = spark
    import s.implicits._
    val d = docs(1L -> "alpha beta", 2L -> "gamma delta")
    // empty weight table: every bucket absent ⇒ every doc scores 0, keep=1
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "weight")
    val out = TextAnalysis.classifyWithWeights(d, empty)
      .select("doc_id", "token_count", "score", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0L, 1), (2L, 2L, 0L, 1)))
  }

  test("quality classifier: score is token-multiplicity-weighted") {
    val one = TextAnalysis.qualityClassifier(docs(1L -> "word"))
      .as[(Long, Long, Long, Int)].head()._3
    val three = TextAnalysis.qualityClassifier(docs(1L -> "word word word"))
      .as[(Long, Long, Long, Int)].head()._3
    assert(three == 3 * one)
  }

  test("volume anomaly: spike vs flat baseline flags; steady jitter and short history don't") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L // 2026-01-01 UTC
    def t(day: Int, i: Int) =
      new java.sql.Timestamp(T0 + day * 86400000L + i * 1000L)
    // "a": 10,10,10,10,30 — zero-variance baseline, the 30 must flag.
    // "b": 10,12,10,12,11 — day-5 deviation is exactly 0: no flag.
    val bCounts = Seq(10, 12, 10, 12, 11)
    // the null-ts row must vanish, not create a null day that sorts
    // into a different trailing frame per engine
    val rows =
      (for (d <- 0 to 4; i <- 0 until (if (d == 4) 30 else 10))
        yield ("a", t(d, i))) ++
        (for (d <- 0 to 4; i <- 0 until bCounts(d)) yield ("b", t(d, i))) :+
        (("a", null: java.sql.Timestamp))
    val out = graft.ops.Retention
      .volumeAnomaly(rows.toDF("event_type", "ts"),
        windowDays = 7, k2 = 4L, minObs = 4L)
      .select("event_type", "day", "cnt", "is_anomaly")
      .as[(String, String, Long, Long)].collect()
    val flags = out.map(r => (r._1, r._2) -> r._4).toMap
    // a@d5: (4·30−40)² = 6400 > 4·(4·400−40²) = 0
    assert(flags(("a", "2026-01-05")) == 1L)
    // b@d5: (4·11−44)² = 0, not > 4·(4·488−44²) = 64
    assert(flags(("b", "2026-01-05")) == 0L)
    // days with fewer than minObs trailing observations never claim
    assert(out.filter(_._2 < "2026-01-05").forall(_._4 == 0L))
    assert(out.length == 10)
  }

  test("value drift: hand-computed TVD, clamped buckets, one-sided types dropped") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L // 2026-01-01 UTC
    def t(day: Int) = new java.sql.Timestamp(T0 + day * 86400000L)
    // type a / ref (days 0-1): 5,15,15,25 → buckets 0,1,1,2 (totals 4)
    //        ref shares bp: 2500, 5000, 2500, 0
    // type a / cur (days 2-3): 5,-3,35,35,95 → buckets 0,0,3,3,3(clamped)
    //        cur shares bp: 4000, 0, 0, 6000 (totals 5)
    // diffs 1500+5000+2500+6000 = 15000 → tvd 7500, max 6000
    val rows: Seq[(String, java.sql.Timestamp, java.lang.Double)] = Seq(
      ("a", t(0), 5.0), ("a", t(0), 15.0), ("a", t(1), 15.0), ("a", t(1), 25.0),
      ("a", t(2), 5.0), ("a", t(2), -3.0), ("a", t(3), 35.0), ("a", t(3), 35.0),
      ("a", t(3), 95.0),
      // one-sided type: no cur rows → no distribution to compare
      ("b", t(0), 5.0), ("b", t(1), 15.0),
      // malformed rows vanish at the gate
      ("a", null, 5.0), ("a", t(0), null), (null, t(0), 5.0))
    val out = graft.ops.Retention
      .valueDrift(rows.toDF("event_type", "ts", "value"),
        splitDate = "2026-01-03", bucketWidth = 10.0, nBuckets = 4)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", 4L, 5L, 7500L, 6000L)))
  }

  test("value drift: identical distributions report exactly 0") {
    val s = spark
    import s.implicits._
    val T0 = 1767225600000L
    def t(day: Int) = new java.sql.Timestamp(T0 + day * 86400000L)
    val rows = for (day <- Seq(0, 4); v <- Seq(5.0, 15.0, 15.0, 25.0))
      yield ("a", t(day), v)
    val out = graft.ops.Retention
      .valueDrift(rows.toDF("event_type", "ts", "value"),
        splitDate = "2026-01-03", bucketWidth = 10.0, nBuckets = 4)
      .as[(String, Long, Long, Long, Long)].head()
    assert(out == (("a", 4L, 4L, 0L, 0L)))
  }

  test("source concentration: sorted-rank Gini, uniform floor, and top share") {
    val s = spark
    import s.implicits._
    def corpus(rows: (String, String)*) =
      rows.zipWithIndex.map { case ((src, t), i) =>
        (i.toLong, t, "en", src, if (t == null) 0L else t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // tokens [1, 1, 6] asc (source tie-break): iwx = 1+2+18 = 21,
    // num = 42 − 4·8 = 10, den = 3·8 → gini 4166; top 6/8 → 7500
    val out = TrainingPrep.sourceConcentration(corpus(
        "s1" -> "a", "s2" -> "a", "s3" -> "a a a a a a",
        "s3" -> null))
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((3L, 8L, 4166L, 7500L)))
    // perfectly uniform corpus → Gini exactly 0
    val uni = TrainingPrep.sourceConcentration(corpus(
        "u1" -> "a a", "u2" -> "b b", "u3" -> "c c", "u4" -> "d d"))
      .as[(Long, Long, Long, Long)].head()
    assert(uni == ((4L, 8L, 0L, 2500L)))
  }

  test("curriculum buckets: every doc lands in [0, buckets)") {
    val d = docs((1L to 17L).map(i =>
      i -> (("a " * i.toInt) + "b c").trim): _*)
    val out = TrainingPrep.curriculumBuckets(d, buckets = 5)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 17)
    assert(out.forall(r => r._3 >= 0L && r._3 < 5L))
  }

  // ---- systematic PPS sampling ----

  test("ppsSample: picks equal brute-force stride positions; totals match") {
    // single shard (shards=1 → all docs, phase r = 12345 % 7 = 4),
    // stride 7, docs of 5/3/9/1 tokens in id order
    val d = Seq(
      (0L, "t t t t t", "en", "s", 0L),   // off 0,  span [0,5)
      (1L, "t t t", "en", "s", 0L),       // off 5,  span [5,8)
      (2L, "t t t t t t t t t", "en", "s", 0L), // off 8, span [8,17)
      (3L, "t", "en", "s", 0L)            // off 17, span [17,18)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.TrainingPrep.ppsSample(d, stride = 7L, shards = 1)
      .select("doc_id", "token_count", "start_offset", "picks")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, t, o, p) => id -> ((t, o, p)) }.toMap
    // pick positions: 4, 11, 18, ... → doc0 gets {4}, doc2 gets {11};
    // 18 is past the 18-token stream
    assert(got == Map(0L -> ((5L, 0L, 1L)), 2L -> ((9L, 8L, 1L))))
  }

  test("ppsSample: a doc longer than the stride is drawn with multiplicity") {
    val longDoc = (0 until 25).map(_ => "t").mkString(" ") // 25 tokens
    val d = Seq((0L, longDoc, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.TrainingPrep.ppsSample(d, stride = 7L, shards = 1)
      .select("picks").as[Long].collect().toSeq
    // phase 4: picks at 4, 11, 18 in [0,25) → 3
    assert(got == Seq(3L))
  }

  test("ppsSample: expected totals — shard pick count is ceil((T-r)/S) and repartition-invariant") {
    val docs = (0L until 40L).map(i =>
      (i, (0 to (i % 7).toInt).map(_ => "w").mkString(" "), "en", "s", 0L))
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = graft.ops.TrainingPrep.ppsSample(df, 5L, 4)
    val b = graft.ops.TrainingPrep.ppsSample(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars").repartition(9), 5L, 4)
    assert(a.collect().toSet == b.collect().toSet)
    // per shard: sum(picks) == #{m : r + 5m < T_shard}, T from ALL
    // docs of the shard (sampled or not — spans tile the stream)
    val shardTokens = docs.groupBy(_._1 % 4L)
      .view.mapValues(_.map(d => (d._1 % 7L) + 1L).sum).toMap
    val perShard = a.groupBy("shard").agg(sum("picks").as("p"))
      .select("shard", "p").as[(Long, Long)].collect().toMap
    shardTokens.foreach { case (sh, t) =>
      val r = (sh * 48271L + 12345L) % 5L
      val expect = if (t <= r) 0L else (t - r + 4L) / 5L // ceil((t-r)/5)
      assert(perShard.getOrElse(sh, 0L) == expect, s"shard $sh")
    }
  }

  // ---- RFM segmentation ----

  test("rfm computes metrics and strictly-better tiers; ties share a tier") {
    import java.sql.Timestamp
    def p(id: Long, user: Long, t: String, v: Double) =
      (id, Timestamp.valueOf(t), user, "purchase", v, "{}")
    // u1: 2 purchases, last Jan 10, 30.00 total
    // u2: 1 purchase,  last Jan 20, 50.00
    // u3: 1 purchase,  last Jan 20, 50.00  (full tie with u2)
    // u4: 3 purchases, last Jan 05, 10.00
    val df = (Seq(
      p(0, 1, "2024-01-02 00:00:00", 10.0), p(1, 1, "2024-01-10 00:00:00", 20.0),
      p(2, 2, "2024-01-20 00:00:00", 50.0),
      p(3, 3, "2024-01-20 00:00:00", 50.0),
      p(4, 4, "2024-01-01 00:00:00", 3.0), p(5, 4, "2024-01-03 00:00:00", 3.0),
      p(6, 4, "2024-01-05 00:00:00", 4.0)) :+
      (7L, Timestamp.valueOf("2024-01-25 00:00:00"), 1L, "view", 999.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.Retention.rfm(df, "2024-02-01", buckets = 2)
      .select("user_id", "recency_days", "frequency", "monetary_cents", "segment")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // recency: u2/u3=12 (best, 0 better → tier0), u1=22 (2 better →
    //   floor(2*2/4)=1), u4=27 (3 better → 1)
    // frequency: u4=3 (t0), u1=2 (floor(2*1/4)=0), u2/u3=1 (2 better → 1)
    // monetary: u2/u3=5000 (t0), u1=3000 (2 better → 1), u4=1000 (1)
    assert(got == Set(
      (1L, 22L, 2L, 3000L, "R1F0M1"),
      (2L, 12L, 1L, 5000L, "R0F1M0"),
      (3L, 12L, 1L, 5000L, "R0F1M0"),
      (4L, 27L, 3L, 1000L, "R1F0M1")))
  }

  // ---- ordered funnel ----

  test("orderedFunnel counts subsequence depth with any events between") {
    import java.sql.Timestamp
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    // s1 (u1): view .. error .. click .. purchase  → depth 3
    // s2 (u2): click view                          → depth 1 (order matters)
    // s3 (u3): view click                          → depth 2
    val df = Seq(
      e(0, 1, "2024-01-01 00:00:00", "view"),
      e(1, 1, "2024-01-01 00:01:00", "error"),
      e(2, 1, "2024-01-01 00:02:00", "click"),
      e(3, 1, "2024-01-01 00:03:00", "purchase"),
      e(4, 2, "2024-01-01 00:00:00", "click"),
      e(5, 2, "2024-01-01 00:01:00", "view"),
      e(6, 3, "2024-01-01 00:00:00", "view"),
      e(7, 3, "2024-01-01 00:01:00", "click")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sess = graft.ops.Sessionize.assignSessions(df)
    val got = graft.ops.PageFunnel
      .orderedFunnel(spark, sess, Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "view", 3L, 3L, 10000L, 10000L),
      (2L, "click", 2L, 3L, 6666L, 6666L),
      (3L, "purchase", 1L, 2L, 5000L, 3333L)))
  }

  test("orderedFunnel greedy-earliest matches interleaved repeats") {
    import java.sql.Timestamp
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    // view view click view purchase → depth 3 (greedy takes 1st view,
    // then the click, then the purchase)
    val df = Seq(
      e(0, 1, "2024-01-01 00:00:00", "view"),
      e(1, 1, "2024-01-01 00:01:00", "view"),
      e(2, 1, "2024-01-01 00:02:00", "click"),
      e(3, 1, "2024-01-01 00:03:00", "view"),
      e(4, 1, "2024-01-01 00:04:00", "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.PageFunnel.orderedFunnel(spark,
      graft.ops.Sessionize.assignSessions(df), Seq("view", "click", "purchase"))
      .select("step_idx", "sessions_reached").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("windowedFunnel: per-step window gates conversion; a late restart converts where greedy would not") {
    import java.sql.Timestamp
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    val df = Seq(
      // u1: view@0, click@15min → outside the 10-min window → depth 1
      e(0, 1, "2024-01-01 00:00:00", "view"),
      e(1, 1, "2024-01-01 00:15:00", "click"),
      // u2: view@0, view@14min, click@20min — the greedy counter-case:
      // earliest view is stale, the RESTART view converts → depth 2
      e(10, 2, "2024-01-01 00:00:00", "view"),
      e(11, 2, "2024-01-01 00:14:00", "view"),
      e(12, 2, "2024-01-01 00:20:00", "click"),
      // u3: tight chain view→click→purchase all within window → depth 3
      e(20, 3, "2024-01-01 00:00:00", "view"),
      e(21, 3, "2024-01-01 00:05:00", "click"),
      e(22, 3, "2024-01-01 00:09:00", "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sess = graft.ops.Sessionize.assignSessions(df)
    val got = graft.ops.PageFunnel
      .windowedFunnel(spark, sess, Seq("view", "click", "purchase"), 600L)
      .select("step_idx", "sessions_reached").as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 3L), (2L, 2L), (3L, 1L)))
    // the unbounded funnel counts u1's late click too
    val unbounded = graft.ops.PageFunnel
      .orderedFunnel(spark, sess, Seq("view", "click", "purchase"))
      .select("step_idx", "sessions_reached").as[(Long, Long)]
      .collect().toSet
    assert(unbounded == Set((1L, 3L), (2L, 3L), (3L, 1L)))
  }

  test("windowedFunnel: one event cannot chain two steps (simultaneous DP update)") {
    import java.sql.Timestamp
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    // flow view→view: a single view must not count as both steps
    val one = Seq(e(0, 1, "2024-01-01 00:00:00", "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d1 = graft.ops.PageFunnel.windowedFunnel(spark,
      graft.ops.Sessionize.assignSessions(one), Seq("view", "view"), 600L)
      .select("step_idx", "sessions_reached").as[(Long, Long)].collect().toSet
    assert(d1 == Set((1L, 1L), (2L, 0L)))
    val two = Seq(
      e(0, 1, "2024-01-01 00:00:00", "view"),
      e(1, 1, "2024-01-01 00:01:00", "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d2 = graft.ops.PageFunnel.windowedFunnel(spark,
      graft.ops.Sessionize.assignSessions(two), Seq("view", "view"), 600L)
      .select("step_idx", "sessions_reached").as[(Long, Long)].collect().toSet
    assert(d2 == Set((1L, 1L), (2L, 1L)))
  }

  test("bm25KnownItem: exact MRR with a duplicate-content tie broken by doc_id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "aa bb cc", "en", "s", 8L),
      (20L, "aa bb cc", "en", "s", 8L), // identical text: same scores
      (30L, "xx yy zz", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ops.Retrieval
      .bm25KnownItem(docs, queryMod = 10L, queryTokens = 3, k = 10)
      .collect().head
    assert(r.getAs[Long]("n_queries") == 3L)
    assert(r.getAs[Long]("n_found") == 3L)
    assert(r.getAs[Long]("found_bp") == 10000L)
    // query 10 → rank 1 (id tie-break), query 20 → rank 2, query 30 → 1:
    // mrr = (10000 + 5000 + 10000) div 3
    assert(r.getAs[Long]("mrr_bp") == 8333L)
  }

  test("tokenSpectrum: log2 frequency bands with occurrence shares") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a a a b b c", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.Retrieval.tokenSpectrum(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 1428L),  // c ×1
      (1L, 1L, 2L, 2857L),  // b ×2
      (2L, 1L, 4L, 5714L))) // a ×4
  }

  test("bm25Ndcg: fixed-point discounts over known ranks; misses score 0") {
    val s2 = spark
    import s2.implicits._
    // outcomes injected directly: ranks 1, 2, miss -> gains 10^6,
    // 630929, 0; corpus nDCG = floor(1630929 / 3)
    val outcomes = Seq((10L, Some(1L)), (20L, Some(2L)), (30L, None))
      .toDF("query_id", "rank")
    val out = Retrieval.bm25Ndcg(outcomes /* unused */, k = 10,
      outcomes0 = Some(outcomes)).collect().head
    assert(out.getAs[Long]("n_queries") == 3L)
    assert(out.getAs[Long]("n_found") == 2L)
    assert(out.getAs[Long]("ndcg_ppm") == (1000000L + 630929L) / 3L)
  }

  test("known-item rollups over the shared outcomes artifact equal the standalone entries") {
    val s2 = spark
    import s2.implicits._
    val docsT = graft.tables.Tables(spark, sf, "documents")
    val o = Some(Retrieval.bm25KnownItemOutcomes(docsT, 10L, 3, 10, 50)
      .localCheckpoint())
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(Retrieval.bm25KnownItem(docsT, 10L, 3, 10, 50, o)) ==
      rows(Retrieval.bm25KnownItem(docsT, 10L, 3, 10, 50)))
    assert(rows(Retrieval.bm25Ndcg(docsT, 10L, 3, 10, 50, o)) ==
      rows(Retrieval.bm25Ndcg(docsT, 10L, 3, 10, 50)))
  }
}
