package graft

import org.apache.spark.sql.functions._

import graft.ops.{Contamination, TextAnalysis, TrainingPrep}
import graft.tables.Tables

class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", s"src${id % 4}", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- Contamination ----

  test("decontamination flags exactly the docs sharing an n-gram") {
    val bench = docs(100L -> "alpha beta gamma delta epsilon")
    val train = docs(
      1L -> "xx alpha beta gamma delta yy",          // shares the 4-gram
      2L -> "alpha beta zz gamma delta",             // only 2-grams shared
      3L -> "totally unrelated words here okay")
    val out = Contamination.flagged(train, bench, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }

  test("evalContamination: per-eval leak coverage; un-leaked items appear with zeros") {
    val bench = docs(
      100L -> "alpha beta gamma delta epsilon",  // grams: 2 (n=4)
      101L -> "one two three four five six")     // grams: 3, none leaked
    val train = docs(
      1L -> "xx alpha beta gamma delta yy",      // leaks "alpha beta gamma delta"
      2L -> "zz alpha beta gamma delta ww")      // leaks the same gram
    val out = Contamination.evalContamination(train, bench, n = 4)
      .collect().map(r => r.getAs[Long]("eval_doc_id") ->
        ((r.getAs[Long]("leaked_grams"), r.getAs[Long]("n_train_docs"),
          r.getAs[Long]("total_grams"), r.getAs[Long]("leak_bp")))).toMap
    assert(out(100L) == ((1L, 2L, 2L, 5000L))) // 1 of 2 grams, 2 train docs
    assert(out(101L) == ((0L, 0L, 3L, 0L)))    // visible zero row
  }

  test("decontamination counts DISTINCT overlapping grams per doc") {
    val bench = docs(100L -> "a b c d e")            // grams: "a b c", "b c d", "c d e"
    val train = docs(1L -> "a b c d e a b c")        // hits all 3 + repeats "a b c"
    val out = Contamination.flagged(train, bench, n = 3)
      .as[(Long, Long)].head()
    assert(out == ((1L, 3L)))
  }

  test("docs shorter than n tokens are never flagged and never bench grams") {
    val bench = docs(100L -> "a b")                  // < n ⇒ contributes nothing
    val train = docs(1L -> "a b c d")
    assert(Contamination.flagged(train, bench, n = 3).isEmpty)
  }

  test("null-text docs contribute nothing on either side") {
    val bench = docs(100L -> null, 101L -> "p q r s")
    val train = docs(1L -> null, 2L -> "x p q r s y")
    val out = Contamination.flagged(train, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 2L))                     // "p q r", "q r s"
  }

  test("bloomGate drops contaminated docs, passes clean/short/null ones") {
    val bench = docs(100L -> "alpha beta gamma delta epsilon zeta eta theta")
    val bloom = Contamination.benchBloom(bench, n = 8, expectedGrams = 1000L,
      fpp = 1e-6) // fpp tiny enough that this test never sees a false positive
    val train = docs(
      1L -> ("xx alpha beta gamma delta epsilon zeta eta theta yy"), // overlaps
      2L -> "clean words that never appeared in any benchmark doc at all",
      3L -> "short",                                                 // < n tokens
      4L -> null)
    val kept = Contamination.bloomGate(train, bloom, n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("bloomGate has NO false negatives vs the exact join on real testdata") {
    val d = graft.tables.Tables(spark, sf, "documents")
    val bench = d.filter(col("doc_id") % 5 === 0)
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val exactFlagged = Contamination.flagged(train, bench)
      .select("doc_id").as[Long].collect().toSet
    val bloomKept = Contamination.bloomGate(train,
        Contamination.benchBloom(bench))
      .select("doc_id").as[Long].collect().toSet
    // one-sided error: anything the exact join flags MUST be gone
    assert(exactFlagged.intersect(bloomKept).isEmpty)
  }

  // ---- packSequences ----

  test("packing assigns seq_id by the FIRST token's stream offset") {
    // one shard (ids ≡ 1 mod 8 deliberately avoided: use shards=1),
    // seqLen=10: doc1 has 6 tokens at offset 0, doc2 has 6 at offset 6
    // (straddles the cut but belongs to seq 0), doc3 starts at 12 ⇒ seq 1.
    val d = docs(
      1L -> "t1 t2 t3 t4 t5 t6",
      2L -> "u1 u2 u3 u4 u5 u6",
      3L -> "v1 v2 v3")
    val out = TrainingPrep.packSequences(d, shards = 1, seqLen = 10L)
      .select("doc_id", "shard", "token_count", "start_offset", "seq_id")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0L, 6L, 0L, 0L),
      (2L, 0L, 6L, 6L, 0L),
      (3L, 0L, 3L, 12L, 1L)))
  }

  test("packing offsets are per-shard streams, not global") {
    val d = docs(1L -> "a b c", 2L -> "d e f", 3L -> "g h i", 4L -> "j k l")
    // shards=2: ids 1,3 → shard 1; ids 2,4 → shard 0
    val out = TrainingPrep.packSequences(d, shards = 2, seqLen = 100L)
      .select("doc_id", "shard", "start_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 0L), (2L, 0L, 0L), (3L, 1L, 3L), (4L, 0L, 3L)))
  }

  // ---- chunk ----

  test("chunking produces overlapping windows that clamp at doc end") {
    val d = docs(1L -> (1 to 10).map(i => s"w$i").mkString(" "))
    val out = TrainingPrep.chunk(d, chunkTokens = 4, stride = 3)
      .as[(Long, Long, String)].collect().sortBy(_._2)
    // 10 tokens, C=4, S=3 ⇒ last_idx = ceil((10-4)/3) = 2 ⇒ 3 chunks
    assert(out.toSeq == Seq(
      (1L, 0L, "w1 w2 w3 w4"),
      (1L, 1L, "w4 w5 w6 w7"),
      (1L, 2L, "w7 w8 w9 w10")))
  }

  test("a doc shorter than one chunk yields exactly one whole-doc chunk") {
    val out = TrainingPrep.chunk(docs(1L -> "a b"), chunkTokens = 4, stride = 3)
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 0L, "a b")))
  }

  test("an exact-multiple doc does not emit a trailing empty chunk") {
    // 7 tokens, C=4, S=3: last_idx = 1, chunk 1 = tokens 4..7 — and NOT
    // a third chunk at offset 6 that would hold only token 7.
    val d = docs(1L -> "a b c d e f g")
    val out = TrainingPrep.chunk(d, chunkTokens = 4, stride = 3)
      .as[(Long, Long, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 0L, "a b c d"), (1L, 1L, "d e f g")))
  }

  // ---- epochMix ----

  test("split is deterministic, exhaustive, and proportioned train >> val/test") {
    val d = graft.tables.Tables(spark, sf, "documents")
    val s = graft.ops.TrainingPrep.split(d, 9000L, 500L)
    assert(s.count() == d.count())
    val byS = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > byS("val") * 5 && byS("train") > byS("test") * 5)
    // re-evaluation assigns identically (layout-independent arithmetic)
    assert(s.select("doc_id", "split").exceptAll(
      graft.ops.TrainingPrep.split(d, 9000L, 500L).select("doc_id", "split")).isEmpty)
  }

  test("split lands NEGATIVE doc_ids in [0,10000) like the oracle's double-pmod") {
    val s = spark
    import s.implicits._
    // hash-minted ids (DocFiles xxhash64) are ~half negative — the
    // oracle twin is (((id % 1000003 + 1000003) % 1000003) * 48271
    // + 12345) % 10000, verified here against the Spark assignment.
    val ids = Seq(-1L, -42L, Long.MinValue + 1, -987654321098765L, 7L)
    val d = ids.map(i => (i, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TrainingPrep.split(d, 9000L, 500L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    def oracleBp(id: Long): Long =
      ((id % 1000003L + 1000003L) % 1000003L * 48271L + 12345L) % 10000L
    ids.foreach { i =>
      val bp = oracleBp(i)
      assert(bp >= 0L && bp < 10000L)
      val want = if (bp < 9000L) "train" else if (bp < 9500L) "val" else "test"
      assert(got(i) == want, s"doc_id=$i bp=$bp")
    }
  }

  test("splitLeakage: cross-split near-dup pairs surface; agrees with pairs × splitCol recompute") {
    val d = graft.tables.Tables(spark, sf, "documents")
    val got = graft.ops.TrainingPrep.splitLeakage(d, 9000L, 500L)
      .collect()
      .map(r => (r.getAs[String]("split_lo"), r.getAs[String]("split_hi")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("max_jaccard_bp"),
          r.getAs[Long]("is_cross"))).toMap
    // independent recompute: the q22 pair list + the split formula
    // applied in plain JVM arithmetic
    def splitOf(id: Long): String = {
      val bp = ((id % 1000003L + 1000003L) % 1000003L * 48271L + 12345L) % 10000L
      if (bp < 9000L) "train" else if (bp < 9500L) "val" else "test"
    }
    val pairs = graft.ops.Dedup.minhashDedupPairs(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp")))
    val expect = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      k -> (ps.length.toLong, ps.map(_._3).max, if (k._1 == k._2) 0L else 1L)
    }
    assert(got == expect)
    assert(got.nonEmpty) // the sf0.001 corpus has near-dup pairs
    // every key is consistent: is_cross == (lo != hi)
    got.foreach { case ((lo, hi), (_, _, x)) =>
      assert(x == (if (lo == hi) 0L else 1L)) }
  }

  test("source cap (exact): at most cap docs per source, deterministic, rank-pushed") {
    val d = graft.tables.Tables(spark, sf, "documents")
    val out = TrainingPrep.sourceCapExact(d, cap = 7)
    val perSrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSrc.nonEmpty && perSrc.values.forall(_ <= 7L))
    // every source with >= 7 docs is capped at exactly 7
    val totals = d.groupBy("source").count().as[(String, Long)].collect().toMap
    totals.foreach { case (s, n) =>
      assert(perSrc.getOrElse(s, 0L) == math.min(n, 7L), s)
    }
    // rerun-stable survivors (layout-independent md5 draw)
    assert(out.select("doc_id").exceptAll(
      TrainingPrep.sourceCapExact(d, 7).select("doc_id")).isEmpty)
    // WindowGroupLimit: map tasks forward at most cap rows per group
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("source cap (rate): kept count tracks cap, survivors are rerun-stable") {
    val d = graft.tables.Tables(spark, sf, "documents")
    val cap = 20L
    val out = TrainingPrep.sourceCapRate(d, cap).cache()
    val kept = out.filter(col("keep") === 1)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // binomial around cap: allow ±4·sqrt(cap) (±18) per source
    kept.foreach { case (s, n) =>
      assert(math.abs(n - cap) <= 18, s"$s kept $n vs cap $cap")
    }
    // a source smaller than the cap keeps everything (threshold >= 2^32)
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "a", "solo"), (2L, "b", "solo"))
      .toDF("doc_id", "text", "source")
    assert(TrainingPrep.sourceCapRate(tiny, cap = 5L)
      .filter(col("keep") === 1).count() == 2L)
    // rerun-stable: identical keep verdicts
    assert(out.exceptAll(TrainingPrep.sourceCapRate(d, cap)).isEmpty)
    out.unpersist()
  }

  test("epoch replication honors per-source weights incl. 0 and default") {
    val d = docs(0L -> "a", 1L -> "b", 2L -> "c", 3L -> "d") // sources src0..src3
    val out = TrainingPrep.epochMix(d,
        Map("src0" -> 3, "src1" -> 1, "src2" -> 0), default = 2)
      .groupBy("source").agg(count(lit(1)).as("n"), max("epoch").as("maxe"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("src0", 3L, 3L), ("src1", 1L, 1L), ("src3", 2L, 2L)))
  }

  test("shardShuffle: dense per-shard positions, full coverage, null-text dropped") {
    val d = docs((1L to 50L).map(i => i -> s"text $i"): _*)
      .union(docs(99L -> null))
    val out = TrainingPrep.shardShuffle(d, shards = 4)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == (1L to 50L).toSet) // 99 (null text) gone
    assert(out.forall(r => r._2 >= 0 && r._2 < 4))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
  }

  test("shardShuffle: repartition-invariant and decorrelated from id-mod sharding") {
    val d = docs((1L to 64L).map(i => i -> s"text $i"): _*)
    val a = TrainingPrep.shardShuffle(d, shards = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val b = TrainingPrep.shardShuffle(d.repartition(7), shards = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a == b)
    // the md5 draw must not echo doc_id % shards (a shuffle whose
    // shards follow ingest order isn't a shuffle)
    assert(a.exists { case (id, (shard, _)) => shard != id % 4 })
    // and within a shard, position order must not echo id order
    val inOrder = a.toSeq.filter(_._2._1 == a(1L)._1).sortBy(_._2._2).map(_._1)
    assert(inOrder != inOrder.sorted, s"shard order echoes id order: $inOrder")
  }

  test("tokenizerFertility: hand-computed ratios; whitespace-only text guarded") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "ab cd", "en", "s", 0L),      // words 2, btoks [ab, cd] = 2
      (2L, "x, y!", "en", "s", 0L),      // words 2, btoks [x , y !] = 4
      (3L, "   ", "zz", "s", 0L),        // 4 empty words, 0 btoks
      (4L, null, "en", "s", 0L))         // dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TextAnalysis.tokenizerFertility(d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en: docs 2, words 4, btoks 6, chars 10 → fertility 15000, cpt 16666
    assert(out("en") == (("en", 2L, 4L, 6L, 10L, 15000L, 16666L)))
    // zz: fertility 0, chars_per_token guarded to -1 (not inf/null)
    assert(out("zz") == (("zz", 1L, 4L, 0L, 3L, 0L, -1L)))
  }

  test("lengthHistogram: exact log2 buckets at power-of-two boundaries; shares per source") {
    val s = spark
    import s.implicits._
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      (1L, text(1), "en", "s1", 0L),   // bucket 0
      (2L, text(7), "en", "s1", 0L),   // bucket 2
      (3L, text(8), "en", "s1", 0L),   // bucket 3 — the boundary libm gets wrong
      (4L, text(9), "en", "s1", 0L),   // bucket 3
      (5L, text(1024), "en", "s2", 0L), // bucket 10
      (6L, null, "en", "s2", 0L))      // dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.TextAnalysis.lengthHistogram(d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(
      ("s1", 0L) -> ((1L, 1L, 2500L)),
      ("s1", 2L) -> ((1L, 7L, 2500L)),
      ("s1", 3L) -> ((2L, 17L, 5000L)),
      ("s2", 10L) -> ((1L, 1024L, 10000L))))
  }

  test("languageMix: sqrt smoothing upweights the tail language; exact arithmetic") {
    val s = spark
    import s.implicits._
    // en: 100 tokens, de: 4 tokens, null lang: 1 token, null text ignored
    val d = (
      (1 to 10).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "en")) ++
      Seq((90L, "w w w w", "de"), (91L, "w", null.asInstanceOf[String]),
          (92L, null.asInstanceOf[String], "en"))
    ).toDF("doc_id", "text", "lang")
    val out = TrainingPrep.languageMix(d, budgetTokens = 10000L)
      .select("lang", "tokens", "raw_bp", "target_bp", "sampled_tokens")
      .as[(Option[String], Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // w: en=10, de=2, null=1 → total_w 13, total_tokens 105
    assert(out(Some("en")) == ((100L, 9523L, 7692L, 7692L)))
    assert(out(Some("de")) == ((4L, 380L, 1538L, 1538L)))
    assert(out(None) == ((1L, 95L, 769L, 769L)))
    // smoothing property: every tail language's share rises, the head's falls
    assert(out(Some("de"))._3 > out(Some("de"))._2)
    assert(out(None)._3 > out(None)._2)
    assert(out(Some("en"))._3 < out(Some("en"))._2)
  }

  // ---- DSIR importance scoring ----

  test("flog2Ratio is the exact floor(log2(a/b)) across power-of-two boundaries") {
    val cases = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (7L, 2L), (8L, 2L), (9L, 2L),
      (1L, 65536L), (65536L, 1L), (12345L, 99999L), (99999L, 12345L),
      (1L, 65537L), (3L, 1L), (4L, 1L), (1L << 40, 3L), (3L, 1L << 40))
    val got = cases.toDF("a", "b")
      .select(TrainingPrep.flog2Ratio(col("a"), col("b")).as("f"))
      .as[Int].collect()
    val want = cases.map { case (a, b) =>
      math.floor(math.log(a.toDouble / b) / math.log(2.0)).toInt
    }
    assert(got.toSeq == want)
  }

  test("dsirScore ranks target-vocabulary docs above off-target docs") {
    val target = docs(
      100L -> "quantum flux capacitor resonance chamber",
      101L -> "flux resonance quantum capacitor field")
    val raw = docs(
      1L -> "quantum flux capacitor resonance field", // target-like
      2L -> "banana smoothie recipe with yogurt",     // off-target
      3L -> "quantum banana flux smoothie field")     // mixed
    val s = TrainingPrep.dsirScore(raw, target)
      .select("doc_id", "dsir_score").as[(Long, Long)].collect().toMap
    assert(s.keySet == Set(1L, 2L, 3L))
    assert(s(1L) > s(3L) && s(3L) > s(2L))
  }

  test("dsirScore survives an empty target (smoothing floor only)") {
    val raw = docs(1L -> "alpha beta", 2L -> "gamma delta")
    val out = TrainingPrep.dsirScore(raw, docs().limit(0))
    assert(out.count() == 2L)
    // with t_cnt ≡ 0 every weight is flog2(1, B) − flog2(r_cnt+1, r_tot+B):
    // strictly negative-or-zero minus a larger-ratio term — finite, no nulls
    assert(out.filter(col("dsir_score").isNull).count() == 0L)
  }

  // ---- budgetSelect ----

  private def scored(rows: (Long, Long, Long)*) =
    rows.toDF("doc_id", "token_count", "score")

  private def md5hex(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("budgetSelect: full classes above the threshold, md5-draw greedy fill of the boundary class") {
    // class 10: 5 tokens (full at budget 12); class 8: two 5-token docs
    // (cum_before 5, 5+10 > 12 → boundary, remaining 7 fits exactly one);
    // class 5: never reached
    val in = scored((1L, 5L, 10L), (2L, 5L, 8L), (3L, 5L, 8L), (4L, 100L, 5L))
    val out = TrainingPrep.budgetSelect(in, budgetTokens = 12L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("reason")).toMap
    val firstByDraw = Seq(2L, 3L).minBy(id => (md5hex(id), id))
    assert(out == Map(1L -> "full", firstByDraw -> "boundary"))
  }

  test("budgetSelect: budget covering everything keeps everything as full classes") {
    val in = scored((1L, 5L, 10L), (2L, 7L, 8L), (3L, 9L, 3L))
    val out = TrainingPrep.budgetSelect(in, budgetTokens = 21L).collect()
    assert(out.length == 3 && out.forall(_.getAs[String]("reason") == "full"))
  }

  test("budgetSelect: budget below the first document selects nothing, and never overshoots") {
    val in = scored((1L, 5L, 10L), (2L, 7L, 8L))
    assert(TrainingPrep.budgetSelect(in, budgetTokens = 2L).count() == 0L)
    // invariant on the fixture query: Σ tokens ≤ budget
    val sel = Queries.budgetSelect(spark, sf)
      .agg(sum("token_count")).as[Long].head()
    assert(sel <= Queries.SelectBudgetTokens)
  }

  // ---- packingEfficiency ----

  test("packingEfficiency agrees with packSequences: n_seqs covers exactly the packed stream") {
    val d = docs((1L to 17L).map(i =>
      i -> (1 to (i % 5 + 1).toInt).map(j => s"t$j").mkString(" ")): _*)
    val eff = TrainingPrep.packingEfficiency(d, shards = 4, seqLen = 3L)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("tokens"), r.getAs[Long]("n_seqs"),
          r.getAs[Long]("tail_waste"), r.getAs[Long]("utilization_bp")))).toMap
    val packed = TrainingPrep.packSequences(d, shards = 4, seqLen = 3L)
      .groupBy("shard")
      .agg(sum("token_count").as("t"), max("seq_id").as("m"))
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("t"), r.getAs[Long]("m")))).toMap
    packed.foreach { case (sh, (t, maxSeq)) =>
      val (tokens, nSeqs, waste, util) = eff(sh)
      assert(tokens == t, s"shard $sh tokens")
      // the stream cut's last sequence holds the stream tail: the
      // report's ceil count can exceed the last START seq by at most
      // one (a doc starting in seq k may spill into k+1)
      assert(nSeqs >= maxSeq + 1 && nSeqs * 3L >= t && (nSeqs - 1) * 3L < t,
        s"shard $sh seqs")
      assert(waste == nSeqs * 3L - t)
      assert(util == math.floor(10000.0 * t / (nSeqs * 3L)).toLong)
    }
  }

  // ---- shardMixing ----

  /** The q107/q118 shard assignment recomputed in plain JVM code. */
  private def shardOf(id: Long, shards: Int): Long =
    java.lang.Long.parseLong(md5hex(id).substring(0, 8), 16) % shards

  test("shardMixing: single-source corpus — populated shards sit at TVD 0, empty shards at the maximal 5000") {
    val in = (1L to 20L).map(i => (i, "w1 w2 w3")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("only"))
      .withColumn("n_chars", lit(0L))
    val s = 4
    val out = TrainingPrep.shardMixing(in, s).collect()
      .map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("tvd_bp"), r.getAs[Long]("max_dev_bp")))).toMap
    assert(out.keySet == (0L until s).toSet) // dense: every shard reports
    val expectedDocs = (1L to 20L).groupBy(shardOf(_, s))
      .view.mapValues(_.size.toLong).toMap
    out.foreach { case (sh, (nd, tok, tvd, maxDev)) =>
      assert(nd == expectedDocs.getOrElse(sh, 0L), s"shard $sh docs")
      assert(tok == nd * 3, s"shard $sh tokens")
      if (nd > 0) { assert(tvd == 0L && maxDev == 0L, s"shard $sh") }
      else { assert(tvd == 5000L && maxDev == 10000L, s"empty shard $sh") }
    }
  }

  test("shardMixing: a source confined to one shard raises the OTHER shards' TVD via the dense grid") {
    val s = 2
    val ids = (1L to 400L)
    val shard0 = ids.filter(shardOf(_, s) == 0L).take(8)
    val shard1 = ids.filter(shardOf(_, s) == 1L).take(8)
    assert(shard0.size == 8 && shard1.size == 8)
    // "mixed" lives on both shards; "confined" only on shard 0
    val confined = (1000001L to 1000400L).filter(shardOf(_, s) == 0L).take(8)
    assert(confined.size == 8)
    val rows =
      shard0.map(id => (id, "a a a a", "mixed")) ++
      shard1.map(id => (id, "a a a a", "mixed")) ++
      confined.map(id => (id, "b b b b", "confined"))
    val in = rows.toSeq.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", lit(0L))
    val out = TrainingPrep.shardMixing(in, s).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("tvd_bp")).toMap
    // shard 1 carries zero "confined" tokens: its TVD must include the
    // source's whole global share (the dense-grid contribution)
    assert(out(1L) > 0L, s"dense grid lost the absent source: $out")
  }

  test("shardMixing conserves docs and tokens against the corpus") {
    val docsT = Tables(spark, sf, "documents").filter(col("text").isNotNull)
    val out = TrainingPrep.shardMixing(docsT, 8)
    val (d, t) = out.agg(sum("n_docs"), sum("tokens"))
      .as[(Long, Long)].head()
    val want = docsT.agg(
      count(lit(1)), sum(size(split(col("text"), " ")).cast("long")))
      .as[(Long, Long)].head()
    assert((d, t) == want)
  }

  // ---- thresholdSweep ----

  test("thresholdSweep: hand-computed buckets, descending cumulative, negative-score floor") {
    val in = scored(
      (1L, 10L, -3000L), // floor(-3000/1024) = -3 (truncation would say -2)
      (2L, 20L, -1L),    // bucket -1
      (3L, 30L, 0L),     // bucket 0
      (4L, 40L, 1500L),  // bucket 1
      (5L, 50L, 2048L))  // bucket 2
    val out = TrainingPrep.thresholdSweep(in, 1024L).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("min_score"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("docs_kept"), r.getAs[Long]("tokens_kept")))).toMap
    assert(out(-3L) == ((-3072L, 1L, 5L, 150L))) // keeps everything
    assert(out(-1L) == ((-1024L, 1L, 4L, 140L)))
    assert(out(0L) == ((0L, 1L, 3L, 120L)))
    assert(out(1L) == ((1024L, 1L, 2L, 90L)))
    assert(out(2L) == ((2048L, 1L, 1L, 50L))) // strictest threshold
  }

  test("thresholdSweep rejects a non-dyadic bucket width") {
    intercept[IllegalArgumentException] {
      TrainingPrep.thresholdSweep(scored((1L, 1L, 1L)), 1000L)
    }
  }

  test("compactionPlan: BIGINT ceil file counts; empty-byte source still gets one file") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "t", "en", "big", 3000L), (2L, "t", "en", "big", 2000L),
      (3L, "t", "en", "exact", 2048L),
      (4L, "", "en", "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TrainingPrep.compactionPlan(d, targetBytes = 2048L).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("bytes"), r.getAs[Long]("n_files"),
          r.getAs[Long]("rows_per_file")))).toMap
    assert(out("big") == ((5000L, 3L, 0L)))   // ceil(5000/2048)=3; 2 div 3 = 0
    assert(out("exact") == ((2048L, 1L, 1L))) // boundary: exactly one file
    assert(out("empty") == ((0L, 1L, 1L)))    // min-1-file floor
  }

  test("recencySample: dyadic half-life thresholds, future events excluded, old tail zeroed") {
    val s = spark
    import s.implicits._
    val asOf = "2024-03-01"
    def e(id: Long, day: String) =
      (id, java.sql.Timestamp.valueOf(s"$day 12:00:00"), 1L, "view", 1.0, "{}")
    val evs = Seq(
      e(1, "2024-03-01"),  // age 0  → keep_bp 10000 (always kept)
      e(2, "2024-02-23"),  // age 7  → keep_bp 5000
      e(3, "2024-02-09"),  // age 21 → keep_bp 1250
      e(4, "2023-11-01"),  // age 121 → ≥14 half-lives → keep_bp 0
      e(5, "2024-03-05"))  // future → filtered before the gate
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = TrainingPrep.recencySample(evs, asOf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("age_days"), r.getAs[Long]("keep_bp")))).toMap
    assert(!out.contains(4L) && !out.contains(5L))
    // JVM-recomputed draws decide which of 1-3 survive
    def drawBp(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id).substring(0, 8), 16) % 10000L
    val expectKeep = Seq(1L -> 10000L, 2L -> 5000L, 3L -> 1250L)
      .filter { case (id, bp) => drawBp(id) < bp }.toMap
    assert(out.view.mapValues(_._2).toMap == expectKeep)
    out.get(2L).foreach { case (age, _) => assert(age == 7L) }
  }

  test("contributorCap keeps exactly the k smallest draws per user, repartition-invariant") {
    val s = spark
    import s.implicits._
    val evs = (1L to 30L).map(id =>
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        id % 3, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = TrainingPrep.contributorCap(evs, k = 4)
      .select("user_id", "event_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L to 2L).foreach { u =>
      val want = (1L to 30L).filter(_ % 3 == u)
        .sortBy(id => (md5hex(id), id)).take(4).toSet
      assert(got(u) == want, s"user $u")
    }
    val re = TrainingPrep.contributorCap(evs.repartition(7), k = 4)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // .toSeq first: flatMap on a Map would collapse same-key pairs
    assert(re == got.toSeq.flatMap { case (u, ids) => ids.map(u -> _) }.toSet)
  }

  test("preferencePairs: extremes match the classifier ranking; every pair has a strict margin") {
    val docsT = Tables(spark, sf, "documents")
    val k = 3
    val out = TrainingPrep.preferencePairs(docsT, k).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("chosen_score") > r.getAs[Long]("rejected_score"))
      assert(r.getAs[Long]("margin") ==
        r.getAs[Long]("chosen_score") - r.getAs[Long]("rejected_score"))
    }
    // independent recompute of the per-source extremes from the q69 scorer
    val scored = TextAnalysis.qualityClassifier(docsT)
      .join(docsT.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("doc_id"), col("score"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val all = scored(src).map(t => (t._2, t._3))
      val top = all.sortBy { case (id, sc) => (-sc, id) }.take(k).map(_._1).toSet
      val bot = all.sortBy { case (id, sc) => (sc, id) }.take(k).map(_._1).toSet
      assert(rows.map(_.getAs[Long]("chosen_doc_id")).toSet.subsetOf(top), src)
      assert(rows.map(_.getAs[Long]("rejected_doc_id")).toSet.subsetOf(bot), src)
      assert(rows.length <= k * k, src)
    }
  }

  test("thresholdSweep: kept shares are monotone and end at 10000 bp") {
    val out = TrainingPrep.thresholdSweep(
      TextAnalysis.qualityClassifier(Tables(spark, sf, "documents")),
      Queries.SweepBucketWidth)
      .orderBy(col("bucket").desc)
      .select(col("docs_kept_bp"), col("tokens_kept_bp"))
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.sliding(2).foreach {
      case Array((d1, t1), (d2, t2)) => assert(d1 <= d2 && t1 <= t2)
      case _ =>
    }
    assert(out.last == ((10000L, 10000L)))
  }

  test("churnFeatures: time-split leakage boundary, exact features, horizon label") {
    val s = spark
    import s.implicits._
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val events = Seq(
      // user 1: 2 pre-split days, one purchase; returns in horizon
      (1L, t("2024-01-10 10:00:00"), 1L, "view", 0.0),
      (2L, t("2024-01-15 10:00:00"), 1L, "purchase", 12.5),
      (3L, t("2024-01-22 10:00:00"), 1L, "click", 0.0),
      // user 2: pre-split only → label 0
      (4L, t("2024-01-18 10:00:00"), 2L, "click", 0.0),
      // user 3: event AT the split instant — label side, NOT features;
      // with no pre-split history the user is excluded entirely
      (5L, t("2024-01-20 00:00:00"), 3L, "view", 0.0),
      // user 4: returns AFTER the horizon → label 0
      (6L, t("2024-01-19 10:00:00"), 4L, "view", 0.0),
      (7L, t("2024-02-05 10:00:00"), 4L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.ops.TrainingPrep
      .churnFeatures(events, "2024-01-20", horizonDays = 11)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_days"),
          r.getAs[Long]("n_purchases"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("recency_days"), r.getAs[Long]("label"))))
    assert(got.toSeq == Seq(
      1L -> ((2L, 2L, 1L, 1250L, 5L, 1L)),
      2L -> ((1L, 1L, 0L, 0L, 2L, 0L)),
      4L -> ((1L, 1L, 0L, 0L, 1L, 0L)))) // Feb 5 is past Jan 31
  }
}
