package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set — the standard
  * pre-training hygiene pass (n-gram overlap, GPT-3 appendix C /
  * Llama style) that keeps eval answers out of the training corpus.
  *
  * Scale shape (the reason this is join-shaped and not pairwise): the
  * benchmark side is small by nature (eval suites are MBs, the corpus
  * is TBs), so its distinct gram hashes BROADCAST. The training side
  * is a pure map stage (tokenize → gram → hash) filtered by the
  * broadcast semi-join at the scan — only matched grams, a vanishing
  * fraction, ever reach the one (doc_id, gram-hash) shuffle for the
  * per-doc distinct count. The corpus is never shuffled whole, never
  * self-joined.
  *
  * Grams are 64-bit-hashed INTERNALLY on both join sides (the key
  * never meets the oracle, which joins raw strings); a false hit
  * needs an xxhash64 collision between a train and an eval gram —
  * P < 1e-9 at 1e5 grams, and at 100 TB a collision flags one extra
  * doc, it does not corrupt the kept corpus.
  */
object Contamination {

  /** One row per (doc_id, word n-gram); whitespace tokens via the
    * shared tokenizer so the DuckDB twin reproduces grams exactly.
    * Docs shorter than n tokens contribute nothing (cannot overlap). */
  def wordGrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .withColumn("__t", expr(TextAnalysis.TokensExpr))
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(__t) - ${n - 1}), " +
          s"i -> array_join(slice(__t, i, $n), ' '))")).as("gram"))

  /** One row per (doc_id, 64-bit gram hash) — `wordGrams` without the
    * strings: the fused TokenGramHash expression emits hashes
    * directly (n-grams shorter than n ⇒ empty array ⇒ no rows), so
    * the corpus-side map stage allocates no gram strings at all. */
  def gramHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.expressions.TokenGramHash.grams(
          expr(TextAnalysis.TokensExpr), n)).as("gh"))

  /** Training docs with ≥1 gram overlapping the benchmark set, with
    * the distinct-overlap count (triage signal: 1 hit ≈ idiom, 100
    * hits ≈ verbatim leak). */
  def flagged(train: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val benchGrams = gramHashes(benchmark, n).select(col("gh")).distinct()
    gramHashes(train, n)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_hits"))
  }

  /** Benchmark-side triage — the REVERSE direction of [[flagged]]:
    * instead of "which training docs must go", "which EVAL items are
    * compromised and by how much" (the report an eval owner reads
    * before trusting a score; a fully-leaked item invalidates the
    * metric even after the training doc is dropped from the NEXT
    * run). Per eval doc: distinct leaked grams, distinct training
    * docs carrying them, total grams, and leak coverage in bp.
    *
    * Scale shape: both eval-side frames are broadcast (eval suites
    * are MBs); the corpus is one map stage filtered AT THE JOIN by
    * the broadcast gram set, so only matched (gram, train-doc) rows
    * — a vanishing fraction — reach the two bounded aggregates.
    * Un-leaked eval docs appear with zeros (left join): absence of
    * evidence must be a visible row, not a missing one. */
  def evalContamination(train: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val bg = gramHashes(benchmark, n)
      .select(col("doc_id").as("eval_doc_id"), col("gh")).distinct()
    val hits = gramHashes(train, n)
      .join(broadcast(bg.select(col("gh")).distinct()), Seq("gh"))
      .select(col("gh"), col("doc_id").as("train_doc_id")).distinct()
    val perEval = bg.join(hits, Seq("gh"))
      .groupBy(col("eval_doc_id"))
      .agg(countDistinct(col("gh")).as("leaked_grams"),
        countDistinct(col("train_doc_id")).as("n_train_docs"))
    bg.groupBy(col("eval_doc_id")).agg(count(lit(1)).as("total_grams"))
      .join(perEval, Seq("eval_doc_id"), "left")
      .na.fill(0L, Seq("leaked_grams", "n_train_docs"))
      .withColumn("leak_bp",
        floor(lit(10000.0) * col("leaked_grams") / col("total_grams"))
          .cast("long"))
  }

  /** Fuzzy decontamination: training documents MinHash-LSH-similar to
    * an eval document — the near-dup complement of [[flagged]]'s
    * exact n-gram overlap (a paraphrased or lightly-edited eval leak
    * shares few verbatim 8-grams but most of its shingle set; modern
    * pipeline hygiene runs BOTH gates). Candidates share an LSH band
    * with an eval doc; verification is directional containment of the
    * EVAL shingle set in the training doc (the right asymmetry: a
    * long train doc that embeds a whole eval item must flag even
    * though symmetric Jaccard is tiny). Emits qualifying pairs
    * (doc_id, eval_doc_id, inter, size_eval, cont_bp ≥ thresholdBp).
    *
    * Scale shape: the benchmark side (bands + shingles) is broadcast
    * twice — eval suites are MBs against a TB corpus, same contract
    * as [[flagged]]. The training corpus is scanned ONCE: its shingle
    * sets ride through the band join as a carried column, so rows
    * that match no eval band — all but a vanishing fraction — die in
    * the map stage, and only matched rows shuffle (for the per-pair
    * band dedup). No corpus self-join, no second corpus pass. */
  def fuzzyFlagged(train: DataFrame, benchmark: DataFrame,
      thresholdBp: Long = 8000L): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val evalSig = Dedup.minhashSignature(benchmark)
    val evalBands = Dedup.lshBands(evalSig)
      .select(col("doc_id").as("eval_doc_id"), col("band"), col("band_hash"))
    val trainBands = Dedup.lshBands(Dedup.minhashSignature(train),
      keep = Seq("shingles"))
    val cand = trainBands
      .join(broadcast(evalBands), Seq("band", "band_hash"))
      // a pair can match in several bands: dedup at pair grain; the
      // carried shingle array is doc_id-determined so it rides the
      // grouping key (still an UnsafeRow hash aggregate) instead of
      // forcing an object-buffer aggregate
      .select(col("doc_id"), col("eval_doc_id"), col("shingles").as("sh_t"))
      .distinct()
    cand
      .join(broadcast(evalSig.select(col("doc_id").as("eval_doc_id"),
        col("shingles").as("sh_e"))), "eval_doc_id")
      .withColumn("inter",
        size(array_intersect(col("sh_t"), col("sh_e"))).cast("long"))
      .withColumn("size_eval", size(col("sh_e")).cast("long"))
      .withColumn("cont_bp",
        when(col("size_eval") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("inter") / col("size_eval"))
            .cast("long")))
      .filter(col("cont_bp") >= thresholdBp)
      .select(col("doc_id"), col("eval_doc_id"), col("inter"),
        col("size_eval"), col("cont_bp"))
  }

  // ---- streaming-safe Bloom gate ----------------------------------
  //
  // A stream can't run the exact join above (doc-grain regroup after
  // a stream-side explode would need unbounded state, and stream-
  // static ANTI join isn't supported), so the ingestion-time gate is
  // the classic runtime-filter shape instead: a Bloom filter over the
  // benchmark gram hashes, probed PER ROW with zero shuffle and zero
  // state. One-sided error only — a contaminated doc is NEVER let
  // through; a false positive drops a clean doc at the configured fpp
  // (1% default), the right trade for a training-data gate. The probe
  // is Spark's own codegen'd BloomFilterMightContain — the expression
  // behind runtime join pruning — not a UDF.

  /** Build the benchmark-side Bloom filter (a broadcast-class object:
    * ~1.2 MB per 1M grams at 1% fpp; size it with `expectedGrams`). */
  def benchBloom(benchmark: DataFrame, n: Int = 8,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): BloomFilter = {
    val grams = gramHashes(benchmark, n)
    // Spark's stat.bloomFilter NPEs on an empty frame (its aggregate
    // returns null) — a benchmark with no long-enough docs is a valid
    // input and must yield the match-nothing filter.
    if (grams.isEmpty) BloomFilter.create(expectedGrams, fpp)
    else grams.stat.bloomFilter("gh", expectedGrams, fpp)
  }

  /** Drop rows whose text shares (by Bloom membership) any word
    * n-gram with the benchmark. Pure projection + filter — safe on
    * batch and streaming frames alike. Null/short texts have no
    * grams and pass through (the quality gates own that judgment). */
  def bloomGate(docs: DataFrame, bloom: BloomFilter, n: Int = 8): DataFrame = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    def mightContain(v: Column): Column = GraftSql.column(
      BloomFilterMightContain(Literal(bytes, BinaryType), GraftSql.expression(v)))
    // null text ⇒ no grams ⇒ must PASS (the quality gates own that
    // judgment), so guard before the expression (whose null in would
    // null the filter predicate and silently drop the row)
    val hashes = when(col("text").isNotNull,
      graft.expressions.TokenGramHash.grams(expr(TextAnalysis.TokensExpr), n))
      .otherwise(typedlit(Seq.empty[Long]))
    docs
      .withColumn("__gh", hashes)
      .filter(!exists(col("__gh"), mightContain))
      .drop("__gh")
  }

  /** Embedding-space decontamination census — the SEMANTIC tier of
    * the ladder ([[flagged]] = exact n-grams, [[fuzzyFlagged]] =
    * MinHash lexical near-dups, this = meaning): a training doc
    * whose EMBEDDING sits within `tauBp` cosine of a benchmark doc
    * leaks the answer even after paraphrase, which neither lexical
    * tier can see. Benchmark set = the deterministic id sample (the
    * q308 probe convention — stands in for a held-out eval suite);
    * per SOURCE: how many of its docs are semantically contaminated
    * and how close the worst one sits.
    *
    * Scale shape: benchmark probes broadcast against one corpus
    * scan of the shared ANN artifact (integer cosine, the house
    * quantized dot); per-doc max collapses on the scoring pass;
    * source-grain output. At 100 TB the probe side is the eval
    * suite — thousands of rows — so the scoring pass is one linear
    * scan, never corpus².
    *
    * Columns: source, n_docs (non-benchmark docs), n_contaminated,
    * rate_bp, max_cos_bp. */
  def semanticDecontamination(emb: DataFrame, docs: DataFrame,
      evalMod: Long = 10L, tauBp: Long = 9000L,
      quant0: Option[DataFrame] = None): DataFrame = {
    require(evalMod >= 1L, "evalMod >= 1")
    // standalone path: quantized WITHOUT the sign bucket (cosine
    // needs no LSH, and the bucket hard-fails sub-SignBits vectors)
    val q = quant0.getOrElse(Similarity.quantized(emb)
      .select(col("vec_id"), col("q"), col("n2")))
    val probes = q.filter(col("vec_id") % evalMod === 0L)
      .select(col("vec_id").as("eval_id"), col("q").as("q_q"),
        col("n2").as("q_n2"))
    val worst = q.filter(col("vec_id") % evalMod =!= 0L)
      .select(col("vec_id"), col("q"), col("n2"))
      .crossJoin(broadcast(probes))
      .withColumn("cos_bp", Similarity.cosBp(
        Similarity.dotExpr("q", "q_q"), col("n2"), col("q_n2")))
      .groupBy(col("vec_id"))
      .agg(max(col("cos_bp")).as("max_cos"))
    docs.filter(col("source").isNotNull && col("doc_id") % evalMod =!= 0L)
      .select(col("doc_id").as("vec_id"), col("source"))
      .join(worst, Seq("vec_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((coalesce(col("max_cos"), lit(-10001L)) >= tauBp)
          .cast("long")).as("n_contaminated"),
        max(col("max_cos")).as("max_cos_bp"))
      .withColumn("rate_bp", expr("(10000 * n_contaminated) DIV n_docs"))
      .select(col("source"), col("n_docs"), col("n_contaminated"),
        col("rate_bp"), col("max_cos_bp"))
      .orderBy(col("source").asc)
  }
}
