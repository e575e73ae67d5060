package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (`doc_id, text, lang, source, n_chars`).
  *
  * All metrics are integers or basis points (`FLOOR(10000*a/b)`) so the
  * DuckDB oracle hashes bit-identically (SURVEY §7.3 determinism rules).
  * Everything is per-row scalar work over codegen'd built-ins — no UDFs,
  * no shuffle except where a groupBy is the point. At 100 TB this is a
  * single map stage that pipelines with the parquet scan.
  */
object TextAnalysis {

  /** Whitespace tokenizer shared by every text op (and by the oracle). */
  val TokensExpr = "split(text, ' ')"

  /** Stopword list for quality scoring / language ID (fixed, public). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Tiny per-language indicator dictionaries (n-gram-heuristic stand-in;
    * deterministic and oracle-able — the point is the operator shape). */
  val LangDicts: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de0", "shi4", "le0", "he2", "zai4"))

  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("tokens", expr(TokensExpr))

  /** Per-document token statistics: counts, distinct counts, and average
    * token length in basis points. */
  def tokenStats(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"), col("lang"), col("source"),
      size(col("tokens")).cast("long").as("token_count"),
      size(array_distinct(col("tokens"))).cast("long").as("distinct_tokens"),
      length(col("text")).cast("long").as("total_chars"),
      expr("CAST(aggregate(tokens, 0L, (acc, x) -> acc + length(x)) AS BIGINT)")
        .as("token_chars"))
      .withColumn("avg_token_len_bp",
        floor(lit(10000.0) * col("token_chars") / col("token_count")).cast("long"))

  /** GPT-2-style pre-tokenizer stand-in: letter runs, digit runs, and
    * single punctuation marks each become one token (the whitespace
    * tokenizer above undercounts code/punctuation-heavy text). The
    * character-class pattern behaves identically in Java regex (Spark)
    * and DuckDB's RE2. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counting with the BPE-ish pre-tokenizer — the
    * cost-estimation pass of a training-data pipeline (≈ tokens before
    * byte-pair merges). Pure codegen'd expressions, no shuffle. */
  def bpeTokenStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("btoks", regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
      .select(
        col("doc_id"), col("lang"),
        size(col("btoks")).cast("long").as("bpe_token_count"),
        size(array_distinct(col("btoks"))).cast("long").as("bpe_distinct_count"),
        expr("CAST(aggregate(btoks, 0L, (acc, x) -> acc + length(x)) AS BIGINT)")
          .as("bpe_token_chars"))

  /** Tokenizer fertility per language: subword tokens (the BPE-ish
    * pre-tokenizer) per whitespace word, the standard "how badly does
    * this tokenizer serve language X" diagnostic (fertility ≈ 1 means
    * one token per word; high fertility means the language trains and
    * infers at a cost multiple). Also reports characters per subword
    * token — the compression angle of the same question. Both ratios
    * in basis points via the house single-divide floor.
    *
    * Scale shape: one corpus pass (two codegen'd per-row tokenize
    * expressions, no explode — counts come from `size`) collapsing
    * into a bounded-domain (lang) hash aggregate. Nothing here grows
    * with corpus size except the map stage. */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("lang"),
        size(expr(TokensExpr)).cast("long").as("words"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("btoks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("words"),
        sum(col("btoks")).as("bpe_tokens"),
        sum(col("chars")).as("chars"))
      .withColumn("fertility_bp",
        floor(lit(10000.0) * col("bpe_tokens") / col("words")).cast("long"))
      // a text of only whitespace has 0 bpe tokens; guard the divide
      // the deterministic way (both engines would inf/null-diverge)
      .withColumn("chars_per_token_bp",
        when(col("bpe_tokens") > 0L,
          floor(lit(10000.0) * col("chars") / col("bpe_tokens")).cast("long"))
          .otherwise(lit(-1L)))

  /** Corpus length-distribution panel: per (source, log₂ length
    * bucket) document and token counts with each bucket's share of
    * its source's docs — the planning input for min/max-length gates
    * (pick thresholds where the mass actually sits, not by folklore).
    * Geometric buckets because doc lengths are heavy-tailed: linear
    * bins waste the bottom and truncate the top.
    *
    * bucket = ⌊log₂ token_count⌋ computed EXACTLY as the binary
    * string's length − 1 (`bin()` / `format('{:b}')`): libm log2 at
    * power-of-two boundaries rounds differently per engine, an
    * integer string length cannot. token_count ≥ 1 always (split of
    * the empty string is one empty token), so bin() never sees 0.
    *
    * Scale shape: one map stage into a bounded (source × ≤64 buckets)
    * hash aggregate; the share window runs on that grain. */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    val bySource = Window.partitionBy(col("source"))
    docs
      .filter(col("text").isNotNull)
      .select(col("source"), size(expr(TokensExpr)).cast("long").as("tc"))
      .withColumn("bucket", (length(bin(col("tc"))) - 1).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("tokens"))
      .withColumn("docs_bp",
        floor(lit(10000.0) * col("n_docs") / sum(col("n_docs")).over(bySource))
          .cast("long"))
  }

  /** Winnowing (MOSS) fingerprints: one row per (doc, fingerprint) —
    * the rolling-hash document-fingerprinting operator. k/w defaults
    * give the standard any-match-of-length-≥-(w+k−1) guarantee at a
    * density of 2/(w+1). */
  def winnowFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.expressions.Winnow.fingerprints(col("text"), k, w)).as("fp"))

  /** Per-document quality scoring: stopword ratio, short-token ratio,
    * type/token ratio, and a boolean keep-flag — the filter a data-prep
    * pipeline applies before training. */
  def textQuality(docs: DataFrame, minTokens: Long = 20L,
      maxShortBp: Long = 4000L): DataFrame = {
    val sw = Stopwords.map(w => s"'$w'").mkString(", ")
    withTokens(docs).select(
      col("doc_id"),
      size(col("tokens")).cast("long").as("token_count"),
      expr(s"CAST(size(filter(tokens, x -> x IN ($sw))) AS BIGINT)")
        .as("stopword_count"),
      expr("CAST(size(filter(tokens, x -> length(x) <= 2)) AS BIGINT)")
        .as("short_count"),
      size(array_distinct(col("tokens"))).cast("long").as("distinct_tokens"))
      .withColumn("stopword_bp",
        floor(lit(10000.0) * col("stopword_count") / col("token_count")).cast("long"))
      .withColumn("short_bp",
        floor(lit(10000.0) * col("short_count") / col("token_count")).cast("long"))
      .withColumn("ttr_bp",
        floor(lit(10000.0) * col("distinct_tokens") / col("token_count")).cast("long"))
      .withColumn("quality_ok",
        (col("token_count") >= minTokens && col("short_bp") <= maxShortBp)
          .cast("int"))
  }

  /** Dictionary-hit language identification: per-language token-hit
    * scores, argmax with alphabetical tie-break, match vs the label. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = LangDicts.foldLeft(withTokens(docs)) { case (df, (l, dict)) =>
      val in = dict.map(w => s"'$w'").mkString(", ")
      df.withColumn(s"score_$l",
        expr(s"CAST(size(filter(tokens, x -> x IN ($in))) AS BIGINT)"))
    }
    // argmax by (score desc, lang asc): fold over languages in order.
    val predicted = LangDicts.map(_._1).sortBy(identity).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, l) =>
        when(col(s"score_$l") >= coalesce(
          greatest(LangDicts.map(x => col(s"score_${x._1}")): _*), lit(0L)), lit(l))
          .otherwise(acc)
      }
    scored.select(
      col("doc_id") +: col("lang") +:
        LangDicts.map { case (l, _) => col(s"score_$l") } :+
        predicted.as("predicted_lang"): _*)
      .withColumn("label_match", (col("predicted_lang") === col("lang")).cast("int"))
  }

  /** Corpus vocabulary head: top-k tokens by term frequency with
    * document frequency — the vocab-estimation pass before tokenizer
    * training. Scale shape: the explode never materializes the corpus
    * (it pipelines with the scan); the Zipf head ("the" at ~7% of all
    * tokens) is absorbed by partial aggregation — and the distinct
    * doc count plans as a two-phase aggregate whose FIRST shuffle key
    * is (token, doc_id), so even the hottest token spreads over the
    * cluster before the per-token rollup. Top-k is
    * TakeOrderedAndProject, never a global sort. */
  def vocabTop(docs: DataFrame, k: Int = 20): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(k)

  /** Zipf rank-frequency decay table — the power-law diagnostic
    * WITHOUT logs: for each octave rank r ∈ {1, 2, 4, …, maxRank},
    * the term frequency at rank r and at rank 2r and their ratio in
    * floor-bp. Under an ideal Zipf law f(r) ∝ 1/r^s the per-octave
    * ratio f(2r)/f(r) = 2^(−s) is CONSTANT (~5000 bp for s = 1); a
    * drifting column means head (stopwords) and tail obey different
    * laws — what a tokenizer/vocab designer actually checks before
    * sizing a vocabulary. Ratios are exact integer bp (no libm, no
    * cross-engine log); rank ties break token-asc like [[vocabTop]].
    *
    * Scale shape: one tokenize pass into token grain (map-side
    * combined), a TakeOrdered head of 2·maxRank rows, then all
    * rank/join work runs on that metadata-sized list. */
  def zipfDecay(docs: DataFrame, maxRank: Int = 64): DataFrame = {
    require(maxRank >= 1, "maxRank >= 1")
    // the head feeds both join sides — persisted (caller-owns-cache
    // convention) so the corpus is tokenized once, not twice
    val top = withTokens(docs)
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("term_freq"))
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(2 * maxRank)
      .persist()
    val w = Window.orderBy(col("term_freq").desc, col("token").asc)
    val ranked = top.withColumn("rank", row_number().over(w).cast("long"))
    val twice = ranked.select(col("rank").as("rank_2x"),
      col("term_freq").as("freq_2x"))
    ranked
      .filter(expr("(rank & (rank - 1)) = 0") && col("rank") <= maxRank)
      .join(twice, col("rank_2x") === col("rank") * 2L)
      .select(col("rank"), col("term_freq").as("freq"), col("freq_2x"),
        floor(lit(10000.0) * col("freq_2x") / col("term_freq"))
          .cast("long").as("decay_bp"))
      .orderBy(col("rank").asc)
  }

  /** Good–Turing frequency-of-frequencies table with the unseen-mass
    * estimate (Good 1953; the Gale & Sampson 1995 presentation) —
    * the "how much vocabulary have we NOT seen yet" read a corpus
    * owner checks before declaring a source exhausted: the
    * probability that the next token is a NEVER-SEEN type is
    * estimated by N₁/N (singleton share), and the Turing-smoothed
    * count for frequency r is r* = (r+1)·N_{r+1}/N_r. One row per
    * frequency class r ∈ [1, headR] plus the r=0 unseen row:
    * n_types (N_r), mass_ppm (floor(10⁶·r·N_r/N); r=0 carries the
    * N₁/N unseen estimate), and smoothed_r_milli
    * (floor(1000·(r+1)·N_{r+1}/N_r); NULL where N_{r+1}=0 or r=0) —
    * all exact integer, no libm.
    *
    * Scale shape: one tokenize pass to token grain (map-side
    * combined — the vocabulary shuffle, same as [[vocabTop]]), one
    * frequency-class aggregate (≤ max-frequency rows, metadata), a
    * ≤headR+1-row report. */
  def goodTuring(docs: DataFrame, headR: Int = 10): DataFrame = {
    require(headR >= 1, "headR >= 1")
    val freqs = withTokens(docs)
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_types"))
      .persist() // class-grain: ≤ max token frequency rows
    val nTotal = freqs.agg(sum(col("r") * col("n_types")).as("n"))
    val next = freqs.select(col("r").as("__rn"), col("n_types").as("__nn"))
    // the headR SMALLEST observed classes (a fixed r ≤ headR band is
    // empty on a saturated vocabulary where every type repeats)
    val head = freqs.orderBy(col("r").asc).limit(headR)
      .join(next, col("__rn") === col("r") + 1L, "left")
      .crossJoin(broadcast(nTotal))
      .select(col("r"), col("n_types"),
        expr("(1000000 * r * n_types) DIV n").as("mass_ppm"),
        expr("CASE WHEN __nn IS NOT NULL THEN" +
          " (1000 * (r + 1) * __nn) DIV n_types END")
          .as("smoothed_r_milli"))
    // always emitted: N₁ = 0 means the estimated unseen mass IS 0 —
    // a saturated source's exhaustion verdict, not a missing row
    val n1 = freqs.agg(coalesce(
      sum(when(col("r") === 1L, col("n_types"))), lit(0L)).as("n1"))
    val unseen = nTotal.crossJoin(broadcast(n1))
      .select(lit(0L).as("r"), lit(null).cast("long").as("n_types"),
        expr("(1000000 * n1) DIV n").as("mass_ppm"),
        lit(null).cast("long").as("smoothed_r_milli"))
    unseen.unionByName(head).orderBy(col("r").asc)
  }

  /** Distinctive vocabulary per language: the top-k tokens by term
    * frequency among tokens that are NOT ubiquitous — document
    * frequency ≤ `maxDfBp` basis points of that language's corpus
    * (the integer-exact stand-in for an idf cutoff; a float idf
    * would hinge on cross-engine `ln`). Keyword-extraction shape:
    * double aggregation (token grain, then language grain), the
    * per-language doc totals broadcast back (language count is tiny),
    * grouped top-k with an id tie-break.
    *
    * 100 TB shape: both aggregates partial-combine map-side; the
    * (lang, token) grain is the vocabulary — millions, not the corpus
    * — and the final window sees only df-gated survivors. */
  def distinctiveTerms(docs: DataFrame, k: Int = 5, maxDfBp: Long = 2000L): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
    val stats = withTokens(live)
      .select(col("lang"), col("doc_id"), explode(col("tokens")).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("term_freq"),
        count_distinct(col("doc_id")).as("doc_freq"))
    val langDocs = live.groupBy(col("lang"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("term_freq").desc, col("token").asc)
    stats
      .join(broadcast(langDocs), Seq("lang"))
      // integer df gate: doc_freq/n_docs ≤ maxDfBp/10000, cross-multiplied
      .filter(col("doc_freq") * lit(10000L) <= lit(maxDfBp) * col("n_docs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("token"), col("term_freq"), col("doc_freq"),
        col("rank").cast("long").as("rank"))
  }

  /** Tokenizer-vocabulary coverage: per-document out-of-vocabulary
    * rate against the corpus's own top-`vocabSize` token head (the
    * "how much of my corpus does this vocab actually cover" report
    * run before committing to a tokenizer vocab). Vocab boundary is
    * deterministic: (term_freq desc, token asc), ties never
    * ambiguous. Null-text docs are excluded (they have no tokens).
    *
    * 100 TB shape: the vocab head is [[vocabTop]]'s shape (one
    * token-grain aggregate with map-side combine, TakeOrdered head)
    * and is vocabSize-sized — BROADCAST to the membership probe. The
    * only corpus-grain shuffle is the per-doc re-aggregate, keyed on
    * doc_id (input cardinality, no skew: one key per doc). A real
    * 100k-entry tokenizer vocab is still only ~MBs broadcast. */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
    val vocab = vocabTop(live, vocabSize).select(col("token"))
    withTokens(live)
      .select(col("doc_id"), col("lang"), explode(col("tokens")).as("token"))
      .join(broadcast(vocab.withColumn("__in", lit(1))), Seq("token"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("token_count"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov_count"))
      .withColumn("oov_bp",
        floor(lit(10000.0) * col("oov_count") / col("token_count")).cast("long"))
  }

  /** Adjacent-token co-occurrence association: the top-k bigram pairs
    * by a fixed-point PMI-rank score — collocation mining over the
    * corpus (phrase detection / tokenizer-merge candidates). The
    * score is floor(10000 · P(a,b) / (P(a)·P(b))) expanded to counts:
    * floor((10000·c(a,b)·N) / (c(a)·c(b))) with N = total bigram
    * instances — monotone in PMI without a cross-engine `ln`. All
    * four factors are exact integers; the one double expression is
    * textually mirrored in the oracle (same IEEE tree both engines).
    * `minCount` prunes noise pairs (a 1-in-N coincidence of two rare
    * tokens scores arbitrarily high without a support floor).
    *
    * 100 TB shape: bigram extraction is a PURE MAP — zip_with over
    * the token array against its own tail, no positional shuffle.
    * Then two token-grain aggregates (pair and unigram, both map-side
    * combined). Both are PERSISTED at vocabulary grain — without
    * that, Catalyst plans a fresh corpus scan for each of the two
    * unigram joins and for N, a 4× read of the corpus; with it the
    * corpus is read exactly twice (once per aggregate) and N is a
    * rollup of the cached pair counts. Count joins are AQE-sized;
    * the head is TakeOrdered. Nothing doc-grain ever shuffles. */
  def cooccurrence(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val toks = withTokens(docs.filter(col("text").isNotNull))
    val pairs = toks
      .select(explode(expr(
        """zip_with(slice(tokens, 1, size(tokens) - 1),
          |         slice(tokens, 2, size(tokens) - 1),
          |         (a, b) -> struct(a AS tok_a, b AS tok_b))""".stripMargin)).as("p"))
      .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("pair_count"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N = Σ pair_count over the UNFILTERED pair set ≡ Σ max(len-1, 0)
    // — a rollup of the cache, not another corpus pass.
    val total = pairs.agg(sum(col("pair_count")).as("total"))
    val uni = toks
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pairs
      .filter(col("pair_count") >= minCount)
      .join(uni.select(col("token").as("tok_a"), col("cnt").as("cnt_a")), Seq("tok_a"))
      .join(uni.select(col("token").as("tok_b"), col("cnt").as("cnt_b")), Seq("tok_b"))
      .crossJoin(broadcast(total))
      .withColumn("score_bp", expr(
        """CAST(FLOOR((10000.0 * CAST(pair_count AS DOUBLE) * CAST(total AS DOUBLE))
          |     / (CAST(cnt_a AS DOUBLE) * CAST(cnt_b AS DOUBLE))) AS BIGINT)""".stripMargin))
      .orderBy(col("score_bp").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
      .select(col("tok_a"), col("tok_b"), col("pair_count"),
        col("cnt_a"), col("cnt_b"), col("score_bp"))
  }

  /** Heavy-hitter vocabulary head: same output as [[vocabTop]]'s
    * term-frequency ranking, different 100 TB shape. [[vocabTop]]
    * shuffles one row per DISTINCT token per map partition — fine for
    * word vocabularies, ruinous when "token" is an n-gram space in
    * the billions. This variant:
    *
    *  1. per-partition Misra-Gries summaries (bounded state `m`,
    *    classic decrement protocol) via mapPartitions — the one
    *    operator class where per-partition imperative state is the
    *    honest answer;
    *  2. the candidate union (≤ m × partitions rows, broadcast-sized)
    *    is semi-joined back and ONLY candidate tokens shuffle for the
    *    exact recount.
    *
    * Guarantee: a Misra-Gries summary of size m catches every token
    * with partition frequency > n_p/(m+1), so the union is a superset
    * of all tokens with global frequency > n/(m+1); counts reported
    * are EXACT (the recount). With the k-th head token far above that
    * bar (any Zipf-ish corpus, m=256), the output equals the exact
    * [[vocabTop]] ranking — the q54 oracle reuses q48's SQL, which
    * pins exactly that. doc_freq omitted: distinct-doc counting is
    * what the exact variant is for. */
  def heavyHitters(docs: DataFrame, k: Int = 20, m: Int = 256): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs.select(explode(expr(TokensExpr)).as("token")).as[String]
    val candidates = toks.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counts.contains(t) || counts.size < m) {
          counts.update(t, counts.getOrElse(t, 0L) + 1L)
        } else {
          // decrement round: drop every counter by 1, evict zeros
          val dead = Seq.newBuilder[String]
          counts.keysIterator.foreach { key =>
            val c = counts(key) - 1L
            if (c == 0L) dead += key else counts.update(key, c)
          }
          dead.result().foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("token").distinct()
    toks.toDF("token")
      .join(candidates, Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"))
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(k)
  }

  /** Document fingerprinting: min/max md5 over 3-word shingles — the
    * winnowing-style content fingerprint used as a cheap blocking key
    * for near-dup candidate generation (see Dedup). */
  def fingerprint(docs: DataFrame): DataFrame =
    Dedup.withShingles(docs).select(
      col("doc_id"),
      size(col("shingles")).cast("long").as("shingle_count"),
      expr("substring(array_min(transform(shingles, s -> md5(s))), 1, 16)")
        .as("fp_min"),
      expr("substring(array_max(transform(shingles, s -> md5(s))), 1, 16)")
        .as("fp_max"))

  // ---- hashed linear quality classifier (fasttext-style shape) ----
  //
  // The model-based quality gate every production corpus runs (CCNet
  // / fasttext-style): hash each token into a fixed bucket space,
  // score = Σ weight[bucket], keep if ≥ 0. The hashing-trick
  // MECHANICS are the real, scale-relevant part; the default WEIGHTS
  // are a disclosed deterministic stand-in derived from the bucket id
  // (like Multimodal.FakeCodec, this environment cannot train a
  // model) — production swaps in a trained weight table via
  // `classifyWithWeights` without touching the plumbing.
  //
  // Buckets come from md5 (hex chars 5-8 = 16 bits), the engine's
  // portable-hash convention (MinHashSig/SimHash): the oracle
  // reproduces them nibble-by-nibble, so scores are integer-exact
  // cross-engine.

  val ClassifierBuckets = 1 << 16

  /** The hashing-trick bucket for an arbitrary string expression —
    * md5 hex chars 5-8 parsed as 16 bits, the engine's portable-hash
    * convention (shared by the classifier, DSIR scoring, and their
    * oracles' nibble-parse twins). */
  def bucketOf(column: String): String =
    s"CAST(conv(substring(md5($column), 5, 4), 16, 10) AS BIGINT)"

  /** SQL lambda body: token string -> bucket [0, 65536). */
  private val BucketExpr = bucketOf("x")

  /** Stand-in weight: bucket -> [-500, 500]. */
  private def weightExpr(bucket: String) = s"($bucket % 1001) - 500"

  /** The inline score as a COLUMN over `text` — shared by the batch
    * classifier and the streaming intake gate (one scorer, no
    * batch/stream drift). Null text scores null. */
  def classifierScore: org.apache.spark.sql.Column =
    expr(s"aggregate($TokensExpr, 0L, (acc, x) -> acc + ${weightExpr(BucketExpr)})")

  /** Hashed-feature linear score, inline weights: a ZERO-shuffle map
    * stage (the whole classifier pipelines with the scan — at 100 TB
    * this is a pure pass over the corpus, no state, no joins). Null
    * text is dropped like every sibling op (and unlike DuckDB, Spark's
    * non-ANSI size(split(NULL)) would yield -1, a cross-engine trap). */
  def qualityClassifier(docs: DataFrame): DataFrame =
    withTokens(docs.filter(col("text").isNotNull)).select(
      col("doc_id"),
      size(col("tokens")).cast("long").as("token_count"),
      classifierScore.as("score"))
      .withColumn("keep", (col("score") >= 0L).cast("int"))

  /** The production seam: same scoring against a (bucket, weight)
    * TABLE — trained weights are model-output, not derivable inline.
    * The weight table is vocabulary-bounded (≤ ClassifierBuckets
    * rows ≈ MBs), so it broadcasts; the corpus explodes to token
    * grain, joins the broadcast weights, and re-aggregates to doc
    * grain — one shuffle on doc_id. Trained tables are SPARSE, so
    * the weight join is LEFT (absent bucket ⇒ weight 0) and the
    * explode is OUTER (a null-text doc yields one null-token row, so
    * every document gets a verdict — scoring 0 here where the inline
    * path propagates null; both emit the row). token_count rides the
    * grouping key, so the whole scorer is still ONE doc-grain
    * shuffle and one corpus pass. */
  def classifyWithWeights(docs: DataFrame, weights: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), size(col("tokens")).cast("long").as("token_count"),
        explode_outer(col("tokens")).as("x"))
      .withColumn("bucket", expr(BucketExpr)) // null token ⇒ null bucket
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"), col("token_count"))
      .agg(sum(coalesce(col("weight"), lit(0L))).as("score"))
      .withColumn("keep", (col("score") >= 0L).cast("int"))
      .select(col("doc_id"), col("token_count"), col("score"), col("keep"))

  /** The stand-in weights as a table (for parity tests and as the
    * template a trained-weight load replaces). */
  def standInWeights(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(ClassifierBuckets.toLong).toDF("bucket")
      .withColumn("weight", expr(weightExpr("bucket")))

  /** Quality-signal agreement matrix: the q18 heuristic gate crossed
    * with the q69 model gate, per cell (docs, tokens, share). The
    * standard calibration read before trusting either filter alone —
    * the two off-diagonal cells are exactly the docs where a curator
    * must pick a side, and their SIZE is the decision's blast radius.
    *
    * Both verdicts are pure functions of `text`, so they are computed
    * in the SAME map stage over one corpus scan — no join, no second
    * pass (a doc_id join of the two gate outputs would shuffle the
    * corpus twice to rediscover column-local arithmetic). The
    * heuristic arm reproduces [[textQuality]]'s gate expression
    * verbatim (spec-pinned parity) rather than calling it, because
    * textQuality's per-doc projection drops `text` and the classifier
    * score needs it.
    *
    * Scale shape: one corpus pass collapsing straight to the 2×2
    * verdict grain; the share window runs over ≤4 rows. */
  def signalAgreement(docs: DataFrame, minTokens: Long = 20L,
      maxShortBp: Long = 4000L): DataFrame = {
    val cells = withTokens(docs.filter(col("text").isNotNull))
      .select(
        size(col("tokens")).cast("long").as("token_count"),
        expr("CAST(size(filter(tokens, x -> length(x) <= 2)) AS BIGINT)")
          .as("short_count"),
        classifierScore.as("score"))
      .withColumn("short_bp",
        floor(lit(10000.0) * col("short_count") / col("token_count")).cast("long"))
      .withColumn("heuristic_ok",
        (col("token_count") >= minTokens && col("short_bp") <= maxShortBp)
          .cast("int"))
      .withColumn("classifier_keep", (col("score") >= 0L).cast("int"))
      .groupBy(col("heuristic_ok"), col("classifier_keep"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_count")).as("tokens"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    cells
      .withColumn("docs_bp",
        floor(lit(10000.0) * col("n_docs") / sum(col("n_docs")).over(wAll))
          .cast("long"))
      .withColumn("agree", (col("heuristic_ok") === col("classifier_keep")).cast("int"))
  }

  /** Cohen's κ between the q18 heuristic and the q69 classifier —
    * the chance-corrected single number behind [[signalAgreement]]'s
    * 2×2 matrix (raw agreement flatters filters that mostly say
    * "keep": two signals that each keep 95% agree ~90% by luck
    * alone). κ = (p_o − p_e)/(1 − p_e) with p_e from the marginals;
    * in exact sums: κ·10⁴ = ⌊10⁴·(N·D − S)/(N² − S)⌋ where D =
    * n₁₁+n₀₀ and S = r_h·r_c + (N−r_h)(N−r_c). Landis–Koch reads:
    * ≥8000 almost perfect, ≥6000 substantial. NULL when the
    * marginals are degenerate (N² = S — a constant signal has no
    * chance-corrected agreement).
    *
    * Scale shape: both verdicts are pure functions of text, so ONE
    * corpus map pass feeds a single 5-sum aggregate (no 2×2 grain,
    * no join); the κ arithmetic runs on the one-row result. The
    * cross-products reach N² — swap the window to decimal(38,0)
    * sums past ~10⁹ docs. */
  def signalKappa(docs: DataFrame, minTokens: Long = 20L,
      maxShortBp: Long = 4000L): DataFrame = {
    val flags = withTokens(docs.filter(col("text").isNotNull))
      .select(
        size(col("tokens")).cast("long").as("token_count"),
        expr("CAST(size(filter(tokens, x -> length(x) <= 2)) AS BIGINT)")
          .as("short_count"),
        classifierScore.as("score"))
      .select(
        ((col("token_count") >= minTokens) &&
          (floor(lit(10000.0) * col("short_count") / col("token_count"))
            .cast("long") <= maxShortBp)).cast("long").as("h"),
        (col("score") >= 0L).cast("long").as("c"))
    flags
      .agg(count(lit(1)).as("n_docs"),
        sum(col("h")).as("n_heuristic_ok"),
        sum(col("c")).as("n_classifier_keep"),
        sum(col("h") * col("c")).as("n_both"),
        sum((lit(1L) - col("h")) * (lit(1L) - col("c"))).as("n_neither"))
      .withColumn("n_agree", col("n_both") + col("n_neither"))
      .withColumn("__s",
        col("n_heuristic_ok") * col("n_classifier_keep") +
          (col("n_docs") - col("n_heuristic_ok")) *
          (col("n_docs") - col("n_classifier_keep")))
      .select(col("n_docs"), col("n_heuristic_ok"),
        col("n_classifier_keep"), col("n_agree"),
        floor(lit(10000.0) * col("n_agree") / col("n_docs"))
          .cast("long").as("po_bp"),
        floor(lit(10000.0) * col("__s") / (col("n_docs") * col("n_docs")))
          .cast("long").as("pe_bp"),
        when(col("n_docs") * col("n_docs") === col("__s"),
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("n_docs") * col("n_agree") - col("__s")) /
            (col("n_docs") * col("n_docs") - col("__s"))).cast("long"))
          .as("kappa_bp"))
  }

  /** Per-document unigram surprisal against the corpus' own head
    * vocabulary — the integer-exact stand-in for CCNet/KenLM
    * perplexity filtering (the single most-used LLM quality gate):
    * docs full of common tokens score low (fluent/templated), docs of
    * rare garbage score high; both tails get filtered or re-weighted
    * downstream (q119 prices the cutoff).
    *
    * Per token: surprisal = ⌊log₂(T / freq)⌋ via `flog2Ratio` (the
    * no-libm logarithm — bit-identical cross-engine where a float
    * `ln` would not be), with freq from the top-`headK` vocabulary
    * and an OOV floor of 1 (max surprisal) for everything outside it
    * — the head IS the model, exactly how a pruned LM ships.
    *
    * Scale shape: the head (K rows) and the 1-row token total
    * broadcast; scoring is one explode + broadcast-left-join +
    * doc-grain aggregate (one shuffle). Three text passes total
    * (map-only count, head build, scoring) — the head pass is shared
    * with any q48/q85 consumer at deployment. */
  def surprisal(docs: DataFrame, headK: Int = 1000): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
    val tot = live.agg(
      sum(size(expr(TokensExpr)).cast("long")).as("t_tot"))
    // term_freq-only head (vocabTop also computes doc_freq — a
    // two-phase count_distinct Expand the scorer would pay for and
    // never read); same (freq desc, token asc) boundary as q48/q85
    val head = withTokens(live)
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"))
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(headK)
    withTokens(live)
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      .join(broadcast(head), Seq("token"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("sp", TrainingPrep.flog2Ratio(
        col("t_tot"), coalesce(col("term_freq"), lit(1L))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("token_count"),
        sum(col("sp")).cast("long").as("total_log2"))
      .withColumn("avg_log2_bp",
        floor(lit(10000.0) * col("total_log2") / col("token_count"))
          .cast("long"))
  }

  // ---- character-class / script mixture ----
  //
  // Counts are CHARACTERS (both engines' length() is code points on
  // the formats in play), derived by the subtraction trick
  // length(text) − length(regexp_replace(text, class, '')) so no
  // engine-specific char-class table is involved; patterns stay in
  // the shared Java-regex ∩ RE2 subset (q46/q83 convention).

  val LetterClass = "[A-Za-z]"
  val DigitClass = "[0-9]"
  val SpaceClass = "[ \\t\\n\\r]"
  val NonAsciiClass = "[^\\x00-\\x7F]"

  /** Per-source character-class mixture: letter / digit / whitespace
    * / other shares plus the non-ASCII share and a mixed-script flag
    * rate (docs carrying BOTH ASCII letters and non-ASCII text — the
    * classic spam/SEO and mis-tagged-language signal, and the first
    * thing a language-ID audit looks at). Bp shares are floored from
    * EXACT per-source character sums, not averaged per-doc ratios,
    * so long docs weigh what they cost a tokenizer.
    *
    * Scale shape: four regex counts as one codegen'd map stage over
    * the scan, collapsing straight to a bounded source-grain
    * aggregate — zero joins, zero windows beyond none at all. */
  def scriptMix(docs: DataFrame): DataFrame = {
    def cnt(cls: String) =
      (length(col("text")) - length(regexp_replace(col("text"), cls, "")))
        .cast("long")
    docs.filter(col("text").isNotNull)
      .select(
        col("source"),
        length(col("text")).cast("long").as("chars"),
        cnt(LetterClass).as("letters"),
        cnt(DigitClass).as("digits"),
        cnt(SpaceClass).as("spaces"),
        cnt(NonAsciiClass).as("non_ascii"))
      .withColumn("mixed",
        (col("letters") > 0L && col("non_ascii") > 0L).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("chars")).as("chars"),
        sum(col("letters")).as("letters"),
        sum(col("digits")).as("digits"),
        sum(col("spaces")).as("spaces"),
        sum(col("non_ascii")).as("non_ascii"),
        sum(col("mixed")).as("n_mixed"))
      .withColumn("letter_bp", shareBp(col("letters"), col("chars")))
      .withColumn("digit_bp", shareBp(col("digits"), col("chars")))
      .withColumn("space_bp", shareBp(col("spaces"), col("chars")))
      .withColumn("non_ascii_bp", shareBp(col("non_ascii"), col("chars")))
      .withColumn("mixed_bp", shareBp(col("n_mixed"), col("n_docs")))
  }

  /** House bp share with an explicit zero-denominator verdict (an
    * all-empty-text source reports 0, not NULL/NaN). */
  private def shareBp(num: Column, den: Column): Column =
    when(den === 0L, lit(0L))
      .otherwise(floor(lit(10000.0) * num / den).cast("long"))

  /** Per-source lexical diversity report — the corpus-health panel
    * run on every intake batch (and the standard synthetic-data
    * check: model-generated text shows collapsed TTR / bigram
    * diversity and a starved hapax share long before eyeballs do):
    * token count, vocabulary size (types), hapax count (freq-1
    * types), bigram totals/types, and the three ratios in bp —
    * type-token, hapax-of-types, distinct-bigram-of-bigrams.
    *
    * Scale shape: two corpus passes, each collapsing straight to a
    * bounded grain — (source, token) counts then a source-grain
    * rollup; (source, bigram-hash) via the fused `TokenGramHash` (no
    * gram strings) then the same rollup. Both aggregates partial
    * map-side (Zipf heads absorb there); the final join runs at
    * source grain, metadata-sized. Nothing is windowed, nothing
    * drives. */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .withColumn("__t", expr(TokensExpr))
    val uni = base
      .select(col("source"), explode(col("__t")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("types"),
        sum(col("cnt")).as("tokens"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("hapax"))
    val bi = base.filter(size(col("__t")) >= 2)
      .select(col("source"),
        explode(graft.expressions.TokenGramHash.grams(col("__t"), 2)).as("gh"))
      .groupBy(col("source"), col("gh"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("bigram_types"), sum(col("cnt")).as("bigrams"))
    val bp = (n: Column, d: Column) =>
      when(d === 0L, lit(0L))
        .otherwise(floor(lit(10000.0) * n / d).cast("long"))
    uni.join(bi, Seq("source"), "left")
      .na.fill(0L, Seq("bigram_types", "bigrams"))
      .select(col("source"), col("tokens"), col("types"), col("hapax"),
        col("bigrams"), col("bigram_types"),
        bp(col("types"), col("tokens")).as("ttr_bp"),
        bp(col("hapax"), col("types")).as("hapax_bp"),
        bp(col("bigram_types"), col("bigrams")).as("bigram_ttr_bp"))
  }

  /** Classifier calibration table — the reliability diagram of the
    * q69 model gate against the q18 heuristic gate: per bucket of
    * per-token classifier score, how often does the independent
    * heuristic agree the doc is keepable? A well-behaved quality
    * classifier shows MONOTONE agreement across buckets; a flat or
    * U-shaped table means the score and the heuristic measure
    * different things (q120's 2×2 agreement matrix says THAT they
    * disagree; this table says WHERE on the score axis). The standard
    * ML-eval surface (Guo et al. 2017's calibration framing) with the
    * keep-heuristic standing in for labels — at 100 TB nobody has
    * labels, only other signals.
    *
    * Buckets: per-token score (score/token_count, range ≈ [−500,500]
    * by construction of the stand-in weights) shifted +500 into the
    * [[Retention.bucketCol]] 10×100-wide clamped grid — the shared
    * house binning, one IEEE divide mirrored textually in the oracle.
    *
    * Scale shape: ONE zero-shuffle map pass (both gates are array
    * folds over the same tokens column) into a ≤10-row hash
    * aggregate. */
  def classifierCalibration(docs: DataFrame, minTokens: Long = 20L,
      maxShortBp: Long = 4000L): DataFrame =
    withTokens(docs.filter(col("text").isNotNull))
      .select(size(col("tokens")).cast("long").as("tc"),
        classifierScore.as("score"),
        expr("CAST(size(filter(tokens, x -> length(x) <= 2)) AS BIGINT)")
          .as("short_count"))
      .withColumn("quality_ok",
        (col("tc") >= minTokens &&
          floor(lit(10000.0) * col("short_count") / col("tc")).cast("long")
            <= maxShortBp).cast("long"))
      .withColumn("bucket", Retention.bucketCol(
        col("score").cast("double") / col("tc") + lit(500.0), 100.0, 10))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("quality_ok")).as("n_quality_ok"))
      .withColumn("quality_ok_bp",
        floor(lit(10000.0) * col("n_quality_ok") / col("n_docs")).cast("long"))

  /** Bigram-LM cross-entropy filter — the add-one-smoothed 2-gram
    * twin of [[surprisal]]'s unigram gate, the integer-exact stand-in
    * for CCNet/KenLM perplexity filtering AT THE MODEL ORDER the real
    * pipelines use: fluent text is predictable from its left token;
    * shuffled/garbage/boilerplate-stitched text is not, even when its
    * unigram profile looks normal. Per bigram: bits =
    * ⌊log₂((c(w₁)+V) / (c(w₁w₂)+1))⌋ (`flog2Ratio`, no libm) — the
    * corpus scores against ITSELF, the standard self-perplexity
    * audit. A doc flags when its bits/token exceeds `flagRatioPct`%
    * of the corpus mean.
    *
    * Scale shape: bigrams collapse to (doc, bigram, count) grain
    * map-side BEFORE any join; the model table derives from those
    * partials (c₂ = one more aggregate, c₁ = a w1-grain join ONTO c₂ at
    * model grain — the fact stream is never re-scanned and the
    * scoring frame never re-shuffles by w1), and scoring is ONE
    * bigram-keyed shuffle join (the model is vocab²-bounded, too big
    * to broadcast by design) + one doc-grain aggregate. Vocab size V
    * is a broadcast 1-row scalar off the model frame, as is the
    * corpus mean the flag compares against. */
  def bigramPerplexity(docs: DataFrame, flagRatioPct: Long = 105L): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
      .withColumn("__t", expr(TokensExpr))
      .filter(size(col("__t")) >= 2)
    // docBi feeds the c2 model build, the c1 build (via c2), and the
    // scoring join — persist it (doc×distinct-bigram grain, the
    // package.scala caller-owns-cache convention) so the corpus is
    // tokenized once, not once per model table
    val docBi = live
      .select(col("doc_id"), col("source"), explode(expr(
        """zip_with(slice(__t, 1, size(__t) - 1),
          |         slice(__t, 2, size(__t) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("b"))
      .groupBy(col("doc_id"), col("source"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    // c2 is read FOUR ways (the model join, c1's aggregate, and both
    // branches of the vocabulary union) and column pruning makes the
    // four subtrees non-identical, so exchange reuse cannot collapse
    // them — without the persist the (w1,w2) aggregation over the
    // docBi cache ran four times (r11 plan audit: 4 separate
    // hash(w1,w2) exchanges). vocab²-bounded metadata: cache it once.
    val c2 = docBi.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c2"))
      .persist()
    // c1 attaches to the MODEL frame at vocab²-bounded grain instead
    // of a second join that would re-shuffle the whole doc×bigram
    // scoring frame by w1 — the model pays one small join (c1 is
    // broadcast-class next to c2), the big frame pays none (guide
    // §2.3: shuffle the lightweight proxy, not the payload)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val model = c2.join(c1, Seq("w1"))
    // V from the model frame, not a second tokenize pass: in a
    // ≥2-token doc every token is some bigram's w1 or w2, and c2's
    // key domain equals docBi's, so distinct(w1 ∪ w2) over the
    // SMALLER c2 frame IS the live vocabulary (guide §2.4)
    val vocab = c2.select(col("w1").as("tok"))
      .union(c2.select(col("w2").as("tok")))
      .agg(countDistinct(col("tok")).as("v"))
    val perDoc = docBi
      .join(model, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .withColumn("bits", TrainingPrep.flog2Ratio(
        col("c1") + col("v"), col("c2") + lit(1L)).cast("long"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt")).as("nb"),
        sum(col("cnt") * col("bits")).as("sb"))
      .withColumn("bpt_milli", expr("(1000 * sb) DIV nb"))
      .persist() // read by the corpus mean AND the per-source rollup
    val mean = perDoc.agg(
      expr("(1000 * SUM(sb)) DIV SUM(nb)").as("corpus_mean_milli"))
    perDoc.crossJoin(broadcast(mean))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("n_bigrams"),
        sum(col("sb")).as("__sb"),
        first(col("corpus_mean_milli")).as("corpus_mean_milli"),
        sum(when(col("bpt_milli") * lit(100L) >
          col("corpus_mean_milli") * lit(flagRatioPct), 1L).otherwise(0L))
          .as("flagged"))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        expr("(1000 * __sb) DIV n_bigrams").as("bits_per_token_milli"),
        col("corpus_mean_milli"),
        col("flagged"),
        shareBp(col("flagged"), col("n_docs")).as("flagged_bp"))
      .orderBy(col("source").asc)
  }

  /** Cross-source LM transfer matrix — [[bigramPerplexity]] asked
    * per-source "how surprising is this source under the CORPUS
    * model"; this asks the domain-mixture question behind every
    * pre-training data decision: for each (train, eval) source pair,
    * the mean add-1 bigram bits/token of eval docs scored under a
    * model fit ONLY on the train source. Low off-diagonal cells mark
    * interchangeable sources (dedup/merge candidates); a high
    * transfer gap marks a domain whose removal the rest of the mix
    * cannot cover. Diagonal = self-fit baseline; transfer_gap =
    * cell − eval's own diagonal.
    *
    * Same libm-free arithmetic as q285: bits = ⌊log₂((c1+V)/(c2+1))⌋
    * via the bitlen identity, per-train vocabulary V, unseen bigrams
    * falling back through the add-1 mass (c1/c2 coalesce to 0 — a
    * completely unseen context costs ~log₂V bits, as it should).
    *
    * Scale shape: the corpus tokenizes ONCE into a persisted
    * (source, bigram) frame that serves as both every train model
    * and every eval mass; the ×|sources| fan-out runs at that
    * bounded grain, models join on bigram keys, vocab is
    * source-grain broadcast, and the output is the |S|² matrix.
    *
    * Columns: train_source, eval_source, n_bigrams, bpt_milli,
    * self_bpt_milli, transfer_gap_milli. */
  def sourceTransferMatrix(docs: DataFrame): DataFrame = {
    val live = docs.filter(col("text").isNotNull && col("source").isNotNull)
      .withColumn("__t", expr(TokensExpr))
      .filter(size(col("__t")) >= 2)
    val srcBi = live
      .select(col("source"), explode(expr(
        """zip_with(slice(__t, 1, size(__t) - 1),
          |         slice(__t, 2, size(__t) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("b"))
      .groupBy(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // train models AND eval masses both read it
    val c2 = srcBi.select(col("source").as("train"), col("w1"),
      col("w2"), col("cnt").as("c2"))
    val c1 = c2.groupBy(col("train"), col("w1")).agg(sum(col("c2")).as("c1"))
    // per-train V from the persisted bigram frame (the q285 rule):
    // every token of a ≥2-token doc appears as some w1 or w2, so the
    // per-source distinct(w1 ∪ w2) is the per-source vocabulary
    val vocab = srcBi.select(col("source").as("train"), col("w1").as("tok"))
      .union(srcBi.select(col("source").as("train"), col("w2").as("tok")))
      .groupBy(col("train")).agg(countDistinct(col("tok")).as("v"))
    val trains = srcBi.select(col("source").as("train")).distinct()
    val scored = srcBi.withColumnRenamed("source", "eval_source")
      .crossJoin(broadcast(trains))
      .join(c2, Seq("train", "w1", "w2"), "left")
      .join(c1, Seq("train", "w1"), "left")
      .join(broadcast(vocab), Seq("train"))
      .withColumn("bits", TrainingPrep.flog2Ratio(
        coalesce(col("c1"), lit(0L)) + col("v"),
        coalesce(col("c2"), lit(0L)) + lit(1L)).cast("long"))
      .groupBy(col("train").as("train_source"), col("eval_source"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("bits")).as("__sb"))
      .withColumn("bpt_milli", expr("(1000 * __sb) DIV n_bigrams"))
      .persist() // matrix grain; the diagonal joins back onto it
    val self = scored
      .filter(col("train_source") === col("eval_source"))
      .select(col("eval_source"), col("bpt_milli").as("self_bpt_milli"))
    scored.join(broadcast(self), Seq("eval_source"))
      .select(col("train_source"), col("eval_source"), col("n_bigrams"),
        col("bpt_milli"), col("self_bpt_milli"),
        (col("bpt_milli") - col("self_bpt_milli")).as("transfer_gap_milli"))
      .orderBy(col("train_source").asc, col("eval_source").asc)
  }

  /** Per-source readability panel — a Flesch-reading-ease proxy in
    * exact integer milli-units (Flesch '48: 206.835 − 1.015·w/s −
    * 84.6·syll/w), the classic complexity prior a curriculum or
    * audience filter sorts on. Syllables are VOWEL-GROUP RUNS
    * ([aeiouy]+, floored at one per word — the standard dictionary-
    * free proxy; for vowel-free scripts the floor makes the score a
    * pure words-per-sentence read, stated not hidden). Sentences are
    * [.!?]+ runs, min 1. Each term floor-divides separately (bit-
    * identical cross-engine; the ≤2-milli truncation skew is noise at
    * the 10-point grade-band grain this feeds).
    *
    * Run counting rides the q122 subtraction trick twice:
    * length(replace(run, '#')) − length(replace(run, '')) = number of
    * runs, no engine-specific split semantics.
    *
    * Scale shape: a pure codegen map stage (three regex passes per
    * doc) straight into a bounded source-grain aggregate; doc-grain
    * scores never shuffle (sums travel). */
  def readability(docs: DataFrame, hardBelowMilli: Long = 50000L): DataFrame = {
    def runs(c: Column, cls: String) =
      (length(regexp_replace(c, cls, "#")) -
        length(regexp_replace(c, cls, ""))).cast("long")
    docs.filter(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("w"),
        greatest(runs(col("text"), "[.!?]+"), lit(1L)).as("s"),
        runs(lower(col("text")), "[aeiouy]+").as("vr"))
      .withColumn("syl", greatest(col("vr"), col("w")))
      // clamped at 0 (the conventional scale floor) — also keeps
      // every later integer division on nonnegative operands, where
      // Spark DIV and DuckDB // agree
      .withColumn("flesch_milli",
        greatest(lit(206835L) - expr("(1015 * w) DIV s") -
          expr("(84600 * syl) DIV w"), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("__w"), sum(col("s")).as("__s"),
        sum(col("syl")).as("__syl"), sum(col("flesch_milli")).as("__f"),
        sum(when(col("flesch_milli") < hardBelowMilli, 1L).otherwise(0L))
          .as("__hard"))
      .select(col("source"), col("n_docs"),
        expr("__f DIV n_docs").as("mean_flesch_milli"),
        expr("(1000 * __w) DIV __s").as("wps_milli"),
        expr("(1000 * __syl) DIV __w").as("spw_milli"),
        shareBp(col("__hard"), col("n_docs")).as("p_hard_bp"))
      .orderBy(col("source").asc)
  }
}
