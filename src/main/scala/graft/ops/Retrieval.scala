package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 scoring and top-k — the
  * inverted-index workload (data curation uses it for targeted
  * corpus search and query-based filtering; RAG pipelines for the
  * sparse half of hybrid retrieval next to the dense kNN of
  * `Similarity`).
  *
  * Scale shape (why this is NOT a score-everything pass): the query
  * set is small by nature, so its distinct terms BROADCAST; the
  * corpus side is one tokenize map stage filtered AT THE SCAN by
  * that broadcast join — only postings of query terms (a vanishing
  * fraction of the token stream) ever reach the (doc, term) partial
  * aggregation, and document frequencies are computed from that
  * already-filtered postings frame, never from a full vocabulary
  * aggregate. Corpus-global constants (N, avgdl) are one tiny
  * aggregate broadcast into the scoring expression. Final top-k per
  * query plans as WindowGroupLimit — no global sort.
  *
  * Exactness (the reason the scoring formula looks the way it does):
  * the standard BM25 idf is `ln((N-df+0.5)/(df+0.5))`, but libm
  * transcendentals are not bit-identical across engines (SURVEY
  * §7.3: no cross-engine ln). This implementation uses the same
  * Robertson–Spärck Jones odds RATIO without the log —
  * `(2(N-df)+1)/(2df+1)`, integer-exact operands — with dyadic
  * k1=1.5, b=0.75, so every arithmetic step is an IEEE-754 double
  * op on identical operands in identical order: bit-identical in
  * any engine. Each term's contribution is floored to fixed-point
  * (1e-6) BIGINT *before* the per-document sum, so the sum is
  * integer and associativity-free. Log-damped idf changes only the
  * relative weighting of rare terms, not the machinery; it stays
  * available at the output edge where cross-engine equality is not
  * required.
  */
object Retrieval {

  /** The fixed demo query set (literal on both engine and oracle
    * sides; any (query_id, token) frame works). */
  val DemoQueries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join", 1L -> "hash",
    2L -> "customer", 2L -> "order", 2L -> "query",
    3L -> "stream", 3L -> "window", 3L -> "batch")

  def demoQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DemoQueries.toDF("query_id", "token")
  }

  /** BM25 top-`k` documents per query. `queries` is (query_id,
    * token); multi-token queries sum their terms' contributions.
    * Output: (query_id, rank, doc_id, score_fp) with score_fp the
    * fixed-point (×1e6) BM25 sum and rank 1..k by (score desc,
    * doc_id asc). */
  def bm25TopK(docs: DataFrame, queriesRaw: DataFrame, k: Int = 5): DataFrame = {
    // a repeated (query_id, token) row would double-count that term's
    // contribution in the score sum — dedup the contract up front
    val queries = queriesRaw.distinct()
    val base = docs
      .filter(col("text").isNotNull)
      .withColumn("__t", expr(TextAnalysis.TokensExpr))
    val dl = base.select(col("doc_id"), size(col("__t")).cast("long").as("dl"))
    // corpus constants: one row, broadcast into the scoring join.
    // avgdl is the ONE double division both engines perform on the
    // same exact integers (correctly rounded ⇒ identical).
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avgdl"))
    val terms = queries.select(col("token")).distinct()
    // postings of query terms only: the broadcast join filters the
    // exploded token stream before any shuffle; partial aggregation
    // collapses per-partition repeats of (doc, term).
    val tf = base
      .select(col("doc_id"), explode(col("__t")).as("token"))
      .join(broadcast(terms), "token")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(dl, "doc_id")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .join(broadcast(queries), "token")
      // idf = (2(N-df)+1)/(2df+1); tf-sat with k1=1.5, b=0.75:
      // tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl)). Textually the
      // same expression as the oracle — every op IEEE, same order.
      .withColumn("c", floor(
        lit(1000000.0)
          * ((lit(2.0) * (col("n_docs") - col("df")) + lit(1.0))
            / (lit(2.0) * col("df") + lit(1.0)))
          * ((col("tf") * lit(2.5))
            / (col("tf") + lit(1.5)
              * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
      ).cast("long"))
    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_fp"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_fp"))
  }

  /** Known-item retrieval eval: can BM25 find the document its own
    * opening words came from? Every `queryMod`-th document becomes a
    * query (its first `queryTokens` distinct tokens), the relevant
    * answer is the source document itself, and the report is the
    * standard search-quality pair — found@k and MRR@k (per-query
    * rr_bp = 10000 div rank, summed and floor-averaged; all integer,
    * the q158 ANN-MRR convention applied to text). The self-contained
    * index health check a retrieval stack runs after every re-index:
    * no labels needed, and a score that degrades only when indexing,
    * tokenization, or ranking regressed.
    *
    * One row: n_queries, n_found, found_bp, mrr_bp. Scale shape is
    * [[bm25TopK]]'s (probe-set queries broadcast into one postings
    * pass) plus a query-grain join back to the ranks — which only
    * holds because the probe set is CAPPED (`maxQueries`, smallest
    * qualifying doc_ids): an eval whose query count scales with the
    * corpus turns the scoring join quadratic (measured 3.5× at a 2×
    * corpus before the cap — the q25 fixed-probe lesson applied to
    * text). */
  /** Probe-grain known-item OUTCOMES: one row per probe query with
    * the rank its own document achieved in the BM25 top-k (null =
    * missed) — the shared eval artifact (ops.Shared contract): the
    * expensive ranking pass runs once, and every eval metric (q229's
    * found/MRR summary, q266's nDCG) is a rollup of this
    * probe-set-grain frame. Probe queries whose token set is empty
    * after the slice drop out of `queries`, so the outcome universe
    * is the DISTINCT query set actually ranked. */
  def bm25KnownItemOutcomes(docs: DataFrame, queryMod: Long = 10L,
      queryTokens: Int = 3, k: Int = 10, maxQueries: Int = 200): DataFrame = {
    require(queryMod >= 1L && queryTokens >= 1 && k >= 1 && maxQueries >= 1)
    val probeDocs = docs
      .filter(col("text").isNotNull && col("doc_id") % queryMod === 0L)
      .select(col("doc_id"))
      .orderBy(col("doc_id").asc).limit(maxQueries)
    val queries = docs
      .join(broadcast(probeDocs), Seq("doc_id"))
      .select(col("doc_id").as("query_id"),
        explode(expr(
          s"array_distinct(slice(${TextAnalysis.TokensExpr}, 1, $queryTokens))"))
          .as("token"))
    val hits = bm25TopK(docs, queries, k)
      .filter(col("doc_id") === col("query_id"))
      .select(col("query_id"), col("rank"))
    queries.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
  }

  def bm25KnownItem(docs: DataFrame, queryMod: Long = 10L,
      queryTokens: Int = 3, k: Int = 10, maxQueries: Int = 200,
      outcomes0: Option[DataFrame] = None): DataFrame = {
    val o = outcomes0.getOrElse(
      bm25KnownItemOutcomes(docs, queryMod, queryTokens, k, maxQueries))
    o.agg(count(lit(1)).as("n_queries"),
        count(col("rank")).as("n_found"),
        coalesce(sum(when(col("rank").isNotNull, expr("10000L div rank"))
          .otherwise(0L)), lit(0L)).as("rr_sum"))
      .select(col("n_queries"), col("n_found"),
        when(col("n_queries") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * col("n_found") / col("n_queries"))
            .cast("long")).as("found_bp"),
        when(col("n_queries") === 0L, 0L)
          .otherwise(expr("rr_sum div n_queries")).as("mrr_bp"))
  }

  /** nDCG@k of the known-item eval — the rank-DISCOUNT companion to
    * q229's found/MRR: with one relevant document per query, ideal
    * DCG is 1 and per-query nDCG is exactly 1/log₂(rank+1); a miss
    * scores 0. The discounts are FIXED-POINT LITERALS (⌊10⁶/log₂(r+1)⌋
    * for r = 1..k, same constants in the oracle), so no runtime libm
    * and no cross-engine log drift — the k-entry table IS the metric
    * definition. Corpus nDCG = Σ gain_ppm div n_queries. Rolls up the
    * shared [[bm25KnownItemOutcomes]] artifact — the ranking pass is
    * never re-run for a second metric. */
  /** The nDCG discount table ⌊10⁶/log₂(r+1)⌋, r = 1..k — generated
    * ONCE here and embedded as literals in both the Spark plan and
    * the DuckDB oracle, so the two engines share constants instead of
    * each calling their own libm. */
  private[graft] def ndcgGainsPpm(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  def bm25Ndcg(docs: DataFrame, queryMod: Long = 10L,
      queryTokens: Int = 3, k: Int = 10, maxQueries: Int = 200,
      outcomes0: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && k <= 63, "k in [1,63]")
    val o = outcomes0.getOrElse(
      bm25KnownItemOutcomes(docs, queryMod, queryTokens, k, maxQueries))
    val gainArr = s"array(${ndcgGainsPpm(k).map(g => s"${g}L").mkString(", ")})"
    o.agg(count(lit(1)).as("n_queries"),
        count(col("rank")).as("n_found"),
        coalesce(sum(when(col("rank").isNotNull,
          expr(s"element_at($gainArr, CAST(rank AS INT))"))
          .otherwise(0L)), lit(0L)).as("gain_sum"))
      .select(col("n_queries"), col("n_found"),
        when(col("n_queries") === 0L, 0L)
          .otherwise(expr("gain_sum div n_queries")).as("ndcg_ppm"))
  }

  /** Token frequency spectrum: how many distinct tokens occur ~2^b
    * times (bucket = the exact bitlen-as-string ⌊log₂ freq⌋, the q110
    * convention) and what share of all token OCCURRENCES each band
    * owns — the Zipf read without a global rank sort: a natural
    * corpus shows the long-tail staircase (many rare tokens, few
    * frequent ones owning most mass); template/boilerplate corpora
    * show a hollowed middle. Vocabulary-grain aggregate → ≤64-row
    * histogram; no sort, no window over the vocabulary. */
  def tokenSpectrum(docs: DataFrame): DataFrame = {
    val whole = Window.partitionBy()
    docs
      .filter(col("text").isNotNull)
      .select(explode(expr(TextAnalysis.TokensExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .withColumn("bucket", (length(bin(col("freq"))) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("occurrences"))
      .withColumn("occ_share_bp",
        floor(lit(10000.0) * col("occurrences") /
          sum(col("occurrences")).over(whole)).cast("long"))
      .orderBy(col("bucket").asc)
  }

  /** Per-document KEYWORDS: top `k` tokens by tf·idf with the
    * no-libm idf — idf_bits = ⌊log₂(N/df)⌋ via the bitlen identity
    * ([[TrainingPrep.flog2Ratio]], the q114 DSIR convention), so the
    * score is pure BIGINT and bit-identical cross-engine. Corpus-wide
    * stopwords (df = N) score 0 bits and sink; rare distinctive terms
    * rise. Tie-break token asc — deterministic keyword lists.
    *
    * Scale shape: one tokenize pass to (doc, token) grain (persisted
    * — it feeds both the document-frequency aggregate and the score
    * join), token-grain df, a 1-row N broadcast, and a per-doc top-k
    * window. The df join is token-grain × doc-token-grain on the
    * token key — the natural shuffle; no corpus re-scan. */
  /** Vocabulary GROWTH curve (the Heaps'-law read): at doc-id
    * checkpoints (quarters of the id range — a derived, declared
    * domain, per the SURVEY rule), the cumulative token count,
    * cumulative DISTINCT token count, and type-token ratio. A corpus
    * whose vocabulary keeps growing linearly is unbounded-entropy
    * (ids, hashes, noise); one that flattens is natural language —
    * the curve says which, and where dedup/cleaning bent it.
    *
    * Exactness without re-scanning per checkpoint: a token's
    * cumulative-distinct contribution at cutoff c is `first_doc ≤ c`
    * — so ONE tokenize pass feeds a token-grain first-occurrence
    * aggregate and a doc-grain count, and each checkpoint is a
    * broadcast theta-join over those two bounded frames. */
  def vocabGrowth(docs: DataFrame, checkpoints: Int = 4): DataFrame = {
    require(checkpoints >= 1 && checkpoints <= 64, "1..64 checkpoints")
    val tok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(expr(TextAnalysis.TokensExpr)).as("token"))
      .persist()
    val firsts = tok.groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val docTokens = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cuts = docs.sparkSession.range(1, checkpoints + 1).toDF("checkpoint")
      .crossJoin(broadcast(tok.agg(max(col("doc_id")).as("m"))))
      .select(col("checkpoint"),
        expr(s"(m * checkpoint) div ${checkpoints}L").as("cutoff"))
    val d = broadcast(cuts).join(docTokens, col("doc_id") <= col("cutoff"))
      .groupBy(col("checkpoint"), col("cutoff"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))
    val v = broadcast(cuts.select(col("checkpoint").as("cp"),
        col("cutoff").as("cut")))
      .join(firsts, col("first_doc") <= col("cut"))
      .groupBy(col("cp"))
      .agg(count(lit(1)).as("distinct_tokens"))
    d.join(v, col("checkpoint") === col("cp"))
      .select(col("checkpoint"), col("cutoff"), col("n_docs"),
        col("total_tokens"), col("distinct_tokens"),
        floor(lit(10000.0) * col("distinct_tokens") / col("total_tokens"))
          .cast("long").as("ttr_bp"))
      .orderBy(col("checkpoint").asc)
  }

  def docKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(expr(TextAnalysis.TokensExpr)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_bits",
        TrainingPrep.flog2Ratio(col("n"), col("df")))
      .withColumn("score", col("tf") * col("idf_bits").cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("token"), col("tf"), col("df"),
        col("idf_bits"), col("score"))
      .orderBy(col("doc_id").asc, col("rank").asc)
  }
}
