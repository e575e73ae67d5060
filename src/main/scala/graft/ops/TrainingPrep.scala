package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-mile training-data preparation: turning a cleaned corpus into
  * the shapes a trainer consumes — fixed-length packed sequences,
  * overlapping context chunks, and per-source epoch replication.
  *
  * All three are deterministic and integer-only, so each has a DuckDB
  * oracle twin; none needs state beyond one windowed cumsum.
  */
object TrainingPrep {

  /** GPT-style contiguous sequence packing: documents are laid out in
    * a deterministic order within each shard as one token stream, and
    * the stream is cut every `seqLen` tokens; a document's `seq_id`
    * is the training sequence its FIRST token lands in.
    *
    * Scale shape: the only stateful step is a running token total,
    * one window per shard — and shard count is a free parallelism
    * knob (pick ≥ cluster cores; each shard is an independent output
    * file of a training run). No shuffle beyond the one
    * hash-partition on shard; no global ordering is ever imposed on
    * the corpus. The alternative (first-fit bin packing) needs
    * sequential state per bin and packs only ~2% tighter at
    * seqLen ≫ median doc length — the stream cut is what production
    * pipelines ship. */
  def packSequences(docs: DataFrame, shards: Int = 8, seqLen: Long = 2048L): DataFrame = {
    val byShard = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(expr(TextAnalysis.TokensExpr)).cast("long").as("token_count"))
      .withColumn("start_offset",
        coalesce(sum(col("token_count")).over(byShard), lit(0L)))
      .withColumn("seq_id",
        floor(col("start_offset") / lit(seqLen.toDouble)).cast("long"))
  }

  /** Packing-efficiency report for [[packSequences]]'s stream cut:
    * per shard, the tokens packed, the training sequences produced
    * (⌈T/seqLen⌉ — the stream cut pads only the final partial
    * sequence), the tail waste, and utilization in bp — the "how much
    * compute goes to padding" number a packing config is judged by
    * (the stream cut's utilization is 1 − waste/(n·L), near-perfect
    * for T ≫ L; a per-DOC padding scheme would sit far lower, which
    * is the comparison this report exists to make).
    *
    * Same shard rule as packSequences (doc_id mod S — spec-pinned
    * equivalence); ceil in pure BIGINTs. One bounded shard-grain
    * aggregate. */
  def packingEfficiency(docs: DataFrame, shards: Int = 8,
      seqLen: Long = 2048L): DataFrame = {
    require(shards >= 1 && seqLen >= 1, "positive shards/seqLen")
    docs
      .filter(col("text").isNotNull)
      .select(pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(expr(TextAnalysis.TokensExpr)).cast("long").as("tc"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("tokens"))
      .withColumn("n_seqs",
        expr(s"(tokens + ${seqLen - 1}L) div ${seqLen}L"))
      .withColumn("tail_waste",
        col("n_seqs") * lit(seqLen) - col("tokens"))
      .withColumn("utilization_bp",
        when(col("n_seqs") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("tokens") /
            (col("n_seqs") * lit(seqLen))).cast("long")))
  }

  /** Systematic probability-proportional-to-size sampling: pick every
    * `stride`-th token position in the shard's token stream; a doc is
    * drawn once per pick landing inside its span, so selection
    * probability (and expected multiplicity, for docs longer than the
    * stride) is EXACTLY proportional to token count — the classic
    * survey-sampling PPS scheme, here as the deterministic weighted
    * sampler for "sample ~N tokens of corpus, long docs
    * proportionally more often". Deterministic alternatives to this
    * need `u^(1/w)` exponentials (A-ES) — floating pow that no
    * cross-engine contract survives; systematic PPS is pure integer
    * arithmetic.
    *
    * Per shard, pick positions are r, r+S, r+2S, … with the phase
    * r = (shard·48271 + 12345) mod S (a fixed Lehmer draw — varying
    * phases across shards avoids the classic systematic-sampling
    * periodicity artifact). picks(doc) = #{m : r + mS ∈ [off,
    * off+tok)} computed by two shifted floor-divs (+S keeps both
    * numerators non-negative: `div` truncates toward zero, not
    * -inf, so a negative operand would diverge from floor — and
    * DuckDB `//` shares the hazard; staying non-negative sidesteps
    * it in both engines).
    *
    * Scale shape = [[packSequences]]: one hash shuffle on shard, one
    * per-shard cumsum window, shard count the parallelism knob.
    * Output: sampled docs only, with multiplicity. */
  def ppsSample(docs: DataFrame, stride: Long = 512L, shards: Int = 8): DataFrame = {
    require(stride >= 1L && shards >= 1, "stride and shards must be positive")
    val byShard = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(expr(TextAnalysis.TokensExpr)).cast("long").as("token_count"))
      .withColumn("start_offset",
        coalesce(sum(col("token_count")).over(byShard), lit(0L)))
      .withColumn("__r", expr(s"(shard * 48271L + 12345L) % $stride"))
      .withColumn("picks", expr(
        s"""(start_offset + token_count - 1L - __r + $stride) div $stride
           | - (start_offset - 1L - __r + $stride) div $stride""".stripMargin))
      .filter(col("picks") > 0L)
      .select("doc_id", "shard", "token_count", "start_offset", "picks")
  }

  /** Overlapping context chunks: split each document into windows of
    * `chunkTokens` tokens advancing by `stride` (< chunkTokens ⇒
    * consecutive chunks overlap — the RAG/long-context preprocessing
    * shape). Pure per-row array work (transform over an index
    * sequence + slice), explodes to one row per chunk with no
    * shuffle at all; the last chunk clamps at the document end in
    * both engines. Short docs (≤ chunkTokens) yield exactly one
    * chunk. */
  def chunk(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && chunkTokens > 0, "chunkTokens and stride must be positive")
    // last chunk index k = max(0, ceil((n_tokens - chunkTokens) / stride))
    // via integer arithmetic: floor((n - C + S - 1) / S).
    val lastIdx = s"greatest(CAST(floor((size(__t) - $chunkTokens + $stride - 1) " +
      s"/ CAST($stride AS DOUBLE)) AS BIGINT), 0L)"
    docs
      .filter(col("text").isNotNull)
      .withColumn("__t", expr(TextAnalysis.TokensExpr))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0L, $lastIdx), " +
          s"i -> array_join(slice(__t, CAST(i * $stride + 1 AS INT), $chunkTokens), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"))
  }

  /** T5-style span-corruption ACCOUNTING (Raffel et al. 2020 §3.1.4)
    * — the objective-planning pass a seq2seq pretraining pipeline
    * runs before committing a corpus: with a deterministic md5 draw
    * per (doc, token position), positions open a corruption span
    * with probability `startBp`/10⁴ and each span covers 1 +
    * (draw % maxSpan) tokens (overlapping spans merge — the run is
    * one sentinel). Per doc: token count, masked count, merged span
    * count, and the encoder/decoder sequence lengths the objective
    * produces — input = kept tokens + one sentinel per span,
    * target = masked tokens + one sentinel per span + EOS — plus
    * the realized corruption rate in bp. Length accounting is what
    * sizes batches and packing (q56); the materialized masked text
    * is a trivial projection of the same mask.
    *
    * The mask is WINDOW-exact, not sequential: a position is masked
    * iff some start within the previous `maxSpan` positions still
    * covers it — an OR over `maxSpan` lags, identical in both
    * engines; span count = mask-run starts (masked ∧ ¬masked₋₁).
    *
    * Scale shape: one token-grain explode with all windows on the
    * SAME (doc)-partitioned ordering (one shuffle), collapsing to a
    * doc-grain report. Columns: doc_id, n_tokens, n_masked,
    * n_spans, input_len, target_len, corrupt_bp. */
  def spanCorruption(docs: DataFrame, startBp: Long = 500L,
      maxSpan: Int = 5): DataFrame = {
    require(startBp >= 1 && startBp <= 10000, "startBp in [1,10000]")
    require(maxSpan >= 1 && maxSpan <= 16, "maxSpan in [1,16]")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), posexplode(expr(TextAnalysis.TokensExpr)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("draw", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING) || ':' ||" +
          " CAST(pos AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("start", (col("draw") % 10000L < startBp).cast("int"))
      .withColumn("len",
        when(col("start") === 1, col("draw") % maxSpan + 1L)
          .otherwise(0L))
    val masked = (0 until maxSpan).map { k =>
      coalesce(lag(col("start"), k).over(byDoc), lit(0)) === 1 &&
        coalesce(lag(col("len"), k).over(byDoc), lit(0L)) > k.toLong
    }.reduce(_ || _)
    toks
      .withColumn("m", masked.cast("long"))
      .withColumn("run_start",
        (col("m") === 1L &&
          coalesce(lag(col("m"), 1).over(byDoc), lit(0L)) === 0L)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("m")).as("n_masked"),
        sum(col("run_start")).as("n_spans"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"),
        (col("n_tokens") - col("n_masked") + col("n_spans"))
          .as("input_len"),
        (col("n_masked") + col("n_spans") + lit(1L)).as("target_len"),
        expr("(10000 * n_masked) DIV n_tokens").as("corrupt_bp"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-source epoch replication (data-mixture weighting): each
    * document appears `weights(source)` times (default 1), tagged
    * with its epoch ordinal — the explode-side of "upsample the
    * high-quality slice N×". Pure row expansion (P6's ×N flatMap as a
    * real pipeline op); downstream shuffles see the multiplied rows,
    * so weights belong AFTER filtering/dedup, right before the final
    * write. */
  def epochMix(docs: DataFrame, weights: Map[String, Int], default: Int = 1): DataFrame = {
    require((default +: weights.values.toSeq).forall(_ >= 0), "weights must be >= 0")
    val epochs = weights.foldLeft(lit(default.toLong)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(w.toLong)).otherwise(acc)
    }
    // weight 0 ⇒ empty array ⇒ explode drops the doc (sequence(1,0)
    // would count DOWN and emit two rows — Spark infers step sign).
    docs
      .withColumn("epoch", explode(
        when(epochs >= 1L, sequence(lit(1L), epochs))
          .otherwise(typedlit(Seq.empty[Long]))))
  }

  /** Deterministic train/val/test split: each doc lands in one split
    * by a Lehmer-style permutation of its id into basis points —
    * train < `trainBp` ≤ val < `trainBp + valBp` ≤ test. Engine- and
    * layout-independent (pure integer arithmetic — `rand(seed)` would
    * depend on partitioning), stable across reruns so incremental
    * pipeline stages never see a doc migrate between splits. The
    * inner mod keeps the multiply far from Long overflow even for
    * 63-bit hash-derived doc ids (ANSI mode would throw). pmod (not
    * %) at BOTH levels, so NEGATIVE doc_ids — ~half of all
    * hash-minted ids (DocFiles) — land in [0, 10000) too; any
    * cross-engine twin must pmod-wrap the INNER mod as well (the
    * dividend sign leaks through the multiply: 1000003*48271 % 10000
    * = 4813 ≠ 0). Zero shuffle. */
  /** The split verdict as a pure COLUMN over any id — the same Lehmer
    * permutation [[split]] applies, usable anywhere a doc id appears
    * without touching the corpus (e.g. on a pair frame's two sides). */
  def splitCol(id: Column, trainBp: Long = 9800L, valBp: Long = 100L): Column = {
    val bp = pmod(pmod(id, lit(1000003L)) * lit(48271L) + lit(12345L),
      lit(10000L))
    when(bp < trainBp, "train")
      .when(bp < trainBp + valBp, "val")
      .otherwise("test")
  }

  def split(docs: DataFrame, trainBp: Long = 9800L, valBp: Long = 100L): DataFrame = {
    require(trainBp + valBp <= 10000L, "trainBp + valBp must leave room for test")
    docs.withColumn("split", splitCol(col("doc_id"), trainBp, valBp))
  }

  /** Split leakage audit: where do near-duplicate pairs sit relative
    * to the train/val/test split? A near-dup pair with one side in
    * train and the other in val/test is memorization leakage — the
    * eval doc's content is effectively in the training set even
    * though exact-match decontamination (q55) would pass it. One row
    * per unordered split pair: pair count, worst-case similarity, and
    * the cross-split flag the release gate alerts on.
    *
    * Scale shape: rides q22's banded pair space (pairs ≪ corpus);
    * split assignment is [[splitCol]] — a PURE FUNCTION of the ids
    * already on the pair row, so the audit adds zero joins and zero
    * corpus scans beyond the pair pipeline, just one bounded-domain
    * (≤ 6 split-pair keys) aggregate. */
  def splitLeakage(docs: DataFrame, trainBp: Long = 9800L,
      valBp: Long = 100L, thresholdBp: Long = 8000L): DataFrame =
    Dedup.minhashDedupPairs(docs, thresholdBp)
      .withColumn("split_a", splitCol(col("doc_a"), trainBp, valBp))
      .withColumn("split_b", splitCol(col("doc_b"), trainBp, valBp))
      .select(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"),
        col("jaccard_bp"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("jaccard_bp")).as("max_jaccard_bp"))
      .withColumn("is_cross",
        (col("split_lo") =!= col("split_hi")).cast("long"))

  /** Data-mixture allocation: turn declared per-source mixture
    * weights + a token budget into per-source sampling rates — the
    * PLANNING step upstream of `epochMix` (which applies weights) and
    * `split`. For each source: its target share of the budget
    * (weights normalized over the sources actually present), the
    * sampling rate that hits it (capped at 100% — one pass, no
    * repetition), the planned token yield, and the unmet `deficit`
    * a capped source leaves (the signal to upweight elsewhere or
    * allow epochs > 1).
    *
    * Scale shape: the corpus collapses to per-source token totals in
    * one partial-aggregated shuffle (sources are a bounded domain);
    * everything after is metadata-grain arithmetic with the weight
    * total broadcast. Integer/bp math throughout (the house floor
    * convention) — bit-exact in any engine. */
  def mixturePlan(docs: DataFrame, weights: Map[String, Long],
      budgetTokens: Long, defaultWeight: Long = 1L): DataFrame = {
    // typed when-chain, not SQL-text splicing: source names are
    // data-domain strings and may contain quotes
    val weightCol = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
        when(col("source") === lit(s), lit(w)).otherwise(acc)
      }
    val avail = docs
      .filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(sum(size(expr(TextAnalysis.TokensExpr)).cast("long"))
        .as("available_tokens"))
      .withColumn("w", weightCol.cast("long"))
    // weight total via a window over the already-aggregated frame —
    // a single-partition exchange of ≤|sources| rows, NOT a second
    // aggregate whose plan would rescan the corpus
    avail
      .withColumn("total_w", sum(col("w")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("target_bp",
        floor(lit(10000.0) * col("w") / col("total_w")).cast("long"))
      .withColumn("desired_tokens",
        floor(lit(budgetTokens.toDouble) * col("target_bp") / lit(10000.0))
          .cast("long"))
      .withColumn("keep_bp",
        least(lit(10000L),
          floor(lit(10000.0) * col("desired_tokens") / col("available_tokens"))
            .cast("long")))
      .withColumn("planned_tokens",
        floor(col("available_tokens") * col("keep_bp") / lit(10000.0))
          .cast("long"))
      .withColumn("deficit",
        greatest(lit(0L), col("desired_tokens") - col("planned_tokens")))
      .select(col("source"), col("available_tokens"), col("target_bp"),
        col("desired_tokens"), col("keep_bp"), col("planned_tokens"),
        col("deficit"))
  }

  /** Temperature-smoothed language mixture (the XLM-R / mBERT
    * exponential-smoothing rule, Conneau et al. 2020 §3.1): sampling
    * weight ∝ tokens^α, which upweights tail languages relative to
    * their raw share so the head language doesn't drown them. α is
    * FIXED at 1/2: sqrt is the one power IEEE 754 requires to be
    * correctly rounded, so ⌊√tokens⌋ is bit-identical in every
    * engine — an arbitrary-α pow() is not, and a mixture table that
    * differs per engine is exactly the non-determinism the house
    * rules exist to kill (token counts < 2^53 stay double-exact).
    *
    * Per language: raw token share, smoothed sampling share (both bp,
    * floor), and the token allocation from `budgetTokens`. Null-text
    * docs carry no tokens; a null lang is its own mixture row (the
    * unidentified bucket — real corpora always have one).
    *
    * Scale shape: one corpus pass collapsing into a bounded-domain
    * (lang) hash aggregate; the share normalization is a
    * single-partition window over ≤|langs| rows (the mixturePlan
    * convention — never a second corpus scan). */
  def languageMix(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    docs
      .filter(col("text").isNotNull)
      .groupBy(col("lang"))
      .agg(sum(size(expr(TextAnalysis.TokensExpr)).cast("long"))
        .as("tokens"))
      .withColumn("w", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .withColumn("total_tokens", sum(col("tokens")).over(whole))
      .withColumn("total_w", sum(col("w")).over(whole))
      .withColumn("raw_bp",
        floor(lit(10000.0) * col("tokens") / col("total_tokens")).cast("long"))
      .withColumn("target_bp",
        floor(lit(10000.0) * col("w") / col("total_w")).cast("long"))
      .withColumn("sampled_tokens",
        floor(lit(budgetTokens.toDouble) * col("target_bp") / lit(10000.0))
          .cast("long"))
      .select(col("lang"), col("tokens"), col("raw_bp"), col("target_bp"),
        col("sampled_tokens"))
  }

  /** Deterministic exact-k per-group holdout (human-eval sampling):
    * the k docs per `groupCol` with the smallest md5(doc_id) — the
    * engine's layout-independent pseudo-random draw (q12's R1
    * convention; `rand(seed)` depends on partition layout, md5 does
    * not), so the SAME eval docs come back on any cluster and any
    * rerun. Plans as WindowGroupLimit (rank pushdown): per-group
    * state during the shuffle is k rows, not the group. */
  def evalSample(docs: DataFrame, k: Int = 2, groupCol: String = "lang"): DataFrame = {
    require(k > 0, "k must be positive")
    docs
      .withColumn("draw", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("draw"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("rk"), col("doc_id"))
  }

  /** Deterministic per-source document cap — the domain-balancing
    * primitive (a C4/RefinedWeb-style pipeline step: no single
    * source/domain may contribute more than `cap` docs to a
    * mixture). EXACT variant: the `cap` docs with the smallest
    * md5(doc_id) draw per source — the house layout-independent
    * pseudo-random draw, so the same survivors come back on any
    * cluster/rerun. Plans as WindowGroupLimit (rank pushdown): each
    * map task forwards at most `cap` rows per source into the
    * shuffle, so this is right when `cap` is SMALL; for
    * corpus-fraction caps at 100 TB use [[sourceCapRate]]. */
  def sourceCapExact(docs: DataFrame, cap: Int): DataFrame =
    // exactly the eval-holdout draw-and-rank grouped by source — ONE
    // implementation of the house md5 draw idiom (a second copy would
    // silently diverge on any future tie-break/draw change)
    evalSample(docs, cap, groupCol = "source")

  /** Rate variant of the source cap, shaped for 100 TB: keep the
    * deterministic hash-slice of each source sized `cap`/count. One
    * count-grain aggregate (map-side partial, sources are a bounded
    * domain), a broadcast join back, and a pure map filter — NO
    * window, NO per-group ordering, zero skew sensitivity. The kept
    * COUNT is binomial around `cap` (±√cap); WHICH docs survive is
    * exact and rerun-stable: a doc is kept iff the first 32 bits of
    * its md5 draw fall under the per-source threshold
    * floor(2³² · cap / n_src) — one exact-int double divide + floor,
    * bit-stable cross-engine (house float rules, SURVEY §7.3). */
  def sourceCapRate(docs: DataFrame, cap: Long): DataFrame = {
    require(cap > 0, "cap must be positive")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    docs
      .join(broadcast(counts), "source")
      .withColumn("draw32", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("keep",
        (col("draw32") <
          floor(lit(4294967296.0) * cap / col("n_src")).cast("long")).cast("int"))
      .select(col("doc_id"), col("source"), col("n_src"), col("keep"))
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007) — weighted
    * sampling WITHOUT replacement with unbiased subset-sum
    * estimation: the principled "keep k documents but let big ones
    * count more" draw a token-budgeted pipeline wants where
    * [[ppsSample]]'s systematic stride keeps rates, not a fixed k.
    * Each doc gets priority q = ⌊w·2⁴⁰ / h⌋ where h is its 40-bit
    * md5 draw + 1 (the house layout-independent randomness; h/2⁴⁰
    * plays the uniform u so q = w/u exactly as published) and w =
    * n_chars. The k highest priorities are the sample; with τ = the
    * (k+1)-th priority, each kept doc's Horvitz–Thompson weight is
    * max(w, τ) — Σ over the sample estimates Σw over the corpus
    * unbiasedly (the DLT theorem), which a spec twin checks against
    * the exact total within tolerance.
    *
    * All integer: the DIV runs in decimal(38,0) (w·2⁴⁰ ≤ 10⁶·2⁴⁰
    * overflows nothing there), priorities and τ are BIGINT, ties
    * break doc_id-asc.
    *
    * Scale shape: one map pass computes priorities; the sample is a
    * TakeOrdered(k+1) head — no shuffle of the corpus, no window.
    * Columns: doc_id, source, weight, priority, ht_weight. */
  def prioritySample(docs: DataFrame, k: Int = 100): DataFrame = {
    require(k >= 1, "k >= 1")
    val dec = "decimal(38,0)"
    val scored = docs
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull &&
        col("n_chars") > 0L)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("weight"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10)" +
          " AS BIGINT) + 1"))
      .withColumn("priority", expr(
        s"CAST((CAST(weight AS $dec) * 1099511627776) DIV h AS BIGINT)"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k + 1) // TakeOrderedAndProject: the k sample + τ carrier
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id").asc)))
      .persist()
    // τ = the (k+1)-th priority; 0 when the corpus fits in k (every
    // doc kept, HT weight = its own weight — the DLT small-n case)
    val tau = scored.agg(coalesce(
      max(when(col("__rk") === k + 1, col("priority"))), lit(0L)).as("tau"))
    scored
      .filter(col("__rk") <= k)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("source"), col("weight"), col("priority"),
        greatest(col("weight"), col("tau")).as("ht_weight"))
      .orderBy(col("priority").desc, col("doc_id").asc)
  }

  /** Curriculum quantile buckets: assign each document a difficulty
    * bucket 0..`buckets`-1 by corpus-wide quality rank (here the
    * type-token ratio from `TextAnalysis.textQuality`, descending —
    * bucket 0 = cleanest quartile first, the standard curriculum /
    * quality-ascending training order).
    *
    * Scale shape — deliberately NOT `ntile()`: a global ntile is a
    * single-partition window (one task sorts the corpus), and its
    * tie-splitting makes equal-score docs land in different buckets
    * depending on row order. Instead the score domain is aggregated
    * to value grain (ttr_bp has ≤10001 distinct values — metadata-
    * sized at ANY corpus size), a value-grain running count gives
    * each score its strictly-greater rank prefix, and
    * `bucket = floor(buckets * rank_before / n)` maps back over the
    * corpus via a broadcast-class join. One count-shaped shuffle
    * total; the only window runs over the ≤10001-row value table.
    * Ties share a bucket by construction (value-deterministic —
    * reruns and repartitions cannot migrate a doc), which is the
    * reproducibility property a training curriculum actually wants. */
  def curriculumBuckets(docs: DataFrame, buckets: Int = 4): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // null-text docs have no ttr and would silently vanish in the
    // ttr_bp equi-join below — exclude them explicitly (the oracle
    // filters identically)
    val scored = TextAnalysis.textQuality(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), col("ttr_bp"))
    val byScore = scored.groupBy(col("ttr_bp"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = byScore
      .withColumn("rank_before",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("ttr_bp").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("ttr_bp"),
        floor(lit(buckets.toDouble) * col("rank_before") / col("n"))
          .cast("long").as("bucket"))
    scored.join(broadcast(ranked), "ttr_bp")
      .select(col("doc_id"), col("ttr_bp"), col("bucket"))
  }

  /** Deterministic global training-order shuffle: every kept doc gets
    * a pseudo-random (shard, pos) — the WebDataset/Megatron data-order
    * contract, where the loader reads shards in parallel and each
    * shard sequentially. The draw is the house md5 idiom (q12/q79):
    * layout- and engine-independent, so the SAME training order comes
    * back on any cluster, any rerun — `rand(seed)` or `repartition`
    * order would not. The shard key is the draw's top 32 bits, NOT
    * doc_id arithmetic: `doc_id % S` would correlate with every other
    * id-modular assignment in the pipeline (packSequences shards,
    * snapshot fixtures), and a shuffle whose shards echo ingest order
    * isn't a shuffle.
    *
    * Scale shape: one hash-partition shuffle on shard + one per-shard
    * sort of corpus/S rows; S is a free parallelism knob (pick ≥
    * cluster cores, each shard an independent output file). The sort
    * is the operator's PURPOSE (producing an order), not overhead —
    * and it is the only one: no global window, no single-partition
    * exchange anywhere. */
  def shardShuffle(docs: DataFrame, shards: Int = 8): DataFrame = {
    require(shards >= 1, "shards must be positive")
    withShard(docs, shards)
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("draw"), col("doc_id"))) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** shardShuffle's assignment step alone — shard is a PURE FUNCTION
    * of doc_id (md5 draw, top 32 bits, mod S), so consumers that only
    * need the assignment (the mixing audit below) recompute it as a
    * map stage instead of joining the shuffle output back. */
  private def withShard(docs: DataFrame, shards: Int): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .withColumn("draw", md5(col("doc_id").cast("string")))
      .withColumn("draw32", expr(
        "CAST(conv(substring(draw, 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("shard", pmod(col("draw32"), lit(shards.toLong)))

  /** Shard-mixing audit for [[shardShuffle]]: per shard, how far the
    * shard's SOURCE composition (by tokens) sits from the corpus-wide
    * composition — total-variation distance in basis points plus the
    * worst single-source deviation. A correct global shuffle makes
    * every shard a miniature of the corpus; a shard whose TVD spikes
    * means data order still correlates with provenance (the exact
    * failure data-order papers blame for loss spikes — each training
    * window over-exposes one domain). TVD over chi-square/KL per the
    * house no-libm rule (q109's drift convention): floored bp shares,
    * integer |·| sums, one final halving divide.
    *
    * The (shard × source) grid is DENSE — a source absent from a
    * shard is a maximal mixing failure and must contribute its whole
    * global share to that shard's TVD, so the grid is built by cross
    * join (shards × source domain, metadata-sized) and observed
    * counts land on it via a left join with zero-fill.
    *
    * Scale shape: shard is recomputed as a pure map (no join against
    * the shuffle output), the corpus collapses to the (shard, source)
    * grain in ONE aggregate, and everything after — the dense grid,
    * the share windows, the per-shard rollup — runs on S × |sources|
    * rows. */
  def shardMixing(docs: DataFrame, shards: Int = 8): DataFrame = {
    require(shards >= 1, "shards must be positive")
    // persisted: the source-domain derivation below would otherwise
    // re-scan the corpus just to enumerate sources (the bounded
    // S × |sources| aggregate is the LAST corpus-grain frame)
    val observed = withShard(docs, shards)
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(expr(TextAnalysis.TokensExpr)).cast("long")).as("tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = docs.sparkSession
    // both grid sides are metadata-sized (shards × distinct sources);
    // the broadcast hint pins the nested-loop build side against any
    // future AQE re-plan, matching house style (PlanAuditSpec-pinned)
    val grid = spark.range(shards.toLong).toDF("shard")
      .crossJoin(broadcast(observed.select(col("source")).distinct()))
    val dense = grid.join(observed, Seq("shard", "source"), "left")
      .na.fill(0L, Seq("n_docs", "tokens"))
    val wShard = Window.partitionBy(col("shard"))
    val wSource = Window.partitionBy(col("source"))
    val wAll = Window.partitionBy()
    dense
      .withColumn("shard_tokens", sum(col("tokens")).over(wShard))
      .withColumn("source_tokens", sum(col("tokens")).over(wSource))
      .withColumn("total_tokens", sum(col("tokens")).over(wAll))
      // house bp convention: one IEEE multiply + divide + floor each
      .withColumn("share_bp",
        when(col("shard_tokens") === 0L, lit(0L)).otherwise(
          floor(lit(10000.0) * col("tokens") / col("shard_tokens")).cast("long")))
      .withColumn("global_bp",
        floor(lit(10000.0) * col("source_tokens") / col("total_tokens")).cast("long"))
      .withColumn("dev_bp", abs(col("share_bp") - col("global_bp")))
      .groupBy(col("shard"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        max(col("shard_tokens")).as("tokens"), // constant within the shard
        floor(sum(col("dev_bp")).cast("double") / lit(2.0)).cast("long")
          .as("tvd_bp"),
        max(col("dev_bp")).as("max_dev_bp"))
  }

  /** Quality-threshold sweep: for every score bucket, what survives
    * if the keep-gate were set there — the table a data curator reads
    * to CHOOSE the cutoff (docs/tokens retained at each candidate
    * threshold), instead of re-running the filter per candidate.
    * Input is any per-doc scored frame (doc_id, token_count, score) —
    * the q69 classifier, DSIR, or a trained model's output.
    *
    * `bucketWidth` MUST be a power of two: `floor(score / width)` is
    * then an exact binary-scaling divide, so bucket ids are
    * bit-identical cross-engine even for negative scores (where
    * integer `div`'s truncation-toward-zero would disagree with
    * floor).
    *
    * Scale shape: the corpus collapses to score-BUCKET grain in one
    * aggregate; the descending cumulative (≥-threshold semantics)
    * runs on that bounded domain (score range / width rows — the
    * q104/q68 bounded-window convention), so the sweep costs one
    * corpus pass regardless of how many thresholds it prices. */
  def thresholdSweep(scored: DataFrame, bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth >= 1 && (bucketWidth & (bucketWidth - 1)) == 0L,
      "bucketWidth must be a power of two")
    val byBucket = scored
      .withColumn("bucket",
        floor(col("score").cast("double") / lit(bucketWidth.toDouble)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_count")).as("tokens"))
    val wDesc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    byBucket
      .withColumn("min_score", col("bucket") * lit(bucketWidth))
      .withColumn("docs_kept", sum(col("n_docs")).over(wDesc))
      .withColumn("tokens_kept", sum(col("tokens")).over(wDesc))
      .withColumn("docs_kept_bp",
        floor(lit(10000.0) * col("docs_kept") / sum(col("n_docs")).over(wAll))
          .cast("long"))
      .withColumn("tokens_kept_bp",
        floor(lit(10000.0) * col("tokens_kept") / sum(col("tokens")).over(wAll))
          .cast("long"))
      .select(col("bucket"), col("min_score"), col("n_docs"), col("tokens"),
        col("docs_kept"), col("tokens_kept"), col("docs_kept_bp"),
        col("tokens_kept_bp"))
  }

  /** Output-file compaction plan — the small-files planner run before
    * any big write (the #1 operational failure of data lakes: a
    * 100 TB corpus written at default parallelism yields millions of
    * KB-sized files and an unusable metastore). Per source: exact
    * byte volume (n_chars as the text-payload proxy), the file count
    * at `targetBytes`, and rows-per-file — the numbers that become
    * the writer's `repartition(n)` call.
    *
    * files = ceil(bytes / target) computed in pure BIGINT
    * ((bytes + target − 1) div target — no float ceil), min 1 so an
    * empty-but-present source still gets a file.
    *
    * Scale shape: one bounded source-grain aggregate over the scan;
    * the plan table is metadata. */
  def compactionPlan(docs: DataFrame, targetBytes: Long = 128L * 1024 * 1024)
      : DataFrame = {
    require(targetBytes >= 1, "targetBytes must be positive")
    docs.filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("bytes"))
      .withColumn("n_files",
        greatest(lit(1L),
          expr(s"(bytes + ${targetBytes - 1}L) div ${targetBytes}L")))
      .withColumn("rows_per_file", expr("n_docs div n_files"))
  }

  /** Recency-weighted sampling over the event stream — train-on-fresh
    * damping where an event's keep probability HALVES per
    * `halfLifeDays` of age (a dyadic decay: the keep threshold is an
    * exact integer shift, no float pow — the q81 rate-gate made
    * time-aware). keep iff md5-draw bp < ⌊10000 / 2^age_halflives⌋;
    * age from an explicit `asOf` anchor date (no wall clock — q94's
    * rule). Deterministic and rerun/layout-stable like every house
    * draw.
    *
    * Scale shape: a PURE MAP — draw, age arithmetic, shift, compare;
    * no shuffle, no state. */
  def recencySample(events: DataFrame, asOf: String,
      halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be positive")
    events
      .withColumn("age_days",
        datediff(lit(asOf).cast("date"), col("ts").cast("date")).cast("long"))
      .filter(col("age_days") >= 0L) // future events have no age yet
      .withColumn("halflives", expr(s"age_days div ${halfLifeDays}L"))
      .withColumn("keep_bp",
        when(col("halflives") >= 14L, lit(0L)) // 10000 >> 14 == 0
          .otherwise(call_function("shiftright", lit(10000L),
            col("halflives").cast("int"))))
      .withColumn("draw_bp", expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"))
      .filter(col("draw_bp") < col("keep_bp"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("age_days"), col("keep_bp"))
  }

  /** Preference-pair mining (DPO/RLHF dataset prep): per source, pair
    * the `k` highest-scoring documents (chosen) against the `k`
    * lowest-scoring ones (rejected) — the classic
    * best-vs-worst-of-pool construction when no human labels exist
    * yet (quality-scorer margins stand in for preferences). Pairs
    * require a STRICT score margin: an equal-score pair teaches
    * nothing and its orientation would be an id-order artifact.
    *
    * Scale shape: scores are an inline map over the corpus scan; both
    * extremes are WindowGroupLimit extracts sharing ONE source-key
    * exchange (same partitioning, two sort orders); the pair join is
    * between two (sources × k)-row frames — broadcast-class
    * metadata regardless of corpus size, emitting ≤ k² pairs per
    * source. */
  def preferencePairs(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be positive")
    // persisted: both extreme extracts read the scored frame, and the
    // score is the expensive part (an md5 per token) — the cache is
    // three thin columns, far smaller than re-reading the text
    val scored = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        TextAnalysis.classifierScore.as("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val wBot = Window.partitionBy(col("source"))
      .orderBy(col("score").asc, col("doc_id").asc)
    val chosen = scored.withColumn("__r", row_number().over(wTop))
      .filter(col("__r") <= k)
      .select(col("source"), col("doc_id").as("chosen_doc_id"),
        col("score").as("chosen_score"))
    val rejected = scored.withColumn("__r", row_number().over(wBot))
      .filter(col("__r") <= k)
      .select(col("source").as("r_source"),
        col("doc_id").as("rejected_doc_id"),
        col("score").as("rejected_score"))
    chosen.join(broadcast(rejected), col("source") === col("r_source"))
      .filter(col("chosen_score") > col("rejected_score"))
      .select(col("source"), col("chosen_doc_id"), col("rejected_doc_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** Per-contributor event cap — the "whale damping" / data-
    * minimization gate dataset governance applies before user data
    * enters a training corpus: no single user may contribute more
    * than `k` events. The keep set is the k smallest md5 draws per
    * user (layout-independent, rerun-stable — q80's exact-cap
    * convention applied at the USER key), so re-ingesting the same
    * stream keeps the same rows.
    *
    * Scale shape: one user-key shuffle; the rank cut plans as
    * WindowGroupLimit (partial top-k before the exchange), so a
    * million-event whale forwards k rows per map task, not a
    * million. */
  def contributorCap(events: DataFrame, k: Int = 100): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(md5(col("event_id").cast("string")).asc, col("event_id").asc)
    events
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("event_id"), col("user_id"), col("event_type"))
  }

  /** Corpus concentration report: how unevenly tokens spread across
    * sources — the one-row balance check run before mixture planning
    * (a Gini near 10000 means one domain owns the corpus; near 0
    * means uniform). Gini from the sorted-rank identity
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ asc-sorted (source
    * tie-break), emitted in basis points; top_share_bp is the largest
    * source's token share. Every sum is an exact BIGINT; the two
    * divides are single mirrored IEEE trees (house bp convention).
    *
    * Scale shape: the corpus collapses to source grain in ONE
    * aggregate (token counting is size(split) — a map, no explode);
    * the rank window and final rollup run on source-grain rows —
    * metadata-sized at any corpus size. Overflow bound: Σ(i·x) ≤
    * n·Σx and the numerator DOUBLES it (2·iwx), so Spark's BIGINT
    * wraps once n·total_tokens passes 2^62 ≈ 4.6e18 — half a million
    * sources × a ~10T-token corpus stays 1000× inside it. (DuckDB
    * sums in HUGEINT and would NOT wrap, so exceeding the bound is a
    * cross-engine divergence, not a shared wrong answer.) */
  def sourceConcentration(docs: DataFrame): DataFrame = {
    val bySource = docs.filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(sum(size(expr(TextAnalysis.TokensExpr)).cast("long")).as("tokens"))
    bySource
      .withColumn("i", row_number().over(
        Window.orderBy(col("tokens").asc, col("source").asc)).cast("long"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum(col("tokens")).as("total_tokens"),
        sum(col("i") * col("tokens")).as("iwx"),
        max(col("tokens")).as("max_tokens"))
      .select(
        col("n_sources"), col("total_tokens"),
        expr("""CAST(FLOOR((10000.0 * CAST(2 * iwx - (n_sources + 1) * total_tokens AS DOUBLE))
               |     / CAST(n_sources * total_tokens AS DOUBLE)) AS BIGINT)""".stripMargin)
          .as("gini_bp"),
        expr("""CAST(FLOOR((10000.0 * CAST(max_tokens AS DOUBLE))
               |     / CAST(total_tokens AS DOUBLE)) AS BIGINT)""".stripMargin)
          .as("top_share_bp"))
  }

  /** Exact ⌊log₂(a/b)⌋ on positive BIGINTs — the no-libm logarithm
    * (SURVEY §7.3): with d = bitlen(a) − bitlen(b), a/b lies in
    * [2^(d−1), 2^(d+1)), so the floor is d, minus 1 iff a < b·2^d
    * (the shift never overflows: bitlen(b)+d = bitlen(a) ≤ 63).
    * Engine-portable because bitlen is a STRING length (`bin()` here,
    * `format('{:b}')` in DuckDB) — libm log2 rounds differently at
    * power-of-two boundaries, a string length cannot. */
  private[graft] def flog2Ratio(a: Column, b: Column): Column = {
    val d = (length(bin(a)) - length(bin(b))).cast("int")
    val belowPow = when(d >= 0, a < call_function("shiftleft", b, d))
      .otherwise(call_function("shiftleft", a, -d) < b)
    (d - when(belowPow, 1).otherwise(0)).cast("int")
  }

  /** Hashed unigram+bigram feature stream of a docs frame — the
    * bag-of-hashed-ngrams representation DSIR scores over. Bigrams
    * via zip_with against the array tail (pure map, the q86 shape);
    * buckets are the house md5-nibble hash ([[TextAnalysis.bucketOf]]),
    * so the oracle reproduces them bit-for-bit. */
  private def featStream(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("__t", expr(TextAnalysis.TokensExpr))
      .withColumn("__f", concat(col("__t"), expr(
        """zip_with(slice(__t, 1, size(__t) - 1),
          |         slice(__t, 2, size(__t) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)))
      .select(col("doc_id"), col("source"), col("lang"),
        explode(col("__f")).as("f"))
      .withColumn("bucket", expr(TextAnalysis.bucketOf("f")))

  /** Token-budget-constrained selection: keep the highest-scoring
    * documents whose token counts fit a training budget — the
    * selection step downstream of any scorer ([[dsirScore]], the
    * quality classifier, a curriculum metric).
    *
    * NOT a global sort + running cumsum (which would single-partition
    * a 100 TB corpus): scores collapse to VALUE grain first
    * (`curriculumBuckets`' convention — distinct score values are
    * bounded, integer scores over bounded feature sums), the
    * class-level cumsum finds the threshold score s*, and then
    *  - every doc in a class strictly above the threshold is kept by
    *    a broadcast semi-join (pure map over the corpus);
    *  - only the ONE boundary class (partially affordable) is
    *    windowed, in deterministic md5-draw order (the house R1
    *    layout-independent draw), to fill the remaining budget
    *    without exceeding it.
    *
    * The input frame is persisted (it feeds both the class histogram
    * and the two selection joins; scorers are usually expensive).
    * Output: (doc_id, score, token_count, reason ∈ full|boundary);
    * Σ token_count ≤ budgetTokens always, with equality iff the
    * boundary class can fill it doc-exactly. */
  def budgetSelect(scored: DataFrame, budgetTokens: Long): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val s = scored.persist(StorageLevel.MEMORY_AND_DISK)
    val byScore = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val classes = s.groupBy(col("score"))
      .agg(sum(col("token_count")).as("cls_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("cls_tokens")).over(byScore), lit(0L)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val full = classes
      .filter(col("cum_before") + col("cls_tokens") <= budgetTokens)
      .select(col("score"))
    val boundary = classes
      .filter(col("cum_before") < budgetTokens &&
        col("cum_before") + col("cls_tokens") > budgetTokens)
      .select(col("score"), (lit(budgetTokens) - col("cum_before")).as("remaining"))
    val fullSel = s.join(broadcast(full), Seq("score"))
      .select(col("doc_id"), col("score"), col("token_count"))
      .withColumn("reason", lit("full"))
    // the boundary window partitions on the single boundary score —
    // it sorts ONE class, not the corpus
    val byDraw = Window.partitionBy(col("score"))
      .orderBy(col("draw"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundarySel = s.join(broadcast(boundary), Seq("score"))
      .withColumn("draw", md5(col("doc_id").cast("string")))
      .withColumn("cum", sum(col("token_count")).over(byDraw))
      .filter(col("cum") <= col("remaining"))
      .select(col("doc_id"), col("score"), col("token_count"))
      .withColumn("reason", lit("boundary"))
    fullSel.unionByName(boundarySel)
  }

  /** DSIR-style importance scoring (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): rank
    * raw-corpus documents by how target-like their hashed-n-gram
    * profile is. Per feature bucket f, the add-1-smoothed weight
    *
    *   λ(f) = ⌊log₂ p̂_target(f)⌋ − ⌊log₂ p̂_raw(f)⌋
    *        = flog2(t_cnt+1, t_tot+B) − flog2(r_cnt+1, r_tot+B)
    *
    * and a document's score is Σ λ(f) over its feature OCCURRENCES —
    * the log-likelihood ratio of the two bag-of-hashed-ngrams models,
    * quantized to whole bits per feature ([[flog2Ratio]]; exact
    * integers end to end, so the oracle hashes bit-identically — the
    * DSIR paper's float log-ratio would not). Resampling by this
    * score is the selection step; [[budgetSelect]] composes it with a
    * token budget.
    *
    * Scale shape (the reason DSIR beats classifier-per-domain at
    * 100 TB): both distributions live at BUCKET grain — ≤ 65536 rows
    * regardless of corpus size — so the weight table broadcasts, and
    * scoring is a map stage + one doc-grain aggregate. DSIR is
    * inherently two-pass (no doc scores before the global counts
    * exist), but the corpus TEXT is read once: the compact
    * (doc, bucket) feature stream is persisted and the second pass
    * re-reads ~short columnar cache rows instead of re-tokenizing and
    * re-md5-ing the documents (measured ~2× on the bench; at 100 TB
    * the cache spills to disk and is still a fraction of the text
    * scan). The target (a curated seed, MBs-to-GBs) is read once.
    * The weight join is INNER because every raw feature's bucket is
    * by construction in the raw count table — nothing is dropped. */
  def dsirScore(raw: DataFrame, target: DataFrame): DataFrame = {
    val b = lit(TextAnalysis.ClassifierBuckets.toLong)
    val rawFeats = featStream(raw)
      .select(col("doc_id"), col("source"), col("lang"), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tCnt = featStream(target).groupBy(col("bucket"))
      .agg(count(lit(1)).as("t_cnt"))
    val rCnt = rawFeats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("r_cnt"))
    // empty-target guard: SUM over zero rows is NULL, coalesce to 0
    // (every weight then collapses to the constant smoothing floor)
    val tTot = tCnt.agg(coalesce(sum(col("t_cnt")), lit(0L)).as("t_tot"))
    val rTot = rCnt.agg(coalesce(sum(col("r_cnt")), lit(0L)).as("r_tot"))
    val weights = rCnt.join(tCnt, Seq("bucket"), "left")
      .na.fill(0L, Seq("t_cnt"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("weight",
        flog2Ratio(col("t_cnt") + lit(1L), col("t_tot") + b) -
          flog2Ratio(col("r_cnt") + lit(1L), col("r_tot") + b))
      .select(col("bucket"), col("weight"))
    rawFeats
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"), col("lang"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("weight")).cast("long").as("dsir_score"))
  }

  /** Churn-model FEATURE TABLE — the user-grain supervised dataset a
    * retention model trains on, generated declaratively: behavioral
    * features from the window BEFORE `splitDate`, a binary label
    * ("came back") from [splitDate, splitDate + horizonDays). The
    * time split is the leakage boundary — no feature reads an event
    * the label window can see (the q177 backtest discipline applied
    * to dataset GENERATION).
    *
    * Features (all integer): n_events, n_days (distinct active days),
    * n_purchases, value_cents (purchase cents), recency_days (split −
    * last active day). Label: 1 iff the user has ANY event in the
    * horizon. Users with no pre-split events are excluded (no
    * features to learn from; cold-start is q177's covered/uncovered
    * split, a different report).
    *
    * Scale shape: one user-grain aggregate per side — the feature agg
    * over pre-split events, a distinct-user frame over the horizon —
    * joined left at user grain (the label side carries one column).
    * Both aggregates map-side-combine; no window, no explode. */
  def churnFeatures(events: DataFrame, splitDate: String,
      horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be >= 1")
    val split = to_timestamp(lit(splitDate))
    val horizonEnd = expr(
      s"to_timestamp('$splitDate') + make_interval(0, 0, 0, $horizonDays, 0, 0, 0)")
    val isPurchase = col("event_type") === "purchase"
    val feats = events
      .filter(col("ts").isNotNull && col("ts") < split)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        sum(when(isPurchase, 1L).otherwise(0L)).as("n_purchases"),
        sum(when(isPurchase, floor(col("value") * lit(100.0)).cast("long"))
          .otherwise(0L)).as("value_cents"),
        datediff(to_date(split), max(to_date(col("ts")))).cast("long")
          .as("recency_days"))
    val returned = events
      .filter(col("ts").isNotNull && col("ts") >= split && col("ts") < horizonEnd)
      .select(col("user_id")).distinct()
      .withColumn("label", lit(1L))
    feats.join(returned, Seq("user_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0L)))
      .orderBy(col("user_id").asc)
  }

  /** Quantile-normalization mapping for a monetary feature — the
    * rank-based feature transform (the no-libm stand-in for z-score
    * standardization: no mean, no σ, no sqrt) every tabular training
    * pipeline ships so one whale can't dominate a linear model. Per
    * event_type, each distinct value-cents maps to its midrank CDF
    * position in bp: pct_bp = ⌊10⁴·(2·cum_below + cnt)/(2N)⌋ — ties
    * share one midrank (the q260 doubled-unit trick), the mapping is
    * monotone, and the transformed feature is uniform on [0,10⁴] by
    * construction. The output IS the broadcast artifact: training
    * joins raw values against this (type, cents)-grain table.
    *
    * Scale shape: one fact pass to (type, value) grain with map-side
    * combine, then per-type windows over DISTINCT values — the
    * window never sees fact rows, and the result is bounded by the
    * value domain, not the event count. */
  def quantileNormalize(events: DataFrame): DataFrame = {
    val wType = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"))
    val wAll = Window.partitionBy(col("event_type"))
    events
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__cum", sum(col("n_events")).over(wType))
      .withColumn("__n", sum(col("n_events")).over(wAll))
      .select(col("event_type"), col("cents"), col("n_events"),
        floor(lit(10000.0) *
          (lit(2L) * (col("__cum") - col("n_events")) + col("n_events")) /
          (lit(2.0) * col("__n"))).cast("long").as("pct_bp"))
      .orderBy(col("event_type").asc, col("cents").asc)
  }

  /** Exact ⌊√c⌋ for nonnegative BIGINT columns: IEEE sqrt seed, then
    * a ±2 integer correction (the StratifiedExtract convention,
    * here in plain BIGINT — exact while c ≲ 2^62 so the squared
    * candidates stay in range). */
  private[graft] def isqrtCol(c: Column): Column = {
    val y0 = floor(sqrt(c.cast("double"))).cast("long")
    val yu = when((y0 + 2) * (y0 + 2) <= c, y0 + 2)
      .when((y0 + 1) * (y0 + 1) <= c, y0 + 1).otherwise(y0)
    when(yu * yu <= c, yu)
      .when((yu - 1) * (yu - 1) <= c, yu - 1).otherwise(yu - 2)
  }

  /** Word2vec negative-sampling table — the unigram^¾ distribution
    * (Mikolov '13) every skip-gram/contrastive trainer draws noise
    * words from, as a K+1-row inverse-CDF spec: top-K tokens with
    * exact integer weights w = ⌊√(c·⌊√c⌋)⌋ (the deterministic ¾-power
    * — two nested integer sqrts, no libm pow, no float engine drift)
    * and one `<REST>` rollup row carrying the ENTIRE tail's weight
    * mass, so Σ sample_ppm covers the whole vocabulary and a sampler
    * binary-searching `cum_ppm` is correct, not just head-correct.
    * The ¾ exponent is the whole point: raw unigram over-draws
    * stopwords, uniform over-draws garbage; ¾ is the published
    * middle ground.
    *
    * Scale shape: one tokenize pass map-side-combines to vocab
    * grain; weights are per-row scalar integer ops at vocab grain;
    * the head is a TakeOrdered K, the tail collapses via one
    * broadcast anti-join + aggregate; ranks/cumsums run on K+1 rows.
    * Weight arithmetic stays in BIGINT while c ≲ 4×10¹² (c^1.5 must
    * fit); shard the vocab count or pre-divide counts past that. */
  def negativeSampling(docs: DataFrame, topK: Int = 64): DataFrame = {
    // vocab grain; read by the head TakeOrdered and the tail rollup
    // (caller-owns-cache convention)
    val cnts = docs.filter(col("text").isNotNull)
      .select(explode(expr(TextAnalysis.TokensExpr)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      // the inner isqrt is staged through its own projection: inlining
      // it into the outer correction's 6 references builds a ~100-node
      // codegen tree whose janino compile dwarfs the vocab-grain data
      .withColumn("__r1", isqrtCol(col("cnt")))
      .select(col("token"), col("cnt"),
        isqrtCol(col("cnt") * col("__r1")).as("w34"))
      .persist()
    // head and the K+1-row ranked frame are each read by 2-3 plan
    // branches; persisting them keeps the whole sampler derivation at
    // one vocab pass + constant-size fragments (without it, the
    // TakeOrdered head re-plans per branch and codegen compile time
    // dominates the vocab-grain data)
    val head = cnts
      .orderBy(col("cnt").desc, col("token").asc).limit(topK)
      .persist()
    val rest = cnts
      .join(broadcast(head.select(col("token"))), Seq("token"), "left_anti")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
        coalesce(sum(col("w34")), lit(0L)).as("w34"))
      .select(lit("<REST>").as("token"), col("cnt"), col("w34"))
    val wRank = Window.orderBy(col("__last").asc, col("cnt").desc,
      col("token").asc)
    val ranked = head.withColumn("__last", lit(0))
      .unionByName(rest.withColumn("__last", lit(1)))
      .withColumn("rank", row_number().over(wRank))
      .persist()
    val total = ranked.agg(sum(col("w34")).as("__tot"))
    ranked.crossJoin(broadcast(total))
      .withColumn("sample_ppm", expr("(1000000 * w34) DIV __tot"))
      .withColumn("cum_ppm",
        sum(col("sample_ppm")).over(wRank.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("token"), col("cnt"), col("w34"),
        col("sample_ppm"), col("cum_ppm"))
      .orderBy(col("rank").asc)
  }

  /** Effective sample size of the DSIR importance weights — Kish's
    * ESS = (Σw)²/Σw² applied to q114's log₂ scores, the degeneracy
    * meter every importance-reweighting pipeline needs: DSIR can
    * rank 10⁹ documents, but if a handful of docs carry nearly all
    * the weight, the reweighted corpus is EFFECTIVELY that handful
    * (Owen, Monte Carlo theory, ch. 9). Reported per source and
    * overall ('ALL' rollup) — a source whose ESS share collapses is
    * being cherry-picked by the target distribution.
    *
    * Weights are 2^(score − max score) clamped at 2^-`clampBits`
    * (integer: w = 1 << (clampBits + s − smax), 0 below the clamp —
    * a weight 2⁻³⁰ of the max moves neither sum), so the whole
    * ladder is exact; ESS = (Σw)² DIV Σw² in decimal(38,0).
    *
    * Scale shape: rides the q114 score build (one feature pass —
    * or the shared session artifact via `scores0`, the quant0-seam
    * convention); the global max is a 1-row broadcast; moments
    * collapse per source. Columns: source, n_docs, ess_docs,
    * ess_share_bp. */
  def dsirEss(raw: DataFrame, target: DataFrame,
      clampBits: Int = 30, scores0: Option[DataFrame] = None): DataFrame = {
    require(clampBits >= 1 && clampBits <= 60, "clampBits in [1,60]")
    val dec = "decimal(38,0)"
    val scored = scores0.getOrElse(dsirScore(raw, target))
      .select(col("source"), col("dsir_score"))
      .localCheckpoint(false) // max + moments
    val smax = scored.agg(max(col("dsir_score")).as("smax"))
    scored.crossJoin(broadcast(smax))
      .withColumn("w", when(
        col("dsir_score") - col("smax") >= -clampBits.toLong,
        expr(s"shiftleft(CAST(1 AS BIGINT)," +
          s" CAST($clampBits + dsir_score - smax AS INT))"))
        .otherwise(0L))
      .rollup(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
        sum(expr(s"CAST(w AS $dec) * w")).as("sww"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"),
        when(col("sww") > 0, expr(
          s"CAST((CAST(sw AS $dec) * sw) DIV sww AS BIGINT)"))
          .as("ess_docs"))
      .withColumn("ess_share_bp",
        when(col("ess_docs").isNotNull,
          expr("(10000 * ess_docs) DIV n_docs")))
      .orderBy(col("source").asc)
  }

  /** Split covariate-balance audit — the standardized-mean-difference
    * table (the |SMD| < 0.1 rule from the matching literature,
    * Austin 2009, applied to train/val/test): the q63 Lehmer split
    * is provably id-random, but the RESULT still needs auditing —
    * a val set that drew longer documents than train biases every
    * early-stopping decision. Per ordered split pair and per doc
    * feature (n_chars, whitespace token count):
    *   SMD = |μ_a − μ_b| / √((s²_a + s²_b)/2)
    * as an exact milli ladder (decimal cross-moments, one ⌊√⌋ of the
    * micro pooled variance), with a pass flag at `thresholdMilli`.
    *
    * Scale shape: one corpus pass collapses to split×feature moment
    * rows (≤ 6); the ladder is scalar arithmetic on metadata.
    *
    * Columns: split_a, split_b, feature, n_a, n_b, mean_a_milli,
    * mean_b_milli, smd_milli (NULL when a pooled variance is 0),
    * balanced (smd < threshold; NULL with smd). */
  def smdBalance(docs: DataFrame, trainBp: Long = 9800L,
      valBp: Long = 100L, thresholdMilli: Long = 100L): DataFrame = {
    val dec = "decimal(38,0)"
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = docs.filter(col("text").isNotNull)
      .withColumn("split", splitCol(col("doc_id"), trainBp, valBp))
      .select(col("split"),
        explode(array(
          struct(lit("n_chars").as("feature"),
            coalesce(col("n_chars"),
              length(col("text")).cast("long")).as("f")),
          struct(lit("n_tokens").as("feature"),
            size(org.apache.spark.sql.functions.split(col("text"), " "))
              .cast("long").as("f"))))
          .as("e"))
      .select(col("split"), col("e.feature"), col("e.f"))
    val mo = feats.groupBy(col("split"), col("feature"))
      .agg(count(lit(1)).as("n"), sum(col("f")).as("s"),
        sum(expr(s"CAST(f AS $dec) * f")).as("q"))
      .localCheckpoint(false) // ≤6 rows; both pair sides
    val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
      .toDF("split_a", "split_b")
    pairs
      .join(mo.select(col("split").as("split_a"), col("feature"),
        col("n").as("n_a"), col("s").as("sa"), col("q").as("qa")),
        Seq("split_a"))
      .join(mo.select(col("split").as("split_b"),
        col("feature").as("feature"),
        col("n").as("n_b"), col("s").as("sb"), col("q").as("qb")),
        Seq("split_b", "feature"))
      .withColumn("mean_a_milli", expr("(1000 * sa) DIV n_a"))
      .withColumn("mean_b_milli", expr("(1000 * sb) DIV n_b"))
      .withColumn("__va", when(col("n_a") > 1L, expr(
        s"""CAST((1000 * (n_a * qa - CAST(sa AS $dec) * sa))
           |DIV (CAST(n_a AS $dec) * (n_a - 1)) AS BIGINT)"""
          .stripMargin)))
      .withColumn("__vb", when(col("n_b") > 1L, expr(
        s"""CAST((1000 * (n_b * qb - CAST(sb AS $dec) * sb))
           |DIV (CAST(n_b AS $dec) * (n_b - 1)) AS BIGINT)"""
          .stripMargin)))
      .withColumn("__sig", when(
        col("__va").isNotNull && col("__vb").isNotNull &&
          col("__va") + col("__vb") > 0L,
        expr(graft.ops.Experiment.isqrtSql(
          "(1000 * (__va + __vb)) DIV 2"))))
      .withColumn("smd_milli", when(col("__sig") > 0L, expr(
        "(1000 * abs(mean_a_milli - mean_b_milli)) DIV __sig")))
      .withColumn("balanced",
        when(col("smd_milli").isNotNull,
          (col("smd_milli") < thresholdMilli).cast("int")))
      .select(col("split_a"), col("split_b"), col("feature"),
        col("n_a"), col("n_b"), col("mean_a_milli"),
        col("mean_b_milli"), col("smd_milli"), col("balanced"))
      .orderBy(col("split_a").asc, col("split_b").asc,
        col("feature").asc)
  }
}
