package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`, the
  * `embeddings` table: `vec_id, embedding, label`).
  *
  *  - brute-force cosine top-k: broadcast the (small) query set, one
  *    codegen map stage over the corpus, per-query window top-k. The
  *    corpus is never shuffled except by query_id for the final rank —
  *    at 100 TB this is scan-bound, the right baseline.
  *  - sign-LSH ANN: 16-bit random-hyperplane-style bucket from the
  *    leading dimensions' signs; candidates join co-bucketed only, so
  *    the shuffle is on the bucket key and the pair space is bounded.
  *  - embedding near-dup: co-bucketed pairs above a cosine threshold.
  *
  * Cross-engine determinism: components are quantized to integers
  * (`FLOOR(x * 1e6)` as BIGINT) so dot products and norms are EXACT
  * integer sums — no float-reduction-order variance; the final cosine
  * is scalar IEEE ops (sqrt/div/floor), bit-identical in any engine.
  */
object Similarity {

  val QuantScale = "1000000.0"

  /** Bucket width balances recall vs candidate-pair count; 6 bits keeps
    * every test-scale bucket populated. At corpus scale you'd raise it
    * (buckets ~ n / desired-candidates) — it's a single constant. */
  val SignBits = 6

  /** Integer-quantized embedding + exact integer squared norm. */
  def quantized(emb: DataFrame): DataFrame =
    emb
      .withColumn("q", expr(
        s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT))"))
      .withColumn("n2", expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))

  /** The shared ANN index artifact (ops.Shared contract — the
    * sign-LSH/IVF twin of the PQ book+codes): per vector its LSH
    * bucket, integer-quantized components, and exact squared norm.
    * Doc-grain INTEGER rows — the float payload never lands in the
    * artifact (the bucket is materialized here precisely so readers
    * need no float column). Every entry point below accepts it via
    * its `quant0` seam; an ANN service builds this once (it IS the
    * index) and serves every query batch from it. Contract: `quant0`
    * must equal `quantizedCorpus(emb)` for the same corpus. */
  def quantizedCorpus(emb: DataFrame): DataFrame =
    withSignBucket(quantized(emb))
      .select(col("vec_id"), col("label"), col("bucket"), col("q"), col("n2"))

  /** quant0 seam resolution — standalone callers rebuild just the
    * quantized columns inline (NOT the sign bucket: it hard-fails on
    * sub-SignBits vectors, so only the LSH entry points compute it);
    * artifact-backed callers read the checkpointed rows. */
  private def corpusOf(emb: DataFrame, quant0: Option[DataFrame]): DataFrame =
    quant0.getOrElse(quantized(emb)
      .select(col("vec_id"), col("label"), col("q"), col("n2")))

  /** Like [[corpusOf]] but with the LSH bucket — the standalone path
    * of the bucket-keyed ops. */
  private def bucketedCorpusOf(emb: DataFrame,
      quant0: Option[DataFrame]): DataFrame =
    quant0.getOrElse(withSignBucket(quantized(emb)))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression (graft.expressions.DotProductLong):
    * one fused loop, no intermediate zip array, stays in
    * WholeStageCodegen. Equivalent to
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`. */
  def dotExpr(a: String, b: String): Column =
    graft.expressions.DotProductLong.dot(col(a), col(b))

  /** cosine in basis points from integer dot + squared norms. */
  def cosBp(dot: Column, n2a: Column, n2b: Column): Column =
    when(n2a === 0L || n2b === 0L, lit(0L))
      .otherwise(floor(lit(10000.0) * dot /
        (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))).cast("long"))

  /** Brute-force cosine top-k: `queryPred` selects the query vectors
    * (small — broadcast), ranked against the whole corpus. */
  def knnBruteForce(emb: DataFrame, queryPred: Column, k: Int = 10,
      quant0: Option[DataFrame] = None): DataFrame = {
    val q = corpusOf(emb, quant0)
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"), col("n2").as("q_n2"))
    val scored = q.select(col("vec_id").as("neighbor_id"), col("q"), col("n2"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_bp"),
        col("rank").cast("int").as("rank"))
  }

  /** Contrastive hard-negative mining: for each query (anchor)
    * vector, the top-k most-cosine-similar vectors with a DIFFERENT
    * label — the negatives that actually move a contrastive loss
    * (Robinson et al. 2021); random negatives are trivially easy at
    * scale. Same broadcast-query shape as `knnBruteForce` with the
    * label-inequality pushed into the join filter, so the corpus
    * pass prunes same-label rows before any scoring; swap the
    * crossJoin for the IVF/LSH-bucketed probe at billion-vector
    * scale exactly as q26/q32 do for kNN. */
  def hardNegatives(emb: DataFrame, queryPred: Column, k: Int = 3,
      quant0: Option[DataFrame] = None): DataFrame = {
    val q = corpusOf(emb, quant0)
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("q").as("q_q"), col("n2").as("q_n2"))
    val scored = q
      .select(col("vec_id").as("neighbor_id"), col("label"), col("q"), col("n2"))
      .crossJoin(broadcast(queries))
      .filter(col("label") =!= col("q_label"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("label"),
        col("cos_bp"), col("rank").cast("int").as("rank"))
  }

  /** Leave-one-out kNN label accuracy — the embedding-quality probe
    * (the poor man's linear probe: if k nearest neighbors can't
    * predict a vector's own label, no downstream head will): for each
    * probe vector, the majority label among its top-k cosine
    * neighbors (self excluded; vote ties → smaller label, rank ties →
    * smaller id — fully deterministic) scored against the vector's
    * own label, rolled up per true label. Per-class rows expose the
    * confusion structure a single global number hides (one collapsed
    * class can sit inside a healthy-looking average).
    *
    * Columns: label, n_probes, n_correct, acc_bp.
    *
    * Scale shape: q25's broadcast-probe scan (probes are a capped set
    * by contract — the q229 lesson; corpus floats never shuffle),
    * WindowGroupLimit top-k, then everything at (probe, label) and
    * label grain. Swap the crossJoin for the IVF-bucketed probe at
    * billion-vector scale exactly as q32 does. */
  def knnLabelAccuracy(emb: DataFrame, queryPred: Column, k: Int = 10,
      quant0: Option[DataFrame] = None): DataFrame = {
    val q = corpusOf(emb, quant0)
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("q").as("q_q"), col("n2").as("q_n2"))
    val scored = q
      .select(col("vec_id").as("neighbor_id"), col("label"), col("q"),
        col("n2"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    val votes = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("q_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .withColumn("correct", (col("label") === col("q_label")).cast("long"))
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_probes"), sum(col("correct")).as("n_correct"))
      .withColumn("acc_bp",
        floor(lit(10000.0) * col("n_correct") / col("n_probes")).cast("long"))
      .orderBy(col("label").asc)
  }

  /** Embedding separability AUC — the threshold-free twin of
    * [[knnLabelAccuracy]]: over a deterministic vector sample, score
    * every pair's cosine and compute the exact midrank ROC-AUC of
    * "cosine predicts same-label" (the q269 Mann–Whitney/AUC
    * arithmetic at cos-VALUE grain). kNN accuracy says whether a
    * vote wins at one k; this says how separable same- vs
    * cross-label geometry is at EVERY threshold — the number that
    * moves when an embedding collapses, long before top-k accuracy
    * notices. Mean same/cross cosines and their margin ride along.
    *
    * Sample is the house capped-probe rule (vec_id % mod = 0 — the
    * q229/q308 convention): the pair space is C(sample, 2), never
    * corpus². Scale shape: sample² pairs via a broadcast self-cross,
    * collapsed to cos-VALUE grain before any window; the AUC walk
    * and the 1-row report are value-grain metadata.
    *
    * Columns: n_pairs, n_same, n_diff, auc_bp (NULL when one class
    * is empty), mean_same_bp, mean_diff_bp, margin_bp. */
  def separabilityAuc(emb: DataFrame, sampleMod: Long = 5L,
      quant0: Option[DataFrame] = None): DataFrame = {
    require(sampleMod >= 1L, "sampleMod must be >= 1")
    val s = corpusOf(emb, quant0)
      .filter(col("vec_id") % sampleMod === 0L)
      .select(col("vec_id"), col("label"), col("q"), col("n2"))
    val a = s.select(col("vec_id").as("id_a"), col("label").as("la"),
      col("q").as("qa"), col("n2").as("na"))
    val b = s.select(col("vec_id").as("id_b"), col("label").as("lb"),
      col("q").as("qb"), col("n2").as("nb"))
    val vals = a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_bp", cosBp(dotExpr("qa", "qb"), col("na"), col("nb")))
      .withColumn("pos", (col("la") === col("lb")).cast("long"))
      .groupBy(col("cos_bp"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("cnt_pos"))
    val wv = Window.orderBy(col("cos_bp"))
    vals
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("rank2",
        lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
      .agg(sum(col("cnt")).as("n_pairs"), sum(col("cnt_pos")).as("n_same"),
        sum(col("cnt_pos") * col("rank2")).as("r_pos2"),
        sum(col("cos_bp") * col("cnt_pos")).as("__sum_same"),
        sum(col("cos_bp") * (col("cnt") - col("cnt_pos")))
          .as("__sum_diff"))
      .select(col("n_pairs"), col("n_same"),
        (col("n_pairs") - col("n_same")).as("n_diff"),
        when(col("n_same") === 0L || col("n_same") === col("n_pairs"),
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("r_pos2") - col("n_same") * (col("n_same") + 1L)) /
            (lit(2.0) * col("n_same") * (col("n_pairs") - col("n_same"))))
            .cast("long")).as("auc_bp"),
        when(col("n_same") > 0L,
          floor(col("__sum_same").cast("double") / col("n_same"))
            .cast("long")).as("mean_same_bp"),
        when(col("n_pairs") - col("n_same") > 0L,
          floor(col("__sum_diff").cast("double") /
            (col("n_pairs") - col("n_same"))).cast("long"))
          .as("mean_diff_bp"))
      .withColumn("margin_bp", col("mean_same_bp") - col("mean_diff_bp"))
  }

  /** Sign-pattern LSH bucket over the leading `SignBits` dimensions. */
  def withSignBucket(emb: DataFrame): DataFrame =
    emb.withColumn("bucket", expr(
      s"""aggregate(sequence(1, $SignBits),
         |  0L, (acc, i) -> acc + IF(element_at(embedding, i) >= 0,
         |                           CAST(pow(2, i - 1) AS BIGINT), 0L))""".stripMargin))

  /** Bucketed ANN: top-k among co-bucketed candidates only — the scale
    * path (shuffle on bucket key; pair space bounded by bucket size). */
  def annLsh(emb: DataFrame, queryPred: Column, k: Int = 3,
      quant0: Option[DataFrame] = None): DataFrame = {
    val q = bucketedCorpusOf(emb, quant0)
      .select(col("vec_id"), col("bucket"), col("q"), col("n2"))
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("q").as("q_q"), col("n2").as("q_n2"))
    // queries are small by contract (a predicate-selected probe set):
    // broadcast them so the corpus never shuffles on the bucket key
    val scored = q.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_bp"),
        col("rank").cast("int").as("rank"))
  }

  /** Recall@k of the LSH-bucketed ANN against brute-force ground
    * truth, per query: the evaluation gate every approximate index
    * needs before it replaces the exact path (recall is THE quality
    * axis of ANN — Jégou et al. 2011 report it per index config).
    * Output: (query_id, n_truth, n_ann, n_hits, recall_bp) where
    * recall_bp = ⌊10000·hits/n_truth⌋ and n_ann ≤ k (a sparse bucket
    * returns fewer — exactly the failure recall exposes).
    *
    * Scale shape: both sides are query-set-grain (probe set × k rows
    * — broadcast-class by the same contract as [[knnBruteForce]]'s
    * query side), so the full-outer pair merge and the per-query
    * aggregate are metadata-sized no matter the corpus; the corpus
    * cost is the two underlying scans, which this report shares with
    * the indexes it grades. Both rankings break cosine ties by
    * neighbor id, so the hit set is deterministic cross-engine. */
  def annRecall(emb: DataFrame, queryPred: Column, k: Int = 3,
      quant0: Option[DataFrame] = None): DataFrame = {
    val truth = knnBruteForce(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_truth"))
    val approx = annLsh(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_ann"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "full_outer")
      .groupBy(col("query_id"))
      .agg(
        sum(coalesce(col("in_truth"), lit(0L))).as("n_truth"),
        sum(coalesce(col("in_ann"), lit(0L))).as("n_ann"),
        sum(when(col("in_truth").isNotNull && col("in_ann").isNotNull, 1L)
          .otherwise(0L)).as("n_hits"))
      .withColumn("recall_bp",
        when(col("n_truth") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("n_hits") / col("n_truth"))
            .cast("long")))
  }

  /** MRR@k of the LSH ANN against the exact nearest neighbor — the
    * rank-position twin of [[annRecall]]: recall says WHETHER the
    * true neighbor surfaced in the top-k; reciprocal rank says WHERE
    * (a list that always buries the true hit at rank k ships a much
    * worse product than one that leads with it, at identical recall).
    * Per query: the exact top-1 neighbor, its cosine, the rank the
    * ANN list gives it (0 = missed), and `rr_ppm` = ⌊10⁶/rank⌋ in
    * parts-per-million (integer floor div — exact cross-engine; the
    * corpus mean is Σ rr_ppm / queries, left to the reader at report
    * grain).
    *
    * Scale shape: identical to [[annRecall]] — two probe-set-grain
    * frames (|queries| and |queries|·k rows) left-joined at query
    * grain; the corpus cost is the underlying scans. */
  def annMrr(emb: DataFrame, queryPred: Column, k: Int = 3,
      quant0: Option[DataFrame] = None): DataFrame = {
    val truth1 = knnBruteForce(emb, queryPred, 1, quant0)
      .select(col("query_id"), col("neighbor_id").as("truth_id"),
        col("cos_bp").as("truth_cos_bp"))
    val ann = annLsh(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id").as("truth_id"),
        col("rank").cast("long").as("__r"))
    truth1.join(ann, Seq("query_id", "truth_id"), "left")
      .select(col("query_id"), col("truth_id"), col("truth_cos_bp"),
        coalesce(col("__r"), lit(0L)).as("ann_rank"),
        when(col("__r").isNull, 0L)
          .otherwise(expr("1000000L div __r")).as("rr_ppm"))
  }

  /** RRF smoothing constant (Cormack, Clarke & Buettcher, SIGIR 2009
    * use k=60 and report it robust across collections). */
  val RrfK = 60L

  /** Reciprocal-rank-fusion ensemble of the two approximate indexes —
    * the hybrid-retrieval move applied to ANN serving: the LSH and
    * IVF rankings fail on DIFFERENT queries (a sparse sign-bucket vs
    * a mis-assigned coarse list), so fusing them recovers recall
    * neither has alone, for two cheap index probes instead of one
    * exact scan. Per candidate: rrf = Σ ⌊10⁶/(K+rank)⌋ over the
    * indexes that returned it (integer floor-div — exact cross-engine
    * where the usual float 1/(k+r) sum is not); fused top-k re-ranks
    * by (rrf desc, id). The report grades all three lists against the
    * exact top-k at (query, method) grain — the two baseline rows ARE
    * the ablation, so "did fusion help" is read per query.
    *
    * Scale shape: every frame here is probe-set-grain (|queries|·k
    * rows, broadcast-class by the knnBruteForce query contract); the
    * corpus cost is the underlying index scans, shared with q26/q32
    * via the memoized ANN artifact. The fusion join, re-rank window,
    * and recall merge never touch corpus rows. */
  def rrfFusion(emb: DataFrame, queryPred: Column, k: Int = 3,
      quant0: Option[DataFrame] = None,
      cents0: Option[DataFrame] = None): DataFrame = {
    val lsh = annLsh(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("lsh_rank"))
    val ivf = ivfAnn(emb, queryPred, k, 1, quant0, cents0)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("ivf_rank"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("neighbor_id").asc)
    val fused = lsh.join(ivf, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000L div ($RrfK + lsh_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($RrfK + ivf_rank)"), lit(0L)))
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= k)
    val entries =
      lsh.select(col("query_id"), col("neighbor_id"), lit("lsh").as("method"))
        .union(ivf.select(col("query_id"), col("neighbor_id"),
          lit("ivf").as("method")))
        .union(fused.select(col("query_id"), col("neighbor_id"),
          lit("rrf").as("method")))
    val truth = knnBruteForce(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_truth"))
    val nTruth = truth.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"))
    entries
      .join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"), col("method"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("in_truth"), lit(0L))).as("n_hits"))
      .join(nTruth, Seq("query_id"))
      .select(col("query_id"), col("method"), col("n_returned"),
        col("n_hits"), col("n_truth"),
        when(col("n_truth") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("n_hits") / col("n_truth"))
            .cast("long")).as("recall_bp"))
      .orderBy(col("query_id").asc, col("method").asc)
  }

  /** IVF coarse quantizer: one integer centroid per label (the
    * inverted-list key). Deterministic & oracle-exact: per-dimension
    * `floor(sum / count)` over the quantized vectors. The posexplode +
    * (label, pos) aggregate shuffles only (key, partial-sum) pairs —
    * centroid building is a metadata-sized job even on a huge corpus. */
  def ivfCentroids(emb: DataFrame): DataFrame =
    ivfCentroidsFromQuantized(quantized(emb))

  /** Centroids from an already-quantized frame (needs label + q) —
    * the cents0 seam's build: Shared.memo callers feed it the
    * [[quantizedCorpus]] artifact so the two index pieces share one
    * corpus pass. */
  private[graft] def ivfCentroidsFromQuantized(q: DataFrame): DataFrame =
    q
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
      .withColumn("c_n2", expr("aggregate(centroid, 0L, (acc, v) -> acc + v * v)"))

  /** IVF-style ANN: probe the `nProbe` nearest inverted lists
    * (centroids by cosine, label-asc tie-break), then exact top-k
    * within the probed lists. The scale path when buckets are learned
    * rather than hashed: the corpus shuffles once on the list key;
    * queries and centroids are broadcast. nProbe is THE recall/cost
    * knob of IVF — candidates scored grow linearly with it, and
    * probing every list degenerates (by construction) to exact brute
    * force, which TrainingOpsSpec pins. nProbe=1 keeps the q32 oracle
    * exact; list count tunes the other axis at corpus scale. */
  def ivfAnn(emb: DataFrame, queryPred: Column, k: Int = 3,
      nProbe: Int = 1, quant0: Option[DataFrame] = None,
      cents0: Option[DataFrame] = None): DataFrame = {
    val q = corpusOf(emb, quant0)
      .select(col("vec_id"), col("label"), col("q"), col("n2"))
    val cents = cents0.getOrElse(ivfCentroidsFromQuantized(q)) // one quantization subtree, not two
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"), col("n2").as("q_n2"))
    val probe = queries
      .crossJoin(broadcast(cents))
      .withColumn("c_cos", cosBp(
        graft.expressions.DotProductLong.dot(col("q_q"), col("centroid")),
        col("q_n2"), col("c_n2")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label").asc)
    val assigned = probe
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("q_q"), col("q_n2"), col("label"))
    // nProbe rows per query after the probe rank: broadcast, so the
    // corpus is joined in place (shuffling 100 TB on the list key to
    // meet a handful of probes would be the wrong side moving)
    val scored = q.join(broadcast(assigned), "label")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("cos_bp"), col("rank").cast("int").as("rank"))
  }

  /** IVF index-health report: per inverted list (label key), its
    * vector count, corpus share, and mean cosine-to-centroid — the
    * two numbers that size an IVF deployment before it ships. Share
    * imbalance is the latency tail (every probe of a hot list scans
    * its whole list: a 10× over-full list is a 10× slower probe);
    * low centroid coherence on a list says the coarse quantizer
    * under-fits there (split the list / raise nlist). Jégou et al.
    * 2011 tune exactly these two axes.
    *
    * Scale shape: centroids are metadata-sized and broadcast; the
    * corpus is scanned once with the cosine-to-own-centroid as a map
    * stage and collapses straight to list grain; the share window
    * runs over |lists| rows. mean_cos_bp = ⌊Σcos/n⌋ on the already-
    * floored per-vector bp values — exact BIGINT sum, one final
    * divide. */
  /** IVF recall-vs-cost CURVE — nProbe is THE serving knob
    * ([[ivfAnn]]); this table measures it instead of guessing: per
    * probe depth, micro-averaged recall@k against the exact top-k
    * (one brute-force truth pass) and the candidate count actually
    * scored (the cost axis). The production question "how many lists
    * must I probe for 95% recall, and what does each step cost" is
    * answered by two adjacent rows.
    *
    * Scale shape: the probe ranking and the candidate scoring run
    * ONCE at the deepest depth (probe_rank carried); each candidate
    * row is then exploded to the depths whose probe budget includes
    * it (≤|depths| copies of a probe-set-grain frame — queries are a
    * sampled probe set by contract, so this never scales with the
    * corpus), and ONE (query, depth) window + ONE depth rollup close
    * the curve — a single plan, not a per-depth job loop, and depths
    * never re-touch the corpus. Truth is the q25 brute-force pass
    * (|queries|×|corpus| map work, no shuffle of the corpus). */
  def ivfProbeCurve(emb: DataFrame, queryPred: Column, k: Int = 3,
      probes: Seq[Int] = Seq(1, 2, 4, 8), quant0: Option[DataFrame] = None,
      cents0: Option[DataFrame] = None): DataFrame = {
    require(probes.nonEmpty && probes.forall(_ >= 1), "probe depths >= 1")
    val maxP = probes.max
    val q = corpusOf(emb, quant0)
      .select(col("vec_id"), col("label"), col("q"), col("n2"))
    val cents = cents0.getOrElse(ivfCentroidsFromQuantized(q))
    val queries = q.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"),
        col("n2").as("q_n2"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label").asc)
    val assigned = queries
      .crossJoin(broadcast(cents))
      .withColumn("c_cos", cosBp(
        graft.expressions.DotProductLong.dot(col("q_q"), col("centroid")),
        col("q_n2"), col("c_n2")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= maxP)
      .select(col("query_id"), col("q_q"), col("q_n2"), col("label"),
        col("pr"))
    val depthArr = s"array(${probes.map(p => s"${p}L").mkString(", ")})"
    // a candidate found at probe rank pr participates in every depth
    // d ≥ pr: explode to those depths once, then ONE (query, depth)
    // rank window and ONE depth-grain rollup replace the per-depth
    // job loop (same rows per depth by construction)
    val exploded = q.join(broadcast(assigned), "label")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_bp", cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_bp"),
        explode(expr(s"filter($depthArr, d -> d >= pr)")).as("n_probe"))
      .persist()
    val truth = knnBruteForce(emb, queryPred, k, quant0)
      .select(col("query_id"), col("neighbor_id")).persist()
    val tot = truth.agg(count(lit(1)).as("n_truth"),
      countDistinct(col("query_id")).as("n_queries"))
    val w = Window.partitionBy(col("query_id"), col("n_probe"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    val hits = exploded
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(truth, Seq("query_id", "neighbor_id"))
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_hits"))
    val cost = exploded.groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_candidates"))
    // depth spine from the declared list so an empty depth still rows
    tot.select(explode(expr(depthArr)).as("n_probe"),
        col("n_queries"), col("n_truth"))
      .join(hits, Seq("n_probe"), "left")
      .join(cost, Seq("n_probe"), "left")
      .select(col("n_probe"), col("n_queries"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        when(col("n_truth") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * coalesce(col("n_hits"), lit(0L)) /
            col("n_truth")).cast("long")).as("recall_bp"))
      .orderBy(col("n_probe").asc)
  }

  def ivfBalance(emb: DataFrame, quant0: Option[DataFrame] = None,
      cents0: Option[DataFrame] = None): DataFrame = {
    val quant = corpusOf(emb, quant0)
    val cents = cents0.getOrElse(ivfCentroidsFromQuantized(quant))
    val scored = quant
      .join(broadcast(cents), "label")
      .withColumn("cos_bp", cosBp(dotExpr("q", "centroid"), col("n2"), col("c_n2")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("cos_bp")).as("sum_cos"))
    val wAll = Window.partitionBy()
    scored
      .withColumn("share_bp",
        floor(lit(10000.0) * col("n_vecs") / sum(col("n_vecs")).over(wAll))
          .cast("long"))
      .withColumn("mean_cos_bp",
        floor(col("sum_cos").cast("double") / col("n_vecs")).cast("long"))
      .select(col("label"), col("n_vecs"), col("share_bp"), col("mean_cos_bp"))
  }

  /** Embedding-health audit — the data-quality gate run before any
    * index build: per label, the vectors that would corrupt one
    * (null / empty / all-zero / non-finite components) plus the
    * dimension range (ragged arrays are the classic silent killer —
    * a dot product against a short vector either crashes the job or,
    * worse, zero-pads). Non-finite = NaN or |x| > 1e39 (no finite
    * float32 exceeds 3.4e38, so the bound is exact and engine-
    * portable where an isinf builtin is not).
    *
    * Scale shape: one pure map over the scan into the bounded label
    * grain. */
  def embeddingHealth(emb: DataFrame): DataFrame =
    emb.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("embedding").isNotNull && size(col("embedding")) === 0,
          1L).otherwise(0L)).as("n_empty"),
        sum(when(col("embedding").isNotNull && size(col("embedding")) > 0 &&
          expr("size(filter(embedding, x -> x <> CAST(0.0 AS FLOAT))) = 0"),
          1L).otherwise(0L)).as("n_zero"),
        sum(when(col("embedding").isNotNull && expr(
          """size(filter(embedding, x ->
            |  isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) > 1e39)) > 0"""
            .stripMargin), 1L).otherwise(0L)).as("n_nonfinite"),
        min(when(col("embedding").isNotNull, size(col("embedding"))))
          .cast("long").as("dims_min"),
        max(when(col("embedding").isNotNull, size(col("embedding"))))
          .cast("long").as("dims_max"))

  /** Index-staleness report: how far each IVF list's centroid has
    * DRIFTED since the index was built — cosine between the centroid
    * over the index-time rows (`builtPred`) and over the full current
    * corpus, per label, with both row counts. The rebuild trigger of
    * index maintenance: a list at 9900 bp is fine, one at 7000 bp is
    * routing queries with a stale map (recall decays silently — this
    * report is how you notice BEFORE q100 recall does).
    *
    * Scale shape: two metadata-sized centroid builds (each one
    * (label, pos) partial-sum shuffle, q32's shape) joined at label
    * grain; the report is |lists| rows. */
  def centroidDrift(emb: DataFrame, builtPred: Column,
      quant0: Option[DataFrame] = None,
      cents0: Option[DataFrame] = None): DataFrame = {
    val corpus = corpusOf(emb, quant0)
    val old = ivfCentroidsFromQuantized(corpus.filter(builtPred))
      .select(col("label"), col("centroid").as("c_old"),
        col("c_n2").as("n2_old"))
    val now = cents0.getOrElse(ivfCentroidsFromQuantized(corpus))
      .select(col("label"), col("centroid").as("c_now"),
        col("c_n2").as("n2_now"))
    val counts = corpus.groupBy(col("label"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(builtPred, 1L).otherwise(0L)).as("n_built"))
    now.join(old, Seq("label"), "left")
      .join(broadcast(counts), Seq("label"))
      .withColumn("drift_cos_bp",
        when(col("c_old").isNull, lit(null).cast("long")) // list born after build
          .otherwise(cosBp(
            graft.expressions.DotProductLong.dot(col("c_old"), col("c_now")),
            col("n2_old"), col("n2_now"))))
      .select(col("label"), col("n_built"), col("n_total"),
        col("drift_cos_bp"))
  }

  /** Embedding near-duplicate pairs: co-bucketed, cosine ≥ threshold. */
  def nearDupPairs(emb: DataFrame, thresholdBp: Long = 2000L,
      quant0: Option[DataFrame] = None): DataFrame = {
    val q = bucketedCorpusOf(emb, quant0)
      .select(col("vec_id"), col("bucket"), col("q"), col("n2"))
    q.as("a")
      .join(q.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_bp",
        cosBp(dotExpr("a.q", "b.q"), col("a.n2"), col("b.n2")))
      .filter(col("cos_bp") >= thresholdBp)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cos_bp"))
  }

  /** Int8 (max-abs) embedding quantization — the storage/shuffle
    * compression pass of an ANN index build: each vector carries one
    * scale and 1-byte codes, 4× smaller on the wire than float32, so
    * every downstream bucket-join shuffles a quarter of the bytes.
    *
    * `code_i = floor(x_i * 127 / scale)`, `scale = max_i |x_i|` — all
    * doubles promoted EXACTLY from float32, one multiply + one divide
    * + floor per element in a fixed order, so codes are bit-identical
    * in any engine (same reasoning as the money convention). Zero
    * vectors (scale = 0) code to all-zeros instead of dividing by
    * zero. Emitted exploded to (vec_id, dim_idx, code) so the oracle
    * pins every element; the packed form is `transform` minus the
    * explode. Pure map stage, zero shuffle. */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb
      .filter(col("embedding").isNotNull)
      .withColumn("__scale",
        expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)"))
      .select(col("vec_id"),
        floor(col("__scale") * lit(1000000.0)).cast("long").as("scale_ppm"),
        posexplode(expr(
          "transform(embedding, x -> IF(__scale = 0D, 0L, " +
            "CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / __scale) AS BIGINT)))")))
      .select(col("vec_id"), col("scale_ppm"),
        col("pos").cast("long").as("dim_idx"), col("col").as("code"))

  /** Per-label embedding outliers: the k vectors farthest (exact
    * integer squared distance) from their label's floor-mean centroid
    * — the "what in this class doesn't belong" curation report
    * (mislabeled rows, modality drift, junk). Fixed-point quantize
    * ([[quantized]]'s global scale — NOT the per-vector int8 scale,
    * which isn't comparable across vectors), centroid components
    * floor(sum/count) like KMeans, distances exact BIGINTs, ties
    * break vec_id-asc. Null embeddings/labels are excluded.
    *
    * 100 TB shape: the centroid aggregate shuffles only (label, pos)
    * partial sums — labels × dim rows of state, map-side combined.
    * Centroids are metadata-sized and BROADCAST back; the distance is
    * one codegen'd map over the corpus; the per-label top-k plans as
    * WindowGroupLimit (rank pushed before the final sort), never a
    * global sort. Magnitude bound: |q_i| ≤ 1e6·max|x|, so a
    * component diff squared is ≤ ~4e14·max|x|² and the dim-sum stays
    * far from BIGINT overflow for any realistic embedding.
    *
    * Null-ELEMENT vectors are excluded along with whole-null ones:
    * Spark's `aggregate` would propagate a null dim to a NULL dist
    * while the oracle's SUM would skip it — the same row, two
    * engines, two answers. The forall gate (mirrored oracle-side)
    * pins one behavior. */
  def labelOutliers(emb: DataFrame, k: Int,
      quant0: Option[DataFrame] = None): DataFrame = {
    // the null gates translate exactly onto the quantized artifact:
    // a null embedding transforms to a null q, a null ELEMENT to a
    // null q element (NaN elements cast to a value, matching the
    // float-side IS NOT NULL check), so filtering q is the same set
    val e = corpusOf(emb, quant0).filter(
      col("q").isNotNull && col("label").isNotNull &&
        expr("forall(q, x -> x IS NOT NULL)"))
      .select(col("vec_id"), col("label"), col("q"))
    // the IVF coarse quantizer IS this centroid (same floor(sum/count)
    // convention the q87 oracle mirrors — one copy, not two)
    val cent = ivfCentroidsFromQuantized(e)
      .select(col("label"), col("centroid").as("cent"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist").desc, col("vec_id").asc)
    e.join(broadcast(cent), Seq("label"))
      .withColumn("dist", expr(
        "aggregate(zip_with(q, cent, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("dist"), col("rank"))
  }

  /** Embedding-space anisotropy audit — the share of total variance
    * lying along the MEAN direction, the one-number read on the
    * "narrow cone" pathology (Ethayarajh '19): healthy isotropic
    * spaces sit near the 1/d baseline; collapsed spaces (bad
    * pooling, over-trained encoders) concentrate variance along μ
    * and every cosine saturates — ANN recall and near-dup thresholds
    * silently degrade. The mean direction is the closed-form probe
    * (no iterative eigensolver, no libm): var_explained =
    * Var(x·S) / (|S|²·ΣᵢVar(xᵢ)) with S the per-dim sum vector, all
    * in exact integer arithmetic on ×`quant` fixed-point components —
    * a LOWER bound on the top eigenvalue share, which is exactly the
    * alarm direction (high = definitely collapsed).
    *
    * Scale shape: one posexplode pass to dim grain (d-bounded rows),
    * the d-row S vector re-enters as a broadcast ARRAY scalar, and
    * the projection pass is one zip_with map + 1-row aggregate —
    * two corpus scans, zero joins at fact grain. decimal(38,0)
    * cross-products bound n: at quant 10³ the Σp² term stays inside
    * 38 digits to n ≈ 7×10⁵ vectors — run the audit on a sample at
    * corpus scale (it estimates a RATIO; a fixed 10⁵-row hash sample
    * is the production shape) or drop quant a decade per 100× rows. */
  /** Dominant-eigendirection variance share by power iteration — the
    * SPECTRAL upgrade of [[anisotropy]]: that op measures variance
    * along the MEAN direction (the common-bias read); this one finds
    * the actual top principal direction of the centered second-moment
    * matrix and reports its variance share, the "is the embedding
    * space collapsing onto one axis" number (rogue-dimension audits,
    * Timkey & van Schijndel 2021). top_share_bp ≥ q286's
    * var_explained_bp by construction; a large gap means the dominant
    * axis is NOT the mean direction — whitening would help where
    * mean-centering alone wouldn't.
    *
    * The d×d covariance is NEVER materialized: each power step
    * computes B'v = n·Σ q(q·v) − s(s·v) with one corpus map pass
    * (p = q·v per vector via zip_with, then a posexplode to dim
    * grain), where s is the dim-sum vector — the matrix-free
    * iteration that scales to any corpus. Everything integer: vectors
    * quantized at `quant` (q286 convention), v renormalized each
    * round to max|v| = 1000 by DECIMAL DIV (truncation toward zero —
    * identical in both engines, pinned by the spec), ties and signs
    * deterministic. Fixed `iters` budget (the pageRank convention):
    * the report is "the share after K sweeps" — convergence is fast
    * (gap ratio per sweep) and K is part of the contract.
    *
    * Columns: n_vecs, n_dims, iters, top_share_bp (vᵀB'v/(vᵀv·trB')),
    * isotropy_bp (10⁴/d), excess_milli.
    *
    * Scale shape: K+2 corpus passes over the persisted quantized
    * frame (caller-owns-cache); every other frame is d-row or 1-row
    * metadata, broadcast into the next pass. The decimal bounds are
    * anisotropy's: past ~7×10⁵ vectors run on a hash sample or drop
    * `quant` a decade. */
  def powerIteration(emb: DataFrame, dim: Int = 64, iters: Int = 3,
      quant: Long = 1000L): DataFrame = {
    require(iters >= 1 && iters <= 6, "iters in [1,6]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val e = emb
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(expr(s"transform(embedding, x -> " +
        s"CAST(FLOOR(CAST(x AS DOUBLE) * $quant.0) AS BIGINT))").as("q"))
      .persist()
    val dims = e
      .select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(sum(col("qi")).as("s"), sum(col("qi") * col("qi")).as("ss"))
      .persist()
    val nRow = e.agg(count(lit(1)).as("n"))
    // p = q·v per vector, for a given broadcast v array frame
    def projected(vFrame: DataFrame): DataFrame =
      e.crossJoin(broadcast(vFrame))
        .select(col("q"), expr(
          "aggregate(zip_with(q, vv, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("p"))
    def svDotOf(vFrame: DataFrame): DataFrame =
      dims.agg(sort_array(collect_list(struct(col("i"), col("s")))).as("a"))
        .select(expr("transform(a, x -> x.s)").as("sv"))
        .crossJoin(vFrame)
        .select(expr(
          "aggregate(zip_with(sv, vv, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("svdot"))
    val v0 = nRow.select(
      array((0 until dim).map(_ => lit(1000L)): _*).as("vv"))
    val wAll = Window.partitionBy()
    val vFinal = (1 to iters).foldLeft(v0) { (vF, _) =>
      val qp = projected(vF)
        .select(posexplode(col("q")).as(Seq("i", "qi")), col("p"))
        .groupBy(col("i")).agg(sum(col("qi") * col("p")).as("qp"))
      val next = qp
        .join(dims.select(col("i"), col("s")), Seq("i"))
        .crossJoin(broadcast(nRow))
        .crossJoin(broadcast(svDotOf(vF)))
        .select(col("i"),
          (dec(col("n")) * dec(col("qp")) -
            dec(col("s")) * dec(col("svdot"))).as("w"))
        .withColumn("m", max(abs(col("w"))).over(wAll))
        .select(col("i"),
          when(col("m") === dec(lit(0L)), lit(1000L))
            .otherwise(expr("(CAST(1000 AS DECIMAL(38,0)) * w) DIV m"))
            .as("v"))
        .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("a"))
        .select(expr("transform(a, x -> x.v)").as("vv"))
      next.localCheckpoint(false)
    }
    val stats = dims.crossJoin(broadcast(nRow)).agg(
      sum(dec(col("n")) * dec(col("ss")) - dec(col("s")) * dec(col("s")))
        .as("bprime"))
    val vtv = vFinal.select(expr(
      "aggregate(transform(vv, x -> x * x), CAST(0 AS BIGINT), " +
        "(acc, x) -> acc + x)").as("vtv"))
    projected(vFinal)
      .agg(count(lit(1)).as("n"), sum(dec(col("p")) * dec(col("p"))).as("spp"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(svDotOf(vFinal)))
      .crossJoin(broadcast(vtv))
      .withColumn("__num",
        dec(col("n")) * col("spp") - dec(col("svdot")) * dec(col("svdot")))
      .select(col("n").as("n_vecs"), lit(dim).as("n_dims"),
        lit(iters).as("iters"),
        when(col("vtv") === 0L || col("bprime") === dec(lit(0L)),
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * __num)" +
              " DIV (CAST(vtv AS DECIMAL(38,0)) * bprime) AS BIGINT)"))
          .as("top_share_bp"),
        lit(10000L / dim).as("isotropy_bp"))
      .withColumn("excess_milli",
        when(col("top_share_bp").isNull, lit(null).cast("long"))
          .otherwise(expr("(1000 * top_share_bp) DIV isotropy_bp")))
  }

  def anisotropy(emb: DataFrame, dim: Int = 64, quant: Long = 1000L): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val e = emb
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(expr(s"transform(embedding, x -> " +
        s"CAST(FLOOR(CAST(x AS DOUBLE) * $quant.0) AS BIGINT))").as("q"))
    // d rows; read by both the moment stats and the S-vector collect
    // (caller-owns-cache convention)
    val dims = e
      .select(posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"))
      .persist()
    val nRow = e.agg(count(lit(1)).as("n"))
    val stats = dims.crossJoin(broadcast(nRow)).agg(
      sum(dec(col("n")) * dec(col("ss")) - dec(col("s")) * dec(col("s")))
        .as("bprime"),
      sum(dec(col("s")) * dec(col("s"))).as("s2"))
    val sArr = dims
      .agg(sort_array(collect_list(struct(col("i"), col("s")))).as("a"))
      .select(expr("transform(a, x -> x.s)").as("sv"))
    // the projection pass re-counts rows (__n2 == n), so nRow feeds
    // ONLY the moment stats — the corpus is scanned twice total
    // (count + projection), never a third time for the report row
    val proj = e.crossJoin(broadcast(sArr))
      .select(expr("aggregate(zip_with(q, sv, (a, b) -> a * b), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("p"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("p"))).as("sp"),
        sum(dec(col("p")) * dec(col("p"))).as("spp"))
    proj.crossJoin(broadcast(stats))
      .withColumn("__a",
        dec(col("n")) * col("spp") - col("sp") * col("sp"))
      .select(col("n").as("n_vecs"), lit(dim).as("n_dims"),
        when(col("s2") === dec(lit(0L)) || col("bprime") === dec(lit(0L)),
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * __a)" +
              " DIV (s2 * bprime) AS BIGINT)")).as("var_explained_bp"),
        lit(10000L / dim).as("isotropy_bp"))
      .withColumn("excess_milli",
        when(col("var_explained_bp").isNull, lit(null).cast("long"))
          .otherwise(expr("(1000 * var_explained_bp) DIV isotropy_bp")))
  }

  /** k-occurrence hubness census — the high-dimensional ANN
    * pathology meter (Radovanović, Nanopoulos & Ivanović 2010): in
    * high dimensions a few "hub" points appear in EVERYONE's k-NN
    * list while antihubs appear in nobody's, silently skewing kNN
    * votes, retrieval diversity, and graph-based ANN indexes. Over
    * the deterministic vector sample (the q326 `% sampleMod` rule),
    * count N_k(v) = how many sample points list v in their top-k,
    * then report the distribution's shape: max occurrence, antihub
    * count (N_k = 0), hub count (N_k > 2k — the published rule of
    * thumb), and the exact-ladder skewness
    *   skew = Σd³·√n / (Σd²)^{3/2},  d_i = n·N_k(i) − Σ N_k
    * (the n-scaled deviations keep every moment integral; both
    * engines evaluate the same ⌊√⌋-composed ladder, so the milli
    * verdict is deterministic). Healthy data skews mildly positive;
    * skew >> 1 says the metric space is collapsing.
    *
    * Scale shape: the pair space is sample², never corpus² (the
    * separabilityAuc precedent); counts, moments, and the 1-row
    * report are sample-grain metadata. Moment ladder stays in
    * decimal(38,0) while sample ≲ 2×10⁵ (Σd³ ≤ n⁷).
    *
    * Columns: n_sample, k, max_occ, n_antihubs, n_hubs,
    * skew_milli. */
  def hubness(emb: DataFrame, k: Int = 10, sampleMod: Long = 5L,
      quant0: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    require(sampleMod >= 1L, "sampleMod >= 1")
    val dec = "decimal(38,0)"
    // localCheckpoint, not persist: a cached copy of this sample
    // frame is structurally q326's subtree at the default mod, and
    // CacheManager would substitute it into that plan (the q299
    // cross-query cache-substitution rule)
    val s = corpusOf(emb, quant0)
      .filter(col("vec_id") % sampleMod === 0L)
      .select(col("vec_id"), col("q"), col("n2"))
      .localCheckpoint(false)
    val queries = s.select(col("vec_id").as("query_id"),
      col("q").as("q_q"), col("n2").as("q_n2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    val occ = s
      .select(col("vec_id").as("neighbor_id"), col("q"), col("n2"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_bp",
        cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("c"))
    val counts = s.select(col("vec_id").as("neighbor_id"))
      .join(occ, Seq("neighbor_id"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
    counts
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        max(col("c")).as("max_occ"),
        sum((col("c") === 0L).cast("long")).as("n_antihubs"),
        sum((col("c") > 2L * k).cast("long")).as("n_hubs"),
        sum(expr(s"CAST(c AS $dec) * c")).as("__s2"),
        sum(expr(s"CAST(c AS $dec) * c * c")).as("__s3"))
      // central moments of d = n·c − Σc from raw power sums:
      // Σd² = n²Σc² − n(Σc)²; Σd³ = n³Σc³ − 3n²Σc²·Σc + 2n(Σc)³
      .withColumn("__d2", expr(s"""CAST(n AS $dec) * n * __s2
        | - CAST(n AS $dec) * sc * sc""".stripMargin))
      .withColumn("__d3", expr(s"""CAST(n AS $dec) * n * n * __s3
        | - 3 * CAST(n AS $dec) * n * __s2 * sc
        | + 2 * CAST(n AS $dec) * sc * sc * sc""".stripMargin))
      .withColumn("skew_milli",
        when(col("__d2") > 0, expr(s"""CAST(
          |  (CASE WHEN __d3 < 0 THEN -1 ELSE 1 END) *
          |  ((1000 * abs(__d3) * ${Experiment.isqrtDecSql("CAST(n AS " +
               dec + ")")})
          |   DIV (__d2 * ${Experiment.isqrtDecSql("__d2")}))
          |AS BIGINT)""".stripMargin)))
      .select(col("n").as("n_sample"), lit(k.toLong).as("k"),
        col("max_occ"), col("n_antihubs"), col("n_hubs"),
        col("skew_milli"))
  }

  /** Leave-one-source-out kNN valuation — the data-VALUATION read
    * (the cheap, deterministic cousin of Shapley data values,
    * Ghorbani & Zou 2019): for each corpus source, re-run the q308
    * kNN label vote with that source's vectors REMOVED from the
    * neighbor pool and report the accuracy it costs. A source whose
    * removal leaves accuracy flat contributes volume, not signal; a
    * negative value (accuracy RISES without it) is the label-noise
    * source the curation pipeline should quarantine first.
    *
    * Votes, probes, ties all follow [[knnLabelAccuracy]] exactly
    * (md5-free `% probeMod` probe cap, cos desc / id asc rank,
    * votes desc / label asc). The full-pool accuracy rides along so
    * every row is self-contained.
    *
    * Scale shape: cosines are scored ONCE (capped probes × corpus,
    * probes broadcast); the per-source re-rank never rescores — the
    * top-k of "all but source s" can only draw from the per-source
    * top-k candidate set (≤ sources·k rows per probe, proven by a
    * pigeonhole: dropping one source leaves every other source's
    * per-source rank intact), so the 20 exclusion panels re-rank a
    * candidate frame that is probe×sources×k METADATA, not the
    * score frame (the q243 one-persisted-frame rule).
    *
    * Columns: source, n_vectors, acc_full_bp, acc_without_bp,
    * value_bp (full − without; positive = the source helps). */
  def sourceValueKnn(emb: DataFrame, docs: DataFrame, k: Int = 10,
      probeMod: Long = 5L, quant0: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    require(probeMod >= 1L, "probeMod >= 1")
    val src = docs.filter(col("source").isNotNull)
      .select(col("doc_id").as("vec_id"), col("source"))
    val q = corpusOf(emb, quant0).join(src, Seq("vec_id"))
    val queries = q.filter(col("vec_id") % probeMod === 0L)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("q").as("q_q"), col("n2").as("q_n2"))
    // per-source top-k candidates per probe: the only rows any
    // exclusion panel can surface
    val wSrc = Window.partitionBy(col("query_id"), col("source"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    val cand = q
      .select(col("vec_id").as("neighbor_id"), col("label"),
        col("source"), col("q"), col("n2"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_bp",
        cosBp(dotExpr("q", "q_q"), col("n2"), col("q_n2")))
      .withColumn("srk", row_number().over(wSrc))
      .filter(col("srk") <= k)
      .select(col("query_id"), col("q_label"), col("neighbor_id"),
        col("label"), col("source"), col("cos_bp"))
      .localCheckpoint(false) // probe×sources×k rows; one scoring pass
    def accuracyOf(panel: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("excl"), col("query_id"))
        .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
      val wv = Window.partitionBy(col("excl"), col("query_id"))
        .orderBy(col("votes").desc, col("label").asc)
      panel
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .groupBy(col("excl"), col("query_id"), col("q_label"),
          col("label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wv))
        .filter(col("vr") === 1)
        .withColumn("correct", (col("label") === col("q_label"))
          .cast("long"))
        .groupBy(col("excl"))
        .agg(count(lit(1)).as("n_probes"), sum(col("correct"))
          .as("n_correct"))
        .withColumn("acc_bp", floor(lit(10000.0) * col("n_correct") /
          col("n_probes")).cast("long"))
        .select(col("excl"), col("acc_bp"))
    }
    val sources = q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_vectors"))
      .localCheckpoint(false) // source-domain metadata, read 3×
    val without = accuracyOf(
      cand.join(broadcast(sources.select(col("source").as("excl"))),
        col("source") =!= col("excl")))
    val full = accuracyOf(cand.withColumn("excl", lit("__all__")))
    sources
      .join(without.select(col("excl").as("source"),
        col("acc_bp").as("acc_without_bp")), Seq("source"), "left")
      .crossJoin(broadcast(full.select(col("acc_bp").as("acc_full_bp"))))
      .select(col("source"), col("n_vectors"), col("acc_full_bp"),
        col("acc_without_bp"))
      .withColumn("value_bp", col("acc_full_bp") - col("acc_without_bp"))
      .orderBy(col("source").asc)
  }
}
