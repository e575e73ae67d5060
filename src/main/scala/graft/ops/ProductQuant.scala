package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ, Jégou et al. 2011) — the
  * compressed-domain ANN path: split each vector into `m` subspaces,
  * give every subspace a `k`-entry codebook, store each corpus vector
  * as m small codes, and answer queries with asymmetric distance
  * computation (ADC) — per candidate, m table LOOKUPS instead of a
  * d-element dot product, over codes 32× smaller than the floats.
  *
  * 100 TB shape: the codebook is metadata-sized (m×k subcentroids)
  * and BROADCAST everywhere; encoding is one broadcast join + a
  * per-(vec, sub) argmin aggregate — the corpus never shuffles its
  * floats; the query-side LUT (queries × m × k partial distances) is
  * aggregate-grain and broadcast; the scan side of ADC touches only
  * the code arrays. Compose with IVF (route to lists, ADC within) for
  * the standard IVF-PQ index — both halves are here.
  *
  * Cross-engine determinism (house rules): subvectors come from the
  * integer-quantized embedding (Similarity.quantized), so codebook
  * distances, codes, and ADC totals are EXACT integer algebra with
  * code-asc tie-breaks — the DuckDB oracle reproduces them
  * bit-for-bit. The oracle-able codebook is the SEED variant
  * (subvectors of the first k vec_ids — deterministic sampling);
  * [[trainedCodebook]] upgrades it with the same integer Lloyd step
  * KMeans uses, identical downstream shapes.
  */
object ProductQuant {

  /** Integer subvectors: one row per (vec_id, sub) with the slice and
    * its squared norm. Requires dim % m == 0, ENFORCED per row: a
    * ragged dim would otherwise silently drop the trailing dim % m
    * components from every vector and quietly skew all distances, so
    * the slice width raises instead of truncating. `carry` threads
    * extra per-vector columns (e.g. the IVF list key) through without
    * a corpus-grain re-join later. */
  def subvectors(emb: DataFrame, m: Int, carry: Seq[String] = Nil): DataFrame =
    Similarity.quantized(emb)
      .select(col("vec_id") +: carry.map(col) :+ posexplode(expr(
        s"transform(sequence(0, ${m - 1}), " +
          s"s -> slice(q, s * (size(q) div $m) + 1, " +
          s"CASE WHEN size(q) % $m = 0 THEN size(q) div $m " +
          s"ELSE CAST(raise_error(CONCAT('PQ: vector dim ', size(q), " +
          s"' not divisible by m=$m')) AS INT) END))"))
        .as(Seq("sub", "qs")): _*)
      .withColumn("n2s", expr("aggregate(qs, 0L, (acc, v) -> acc + v * v)"))

  /** Seed codebook: the subvectors of vec_id < k (deterministic
    * sample). (sub, code, centroid, c_n2), k entries per subspace. */
  def seedCodebook(emb: DataFrame, m: Int, k: Int): DataFrame =
    subvectors(emb.filter(col("vec_id") < k), m)
      .select(col("sub"), col("vec_id").as("code"),
        col("qs").as("centroid"), col("n2s").as("c_n2"))

  /** One integer-Lloyd refinement of a codebook (floor-mean of the
    * subvectors each code currently wins) — KMeans' update, per
    * subspace. Iterate for a better codebook; every iteration is one
    * broadcast join + two bounded shuffles ((vec, sub) argmin and the
    * (sub, code, pos) partial sums — m×k×subdim rows of state). */
  def refineCodebook(emb: DataFrame, book: DataFrame, m: Int): DataFrame =
    assignments(subvectors(emb, m), book)
      .select(col("sub"), col("code"), posexplode(col("qs")).as(Seq("pos", "v")))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
      .withColumn("c_n2", expr("aggregate(centroid, 0L, (acc, v) -> acc + v * v)"))

  /** Seed + `iters` Lloyd refinements. Persisted: every refinement is
    * a full-corpus assignment pass, and consumers (encode + query
    * LUT) each re-trigger the lineage otherwise — the book itself is
    * m×k rows, so caching is free. (The seed book is NOT persisted by
    * its consumers: its lineage is a filtered metadata-grain scan
    * that fuses cheaper than a cache round-trip.) Ownership note: the
    * returned frame is lazy, so this op cannot unpersist after its
    * consumers run — the house pattern (StratifiedExtract is the
    * same); entries are m×k rows and long-lived sessions reclaim them
    * with `spark.catalog.clearCache()` (Bench does, per query). */
  def trainedCodebook(emb: DataFrame, m: Int, k: Int, iters: Int = 1): DataFrame =
    (1 to iters).foldLeft(seedCodebook(emb, m, k)) { (b, _) =>
      refineCodebook(emb, b, m)
    }.persist()

  /** Nearest-code assignment per (vec, sub): exact integer distance,
    * code-asc tie-break, argmin packed into one long (KMeans' trick —
    * dist·256 + code keeps min() a hash aggregate; subvector dists at
    * 1e6 quantization are ≪ 2^55). Keeps qs for [[refineCodebook]]. */
  private def assignments(subs: DataFrame, book: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    subs
      .join(broadcast(book), Seq("sub"))
      .withColumn("dist", col("n2s") + col("c_n2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
      .groupBy(col("vec_id") +: col("sub") +: col("qs") +: carry.map(col): _*)
      .agg(min(col("dist") * lit(256L) + col("code")).as("packed"))
      .select(col("vec_id") +: col("sub") +: col("qs") +: carry.map(col) :+
        (col("packed") % 256L).as("code"): _*)

  /** Encode the corpus: (vec_id, [carry...,] codes), codes in
    * subspace order — the m-byte-per-vector compressed index. */
  def encode(emb: DataFrame, book: DataFrame, m: Int,
      carry: Seq[String] = Nil): DataFrame =
    assignments(subvectors(emb, m, carry), book, carry)
      .groupBy(col("vec_id") +: carry.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** ADC top-k: per query, a (m × k) partial-distance LUT from its
    * EXACT subvectors to the codebook; per (query, candidate), the
    * distance is m array lookups summed — never a float op, never the
    * original vectors. Self-matches excluded; (dist asc, id asc)
    * rank. */
  /** Per-query ADC lookup table: (query_id, lut) where lut[sub+1] is
    * a MAP code → exact partial distance from the query's sub-th
    * subvector to that code's centroid. Keyed by code VALUE, not
    * position: a TRAINED book can be sparse (a seed code that wins no
    * vectors is dropped by refineCodebook), and a positional array
    * lookup would then misalign every code above the gap and read
    * past the end for the top one. Subspaces ARE always dense
    * (subvectors emits all m), so the outer stack stays positional.
    * Queries are few by assumption — the result is broadcast-grain. */
  def queryLut(emb: DataFrame, queryPred: Column, book: DataFrame,
      m: Int): DataFrame =
    subvectors(emb.filter(queryPred), m)
      .join(broadcast(book), Seq("sub"))
      .withColumn("pdist", col("n2s") + col("c_n2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
      .groupBy(col("vec_id"), col("sub"))
      // keep (code, pdist) ENTRIES through the sorts (structs holding
      // maps are not orderable) and build the map at the very end
      .agg(array_sort(collect_list(struct(col("code"), col("pdist"))))
        .as("entries"))
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("entries")))),
        x => map_from_entries(x.getField("entries"))).as("lut"))
      .withColumnRenamed("vec_id", "query_id")

  /** ADC distance of a code array against a LUT column (map lookup by
    * code value — see [[queryLut]]). */
  private val AdcDist = expr(
    "aggregate(zip_with(codes, lut, (c, r) -> element_at(r, c)), " +
      "0L, (acc, v) -> acc + v)")

  /** `book0`/`codes0` are the shared-model-artifact seams: a caller
    * serving many query batches builds the codebook and the encoded
    * corpus ONCE (they are the expensive, query-independent 90%) and
    * passes them here, so each batch costs only its LUT + the ADC
    * scan. `codes0` must be `encode(emb, book, m)` for the same book. */
  def adcTopK(emb: DataFrame, queryPred: Column, m: Int = 8, k: Int = 16,
      topK: Int = 10, book0: Option[DataFrame] = None,
      codes0: Option[DataFrame] = None): DataFrame = {
    val book = book0.getOrElse(seedCodebook(emb, m, k))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    codes0.getOrElse(encode(emb, book, m))
      .crossJoin(broadcast(queryLut(emb, queryPred, book, m)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", AdcDist)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("int").as("rank"))
  }

  /** Two-stage retrieval (shortlist-then-rerank — the production ANN
    * serving pattern): stage 1 scores the WHOLE corpus in the
    * compressed domain ([[adcTopK]]) and keeps a `shortlist`-deep
    * candidate set per query; stage 2 fetches ONLY those candidates'
    * quantized vectors and re-ranks them by exact cosine. ADC
    * distances are distorted by quantization; the re-rank buys back
    * the lost precision for shortlist × queries exact dot products
    * instead of corpus × queries.
    *
    * Scale shape: the shortlist is probe-grain (queries × shortlist,
    * metadata-sized) and BROADCAST into the corpus scan, so stage 2's
    * vector fetch is a map-side hash probe — the corpus floats never
    * shuffle at any stage; exact-scoring work is bounded by the
    * shortlist. `adc_rank` is carried through so the output shows
    * what re-ranking moved. */
  def rerankTopK(emb: DataFrame, queryPred: Column, m: Int = 8, k: Int = 16,
      shortlist: Int = 30, topK: Int = 10,
      book0: Option[DataFrame] = None,
      codes0: Option[DataFrame] = None): DataFrame = {
    require(shortlist >= topK, "shortlist must cover the final top-k")
    val sl = adcTopK(emb, queryPred, m, k, shortlist, book0, codes0)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("adc_rank"))
    val quant = Similarity.quantized(emb)
    val queries = quant.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"),
        col("n2").as("q_n2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_bp").desc, col("neighbor_id").asc)
    quant.select(col("vec_id").as("neighbor_id"), col("q"), col("n2"))
      .join(broadcast(sl), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos_bp", Similarity.cosBp(
        graft.expressions.DotProductLong.dot(col("q"), col("q_q")),
        col("n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cos_bp"),
        col("adc_rank"), col("rank").cast("int").as("rank"))
  }

  /** PQ distortion audit — how much signal does the compressed index
    * throw away, per subspace? For every (vector, subspace) the
    * quantization error is the assigned code's distance (= the argmin
    * distance the encoder already minimizes); per subspace this rolls
    * up to mean/max squared error and `noise_bp` = error energy over
    * signal energy (Σ err / Σ ‖subvector‖², floor-bp) — the
    * table that says WHICH subspaces need a bigger codebook before
    * anyone trusts q111's shortlists at 100 TB. A healthy book shows
    * noise_bp ≪ 10000 and no subspace an outlier.
    *
    * All integer algebra on the quantized grid (the distances are the
    * encoder's own); one broadcast codebook join, one (vec, sub)
    * argmin, one m-row aggregate. */
  def distortion(emb: DataFrame, m: Int = 8, k: Int = 16,
      book0: Option[DataFrame] = None): DataFrame = {
    val book = book0.getOrElse(seedCodebook(emb, m, k))
    subvectors(emb, m)
      .join(broadcast(book), Seq("sub"))
      .withColumn("dist", col("n2s") + col("c_n2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
      .groupBy(col("vec_id"), col("sub"), col("n2s"))
      .agg(min(col("dist")).as("err"))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err")).as("__se"), max(col("err")).as("max_err"),
        sum(col("n2s")).as("__sn"))
      .select(col("sub").cast("long").as("sub"), col("n_vecs"),
        expr("__se div n_vecs").as("mean_err"), col("max_err"),
        when(col("__sn") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("__se") / col("__sn"))
            .cast("long")).as("noise_bp"))
      .orderBy(col("sub").asc)
  }

  /** IVF-PQ: the standard billion-scale ANN index — IVF's learned
    * inverted lists bound WHICH candidates are scored (`nProbe`
    * lists per query, cosine-routed exactly like Similarity.ivfAnn),
    * PQ's codes bound WHAT scoring costs (m lookups per candidate).
    * The corpus is touched once: encoded with its list key carried,
    * then joined in place against the broadcast (query, list, LUT)
    * probe set — candidates outside probed lists are never read. */
  def ivfPqTopK(emb: DataFrame, queryPred: Column, m: Int = 8, k: Int = 16,
      topK: Int = 10, nProbe: Int = 1, book0: Option[DataFrame] = None,
      codes0: Option[DataFrame] = None): DataFrame = {
    val book = book0.getOrElse(seedCodebook(emb, m, k))
    val quant = Similarity.quantized(emb)
    val queries = quant.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("q_q"), col("n2").as("q_n2"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label").asc)
    val assignedLists = queries
      .crossJoin(broadcast(Similarity.ivfCentroids(emb)))
      .withColumn("c_cos", Similarity.cosBp(
        graft.expressions.DotProductLong.dot(col("q_q"), col("centroid")),
        col("q_n2"), col("c_n2")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("label"))
    // both sides are query-grain (tiny); broadcast beats the default
    // sort-merge a join of two sub-threshold-unknown frames would plan
    val probes = assignedLists
      .join(broadcast(queryLut(emb, queryPred, book, m)), "query_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    // codes0 contract: encode(emb, book, m, carry = Seq("label"))
    codes0.getOrElse(encode(emb, book, m, carry = Seq("label")))
      .join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", AdcDist)
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("label"), col("neighbor_id"),
        col("adc_dist"), col("rank").cast("int").as("rank"))
  }
}
