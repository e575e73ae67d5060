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
    * its squared norm. Requires dim % m == 0 (checked at runtime by
    * the slice arithmetic producing equal widths). */
  def subvectors(emb: DataFrame, m: Int): DataFrame =
    Similarity.quantized(emb)
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), " +
          s"s -> slice(q, s * (size(q) div $m) + 1, size(q) div $m))"))
        .as(Seq("sub", "qs")))
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

  /** Seed + `iters` Lloyd refinements. */
  def trainedCodebook(emb: DataFrame, m: Int, k: Int, iters: Int = 1): DataFrame =
    (1 to iters).foldLeft(seedCodebook(emb, m, k)) { (b, _) =>
      refineCodebook(emb, b, m)
    }

  /** Nearest-code assignment per (vec, sub): exact integer distance,
    * code-asc tie-break, argmin packed into one long (KMeans' trick —
    * dist·256 + code keeps min() a hash aggregate; subvector dists at
    * 1e6 quantization are ≪ 2^55). Keeps qs for [[refineCodebook]]. */
  private def assignments(subs: DataFrame, book: DataFrame): DataFrame =
    subs
      .join(broadcast(book), Seq("sub"))
      .withColumn("dist", col("n2s") + col("c_n2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
      .groupBy(col("vec_id"), col("sub"), col("qs"))
      .agg(min(col("dist") * lit(256L) + col("code")).as("packed"))
      .select(col("vec_id"), col("sub"), col("qs"),
        (col("packed") % 256L).as("code"))

  /** Encode the corpus: (vec_id, codes), codes in subspace order —
    * the m-byte-per-vector compressed index. */
  def encode(emb: DataFrame, book: DataFrame, m: Int): DataFrame =
    assignments(subvectors(emb, m), book)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** ADC top-k: per query, a (m × k) partial-distance LUT from its
    * EXACT subvectors to the codebook; per (query, candidate), the
    * distance is m array lookups summed — never a float op, never the
    * original vectors. Self-matches excluded; (dist asc, id asc)
    * rank. */
  def adcTopK(emb: DataFrame, queryPred: Column, m: Int = 8, k: Int = 16,
      topK: Int = 10, book0: Option[DataFrame] = None): DataFrame = {
    val book = book0.getOrElse(seedCodebook(emb, m, k))
    val lut = subvectors(emb.filter(queryPred), m)
      .join(broadcast(book), Seq("sub"))
      .withColumn("pdist", col("n2s") + col("c_n2") -
        lit(2L) * graft.expressions.DotProductLong.dot(col("qs"), col("centroid")))
      // row per (query, sub): k partials ordered by code; then the
      // m-row stack ordered by sub — LUT[sub+1][code+1] = pdist
      .groupBy(col("vec_id"), col("sub"))
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("pdist")))),
        x => x.getField("pdist")).as("row"))
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("row")))),
        x => x.getField("row")).as("lut"))
      .withColumnRenamed("vec_id", "query_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    encode(emb, book, m)
      .crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", expr(
        "aggregate(zip_with(codes, lut, (c, r) -> element_at(r, CAST(c AS INT) + 1)), " +
          "0L, (acc, v) -> acc + v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("int").as("rank"))
  }
}
