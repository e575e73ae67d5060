package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer k-means (Lloyd) over the embedding corpus —
  * the clustering stage of SemDeDup-style data curation: cluster the
  * embedding space, then dedup/select within clusters. Unlike IVF's
  * label-derived lists, the centroids here come from the data.
  *
  * Cross-engine determinism (the house rules, applied to ML): vectors
  * are integer-quantized (Similarity.quantized); distances are EXACT
  * integers via ||a-b||² = n2a + n2c − 2·a·b with the codegen'd
  * integer dot product; centroid updates are floor(sum/count) per
  * component; init is cluster = vec_id mod k; ties break cluster-asc.
  * Every engine that follows the algebra lands on the same partition
  * — the DuckDB oracle unrolls the same iterations symbolically.
  *
  * 100 TB shape per iteration: centroids are metadata-sized and
  * BROADCAST to the corpus (assignment = one codegen map over n×k
  * pairs + a vec_id-partial min — no corpus shuffle); the update
  * shuffles only (cluster, pos, partial-sum) triples, k×dim rows of
  * state. Fixed `iters` keeps the whole fit ONE lazy plan; loop
  * variants should checkpoint per round like [[Clustering]].
  */
object KMeans {

  /** Cluster assignment after `iters` Lloyd updates: (vec_id,
    * cluster, dist) with dist the exact integer squared distance to
    * the final centroid. */
  def fit(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    fitAssignments(emb, k, iters).select(col("vec_id"), col("cluster"), col("dist"))

  /** As [[fit]] but keeping the quantized vector and norm columns
    * (vec_id, q, n2, cluster, dist) for downstream within-cluster
    * work ([[semDedupKept]]). */
  def fitAssignments(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && k <= 256, "k must be in [1, 256] (argmin packs cluster in 8 bits)")
    require(iters >= 1, "iters must be >= 1")
    val quant = Similarity.quantized(emb).select(col("vec_id"), col("q"), col("n2"))
    val init = quant.withColumn("cluster", col("vec_id") % k)
    (1 to iters).foldLeft(init) { (assigned, _) =>
      assign(quant, centroids(assigned))
    }
  }

  /** SemDeDup (Abbas et al. 2023): embedding-level semantic dedup —
    * cluster the corpus, then drop every vector with a smaller-id
    * same-cluster neighbor above the cosine threshold (the greedy
    * keep-min rule every dedup op here uses). The cluster assignment
    * IS the blocking key: pair work is within-cluster only, bounded
    * by cluster size — n²/k on balanced clusters — and the self-join
    * shuffles on the cluster id. */
  def semDedupKept(emb: DataFrame, k: Int = 8, iters: Int = 2,
      thresholdBp: Long = 8000L): DataFrame = {
    val a = fitAssignments(emb, k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val losers = a.as("x").join(a.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.vec_id") < col("y.vec_id"))
      .filter(Similarity.cosBp(
        graft.expressions.DotProductLong.dot(col("x.q"), col("y.q")),
        col("x.n2"), col("y.n2")) >= thresholdBp)
      .select(col("y.vec_id").as("vec_id")).distinct()
    a.join(losers, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** floor-mean centroids of an assignment; (cluster, centroid, c_n2).
    * Shuffles only (cluster, pos) partial sums — k×dim rows. */
  def centroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy(col("cluster"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
      .withColumn("c_n2", expr("aggregate(centroid, 0L, (acc, v) -> acc + v * v)"))

  /** Nearest-centroid assignment (exact integer distance, cluster-asc
    * tie-break). Centroids broadcast; the min is a vec_id aggregate
    * with map-side partials, not a window. Two codegen details keep
    * the n×k pair stream in a HashAggregate: `q`/`n2` ride in the
    * GROUPING KEY (vec_id determines them — an array-valued first()
    * has an immutable buffer and forces SortAggregate), and the
    * (dist, cluster) argmin is PACKED into one long (`min(struct)`'s
    * buffer is immutable too) — dist·256 + cluster preserves the
    * (dist asc, cluster asc) order since cluster < 256, and
    * max-quantized distances (~2^48 at |x|≤1-scale embeddings) leave
    * the ·256 shift far from the long boundary. */
  def assign(quant: DataFrame, cents: DataFrame): DataFrame =
    quant.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("n2") + col("c_n2") -
          lit(2L) * graft.expressions.DotProductLong.dot(col("q"), col("centroid")))
      .groupBy(col("vec_id"), col("q"), col("n2"))
      .agg(min(col("dist") * lit(256L) + col("cluster")).as("packed"))
      .select(col("vec_id"), col("q"), col("n2"),
        (col("packed") % 256L).as("cluster"),
        expr("packed div 256").as("dist")) // div: integral — `/` is double
        // division and rounds past 2^53, silently corrupting distances

  /** Simplified silhouette per cluster (Rousseeuw's s with centroid
    * distances in place of mean pairwise ones — the O(n·k) variant
    * every large-scale eval uses; the exact O(n²) silhouette is the
    * pair blowup this library never ships): per point
    * s = (b − a)/max(a, b) with a = distance to OWN centroid and
    * b = distance to the NEAREST OTHER centroid, in milli. The
    * fit-quality read the q52 assignment itself can't give — inertia
    * always improves with k, silhouette peaks where the clustering is
    * honest; n_negative counts points sitting closer to a foreign
    * centroid (misassignments under floor-mean centroid drift).
    *
    * Determinism: a², b² are exact integers (the fit's packed-argmin
    * distances and the same n2 + c_n2 − 2·dot identity); the terminal
    * s is a fixed chain of IEEE ops (sqrt, sub, div, mul, floor) on
    * those integers — bit-identical cross-engine (the cosBp rule).
    * Both-zero distances define s = 0.
    *
    * Scale shape: the k-centroid frame broadcasts to the corpus
    * (one n×(k−1) codegen map, no corpus shuffle — the assign()
    * shape); per-cluster and overall rows are k+1 metadata rows.
    *
    * Columns: cluster (−1 = overall), n_points,
    * mean_silhouette_milli, n_negative. */
  def silhouette(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 2 && k <= 256, "silhouette needs k in [2, 256]")
    require(iters >= 1, "iters must be >= 1")
    // replicate the fit chain keeping the FINAL round's centroids:
    // a and b must be measured against the same centroid set the
    // assignment minimized over (centroids(final assignment) would be
    // one Lloyd step ahead — b < a becomes possible and the
    // misassignment count turns meaningless)
    // one corpus scan: the quantized frame serves every Lloyd round
    // and the distance map (caller owns the cache); per-round
    // centroids are k-row metadata, checkpointed so each round's
    // lineage doesn't re-derive the whole chain
    val quant = Similarity.quantized(emb)
      .select(col("vec_id"), col("q"), col("n2"))
      .persist()
    val init = quant.withColumn("cluster", col("vec_id") % k)
    val (assigned, cents) = (1 to iters)
      .foldLeft((init, Option.empty[DataFrame])) { case ((a, _), _) =>
        val c = centroids(a).localCheckpoint(false)
        (assign(quant, c), Some(c))
      }
    val sv = assigned
      .crossJoin(broadcast(cents.get.select(col("cluster").as("oc"),
        col("centroid"), col("c_n2"))))
      .filter(col("oc") =!= col("cluster"))
      .withColumn("d2", col("n2") + col("c_n2") - lit(2L) *
        graft.expressions.DotProductLong.dot(col("q"), col("centroid")))
      .groupBy(col("vec_id"), col("cluster"), col("dist"))
      .agg(min(col("d2")).as("b2"))
      .withColumn("s_milli", when(
        greatest(col("dist"), col("b2")) === 0L, lit(0L))
        .otherwise(floor(lit(1000.0) *
          (sqrt(col("b2").cast("double")) - sqrt(col("dist").cast("double"))) /
          greatest(sqrt(col("dist").cast("double")),
            sqrt(col("b2").cast("double")))).cast("long")))
    val perCluster = sv.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("s_milli")).as("__s"),
        sum(when(col("s_milli") < 0L, 1L).otherwise(0L)).as("n_negative"))
      .localCheckpoint(false) // k rows; the overall row derives from it
    val overall = perCluster.groupBy(lit(-1L).as("cluster"))
      .agg(sum(col("n_points")).as("n_points"), sum(col("__s")).as("__s"),
        sum(col("n_negative")).as("n_negative"))
    perCluster.unionByName(overall)
      .select(col("cluster"), col("n_points"),
        expr("__s DIV n_points").as("mean_silhouette_milli"),
        col("n_negative"))
      .orderBy(col("cluster").asc)
  }
}
