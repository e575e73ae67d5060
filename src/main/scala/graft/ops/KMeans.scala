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
}
