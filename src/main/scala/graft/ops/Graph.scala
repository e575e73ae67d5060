package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) over an edge list, as a fixed number
  * of power-iteration rounds unrolled SYMBOLICALLY into one
  * declarative plan — the q52-kmeans convention: no driver loop over
  * data, no collect; the driver only composes the plan. Catalyst sees
  * the whole unrolled dataflow and pipelines each round's joins.
  *
  * Integer fixed-point arithmetic (house determinism rules): ranks
  * live in `Scale` units (1e12 total mass), damping is basis points,
  * every division is a BIGINT floor div — bit-identical in any
  * engine, no IEEE accumulation-order sensitivity. Worst products
  * stay far from Long overflow: dampBp × rank ≤ 8.5e15.
  *
  * Per round: r_{t+1}(v) = base + dangle + Σ_{u→v} share(u), with
  *   share(u) = (dampBp × r_t(u)) div (10000 × out_deg(u))
  *   base     = ((10000 − dampBp) × (Scale div n)) div 10000
  *   dangle   = (dampBp × Σ_{dangling u} r_t(u)) div (10000 × n)
  * (dangling = no out-edges; their mass redistributes uniformly —
  * without it a directed graph leaks rank every round).
  *
  * Scale shape (per round, the standard Pregel cost): one edge⋈share
  * join on src (the edge pass) and one contribution aggregate on dst,
  * plus the node-grain carry join. Out-degrees are joined ONCE into
  * the round-0 rank frame and carried as a column through every round
  * (they are rank-invariant), so no per-round degree join exists. The
  * node-grain frames are catalog-sized next to the edge list; the
  * dangling mass is ONE scalar crossJoin-broadcast, never a driver
  * value. Rounds is a model hyperparameter (3–20 in practice) — plan
  * width grows linearly, the q52/q70 unroll precedent at larger
  * constants.
  */
object Graph {

  val Scale = 1000000000000L // total rank mass, 1e12
  val DampBp = 8500L         // the canonical d = 0.85

  /** `edges`: directed (src, dst) BIGINT columns, self-loops allowed,
    * duplicates collapse. Returns (item, rank) for every node, rank
    * in Scale units after `iters` rounds.
    *
    * `assumeNoDangling`: when the caller guarantees every node has an
    * out-edge (true by construction for [[symmetric]] graphs), the
    * per-round dangling aggregate + scalar broadcast are omitted —
    * two fewer stages per round; the dangle term is identically 0 on
    * such graphs, so results are unchanged (GraphSpec pins both
    * paths agree on a symmetric fixture). */
  def pageRank(edges: DataFrame, iters: Int, dampBp: Long = DampBp,
      assumeNoDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "pageRank needs at least one round")
    // e feeds every round's edge pass and r0 feeds round 1 three ways
    // — LAZY localCheckpoint both, which (a) stores the blocks once
    // like persist and (b) TRUNCATES LINEAGE, so each round's
    // planning starts from an ExistingRDD instead of re-optimizing a
    // plan carrying several copies of the whole upstream edge
    // pipeline (measured: round-1 planning alone cost 3-5 s on the
    // co-visitation graph without this — more than 10× the actual
    // execution). Standard iterative-algorithm trade: truncated
    // lineage means an executor loss mid-job restarts the job instead
    // of recomputing blocks.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("item"))
      .union(e.select(col("dst").as("item"))).distinct()
    // n as a 1-row broadcast frame: node-count never touches the driver
    val tot = nodes.agg(count(lit(1)).as("n"))
    // out-degree is rank-invariant: join it ONCE here and carry it as
    // a column through every round (null deg = dangling node)
    val r0 = nodes.crossJoin(broadcast(tot))
      .join(deg.withColumnRenamed("src", "item"), Seq("item"), "left")
      .select(col("item"), col("n"), col("deg"),
        expr(s"${Scale}L div n").as("rank"))
      .localCheckpoint(false)

    (1 to iters).foldLeft(r0) { (r, round) =>
      // per-source share: dangling sources (deg null) emit none
      val share = r.filter(col("deg").isNotNull)
        .select(col("item").as("src"),
          expr(s"$dampBp * rank div (10000L * deg)").as("share"))
      val contrib = e.join(share, Seq("src"))
        .groupBy(col("dst").as("item"))
        .agg(sum(col("share")).as("in_mass"))
      val base = expr(s"(10000L - $dampBp) * (${Scale}L div n) div 10000L")
      val joined = r.select(col("item"), col("n"), col("deg"))
        .join(contrib, Seq("item"), "left")
      val next =
        if (assumeNoDangling)
          joined.select(col("item"), col("n"), col("deg"),
            (base + coalesce(col("in_mass"), lit(0L))).as("rank"))
        else {
          // dangling mass: one scalar (sum over no-out-edge nodes; 0
          // on symmetric graphs), redistributed uniformly
          val dangle = r.filter(col("deg").isNull)
            .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
          joined.crossJoin(broadcast(dangle))
            .select(col("item"), col("n"), col("deg"),
              (base + expr(s"$dampBp * dsum div (10000L * n)")
                + coalesce(col("in_mass"), lit(0L))).as("rank"))
        }
      // each round reads r three times (share, dangle, carry) — the
      // Clustering convention: truncate lineage per intermediate
      // round or the optimizer re-plans a tree that triples every
      // iteration. The LAST round stays declarative (plan-auditable;
      // nothing downstream re-reads it three times).
      if (round < iters) next.localCheckpoint(false) else next
    }.select(col("item"), col("rank"))
  }

  /** Top-k nodes by rank, rank-desc with item tie-break. */
  def pageRankTopK(edges: DataFrame, iters: Int, k: Int,
      dampBp: Long = DampBp, assumeNoDangling: Boolean = false): DataFrame =
    pageRank(edges, iters, dampBp, assumeNoDangling)
      .orderBy(col("rank").desc, col("item"))
      .limit(k)

  /** Symmetrize an unordered pair list (item_a < item_b) into the
    * directed both-ways edge list PageRank expects. */
  def symmetric(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    val p = pairs.filter(col(weightCol) >= minWeight)
    p.select(col("item_a").as("src"), col("item_b").as("dst"))
      .union(p.select(col("item_b").as("src"), col("item_a").as("dst")))
  }
}
