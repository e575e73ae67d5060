package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** WEIGHTED PageRank over (src, dst, w) edges — co-visit counts ARE
    * edge strengths, and the unweighted walk throws that signal away
    * (an item seen with a neighbor 500 times ranks no closer than one
    * seen once). Same fixed-point discipline as [[pageRank]]; the
    * per-node share split becomes per-EDGE:
    *   contrib(u→v) = t_u·w_uv div W_u, t_u = dampBp·r_u div 10000
    * (the two-step floor keeps every product under Long overflow for
    * w ≤ ~1e6 — t ≤ 8.5e11 — and is the DEFINED semantics the oracle
    * mirrors term for term). Dangling mass redistributes uniformly as
    * before. Returns (item, rank), Scale units.
    *
    * Scale shape unchanged: one edge⋈rank join + one dst aggregate
    * per round, W_u joined once and carried. */
  def pageRankWeighted(edges: DataFrame, iters: Int,
      dampBp: Long = DampBp): DataFrame = {
    require(iters >= 1, "pageRankWeighted needs at least one round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w") > 0L)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(false)
    val wOut = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val nodes = e.select(col("src").as("item"))
      .union(e.select(col("dst").as("item"))).distinct()
    val tot = nodes.agg(count(lit(1)).as("n"))
    val r0 = nodes.crossJoin(broadcast(tot))
      .join(wOut.withColumnRenamed("src", "item"), Seq("item"), "left")
      .select(col("item"), col("n"), col("wout"),
        expr(s"${Scale}L div n").as("rank"))
      .localCheckpoint(false)
    (1 to iters).foldLeft(r0) { (r, round) =>
      val share = r.filter(col("wout").isNotNull)
        .select(col("item").as("src"), col("wout"),
          expr(s"$dampBp * rank div 10000L").as("t"))
      val contrib = e.join(share, Seq("src"))
        .groupBy(col("dst").as("item"))
        .agg(sum(expr("t * w div wout")).as("in_mass"))
      val base = expr(s"(10000L - $dampBp) * (${Scale}L div n) div 10000L")
      val dangle = r.filter(col("wout").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
      val next = r.select(col("item"), col("n"), col("wout"))
        .join(contrib, Seq("item"), "left")
        .crossJoin(broadcast(dangle))
        .select(col("item"), col("n"), col("wout"),
          (base + expr(s"$dampBp * dsum div (10000L * n)")
            + coalesce(col("in_mass"), lit(0L))).as("rank"))
      if (round < iters) next.localCheckpoint(false) else next
    }.select(col("item"), col("rank"))
  }

  /** Personalized PageRank (topic-sensitive, Haveliwala 2002) from
    * the hub node: the restart mass — teleport AND dangling — all
    * lands on ONE seed (deg-max, id-asc tie-break, the [[bfsReach]]
    * rule) instead of spreading uniformly, so ranks answer "how close
    * is every item to THIS one under a random walk", the
    * similar-items score a recommender serves. Same unrolled integer
    * machinery as [[pageRank]]; per round:
    *   r'(v) = [v = seed]·((10000−damp)·Scale + damp·dangle) div 10000
    *           + Σ shares into v.
    * Returns (item, rank), Scale units; unreached items rank 0. */
  def personalizedPageRank(edges: DataFrame, iters: Int,
      dampBp: Long = DampBp): DataFrame = {
    require(iters >= 1, "personalizedPageRank needs at least one round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val seed = deg.orderBy(col("deg").desc, col("src").asc).limit(1)
      .select(col("src").as("item"), lit(1L).as("is_seed"))
    val nodes = e.select(col("src").as("item"))
      .union(e.select(col("dst").as("item"))).distinct()
    val r0 = nodes
      .join(broadcast(seed), Seq("item"), "left")
      .join(deg.withColumnRenamed("src", "item"), Seq("item"), "left")
      .select(col("item"), col("deg"),
        coalesce(col("is_seed"), lit(0L)).as("is_seed"),
        // all mass starts at the seed — the walk's true t=0 state
        when(col("is_seed") === 1L, Scale).otherwise(0L).as("rank"))
      .localCheckpoint(false)
    (1 to iters).foldLeft(r0) { (r, round) =>
      val share = r.filter(col("deg").isNotNull && col("rank") > 0L)
        .select(col("item").as("src"),
          expr(s"$dampBp * rank div (10000L * deg)").as("share"))
      val contrib = e.join(share, Seq("src"))
        .groupBy(col("dst").as("item"))
        .agg(sum(col("share")).as("in_mass"))
      val dangle = r.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
      val next = r.select(col("item"), col("deg"), col("is_seed"))
        .join(contrib, Seq("item"), "left")
        .crossJoin(broadcast(dangle))
        .select(col("item"), col("deg"), col("is_seed"),
          (col("is_seed") * expr(
            s"((10000L - $dampBp) * ${Scale}L + $dampBp * dsum) div 10000L")
            + coalesce(col("in_mass"), lit(0L))).as("rank"))
      if (round < iters) next.localCheckpoint(false) else next
    }.select(col("item"), col("rank"))
  }

  /** Degree assortativity (Newman 2002) over an unordered pair list:
    * do high-degree items co-visit with other hubs (r > 0, a rich
    * club) or with the long tail (r < 0, hub-and-spoke)? The Pearson
    * correlation of endpoint degrees across DIRECTED edges — and
    * because every undirected edge is enumerated both ways, the two
    * endpoint marginals are IDENTICAL, so the usual √(var_x·var_y)
    * denominator collapses to one variance and the whole statistic is
    * a rational of exact decimal sums — no square root, no libm:
    *   r_bp = ⌊10000·(nΣxy − (Σx)²) / (nΣx² − (Σx)²)⌋.
    * One row: n_nodes, n_edges (undirected), max_deg,
    * assortativity_bp (null for a degree-regular graph, where the
    * variance is 0 and r is undefined).
    *
    * Scale shape: degree annotations broadcast onto the edge list
    * (the [[triangleStats]] policy), one scalar aggregate. */
  def degreeAssortativity(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    val dec = "decimal(38,0)"
    val e = pairs.filter(col(weightCol) >= minWeight)
      .select(col("item_a").as("a"), col("item_b").as("b"))
      .localCheckpoint(false)
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(max(col("deg")), lit(0L)).as("max_deg"))
    val dir = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val xy = dir
      .join(broadcast(deg.select(col("v").as("u"), col("deg").as("x"))), "u")
      .join(broadcast(deg.select(col("v"), col("deg").as("y"))), "v")
    val sums = xy.agg(count(lit(1)).as("m"),
      sum(col("x").cast(dec)).as("sx"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    nodeStats.crossJoin(broadcast(sums))
      .select(col("n_nodes"), expr("m div 2").as("n_edges"), col("max_deg"),
        when(expr(s"CAST(m AS $dec) * sxx - sx * sx") === lit(0L).cast(dec),
          lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            expr(s"CAST(m AS $dec) * sxy - sx * sx").cast("double") /
            expr(s"CAST(m AS $dec) * sxx - sx * sx").cast("double"))
            .cast("long")).as("assortativity_bp"))
  }

  /** Symmetrize an unordered pair list (item_a < item_b) into the
    * directed both-ways edge list PageRank expects. */
  def symmetric(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    val p = pairs.filter(col(weightCol) >= minWeight)
    p.select(col("item_a").as("src"), col("item_b").as("dst"))
      .union(p.select(col("item_b").as("src"), col("item_a").as("dst")))
  }

  /** Link-prediction scores over an unordered pair list — the
    * "which edge forms next" table (Liben-Nowell & Kleinberg 2003):
    * for every 2-hop candidate pair (non-adjacent nodes sharing at
    * least one neighbor), the common-neighbor count and the
    * neighborhood Jaccard ⌊10000·|N(a)∩N(b)| / |N(a)∪N(b)|⌋ — the
    * two classical unsupervised predictors. Top-k by Jaccard
    * (common-neighbor, then id tie-breaks), the "recommend this
    * missing co-visit edge" feed.
    *
    * Scale shape: wedge enumeration at the shared-neighbor CENTER
    * (the same quadratic step as [[triangleStats]] — bounded here
    * because the co-vis composition caps per-session items and
    * min-support trims hub fans; a web-scale deployment caps
    * per-center neighbor lists first), a candidate-grain rollup, an
    * anti-join against the live edge list (predictions must be
    * NON-edges), degree annotations broadcast back, and a
    * TakeOrdered head — never a global sort. */
  def linkPrediction(pairs: DataFrame, minWeight: Long = 1L, k: Int = 20,
      weightCol: String = "pair_sessions"): DataFrame = {
    require(k >= 1, "k >= 1")
    val e = pairs.filter(col(weightCol) >= minWeight)
      .select(col("item_a").as("a"), col("item_b").as("b"))
    val adj = symmetric(pairs, minWeight, weightCol)
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val cand = adj.as("x").join(adj.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("a"), col("y.dst").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(e, Seq("a", "b"), "left_anti")
    cand
      .join(broadcast(deg.select(col("src").as("a"), col("deg").as("deg_a"))),
        Seq("a"))
      .join(broadcast(deg.select(col("src").as("b"), col("deg").as("deg_b"))),
        Seq("b"))
      .withColumn("jaccard_bp",
        floor(lit(10000.0) * col("common_neighbors") /
          (col("deg_a") + col("deg_b") - col("common_neighbors")))
          .cast("long"))
      .orderBy(col("jaccard_bp").desc, col("common_neighbors").desc,
        col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("common_neighbors"), col("deg_a"), col("deg_b"),
        col("jaccard_bp"))
  }

  /** Triangle census + global clustering coefficient over an
    * unordered pair list — the graph-health report next to PageRank:
    * how clique-ish is the co-visit graph (cc → 1 means tight
    * communities, → 0 means star/bot shapes), and how many closed
    * triads back the "users who viewed X also viewed Y" confidence.
    *
    * One row: n_nodes, n_edges, max_deg, n_wedges (= Σ C(deg,2), the
    * open+closed triad count), n_triangles, and
    * global_cc_bp = ⌊10000 · 3·triangles / wedges⌋.
    *
    * Scale shape — the compact-forward orientation (Latapy 2008,
    * standard distributed triangle counting): each edge is oriented
    * from its LOWER-degree endpoint to the higher ((deg, id)
    * lexicographic, so the orientation is total and deterministic).
    * Every node's oriented out-degree is then O(√m) regardless of how
    * skewed the raw degree distribution is — a celebrity node with
    * 10⁶ followers has huge in-degree but tiny out-degree, so the
    * wedge self-join (the quadratic step) enumerates O(m^1.5) wedge
    * candidates instead of Σ C(deg,2). Each triangle {u<v<w} by rank
    * is found exactly once: as the wedge (v,w) at its lowest-rank
    * corner u, closed by the oriented edge v→w. The closure test is a
    * semi-style inner join back to the oriented edge list — never an
    * all-pairs product. The oracle counts the same triangle set by
    * plain id-ordering; the counts agree because orientation only
    * changes WHERE a triangle is found, not whether. */
  def triangleStats(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    // persisted intermediates are caller-owned (the lazy-return house
    // convention — see the graft package scaladoc, "Cache ownership")
    val e = pairs.filter(col(weightCol) >= minWeight)
      .select(col("item_a").as("a"), col("item_b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val nodeStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(max(col("deg")), lit(0L)).as("max_deg"),
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
    val edgeStats = e.agg(count(lit(1)).as("n_edges"))
    // node-grain degree table: item-catalog-bounded in the co-vis
    // composition (the coVisitation itemN precedent) — broadcast, so
    // the edge list never shuffles for its own annotations. A
    // web-scale node domain would drop the hint and let AQE decide.
    val da = broadcast(deg.select(col("v").as("a"), col("deg").as("da")))
    val db = broadcast(deg.select(col("v").as("b"), col("deg").as("db")))
    val oriented = e.join(da, "a").join(db, "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("ddst")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"), col("da").as("ddst")))
        .as("o"))
      .select(col("o.src"), col("o.dst"), col("o.ddst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("src"), col("e2.dst").as("dst"))
    val tri = wedges.join(oriented.select(col("src"), col("dst")),
        Seq("src", "dst"))
      .agg(count(lit(1)).as("n_triangles"))
    nodeStats.crossJoin(edgeStats).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("max_deg"),
        col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * lit(3L) * col("n_triangles") /
            col("n_wedges")).cast("long")).as("global_cc_bp"))
  }

  /** Per-node clustering coefficient, reported at degree-band grain —
    * the local companion to [[triangleStats]]' one global number:
    * cc(v) = 2·t(v) / (deg(v)·(deg(v)−1)), where t(v) counts the
    * triangles at v. High-degree hubs with low cc are connectors;
    * low-degree nodes with cc 1 sit in cliques — the banded report
    * (band = ⌊log₂ deg⌋, the house bitlen bucket) shows the
    * hierarchy without republishing a node-grain table.
    *
    * Scale shape: the same degree-oriented wedge join as
    * [[triangleStats]] (O(m^1.5) bound, never all-pairs), with the
    * wedge APEX carried so each closed triangle explodes to its 3
    * corners for the per-node count; the final rollup is band-grain
    * (≤ ~40 rows). Nodes with deg < 2 have no defined coefficient and
    * are excluded. Persisted intermediates are caller-owned (house
    * convention). */
  def clusteringCoefficient(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    val e = pairs.filter(col(weightCol) >= minWeight)
      .select(col("item_a").as("a"), col("item_b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist()
    val da = broadcast(deg.select(col("v").as("a"), col("deg").as("da")))
    val db = broadcast(deg.select(col("v").as("b"), col("deg").as("db")))
    val oriented = e.join(da, "a").join(db, "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("ddst")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"), col("da").as("ddst")))
        .as("o"))
      .select(col("o.src"), col("o.dst"), col("o.ddst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("apex"), col("e1.dst").as("src"),
        col("e2.dst").as("dst"))
    val perNode = wedges
      .join(oriented.select(col("src"), col("dst")), Seq("src", "dst"))
      .select(explode(array(col("apex"), col("src"), col("dst"))).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("t"))
    deg.join(perNode, Seq("v"), "left")
      .filter(col("deg") >= 2L)
      .select(col("deg"), coalesce(col("t"), lit(0L)).as("t"))
      .withColumn("cc_bp", floor(lit(10000.0) * lit(2L) * col("t") /
        (col("deg") * (col("deg") - 1L))).cast("long"))
      .withColumn("deg_band", (length(bin(col("deg"))) - 1).cast("long"))
      .groupBy(col("deg_band"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("cc_bp")).as("__s"),
        min(col("cc_bp")).as("min_cc_bp"), max(col("cc_bp")).as("max_cc_bp"))
      .select(col("deg_band"), col("n_nodes"),
        expr("__s div n_nodes").as("mean_cc_bp"),
        col("min_cc_bp"), col("max_cc_bp"))
      .orderBy(col("deg_band").asc)
  }

  /** Connected-component size census over an unordered pair list —
    * the community structure read beside [[triangleStats]]: is the
    * co-visit graph one giant component (a healthy catalog) or
    * fragmented islands (siloed categories, or a support threshold
    * set too high)? Delegates to [[Clustering.connectedComponents]]
    * (large-star/small-star, the same machinery as the near-dup
    * clusters — one CC implementation in the library, two graph
    * domains), then one component-grain count.
    *
    * Columns: component (the member minimum — a stable label),
    * n_items; ordered n_items desc, component asc. */
  def componentSizes(pairs: DataFrame, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame =
    Clustering.connectedComponents(
        pairs.filter(col(weightCol) >= minWeight), "item_a", "item_b")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("n_items").desc, col("component").asc)

  /** Bounded-depth BFS from the hub node: min-hop distance to every
    * node within `maxHops` of the highest-degree vertex (degree desc,
    * id asc tie-break — a deterministic seed, no driver pick). The
    * "how far does influence travel" companion to PageRank: hop-0 is
    * the hub, hop-1 its neighborhood, hop-k the k-step reach.
    *
    * Scale shape — frontier-pruned Pregel, `iters` unrolled
    * symbolically like [[pageRank]] (driver composes the plan, never
    * touches data): per round ONE frontier⋈edges join on src plus one
    * anti-join against the visited set, so each edge is traversed at
    * most once per round and — because the frontier carries only
    * NEWLY-reached nodes — the total work is O(edges within reach),
    * not O(edges × rounds). The naive alternative (expand all paths,
    * min at the end — what the DuckDB oracle does, fine at oracle
    * scale) multiplies by path count and dies on any dense graph.
    * The seed is a 1-row frame (argmax via sort-limit), so round 1's
    * join broadcasts; later frontiers grow and AQE re-plans per
    * round off the checkpointed sizes. Visited/frontier frames are
    * node-grain (≪ edges) and lineage-truncated per round — the
    * [[pageRank]] re-planning lesson.
    *
    * Returns (item, hops) for every reached node, hops ∈ [0, maxHops],
    * ordered hops asc, item asc. */
  def bfsReach(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "bfsReach needs at least one hop")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val seed = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc).limit(1)
      .select(col("src").as("item"))
    val dist0 = seed.select(col("item"), lit(0L).as("hops"))
      .localCheckpoint(false)
    val (distN, _) = (1 to maxHops).foldLeft((dist0, dist0.select("item"))) {
      case ((dist, frontier), h) =>
        // expand one hop, keep only first-time arrivals
        val reached = frontier.join(e, frontier("item") === e("src"))
          .select(e("dst").as("item")).distinct()
        val pruned = reached.join(dist.select("item"), Seq("item"), "left_anti")
        // mid rounds read `fresh` twice (union + next expand) —
        // checkpoint; the LAST round reads it once and stays
        // declarative so the expand+prune shape is plan-auditable
        val fresh =
          if (h < maxHops) pruned.localCheckpoint(false) else pruned
        val next = dist.union(fresh.select(col("item"), lit(h.toLong).as("hops")))
        (if (h < maxHops) next.localCheckpoint(false) else next, fresh)
    }
    distN.orderBy(col("hops").asc, col("item").asc)
  }

  /** Label-propagation communities (Raghavan et al. 2007), the
    * modularity-style read FINER than [[componentSizes]]: CC says
    * "connected at all", LPA says "densely connected" — a bridge edge
    * joins two components into one CC but label propagation keeps the
    * two dense sides in different communities. Deterministic variant:
    * synchronous rounds, every node adopts the label with the highest
    * incident WEIGHT mass among its neighbors (score desc, label asc
    * tie — no RNG, no visit-order dependence, so the oracle replays
    * it exactly); a FIXED round budget keeps the plan bounded and
    * sidesteps synchronous LPA's bipartite oscillation by fiat — the
    * output is "communities after K sweeps", the same determinism
    * convention as [[pageRank]]'s fixed iterations.
    *
    * Columns: community (label = member item id), n_items; ordered
    * n_items desc, community asc.
    *
    * Scale shape: per round ONE edge⋈labels join (edge-grain, the
    * item catalog's pair list — never fact rows), an (item, label)
    * aggregate, and a per-item top-1 window (WindowGroupLimit);
    * label frames are node-grain and lineage-truncated per round
    * (the [[kcore]] 3^iters lesson). */
  def labelProp(pairs: DataFrame, rounds: Int = 4, minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds in [1,8]")
    val p = pairs.filter(col(weightCol) >= minWeight)
    val edges = p.select(col("item_a").as("src"), col("item_b").as("dst"),
        col(weightCol).as("w"))
      .union(p.select(col("item_b").as("src"), col("item_a").as("dst"),
        col(weightCol).as("w")))
      .localCheckpoint(false)
    val labels0 = edges.select(col("src").as("item")).distinct()
      .select(col("item"), col("item").as("label"))
      .localCheckpoint(false)
    val byItem = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("score").desc, col("label").asc)
    val finalLabels = (1 to rounds).foldLeft(labels0) { (labels, r) =>
      val next = edges
        .join(labels.withColumnRenamed("item", "src"), Seq("src"))
        .groupBy(col("dst").as("item"), col("label"))
        .agg(sum(col("w")).as("score"))
        .withColumn("rn", row_number().over(byItem))
        .filter(col("rn") === 1)
        .select(col("item"), col("label"))
      // last round stays declarative so the join+window shape is
      // plan-auditable; mid rounds truncate lineage
      if (r < rounds) next.localCheckpoint(false) else next
    }
    finalLabels
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("n_items").desc, col("community").asc)
  }

  /** k-core extraction by iterative peeling (Seidman 1983) — the
    * standard "dense backbone vs ragged fringe" cut: repeatedly drop
    * every vertex with degree < k until none remain. Recommenders
    * trim to the 2- or 3-core before factorization (fringe items have
    * no co-signal), and the core size is the graph-health number next
    * to q157's clustering coefficient. A FIXED iteration budget keeps
    * the plan bounded; `converged` reports whether the residual is a
    * true k-core (min residual degree ≥ k) — on real co-visit graphs
    * peeling stabilizes in a handful of rounds because each round
    * only re-examines neighbors of dropped vertices.
    *
    * One row: k, iters, n_core_vertices, n_core_edges (undirected),
    * min_core_deg (NULL on an empty core), converged.
    *
    * Scale shape: per round, one degree aggregate + two semi-joins,
    * all at ITEM-grain (the co-vis catalog — the q263/q157 argument:
    * edges are item pairs, bounded by the catalog, never by fact
    * rows); the symmetric edge list keeps degree counting one
    * aggregate instead of a union of two directions per round. */
  def kcore(pairs: DataFrame, k: Int = 3, iters: Int = 4,
      minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    require(k >= 1, "k >= 1")
    require(iters >= 1 && iters <= 8, "iters in [1,8]")
    // each round reads the previous edge frame THREE times (the
    // degree build feeds both semi-join sides) — without truncation
    // the lineage re-instantiates the whole upstream 3^iters times
    // (the bfsReach per-hop rule); a lazy localCheckpoint pins each
    // round to one materialization of an item-grain frame
    var e = symmetric(pairs, minWeight, weightCol).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
    }
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    deg.agg(
        count(lit(1)).as("n_core_vertices"),
        coalesce(sum(col("deg")), lit(0L)).as("__deg_sum"),
        min(col("deg")).as("min_core_deg"))
      .select(lit(k.toLong).as("k"), lit(iters.toLong).as("iters"),
        col("n_core_vertices"),
        expr("__deg_sum DIV 2").as("n_core_edges"),
        col("min_core_deg"),
        (col("n_core_vertices") === 0L ||
          col("min_core_deg") >= k.toLong).cast("int").as("converged"))
  }

  /** Hub-knockout robustness census (Albert–Jeong–Barabási 2000's
    * "attack" experiment): remove the top-k highest-degree nodes and
    * measure what is left of the giant component — the
    * single-point-of-failure read for a co-visit/recommendation
    * graph, where a catalog built around three hub items falls apart
    * the day one is delisted. Complements [[kcore]] (which peels by
    * LOCAL degree floor; this deletes GLOBAL hubs) and q201's intact
    * component census (the k=0 row reproduces it).
    *
    * Deterministic: hubs ranked (degree desc, id asc); removal is a
    * rank filter, never a sampled set. Per k the remaining edge set
    * re-runs the q42 star-forest CC — components at catalog grain.
    * Nodes are edge ENDPOINTS throughout, so a knockout that isolates
    * a node also removes it from the census (the house co-vis node
    * convention).
    *
    * Scale shape: the symmetric edge list is built once
    * (checkpointed, catalog-bounded), and ALL knockout levels run
    * through ONE connected-components execution — each level's
    * surviving nodes are packed into a composite id
    * (node·|ks| + level index), so the union of the per-level edge
    * sets is a single disjoint graph and the star-forest rounds are
    * paid once, not per k (the per-k variant spent 5× the CC
    * checkpoint-round overhead — the q292 constant — and was the
    * bench's most expensive query). Only the TOP max(ks) hubs are
    * ever ranked — TakeOrderedAndProject(max ks) off the degree
    * aggregate, never a global row_number sort of the whole node
    * table (that planned Exchange SinglePartition over the catalog) —
    * and each level filters by a broadcast ANTI join against its ≤k
    * hub rows (a query constant, broadcastable at ANY scale) instead
    * of an inner join against the catalog-sized survivor set. The
    * hub table is eagerly checkpointed: 2·|ks| broadcast builds read
    * materialized blocks instead of each re-running the degree
    * aggregate (unfired lazy lineage is invisible to broadcast reuse
    * — the q352 anatomy). The fact stream is touched only by the
    * pair build the caller passes in (the shared co-vis artifact in
    * the registered query).
    *
    * Columns: k_removed, n_nodes, n_edges, n_components, giant_items,
    * giant_share_bp (NULL when the graph is empty). */
  def hubKnockout(pairs: DataFrame, ks: Seq[Int], minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0) && ks.distinct.size == ks.size,
      "ks distinct, non-negative")
    val kSorted = ks.sorted
    val nk = kSorted.size
    val e = symmetric(pairs, minWeight, weightCol)
      .select(col("src"), col("dst"))
      .localCheckpoint(false)
    // only the top max(ks) hubs need ranks (every filter is
    // `rnk <= k`, k ≤ max): TakeOrderedAndProject keeps the head
    // selection parallel, and the row_number runs over ≤ max(ks) rows
    // (a query constant — a bounded single partition, never the whole
    // node table). Eager checkpoint: all 2·|ks| broadcast anti-join
    // builds below read these blocks.
    val maxK = kSorted.last
    val hubs = e.groupBy(col("src").as("item"))
      .agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("item").asc)
      .limit(maxK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("deg").desc, col("item").asc)))
      .select(col("item"), col("rnk"))
      .localCheckpoint(true)
    // one disjoint union of every level's surviving edges, node ids
    // packed as node·nk + level (levels never collide). Removing the
    // ≤k hubs is a broadcast ANTI join against k rows — identical to
    // the old inner join against the (catalog-sized) rank>k survivor
    // set, but the broadcast side is a query constant at any scale.
    val tagged = kSorted.zipWithIndex.map { case (k, i) =>
      val out = hubs.filter(col("rnk") <= k)
      e.join(broadcast(out.select(col("item").as("src"))),
          Seq("src"), "left_anti")
        .join(broadcast(out.select(col("item").as("dst"))),
          Seq("dst"), "left_anti")
        .select(lit(i.toLong).as("ki"),
          (col("src") * nk + i).as("psrc"),
          (col("dst") * nk + i).as("pdst"))
    }.reduce(_ unionByName _)
      .localCheckpoint(false) // edge counts + the single CC run
    val eCnt = tagged.groupBy(col("ki"))
      .agg(expr("count(1) DIV 2").as("n_edges"))
    val census = Clustering.connectedComponents(tagged, "psrc", "pdst")
      .withColumn("ki", pmod(col("component"), lit(nk.toLong)))
      .groupBy(col("ki"), col("component"))
      .agg(count(lit(1)).as("n_items"))
      .groupBy(col("ki"))
      .agg(sum(col("n_items")).as("n_nodes"),
        count(lit(1)).as("n_components"),
        max(col("n_items")).as("giant_items"))
    // a level whose graph emptied entirely must still report its row
    val levels = kSorted.zipWithIndex
      .map { case (k, i) => (i.toLong, k.toLong) }
    val spark = pairs.sparkSession
    import spark.implicits._
    levels.toDF("ki", "k_removed")
      .join(census, Seq("ki"), "left")
      .join(eCnt, Seq("ki"), "left")
      .select(col("k_removed"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("n_components"), lit(0L)).as("n_components"),
        coalesce(col("giant_items"), lit(0L)).as("giant_items"),
        when(coalesce(col("n_nodes"), lit(0L)) > 0L,
          expr("(10000 * giant_items) DIV n_nodes"))
          .as("giant_share_bp"))
      .orderBy(col("k_removed").asc)
  }

  /** k-truss census — the EDGE-grain sibling of [[kcore]] (Cohen
    * 2008): repeatedly drop every edge supported by fewer than k−2
    * triangles, keeping only ties embedded in locally dense cliques.
    * Where k-core keeps a node with k loosely-related neighbors, the
    * truss demands the neighbors know EACH OTHER — the community-core
    * read for a co-visit graph (a hub spoke survives the 3-core but
    * no 4-truss). Bounded peel budget like the q277/q300 convention:
    * exactly `iters` support sweeps on both engines, `converged`
    * reports whether the last sweep was already a no-op.
    *
    * Per-round trajectory is the output — the peel curve IS the
    * cohesion read (a graph that sheds 90% of edges in sweep 1 has
    * no truss backbone): one row per round 0..iters with surviving
    * edge/vertex counts, plus min support and convergence on the
    * final round's rows.
    *
    * Scale shape: support is one DEGREE-ORIENTED wedge join per
    * sweep (the triangleStats O(m^1.5) bound — never Σdeg² raw
    * wedges, which a hub item makes quadratic), each triangle
    * exploded back onto its three edges; everything runs at
    * catalog grain, never fact rows; each round is pinned by a lazy
    * localCheckpoint (the kcore 3^iters lineage rule).
    *
    * Columns: round, n_edges, n_vertices, min_support (of the
    * round's surviving edges; NULL when empty), converged (final
    * round only, else NULL). */
  def ktruss(pairs: DataFrame, k: Int = 4, iters: Int = 3,
      minWeight: Long = 1L,
      weightCol: String = "pair_sessions"): DataFrame = {
    require(k >= 3, "k >= 3 (k-2 triangle support)")
    require(iters >= 1 && iters <= 6, "iters in [1,6]")
    // per-edge support via the triangleStats compact-forward
    // orientation (Latapy 2008): edges oriented low→high (deg, id),
    // wedges only from O(√m) out-neighborhoods, each triangle found
    // once at its lowest-rank corner and exploded back onto its 3
    // (id-normalized) edges. A zero-triangle edge gets NO support
    // row, so every census/peel left-joins and coalesces to 0.
    def supportOf(u: DataFrame): (DataFrame, DataFrame) = {
      // EAGERLY checkpointed: THREE consumers per round, and two of
      // them are BROADCAST builds (da/db) — broadcast subtrees cannot
      // deduplicate an unfired lazy checkpoint's lineage (the q352
      // anatomy), so a lazy checkpoint here still ran the endpoint
      // aggregation once per broadcast; eager materializes the tiny
      // node table once and all three consumers read blocks
      val deg = u.select(col("src").as("v"))
        .union(u.select(col("dst").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      // catalog-bounded node table (the triangleStats broadcast rule)
      val da = broadcast(deg.select(col("v").as("src"),
        col("deg").as("dsrc")))
      val db = broadcast(deg.select(col("v").as("dst"),
        col("deg").as("ddst")))
      val oriented = u.join(da, "src").join(db, "dst")
        .select(when(col("dsrc") < col("ddst") ||
            (col("dsrc") === col("ddst") && col("src") < col("dst")),
          struct(col("src").as("os"), col("dst").as("od"),
            col("ddst").as("dd")))
          .otherwise(struct(col("dst").as("os"), col("src").as("od"),
            col("dsrc").as("dd"))).as("o"))
        .select(col("o.os"), col("o.od"), col("o.dd"))
        // checkpointed: the wedge self-join reads it twice and the
        // triangle-closing semi once — materialize the orientation
        // once per round instead of re-running both broadcast joins
        .localCheckpoint(false)
      val tri = oriented.as("e1").join(oriented.as("e2"),
          col("e1.os") === col("e2.os") &&
            (col("e1.dd") < col("e2.dd") ||
              (col("e1.dd") === col("e2.dd") &&
                col("e1.od") < col("e2.od"))))
        .select(col("e1.os").as("u0"), col("e1.od").as("v0"),
          col("e2.od").as("w0"))
        .join(oriented.select(col("os").as("v0"), col("od").as("w0")),
          Seq("v0", "w0"))
      (tri.select(explode(array(
          struct(least(col("u0"), col("v0")).as("src"),
            greatest(col("u0"), col("v0")).as("dst")),
          struct(least(col("u0"), col("w0")).as("src"),
            greatest(col("u0"), col("w0")).as("dst")),
          struct(least(col("v0"), col("w0")).as("src"),
            greatest(col("v0"), col("w0")).as("dst")))).as("e"))
        .select(col("e.src"), col("e.dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("support")),
        deg)
    }
    var und = pairs.filter(col(weightCol) >= minWeight)
      .select(col("item_a").as("src"), col("item_b").as("dst"))
      .distinct()
      .localCheckpoint(false)
    var rows: DataFrame = null
    for (i <- 0 to iters) {
      val (sup, deg) = supportOf(und)
      val withSup = und.join(sup, Seq("src", "dst"), "left")
        .select(col("src"), col("dst"),
          coalesce(col("support"), lit(0L)).as("support"))
        .localCheckpoint(false)
      // n_vertices = |deg| — the degree table supportOf already built
      // over this round's edge set IS the distinct endpoint census; a
      // second union+distinct over withSup (same endpoints: the left
      // join preserves und's edge set) would re-derive it
      val r = withSup
        .agg(count(lit(1)).as("n_edges"), min(col("support")).as("ms"))
        .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
        .select(lit(i.toLong).as("round"), col("n_edges"),
          col("n_vertices"),
          col("ms").as("min_support"),
          if (i == iters)
            (coalesce(col("ms"), lit(Long.MaxValue)) >= (k - 2).toLong ||
              col("n_edges") === 0L).cast("int").as("converged")
          else lit(null).cast("int").as("converged"))
      rows = if (rows == null) r else rows.unionByName(r)
      if (i < iters)
        und = withSup.filter(col("support") >= (k - 2).toLong)
          .select(col("src"), col("dst"))
    }
    rows.orderBy(col("round").asc)
  }
}
