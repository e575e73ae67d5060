package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Integer fixed-point PageRank: hand-computed rounds, dangling
  * redistribution, and the symmetrize helper. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")

  test("symmetric 2-cycle is a fixed point at Scale/n per node") {
    // n=2, deg=1 each: share = .85*5e11, base = .15*5e11 → rank stays
    val out = Graph.pageRank(edges(1L -> 2L, 2L -> 1L), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("dangling node redistributes its mass uniformly (hand-computed)") {
    // A(1)→B(2), B dangling. n=2, r0=5e11 each.
    // r1: base=75e9; dangle=8500*5e11//20000=212.5e9; A's share to B=425e9
    //   A=287.5e9, B=712.5e9 (mass conserved at 1e12)
    // r2: dangle=8500*712.5e9//20000=302.8125e9; share_A=8500*287.5e9//10000=244.375e9
    //   A=377.8125e9, B=622.1875e9
    val r1 = Graph.pageRank(edges(1L -> 2L), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 287500000000L, 2L -> 712500000000L))
    val r2 = Graph.pageRank(edges(1L -> 2L), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 377812500000L, 2L -> 622187500000L))
  }

  test("star hub outranks spokes; topK tie-breaks on item asc") {
    // hub 0 ↔ spokes 1,2,3 (symmetric)
    val e = edges(0L -> 1L, 1L -> 0L, 0L -> 2L, 2L -> 0L, 0L -> 3L, 3L -> 0L)
    val top = Graph.pageRankTopK(e, iters = 3, k = 4)
      .as[(Long, Long)].collect().toSeq
    assert(top.head._1 == 0L)
    assert(top.map(_._1) == Seq(0L, 1L, 2L, 3L)) // spoke tie → id asc
    assert(top(1)._2 == top(2)._2 && top(2)._2 == top(3)._2)
    assert(top.head._2 > top(1)._2)
  }

  test("duplicate edges collapse; ranks are repartition-invariant") {
    val base = Seq(1L -> 2L, 1L -> 2L, 2L -> 1L)
    val a = Graph.pageRank(edges(base: _*), iters = 2)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges(base: _*).repartition(7), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("assumeNoDangling path agrees with the full path on a symmetric graph") {
    val e = edges(0L -> 1L, 1L -> 0L, 0L -> 2L, 2L -> 0L, 1L -> 2L, 2L -> 1L)
    val full = Graph.pageRank(e, iters = 3).as[(Long, Long)].collect().toMap
    val fast = Graph.pageRank(e, iters = 3, assumeNoDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(full == fast)
  }

  test("symmetric() filters by weight and emits both directions") {
    val pairs = Seq((1L, 2L, 3L), (2L, 3L, 1L))
      .toDF("item_a", "item_b", "pair_sessions")
    val got = Graph.symmetric(pairs, minWeight = 2L)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  private def pairsDf(rows: (Long, Long, Long)*) =
    rows.toDF("item_a", "item_b", "pair_sessions")

  test("triangleStats: hand-computed census on triangle + pendant edge") {
    // triangle {1,2,3} plus pendant 3–4: deg 2,2,3,1
    val got = Graph.triangleStats(pairsDf(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))).collect().head
    assert(got.getAs[Long]("n_nodes") == 4L)
    assert(got.getAs[Long]("n_edges") == 4L)
    assert(got.getAs[Long]("max_deg") == 3L)
    assert(got.getAs[Long]("n_wedges") == 5L)     // 1+1+C(3,2)+0
    assert(got.getAs[Long]("n_triangles") == 1L)
    assert(got.getAs[Long]("global_cc_bp") == 6000L) // ⌊10000·3/5⌋
  }

  test("triangleStats: minWeight prunes the pendant; a pure triangle has cc 10000") {
    val got = Graph.triangleStats(pairsDf(
      (1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L), (3L, 4L, 1L)),
      minWeight = 2L).collect().head
    assert(got.getAs[Long]("n_nodes") == 3L && got.getAs[Long]("n_edges") == 3L)
    assert(got.getAs[Long]("n_triangles") == 1L)
    assert(got.getAs[Long]("global_cc_bp") == 10000L)
  }

  test("triangleStats: K4 counts all 4 triangles once each (degree ties everywhere)") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b, 1L)
    val got = Graph.triangleStats(pairsDf(k4: _*)).collect().head
    assert(got.getAs[Long]("n_triangles") == 4L)
    assert(got.getAs[Long]("n_wedges") == 12L)    // 4·C(3,2)
    assert(got.getAs[Long]("global_cc_bp") == 10000L)
  }

  test("triangleStats: empty edge set reports zeros, no division error") {
    val got = Graph.triangleStats(pairsDf((1L, 2L, 1L)), minWeight = 5L)
      .collect().head
    assert(got.getAs[Long]("n_nodes") == 0L && got.getAs[Long]("n_edges") == 0L)
    assert(got.getAs[Long]("n_triangles") == 0L &&
      got.getAs[Long]("global_cc_bp") == 0L)
  }

  test("pageRankWeighted: one hand-computed round; heavy edge carries more mass") {
    // 1↔2 (w 9), 1↔3 (w 1): node 1 splits its mass 90/10
    val e = Seq((1L, 2L, 9L), (2L, 1L, 9L), (1L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r1 = Graph.pageRankWeighted(e, iters = 1)
      .as[(Long, Long)].collect().toMap
    // r0 = ⌊1e12/3⌋; t = ⌊8500·r0/10000⌋ = 283333333333; base =
    // ⌊1500·333333333333/10000⌋ = 49999999999
    assert(r1 == Map(
      1L -> 616666666665L, // base + t(from 2) + t(from 3)
      2L -> 304999999998L, // base + ⌊t·9/10⌋
      3L -> 78333333332L)) // base + ⌊t·1/10⌋
    val r3 = Graph.pageRankWeighted(e, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3(2L) > r3(3L)) // the weight preference persists
  }

  test("personalizedPageRank: restart mass pinned to the hub seed (hand round)") {
    // star 0 ↔ {1,2,3}: seed 0 (deg 3); all mass starts at the seed
    val e = edges(0L -> 1L, 1L -> 0L, 0L -> 2L, 2L -> 0L, 0L -> 3L, 3L -> 0L)
    val r1 = Graph.personalizedPageRank(e, iters = 1)
      .as[(Long, Long)].collect().toMap
    // seed keeps only the teleport slice; spokes split the walk mass
    assert(r1 == Map(0L -> 150000000000L,
      1L -> 283333333333L, 2L -> 283333333333L, 3L -> 283333333333L))
    // vs UNIFORM pagerank the seed's neighborhood is strictly favored:
    // a 5-node chain 0-1-2-3-4 ranks node 1 (next to hub... here all
    // symmetric) — instead pin that teleport NEVER lands off-seed:
    val r2 = Graph.personalizedPageRank(e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2.values.sum <= Graph.Scale) // floor dust only, no leak
    assert(r2(0L) > r2(1L)) // round 2 returns walk mass to the seed
  }

  test("degreeAssortativity: star is perfectly disassortative; regular graph is null") {
    val star = pairsDf((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L))
    val r = Graph.degreeAssortativity(star).collect().head
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("max_deg") == 3L)
    assert(r.getAs[Long]("assortativity_bp") == -10000L)
    val k3 = Graph.degreeAssortativity(
      pairsDf((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))).collect().head
    assert(k3.isNullAt(3)) // all degrees equal: variance 0, undefined
  }

  /** Symmetric path 1–2–3–4–5: degrees (1,2,2,2,1); the seed is the
    * lowest-id max-degree node = 2. */
  private def pathEdges = edges(
    1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
    3L -> 4L, 4L -> 3L, 4L -> 5L, 5L -> 4L)

  test("bfsReach: hand-computed hops on a path; deg-desc id-asc seed") {
    val got = Graph.bfsReach(pathEdges, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 0L, 1L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("bfsReach: maxHops truncates the reach") {
    val got = Graph.bfsReach(pathEdges, maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 0L, 1L -> 1L, 3L -> 1L))
  }

  test("componentSizes: min-labeled components, weight pruning, size-desc order") {
    val got = Graph.componentSizes(pairsDf(
      (2L, 3L, 2L), (1L, 2L, 2L), (5L, 6L, 2L), (7L, 8L, 1L)),
      minWeight = 2L)
      .as[(Long, Long)].collect().toSeq
    // {1,2,3} labeled by its min, {5,6}; the weight-1 edge is pruned
    assert(got == Seq((1L, 3L), (5L, 2L)))
  }

  test("bfsReach: disconnected component stays unreached; cycles don't relabel") {
    // triangle {1,2,3} (all deg 2, seed = 1) + far component {10,11}
    val e = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 10L)
    val got = Graph.bfsReach(e, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    // min-hop: the cycle revisits 1 at hop 2 but the anti-join drops it
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("labelProp: weak bridge keeps two dense sides in separate communities (CC merges them)") {
    // two weight-3 triangles joined by a weight-1 bridge 3–5
    val pairs = pairsDf(
      (1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L),
      (5L, 6L, 3L), (5L, 7L, 3L), (6L, 7L, 3L),
      (3L, 5L, 1L))
    val got = Graph.labelProp(pairs, rounds = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (5L, 3L)))
    // the contrast claim: connected components see ONE island
    val cc = Graph.componentSizes(pairs).as[(Long, Long)].collect().toSeq
    assert(cc == Seq((1L, 6L)))
  }

  test("labelProp: fixed round budget is deterministic under synchronous oscillation") {
    // a star oscillates under synchronous sweeps; 4 rounds pins the
    // even-sweep state — same answer every run and in the oracle
    val pairs = pairsDf((10L, 1L, 5L), (10L, 2L, 1L))
    val got = Graph.labelProp(pairs, rounds = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (10L, 1L)))
  }

  test("ktruss: K4 survives the 4-truss, a pendant triangle and bridge peel off") {
    // K4 {1,2,3,4} (every edge support 2) + triangle {7,8,9}
    // (support 1) + bridge 4–7 (support 0)
    val pairs = pairsDf(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (2L, 3L, 1L),
      (2L, 4L, 1L), (3L, 4L, 1L),
      (7L, 8L, 1L), (7L, 9L, 1L), (8L, 9L, 1L),
      (4L, 7L, 1L))
    val got = Graph.ktruss(pairs, k = 4, iters = 2)
      .as[(Long, Long, Long, Option[Long], Option[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 10L, 7L, Some(0L), None),
      (1L, 6L, 4L, Some(2L), None),
      (2L, 6L, 4L, Some(2L), Some(1))))
  }

  test("ktruss: an exhausted sweep budget reports converged = 0") {
    // triangle strip 1-2-3-4-5: sweep 1 leaves (2,3),(3,4) with
    // support 0 — a second sweep would peel them, but iters = 1
    val pairs = pairsDf(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L),
      (3L, 4L, 1L), (3L, 5L, 1L), (4L, 5L, 1L))
    val got = Graph.ktruss(pairs, k = 4, iters = 1)
      .as[(Long, Long, Long, Option[Long], Option[Int])].collect().toSeq
    assert(got == Seq(
      (0L, 7L, 5L, Some(1L), None),
      (1L, 2L, 3L, Some(0L), Some(0))))
  }

  test("hubKnockout: removing the star hub frees the side pair; deterministic hub rank") {
    val s2 = spark
    import s2.implicits._
    // star 1-{2,3,4} plus an independent pair 5-6
    val pairs = Seq((1L, 2L, 3L), (1L, 3L, 3L), (1L, 4L, 3L),
      (5L, 6L, 3L)).toDF("item_a", "item_b", "pair_sessions")
    val got = Graph.hubKnockout(pairs, Seq(0, 1, 2), minWeight = 1L)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      // intact: giant is the 4-node star (6666bp of 6 nodes)
      (0L, 6L, 4L, 2L, 4L, Some(6666L)),
      // hub 1 (deg 3) removed: its leaves isolate and drop; 5-6 stays
      (1L, 2L, 1L, 1L, 2L, Some(10000L)),
      // next hub by (deg desc, id asc) is leaf 2 — already isolated,
      // so the census is unchanged
      (2L, 2L, 1L, 1L, 2L, Some(10000L))))
  }
}
