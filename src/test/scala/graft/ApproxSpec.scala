package graft

import org.apache.spark.sql.functions.{col, countDistinct}

/** Aggregation extensions: approx-distinct accuracy bound. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact at rsd 1.5%") {
    val ord = graft.tables.Tables(spark, sf, "orders")
    val exact = ord.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Percentiles.approxDistinct(ord, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approx median tracks the exact histogram median per group") {
    val li = graft.tables.Tables(spark, sf, "lineitem")
    val exact = graft.ops.Percentiles.medianCents(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Percentiles.approxMedianCents(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // sketch quantile definitions differ from the rank-midpoint by at
      // most one value step on a discrete domain; quantity steps are
      // whole units (100 cents)
      assert(math.abs(a - e) <= 100, s"$k: approx $a vs exact $e")
    }
  }

  test("activeUsers sketch path tracks exact WAU; checked gate verdicts hold") {
    val ev = graft.tables.Tables(spark, sf, "events")
    val exact = graft.ops.Retention.activeUsers(ev, 7)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau")))).toMap
    val sk = graft.ops.Retention.activeUsers(ev, 7, exact = false)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("wau")).toMap
    exact.foreach { case (d, (_, w)) =>
      assert(math.abs(sk(d) - w).toDouble / w <= 0.05,
        s"$d: sketch wau ${sk(d)} vs exact $w")
    }
    // checked gate: exact columns reproduce the exact path; verdicts 1
    val checked = graft.ops.Retention.activeUsersChecked(ev, 7).collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val d = r.getString(0)
      assert((r.getAs[Long]("dau"), r.getAs[Long]("wau")) == exact(d))
      assert(r.getAs[Int]("sketch_ok") == 1, s"$d sketch out of bound")
    }
  }

  test("sourceDatacard sketch path tracks exact distincts; checked gate verdicts hold") {
    val docs = graft.tables.Tables(spark, sf, "documents")
    val exact = graft.ops.Profile.sourceDatacard(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_distinct_texts"), r.getAs[Long]("n_langs")))).toMap
    val sk = graft.ops.Profile.sourceDatacard(docs, exact = false)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_distinct_texts"), r.getAs[Long]("n_langs")))).toMap
    exact.foreach { case (src, (t, l)) =>
      val (ta, la) = sk(src)
      assert(math.abs(ta - t).toDouble / math.max(t, 1L) <= 0.05,
        s"$src: sketch texts $ta vs exact $t")
      assert(math.abs(la - l).toDouble / math.max(l, 1L) <= 0.05,
        s"$src: sketch langs $la vs exact $l")
    }
    val checked = graft.ops.Profile.sourceDatacardChecked(docs).collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val src = r.getString(0)
      assert((r.getAs[Long]("n_distinct_texts"), r.getAs[Long]("n_langs"))
        == exact(src))
      assert(r.getAs[Int]("texts_sketch_ok") == 1, s"$src texts out of bound")
      assert(r.getAs[Int]("langs_sketch_ok") == 1, s"$src langs out of bound")
    }
  }
}
