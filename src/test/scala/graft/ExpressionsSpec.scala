package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProductLong
import graft.tables.Tables

/** Custom Catalyst expression coverage. */
class ExpressionsSpec extends SparkSpec {

  test("DotProductLong matches the aggregate/zip_with formulation on real embeddings") {
    val q = graft.ops.Similarity.quantized(Tables(spark, sf, "embeddings"))
      .select(col("vec_id"), col("q"))
    val paired = q.as("a").join(q.as("b"),
        col("a.vec_id") % 10 === col("b.vec_id") % 10 &&
          col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        DotProductLong.dot(col("a.q"), col("b.q")).as("native"),
        expr("aggregate(zip_with(a.q, b.q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("builtin"))
    assert(paired.filter(col("native") =!= col("builtin")).count() == 0)
    assert(paired.count() > 0)
  }

  test("DotProductLong null + empty semantics") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(4L, 5L, 6L)),
        |  (array(), array()),
        |  (CAST(NULL AS ARRAY<BIGINT>), array(1L))
        |AS t(a, b)""".stripMargin)
    val out = df.select(DotProductLong.dot(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) == 4L + 10L + 18L)
    assert(out(1).getLong(0) == 0L)
    assert(out(2).isNullAt(0))
  }

  test("DotProductLong overflow semantics track ANSI mode like the built-in chain") {
    val big = spark.sql(
      s"SELECT array(${Long.MaxValue}L) AS a, array(2L) AS b")
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      // ANSI on (Spark 4 default): both formulations must THROW, not wrap
      spark.conf.set("spark.sql.ansi.enabled", "true")
      intercept[Exception] {
        big.select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
          .collect()
      }
      intercept[Exception] {
        big.select(DotProductLong.dot(col("a"), col("b"))).collect()
      }
      // ANSI off: both silently wrap to the same value
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val wrapped = big.select(
        DotProductLong.dot(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("builtin")).head()
      assert(wrapped.getLong(0) == wrapped.getLong(1))
      assert(wrapped.getLong(0) == Long.MaxValue * 2L) // wrapped, not thrown
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("SimHash expression plan is narrow (no explode, no shuffle)") {
    val plan = graft.ops.Dedup.simhash(Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash should not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"simhash should not explode:\n$plan")
  }

  test("Winnow matches the independently-computed oracle fingerprints") {
    val s = spark
    import s.implicits._
    // DuckDB reference for 'abcdefgabcdefg' (k=5, w=4), computed externally
    val got = graft.ops.TextAnalysis.winnowFingerprints(
      Seq((1L, "abcdefgabcdefg")).toDF("doc_id", "text"))
      .select(col("fp")).as[Long].collect().toSeq
    assert(got == Seq(92599395L, 93553700L, 94508005L, 95462303L))
  }

  test("Winnow guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    val s = spark
    import s.implicits._
    val common = "thequickbrownfoxjumps" // length 21 >= 4+5-1
    val docs = Seq(
      (1L, s"xxxx${common}yyyyzzzz11"), (2L, s"abcde${common}fghij22"))
      .toDF("doc_id", "text")
    val fps = graft.ops.TextAnalysis.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("Winnow: short text (< w+k-1 grams) yields no fingerprints") {
    val s = spark
    import s.implicits._
    val got = graft.ops.TextAnalysis.winnowFingerprints(
      Seq((1L, "abcdefg")).toDF("doc_id", "text")).count()
    assert(got == 0L)
  }

  test("DotProductFusion rule rewrites aggregate(zip_with(...)) to graft_dot") {
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        before :+ graft.plans.DotProductFusion
      val q = graft.ops.Similarity.quantized(Tables(spark, sf, "embeddings"))
        .select(col("vec_id"), col("q"))
      val hof = q.select(col("vec_id"),
        expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("n2"))
      val plan = hof.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_dot"), s"rule did not fire:\n$plan")
      // rewritten plan computes the same numbers as the native form
      val native = q.select(col("vec_id"),
        graft.expressions.DotProductLong.dot(col("q"), col("q")).as("n2"))
      assert(hof.orderBy("vec_id").collect().toSeq ==
        native.orderBy("vec_id").collect().toSeq)
    } finally spark.experimental.extraOptimizations = before
  }

  test("custom expressions: interpreted eval agrees with codegen") {
    // Spark silently falls back to interpreted expression evaluation
    // (codegen failure, wide schemas, factoryMode) — a divergence
    // between an expression's eval() and its doGenCode() would corrupt
    // results only on that path. Pin equality over the real tables.
    val docs = Tables(spark, sf, "documents")
    val emb = Tables(spark, sf, "embeddings")
    def outputs(): Seq[Seq[String]] = Seq(
      graft.ops.Dedup.minhashSignature(docs)
        .select(col("doc_id"), col("mh00"), col("mh07"), col("mh15")),
      graft.ops.Dedup.simhash(docs),
      graft.ops.TextAnalysis.winnowFingerprints(docs),
      graft.ops.Similarity.quantized(emb)
        .select(col("vec_id"), DotProductLong.dot(col("q"), col("q")).as("n2")),
      docs.select(col("doc_id"),
        graft.expressions.TokenGramHash.grams(
          expr(graft.ops.TextAnalysis.TokensExpr), 8).as("gh")),
      graft.ops.Layout.zorderCells(
        Tables(spark, sf, "lineitem"), "l_partkey", "l_suppkey")
    ).map(_.collect().map(_.toString).sorted.toSeq)
    val viaCodegen = outputs()
    val ws = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(outputs() == viaCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("TokenGramHash: boundary semantics and string-free equality") {
    import spark.implicits._
    def grams(tokens: Seq[String], n: Int): Seq[Long] =
      Seq(Tuple1(tokens)).toDF("t")
        .select(graft.expressions.TokenGramHash.grams(col("t"), n).as("g"))
        .as[Seq[Long]].head()
    // gram count and window equality
    assert(grams(Seq("a", "b", "c", "d"), 2).length == 3)
    assert(grams(Seq("a", "b"), 3).isEmpty) // shorter than n
    // same gram text ⇒ same hash wherever it occurs
    val g1 = grams(Seq("x", "a", "b"), 2)
    val g2 = grams(Seq("a", "b", "y"), 2)
    assert(g1(1) == g2.head)
    // token boundaries are unambiguous (the array_join(' ') analog):
    // ["ab","c"] must not equal ["a","bc"]
    assert(grams(Seq("ab", "c"), 2).head != grams(Seq("a", "bc"), 2).head)
    // and unlike a naive concat, ["a b"] (one token with a space)
    // differs from the two-token gram too
    assert(grams(Seq("a", "b"), 2).head != grams(Seq("a b"), 1).head)
  }

  test("TokenGramHash participates in WholeStageCodegen") {
    val plan = Tables(spark, sf, "documents")
      .select(graft.expressions.TokenGramHash.grams(
        expr(graft.ops.TextAnalysis.TokensExpr), 8).as("g"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_token_gram_hash")).get
    assert(line.trim.startsWith("*"), s"graft_token_gram_hash not codegen'd:\n$plan")
  }

  test("DotProductLong participates in WholeStageCodegen") {
    val q = graft.ops.Similarity.quantized(Tables(spark, sf, "embeddings"))
    val plan = q.select(DotProductLong.dot(col("q"), col("q")).as("n2"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(dotLine.trim.startsWith("*"), s"graft_dot not codegen'd:\n$plan")
  }

  test("MortonCode: matches a bit-loop reference; masks to 31 bits; null-propagates") {
    import spark.implicits._
    // slow reference: place bit i of a at 2i, of b at 2i+1
    def ref(a: Long, b: Long): Long = {
      val (x, y) = (a & 0x7FFFFFFFL, b & 0x7FFFFFFFL)
      (0 until 31).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    }
    val cases = Seq[(Long, Long)]((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L),
      (5L, 3L), (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (123456789L, 987654321L),
      (1L << 31 | 1L, 0L),   // bit 31 masked off → equals (1, 0)
      (-1L, 0L))             // negative masks to 0x7FFFFFFF
    val got = cases.toDF("a", "b")
      .select(graft.expressions.MortonCode.morton(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
    assert(got(1) == 1L && got(2) == 2L && got(3) == 15L)
    assert(got(9) == got(1)) // the mask pin
    val nulls = Seq((Some(1L), None: Option[Long]), (None: Option[Long], Some(1L)))
      .toDF("a", "b")
      .select(graft.expressions.MortonCode.morton(col("a"), col("b")))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("MortonCode participates in WholeStageCodegen") {
    val plan = Tables(spark, sf, "lineitem")
      .select(graft.expressions.MortonCode.morton(
        col("l_partkey"), col("l_suppkey")).as("z"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_morton")).get
    assert(line.trim.startsWith("*"), s"graft_morton not codegen'd:\n$plan")
  }

  test("Winnow participates in WholeStageCodegen (no CodegenFallback)") {
    // the fingerprint pass is a full corpus scan — a fallback here
    // would also break the codegen span of every enclosing plan
    val plan = graft.ops.TextAnalysis.winnowFingerprints(Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_winnow")).get
    assert(line.trim.startsWith("*"), s"graft_winnow not codegen'd:\n$plan")
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
