package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product: Σ a[i]·b[i] over two
  * `array<bigint>` columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0L, (acc,v) -> acc+v)` allocates an intermediate array and
  * evaluates two lambda chains per row pair; in the kNN inner loop
  * (corpus × queries) that is THE hot path at scale. This expression
  * generates a single fused loop — no allocation, no virtual calls —
  * and stays inside WholeStageCodegen.
  *
  * Null semantics match the built-in formulation EXACTLY (so the
  * DotProductFusion rewrite is sound on arbitrary user queries, not
  * just fixed-dimension embeddings): unequal lengths → null (zip_with
  * pads with null, nulling the sum), and any null element in either
  * array → null. Overflow semantics match too: under ANSI mode
  * (`spark.sql.ansi.enabled`, Spark 4's default) the built-in
  * Multiply/Add throw ARITHMETIC_OVERFLOW, so `failOnError` (captured
  * from the session conf at construction) makes this expression throw
  * the same error via MathUtils.*Exact; with ANSI off both wrap.
  */
case class DotProductLong(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with pads → null sum
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (failOnError) {
        s = MathUtils.addExact(s, MathUtils.multiplyExact(x.getLong(i), y.getLong(i)))
      } else {
        s += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val mu = MathUtils.getClass.getName.stripSuffix("$")
      val acc =
        if (failOnError)
          s"$s = $mu.addExact($s, $mu.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$s += $a.getLong($i) * $b.getLong($i);"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  /** Column-API entry: `dot(colA, colB)`. */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(DotProductLong(GraftSql.expression(a), GraftSql.expression(b)))
}
