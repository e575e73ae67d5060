package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Morton (Z-order) code: interleave the low 31 bits
  * of two BIGINT columns into one 62-bit key — `a` on even bit
  * positions, `b` on odd. Inputs are masked to 31 bits (`x &
  * 0x7FFFFFFF`), so the result is always non-negative and the
  * expression is total (null only on null input).
  *
  * This is the data-layout primitive behind multi-dimensional file
  * clustering (Morton 1966; the Z-ordering used by lakehouse OPTIMIZE
  * implementations): sorting/range-partitioning a table by
  * `morton(a, b)` co-locates rows that are close in BOTH dimensions,
  * so min/max file statistics prune scans filtered on either column.
  * At 100 TB the intended use is exactly
  * `df.repartitionByRange(N, morton(a, b))` + sortWithinPartitions —
  * the range partitioner samples in parallel, no global sort.
  *
  * Bit-spreading uses the standard 5-step magic-number sequence (one
  * shift+or+mask per doubling), fused into whole-stage codegen — a
  * handful of ALU ops per row, no branches, no allocation.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = MortonCode.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {

  /** Spread the low 31 bits of x across the even bit positions of a
    * 62-bit word (the classic magic-number bit dilation). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** The 62-bit Morton code: a's bits on even positions, b's on odd.
    * Public because generated code calls it. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  /** Column-API entry: `morton(colA, colB)`. */
  def morton(a: Column, b: Column): Column =
    GraftSql.column(MortonCode(GraftSql.expression(a), GraftSql.expression(b)))
}
