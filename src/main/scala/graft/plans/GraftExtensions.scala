package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.expressions.DotProductLong

/** Catalyst optimizer rule: rewrite the built-in dot-product
  * formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the fused native expression `graft_dot(a, b)`
  * (DotProductLong) whenever both arrays are `array<bigint>`. Users
  * (and generated SQL) can keep writing the idiomatic higher-order
  * form; plans silently get the single-loop, zero-allocation version.
  *
  * The rewrite is unconditionally sound: DotProductLong implements
  * the built-in chain's null semantics exactly (unequal lengths →
  * null, any null element → null) AND its overflow semantics (ANSI
  * mode → ARITHMETIC_OVERFLOW via checked math, non-ANSI → wrap;
  * `failOnError` is captured from the active SQLConf when the rule
  * fires), so arbitrary user SQL keeps its answers and its errors.
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isMul(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(left, right, mul: LambdaFunction),
          Literal(0L, LongType), merge: LambdaFunction, finish)
        if (left.dataType match {
          case org.apache.spark.sql.types.ArrayType(LongType, _) => true
          case _ => false
        }) && (right.dataType match {
          case org.apache.spark.sql.types.ArrayType(LongType, _) => true
          case _ => false
        }) && isMul(mul) && isSum(merge) && isIdentity(finish) =>
        DotProductLong(left, right)
    }
}

/** Session-extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `spark.experimental.extraOptimizations :+= DotProductFusion` on a
  * live session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => DotProductFusion)
}
