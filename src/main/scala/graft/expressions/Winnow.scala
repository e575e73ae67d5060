package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): polynomial rolling hash over
  * byte k-grams of the UTF-8 text, minimum per window of `w`
  * consecutive hashes, distinct minima returned sorted.
  *
  * hash(c₁..c_k) = Σ cᵢ·31^(k-i) mod 1000000007, computed with an O(n)
  * rolling update — one fused pass per row, no intermediate k-gram
  * arrays (the pure-SQL formulation is O(n·k) with three nested lambda
  * layers). Guarantee: any shared substring of length ≥ w+k−1 between
  * two documents yields at least one shared fingerprint.
  *
  * Codegen: the kernel lives in [[Winnow.compute]] and BOTH paths call
  * it — interpreted eval directly, generated code as a static call —
  * so the expression stays inside WholeStageCodegen (the fingerprint
  * pass is a full corpus scan at 100 TB; a CodegenFallback here would
  * break the codegen span of every plan it appears in) with zero risk
  * of eval/codegen drift.
  *
  * Oracle twin (DuckDB): nibble-parse hex(encode(text)) to the byte
  * stream, nested list_transform/list_reduce with the same
  * base/modulus, `list_min` over `hs[j:j+w-1]` slices,
  * `list_sort(list_distinct(...))` — see the q34 oracle SQL.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = Winnow.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  val Base = 31L
  val Prime = 1000000007L

  /** The O(n) winnowing kernel over the string's UTF-8 bytes. Static
    * so generated code can call it — keep the signature stable, it is
    * referenced from codegen as a fully-qualified static call. */
  def compute(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val P = Prime
    // B^(k-1) mod P for the rolling removal of the outgoing byte
    var powK = 1L
    var b = 1
    while (b < k) { powK = powK * Base % P; b += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xffL)) % P; i += 1 }
    hashes(0) = h
    while (i < n) {
      val out = (bytes(i - k) & 0xffL) * powK % P
      h = ((h + P - out) % P * Base + (bytes(i) & 0xffL)) % P
      hashes(i - k + 1) = h
      i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= nGrams - w) {
      var m = hashes(j)
      var x = j + 1
      while (x < j + w) { if (hashes(x) < m) m = hashes(x); x += 1 }
      fps.add(m)
      j += 1
    }
    val arr = new Array[Long](fps.size)
    val it = fps.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  def fingerprints(text: Column, k: Int, w: Int): Column =
    GraftSql.column(Winnow(GraftSql.expression(text), k, w))
}
