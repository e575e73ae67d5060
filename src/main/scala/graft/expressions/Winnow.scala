package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): polynomial rolling hash over
  * character k-grams, minimum per window of `w` consecutive hashes,
  * distinct minima returned sorted.
  *
  * hash(c₁..c_k) = Σ cᵢ·31^(k-i) mod 1000000007, computed with an O(n)
  * rolling update — one fused pass per row, no intermediate k-gram
  * arrays (the pure-SQL formulation is O(n·k) with three nested lambda
  * layers). Guarantee: any shared substring of length ≥ w+k−1 between
  * two documents yields at least one shared fingerprint.
  *
  * Oracle twin (DuckDB): nested list_transform/list_reduce with the
  * same base/modulus, `list_min` over `hs[j:j+w-1]` slices,
  * `list_sort(list_distinct(...))` — see the q34 oracle SQL.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Long])
    val P = Winnow.Prime
    // B^(k-1) mod P for the rolling removal of the outgoing character
    var powK = 1L
    for (_ <- 1 until k) powK = powK * Winnow.Base % P
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Winnow.Base + (bytes(i) & 0xffL)) % P; i += 1 }
    hashes(0) = h
    while (i < n) {
      val out = (bytes(i - k) & 0xffL) * powK % P
      h = ((h + P - out) % P * Winnow.Base + (bytes(i) & 0xffL)) % P
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

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  val Base = 31L
  val Prime = 1000000007L

  def fingerprints(text: Column, k: Int, w: Int): Column =
    GraftSql.column(Winnow(GraftSql.expression(text), k, w))
}
