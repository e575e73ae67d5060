package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature in ONE pass over the shingle set.
  *
  * For each shingle `s`: `h = int(md5(s)[0:28 bits])`; the k-th
  * signature component is `min over s of ((2k+1)·h + k) mod P`
  * (P = 1073741789, a prime < 2^30 — products stay far from Long
  * overflow, which matters because the DuckDB oracle errors on BIGINT
  * overflow rather than wrapping).
  *
  * Why an Expression: the built-in formulation is `numHashes`
  * independent `array_min(transform(shingles, s -> md5(k||s)))`
  * columns — `numHashes` md5 calls per shingle and `numHashes`
  * interpreted lambda traversals per row. This computes ONE md5 per
  * shingle and fuses all minima into a single loop: at corpus scale
  * the signature stage is the whole MinHash+LSH bill.
  *
  * Returns null for an empty shingle set (matches `list_min([]) =
  * NULL` per-component in the oracle once `element_at` projects the
  * components).
  *
  * Oracle twin (DuckDB, exact):
  * `list_min(list_transform(shingles, s ->
  *    ((2k+1) * CAST(concat('0x', substr(md5(s),1,7)) AS BIGINT) + k)
  *    % 1073741789))`.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = MinHashSig.digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 28 bits of the md5 == first 7 hex nibbles (oracle twin)
      val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      var k = 0
      while (k < numHashes) {
        val v = ((2L * k + 1L) * h + k) % MinHashSig.Prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // UnaryExpression's default eval handles the null child; CodegenFallback
  // routes codegen through eval (md5 needs MessageDigest, not inline Java).

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val Prime = 1073741789L

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def sig(shingles: Column, numHashes: Int): Column =
    GraftSql.column(MinHashSig(GraftSql.expression(shingles), numHashes))
}
