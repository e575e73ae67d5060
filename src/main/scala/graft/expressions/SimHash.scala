package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash signature (up to 32 bits) over a token array, one fused
  * pass per row — NO explode, NO shuffle.
  *
  * Bit j's vote sums ±1 per token by bit `j%4` of md5-hex nibble
  * `j/4`; the signature sets bit j when the vote is ≥ 0 — exactly the
  * arithmetic of the SQL formulation (and its DuckDB oracle twin):
  * `SUM(2 * (FLOOR(nibs[j/4+1] / 2^(j%4)) % 2) - 1)` over
  * `list_distinct` tokens, packed with `1<<j`.
  *
  * The built-in formulation explodes tokens (row blowup ≈ tokens/doc)
  * and shuffles the exploded frame on doc_id for the 32 conditional
  * SUMs; per-row evaluation turns the whole operator into a narrow
  * map — at corpus scale that deletes the only shuffle in the
  * pipeline. Pass `array_distinct(tokens)` as the child to keep the
  * distinct-token semantics.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 32, "bits must be in [1, 32]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    val md = SimHash.digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val q = j / 4 // 0-based hex-nibble index
        val nib =
          if (q % 2 == 0) (d(q / 2) >> 4) & 0xf
          else d(q / 2) & 0xf
        votes(j) += 2 * ((nib >> (j % 4)) & 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def sig(tokens: Column, bits: Int): Column =
    GraftSql.column(SimHash(GraftSql.expression(tokens), bits))
}
