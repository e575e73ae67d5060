package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of all token `n`-grams of a document, fused: one
  * FNV-1a pass per token, then a polynomial combine per window —
  * O(tokens · n) long ops, ZERO string allocation.
  *
  * Why an Expression: the built-in formulation
  * (`transform(sequence(...), i -> array_join(slice(t, i, n), ' '))`
  * then `xxhash64`) materializes every gram as a new string — ~n× the
  * token stream in allocated bytes (≈8× at n=8). At 100 TB the gram
  * stage of substring dedup IS the corpus pass, so the string churn
  * is the bill. This emits the hashes directly; gram strings never
  * exist. The hash only needs gram-equality semantics (it is an
  * INTERNAL key — see Dedup.substringDupSpans, whose oracle joins raw
  * gram strings), so any injective-enough function works; wrapping
  * Java arithmetic is deliberate and ANSI-safe (an Expression, unlike
  * a SQL `aggregate` lambda, does not throw on Long wrap).
  *
  * The space separator is hashed between tokens so `["ab","c"]` and
  * `["a","bc"]` differ, mirroring the `array_join(_, ' ')` gram
  * strings the built-in formulation (and the oracle) would build.
  *
  * Output: array<long> of length `tokens - n + 1` (empty when the
  * document is shorter than `n`).
  */
case class TokenGramHash(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "gram size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_gram_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      th(i) = TokenGramHash.hashToken(
        if (arr.isNullAt(i)) null else arr.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = TokenGramHash.Seed
      var j = i
      while (j < i + n) {
        h = h * TokenGramHash.Mix + th(j)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val cls = TokenGramHash.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $cnt = $a.numElements();
         |int $m = $cnt - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $th = new long[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    $th[$i] = $cls.hashToken(
         |      $a.isNullAt($i) ? null : $a.getUTF8String($i));
         |  }
         |  long[] $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = ${TokenGramHash.Seed}L;
         |    for (int $j = $i; $j < $i + $n; $j++) {
         |      $h = $h * ${TokenGramHash.Mix}L + $th[$j];
         |    }
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenGramHash =
    copy(child = newChild)
}

object TokenGramHash {
  /** Polynomial combine constants (odd multiplier ⇒ bijective mix
    * step mod 2^64; seed ≠ 0 distinguishes prefix grams). */
  val Seed = 1125899906842597L
  val Mix = 1099511628211L

  /** FNV-1a 64 over the token's UTF-8 bytes, then one separator byte
    * (' ') — equivalent to hashing the token with its following
    * space, which keeps token boundaries unambiguous in the combine.
    * A null ELEMENT (the type contract allows containsNull arrays)
    * hashes like the empty token rather than NPEing mid-task. */
  def hashToken(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    if (s != null) {
      val b = s.getBytes
      var i = 0
      while (i < b.length) {
        h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
        i += 1
      }
    }
    (h ^ 0x20L) * 0x100000001b3L
  }

  def grams(tokens: Column, n: Int): Column =
    GraftSql.column(TokenGramHash(GraftSql.expression(tokens), n))
}
