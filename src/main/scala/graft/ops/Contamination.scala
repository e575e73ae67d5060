package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set — the standard
  * pre-training hygiene pass (n-gram overlap, GPT-3 appendix C /
  * Llama style) that keeps eval answers out of the training corpus.
  *
  * Scale shape (the reason this is join-shaped and not pairwise): the
  * benchmark side is small by nature (eval suites are MBs, the corpus
  * is TBs), so its distinct gram hashes BROADCAST. The training side
  * is a pure map stage (tokenize → gram → hash) filtered by the
  * broadcast semi-join at the scan — only matched grams, a vanishing
  * fraction, ever reach the one (doc_id, gram-hash) shuffle for the
  * per-doc distinct count. The corpus is never shuffled whole, never
  * self-joined.
  *
  * Grams are 64-bit-hashed INTERNALLY on both join sides (the key
  * never meets the oracle, which joins raw strings); a false hit
  * needs an xxhash64 collision between a train and an eval gram —
  * P < 1e-9 at 1e5 grams, and at 100 TB a collision flags one extra
  * doc, it does not corrupt the kept corpus.
  */
object Contamination {

  /** One row per (doc_id, word n-gram); whitespace tokens via the
    * shared tokenizer so the DuckDB twin reproduces grams exactly.
    * Docs shorter than n tokens contribute nothing (cannot overlap). */
  def wordGrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .withColumn("__t", expr(TextAnalysis.TokensExpr))
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(__t) - ${n - 1}), " +
          s"i -> array_join(slice(__t, i, $n), ' '))")).as("gram"))

  /** One row per (doc_id, 64-bit gram hash) — `wordGrams` without the
    * strings: the fused TokenGramHash expression emits hashes
    * directly (n-grams shorter than n ⇒ empty array ⇒ no rows), so
    * the corpus-side map stage allocates no gram strings at all. */
  def gramHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.expressions.TokenGramHash.grams(
          expr(TextAnalysis.TokensExpr), n)).as("gh"))

  /** Training docs with ≥1 gram overlapping the benchmark set, with
    * the distinct-overlap count (triage signal: 1 hit ≈ idiom, 100
    * hits ≈ verbatim leak). */
  def flagged(train: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val benchGrams = gramHashes(benchmark, n).select(col("gh")).distinct()
    gramHashes(train, n)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_hits"))
  }

  // ---- streaming-safe Bloom gate ----------------------------------
  //
  // A stream can't run the exact join above (doc-grain regroup after
  // a stream-side explode would need unbounded state, and stream-
  // static ANTI join isn't supported), so the ingestion-time gate is
  // the classic runtime-filter shape instead: a Bloom filter over the
  // benchmark gram hashes, probed PER ROW with zero shuffle and zero
  // state. One-sided error only — a contaminated doc is NEVER let
  // through; a false positive drops a clean doc at the configured fpp
  // (1% default), the right trade for a training-data gate. The probe
  // is Spark's own codegen'd BloomFilterMightContain — the expression
  // behind runtime join pruning — not a UDF.

  /** Build the benchmark-side Bloom filter (a broadcast-class object:
    * ~1.2 MB per 1M grams at 1% fpp; size it with `expectedGrams`). */
  def benchBloom(benchmark: DataFrame, n: Int = 8,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): BloomFilter = {
    val grams = gramHashes(benchmark, n)
    // Spark's stat.bloomFilter NPEs on an empty frame (its aggregate
    // returns null) — a benchmark with no long-enough docs is a valid
    // input and must yield the match-nothing filter.
    if (grams.isEmpty) BloomFilter.create(expectedGrams, fpp)
    else grams.stat.bloomFilter("gh", expectedGrams, fpp)
  }

  /** Drop rows whose text shares (by Bloom membership) any word
    * n-gram with the benchmark. Pure projection + filter — safe on
    * batch and streaming frames alike. Null/short texts have no
    * grams and pass through (the quality gates own that judgment). */
  def bloomGate(docs: DataFrame, bloom: BloomFilter, n: Int = 8): DataFrame = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    def mightContain(v: Column): Column = GraftSql.column(
      BloomFilterMightContain(Literal(bytes, BinaryType), GraftSql.expression(v)))
    // null text ⇒ no grams ⇒ must PASS (the quality gates own that
    // judgment), so guard before the expression (whose null in would
    // null the filter predicate and silently drop the row)
    val hashes = when(col("text").isNotNull,
      graft.expressions.TokenGramHash.grams(expr(TextAnalysis.TokensExpr), n))
      .otherwise(typedlit(Seq.empty[Long]))
    docs
      .withColumn("__gh", hashes)
      .filter(!exists(col("__gh"), mightContain))
      .drop("__gh")
  }
}
