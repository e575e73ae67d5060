package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
  * token stream, with the exact twin alongside — the mergeable
  * point-frequency structure for when [[graft.streaming]] -style
  * monitors need "how often has THIS token appeared" without a
  * token-grain state table (Misra–Gries answers "which tokens are
  * big"; CMS answers "how big is this one", for any token).
  *
  * Reference frequency surfaces: the reference's per-key counters
  * (AdStatJob-style running counts, SURVEY.md §2 A4/T5) keep exact
  * per-key state — viable at its MySQL scale, not at a 100 TB token
  * stream. The sketch is the standard swap: d×w counters total,
  * merge = cell-wise add (associative, so partial aggregation and
  * cross-executor merge are free), estimate = min over the d row
  * reads, one-sided error ≤ εN with ε = e/w at confidence 1−e^−d.
  *
  * House portability: row j's bucket = md5 hex chars 2j+1..2j+2 (8
  * bits, w=256) — the [[TextAnalysis.bucketOf]] nibble convention, so
  * the oracle rebuilds every counter bit-for-bit. The verdict table
  * probes the exact top-`topK` tokens: est ≥ exact ALWAYS (structural
  * one-sidedness — a failed row here is a bug, not bad luck) and
  * `bound_ok` reports est − exact ≤ ⌊e·N/w⌋.
  *
  * Scale shape: one corpus pass collapses to (token, cnt) grain with
  * map-side combine; the ×d fan-out happens at DISTINCT-token grain
  * (never the raw stream) and lands on the ≤d·w-row sketch; probes
  * are a topK-row broadcast joined against the d·w-row sketch —
  * everything after the first aggregate is metadata-sized. */
object CountMin {

  val Rows = 4
  val BucketBits = 8
  val Width: Int = 1 << BucketBits

  /** Bucket of `column` for sketch row j: md5 hex chars 2j+1..2j+2. */
  private[graft] def rowBucket(column: String, j: Int): String =
    s"CAST(conv(substring(md5($column), ${2 * j + 1}, 2), 16, 10) AS BIGINT)"

  /** Exact (token, cnt) grain — the ONE corpus pass everything else
    * derives from (map-side combine collapses the raw stream). */
  private def tokenCounts(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(expr(TextAnalysis.TokensExpr)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))

  /** The ×d (row_id, bucket) fan-out of a (tok, …) frame. */
  private def fanOut(frame: DataFrame): DataFrame =
    frame.withColumn("rb", explode(array((0 until Rows).map(j =>
        struct(lit(j).as("row_id"),
          expr(rowBucket("tok", j)).as("bucket"))): _*)))
      .withColumn("row_id", col("rb.row_id"))
      .withColumn("bucket", col("rb.bucket"))
      .drop("rb")

  /** The d×w sketch of the token stream: (row_id, bucket, c). */
  def sketch(docs: DataFrame): DataFrame =
    sketchFromCounts(tokenCounts(docs))

  private def sketchFromCounts(cnts: DataFrame): DataFrame =
    fanOut(cnts).groupBy(col("row_id"), col("bucket"))
      .agg(sum(col("cnt")).as("c"))

  /** Verdict table: the exact top-`topK` tokens vs their CMS
    * estimates. Columns: token, exact_cnt, est_cnt, over_cnt,
    * bound_ok (over ≤ ⌊e·N/w⌋). Persists the (token, cnt) grain —
    * probes, sketch, and total all derive from the one pass (cache
    * ownership per the package convention: the caller's session
    * releases it). */
  def heavyHitterCheck(docs: DataFrame, topK: Int = 20): DataFrame = {
    val cnts = tokenCounts(docs).persist()
    val total = cnts.agg(sum(col("cnt")).as("n_tokens"))
    val probes = cnts
      .orderBy(col("cnt").desc, col("tok").asc).limit(topK)
    val est = fanOut(probes)
      .join(sketchFromCounts(cnts), Seq("row_id", "bucket"))
      .groupBy(col("tok"), col("cnt"))
      .agg(min(col("c")).as("est_cnt"))
    est.crossJoin(broadcast(total))
      .select(col("tok").as("token"), col("cnt").as("exact_cnt"),
        col("est_cnt"),
        (col("est_cnt") - col("cnt")).as("over_cnt"),
        (col("est_cnt") - col("cnt") <=
          floor(lit(2.718281828) * col("n_tokens") / lit(Width))
            .cast("long")).cast("int").as("bound_ok"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
  }
}
