package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingestion: the file formats a training-data pipeline
  * actually receives — JSONL dumps and one-document-per-file text
  * trees — normalized to the engine's `documents` schema
  * (`doc_id, text, lang, source, n_chars`).
  *
  * Scale notes: both readers are splittable scans (JSONL lines split
  * per-file block; text files parallelize per file), schemas are
  * EXPLICIT (schema inference reads the whole input twice at 100 TB),
  * and malformed JSONL rows are captured per-row instead of failing
  * the job — at a billion documents there WILL be corrupt lines, and
  * a quarantine column beats a dead 1000-executor stage. Gzipped
  * inputs work transparently but are NOT splittable — at scale,
  * re-chunk .gz dumps to ≤ a few hundred MB per file upstream.
  */
object DocFiles {

  /** What a JSONL corpus dump carries per line. `id` may be absent —
    * a deterministic one is minted from the content hash. */
  val JsonlSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL corpus (possibly .gz) into the documents schema.
    * Malformed lines land in `corrupt_record` with everything else
    * null — filter or quarantine downstream, the scan never fails. */
  def readJsonl(spark: SparkSession, path: String,
      defaultSource: String = "jsonl"): DataFrame =
    spark.read
      .schema(JsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .select(
        // content-hash id when the dump has none: deterministic,
        // collision-safe at corpus scale (64-bit over distinct texts),
        // and stable across re-reads — re-ingestion dedups exactly.
        // Only for NON-NULL text: xxhash64(NULL) is the constant seed
        // (42), so id-less corrupt lines would all collide on 42 and
        // could shadow a legitimate doc — they keep a null doc_id and
        // quarantine on corrupt_record instead.
        coalesce(col("id"),
          when(col("text").isNotNull, xxhash64(col("text")))).as("doc_id"),
        col("text"),
        col("lang"),
        coalesce(col("source"), lit(defaultSource)).as("source"),
        length(col("text")).cast("long").as("n_chars"),
        // a syntactically VALID line with no text is still not a
        // document — flag it so the standard corrupt_record-not-null
        // quarantine catches both failure shapes (malformed JSON keeps
        // its raw line; a text-less record gets a sentinel)
        coalesce(col("_corrupt"),
          when(col("text").isNull, lit("__missing_text__")))
          .as("corrupt_record"))

  /** Read a one-document-per-file text tree (`wholetext`): each file
    * becomes one row, the relative path is the source. Language is
    * unknown at ingest — downstream `TextAnalysis.langId` fills it. */
  def readTextTree(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(path)
      .select(
        xxhash64(col("value")).as("doc_id"),
        col("value").as("text"),
        lit(null).cast("string").as("lang"),
        regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("source"),
        length(col("value")).cast("long").as("n_chars"))
}
