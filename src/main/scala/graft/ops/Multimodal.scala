package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media as opaque `binary` columns with typed metadata.
  *
  * The real decode step (JPEG/PNG decode, audio resample, video frame
  * extraction) needs native codec libraries that are NOT part of this
  * engine; `FakeCodec` is a clearly-marked deterministic stand-in so
  * the Spark-side plumbing — schema, partitioning, batch shape, typed
  * Dataset boundary — is real and testable. Swap `FakeCodec` for a
  * JNI/libav-backed implementation to productionize; nothing else
  * changes.
  *
  * Plan shapes (100 TB view):
  *  - `packMedia` / `frameSample` are pure Catalyst expressions
  *    (`substring`/`md5` operate natively on BinaryType) — codegen'd,
  *    no shuffle, stay inside WholeStageCodegen.
  *  - `decodeFeatures` is the genuine per-record imperative step: a
  *    typed `mapPartitions` (one codec init per partition, streamed
  *    iterator — the Scala analog of a batched Pandas UDF). Narrow
  *    transformation: no shuffle; parallelism = input file splits.
  */
object Multimodal {

  val FrameBytes = 64
  val HistBins = 16

  /** Wrap documents as media records: content is the UTF-8 payload as
    * an opaque binary column, media_type assigned deterministically,
    * metadata as a typed struct (not k=v strings — SURVEY §1.4). */
  def packMedia(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull) // a media row without payload is
      // invalid at ingest; dropping here keeps every downstream op and
      // oracle null-free by construction
      .select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("byte_length"),
        md5(col("text").cast("binary")).as("checksum"),
        lit(16L).as("width"),
        ceil(octet_length(col("text").cast("binary")) / 16.0).cast("long").as("height"))
        .as("meta"))

  /** Flat metadata projection (the catalog/statistics view of a media
    * table — reads only metadata, never the payload; at scale this is
    * the column-pruned scan that makes parquet metadata-only queries
    * cheap). */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      col("meta.byte_length").as("byte_length"),
      col("meta.checksum").as("checksum"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** Video frame sampling: split the payload into fixed-size frames and
    * keep every `everyK`-th one. Pure expressions — `substring` and
    * `hex`/`md5` work natively on binary, so this is codegen'd
    * end-to-end.
    *
    * Frame checksum convention: md5 over the UPPERCASE HEX transcript
    * of the frame bytes, not over the raw bytes. A fixed-size byte
    * slice can split a multi-byte UTF-8 code point, and SQL engines'
    * md5 typically accepts only valid strings (DuckDB has no
    * md5(BLOB)) — hex is injective in the bytes and pure ASCII, so
    * the checksum stays byte-faithful AND reproducible in any engine
    * (same portable-hash convention as MinHashSig/SimHash). The
    * whole-payload checksum in [[packMedia]] stays md5 of the raw
    * bytes: a full payload is never a partial code point. */
  def frameSample(media: DataFrame, everyK: Int = 4,
      frameBytes: Int = FrameBytes): DataFrame = {
    val nFrames = ceil(col("meta.byte_length") / lit(frameBytes.toDouble)).cast("int")
    media
      .filter(col("media_type") === "video" && col("meta.byte_length") > 0)
      .select(col("doc_id"), col("content"),
        posexplode(transform(
          sequence(lit(0), nFrames - 1, lit(everyK)),
          i => substring(col("content"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("pos", "frame")))
      .select(
        col("doc_id"),
        (col("pos") * everyK).cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(hex(col("frame"))).as("frame_checksum"))
  }

  /** One decoded record: per-byte "pixel" statistics + a 16-bin
    * intensity histogram. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_count: Long, byte_sum: Long,
      hist: Array[Long])

  /** STUB CODEC — deterministic fake standing in for the real native
    * decoder (image decode / audio PCM / video frames). It treats the
    * payload bytes themselves as the decoded sample stream. The real
    * implementation replaces ONLY this object. */
  object FakeCodec {
    /** "Decode" a payload to its sample stream. Real impl: JPEG→pixels,
      * audio→PCM, video→frame luma. */
    def decode(content: Array[Byte]): Array[Int] =
      content.map(b => b.toInt & 0xff)

    /** Deterministic "resize": keep every k-th sample (real impl:
      * area-average rescale). */
    def resize(samples: Array[Int], k: Int): Array[Int] =
      samples.indices.collect { case i if i % k == 0 => samples(i) }.toArray
  }

  /** Decode + feature-extract over the media table. Typed Dataset
    * boundary: one `mapPartitions` pass, codec state initialized once
    * per partition, rows streamed (never materialized per-partition) —
    * the batch shape a native decoder needs. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (native handles etc.)
        it.map { case (id, mt, content) =>
          val samples = FakeCodec.decode(
            if (content == null) Array.empty[Byte] else content)
          val hist = new Array[Long](HistBins)
          var sum = 0L
          samples.foreach { s => sum += s; hist(s * HistBins / 256) += 1 }
          MediaFeatures(id, mt, samples.length.toLong, sum, hist)
        }
      }
  }

  /** Feature table with the histogram flattened to columns (the shape
    * a downstream trainer or the DuckDB oracle consumes). */
  def mediaFeatures(media: DataFrame): DataFrame = {
    val binCols = (0 until HistBins).map(b =>
      element_at(col("hist"), b + 1).as(f"hist$b%02d"))
    decodeFeatures(media).toDF()
      .select(col("doc_id") +: col("media_type") +: col("byte_count") +:
        col("byte_sum") +: binCols: _*)
  }

  /** Deterministic "resize" (every-k-th-sample) → new payload +
    * refreshed metadata; same typed mapPartitions shape as decode. */
  def resizeMedia(media: DataFrame, k: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val resized = media
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, content) =>
          val out = FakeCodec.resize(FakeCodec.decode(content), k).map(_.toByte)
          (id, mt, out)
        }
      }
      .toDF("doc_id", "media_type", "content")
    resized.select(
      col("doc_id"), col("media_type"), col("content"),
      struct(
        octet_length(col("content")).cast("long").as("byte_length"),
        md5(col("content")).as("checksum"),
        lit(16L).as("width"),
        ceil(octet_length(col("content")) / 16.0).cast("long").as("height"))
        .as("meta"))
  }
}
