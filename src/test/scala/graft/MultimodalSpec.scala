package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.tables.Tables

/** Multimodal binary-column plumbing (Multimodal.scala). The codec is
  * a documented deterministic stub; these tests pin the Spark-side
  * contract — schema, frame arithmetic, feature invariants, and the
  * narrow (no-shuffle) decode plan.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.packMedia(Tables(spark, sf, "documents"))

  test("packMedia: binary payload + typed metadata struct") {
    val r = media.filter(col("doc_id") === 0).head()
    val text = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(r.getAs[Array[Byte]]("content").sameElements(text.getBytes("UTF-8")))
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("byte_length") == text.getBytes("UTF-8").length.toLong)
    assert(meta.getAs[Long]("height") ==
      math.ceil(text.getBytes("UTF-8").length / 16.0).toLong)
  }

  test("frameSample: every 4th 64-byte frame, checksums match payload slices") {
    val doc = media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("content"), col("meta.byte_length"))
      .head()
    val id = doc.getLong(0)
    val content = doc.getAs[Array[Byte]](1)
    val frames = Multimodal.frameSample(media)
      .filter(col("doc_id") === id).orderBy(col("frame_idx")).collect()
    val nFrames = math.ceil(content.length / 64.0).toInt
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq ==
      (0 until nFrames by 4).map(_.toLong))
    frames.foreach { f =>
      val idx = f.getAs[Long]("frame_idx").toInt
      val slice = content.slice(idx * 64, math.min((idx + 1) * 64, content.length))
      assert(f.getAs[Long]("frame_bytes") == slice.length.toLong)
    }
  }

  test("decodeFeatures: histogram sums to byte_count, sum matches bytes") {
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == media.count())
    feats.take(20).foreach { f =>
      assert(f.hist.sum == f.byte_count)
      assert(f.hist.length == Multimodal.HistBins)
    }
    // spot-check one doc against a local recompute
    val r = media.filter(col("doc_id") === 1).head()
    val bytes = r.getAs[Array[Byte]]("content").map(_ & 0xff)
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f1.byte_sum == bytes.map(_.toLong).sum)
    assert(f1.byte_count == bytes.length.toLong)
  }

  test("decodeFeatures plan is narrow (no shuffle)") {
    val plan = Multimodal.decodeFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("resizeMedia: every-4th-byte payload with refreshed metadata") {
    val before = media.filter(col("doc_id") === 2).head()
    val after = Multimodal.resizeMedia(media).filter(col("doc_id") === 2).head()
    val orig = before.getAs[Array[Byte]]("content")
    val out = after.getAs[Array[Byte]]("content")
    val expected: Array[Byte] =
      orig.indices.filter(_ % 4 == 0).map(orig(_)).toArray
    assert(out.sameElements(expected))
    val meta = after.getStruct(after.fieldIndex("meta"))
    assert(meta.getAs[Long]("byte_length") == out.length.toLong)
  }
}
