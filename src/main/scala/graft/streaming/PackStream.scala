package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the ingestion-time twin of
  * `TrainingPrep.packSequences`: as documents arrive, each shard
  * appends them to its token stream and assigns the training sequence
  * (`seq_id = start_offset / seqLen`) their first token lands in.
  *
  * State is ONE long per shard (the running token offset) — O(shards),
  * never O(docs); within a micro-batch a shard packs in doc_id order
  * so a replayed batch assigns identically. Offsets only ever grow, so
  * emitted rows are immutable facts (append mode, idempotent sink).
  * At scale, shard count is the same parallelism knob as the batch
  * op's — state and group work stay balanced as long as shards ≥
  * cores.
  */
object PackStream {

  final case class PackedDoc(doc_id: Long, shard: Long, token_count: Long,
      start_offset: Long, seq_id: Long)

  /** The per-shard transition function (exposed for unit tests):
    * fold the batch's docs (doc_id order) over the running offset. */
  def packShard(seqLen: Long)(shard: Long,
      docs: Iterator[(Long, Long, Long)], // (doc_id, shard, token_count)
      state: GroupState[Long]): Iterator[PackedDoc] = {
    var off = state.getOption.getOrElse(0L)
    val out = docs.toSeq.sortBy(_._1).map { case (id, _, tc) =>
      val so = off
      off += tc
      PackedDoc(id, shard, tc, so, so / seqLen)
    }
    state.update(off)
    out.iterator
  }

  /** Pack a streaming documents frame (`doc_id, text, ...`). */
  def packed(docs: DataFrame, shards: Int = 8, seqLen: Long = 2048L): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(expr(graft.ops.TextAnalysis.TokensExpr)).cast("long").as("token_count"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packShard(seqLen))
  }
}
