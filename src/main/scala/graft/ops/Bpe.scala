package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (tokenizer induction) — the
  * vocabulary-building pass a training pipeline runs BEFORE token
  * counting: learn the top pair merges over the corpus, Sennrich et
  * al. 2016 style.
  *
  * Scale shape (why this is tractable at 100 TB): everything happens
  * at VOCABULARY grain, never corpus grain — the corpus collapses to
  * (word, freq) in one Zipf-friendly aggregation (partial map-side
  * combine does most of the work), and each learning round is then
  * (a) one pair-count shuffle over the vocab, (b) an argmax that
  * plans as TakeOrderedAndProject(1), and (c) a broadcast of the ONE
  * winning rule back into a per-word map stage. Rounds are unrolled
  * symbolically into the plan like `KMeans.fit` — no driver-side
  * loop state beyond plan construction.
  *
  * The merge application is greedy left-to-right (the standard BPE
  * semantics): a fold over the symbol array merges (l, r) whenever
  * the accumulator's last element is `l` and the next symbol is `r`
  * — for runs like "aaa" under rule (a,a) this yields [aa, a], and
  * the oracle reproduces exactly that with island-parity windows.
  * Ties in the argmax break by (count desc, left, right) — ASCII
  * lexicographic, identical in both engines.
  */
object Bpe {

  /** Greedy left-to-right merge of (rl, rr) over `syms`. */
  private val MergeFold =
    """aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) ->
      |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = rl AND x = rr
      |       THEN concat(slice(acc, 1, size(acc) - 1), array(concat(rl, rr)))
      |       ELSE concat(acc, array(x)) END)""".stripMargin

  /** Corpus → (word, freq, syms): the one corpus-grain pass. */
  def vocab(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(explode(expr(TextAnalysis.TokensExpr)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  /** Learn `rounds` merges; returns (round, merge_left, merge_right,
    * pair_count) — one row per learned rule. A degenerate corpus
    * (no multi-symbol words left) simply stops contributing rows. */
  def learn(docs: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds > 0, "rounds must be positive")
    var v = vocab(docs)
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val pairs = v
        // guard: sequence(1, 0) counts DOWN — single-symbol words
        // have no pairs and must be filtered, not exploded
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("merge_left"), col("p.r").as("merge_right"))
        .agg(sum(col("freq")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("merge_left"), col("merge_right"))
        .limit(1)
        .select(lit(r.toLong).as("round"), col("merge_left"),
          col("merge_right"), col("pair_count"))
      out = if (out == null) best else out.unionByName(best)
      if (r < rounds)
        v = v
          .crossJoin(broadcast(best.select(col("merge_left").as("rl"),
            col("merge_right").as("rr"))))
          .withColumn("syms", expr(MergeFold))
          .drop("rl", "rr")
    }
    out
  }

  /** Segment each word of `docs`' vocabulary with an already-learned
    * merge list (the inference half: apply rules in learned order).
    * `merges` must be (round, merge_left, merge_right, ...) as
    * produced by `learn` — vocabulary-sized, collected to drive plan
    * construction (rule count = rounds, a constant). */
  def segment(vocabDf: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(vocabDf) { case (df, (l, r)) =>
      df.withColumn("rl", lit(l)).withColumn("rr", lit(r))
        .withColumn("syms", expr(MergeFold))
        .drop("rl", "rr")
    }
}
