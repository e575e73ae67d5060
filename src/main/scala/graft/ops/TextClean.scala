package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text cleaning: intra-document repetition removal and
  * PII scrubbing — the per-document rewrite stages that sit between
  * dedup and tokenization in a corpus pipeline (the Gopher/RefinedWeb
  * "repetitious content" and redaction rules).
  *
  * Both are PURE MAP stages: no shuffle, no state, embarrassingly
  * parallel over whatever partitioning the scan produced — the ideal
  * 100 TB shape. Everything is built-in higher-order functions and
  * regexp built-ins, so the whole stage stays inside whole-stage
  * codegen.
  */
object TextClean {

  /** Remove repeated "lines" within each document, where a line is a
    * run of `lineTokens` consecutive tokens (the corpus has no
    * newlines; fixed token windows are the line analog). The FIRST
    * occurrence of each distinct line survives, order preserved —
    * exactly the classic repeated-line filter.
    *
    * Output: doc_id, n_lines, n_kept, removed_bp (basis points of
    * lines dropped), cleaned (the re-joined text). Null text rows
    * pass through with null stats.
    */
  def dedupLines(docs: DataFrame, lineTokens: Int = 10): DataFrame = {
    require(lineTokens >= 1, "lineTokens must be >= 1")
    val L = lineTokens
    docs
      .withColumn("__tokens", expr("split(text, ' ')"))
      // split never yields an empty array (worst case ['']), so
      // n_lines >= 1 whenever text is non-null and sequence() below
      // never sees a start > stop (which would generate DESCENDING).
      .withColumn("__n_lines",
        expr(s"CAST(ceil(size(__tokens) / $L.0) AS BIGINT)"))
      .withColumn("__chunks", expr(
        s"""CASE WHEN text IS NULL THEN NULL ELSE
           |  transform(sequence(0, __n_lines - 1),
           |    i -> concat_ws(' ', slice(__tokens, i * $L + 1, $L)))
           |END""".stripMargin))
      .withColumn("__kept",
        expr("filter(__chunks, (c, i) -> array_position(__chunks, c) = i + 1)"))
      .select(
        col("doc_id"),
        col("__n_lines").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("__n_lines") - size(col("__kept"))) / col("__n_lines"))
            .cast("long"))
          .as("removed_bp"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", col("__kept"))).as("cleaned"))
  }

  /** Cross-document boilerplate detection: the top-k "lines" (token
    * windows, [[dedupLines]]'s line analog) appearing in at least
    * `minDocs` DISTINCT documents of the same source — navigation
    * chrome, cookie banners, license headers: template text a
    * per-document repetition filter can never see because each doc
    * carries it once. The output is the actionable removal list a
    * RefinedWeb-style pipeline feeds back as a deny-list.
    *
    * Per-doc `array_distinct` before the explode makes the count a
    * distinct-doc count with a PLAIN count(*) — no count_distinct
    * Expand at the line grain.
    *
    * Scale shape: chunking is the same pure map as dedupLines; the
    * exploded stream partial-aggregates map-side onto the (source,
    * line) grain (boilerplate is by definition low-cardinality
    * relative to the corpus — it repeats); the `minDocs` gate cuts
    * the unique-line long tail BEFORE the top-k window, and the
    * grouped top-k plans as WindowGroupLimit (rank cut ahead of the
    * sort exchange). */
  def boilerplateLines(docs: DataFrame, lineTokens: Int = 10,
      minDocs: Long = 2L, k: Int = 5): DataFrame = {
    require(lineTokens >= 1, "lineTokens must be >= 1")
    val L = lineTokens
    val lines = docs
      .filter(col("text").isNotNull)
      .withColumn("__tokens", expr("split(text, ' ')"))
      .withColumn("__n_lines",
        expr(s"CAST(ceil(size(__tokens) / $L.0) AS BIGINT)"))
      .select(col("source"), explode(array_distinct(expr(
        s"""transform(sequence(0, __n_lines - 1),
           |  i -> concat_ws(' ', slice(__tokens, i * $L + 1, $L)))"""
          .stripMargin))).as("line"))
      .groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("n_docs").desc, col("line").asc)
    lines.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("line"), col("n_docs"))
  }

  /** The actionable half of [[boilerplateLines]] (q78's
    * detect-then-remove pattern at LINE grain): every token-window
    * occurring in ≥ `minDocs` distinct docs of its source is DROPPED
    * from every document carrying it, and the survivors re-join in
    * original order. What per-doc dedupLines can't remove (each doc
    * carries the template once) this does.
    *
    * Contract notes: null-text docs are excluded (q123's base);
    * a fully-boilerplate doc emits `cleaned = ''` (empty string, not
    * NULL — the q78 pin) with n_kept 0.
    *
    * Scale shape: the deny set is the (source, line) aggregate
    * bounded by REPEATED lines (boilerplate is low-cardinality by
    * definition); the occurrence stream joins it on (source, line) —
    * AQE broadcasts the deny side when it fits, shuffles on the line
    * key when not — and docs reassemble with ONE doc-grain aggregate
    * ordered by the carried position. */
  def boilerplateScrub(docs: DataFrame, lineTokens: Int = 10,
      minDocs: Long = 2L): DataFrame = {
    require(lineTokens >= 1, "lineTokens must be >= 1")
    val L = lineTokens
    val base = docs
      .filter(col("text").isNotNull)
      .withColumn("__tokens", expr("split(text, ' ')"))
      .withColumn("__n_lines",
        expr(s"CAST(ceil(size(__tokens) / $L.0) AS BIGINT)"))
      .withColumn("__chunks", expr(
        s"""transform(sequence(0, __n_lines - 1),
           |  i -> concat_ws(' ', slice(__tokens, i * $L + 1, $L)))"""
          .stripMargin))
    val deny = base
      .select(col("source"), explode(array_distinct(col("__chunks"))).as("line"))
      .groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minDocs)
      .select(col("source"), col("line"), lit(1).as("__deny"))
    val kept = base
      .select(col("doc_id"), col("source"), col("__n_lines"),
        posexplode(col("__chunks")).as(Seq("pos", "line")))
      .join(deny, Seq("source", "line"), "left")
      .filter(col("__deny").isNull)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("cleaned"))
    base.select(col("doc_id"), col("source"), col("__n_lines").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .withColumn("removed_bp",
        floor(lit(10000.0) * (col("n_lines") - col("n_kept")) / col("n_lines"))
          .cast("long"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, Table A1) —
    * the signals a quality filter thresholds on, reported per
    * document instead of applied as removal:
    *
    *  - dup_line_bp: fraction of lines that are repeats of an earlier
    *    line (lines = `lineTokens` token windows, as [[dedupLines]]);
    *  - dup_line_char_bp: fraction of text characters sitting inside
    *    those repeated line instances (sum of (count-1) x len over
    *    distinct lines, against total text length);
    *  - top_bigram / top_bigram_bp: the most frequent word bigram
    *    (lexicographically smallest on count ties) and the fraction
    *    of characters its occurrences cover.
    *
    * Pure per-row higher-order functions — zero shuffle. The per-row
    * cost of the bigram mode is O(distinct x n) ≈ 10k comparisons on
    * a 100-token doc, still cheaper than one md5 per shingle in the
    * dedup pipeline.
    */
  def repetitionMetrics(docs: DataFrame, lineTokens: Int = 2): DataFrame = {
    require(lineTokens >= 1, "lineTokens must be >= 1")
    val L = lineTokens
    docs
      .withColumn("__tokens", expr("split(text, ' ')"))
      .withColumn("__n_lines",
        expr(s"CAST(ceil(size(__tokens) / $L.0) AS BIGINT)"))
      .withColumn("__lines", expr(
        s"""transform(sequence(0, __n_lines - 1),
           |  i -> concat_ws(' ', slice(__tokens, i * $L + 1, $L)))""".stripMargin))
      .withColumn("__dlines", expr("array_distinct(__lines)"))
      .withColumn("__bigrams", expr(
        """CASE WHEN size(__tokens) >= 2 THEN
          |  transform(sequence(1, size(__tokens) - 1),
          |    i -> concat_ws(' ', element_at(__tokens, i), element_at(__tokens, i + 1)))
          |ELSE array() END""".stripMargin))
      // mode of the bigram array in ONE O(n) fold over the SORTED
      // array (higher-order functions are interpreted, so the naive
      // per-distinct filter is O(distinct × n) per row — measured 3.2 s
      // over sf0.1 vs ~0.4 s for this fold). Sorting makes equal
      // bigrams adjacent (count = run length) and ascending, so the
      // FIRST run to reach the maximum is the lexicographically
      // smallest winner — a strictly-greater update implements the
      // min-on-tie rule for free.
      .withColumn("__mode", expr(
        """aggregate(array_sort(__bigrams),
          |  named_struct('cur', CAST(NULL AS STRING), 'curc', 0L,
          |               'best', CAST(NULL AS STRING), 'bestc', 0L),
          |  (acc, x) -> named_struct(
          |    'cur', x,
          |    'curc', IF(acc.cur IS NOT NULL AND x = acc.cur, acc.curc + 1, 1L),
          |    'best', IF(IF(acc.cur IS NOT NULL AND x = acc.cur, acc.curc + 1, 1L) > acc.bestc,
          |               x, acc.best),
          |    'bestc', GREATEST(IF(acc.cur IS NOT NULL AND x = acc.cur, acc.curc + 1, 1L),
          |                      acc.bestc)))""".stripMargin))
      .withColumn("__maxc", expr("IF(__mode.bestc = 0, CAST(NULL AS BIGINT), __mode.bestc)"))
      .withColumn("__top", col("__mode.best"))
      .select(
        col("doc_id"),
        col("__n_lines").as("n_lines"),
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (col("__n_lines") - size(col("__dlines"))) / col("__n_lines"))
            .cast("long"))
          .as("dup_line_bp"),
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) *
            (expr("aggregate(__lines, 0L, (a, x) -> a + length(x))") -
              expr("aggregate(__dlines, 0L, (a, x) -> a + length(x))")) /
            length(col("text"))).cast("long"))
          .as("dup_line_char_bp"),
        col("__top").as("top_bigram"),
        when(col("text").isNull || col("__maxc").isNull, lit(null).cast("long"))
          .otherwise(floor(lit(10000.0) * col("__maxc") * length(col("__top")) /
            length(col("text"))).cast("long"))
          .as("top_bigram_bp"))
  }

  /** Deny-listed sensitive terms (exact word match). */
  val PiiTerms: Seq[String] = Seq("customer", "account", "ssn")

  /** Combined PII pattern: emails, long digit runs, deny-list words.
    * Restricted to a regex subset (character classes, {n,}, \b,
    * alternation) whose semantics are identical in Java regex (Spark)
    * and RE2 (DuckDB/production scanners) — portability is the point:
    * a scrub rule that matches differently per engine is a leak.
    *
    * KNOWN EDGE (EdgeCasesSpec-pinned): `\b`'s word-char set is
    * Unicode in Java but ASCII in RE2, so a deny term flush against a
    * non-ASCII word char ("ssn身份证") matches in RE2 only; the
    * engine's Java no-match is the house semantics. RE2 has no
    * lookarounds, so an explicit-ASCII-boundary rewrite would have to
    * CONSUME the boundary chars — changing match extents and dropping
    * back-to-back terms — a worse trade than the documented edge. */
  val PiiPattern: String =
    s"([a-z0-9._]+@[a-z0-9.]+|[0-9]{7,}|\\b(${PiiTerms.mkString("|")})\\b)"

  /** Per-class PII patterns (the alternation arms of [[PiiPattern]],
    * scanned independently for the prevalence report). */
  val PiiEmailPattern: String = "[a-z0-9._]+@[a-z0-9.]+"
  val PiiDigitPattern: String = "[0-9]{7,}"
  val PiiTermPattern: String = s"\\b(${PiiTerms.mkString("|")})\\b"

  /** PII prevalence report per source — the triage table that decides
    * which sources need the heavy scrub pass (running [[piiScrub]]'s
    * rewrite over a TB source that turns out clean is wasted compute;
    * running nothing over a leaky one is an incident). Per source:
    * document counts, per-CLASS hit totals (independent scans of the
    * [[PiiPattern]] alternation arms — a digit run inside an email
    * counts in both classes; `pii_hits` from the combined pattern is
    * the exact [[piiScrub]] redaction total, where alternation order
    * arbitrates), and the flagged-document rate in basis points.
    * Null-text docs count in `n_docs` with zero hits.
    *
    * Scale shape: a pure codegen'd regex map stage collapsing straight
    * into a bounded-domain `source` hash aggregate — one partial-agg
    * shuffle of source-grain partials, no second pass, no rewrite of
    * the text column. */
  def piiPrevalence(docs: DataFrame): DataFrame = {
    def hits(pattern: String): Column =
      when(col("text").isNull, lit(0L))
        .otherwise(size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
          .cast("long"))
    docs
      .select(col("source"),
        hits(PiiEmailPattern).as("e"), hits(PiiDigitPattern).as("d"),
        hits(PiiTermPattern).as("t"), hits(PiiPattern).as("c"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("c") > 0L).cast("long")).as("n_flagged"),
        sum(col("e")).as("email_hits"),
        sum(col("d")).as("number_hits"),
        sum(col("t")).as("term_hits"),
        sum(col("c")).as("pii_hits"))
      .withColumn("flagged_bp",
        floor(lit(10000.0) * col("n_flagged") / col("n_docs")).cast("long"))
  }

  /** Replace every PII match with the `<PII>` placeholder; count the
    * redactions per document. Null text passes through. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("text").isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(col("text"), lit(PiiPattern), lit(0)))
          .cast("long"))
        .as("pii_hits"),
      regexp_replace(col("text"), PiiPattern, "<PII>").as("scrubbed"))

  /** Markup tag pattern — the portable regex subset again: `[^>]*`
    * means identical things to Java regex and RE2. */
  val TagPattern: String = "<[^>]*>"

  /** Entity decode table. `&amp;` is decoded LAST: `&amp;lt;` is the
    * ESCAPED text "&lt;", and decoding `&` first would turn it into a
    * real `<` (the classic double-decode bug). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Whitespace-run pattern for the collapse step — INCLUDING \r:
    * web dumps are the one input where CRLF is the norm, and a class
    * without it would leave phantom \r tokens in every cleaned doc
    * (both engines share the regex, so the oracle gate alone could
    * never catch the omission). Shared with the q83 oracle so the
    * two sides cannot drift. */
  val WsPattern: String = "[ \\t\\n\\r]+"

  /** HTML/markup boilerplate strip — the ingest-side cleanup between
    * a raw web dump and every text op in this file: tags removed
    * (replaced by a space so `a<br>b` doesn't fuse words), the common
    * entities decoded, whitespace runs collapsed, ends trimmed.
    *
    * Pure map stage (zero shuffle, codegen'd regex/replace
    * built-ins), like its siblings. Exact `replace` (not regex) for
    * entities — identical semantics in any engine; the chain order is
    * part of the contract (see [[Entities]]). Null text passes
    * through with null stats. */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val noTags = regexp_replace(col("text"), TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      call_function("replace", c, lit(e), lit(r))
    }
    docs.select(
      col("doc_id"),
      when(col("text").isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(col("text"), lit(TagPattern), lit(0)))
          .cast("long"))
        .as("tag_count"),
      trim(regexp_replace(decoded, WsPattern, " ")).as("clean_text"))
  }
}
