package graft

import org.apache.spark.sql.functions._

import graft.ops.TextClean

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dedupLines keeps the first occurrence of each token window") {
    val out = TextClean.dedupLines(docs(1L -> "a b a b c d c d x"), lineTokens = 2)
      .select("n_lines", "n_kept", "removed_bp", "cleaned")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((5L, 3L, 4000L, "a b c d x")))
  }

  test("dedupLines leaves repetition-free documents untouched") {
    val text = "one two three four five six seven"
    val out = TextClean.dedupLines(docs(1L -> text), lineTokens = 3)
      .select("removed_bp", "cleaned").as[(Long, String)].head()
    assert(out == ((0L, text)))
  }

  test("dedupLines: a trailing partial window is its own line") {
    // "x" tail chunk differs from "x y" even though both start with x
    val out = TextClean.dedupLines(docs(1L -> "x y x"), lineTokens = 2)
      .select("n_lines", "n_kept", "cleaned").as[(Long, Long, String)].head()
    assert(out == ((2L, 2L, "x y x")))
  }

  test("dedupLines passes null text through with null stats") {
    val out = TextClean.dedupLines(docs(1L -> null), lineTokens = 2)
      .select("n_lines", "n_kept", "removed_bp", "cleaned")
      .as[(Option[Long], Option[Long], Option[Long], Option[String])].head()
    assert(out == ((None, None, None, None)))
  }

  test("piiScrub redacts emails, digit runs, and deny-list words only") {
    val out = TextClean.piiScrub(
      docs(1L -> "customer x customers accountant 12345678 a@b.com short 123"))
      .select("pii_hits", "scrubbed").as[(Long, String)].head()
    // word boundaries: 'customers'/'accountant' survive; 123 is short
    assert(out == ((3L, "<PII> x customers accountant <PII> <PII> short 123")))
  }

  test("piiScrub on clean text is the identity with zero hits") {
    val out = TextClean.piiScrub(docs(1L -> "just plain words"))
      .select("pii_hits", "scrubbed").as[(Long, String)].head()
    assert(out == ((0L, "just plain words")))
  }

  test("repetitionMetrics: duplicate lines and the dominant bigram") {
    // text "a b a b c d": lines(2) = [a b, a b, c d] -> 1 of 3 dup;
    // bigrams = [a b, b a, a b, b c, c d] -> top 'a b' x2, len 3, text len 11
    val out = TextClean.repetitionMetrics(docs(1L -> "a b a b c d"), lineTokens = 2)
      .select("n_lines", "dup_line_bp", "dup_line_char_bp", "top_bigram", "top_bigram_bp")
      .as[(Long, Long, Long, String, Long)].head()
    assert(out._1 == 3L)
    assert(out._2 == 3333L)                 // floor(10000 * 1/3)
    assert(out._3 == Math.floorDiv(10000 * 3, 11)) // one dup 'a b' instance = 3 chars
    assert(out._4 == "a b" && out._5 == Math.floorDiv(10000 * 2 * 3, 11))
  }

  test("repetitionMetrics: repetition-free text scores zero; ties pick the smallest bigram") {
    val out = TextClean.repetitionMetrics(docs(1L -> "z y x w"), lineTokens = 2)
      .select("dup_line_bp", "dup_line_char_bp", "top_bigram")
      .as[(Long, Long, String)].head()
    // all bigrams occur once -> tie -> lexicographically smallest
    assert(out == ((0L, 0L, "x w")))
  }

  test("repetitionMetrics: single-token and null docs yield null bigram columns") {
    val outs = TextClean.repetitionMetrics(
      docs(1L -> "solo", 2L -> null), lineTokens = 2)
      .select("doc_id", "top_bigram", "top_bigram_bp", "dup_line_bp")
      .as[(Long, Option[String], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(outs(1L) == ((None, None, Some(0L))))
    assert(outs(2L) == ((None, None, None)))
  }

  test("stripMarkup: tags out, entities decoded, whitespace collapsed") {
    val out = TextClean.stripMarkup(docs(
      1L -> "<p>hello <b>world</b></p>\r\n\r\n<div class=\"x\">bye</div>",
      2L -> "a&lt;b &amp; c&gt;d &quot;q&quot; &#39;s&#39; x&nbsp;y",
      // the double-decode trap: &amp;lt; is the ESCAPED text "&lt;"
      // and must NOT become a real '<'
      3L -> "literal &amp;lt; stays escaped",
      4L -> "no markup at all",
      5L -> null))
      .select("doc_id", "tag_count", "clean_text")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(6L), Some("hello world bye"))))
    assert(out(2L) == ((Some(0L), Some("a<b & c>d \"q\" 's' x y"))))
    assert(out(3L) == ((Some(0L), Some("literal &lt; stays escaped"))))
    assert(out(4L) == ((Some(0L), Some("no markup at all"))))
    assert(out(5L) == ((None, None)))
  }

  test("stripMarkup plan is a pure map (no shuffle)") {
    val plan = TextClean.stripMarkup(docs(1L -> "<i>x</i>"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("piiPrevalence: per-source class counts, overlap, null text, flagged rate") {
    val d = Seq(
      // email whose local part contains a 7+ digit run: counts in BOTH
      // the email and number classes, once in the combined scrub count
      (1L, "contact someone1234567@site.org today", "web"),
      (2L, "my ssn is 123456789 and account too", "web"),
      (3L, "clean text with nothing sensitive", "web"),
      (4L, null.asInstanceOf[String], "web"),
      (5L, "customer data", "curated")
    ).toDF("doc_id", "text", "source")
    val got = TextClean.piiPrevalence(d)
      .select("source", "n_docs", "n_flagged", "email_hits", "number_hits",
        "term_hits", "pii_hits", "flagged_bp")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // web: doc1 email=1 number=1(inside email) combined=1;
    //      doc2 number=1, terms {ssn, account}=2, combined=3;
    //      doc3/doc4 zero → flagged 2/4 = 5000 bp
    assert(got == Set(
      ("web", 4L, 2L, 1L, 2L, 2L, 4L, 5000L),
      ("curated", 1L, 1L, 0L, 0L, 1L, 1L, 10000L)))
  }

  test("boilerplateScrub removes cross-doc windows everywhere, keeps order, '' for full scrub") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "nav bar foo baa tail x", "web"),
      (2L, "baz qux nav bar end y", "web"),
      (3L, "nav bar nav bar", "web"),        // within-doc repeats of a denied line
      (4L, "unique words here now", "web"),
      (5L, "nav bar solo", "other"))         // other source: not denied there
      .toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(0L))
    val out = graft.ops.TextClean.boilerplateScrub(d, lineTokens = 2,
      minDocs = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("cleaned"), r.getAs[Long]("removed_bp")))).toMap
    // "nav bar" appears in docs 1,2,3 of source web → denied there
    assert(out(1L) == ((3L, 2L, "foo baa tail x", 3333L)))
    assert(out(2L) == ((3L, 2L, "baz qux end y", 3333L)))
    assert(out(3L) == ((2L, 0L, "", 10000L)))  // every occurrence removed
    assert(out(4L) == ((2L, 2L, "unique words here now", 0L)))
    assert(out(5L) == ((2L, 2L, "nav bar solo", 0L))) // per-source deny
  }
}
