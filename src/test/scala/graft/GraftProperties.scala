package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.{Dedup, SessionStats, Sessionize, StratifiedExtract, TopK}

/** Property tests (SURVEY §5.2): operator invariants over generated
  * inputs. Each case runs Spark jobs, so successes-per-property is
  * kept small.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private val T0 = 1767225600000L // 2026-01-01 UTC

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("props", StringType), StructField("value", DoubleType)))

  /** Small random event histories: a few users, jittered timestamps
    * with occasional >30min gaps. */
  private val genEvents: Gen[Seq[Row]] = for {
    n <- Gen.choose(5, 60)
    rows <- Gen.sequence[Seq[Row], Row]((1 to n).map { i =>
      for {
        user <- Gen.choose(1L, 4L)
        gap <- Gen.frequency(9 -> Gen.choose(0L, 600L), 1 -> Gen.choose(2000L, 9000L))
        typ <- Gen.oneOf("view", "click", "purchase", "signup")
        cat <- Gen.choose(1L, 5L)
      } yield Row(i.toLong, new Timestamp(T0 + (i * 31L + gap) * 1000L), user,
        typ, s"""{"k":"$cat"}""", 1.0)
    })
  } yield rows

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), eventSchema)

  property("money convention: Spark floor(v*100) sum == JVM math.floor cents sum") =
    forAll(for {
      n <- Gen.choose(1, 40)
      // realistic money doubles incl. shortest-repr traps (x.xx5) and
      // sub-cent noise — the values where decimal rounding diverges
      // per engine but floor(v*100) must not
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 99999L).map(_ / 100.0),       // exact cents
        Gen.choose(0L, 9999L).map(_ / 1000.0),       // 3-decimal (x.xx5 cases)
        Gen.choose(0.0, 1000.0)))                    // arbitrary doubles
    } yield vs) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, new Timestamp(T0 + i * 1000L), 1L, "purchase",
          """{"k":"1"}""", v)
      }
      val sparkCents = Sessionize(df(rows))
        .agg(org.apache.spark.sql.functions.sum("total_value_cents"))
        .head().getLong(0)
      val jvmCents = vs.map(v => math.floor(v * 100.0).toLong).sum
      sparkCents == jvmCents
    }

  property("sessionize: gaps bound sessions; steps sum to events") =
    forAll(genEvents) { rows =>
      val sess = Sessionize.sessionAggregates(Sessionize.assignSessions(df(rows)))
        .select(col("session_id"), col("step_length"), col("visit_length_s"))
        .collect()
      val stepsOk = sess.forall(_.getAs[Long]("step_length") >= 1L)
      val visitOk = sess.forall(_.getAs[Long]("visit_length_s") >= 0L)
      val total = sess.map(_.getAs[Long]("step_length")).sum
      stepsOk && visitOk && total == rows.size
    }

  property("session stats: bucket counts partition the session set") =
    forAll(genEvents) { rows =>
      val sessions = Sessionize.sessionAggregates(Sessionize.assignSessions(df(rows)))
      val stats = SessionStats(sessions).head()
      val total = stats.getAs[Long]("session_count")
      // visit buckets start at 1s (reference semantics): zero-length
      // visits are outside the histogram
      val nonZeroVisits = sessions.filter(col("visit_length_s") >= 1L).count()
      val visitBuckets = SessionStats.bucketNames.filter(_.startsWith("visit"))
      val stepBuckets = SessionStats.bucketNames.filter(_.startsWith("step"))
      val vSum = visitBuckets.map(stats.getAs[Long]).sum
      val sSum = stepBuckets.map(stats.getAs[Long]).sum
      vSum == nonZeroVisits && sSum == total
    }

  property("topCategories is a maximal set under the sort key") =
    forAll(genEvents) { rows =>
      val all = TopK.topCategories(df(rows), n = Int.MaxValue).collect()
        .map(r => (r.getAs[Long]("click_count"), r.getAs[Long]("purchase_count"),
          r.getAs[Long]("view_count"), -r.getAs[Long]("category_id")))
      val top3 = TopK.topCategories(df(rows), n = 3).collect()
        .map(r => (r.getAs[Long]("click_count"), r.getAs[Long]("purchase_count"),
          r.getAs[Long]("view_count"), -r.getAs[Long]("category_id")))
      // the returned set must equal the k greatest under the total order
      top3.toSeq == all.sortBy(identity)(Ordering[(Long, Long, Long, Long)].reverse)
        .take(top3.length).toSeq
    }

  property("stratified extract: per-stratum draw respects the quota") =
    forAll(genEvents, Gen.choose(1L, 50L)) { (rows, target) =>
      val sessions = Sessionize.sessionAggregates(Sessionize.assignSessions(df(rows)))
      val picked = StratifiedExtract(sessions, target)
        .groupBy(col("date_hour")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val strata = sessions
        .withColumn("date_hour",
          concat(substring(col("start_time"), 1, 10), lit("_"),
            substring(col("start_time"), 12, 2)))
        .groupBy(col("date_hour")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      picked.forall { case (k, n) => n <= strata(k) } &&
        picked.values.sum <= target.max(strata.size.toLong)
    }

  /** ≥ ShingleSize tokens so the shingle set (and thus the MinHash
    * signature) is non-empty. */
  private val genTokens: Gen[Seq[String]] = for {
    n <- Gen.choose(Dedup.ShingleSize, 12)
    toks <- Gen.listOfN(n, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"))
  } yield toks

  property("minhash signature: deterministic, equal texts collide, in [0, P)") =
    forAll(genTokens) { tokens =>
      val s = spark
      import s.implicits._
      val text = tokens.mkString(" ")
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val sig = Dedup.minhashSignature(docs)
        .select(col("doc_id"), col("mh00"), col("mh07"), col("mh15"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val (a, b, c) = sig(1L)
      sig(1L) == sig(2L) &&
        Seq(a, b, c).forall(v => v >= 0L &&
          v < graft.expressions.MinHashSig.Prime)
    }

  property("simhash: permutation-invariant; equal texts collide") =
    forAll(genTokens, Gen.choose(1, 11)) { (tokens, rot) =>
      val s = spark
      import s.implicits._
      // Gen-driven rotation: reproducible from the ScalaCheck seed and
      // a genuine reorder whenever the tokens aren't all identical
      val k = rot % tokens.size
      val permuted = tokens.drop(k) ++ tokens.take(k)
      val docs = Seq(
        (1L, tokens.mkString(" ")), (2L, permuted.mkString(" ")))
        .toDF("doc_id", "text")
      val sig = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sig(1L) == sig(2L)
    }

  /** Corpora with forced duplicate groups, near-dup mutations, a
    * too-short doc, and a null text — the shapes the collapsed
    * minhashDedupPairs must agree on with the direct formulation. */
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    nBase <- Gen.choose(2, 4)
    bases <- Gen.listOfN(nBase, genTokens)
    mults <- Gen.listOfN(nBase, Gen.choose(1, 4))
    mutate <- Gen.oneOf(true, false)
  } yield {
    val docs = bases.zip(mults).flatMap { case (toks, m) =>
      val exact = Seq.fill(m)(toks.mkString(" "))
      val near = if (mutate) Seq((toks.init :+ "omega").mkString(" ")) else Nil
      exact ++ near
    } ++ Seq("tiny doc", null)
    docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }
  }

  property("minhashDedupPairs (collapsed) == direct pairwise formulation") =
    forAll(genCorpus) { corpus =>
      val s = spark
      import s.implicits._
      val docs = corpus.toDF("doc_id", "text")
      def key(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val collapsed = Dedup.minhashDedupPairs(docs, 8000L).collect().map(key).toSet
      val sh = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
      val direct = Dedup.verifyJaccard(Dedup.lshCandidatePairs(docs), sh)
        .filter(col("jaccard_bp") >= 8000L).collect().map(key).toSet
      collapsed == direct
    }

  property("funnel rates are non-negative and floor-exact") =
    forAll(genEvents) { rows =>
      val out = graft.ops.PageFunnel(spark,
        Sessionize.assignSessions(df(rows)), Seq("view", "click", "purchase"))
        .collect()
      out.forall { r =>
        val rate = r.getAs[Long]("convert_rate_bp")
        val split = r.getAs[Long]("split_count")
        val prev = r.getAs[Long]("prev_count")
        rate >= 0 && (prev == 0 && rate == 0 ||
          rate == math.floor(10000.0 * split / prev).toLong)
      }
    }

  /** Random small documents: token counts 0-30 from a tiny vocab so
    * n-gram overlaps actually occur. */
  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)]((1 to n).map { i =>
      for {
        len <- Gen.choose(0, 30)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield (i.toLong, toks.mkString(" "))
    })
  } yield docs

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
  }

  property("chunking with stride == chunkTokens reconstructs every document") =
    forAll(genDocs) { rows =>
      val c = 4
      val rebuilt = graft.ops.TrainingPrep.chunk(docsDf(rows), c, c)
        .orderBy("doc_id", "chunk_idx")
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, chunks) =>
          id -> chunks.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" ") }
      rows.forall { case (id, text) => rebuilt(id) == text }
    }

  property("packing: per-shard offsets are a gapless prefix sum in doc_id order") =
    forAll(genDocs) { rows =>
      val out = graft.ops.TrainingPrep.packSequences(docsDf(rows), shards = 3, seqLen = 7L)
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("token_count"), r.getAs[Long]("start_offset")))
      out.groupBy(_._1).values.forall { shard =>
        val ordered = shard.sortBy(_._2)
        ordered.scanLeft(0L)((acc, d) => acc + d._3).zip(ordered)
          .forall { case (expect, d) => d._4 == expect }
      }
    }

  property("self-decontamination flags exactly the docs with >= n tokens") =
    forAll(genDocs) { rows =>
      // flagging train against ITSELF as the benchmark: every doc with
      // >= n tokens must be flagged (it always shares its own grams)
      val n = 3
      val flagged = graft.ops.Contamination
        .flagged(docsDf(rows), docsDf(rows), n)
        .collect().map(_.getLong(0)).toSet
      val expect = rows.filter(_._2.split(" ", -1).length >= n).map(_._1).toSet
      flagged == expect
    }

  /** genDocs with SIGNED ids — hash-minted doc ids are ~half negative,
    * and id-arithmetic ops (split) must be verified there too. */
  private val genSignedDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 12)
    ids <- Gen.listOfN(n,
      Gen.choose(Long.MinValue + 1, Long.MaxValue)).map(_.distinct)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)](ids.map { id =>
      for {
        len <- Gen.choose(0, 8)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield (id, toks.mkString(" "))
    })
  } yield docs

  property("split assigns every doc exactly one of train/val/test, by doc_id only") =
    forAll(genSignedDocs) { rows =>
      // floorMod at BOTH levels — the engine's double-pmod; a plain %
      // twin diverges on negative ids (the inner-mod sign leaks
      // through the multiply, see TrainingPrep.split)
      val out = graft.ops.TrainingPrep.split(docsDf(rows), 8000L, 1000L)
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      out.length == rows.length && out.forall { case (id, s) =>
        Set("train", "val", "test")(s) &&
          s == (Math.floorMod(
            Math.floorMod(id, 1000003L) * 48271L + 12345L, 10000L) match {
            case bp if bp < 8000L => "train"
            case bp if bp < 9000L => "val"
            case _ => "test"
          })
      }
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  property("sourceCapExact keeps exactly the cap smallest md5 draws per source") =
    forAll(genDocs, Gen.choose(1, 5)) { (rows, cap) =>
      // sources assigned deterministically so groups have 1+ members
      val srcOf = (id: Long) => s"src${id % 3}"
      val d = {
        val s = spark
        import s.implicits._
        rows.map { case (id, t) => (id, t, "en", srcOf(id)) }
          .toDF("doc_id", "text", "lang", "source")
      }
      val expect = rows.map(_._1).groupBy(srcOf)
        .flatMap { case (_, ids) =>
          ids.sortBy(id => (md5Hex(id.toString), id)).take(cap)
        }.toSet
      val got = graft.ops.TrainingPrep.sourceCapExact(d, cap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      got == expect
    }

  property("sourceCapRate keep verdict == independent md5-prefix threshold") =
    forAll(genDocs, Gen.choose(1L, 6L)) { (rows, cap) =>
      val srcOf = (id: Long) => s"src${id % 2}"
      val d = {
        val s = spark
        import s.implicits._
        rows.map { case (id, t) => (id, t, "en", srcOf(id)) }
          .toDF("doc_id", "text", "lang", "source")
      }
      val counts = rows.map(_._1).groupBy(srcOf).view.mapValues(_.size.toLong).toMap
      val expect = rows.map { case (id, _) =>
        val draw32 = java.lang.Long.parseLong(md5Hex(id.toString).take(8), 16)
        val thr = math.floor(4294967296.0 * cap / counts(srcOf(id))).toLong
        id -> (if (draw32 < thr) 1 else 0)
      }.toMap
      val got = graft.ops.TrainingPrep.sourceCapRate(d, cap)
        .select("doc_id", "keep").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == expect
    }

  property("canonicalBySource winner == max (priority, -doc_id) per text group") =
    forAll(genDocs) { rows =>
      val srcOf = (id: Long) => s"src${id % 3}"
      val prio = Map("src0" -> 5L, "src2" -> 2L) // src1 → default 1
      val d = {
        val s = spark
        import s.implicits._
        rows.map { case (id, t) => (id, t, "en", srcOf(id)) }
          .toDF("doc_id", "text", "lang", "source")
      }
      val expect = rows.groupBy(_._2).map { case (_, group) =>
        val winner = group.minBy { case (id, _) =>
          (-prio.getOrElse(srcOf(id), 1L), id)
        }._1
        winner -> group.size.toLong
      }
      val got = graft.ops.Dedup.canonicalBySource(d, prio, 1L)
        .select("canonical_doc_id", "dup_count").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }

  property("substringDupSpans == brute-force gram-frequency cover") =
    forAll(genDocs) { rows =>
      val n = 3
      val toks = rows.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val grams = toks.flatMap { case (id, ts) =>
        if (ts.length >= n)
          ts.sliding(n).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }.toSeq
        else Nil
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expect = toks.map { case (id, ts) =>
        val cover = grams.filter(g => g._1 == id && counts(g._3) >= 2)
          .flatMap(g => g._2 until g._2 + n).toSet
        id -> ((ts.length.toLong, cover.size.toLong))
      }.toMap
      val got = graft.ops.Dedup.substringDupSpans(docsDf(rows), n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == expect
    }

  property("bm25TopK scores == independent per-pair reference") =
    forAll(genDocs) { rows =>
      val qs = Seq(1L -> Seq("a", "b"), 2L -> Seq("c"))
      val toks = rows.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val nDocs = toks.size
      val avgdl = toks.values.map(_.size.toLong).sum.toDouble / nDocs
      val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
      val expect = (for {
        (qid, terms) <- qs
        (did, ts) <- toks
        if terms.exists(ts.contains)
      } yield (qid, did) -> terms.map { term =>
        val tf = ts.count(_ == term).toLong
        if (tf == 0L) 0L
        else {
          val d = dfm(term).toLong
          math.floor(1000000.0
            * ((2.0 * (nDocs - d) + 1.0) / (2.0 * d + 1.0))
            * ((tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * (ts.size / avgdl))))).toLong
        }
      }.sum).toMap
      val s = spark
      import s.implicits._
      val queries = qs.flatMap { case (id, ts) => ts.map(id -> _) }
        .toDF("query_id", "token")
      val got = graft.ops.Retrieval.bm25TopK(docsDf(rows), queries, k = 1000)
        .select("query_id", "doc_id", "score_fp").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got == expect
    }

  property("bpeLearn == in-memory reference (greedy fold semantics)") =
    forAll(genDocs) { rows =>
      def refMerge(syms: List[String], l: String, r: String): List[String] =
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      var vocab: Map[List[String], Long] = rows.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
      val expect = (1 to 3).flatMap { r =>
        val counts = vocab.toSeq.flatMap { case (syms, f) =>
          syms.zip(syms.drop(1)).map(p => p -> f)
        }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
        if (counts.isEmpty) None
        else {
          val ((l, rr), c) = counts.minBy { case ((x, y), cnt) => (-cnt, x, y) }
          vocab = vocab.groupBy { case (syms, _) => refMerge(syms, l, rr) }
            .map { case (m, xs) => m -> xs.values.sum }
          Some((r.toLong, l, rr, c))
        }
      }
      val got = graft.ops.Bpe.learn(docsDf(rows), rounds = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      got == expect
    }

  property("curriculum buckets: value-deterministic and monotone in score") =
    forAll(genDocs) { rows =>
      Prop.collect(rows.size) {
        val out = graft.ops.TrainingPrep.curriculumBuckets(docsDf(rows), buckets = 4)
          .collect().map(r => (r.getLong(1), r.getLong(2))) // (ttr_bp, bucket)
        val byTtr = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        byTtr.values.forall(_.size == 1) && // ties share a bucket
          out.forall { case (_, b) => b >= 0L && b < 4L } &&
          byTtr.toSeq.sortBy(-_._1).map(_._2.head)
            .sliding(2).forall(p => p.length < 2 || p(0) <= p(1)) // desc ttr ⇒ nondecreasing bucket
      }
    }

  property("trend stream: ANY batch split == the batch aggregation") =
    forAll(genDocs, Gen.choose(1, 3)) { (rows, nBatches) =>
      import graft.streaming.TrendStream
      import graft.sink.{InMemoryProvider, InMemoryStore}
      val s = spark
      import s.implicits._
      implicit val sq = s.sqlContext
      val store = s"trend-prop-${System.nanoTime()}"
      InMemoryStore.clear(store)
      val docs = rows.map { case (id, t) =>
        TrendStream.Doc(id, t, new Timestamp(T0 + (id * 17 % 150) * 1000L)) }
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[TrendStream.Doc]
      val q = TrendStream.trendingQuery(mem.toDF(), InMemoryProvider(store),
        java.nio.file.Files.createTempDirectory("graft-tp").toString, k = 2)
      val got = try {
        docs.grouped(math.max(1, docs.size / nBatches)).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        new InMemoryStore(store).scan("token_window_count").toMap
      } finally q.stop()
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmm")
        .withZone(java.time.ZoneOffset.UTC)
      val expect = docs
        .flatMap(d => d.text.split(" ", -1).map(tok =>
          (fmt.format(java.time.Instant.ofEpochMilli(
            d.ts.getTime / 60000L * 60000L)), tok)))
        .groupBy(identity).map { case ((w, tok), xs) =>
          List(w, tok) -> xs.size.toLong }
      got == expect
    }

  property("mixture plan: rates bounded, yields capped by availability and demand") =
    forAll(genDocs, Gen.choose(1L, 200L)) { (rows, budget) =>
      val out = graft.ops.TrainingPrep
        .mixturePlan(docsDf(rows), Map("s" -> 3L), budget)
        .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))) // (avail, desired, keep, planned, deficit)
      out.forall { case (avail, desired, keep, planned, deficit) =>
        keep >= 0L && keep <= 10000L &&
          planned <= avail && planned <= desired &&
          deficit == math.max(0L, desired - planned)
      }
    }

  property("dedup impact: per-source accounting conserves docs and tokens") =
    forAll(genDocs) { rows =>
      val s = spark
      import s.implicits._
      // spread the docs over 3 sources so the report has real groups
      val d = rows.map { case (id, t) => (id, t, "en", s"s${id % 3}") }
        .toDF("doc_id", "text", "lang", "source")
      val out = graft.ops.Clustering.dedupImpact(d)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val totalDocs = rows.size.toLong
      val totalToks = rows.map(_._2.split(" ", -1).length.toLong).sum
      out.map(_._2).sum == totalDocs &&
        out.map(_._4).sum == totalToks &&
        out.forall { case (_, nd, nk, tt, tk, bp) =>
          nk >= 0L && nk <= nd && tk >= 0L && tk <= tt &&
            bp >= 0L && bp <= 10000L
        }
    }

  property("incremental savings == the kept-verdict complement, per source") =
    forAll(genDocs) { rows =>
      val s = spark
      import s.implicits._
      // even ids form the corpus, odd ids the arriving batch (the
      // operator requires disjoint id spaces); 2 sources on each side
      val (c, b) = rows.partition(_._1 % 2 == 0)
      Prop.propBoolean(c.nonEmpty && b.nonEmpty) ==> {
        def mk(xs: Seq[(Long, String)]) = xs
          .map { case (id, t) => (id, t, "en", s"s${id % 2}") }
          .toDF("doc_id", "text", "lang", "source")
        val (corpus, batch) = (mk(c), mk(b))
        val kept = Dedup.incrementalDedupKept(batch, corpus)
          .select("doc_id").as[Long].collect().toSet
        val out = Dedup.incrementalSavingsReport(batch, corpus)
          .collect().map(r => r.getAs[String]("source") ->
            (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
              r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_dropped"),
              r.getAs[Long]("savings_bp"))).toMap
        val bySrc = b.groupBy { case (id, _) => s"s${id % 2}" }
        out.keySet == bySrc.keySet && bySrc.forall { case (src, docs) =>
          val toks = docs.map { case (id, t) =>
            id -> t.split(" ", -1).length.toLong }.toMap
          val dropped = docs.collect { case (id, _) if !kept(id) => id }
          val (nD, nX, tT, tX, bp) = out(src)
          val wantTx = dropped.map(toks).sum
          nD == docs.size.toLong && nX == dropped.size.toLong &&
            tT == toks.values.sum && tX == wantTx &&
            bp == (if (tT == 0L) 0L
                   else math.floor(10000.0 * tX / tT).toLong)
        }
      }
    }

  property("split leakage: pair accounting is exhaustive and split-consistent") =
    forAll(genDocs) { rows =>
      val d = docsDf(rows)
      val pairCount = Dedup.minhashDedupPairs(d).count()
      val out = graft.ops.TrainingPrep.splitLeakage(d)
        .collect().map(r => (r.getAs[String]("split_lo"),
          r.getAs[String]("split_hi"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("max_jaccard_bp"), r.getAs[Long]("is_cross")))
      out.map(_._3).sum == pairCount &&
        out.forall { case (lo, hi, n, mx, x) =>
          lo <= hi && n >= 1L && mx >= 8000L && mx <= 10000L &&
            x == (if (lo == hi) 0L else 1L)
        }
    }

  property("fuzzy self-decontamination flags every shingled doc against itself") =
    forAll(genDocs) { rows =>
      val d = docsDf(rows)
      val self = graft.ops.Contamination.fuzzyFlagged(d, d)
        .filter(col("doc_id") === col("eval_doc_id"))
        .select("doc_id", "cont_bp")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // docs with >= 3 tokens have non-empty shingle sets: identical
      // signatures band-match, containment is exactly 10000
      val shingled = rows.filter(_._2.split(" ", -1).length >= 3).map(_._1).toSet
      shingled.forall(id => self.get(id).contains(10000L)) &&
        self.keySet == shingled
    }

  property("shardShuffle is a permutation: dense per-shard positions for ANY ids incl. negative") =
    forAll(for {
      n <- Gen.choose(1, 24)
      ids <- Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
      shards <- Gen.choose(1, 5)
    } yield (ids.distinct, shards)) { case (ids, shards) =>
      val s = spark
      import s.implicits._
      val d = ids.map(id => (id, "text", "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.ops.TrainingPrep.shardShuffle(d, shards)
        .as[(Long, Long, Long)].collect()
      out.map(_._1).toSet == ids.toSet &&
        out.forall(r => r._2 >= 0 && r._2 < shards) &&
        out.groupBy(_._2).forall { case (_, g) =>
          g.map(_._3).sorted.toSeq == (0L until g.length)
        }
    }

  property("valueDrift == JVM TVD recompute; bounded in [0, 10000]") =
    forAll(for {
      nr <- Gen.choose(1, 20)
      nc <- Gen.choose(1, 20)
      rv <- Gen.listOfN(nr, Gen.choose(-5.0, 120.0))
      cv <- Gen.listOfN(nc, Gen.choose(-5.0, 120.0))
    } yield (rv, cv)) { case (rv, cv) =>
      val s = spark
      import s.implicits._
      val (w, nb) = (10.0, 8)
      val rows =
        rv.zipWithIndex.map { case (v, i) =>
          ("a", new Timestamp(T0 + i * 1000L), v) } ++
        cv.zipWithIndex.map { case (v, i) =>
          ("a", new Timestamp(T0 + 5 * 86400000L + i * 1000L), v) }
      val out = graft.ops.Retention
        .valueDrift(rows.toDF("event_type", "ts", "value"),
          splitDate = "2026-01-03", bucketWidth = w, nBuckets = nb)
        .select("tvd_bp").as[Long].head()
      def histo(vs: Seq[Double]): Map[Long, Long] =
        vs.groupBy(v => math.min(math.max(math.floor(v / w).toLong, 0L),
          nb - 1L)).view.mapValues(_.size.toLong).toMap
      val (hr, hc) = (histo(rv), histo(cv))
      val want = (hr.keySet ++ hc.keySet).toSeq.map { b =>
        math.abs(
          math.floor(10000.0 * hr.getOrElse(b, 0L) / rv.size).toLong -
            math.floor(10000.0 * hc.getOrElse(b, 0L) / cv.size).toLong)
      }.sum / 2
      out == want && out >= 0L && out <= 10000L
    }

  property("thresholdSweep cumulative equals a direct >=-threshold filter at every bucket") =
    forAll(for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        tc <- Gen.choose(1L, 500L)
        sc <- Gen.choose(-6000L, 6000L)
      } yield (tc, sc))
    } yield rows) { rows =>
      val s = spark
      import s.implicits._
      val in = rows.zipWithIndex
        .map { case ((tc, sc), i) => (i.toLong, tc, sc) }
        .toDF("doc_id", "token_count", "score")
      val out = graft.ops.TrainingPrep.thresholdSweep(in, 1024L)
        .select("bucket", "docs_kept", "tokens_kept")
        .as[(Long, Long, Long)].collect()
      out.forall { case (b, dk, tk) =>
        val kept = rows.filter { case (_, sc) =>
          math.floor(sc.toDouble / 1024.0).toLong >= b }
        dk == kept.size.toLong && tk == kept.map(_._1).sum
      }
    }

  property("contributorCap never exceeds k and never invents rows") =
    forAll(for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(1, 5)
      users <- Gen.listOfN(n, Gen.choose(1L, 5L))
    } yield (k, users)) { case (k, users) =>
      val s = spark
      import s.implicits._
      val in = users.zipWithIndex.map { case (u, i) =>
        (i.toLong, new Timestamp(T0 + i * 1000L), u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = graft.ops.TrainingPrep.contributorCap(in, k)
        .select("user_id", "event_id").as[(Long, Long)].collect()
      val perUser = out.groupBy(_._1).view.mapValues(_.length).toMap
      val inIds = users.indices.map(_.toLong).toSet
      perUser.values.forall(_ <= k) &&
        out.map(_._2).toSet.subsetOf(inIds) &&
        perUser.keySet.forall(u =>
          perUser(u) == math.min(k, users.count(_ == u)))
    }

  property("recencySample keeps exactly the rows whose JVM-recomputed draw clears the decayed gate") =
    forAll(for {
      n <- Gen.choose(1, 50)
      ages <- Gen.listOfN(n, Gen.choose(-5L, 130L))
    } yield ages) { ages =>
      val s = spark
      import s.implicits._
      val asOfMs = T0 + 200L * 86400000L
      val in = ages.zipWithIndex.map { case (age, i) =>
        (i.toLong, new Timestamp(asOfMs - age * 86400000L), 1L, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val asOf = new java.text.SimpleDateFormat("yyyy-MM-dd") {
        setTimeZone(java.util.TimeZone.getTimeZone("UTC")) }
        .format(new java.util.Date(asOfMs))
      val out = graft.ops.TrainingPrep.recencySample(in, asOf)
        .select("event_id").as[Long].collect().toSet
      def md5hex(id: Long): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      val want = ages.zipWithIndex.collect { case (age, i)
        if age >= 0 && {
          val hl = age / 7
          val keep = if (hl >= 14) 0L else 10000L >> hl
          java.lang.Long.parseLong(md5hex(i.toLong).substring(0, 8), 16) % 10000L < keep
        } => i.toLong }.toSet
      out == want
    }

  property("shardMixing TVD stays in [0, 5000+] bounds and conserves docs") =
    forAll(for {
      n <- Gen.choose(1, 50)
      srcs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield srcs) { srcs =>
      val s = spark
      import s.implicits._
      val in = srcs.zipWithIndex.map { case (src, i) =>
        (i.toLong, "w1 w2 w3", "en", src, 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.ops.TrainingPrep.shardMixing(in, 4)
        .select("n_docs", "tvd_bp").as[(Long, Long)].collect()
      out.map(_._1).sum == srcs.size.toLong &&
        out.forall { case (_, tvd) => tvd >= 0L && tvd <= 10000L }
    }

  property("attribution conserves conversions: each model credits every purchase exactly once") =
    forAll(genEvents) { rows =>
      val events = df(rows)
      val purchases = rows.count(_.getString(3) == "purchase").toLong
      val byModel = graft.ops.Sessionize.attribution(events)
        .select("model", "conversions")
        .collect().groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(1)).sum).toMap
      byModel.getOrElse("first", 0L) == purchases &&
        byModel.getOrElse("last", 0L) == purchases
    }

  property("sessionPaths conserves sessions and conversions at full k") =
    forAll(genEvents) { rows =>
      val events = df(rows)
      val sess = graft.ops.Sessionize.assignSessions(events)
      val nSessions = sess.select("session_id").distinct().count()
      val nConverted = sess.filter(col("event_type") === "purchase")
        .select("session_id").distinct().count()
      val row = graft.ops.Sessionize.sessionPaths(events, k = 100000)
        .agg(sum("n_sessions"), sum("n_converted")).head()
      (row.getLong(0), row.getLong(1)) == ((nSessions, nConverted))
    }

  property("triangleStats == JVM brute-force census on random small graphs") =
    forAll(for {
      n <- Gen.choose(0, 14)
      es <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct) { es0 =>
      // shrinking bypasses generator filters — re-enforce the a<b
      // domain contract (coVisitPairs can never emit a self-loop)
      val es = es0.distinct.filter(e => e._1 < e._2)
      val s = spark
      import s.implicits._
      val pairs = (es :+ ((100L, 101L)))  // ≥1 row so toDF has a schema
        .toDF("item_a", "item_b").withColumn("pair_sessions", lit(1L))
      val edges = (es :+ ((100L, 101L))).toSet
      val nodes = edges.flatMap(e => Set(e._1, e._2))
      val deg = nodes.map(v => v ->
        edges.count(e => e._1 == v || e._2 == v).toLong).toMap
      val wedges = deg.values.map(d => d * (d - 1) / 2).sum
      val tris = (for {
        a <- nodes; b <- nodes if a < b; c <- nodes if b < c
        if edges((a, b)) && edges((b, c)) && edges((a, c))
      } yield (a, b, c)).size.toLong
      val r = graft.ops.Graph.triangleStats(pairs).collect().head
      r.getAs[Long]("n_nodes") == nodes.size.toLong &&
        r.getAs[Long]("n_edges") == edges.size.toLong &&
        r.getAs[Long]("n_wedges") == wedges &&
        r.getAs[Long]("n_triangles") == tris &&
        r.getAs[Long]("global_cc_bp") == (if (wedges == 0) 0L
          else math.floor(10000.0 * 3 * tris / wedges).toLong)
    }

  property("entryExit conserves sessions: Σ entries == Σ exits == session count") =
    forAll(genEvents) { rows =>
      val events = df(rows)
      val nSessions = graft.ops.Sessionize.assignSessions(events)
        .select("session_id").distinct().count()
      val out = graft.ops.Sessionize.entryExit(events).collect()
      out.map(_.getAs[Long]("n_entries")).sum == nSessions &&
        out.map(_.getAs[Long]("n_exits")).sum == nSessions &&
        out.forall(r => r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_entries"))
    }

  property("keyBalance: 1 <= eff <= n_keys, exact Σc², flat key scores 10000") =
    forAll(for {
      n <- Gen.choose(1, 50)
      ks <- Gen.listOfN(n, Gen.choose(1L, 8L))
    } yield ks) { ks =>
      val s = spark
      import s.implicits._
      val r = graft.ops.Integrity.keyBalance(
        Seq(("side", ks.toDF("k"), "k"))).collect().head
      val counts = ks.groupBy(identity).values.map(_.size.toLong)
      val sumsq = counts.map(c => BigInt(c) * BigInt(c)).sum
      val eff = r.getAs[Long]("eff_keys")
      r.getAs[String]("sum_sq") == sumsq.toString &&
        eff >= 1L && eff <= r.getAs[Long]("n_keys") &&
        r.getAs[Long]("balance_bp") <= 10000L &&
        (counts.toSet.size != 1 ||
          r.getAs[Long]("balance_bp") == 10000L) // flat → perfect score
    }

  property("decayedPopularity == JVM dyadic recompute") =
    forAll(for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        item <- Gen.choose(1L, 5L)
        age <- Gen.choose(0L, 100L)
      } yield (item, age))
    } yield evs) { evs =>
      val s = spark
      import s.implicits._
      val anchor = "2024-02-01"
      val rows = evs.zipWithIndex.map { case ((item, age), i) =>
        (i.toLong, new Timestamp(Timestamp.valueOf(s"$anchor 00:00:00").getTime
          - age * 86400000L), 1L, "click", 0.0, s"""{"k":$item}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.ops.Market.decayedPopularity(rows, anchor, 7, 100)
        .collect().map(r => r.getAs[Long]("item") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("score_ppm")))).toMap
      val want = evs.groupBy(_._1).map { case (item, xs) =>
        item -> ((xs.size.toLong,
          xs.map { case (_, age) => 1000000L >> math.min(age / 7, 62L).toInt }
            .sum))
      }
      got == want
    }

  property("quantileTable == JVM nearest-rank recompute at p50/p90/p99") =
    forAll(for {
      n <- Gen.choose(1, 60)
      vs <- Gen.listOfN(n, Gen.choose(0.0, 50.0).map(v => math.floor(v * 4) / 4))
    } yield vs) { vs =>
      val s = spark
      import s.implicits._
      val out = graft.ops.Percentiles.quantileTable(
        vs.map(("g", _)).toDF("g", "v"), "g", "v")
        .select("rank_bp", "value_cents").as[(Long, Long)].collect().toMap
      val sorted = vs.sorted
      Seq(5000L, 9000L, 9900L).forall { p =>
        val rank = ((sorted.size * p + 9999) / 10000).toInt // ceil(p*n)
        val want = math.floor(sorted(math.max(rank - 1, 0)) * 100).toLong
        out(p) == want
      }
    }

  property("engagementInequality == JVM brute-force Gini + top decile") =
    forAll(for {
      n <- Gen.choose(0, 60)
      ks <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ks) { ks =>
      val s = spark
      import s.implicits._
      // one NULL key row: must be excluded, not counted as a key
      val in = (ks.map(Option(_)) :+ (None: Option[Long])).toDF("k")
      val r = graft.ops.Profile.engagementInequality(in, "k")
        .collect().head
      val counts = ks.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      val nk = counts.size.toLong
      val s0 = counts.sum
      val s1 = counts.zipWithIndex
        .map { case (c, i) => BigInt(i + 1) * c }.sum
      val expGini = if (s0 == 0L) 0L
        else math.floor(10000.0 * (2.0 * s1.toDouble - (nk + 1.0) * s0) /
          (nk.toDouble * s0)).toLong
      val k10 = math.max(1L, nk / 10)
      val top = counts.sorted.reverse.take(k10.toInt).sum
      val expTop = if (s0 == 0L) 0L
        else math.floor(10000.0 * top / s0).toLong
      r.getAs[Long]("n_keys") == nk && r.getAs[Long]("n_rows") == s0 &&
        r.getAs[Long]("gini_bp") == expGini &&
        r.getAs[Long]("top_decile_bp") == expTop
    }

  property("nextItemBacktest == JVM recompute (sessionize, model, score)") =
    forAll(genEvents) { rows =>
      val split = "2026-01-01 00:20:00"
      val got = graft.ops.Market.nextItemBacktest(df(rows), split)
        .collect().head
      val splitMs = Timestamp.valueOf(split).getTime
      // (tsMs, eventId, item) per user — the q99 standalone-sessionize
      // contract: gap > 1800 s within the item-event stream
      def pairs(evs: Seq[Row]): Map[(Long, Long), Long] = evs
        .map(r => (r.getAs[Timestamp](1).getTime, r.getLong(0),
          r.getLong(2),
          r.getString(4).replaceAll("""[^0-9]""", "").toLong))
        .groupBy(_._3).values.flatMap { us =>
          val sorted = us.sortBy(e => (e._1, e._2)).toList
          val gaps = sorted.zip(None +: sorted.map(Some(_)))
            .map { case (e, prev) =>
              (e, prev.forall(p => e._1 - p._1 > 1800000L)) }
          // consecutive pairs inside each session run
          gaps.zip(gaps.drop(1)).collect {
            case ((a, _), (b, newSession)) if !newSession => (a._4, b._4)
          }
        }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val train = pairs(rows.filter(
        _.getAs[Timestamp](1).getTime < splitMs))
      val test = pairs(rows.filter(
        _.getAs[Timestamp](1).getTime >= splitMs))
      val model = train.groupBy(_._1._1).map { case (prev, m) =>
        prev -> m.toSeq.map { case ((_, next), n) => (n, next) }
          .sortBy { case (n, next) => (-n, next) }.head._2
      }
      val nTest = test.values.sum
      val nCov = test.collect {
        case ((p, _), n) if model.contains(p) => n }.sum
      val nHits = test.collect {
        case ((p, nx), n) if model.get(p).contains(nx) => n }.sum
      got.getAs[Long]("n_test") == nTest &&
        got.getAs[Long]("n_covered") == nCov &&
        got.getAs[Long]("n_hits") == nHits &&
        got.getAs[Long]("acc_bp") == (if (nTest == 0L) 0L
          else math.floor(10000.0 * nHits / nTest).toLong) &&
        got.getAs[Long]("covered_acc_bp") == (if (nCov == 0L) 0L
          else math.floor(10000.0 * nHits / nCov).toLong)
    }

  property("paretoCoverage == JVM greedy brute force at adversarial targets") =
    forAll(for {
      n <- Gen.choose(0, 40)
      vs <- Gen.listOfN(n, Gen.choose(1L, 500L)) // whole dollars: exact cents
      bp <- Gen.oneOf(1L, 2500L, 8000L, 9999L, 10000L)
    } yield (vs, bp)) { case (vs, bp) =>
      val s = spark
      import s.implicits._
      val orders = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.toDouble) }.toDF("o_custkey", "o_totalprice")
      val r = graft.ops.Profile.paretoCoverage(orders, bp).collect().head
      val cents = vs.map(100L * _).sortBy(-_)
      val total = cents.sum
      val t = (BigInt(total) * bp + 9999) / 10000
      var cum = BigInt(0); var k = 0L
      cents.takeWhile { c =>
        val go = cum < t; if (go) { cum += c; k += 1 }; go
      }
      val share = if (total == 0L) 0L
        else math.floor(10000.0 * cum.toLong / total).toLong
      r.getAs[Long]("n_customers") == vs.size.toLong &&
        r.getAs[Long]("n_top") == k &&
        r.getAs[Long]("covered_cents") == cum.toLong &&
        r.getAs[Long]("total_cents") == total &&
        r.getAs[Long]("top_share_bp") == share
    }

  property("assignSessions == Spark-native session_window (off-boundary gaps)") =
    forAll(genEvents) { rows =>
      // Boundary disclosure: our rule keeps gap == 1800 s in-session,
      // native session_window starts a new one (strict <). genEvents
      // never emits an exact-1800 gap, so the operators must agree on
      // every generated history — the living proof that the hand-
      // rolled (oracle-mirrorable) sessionize IS the built-in
      // operator's semantics everywhere off that one boundary.
      val events = df(rows)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3))
      val ours = Sessionize.assignSessions(events)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("a"), max(col("ts")).as("b"),
          count(lit(1)).as("n"))
        .select("user_id", "a", "b", "n").collect().map(key).sorted.toSeq
      val native = events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("a"), max(col("ts")).as("b"),
          count(lit(1)).as("n"))
        .select("user_id", "a", "b", "n").collect().map(key).sorted.toSeq
      ours == native
    }

  property("smallQuantityRevenue == JVM brute force (exact integer threshold)") =
    forAll(for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        part <- Gen.choose(1L, 6L)
        qty <- Gen.choose(1L, 50L)
        price <- Gen.choose(100L, 99999L).map(_ / 100.0)
        disc <- Gen.oneOf(0.0, 0.05, 0.1)
      } yield (part, qty, price, disc))
    } yield rows) { rows =>
      val s = spark
      import s.implicits._
      val li = rows.map { case (p, q, pr, d) => (p, q.toDouble, pr, d) }
        .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val r = graft.ops.AreaTopProducts.smallQuantityRevenue(li)
        .collect().head
      val byPart = rows.groupBy(_._1).map { case (p, xs) =>
        p -> ((xs.map(_._2).sum, xs.size.toLong)) }
      val sel = rows.filter { case (p, q, _, _) =>
        val (sq, c) = byPart(p); 5L * q * c < sq }
      val cents = sel.map { case (_, _, pr, d) =>
        math.floor(pr * (1.0 - d) * 100.0).toLong }.sum
      r.getAs[Long]("n_items") == sel.size.toLong &&
        r.getAs[Long]("revenue_cents") == cents
    }

  property("dedupThresholdCurve: monotone; operating-point row == q22 set") =
    forAll(genDocs) { rows =>
      val docs = docsDf(rows)
      val ts = Seq(5000L, 8000L, 10000L)
      val out = graft.ops.Dedup.dedupThresholdCurve(docs, ts).collect()
        .map(r => r.getAs[Long]("threshold_bp") ->
          ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_dropped"))))
        .toMap
      val p8000 = graft.ops.Dedup.minhashDedupPairs(docs, 8000L)
        .select("doc_b").collect().map(_.getLong(0)).toSeq
      val mono = ts.sorted.sliding(2).forall {
        case Seq(a, b) => out(a)._1 >= out(b)._1 && out(a)._2 >= out(b)._2
        case _ => true
      }
      mono && out(8000L)._1 == p8000.size.toLong &&
        out(8000L)._2 == p8000.distinct.size.toLong
    }

  property("morton: expression == bit-loop reference on arbitrary longs") =
    forAll(Gen.listOfN(8, for {
      a <- Gen.choose(Long.MinValue, Long.MaxValue)
      b <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (a, b))) { ps =>
      val s = spark; import s.implicits._
      def ref(a: Long, b: Long): Long = {
        val (x, y) = (a & 0x7FFFFFFFL, b & 0x7FFFFFFFL)
        (0 until 31).map { i =>
          (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        }.reduce(_ | _)
      }
      val got = ps.toDF("a", "b")
        .select(graft.expressions.MortonCode.morton(col("a"), col("b")))
        .as[Long].collect().toSeq
      got == ps.map { case (a, b) => ref(a, b) }
    }

  property("equiDepthBins == JVM last-rank recompute; rows conserved") =
    forAll(Gen.choose(1, 6),
      Gen.nonEmptyListOf(Gen.choose(0L, 20L))) { (nb, vals) =>
      val s = spark; import s.implicits._
      val got = graft.ops.Percentiles.equiDepthBins(vals.toDF("v"), "v", nb)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val n = vals.size.toLong
      val hist = vals.groupBy(identity).map { case (v, xs) =>
        (v, xs.size.toLong) }.toSeq.sortBy(_._1)
      val cums = hist.scanLeft(0L)(_ + _._2).tail
      val want = hist.zip(cums)
        .map { case ((v, c), cum) => ((cum - 1) * nb / n + 1, v, c) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, xs) =>
          (b, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max) }
      got == want && got.map(_._2).sum == n
    }

  property("neymanAllocation: quotas sum to budget; weights are exact integer sqrt") =
    forAll(
      Gen.nonEmptyListOf(for {
        st <- Gen.oneOf("A", "B", "C", "D")
        cents <- Gen.choose(0L, 100000L)
      } yield (st, cents)),
      Gen.choose(0L, 50L)) { (rows, budget) =>
      val s = spark; import s.implicits._
      val got = graft.ops.StratifiedExtract.neymanAllocation(
        rows.toDF("stratum", "cents"), "stratum", "cents", budget)
        .collect().map(r => (r.getAs[String]("stratum"),
          r.getAs[Long]("ney_weight"), r.getAs[Long]("alloc")))
      def isqrt(v: BigInt): BigInt =
        if (v < 2) v
        else {
          var x = BigInt(1) << ((v.bitLength + 2) / 2)
          var y = (x + v / x) / 2
          while (y < x) { x = y; y = (x + v / x) / 2 }
          x
        }
      val want = rows.groupBy(_._1).map { case (st, xs) =>
        val n = BigInt(xs.size)
        val sum = xs.map(x => BigInt(x._2)).sum
        val sq = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
        st -> isqrt(n * sq - sum * sum)
      }
      got.map(_._3).sum == budget &&
        got.forall { case (st, w, _) => BigInt(w) == want(st) }
    }

  property("kendallDaily == JVM pair enumeration (concordant/discordant/ties)") =
    forAll(Gen.nonEmptyListOf(for {
      day <- Gen.choose(1, 12)
      p <- Gen.choose(1L, 5L)
    } yield (day, p))) { rows =>
      val s = spark; import s.implicits._
      val orders = rows.zipWithIndex.map { case ((day, p), i) =>
        (i.toLong, 1L, "O", p.toDouble,
          java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), "x")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val r = graft.ops.Retention.kendallDaily(orders).collect().head
      val daily = rows.groupBy(_._1).map { case (d, xs) =>
        (d, xs.size.toLong, xs.map(_._2 * 100L).sum) }.toSeq.sortBy(_._1)
      val pairs = for {
        (Seq(a, b)) <- daily.combinations(2).toSeq
      } yield math.signum((b._2 - a._2).toDouble *
        (b._3 - a._3).toDouble).toLong
      r.getAs[Long]("n_days") == daily.size.toLong &&
        r.getAs[Long]("n_pairs") == pairs.size.toLong &&
        r.getAs[Long]("n_concordant") == pairs.count(_ == 1L).toLong &&
        r.getAs[Long]("n_discordant") == pairs.count(_ == -1L).toLong &&
        r.getAs[Long]("n_ties") == pairs.count(_ == 0L).toLong
    }

  property("replenishmentCycle == JVM gap median over pooled user-item days") =
    forAll(Gen.nonEmptyListOf(for {
      user <- Gen.choose(1L, 3L)
      item <- Gen.choose(1L, 3L)
      day <- Gen.choose(1, 20)
    } yield (user, item, day))) { rows =>
      val s = spark; import s.implicits._
      val events = rows.zipWithIndex.map { case ((u, it, d), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"),
          u, "purchase", 1.0, s"""{"k":$it}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.ops.Market.replenishmentCycle(events, minIntervals = 1L)
        .as[(Long, Long, Long)].collect()
        .map { case (k, v, m) => k -> ((v, m)) }.toMap
      val want = rows.map(r => (r._1, r._2) -> r._3).groupBy(_._1)
        .toSeq.flatMap { case ((_, item), xs) =>
          val days = xs.map(_._2).distinct.sorted
          days.sliding(2).collect { case Seq(a, b) => (item, (b - a).toLong) }
        }.groupBy(_._1).map { case (item, gs) =>
          val sorted = gs.map(_._2).sorted
          val n = sorted.size
          val med = (sorted((n - 1) / 2) + sorted(n / 2)) / 2
          item -> ((n.toLong, med))
        }
      got == want
    }

  property("pruningAudit conservation: scan ⊇ select per probe; selects partition the table") =
    forAll(Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 200L); b <- Gen.choose(0L, 200L)
    } yield (a, b))) { rows =>
      val s = spark; import s.implicits._
      val out = graft.ops.Layout.pruningAudit(rows.toDF("x", "y"),
        "x", "y", gridBits = 8, cellBits = 4, probes = 4).collect()
      val perDim = out.groupBy(_.getAs[String]("dim"))
      out.forall(r => r.getAs[Long]("scan_rows") >= r.getAs[Long]("select_rows")) &&
        perDim.values.forall(
          _.map(_.getAs[Long]("select_rows")).sum == rows.size.toLong)
    }

  property("orderBacklog conservation: Σopened − Σclosed == final open; value likewise") =
    forAll(Gen.nonEmptyListOf(for {
      order <- Gen.choose(1L, 12L)
      openD <- Gen.choose(0, 20)
      shipLag <- Gen.choose(0, 15)
      price <- Gen.choose(1, 500)
    } yield (order, openD, openD + shipLag, price))) { rows0 =>
      val s = spark; import s.implicits._
      // one header per order (first wins), possibly several lines
      val hdr = rows0.groupBy(_._1).toSeq.map { case (o, xs) => xs.head }
      def d(i: Int) = Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(math.max(i, 0).toLong).atStartOfDay())
      val orders = hdr.map { case (o, od, _, p) => (o, d(od), p / 10.0) }
        .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val li = rows0.map { case (o, _, sd, _) => (o, d(sd)) }
        .toDF("l_orderkey", "l_shipdate")
      val out = graft.ops.Retention.orderBacklog(li, orders).collect()
      val opened = out.map(_.getAs[Long]("opened")).sum
      val closed = out.map(_.getAs[Long]("closed")).sum
      val lastOpen = out.last.getAs[Long]("open_eod")
      // every generated order has >=1 line, so all eventually close
      opened - closed == lastOpen && lastOpen == 0L &&
        out.last.getAs[Long]("open_cents_eod") == 0L
    }

  property("clusteringCoefficient == JVM brute force per degree band") =
    forAll(Gen.nonEmptyListOf(for {
      a <- Gen.choose(1L, 7L); b <- Gen.choose(1L, 7L) if a != b
    } yield if (a < b) (a, b) else (b, a))) { es0 =>
      val es = es0.distinct
      val s = spark; import s.implicits._
      val got = graft.ops.Graph.clusteringCoefficient(
        es.map { case (a, b) => (a, b, 1L) }
          .toDF("item_a", "item_b", "pair_sessions"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, xs) => k -> xs.map(_._2).toSet }
      val ccs = adj.toSeq.filter(_._2.size >= 2).map { case (v, ns) =>
        val t = ns.toSeq.combinations(2)
          .count { case Seq(x, y) => adj(x).contains(y) }
        val deg = ns.size.toLong
        val bp = math.floor(10000.0 * 2 * t / (deg * (deg - 1))).toLong
        (63 - java.lang.Long.numberOfLeadingZeros(deg), bp)
      }
      val want = ccs.groupBy(_._1.toLong).toSeq.sortBy(_._1)
        .map { case (band, xs) =>
          val bps = xs.map(_._2)
          (band, xs.size.toLong, bps.sum / bps.size, bps.min, bps.max)
        }
      got == want
    }

  property("weightedQuantileTable == JVM weight-mass nearest rank") =
    forAll(Gen.nonEmptyListOf(for {
      v <- Gen.choose(1, 50); w <- Gen.choose(0L, 9L)
    } yield (v.toDouble, w.toDouble))) { rows =>
      val s = spark; import s.implicits._
      val ranks = Seq(2500L, 5000L, 9900L)
      val got = graft.ops.Percentiles.weightedQuantileTable(
        rows.map { case (v, w) => ("g", v, w) }.toDF("grp", "v", "w"),
        "grp", "v", "w", ranks).collect()
        .map(r => r.getAs[Long]("rank_bp") ->
          Option(r.getAs[java.lang.Long]("value_cents")).map(_.toLong))
        .toMap
      val hist = rows.groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(x => math.floor(x._2).toLong).sum
      }.toSeq.sortBy(_._1)
      val tw = hist.map(_._2).sum
      val want = ranks.map { p =>
        p -> (if (tw <= 0L) None
        else {
          val need = (tw * p + 9999L) / 10000L
          var cum = 0L
          hist.collectFirst {
            case (v, w) if { cum += w; cum >= need } =>
              math.floor(v * 100).toLong
          }
        })
      }.toMap
      got == want
    }

  property("bfsReach == JVM BFS min-hop from the deg-max seed") =
    forAll(Gen.nonEmptyListOf(for {
      a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L) if a != b
    } yield (a, b))) { es0 =>
      val s = spark; import s.implicits._
      val es = es0.flatMap(e => Seq(e, e.swap)).distinct
      val got = graft.ops.Graph.bfsReach(es.toDF("src", "dst"), maxHops = 3)
        .as[(Long, Long)].collect().toMap
      val adj = es.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
      val seed = adj.toSeq.map { case (k, ns) => (-ns.size, k) }.min._2
      val want = scala.collection.mutable.Map(seed -> 0L)
      var frontier = Set(seed)
      for (h <- 1 to 3) {
        frontier = frontier.flatMap(adj(_)).filterNot(want.contains)
        frontier.foreach(want(_) = h.toLong)
      }
      got == want.toMap
    }
}
