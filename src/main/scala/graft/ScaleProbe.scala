package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling check. Replays the sf0.1 tables at an
  * N× multiplier (union of shifted copies — key spaces kept disjoint
  * so join/group cardinalities scale with the data) and times the
  * heavyweight operators. A healthy operator scales ~linearly; a
  * pair-blowup or single-reducer funnel shows up as superlinear time.
  *
  *   sbt "runMain graft.ScaleProbe [multiplier]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      // collect_set/collect_list aggregates (bounded per-group sets:
      // <=25 nation tokens, <=5 event types, fixed-width minhash sigs)
      // otherwise fall back to sort-based aggregation after only 128
      // distinct groups per task -- a full sort of the fact table.
      // 256k in-memory groups x ~100 B of set payload stays well under
      // executor memory at 32 tasks while keeping the agg hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, idCols: Seq[String], shift: Long): DataFrame =
      (0 until mult).map { i =>
        idCols.foldLeft(df) { (d, c) => d.withColumn(c, col(c) + lit(i * shift)) }
      }.reduce(_ union _)

    // dev bisection: SPARK_GRAFT_PROBE_ONLY=substr,substr limits the
    // run (probe timings are only comparable from an idle machine, so
    // re-measuring a few ops must not cost a full sweep)
    val only: Seq[String] = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
    def t(name: String)(df: => DataFrame): Unit =
      if (only.isEmpty || only.exists(name.contains)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scale] $name (x$mult): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val events = amplify(graft.tables.Tables(spark, dir, "events"),
      Seq("event_id", "user_id"), 10000000L)
    val docs = amplify(graft.tables.Tables(spark, dir, "documents"),
      Seq("doc_id"), 10000000L)
    val emb = amplify(graft.tables.Tables(spark, dir, "embeddings"),
      Seq("vec_id"), 10000000L)
    // fact-side amplification for the star queries: order keys shift in
    // lockstep so lineitem⋈orders stays 1:N; customer keys are NOT
    // shifted (dimensions don't grow), so each customer simply has
    // mult× the orders — the realistic way a fact table scales.
    val lineitem = amplify(graft.tables.Tables(spark, dir, "lineitem"),
      Seq("l_orderkey"), 100000000L)
    val orders = amplify(graft.tables.Tables(spark, dir, "orders"),
      Seq("o_orderkey"), 100000000L)
    def dim(n: String) = graft.tables.Tables(spark, dir, n)

    t("sessionize+aggregate")(graft.ops.Sessionize(events))
    t("area top products")(graft.ops.AreaTopProducts(
      lineitem, orders, dim("customer"), dim("nation"), dim("region"), dim("part")))
    // user_id stays unshifted here: ad clicks join user→customer, and
    // the dimension doesn't grow — each user just clicks mult× more.
    val eventsSameUsers = amplify(graft.tables.Tables(spark, dir, "events"),
      Seq("event_id"), 10000000L)
    t("click trend")(graft.ops.AdAnalytics.clickTrend(
      graft.ops.AdAnalytics.eventsAsAdClicks(
        eventsSameUsers, dim("customer"), dim("nation"), dim("region"))))
    t("stratified extract")(graft.ops.StratifiedExtract(
      graft.ops.Sessionize(events), target = 1000L))
    t("top sessions/category")(graft.ops.TopK.topSessionsPerCategory(
      graft.ops.Sessionize.assignSessions(events)))
    t("user_visit_action ingest")(graft.ingest.UserVisitAction.fromEvents(events))
    t("category action explode")(graft.ingest.UserVisitAction.topCategories(
      graft.ingest.UserVisitAction.fromEvents(events)))
    t("minhash dedup pairs")(graft.ops.Dedup.minhashDedupPairs(docs))
    t("ngram dedup kept")(graft.ops.Dedup.ngramDedupKept(docs))
    t("simhash signatures")(graft.ops.Dedup.simhash(docs))
    t("simhash pairs")(graft.ops.Dedup.simhashPairs(docs))
    t("embedding neardup")(graft.ops.Similarity.nearDupPairs(emb))
    t("winnow fingerprints")(graft.ops.TextAnalysis.winnowFingerprints(docs))
    // FIXED query set (base replica only): `% 500` alone also matches
    // every amplified copy, which silently scales the query side with
    // the corpus and reads as superlinear growth (measured 5.6× at 2×
    // on ivf before the bound) — the claim under test is corpus
    // growth at constant probe load.
    val fixedQ = col("vec_id") % 500 === 0 && col("vec_id") < 10000000L
    t("knn bruteforce")(graft.ops.Similarity.knnBruteForce(emb, fixedQ))
    t("ivf ann")(graft.ops.Similarity.ivfAnn(emb, fixedQ))
    // amplified docs multiply the PAIR set mult× (each replica block
    // reproduces the original's near-dup pairs); rounds must stay flat
    // (log of the largest cluster, not of the corpus).
    t("neardup clusters")(graft.ops.Clustering.nearDupClusters(docs))
    t("asof last purchase")(graft.ops.AsOfJoin.clickLastPurchase(events))
    t("line dedup")(graft.ops.TextClean.dedupLines(docs, lineTokens = 2))
    t("pii scrub")(graft.ops.TextClean.piiScrub(docs))
    t("repetition metrics")(graft.ops.TextClean.repetitionMetrics(docs, 2))
    t("range join window")(graft.ops.RangeJoin.purchasesBeforeClicks(events))
    t("vocab top")(graft.ops.TextAnalysis.vocabTop(docs))
    // amplified batch vs the UNAMPLIFIED corpus — the steady-state
    // shape (batch grows, corpus index is what it is). Batch ids are
    // offset first: the operator requires disjoint id spaces.
    val batchDocs = amplify(graft.tables.Tables(spark, dir, "documents")
      .withColumn("doc_id", col("doc_id") + lit(500000000L)), Seq("doc_id"), 10000000L)
    t("incremental dedup")(graft.ops.Dedup.incrementalDedupKept(
      batchDocs, graft.tables.Tables(spark, dir, "documents")))
    t("kmeans fit")(graft.ops.KMeans.fit(emb))
    t("semdedup kept")(graft.ops.KMeans.semDedupKept(emb))
    // steady-state decontamination shape: the corpus grows mult×, the
    // benchmark set stays what it is (eval suites don't scale with
    // training data) — cost must track the corpus map stage.
    t("decontaminate")(graft.ops.Contamination.flagged(
      docs, graft.tables.Tables(spark, dir, "documents")
        .filter(col("doc_id") % 5 === 0)))
    t("pack sequences")(graft.ops.TrainingPrep.packSequences(docs, shards = 32))
    t("context chunks")(graft.ops.TrainingPrep.chunk(docs))
    // PQ at a growing corpus with a FIXED query set: encode cost is the
    // map stage, ADC cost is candidates × m lookups — both linear.
    t("pq adc ann")(graft.ops.ProductQuant.adcTopK(
      emb, col("vec_id") === 0 || col("vec_id") === 10000050L))
    // amplified docs multiply every gram's count mult× (replica blocks
    // repeat the text), so the duplicated-gram set grows ~linearly and
    // the join-back explode stays proportional — superlinear time here
    // means the dup set stopped collapsing map-side.
    t("substring dup spans")(graft.ops.Dedup.substringDupSpans(docs))
    // growing corpus, FIXED query set: postings of query terms grow
    // linearly, everything else is broadcast-sized.
    t("bm25 topk")(graft.ops.Retrieval.bm25TopK(docs,
      graft.ops.Retrieval.demoQueries(spark)))
    t("curriculum buckets")(graft.ops.TrainingPrep.curriculumBuckets(docs))
    // vocab-grain invariance: amplified docs multiply word FREQUENCIES,
    // not the vocabulary, so per-round pair-count work must stay ~flat
    // after the one corpus-grain collapse.
    t("bpe learn 3r")(graft.ops.Bpe.learn(docs))
    // user dimension amplified with the facts here: retention work is
    // (user, day)-grain, so cost tracks users × active days.
    t("cohort retention")(graft.ops.Retention.cohortRetention(events,
      ("2024-01-01", "2024-12-31")))
    // HISTORY growth: same users, mult× longer history (each copy
    // shifts time by 35 days). The required window keeps per-user
    // state flat — this probe must NOT scale with mult beyond the
    // scan, unlike the amplified-users probe above.
    val eventsLongHistory = (0 until mult).map { i =>
      graft.tables.Tables(spark, dir, "events")
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 35} DAYS"))
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
    }.reduce(_ union _)
    t("cohort retention (windowed, long history)")(
      graft.ops.Retention.cohortRetention(eventsLongHistory,
        ("2024-01-01", "2024-01-31")))
    t("active users 7d")(graft.ops.Retention.activeUsers(events))
    // exact vs approx side by side: exact n_distinct pays the Expand
    // (rows × aggregates, full-text shuffle — spills first as data
    // grows); the HLL variant is the documented 100 TB path and must
    // stay ~linear where exact goes superlinear.
    t("profile exact")(graft.ops.Profile.profile(docs,
      Seq("doc_id", "text", "lang", "source")))
    t("profile approx")(graft.ops.Profile.profileApprox(docs,
      Seq("doc_id", "text", "lang", "source")))
    t("hard negatives")(graft.ops.Similarity.hardNegatives(emb, fixedQ))
    // amplified USERS (disjoint id blocks): sessions scale mult×, the
    // item catalog does not — pair work must track sessions × C(cap,2)
    // and the pair-domain aggregate must stay catalog-bounded.
    t("covisitation pairs")(graft.ops.Market.coVisitPairs(events))
    t("transition matrix")(graft.ops.Market.transitions(events))
    // the covisit GRAPH is catalog-bounded: amplified sessions thicken
    // edges (higher counts), they don't add nodes — per-round join
    // work must stay flat while the basket pass scales linearly.
    t("pagerank 3r")(graft.ops.Graph.pageRank(
      graft.ops.Graph.symmetric(graft.ops.Market.coVisitPairs(events), 2L),
      iters = 3, assumeNoDangling = true))
    t("rfm tiers")(graft.ops.Retention.rfm(events, "2024-12-31"))
    t("ordered funnel")(graft.ops.PageFunnel.orderedFunnel(spark,
      graft.ops.Sessionize.assignSessions(events),
      Seq("signup", "view", "click", "purchase")))
    // containment rides the q22 blocking: amplified docs multiply
    // candidate pairs mult× (replica blocks), verification is
    // pair-bounded like minhash dedup above.
    t("containment pairs")(graft.ops.Dedup.containmentPairs(docs))
    t("source overlap")(graft.ops.Dedup.sourceOverlap(docs))
    t("source diversity")(graft.ops.TextAnalysis.sourceDiversity(docs))
    t("pps sample")(graft.ops.TrainingPrep.ppsSample(docs, shards = 32))
    t("next-item pairs")(graft.ops.Market.nextItemPairs(events))
    // recall eval is query-set-grain: amplified corpus grows the two
    // underlying scans linearly, the merge/aggregate stays probe-sized
    t("ann recall")(graft.ops.Similarity.annRecall(emb, fixedQ))
    // eval side FIXED (unamplified) while train amplifies mult× — the
    // broadcast contract: train-side map work scales linearly, nothing
    // else should move
    t("fuzzy decontaminate")(graft.ops.Contamination.fuzzyFlagged(
      docs, graft.tables.Tables(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 7)))
    // rides the neardup-clusters probe above + one source-grain agg
    t("dedup impact")(graft.ops.Clustering.dedupImpact(docs))
    t("pii prevalence")(graft.ops.TextClean.piiPrevalence(docs))
    // amplified ARRIVING batch vs the unamplified corpus index (the
    // incremental-dedup probe's shape) + the flag join and
    // source-grain rollup — must track the incremental-dedup probe
    t("incremental savings")(graft.ops.Dedup.incrementalSavingsReport(
      batchDocs, graft.tables.Tables(spark, dir, "documents")))
    // per-shard sort of corpus/S rows — the one legitimate sort; more
    // shards at scale keeps each sort bounded (32 here vs 8 in tests)
    t("shard shuffle")(graft.ops.TrainingPrep.shardShuffle(docs, shards = 32))
    t("tokenizer fertility")(graft.ops.TextAnalysis.tokenizerFertility(docs))
    t("value drift")(graft.ops.Retention.valueDrift(events, "2024-01-16"))
    t("length histogram")(graft.ops.TextAnalysis.lengthHistogram(docs))
    // query set bounded to the base id range (the fixedQ convention)
    t("rerank topk")(graft.ops.ProductQuant.rerankTopK(emb, fixedQ))
    t("bot sessions")(graft.ops.Sessionize.botSessions(events))
    t("dwell time")(graft.ops.Sessionize.dwellTime(events))
    // target side FIXED (base replica only): DSIR's target is a
    // curated seed that does not grow with the crawl
    t("dsir score")(graft.ops.TrainingPrep.dsirScore(docs,
      graft.tables.Tables(spark, dir, "documents")
        .filter(col("source") === "src0")))
    t("budget select")(graft.ops.TrainingPrep.budgetSelect(
      graft.ops.TextAnalysis.qualityClassifier(docs),
      // budget scales with the corpus so the threshold stays interior
      // (an all-full or all-dropped run measures the wrong regime)
      20000L * mult))
    t("windowed funnel")(graft.ops.PageFunnel.windowedFunnel(spark,
      graft.ops.Sessionize.assignSessions(events),
      Seq("signup", "view", "click", "purchase"), 600L))
    // eval side FIXED (base replica only): the benchmark does not
    // grow with the crawl — same contract as the decontaminate probe
    t("eval contamination")(graft.ops.Contamination.evalContamination(
      docs.filter(col("doc_id") % 5 =!= 0),
      graft.tables.Tables(spark, dir, "documents")
        .filter(col("doc_id") % 5 === 0), 8))
    // dense grid is shards × sources (metadata) — only the one
    // (shard, source) aggregate should scale
    t("shard mixing")(graft.ops.TrainingPrep.shardMixing(docs, shards = 32))
    t("threshold sweep")(graft.ops.TrainingPrep.thresholdSweep(
      graft.ops.TextAnalysis.qualityClassifier(docs)))
    t("signal agreement")(graft.ops.TextAnalysis.signalAgreement(docs))
    t("ivf balance")(graft.ops.Similarity.ivfBalance(emb))
    t("script mix")(graft.ops.TextAnalysis.scriptMix(docs))
    // the line-grain aggregate absorbs the amplified corpus; replica
    // copies make every line cross-doc shared, the worst case for the
    // minDocs gate
    t("boilerplate lines")(graft.ops.TextClean.boilerplateLines(docs,
      lineTokens = 2))
    t("attribution")(graft.ops.Sessionize.attribution(events))
    // amplified replicas duplicate every gram: novelty collapses to 0
    // but the gram window + doc re-aggregate see the full load
    t("doc novelty")(graft.ops.Dedup.docNovelty(docs))
    // head size fixed (a pruned LM doesn't grow with the corpus); the
    // scoring explode+join scales linearly
    t("surprisal")(graft.ops.TextAnalysis.surprisal(docs))
    t("session paths")(graft.ops.Sessionize.sessionPaths(events))
    // deny list FIXED (base ids only): an erasure batch doesn't grow
    // with the fact tables — each scan+flag join scales linearly
    t("erasure audit") {
      val customer = dim("customer")
      graft.ops.Erasure.erasureAudit(
        customer.filter(col("c_custkey") % 53 === 0)
          .select(col("c_custkey").as("user_id")),
        customer, orders, lineitem, eventsSameUsers)
    }
    t("cluster size histogram")(
      graft.ops.Clustering.clusterSizeHistogram(docs))
    t("compaction plan")(graft.ops.TrainingPrep.compactionPlan(docs))
    t("recency sample")(graft.ops.TrainingPrep.recencySample(
      events, "2024-01-28"))
    t("contributor cap")(graft.ops.TrainingPrep.contributorCap(events))
    t("preference pairs")(graft.ops.TrainingPrep.preferencePairs(docs))
    t("ltv curve")(graft.ops.Retention.ltvCurve(events,
      ("2024-01-01", "2024-01-31")))
    t("boilerplate scrub")(graft.ops.TextClean.boilerplateScrub(docs,
      lineTokens = 2))
    t("local supplier revenue")(graft.ops.AreaTopProducts
      .localSupplierRevenue(lineitem, orders, dim("customer"),
        dim("supplier"), dim("nation"), dim("region"),
        "ASIA", "1996-01-01", "1997-01-01"))
    t("key skew")(graft.ops.Profile.keySkew(events, "user_id"))
    t("props schema")(graft.ops.Profile.propsSchema(events))
    t("quantile table")(graft.ops.Percentiles.quantileTable(
      events, "event_type", "value"))
    t("embedding health")(graft.ops.Similarity.embeddingHealth(emb))
    t("modality coverage")(graft.ops.Profile.modalityCoverage(docs, emb))
    t("daily pivot")(graft.ops.Retention.dailyActivityPivot(events,
      Seq("click", "error", "purchase", "signup", "view")))
    t("centroid drift")(graft.ops.Similarity.centroidDrift(emb,
      col("vec_id") % 3 =!= 0))
    t("return times")(graft.ops.Retention.returnTimes(events))
    t("hourly profile")(graft.ops.Retention.hourlyProfile(events))
    t("verdict fusion")(graft.ops.Dedup.verdictFusion(docs))
    // rides the pack-sequences probe's one shard shuffle, then
    // collapses to shard grain — only the cumsum pass should scale
    t("packing efficiency")(graft.ops.TrainingPrep.packingEfficiency(
      docs, shards = 32))
    t("srm check")(graft.ops.Experiment.srmCheck(events))
    t("ab lift")(graft.ops.Experiment.abLift(events))
    // sketch vs exact schema profile, the q73 profile-pair contrast:
    // approx must stay linear where exact pays the (key, value) grain
    t("props schema approx")(graft.ops.Profile.propsSchemaApprox(events))
    t("cuped lift")(graft.ops.Experiment.cupedLift(events, "2024-01-16"))
    t("winsorized lift")(graft.ops.Experiment.winsorizedLift(events))
    // amplified facts on both child and parent roles; work is key-grain
    t("ref integrity")(graft.ops.Integrity.refIntegrity(Seq(
      graft.ops.Integrity.Edge("lineitem_orders", lineitem, "l_orderkey",
        orders, "o_orderkey"),
      graft.ops.Integrity.Edge("orders_customer", orders, "o_custkey",
        dim("customer"), "c_custkey"),
      graft.ops.Integrity.Edge("events_customer", eventsSameUsers,
        "user_id", dim("customer"), "c_custkey"))))
    t("time to convert")(graft.ops.Integrity.timeToConvert(events))
    // both fact sides amplified: key-grain collapse must absorb the
    // growth before the key join
    t("join fanout")(graft.ops.Integrity.joinFanout(
      eventsSameUsers, "user_id", orders, "o_custkey"))
    t("profile drift")(graft.ops.Profile.profileDrift(events, "ts",
      "2024-01-16", Seq("event_type", "props", "value", "user_id")))
    // pair set grows with session count; the census must ride it
    t("triangles")(graft.ops.Graph.triangleStats(
      graft.ops.Market.coVisitPairs(events), minWeight = 2L))
    t("ann mrr")(graft.ops.Similarity.annMrr(emb,
      col("vec_id") % 50 === 0))
    t("decayed popularity")(graft.ops.Market.decayedPopularity(
      events, "2024-02-01"))
    // both roles are amplified facts; work is key-grain
    t("key balance")(graft.ops.Integrity.keyBalance(Seq(
      ("events_user_id", eventsSameUsers, "user_id"),
      ("orders_custkey", orders, "o_custkey"),
      ("lineitem_orderkey", lineitem, "l_orderkey"))))
    // both fact sides amplified in lockstep (1:N preserved); customer
    // is the unamplified dim — Q3's selective-filter star shape
    t("shipping priority")(graft.ops.AreaTopProducts.shippingPriority(
      lineitem, orders, dim("customer"), "BUILDING", "1998-01-01"))
    t("entry exit")(graft.ops.Sessionize.entryExit(events))
    // header+detail amplified in lockstep; work is order-grain
    t("order reconciliation")(graft.ops.Integrity.orderReconciliation(
      orders, lineitem))
    t("association rules")(graft.ops.Market.associationRules(events))
    t("length quantiles")(graft.ops.Percentiles.quantileTable(
      docs.filter(col("text").isNotNull).select(col("source"),
        size(expr(graft.ops.TextAnalysis.TokensExpr)).cast("long")
          .as("tok_len")), "source", "tok_len"))
    t("classifier calibration")(
      graft.ops.TextAnalysis.classifierCalibration(docs))
    t("key churn")(graft.ops.Profile.keyChurn(events, "user_id", "ts",
      "2024-01-16"))
    t("funnel by arm")(graft.ops.PageFunnel.windowedFunnelByArm(spark,
      graft.ops.Sessionize.assignSessions(events),
      Seq("signup", "view", "click", "purchase"), 600L))
    t("sequential rules")(graft.ops.Market.sequentialRules(events))
    t("returned revenue")(graft.ops.AreaTopProducts.returnedRevenue(
      lineitem, orders, dim("customer"), dim("nation"),
      "1996-01-01", "1997-01-01"))
    t("part concentration")(graft.ops.AreaTopProducts.partConcentration(
      lineitem))
    t("promo revenue")(graft.ops.AreaTopProducts.promoRevenue(
      lineitem, dim("part")))
    t("market share")(graft.ops.AreaTopProducts.marketShare(
      lineitem, orders, dim("customer"), dim("supplier"), dim("nation"),
      dim("region"), "ASIA"))
    t("bracket revenue")(graft.ops.AreaTopProducts.disjunctiveRevenue(
      lineitem, dim("part"), Seq(
        ("Brand#1", 1, 15, 1, 20), ("Brand#2", 10, 30, 10, 35),
        ("Brand#3", 20, 50, 20, 50))))
    t("idle customers")(graft.ops.AreaTopProducts.idleCustomers(
      dim("customer"), orders, dim("nation"), "2000-01-01"))
    t("engagement gini")(graft.ops.Profile.engagementInequality(
      events, "user_id"))
    t("next item backtest")(graft.ops.Market.nextItemBacktest(
      events, "2024-01-16"))
    t("dedup threshold curve")(graft.ops.Dedup.dedupThresholdCurve(
      docs, Seq(5000L, 6000L, 7000L, 8000L, 9000L, 10000L)))
    t("top supplier")(graft.ops.AreaTopProducts.topSupplier(
      lineitem, dim("supplier"), "1996-01-01", "1996-04-01"))
    t("small qty revenue")(graft.ops.AreaTopProducts.smallQuantityRevenue(
      lineitem))
    t("large orders")(graft.ops.AreaTopProducts.largeOrders(
      lineitem, orders, dim("customer"), 150L))
    t("cluster quality")(graft.ops.Clustering.clusterQualityProfile(docs))
    t("revenue seasonality")(graft.ops.Retention.revenueSeasonality(orders))
    t("order gap quantiles")(graft.ops.Retention.orderGapQuantiles(
      orders, dim("customer"), Seq(5000L, 9000L, 9900L)))
    t("pareto coverage")(graft.ops.Profile.paretoCoverage(orders))
    t("yoy growth")(graft.ops.Retention.yoyMonthlyGrowth(orders))
    t("priority mix")(graft.ops.Retention.priorityMixShift(orders))
    t("nation movers")(graft.ops.AreaTopProducts.nationRankMovers(
      lineitem, orders, dim("customer"), dim("nation")))
    t("discount bands")(graft.ops.AreaTopProducts.discountBands(lineitem))
    // same-users amplification (the q93 pagerank shape): the co-vis
    // graph grows with SESSIONS per user, the expensive regime
    t("bfs reach")(graft.ops.Graph.bfsReach(
      graft.ops.Graph.symmetric(
        graft.ops.Market.coVisitPairs(eventsSameUsers), 2L), 3))
    t("seasonal deviation")(graft.ops.Retention.seasonalDeviation(orders))
    t("source datacard")(graft.ops.Profile.sourceDatacard(docs))
    t("anomaly sessions")(graft.ops.Retention.anomalySessionOverlap(events))
    t("zorder cells")(graft.ops.Layout.zorderCells(
      lineitem, "l_partkey", "l_suppkey"))
    t("covis components")(graft.ops.Graph.componentSizes(
      graft.ops.Market.coVisitPairs(eventsSameUsers), 2L))
    t("triple itemsets")(graft.ops.Market.tripleItemsets(eventsSameUsers))
    t("equidepth bins")(graft.ops.Percentiles.equiDepthBins(
      lineitem.select(floor(col("l_extendedprice") * lit(100.0))
        .cast("long").as("cents")), "cents", 10))
    t("neyman allocation")(graft.ops.StratifiedExtract.neymanAllocation(
      orders.select(col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents")),
      "o_orderpriority", "cents", 1000L))
    t("churn features")(graft.ops.TrainingPrep.churnFeatures(
      eventsSameUsers, "2024-01-20", 11))
    t("gains table")(graft.ops.Experiment.gainsTable(
      graft.ops.TrainingPrep.churnFeatures(eventsSameUsers, "2024-01-20", 11),
      "n_events", "label", 10))
    t("theilsen trend")(graft.ops.Retention.theilSenTrend(orders))
    t("robust anomaly")(graft.ops.Retention.robustVolumeAnomaly(events))
    t("fulfillment latency")(graft.ops.AreaTopProducts.fulfillmentLatency(
      lineitem, orders, Seq(5000L, 9000L, 9900L)))
    t("growth accounting")(graft.ops.Retention.growthAccounting(events))
    t("revenue acf")(graft.ops.Retention.revenueAcf(orders))
    t("cusum revenue")(graft.ops.Retention.cusumRevenue(orders))
    t("benford audit")(graft.ops.Profile.benfordAudit(
      orders.select(floor(col("o_totalprice") * lit(100.0)).cast("long")
        .as("cents")), "cents"))
    val custQi = dim("customer").select(
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / lit(1000.0)).cast("long").as("balance_band"))
    t("k anonymity")(graft.ops.Profile.kAnonymityProfile(custQi,
      Seq("nation", "segment", "balance_band"), 5L))
    t("l diversity")(graft.ops.Profile.lDiversityProfile(custQi,
      Seq("nation", "balance_band"), "segment", 3L))
    t("seasonal backtest")(graft.ops.Retention.seasonalBacktest(orders))
    t("kendall daily")(graft.ops.Retention.kendallDaily(orders))
    t("lifecycle census")(graft.ops.Retention.lifecycleCensus(
      events, "2024-01-25"))
    t("skipgram pairs")(graft.ops.Market.skipGramPairs(eventsSameUsers))
    t("replenishment cycle")(graft.ops.Market.replenishmentCycle(
      eventsSameUsers))
    t("recsys coverage")(graft.ops.Market.recsysCoverage(eventsSameUsers,
      graft.ops.Market.coVisitPairs(eventsSameUsers), 2L))
    t("growth decomposition")(graft.ops.Retention.growthDecomposition(orders))
    t("order composition")(graft.ops.Retention.orderComposition(lineitem))
    val covisPairs = graft.ops.Market.coVisitPairs(eventsSameUsers)
      .localCheckpoint(false)
    t("pagerank weighted")(graft.ops.Graph.pageRankWeighted(
      covisPairs.filter(col("pair_sessions") >= 2L)
        .select(col("item_a").as("src"), col("item_b").as("dst"),
          col("pair_sessions").as("w"))
        .union(covisPairs.filter(col("pair_sessions") >= 2L)
          .select(col("item_b").as("src"), col("item_a").as("dst"),
            col("pair_sessions").as("w"))), 3))
    t("personalized pagerank")(graft.ops.Graph.personalizedPageRank(
      graft.ops.Graph.symmetric(covisPairs, 2L), 3))
    t("degree assortativity")(graft.ops.Graph.degreeAssortativity(
      covisPairs, 2L))
    t("bm25 known item")(graft.ops.Retrieval.bm25KnownItem(docs))
    t("token spectrum")(graft.ops.Retrieval.tokenSpectrum(docs))
    t("absorption prob")(graft.ops.Market.absorptionProbability(events))
    t("conversion hazard")(graft.ops.Retention.conversionHazard(events))
    t("audience overlap")(graft.ops.Market.audienceOverlap(eventsSameUsers))
    t("minhash calibration")(graft.ops.Dedup.minhashCalibration(docs))
    t("discount elasticity")(graft.ops.AreaTopProducts.discountElasticity(
      lineitem))
    t("dow type lift")(graft.ops.Retention.dowTypeLift(events))
    t("min cost supplier")(graft.ops.AreaTopProducts.minCostSupplier(
      lineitem, dim("part"), dim("supplier"), dim("nation"), dim("region"),
      "ASIA", Seq(5, 11, 23, 37, 44), "STANDARD"))
    t("product profit")(graft.ops.AreaTopProducts.productProfit(
      lineitem, orders, dim("part"), dim("supplier"), dim("nation"), "red"))
    t("important parts")(graft.ops.AreaTopProducts.importantParts(
      lineitem, dim("supplier"), dim("nation"), "NATION_3"))
    t("part supplier counts")(graft.ops.AreaTopProducts.partSupplierCounts(
      lineitem, dim("part"), dim("supplier"), "Brand#13", "PROMO",
      Seq(2, 7, 14, 21, 28, 35, 42, 49)))
    t("excess suppliers")(graft.ops.AreaTopProducts.excessSuppliers(
      lineitem, dim("supplier"), dim("nation"), "NATION_5"))
    t("pruning audit")(graft.ops.Layout.pruningAudit(
      lineitem, "l_partkey", "l_suppkey"))
    t("lsh planner")(graft.ops.Dedup.lshPlanner(docs))
    t("pq distortion")(graft.ops.ProductQuant.distortion(emb))
    t("ivf probe curve")(graft.ops.Similarity.ivfProbeCurve(
      emb, col("vec_id") % 500 === 0 && col("vec_id") < 10000000L))
    t("order backlog")(graft.ops.Retention.orderBacklog(lineitem, orders))
    t("doc keywords")(graft.ops.Retrieval.docKeywords(docs))
    t("clustering coeff")(graft.ops.Graph.clusteringCoefficient(
      graft.ops.Market.coVisitPairs(eventsSameUsers), 2L))
    t("t closeness")(graft.ops.Profile.tClosenessProfile(
      events.select(pmod(col("user_id"), lit(97L)).as("grp"),
        col("event_type").as("s")),
      Seq("grp"), "s"))
    t("grouping sets")(graft.ops.Percentiles.groupingSetsTotals(
      orders, "o_orderpriority", "o_orderstatus", "o_totalprice"))
    t("vocab growth")(graft.ops.Retrieval.vocabGrowth(docs))
    t("revenue bridge")(graft.ops.Retention.revenueBridge(
      orders, dim("customer"), dim("nation"), 1997))
    t("zero sales days")(graft.ops.Integrity.zeroSalesDays(lineitem))
    t("trailing revenue")(graft.ops.Retention.trailingRevenue(orders))
    t("cross source dups")(graft.ops.Integrity.crossSourceDups(docs))
    t("weighted quantiles")(graft.ops.Percentiles.weightedQuantileTable(
      lineitem, "l_returnflag", "l_extendedprice", "l_quantity",
      Seq(5000L, 9000L, 9900L)))
    t("duplicate orders")(graft.ops.Integrity.duplicateOrders(orders))
    t("price dispersion")(graft.ops.Integrity.priceDispersion(lineitem))
    t("linenumber audit")(graft.ops.Integrity.linenumberAudit(lineitem))
    t("mann whitney")(graft.ops.Experiment.mannWhitney(events))
    t("trailing median")(graft.ops.Retention.trailingMedianRevenue(orders))
    t("zipf decay")(graft.ops.TextAnalysis.zipfDecay(docs))
    t("link prediction")(graft.ops.Graph.linkPrediction(
      graft.ops.Market.coVisitPairs(events), minWeight = 2L))
    t("event burst dedup")(graft.ops.Dedup.eventBurstDedup(events))
    t("layout compare")(graft.ops.Layout.layoutCompare(
      lineitem, "l_partkey", "l_suppkey"))
    t("ewma revenue")(graft.ops.Retention.ewmaRevenue(orders))
    t("signal kappa")(graft.ops.TextAnalysis.signalKappa(docs))
    t("chi square lift")(graft.ops.Experiment.chiSquareLift(events))
    t("quantile normalize")(graft.ops.TrainingPrep.quantileNormalize(events))
    // FIXED probe set under amplification (modulus scales with mult):
    // eval probes are a sampled set by contract — growing them with
    // the corpus would measure eval-set growth, not index scaling
    // (the q229 capped-probe lesson)
    t("rrf fusion")(graft.ops.Similarity.rrfFusion(emb,
      col("vec_id") % (50L * mult) === 0))
    t("kcore")(graft.ops.Graph.kcore(
      graft.ops.Market.coVisitPairs(events), 3, 4, 2L))
    t("burstiness")(graft.ops.Retention.burstiness(events))
    t("rolling wau sketch")(graft.ops.Retention.rollingUsersSketch(events))
    t("diff in diff")(graft.ops.Experiment.diffInDiff(
      orders, dim("customer"), dim("nation"), dim("region")))
    t("timeout sweep")(graft.ops.Sessionize.timeoutSweep(events))
    t("readability")(graft.ops.TextAnalysis.readability(docs))
    t("bigram perplexity")(graft.ops.TextAnalysis.bigramPerplexity(docs))
    t("anisotropy")(graft.ops.Similarity.anisotropy(emb))
    t("brown forecast")(graft.ops.Retention.brownForecast(orders))
    t("negative sampling")(graft.ops.TrainingPrep.negativeSampling(docs))
    t("bootstrap ci")(graft.ops.Experiment.bootstrapCi(events))
    t("supplier skyline")(graft.ops.Market.supplierSkyline(lineitem, orders))
    t("quantile forecast")(graft.ops.Retention.quantileForecast(orders))
    t("markov attribution")(graft.ops.Market.markovAttribution(
      events, Seq("click", "error", "signup", "view")))
    t("seasonal brown")(graft.ops.Retention.seasonalBrownBacktest(orders))
    t("position attribution")(graft.ops.Sessionize.positionAttribution(events))
    t("ks test")(graft.ops.Experiment.ksTest(events))
    t("cms check")(graft.ops.CountMin.heavyHitterCheck(docs))
    t("scd2 history")(graft.ops.Scd.tierHistory(events))
    t("scd2 revenue")(graft.ops.Scd.revenueByTier(events))
    t("transition entropy")(graft.ops.Market.transitionEntropy(events))
    t("label prop")(graft.ops.Graph.labelProp(
      graft.ops.Market.coVisitPairs(events), 4, 2L))
    t("autocorrelation")(graft.ops.Retention.autocorrelation(orders))
    t("power iteration")(graft.ops.Similarity.powerIteration(emb))
    t("sketch quantiles")(graft.ops.Percentiles.sketchQuantileTable(
      lineitem, "l_returnflag", "l_extendedprice"))
    t("path trigrams")(graft.ops.Market.pathTrigrams(events))
    t("scd2 census")(graft.ops.Scd.monthEndCensus(events))
    t("join cardinality")(graft.ops.Profile.joinCardinalityAudit(
      events, orders, "user_id", "o_custkey"))
    t("runs test")(graft.ops.Retention.runsTest(orders))
    // FIXED probe set under amplification (q229 lesson)
    t("knn label acc")(graft.ops.Similarity.knnLabelAccuracy(
      emb, col("vec_id") % (50L * mult) === 0))
    t("tier migration")(graft.ops.Retention.spendTierMigration(orders))
    t("price index")(graft.ops.AreaTopProducts.priceIndex(lineitem))
    t("variance decomp")(graft.ops.Retention.varianceDecomposition(orders))
    t("bloom semi")(graft.ops.Joins.bloomSemiAudit(lineitem,
      orders.filter(col("o_orderpriority") === "1-URGENT"),
      "l_orderkey", "o_orderkey"))
    t("cross correlation")(graft.ops.Retention.crossCorrelation(orders))
    t("shapley attribution")(graft.ops.Market.shapleyAttribution(events,
      Seq("click", "error", "signup", "view")))
    t("association screen")(graft.ops.Profile.cramersV(events,
      col("event_type"), dayofweek(col("ts")).cast("long"),
      "event_type", "event_dow"))
    // part is a DIMENSION (not amplified): the match runs at
    // name-domain grain, so fact growth can't touch it — the probe
    // pins that the time is flat across multipliers
    t("fuzzy name match")(graft.ops.Dedup.fuzzyNameMatch(
      graft.tables.Tables(spark, dir, "part"), "p_name", "p_partkey"))
    t("haar energy")(graft.ops.Retention.haarEnergy(orders))
    t("croston demand")(graft.ops.Market.crostonDemand(lineitem))
    t("fd audit")(graft.ops.Profile.fdAudit(lineitem,
      "l_partkey", "l_suppkey", "lineitem"))
    t("revenue retention")(graft.ops.Retention.revenueRetention(orders))
    t("deseasonalized cusum")(
      graft.ops.Retention.deseasonalizedCusum(orders))
    t("hub knockout")(graft.ops.Graph.hubKnockout(
      graft.ops.Market.coVisitPairs(events), Seq(0, 1, 2, 5, 10),
      minWeight = 2L))
    t("newsvendor stock")(graft.ops.Market.newsvendorStock(lineitem))
    t("join order audit")(graft.ops.Profile.joinOrderAudit(
      orders.filter(col("o_orderpriority") === "1-URGENT"), lineitem,
      graft.tables.Tables(spark, dir, "part").filter(col("p_size") <= 10)))
    t("latency sla trend")(
      graft.ops.AreaTopProducts.latencySlaTrend(lineitem, orders))
    // the capped sample is a FIXED probe set (q229 rule): the modulus
    // scales with the multiplier so the pair space stays constant
    t("separability auc")(graft.ops.Similarity.separabilityAuc(
      emb, sampleMod = 5L * mult))
    t("post stratified lift")(
      graft.ops.Experiment.postStratifiedLift(events))
    t("did event study")(graft.ops.Experiment.didEventStudy(orders,
      graft.tables.Tables(spark, dir, "customer"),
      graft.tables.Tables(spark, dir, "nation"),
      graft.tables.Tables(spark, dir, "region")))
    t("abc xyz")(graft.ops.Market.abcXyz(lineitem))
    t("source transfer")(graft.ops.TextAnalysis.sourceTransferMatrix(docs))
    t("silhouette")(graft.ops.KMeans.silhouette(emb))
    t("props key drift")(
      graft.ops.Profile.propsKeyDrift(events, "2024-01-16"))
    t("revenue cohort triangle")(
      graft.ops.Retention.revenueCohortTriangle(orders))
    t("changepoint")(graft.ops.Retention.changepoint(orders))
    t("gap islands")(graft.ops.Retention.gapIslands(orders))
    t("permutation test")(
      graft.ops.Experiment.permutationTest(events, reps = 50))
    t("mde power")(graft.ops.Experiment.mdePower(events))
    t("ratio delta")(graft.ops.Experiment.ratioDelta(events))
    t("ktruss")(graft.ops.Graph.ktruss(
      graft.ops.Market.coVisitPairs(events), k = 4, iters = 3,
      minWeight = 1L))
    // FIXED probe set under amplification (q229 rule)
    t("source value knn")(graft.ops.Similarity.sourceValueKnn(
      emb, docs, k = 10, probeMod = 5L * mult))
    // FIXED sample (q326 rule): the pair space must not grow
    t("hubness")(graft.ops.Similarity.hubness(
      emb, k = 10, sampleMod = 5L * mult))
    t("spearman daily")(graft.ops.Retention.spearmanDaily(orders))
    t("wilson ci")(graft.ops.Experiment.wilsonCi(events))
    t("smd balance")(graft.ops.TrainingPrep.smdBalance(docs))
    t("gini trend")(graft.ops.Profile.giniTrend(orders))
    t("price endings")(graft.ops.Integrity.priceEndings(lineitem))
    // part is a DIMENSION (q316 rule): pairs + CC run at name grain
    t("entity rollup")(graft.ops.Dedup.entityRollup(
      graft.tables.Tables(spark, dir, "part"), lineitem))
    t("channel retention")(graft.ops.Retention.channelRetention(events))
    t("abc migration")(graft.ops.Market.abcMigration(lineitem))
    t("stationary mix")(graft.ops.Market.stationaryMix(events))
    t("dsir ess")(graft.ops.TrainingPrep.dsirEss(docs,
      docs.filter(col("source") === "src0")))
    t("psi drift")(graft.ops.Profile.psiDrift(orders))
    // FIXED eval probe set (q229 rule)
    t("semantic decontamination")(
      graft.ops.Contamination.semanticDecontamination(
        emb, docs, evalMod = 10L * mult))
    t("james stein")(graft.ops.Profile.jamesSteinMeans(docs))
    t("revenue drawdown")(graft.ops.Retention.revenueDrawdown(orders))
    t("kaplan meier")(graft.ops.Retention.kaplanMeier(events))
    t("audience union sketch")(
      graft.ops.Market.audienceUnionChecked(events))
    t("priority sample")(graft.ops.TrainingPrep.prioritySample(docs))
    t("good turing")(graft.ops.TextAnalysis.goodTuring(docs))
    t("quantile treatment")(graft.ops.Experiment.quantileTreatment(events))
    t("fdr screen")(
      graft.ops.Experiment.fdrScreen(events, reps = 100))
    t("span corruption")(graft.ops.TrainingPrep.spanCorruption(docs))
    t("mann kendall")(graft.ops.Retention.mannKendall(orders))

    // J3/J4 empirical probe (the SURVEY "AQE handles skew" design
    // disposition, exercised at scale rather than only on SkewSpec's
    // synthetic fixture): one hot key owns ~50% of the amplified fact
    // rows, pushed through an equi-join with broadcast disabled (a
    // broadcast join has no skew to split). Three variants map the
    // disposition's BOUNDARY, found by this probe on Spark 4.1.2:
    //   (a) plain join to the stage output → AQE splits the hot
    //       partition (skew=true — the SkewSpec pin's shape);
    //   (b) join feeding a differently-keyed aggregate → ALSO splits;
    //   (c) pre-aggregate the fact to key grain BELOW the join (the
    //       hot key collapses to one row) then join + re-aggregate —
    //       no skew left to split by construction (skew_split=false
    //       is EXPECTED here), and the fastest of the three.
    // BOUNDARY (found by this probe on Spark 4.1.2): the rule
    // pattern-matches SMJ over BARE shuffle stages only — any
    // operator between a shuffle stage and the join child (e.g. the
    // final HashAggregate of a derived distinct() dim) silently
    // disables the split, even with forceOptimizeSkewedJoin=true. A
    // DERIVED dim must be materialized first (checkpoint / parquet —
    // done below) for AQE skew handling to engage; at 100 TB prefer
    // (c), which beats the split plans outright and carries no such
    // fine print.
    // Fixture note: the payload is md5 hex because shuffle files are
    // LZ4-compressed and a hot partition of 50% IDENTICAL longs
    // compresses below any byte threshold — skew detection reads
    // compressed map-output sizes, so the fixture needs
    // incompressible per-row bytes (real fact rows have them).
    if (only.isEmpty || only.exists("skew join".contains)) {
      val conf = spark.conf
      val saved = Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
        .map(k => k -> conf.getOption(k)).toMap
      try {
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        val hot = events
          .withColumn("user_id",
            when(col("event_id") % 2 === 0, lit(777L)).otherwise(col("user_id")))
          .select(col("user_id"),
            md5(col("event_id").cast("string")).as("payload"))
        val users = events.select(col("user_id")).distinct()
          .withColumn("segment", pmod(col("user_id"), lit(10L)))
          .localCheckpoint() // see BOUNDARY 1 above
        def timed(name: String)(run: => (Long, String)): Unit = {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val (n, plan) = run
          val secs = (System.nanoTime() - t0) / 1e9
          val split = plan.contains("skew=true")
          println(f"[scale] skew join $name (x$mult): $secs%.2f s " +
            f"rows=$n skew_split=$split")
        }
        timed("(a) join->sink") {
          // collect (not foreach, whose toRdd path never flips the
          // plan's isFinalPlan readout; not a noop write command,
          // which wraps the join in its own execution) so the final
          // plan's skew marker is readable afterwards
          val j = hot.join(users, "user_id")
          (j.collect().length.toLong, j.queryExecution.executedPlan.toString)
        }
        timed("(b) join->agg") {
          val p = hot.join(users, "user_id")
            .groupBy(col("segment"))
            .agg(count(lit(1)).as("n"), min(col("payload")).as("p0"))
          val n = p.collect().map(_.getAs[Long]("n")).sum
          (n, p.queryExecution.executedPlan.toString)
        }
        timed("(c) pre-agg rewrite") {
          val perUser = hot.groupBy(col("user_id"))
            .agg(count(lit(1)).as("cnt"), min(col("payload")).as("pmin"))
          val p = perUser.join(users, "user_id")
            .groupBy(col("segment"))
            .agg(sum(col("cnt")).as("n"), min(col("pmin")).as("p0"))
          val n = p.collect().map(_.getAs[Long]("n")).sum
          (n, p.queryExecution.executedPlan.toString)
        }
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
    spark.stop()
  }
}
