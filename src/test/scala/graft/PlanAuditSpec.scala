package graft

/** Physical-plan audits: the scale properties the operators were
  * designed around, pinned as assertions so a refactor that silently
  * adds a shuffle, drops a pushed filter, widens a scan, or loses a
  * rank pushdown fails CI instead of surfacing as a 100 TB regression.
  *
  * Counts use the pre-AQE physical plan (deterministic for the fixed
  * sf0.001 test tables); shuffle exchanges are counted separately from
  * broadcast exchanges — broadcasts of dimension/aggregate-grain
  * frames are the design, fact shuffles are the budget.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Drop the cached-lineage subtrees (lines printed under an
    * InMemoryRelation) so shuffle counts see only the LIVE plan — the
    * build side of a persisted frame runs once at materialization, and
    * the tree printer repeats it under every InMemoryTableScan. */
  private def stripCached(p: String): String = {
    def depth(line: String): Int = line.indexWhere(_.isLetter) match {
      case -1 => Int.MaxValue
      case i  => i
    }
    val out = Seq.newBuilder[String]
    var skipBelow = -1
    p.split("\n").foreach { line =>
      val d = depth(line)
      if (skipBelow >= 0 && d <= skipBelow) skipBelow = -1
      if (skipBelow < 0) {
        out += line
        if (line.contains("InMemoryRelation")) skipBelow = d
      }
    }
    out.result().mkString("\n")
  }

  /** Live-plan shuffle exchanges only (hash/range/single-partition) —
    * not BroadcastExchange, not cached-lineage shuffles. */
  private def shuffles(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(stripCached(p)).length

  /** The r10-verdict scale-safety pin for scalar reattachment: no
    * no-partitionBy window anywhere (its windowspecdefinition starts
    * directly with the frame — it would plan Exchange SinglePartition
    * + a one-task sort over the WHOLE grain frame), and every
    * Exchange SinglePartition that does appear feeds a final
    * HashAggregate from partial-aggregate rows (~1 row per upstream
    * partition — the parallel tree-reduce shape), never raw rows into
    * a Sort/Window. */
  private def assertScalarAggOnly(p: String): Unit = {
    assert(!p.contains("windowspecdefinition(specifiedwindowframe"),
      s"no-partitionBy window (single-task sort of the whole frame):\n$p")
    val lines = p.split("\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (line.contains("Exchange SinglePartition")) {
        val child = lines.drop(i + 1).find(_.exists(_.isLetter)).getOrElse("")
        assert(child.contains("HashAggregate") ||
            child.contains("SortAggregate") ||
            child.contains("ObjectHashAggregate"),
          s"Exchange SinglePartition over non-aggregate rows:\n$line\n$child\n$p")
      }
    }
  }

  test("q01 pricing summary: one shuffle; scan pruned to the 5 referenced columns") {
    val p = plan("q01_pricing_summary")
    assert(shuffles(p) == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
  }

  test("q02 sessionize: the session aggregate reuses the window's user_id partitioning (one shuffle total)") {
    // groupBy(session_id, user_id) — user_id in the grouping key lets
    // hashpartitioning(user_id) satisfy the aggregate's distribution,
    // so sessionize = exactly one fact shuffle end-to-end.
    val p = plan("q02_sessionize")
    assert(shuffles(p) == 1, p)
  }

  test("q05/q39 top-N queries: one shuffle + TakeOrderedAndProject (no global sort of the aggregate)") {
    Seq("q05_top_categories", "q39_user_activity").foreach { q =>
      val p = plan(q)
      assert(shuffles(p) == 1, s"$q:\n$p")
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
    }
  }

  test("q06/q08/q25 rank-filter queries plan WindowGroupLimit (partial top-N before the shuffle)") {
    Seq("q06_top_sessions_per_category", "q08_area_top3_products",
      "q25_knn_bruteforce").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost the rank pushdown:\n$p")
    }
  }

  test("q06 session counts ride the sessionize user_id shuffle (no (category, session) re-shuffle)") {
    // user_id in the per-session grouping key lets the assignSessions
    // window's hashpartitioning(user_id) satisfy the aggregate — the
    // click stream shuffles once. Remaining exchanges: the
    // topCategories branch's category aggregate and the rank window,
    // both carrying collapsed grains.
    val p = plan("q06_top_sessions_per_category")
    assert(shuffles(p) == 3, p)
    assert("Exchange hashpartitioning\\(category_id[^)]*, session_id".r
      .findFirstIn(p).isEmpty,
      s"per-session aggregate re-shuffled the click stream:\n$p")
  }

  test("q08 area top-3: dimension chain is all broadcast; at most one non-broadcast join") {
    val p = plan("q08_area_top3_products")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert("SortMergeJoin".r.findAllIn(p).length <= 1, p)
  }

  test("broadcast-hint policy: hints only on fixed-cardinality dims, never customer/part") {
    // q08 carries exactly 3 hints (nation, region, the 1-row cityMap);
    // customer and part are UNHINTED — at the 100 TB design point they
    // are tens of GB, and a forced broadcast would OOM where AQE would
    // have picked the right join. The optimizer still broadcasts them
    // at test SF from size stats (the >=4 BroadcastHashJoin assertion
    // above), which is the point: small when small, safe when not.
    def hints(name: String): Int = "ResolvedHint".r.findAllIn(
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed.toString).length
    assert(hints("q08_area_top3_products") == 3)
    // q04's customer join is fully hint-free, yet still planned as a
    // broadcast join at this SF by pure stats.
    assert(hints("q04_session_filter") == 0)
    assert(plan("q04_session_filter").contains("BroadcastHashJoin"))
  }

  test("q09 semi join: lineitem date range reaches the parquet scan as pushed filters") {
    val p = plan("q09_order_priority_semi")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"predicate not pushed:\n$p")
  }

  test("q12 stratified sample: two live shuffles, persisted session frame reused by both branches, single-stage quota window") {
    val p = plan("q12_stratified_sample")
    // strata aggregate shuffle + rank-window shuffle; the sessionize
    // user-window shuffle runs once inside the persisted frame
    assert(shuffles(p) == 2, stripCached(p))
    assert("InMemoryRelation".r.findAllIn(p).length >= 2, s"persist not reused:\n$p")
    assert(p.contains("Coalesce 1"), s"quota arithmetic left the single-partition stage:\n$p")
  }

  test("q16 click trend: slim (ts, ad_id) cache feeds BOTH the max-anchor and the bucketed counts") {
    val p = plan("q16_click_trend")
    assert(shuffles(p) == 2, stripCached(p)) // SinglePartition max + grouped counts
    assert("InMemoryRelation \\[ts#\\d+, ad_id#\\d+L?\\]".r.findAllIn(p).length >= 2,
      s"projection cache not shared by both passes:\n$p")
    // the heavy parse+join lineage must appear only under the cache
    assert(!stripCached(p).contains("get_json_object"),
      s"json parse escaped the cache:\n${stripCached(p)}")
  }

  test("q24 simhash: per-row signature is narrow (zero shuffles, no explode)") {
    val p = plan("q24_simhash")
    assert(shuffles(p) == 0, p)
    assert(!p.contains("Generate"), s"explode crept in:\n$p")
  }

  test("q28 media metadata: metadata-only query never reads payload-equivalent text twice or shuffles") {
    val p = plan("q28_media_metadata")
    assert(shuffles(p) == 0, p)
  }

  test("q43 as-of join: exactly one shuffle (the union+window trick), no join operator") {
    val p = plan("q43_asof_last_purchase")
    assert(shuffles(p) == 1, p)
    assert(!p.contains("Join"), s"as-of degraded to a real join:\n$p")
    // both event_type filters reach the parquet scans
    assert("PushedFilters: .*EqualTo\\(event_type,click\\)".r.findFirstIn(p).isDefined, p)
    assert("PushedFilters: .*EqualTo\\(event_type,purchase\\)".r.findFirstIn(p).isDefined, p)
  }

  test("q45/q46 text cleaning: pure map stages — zero shuffles, scan pruned to (doc_id, text)") {
    Seq("q45_line_dedup", "q46_pii_scrub").foreach { q =>
      val p = plan(q)
      assert(shuffles(p) == 0, s"$q:\n$p")
      val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
      assert(!readSchema.contains("lang") && !readSchema.contains("source"),
        s"$q scan not pruned: $readSchema")
    }
  }

  test("q51 range join: bucket equi-join, never a nested-loop cartesian") {
    val p = plan("q51_purchases_window")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyless range join degraded to a pair blowup:\n$p")
  }

  test("q52 kmeans: centroids broadcast to the corpus; assignment min is a HashAggregate") {
    val p = plan("q52_kmeans")
    // both Lloyd rounds join the corpus to broadcast centroids
    assert("BroadcastNestedLoopJoin|BroadcastExchange".r.findAllIn(p).nonEmpty, p)
    // the vec-grain min must NOT fall back to SortAggregate (q/n2 ride
    // in the grouping key; an array-valued first() would break this)
    assert(!p.contains("SortAggregate"), s"assignment lost the hash aggregate:\n$p")
  }

  test("q55 decontamination: bench grams broadcast; the corpus gram stream is never sort-merge joined") {
    val p = plan("q55_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"bench side lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus grams shuffled for a join:\n$p")
    // scans on both sides pruned to (doc_id, text)
    assert("struct<doc_id:bigint,text:string>".r.findAllIn(p).size == 2, p)
    // budget: bench-side distinct + the matched-gram count-distinct pair
    assert(shuffles(p) <= 3, s"shuffle budget exceeded:\n$p")
  }

  test("q56 packing: exactly one shuffle (the per-shard stream window)") {
    val p = plan("q56_pack_sequences")
    assert(shuffles(p) == 1, s"per-shard cumsum should be the only exchange:\n$p")
  }

  test("q61/q62 PQ: codebook + query LUT broadcast; corpus codes never sort-merge or shuffle-cartesian joined") {
    val p = plan("q61_pq_ann")
    assert(p.contains("BroadcastHashJoin"), s"codebook lost its broadcast:\n$p")
    // the LUT side rides a broadcast nested-loop CROSS (tiny build), never
    // a shuffled CartesianProduct of the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), s"top-k lost its partial rank:\n$p")
    val p2 = plan("q62_ivf_pq")
    // probe set joins the encoded corpus by list key — broadcast, and
    // the corpus side never shuffles for it
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("CartesianProduct") && !p2.contains("SortMergeJoin"), p2)
  }

  test("q57/q58 chunk + epoch mix: pure explode pipelines, zero shuffles") {
    Seq("q57_context_chunks", "q58_epoch_mix").foreach { q =>
      val p = plan(q)
      assert(shuffles(p) == 0, s"$q grew a shuffle:\n$p")
      assert(p.contains("Generate"), s"$q lost its explode:\n$p")
    }
  }

  test("q66 bm25: query terms broadcast-filter the token stream; no vocabulary-wide aggregate; top-k is WindowGroupLimit") {
    val p = plan("q66_bm25")
    // the corpus token stream must meet the (tiny) term set via
    // broadcast hash join — a sort-merge join here means the full
    // token stream was shuffled before filtering
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), s"top-k lost its rank pushdown:\n$p")
  }

  test("q65 substring dup: gram stream aggregates hash-based, never sort-based") {
    // the occurrence count and position-cover count must stay
    // HashAggregate: a SortAggregate over the gram stream is a full
    // sort of the corpus at gram multiplicity
    val p = plan("q65_substring_dup")
    assert(!stripCached(p).contains("SortAggregate"), p)
  }

  test("q67 cube: single Expand + hash aggregate, one shuffle") {
    val p = plan("q67_cube_totals")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(shuffles(p) == 1, p)
  }

  test("q69 quality classifier: zero shuffles — the whole scorer is one map stage") {
    val p = plan("q69_quality_classifier")
    assert(shuffles(p) == 0, s"classifier grew a shuffle:\n$p")
  }

  test("q71 mixture plan: ONE corpus pass — source aggregate + tiny window, no rescan") {
    val p = plan("q71_mixture_plan")
    // corpus aggregate (1 hash exchange) + the ≤|sources|-row window
    // (single-partition exchange). A third shuffle means the weight
    // total went back to a second corpus aggregate.
    assert(shuffles(p) <= 2, p)
    assert("FileScan parquet".r.findAllIn(p).length <= 1,
      s"corpus scanned more than once:\n$p")
  }

  test("q70 bpe: argmax plans as TakeOrderedAndProject; rule application joins are all broadcast") {
    val p = plan("q70_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"), s"argmax lost its top-1 pushdown:\n$p")
    assert(!p.contains("SortMergeJoin"), s"a rule broadcast became a shuffle join:\n$p")
  }

  test("q75 retention: ONE fact shuffle (user-grain set aggregate), no distinct agg after the explode") {
    val p = plan("q75_retention")
    // user aggregate (hash exchange on user_id) + the metadata-grain
    // (cohort, offset) aggregate — two exchanges total, no more
    assert(shuffles(p) <= 2, p)
    assert(!stripCached(p).contains("SortAggregate"), p)
  }

  test("q76 active users: explode turns the sliding window into plain aggregation — no range join") {
    val p = plan("q76_active_users")
    assert(p.contains("Generate"), s"lost the contribution-day explode:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sliding window regressed to a range self-join:\n$p")
  }

  test("q77 quantile: the rank window runs over the value histogram, not rows") {
    val p = plan("q77_p95_quantity")
    assert(shuffles(p) <= 2, p)
    // the tree prints top-down, so the histogram aggregate (grouping
    // keys include the VALUE column) must appear BELOW the Window —
    // a row-grain window rewrite has no such aggregate beneath it
    val lines = p.split("\n").toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, p)
    assert(lines.drop(winIdx).exists(l =>
      l.contains("HashAggregate") && l.contains("l_quantity")),
      s"no (group, value)-keyed aggregate beneath the window:\n$p")
  }

  test("q79 eval sample: rank pushes down to WindowGroupLimit") {
    val p = plan("q79_eval_sample")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown lost:\n$p")
  }

  test("q68 curriculum buckets: the only single-partition exchange feeds the value-grain window, not the corpus") {
    val p = plan("q68_curriculum_buckets")
    // corpus → value-grain aggregate (hash shuffle) → tiny window
    // (single partition over ≤10001 rows) → broadcast back. The
    // corpus-side join must be broadcast, not shuffled.
    assert("Exchange SinglePartition".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(p.contains("BroadcastHashJoin"), s"map-back join not broadcast:\n$p")
  }

  test("q85 oov rate: vocab head is TakeOrdered + broadcast; two shuffles total") {
    // shuffle 1 builds the token-grain vocab head, shuffle 2 is the
    // doc-grain re-aggregate — the membership probe itself must be a
    // broadcast left join, never a shuffle join on the token stream.
    val p = plan("q85_oov_rate")
    assert(shuffles(p) <= 2, p)
    assert(p.contains("TakeOrderedAndProject"), s"vocab head is a global sort:\n$p")
    assert("BroadcastHashJoin .*LeftOuter".r.findFirstIn(p).nonEmpty,
      s"vocab probe not broadcast:\n$p")
  }

  test("q86 cooccurrence: pair/unigram aggregates cached — live plan re-reads no corpus") {
    // Without the persists Catalyst re-scans the corpus for each
    // unigram join and for N (4 corpus reads); cached, the live plan
    // is joins + rollup over InMemoryRelations only.
    val p = plan("q86_cooccur_top")
    assert(p.contains("InMemoryRelation"), s"vocab-grain caches lost:\n$p")
    assert(stripCached(p).split("\n").count(_.contains("Scan parquet")) == 0,
      s"live corpus rescan crept in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"head is a global sort:\n$p")
  }

  test("q88 volume anomaly: one fact shuffle + day-grain window, no single-partition exchange") {
    val p = plan("q88_volume_anomaly")
    // (event_type, day) count shuffles the facts once; the trailing
    // window runs at day×type grain partitioned by event_type — a
    // global-window rewrite would show Exchange SinglePartition.
    assert(shuffles(p) <= 2, p)
    assert(!stripCached(p).contains("Exchange SinglePartition"),
      s"window collapsed to a single partition:\n$p")
  }

  test("q89 source concentration: corpus collapses to source grain in one aggregate; no explode") {
    val p = plan("q89_source_concentration")
    // token counting is size(split(...)) — a map, never a token
    // explode; the rank window and rollup run at source grain (the
    // single-partition exchanges there move source-count rows)
    assert(!p.contains("Generate"), s"token explode crept in:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q87 label outliers: centroids broadcast back; per-label top-k is rank-pushed") {
    val p = plan("q87_label_outliers")
    // centroid build: (label,pos) partial-sum shuffle + label-grain
    // collect; corpus side shuffles once for the window — but only
    // AFTER the partial WindowGroupLimit cuts each map partition to
    // top-k per label (two WGL nodes: partial below, final above).
    assert(shuffles(p) <= 3, p)
    assert(p.contains("BroadcastHashJoin"), s"centroid map-back not broadcast:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).length == 2,
      s"rank pushdown lost (need partial+final WindowGroupLimit):\n$p")
  }

  test("q90 co-visitation: basket agg reuses the sessionize partitioning; item counts broadcast; top-k never global-sorts") {
    val p = plan("q90_covisitation")
    // live plan: basket build (1 fact shuffle, window + agg on the
    // same user_id exchange) runs once into the persisted frame; the
    // live side adds the pair-domain shuffle + item-count shuffle.
    // Session-count joins are broadcast; the head is TakeOrdered.
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
    assert(!stripCached(p).contains("SortMergeJoin"),
      s"item-count join fell back to SMJ:\n$p")
    assert(shuffles(p) <= 3, p)
  }

  test("q91 transitions: the lag rides the sessionize window partitioning — one fact shuffle") {
    val p = plan("q91_transitions")
    // the persisted step matrix absorbs the whole fact chain (one
    // user_id exchange, windows, lag, agg) — the LIVE plan reads the
    // cache twice and must shuffle the facts zero times; inside the
    // cached lineage the lag shares the sessionize partitioning
    // (asserted by the single user_id exchange in the full tree text
    // per cache occurrence)
    assert(p.contains("InMemoryTableScan"), s"step matrix not persisted:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).isEmpty,
      s"live plan re-shuffled the facts:\n$p")
    assert(!stripCached(p).contains("SortMergeJoin"), p)
  }

  test("q112 bot sessions: gap lag + session aggregate both ride the one user_id window shuffle") {
    // lag over (user_id, session_seq) and groupBy(session_id, user_id)
    // are each satisfied by hashpartitioning(user_id) — the whole
    // verdict table is ONE fact shuffle, like q02.
    val p = plan("q112_bot_sessions")
    assert(shuffles(p) == 1, p)
  }

  test("q113 dwell time: one fact shuffle + the bounded event_type aggregate; no SinglePartition") {
    val p = plan("q113_dwell_time")
    assert(shuffles(p) <= 2, p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1, p)
    assert(!stripCached(p).contains("Exchange SinglePartition"), p)
  }

  test("q114 dsir: BUILD broadcasts the bucket-grain weights, one doc shuffle; query reads the shared artifact") {
    // q114 is the dsir_scores Shared.memo artifact since round 9, so
    // the structural pins live on the BUILD, explained directly (the
    // q200 split), and the served plan is the checkpoint scan.
    val docs = graft.tables.Tables(spark, sf, "documents")
    val p = graft.ops.TrainingPrep.dsirScore(docs,
      docs.filter(org.apache.spark.sql.functions.col("source") === "src0"))
      .queryExecution.executedPlan.toString
    val live = stripCached(p)
    assert(!live.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the scoring side shuffles exactly once — the (doc, source, lang)
    // re-aggregate; everything else lives at ≤65536-bucket grain
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(live).length == 1, p)
    val served = plan("q114_dsir_score")
    assert(served.contains("Scan ExistingRDD"),
      s"q114 not serving the checkpointed score artifact:\n$served")
    assert(!stripCached(served).contains("Scan parquet"),
      s"q114 re-scanned the corpus instead of the artifact:\n$served")
  }

  test("q115 budget select: class table broadcast back; the corpus is never globally sorted") {
    val p = plan("q115_budget_select")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the threshold cumsum runs at score-value grain inside the cached
    // class table; the LIVE plan must not range-partition (global
    // sort) or single-partition the corpus
    assert(!stripCached(p).contains("Exchange rangepartitioning"), p)
    assert(!stripCached(p).contains("Exchange SinglePartition"), p)
  }

  test("q116 windowed funnel: DP fold is a map stage — the live plan reads the cached depth table, no fact re-shuffle") {
    val p = plan("q116_windowed_funnel")
    assert(p.contains("InMemoryTableScan"), s"depth table not persisted:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).isEmpty,
      s"live plan re-shuffled the facts:\n$p")
  }

  test("q93 pagerank: rounds read checkpointed frames; joins never cartesian") {
    val p = plan("q93_pagerank")
    // the unrolled rounds must not re-derive the session→pair chain:
    // the edge list and rank carry are lazily localCheckpointed, so
    // the live plan reads ExistingRDD scans and the sessionize window
    // is entirely behind the checkpoint (planning the round tree with
    // the full lineage inline cost 3-5 s — 10× the execution)
    assert(p.contains("Scan ExistingRDD"), s"checkpoint inputs missing:\n$p")
    assert(!p.contains("Window"),
      s"session window re-derived past the checkpoint:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a per-round join degenerated to a cartesian:\n$p")
  }

  test("q94 rfm: user metrics persisted; tier tables broadcast back") {
    val p = plan("q94_rfm")
    assert(p.contains("InMemoryTableScan"), s"user frame not persisted:\n$p")
    assert(!stripCached(p).contains("SortMergeJoin"),
      s"tier map-back fell to SMJ:\n$p")
  }

  test("q97 source diversity: both passes collapse map-side; no corpus-grain window") {
    val p = plan("q97_source_diversity")
    // (source, token) + (source, gram) partial aggregates then
    // source-grain rollups: ≤4 hash exchanges, no Window at all
    assert(shuffles(p) <= 4, p)
    assert(!p.contains("Window"), s"a window crept into a pure-agg report:\n$p")
  }

  test("q101 fuzzy decontamination: eval side broadcast, corpus never self-joined") {
    val p = plan("q101_fuzzy_decontaminate")
    // both eval frames (bands, shingles) must arrive as broadcasts;
    // a sort-merge join would mean the training corpus shuffled to
    // meet the MB-scale benchmark
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to meet eval side:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("q103 pii prevalence: pure regex map into one bounded-domain aggregate") {
    val p = plan("q103_pii_prevalence")
    assert(shuffles(p) == 1, p) // the (source) hash aggregate exchange
    assert(!p.contains("Window") && !p.contains("Join"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("lang"), s"scan not pruned: $readSchema")
  }

  test("q104 language mix: one corpus pass — lang aggregate + tiny window, no rescan") {
    val p = plan("q104_lang_temperature")
    // corpus exchange on lang + the ≤|langs|-row SinglePartition
    // window for normalization; a third shuffle would mean a rescan
    assert(shuffles(p) <= 2, p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1,
      s"corpus scanned more than once:\n$p")
  }

  test("q105 incremental savings: band-bucket candidates, never probe×build") {
    val p = plan("q105_incremental_savings")
    // the accounting may add a flag join and a source aggregate on
    // top of q50's verdicts, but must never degenerate the pair
    // space: no cartesian, and the LSH candidate join keys on
    // (band, band_hash)
    assert(!p.contains("CartesianProduct"), s"pair space blew up:\n$p")
    assert(p.contains("band_hash"), s"band-bucket join missing:\n$p")
  }

  test("q107 shard shuffle: one shard-hash exchange, no global sort or single-partition window") {
    val p = plan("q107_shard_shuffle")
    // per-shard row_number = Exchange hashpartitioning(shard) + local
    // sort; a SinglePartition exchange would mean a global ordering
    // was imposed (the scale failure this operator exists to avoid)
    assert(shuffles(p) == 1, p)
    assert(!p.contains("SinglePartition"), s"global ordering imposed:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan not pruned: $readSchema")
  }

  test("q108 tokenizer fertility: pure tokenize map into one bounded-domain aggregate") {
    val p = plan("q108_tokenizer_fertility")
    assert(shuffles(p) == 1, p) // the (lang) hash aggregate exchange
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"fertility must count via size(), never explode:\n$p")
  }

  test("q109 value drift: fact collapses to type×bucket grain in one shuffle; windows ride bounded grain") {
    val p = plan("q109_value_drift")
    // Exchange 1: the (type, bucket) count aggregate (fact-grain);
    // Exchange 2: repartition to event_type for the share window —
    // already metadata-sized. The final per-type aggregate must reuse
    // the window's partitioning, so 2 is the budget.
    assert(shuffles(p) <= 2, p)
    assert(!p.contains("SinglePartition"), s"unbounded-grain window:\n$p")
  }

  test("q110 length histogram: one corpus shuffle; share window rides the bucket grain") {
    val p = plan("q110_length_histogram")
    // the (source, bucket) aggregate is the only fact-grain exchange;
    // the docs_bp window repartitions the ≤ sources×64-row result
    assert(shuffles(p) <= 2, p)
    assert(!p.contains("SinglePartition"), s"unbounded-grain window:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("lang") && !readSchema.contains("doc_id"),
      s"scan not pruned: $readSchema")
  }

  test("q111 rerank: shortlist and queries broadcast into the corpus — floats never sort-merge") {
    val p = plan("q111_rerank_topk")
    // stage 2's vector fetch must be a map-side hash probe (shortlist
    // is probe-grain); a SortMergeJoin would mean the corpus floats
    // shuffled to meet a metadata-sized frame
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the re-rank:\n$p")
    assert(p.contains("WindowGroupLimit"), s"final top-k lost rank pushdown:\n$p")
  }

  test("q106 split leakage: split is a pure column over the pair frame — no corpus re-join") {
    val p = plan("q106_split_leakage")
    // the split CASE must ride the pair rows (pmod arithmetic in the
    // plan), not a join back to the corpus: allow exactly the joins
    // the q22 pair pipeline itself owns, plus zero extra scans
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("pmod"), s"split not computed as a pure column:\n$p")
    val scans = "Scan parquet".r.findAllIn(stripCached(p)).length
    assert(scans <= "Scan parquet".r
      .findAllIn(stripCached(plan("q22_minhash_dedup_pairs"))).length,
      s"leakage audit re-scanned the corpus beyond the pair pipeline:\n$p")
  }

  test("q118 shard mixing: shard is a pure map (no join to the shuffle output); one live corpus scan") {
    val p = plan("q118_shard_mixing")
    // the corpus collapses to (shard, source) ONCE and is persisted;
    // the source-domain grid reads the cache, not the parquet — any
    // live Scan parquet beyond the cached build is a second pass
    assert("FileScan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(!p.contains("SortMergeJoin"), s"bounded grid sort-merged:\n$p")
    // the grid cross is hint-pinned to a broadcast nested loop of the
    // metadata-sized source domain — never a shuffled CartesianProduct
    assert(!p.contains("CartesianProduct"), s"grid cross shuffled:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"grid broadcast hint lost:\n$p")
    // the shard column must come from md5/pmod arithmetic, not a join
    // (the arithmetic lives in the cached build lineage — full plan)
    assert(p.contains("pmod"), s"shard not recomputed as a pure column:\n$p")
  }

  test("q119 threshold sweep: one corpus shuffle; cumulative rides the bounded bucket grain; scan pruned to text") {
    val p = plan("q119_threshold_sweep")
    assert(shuffles(p) == 2, p) // bucket agg + bounded-domain window
    assert(!stripCached(p).contains("Join"), s"sweep must be join-free:\n$p")
    // LIVE scans (another suite's cache may substitute a wider cached
    // subtree — then the live plan has no scan at all, which is fine)
    "ReadSchema: struct<([^>]*)".r.findAllMatchIn(stripCached(p))
      .foreach { m =>
        assert(m.group(1) == "text:string", s"scan not pruned: ${m.group(1)}")
      }
  }

  test("q120 signal agreement: both verdicts in ONE map stage — no join, no second corpus pass") {
    val p = plan("q120_signal_agreement")
    assert(!stripCached(p).contains("Join"), s"gates joined instead of fused:\n$p")
    assert("FileScan parquet".r.findAllIn(stripCached(p)).length <= 1,
      s"corpus scanned more than once:\n$p")
    assert(shuffles(p) == 2, p) // 2×2 agg + ≤4-row share window
  }

  test("q121 ivf balance: centroids broadcast; the corpus never sort-merges") {
    val p = plan("q121_ivf_balance")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to meet centroids:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
  }

  test("q122 script mix: join-free, explode-free single shuffle; scan pruned to (text, source)") {
    val p = plan("q122_script_mix")
    assert(shuffles(p) == 1, p)
    assert(!stripCached(p).contains("Join") && !stripCached(p).contains("Generate"),
      s"char classes must be regex subtraction, never explode:\n$p")
    "ReadSchema: struct<([^>]*)".r.findAllMatchIn(stripCached(p)).foreach { m =>
      assert(!m.group(1).contains("doc_id") && !m.group(1).contains("lang"),
        s"scan not pruned: ${m.group(1)}")
    }
  }

  test("q124 attribution: touch windows ride the one sessionize shuffle; report exchanges are model-grain") {
    val p = plan("q124_attribution")
    // Exchange 1: user_id (fact) — shared by session assignment AND
    // the first/lag/row_number touch windows (subset-clustering);
    // exchanges 2-3: the bounded (model, channel) aggregate + the
    // model share window. Any 4th exchange means a window stopped
    // riding the session partitioning.
    assert(shuffles(p) == 3, p)
    assert(!p.contains("Join"), s"attribution must not join:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q125 doc novelty: carrier count is a gram-key window, not a gram self-join; hashes fused") {
    val p = plan("q125_doc_novelty")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("graft_token_gram_hash"),
      s"gram strings materialized (TokenGramHash bypassed):\n$p")
    // gram window + doc aggregate + the visible-zeros join's exchange
    assert(shuffles(p) <= 4, p)
    assert("Window \\[count".r.findAllIn(p).nonEmpty,
      s"carrier count lost the window shape:\n$p")
  }

  test("q126 surprisal: head is TakeOrdered + broadcast; the token stream never sort-merges") {
    val p = plan("q126_surprisal")
    assert(p.contains("TakeOrderedAndProject"), s"head built by global sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus tokens shuffled to meet the head:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"head join not broadcast:\n$p")
  }

  test("q127 session paths: fact shuffle + path aggregate, top-k is TakeOrdered") {
    val p = plan("q127_session_paths")
    assert(shuffles(p) == 2, p) // sessionize user_id + path-grain agg
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q128 erasure audit: every table scanned once on its key column; deny list broadcast") {
    val p = plan("q128_erasure_audit")
    assert(!p.contains("SortMergeJoin"), s"fact shuffled to meet the deny list:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    // each audited scan must read ONLY its join key (plus the deny
    // predicate's column) — a wide scan pays the whole table width
    // for a row count
    "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p).foreach { m =>
      assert(m.group(1).count(_ == ',') <= 1, s"scan not pruned: ${m.group(1)}")
    }
  }

  test("q133 preference pairs: both extremes WindowGroupLimit; the pair join is broadcast") {
    val p = plan("q133_preference_pairs")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"an extreme lost its rank pushdown:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"metadata-sized extremes sort-merged:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q134 ltv curve: fact collapses through user grain; cumulative rides cohort grain") {
    val p = plan("q134_ltv_curve")
    // (user, day) agg → user agg (fact-grain), then the bounded
    // (cohort, age) agg and the cohort window — partial map-side agg
    // before the tiny exchanges beats forcing a cohort-key fact
    // shuffle (cohorts are DAYS: a few hundred keys would take the
    // whole corpus through a skewed exchange just to save one)
    assert(shuffles(p) == 4, p)
    assert(!p.contains("SinglePartition"), s"unbounded-grain window:\n$p")
  }

  test("q135 boilerplate scrub: deny set never cartesians; docs reassemble in one aggregate") {
    val p = plan("q135_boilerplate_scrub")
    assert(!p.contains("CartesianProduct"), p)
    // the chunk occurrence stream joins deny on (source, line);
    // reassembly is a single position-ordered aggregate at doc grain
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("q136 local-supplier revenue: bounded dims broadcast; order-date filter pushed to the scan") {
    val p = plan("q136_local_supplier_revenue")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date range not pushed to the parquet scan:\n$p")
  }

  test("q137 key skew: one live corpus pass (totals read the persisted key-grain frame); top-k is TakeOrdered") {
    val p = plan("q137_key_skew")
    assert("FileScan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"corpus re-scanned for the totals:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q138 props schema: ONE corpus scan; the row total rides the key-grain aggregate as a sentinel group") {
    val p = plan("q138_props_schema")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), p)
    // the sentinel-entry design means total_rows needs no second pass:
    // exactly one parquet scan in the whole plan
    assert("FileScan parquet".r.findAllIn(stripCached(p)).length == 1,
      s"total_rows grew a second corpus scan:\n$p")
    // (key, value)-grain exchange + key-grain exchange (the distinct
    // aggregate's two-level rewrite) + the key-grain global window's
    // SinglePartition — every one moves a collapsed frame, never the
    // exploded corpus stream
    assert(shuffles(p) == 3, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("value") && !readSchema.contains("event_type"),
      s"scan not pruned: $readSchema")
  }

  test("q150 props schema approx: same single-scan shape as q138 (the sketch adds no pass)") {
    val p = plan("q150_props_schema_approx")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1,
      s"sketch verdict grew a second corpus scan:\n$p")
    assert(shuffles(p) == 3, p)
  }

  test("q151 cuped: ONE fact shuffle (user grain); moments ride the 2-row arm grain; join-free") {
    val p = plan("q151_cuped_lift")
    // user aggregate (fact) + arm aggregate + the 2-row pooled window
    assert(shuffles(p) == 3, p)
    assert(!p.contains("Join"), s"cuped must not join:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
  }

  test("q152 winsorized: user frame persisted (one corpus pass); cap comes back as a broadcast") {
    val p = plan("q152_winsorized_lift")
    assert(p.contains("InMemoryRelation"), s"user frame not persisted:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(p.contains("BroadcastExchange"), s"cap not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // histogram aggregate + its value-grain window + the arm aggregate
    assert(shuffles(p) <= 3, p)
  }

  test("q153 ref integrity: every scan pruned to its key column; joins at key grain, never cartesian") {
    val p = plan("q153_ref_integrity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // 3 child + 3 parent roles (customer twice) = ≤6 single-column scans
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 6, p)
    "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p).foreach { m =>
      assert(!m.group(1).contains(","), s"scan not pruned: ${m.group(1)}")
    }
  }

  test("q156 profile drift: both snapshots in ONE scan (conditional aggregates, never a self-union)") {
    val p = plan("q156_profile_drift")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1,
      s"pre/post split grew a second scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q155 join fanout: both sides collapse to key grain before the join; top-1 is TakeOrdered; one build") {
    val p = plan("q155_join_fanout")
    assert(p.contains("InMemoryRelation"), s"key frame not persisted:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"hot key global-sorted:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q154 time to convert: user grain persisted (one corpus pass); quantile rides the delay histogram") {
    val p = plan("q154_time_to_convert")
    assert(p.contains("InMemoryRelation"), s"user grain not persisted:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), s"funnel totals not broadcast:\n$p")
  }

  test("q131 recency sample is a PURE MAP: zero shuffles, zero joins, zero windows") {
    val p = plan("q131_recency_sample")
    assert(shuffles(p) == 0, p)
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Generate"),
      s"the decay gate must pipeline with the scan:\n$p")
  }

  test("q132 contributor cap plans WindowGroupLimit (whales cut map-side)") {
    val p = plan("q132_contributor_cap")
    assert(p.contains("WindowGroupLimit"), s"rank cut lost pushdown:\n$p")
    assert(shuffles(p) == 1, p)
  }

  test("q123 boilerplate lines: one (source, line) shuffle; grouped top-k plans WindowGroupLimit") {
    val p = plan("q123_boilerplate_lines")
    // line-grain agg + the top-k window's source repartition
    assert(shuffles(p) == 2, p)
    assert(p.contains("WindowGroupLimit"), s"top-k lost rank pushdown:\n$p")
    assert(!p.contains("SinglePartition"), s"global ordering imposed:\n$p")
  }

  test("q157 triangles: edge + oriented frames persisted; degree joins broadcast; no cartesian edge product") {
    val p = plan("q157_triangles")
    assert(p.contains("InMemoryRelation"), s"edge frames not persisted:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"wedge enumeration fell back to a cartesian product:\n$p")
    assert(!stripCached(p).contains("FileScan parquet"),
      s"live corpus re-scan (cache bypassed):\n$p")
  }

  test("q158 ann mrr: query sides broadcast; truth/ann merge never cartesian") {
    val p = plan("q158_ann_mrr")
    assert(p.contains("BroadcastExchange"), s"query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      s"corpus-side cartesian:\n$p")
  }

  test("q159 decayed popularity: one item-grain shuffle; top-k is TakeOrdered; scan pruned to ts+props") {
    val p = plan("q159_decayed_popularity")
    assert(shuffles(p) == 1, p)
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("value") && !readSchema.contains("event_type"),
      s"scan not pruned: $readSchema")
  }

  test("q160 key balance: each side is key-grain agg + 1-row rollup; joins never appear") {
    val p = plan("q160_key_balance")
    assert(!p.contains("Join"), s"balance must not join:\n$p")
    // 3 sides × (key-grain exchange + SinglePartition rollup)
    assert(shuffles(p) <= 6, p)
    "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p).foreach { m =>
      assert(!m.group(1).contains(","), s"scan not pruned: ${m.group(1)}")
    }
  }

  test("q161 shipping priority: both date gates pushed to the scans; top-k is TakeOrdered") {
    val p = plan("q161_shipping_priority")
    assert(p.contains("LessThan(o_orderdate"),
      s"order-date gate not pushed:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"ship-date gate not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q162 entry exit: session frame persisted (one fact pass); rollups ride type grain") {
    val p = plan("q162_entry_exit")
    assert(p.contains("InMemoryRelation"), s"session frame not persisted:\n$p")
    assert(!stripCached(p).contains("FileScan parquet"),
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q163 order reconciliation: delta frame persisted (one pass for stats + panel)") {
    val p = plan("q163_order_reconciliation")
    assert(p.contains("InMemoryRelation"), s"delta frame not persisted:\n$p")
    assert(!stripCached(p).contains("FileScan parquet"),
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q164 association rules: item counts + total broadcast; head is TakeOrdered") {
    val p = plan("q164_association_rules")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
    assert(!stripCached(p).contains("SortMergeJoin"),
      s"count join fell back to SMJ:\n$p")
    // pair agg + item-count agg + the two 1-row aggregates' exchanges
    assert(shuffles(p) <= 4, p)
  }

  test("q165 length quantiles: value-grain histogram, no joins; scan pruned to text+source") {
    val p = plan("q165_length_quantiles")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 3, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"scan not pruned: $readSchema")
  }

  test("q166 calibration: both gates fold in ONE map pass — single shuffle to the 10-bucket grain") {
    val p = plan("q166_classifier_calibration")
    assert(shuffles(p) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.contains("text") && !readSchema.contains("lang"),
      s"scan not pruned: $readSchema")
  }

  test("q167 key churn: key-grain flags + 1-row rollup, join-free") {
    val p = plan("q167_key_churn")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) == 2, p) // key grain + SinglePartition rollup
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q168 funnel by arm: depth frame persisted; steps broadcast; never cartesian") {
    val p = plan("q168_funnel_by_arm")
    assert(p.contains("InMemoryRelation"), s"depth frame not persisted:\n$p")
    assert(!stripCached(p).contains("FileScan parquet"),
      s"live corpus re-scan (cache bypassed):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169 sequential rules: basket frame persisted; antecedent counts broadcast; head TakeOrdered") {
    val p = plan("q169_sequential_rules")
    assert(p.contains("InMemoryRelation"), s"baskets not persisted:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
    assert(!stripCached(p).contains("SortMergeJoin"),
      s"count join fell back to SMJ:\n$p")
  }

  test("q170 returned revenue: flag + date gates pushed; nation broadcast; head TakeOrdered") {
    val p = plan("q170_returned_revenue")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"return-flag gate not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date gate not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q171 part concentration: two grain collapses, no joins, TakeOrdered head; 2-column scan") {
    val p = plan("q171_part_concentration")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, p)
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_orderkey"), s"scan not pruned: $readSchema")
  }

  test("q172 promo revenue: one fact pass — conditional agg, no second scan, no fact shuffle before the month grain") {
    val p = plan("q172_promo_revenue")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 2,
      s"expected exactly lineitem + part scans:\n$p")
    assert(shuffles(p) <= 2, p) // month-grain agg + output order
    assert(!stripCached(p).contains("SortMergeJoin"),
      s"part join fell back to SMJ:\n$p")
  }

  test("q174 bracket revenue: both per-side disjunctions extracted and PUSHED; part side broadcast") {
    val p = plan("q174_bracket_revenue")
    // quantity OR-of-ranges reaches the lineitem scan
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity disjunction not pushed to lineitem scan:\n$p")
    // brand∧size disjunction reaches the part scan
    assert(p.contains("EqualTo(p_brand,Brand#1)"),
      s"brand/size disjunction not pushed to part scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part not broadcast:\n$p")
    assert(shuffles(p) <= 1, p) // the 1-row final aggregate only
  }

  test("q175 idle customers: scalar threshold broadcast, ANTI join on the date-gated orders, nation broadcast") {
    val p = plan("q175_idle_customers")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date gate not pushed:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scalar cross join planned as cartesian:\n$p")
  }

  test("q176 engagement gini: one key-grain shuffle; histogram windows never see key-grain rows") {
    val p = plan("q176_engagement_gini")
    // key-grain aggregate (user_id) + count-grain aggregate + the
    // single-partition histogram windows — tiny by construction
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"scan not pruned to the key column: $readSchema")
  }

  test("q177 next item backtest: two sessionize shuffles, model join without cartesian, 1-row report") {
    val p = plan("q177_next_item_backtest")
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 2,
      s"expected one user_id shuffle per half:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q179 top supplier: ship-date pushed; ONE cached fact scan; scalar max is a parallel agg + broadcast") {
    val p = plan("q179_top_supplier")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"window not pushed to the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scalar max planned as cartesian:\n$p")
    // the supplier-grain revenue frame is persisted: live plan reads
    // cache twice (scalar subtree + tie filter), parquet only inside
    // the cached lineage — one fact scan total, and the scalar max is
    // a partial-agg tree reduce, never a no-partitionBy window
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1,
      s"expected only the supplier dim scan live:\n$p")
    assert(p.contains("InMemoryTableScan"), p)
    assertScalarAggOnly(p)
  }

  test("q180 small qty revenue: part-average window rides ONE l_partkey shuffle of ONE pruned scan") {
    val p = plan("q180_small_qty_revenue")
    // the correlated part aggregate is an unordered window over the
    // same rows it gates: exactly one fact scan, exactly one
    // hash(l_partkey) exchange, then the 1-row report
    assert("Exchange hashpartitioning\\(l_partkey".r
      .findAllIn(stripCached(p)).length == 1, p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_orderkey"), s"scan not pruned: $readSchema")
  }

  test("q183 seasonality: one pruned orders scan into the 12-row month grain") {
    val p = plan("q183_revenue_seasonality")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_custkey") &&
      !readSchema.contains("o_orderpriority"), s"scan not pruned: $readSchema")
  }

  test("q184 order gaps: gap lag on one o_custkey shuffle; segment quantiles never see row grain") {
    val p = plan("q184_order_gap_quantiles")
    assert("Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q185 pareto: one customer-grain shuffle; histogram walk at value grain; pruned scan") {
    val p = plan("q185_pareto_coverage")
    assert("Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_orderdate"), s"scan not pruned: $readSchema")
  }

  test("q188 nation movers: nation broadcast; both windows at the year-nation grain; no cartesian") {
    val p = plan("q188_nation_movers")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"nation not broadcast:\n$p")
  }

  test("q189 discount bands: join-free single fact pass, 3-column pruned scan") {
    val p = plan("q189_discount_bands")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, p) // band aggregate + output order
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_shipdate"), s"scan not pruned: $readSchema")
  }

  test("q186/q187 time-hierarchy reports: one pruned orders scan each, windows at the tiny grain") {
    Seq("q186_yoy_growth", "q187_priority_mix").foreach { q =>
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, s"$q:\n$p")
      val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
      assert(!readSchema.contains("o_custkey"), s"$q scan not pruned: $readSchema")
    }
  }

  test("q181 large orders: HAVING filters the order grain BEFORE the joins; TakeOrdered head") {
    val p = plan("q181_large_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
    // the sum_qty >= threshold gate must sit under the first join
    // (between the aggregate and the orders join), not above it
    val lines = p.split("\n")
    val filterIdx = lines.indexWhere(l => l.contains("Filter") &&
      l.contains("sum_qty"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(filterIdx >= 0, s"no sum_qty filter found:\n$p")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"quantity gate not below the join in the tree:\n$p")
  }

  test("q196 BFS: frontier pruned by anti-joins, never a cartesian expansion") {
    // the final-round plan: each prior round is a checkpointed
    // ExistingRDD, so the live tree shows the last expand+prune —
    // a frontier⋈edges join plus the visited-set anti-join
    val p = plan("q196_bfs_reach")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), s"visited-set anti-join missing:\n$p")
  }

  test("q197 seasonal deviation: one pruned orders scan; windows at the year-month grain") {
    val p = plan("q197_seasonal_deviation")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_custkey") &&
      !readSchema.contains("o_orderpriority"), s"scan not pruned: $readSchema")
    // the cross-year window runs on (year,month) grain — after the agg
    val lines = p.split("\n")
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window not above the month-grain aggregate:\n$p")
  }

  test("q199 anomaly sessions: day dim broadcast (theta-join, never sort-merge); sessions ride the user window shuffle") {
    val p = plan("q199_anomaly_sessions")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"interval theta-join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q200 zorder cells: BUILD plan is scan→morton map→cell agg; registered query reads the shared checkpointed cells") {
    // q200's registered entry serves the Shared.memo cell artifact, so
    // its own plan is just the checkpoint scan — the structural pins
    // live on the artifact BUILD, explained directly (the same split
    // ClusteringSpec uses for shared ≡ standalone).
    val p = graft.ops.Layout.zorderCells(
      graft.tables.Tables(spark, sf, "lineitem"),
      "l_partkey", "l_suppkey",
      Queries.ZorderGridBits, Queries.ZorderCellBits)
      .queryExecution.executedPlan.toString
    // the audit is scan → map → cell-grain agg: the only Sort is the
    // final ≤2^cellBits-row output ordering, never a fact-table sort
    assert(!p.contains("Window"), p)
    // morton rides a plain Project over the scan (WSCG participation
    // is pinned in ExpressionsSpec — AQE plan text omits the * marks);
    // the cell aggregate must sit DIRECTLY above it: map then agg,
    // nothing between
    val lines = p.split("\n")
    val mortonIdx = lines.indexWhere(_.contains("graft_morton"))
    assert(mortonIdx > 0, s"no morton projection:\n$p")
    assert(lines(mortonIdx - 1).contains("HashAggregate"),
      s"cell aggregate not directly above the morton map:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.contains("l_partkey") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
    // the SERVED plan: a lineage-truncated artifact scan, no fact work
    val served = plan("q200_zorder_cells")
    assert(served.contains("Scan ExistingRDD"),
      s"q200 not serving the checkpointed cell artifact:\n$served")
    assert(!served.contains("Scan parquet"),
      s"q200 re-scanned the fact table instead of the artifact:\n$served")
  }

  test("q202 triple itemsets: join-free comb — one fact scan, basket agg + triple agg, TakeOrdered head") {
    val p = plan("q202_triple_itemsets")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(shuffles(p) <= 2, p) // user-basket agg + triple-grain agg
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("event_type") && !readSchema.contains("value,"),
      s"scan not pruned: $readSchema")
  }

  test("q203 equi-depth bins: window over DISTINCT values (agg below window), one pruned scan") {
    val p = plan("q203_equidepth_bins")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    val lines = p.split("\n")
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"cumulative window not above the value-grain aggregate:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema == "l_extendedprice:double",
      s"scan not pruned to the one value column: $readSchema")
  }

  test("q204 neyman: one pruned fact pass; design arithmetic on the coalesced stratum grain") {
    val p = plan("q204_neyman_allocation")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(shuffles(p) <= 2, p) // stratum agg; final sort rides coalesce(1)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_orderdate") &&
      !readSchema.contains("o_custkey"), s"scan not pruned: $readSchema")
  }

  test("q205 churn features: two filtered event passes, user-grain join, no cartesian") {
    val p = plan("q205_churn_features")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 2,
      s"expected exactly the feature + label scans:\n$p")
    // the split-date gate must be PUSHED to both scans
    assert("PushedFilters: \\[[^\\]]*(LessThan|GreaterThanOrEqual)\\(ts".r
      .findAllIn(p).length == 2, s"split predicate not pushed:\n$p")
  }

  test("q206 gains table: tier windows above the score-grain aggregate") {
    val p = plan("q206_gains_table")
    assert(!p.contains("CartesianProduct"), p)
    val lines = p.split("\n")
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"cumulative window not above the score-grain aggregate:\n$p")
  }

  test("q207 theil-sen: day-grain pair join is BROADCAST (calendar-bounded), one fact pass") {
    val p = plan("q207_theilsen_trend")
    assert(!p.contains("SortMergeJoin"),
      s"pair join must not shuffle the day frame:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"pair join not broadcast:\n$p")
  }

  test("q208 robust anomaly: trailing windows via day-grain explode, never a fact re-scan") {
    val p = stripCached(plan("q208_robust_anomaly"))
    // the explode must sit ABOVE the day-grain aggregate (cached daily
    // frame), so the ×windowDays factor applies to calendar rows only
    assert("Scan parquet".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q209 fulfillment latency: quantile windows at (priority, value) grain, pruned scans") {
    val p = plan("q209_fulfillment_latency")
    assert(!p.contains("CartesianProduct"), p)
    val lines = p.split("\n")
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window not above the value-grain aggregate:\n$p")
    val readSchemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(readSchemas.forall(s => !s.contains("o_totalprice") &&
      !s.contains("l_quantity")), s"scans not pruned: $readSchemas")
  }

  test("q210 growth accounting: one user-grain fact shuffle (day-set pattern), no join") {
    val p = plan("q210_growth_accounting")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1,
      s"expected exactly one user-grain shuffle:\n$p")
  }

  test("q211 revenue acf: lag explode sits on the checkpointed day grain, never the fact table") {
    val p = stripCached(plan("q211_revenue_acf"))
    assert("Scan parquet".r.findAllIn(p).length == 0,
      s"fact scan leaked past the day-grain checkpoint:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q212 cusum: windows on the checkpointed day grain; exact-decimal alarm compares") {
    val p = stripCached(plan("q212_cusum_revenue"))
    assert("Scan parquet".r.findAllIn(p).length == 0,
      s"fact scan leaked past the day-grain checkpoint:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q213 benford: one pruned fact pass into a 9-row generated dim") {
    val p = plan("q213_benford_audit")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema == "o_totalprice:double",
      s"scan not pruned to the amount column: $readSchema")
  }

  test("q214/q215 privacy profiles: one pruned scan, two-level aggregates, no Expand") {
    Seq("q214_k_anonymity", "q215_l_diversity").foreach { q =>
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, s"$q:\n$p")
      assert(!p.contains("Expand"), s"$q distinct planned as Expand:\n$p")
      val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
      assert(!readSchema.contains("c_name") && !readSchema.contains("c_address"),
        s"$q scan not pruned: $readSchema")
    }
  }

  test("q216-q218 stat reports: single pruned fact pass each, grain-bounded windows") {
    Seq("q216_seasonal_backtest" -> "o_custkey",
      "q217_discount_elasticity" -> "l_orderkey",
      "q218_dow_type_lift" -> "props").foreach { case (q, dropped) =>
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
      assert(!readSchema.contains(dropped), s"$q scan not pruned: $readSchema")
    }
  }

  test("q219 kendall: day-grain pair join broadcast off the checkpoint (no fact re-scan)") {
    val p = stripCached(plan("q219_kendall_daily"))
    assert("Scan parquet".r.findAllIn(p).length == 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q221 skip-gram: both context frames ride ONE sessionize shuffle; TakeOrdered head") {
    val p = plan("q221_skipgram_pairs")
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1,
      s"context windows re-shuffled the fact:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q222 replenishment: ONE fact shuffle (day-set comb, no window over rows)") {
    val p = plan("q222_replenishment_cycle")
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1,
      s"gap comb re-shuffled the purchases:\n$p")
  }

  test("q223 recsys coverage: covered-item set broadcast into ONE events pass") {
    val p = plan("q223_recsys_coverage")
    assert(p.contains("BroadcastHashJoin"), s"covered set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q224/q225 mix reports: one pruned fact pass, windows at report grain, no joins") {
    Seq("q224_growth_decomposition", "q225_order_composition").foreach { q =>
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val lines = p.split("\n")
      val winIdx = lines.indexWhere(_.contains("Window"))
      val aggIdx = lines.lastIndexWhere(_.contains("HashAggregate"))
      assert(winIdx >= 0 && aggIdx > winIdx,
        s"$q window not above the grain aggregate:\n$p")
    }
  }

  test("q231 absorption: one sessionize shuffle builds the matrix; recursion at type-squared grain") {
    val p = plan("q231_absorption_prob")
    assert(!p.contains("CartesianProduct"), p)
    // the unrolled rounds ride checkpointed type-grain frames — the
    // live plan must not re-scan the fact table per round
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 0, p)
  }

  test("q232 conversion hazard: user-grain aggregate + bounded offset explode, no window") {
    val p = plan("q232_conversion_hazard")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1,
      s"expected exactly one user-grain shuffle:\n$p")
  }

  test("q233 audience overlap: top-item dim broadcast from its checkpoint; no cartesian") {
    val p = plan("q233_audience_overlap")
    assert(!p.contains("CartesianProduct"), p)
    // the top-item dim is eagerly checkpointed (its TakeOrdered build
    // runs once, not once per broadcast — r11), so the visible plan
    // reads it as ExistingRDD and broadcasts it into the reach filter
    // and both name-count reattachments
    assert(p.contains("Scan ExistingRDD"), s"top-k dim checkpoint missing:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      s"top-item dim not broadcast:\n$p")
  }

  test("q234 minhash calibration: one signature build feeds bands + pair sides + verify") {
    val p = plan("q234_minhash_calibration")
    assert(!p.contains("CartesianProduct"), p)
    // the persisted signature frame appears as InMemoryRelation scans,
    // never as repeated shingle recomputation in the live plan
    assert("graft_minhash".r.findAllIn(stripCached(p)).isEmpty,
      s"signature recomputed outside the cached frame:\n$p")
  }

  test("q198 source datacard: join-free single documents scan into the source grain") {
    val p = plan("q198_source_datacard")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    // exact multi-distinct = the documented Expand trade, ONE of them
    assert("Expand".r.findAllIn(stripCached(p)).length <= 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("doc_id"), s"scan not pruned: $readSchema")
  }

  test("q235 min-cost supplier: ONE fact shuffle serves offer agg AND part window; TakeOrdered head") {
    val p = plan("q235_min_cost_supplier")
    assert(shuffles(p) == 1, p)
    assert(p.contains("REPARTITION_BY_COL"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q236 product profit: pruned fact scan, dims never shuffle the fact twice") {
    val p = plan("q236_product_profit")
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      s"lineitem scan not pruned: $readSchema")
    assert(shuffles(p) <= 4, p) // li/orders SMJ sides + agg + final sort
  }

  test("q237 important parts: part-grain frame cached — ONE fact scan feeds compare and total") {
    val p = plan("q237_important_parts")
    // live plan reads the cached part-grain frame; only the scalar
    // total (SinglePartition) and the final sort shuffle
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
    assert(shuffles(p) <= 2, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q238 part supplier counts: broadcast anti-join; distinct pairs in bounded shuffles") {
    val p = plan("q238_part_supplier_counts")
    assert(p.contains("BroadcastHashJoin LeftAnti") ||
      p.contains("LeftAnti, BuildRight"), p)
    assert(shuffles(p) <= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q239 excess suppliers: ONE fact shuffle serves supplier agg AND part-year window") {
    val p = plan("q239_excess_suppliers")
    assert(p.contains("REPARTITION_BY_COL"), p)
    // fact shuffle + two supplier-grain (≤100-row) shuffles
    assert(shuffles(p) == 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q240 pruning audit: cells cached (one live fact scan); probes broadcast to the row pass") {
    val p = plan("q240_pruning_audit")
    // the only LIVE parquet scan is the select_rows pass; bounds,
    // totals and the overlap test all read the cached cell table
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1,
      stripCached(p))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q242 pq distortion: broadcast codebook; corpus floats never shuffle") {
    val p = plan("q242_pq_distortion")
    assert(!p.contains("CartesianProduct"), p)
    // (vec, sub) argmin + the m-row rollup + the sort — nothing else
    assert(shuffles(p) <= 3, p)
    assert(p.contains("BroadcastExchange") || p.contains("InMemoryRelation"), p)
  }

  test("q243 ivf probe curve: depths read the cached scored frame, never the corpus") {
    val p = plan("q243_ivf_probe_curve")
    assert(!p.contains("CartesianProduct"), p)
    // scored + truth are persisted: at most the truth build's scan
    // appears live; the four depths must not re-touch parquet
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1,
      stripCached(p))
  }

  test("q244 order backlog: one scan per table (explode deltas, no double pass); day-grain walk") {
    val p = plan("q244_order_backlog")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 2, p)
    assert(p.contains("Generate explode"), p)
    assert(p.contains("SinglePartition"), p) // the bounded day walk
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q245 doc keywords: one tokenize pass cached; df join + WindowGroupLimit head") {
    val p = plan("q245_doc_keywords")
    // the (doc, token) frame is persisted — df, N, and the score join
    // all read the cache; no second documents scan
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q246 clustering coeff: degree-oriented wedges off the cached edge frames") {
    val p = plan("q246_clustering_coeff")
    assert(!p.contains("CartesianProduct"), p)
    // wedge join + corner count ride the persisted oriented frame;
    // the co-vis pair build lives in the shared cached lineage
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
  }

  test("q247 t-closeness: one scan; global/class grains re-aggregate the cached gs frame") {
    val p = plan("q247_t_closeness")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
  }

  test("q248 grouping sets: one Expand for the margins + the SQL-semantics grand total") {
    val p = plan("q248_grouping_sets")
    assert("Expand".r.findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("Join"), p)
    // margins agg + grand-total SinglePartition + the final sort; the
    // grand total is a second scan BY DESIGN (empty-table semantics)
    assert(shuffles(p) <= 3, p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 2, p)
  }

  test("q249 vocab growth: one cached tokenize pass; checkpoints broadcast theta-joins") {
    val p = plan("q249_vocab_growth")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q250 revenue bridge: ONE conditional-sum fact pass — no self-join, no pivot") {
    val p = plan("q250_revenue_bridge")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    // orders appears once: both years are CASE sums in one aggregate
    val orders = "Scan parquet [^\n]*orders".r.findAllIn(stripCached(p)).length
    assert(orders == 1, s"orders scanned $orders times:\n$p")
  }

  test("q251-q253 integrity audits: single pruned fact pass each") {
    Seq("q251_duplicate_orders", "q253_linenumber_audit").foreach { q =>
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
    val p = plan("q252_price_dispersion")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q254/q256 part and weighted-quantile panels: one pruned fact pass each") {
    val p4 = plan("q254_zero_sales_days")
    assert("Scan parquet".r.findAllIn(stripCached(p4)).length == 1, p4)
    assert(p4.contains("TakeOrderedAndProject"), p4)
    val p6 = plan("q256_weighted_price_quantiles")
    assert("Scan parquet".r.findAllIn(stripCached(p6)).length == 1, p6)
    // the window runs over the (flag, price) value grain, not rows
    assert(!p6.contains("CartesianProduct"), p6)
  }

  test("q257 trailing revenue: one fact pass; RANGE frame on the bounded day walk") {
    val p = plan("q257_trailing_revenue")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(p.contains("RangeFrame"), p)
    assert(p.contains("SinglePartition"), p) // calendar-bounded walk
  }

  test("q255 duplicate-provenance matrix: diagonal + cross off the cached hash-source grain") {
    val p = plan("q255_cross_source_dups")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty, stripCached(p))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q241 lsh planner: one signature build; the 5 configs read the cached scored frame") {
    val p = plan("q241_lsh_planner")
    assert(!p.contains("CartesianProduct"), p)
    // no shingle/signature recomputation outside the cached frames
    assert("graft_minhash".r.findAllIn(stripCached(p)).isEmpty,
      s"signature recomputed outside the cached frame:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).isEmpty,
      s"raw docs rescanned by the config fan-out:\n${stripCached(p)}")
  }

  test("q260 mann whitney: scan pruned to user_id; user agg + value-grain rank walk only") {
    val p = plan("q260_mann_whitney")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema == "user_id:bigint", s"scan not pruned: $readSchema")
    // user agg + metric-value agg + the single-partition rank walk
    assert(shuffles(p) <= 3, p)
    assert(!p.contains("Join"), p)
  }

  test("q261 trailing median: panel persisted (one live fact scan); self-join broadcast, never sort-merge") {
    val p = plan("q261_trailing_median")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1,
      stripCached(p))
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q262 zipf decay: one pruned scan (inside the persisted head); TakeOrdered, never a global sort") {
    val p = plan("q262_zipf_decay")
    // the corpus tokenize runs ONCE at head materialization; both join
    // sides then read the 2·maxRank-row cache
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 0, p)
    assert(p.contains("TakeOrderedAndProject"), s"vocab head global-sorted:\n$p")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("doc_id") && !readSchema.contains("lang"),
      s"scan not pruned: $readSchema")
  }

  test("q263 link prediction: rides the co-vis artifact (no parquet); degree maps broadcast; top-k pushed") {
    val p = plan("q263_link_prediction")
    assert(!stripCached(p).contains("Scan parquet"),
      s"re-derived the pair artifact from parquet:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"degree map not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$p")
  }

  test("q264 event burst dedup: one pruned scan; lag window rides the (user,type) shuffle") {
    val p = plan("q264_event_burst_dedup")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
    // lag window + type-grain rollup + the ≤|types|-row output sort
    assert(shuffles(p) <= 3, p)
  }

  test("q265 layout compare: shared Z cells + persisted linear cells; probes broadcast; no cartesian") {
    val p = plan("q265_layout_compare")
    // live fact scans: the two select_rows passes (+ nothing else; both
    // cell tables come from the artifact / the persisted frame)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 3,
      stripCached(p))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), s"probe overlap join not broadcast:\n$p")
  }

  test("q266 bm25 ndcg: serves the shared outcomes artifact, never re-ranking the corpus") {
    val p = plan("q266_bm25_ndcg")
    assert(p.contains("Scan ExistingRDD"),
      s"not serving the checkpointed outcomes:\n$p")
    assert(!stripCached(p).contains("Scan parquet"),
      s"re-ran the BM25 ranking pass:\n$p")
  }

  test("q267 markov eval: steps persisted (one live fact chain); model join broadcast") {
    val p = plan("q267_markov_eval")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1,
      stripCached(p))
    assert(!p.contains("SortMergeJoin"), s"model join shuffled the steps:\n$p")
  }

  test("q268 revenue pareto: one pruned scan (inside the persisted value grain); scalar gini broadcast") {
    val p = plan("q268_revenue_pareto")
    // the fact chain runs ONCE at value-grain materialization; both
    // the gini rollup and the tier branch read the cache
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 0,
      stripCached(p))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_orderdate") && !readSchema.contains("o_orderpriority"),
      s"scan not pruned: $readSchema")
  }

  test("q269 engagement auc: pruned scan; user agg + value-grain rank walk, join-free") {
    val p = plan("q269_engagement_auc")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
    assert(shuffles(p) <= 3, p)
    assert(!p.contains("Join"), p)
  }

  test("q270 quarterly pivot: declared domain (no distinct-values job); dims broadcast") {
    val p = plan("q270_quarterly_pivot")
    assert(p.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the two-phase pivot aggregate + the ≤|nations|-row output sort
    assert(shuffles(p) <= 3, p)
  }

  test("q271 quarterly unpivot: Expand over the wide report, no extra fact pass") {
    val p = plan("q271_quarterly_unpivot")
    assert(p.contains("Expand"), s"unpivot did not plan as Expand:\n$p")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 3, p)
  }

  test("day revenue panel BUILD: one pruned orders scan, one day shuffle") {
    // the shared artifact every calendar op rides (round 10); the
    // scan pins live HERE, and each family query pins that it reads
    // the artifact instead of re-scanning (the q200/q114 split)
    val p = graft.ops.Retention
      .dayRevenuePanelBuild(graft.tables.Tables(spark, sf, "orders"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(shuffles(p) == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.contains("o_orderdate") &&
      readSchema.contains("o_totalprice") && !readSchema.contains("o_comment"),
      s"scan not pruned: $readSchema")
  }

  test("q272 ewma revenue: rides the shared day panel; day-grain fan-out, no NLJ") {
    val p = plan("q272_ewma_revenue")
    assert(!stripCached(p).contains("Scan parquet"),
      s"q272 re-scanned orders instead of the day-panel artifact:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
    // the forward fan-out is a sequence explode at day grain — never
    // a nested-loop range join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q273 signal kappa: single corpus scan, join-free 5-sum aggregate") {
    val p = plan("q273_signal_kappa")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("Join"), p)
    // one doc-grain partial agg into a 1-row final agg
    assert(shuffles(p) <= 1, p)
  }

  test("q274 chi square: user-grain pass then one-row arithmetic, join-free") {
    val p = plan("q274_chi_square_lift")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, p)
  }

  test("q276 rrf fusion: rides the shared ANN artifact (no parquet); probe-grain merges only") {
    val p = plan("q276_rrf_fusion")
    assert(!stripCached(p).contains("Scan parquet"),
      s"fusion must reuse the memoized ANN index:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q277 kcore: item-grain peeling over the shared co-vis artifact") {
    val p = plan("q277_kcore")
    assert(!stripCached(p).contains("Scan parquet"),
      s"kcore must reuse the memoized co-vis pairs:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q278 burstiness: pruned scan, day-grain aggregates, 1-row broadcast span") {
    val p = plan("q278_burstiness")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q279 bloom pruning: one persisted assignment pass; probes broadcast, no cartesian") {
    val p = plan("q279_bloom_pruning")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema.contains("l_partkey") &&
      readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"scan not pruned: $readSchema")
    // the persisted cell assignment hides its scan; only the probe
    // draw re-touches parquet live
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q280 covis backtest: two pruned halves, pair-grain shelf, 1-row report") {
    val p = plan("q280_covis_backtest")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("value"), s"scan not pruned: $readSchema")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q275 quantile normalize: value-grain windows, never fact-row windows") {
    val p = plan("q275_quantile_normalize")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    // fact collapses to (type, cents) BEFORE any Window node
    val winIdx = p.linesIterator.indexWhere(_.contains("Window"))
    val aggIdx = p.linesIterator.indexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must sit above the value-grain aggregate:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q281 rolling wau sketch: one cached fact collapse; HLL unions ride the day fan-out") {
    val p = plan("q281_rolling_wau_sketch")
    // ud and daySk are persisted — live plan reads the caches, parquet
    // is scanned only inside the (stripped) cache build
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(p.contains("hll_union_agg"), s"sketch union branch missing:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q282 diff in diff: pruned orders scan, broadcast dims, 2-row estimator arithmetic") {
    val p = plan("q282_diff_in_diff")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_comment"), s"scan not pruned: $readSchema")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 4, p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the only nested-loop is the broadcast 1-row did scalar
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q283 timeout sweep: one pruned scan, one lag window, join-free sweep") {
    val p = plan("q283_timeout_sweep")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
    assert(!p.contains("Join"), p)
  }

  test("q284 readability: pure map stage into a source-grain aggregate, join-free") {
    val p = plan("q284_readability")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length == 1, p)
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, p) // source agg + output sort
  }

  test("q285 bigram perplexity: model tables ride the cached (doc,bigram) partials") {
    val p = plan("q285_bigram_perplexity")
    // docBi and perDoc are persisted; the only live parquet touch is
    // the vocab-size scalar's tokenize pass
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q286 anisotropy: dim-grain cache reused; projection is a zip_with map, no fact join") {
    val p = plan("q286_anisotropy")
    // nRow + projection pass touch parquet live; dims' build is cached
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"fact-grain join crept in:\n$p")
  }

  test("q287 brown forecast: cached day panel, calendar-grain walk, no NLJ range join") {
    val p = plan("q287_brown_forecast")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q288 negative sampling: vocab cache + TakeOrdered head, no re-tokenize") {
    val p = plan("q288_negative_sampling")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q289 bootstrap ci: cached user grain, pruned scan, replicate fan-out is a map") {
    val p = plan("q289_bootstrap_ci")
    // users persisted: both the replicate fan-out and the observed
    // delta read the cache — zero live parquet touches
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      s"replicate weighting must be a map stage, not a join:\n$p")
  }

  test("q291 quantile forecast: cached day panel; window arrays at calendar grain") {
    val p = plan("q291_quantile_forecast")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q292 markov attribution: walks ride checkpointed type-grain frames") {
    val p = plan("q292_markov_attribution")
    // the lag frame is persisted and every walk round is
    // localCheckpointed — at most the cache build touches parquet
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      s"type-grain walk must not need a sort-merge join:\n$p")
  }

  test("q293 seasonal brown: cached spine; index and report at calendar grain") {
    val p = plan("q293_seasonal_brown")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q290 supplier skyline: one fact join to supplier grain; dim-grain sort-scan") {
    val p = plan("q290_supplier_skyline")
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment"), s"scan not pruned: $readSchema")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q294 position attribution: join-free window credits; one fact shuffle; props pruned") {
    val p = plan("q294_position_attribution")
    // suffix sums + lead + explode replace the naive conversion×prefix
    // self-join — no join node of any kind may appear
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q295 ks test: join-free; CDF walk at value grain; scan pruned to user_id") {
    val p = plan("q295_ks_test")
    assert(!p.contains("Join"), p)
    // one fact shuffle to user grain; the rest is value-grain metadata
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(readSchema == "user_id:bigint", s"scan not pruned: $readSchema")
  }

  test("q296 cms check: one corpus pass (cached token counts); sketch join broadcast") {
    val p = plan("q296_cms_check")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q297 scd2 history: ONE user shuffle end to end (run/lag/lead subset-clustered)") {
    val p = plan("q297_scd2_history")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q298 scd2 revenue: as-of union+window, never a range join") {
    val p = plan("q298_scd2_revenue")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // probe+build union rides user_id partitioning; report is tier grain
    assert(shuffles(p) <= 5, p)
  }

  test("q299 transition entropy: one sessionize shuffle; type-grain walk; join-free") {
    val p = plan("q299_transition_entropy")
    assert(!p.contains("Join"), p)
    // the pin is about RUNTIME work, so count LIVE exchanges only
    // (stripCached): when another query has materialized the
    // transition-counts frame, Spark substitutes the InMemoryRelation
    // and the sessionize exchange becomes historical lineage TEXT —
    // with nested caches it can even appear under several plan_ids
    // (found by the full suite at 332 queries — the q299 cache
    // lesson, third edition). Served-from-cache (0 live exchanges)
    // is strictly cheaper than the pinned single shuffle.
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length <= 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q301 autocorrelation: cached day panel; leads share one calendar window; no cartesian") {
    val p = plan("q301_autocorrelation")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    // all four lags read ONE window pass (a second Window node over
    // daynum would mean the leads split)
    assert("Window".r.findAllIn(stripCached(p)).length <= 2, p)
  }

  test("q302 power iteration: cached quantized corpus; sweeps are map passes, no fact join") {
    val p = plan("q302_power_iteration")
    assert(!stripCached(p).contains("Scan parquet"),
      s"corpus re-scanned live:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"fact-grain join crept in:\n$p")
  }

  test("q303 sketch quantiles: one fact pass (cached cents histogram); band walk at band grain") {
    val p = plan("q303_sketch_quantiles")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
  }

  test("q304 path trigrams: both leads ride the one sessionize shuffle; join-free") {
    val p = plan("q304_path_trigrams")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length == 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"scan not pruned: $readSchema")
  }

  test("q305 scd2 census: cached history; one ts-only bounds scan; cuts broadcast") {
    val p = plan("q305_scd2_census")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q306 join cardinality: key-grain sums, never a row join; pruned scans") {
    val p = plan("q306_join_cardinality")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => !s.contains("props") && !s.contains("o_comment")),
      s"scan not pruned: $schemas")
  }

  test("q307 runs test: cached day panel; sign walk at calendar grain") {
    val p = plan("q307_runs_test")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q308 knn label accuracy: rides the shared ANN artifact; no live fact scan") {
    val p = plan("q308_knn_label_acc")
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q309 tier migration: cached user-month grain; one fact scan; pruned") {
    val p = plan("q309_tier_migration")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_clerk"),
      s"scan not pruned: $readSchema")
  }

  test("q312 bloom semi: bitmap broadcast map pass; cached build keys; pruned scans") {
    val p = plan("q312_bloom_semi")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // fact scanned twice (bloom pass + exact truth), orders once via
    // the cached key set
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"scan reads more than key+filter: $schemas")
  }

  test("q313 cross correlation: cached day panel; one calendar window for all lags") {
    val p = plan("q313_cross_correlation")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert("Window".r.findAllIn(stripCached(p)).length <= 2, p)
  }

  test("q311 variance decomposition: cached day panel; calendar-grain layers") {
    val p = plan("q311_variance_decomp")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q310 price index: cached part-month grain; one pruned fact scan") {
    val p = plan("q310_price_index")
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    val readSchema = "ReadSchema: struct<([^>]*)".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan not pruned: $readSchema")
  }

  test("q300 label prop: rides the checkpointed co-vis artifact; no cartesian, no live fact scan") {
    val p = plan("q300_label_prop")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the pair build lives in the Shared artifact: the query plan must
    // read the checkpointed RDD, never re-scan events
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q314 shapley: one fact shuffle to mask grain; coalition game is metadata; props pruned") {
    val p = plan("q314_shapley_attribution")
    // the fact stream collapses at (user, session) then mask grain
    // BEFORE the localCheckpoint; the live plan shows the game side:
    // no cartesian product, no parquet re-scan of events
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s =>
      !s.contains("props") && !s.contains("value")),
      s"scan not pruned: $schemas")
  }

  test("q315 association screen: five pruned scans; level-grain grid is broadcast metadata") {
    val p = plan("q315_association_screen")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 5, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"a contingency scan reads more than its two columns: $schemas")
  }

  test("q316 fuzzy name match: name-domain grain rides one cached scan; TakeOrdered head") {
    val p = plan("q316_fuzzy_name_match")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"scan reads more than name+id: $schemas")
  }

  test("q317 haar energy: rides the shared day panel; dyadic fan-out is calendar-grain") {
    val p = plan("q317_haar_energy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"),
      s"q317 re-scanned orders instead of the day-panel artifact:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q318 croston: cached part grain; one partkey shuffle; span is a parallel agg + broadcast") {
    val p = plan("q318_croston_demand")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert("Exchange hashpartitioning\\(partkey".r
      .findAllIn(stripCached(p)).length <= 1, p)
    // the span scalar must never come back as a no-partitionBy window
    // (Exchange SinglePartition over the whole part grain)
    assert(p.contains("InMemoryTableScan"), p)
    assertScalarAggOnly(p)
  }

  test("q319 fd audit: six pruned two-column scans; cell→key→report aggregate ladder") {
    val p = plan("q319_fd_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 6, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"an FD scan reads more than its two columns: $schemas")
  }

  test("q320 revenue retention: one cached fact pass; alignment join at (cust, month) grain") {
    val p = plan("q320_revenue_retention")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r
      .findFirstMatchIn(p).get.group(1)
    assert(readSchema.split(",").length <= 3,
      s"scan not pruned to cust+date+price: $readSchema")
  }

  test("q321 deseasonalized cusum: rides the shared STL artifact; calendar-grain walk") {
    val p = plan("q321_deseasonalized_cusum")
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"),
      s"q321 re-scanned orders instead of the stl_remainder artifact:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q322 hub knockout: rides the checkpointed co-vis artifact; no live fact scan") {
    val p = plan("q322_hub_knockout")
    assert(!p.contains("CartesianProduct"), p)
    // pair build lives in the Shared artifact — the query plan reads
    // checkpointed RDDs, never re-scans events parquet
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q324 join order audit: key-grain sums off one cached pair frame; no fact pairing") {
    val p = plan("q324_join_order_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 3, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"a scan reads more than its keys+filter: $schemas")
  }

  test("q325 latency sla trend: one fact join to value grain; slope set is month metadata") {
    val p = plan("q325_latency_sla_trend")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 2, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s => s.split(",").length <= 2),
      s"a scan reads more than key+date: $schemas")
  }

  test("q326 separability auc: rides the checkpointed ANN index; value-grain AUC walk") {
    val p = plan("q326_separability_auc")
    assert(!p.contains("CartesianProduct"), p)
    // the quantized corpus lives in the Shared artifact — only the
    // labels join may touch parquet
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q327 post stratified lift: one fact pass to user grain; strata are value-grain metadata") {
    val p = plan("q327_post_stratified_lift")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    val schemas = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(schemas.forall(s =>
      !s.contains("props") && !s.contains("ts")),
      s"scan not pruned: $schemas")
  }

  test("q328 did event study: rel-month grain is checkpointed; reference join is metadata") {
    val p = plan("q328_did_event_study")
    // the (group, rel-month) build lives behind the localCheckpoint
    // (the q314 pin situation); the visible plan is the ≤2W-row
    // reference normalization — nothing heavier may appear
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q329 abc xyz: cached (part,week) grain; dimension-bounded rank window; 9-cell census") {
    val p = plan("q329_abc_xyz")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r
      .findFirstMatchIn(p).get.group(1)
    assert(readSchema.split(",").length <= 4,
      s"scan not pruned: $readSchema")
  }

  test("q330 source transfer: corpus tokenizes once into the cached bigram frame") {
    val p = plan("q330_source_transfer")
    assert(!p.contains("CartesianProduct"), p)
    // srcBi is persisted: at most the vocab branch re-reads parquet
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q331 silhouette: per-cluster grain is checkpointed; overall row derives from it") {
    val p = plan("q331_silhouette")
    // the fit + distance map live behind the k-row checkpoint (the
    // cached quantized corpus scans once at build time); the visible
    // plan is metadata
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q332 props key drift: one pruned scan to (side, key) grain") {
    val p = plan("q332_props_key_drift")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    val readSchema = "ReadSchema: struct<([^>]*)".r
      .findFirstMatchIn(p).get.group(1)
    assert(readSchema.split(",").length <= 2 &&
      readSchema.contains("props"),
      s"scan not pruned to ts+props: $readSchema")
  }

  test("q333 revenue cohort triangle: checkpointed order-month grain; month^2 metadata after") {
    val p = plan("q333_revenue_cohort_triangle")
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q323 newsvendor: cached (part,week) grain; no dense spine; span is a parallel agg + broadcast") {
    val p = plan("q323_newsvendor_stock")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
    assert("Exchange hashpartitioning\\(partkey".r
      .findAllIn(stripCached(p)).length <= 2, p)
    // the week-span scalar must never come back as a no-partitionBy
    // window (Exchange SinglePartition over the whole part grain)
    assertScalarAggOnly(p)
  }

  test("q334 changepoint: rides the shared day panel; the argmax runs on the day spine") {
    val p = plan("q334_changepoint")
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"),
      s"q334 re-scanned orders instead of the day-panel artifact:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q335 permutation test: ONE fact shuffle to user grain; replicates map-side combine") {
    // the replicate explode must collapse to reps rows via partial
    // aggregation — the rep shuffle moves reps-grain rows, and the
    // user collapse is the only fact-sized exchange
    val p = plan("q335_permutation_test")
    assert(!p.contains("CartesianProduct"), p)
    assert("partial_sum|partial_count|Partial".r
      .findAllIn(p).nonEmpty, p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q338 ktruss: degree-oriented wedges — no cartesian, node tables broadcast") {
    val p = plan("q338_ktruss")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q339 source value knn: probes broadcast; panels re-rank candidates, never rescore") {
    val p = plan("q339_source_value_knn")
    assert(!p.contains("CartesianProduct"), p)
    // exactly one live nested-loop (the probe broadcast cross); the
    // 21 exclusion panels ride the checkpointed candidate frame
    assert(p.contains("Scan ExistingRDD"), p)
    assert("DotProductLong|dot".r.findAllIn(stripCached(p)).isEmpty ||
      "BroadcastNestedLoopJoin".r.findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q341 hubness: sample^2 stays behind one broadcast cross; moments are 1-row") {
    val p = plan("q341_hubness")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q345 gini trend: one fact shuffle to (month, customer); windows reuse it") {
    val p = plan("q345_gini_trend")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q347 entity rollup: part->entity map broadcast onto the partkey-grain fact") {
    val p = plan("q347_entity_rollup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    // the fact side aggregates at partkey grain BEFORE the map join
    assert("Exchange hashpartitioning\\(l_partkey".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q348 channel retention: window and user aggregate share one user shuffle") {
    val p = plan("q348_channel_retention")
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q356 kaplan meier: the collected walk leaves only a local-table scan") {
    // the user collapse + lifetime aggregate run BEFORE the driver
    // ladder; the published frame is a parallelized local table —
    // zero exchanges, zero fact scans in the live plan
    val p = plan("q356_kaplan_meier")
    assert(shuffles(p) == 0, p)
    assert(!stripCached(p).contains("Scan parquet"), p)
  }

  test("q358 priority sample: TakeOrdered head, no shuffle of the corpus") {
    val p = plan("q358_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only exchanges tolerated are the ≤(k+1)-row head's own
    // single-partition window + the 1-row τ broadcast — never a
    // corpus-sized hash exchange
    assert("Exchange hashpartitioning".r
      .findAllIn(stripCached(p)).isEmpty, p)
  }

  test("q360 quantile treatment: ONE fact shuffle to user grain; arm windows reuse it") {
    val p = plan("q360_quantile_treatment")
    assert(!p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }

  test("q363 mann kendall: rides the shared day panel; pair join is a day-grain broadcast") {
    val p = plan("q363_mann_kendall")
    assert(!p.contains("CartesianProduct"), p)
    assert(!stripCached(p).contains("Scan parquet"),
      s"q363 re-scanned orders instead of the day-panel artifact:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
    // the calendar² pair frame forms behind a broadcast of the
    // day-grain panel, never a shuffle of it
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q361 fdr screen: replicates map-side combine to (type, rep) grain") {
    val p = plan("q361_fdr_screen")
    assert(!p.contains("CartesianProduct"), p)
    assert("partial_sum|partial_count|Partial".r.findAllIn(p).nonEmpty, p)
    // one fact collapse to (type, user); the ×reps explode shuffles
    // only (type, rep)-grain partials
    assert("Exchange hashpartitioning\\(event_type#\\d+, user_id".r
      .findAllIn(stripCached(p)).length <= 1, p)
  }
}
