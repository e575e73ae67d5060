/** graft — a Spark-native analytics engine with the query surface of
  * ABigdataer/AnalysisOfUserBehavior, rebuilt idiomatically on
  * `org.apache.spark.sql` (DataFrame/Dataset + Catalyst + Structured
  * Streaming) and extended with the operators a large-scale
  * training-data pipeline needs.
  *
  * Library map (every operator is a pure `DataFrame => DataFrame`
  * unless noted):
  *
  *  - [[graft.tables.Tables]] — parquet table loaders (handles the
  *    events table's TIMESTAMP(NANOS)).
  *  - [[graft.ops.Sessionize]] / [[graft.ops.SessionStats]] /
  *    [[graft.ops.SessionFilter]] / [[graft.ops.StratifiedExtract]] —
  *    gap sessionization, the 16-bucket histogram, optional-predicate
  *    filtering, deterministic stratified sampling.
  *  - [[graft.ops.TopK]] / [[graft.ops.PageFunnel]] /
  *    [[graft.ops.AreaTopProducts]] — category/session ranking, the
  *    page single-jump funnel, area top-3 hot products.
  *  - [[graft.ops.AdAnalytics]] — ad-click blacklist / stats /
  *    province top-N / minute trend (batch shapes shared by the
  *    streaming jobs).
  *  - [[graft.ops.Joins]] / [[graft.ops.Skew]] /
  *    [[graft.ops.Percentiles]] — semi/anti/left-fill combinators,
  *    salted set-valued aggregation, exact + sketch percentiles,
  *    rollup, HLL distinct.
  *  - [[graft.ops.Dedup]] / [[graft.ops.Similarity]] /
  *    [[graft.ops.TextAnalysis]] / [[graft.ops.Multimodal]] — the
  *    training-data pipeline: exact/MinHash-LSH/n-gram/SimHash dedup,
  *    kNN/LSH/IVF similarity search, language-ID/quality/token/
  *    fingerprint text analysis, binary media columns with a stubbed
  *    codec boundary.
  *  - [[graft.ops.RefShape]] — the reference's §1.3 MySQL result-table
  *    shapes, produced from these frames (the switch-over surface for
  *    a reference user).
  *  - [[graft.streaming.AdClickStream]] /
  *    [[graft.streaming.SessionStream]] — Structured Streaming jobs
  *    (foreachBatch upsert sinks, flatMapGroupsWithState
  *    sessionization); [[graft.sink.KeyedStore]] — the §1.3 upsert
  *    sink semantics over JDBC or in-memory.
  *  - [[graft.expressions.DotProductLong]] /
  *    [[graft.expressions.MinHashSig]] / [[graft.expressions.SimHash]]
  *    / [[graft.expressions.Winnow]] — codegen'd Catalyst expressions
  *    for the per-row hot loops; [[graft.plans.GraftExtensions]]
  *    registers the dot-product fusion rule via
  *    `spark.sql.extensions=graft.plans.GraftExtensions`.
  *  - [[graft.SparkEntry]] — the driver contract: 39 named queries
  *    with DuckDB oracle twins; [[graft.Verify]], [[graft.Bench]],
  *    [[graft.Explain]], [[graft.ScaleProbe]] — the correctness /
  *    timing / plan / scaling harnesses.
  *
  * ==Cache ownership convention==
  *
  * Operators that reference an intermediate frame more than once in
  * one returned plan (coVisitation's edge list, triangleStats'
  * oriented edges, entryExit, orderReconciliation, association/
  * sequentialRules, windowedFunnelByArm, trainedCodebook) `persist`
  * that intermediate and return a LAZY frame — so they cannot
  * unpersist it themselves: the consumer hasn't run yet. The CALLER
  * owns the cache: a long-lived session reclaims these entries with
  * `spark.catalog.clearCache()` (Bench does so between queries), or
  * unpersists selectively after materializing the result. Entries are
  * intermediate-grain (pair sets, aggregate frames), never corpus
  * text/floats. Cross-query artifacts deliberately OUTLIVE
  * clearCache via [[graft.ops.Shared]] (localCheckpoint blocks) —
  * see its disclosure scaladoc.
  */
package object graft
