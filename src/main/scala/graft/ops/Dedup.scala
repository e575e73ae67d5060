package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (documents
  * table). Four families, as a 100 TB corpus needs all of them:
  *
  *  - exact:   md5(text) hash-groupBy — one shuffle on the hash.
  *  - MinHash+LSH: shingle → 16 md5-min signatures → 4 bands × 4 rows →
  *    band-bucket self-join → exact-Jaccard verify of candidates only.
  *    The self-join shuffles on (band, band_hash), so the pair blowup is
  *    bounded by bucket size, never n² — that is the scale path.
  *  - n-gram Jaccard with fingerprint blocking: candidates share the
  *    min-shingle fingerprint (single cheap key), verified exactly.
  *  - SimHash: 32-bit token-vote signature; hamming-ball pairing.
  *
  * Portability: MinHash uses MIN over md5 hex *strings* (total order
  * identical everywhere); SimHash parses md5 nibbles via
  * `instr('0123456789abcdef', c)-1`. Both hash-exact vs the DuckDB
  * oracle — no engine-specific hash functions anywhere.
  */
object Dedup {

  val ShingleSize = 3
  val NumHashes = 16
  val NumBands = 4 // 4 rows per band
  val SimhashBits = 32

  /** Distinct k-word shingles per document (empty when too short). */
  def withShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens", expr(TextAnalysis.TokensExpr))
      .withColumn("shingles", expr(
        s"""CASE WHEN size(tokens) >= $ShingleSize THEN
           |  array_distinct(transform(sequence(1, size(tokens) - ${ShingleSize - 1}),
           |    i -> concat_ws(' ', element_at(tokens, i), element_at(tokens, i + 1),
           |                   element_at(tokens, i + 2))))
           |ELSE array() END""".stripMargin))

  /** Exact dedup: canonical (min) doc id + multiplicity per text hash. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("dup_count"))

  /** Provenance-aware exact dedup: when the same text arrives from
    * several sources, keep the copy from the HIGHEST-priority source
    * (curated > licensed > crawl — the standard mixture rule), doc-id
    * tie-break. Same one-shuffle shape as [[exactDedup]]: the winner
    * is a min over a packed (−priority, doc_id) struct, so the argmax
    * stays a partial-aggregable hash aggregate — no window over dup
    * groups, no second pass. `priority` is a typed when-chain (source
    * names are data-domain strings — never spliced into SQL text);
    * absent sources get `defaultPriority`. */
  def canonicalBySource(docs: DataFrame, priority: Map[String, Long],
      defaultPriority: Long = 0L): DataFrame = {
    val prio = priority.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPriority)) { case (acc, (s, p)) =>
        when(col("source") === lit(s), lit(p)).otherwise(acc)
      }
    docs
      .filter(col("text").isNotNull)
      .select(md5(col("text")).as("text_hash"), col("doc_id"),
        prio.cast("long").as("prio"))
      .groupBy(col("text_hash"))
      .agg(
        count(lit(1)).as("dup_count"),
        min(struct((-col("prio")).as("np"), col("doc_id").as("id"))).as("w"))
      .select(col("text_hash"), col("w.id").as("canonical_doc_id"),
        (-col("w.np")).as("canonical_priority"), col("dup_count"))
  }

  /** MinHash signature columns mh00..mh15: per hash k, the minimum of
    * a k-mixed 28-bit md5 over the document's shingle set — computed
    * in ONE fused pass by the graft_minhash_sig expression (one md5
    * per shingle instead of NumHashes; see
    * graft.expressions.MinHashSig for the exact hash family and its
    * DuckDB oracle twin). */
  def minhashSignature(docs: DataFrame): DataFrame = {
    val sig = withShingles(docs)
      .withColumn("sig",
        graft.expressions.MinHashSig.sig(col("shingles"), NumHashes))
    (0 until NumHashes).foldLeft(sig) { (df, k) =>
      df.withColumn(f"mh$k%02d", element_at(col("sig"), k + 1))
    }.drop("sig")
  }

  /** LSH band keys: one row per (doc, band) with the band's md5 over its
    * 4 consecutive signature components. */
  def lshBands(sig: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      val cols = (0 until NumHashes / NumBands)
        .map(r => f"mh${b * NumHashes / NumBands + r}%02d")
      // null-PROPAGATING concat (matches the oracle's `||`), with the
      // same "|" separators: a no-shingle doc gets a null band hash
      // and so never pairs.
      val cat = cols.map(c => col(c).cast("string"))
        .reduce((a, x) => concat(a, lit("|"), x))
      struct(lit(b).as("band"), md5(cat).as("band_hash"))
    }
    val kept = keep.map(col)
    sig.select(col("doc_id") +: kept :+ explode(array(bands: _*)).as("bk"): _*)
      .select(col("doc_id") +: kept :+ col("bk.band").as("band") :+
        col("bk.band_hash").as("band_hash"): _*)
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket. */
  def lshCandidatePairs(docs: DataFrame): DataFrame =
    lshCandidatePairsFromBands(lshBands(minhashSignature(docs)))

  private def lshCandidatePairsFromBands(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** MinHash sketch CALIBRATION — is 16 permutations enough? For
    * every LSH candidate pair, the signature's own similarity
    * estimate (matching components / 16 → est_bp = 625·matches)
    * against the exact shingle Jaccard, rolled up per match count:
    * n_pairs, mean exact Jaccard, and the mean absolute estimate
    * error — the table that justifies (or indicts) the signature
    * width before anyone trusts q22's verdicts at 100 TB. A healthy
    * sketch shows mean_jaccard_bp ≈ est_bp per row; drift at the low
    * bands means the candidate filter is doing the real work.
    *
    * One signature pass (persisted — bands + both pair sides + the
    * exact verify all read it), the banded candidate join, a ≤17-row
    * report. All integer (625·matches exact; means are floor divs). */
  def minhashCalibration(docs: DataFrame): DataFrame = {
    val sig = minhashSignature(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidatePairsFromBands(lshBands(sig))
    val mhCols = (0 until NumHashes).map(k => f"mh$k%02d")
    val a = sig.select(col("doc_id").as("doc_a") +:
      col("shingles").as("sh_a") +:
      mhCols.map(c => col(c).as(s"a_$c")): _*)
    val b = sig.select(col("doc_id").as("doc_b") +:
      col("shingles").as("sh_b") +:
      mhCols.map(c => col(c).as(s"b_$c")): _*)
    val matches = mhCols
      .map(c => when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L))
      .reduce(_ + _)
    jaccardCols(cand.join(a, "doc_a").join(b, "doc_b"))
      .withColumn("matches", matches)
      .groupBy(col("matches"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("jaccard_bp")).as("__sj"),
        sum(abs(col("matches") * lit(625L) - col("jaccard_bp"))).as("__se"))
      .select(col("matches"), (col("matches") * lit(625L)).as("est_bp"),
        col("n_pairs"),
        expr("__sj div n_pairs").as("mean_jaccard_bp"),
        expr("__se div n_pairs").as("mean_abs_err_bp"))
      .orderBy(col("matches").asc)
  }

  /** LSH parameter PLANNER — which (rows-per-band, bands)
    * factorization of the 16-component signature fits THIS corpus?
    * For every observed candidate pair (the banded sample — disclosed
    * bias: pairs the current 4×4 scheme can see), the S-curve
    * collision probability p = 1 − (1 − s^r)^b is evaluated per
    * power-of-two factorization (r, b) ∈ {1×16 … 16×1} and rolled up
    * against the exact Jaccard at the house dup threshold `tauBp`:
    * expected recall over true pairs, expected collision mass over
    * false pairs, and the total expected candidate mass — the table
    * that picks banding BEFORE a 100 TB re-shingle, from data the
    * current scheme already computed.
    *
    * No libm: s^r and (1−s^r)^b use repeated-squaring column chains
    * (r and b are powers of two) — every step one correctly-rounded
    * IEEE multiply in a TEXTUALLY identical tree in both engines
    * (SURVEY §7.3 dyadic-constant family); per-pair p floors to bp
    * BEFORE any sum so order can't matter.
    *
    * Scale shape: one signature pass feeds bands + both exact-verify
    * sides; the scored pair frame (one skinny column) is persisted
    * and each of the 5 configs reads the cache; output is 5 rows. */
  def lshPlanner(docs: DataFrame, tauBp: Long = 8000L): DataFrame = {
    val sig = minhashSignature(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidatePairsFromBands(lshBands(sig))
    val scored0 = verifyJaccard(cand, sig.select(col("doc_id"), col("shingles")))
      .select(col("jaccard_bp"),
        (col("jaccard_bp").cast("double") / lit(10000.0)).as("x0"))
    // x_i = s^(2^i): the shared squaring ladder
    val base = (1 to 4).foldLeft(scored0) { (d, i) =>
      d.withColumn(s"x$i", col(s"x${i - 1}") * col(s"x${i - 1}"))
    }.persist()
    val configs = (0 to 4).map { j =>
      val k = 4 - j // r = 2^j rows/band, b = 2^k bands
      val y = (1 to k).foldLeft(
        base.withColumn("y0", lit(1.0) - col(s"x$j"))) { (d, i) =>
        d.withColumn(s"y$i", col(s"y${i - 1}") * col(s"y${i - 1}"))
      }
      y.select(lit(1L << j).as("rows_per_band"),
        lit(1L << k).as("n_bands"), col("jaccard_bp"),
        floor(lit(10000.0) * (lit(1.0) - col(s"y$k"))).cast("long").as("p_bp"))
    }.reduce(_ unionAll _)
    configs
      .groupBy(col("rows_per_band"), col("n_bands"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard_bp") >= tauBp, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("jaccard_bp") >= tauBp, col("p_bp")).otherwise(0L))
          .as("__ct"),
        sum(when(col("jaccard_bp") < tauBp, col("p_bp")).otherwise(0L))
          .as("__cf"))
      .select(col("rows_per_band"), col("n_bands"), col("n_pairs"),
        col("n_true"), (col("n_pairs") - col("n_true")).as("n_false"),
        when(col("n_true") === 0L, lit(null).cast("long"))
          .otherwise(expr("__ct div n_true")).as("recall_bp"),
        when(col("n_pairs") === col("n_true"), lit(null).cast("long"))
          .otherwise(expr("__cf div (n_pairs - n_true)")).as("fp_bp"),
        (col("__ct") + col("__cf")).as("exp_cand_bp_sum"))
      .orderBy(col("rows_per_band").asc)
  }

  /** Exact-Jaccard columns (basis points) from paired shingle arrays
    * `sh_a`/`sh_b`. */
  /** Shared exact-Jaccard columns over `sh_a`/`sh_b` shingle sets —
    * the ONE place the bp convention and zero-union rule live (the
    * streaming path reuses it; see NearDupStream). */
  private[graft] def jaccardCols(paired: DataFrame): DataFrame =
    paired
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard_bp",
        when(col("uni") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("inter") / col("uni")).cast("long")))

  /** Exact Jaccard (basis points) for given candidate pairs. `sh` is
    * the precomputed `(doc_id, shingles)` projection — pass a cached
    * one when the plan would otherwise recompute the shingle subtree
    * per join side. */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame =
    verifyJaccardSides(pairs, sh, sh)

  /** verifyJaccard with distinct shingle sources per pair side (for
    * cross-corpus pairing, where doc_a and doc_b come from different
    * frames). */
  def verifyJaccardSides(pairs: DataFrame, shA: DataFrame, shB: DataFrame): DataFrame =
    jaccardCols(pairs
      .join(shA.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(shB.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"), col("jaccard_bp"))

  /** Full MinHash+LSH near-dup pipeline: candidates → verified pairs at
    * `thresholdBp` Jaccard.
    *
    * Scale shape (same exact-before-near design as ngramDedupKept):
    * signatures, banding, and Jaccard verification all run at
    * DISTINCT-TEXT grain — d exact copies of a document share one
    * representative, so they cost one signature and one verification
    * instead of d signatures and d² verifications (replay-heavy crawl
    * corpora are the norm at 100 TB; a 10× replay made the naive
    * formulation 7× slower in ScaleProbe). The quadratic part that
    * remains is pair EMISSION, which is the answer itself:
    *  - intra-group pairs are identical texts → Jaccard 10000 bp,
    *    inter = uni = |shingles|, qualifying whenever the group
    *    shingles are non-empty (empty-shingle pairs are 0/0 → 0 bp,
    *    below any threshold — same as the pairwise formulation);
    *  - cross-group candidacy and Jaccard depend only on the text, so
    *    verified representative pairs expand to all member pairs via
    *    two cheap equi-joins on the text-hash key.
    * Output is row-for-row identical to the direct pairwise oracle.
    *
    * The representative-grain signature frame is persisted once
    * (disk-backed): the band self-join and the two verify joins would
    * otherwise re-run the tokenize + shingle + md5-min subtree. */
  /** Distinct-text-grain frames shared by the MinHash family:
    * `members` = (th, doc_id) for every doc, `sig` = one signature row
    * per distinct text under its min-id representative. Both persisted
    * (each feeds ≥2 joins downstream). */
  private def repSignatures(docs: DataFrame): (DataFrame, DataFrame) = {
    // null-safe group key (md5(NULL) is NULL; sentinel is not hex so it
    // cannot collide with a real hash)
    val withTh = docs.withColumn("th",
      coalesce(md5(col("text")), lit("<null-text>")))
    val members = withTh.select(col("th"), col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // text rides in the GROUPING KEY (th = md5(text) determines it),
    // not in an aggregate: any string-valued aggregate (first, min_by)
    // has an immutable buffer and forces a SortAggregate — a full sort
    // of the corpus by text hash. With only min(long) in the buffer
    // this is a plain codegen'd HashAggregate.
    val reps = withTh.groupBy(col("th"), col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val sig = minhashSignature(reps)
      .select(col("th") +: col("doc_id") +: col("shingles") +:
        (0 until NumHashes).map(k => col(f"mh$k%02d")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (members, sig)
  }

  /** Representative-grain verified near-dup pairs — the CC-scale
    * surface: a text replayed d times contributes ONE node and its
    * rep's edges, not C(d,2) member edges. On replay-heavy corpora
    * (the 100 TB norm) member-grain edges grow quadratically in the
    * replay factor while rep-grain edges do not (ScaleProbe: 5.3×
    * supra-linear growth at 2× amplification before the rep-grain
    * switch, ~linear after). Members re-attach by their text-hash
    * group (each group's rep is its min doc_id — see
    * Clustering.clustersCarrying). */
  private[graft] def repNearDupPairs(docs: DataFrame,
      thresholdBp: Long): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val (_, sig) = repSignatures(docs)
    val sh = sig.select(col("doc_id"), col("shingles"))
    verifyJaccard(lshCandidatePairsFromBands(lshBands(sig)), sh)
      .filter(col("jaccard_bp") >= thresholdBp)
      .select(col("doc_a"), col("doc_b"))
  }

  def minhashDedupPairs(docs: DataFrame, thresholdBp: Long = 8000L): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val (members, sig) = repSignatures(docs)
    val sh = sig.select(col("doc_id"), col("shingles"))
    val repKey = sig.select(col("th"), col("doc_id"),
      size(col("shingles")).cast("long").as("n_sh"))

    // cross-group: verify once per representative pair, then expand to
    // member pairs (disjoint groups → each member pair appears once)
    val repPairs = verifyJaccard(lshCandidatePairsFromBands(lshBands(sig)), sh)
      .filter(col("jaccard_bp") >= thresholdBp)
    val cross = repPairs
      .join(repKey.select(col("doc_id").as("doc_a"), col("th").as("th_a")), "doc_a")
      .join(repKey.select(col("doc_id").as("doc_b"), col("th").as("th_b")), "doc_b")
      .join(members.select(col("th").as("th_a"), col("doc_id").as("m_a")), "th_a")
      .join(members.select(col("th").as("th_b"), col("doc_id").as("m_b")), "th_b")
      .select(
        least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"),
        col("inter"), col("uni"), col("jaccard_bp"))

    // intra-group: identical texts — no verification needed
    val intra = members.as("x")
      .join(members.as("y"),
        col("x.th") === col("y.th") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.th").as("th"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .join(repKey.filter(col("n_sh") > 0).select(col("th"), col("n_sh")), "th")
      .select(col("doc_a"), col("doc_b"),
        col("n_sh").as("inter"), col("n_sh").as("uni"),
        lit(10000L).as("jaccard_bp"))

    cross.unionByName(intra)
  }

  /** Dedup verdict fusion — the three duplicate detectors the engine
    * ships (exact text hash, MinHash Jaccard, SimHash Hamming)
    * compared ON THE SAME PAIRS: per (exact, minhash, simhash)
    * verdict cell, the pair count and the Jaccard range. The method-
    * selection table: the (0,1,0) cell is what MinHash catches that
    * SimHash misses at your thresholds, (1,1,1) is the easy mass, and
    * a populated (1,0,·) cell means the MinHash threshold is dropping
    * literal copies — a config bug this report exposes immediately.
    *
    * Universe: the verified LSH candidate pairs with Jaccard ≥ 1 bp
    * (the band blocking is the shared recall envelope — pairs NO
    * detector could cheaply see are out of scope by construction,
    * and disclosed).
    *
    * Scale shape: rides q22's pair machinery (band-bucketed, never
    * all-pairs); the text-hash and SimHash columns join the pair set
    * at pair grain; the report is ≤8 rows. */
  def verdictFusion(docs: DataFrame, mhThresholdBp: Long = 8000L,
      maxHamming: Int = 3): DataFrame = {
    val pairs = minhashDedupPairs(docs, 1L)
      .select(col("doc_a"), col("doc_b"), col("jaccard_bp"))
    val th = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("th"))
    val sg = simhash(docs)
    pairs
      .join(th.select(col("doc_id").as("doc_a"), col("th").as("th_a")), "doc_a")
      .join(th.select(col("doc_id").as("doc_b"), col("th").as("th_b")), "doc_b")
      .join(sg.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a")), "doc_a")
      .join(sg.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")), "doc_b")
      .select(
        (col("th_a") === col("th_b")).cast("int").as("exact_dup"),
        (col("jaccard_bp") >= mhThresholdBp).cast("int").as("mh_dup"),
        (expr("bit_count(sh_a ^ sh_b)") <= maxHamming).cast("int").as("sh_dup"),
        col("jaccard_bp"))
      .groupBy(col("exact_dup"), col("mh_dup"), col("sh_dup"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("jaccard_bp")).as("min_jaccard_bp"),
        max(col("jaccard_bp")).as("max_jaccard_bp"))
  }

  /** Containment pairs — Broder's ASYMMETRIC resemblance: c(A→B) =
    * |A∩B| / |A| over shingle sets. Jaccard misses the doc-inside-doc
    * case (a paragraph fully copied into a 100× larger page scores
    * |A|/|B| ≈ 0.01 Jaccard but containment 1.0); this is the signal
    * for wire-copy / boilerplate-superset analysis. Reported for
    * candidate pairs from the SAME MinHash band blocking as q22, with
    * the standard caveat (bands approximate Jaccard, so
    * high-containment-low-Jaccard pairs surface only when they still
    * co-band; a dedicated containment index would bottom-k-sample the
    * smaller set — out of scope, disclosed).
    *
    * Same distinct-text-grain shape as [[minhashDedupPairs]] (one
    * signature/verification per distinct text, member expansion by
    * equi-join). Containment is DIRECTIONAL, so the member-pair
    * reorder (doc_a < doc_b) swaps sizes and containments when the
    * member ids invert the representative order.
    *
    * Output: doc_a < doc_b, inter, size_a, size_b, cont_ab_bp,
    * cont_ba_bp; kept when either direction ≥ `thresholdBp`. */
  def containmentPairs(docs: DataFrame, thresholdBp: Long = 8000L): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val (members, sig) = repSignatures(docs)
    val sh = sig.select(col("doc_id"), col("shingles"))
    val repKey = sig.select(col("th"), col("doc_id"),
      size(col("shingles")).cast("long").as("n_sh"))

    val contBp = (inter: Column, sz: Column) =>
      when(sz === 0L, lit(0L))
        .otherwise(floor(lit(10000.0) * inter / sz).cast("long"))
    val repPairs = lshCandidatePairsFromBands(lshBands(sig))
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("size_a", size(col("sh_a")).cast("long"))
      .withColumn("size_b", size(col("sh_b")).cast("long"))
      .withColumn("cont_ab_bp", contBp(col("inter"), col("size_a")))
      .withColumn("cont_ba_bp", contBp(col("inter"), col("size_b")))
      .filter(greatest(col("cont_ab_bp"), col("cont_ba_bp")) >= thresholdBp)

    val cross = repPairs
      .join(repKey.select(col("doc_id").as("doc_a"), col("th").as("th_a")), "doc_a")
      .join(repKey.select(col("doc_id").as("doc_b"), col("th").as("th_b")), "doc_b")
      .join(members.select(col("th").as("th_a"), col("doc_id").as("m_a")), "th_a")
      .join(members.select(col("th").as("th_b"), col("doc_id").as("m_b")), "th_b")
      // directional columns swap with the id reorder
      .select(
        least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"),
        col("inter"),
        when(col("m_a") < col("m_b"), col("size_a")).otherwise(col("size_b")).as("size_a"),
        when(col("m_a") < col("m_b"), col("size_b")).otherwise(col("size_a")).as("size_b"),
        when(col("m_a") < col("m_b"), col("cont_ab_bp")).otherwise(col("cont_ba_bp")).as("cont_ab_bp"),
        when(col("m_a") < col("m_b"), col("cont_ba_bp")).otherwise(col("cont_ab_bp")).as("cont_ba_bp"))

    // intra-group: identical texts — containment 10000 both ways
    val intra = members.as("x")
      .join(members.as("y"),
        col("x.th") === col("y.th") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.th").as("th"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .join(repKey.filter(col("n_sh") > 0).select(col("th"), col("n_sh")), "th")
      .select(col("doc_a"), col("doc_b"),
        col("n_sh").as("inter"), col("n_sh").as("size_a"),
        col("n_sh").as("size_b"),
        lit(10000L).as("cont_ab_bp"), lit(10000L).as("cont_ba_bp"))

    cross.unionByName(intra)
  }

  /** n-gram-Jaccard dedup with fingerprint blocking: pairs sharing the
    * min-shingle fingerprint, verified; returns the KEPT document set
    * (a doc is kept iff no smaller-id doc within its block reaches the
    * Jaccard threshold — the pipeline's dedup filter output).
    *
    * Scale shape: EXACT-duplicate texts are collapsed to one
    * representative per text hash BEFORE pairing (d copies of a doc
    * would otherwise mint d² identical candidate pairs — on a crawl
    * corpus, where exact dups dominate, that quadratic term is the
    * whole runtime; measured 70× at a 10× replay). The self-join then
    * runs at distinct-text grain, and group membership decides the
    * rest: with threshold ≤ 10000 bp every non-representative member
    * of a shingled group loses to its representative (identical text
    * = 10000 bp), empty-shingle docs (< ShingleSize tokens) never
    * reach any threshold (0/0 → 0 bp), and a lost representative
    * takes its whole group with it. Output is row-for-row identical
    * to the direct pairwise formulation (the q23 oracle). */
  def ngramDedupKept(docs: DataFrame, thresholdBp: Long = 5000L): DataFrame = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    // null-safe group key: md5(NULL) is NULL and would silently drop
    // null-text docs at the equi-join; the sentinel (not a hex string,
    // so collision-free) groups them instead, where empty shingles
    // make every member a keeper — matching the pairwise formulation.
    val withTh = docs.withColumn("th",
      coalesce(md5(col("text")), lit("<null-text>")))
    // text in the grouping key — same SortAggregate avoidance as
    // minhashDedupPairs above
    val reps = withTh.groupBy(col("th"), col("text"))
      .agg(min(col("doc_id")).as("rep_id"))
    val base = withShingles(reps).select(
        col("th"), col("rep_id"), col("shingles"),
        (size(col("shingles")) > 0).as("has_sh"),
        expr("substring(array_min(transform(shingles, s -> md5(s))), 1, 16)")
          .as("fp_min"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // representative-grain near-dup: a rep loses iff a smaller-id rep
    // in its block reaches the threshold
    val lostReps = jaccardCols(base.as("a")
        .join(base.as("b"),
          col("a.fp_min") === col("b.fp_min") && col("a.rep_id") < col("b.rep_id"))
        .select(col("a.rep_id").as("doc_a"), col("b.rep_id").as("doc_b"),
          col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b")))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select(col("doc_b").as("rep_id")).distinct()
    withTh
      .join(base.select(col("th"), col("rep_id"), col("has_sh")), "th")
      .join(lostReps, Seq("rep_id"), "left_anti") // lost rep → group lost
      .filter(col("doc_id") === col("rep_id") || !col("has_sh"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Incremental corpus dedup: which documents of an incoming batch
    * are NOVEL against an existing corpus — the dedup an ingestion
    * pipeline actually runs per crawl drop (the all-pairs q22 sweep is
    * the bootstrap; this is the steady state). Id spaces must be
    * disjoint across the two frames.
    *
    * Two stages, cheapest first:
    *  1. exact replays: one left-anti semi-join of the batch's text
    *     hashes against the corpus hash set (null-text rows never
    *     match and pass through, as in the pairwise formulation);
    *  2. near-dups: LSH band join of BATCH bands × CORPUS bands —
    *     the pair space is bounded by bucket co-membership exactly as
    *     in the self-join case, but the batch side is small, so at
    *     production scale the batch's band table broadcasts and the
    *     corpus never shuffles. Candidates get the exact-Jaccard
    *     verify; a batch doc with a ≥-threshold corpus partner drops.
    *
    * At 100 TB the corpus signature/band frames are a MATERIALIZED
    * index (computed once at bootstrap, appended per accepted batch);
    * this operator recomputes them because the test corpus is a
    * parquet table, not a maintained index — the join shape is what
    * scales, and that is what this encodes. */
  def incrementalDedupKept(batch: DataFrame, corpus: DataFrame,
      thresholdBp: Long = 8000L): DataFrame =
    incrementalDedupKeptCached(batch, corpus, thresholdBp)._1

  /** [[incrementalDedupKept]] plus the two persisted signature frames
    * it pins, so a REPEATED caller (the per-micro-batch streaming
    * twin) can unpersist after materializing — one-shot callers
    * (Verify/Bench) clear the whole cache per query instead. */
  private[graft] def incrementalDedupKeptCached(batch: DataFrame,
      corpus: DataFrame, thresholdBp: Long): (DataFrame, Seq[DataFrame]) = {
    require(thresholdBp >= 1L && thresholdBp <= 10000L,
      "thresholdBp must be in [1, 10000]")
    val corpusHashes = corpus.select(md5(col("text")).as("__h"))
      .filter(col("__h").isNotNull).distinct()
    val fresh = batch.withColumn("__h", md5(col("text")))
      .join(corpusHashes, Seq("__h"), "left_anti").drop("__h")

    val sigB = minhashSignature(fresh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigC = minhashSignature(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshBands(sigB).as("a")
      .join(lshBands(sigC).as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val lost = verifyJaccardSides(cand,
        sigB.select(col("doc_id"), col("shingles")),
        sigC.select(col("doc_id"), col("shingles")))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select(col("doc_a").as("doc_id")).distinct()
    val kept = fresh.join(lost, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
    (kept, Seq(sigB, sigC))
  }

  /** Incremental dedup-impact savings — q102's accounting table moved
    * to the ingestion boundary: per source of an ARRIVING batch, how
    * many docs/tokens arrived and how many were DROPPED as duplicates
    * of the existing corpus (exact text replay, or ≥-threshold
    * near-dup — the [[incrementalDedupKept]] verdicts exactly, so the
    * gate and its accounting can never disagree). `savings_bp` =
    * ⌊10000·tokens_dropped/tokens_total⌋, 0 for an all-null-text
    * source. Null-text docs count 0 tokens and are never dropped (no
    * hash to replay, no shingles to band).
    *
    * Scale shape: the verdict set rides incrementalDedupKept (the
    * batch side broadcasts at production scale; the corpus index is
    * materialized); the report adds one batch-grain flag join and a
    * bounded-domain `source` aggregate. The streaming twin
    * (NearDupStream.savingsBatch) applies THIS function per
    * micro-batch, so stream and batch agree by construction. */
  def incrementalSavingsReport(batch: DataFrame, corpus: DataFrame,
      thresholdBp: Long = 8000L): DataFrame =
    incrementalSavingsReportCached(batch, corpus, thresholdBp)._1

  /** [[incrementalSavingsReport]] plus the persisted frames to release
    * after materialization (see [[incrementalDedupKeptCached]]). */
  private[graft] def incrementalSavingsReportCached(batch: DataFrame,
      corpus: DataFrame, thresholdBp: Long): (DataFrame, Seq[DataFrame]) = {
    val (kept0, cached) = incrementalDedupKeptCached(batch, corpus, thresholdBp)
    val kept = kept0.select(col("doc_id"), lit(1L).as("__kept"))
    val toks = when(col("text").isNotNull,
      size(split(col("text"), " ")).cast("long")).otherwise(0L)
    val report = batch.select(col("doc_id"), col("source"), toks.as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("dropped", col("__kept").isNull.cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("dropped")).as("n_dropped"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(col("n_tokens") * col("dropped")).as("tokens_dropped"))
      .withColumn("savings_bp",
        when(col("tokens_total") === 0L, lit(0L))
          .otherwise(floor(lit(10000.0) * col("tokens_dropped") / col("tokens_total"))
            .cast("long")))
    (report, cached)
  }

  /** 32-bit SimHash over distinct tokens: per bit j, tokens vote ±1 by
    * the j-th bit of their md5's leading 8 nibbles; sign(vote) packs
    * the signature. Computed per-row by the graft_simhash expression —
    * a narrow map with NO explode and NO shuffle (the SQL/oracle
    * formulation explodes tokens and shuffles on doc_id for 32
    * conditional sums; see graft.expressions.SimHash). */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull) // null-text docs drop, as the
      // explode-based formulation (and the unnest-based oracle) did
      .withColumn("tokens", expr(TextAnalysis.TokensExpr))
      .select(col("doc_id"),
        graft.expressions.SimHash.sig(array_distinct(col("tokens")), SimhashBits)
          .as("simhash"))

  /** SimHash near-dup pairs within `maxHamming` (self-join blocked by
    * the signature's upper half so the pair space stays bounded). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs).withColumn("blk",
      expr(s"CAST(FLOOR(simhash / ${1L << (SimhashBits / 2)}) AS BIGINT)"))
    sig.as("a")
      .join(sig.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(expr("a.simhash ^ b.simhash")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
  }

  val SpanGram = 8

  /** Substring-grain duplication (the doc-level families above can't
    * see a copied PARAGRAPH inside an otherwise-unique page): per
    * document, how many token positions sit inside a token `n`-gram
    * that occurs ≥2 times corpus-wide — the practical k-gram variant
    * of the suffix-array duplicate-span pass (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better";
    * their production follow-ups use exactly this gram-frequency
    * formulation because a distributed global suffix array is not).
    *
    * Scale shape: grams are a pure map stage over the corpus (no
    * doc-grain state); occurrence counting is ONE shuffle on the
    * 64-bit gram hash where map-side partial aggregation collapses
    * each partition's repeats; the duplicated-gram set (a small
    * fraction — most grams are unique at any n ≥ 8) joins back
    * against the gram stream, and only MATCHED grams explode ×n into
    * the per-doc distinct-position count. The corpus is never
    * self-joined and never shuffled at full gram multiplicity twice.
    * Like q55, grams are 64-bit-hashed internally (the oracle joins
    * raw strings; a collision needs two distinct grams on the same
    * 64-bit value — P < 1e-9 at 1e5 grams — and at worst marks one
    * span duplicated, it cannot corrupt the kept corpus). The hashes
    * come from the fused `TokenGramHash` expression: gram STRINGS are
    * never materialized (the built-in transform+array_join+xxhash64
    * chain allocates ~n× the token stream — at 100 TB the gram stage
    * is the corpus pass, so that churn is the bill). */
  /** (doc_id, 1-based token position) rows covered by ≥`minCount`
    * occurrences of a gram ANYWHERE (two docs, or twice in one doc —
    * the span is memorizable either way); positions repeat when
    * overlapping dup grams cover them. No broadcast hint on the dup
    * set: usually small but corpus-dependent; AQE decides. */
  private def dupPositions(base: DataFrame, n: Int, minCount: Long): DataFrame = {
    val grams = base
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"),
        posexplode(graft.expressions.TokenGramHash.grams(col("__t"), n)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("gh"))
    val dup = grams.groupBy(col("gh")).count()
      .filter(col("count") >= minCount).select(col("gh"))
    grams.join(dup, "gh")
      .select(col("doc_id"), explode(expr(s"sequence(p, p + ${n - 1})")).as("pos"))
  }

  private def withTokensBase(docs: DataFrame): DataFrame = docs
    .filter(col("text").isNotNull)
    .withColumn("__t", expr(TextAnalysis.TokensExpr))

  /** Per-document novelty: the share of a doc's DISTINCT token
    * `n`-grams that appear NOWHERE else in the corpus — the inverse
    * reading of the q65 duplication family ("how much of this doc is
    * new text" vs "how much is copied"). The memorization-risk /
    * dataset-value triage signal: a crawl doc at 300 bp novelty is
    * template chrome; an upweighting candidate sits near 10000.
    *
    * A gram is NOVEL iff exactly one document carries it (within-doc
    * repeats are collapsed by the per-doc `array_distinct` BEFORE the
    * explode, so a doc repeating its own phrase doesn't lose novelty
    * — that is q49's repetition axis, not this one).
    *
    * Scale shape: grams are fused 64-bit `TokenGramHash`es (no gram
    * strings); the carrier count is a WINDOW over the gram key on the
    * already-distinct (doc, gram) stream — one gram-grain shuffle, no
    * gram-table self-join — followed by the doc-grain re-aggregate.
    * Docs too short for any gram surface with zero counts and a NULL
    * novelty (visible-absence convention, q117): undefined is not 0.
    */
  def docNovelty(docs: DataFrame, n: Int = SpanGram): DataFrame = {
    val base = withTokensBase(docs)
    val grams = base
      .filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        graft.expressions.TokenGramHash.grams(col("__t"), n))).as("gh"))
    val byGram = Window.partitionBy(col("gh"))
    val scored = grams
      .withColumn("carriers", count(lit(1)).over(byGram))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("total_grams"),
        sum(when(col("carriers") === 1L, 1L).otherwise(0L)).as("novel_grams"))
      .withColumn("novelty_bp",
        floor(lit(10000.0) * col("novel_grams") / col("total_grams"))
          .cast("long"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("total_grams", "novel_grams"))
  }

  def substringDupSpans(docs: DataFrame, n: Int = SpanGram,
      minCount: Long = 2L): DataFrame = {
    val base = withTokensBase(docs)
    val hits = dupPositions(base, n, minCount)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("pos")).as("dup_tokens"))
    base.select(col("doc_id"), size(col("__t")).cast("long").as("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_tokens"))
      .withColumn("dup_bp",
        floor(lit(10000.0) * col("dup_tokens") / col("n_tokens")).cast("long"))
  }

  /** The actionable half of substring dedup (Lee et al. remove the
    * spans, not the documents): every token position covered by a
    * duplicated `n`-gram is DROPPED and the remaining tokens
    * rejoined. Same gram pipeline as `substringDupSpans`; the
    * per-doc drop set is doc-length-bounded, collected at doc grain
    * and applied by one indexed-lambda filter (a map stage). */
  def substringScrub(docs: DataFrame, n: Int = SpanGram,
      minCount: Long = 2L): DataFrame = {
    val base = withTokensBase(docs)
    val drops = dupPositions(base, n, minCount)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("drops"))
    base.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        when(col("drops").isNull, size(col("__t")))
          .otherwise(size(col("__t")) - size(col("drops")))
          .cast("long").as("kept_tokens"),
        when(col("drops").isNull, col("text")).otherwise(expr(
          "array_join(filter(__t, (x, i) -> " +
            "NOT array_contains(drops, CAST(i + 1 AS BIGINT))), ' ')"))
          .as("clean_text"))
  }

  /** Cross-source overlap matrix at `n`-gram grain: for every source
    * pair, how many DISTINCT token n-grams they share, each source's
    * own distinct-gram count, and both containment ratios in basis
    * points — the provenance report run before picking dedup
    * priorities or mixture weights (a crawl source 80%-contained in a
    * curated one is redundant; 2% is complementary).
    *
    * Exact-duplicate overlap is this report at n → ∞; gram grain also
    * sees partial/reformatted copies (the q65 rationale). Grams are
    * `TokenGramHash` 64-bit hashes — never materialized as strings —
    * under the house hash-grain convention (collisions < 1e-9 at 1e5
    * grams, and at worst nudge one count).
    *
    * Scale shape: corpus → distinct (gram, source) in ONE
    * partial-aggregated shuffle; gram-grain source sets are bounded
    * by the SOURCE DOMAIN (dozens), so the per-gram pair comb is a
    * map stage and the final aggregate's key space is source² —
    * metadata-sized. Per-source totals ride the same grain
    * (grouping-sets-free second agg over the persisted distinct set
    * would re-read; instead the gram-grain frame is cached-free
    * recomputed only at source grain — two scans of the SHUFFLED
    * distinct set, not of the corpus). */
  def sourceOverlap(docs: DataFrame, n: Int = SpanGram): DataFrame = {
    // three consumers (pair comb + both total join sides) and no
    // ReusedExchange across them — persist the gram-grain distinct
    // set so the corpus gram pass runs once (disk-backed; the
    // shuffled set is far smaller than a corpus re-scan)
    val gramSource = withTokensBase(docs)
      .filter(size(col("__t")) >= n)
      .select(col("source"),
        explode(graft.expressions.TokenGramHash.grams(col("__t"), n)).as("gh"))
      .groupBy(col("gh"))
      .agg(array_sort(collect_set(col("source"))).as("sources"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perGram = gramSource.select(col("sources"),
      explode(expr(
        """flatten(transform(sources, (a, i) ->
          |  transform(slice(sources, i + 2, size(sources)), b ->
          |    struct(a AS source_a, b AS source_b))))""".stripMargin)).as("p"))
    val shared = perGram
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
    val totals = gramSource
      .select(explode(col("sources")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
    shared
      .join(broadcast(totals.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "grams_a")), Seq("source_a"))
      .join(broadcast(totals.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "grams_b")), Seq("source_b"))
      .withColumn("overlap_ab_bp", expr("shared_grams * 10000L div grams_a"))
      .withColumn("overlap_ba_bp", expr("shared_grams * 10000L div grams_b"))
      .select("source_a", "source_b", "shared_grams", "grams_a", "grams_b",
        "overlap_ab_bp", "overlap_ba_bp")
  }

  /** Dedup threshold sensitivity curve: for each candidate Jaccard
    * threshold, how many pairs fire and how many documents the q23
    * drop rule (a document is dropped when it is the LARGER id of
    * any qualifying pair) would remove — the tuning table you read
    * BEFORE committing a threshold to a 100 TB dedup run, where
    * 8000 vs 7000 bp can be billions of documents.
    *
    * Universe: the verified LSH band-candidate pairs at the SWEEP
    * FLOOR (min of `thresholdsBp`) — the verdictFusion recall-
    * envelope disclosure applies: pairs below the floor's band
    * recall are out of scope by construction, so sweep floors well
    * below the band design point (8000) undercount; the curve's
    * SHAPE near the operating point is what the table is for.
    *
    * Scale shape: one [[minhashDedupPairs]] run at the floor, a
    * bounded ×|thresholds| explode of the (already LSH-bounded) pair
    * set, one threshold-grain aggregate, and a 1-row total broadcast.
    * The exact `count_distinct(doc_b)` is pair-set-grain, not
    * corpus-grain.
    *
    * Columns: threshold_bp, n_pairs, n_docs_dropped, drop_bp. */
  def dedupThresholdCurve(docs: DataFrame,
      thresholdsBp: Seq[Long]): DataFrame = {
    require(thresholdsBp.nonEmpty, "declare at least one threshold")
    require(thresholdsBp.distinct.size == thresholdsBp.size,
      s"thresholds must be distinct: $thresholdsBp")
    require(thresholdsBp.forall(t => t >= 1L && t <= 10000L),
      "thresholds must be in [1, 10000]")
    val s = docs.sparkSession
    import s.implicits._
    val ts = thresholdsBp.sorted
    val pairs = minhashDedupPairs(docs, ts.head)
      .select(col("doc_b"), col("jaccard_bp"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val sweep = pairs
      .withColumn("threshold_bp", explode(array(ts.map(lit): _*)))
      .filter(col("jaccard_bp") >= col("threshold_bp"))
      .groupBy(col("threshold_bp"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("doc_b")).as("n_docs_dropped"))
    ts.toDF("threshold_bp")
      .join(sweep, Seq("threshold_bp"), "left")
      .crossJoin(broadcast(total))
      .select(col("threshold_bp"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"),
        when(col("n_docs") === 0L, 0L)
          .otherwise(floor(lit(10000.0) * coalesce(col("n_docs_dropped"),
            lit(0L)) / col("n_docs")).cast("long")).as("drop_bp"))
      .orderBy(col("threshold_bp").asc)
  }

  /** Tolerance-window EVENT dedup — the double-fire scrubber an
    * ingestion edge runs before events reach analytics: within each
    * (user, event type), an event arriving ≤ `toleranceSec` after its
    * predecessor is a duplicate burst member (double-click, client
    * retry, at-least-once replay); the first of each burst is the
    * keeper. The gap is measured to the PREVIOUS event, so a chain of
    * rapid fires collapses to its first event — retry-storm
    * semantics, the same chaining rule as sessionization gaps.
    * Report per event type: events, duplicates, dup share (floor-bp),
    * events kept.
    *
    * Scale shape: ONE fact shuffle on (user, type) for the lag
    * window, then the type-grain rollup (map-side combined, ≤ a few
    * rows). The dup flag is order-independent under timestamp ties
    * (a zero gap is a dup wherever the tie sorts), so the event-id
    * tie-break is determinism hygiene, not load-bearing. */
  def eventBurstDedup(events: DataFrame, toleranceSec: Long = 10L): DataFrame = {
    require(toleranceSec >= 0L, "toleranceSec >= 0")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("is_dup",
        (col("prev_us").isNotNull &&
          col("ts_us") - col("prev_us") <= toleranceSec * 1000000L)
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("is_dup")).as("n_dups"))
      .select(col("event_type"), col("n_events"), col("n_dups"),
        floor(lit(10000.0) * col("n_dups") / col("n_events")).cast("long")
          .as("dup_bp"),
        (col("n_events") - col("n_dups")).as("n_kept"))
      .orderBy(col("event_type").asc)
  }

  /** Blocked edit-distance fuzzy matching over a name column — the
    * catalog-hygiene / record-linkage read (find "red widgit" next to
    * "red widget") that the set-similarity family (MinHash/n-gram
    * Jaccard) misses for SHORT strings, where a single typo is a
    * large Jaccard move but a distance-1 edit. Uses the codegen'd
    * built-in `levenshtein` (unit-cost insert/delete/substitute —
    * identical semantics in DuckDB's `levenshtein`).
    *
    * Scale shape: the match runs at name-DOMAIN grain — rows collapse
    * to (name, rep_id, n_rows) first, so fact volume only changes the
    * counts, never the pair space (the distinct-text-grain rule the
    * dedup family uses throughout). Candidate generation is standard
    * shared-token blocking: names pair only within a token block,
    * never all-pairs; each block is capped at `blockCap`
    * lexicographically-smallest names (DETERMINISTIC, the
    * coVisitation cap rule) so a stop-token can't quadratically
    * explode — pairs ≤ Σ_tok C(min(block, cap), 2). The head is
    * TakeOrdered on the total key (dist, name_a, name_b).
    *
    * Columns: name_a, name_b, rep_a, rep_b (min `idCol` per name —
    * the linkage handles a merge tool needs), dist, rows_a, rows_b,
    * sim_bp (10⁴·(maxlen−dist)/maxlen floored). */
  /** The name-domain frame [[fuzzyNameMatch]] and [[entityRollup]]
    * share: (name, rep_id = min idCol, n_rows). Lazy — callers own
    * any persist. */
  private[graft] def nameDomain(df: DataFrame, nameCol: String,
      idCol: String): DataFrame =
    df.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_rows"))

  /** Shared-token-blocked candidate pairs under `maxDist` edits over
    * a `names` frame from [[nameDomain]] — ALL surviving pairs
    * (name_a < name_b, dist, and their rep ids so callers never
    * re-join the name domain); the top-k head is [[fuzzyNameMatch]]'s
    * concern, the full set feeds [[entityRollup]]'s clustering.
    *
    * The candidate join and its dedup run at REP grain: rep_id (the
    * min source id per name) is a unique 8 B key for a name, so the
    * blocking join + distinct move 16 B key pairs instead of two
    * full name strings, and the names come back through one
    * broadcast join against the (name-domain-sized) frame before a
    * single thresholded levenshtein per SURVIVING candidate — the
    * banded O(len·maxDist) form, not the O(len²) full DP. Pair set
    * and distances are identical to the by-name construction: a
    * (tok, name) row's blockCap survival is order-independent, and
    * rep< vs name< only changes which side of the symmetric pair is
    * generated, which the least/greatest name projection
    * re-canonicalizes. */
  private[graft] def fuzzyNamePairs(names: DataFrame, maxDist: Int,
      blockCap: Int): DataFrame = {
    val toks = names
      .select(col("name"), col("rep_id"),
        explode(array_distinct(split(col("name"), " "))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("tok")).orderBy(col("name"))))
      .filter(col("rk") <= blockCap)
      .select(col("rep_id"), col("tok"))
    val cand = toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("rep_lo"), col("b.rep_id").as("rep_hi"))
      .distinct()
    val nm = names.select(col("rep_id"), col("name"))
    cand
      .join(broadcast(nm.select(col("rep_id").as("rep_lo"),
        col("name").as("__nl"))), Seq("rep_lo"))
      .join(broadcast(nm.select(col("rep_id").as("rep_hi"),
        col("name").as("__nh"))), Seq("rep_hi"))
      .select(
        least(col("__nl"), col("__nh")).as("name_a"),
        greatest(col("__nl"), col("__nh")).as("name_b"),
        when(col("__nl") < col("__nh"), col("rep_lo"))
          .otherwise(col("rep_hi")).as("rep_a"),
        when(col("__nl") < col("__nh"), col("rep_hi"))
          .otherwise(col("rep_lo")).as("rep_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist").between(0L, maxDist.toLong))
  }

  def fuzzyNameMatch(df: DataFrame, nameCol: String, idCol: String,
      maxDist: Int = 3, blockCap: Int = 1000, k: Int = 50): DataFrame = {
    val names = nameDomain(df, nameCol, idCol).persist()
    val pairs = fuzzyNamePairs(names, maxDist, blockCap)
    pairs
      .join(broadcast(names.select(col("rep_id").as("rep_a"),
        col("n_rows").as("rows_a"))), Seq("rep_a"))
      .join(broadcast(names.select(col("rep_id").as("rep_b"),
        col("n_rows").as("rows_b"))), Seq("rep_b"))
      .withColumn("__ml",
        greatest(length(col("name_a")), length(col("name_b"))).cast("long"))
      .select(col("name_a"), col("name_b"),
        col("rep_a"), col("rep_b"), col("dist"),
        col("rows_a"), col("rows_b"),
        floor(lit(10000.0) * (col("__ml") - col("dist")) / col("__ml"))
          .cast("long").as("sim_bp"))
      .orderBy(col("dist").asc, col("name_a").asc, col("name_b").asc)
      .limit(k)
  }

  /** End-to-end entity resolution — [[fuzzyNameMatch]]'s pairs
    * CLOSED into entities (the record-linkage pipeline a catalog
    * team actually ships): connected components over the fuzzy-pair
    * graph at name grain (transitivity is the point — "red widgit"
    * ~ "red widget" ~ "red  widgett" is ONE product), every
    * singleton name its own entity, then the business rollup that
    * makes the clusters actionable: how many names/parts/fact rows
    * and how much revenue each merged entity really owns. The top
    * entity table is what a merge tool reviews.
    *
    * Deterministic: entity id = min rep_id in the component (the
    * q42 star-forest convention via Clustering.connectedComponents);
    * head ranked (revenue desc, entity id asc).
    *
    * Scale shape: the pair space is the q316 blocked candidate set
    * (never all-pairs); CC runs at NAME-domain grain; the revenue
    * rollup is one fact aggregation at partkey grain joined through
    * the (dimension-sized, broadcast) part→entity map.
    *
    * Columns: entity_id, n_names, n_parts, n_lines, revenue_cents.
    */
  def entityRollup(part: DataFrame, lineitem: DataFrame,
      maxDist: Int = 3, blockCap: Int = 1000, k: Int = 20): DataFrame = {
    val names = nameDomain(part, "p_name", "p_partkey").persist()
    val pairs = fuzzyNamePairs(names, maxDist, blockCap)
      .select(col("rep_a"), col("rep_b"))
    val comp = Clustering.connectedComponents(pairs, "rep_a", "rep_b")
    // singletons keep their own rep as entity id. NOT persisted: an
    // r11 persist experiment measured no io change (rows/shuffle flat
    // — the two consumers' label-join subtrees already share via
    // exchange reuse) and +0.2 s of cache-build overhead; reverted,
    // the q352 wash-→-revert rule.
    val entityOf = names
      .join(comp.select(col("node").as("rep_id"), col("component")),
        Seq("rep_id"), "left")
      .select(col("name"), col("rep_id"), col("n_rows"),
        coalesce(col("component"), col("rep_id")).as("entity_id"))
    val partMap = part.filter(col("p_name").isNotNull)
      .select(col("p_partkey"), col("p_name").as("name"))
      .join(entityOf.select(col("name"), col("entity_id")), Seq("name"))
      .select(col("p_partkey"), col("entity_id"))
    val fact = lineitem
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * lit(100.0)).cast("long"))
          .as("cents"))
      .join(broadcast(partMap), Seq("p_partkey"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_parts"), sum(col("n_lines")).as("n_lines"),
        sum(col("cents")).as("revenue_cents"))
    entityOf.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_names"))
      .join(fact, Seq("entity_id"), "left")
      .select(col("entity_id"), col("n_names"),
        coalesce(col("n_parts"), lit(0L)).as("n_parts"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("entity_id").asc)
      .limit(k)
  }
}
