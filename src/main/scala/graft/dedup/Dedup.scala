package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFns._

/** Document deduplication operators for training-data pipelines.
  *
  * Scale notes: every operator avoids the O(n²) all-pairs comparison —
  * exact dedup is a hash groupBy; near-dup detection generates
  * candidates via MinHash band bucketing (shuffle keyed on band
  * signature, cluster sizes bounded by collision rate) and only then
  * verifies candidates exactly. At 100 TB the only all-to-all data
  * movement is the band-key shuffle of 64-long signatures, not
  * documents.
  */
object Dedup {

  private def norm(c: String): String =
    s"regexp_replace(lower($c), '[^a-z0-9 ]', '')"

  private def reg(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession); df
  }

  /** Size-guarded broadcast hint for the verify side of a candidate
    * pair join (the scale seam every exact-verify dedup path shares):
    * estimates the payload of a (doc_id, hashes) frame from its own
    * stats (8 bytes per 64-bit hash + per-row overhead — one scalar
    * agg over an already-persisted, candidate-bounded frame) and
    * returns the hint to apply to each verify side. Under the budget
    * → `broadcast`; past it the hint is identity and the verify runs
    * as shuffled keyed joins — identical rows, identical arithmetic,
    * an exchange instead of a driver-sized broadcast. */
  private def verifyHint(hsC: DataFrame, budgetBytes: Long): DataFrame => DataFrame = {
    val st = hsC.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("hashes"))), lit(0L)).as("nh")).head()
    val estBytes = st.getAs[Long]("nh") * 8L + st.getAs[Long]("n") * 32L
    if (estBytes <= budgetBytes) (df: DataFrame) => broadcast(df)
    else (df: DataFrame) => df
  }

  /** Exact dedup on normalized text: canonical doc (min id) + group
    * size per distinct content; `is_canonical` marks survivors. */
  def exact(documents: DataFrame): DataFrame =
    reg(documents)
      .withColumn("key", expr(s"${polyHash(norm("text"))}"))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("group_size"))
      .select(col("canonical_id"), col("key"), col("group_size"))

  /** Distinct shingle-hash sets per doc (cached intermediate) — native
    * single-pass expression, see graft.functions.ShingleHashes. */
  private[graft] def withShingles(documents: DataFrame): DataFrame =
    reg(documents).select(col("doc_id"), expr(shingleHashes("text")).as("hashes"))

  /** MinHash-LSH candidate pairs: docs sharing at least one band of
    * the 32×2 signature. Output: (id_a, id_b, n_bands). */
  def minhashBands(documents: DataFrame): DataFrame = {
    val sigs = withShingles(documents)
      .withColumn("sig", expr(minhashSig("hashes")))
      .select(col("doc_id"), col("sig"))
    val bands = sigs.select(col("doc_id"),
      explode(expr(s"transform(sequence(0, ${NumBands - 1}), b -> " +
        "struct(b AS band, element_at(sig, 2*b + 1) AS k1, element_at(sig, 2*b + 2) AS k2))")).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.k1"), col("bd.k2"))
      .filter(col("k1").isNotNull && col("k2").isNotNull)
    val a = bands.select(col("doc_id").as("id_a"), col("band"), col("k1"), col("k2"))
    val b = bands.select(col("doc_id").as("id_b"), col("band"), col("k1"), col("k2"))
    a.join(b, Seq("band", "k1", "k2")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_bands"))
  }

  /** LSH bucket-skew diagnostics per band — the report that predicts
    * whether the [[minhashBands]] self-join survives at scale: bucket
    * census, the largest bucket (one oversized bucket = one straggler
    * task doing s²/2 comparisons), and the exact candidate-pair mass
    * Σ s(s−1)/2 the band join will emit. Run this BEFORE the join on
    * new data; a max_bucket in the thousands means the band key needs
    * more rows (narrower bands) or a salt.
    *
    * Plan: one keyed count to bucket sizes, one keyed rollup per
    * band — strictly cheaper than the join it audits. */
  def lshBucketStats(documents: DataFrame): DataFrame = {
    val sigs = withShingles(documents)
      .withColumn("sig", expr(minhashSig("hashes")))
      .select(col("doc_id"), col("sig"))
    val bands = sigs.select(col("doc_id"),
      explode(expr(s"transform(sequence(0, ${NumBands - 1}), b -> " +
        "struct(b AS band, element_at(sig, 2*b + 1) AS k1, element_at(sig, 2*b + 2) AS k2))")).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.k1"), col("bd.k2"))
      .filter(col("k1").isNotNull && col("k2").isNotNull)
    bands.groupBy(col("band"), col("k1"), col("k2"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("sz")).as("n_rows"),
        max(col("sz")).as("max_bucket"),
        round(expr("percentile(sz, 0.99D)") + lit(1e-9), 4).as("p99_bucket"),
        sum(expr("(sz * (sz - 1)) div 2")).as("candidate_pairs"))
      .orderBy(col("band"))
  }

  /** Sketch calibration report: for every MinHash band candidate pair,
    * the signature-estimated Jaccard (matching positions / NumHashes)
    * next to the EXACT shingle Jaccard and their absolute error — the
    * evaluation a pipeline runs before trusting a sketch threshold
    * (E[est] = exact; observed spread at 64 hashes ≈ ±0.12).
    *
    * Plan: ONE shingle+signature pass shared by candidate generation
    * and verification (persisted for the two consumers, released
    * eagerly — [[minhashBands]] would recompute it); the band
    * self-join is bucketed on (band, k1, k2); est and exact are
    * per-pair native/codegen array ops over the O(candidates) frame. */
  def minhashCalibration(documents: DataFrame): DataFrame = {
    val sigs = withShingles(documents)
      .withColumn("sig", expr(minhashSig("hashes")))
      .select(col("doc_id"), col("sig"), sort_array(col("hashes")).as("sh"))
      .persist()
    try {
      val bands = sigs.select(col("doc_id"),
        explode(expr(s"transform(sequence(0, ${NumBands - 1}), b -> " +
          "struct(b AS band, element_at(sig, 2*b + 1) AS k1, element_at(sig, 2*b + 2) AS k2))")).as("bd"))
        .select(col("doc_id"), col("bd.band"), col("bd.k1"), col("bd.k2"))
        .filter(col("k1").isNotNull && col("k2").isNotNull)
      val cand = bands.select(col("doc_id").as("id_a"), col("band"), col("k1"), col("k2"))
        .join(bands.select(col("doc_id").as("id_b"), col("band"), col("k1"), col("k2")),
          Seq("band", "k1", "k2"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_bands"))
      val result = cand
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"), col("sh").as("h_a")), Seq("id_a"))
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"), col("sh").as("h_b")), Seq("id_b"))
        .withColumn("est", round(
          expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") /
            lit(NumHashes.toDouble) + lit(1e-9), 6))
        .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
        .withColumn("exact", round(col("inter") /
          (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
        .withColumn("abs_err", round(abs(col("est") - col("exact")) + lit(1e-9), 6))
        .select(col("id_a"), col("id_b"), col("n_bands"),
          col("est"), col("exact"), col("abs_err"))
        .persist()
      result.count() // materialize so the sigs scratch frame can release
      result
    } finally sigs.unpersist()
  }

  /** Candidate pairs with PROVABLY complete recall via prefix filtering
    * (the AllPairs/PPJoin prefix principle): two sets with Jaccard ≥ t
    * must share at least |X∩Y| ≥ ceil(t·|X|) elements, so they must
    * collide inside their (|X| − ceil(t·|X|) + 1)-element prefixes of
    * the globally hash-ordered element lists. Exploding only prefixes
    * (≈ |X|·(1−t/(1+t)) ≈ half the tokens at t=0.5) keeps the join
    * bucketed and sub-quadratic, and — unlike a probabilistic sketch —
    * guarantees the verified output EQUALS the exact all-pairs result. */
  /** Rare-first ranked prefix rows (doc_id, sz, h) — the shared
    * candidate-generation index of [[prefixCandidates]] (self-join
    * dedup) and [[incrementalDedup]] (increment-vs-index probe): the
    * PPJoin prefix theorem needs the SAME global frequency order on
    * both join sides, so the df ranking always comes from the FULL
    * frame the two sides are drawn from. */
  private def rankedPrefix(hashFrame: DataFrame, threshold: Double): DataFrame = {
    val ex = hashFrame.select(col("doc_id"), size(col("hashes")).as("sz"),
      explode(col("hashes")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("dfreq"))
    // shuffled-hash, never broadcast: both sides are corpus-sized (ex
    // is O(tokens), dfreq O(vocabulary) — neither fits a driver
    // broadcast at scale, and the cached-frame size estimate otherwise
    // tempts the planner into building a driver HashedRelation over
    // the ENTIRE exploded corpus per action). The build side is the
    // narrow (h, dfreq) vocabulary slice; its aggregate already leaves
    // the data hash-partitioned on h, so the join adds one exchange
    // (ex) instead of one driver broadcast build per evaluation.
    ex.join(dfreq.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(collect_list(struct(col("dfreq"), col("h"))).as("ranked"))
      // native (dfreq, h) sort + cut (graft.functions.PrefixCut): the
      // composed slice(array_sort(...)) form pays an interpreted
      // lambda per comparison of every per-doc sort
      .select(col("doc_id"), col("sz"),
        explode(expr("graft_prefix_cut(ranked, " +
          s"cast(sz - ceil($threshold * sz - 1e-9) + 1 AS int))")).as("h"))
  }

  private[graft] def prefixCandidates(hashFrame: DataFrame, threshold: Double): DataFrame = {
    // PPJoin orders every doc's shingles by GLOBAL document frequency,
    // rarest first (ties on hash): the prefix principle is valid for
    // any total order shared by all docs, but only the rare-first order
    // keeps corpus-common shingles ("of the and"-style trigrams) out of
    // every prefix — with a value-ordered prefix each common shingle
    // forms a near-quadratic candidate clique; at corpus scale a single
    // boilerplate trigram in prefixes is an O(df²) join group.
    // The df map is computed from the same frame (one agg + one keyed
    // join — no broadcast: at corpus scale it is O(vocabulary)).
    //
    // the 1e-9 nudge inside ceil (rankedPrefix) keeps the bound
    // conservative when t*size is inexact in binary (e.g. 0.1*30 =
    // 3.0000000000000004 would otherwise over-prune an
    // exact-threshold pair). Per-doc prefix extraction is a hash
    // aggregate + one local array sort of ≤ |doc| elements (cheaper
    // than a sort-based window over the exploded frame).
    //
    // Pair enumeration is a single h-keyed bucket collapse + a
    // partition-local double explode (the q_item_cf collapse), NOT a
    // self-join: a join would evaluate the whole ranked-prefix subtree
    // once per side (ReusedExchange shares only the exchange, not the
    // collect/sort/explode above it) and broadcast one side per
    // action. Pair volume is identical — every (id_a < id_b) pair
    // sharing a prefix hash, size-filtered — so the distinct output
    // EQUALS the self-join's row-for-row. Bucket sizes are bounded by
    // the rare-first ranking (a hash of document frequency k yields at
    // most k prefix rows, and common shingles never enter prefixes).
    val p = rankedPrefix(hashFrame, threshold)
    p.groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      // PPJoin length filter: J >= t forces t*|A| <= |B| <= |A|/t —
      // prunes size-mismatched collisions before the distinct/verify
      .filter(col("a.doc_id") < col("b.doc_id") &&
        col("b.sz") >= ceil(col("a.sz") * threshold - lit(1e-9)) &&
        col("b.sz") <= col("a.sz") / threshold + lit(1e-9))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
  }

  /** Near-duplicate pairs with exact word-3-shingle Jaccard ≥ threshold,
    * sketch-accelerated: k-min sketch proposes candidates, exact
    * verification filters them — output equals the exact all-pairs
    * result without ever materializing all pairs.
    *
    * @note the returned frame is eagerly persisted (it is tiny —
    *       O(actual near-dup pairs) — and materializing it lets the
    *       large scratch frames be released before returning). Callers
    *       holding a long-lived session should `unpersist()` it once
    *       consumed, as [[components]] does. */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.5,
      verifyBroadcastBytes: Long = 64L << 20): DataFrame = {
    // the hash frame feeds candidate generation AND both verify sides —
    // its scan+hash projection sits BEFORE any exchange, so exchange
    // reuse cannot share it across branches; persist it (everything
    // downstream of an exchange IS shared per action via
    // ReusedExchange, so nothing else needs a cross-branch cache).
    // LAZY persist: the first downstream action (the candidate/verify
    // stats job inside jaccardPairsFromHashes) scans every partition
    // and populates the cache in the same job — a separate eager
    // count() here was one whole extra job per call
    val hs = withShingles(documents).select(col("doc_id"), col("hashes")).persist()
    try jaccardPairsFromHashes(hs, threshold, verifyBroadcastBytes)
    finally hs.unpersist()
  }

  /** [[jaccardPairs]] over a PRECOMPUTED (doc_id, hashes) frame — the
    * shared core, exposed so callers that already hold the (persisted)
    * shingle frame ([[incrementalComponents]]' within-side pairs) never
    * re-shingle the corpus. `hs` must be persisted and materialized by
    * the caller; the returned frame is eagerly persisted like
    * [[jaccardPairs]]'. */
  private[graft] def jaccardPairsFromHashes(hs: DataFrame, threshold: Double,
      verifyBroadcastBytes: Long = 64L << 20): DataFrame = {
    // verify on the (distinct) shingle HASH sets: integer intersection
    // is much cheaper than string-array intersection. Only the hash
    // sets of CANDIDATE docs are broadcast (semi-join first): the
    // candidate set is bounded by actual near-dups + sketch collisions,
    // while the full per-doc hash frame is O(corpus tokens) and must
    // never reach the driver.
    val cands = prefixCandidates(hs, threshold).persist()
    try {
      val candIds = cands.select(col("id_a").as("doc_id"))
        .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
      // pre-sorted hash arrays let the verify run an allocation-free
      // native merge intersection (SortedOverlap) instead of building
      // an array_intersect hash set per candidate pair
      val hsC = hs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), sort_array(col("hashes")).as("hashes")).persist()
      try {
        // Broadcast guard (the one scale seam round 7 left open): hsC
        // is bounded by actual near-dups + prefix collisions — tiny on
        // a healthy corpus, but a boilerplate-heavy 100 TB corpus can
        // push the candidate union past the executor broadcast limit.
        // [[verifyHint]] estimates the payload and drops the broadcast
        // hints past the budget (shuffled keyed joins instead).
        val hinted = verifyHint(hsC, verifyBroadcastBytes)
        // the result is O(actual near-dups) — tiny; materialize it
        // eagerly so the three scratch frames above can be released
        // instead of staying pinned for the session lifetime
        val result = cands
          .join(hinted(hsC.select(col("doc_id").as("id_a"), col("hashes").as("h_a"))), Seq("id_a"))
          .join(hinted(hsC.select(col("doc_id").as("id_b"), col("hashes").as("h_b"))), Seq("id_b"))
          .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
          .withColumn("jaccard", round(col("inter") /
            (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
          .filter(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .persist()
        result.count()
        result
      } finally hsC.unpersist()
    } finally cands.unpersist()
  }

  /** Incremental near-dup screening — the production shape a live
    * pipeline actually runs: a NEW shard (the deterministic
    * doc_id % mod == 0 slice standing in for today's crawl) probes the
    * EXISTING index (everything else) for near-duplicates, instead of
    * re-deduping the whole corpus. Output: one row per increment doc —
    * whether it duplicates the index, its best match (max Jaccard, tie
    * → lowest index id) and the score; never-matched docs carry NULLs.
    *
    * Candidate generation reuses the PPJoin [[rankedPrefix]] with the
    * GLOBAL df order from the full frame (the prefix theorem needs the
    * same total order on both sides), joined increment-side ×
    * index-side with the usual length filter — complete at the
    * threshold, never all-pairs. Verification: two keyed joins attach
    * the sorted hash sets (no broadcast: the index side is the 100 TB
    * one), native merge intersection, per-increment argmax window over
    * the verified (tiny) frame.
    *
    * This variant re-shingles and re-ranks the FULL corpus per run
    * (both sides come from one frame); the truly-incremental
    * production form is [[incrementalDedupWithSnapshot]], which reads
    * the index side's prefixes, hash sets and df order off the
    * persisted [[TextIndexSnapshot]] artifact and shingles only the
    * increment — value-identical output, spec-pinned.
    *
    * @note like [[jaccardPairs]], the returned frame is eagerly
    *       persisted (O(increment) rows) so the scratch hash frame can
    *       be released; long-lived sessions should `unpersist()` it
    *       once consumed. */
  def incrementalDedup(documents: DataFrame, threshold: Double = 0.5,
      mod: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hs = withShingles(documents).select(col("doc_id"), col("hashes")).persist()
    hs.count()
    try {
      val p = rankedPrefix(hs, threshold)
      val a = p.filter(col("doc_id") % mod === 0)
        .select(col("doc_id").as("inc_id"), col("sz").as("sz_a"), col("h"))
      val b = p.filter(col("doc_id") % mod =!= 0)
        .select(col("doc_id").as("idx_id"), col("sz").as("sz_b"), col("h"))
      val cands = a.join(b, Seq("h"))
        .filter(col("sz_b") >= ceil(col("sz_a") * threshold - lit(1e-9)) &&
          col("sz_b") <= col("sz_a") / threshold + lit(1e-9))
        .select(col("inc_id"), col("idx_id")).distinct()
      val sortedH = hs.select(col("doc_id"), sort_array(col("hashes")).as("sh"))
      val verified = cands
        .join(sortedH.select(col("doc_id").as("inc_id"), col("sh").as("h_a")), Seq("inc_id"))
        .join(sortedH.select(col("doc_id").as("idx_id"), col("sh").as("h_b")), Seq("idx_id"))
        .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
        .withColumn("jaccard", round(col("inter") /
          (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
        .filter(col("jaccard") >= threshold)
      val w = Window.partitionBy(col("inc_id")).orderBy(col("jaccard").desc, col("idx_id"))
      val best = verified.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("inc_id").as("doc_id"), col("idx_id").as("best_match"),
          col("jaccard").as("best_jaccard"))
      val out = documents.select(col("doc_id"))
        .filter(col("doc_id") % mod === 0)
        .join(best, Seq("doc_id"), "left")
        .withColumn("is_dup", col("best_match").isNotNull)
        .select(col("doc_id"), col("is_dup"), col("best_match"), col("best_jaccard"))
        .persist()
      out.count()
      out
    } finally hs.unpersist()
  }

  /** Persisted text-index artifact for [[incrementalDedupWithSnapshot]]
    * — what makes the incremental screen truly incremental: a daily
    * increment run must not re-shingle (or re-rank) the 100 TB index,
    * so everything the probe needs is precomputed once and stored as
    * parquet. `index` holds one row per index doc: its sorted shingle
    * hash set (`sh`, the verify side), its size and its rare-first
    * PPJoin prefix (`prefix`, lengths baked at `threshold`); `dfreq`
    * is the index-corpus document-frequency table that fixes the
    * global rank order increment prefixes must be cut under.
    *
    * Completeness note: the PPJoin prefix theorem needs only that BOTH
    * sides cut prefixes under one common total order — here
    * (df_index(h), h), with increment-only shingles taking df 0
    * (rarest; they cannot exist index-side, so ranking them first is
    * also the efficient choice). The candidate set may differ from the
    * full-corpus-df run, but both are supersets of the true pairs, so
    * the VERIFIED output is identical (spec-pinned). */
  case class TextIndexSnapshot(index: DataFrame, dfreq: DataFrame, threshold: Double) {
    /** Write the artifact (parquet dirs + the threshold the prefix
      * lengths were cut at), then release the builder's cache — once
      * the artifact is on disk the in-memory copies are dead weight
      * (unpersist on an unpersisted frame, e.g. an appended union, is
      * a no-op). */
    def save(dir: String): Unit = {
      index.write.mode("overwrite").parquet(s"$dir/index")
      dfreq.write.mode("overwrite").parquet(s"$dir/dfreq")
      val spark = index.sparkSession
      import spark.implicits._
      Seq(threshold).toDF("threshold")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      index.unpersist(); dfreq.unpersist()
    }
  }

  object TextIndexSnapshot {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): TextIndexSnapshot =
      TextIndexSnapshot(
        spark.read.parquet(s"$dir/index"),
        spark.read.parquet(s"$dir/dfreq"),
        spark.read.parquet(s"$dir/meta").head().getDouble(0))
  }

  /** Index rows (doc_id, sz, sorted hashes, rare-first prefix) for one
    * corpus side under a FIXED df order — shared by the snapshot build
    * (df from the same corpus) and [[appendToTextIndexSnapshot]] (the
    * snapshot's frozen df; shingles unseen there take df 0). Takes the
    * PRECOMPUTED shingle frame (doc_id, hashes) so the caller decides
    * whether to persist it — it is read twice here (prefix aggregate +
    * sorted-hashes join). */
  private def indexRows(hs: DataFrame, dfreq: DataFrame,
      threshold: Double): DataFrame = {
    val ex = hs.select(col("doc_id"), size(col("hashes")).as("sz"),
      explode(col("hashes")).as("h"))
    val prefix = ex.join(dfreq, Seq("h"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .groupBy(col("doc_id"), col("sz"))
      .agg(collect_list(struct(col("dfreq"), col("h"))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        expr("graft_prefix_cut(ranked, " +
          s"cast(sz - ceil($threshold * sz - 1e-9) + 1 AS int))").as("prefix"))
    hs.select(col("doc_id"), sort_array(col("hashes")).as("sh"))
      .join(prefix, Seq("doc_id"))
      .select(col("doc_id"), col("sz"), col("sh"), col("prefix"))
  }

  /** Build the [[TextIndexSnapshot]] for an index corpus — ONE
    * shingle pass over the 100 TB side (shingle, df-rank, prefix-cut,
    * sort), amortized across every subsequent increment run. The
    * shingle frame is PERSISTED for the build (it feeds the df
    * aggregate, the prefix aggregate and the sorted-hashes join — an
    * unpersisted plan would re-shingle the corpus three times) and
    * unpersisted once the snapshot frames are materialized; the
    * builder is therefore EAGER, the artifact-write semantic.
    *
    * Plan: one cached shingle scan feeding a keyed df aggregate and a
    * per-doc collect+sort; nothing all-pairs, nothing driver-side. */
  def buildTextIndexSnapshot(indexDocs: DataFrame,
      threshold: Double = 0.5): TextIndexSnapshot = {
    val hs = withShingles(indexDocs).select(col("doc_id"), col("hashes")).persist()
    try {
      hs.count()
      val dfreq = hs.select(col("doc_id"), explode(col("hashes")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("dfreq")).persist()
      val index = indexRows(hs, dfreq, threshold).persist()
      index.count(); dfreq.count()
      TextIndexSnapshot(index, dfreq, threshold)
    } finally hs.unpersist()
  }

  /** Fold freshly screened (and accepted) documents INTO the index
    * artifact — the other half of the daily cycle: screen today's
    * crawl against the snapshot, then append it so tomorrow's crawl is
    * screened against today's too. The new docs' prefixes are cut
    * under the snapshot's FROZEN df order (unseen shingles df 0):
    * prefix completeness needs only that every index row and every
    * future probe use one common total order, which freezing
    * preserves — existing rows are untouched, no 100 TB re-rank. What
    * decays is pruning efficiency as true df drifts from the frozen
    * order: boilerplate that only EMERGES in appended batches carries
    * frozen df 0, ranks rarest, and lands in both the appended rows'
    * prefixes and any same-boilerplate probe's — so those probe docs
    * collide with ~every appended doc carrying it. CANARY_r10's
    * index_drift leg measures the curve: candidates per probe doc grow
    * ~linearly with the appended share carrying emerged boilerplate
    * (1000 → 2490 per doc at 20% → 50% appended on the canary corpus)
    * while a fresh rebuild of the same union prunes them to ~0.
    * REBUILD TRIGGER: the daily screen already materializes its
    * candidate count — track candidates-per-increment-doc and rebuild
    * ([[buildTextIndexSnapshot]]) when it exceeds ~10× the
    * post-rebuild baseline; verification cost is proportional to
    * candidates, so that ratio IS the wasted-work factor.
    * Screening against the appended snapshot is spec-pinned
    * value-identical to screening against a fresh rebuild (candidates
    * differ, verification is exact). doc_ids must stay unique across
    * appends (caller's contract, as in any index). */
  def appendToTextIndexSnapshot(snapshot: TextIndexSnapshot,
      newDocs: DataFrame): TextIndexSnapshot =
    // the increment shingle frame stays lazy (read twice inside
    // indexRows): a daily append is increment-sized, and the artifact
    // save that follows materializes the plan once anyway
    snapshot.copy(index = snapshot.index.unionByName(
      indexRows(withShingles(newDocs).select(col("doc_id"), col("hashes")),
        snapshot.dfreq, snapshot.threshold)))

  /** [[appendToTextIndexSnapshot]] + save, restructured as an
    * APPEND-ONLY artifact write: only the increment's index rows are
    * written (parquet `append` into the artifact's index dir), so the
    * daily index write is O(increment) — the in-memory-union + `save`
    * composition rewrote the ENTIRE index (100 TB re-read + re-write
    * per day). dfreq and meta are frozen by construction (appended
    * prefixes are cut under the frozen df order — the same
    * completeness argument as the in-memory append, which LlmSpec pins
    * value-identical to a rebuild), so only index/ grows. Returns the
    * re-loaded snapshot over the grown artifact — row-set identical to
    * `appendToTextIndexSnapshot(load(dir), newDocs).save(...)`. */
  def appendToTextIndexSnapshotInPlace(dir: String,
      newDocs: DataFrame): TextIndexSnapshot = {
    val spark = newDocs.sparkSession
    val snap = TextIndexSnapshot.load(spark, dir)
    indexRows(withShingles(newDocs).select(col("doc_id"), col("hashes")),
      snap.dfreq, snap.threshold)
      .write.mode("append").parquet(s"$dir/index")
    TextIndexSnapshot.load(spark, dir)
  }

  /** Candidate (inc_id, idx_id) pairs of an increment's shingle frame
    * against a snapshot — the PPJoin prefix probe factored out of
    * [[incrementalDedupWithSnapshot]] so the drift gauge (canary) can
    * measure candidate inflation without paying verification. Ranks
    * the increment under the SNAPSHOT's df order (unseen shingles take
    * df 0 → rarest); length-filtered, distinct. */
  private[graft] def snapshotPrefixCandidates(hsInc: DataFrame,
      snapshot: TextIndexSnapshot): DataFrame = {
    val threshold = snapshot.threshold
    val exI = hsInc.select(col("doc_id"), size(col("hashes")).as("sz"),
      explode(col("hashes")).as("h"))
    val a = exI.join(snapshot.dfreq, Seq("h"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .groupBy(col("doc_id"), col("sz"))
      .agg(collect_list(struct(col("dfreq"), col("h"))).as("ranked"))
      .select(col("doc_id").as("inc_id"), col("sz").as("sz_a"),
        explode(expr("graft_prefix_cut(ranked, " +
          s"cast(sz - ceil($threshold * sz - 1e-9) + 1 AS int))")).as("h"))
    val b = snapshot.index.select(col("doc_id").as("idx_id"),
      col("sz").as("sz_b"), explode(col("prefix")).as("h"))
    a.join(b, Seq("h"))
      .filter(col("sz_b") >= ceil(col("sz_a") * threshold - lit(1e-9)) &&
        col("sz_b") <= col("sz_a") / threshold + lit(1e-9))
      .select(col("inc_id"), col("idx_id")).distinct()
  }

  /** ALL exact-verified (inc_id, idx_id, jaccard) cross-side pairs of
    * an increment's shingle frame against a snapshot — the complete
    * pair set [[incrementalDedupWithSnapshot]] argmaxes over, exposed
    * whole for consumers that need every edge (incremental component
    * maintenance, [[mergeComponents]]) rather than the best match. */
  private[graft] def snapshotVerifiedPairs(hsInc: DataFrame,
      snapshot: TextIndexSnapshot): DataFrame =
    snapshotPrefixCandidates(hsInc, snapshot)
      .join(hsInc.select(col("doc_id").as("inc_id"),
        sort_array(col("hashes")).as("h_a")), Seq("inc_id"))
      .join(snapshot.index.select(col("doc_id").as("idx_id"),
        col("sh").as("h_b")), Seq("idx_id"))
      .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
      .filter(col("jaccard") >= snapshot.threshold)
      .select(col("inc_id"), col("idx_id"), col("jaccard"))

  /** EXACT within-index near-dup pairs derived from the snapshot
    * artifact alone — [[jaccardPairs]] over the index corpus WITHOUT
    * re-shingling it: the snapshot already holds every doc's rare-first
    * PPJoin prefix (cut under the index corpus's own df order — the
    * identical (dfreq, h) ranking [[prefixCandidates]] computes) and
    * its sorted hash set, so candidate generation is a self-equi-join
    * of the stored prefixes (same length filter) and verification the
    * usual native merge intersection over the stored `sh` arrays.
    * Candidates — and therefore the verified output — equal
    * [[jaccardPairs]](indexDocs, threshold) row for row.
    *
    * This is what lets a day-0 replay (build snapshot + batch labels)
    * pay the 100 TB shingle/df/prefix pass ONCE instead of twice. */
  private[graft] def selfPairsFromSnapshot(snapshot: TextIndexSnapshot): DataFrame = {
    val threshold = snapshot.threshold
    // same h-keyed bucket collapse as [[prefixCandidates]] (one
    // evaluation of the exploded-prefix frame + one exchange, vs a
    // self-join that scans the artifact once per side); pair set
    // identical: every (id_a < id_b) pair sharing a prefix hash,
    // size-filtered
    val p = snapshot.index.select(col("doc_id"), col("sz"),
      explode(col("prefix")).as("h"))
    val cands = p.groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        col("b.sz") >= ceil(col("a.sz") * threshold - lit(1e-9)) &&
        col("b.sz") <= col("a.sz") / threshold + lit(1e-9))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    cands
      .join(snapshot.index.select(col("doc_id").as("id_a"), col("sh").as("h_a")), Seq("id_a"))
      .join(snapshot.index.select(col("doc_id").as("id_b"), col("sh").as("h_b")), Seq("id_b"))
      .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** [[components]] of the INDEX corpus computed off its snapshot
    * artifact — identical labels (the pair set equals
    * [[jaccardPairs]]' by [[selfPairsFromSnapshot]]'s argument), but
    * the corpus is never re-shingled: the day-0 leg of the incremental
    * cluster-maintenance cycle shares the snapshot build's one pass. */
  def componentsFromSnapshot(ids: DataFrame,
      snapshot: TextIndexSnapshot): DataFrame =
    componentsFromPairs(ids.select(col("doc_id")),
      selfPairsFromSnapshot(snapshot).select(col("id_a"), col("id_b")))

  /** [[incrementalDedup]] against a precomputed [[TextIndexSnapshot]]
    * — the production daily run: only the INCREMENT is shingled and
    * ranked (under the snapshot's df order); the index side's prefixes
    * and sorted hash sets come straight off parquet. Output schema and
    * values equal [[incrementalDedup]] over the union corpus with the
    * same side split (spec-pinned): candidates may differ (df orders
    * differ) but both candidate sets are complete, and verification is
    * exact.
    *
    * Plan: increment-only shingle scan; prefix equi-join on h with the
    * PPJoin length filter; two keyed verify joins (no broadcast — the
    * index side is the 100 TB one); per-increment argmax window. */
  def incrementalDedupWithSnapshot(incrementDocs: DataFrame,
      snapshot: TextIndexSnapshot): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val threshold = snapshot.threshold
    val hsInc = withShingles(incrementDocs)
      .select(col("doc_id"), col("hashes")).persist()
    hsInc.count()
    try {
      val verified = snapshotVerifiedPairs(hsInc, snapshot)
      val w = Window.partitionBy(col("inc_id")).orderBy(col("jaccard").desc, col("idx_id"))
      val best = verified.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("inc_id").as("doc_id"), col("idx_id").as("best_match"),
          col("jaccard").as("best_jaccard"))
      val out = incrementDocs.select(col("doc_id"))
        .join(best, Seq("doc_id"), "left")
        .withColumn("is_dup", col("best_match").isNotNull)
        .select(col("doc_id"), col("is_dup"), col("best_match"), col("best_jaccard"))
        .persist()
      out.count()
      out
    } finally hsInc.unpersist()
  }

  /** Near-dup threshold sensitivity sweep — the tuning curve run
    * before ANY dedup deploy ("how much do we delete at τ?"): pair
    * and affected-doc counts at each candidate threshold, from ONE
    * [[jaccardPairs]] pass at the loosest τ (the prefix filter is
    * complete for every τ ≥ min, so the sweep is a rollup, not five
    * re-runs). n_dup_docs counts the docs a keep-lowest-id policy
    * would drop.
    *
    * Plan: the jaccardPairs cost once, ×|τ| explode of the tiny pair
    * frame, keyed rollup + scalar doc-count join. */
  def thresholdSweep(documents: DataFrame,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    val pairs = jaccardPairs(documents, thresholds.min)
    val nd = documents.agg(count(lit(1)).as("n_docs"))
    pairs.withColumn("t", explode(lit(thresholds.toArray)))
      .filter(col("jaccard") >= col("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_b")).as("n_dup_docs"))
      .crossJoin(broadcast(nd))
      .withColumn("dup_share",
        round(col("n_dup_docs") / col("n_docs").cast("double") + lit(1e-9), 6))
      .select(col("t"), col("n_pairs"), col("n_dup_docs"), col("dup_share"))
      .orderBy(col("t"))
  }

  /** Asymmetric containment near-dups: pairs where the SMALLER doc's
    * shingle set is ≥ `threshold` contained in the larger's
    * (C = |A∩B| / min(|A|,|B|)) — the quote-inclusion / sub-document
    * duplication case that symmetric Jaccard structurally misses
    * (a 50-shingle doc fully embedded in a 500-shingle doc has
    * J ≈ 0.1 but C = 1.0).
    *
    * Candidates with provably complete recall: C ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉ with A the smaller set, so A must collide with B
    * inside A's own (|A| − ⌈t·|A|⌉ + 1)-element rare-first prefix —
    * the pigeonhole argument needs ONLY the probe side's prefix, the
    * other side keeps full postings (the textbook ProbeCount shape).
    * Rare-first ordering (global df, as in [[prefixCandidates]]) keeps
    * boilerplate shingles out of every prefix so no O(df²) join group
    * forms. Verify = native merge intersection over the candidate
    * docs' sorted hash arrays, semi-join-bounded exactly like
    * [[jaccardPairs]] — including the same [[verifyHint]] size guard:
    * past `verifyBroadcastBytes` the verify joins run shuffled instead
    * of broadcast (a boilerplate-heavy corpus at a low containment
    * threshold is exactly the case that blows the candidate union up). */
  def containmentPairs(documents: DataFrame, threshold: Double = 0.8,
      verifyBroadcastBytes: Long = 64L << 20): DataFrame = {
    val hs = withShingles(documents).select(col("doc_id"), col("hashes")).persist()
    hs.count()
    val ex = hs.select(col("doc_id"), size(col("hashes")).as("sz"),
      explode(col("hashes")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("dfreq"))
    // probe prefixes: rare-first, length |X| − ⌈t·|X|⌉ + 1
    val prefix = ex.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(collect_list(struct(col("dfreq"), col("h"))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        explode(expr("graft_prefix_cut(ranked, " +
          s"cast(sz - ceil($threshold * sz - 1e-9) + 1 AS int))")).as("h"))
    // full postings on the other side: the probe is valid whenever the
    // probing doc is the smaller of the pair, so keep sz_a <= sz_b and
    // canonicalize ids afterwards
    val full = ex.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("h"))
    val cands = prefix
      .select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("h"))
      .join(full, Seq("h"))
      .filter(col("id_a") =!= col("id_b") &&
        (col("sz_a") < col("sz_b") ||
          (col("sz_a") === col("sz_b") && col("id_a") < col("id_b"))))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct().persist()
    try {
      val candIds = cands.select(col("id_a").as("doc_id"))
        .unionByName(cands.select(col("id_b").as("doc_id"))).distinct()
      val hsC = hs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), sort_array(col("hashes")).as("hashes")).persist()
      try {
        val hinted = verifyHint(hsC, verifyBroadcastBytes)
        val result = cands
          .join(hinted(hsC.select(col("doc_id").as("id_a"), col("hashes").as("h_a"))), Seq("id_a"))
          .join(hinted(hsC.select(col("doc_id").as("id_b"), col("hashes").as("h_b"))), Seq("id_b"))
          .withColumn("inter", expr("graft_sorted_overlap(h_a, h_b)").cast("double"))
          .withColumn("containment", round(col("inter") /
            least(size(col("h_a")), size(col("h_b"))) + lit(1e-9), 6))
          .filter(col("containment") >= threshold)
          .select(col("id_a"), col("id_b"), size(col("h_a")).as("sz_a"),
            size(col("h_b")).as("sz_b"), col("containment"))
          .persist()
        result.count()
        result
      } finally hsC.unpersist()
    } finally { cands.unpersist(); hs.unpersist() }
  }

  /** Duplicate-cluster canonicalization — the final step of a dedup
    * pipeline: the near-dup pairs form a graph; every document maps to
    * the minimum doc_id of its connected component (its canonical
    * representative), so `keep = (doc_id == component)` dedups the
    * corpus with one filter. Docs in no pair are their own singleton
    * component.
    *
    * Algorithm: distributed min-label propagation with pointer
    * jumping — each round propagates labels across edges (join +
    * groupBy(min)) and then shortcuts every label to its label's label
    * (one keyed self-join), halving the remaining distance to the
    * component minimum: O(log diameter) rounds even for adversarial
    * chain-shaped duplicate graphs, where plain propagation needs
    * O(diameter) and would trip the round bound. Labels are
    * localCheckpoint'ed per round so lineage stays flat. All data
    * movement is keyed shuffles of the (id, label) frame; nothing
    * all-pairs, nothing driver-side except the per-round convergence
    * aggregate — the textbook 100 TB connected-components shape. */
  def components(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = jaccardPairs(documents, threshold)
    // jaccardPairs returns its (tiny) result eagerly persisted; this
    // consumer only derives edges from it, so release it once the
    // propagation below has materialized
    try componentsFromPairs(documents.select(col("doc_id")),
      pairs.select(col("id_a"), col("id_b")))
    finally pairs.unpersist()
  }

  /** Connected components of an arbitrary (id_a, id_b) pair graph over
    * `ids` (doc_id); exposed separately so any dedup pair source
    * (minhash bands, simhash, embeddings) can be canonicalized — and
    * property-tested against a union-find model. */
  def componentsFromPairs(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    try {
      // only nodes touched by an edge can ever change label — iterate
      // over the duplicate SUBGRAPH (O(near-dup docs)), not the whole
      // corpus: at 100 TB the corpus is billions of ids but the pair
      // graph is a few percent of it, and every round's shuffles size
      // to the subgraph. Untouched ids rejoin as singletons at the end.
      // Both edge directions are present, so src alone covers all
      // touched nodes.
      // initial labels fold round 1's neighbor-min INTO the seed (one
      // keyed aggregate over the edge frame instead of a separate
      // identity round): label₀(v) = min(v, min over neighbors) — a
      // strictly lower start on the same monotone lattice, so the
      // fixpoint (the component minimum) is unchanged, and on
      // clique-shaped duplicate graphs (the common near-dup cluster)
      // it IS the fixpoint, making the loop one confirmation round.
      // Both edge directions are present, so src covers all touched
      // nodes and min(dst) over the group is the full neighbor min.
      var labels = edges.groupBy(col("src").as("doc_id"))
        .agg(least(min(col("dst")), col("src")).as("comp"))
        .localCheckpoint(false) // materialized by the labelSum below
      // fixpoint detection without a join: labels only ever DECREASE
      // under min-propagation, so the exact (decimal, overflow-free)
      // label sum is strictly monotone until convergence — one cheap
      // aggregate per round over the just-checkpointed frame
      def labelSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO) // empty ids frame
      var prevSum = labelSum(labels)
      var converged = false
      var rounds = 0
      val maxRounds = 50
      while (!converged && rounds < maxRounds) {
        val propagated = edges
          .join(labels.select(col("doc_id").as("dst"), col("comp")), Seq("dst"))
          .select(col("src").as("doc_id"), col("comp"))
        val stepped = labels.unionByName(propagated)
          .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
        // pointer jumping: follow each label to ITS label (comp is
        // always a member id, so the lookup side is the frame itself,
        // re-keyed on doc_id — unique after the groupBy); labels only
        // decrease, so the fixpoint is unchanged but the distance to
        // the component minimum halves per round
        val next = stepped
          .join(stepped.select(col("doc_id").as("comp"), col("comp").as("jumped")),
            Seq("comp"), "left")
          .select(col("doc_id"),
            least(col("comp"), coalesce(col("jumped"), col("comp"))).as("comp"))
          // LAZY checkpoint: the labelSum aggregate right below is the
          // round's one action — it materializes the checkpoint blocks
          // and truncates lineage in the same job (the eager form paid
          // a separate materialization job per round)
          .localCheckpoint(false)
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        // superseded checkpoint: release its backing RDD blocks now
        // (Dataset.unpersist would be a CacheManager no-op here)
        graft.core.Checkpoints.release(labels)
        labels = next
        rounds += 1
      }
      // silent truncation would return a component split in two and the
      // caller would keep duplicate documents — fail loudly instead
      if (!converged) throw new IllegalStateException(
        s"component propagation did not converge in $maxRounds rounds " +
          "(component diameter too large — switch the step to large-star/small-star)")
      val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
      val clustered = labels.join(sizes, Seq("comp"))
        .select(col("doc_id"), col("comp"), col("comp_size"))
      // ids in no pair: their own singleton component (anti-join is one
      // keyed shuffle of the id column only)
      val singletons = ids.select(col("doc_id"))
        .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("comp"),
          lit(1L).as("comp_size"))
      clustered.unionByName(singletons)
    } finally edges.unpersist()
  }

  /** Fold a day's NEW near-dup pairs into EXISTING component labels —
    * the cluster-maintenance leg of the daily dedup cycle: production
    * dedup clusters grow as crawls arrive, and recomputing components
    * from the full pair history every day re-propagates the 100 TB
    * past. Instead, the previous labels COMPRESS that history to one
    * star edge per clustered doc (doc → its component representative;
    * a label frame is a spanning contraction, so connectivity is
    * preserved exactly), and the propagation reruns over star edges ∪
    * the day's new pairs only — per-round shuffles size to the live
    * subgraph, and stars make old components converge in one hop.
    * Output equals [[componentsFromPairs]] over the FULL pair history
    * (spec-pinned; the registered query's oracle is the batch
    * components oracle, reused verbatim). */
  def mergeComponents(prevLabels: DataFrame, newIds: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val starEdges = prevLabels.filter(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as("id_a"), col("comp").as("id_b"))
    componentsFromPairs(
      prevLabels.select(col("doc_id")).unionByName(newIds.select(col("doc_id"))),
      starEdges.unionByName(newPairs.select(col("id_a"), col("id_b"))))
  }

  /** The daily cluster-maintenance composition over the persisted
    * artifact: day-0 labels + the increment's cross-side pairs
    * (complete, via the snapshot's prefix probe — only the increment
    * is shingled) + the increment's within-side pairs, merged by
    * [[mergeComponents]]. Equals the one-shot [[components]] over the
    * union corpus (same threshold), so the batch oracle verifies it
    * row-for-row. */
  def incrementalComponents(incrementDocs: DataFrame,
      prevLabels: DataFrame, snapshot: TextIndexSnapshot): DataFrame = {
    val hsInc = withShingles(incrementDocs)
      .select(col("doc_id"), col("hashes")).persist()
    hsInc.count()
    try {
      val cross = snapshotVerifiedPairs(hsInc, snapshot)
        .select(col("inc_id").as("id_a"), col("idx_id").as("id_b"))
      // within-side pairs reuse the persisted increment hash frame —
      // jaccardPairs(incrementDocs, …) would re-shingle the increment
      val within = jaccardPairsFromHashes(hsInc, snapshot.threshold)
      try {
        val merged = mergeComponents(prevLabels,
          incrementDocs.select(col("doc_id")),
          cross.unionByName(within.select(col("id_a"), col("id_b"))))
        merged
      } finally within.unpersist()
    } finally hsInc.unpersist()
  }

  /** Dedup reporting: distribution of near-dup cluster sizes from
    * [[components]] — how many clusters of each size, how many docs
    * they hold, and how many docs a keep-one-per-cluster pass removes
    * (the summary a dedup run is judged by before committing the
    * delete).
    *
    * Plan: the components propagation, then ONE map-combinable
    * aggregate down to ≤ max-cluster-size rows. */
  def clusterSizes(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    components(documents, threshold)
      .groupBy(col("comp_size"))
      .agg(countDistinct(col("comp")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
      .withColumn("dup_docs", col("n_docs") - col("n_clusters"))
      .orderBy(col("comp_size"))

  /** SimHash near-duplicates: 60-bit signatures, pairs within Hamming
    * distance maxHamming. Candidate generation buckets on FOUR bands
    * of 15 bits: by pigeonhole, ≤ 3 differing bits can touch at most 3
    * of the 4 bands, so every pair within Hamming ≤ 3 shares at least
    * one band bucket — candidate recall is exactly 1 and the output
    * equals the all-pairs result. The 2^15 bucket key space per band
    * is the scale lever: per-bucket join fan-out is O((n/2^15)²) per
    * bucket, where the previous 30-bit/8-bit layout (≤256 buckets)
    * went quadratic at ×10 corpus size (measured 3.5s → 62s; this
    * layout: flat). */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-band bucketing guarantees complete recall only for hamming <= 3 (got $maxHamming); " +
        "use maxHamming + 1 bands for larger radii")
    // native one-pass signature (graft.functions.SimHashText); the
    // composed HOF form (TextFns.simhash) re-walks the token array 60
    // times per doc interpreted — LlmSpec proves both bit-identical
    val sigs = reg(documents)
      .withColumn("sim", expr("graft_simhash_text(text)"))
      .select(col("doc_id"), col("sim"))
    val m = (1 << SimHashBandBits) - 1 // 15-bit band mask
    val keyed = sigs.select(col("doc_id"), col("sim"),
        posexplode(array(
          expr(s"sim & $m"),
          expr(s"shiftright(sim, ${SimHashBandBits}) & $m"),
          expr(s"shiftright(sim, ${2 * SimHashBandBits}) & $m"),
          expr(s"shiftright(sim, ${3 * SimHashBandBits}) & $m"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = keyed.select(col("doc_id").as("id_a"), col("sim").as("sim_a"), col("band"), col("bucket"))
    val b = keyed.select(col("doc_id").as("id_b"), col("sim").as("sim_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicates: EXACT cosine ≥ threshold pairs, block
    * layout (no CartesianProduct).
    *
    * Vectors hash to `nBlocks` blocks; each vector is replicated to the
    * B block-pair groups it participates in, and each group scores its
    * pair block with a primitive-array loop — the block decomposition
    * of an exact similarity join (block matrix multiply). Shuffle
    * volume is O(n·B) vector rows instead of O(n²) materialized pairs;
    * per-task memory is O(d·n/B); compute stays O(n²·d/2), which is
    * inherent to EXACT pairwise similarity on unstructured vectors:
    * random-hyperplane LSH cannot reach recall 1 at τ=0.4
    * (P[sign agree] = 1−θ/π ≈ 0.63 per plane, so any banding either
    * misses threshold pairs or retains Ω(n²) candidates — this corpus
    * has a continuum of background pairs straddling the threshold).
    * For production near-dup thresholds (τ ≳ 0.8) the banded
    * [[embeddingPairsLsh]] is the sub-quadratic route.
    * At cluster scale pick B ≈ sqrt(n²d / flopsPerTask) so tasks stay
    * uniform; the dot product runs in index order (left fold), matching
    * the oracle bit-for-bit. */
  def embeddingPairs(embeddings: DataFrame, threshold: Double = 0.4,
      nBlocks: Int = 16): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val B = nBlocks
    val vecs = reg(embeddings).select(
      col("vec_id").cast("long").as("id"),
      expr("transform(embedding, x -> cast(x AS double))").as("emb"),
      expr("sqrt(graft_dot(embedding, embedding))").as("nrm"))
      .as[(Long, Array[Double], Double)]
    val replicated = vecs.flatMap { case (id, emb, nrm) =>
      // floorMod: a negative id must land in [0, B) like everyone else —
      // (id % B) would put it in a phantom negative block that only ever
      // appears as the 'lo' side of non-diagonal groups, so two
      // negative-block vectors would never be scored against each other
      val blk = java.lang.Math.floorMod(id, B.toLong).toInt
      (0 until B).iterator.map { other =>
        val lo = math.min(blk, other); val hi = math.max(blk, other)
        (lo * B + hi, blk == lo, id, emb, nrm)
      }
    }
    // candidates leave the task pre-filtered slightly BELOW the
    // threshold; the exact rounded filter below reproduces the oracle's
    // round-then-compare semantics
    val cut = threshold - 1e-4
    val pairs = replicated.groupByKey(_._1).flatMapGroups { (key, it) =>
      val lo = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      val hi = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      it.foreach { case (_, isLo, id, emb, nrm) =>
        if (isLo) lo += ((id, emb, nrm)) else hi += ((id, emb, nrm))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      def score(a: (Long, Array[Double], Double), b: (Long, Array[Double], Double)): Unit = {
        val (ia, ea, na) = a; val (ib, eb, nb) = b
        var acc = 0.0; var i = 0; val d = ea.length
        while (i < d) { acc += ea(i) * eb(i); i += 1 }
        val cos = acc / (na * nb)
        if (cos >= cut) out += (if (ia < ib) (ia, ib, cos) else (ib, ia, cos))
      }
      if (key / B == key % B) { // diagonal block: all pairs within `lo`
        var i = 0
        while (i < lo.length) {
          var j = i + 1
          while (j < lo.length) { score(lo(i), lo(j)); j += 1 }
          i += 1
        }
      } else {
        var i = 0
        while (i < lo.length) {
          var j = 0
          while (j < hi.length) { score(lo(i), hi(j)); j += 1 }
          i += 1
        }
      }
      out.iterator
    }.toDF("id_a", "id_b", "cos")
    pairs
      .withColumn("cosine", round(col("cos") + lit(1e-9), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** CROSS-SIDE exact cosine pairs for the incremental screen: the
    * increment side (vec_id % mod == 0) scored against the index side
    * only — [[embeddingPairs]]' block decomposition restricted to
    * inc-block × idx-block groups, so not one index×index (or
    * increment×increment) dot product is ever computed. Each side
    * blocks independently on floorMod(id, B); an increment vector
    * replicates to its B (incBlk, ·) groups, an index vector to its B
    * (·, idxBlk) groups — shuffle stays O(n·B) vector rows, per-task
    * memory O(d·n/B) per side, compute exactly |inc|·|idx|·d (the
    * cross-side share; the previous shape scored the full corpus and
    * discarded ~81% of the work at a 10% increment). Same in-order
    * dot product and rounding as [[embeddingPairs]], so the verified
    * frame is bit-identical to filtering its output cross-side.
    *
    * `scored` (spec instrumentation only) counts dot products. */
  /** Normalized (id, double-vector, norm) rows for the exact-cosine
    * operators — also the [[buildEmbeddingIndexSnapshot]] payload. */
  private def prepVecs(embeddings: DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    reg(embeddings).select(
      col("vec_id").cast("long").as("id"),
      expr("transform(embedding, x -> cast(x AS double))").as("emb"),
      expr("sqrt(graft_dot(embedding, embedding))").as("nrm"))
      .as[(Long, Array[Double], Double)]
  }

  /** The grouped cross-side scorer behind both incremental embedding
    * screens: `replicated` carries (groupKey, isIncrement, id, emb,
    * norm) rows fanned out so every (incBlk, idxBlk) group holds both
    * sides; each group scores inc×idx only. */
  private def crossScore(
      replicated: org.apache.spark.sql.Dataset[(Int, Boolean, Long, Array[Double], Double)],
      threshold: Double,
      scored: Option[org.apache.spark.util.LongAccumulator]): DataFrame = {
    val spark = replicated.sparkSession
    import spark.implicits._
    val cut = threshold - 1e-4
    val pairs = replicated.groupByKey(_._1).flatMapGroups { (_, it) =>
      val inc = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      val idx = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      it.foreach { case (_, isInc, id, emb, nrm) =>
        if (isInc) inc += ((id, emb, nrm)) else idx += ((id, emb, nrm))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < inc.length) {
        val (ia, ea, na) = inc(i)
        var j = 0
        while (j < idx.length) {
          val (ib, eb, nb) = idx(j)
          var acc = 0.0; var p = 0; val d = ea.length
          while (p < d) { acc += ea(p) * eb(p); p += 1 }
          scored.foreach(_.add(1L))
          val cos = acc / (na * nb)
          if (cos >= cut) out += ((ia, ib, cos))
          j += 1
        }
        i += 1
      }
      out.iterator
    }.toDF("inc_id", "idx_id", "cos")
    pairs
      .withColumn("cosine", round(col("cos") + lit(1e-9), 6))
      .filter(col("cosine") >= threshold)
      .select(col("inc_id"), col("idx_id"), col("cosine"))
  }

  private[graft] def embeddingCrossPairs(embeddings: DataFrame, threshold: Double,
      mod: Int, nBlocks: Int = 16,
      scored: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val B = nBlocks
    val replicated = prepVecs(embeddings).flatMap { case (id, emb, nrm) =>
      val isInc = java.lang.Math.floorMod(id, mod.toLong) == 0L
      val blk = java.lang.Math.floorMod(id, B.toLong).toInt
      // group key = incBlk * B + idxBlk: an increment vector fans out
      // across the idx dimension, an index vector across the inc one
      (0 until B).iterator.map { other =>
        val key = if (isInc) blk * B + other else other * B + blk
        (key, isInc, id, emb, nrm)
      }
    }
    crossScore(replicated, threshold, scored)
  }

  /** Incremental embedding near-dup screening — [[incrementalDedup]]'s
    * vector twin: the NEW embedding shard (vec_id % mod == 0) probes
    * the EXISTING index for exact cosine ≥ threshold matches; one row
    * per increment vector with is_dup / best_match (argmax cosine,
    * tie → lowest index id) / best_cosine, NULLs when clean.
    *
    * Scoring is [[embeddingCrossPairs]] — the block-decomposed exact
    * join restricted to increment×index groups BEFORE any dot product
    * runs (round 8 scored the full corpus and filtered after; at a 10%
    * increment that discarded ~81% of the flops). At production scale,
    * where the increment is ≪ the index, the same screen degenerates
    * to a broadcast of the increment against a linear index scan; the
    * block join is the shape that stays valid even when a backfill
    * makes the "increment" corpus-sized. */
  def embeddingIncremental(embeddings: DataFrame, threshold: Double = 0.4,
      mod: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val crossSide = embeddingCrossPairs(embeddings, threshold, mod)
    val w = Window.partitionBy(col("inc_id")).orderBy(col("cosine").desc, col("idx_id"))
    val best = crossSide.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("inc_id").as("vec_id"), col("idx_id").as("best_match"),
        col("cosine").as("best_cosine"))
    embeddings.select(col("vec_id")).filter(col("vec_id") % mod === 0)
      .join(best, Seq("vec_id"), "left")
      .withColumn("is_dup", col("best_match").isNotNull)
      .select(col("vec_id"), col("is_dup"), col("best_match"), col("best_cosine"))
  }

  /** Persisted embedding-index artifact — [[TextIndexSnapshot]]'s
    * vector twin: the index side's double vectors and L2 norms,
    * precomputed once so a daily increment run never re-normalizes
    * the 100 TB embedding index. Store with
    * `df.write.parquet(dir)`, reload with `spark.read.parquet` —
    * plain columns (id, emb, nrm), no custom format. Block assignment
    * is floorMod(id, B) — a pure function, nothing to persist. */
  def buildEmbeddingIndexSnapshot(indexEmbeddings: DataFrame): DataFrame =
    prepVecs(indexEmbeddings).toDF("id", "emb", "nrm")

  /** [[embeddingIncremental]] against a precomputed index artifact:
    * only the INCREMENT is normalized; the index side streams straight
    * off the snapshot parquet into its block groups. Same cross-side
    * block decomposition ([[crossScore]]), same rounding — output
    * equals [[embeddingIncremental]] over the union corpus with the
    * same side split (spec-pinned). */
  def embeddingIncrementalWithSnapshot(incrementEmbeddings: DataFrame,
      snapshot: DataFrame, threshold: Double = 0.4,
      nBlocks: Int = 16): DataFrame = {
    val spark = incrementEmbeddings.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = nBlocks
    val incRep = prepVecs(incrementEmbeddings).flatMap { case (id, emb, nrm) =>
      val blk = java.lang.Math.floorMod(id, B.toLong).toInt
      (0 until B).iterator.map(other => (blk * B + other, true, id, emb, nrm))
    }
    val idxRep = snapshot.as[(Long, Array[Double], Double)].flatMap {
      case (id, emb, nrm) =>
        val blk = java.lang.Math.floorMod(id, B.toLong).toInt
        (0 until B).iterator.map(other => (other * B + blk, false, id, emb, nrm))
    }
    val crossSide = crossScore(incRep.union(idxRep), threshold, None)
    val w = Window.partitionBy(col("inc_id")).orderBy(col("cosine").desc, col("idx_id"))
    val best = crossSide.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("inc_id").as("vec_id"), col("idx_id").as("best_match"),
        col("cosine").as("best_cosine"))
    incrementEmbeddings.select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .withColumn("is_dup", col("best_match").isNotNull)
      .select(col("vec_id"), col("is_dup"), col("best_match"), col("best_cosine"))
  }

  /** Persisted LSH embedding-index artifact — the SUB-QUADRATIC twin
    * of [[buildEmbeddingIndexSnapshot]]: alongside the (id, emb, nrm)
    * vector frame it stores the banded hyperplane signatures
    * (id, band, sig) so a daily increment probes the index with a hash
    * EQUI-JOIN on (band, sig) instead of the exact screen's
    * O(inc×idx) block-join flops. The hyperplane family
    * (graft_hyperplane_bands) is a pure splitmix64 function of
    * (band, row, dim) — appends are plain unions, with none of the
    * text snapshot's frozen-df-order subtlety, and signatures computed
    * from the raw float vectors equal those from the snapshot's
    * widened doubles (float→double widening is exact). */
  case class EmbeddingLshSnapshot(vectors: DataFrame, sigs: DataFrame,
      bands: Int, rowsPerBand: Int) {
    /** Write the artifact (vector + signature parquet dirs and the
      * banding the signatures were cut with). */
    def save(dir: String): Unit = {
      vectors.write.mode("overwrite").parquet(s"$dir/vectors")
      sigs.write.mode("overwrite").parquet(s"$dir/sigs")
      val spark = vectors.sparkSession
      import spark.implicits._
      Seq((bands, rowsPerBand)).toDF("bands", "rows_per_band")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  object EmbeddingLshSnapshot {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): EmbeddingLshSnapshot = {
      val meta = spark.read.parquet(s"$dir/meta").head()
      EmbeddingLshSnapshot(spark.read.parquet(s"$dir/vectors"),
        spark.read.parquet(s"$dir/sigs"), meta.getInt(0), meta.getInt(1))
    }
  }

  /** (id, band, sig) hyperplane band signatures for one corpus side. */
  private def lshSigRows(embeddings: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    reg(embeddings).select(col("vec_id").cast("long").as("id"),
        posexplode(expr(s"graft_hyperplane_bands(embedding, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")

  /** Build the [[EmbeddingLshSnapshot]] for an index corpus — one pass
    * over the 100 TB embedding side (normalize + band-sign), amortized
    * across every subsequent increment run. Same banding defaults as
    * [[embeddingPairsLsh]] (recall ≈1.0 at cosine 0.9; ~0.85 at this
    * corpus's weak-gap τ=0.4 — hence the screen's rows-only
    * approximate contract). */
  def buildEmbeddingLshSnapshot(indexEmbeddings: DataFrame,
      bands: Int = 20, rowsPerBand: Int = 5): EmbeddingLshSnapshot =
    EmbeddingLshSnapshot(buildEmbeddingIndexSnapshot(indexEmbeddings),
      lshSigRows(indexEmbeddings, bands, rowsPerBand), bands, rowsPerBand)

  /** Fold freshly screened vectors INTO the LSH index artifact — the
    * embedding daily cycle. Unlike the text twin there is NO pruning
    * decay: the hyperplane family is data-independent, so an appended
    * snapshot is bit-identical to a fresh rebuild of the union
    * (spec-pinned), and no periodic rebuild is ever required. vec_ids
    * must stay unique across appends (caller's contract). */
  def appendToEmbeddingLshSnapshot(snapshot: EmbeddingLshSnapshot,
      newEmbeddings: DataFrame): EmbeddingLshSnapshot =
    snapshot.copy(
      vectors = snapshot.vectors.unionByName(buildEmbeddingIndexSnapshot(newEmbeddings)),
      sigs = snapshot.sigs.unionByName(
        lshSigRows(newEmbeddings, snapshot.bands, snapshot.rowsPerBand)))

  /** Distinct (inc_id, idx_id) pairs sharing at least one band — the
    * candidate set the LSH snapshot screen verifies; exposed for the
    * recall audit's candidate-share metric. */
  private[graft] def embeddingLshSnapshotCandidates(incrementEmbeddings: DataFrame,
      snapshot: EmbeddingLshSnapshot): DataFrame =
    lshSigRows(incrementEmbeddings, snapshot.bands, snapshot.rowsPerBand)
      .select(col("id").as("inc_id"), col("band"), col("sig"))
      .join(snapshot.sigs.select(col("id").as("idx_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select(col("inc_id"), col("idx_id")).distinct()

  /** [[embeddingIncrementalWithSnapshot]]'s sub-quadratic variant: the
    * increment probes the persisted BAND SIGNATURES with a hash
    * equi-join, and only colliding pairs pay an exact-cosine verify —
    * candidate flops scale with collision mass, not inc×idx. Output
    * schema equals the exact screen's; every flagged dup is REAL
    * (verification is exact, precision 1 structurally) but a true dup
    * whose pair collides in no band is missed — the recall ≥ 0.8
    * rows-only contract RECALL_r*.json re-measures each round.
    *
    * Plan: increment-only signature scan; (band, sig) equi-join
    * against the signature parquet; two keyed vector joins restricted
    * to the candidates; per-increment argmax window. At 100 TB the
    * index-side joins are the bucketing candidates (bucket vectors
    * and sigs by id / (band, sig) at save time to make them
    * exchange-free). */
  def embeddingIncrementalWithLshSnapshot(incrementEmbeddings: DataFrame,
      snapshot: EmbeddingLshSnapshot, threshold: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = embeddingLshSnapshotCandidates(incrementEmbeddings, snapshot)
    val incVecs = prepVecs(incrementEmbeddings).toDF("id", "emb", "nrm")
    val scored = cand
      .join(incVecs.select(col("id").as("inc_id"), col("emb").as("ea"),
        col("nrm").as("na")), Seq("inc_id"))
      .join(snapshot.vectors.select(col("id").as("idx_id"), col("emb").as("eb"),
        col("nrm").as("nb")), Seq("idx_id"))
      .withColumn("cosine",
        round(expr("graft_dot(ea, eb)") / (col("na") * col("nb")) + lit(1e-9), 6))
      .filter(col("cosine") >= threshold)
      .select(col("inc_id"), col("idx_id"), col("cosine"))
    val w = Window.partitionBy(col("inc_id")).orderBy(col("cosine").desc, col("idx_id"))
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("inc_id").as("vec_id"), col("idx_id").as("best_match"),
        col("cosine").as("best_cosine"))
    incrementEmbeddings.select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .withColumn("is_dup", col("best_match").isNotNull)
      .select(col("vec_id"), col("is_dup"), col("best_match"), col("best_cosine"))
  }

  /** Banded hyperplane-LSH embedding near-dups — the sub-quadratic
    * scale path for production thresholds: `bands`×`rowsPerBand`
    * deterministic hyperplane sign bits; pairs sharing any band are
    * verified with the exact cosine (precision is therefore always 1).
    * Recall for a pair at angle θ is 1−(1−p^r)^b with p = 1−θ/π —
    * ≈1.0 at cosine 0.9 with r=5,b=20 while still pruning orthogonal
    * background pairs; at this test corpus's weak-gap τ=0.4 the same
    * banding measures pair recall 0.83–0.89 across the three SFs
    * (RECALL_r*.json), hence the approximate rows-only contract, like
    * q_ann_lsh. */
  def embeddingPairsLsh(embeddings: DataFrame, threshold: Double = 0.4,
      bands: Int = 20, rowsPerBand: Int = 5): DataFrame = {
    // splitmix64-hashed hyperplane family (graft_hyperplane_bands):
    // component(pj, i) deterministic in plane index pj and dimension i —
    // native single-loop signatures (graft.functions.HyperplaneBands)
    val sigs = reg(embeddings).select(col("vec_id"), col("embedding"),
        expr("sqrt(graft_dot(embedding, embedding))").as("nrm"),
        posexplode(expr(s"graft_hyperplane_bands(embedding, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
    val a = sigs.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("nrm").as("na"), col("band"), col("sig"))
    val b = sigs.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("nrm").as("nb"), col("band"), col("sig"))
    val dot = "graft_dot(va, vb)"
    // score at the collision site, THEN dedup multi-band collisions as
    // a scalar hash aggregate: every collision of a pair computes the
    // identical cosine, so min() is exact — and the dedup shuffle moves
    // (id, id, cosine) triples instead of embedding arrays (at corpus
    // scale the post-join dedup is the big exchange; d-dimensional
    // payloads there would multiply it by the vector width)
    a.join(b, Seq("band", "sig")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(expr(dot) / (col("na") * col("nb")) + lit(1e-9), 6))
      .groupBy(col("id_a"), col("id_b")).agg(min(col("cosine")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Distinct id-pairs sharing at least one LSH band — the candidate
    * set [[embeddingPairsLsh]] verifies, before the cosine filter;
    * exposed for the recall audit's candidate-share metric. */
  private[graft] def embeddingLshCandidates(embeddings: DataFrame,
      bands: Int = 20, rowsPerBand: Int = 5): DataFrame = {
    val sigs = reg(embeddings).select(col("vec_id"),
        posexplode(expr(s"graft_hyperplane_bands(embedding, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
    sigs.select(col("vec_id").as("id_a"), col("band"), col("sig"))
      .join(sigs.select(col("vec_id").as("id_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Duplicated-span removal bookkeeping — the exact-substring-dedup
    * step of a training corpus (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": cut every substring
    * that also occurs in another document), re-expressed over word
    * n-grams instead of suffix-array byte ranges: a word position is
    * DUPLICATE when its n-gram occurs in ≥ 2 distinct documents;
    * maximal runs of duplicate positions are spans covering words
    * [start, end+n−1]; overlapping or adjacent spans merge. Output per
    * doc: word count, merged span count, words removed (union of span
    * coverage), surviving share.
    *
    * Plan shape at 100 TB: positional n-gram hashes are a per-row
    * explode (no shuffle); the corpus df table is ONE keyed aggregation
    * on the hash (count-distinct-docs is map-side partial over
    * (h, doc_id) then a keyed count); the join back is hash-keyed; and
    * every window after it (run grouping, interval merge) partitions by
    * doc_id — a single exchange of the duplicate POSITIONS (not texts)
    * covers all three window passes plus the final per-doc aggregate.
    * Nothing all-pairs, nothing global: the suffix-array batch job of
    * the paper becomes three keyed shuffles. */
  def dupSpans(documents: DataFrame, n: Int = 4): DataFrame = {
    reg(documents)
    val toks = graft.text.TextFns.tokens("text")
    // positional n-gram hashes WITH multiplicity, index order
    val posHashes = s"CASE WHEN size($toks) >= $n THEN " +
      s"transform(sequence(0, size($toks) - $n), " +
      s"i -> graft_polyhash(concat_ws(' ', slice($toks, i + 1, $n)))) " +
      "ELSE cast(array() AS array<bigint>) END"
    val pos = documents.select(col("doc_id"),
      posexplode(expr(posHashes)).as(Seq("pos", "h")))
    // corpus document frequency per n-gram hash
    val dfreq = pos.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val dup = pos.join(dfreq.filter(col("df") >= 2), Seq("h"))
    // maximal runs of consecutive duplicate positions → word intervals
    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = dup
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(n - 1)).as("e"))
    // merge overlapping/adjacent word intervals (classic cummax sweep)
    val wIv = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val merged = runs
      .withColumn("pm", max(col("e")).over(wIv.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nf", when(col("pm").isNull || col("s") > col("pm") + 1, 1L).otherwise(0L))
      .withColumn("mg", sum(col("nf")).over(wIv.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("mg"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss") + 1).as("words_removed"))
    documents.select(col("doc_id"), expr(s"size($toks)").cast("long").as("n_words"))
      .join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("words_removed"), lit(0L)).as("words_removed"))
      .withColumn("keep_share",
        round((col("n_words") - col("words_removed")) /
          col("n_words").cast("double") + lit(1e-9), 6))
  }

  /** Candidate-generation evaluation: precision/recall of the MinHash
    * band pairs against the exact-Jaccard ground truth — the tuning
    * report behind any (bands × rows) sketch configuration decision
    * ([[minhashCalibration]] scores the pairs the bands DID surface;
    * this also counts the ones they missed). One row: band pairs,
    * exact pairs, hits, precision, recall.
    *
    * Scale: both pair frames are O(actual near-dups); one keyed
    * full-outer join on the pair key and a single global aggregate to
    * one row. */
  def bandsEval(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = jaccardPairs(documents, threshold)
    try {
      val exact = pairs
        .select(col("id_a"), col("id_b")).withColumn("in_exact", lit(1))
      // minhashBands' groupBy(id_a, id_b) already yields distinct pairs
      val bands = minhashBands(documents)
        .select(col("id_a"), col("id_b")).withColumn("in_band", lit(1))
      val out = exact.join(bands, Seq("id_a", "id_b"), "full_outer")
        .agg(sum(coalesce(col("in_band"), lit(0))).cast("long").as("n_band_pairs"),
          sum(coalesce(col("in_exact"), lit(0))).cast("long").as("n_exact_pairs"),
          sum(coalesce(col("in_band"), lit(0)) * coalesce(col("in_exact"), lit(0)))
            .cast("long").as("n_hits"))
        .select(col("n_band_pairs"), col("n_exact_pairs"), col("n_hits"),
          round(col("n_hits") / col("n_band_pairs").cast("double") + lit(1e-9), 6)
            .as("band_precision"),
          round(col("n_hits") / col("n_exact_pairs").cast("double") + lit(1e-9), 6)
            .as("band_recall"))
      // materialize before releasing the persisted pair frame
      out.localCheckpoint(true)
    } finally pairs.unpersist()
  }
}
