package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of the embedding set by power iteration —
  * the embedding-analytics primitive behind whitening, anisotropy
  * diagnosis and spectral outlier pruning in curation pipelines.
  * Made fully deterministic so the DuckDB oracle can iterate to
  * bit-identical vectors (the repo-wide strategy, SURVEY §6):
  *
  *  - mean vector quantized per dimension to 6 decimals;
  *  - a content-free start vector `v0 = 1/√d · 1` (no RNG);
  *  - a FIXED number of iterations (no convergence float compare);
  *  - the re-estimated direction `w_j = Σ_i (c_i·v) c_ij` quantized
  *    per dimension BEFORE normalization, so the order-dependent
  *    partial-sum tail never reaches the next round — the norm is an
  *    index-order fold (`graft_dot`) over already-quantized numbers,
  *    identical on both engines.
  *
  * Scale shape: per round, ONE broadcast of the d-element direction
  * and one keyed (dim) aggregation with map-side combine down to d
  * rows — the vectors are scanned, never shuffled, and nothing is
  * all-pairs. The centered frame is recomputed per round (a cheap
  * map over the scan); a long iteration schedule would persist it.
  */
object Pca {

  /** Shared pipeline: the centered frame `(vec_id, c)` and the 1-row
    * dominant-direction frame `(v)` after `iters` deterministic
    * power-iteration rounds. */
  private def centeredAndDirection(embeddings: DataFrame, iters: Int)
      : (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val vecs = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("emb"))

    // per-dimension mean, quantized; assembled into one broadcast row
    val mvec = vecs.select(posexplode(col("emb")))
      .groupBy(col("pos")).agg(round(avg(col("col")) + lit(1e-9), 6).as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("mvec"))
    val centered = vecs.crossJoin(broadcast(mvec))
      .select(col("vec_id"), expr("zip_with(emb, mvec, (a, b) -> a - b)").as("c"))

    var v = mvec.select(
      expr("transform(mvec, x -> 1.0D / sqrt(cast(size(mvec) AS double)))").as("v"))
    for (_ <- 1 to iters) {
      val proj = centered.crossJoin(broadcast(v))
        .select(col("vec_id"), col("c"), expr("graft_dot(c, v)").as("p"))
      val w = proj.select(posexplode(expr("transform(c, x -> x * p)")))
        .groupBy(col("pos")).agg(round(sum(col("col")) + lit(1e-9), 6).as("wv"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, wv))), s -> s.wv)")
          .as("w"))
      v = w.select(
        expr("transform(w, x -> round(x / sqrt(graft_dot(w, w)) + 1e-9, 6))").as("v"))
    }
    (centered, v)
  }

  /** Per-vector projection onto the dominant principal direction
    * after `iters` deterministic power-iteration rounds. */
  def powerProjection(embeddings: DataFrame, iters: Int = 2): DataFrame = {
    val (centered, v) = centeredAndDirection(embeddings, iters)
    centered.crossJoin(broadcast(v))
      .select(col("vec_id"), expr("round(graft_dot(c, v) + 1e-9, 6)").as("proj"))
  }

  /** All-but-the-top whitening report (Mu & Viswanath 2018,
    * arXiv:1702.01417): embedding sets are anisotropic — a dominant
    * direction carries a large share of every vector's energy, and
    * removing it measurably improves cosine-similarity tasks. Per
    * vector: the projection on the top direction, the centered norm,
    * the residual norm after subtracting the projection, and the
    * energy share that removal dropped (high-share vectors are the
    * ones the common direction dominated).
    *
    * The residual uses the ROUNDED projection and the share uses the
    * ROUNDED norms, so every cross-engine float seam sits on already-
    * quantized inputs (SURVEY §6). Plan: the power-iteration rounds as
    * above, then ONE stateless scan with the d-vector broadcast —
    * per-vector arithmetic never shuffles. */
  def whitenReport(embeddings: DataFrame, iters: Int = 2): DataFrame = {
    val (centered, v) = centeredAndDirection(embeddings, iters)
    centered.crossJoin(broadcast(v))
      .withColumn("proj", expr("round(graft_dot(c, v) + 1e-9, 6)"))
      .withColumn("r", expr("zip_with(c, v, (a, b) -> a - proj * b)"))
      .withColumn("c_norm", expr("round(sqrt(graft_dot(c, c)) + 1e-9, 6)"))
      .withColumn("resid_norm", expr("round(sqrt(graft_dot(r, r)) + 1e-9, 6)"))
      .withColumn("removed_share", expr(
        "CASE WHEN c_norm > 0 THEN round(1.0D - (resid_norm * resid_norm) / " +
          "(c_norm * c_norm) + 1e-9, 6) ELSE 0.0D END"))
      .select(col("vec_id"), col("proj"), col("c_norm"), col("resid_norm"),
        col("removed_share"))
  }
}
