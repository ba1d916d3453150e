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

  /** Per-vector projection onto the dominant principal direction
    * after `iters` deterministic power-iteration rounds. */
  def powerProjection(embeddings: DataFrame, iters: Int = 2): DataFrame = {
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
    centered.crossJoin(broadcast(v))
      .select(col("vec_id"), expr("round(graft_dot(c, v) + 1e-9, 6)").as("proj"))
  }
}
