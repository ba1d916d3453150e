package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (per-dimension, int8) embedding quantization — the storage
  * layout ANN systems (IVF/PQ pipelines, FAISS `SQ8`) use to keep
  * 100 TB of vectors in memory: each dimension maps linearly to a
  * 0..255 code from its corpus [min, max]; reconstruction error is the
  * quality signal that decides whether SQ8 is safe for a given corpus.
  *
  * Scale shape: one posexplode + (dim → min/max) hash aggregate — 64
  * cells per executor after map-side combine, network carries the
  * per-dimension stats, not the vectors — then a broadcast of the
  * single-row stats frame and one embarrassingly parallel scan that
  * scores every vector partition-locally. No shuffle of the vector
  * table at any point.
  *
  * Determinism: codes and errors are pure double arithmetic in fixed
  * index order (left-fold over the dimension sequence, matching the
  * DuckDB oracle's list_reduce over an ORDER BY i list); min/max are
  * exact, so the quantization grid is bit-identical on both engines.
  */
object Quantize {

  /** Per-vector reconstruction-error report of int8 scalar
    * quantization: (vec_id, n_dims, rmse, max_abs_err). */
  def sq8Report(embeddings: DataFrame): DataFrame = {
    // per-dimension corpus bounds, assembled into position-ordered arrays
    val dim = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("lo"), max(col("v").cast("double")).as("hi"))
    val stats = dim
      .agg(sort_array(collect_list(struct(col("pos"), col("lo"), col("hi")))).as("s"))
      .select(expr("transform(s, x -> x.lo)").as("lo_arr"),
        expr("transform(s, x -> x.hi)").as("hi_arr"))
    // scale_i = (hi-lo)/255; code = round((v-lo)/scale); err = v - (lo + code*scale)
    val errExpr =
      """transform(sequence(0, size(embedding) - 1), i ->
           CASE WHEN hi_arr[i] = lo_arr[i] THEN cast(0.0 as double)
                ELSE cast(embedding[i] as double) - (lo_arr[i] +
                  round((cast(embedding[i] as double) - lo_arr[i])
                        / ((hi_arr[i] - lo_arr[i]) / cast(255.0 as double)) + 1e-9, 0)
                  * ((hi_arr[i] - lo_arr[i]) / cast(255.0 as double)))
           END)"""
    embeddings.crossJoin(broadcast(stats))
      .withColumn("errs", expr(errExpr))
      .select(col("vec_id").cast("long").as("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(sqrt(expr("aggregate(errs, cast(0.0 as double), (a, x) -> a + x * x)")
          / size(col("embedding"))) + lit(1e-9), 6).as("rmse"),
        round(expr("array_max(transform(errs, x -> abs(x)))") + lit(1e-9), 6)
          .as("max_abs_err"))
  }
}
