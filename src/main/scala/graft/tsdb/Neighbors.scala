package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Constants._

/** Nearest-neighbor station discovery.
  *
  * Reference: StationBases.py:2211 `get_neighboor_stids` — ORDER BY
  * ST_DISTANCE(geometry_utm, …) optionally multiplied by the LARSIM
  * elevation weight `(1 + (|Δh|/P1)^P2)` (StationBases.py:2196).
  *
  * Scale: the station registry is O(#stations) — tiny relative to the
  * series data — so the self-join is a broadcast cross join ranked with
  * a per-station window. At millions of stations this would switch to a
  * grid-bucketed spatial join (join on neighboring cells only); the
  * output contract (station_id, rank, nb_id, dist) is unchanged.
  * Ranking ties are broken on exact integer squared distance, then
  * nb_id, so results are fully deterministic across engines.
  */
object Neighbors {

  /** All station pairs with squared grid distance (exact integers) and
    * elevation difference. */
  private def pairs(meta: DataFrame): DataFrame = {
    val a = meta.select(col("station_id"), col("x"), col("y"), col("elev"))
    val b = a.select(col("station_id").as("nb_id"), col("x").as("nb_x"),
      col("y").as("nb_y"), col("elev").as("nb_elev"))
    a.crossJoin(broadcast(b)).filter(col("station_id") =!= col("nb_id"))
      .withColumn("d2", (col("x") - col("nb_x")) * (col("x") - col("nb_x"))
        + (col("y") - col("nb_y")) * (col("y") - col("nb_y")))
  }

  /** k nearest stations by plain distance. Output:
    * station_id, rank, nb_id, dist (rounded 6). */
  def knnDist(meta: DataFrame, k: Int = NeighborK): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("d2"), col("nb_id"))
    pairs(meta)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(sqrt(col("d2")) + lit(1e-9), 6).as("dist"))
  }

  /** Grid-bucketed knn — the 100 TB path. Stations hash to spatial
    * cells of side `cellSize`; candidate pairs come only from the 3×3
    * cell neighborhood, so the data movement is O(9n) instead of the
    * all-pairs O(n²) of the broadcast cross join.
    *
    * Exact whenever every station's k-th neighbor lies within
    * `cellSize` (the 3×3 ring covers at least that radius); pick the
    * cell size from the station density (here: default 3 covers the
    * synthetic grid's 5-nn radius with margin — asserted equal to the
    * brute-force ranking in NeighborsSpec). */
  def knnDistBucketed(meta: DataFrame, k: Int = NeighborK, cellSize: Double = 3.0): DataFrame = {
    val cells = meta.select(col("station_id"), col("x"), col("y"),
      floor(col("x") / cellSize).as("cx"), floor(col("y") / cellSize).as("cy"))
    // each station is replicated into its 9 surrounding cells on the
    // build side; probe side stays in its own cell
    val offsets = Seq(-1, 0, 1)
    val build = cells.select(col("station_id").as("nb_id"), col("x").as("nb_x"),
        col("y").as("nb_y"), col("cx"), col("cy"))
      .withColumn("off", explode(array(offsets.flatMap(dx =>
        offsets.map(dy => struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
      .select(col("nb_id"), col("nb_x"), col("nb_y"),
        (col("cx") + col("off.dx")).as("cx"), (col("cy") + col("off.dy")).as("cy"))
    val pairs = cells.join(build, Seq("cx", "cy"))
      .filter(col("station_id") =!= col("nb_id"))
      .withColumn("d2", (col("x") - col("nb_x")) * (col("x") - col("nb_x"))
        + (col("y") - col("nb_y")) * (col("y") - col("nb_y")))
    val w = Window.partitionBy(col("station_id")).orderBy(col("d2"), col("nb_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(sqrt(col("d2")) + lit(1e-9), 6).as("dist"))
  }

  /** k nearest by LARSIM elevation-weighted distance
    * `d * (1 + (|Δelev|/P1)^P2)` with P1=250, P2=1.5. */
  def knnElev(meta: DataFrame, k: Int = NeighborK): DataFrame = {
    val wd = sqrt(col("d2")) * (lit(1.0) + pow(abs(col("elev") - col("nb_elev")) / lit(PElev1), lit(PElev2)))
    val w = Window.partitionBy(col("station_id")).orderBy(col("wdist"), col("nb_id"))
    pairs(meta)
      .withColumn("wdist", wd)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(col("wdist") + lit(1e-9), 6).as("wdist"))
  }
}
