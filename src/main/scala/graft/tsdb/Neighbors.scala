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
        round(sqrt(col("d2")), 6).as("dist"))
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
        round(col("wdist"), 6).as("wdist"))
  }
}
