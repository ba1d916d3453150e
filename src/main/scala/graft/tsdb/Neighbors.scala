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

  /** The neighbor (donor) side of the ranking: with `onlyReal` set,
    * virtual stations (is_real = false — no measured companion data,
    * StationCanVirtualBase) are excluded as DONORS while every station
    * still appears as a probe — the reference's `only_real=True`
    * default on get_neighboor_stids (StationBases.py:2211, 2251). */
  private def donors(meta: DataFrame, onlyReal: Boolean): DataFrame =
    if (onlyReal) meta.filter(col("is_real")) else meta

  /** All station pairs with squared grid distance (exact integers) and
    * elevation difference. */
  private def pairs(meta: DataFrame, onlyReal: Boolean = false): DataFrame = {
    val a = meta.select(col("station_id"), col("x"), col("y"), col("elev"))
    val b = donors(meta, onlyReal).select(col("station_id").as("nb_id"),
      col("x").as("nb_x"), col("y").as("nb_y"), col("elev").as("nb_elev"))
    a.crossJoin(broadcast(b)).filter(col("station_id") =!= col("nb_id"))
      .withColumn("d2", (col("x") - col("nb_x")) * (col("x") - col("nb_x"))
        + (col("y") - col("nb_y")) * (col("y") - col("nb_y")))
  }

  /** k nearest stations by plain distance. Output:
    * station_id, rank, nb_id, dist (rounded 6). */
  def knnDist(meta: DataFrame, k: Int = NeighborK, onlyReal: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("d2"), col("nb_id"))
    pairs(meta, onlyReal)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(sqrt(col("d2")) + lit(1e-9), 6).as("dist"))
  }

  /** Grid-bucketed knn — the 100 TB path, EXACT for any data. Stations
    * hash to spatial cells of side `cellSize`; candidate pairs come
    * only from the 3×3 cell neighborhood, so the data movement is
    * O(9n) instead of the all-pairs O(n²) of the broadcast cross join.
    *
    * Exactness is SELF-VERIFIED, not assumed: any point within
    * `cellSize` of a station is inside its 3×3 ring (|Δx| ≤ c ⟹
    * |Δcell| ≤ 1), so a station whose k-th found candidate lies within
    * `cellSize` provably has its true k nearest among the candidates —
    * a missed point sits outside the ring and therefore strictly
    * farther than `cellSize`. Stations that fail the check (fewer than
    * k candidates, or k-th beyond `cellSize` — low-density corners)
    * fall back to the exact broadcast ranking; at realistic densities
    * that is a vanishing fraction, and in the worst case the operator
    * degrades gracefully to the brute cost instead of returning a
    * wrong ranking. */
  /** The knn result is O(#stations × k) — a dimension table. It is
    * consumed by every fill variant, the QC neighbor median and the
    * temperature fill of one session, so it is memoized + persisted per
    * (input plan, k, cellSize) exactly like the qc/filled kinds in
    * TsQueries (the reference likewise stores the neighbor ranking in
    * its meta tables rather than recomputing it per query).
    * semanticHash is only the lookup key — equality is confirmed with
    * sameResult() so a 32-bit collision can never return a wrong
    * neighbor map — and the memo is size-bounded with eviction
    * (continuous pipelines create a fresh meta plan per micro-batch). */
  private case class KnnEntry(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      df: DataFrame)
  private val memo = new java.util.LinkedHashMap[(org.apache.spark.sql.SparkSession, Int, Int, Long, Boolean), KnnEntry](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(org.apache.spark.sql.SparkSession, Int, Int, Long, Boolean), KnnEntry]): Boolean = {
      val evict = size() > 8
      if (evict) e.getValue.df.unpersist()
      evict
    }
  }

  def knnDistBucketed(meta: DataFrame, k: Int = NeighborK, cellSize: Double = 3.0,
      onlyReal: Boolean = false): DataFrame =
    memo.synchronized {
      val plan = meta.queryExecution.analyzed
      val key = (meta.sparkSession, plan.semanticHash(), k,
        java.lang.Double.doubleToLongBits(cellSize), onlyReal)
      val hit = Option(memo.get(key)).filter(_.plan.sameResult(plan))
      hit.map(_.df).getOrElse {
        val (df0, scratch) = knnDistBucketedUncached(meta, k, cellSize, onlyReal)
        val df = df0.persist()
        df.count() // eager: the O(n·k) frame caches, the scratch frees
        scratch.unpersist()
        // a semanticHash collision (key present, sameResult false) would
        // otherwise overwrite the displaced entry without releasing its
        // pinned O(n·k) cache — unpersist it before replacing
        Option(memo.get(key)).foreach(_.df.unpersist())
        memo.put(key, KnnEntry(plan, df))
        df
      }
    }

  /** Returns (result, scratch): `scratch` is the internally persisted
    * candidate ranking, released by the memoizing wrapper once the
    * result is materialized. */
  private def knnDistBucketedUncached(meta: DataFrame, k: Int, cellSize: Double,
      onlyReal: Boolean = false): (DataFrame, DataFrame) = {
    val cells = meta.select(col("station_id"), col("x"), col("y"),
      floor(col("x") / cellSize).as("cx"), floor(col("y") / cellSize).as("cy"))
    val donorCells = donors(meta, onlyReal).select(col("station_id"), col("x"), col("y"),
      floor(col("x") / cellSize).as("cx"), floor(col("y") / cellSize).as("cy"))
    // each station is replicated into its 9 surrounding cells on the
    // build side; probe side stays in its own cell
    val offsets = Seq(-1, 0, 1)
    val build = donorCells.select(col("station_id").as("nb_id"), col("x").as("nb_x"),
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
    // consumed twice (safety check + final output) within one
    // materialization — persist the tiny O(n·k) frame
    val ranked = pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"), col("d2"))
      .persist()
    val safety = ranked.groupBy(col("station_id")).agg(
      count(lit(1)).as("n_found"), max(col("d2")).as("max_d2"))
    val unsafeIds = safety
      .filter(col("n_found") < k || col("max_d2") > cellSize * cellSize)
      .select(col("station_id"))
      .unionByName( // stations with NO candidate at all never reach `ranked`
        meta.select(col("station_id"))
          .join(safety.select(col("station_id")), Seq("station_id"), "left_anti"))
    // common case: every station passed the self-check — return the
    // bucketed ranking directly instead of planning (and compiling) the
    // rescue join + anti-join union that would process zero rows (the
    // check itself is one cheap action over the persisted ranking)
    if (unsafeIds.isEmpty) {
      val out = ranked.select(col("station_id"), col("rank"), col("nb_id"),
        round(sqrt(col("d2")) + lit(1e-9), 6).as("dist"))
      return (out, ranked)
    }
    val unsafeMeta = meta.join(unsafeIds, Seq("station_id"), "left_semi")
    val rescued = {
      // deliberate bounded nested-loop: the station registry is
      // O(#stations) and broadcast everywhere else in the engine; only
      // the (normally vanishing) unsafe probe side replicates against
      // it. The rescue_* column names are the structural marker that
      // lets PlanGuardSpec distinguish this reviewed pattern from an
      // accidental cross join.
      val a = unsafeMeta.select(col("station_id"), col("x"), col("y"))
      val b = donors(meta, onlyReal).select(col("station_id").as("rescue_nb_id"),
        col("x").as("rescue_nb_x"), col("y").as("rescue_nb_y"))
      val bp = a.crossJoin(broadcast(b)).filter(col("station_id") =!= col("rescue_nb_id"))
        .withColumn("d2", (col("x") - col("rescue_nb_x")) * (col("x") - col("rescue_nb_x"))
          + (col("y") - col("rescue_nb_y")) * (col("y") - col("rescue_nb_y")))
      val wr = Window.partitionBy(col("station_id")).orderBy(col("d2"), col("rescue_nb_id"))
      bp.withColumn("rank", row_number().over(wr)).filter(col("rank") <= k)
        .select(col("station_id"), col("rank"), col("rescue_nb_id").as("nb_id"), col("d2"))
    }
    val out = ranked.join(unsafeIds, Seq("station_id"), "left_anti")
      .unionByName(rescued)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(sqrt(col("d2")) + lit(1e-9), 6).as("dist"))
    (out, ranked)
  }

  /** k nearest by LARSIM elevation-weighted distance
    * `d * (1 + (|Δelev|/P1)^P2)`, default P1=250, P2=1.5 — the
    * reference's `p_elev` override (StationBases.py:2196, 2919). */
  def knnElev(meta: DataFrame, k: Int = NeighborK, p1: Double = PElev1,
      p2: Double = PElev2, onlyReal: Boolean = false): DataFrame = {
    val wd = sqrt(col("d2")) * (lit(1.0) + pow(abs(col("elev") - col("nb_elev")) / lit(p1), lit(p2)))
    val w = Window.partitionBy(col("station_id")).orderBy(col("wdist"), col("nb_id"))
    pairs(meta, onlyReal)
      .withColumn("wdist", wd)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("station_id"), col("rank"), col("nb_id"),
        round(col("wdist") + lit(1e-9), 6).as("wdist"))
  }

  /** IDW-interpolated raster surface over the occupied spatial cells
    * (the map product a WeatherDB serves: a gridded field from point
    * stations): each cell center's value is the inverse-distance-
    * weighted mean of the stations in its 3×3 cell neighborhood,
    * w = 1/(d² + 1) (the +1 regularizer bounds the self-cell weight
    * and keeps the ratio engine-exact — no ε-distance branch).
    *
    * Plan: the knnDistBucketed cell trick — stations replicated into
    * their 9 neighbor cells (×9 explode of the O(#stations) registry),
    * ONE equi-join against the occupied-cell list, one keyed cell
    * aggregate. Never all-pairs; at any scale the cost is
    * O(9·#stations). */
  def idwGrid(meta: DataFrame, rawDaily: DataFrame,
      cell: Double = 4.0): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val pts = meta.select(col("station_id"), col("x"), col("y"))
      .join(ma, Seq("station_id"))
    val cells = pts.select(floor(col("x") / cell).as("cx"),
      floor(col("y") / cell).as("cy")).distinct()
    val repl = pts
      .withColumn("dx", explode(lit(Array(-1, 0, 1))))
      .withColumn("dy", explode(lit(Array(-1, 0, 1))))
      .select((floor(col("x") / cell) + col("dx")).as("cx"),
        (floor(col("y") / cell) + col("dy")).as("cy"),
        col("x"), col("y"), col("ma"))
    cells.join(repl, Seq("cx", "cy"))
      .withColumn("cxc", (col("cx") + 0.5) * cell)
      .withColumn("cyc", (col("cy") + 0.5) * cell)
      .withColumn("d2", (col("x") - col("cxc")) * (col("x") - col("cxc"))
        + (col("y") - col("cyc")) * (col("y") - col("cyc")))
      .withColumn("w", lit(1.0) / (col("d2") + lit(1.0)))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n_contrib"),
        round(sum(col("w") * col("ma")) / sum(col("w")) + lit(1e-9), 4)
          .as("idw_value"))
  }

  /** Multi-resolution spatial cell rollup of the station registry
    * (the quadkey/geohash density pyramid every map tile server and
    * the knnDistBucketed cell join are built on): per zoom cell size
    * the station count, mean elevation and mean period value.
    *
    * Plan: ×|zooms| explode of the O(#stations) registry, one keyed
    * aggregate to the cell pyramid — integer cell keys, exact counts,
    * 4-dp means. */
  def geoCells(meta: DataFrame, rawDaily: DataFrame,
      zooms: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    meta.select(col("station_id"), col("x"), col("y"), col("elev"))
      .join(ma, Seq("station_id"), "left")
      .withColumn("cell", explode(lit(zooms.toArray)))
      .withColumn("cell_x", floor(col("x") / col("cell")))
      .withColumn("cell_y", floor(col("y") / col("cell")))
      .groupBy(col("cell"), col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n_stations"),
        round(avg(col("elev")) + lit(1e-9), 4).as("mean_elev"),
        round(avg(col("ma")) + lit(1e-9), 4).as("mean_ma"))
  }
}
