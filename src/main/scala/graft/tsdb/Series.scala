package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Constants._

/** Builders for the station-timeseries model on the `events` table.
  *
  * Reference mapping: one tall DataFrame `(station_id, day, raw, n_obs)`
  * replaces the reference's per-station PostgreSQL tables
  * `timeseries."{stid}_{para}"` (StationBases.py:477). The dense daily
  * grid mirrors `_expand_timeserie_to_period` (StationBases.py:486):
  * every station carries every day of the global period, missing
  * measurements are NULL.
  *
  * Scale: the grid is `stations × days`; both factors come from tiny
  * aggregates that stay in the plan (cross join with a broadcast 1-row
  * bounds frame — no driver collect). Downstream window operators
  * partition by station_id, so at 100 TB each station's series is
  * processed partition-locally after one hash shuffle.
  */
object Series {

  /** Global period bounds (single row: d0, d1). */
  def bounds(events: DataFrame): DataFrame =
    events.agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))

  /** Distinct station ids. */
  def stations(events: DataFrame): DataFrame =
    events.select(col("user_id").cast("long").as("station_id")).distinct()

  /** Dense (station_id, day) grid over the global period. */
  def grid(events: DataFrame): DataFrame =
    stations(events).crossJoin(broadcast(bounds(events)))
      .select(col("station_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))

  /** Daily raw series on the dense grid: raw = round(sum(value) + lit(1e-9), 3)
    * (NULL where no events), n_obs = events contributing to the day. */
  def dailyRaw(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id").cast("long").as("station_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) + lit(1e-9), 3).as("raw"), count(col("value")).as("n_obs"))
    grid(events).join(daily, Seq("station_id", "day"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
  }

  /** Daily temperature-proxy series: avg of 'view' event values − 50,
    * on the dense grid (stands in for the daily T station that the
    * Richter correction joins, StationP.py:582). */
  def dailyTemp(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").cast("long").as("station_id"), to_date(col("ts")).as("day"))
      .agg((round(avg(col("value")) + lit(1e-9), 6) - lit(TempShift)).as("t"))
    grid(events).join(daily, Seq("station_id", "day"), "left")
  }

  /** Dense (station_id, hour) grid over the global period — the finer
    * analog of the reference's 10-min base interval. */
  def hourlyGrid(events: DataFrame): DataFrame = {
    val b = events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    stations(events).crossJoin(broadcast(b))
      .select(col("station_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
  }

  /** Hourly raw series on the dense grid (sum of event values in the
    * hour, NULL where no events). */
  def hourlyRaw(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id").cast("long").as("station_id"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(round(sum(col("value")) + lit(1e-9), 3).as("raw"))
    hourlyGrid(events).join(hourly, Seq("station_id", "hour"), "left")
  }

  /** Daily temperature mean + extrema on ONE dense grid (the
    * reference's T tables' raw / raw_min / raw_max columns,
    * StationT.py:70-88, in temperature units under the −TempShift
    * proxy of [[dailyTemp]]): a single events aggregate feeds every
    * temperature consumer — one scan, one grid join, instead of one
    * per statistic. */
  def dailyTempStats(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").cast("long").as("station_id"), to_date(col("ts")).as("day"))
      .agg((round(avg(col("value")) + lit(1e-9), 6) - lit(TempShift)).as("t"),
        (round(min(col("value")) + lit(1e-9), 3) - lit(TempShift)).as("t_min"),
        (round(max(col("value")) + lit(1e-9), 3) - lit(TempShift)).as("t_max"))
    grid(events).join(daily, Seq("station_id", "day"), "left")
  }

  /** Daily min/max companion series (the reference's raw_min/raw_max
    * columns of the temperature tables, StationT.py:70-88). */
  def dailyMinMax(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id").cast("long").as("station_id"), to_date(col("ts")).as("day"))
      .agg(round(min(col("value")) + lit(1e-9), 3).as("raw_min"), round(max(col("value")) + lit(1e-9), 3).as("raw_max"))
    grid(events).join(daily, Seq("station_id", "day"), "left")
  }

  /** Daily reference series excluding 'error' events — the independent
    * daily measurement of the daily-compare QC rule (StationP.py:103). */
  def dailyRef(events: DataFrame): DataFrame =
    events.filter(col("event_type") =!= "error")
      .groupBy(col("user_id").cast("long").as("station_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) + lit(1e-9), 3).as("ref"))

  /** Derived station registry (stands in for meta_{para}): grid
    * coordinates, elevation, horizon angle from pure id arithmetic,
    * plus observed period bounds and counts (meta raw_from/raw_until,
    * models.py:91-96). */
  def stationMeta(events: DataFrame): DataFrame = {
    val obs = events
      .groupBy(col("user_id").cast("long").as("station_id"))
      .agg(min(to_date(col("ts"))).as("raw_from"),
        max(to_date(col("ts"))).as("raw_until"),
        count(lit(1)).as("n_obs"),
        count(when(col("event_type") === "view", lit(1))).as("n_view"))
    obs.select(col("station_id"),
      (col("station_id") % GridW).cast("double").as("x"),
      expr(s"station_id div $GridW").cast("double").as("y"),
      ((col("station_id") * ElevMul) % ElevMod).cast("double").as("elev"),
      ((col("station_id") * HorizonMul) % HorizonMod).cast("double").as("horizon"),
      col("raw_from"), col("raw_until"), col("n_obs"),
      // virtual-station flag (StationCanVirtualBase, StationBases.py:
      // 683-771): a station whose temperature companion has no real
      // observations exists only virtually for the T parameter — its
      // T series is neighbor-filled, never measured
      (col("n_view") > 0).as("is_real"))
  }

  /** Per-station multi-annual mean of a series column (the
    * station_ma_timeserie analog, StationBases.py:916): mean over
    * non-NULL days, rounded to 6 decimals on both engines so the
    * regionalization coefficients are bit-identical. */
  def maMean(series: DataFrame, valueCol: String): DataFrame =
    series.groupBy(col("station_id"))
      .agg(round(avg(col(valueCol)) + lit(1e-9), 6).as("ma"))

  /** Deterministic multi-annual raster values per station
    * (station_ma_raster analog): precipitation-like and
    * temperature-like targets from pure arithmetic. */
  def raster(events: DataFrame): DataFrame =
    stations(events).select(col("station_id"),
      (lit(RasterPBase) + ((col("station_id") * RasterPMulA) % RasterPModA) * RasterPScale).as("raster_p"),
      (lit(RasterTBase) + ((col("station_id") * RasterTMulA) % RasterTModA) * RasterTScale).as("raster_t"))
}
