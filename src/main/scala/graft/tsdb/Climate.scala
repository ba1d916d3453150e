package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic climate / hydrology indices over the daily station series —
  * the analysis layer a WeatherDB user runs on top of the qc/fill
  * pipeline (ETCCDI climate-change indices; Weibull 1939 plotting
  * positions; standard HVAC degree days). All partition-local per
  * station (and year/month), so every index inherits the series
  * table's station partitioning with no extra shuffle beyond its own
  * keyed aggregate.
  */
object Climate {

  /** Consecutive-dry-day spells per station and calendar year (the
    * ETCCDI "CDD" index shape): a day is dry when its daily sum is
    * below `dryThresh` (a NULL day — no observation — counts dry, as
    * a precipitation gauge that recorded nothing would). Output: per
    * (station, year) the longest dry run, dry-day count and grid
    * size. Runs are cut at year boundaries (the per-year index
    * definition).
    *
    * Plan: gaps-and-islands — run key = day-ordinal minus the dry
    * row_number (constant within a consecutive dry run), ONE window
    * over (station, year) then two keyed aggregates; everything
    * partition-local per station. */
  def drySpells(rawDaily: DataFrame, dryThresh: Double = 25.0): DataFrame = {
    val base = rawDaily
      .withColumn("yr", year(col("day")))
      .withColumn("dry", coalesce(col("raw"), lit(0.0)) < dryThresh)
    val w = Window.partitionBy(col("station_id"), col("yr")).orderBy(col("day"))
    val runs = base.filter(col("dry"))
      .withColumn("grp",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          - row_number().over(w))
      .groupBy(col("station_id"), col("yr"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("station_id"), col("yr"))
      .agg(max(col("run_len")).as("max_dry_run"), sum(col("run_len")).as("n_dry"))
    base.groupBy(col("station_id"), col("yr"))
      .agg(count(lit(1)).as("n_days"))
      .join(runs, Seq("station_id", "yr"), "left")
      .select(col("station_id"), col("yr"), col("n_days"),
        coalesce(col("n_dry"), lit(0L)).as("n_dry"),
        coalesce(col("max_dry_run"), lit(0L)).as("max_dry_run"))
  }

  /** Monthly heating / cooling degree days from the daily temperature
    * series: `hdd = Σ max(0, base − t)`, `cdd = Σ max(0, t − base)`
    * over days WITH a temperature observation (NULL days contribute
    * nothing, and are reported as the month's missing count). One
    * map-combinable keyed aggregate per (station, month). */
  def degreeDays(tempDaily: DataFrame, base: Double = 18.0): DataFrame =
    tempDaily
      .withColumn("month", date_trunc("month", col("day")).cast("date"))
      .groupBy(col("station_id"), col("month"))
      .agg(
        round(sum(when(col("t").isNotNull,
          greatest(lit(0.0), lit(base) - col("t"))).otherwise(lit(0.0)))
          + lit(1e-9), 3).as("hdd"),
        round(sum(when(col("t").isNotNull,
          greatest(lit(0.0), col("t") - lit(base))).otherwise(lit(0.0)))
          + lit(1e-9), 3).as("cdd"),
        count(col("t")).as("n_obs"),
        sum(when(col("t").isNull, 1L).otherwise(0L)).as("n_missing"))

  /** Empirical return periods of the annual precipitation maxima by
    * Weibull plotting position (the hydrology design-storm staple):
    * per station the yearly maxima rank descending and
    * `T = (n + 1) / m` years, exceedance probability `m / (n + 1)`.
    * Years without any observation drop out (their max is NULL).
    *
    * Plan: one keyed aggregate to (station, year) maxima — ≤ #years
    * rows per station — then a per-station window over that tiny
    * frame; nothing day-count-sized is ranked. */
  def returnPeriods(rawDaily: DataFrame): DataFrame = {
    val annMax = rawDaily
      .groupBy(col("station_id"), year(col("day")).as("yr"))
      .agg(max(col("raw")).as("annual_max"))
      .filter(col("annual_max").isNotNull)
    val w = Window.partitionBy(col("station_id"))
    annMax
      .withColumn("m", row_number().over(
        w.orderBy(col("annual_max").desc, col("yr"))))
      .withColumn("n_years", count(lit(1)).over(w))
      .withColumn("return_period",
        round((col("n_years") + 1) / col("m").cast("double") + lit(1e-9), 6))
      .withColumn("exc_prob",
        round(col("m") / (col("n_years") + lit(1)).cast("double") + lit(1e-9), 6))
      .select(col("station_id"), col("yr"), col("annual_max"), col("m"),
        col("n_years"), col("return_period"), col("exc_prob"))
  }
}
