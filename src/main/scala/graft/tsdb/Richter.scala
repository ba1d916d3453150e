package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Constants._

/** Richter (1995) precipitation undercatch correction.
  *
  * Reference: StationP.py:487-653 richter_correct — classify each day's
  * precipitation by temperature and season, then add
  * `delta = b(exposition, typ) * p^e(typ)` to wet intervals.
  * Exposition class from the horizon angle (StationP.py:33-48, 265-272);
  * correction parameters from db/fixtures/RichterParameters.json.
  */
object Richter {

  /** Horizon angle → Richter exposition class. */
  def richterClass(meta: DataFrame): DataFrame = {
    val cls = RichterClasses.foldLeft(lit(null).cast("string")) {
      case (acc, (name, lo, hi)) =>
        when(col("horizon") >= lo && col("horizon") < hi, lit(name)).otherwise(acc)
    }
    meta.select(col("station_id"), col("horizon"), cls.as("richter_class"))
  }

  /** Richter parameter lookup as a tiny broadcast frame:
    * (precipitation_typ, e, b per class). */
  def params(spark: SparkSession): DataFrame = {
    import spark.implicits._
    RichterParams.toSeq.map { case (typ, (e, bNo, bLittle, bProt, bHeavy)) =>
      (typ, e, bNo, bLittle, bProt, bHeavy)
    }.toDF("precipitation_typ", "e", "b_no_protection", "b_little_protection",
      "b_protected", "b_heavy_protection")
  }

  /** Precipitation type of a day from its temperature (StationP.py:
    * 571-580) — shared by the daily and sub-daily corrections. */
  private def precipTyp = {
    val isWinter = month(col("day")).isin(1, 2, 3, 10, 11, 12)
    when(col("t") >= RainTemp && isWinter, lit("precip_winter"))
      .when(col("t") >= RainTemp && !isWinter, lit("precip_summer"))
      .when(col("t") <= SnowTemp, lit("snow"))
      .when(col("t").isNull, lit(null).cast("string"))
      .otherwise(lit("mix"))
  }

  /** Exposition-class coefficient pick (b_{class}). */
  private def bCoef =
    when(col("richter_class") === "no-protection", col("b_no_protection"))
      .when(col("richter_class") === "little-protection", col("b_little_protection"))
      .when(col("richter_class") === "protected", col("b_protected"))
      .otherwise(col("b_heavy_protection"))

  /** Correct the filled series: daily type from the temperature series
    * (winter months 1,2,3,10,11,12), delta added where filled > 0. */
  def correct(spark: SparkSession, filledSeries: DataFrame, tempSeries: DataFrame,
      meta: DataFrame): DataFrame = {
    val typ = precipTyp
    val b = bCoef
    val withTyp = filledSeries
      .join(tempSeries.select(col("station_id"), col("day"), col("t")), Seq("station_id", "day"), "left")
      .withColumn("precipitation_typ", typ)
      .join(broadcast(richterClass(meta).select(col("station_id"), col("richter_class"))), Seq("station_id"))
      .join(broadcast(params(spark)), Seq("precipitation_typ"), "left")
    val delta = when(col("precipitation_typ").isNull, lit(0.0))
      .otherwise(round(b * pow(col("filled"), col("e")) + lit(1e-9), 6))
    withTyp
      .withColumn("corr",
        when(col("filled") > 0, round(col("filled") + delta + lit(1e-9), 3)).otherwise(col("filled")))
      .select(col("station_id"), col("day"), col("filled"), col("t"),
        col("precipitation_typ"), col("corr"))
  }

  /** Sub-daily Richter correction — the reference's actual resolution
    * (its 10-min base interval; ours is hourly): the daily delta is
    * integer-scaled and spread over the day's wet intervals,
    * `delta_scaled = round(b * p_d^e * decimals / count_n)` with
    * `count_n = count(intervals with filled > 0)`, then each wet
    * interval gets `corr = value + delta_scaled / decimals`
    * (StationP.py:553-612: sql_p_daily count_n filter, sql_delta_n,
    * sql_new_corr).
    *
    * Scale: one daily aggregation of the fine series (partial,
    * map-side combined), two broadcast dimension joins, one keyed
    * re-join of the tiny per-day delta frame back to the fine series —
    * shuffles only on (station_id, day). */
  def correctHourly(spark: SparkSession, hourlySeries: DataFrame, tempSeries: DataFrame,
      meta: DataFrame): DataFrame = {
    val daily = hourlySeries
      .groupBy(col("station_id"), to_date(col("hour")).as("day"))
      .agg(round(sum(col("raw")) + lit(1e-9), 3).as("p_d"),
        count(when(col("raw") > 0, lit(1))).as("count_n"))
    val deltas = daily
      .join(tempSeries.select(col("station_id"), col("day"), col("t")), Seq("station_id", "day"), "left")
      .withColumn("precipitation_typ", precipTyp)
      .join(broadcast(richterClass(meta).select(col("station_id"), col("richter_class"))), Seq("station_id"))
      .join(broadcast(params(spark)), Seq("precipitation_typ"), "left")
      .withColumn("delta_scaled",
        when(col("count_n") > 0 && col("precipitation_typ").isNotNull,
          round(bCoef * pow(col("p_d"), col("e")) * lit(PDecimals) / col("count_n") + lit(1e-9), 0))
          .otherwise(lit(0.0)).cast("long"))
      .select(col("station_id"), col("day"), col("delta_scaled"))
    hourlySeries
      .withColumn("day", to_date(col("hour")))
      .join(deltas, Seq("station_id", "day"), "left")
      .withColumn("corr",
        when(col("raw") > 0,
          round(col("raw") + col("delta_scaled") / lit(PDecimals.toDouble) + lit(1e-9), 3))
          .otherwise(col("raw")))
      .select(col("station_id"), col("hour"), col("raw"), col("delta_scaled"), col("corr"))
  }
}
