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

  /** Correct the filled series: daily type from the temperature series
    * (winter months 1,2,3,10,11,12), delta added where filled > 0. */
  def correct(spark: SparkSession, filledSeries: DataFrame, tempSeries: DataFrame,
      meta: DataFrame): DataFrame = {
    val isWinter = month(col("day")).isin(1, 2, 3, 10, 11, 12)
    val typ = when(col("t") >= RainTemp && isWinter, lit("precip_winter"))
      .when(col("t") >= RainTemp && !isWinter, lit("precip_summer"))
      .when(col("t") <= SnowTemp, lit("snow"))
      .when(col("t").isNull, lit(null).cast("string"))
      .otherwise(lit("mix"))
    val b = when(col("richter_class") === "no-protection", col("b_no_protection"))
      .when(col("richter_class") === "little-protection", col("b_little_protection"))
      .when(col("richter_class") === "protected", col("b_protected"))
      .otherwise(col("b_heavy_protection"))
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
}
