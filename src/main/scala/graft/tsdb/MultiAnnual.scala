package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Constants._

/** Multi-annual statistics, quotients and series adjustment.
  *
  * Reference: update_ma_timeseries (StationBases.py:916),
  * get_quotient (db/queries/get_quotient.py),
  * StationKindQuotientView / StationMATimeserieRasterQuotientView
  * (db/views.py:78-164), get_adj (StationBases.py get_adj +
  * StationET.py:102, StationT.py:152).
  *
  * All outputs are O(#stations) aggregates of the tall series — single
  * hash aggregation with map-side partials, then broadcast back when
  * joined against the series (adjustment).
  */
object MultiAnnual {

  /** Long-format MA means per station and kind (station_ma_timeserie
    * analog): kind ∈ {raw, qc, filled}. */
  def maTimeseries(filledSeries: DataFrame): DataFrame = {
    val agg = filledSeries.groupBy(col("station_id")).agg(
      round(avg(col("raw")) + lit(1e-9), 6).as("raw"),
      round(avg(col("qc")) + lit(1e-9), 6).as("qc"),
      round(avg(col("filled")) + lit(1e-9), 6).as("filled"))
    agg.select(col("station_id"),
        expr("stack(3, 'raw', raw, 'qc', qc, 'filled', filled) AS (kind, value)"))
  }

  /** MA means per station, kind AND term — the reference's `_ma_terms`
    * (StationBases.py:931, StationPBase `_ma_terms=["wihy","suhy"]`,
    * models.py StationMATimeserie): term ∈ {year, wihy, suhy}, where
    * wihy = winter half-year (Oct–Mar) and suhy = summer half-year. */
  def maTimeseriesTerms(filledSeries: DataFrame): DataFrame = {
    val isWinter = month(col("day")).isin(1, 2, 3, 10, 11, 12)
    val term = filledSeries.withColumn("wi", isWinter)
    def agg(df: DataFrame, name: String) = df.groupBy(col("station_id")).agg(
      round(avg(col("raw")) + lit(1e-9), 6).as("raw"),
      round(avg(col("qc")) + lit(1e-9), 6).as("qc"),
      round(avg(col("filled")) + lit(1e-9), 6).as("filled"))
      .select(col("station_id"), lit(name).as("term"),
        expr("stack(3, 'raw', raw, 'qc', qc, 'filled', filled) AS (kind, value)"))
    agg(term, "year")
      .unionByName(agg(term.filter(col("wi")), "wihy"))
      .unionByName(agg(term.filter(!col("wi")), "suhy"))
      .select(col("station_id"), col("kind"), col("term"), col("value"))
  }

  /** Quotients between the MA means of two kinds, for every ordered
    * pair of distinct kinds (StationKindQuotientView). */
  def quotientKinds(filledSeries: DataFrame): DataFrame = {
    val ma = maTimeseries(filledSeries)
    val num = ma.select(col("station_id"), col("kind").as("kind_num"), col("value").as("v_num"))
    val den = ma.select(col("station_id"), col("kind").as("kind_denom"), col("value").as("v_denom"))
    num.join(den, Seq("station_id"))
      .filter(col("kind_num") =!= col("kind_denom"))
      .select(col("station_id"), col("kind_num"), col("kind_denom"),
        round(col("v_num") / col("v_denom") + lit(1e-9), 6).as("value"))
  }

  /** MA mean of each kind vs the multi-annual raster value
    * (StationMATimeserieRasterQuotientView). */
  def quotientRaster(filledSeries: DataFrame, raster: DataFrame): DataFrame =
    maTimeseries(filledSeries)
      .join(raster.select(col("station_id"), col("raster_p")), Seq("station_id"))
      .select(col("station_id"), col("kind"),
        round(col("value") / col("raster_p") + lit(1e-9), 6).as("value"))

  /** Multiplicative adjustment (P/ET-style, StationET.py:109): scale
    * the filled series so its period mean matches the raster target. */
  def adjustMult(filledSeries: DataFrame, raster: DataFrame): DataFrame = {
    val ma = Series.maMean(filledSeries, "filled")
    filledSeries
      .join(broadcast(ma.withColumnRenamed("ma", "ma_filled")), Seq("station_id"))
      .join(broadcast(raster.select(col("station_id"), col("raster_p"))), Seq("station_id"))
      .withColumn("adj", round(col("filled") * col("raster_p") / col("ma_filled") + lit(1e-9), 3))
      .select(col("station_id"), col("day"), col("filled"), col("adj"))
  }

  /** Additive adjustment (T-style, StationT.py:159): shift the filled
    * series so its period mean matches the temperature raster target. */
  def adjustAdd(filledSeries: DataFrame, raster: DataFrame): DataFrame = {
    val ma = Series.maMean(filledSeries, "filled")
    filledSeries
      .join(broadcast(ma.withColumnRenamed("ma", "ma_filled")), Seq("station_id"))
      .join(broadcast(raster.select(col("station_id"), col("raster_t"))), Seq("station_id"))
      .withColumn("adj", round(col("filled") + (col("raster_t") - col("ma_filled")) + lit(1e-9), 3))
      .select(col("station_id"), col("day"), col("filled"), col("adj"))
  }
}
