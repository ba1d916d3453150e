package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver-contract entry points for the station-timeseries operators. */
object TsQueries {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  def qMetaDerive(s: SparkSession, d: String): DataFrame =
    Series.stationMeta(ev(s, d)).orderBy(col("station_id"))

  def qExpandGrid(s: SparkSession, d: String): DataFrame =
    Series.dailyRaw(ev(s, d)).orderBy(col("station_id"), col("day"))

  def qKnnDist(s: SparkSession, d: String): DataFrame =
    Neighbors.knnDist(Series.stationMeta(ev(s, d))).orderBy(col("station_id"), col("rank"))

  def qKnnElev(s: SparkSession, d: String): DataFrame =
    Neighbors.knnElev(Series.stationMeta(ev(s, d))).orderBy(col("station_id"), col("rank"))

  def qQcRange(s: SparkSession, d: String): DataFrame =
    QualityCheck.range(Series.dailyRaw(ev(s, d)))
      .select("station_id", "day", "raw", "qc").orderBy(col("station_id"), col("day"))

  def qQcRepeats(s: SparkSession, d: String): DataFrame =
    QualityCheck.repeats(Series.dailyRaw(ev(s, d)))
      .select("station_id", "day", "raw", "qc").orderBy(col("station_id"), col("day"))

  def qQcSpike(s: SparkSession, d: String): DataFrame =
    QualityCheck.spike(Series.dailyRaw(ev(s, d)))
      .select("station_id", "day", "raw", "qc").orderBy(col("station_id"), col("day"))

  def qQcDailyCompare(s: SparkSession, d: String): DataFrame =
    QualityCheck.dailyCompare(Series.dailyRaw(ev(s, d)), Series.dailyRef(ev(s, d)))
      .select("station_id", "day", "raw", "ref", "day_failed", "qc")
      .orderBy(col("station_id"), col("day"))

  def qQcNeighborMedian(s: SparkSession, d: String): DataFrame =
    QualityCheck.neighborMedian(Series.dailyRaw(ev(s, d)), Series.stationMeta(ev(s, d)))
      .select("station_id", "day", "raw", "nbs_median", "qc")
      .orderBy(col("station_id"), col("day"))

  /** Combined QC series — also the input for fill-up stages. */
  def qcAll(s: SparkSession, d: String): DataFrame = {
    val events = ev(s, d)
    QualityCheck.all(Series.dailyRaw(events), Series.dailyRef(events), Series.stationMeta(events))
  }

  def qQcAll(s: SparkSession, d: String): DataFrame =
    qcAll(s, d).orderBy(col("station_id"), col("day"))

  def qQcDroppedShare(s: SparkSession, d: String): DataFrame =
    QualityCheck.droppedShare(qcAll(s, d)).orderBy(col("station_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_meta_derive" -> (qMetaDerive _),
    "q_expand_grid" -> (qExpandGrid _),
    "q_knn_dist" -> (qKnnDist _),
    "q_knn_elev" -> (qKnnElev _),
    "q_qc_range" -> (qQcRange _),
    "q_qc_repeats" -> (qQcRepeats _),
    "q_qc_spike" -> (qQcSpike _),
    "q_qc_daily_compare" -> (qQcDailyCompare _),
    "q_qc_neighbor_median" -> (qQcNeighborMedian _),
    "q_qc_all" -> (qQcAll _),
    "q_qc_dropped_share" -> (qQcDroppedShare _))
}
