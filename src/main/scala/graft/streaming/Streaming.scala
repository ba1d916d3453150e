package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming pipelines — the reference's continuous update
  * cycle (broker.update_db: ingest → qc → fill on every new import)
  * re-expressed as streaming plans over the same event schema.
  *
  * The batch twins of these aggregations live in
  * graft.tsdb.Aggregate.streamWindowBatch and are oracle-checked; the
  * streaming paths share the logical plan shape and are covered by
  * MemoryStream tests.
  */
object Streaming {

  /** Tumbling 6h windowed aggregation with a 1h watermark: counts and
    * value sums per (window, event_type). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) + lit(1e-9), 3).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  case class StationEvent(user_id: Long, ts: Timestamp, value: Double)
  case class GapState(lastTs: Long)
  case class GapAlert(station_id: Long, gap_start: Timestamp, gap_hours: Double)

  /** Stateful gap detector: emits an alert when a station goes silent
    * for more than `maxGapHours` between consecutive events —
    * the streaming analog of count_holes. Uses
    * flatMapGroupsWithState with processing-time timeout-free logic
    * (purely event-driven, deterministic in tests). */
  def gapDetector(events: Dataset[StationEvent], maxGapHours: Double = 24.0): Dataset[GapAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, GapAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (stationId: Long, rows: Iterator[StationEvent], state: GroupState[GapState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val startTs = state.getOption.map(_.lastTs)
          val alerts = scala.collection.mutable.ArrayBuffer.empty[GapAlert]
          var last = startTs
          sorted.foreach { e =>
            last.foreach { prev =>
              val gapH = (e.ts.getTime - prev) / 3600000.0
              if (gapH > maxGapHours)
                alerts += GapAlert(stationId, new Timestamp(prev), math.round(gapH * 100) / 100.0)
            }
            last = Some(e.ts.getTime)
          }
          last.foreach(l => state.update(GapState(l)))
          alerts.iterator
      }
  }
}
