package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class QualityCheckSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int): Date = Date.valueOf(f"2024-01-$d%02d")

  private def series(rows: Seq[(Long, Int, Option[Double])]) =
    rows.map { case (s, d, v) => (s, day(d), v, 1L) }
      .toDF("station_id", "day", "raw", "n_obs")

  test("range rule nulls out-of-bounds values only") {
    val out = QualityCheck.range(series(Seq(
      (1L, 1, Some(10.0)), (1L, 2, Some(-1.0)), (1L, 3, Some(600.0)), (1L, 4, None))))
      .orderBy("day").select("qc").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(10.0), None, None, None))
  }

  test("repeats rule drops all members of a 3-run above the limit") {
    val out = QualityCheck.repeats(series(Seq(
      (1L, 1, Some(100.0)), (1L, 2, Some(101.0)), (1L, 3, Some(99.0)), // rounds to 100 thrice
      (1L, 4, Some(10.0)), (1L, 5, Some(10.0)), (1L, 6, Some(10.0)),   // below limit -> kept
      (1L, 7, Some(200.0)))))
      .orderBy("day").select("qc").as[Option[Double]].collect()
    assert(out.toSeq === Seq(None, None, None, Some(10.0), Some(10.0), Some(10.0), Some(200.0)))
  }

  test("spike rule needs zero/missing activity on BOTH sides and no edge") {
    val out = QualityCheck.spike(series(Seq(
      (1L, 1, Some(400.0)),          // edge -> kept
      (1L, 2, None), (1L, 3, Some(400.0)), (1L, 4, None), // isolated -> dropped
      (1L, 5, Some(350.0)), (1L, 6, Some(1.0)))))          // neighbor active -> kept
      .orderBy("day").select("qc").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(400.0), None, None, None, Some(350.0), Some(1.0)))
  }

  test("qn quality note records which rule dropped each value") {
    // stations on a wide grid so the neighbor-median rule stays quiet
    val s = series(Seq(
      (1L, 1, Some(600.0)),                               // range
      (1L, 2, Some(100.0)), (1L, 3, Some(101.0)), (1L, 4, Some(99.0)), // repeat run
      (1L, 5, None), (1L, 6, Some(400.0)), (1L, 7, None), // spike
      (1L, 8, Some(50.0))))                               // clean
    val ref = Seq((1L, day(8), 10.0)).toDF("station_id", "day", "ref")
    val meta = Seq((1L, 0.0, 0.0, 0.0)).toDF("station_id", "x", "y", "elev")
    val out = QualityCheck.all(s, ref, meta).orderBy("day")
      .select("qn").as[Option[String]].collect()
    assert(out.toSeq === Seq(Some("range"), Some("repeat"), Some("repeat"), Some("repeat"),
      None, Some("spike"), None, None))
  }

  test("daily-compare flags aggregate >= 2x substantial reference") {
    val s = series(Seq((1L, 1, Some(250.0)), (1L, 2, Some(250.0))))
    val ref = Seq((1L, day(1), 100.0), (1L, day(2), 200.0)).toDF("station_id", "day", "ref")
    val out = QualityCheck.dailyCompare(s, ref)
      .orderBy("day").select("qc").as[Option[Double]].collect()
    assert(out.toSeq === Seq(None, Some(250.0)))
  }

  test("neighbor median regionalizes additively and drops the outlier day") {
    // 3 stations on a line; station 1 deviates wildly on day 3 only.
    // ma(st1)=240 -> coef vs neighbors = 140, regionalized median = 240:
    // day 3 |800-240| > 200 dropped, other days |100-240| <= 200 kept.
    val days = 1 to 5
    val s = series(
      days.map(d => (0L, d, Some(100.0))) ++
      days.map(d => (1L, d, Some(if (d == 3) 800.0 else 100.0))) ++
      days.map(d => (2L, d, Some(100.0))))
    val meta = Seq((0L, 0.0, 0.0, 0.0), (1L, 1.0, 0.0, 0.0), (2L, 2.0, 0.0, 0.0))
      .toDF("station_id", "x", "y", "elev")
    val out = QualityCheck.neighborMedian(s, meta)
      .filter($"station_id" === 1).orderBy("day")
      .select("qc").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(100.0), Some(100.0), None, Some(100.0), Some(100.0)))
  }
}
