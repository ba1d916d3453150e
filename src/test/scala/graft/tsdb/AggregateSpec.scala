package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class AggregateSpec extends SparkSpec {
  import spark.implicits._

  test("monthly aggregation gates on >20% missing") {
    // 10 days in Jan: 8 non-null qc (80% == not > 0.8 -> NULL),
    // 9 non-null filled (90% -> sum)
    val rows = (1 to 10).map { d =>
      val qc = if (d <= 8) Some(d.toDouble) else None
      val filled = if (d <= 9) Some(d.toDouble) else None
      (1L, Date.valueOf(f"2024-01-$d%02d"), qc, qc, filled)
    }
    val df = rows.toDF("station_id", "day", "raw", "qc", "filled")
    val out = Aggregate.aggMonthSum(df).collect().head
    assert(out.getAs[Any]("qc") === null)
    assert(out.getAs[Double]("filled") === 45.0)
    assert(out.getAs[Double]("qc_na_share") === 20.0)
  }

  test("rolling stats computes trailing-window mean/min/max/count per station") {
    val rows = (1 to 10).map(d => (1L, Date.valueOf(f"2024-01-$d%02d"), Some(d.toDouble)))
    val out = Aggregate.rollingStats(rows.toDF("station_id", "day", "filled"))
      .orderBy("day").collect()
    // day 3: trailing window {1,2,3}; day 10: {4..10}
    assert(out(2).getAs[Double]("roll_mean") === 2.0)
    assert(out(2).getAs[Long]("roll_n") === 3L)
    assert(out(9).getAs[Double]("roll_mean") === 7.0)
    assert(out(9).getAs[Double]("roll_min") === 4.0)
    assert(out(9).getAs[Double]("roll_max") === 10.0)
    assert(out(9).getAs[Long]("roll_n") === 7L)
  }

  test("count_holes counts boundary gaps via virtual period observations") {
    // observations on days 5 and 6 of a 1..10 grid: gaps 1->5 (4d) and 6->10 (4d)
    val rows = (1 to 10).map { d =>
      val qc = if (d == 5 || d == 6) Some(1.0) else None
      (1L, Date.valueOf(f"2024-01-$d%02d"), qc, qc)
    }
    val out = Aggregate.countHoles(rows.toDF("station_id", "day", "raw", "qc")).collect().head
    assert(out.getAs[Long]("holes_ge_3") === 2L)
    assert(out.getAs[Long]("holes_ge_5") === 0L)
  }

  test("knn ranks by exact squared distance with id tie-breaks") {
    val meta = Seq((0L, 0.0, 0.0, 0.0), (1L, 1.0, 0.0, 0.0),
      (2L, 0.0, 1.0, 0.0), (3L, 2.0, 0.0, 0.0)).toDF("station_id", "x", "y", "elev")
    val out = Neighbors.knnDist(meta, 3).filter($"station_id" === 0)
      .orderBy("rank").select("nb_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L, 3L)) // d2: 1 (tie -> id), 1, 4
  }

  test("bucketed knn equals brute-force knn on a dense grid") {
    val meta = (0L until 60L).map(i => (i, (i % 10).toDouble, (i / 10).toDouble, 0.0))
      .toDF("station_id", "x", "y", "elev")
    val brute = Neighbors.knnDist(meta, 5).orderBy("station_id", "rank").collect()
    val bucketed = Neighbors.knnDistBucketed(meta, 5, cellSize = 3.0)
      .orderBy("station_id", "rank").collect()
    assert(brute.toSeq === bucketed.toSeq)
  }

  test("elevation weighting reorders neighbors") {
    val meta = Seq((0L, 0.0, 0.0, 0.0), (1L, 1.0, 0.0, 900.0), (2L, 3.0, 0.0, 0.0))
      .toDF("station_id", "x", "y", "elev")
    val plain = Neighbors.knnDist(meta, 1).filter($"station_id" === 0)
      .select("nb_id").as[Long].collect()
    val weighted = Neighbors.knnElev(meta, 1).filter($"station_id" === 0)
      .select("nb_id").as[Long].collect()
    assert(plain.head === 1L)   // closest horizontally
    assert(weighted.head === 2L) // 900m elevation difference penalized
  }

  test("bucketed knn rescues low-density geometries (k-th neighbor beyond the cell ring)") {
    // 8 stations on a sparse line, 4 units apart: with cellSize 3 the
    // 3x3 ring sees at most the adjacent stations, so the k=5 check
    // fails everywhere and the exact rescue ranking must take over
    val meta = (0L until 8L).map(i => (i, i * 4.0, 0.0, 0.0))
      .toDF("station_id", "x", "y", "elev")
    val brute = Neighbors.knnDist(meta, 5).orderBy("station_id", "rank").collect()
    val bucketed = Neighbors.knnDistBucketed(meta, 5, cellSize = 3.0)
      .orderBy("station_id", "rank").collect()
    assert(brute.toSeq === bucketed.toSeq)
  }

  test("only_real neighbor selection excludes virtual donors but still probes them") {
    // station 1 is virtual: nearest to 0, but never a donor
    val meta = Seq((0L, 0.0, 0.0, 0.0, true), (1L, 1.0, 0.0, 0.0, false),
      (2L, 2.0, 0.0, 0.0, true), (3L, 3.0, 0.0, 0.0, true))
      .toDF("station_id", "x", "y", "elev", "is_real")
    val out = Neighbors.knnDist(meta, 2, onlyReal = true)
      .filter($"station_id" === 0).orderBy("rank").select("nb_id").as[Long].collect()
    assert(out.toSeq === Seq(2L, 3L)) // 1 skipped despite being closest
    // the virtual station itself still gets (real) neighbors
    val probe = Neighbors.knnDist(meta, 2, onlyReal = true)
      .filter($"station_id" === 1).orderBy("rank").select("nb_id").as[Long].collect()
    assert(probe.toSeq === Seq(0L, 2L))
    // bucketed scale path agrees with brute force under only_real
    val brute = Neighbors.knnDist(meta, 2, onlyReal = true)
      .orderBy("station_id", "rank").collect()
    val bucketed = Neighbors.knnDistBucketed(meta, 2, cellSize = 3.0, onlyReal = true)
      .orderBy("station_id", "rank").collect()
    assert(brute.toSeq === bucketed.toSeq)
  }

  test("max_period: inner union of kind periods, NULL when disjoint or empty") {
    val d = (n: Int) => Date.valueOf(f"2024-01-$n%02d")
    // raw spans 1-8, qc spans 3-10, filled spans 2-9 -> inner 3-8
    val rows = (1 to 10).map { i =>
      (1L, d(i),
        if (i <= 8) Some(i.toDouble) else None,
        if (i >= 3) Some(i.toDouble) else None,
        if (i >= 2 && i <= 9) Some(i.toDouble) else None)
    } ++
      // station 2: qc entirely empty -> inner period NULL
      (1 to 5).map(i => (2L, d(i), Some(i.toDouble), Option.empty[Double], Some(i.toDouble))) ++
      // station 3: raw 1-2 and qc 4-5 never overlap -> NULL
      (1 to 5).map { i =>
        (3L, d(i), if (i <= 2) Some(i.toDouble) else None,
          if (i >= 4) Some(i.toDouble) else None,
          Some(i.toDouble))
      }
    val out = Aggregate.maxPeriod(rows.toDF("station_id", "day", "raw", "qc", "filled"))
      .orderBy("station_id").collect()
    assert(out(0).getDate(1) === d(1) && out(0).getDate(2) === d(10)) // grid extent
    assert(out(0).getDate(3) === d(3) && out(0).getDate(4) === d(8))  // inner union
    assert(out(1).getAs[Any]("max_from") === null)
    assert(out(2).getAs[Any]("max_from") === null && out(2).getAs[Any]("max_until") === null)
  }
}
