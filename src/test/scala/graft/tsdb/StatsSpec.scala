package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the round-6 statistical operators:
  * crafted inputs with pencil-and-paper expected values, so the DuckDB
  * cross-check (which proves engine EQUIVALENCE) is complemented by
  * proofs of CORRECTNESS of the shared formula.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: Seq[(Long, String, Option[Double])]) =
    rows.map { case (sid, d, v) =>
      (sid, java.sql.Date.valueOf(d), v, if (v.isDefined) 1L else 0L)
    }.toDF("station_id", "day", "raw", "n_obs")

  test("jarque-bera: symmetric three-point distribution") {
    // {1,2,3}×2: skew 0; m2 = 2/3, m4 = 2/3 → kurt = 1.5;
    // JB = n/6·(0 + (1.5−3)²/4) = 1·0.5625
    val df = daily((1 to 6).map(i =>
      (1L, f"2024-01-${i}%02d", Some(1.0 + (i - 1) % 3))))
    val r = Climate.jarqueBera(df).head
    assert(math.abs(r.getAs[Double]("skew")) < 1e-6)
    assert(math.abs(r.getAs[Double]("kurt") - 1.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("jb") - 0.5625) < 1e-3)
    assert(!r.getAs[Boolean]("reject_normal"))
  }

  test("durbin-watson: alternating residuals push DW toward 4") {
    // y = t + (−1)^t: slope 1, residuals alternate ±1 →
    // Σ(eₜ−eₜ₋₁)² ≈ 4·Σe² → DW ≈ 4
    val df = daily((0 until 20).map(i =>
      (1L, f"2024-01-${i + 1}%02d", Some(i.toDouble + (if (i % 2 == 0) 1.0 else -1.0)))))
    val r = Climate.durbinWatson(df).head
    assert(r.getAs[Double]("dw") > 3.5)
  }

  test("yule-walker AR(2): white-ish alternation gives phi1 < 0") {
    // strict alternation a,b,a,b → r1 ≈ −1 edge; use damped pattern
    val vals = Seq(10.0, 2.0, 9.0, 3.0, 8.0, 4.0, 9.0, 2.0, 10.0, 3.0,
      9.0, 2.0, 8.0, 4.0, 9.0, 3.0)
    val df = daily(vals.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-01-${i + 1}%02d", Some(v)) })
    val r = Climate.yuleWalkerAr2(df).head
    assert(r.getAs[Double]("r1") < 0.0)
    assert(r.getAs[Double]("phi1") < 0.0)
  }

  test("binned kendall tau-b: monotone elevation-value map gives tau 1") {
    val meta = (1L to 12L).map(i => (i, i.toDouble * 10))
      .toDF("station_id", "elev")
    val df = daily((1 to 12).map(i =>
      (i.toLong, "2024-01-01", Some(i.toDouble))))
    val r = Climate.kendallTauBinned(meta, df).head
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("discordant") === 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-6)
  }

  test("moran/geary/getis on a smooth line field agree: clustered") {
    // stations on a line with value = position, neighbors = adjacent:
    // strong positive autocorrelation → I > 0, C < 1
    val n = 10
    val df = daily((1 to n).map(i =>
      (i.toLong, "2024-01-01", Some(i.toDouble))))
    val knn = (1 until n).flatMap(i => Seq(
      (i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong)))
      .toDF("station_id", "nb_id")
    val i = Climate.moransI(df, knn).head
    assert(i.getAs[Double]("morans_i") > 0.5)
    val c = Climate.gearyC(df, knn).head
    assert(c.getAs[Double]("geary_c") < 0.5)
    val g = Climate.getisOrd(df, knn)
    // the high end of the line is a hot spot, the low end cold
    val byId = g.collect().map(r =>
      r.getAs[Long]("station_id") -> r.getAs[Double]("gi_z")).toMap
    assert(byId(n.toLong) > byId(1L))
  }

  test("k-core: 5-clique survives the k=4 peel, pendant chain does not") {
    val clique = for (a <- 1 to 5; b <- 1 to 5 if a < b)
      yield (a.toLong, b.toLong)
    val chain = Seq((5L, 6L), (6L, 7L))
    val edges = (clique ++ chain).toDF("src", "dst")
    val out = graft.graph.GraphOps.kCore(edges).collect()
      .map(r => r.getAs[Long]("station_id") ->
        (r.getAs[Boolean]("in_core"), r.getAs[Long]("core_degree"))).toMap
    (1L to 5L).foreach { id =>
      assert(out(id)._1, s"clique node $id must stay in the 4-core")
      assert(out(id)._2 === 4L)
    }
    assert(!out(6L)._1 && !out(7L)._1)
  }

  test("concurrency: overlapping sessions of two users peak at 2") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0, "view"),
      (2L, 1L, ts("2024-01-01 10:05:00"), 1.0, "view"),
      (3L, 2L, ts("2024-01-01 10:02:00"), 1.0, "view"),
      (4L, 2L, ts("2024-01-02 09:00:00"), 1.0, "view"))
      .toDF("event_id", "user_id", "ts", "value", "event_type")
    val out = Aggregate.concurrency(ev).collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("peak_concurrent") === 2L)
    assert(out(0).getAs[Long]("n_starts") === 2L)
    assert(out(1).getAs[Long]("peak_concurrent") === 1L)
  }

  test("growing season length: warm spring start, post-July cold end") {
    val mk = (m: Int, d: Int, t: Double) =>
      (1L, f"2024-$m%02d-$d%02d", t)
    val rows = ((1 to 10).map(d => mk(3, d, 10.0)) ++ // warm run Mar 1-10
      (10 to 20).map(d => mk(7, d, 1.0)))             // cold run Jul 10-20
      .map { case (s, d, t) => (s, java.sql.Date.valueOf(d),
        t: java.lang.Double) }
      .toDF("station_id", "day", "t")
    val r = Climate.growingSeasonLength(rows).head
    assert(r.getAs[Int]("start_doy") ===
      java.time.LocalDate.parse("2024-03-01").getDayOfYear)
    assert(r.getAs[Int]("end_doy") ===
      java.time.LocalDate.parse("2024-07-10").getDayOfYear)
    assert(r.getAs[Int]("gsl") === java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse("2024-03-01"),
      java.time.LocalDate.parse("2024-07-10")).toInt)
  }

  test("rsi: monotone rise saturates at 100") {
    val df = daily((0 until 20).map(i =>
      (1L, f"2024-01-${i + 1}%02d", Some(i.toDouble))))
    val out = Climate.rsi(df).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("rsi") === 100.0))
  }

  test("bootstrap CI brackets the plain mean on the driver data") {
    val df = TsQueries.rawDaily(spark, "/root/testdata/sf0.001")
    val ci = Climate.bootstrapCi(df)
    val plain = df.filter(col("raw").isNotNull).groupBy(col("station_id"))
      .agg(avg(col("raw")).as("mean_raw"))
    val joined = ci.join(plain, Seq("station_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
        r.getAs[Double]("mean_raw"))
      assert(lo <= hi)
      // the Poisson bootstrap is noisy at B=20 but must stay in the
      // right neighborhood: the plain mean within a widened band
      val slack = (hi - lo).max(1e-6)
      assert(m > lo - 2 * slack && m < hi + 2 * slack,
        s"station ${r.getAs[Long]("station_id")}: mean $m vs [$lo, $hi]")
    }
  }
}
