package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Climate / hydrology indices: hand-checked runs on a crafted series
  * plus structural invariants on the driver data. */
class ClimateSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, Option[Double])]) =
    rows.map { case (sid, d, v) =>
      (sid, java.sql.Date.valueOf(d), v, if (v.isDefined) 1L else 0L)
    }.toDF("station_id", "day", "raw", "n_obs")

  test("dry spells: hand-checked runs, year-boundary cut, NULL counts dry") {
    // station 1, 6 days: wet, dry, dry(null), dry, wet, then a new
    // year starting dry — the run of 3 must not extend across years
    val df = frame(Seq(
      (1L, "2023-12-27", Some(30.0)),
      (1L, "2023-12-28", Some(1.0)),
      (1L, "2023-12-29", None),
      (1L, "2023-12-30", Some(2.0)),
      (1L, "2023-12-31", Some(40.0)),
      (1L, "2024-01-01", Some(0.5)),
      (1L, "2024-01-02", Some(50.0))))
    val out = Climate.drySpells(df).orderBy("yr").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("max_dry_run") === 3L) // 28th-30th
    assert(out(0).getAs[Long]("n_dry") === 3L)
    assert(out(1).getAs[Long]("max_dry_run") === 1L) // Jan 1 only
    assert(out(1).getAs[Long]("n_days") === 2L)
  }

  test("viterbi regimes: dry series decodes calm, storm block segments once") {
    val dry = frame((1 to 10).map(i => (1L, f"2024-01-$i%02d", Some(0.0))))
    val r = Climate.viterbiRegimes(dry).head
    assert(r.getAs[Double]("storm_share") === 0.0)
    assert(r.getAs[Int]("n_switches") === 0)
    val mixed = frame((1 to 10).map(i => (1L, f"2024-01-$i%02d", Some(0.0)))
      ++ (11 to 15).map(i => (1L, f"2024-01-$i%02d", Some(100.0))))
    val m = Climate.viterbiRegimes(mixed).head
    assert(m.getAs[Int]("storm_days") === 5, m.toString)
    assert(m.getAs[Int]("n_switches") === 1)
  }

  test("granger: a station copying its neighbor's yesterday is flagged causal") {
    import spark.implicits._
    val ys = Seq(5.0, 9.0, 2.0, 8.0, 1.0, 7.0, 3.0, 6.0, 4.0, 8.5, 2.5, 7.5)
    val rows = ys.zipWithIndex.flatMap { case (y, i) =>
      val d = f"2024-02-${i + 1}%02d"
      // station 1 tracks neighbor 2's PREVIOUS day plus a small jitter
      // (an exact copy would zero the unrestricted SSE and void the F)
      val x = if (i == 0) 0.0 else ys(i - 1) + 0.01 * (if (i % 2 == 0) 1 else -1)
      Seq((1L, d, Some(x)), (2L, d, Some(y)))
    }
    val knn = Seq((1L, 2L, 1), (2L, 1L, 1)).toDF("station_id", "nb_id", "rank")
    val out = Climate.grangerNeighbor(frame(rows), knn).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("causal"), out(1L).toString)
    assert(math.abs(out(1L).getAs[Double]("granger_coef") - 1.0) < 0.05)
  }

  test("kpss + dickey-fuller give complementary verdicts on a walk vs noise") {
    // a drifting random walk: KPSS rejects level-stationarity
    // (eta = 0.525681 > 0.463), ADF cannot reject the unit root
    // (t = -0.3919); noisy alternation: exactly the opposite
    val steps = Seq(1.0, 2.0, 0.5, 1.5, 0.8, 2.2, 1.1, 0.9, 1.8, 0.4,
      1.6, 1.2, 0.7, 2.1, 0.6, 1.9, 1.3, 0.95, 1.45, 1.05)
    val walk = steps.scanLeft(0.0)(_ + _).drop(1)
    val alt = Seq(5.0, 1.0, 4.8, 1.2, 5.2, 0.8, 4.9, 1.1, 5.1, 0.9,
      5.0, 1.0, 4.7, 1.3, 5.3, 0.7, 4.95, 1.05, 5.05, 0.95)
    val rows = walk.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-03-${i + 1}%02d", Option(v))
    } ++ alt.zipWithIndex.map { case (v, i) =>
      (2L, f"2024-03-${i + 1}%02d", Option(v))
    }
    val kp = Climate.kpss(frame(rows)).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(kp(1L).getAs[Boolean]("rejected_5pct"), kp(1L).toString)
    assert(math.abs(kp(1L).getAs[Double]("eta") - 0.525681) < 1e-6)
    assert(!kp(2L).getAs[Boolean]("rejected_5pct"))
    assert(math.abs(kp(2L).getAs[Double]("eta") - 0.125) < 1e-6)
    val ad = Climate.dickeyFuller(frame(rows)).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(!ad(1L).getAs[Boolean]("unit_root_rejected"), ad(1L).toString)
    assert(math.abs(ad(1L).getAs[Double]("t_stat") - (-0.3919)) < 1e-4)
    assert(ad(2L).getAs[Boolean]("unit_root_rejected"))
    assert(math.abs(ad(2L).getAs[Double]("rho") - (-1.995343)) < 1e-6)
  }

  test("gev l-moments: hand-computed PWMs on {1..5} and Lanczos gamma accuracy") {
    import spark.implicits._
    // one hourly value per day -> block maxima {1,2,3,4,5}:
    // b0=3, b1=2, b2=1.5 -> l1=3, l2=1, t3=0, t_lcv=1/3
    val hourly = (1 to 5).map(i =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-0$i 12:00:00"), Option(i.toDouble)))
      .toDF("station_id", "hour", "raw")
    val r = Climate.gevLmoments(hourly).head
    assert(r.getAs[Long]("n_blocks") === 5L)
    assert(r.getAs[Double]("l1") === 3.0 && r.getAs[Double]("l2") === 1.0)
    assert(r.getAs[Double]("t3") === 0.0)
    assert(math.abs(r.getAs[Double]("t_lcv") - 0.333333) < 1e-6)
    // t3=0 -> c = 2/3 - ln2/ln3 -> kappa = 7.8590c + 2.9554c^2
    val c = 2.0 / 3.0 - math.log(2.0) / math.log(3.0)
    assert(math.abs(r.getAs[Double]("kappa") - (7.8590 * c + 2.9554 * c * c)) < 1e-6)
    // the 100-block return level sits far above the 5-block mean
    assert(r.getAs[Double]("rl100") > r.getAs[Double]("l1"))
    // Lanczos gamma: spot-check against known values of the real gamma
    val g = Seq(1.0, 1.5, 2.0).toDF("z")
      .select(round(Climate.gammaCol(col("z")) + lit(1e-12), 10).as("g"))
      .collect().map(_.getDouble(0))
    assert(g(0) === 1.0 && g(2) === 1.0)
    assert(math.abs(g(1) - 0.8862269255) < 1e-9) // Γ(1.5) = √π/2
  }

  test("flood seasonality: same-date peaks give r=1; opposed dates cancel") {
    import spark.implicits._
    // station 1: annual max always on Mar 1 (doy 61) across 3 years
    // station 2: maxima half a year apart -> resultant ~ 0
    val rows =
      (2022 to 2024).flatMap { y =>
        Seq((1L, s"$y-03-01", Option(99.0)), (1L, s"$y-03-02", Option(1.0)))
      } ++ Seq(
        (2L, "2023-01-01", Option(99.0)), (2L, "2023-01-02", Option(1.0)),
        (2L, "2024-07-02", Option(99.0)), (2L, "2024-07-03", Option(1.0)))
    val out = Climate.floodSeasonality(frame(rows)).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_years") === 3L)
    assert(out(1L).getAs[Double]("r_bar") > 0.999)
    assert(math.abs(out(1L).getAs[Double]("mean_doy") - 61.0) < 1.5)
    assert(out(1L).getAs[Boolean]("seasonal"))
    // doy 1 vs doy 184: 183/365 of the circle apart -> r near 0
    assert(out(2L).getAs[Double]("r_bar") < 0.05, out(2L).toString)
    assert(!out(2L).getAs[Boolean]("seasonal"))
  }

  test("budyko: wetter station is energy-limited with higher runoff fraction") {
    import spark.implicits._
    // same warm temperature climatology; station 1 gets 10x the rain
    val temp = (1 to 20).flatMap { i =>
      Seq((1L, f"2024-07-$i%02d", Option(20.0)), (2L, f"2024-07-$i%02d", Option(20.0)))
    }.map { case (s, d, v) =>
      (s, java.sql.Date.valueOf(d), v, v, v)
    }.toDF("station_id", "day", "t", "t_min", "t_max")
    val rain = (1 to 20).flatMap { i =>
      Seq((1L, f"2024-07-$i%02d", Option(20.0)), (2L, f"2024-07-$i%02d", Option(2.0)))
    }
    val out = Climate.budyko(temp, frame(rain)).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    val wet = out(1L); val dry = out(2L)
    assert(wet.getAs[String]("regime") === "energy-limited")
    assert(dry.getAs[String]("regime") === "water-limited")
    assert(wet.getAs[Double]("runoff_fraction") > dry.getAs[Double]("runoff_fraction"))
    out.values.foreach { r =>
      val ef = r.getAs[Double]("evap_fraction")
      assert(ef > 0.0 && ef < 1.0, r.toString)
    }
  }

  test("daily periodogram: a pure 7-day cycle concentrates power at period 7") {
    import spark.implicits._
    val rows = (0 until 28).map { i =>
      // zero-mean cosine: a DC offset would leak into every trial
      // period through non-integer cycle counts and dilute the share
      (1L, java.time.LocalDate.of(2024, 3, 1).plusDays(i).toString,
        Option(5.0 * math.cos(2.0 * math.Pi * i / 7.0)))
    }
    val out = Climate.periodogramDaily(frame(rows.map { case (s, d, v) => (s, d, v) }))
      .collect().map(r => r.getAs[Int]("period_days") -> r.getAs[Double]("power_share")).toMap
    assert(out.size === 13) // periods 2..14
    val top = out.maxBy(_._2)
    assert(top._1 === 7, s"dominant period ${top._1}")
    assert(top._2 > 0.5, s"share ${top._2}")
  }

  test("weibull fit: Justus shape matches the closed form; scale exceeds the mean for k>1") {
    import spark.implicits._
    val xs = Seq.tabulate(20)(i => if (i % 2 == 0) 1.0 else 3.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-03-${i + 1}%02d", Option(v))
    }
    val r = Climate.weibullFit(frame(rows)).head
    val cv = r.getAs[Double]("cv")
    assert(math.abs(r.getAs[Double]("k") - math.pow(cv, -1.086)) < 1e-3)
    assert(r.getAs[Double]("k") > 1.0)
    assert(r.getAs[Double]("c") > r.getAs[Double]("mu")) // Γ(1+1/k) < 1 for k > 1
    assert(r.getAs[Double]("p63") === r.getAs[Double]("c"))
  }

  test("generalized esd: catches both planted twin outliers, then stops rejecting") {
    import spark.implicits._
    // 20 tight values plus TWO equal gross outliers — the masking
    // case a single Grubbs pass understates; ESD removes one per
    // round and flags both, then round 3 finds nothing rejectable
    val base = Seq(10.1, 9.9, 10.0, 10.2, 9.8, 10.05, 9.95, 10.15, 9.85, 10.0,
      10.1, 9.9, 10.0, 10.2, 9.8, 10.05, 9.95, 10.15, 9.85, 10.0)
    val rows = (base ++ Seq(50.0, 50.0)).zipWithIndex.map { case (v, i) =>
      (1L, f"2024-03-${i + 1}%02d", Option(v))
    }
    val out = Climate.esdOutliers(frame(rows)).orderBy("round").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Boolean]("rejected") && out(0).getAs[Double]("x_out") === 50.0)
    assert(out(1).getAs[Boolean]("rejected") && out(1).getAs[Double]("x_out") === 50.0)
    assert(!out(2).getAs[Boolean]("rejected"), out(2).toString)
    // each round's n shrinks by exactly one
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(22L, 21L, 20L))
  }

  test("quantile mapping onto an affine twin recovers the affine transform") {
    import spark.implicits._
    // station 1: values 1..21; station 2 = 2*x + 5 on the same days,
    // shuffled so rank order is exercised, not insertion order
    val xs = Seq(7.0, 1.0, 14.0, 3.0, 21.0, 9.0, 2.0, 17.0, 5.0, 12.0,
      19.0, 4.0, 11.0, 8.0, 15.0, 6.0, 20.0, 10.0, 13.0, 16.0, 18.0)
    val rows = xs.zipWithIndex.flatMap { case (x, i) =>
      val d = f"2024-03-${i + 1}%02d"
      Seq((1L, d, Option(x)), (2L, d, Option(2.0 * x + 5.0)))
    }
    val knn = Seq((1L, 2L, 1), (2L, 1L, 1)).toDF("station_id", "nb_id", "rank")
    val out = Climate.quantileMapping(frame(rows), knn).collect()
      .filter(_.getAs[Long]("station_id") == 1L)
    assert(out.length === 21)
    // with n = 21 the 1%-binned percent_rank lands exactly on the
    // neighbor's order statistics: mapped == 2*raw + 5 everywhere
    out.foreach { r =>
      val raw = r.getAs[Double]("raw")
      assert(math.abs(r.getAs[Double]("mapped") - (2.0 * raw + 5.0)) < 0.11,
        r.toString)
    }
  }

  test("solar ra: equator gets exactly 12h days; mid-latitude winter is shorter than summer") {
    import spark.implicits._
    // y = 50 -> lat 0 (equator); y = 90 -> lat 44N
    val meta = Seq((1L, 50.0), (2L, 90.0)).toDF("station_id", "y")
    val grid = Seq(
      (1L, "2024-01-01"), (1L, "2024-07-01"),
      (2L, "2024-01-01"), (2L, "2024-07-01")
    ).map { case (s, d) => (s, java.sql.Date.valueOf(d)) }.toDF("station_id", "day")
    val out = Climate.solarRa(grid, meta).collect()
      .map(r => (r.getAs[Long]("station_id"), r.getAs[java.sql.Date]("day").toString) -> r).toMap
    // equator: day length 12h year-round, by geometry
    assert(out((1L, "2024-01-01")).getAs[Double]("daylen_h") === 12.0)
    assert(out((1L, "2024-07-01")).getAs[Double]("daylen_h") === 12.0)
    // 44N: January day far shorter than July; Ra positive everywhere
    val jan = out((2L, "2024-01-01")); val jul = out((2L, "2024-07-01"))
    assert(jan.getAs[Double]("daylen_h") < 10.0 && jul.getAs[Double]("daylen_h") > 14.0)
    out.values.foreach(r => assert(r.getAs[Double]("ra") > 0.0))
    assert(jan.getAs[Double]("ra") < jul.getAs[Double]("ra"))
  }

  test("snowpack: accumulates through a cold spell, melts by degree-days, caps at the pack") {
    import spark.implicits._
    // day 1-3: 10 mm/day at -5C (snow, no melt); day 4: 0 mm at +2C
    // (melt 6); day 5: 0 mm at +20C (melt capped at remaining 24)
    val p = Seq(10.0, 10.0, 10.0, 0.0, 0.0)
    val t = Seq(-5.0, -5.0, -5.0, 2.0, 20.0)
    val raw = p.zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Date.valueOf(f"2024-01-0${i + 1}"), Option(v), 1L)
    }.toDF("station_id", "day", "raw", "n_obs")
    val temp = t.zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Date.valueOf(f"2024-01-0${i + 1}"), Option(v))
    }.toDF("station_id", "day", "t")
    val r = Climate.snowpack(raw, temp).head
    assert(r.getAs[Long]("snow_days") === 3L)
    assert(r.getAs[Double]("peak_swe") === 30.0)
    assert(r.getAs[Double]("end_swe") === 0.0) // 30 - 6 - 24
    assert(r.getAs[Double]("total_melt") === 30.0)
  }

  test("scs runoff: no runoff below the initial abstraction, quadratic above it") {
    import spark.implicits._
    // station 0: CN = 60 -> S = 169.33, Ia = 33.87
    val raw = Seq(
      (0L, "2024-01-01", Option(10.0)), // below Ia -> Q = 0
      (0L, "2024-01-02", Option(100.0)) // above -> Q = 66.13^2/235.46
    )
    val r = Climate.scsRunoff(frame(raw)).head
    assert(r.getAs[Double]("cn") === 60.0)
    assert(r.getAs[Long]("n_wet_days") === 2L && r.getAs[Long]("n_runoff_days") === 1L)
    val s = 25400.0 / 60.0 - 254.0; val ia = 0.2 * s
    val expQ = (100.0 - ia) * (100.0 - ia) / (100.0 - ia + s)
    assert(math.abs(r.getAs[Double]("total_q") - expQ) < 1e-3)
  }

  test("lowess: reproduces a straight line exactly and shrinks spike residuals") {
    // local-LINEAR smoothing is exact on a line: smooth == raw everywhere
    val line = (1 to 21).map(i => (1L, f"2024-01-$i%02d", Option(2.0 * i + 5.0)))
    val out = Climate.lowess(frame(line)).collect()
    assert(out.length === 21)
    out.foreach(r => assert(math.abs(r.getAs[Double]("resid")) < 1e-6, r.toString))
    // a single spike on a flat series: the smoother pulls it toward 0
    val spike = (1 to 21).map(i =>
      (1L, f"2024-02-$i%02d", Option(if (i == 11) 100.0 else 0.0)))
    val sm = Climate.lowess(frame(spike)).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    val atSpike = sm("2024-02-11")
    assert(atSpike.getAs[Double]("smooth") < 50.0) // pulled well below the spike
    assert(atSpike.getAs[Long]("n_window") === 15L) // full ±7 window
  }

  test("engle-granger: a scaled+shifted twin cointegrates with near-unit residual rho") {
    import spark.implicits._
    val ys = Seq(5.0, 9.0, 2.0, 8.0, 1.0, 7.0, 3.0, 6.0, 4.0, 8.5,
      2.5, 7.5, 5.5, 6.5, 3.5, 7.8, 2.8, 6.8, 4.2, 5.8)
    val rows = ys.zipWithIndex.flatMap { case (y, i) =>
      val d = f"2024-02-${i + 1}%02d"
      // station 1 = 2 + 3·(neighbor 2) + small stationary noise
      val noise = 0.05 * (if (i % 2 == 0) 1 else -1)
      Seq((1L, d, Option(2.0 + 3.0 * y + noise)), (2L, d, Option(y)))
    }
    val knn = Seq((1L, 2L, 1), (2L, 1L, 1)).toDF("station_id", "nb_id", "rank")
    val out = Climate.engleGranger(frame(rows), knn).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("cointegrated"), out(1L).toString)
    // the ±0.05 alternating noise correlates slightly with the
    // alternating fixture, nudging the OLS coefficients off (2, 3)
    assert(math.abs(out(1L).getAs[Double]("beta") - 3.0) < 0.05)
    assert(math.abs(out(1L).getAs[Double]("alpha") - 2.0) < 0.3)
    // residuals are alternating-dominated noise -> strong reversion
    assert(out(1L).getAs[Double]("rho") < -1.0)
    assert(out(2L).getAs[Boolean]("cointegrated"))
  }

  test("holt-winters skill: a perfectly weekly-periodic series beats persistence") {
    // 4 weeks of a pure weekday pattern: HW's seasonal index nails it,
    // persistence is wrong at every pattern step
    val pat = Seq(0.0, 10.0, 20.0, 30.0, 20.0, 10.0, 0.0)
    val rows = (0 until 28).map { i =>
      (1L, java.time.LocalDate.of(2024, 3, 1).plusDays(i).toString, Some(pat(i % 7)))
    }
    val r = Climate.holtWintersSkill(frame(rows)).head
    assert(r.getAs[Double]("mae_hw") < r.getAs[Double]("mae_persist"),
      s"hw=${r.getAs[Double]("mae_hw")} persist=${r.getAs[Double]("mae_persist")}")
    assert(r.getAs[Double]("skill") > 0.0)
  }

  test("degree days: hand-checked hdd/cdd and missing census") {
    val temp = Seq(
      (1L, java.sql.Date.valueOf("2024-03-01"), Some(10.0)),
      (1L, java.sql.Date.valueOf("2024-03-02"), Some(25.0)),
      (1L, java.sql.Date.valueOf("2024-03-03"), None))
      .map { case (s, d, t) => (s, d, t.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
      .toDF("station_id", "day", "t")
    val r = Climate.degreeDays(temp).head
    assert(r.getAs[Double]("hdd") === 8.0)  // max(0, 18-10)
    assert(r.getAs[Double]("cdd") === 7.0)  // max(0, 25-18)
    assert(r.getAs[Long]("n_obs") === 2L)
    assert(r.getAs[Long]("n_missing") === 1L)
  }

  test("spi z-scores: complete windows only, zero mean, unit-scale spread") {
    val daily = graft.tsdb.TsQueries.rawDaily(spark, "/root/testdata/sf0.001")
    val out = Climate.spiZscore(daily).collect()
    assert(out.nonEmpty)
    val nDays = daily.select("day").distinct().count()
    val nStations = daily.select("station_id").distinct().count()
    // 6 warm-up days per station are dropped
    assert(out.length === ((nDays - 6) * nStations).toInt)
    out.groupBy(_.getAs[Long]("station_id")).foreach { case (_, rows) =>
      val spis = rows.flatMap(r => Option(r.getAs[java.lang.Double]("spi")))
        .map(_.toDouble)
      if (spis.nonEmpty) {
        val mean = spis.sum / spis.length
        assert(math.abs(mean) < 0.05, s"standardized scores must center ~0: $mean")
      }
    }
  }

  test("mann-kendall: S on a strictly increasing series is n(n-1)/2, trend flagged") {
    val rising = frame((1 to 15).map(i =>
      (1L, f"2024-01-$i%02d", Some(i * 10.0))))
    // granularity="day" isolates the MK math itself on the micro-frame
    val r = Climate.mannKendall(rising, granularity = "day").head
    assert(r.getAs[Long]("s") === 15L * 14 / 2)
    assert(r.getAs[String]("trend") === "increasing")
    val falling = frame((1 to 15).map(i =>
      (1L, f"2024-01-$i%02d", Some(200.0 - i * 10.0))))
    assert(Climate.mannKendall(falling, granularity = "day")
      .head.getAs[String]("trend") === "decreasing")
    // NULL days are excluded from n
    val gappy = frame(Seq((1L, "2024-01-01", Some(1.0)), (1L, "2024-01-02", None),
      (1L, "2024-01-03", Some(2.0))))
    assert(Climate.mannKendall(gappy, granularity = "day")
      .head.getAs[Long]("n") === 2L)
    // the monthly default COLLAPSES a long daily history before the
    // O(n^2) pair join: 15 January days -> one monthly point -> no
    // pairs -> the station drops from the (inner-joined) output
    assert(Climate.mannKendall(rising).count() === 0L)
    // and the in-plan cap guard fails LOUDLY instead of detonating
    // the pair enumeration when the aggregated series is too long
    val err = intercept[Exception] {
      Climate.mannKendall(rising, granularity = "day", cap = 10).collect()
    }
    assert(err.getMessage.contains("graft trend family"),
      s"cap guard must name the fix: ${err.getMessage}")
  }

  test("double mass: proportional records have ~zero deviation, a planted break is found") {
    import org.apache.spark.sql.functions._
    // two stations that are exact multiples of each other -> each is
    // perfectly proportional to its neighbor mean, max_dev ~ 0
    val days = (1 to 20).map(i => f"2024-01-$i%02d")
    val prop = frame(days.zipWithIndex.flatMap { case (d, i) =>
      Seq((1L, d, Some((i + 1) * 2.0)), (2L, d, Some((i + 1) * 4.0)))
    })
    val knn = Seq((1L, 2L, 1), (2L, 1L, 1)).toDF("station_id", "nb_id", "rank")
    val flat = Climate.doubleMass(prop, knn).collect()
    flat.foreach(r => assert(r.getAs[Double]("max_dev") < 0.01,
      s"proportional record must sit on the double-mass line: $r"))
    // plant a regime change in station 1's second half: deviation
    // becomes large and the break day lands at the curve's knee (the
    // last old-regime day — where a double-mass analyst reads it)
    val broken = frame(days.zipWithIndex.flatMap { case (d, i) =>
      val v1 = if (i >= 10) 20.0 else 2.0
      Seq((1L, d, Some(v1)), (2L, d, Some(4.0)))
    })
    val b = Climate.doubleMass(broken, knn).collect()
      .find(_.getAs[Long]("station_id") == 1L).get
    assert(b.getAs[Double]("max_dev") > 1.0)
    assert(b.getAs[java.sql.Date]("break_day").toString === "2024-01-10")
  }

  test("return periods: weibull positions are a bijection over the years") {
    val daily = graft.tsdb.TsQueries.rawDaily(spark, "/root/testdata/sf0.001")
    val out = Climate.returnPeriods(daily).collect()
    out.groupBy(_.getAs[Long]("station_id")).foreach { case (_, rows) =>
      val n = rows.head.getAs[Long]("n_years")
      assert(rows.length === n.toInt)
      assert(rows.map(_.getAs[Int]("m")).sorted.toSeq === (1 to n.toInt))
      // rank 1 = largest max = longest return period (n+1) years
      val top = rows.minBy(_.getAs[Int]("m"))
      assert(top.getAs[Double]("annual_max") ===
        rows.map(_.getAs[Double]("annual_max")).max)
      assert(top.getAs[Double]("return_period") === (n + 1).toDouble)
      // exceedance probabilities are increasing in rank, within (0,1)
      val probs = rows.sortBy(_.getAs[Int]("m")).map(_.getAs[Double]("exc_prob"))
      probs.zip(probs.tail).foreach { case (a, b) =>
        assert(a < b && a > 0 && b < 1)
      }
    }
  }

  test("snht: clean step series recovers the break day and both levels") {
    val days = (0 until 10).map(i => f"2024-01-${i + 1}%02d")
    val df = frame(days.zipWithIndex.map { case (d, i) =>
      (1L, d, Some(if (i < 5) 1.0 else 2.0))
    })
    val r = Climate.snht(df).head
    // z = ±1 throughout, so T_k = k + (n−k) ... maximal T = n at k = 5
    assert(r.getAs[Double]("t_max") === 10.0)
    assert(r.getAs[Double]("mu1") === 1.0)
    assert(r.getAs[Double]("mu2") === 2.0)
    assert(r.getAs[java.sql.Date]("break_day").toString === "2024-01-05")
  }

  test("ks test: disjoint halves give D = 1, homogeneous halves D ≈ 0") {
    val days = (0 until 8).map(i => f"2024-01-${i + 1}%02d")
    val df = frame(days.zipWithIndex.flatMap { case (d, i) =>
      Seq((1L, d, Some(if (i < 4) 1.0 else 2.0)), // shifted
        (2L, d, Some(if (i % 2 == 0) 1.0 else 2.0))) // mixed
    })
    val out = Climate.ksTest(df).collect()
      .map(r => r.getAs[Long]("station_id") -> r).toMap
    assert(out(1L).getAs[Double]("d_stat") === 1.0)
    assert(!out(1L).getAs[Boolean]("same_dist")) // 1·√2 ≈ 1.414 > 1.358
    assert(out(2L).getAs[Double]("d_stat") === 0.0)
    assert(out(2L).getAs[Boolean]("same_dist"))
  }

  test("sax: step series quantizes to a..d word aligned on epoch weeks") {
    // start on an epoch-week boundary so the 28 days are exactly 4 weeks
    val d0 = java.time.LocalDate.ofEpochDay(2820L * 7)
    val df = frame((0 until 28).map { i =>
      (1L, d0.plusDays(i).toString, Some(if (i < 14) 0.0 else 10.0))
    })
    val r = Climate.sax(df).head
    assert(r.getAs[Long]("n_weeks") === 4L)
    assert(r.getAs[String]("sax_word") === "aadd") // z = ∓1 vs ±0.6745
  }

  test("dtw: banded kernel equals the full DP on aligned series, tightening the band never shrinks the distance") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val daily = TsQueries.rawDaily(spark, dir)
    val knn = Neighbors.knnDistBucketed(TsQueries.meta(spark, dir))
    def asMap(band: Int) =
      Climate.dtwNeighbors(daily, knn, band = band).collect()
        .map(r => (r.getAs[Long]("station_id"), r.getAs[Long]("nb_id"))
          -> r.getAs[Double]("dtw")).toMap
    // band >= n is EXACTLY the unbanded DP: the 30-day grid under
    // band=30 and band=1000 must produce identical distances (the
    // windowed kernel degrades to the full recurrence, cell for cell)
    val full = asMap(1000)
    assert(asMap(30) === full,
      "band >= n must reproduce the full DP on the test feed")
    // a tighter band only constrains the path: distances are monotone
    // non-increasing in the band width
    val w7 = asMap(7)
    val w1 = asMap(1)
    full.foreach { case (k, fd) =>
      assert(w7(k) >= fd - 1e-9, s"band=7 below full DP for $k")
      assert(w1(k) >= w7(k) - 1e-9, s"band=1 below band=7 for $k")
    }
    // and the band genuinely bites on a noisy feed: at least one pair's
    // optimal path leaves the ±1 corridor
    assert(w1.exists { case (k, d) => d > full(k) + 1e-6 },
      "band=1 must constrain some pair")
    // equal-length banded DTW is symmetric (cost, band and path set
    // are all role-symmetric) — both knn directions must agree
    w7.foreach { case ((s, n), d) =>
      w7.get((n, s)).foreach(rev => assert(rev === d, s"asymmetry $s<->$n"))
    }
    // the warping value itself: a one-day-shifted twin is a perfect
    // in-band alignment (distance ≈ boundary cost only), far below the
    // rigid lockstep L1 distance
    val vals = Seq(1.0, 9.0, 2.0, 8.0, 3.0, 7.0, 4.0)
    val days = (0 until 8).map(i => f"2024-02-${i + 1}%02d")
    val twin = frame(days.zipWithIndex.flatMap { case (d, i) =>
      Seq((1L, d, Some(if (i < 7) vals(i) else 0.0)),
        (2L, d, Some(if (i == 0) 0.0 else vals(i - 1))))
    })
    val k1 = Seq((1L, 2L, 1)).toDF("station_id", "nb_id", "rank")
    val dtw = Climate.dtwNeighbors(twin, k1, band = 3).head.getAs[Double]("dtw")
    val lockstep = days.indices.map { i =>
      val a = if (i < 7) vals(i) else 0.0
      val b = if (i == 0) 0.0 else vals(i - 1)
      math.abs(a - b)
    }.sum
    assert(dtw < lockstep / 4, s"warping must beat lockstep: $dtw vs $lockstep")
    // PAA pre-aggregation path runs, and the cap guard fails loudly
    assert(Climate.dtwNeighbors(daily, knn, granularity = "week")
      .count() > 0)
    val err = intercept[Exception] {
      Climate.dtwNeighbors(daily, knn, cap = 3).collect()
    }
    assert(err.getMessage.contains("graft dtwNeighbors"), err.getMessage)
  }

  test("cross-correlation: a one-day-shifted twin peaks at lag +1") {
    import spark.implicits._
    val vals = Seq(1.0, 5.0, 2.0, 8.0, 3.0)
    val days = (0 until 6).map(i => f"2024-02-${i + 1}%02d")
    val df = frame(days.zipWithIndex.flatMap { case (d, i) =>
      Seq((1L, d, Some(if (i < 5) vals(i) else 0.0)),
        (2L, d, Some(if (i == 0) 0.0 else vals(i - 1)))) // x shifted +1 day
    })
    val knn = Seq((1L, 2L, 1)).toDF("station_id", "nb_id", "rank")
    val rows = Climate.crossCorr(df, knn).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("r")).toMap
    assert(rows(1) === 1.0) // perfect alignment at lag +1
    assert(rows(-1) < 1.0 && rows(0) < 1.0)
  }
}
