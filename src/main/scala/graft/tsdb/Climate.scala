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

  /** Engine↔oracle shared defaults: TsOracle interpolates these into
    * its SQL so a default change can never silently break parity
    * (round-7 ADVICE: the oracle twins hardcoded 3/0.05/3.0/7). */
  val EsdK = 3
  val EsdAlpha = 0.05
  val SnowpackDdf = 3.0
  val LowessHalf = 7

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
    val runs = runStats(base.filter(col("dry")), minLen = 1)
    base.groupBy(col("station_id"), col("yr"))
      .agg(count(lit(1)).as("n_days"))
      .join(runs, Seq("station_id", "yr"), "left")
      .select(col("station_id"), col("yr"), col("n_days"),
        coalesce(col("run_days"), lit(0L)).as("n_dry"),
        coalesce(col("longest_run"), lit(0L)).as("max_dry_run"))
  }

  /** ETCCDI precipitation-index family per (station, year) — the
    * counts the reference's climate reporting sits next to
    * (frost-day counts, Rx5day and R95pTOT are siblings): R10mm /
    * R20mm heavy-precip day counts, SDII (mean intensity on wet
    * days), and CWD (longest consecutive wet run, the wet mirror of
    * [[drySpells]]' CDD).
    *
    * Plan: one keyed aggregate for the counts + the shared
    * [[runStats]] gaps-and-islands census for CWD — both
    * partition-local per station. */
  def precipIndices(rawDaily: DataFrame, wetThresh: Double = 1.0): DataFrame = {
    val base = rawDaily
      .withColumn("yr", year(col("day")))
      .withColumn("x", coalesce(col("raw"), lit(0.0)))
    val counts = base.groupBy(col("station_id"), col("yr"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("x") >= wetThresh, 1L).otherwise(0L)).as("wet_days"),
        sum(when(col("x") >= 10.0, 1L).otherwise(0L)).as("r10mm"),
        sum(when(col("x") >= 20.0, 1L).otherwise(0L)).as("r20mm"),
        sum(when(col("x") >= wetThresh, col("x")).otherwise(lit(0.0))).as("wet_sum"))
      .withColumn("sdii", when(col("wet_days") > 0,
        round(col("wet_sum") / col("wet_days") + lit(1e-9), 4)))
      .drop("wet_sum")
    val wet = runStats(base.filter(col("x") >= wetThresh), minLen = 1)
      .select(col("station_id"), col("yr"), col("longest_run").as("cwd"))
    counts.join(wet, Seq("station_id", "yr"), "left")
      .withColumn("cwd", coalesce(col("cwd"), lit(0L)))
      .select(col("station_id"), col("yr"), col("n_days"), col("wet_days"),
        col("r10mm"), col("r20mm"), col("sdii"), col("cwd"))
  }

  /** Percentile-based temperature exceedance indices (ETCCDI TX90p /
    * TN10p): share of days whose max exceeds the station's 90th
    * max-percentile, and whose min undercuts the station's 10th
    * min-percentile, with the whole record as the base period.
    *
    * Plan: the threshold frame is one exact-percentile keyed
    * aggregate (O(#stations) rows) broadcast back onto the grid scan;
    * the shares are a second keyed aggregate. */
  def txTnPercentile(tempStats: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val obs = tempStats.filter(col("t_min").isNotNull)
    val thresh = obs.groupBy(col("station_id"))
      .agg(round(expr("percentile(t_max, 0.9D)") + lit(1e-9), 6).as("tx90"),
        round(expr("percentile(t_min, 0.1D)") + lit(1e-9), 6).as("tn10"))
    obs.join(broadcast(thresh), Seq("station_id"))
      .groupBy(col("station_id"), col("tx90"), col("tn10"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("t_max") > col("tx90"), 1L).otherwise(0L)).as("n_tx90p"),
        sum(when(col("t_min") < col("tn10"), 1L).otherwise(0L)).as("n_tn10p"))
      .withColumn("tx90p_share",
        round(col("n_tx90p") / col("n_days").cast("double") + lit(1e-9), 6))
      .withColumn("tn10p_share",
        round(col("n_tn10p") / col("n_days").cast("double") + lit(1e-9), 6))
      .select(col("station_id"), col("n_days"), col("tx90"), col("tn10"),
        col("n_tx90p"), col("n_tn10p"), col("tx90p_share"), col("tn10p_share"))
  }

  /** Shared gaps-and-islands run census: over rows carrying
    * (station_id, yr, day) that SATISFY the run predicate, per
    * (station, yr) the count / total days / longest of the
    * consecutive-day runs of length ≥ `minLen` (run key =
    * day ordinal − row_number, constant within a consecutive run).
    * One partition-local window + two keyed aggregates — the single
    * implementation behind [[drySpells]] and [[heatWaves]]. */
  private def runStats(days: DataFrame, minLen: Int): DataFrame = {
    val w = Window.partitionBy(col("station_id"), col("yr")).orderBy(col("day"))
    days
      .withColumn("grp",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          - row_number().over(w))
      .groupBy(col("station_id"), col("yr"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minLen)
      .groupBy(col("station_id"), col("yr"))
      .agg(count(lit(1)).as("n_runs"), sum(col("run_len")).as("run_days"),
        max(col("run_len")).as("longest_run"))
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

  /** Standardized precipitation index, z-score form over k-day
    * accumulations (the SPI drought index's shape; the gamma-fitted
    * original swaps into the same plan): each trailing `accDays`-day
    * precipitation total standardized against the station's own
    * distribution of such totals; `spi < -1` ≈ dry spell, `> 1` ≈ wet.
    * Only complete windows score (the first accDays−1 days are
    * warm-up); a zero-variance station yields NULL, not a fake score.
    * With multi-year data the climatology population narrows to the
    * same calendar window across years — identical plan, one more
    * grouping column.
    *
    * Plan: ONE trailing window per station (partition-local on the
    * series partitioning), one keyed aggregate for the per-station
    * stats, one keyed join back. */
  def spiZscore(rawDaily: DataFrame, accDays: Int = 7): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
      .rowsBetween(-(accDays - 1), 0)
    val acc = rawDaily
      .withColumn("p_acc",
        round(sum(coalesce(col("raw"), lit(0.0))).over(w) + lit(1e-9), 3))
      .withColumn("w_size", count(lit(1)).over(w))
      .filter(col("w_size") === accDays)
    val stats = acc.groupBy(col("station_id"))
      .agg(round(avg(col("p_acc")) + lit(1e-9), 6).as("clim_mean"),
        round(stddev_samp(col("p_acc")) + lit(1e-9), 6).as("clim_sd"))
    acc.join(stats, Seq("station_id"))
      .withColumn("spi",
        when(col("clim_sd") > 0.0,
          round((col("p_acc") - col("clim_mean")) / col("clim_sd") + lit(1e-9), 4)))
      .select(col("station_id"), col("day"), col("p_acc"), col("clim_mean"),
        col("clim_sd"), col("spi"))
  }

  /** Default per-station point cap for the trend family's O(n²) pair
    * enumerations: 2400 monthly points = 200 years of record — far
    * above any real station history, low enough that 2400² ≈ 2.9M
    * join rows per station stays a healthy task. */
  val TrendCap = 2400

  /** Input builder shared by the pairwise trend/scale family
    * ([[mannKendall]], [[theilSen]], [[snScale]]): the observed
    * per-station series pre-aggregated to `granularity` INSIDE the
    * operator — "day" passes the series through, "week"/"month"/"year"
    * truncate the day and average the observed values per period (the
    * practice standard: trend tests run on aggregate series, never on
    * a 100-year daily history). A LOUD in-plan guard enforces the
    * per-station point count ≤ `cap` AFTER aggregation: the guard is
    * an `assert_true` folded into the value column itself, so Catalyst
    * cannot prune it and a too-long series fails the job with a
    * message naming the fix (coarser granularity) instead of
    * detonating an O(n²)-per-station shuffle.
    *
    * Plan: one map-combinable keyed aggregate (or a pass-through
    * projection for "day") + one partition-local count window per
    * station; the downstream pair enumeration is then provably
    * bounded at cap² rows per station. */
  private[tsdb] def trendSeries(rawDaily: DataFrame, granularity: String,
      cap: Int): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
    val agg = granularity match {
      case "day" =>
        obs.select(col("station_id"), col("day"), col("raw").as("p"))
      case g =>
        obs.groupBy(col("station_id"), trunc(col("day"), g).as("day"))
          .agg(round(avg(col("raw")) + lit(1e-9), 6).as("p"))
    }
    val n = count(lit(1)).over(Window.partitionBy(col("station_id")))
    agg.withColumn("p", col("p") + coalesce(
      assert_true(n <= cap,
        concat(lit("graft trend family: per-station series has "), n,
          lit(s" > $cap points after granularity='$granularity' aggregation" +
            " — pass a coarser granularity (month/year) or raise the cap" +
            " before the O(n^2) pair enumeration"))).cast("double"),
      lit(0.0)))
  }

  /** Mann–Kendall trend test per station (the standard non-parametric
    * hydrology trend detector): over the station's observed series —
    * pre-aggregated to `granularity` inside the operator (see
    * [[trendSeries]]; "month" by default, the practice standard; the
    * 30-day test feed runs at "week") — `S = Σ_{i<j} sign(x_j −
    * x_i)`, normal approximation `var(S) = n(n−1)(2n+5)/18` (no tie
    * correction — 3-dp daily sums make exact ties vanishingly rare; a
    * tie only shrinks |z|), and the ±1.96 two-sided 5% significance
    * call.
    *
    * Plan: the pair enumeration is per STATION — an equi-join on
    * station_id over the aggregated frame, then one keyed aggregate;
    * [[trendSeries]]'s cap guard makes the per-station O(n²) provably
    * bounded (≤ cap² rows) regardless of raw history length. */
  def mannKendall(rawDaily: DataFrame, granularity: String = "month",
      cap: Int = TrendCap): DataFrame = {
    // the observed frame feeds BOTH self-join sides and the count —
    // persist it so a non-memoized input is not scanned three times,
    // and materialize the (tiny, O(#stations)) result before release
    val annual = trendSeries(rawDaily, granularity, cap)
      .select(col("station_id"), col("day").as("yr"), col("p"))
      .persist()
    try {
      val a = annual.select(col("station_id"), col("yr").as("yi"), col("p").as("xi"))
      val b = annual.select(col("station_id"), col("yr").as("yj"), col("p").as("xj"))
      val out = a.join(b, Seq("station_id")).filter(col("yi") < col("yj"))
        .groupBy(col("station_id"))
        .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s"))
        .join(annual.groupBy(col("station_id")).agg(count(lit(1)).as("n")),
          Seq("station_id"))
        .withColumn("var_s",
          round(col("n") * (col("n") - 1) * (col("n") * 2 + 5) / lit(18.0)
            + lit(1e-9), 6))
        // continuity-corrected z: sign(S)·(|S|−1)/sqrt(var); S=0 → 0
        .withColumn("z",
          when(col("s") === 0, lit(0.0)).otherwise(
            round(signum(col("s")) * (abs(col("s")) - 1) / sqrt(col("var_s"))
              + lit(1e-9), 4)))
        .withColumn("trend",
          when(col("z") > 1.96, lit("increasing"))
            .when(col("z") < -1.96, lit("decreasing"))
            .otherwise(lit("none")))
        .select(col("station_id"), col("n"), col("s"), col("var_s"), col("z"),
          col("trend"))
      out.localCheckpoint(true)
    } finally annual.unpersist()
  }

  /** Flow-duration curve per station (THE hydrology summary curve:
    * the value equalled or exceeded e·100% of the time, at the
    * standard exceedance ladder): quantiles of the observed daily
    * series at p = 1 − e.
    *
    * Plan: ONE keyed exact-percentile aggregate (array form — one
    * pass), ×|ladder| posexplode of the O(#stations) result. */
  def flowDuration(rawDaily: DataFrame,
      probs: Seq[Double] = Seq(0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95))
      : DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString(", ")
    rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        expr(s"percentile(raw, array($arr))").as("qs"))
      .select(col("station_id"), col("n"), posexplode(col("qs")))
      .withColumn("prob", element_at(lit(probs.toArray), col("pos") + 1))
      .withColumn("exceed_prob", round(lit(1.0) - col("prob"), 2))
      .select(col("station_id"), col("n"), col("prob"), col("exceed_prob"),
        round(col("col") + lit(1e-9), 4).as("q"))
  }

  /** Peaks-over-threshold declustering per station (the EVT
    * preprocessing step [[potGpd]] idealizes away: consecutive
    * exceedance days are ONE storm, not independent events): runs of
    * days above the exact p95 threshold, with cluster count, mean/max
    * cluster length and the exceedance-to-cluster ratio (≈ the
    * extremal index's reciprocal).
    *
    * Plan: threshold = one keyed aggregate joined back, runs =
    * gaps-and-islands on ONE (station, day) ordered window, two keyed
    * rollups. */
  def potDecluster(rawDaily: DataFrame): DataFrame = {
    val thr = rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"))
      .agg(round(expr("percentile(raw, 0.95D)") + lit(1e-9), 4).as("u"))
    val flagged = rawDaily.join(thr, Seq("station_id"))
      .withColumn("ex", coalesce(col("raw") > col("u"), lit(false)))
    val w = Window.partitionBy(col("station_id"), col("ex")).orderBy(col("day"))
    val runs = flagged
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .filter(col("ex"))
      .groupBy(col("station_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    runs.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("len")).as("n_exceed"),
        round(avg(col("len")) + lit(1e-9), 4).as("mean_len"),
        max(col("len")).as("max_len"))
      .withColumn("extremal_ratio",
        round(col("n_clusters") / col("n_exceed").cast("double") + lit(1e-9), 6))
  }

  /** Empirical-Bayes shrinkage of per-station wet-day rates (the
    * James–Stein staple: a short-record station's raw rate is noisy —
    * shrink it toward the network mean by the Beta prior fit with
    * method of moments from the station rates themselves):
    * posterior = (k + α)/(n + α + β).
    *
    * Plan: one keyed station collapse, a 1-row moment frame for the
    * prior (scalar broadcast), stateless closed form — the
    * whole "fit prior on the population, apply per member" pattern in
    * two map-combinable aggregates. */
  def ebShrinkage(rawDaily: DataFrame, wetThresh: Double = 25.0): DataFrame = {
    val per = rawDaily.groupBy(col("station_id"))
      .agg(count(col("raw")).as("n"),
        sum(when(col("raw") > wetThresh, 1L).otherwise(0L)).as("k"))
      .filter(col("n") > 0)
      .withColumn("rate", round(col("k") / col("n").cast("double") + lit(1e-9), 6))
    val prior = per.agg(
        round(avg(col("rate")) + lit(1e-9), 6).as("mu"),
        round(var_samp(col("rate")) + lit(1e-9), 8).as("s2"),
        round(avg(col("n").cast("double")) + lit(1e-9), 2).as("mean_n"))
      // method of moments: ν = μ(1−μ)/s² − 1; α = μν, β = (1−μ)ν
      .withColumn("nu",
        when(col("s2") > 0.0,
          greatest(col("mu") * (lit(1.0) - col("mu")) / col("s2") - 1.0,
            lit(1.0))).otherwise(lit(1.0)))
      .select(round(col("mu") * col("nu") + lit(1e-9), 6).as("alpha"),
        round((lit(1.0) - col("mu")) * col("nu") + lit(1e-9), 6).as("beta"))
    per.crossJoin(broadcast(prior))
      .withColumn("shrunk_rate",
        round((col("k") + col("alpha"))
          / (col("n") + col("alpha") + col("beta")) + lit(1e-9), 6))
      .select(col("station_id"), col("n"), col("k"), col("rate"),
        col("alpha"), col("beta"), col("shrunk_rate"))
  }

  /** Upper-tail dependence χ between each station and its kNN
    * neighbors (the spatial-extremes question behind design storms:
    * when I flood, does my neighbor flood TOO?): χ = P(neighbor
    * exceeds its own p90 | station exceeds its own p90), i.e. the raw
    * conditional exceedance probability n_joint / n_ex_i over the
    * pair's common days — χ → 1 means extremes co-occur; under
    * independence χ → P(exceed) = 0.1.
    *
    * Plan: per-station exact p90 thresholds (keyed aggregate,
    * broadcast-sized), the knn map exploded once against the daily
    * series keyed on (neighbor, day) — the neighborCorr join shape —
    * one keyed pair rollup. */
  def tailDependence(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
    val thr = obs.groupBy(col("station_id"))
      .agg(round(expr("percentile(raw, 0.9D)") + lit(1e-9), 4).as("q90"))
    val x = obs.join(thr, Seq("station_id"))
      .select(col("station_id"), col("day"),
        (col("raw") > col("q90")).as("ex_i"))
    val y = x.select(col("station_id").as("nb_id"), col("day"),
      col("ex_i").as("ex_j"))
    x.join(broadcast(knn.select(col("station_id"), col("nb_id"), col("rank"))),
        Seq("station_id"))
      .join(y, Seq("nb_id", "day"))
      .groupBy(col("station_id"), col("nb_id"), col("rank"))
      .agg(count(lit(1)).as("n_days"),
        sum((col("ex_i") && col("ex_j")).cast("long")).as("n_joint"),
        sum(col("ex_i").cast("long")).as("n_ex_i"))
      .withColumn("chi",
        when(col("n_ex_i") > 0,
          round(col("n_joint") / col("n_ex_i").cast("double") + lit(1e-9), 6)))
      .select(col("station_id"), col("nb_id"), col("rank"), col("n_days"),
        col("n_joint"), col("chi"))
  }

  /** Effective sample size per station under lag-1 autocorrelation
    * (the honest n every CI in this file should divide by):
    * n_eff = n·(1−r₁)/(1+r₁) — an AR(1) world's variance inflation.
    * Reported with the plain and the deflated standard error of the
    * mean.
    *
    * Plan: exactly [[acf]]'s cost at maxLag 1, closed form on the
    * O(#stations) frame. */
  def effectiveSampleSize(rawDaily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val x = rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
      .withColumn("x1", lag(col("x"), 1).over(w))
    val m = x.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("xbar"))
    x.join(m, Seq("station_id"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("x") - col("xbar")) * (col("x") - col("xbar"))).as("den"),
        sum((col("x") - col("xbar")) * (col("x1") - col("xbar"))).as("num"))
      .withColumn("r1",
        when(col("den") > 0.0, round(col("num") / col("den") + lit(1e-9), 4)))
      .withColumn("n_eff",
        when(col("r1") < 1.0 && col("r1").isNotNull,
          round(col("n") * (lit(1.0) - col("r1")) / (lit(1.0) + col("r1"))
            + lit(1e-9), 2)))
      .withColumn("se_plain",
        when(col("den") > 0.0,
          round(sqrt(col("den") / col("n")) / sqrt(col("n").cast("double"))
            + lit(1e-9), 6)))
      .withColumn("se_eff",
        when(col("n_eff") > 0.0,
          round(sqrt(col("den") / col("n")) / sqrt(col("n_eff"))
            + lit(1e-9), 6)))
      .select(col("station_id"), col("n"), col("r1"), col("n_eff"),
        col("se_plain"), col("se_eff"))
  }

  /** Regional (field) significance of the per-station Mann–Kendall
    * trends — the multiple-testing guard of regional climate
    * analysis: with 5%-level station tests, ~5% significant stations
    * are EXPECTED under no trend; the binomial z on the significant
    * share says whether the REGION trends (Livezey–Chen field
    * significance, the hypothesis-count cousin of q_bh_fdr).
    *
    * Plan: [[mannKendall]]'s per-station frame collapsed by one
    * scalar rollup. */
  def fieldSignificance(rawDaily: DataFrame, alpha: Double = 0.05,
      granularity: String = "month", cap: Int = TrendCap): DataFrame =
    mannKendall(rawDaily, granularity, cap)
      .agg(count(lit(1)).as("n_stations"),
        sum(when(col("trend") =!= "none", 1L).otherwise(0L)).as("n_sig"),
        sum(when(col("trend") === "increasing", 1L).otherwise(0L)).as("n_inc"),
        sum(when(col("trend") === "decreasing", 1L).otherwise(0L)).as("n_dec"))
      .withColumn("sig_share",
        round(col("n_sig") / col("n_stations").cast("double") + lit(1e-9), 6))
      .withColumn("z_field",
        round((col("n_sig") - lit(alpha) * col("n_stations"))
          / sqrt(col("n_stations") * lit(alpha) * lit(1.0 - alpha))
          + lit(1e-9), 4))
      .withColumn("field_significant", col("z_field") > 1.645)

  /** Classical additive seasonal decomposition per station
    * (x = trend + seasonal + residual — the moving-average
    * decomposition behind every "is this anomaly weather or climate?"
    * question): trend is a centered `2k+1`-day moving average
    * (complete windows only), the seasonal component is the
    * month-of-year mean of the detrended series, the residual is what
    * remains.
    *
    * Plan: ONE centered window per station (partition-local), one
    * keyed aggregate to ≤ 12 rows per station joined back — the same
    * two-shuffle shape as SPI. */
  def seasonalDecompose(rawDaily: DataFrame, halfWindow: Int = 14): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    val z = coalesce(col("raw"), lit(0.0))
    val withTrend = rawDaily
      .withColumn("x", z)
      .withColumn("trend",
        when(count(lit(1)).over(w) === 2 * halfWindow + 1,
          round(avg(z).over(w) + lit(1e-9), 6)))
      .withColumn("moy", month(col("day")))
    val seasonal = withTrend.filter(col("trend").isNotNull)
      .groupBy(col("station_id"), col("moy"))
      .agg(round(avg(col("x") - col("trend")) + lit(1e-9), 6).as("seasonal"))
    withTrend.join(seasonal, Seq("station_id", "moy"), "left")
      .withColumn("resid",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          round(col("x") - col("trend") - col("seasonal") + lit(1e-9), 4)))
      .select(col("station_id"), col("day"), col("x"), col("trend"),
        col("seasonal"), col("resid"))
  }

  /** Trend / seasonality strength per station (Hyndman's STL-feature
    * pair, the single-number summary read off [[seasonalDecompose]]):
    * F_T = max(0, 1 − Var(R)/Var(T+R)), F_S = max(0, 1 −
    * Var(R)/Var(S+R)), over the rows where the centered trend window
    * is complete. One keyed variance aggregate on the decompose
    * frame — no cost beyond the decomposition itself. */
  def seasonalStrength(rawDaily: DataFrame): DataFrame = {
    val d = seasonalDecompose(rawDaily).filter(col("resid").isNotNull)
    d.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(var_pop(col("resid")) + lit(1e-9), 6).as("v_r"),
        round(var_pop(col("x") - col("seasonal")) + lit(1e-9), 6).as("v_tr"),
        round(var_pop(col("x") - col("trend")) + lit(1e-9), 6).as("v_sr"))
      .withColumn("f_trend", when(col("v_tr") > 0.0,
        round(greatest(lit(0.0), lit(1.0) - col("v_r") / col("v_tr"))
          + lit(1e-9), 6)))
      .withColumn("f_seasonal", when(col("v_sr") > 0.0,
        round(greatest(lit(0.0), lit(1.0) - col("v_r") / col("v_sr"))
          + lit(1e-9), 6)))
      .select(col("station_id"), col("n"), col("v_r"), col("f_trend"),
        col("f_seasonal"))
  }

  /** Theil–Sen slope estimator per station (the robust trend
    * magnitude always reported NEXT to the Mann–Kendall test: MK says
    * WHETHER a monotone trend exists, Theil–Sen says HOW STEEP,
    * immune to outliers that wreck least squares): the median of all
    * pairwise slopes `(x_j − x_i) / (days between)` over the observed
    * series, pre-aggregated to `granularity` inside the operator
    * ([[trendSeries]] — "month" default, cap-guarded).
    *
    * Plan: the same per-station pair enumeration as [[mannKendall]]
    * — bounded at cap² rows per station by [[trendSeries]]'s loud
    * guard — then one keyed percentile aggregate; interpolation runs
    * over identically-computed quotients on both engines. */
  def theilSen(rawDaily: DataFrame, granularity: String = "month",
      cap: Int = TrendCap): DataFrame = {
    val obs = trendSeries(rawDaily, granularity, cap)
      .select(col("station_id"),
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          .as("t"), col("p"))
    val a = obs.select(col("station_id"), col("t").as("ti"), col("p").as("xi"))
    val b = obs.select(col("station_id"), col("t").as("tj"), col("p").as("xj"))
    a.join(b, Seq("station_id")).filter(col("ti") < col("tj"))
      .withColumn("slope", (col("xj") - col("xi")) / (col("tj") - col("ti")))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5D)") + lit(1e-9), 6).as("sen_slope"))
  }

  /** Wald–Wolfowitz runs test per station (serial-randomness check —
    * a record failing it has clustering/persistence its QC or trend
    * analysis must account for): runs of above/below-median observed
    * days vs the expected run count under randomness, normal
    * approximation z. Median ties drop (the standard treatment).
    *
    * Plan: broadcast-joined per-station median (O(#stations)), one
    * partition-local lag window for run starts, ONE keyed aggregate;
    * the closed-form moments are a stateless projection. */
  def runsTest(rawDaily: DataFrame): DataFrame = {
    val med = rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"))
      .agg(round(expr("percentile(raw, 0.5D)") + lit(1e-9), 6).as("med"))
    val signed = rawDaily.filter(col("raw").isNotNull)
      .join(med, Seq("station_id"))
      .filter(col("raw") =!= col("med"))
      .withColumn("up", (col("raw") > col("med")).cast("int"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val agg = signed
      .withColumn("chg",
        when(lag(col("up"), 1).over(w).isNull ||
          lag(col("up"), 1).over(w) =!= col("up"), 1L).otherwise(0L))
      .groupBy(col("station_id"))
      .agg(sum(col("chg")).as("n_runs"),
        sum(col("up")).cast("long").as("n1"),
        sum(lit(1) - col("up")).cast("long").as("n2"))
    agg
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("e_runs",
        round(lit(2.0) * col("n1") * col("n2") / col("n") + lit(1.0)
          + lit(1e-9), 6))
      .withColumn("var_runs",
        when(col("n") > 1,
          round(lit(2.0) * col("n1") * col("n2")
            * (lit(2.0) * col("n1") * col("n2") - col("n"))
            / (col("n") * col("n") * (col("n") - lit(1.0))) + lit(1e-9), 6)))
      .withColumn("z",
        when(col("var_runs") > 0.0,
          round((col("n_runs") - col("e_runs")) / sqrt(col("var_runs"))
            + lit(1e-9), 4)))
      .select(col("station_id"), col("n1"), col("n2"), col("n_runs"),
        col("e_runs"), col("var_runs"), col("z"))
  }

  /** Double-mass homogeneity check (the classic gauge-consistency
    * curve): cumulative station precipitation against the cumulative
    * mean of its k nearest neighbors; a homogeneous record tracks the
    * line `cum_s = β·cum_n` (β = ratio of the period totals), and the
    * largest deviation from it marks the candidate break point an
    * analyst inspects (instrument change, relocation).
    *
    * Plan: the neighbor day-mean is one keyed join of the broadcast
    * knn map with the daily frame + a (station, day) aggregate
    * co-partitioned with the series; both cumulative sums are ONE
    * partition-local ordered window per station (an ordered fold —
    * deterministic on both engines); β and the totals come from a
    * keyed aggregate joined back. Nothing global. */
  def doubleMass(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val nbMean = knn.select(col("station_id"), col("nb_id"))
      .join(rawDaily.select(col("station_id").as("nb_id"), col("day"),
        col("raw").as("nb_raw")), Seq("nb_id"))
      .groupBy(col("station_id"), col("day"))
      .agg(round(avg(coalesce(col("nb_raw"), lit(0.0))) + lit(1e-9), 6)
        .as("nb_mean"))
    val base = rawDaily.select(col("station_id"), col("day"), col("raw"))
      .join(nbMean, Seq("station_id", "day"), "left")
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base
      .withColumn("cum_s",
        round(sum(coalesce(col("raw"), lit(0.0))).over(w) + lit(1e-9), 3))
      .withColumn("cum_n",
        round(sum(coalesce(col("nb_mean"), lit(0.0))).over(w) + lit(1e-9), 3))
    val totals = base.groupBy(col("station_id"))
      .agg(round(sum(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 3).as("total_s"),
        round(sum(coalesce(col("nb_mean"), lit(0.0))) + lit(1e-9), 3).as("total_n"))
      .withColumn("beta",
        when(col("total_n") > 0.0,
          round(col("total_s") / col("total_n") + lit(1e-9), 6)))
    cum.join(totals, Seq("station_id"))
      .withColumn("dev",
        round(abs(col("cum_s") - col("beta") * col("cum_n")) + lit(1e-9), 4))
      .withColumn("day_ord",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
      .groupBy(col("station_id"), col("total_s"), col("total_n"), col("beta"))
      .agg(max(struct(col("dev"), (-col("day_ord")).as("nday"))).as("best"))
      .select(col("station_id"), col("total_s"), col("total_n"), col("beta"),
        col("best.dev").as("max_dev"),
        date_add(lit(java.sql.Date.valueOf("1970-01-01")), (-col("best.nday"))
          .cast("int")).as("break_day"))
  }

  /** ETCCDI threshold count indices per (station, year) from the daily
    * temperature extrema: frost days (t_min < 0), ice days
    * (t_max < 0), summer days (t_max > 25), tropical nights
    * (t_min > 20) — the standard climate-change monitoring counts.
    * Days without a temperature observation contribute to no count and
    * are reported as the year's missing tally.
    *
    * Plan: ONE map-combinable keyed aggregate per (station, year) over
    * the dense grid; no window, no join. */
  def countIndices(tMinMax: DataFrame): DataFrame =
    tMinMax
      .withColumn("yr", year(col("day")))
      .groupBy(col("station_id"), col("yr"))
      .agg(
        count(when(col("t_min") < 0.0, lit(1))).as("frost_days"),
        count(when(col("t_max") < 0.0, lit(1))).as("ice_days"),
        count(when(col("t_max") > 25.0, lit(1))).as("summer_days"),
        count(when(col("t_min") > 20.0, lit(1))).as("tropical_nights"),
        count(col("t_min")).as("n_obs"),
        sum(when(col("t_min").isNull, 1L).otherwise(0L)).as("n_missing"))

  /** Annual maximum k-day precipitation (the ETCCDI Rx1day/Rx5day
    * indices): per (station, year) the wettest single observed day and
    * the wettest trailing `accDays`-day accumulation (missing days
    * accumulate 0, as a gauge that recorded nothing would; only
    * complete windows compete, and a window is attributed to the year
    * of its END day — ETCCDI's convention for year-spanning windows).
    *
    * Plan: one trailing window per station (partition-local on the
    * series partitioning), then ONE map-combinable keyed aggregate. */
  def rxNday(rawDaily: DataFrame, accDays: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
      .rowsBetween(-(accDays - 1), 0)
    rawDaily
      .withColumn("acc",
        round(sum(coalesce(col("raw"), lit(0.0))).over(w) + lit(1e-9), 3))
      .withColumn("w_size", count(lit(1)).over(w))
      .groupBy(col("station_id"), year(col("day")).as("yr"))
      .agg(max(col("raw")).as("rx1day"),
        max(when(col("w_size") === accDays, col("acc"))).as(s"rx${accDays}day"))
  }

  /** Very-wet-day precipitation total (the ETCCDI R95pTOT index): per
    * station, the 95th percentile of WET days (raw ≥ `wetThresh`) over
    * the whole period, then the total / count / share of precipitation
    * falling on days exceeding it. Exact interpolated percentile here
    * (the oracle pins the semantics); `approx_percentile` is the
    * mergeable 100 TB swap-in with the identical plan shape.
    *
    * Plan: one keyed aggregate for the per-station cutoff (O(#stations)
    * rows), one keyed join back, one final keyed aggregate — no window
    * over the day frame. */
  def r95p(rawDaily: DataFrame, wetThresh: Double = 25.0): DataFrame = {
    val wet = rawDaily.filter(col("raw") >= wetThresh)
    val cut = wet.groupBy(col("station_id"))
      .agg(round(expr("percentile(raw, 0.95D)") + lit(1e-9), 6).as("p95"),
        count(lit(1)).as("n_wet"))
    wet.join(cut, Seq("station_id"))
      .groupBy(col("station_id"), col("p95"), col("n_wet"))
      .agg(
        count(when(col("raw") > col("p95"), lit(1))).as("n_very_wet"),
        round(sum(when(col("raw") > col("p95"), col("raw")).otherwise(lit(0.0)))
          + lit(1e-9), 3).as("r95p_total"),
        round(sum(col("raw")) + lit(1e-9), 3).as("wet_total"))
      .withColumn("r95p_share",
        when(col("wet_total") > 0.0,
          round(col("r95p_total") / col("wet_total") + lit(1e-9), 6)))
      .select(col("station_id"), col("p95"), col("n_wet"), col("n_very_wet"),
        col("r95p_total"), col("wet_total"), col("r95p_share"))
  }

  /** Month-of-year climatology and per-day anomaly (deseasonalization
    * — the preprocessing step of every drought/trend analysis): per
    * (station, calendar month 1-12) the mean observed daily sum, and
    * each observed day's departure from its month's climatology.
    *
    * Plan: one keyed aggregate to ≤ 12 rows per station, one keyed
    * join back — both on the station partitioning; no window. */
  def climatology(rawDaily: DataFrame): DataFrame = {
    val clim = rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("moy"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("clim"),
        count(lit(1)).as("n_clim"))
    rawDaily
      .withColumn("moy", month(col("day")))
      .join(clim, Seq("station_id", "moy"), "left")
      .withColumn("anom",
        when(col("raw").isNotNull,
          round(col("raw") - col("clim") + lit(1e-9), 4)))
      .select(col("station_id"), col("day"), col("moy"), col("raw"),
        col("clim"), col("n_clim"), col("anom"))
  }

  /** Month-of-year climatology percentile envelope (the p10/p50/p90
    * band plotted behind every station dashboard — [[climatology]]
    * gives the mean, this the spread): exact interpolated percentiles
    * of the observed daily sums per (station, calendar month);
    * `approx_percentile` is the mergeable 100 TB swap-in.
    *
    * Plan: ONE keyed aggregate to ≤ 12 rows per station — the sort
    * percentile needs runs inside each tiny (station, month) group. */
  def climatologyBands(rawDaily: DataFrame): DataFrame =
    rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("moy"))
      .agg(count(lit(1)).as("n_obs"),
        round(expr("percentile(raw, 0.1D)") + lit(1e-9), 6).as("p10"),
        round(expr("percentile(raw, 0.5D)") + lit(1e-9), 6).as("p50"),
        round(expr("percentile(raw, 0.9D)") + lit(1e-9), 6).as("p90"))

  /** Per-day temperature lapse rate across the station network: the
    * least-squares slope of daily temperature against station
    * elevation (°C per elevation unit) — the regression behind the
    * reference's elevation-aware T regionalization (LARSIM weighting,
    * StationBases.py:2196) made explicit. Closed-form simple
    * regression from the five sufficient sums; days with < 3 reporting
    * stations or degenerate elevation variance yield NULLs.
    *
    * Plan: broadcast meta join (elevation is O(#stations)), then ONE
    * map-combinable keyed aggregate per day — the sums shuffle, the
    * rows don't. r² guarded for zero temperature variance. */
  def lapseRate(tempDaily: DataFrame, meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val obs = tempDaily.filter(col("t").isNotNull)
      .join(broadcast(meta.select(col("station_id"), col("elev"))), Seq("station_id"))
    obs.groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("elev")).as("sx"), sum(col("t")).as("sy"),
        sum(col("elev") * col("elev")).as("sxx"),
        sum(col("t") * col("t")).as("syy"),
        sum(col("elev") * col("t")).as("sxy"))
      .withColumn("det", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope",
        when(col("n") >= 3 && col("det") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) / col("det")
            + lit(1e-9), 6)))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
            / col("det") * col("sx")) / col("n") + lit(1e-9), 4)))
      .withColumn("dety", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("r2",
        when(col("slope").isNotNull && col("dety") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            * (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("det") * col("dety")) + lit(1e-9), 6)))
      .select(col("day"), col("n"), col("slope"), col("intercept"), col("r2"))
  }

  /** Lag-k autocorrelation of the daily series per station (the
    * persistence profile behind gap-fill donor choice and storm
    * clustering): for k = 1..`maxLag`, the sample ACF
    * `r_k = Σ (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)²` over the dense
    * grid with missing days as 0 (the same series SPI standardizes).
    *
    * Plan: lag columns from ONE window per station (partition-local),
    * the station mean from one keyed aggregate joined back, then one
    * keyed aggregate per station; the k lags unpivot from the final
    * O(#stations) frame, never the day frame. */
  def acf(rawDaily: DataFrame, maxLag: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val withLags = (1 to maxLag).foldLeft(
      rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))) {
      case (df, k) => df.withColumn(s"x_lag$k", lag(col("x"), k).over(w))
    }
    val mean = withLags.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("xbar"))
    val centered = withLags.join(mean, Seq("station_id"))
    val numCols: Seq[org.apache.spark.sql.Column] = (1 to maxLag).map { k =>
      sum((col("x") - col("xbar")) *
        (col(s"x_lag$k") - col("xbar"))).as(s"num$k")
    }
    val agg = centered.groupBy(col("station_id"), col("xbar"))
      .agg(sum((col("x") - col("xbar")) * (col("x") - col("xbar"))).as("den"),
        numCols: _*)
    val stacked = agg.select(col("station_id"), col("xbar"), col("den"),
      expr(s"stack($maxLag, " +
        (1 to maxLag).map(k => s"$k, num$k").mkString(", ") +
        ") as (lag, num)"))
    stacked
      .withColumn("acf",
        when(col("den") > 0.0, round(col("num") / col("den") + lit(1e-9), 4)))
      .select(col("station_id"), col("lag"), col("xbar"), col("acf"))
  }

  /** Intensity–duration table from the hourly series (the IDF-curve
    * input of design-storm engineering): per station, the period
    * maximum precipitation accumulated over trailing windows of
    * 1/3/6/12/24 hours — only complete windows compete.
    *
    * Plan: all five trailing frames share ONE Window node (same
    * partitioning and ordering — one station exchange, one sort); the
    * per-duration maxima are one keyed aggregate and the duration
    * unpivot runs on the O(#stations) result. */
  def idfCurve(hourlyRaw: DataFrame,
      durations: Seq[Int] = Seq(1, 3, 6, 12, 24)): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("hour"))
    val withAcc = durations.foldLeft(hourlyRaw) { (df, d) =>
      val wd = w.rowsBetween(-(d - 1), 0)
      df.withColumn(s"acc$d",
          when(count(lit(1)).over(wd) === d,
            round(sum(coalesce(col("raw"), lit(0.0))).over(wd) + lit(1e-9), 3)))
    }
    val maxCols: Seq[org.apache.spark.sql.Column] =
      durations.map(d => max(col(s"acc$d")).as(s"max$d"))
    val agg = withAcc.groupBy(col("station_id"))
      .agg(maxCols.head, maxCols.tail: _*)
    agg.select(col("station_id"),
      expr(s"stack(${durations.size}, " +
        durations.map(d => s"$d, max$d").mkString(", ") +
        ") as (duration_h, max_acc)"))
  }

  /** Antecedent precipitation index (the classic soil-moisture proxy:
    * `API_t = Σ_{i<memory} k^i · P_{t-i}`, Kohler & Linsley 1951) over
    * the zero-filled daily series with decay `k` and a finite memory
    * (the k^i tail beyond it is < 1% mass at k=0.9, m=14 — the
    * operational truncation).
    *
    * Plan: the `memory` lag columns land in ONE Window node over the
    * station partitioning (one exchange, one sort); the weighted sum
    * is a stateless projection with the k^i weights as plan literals
    * (identical doubles in the oracle — both sides print the same
    * Scala-computed constant). */
  def apiIndex(rawDaily: DataFrame, k: Double = 0.9,
      memory: Int = 14): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val z = coalesce(col("raw"), lit(0.0))
    val terms: Seq[org.apache.spark.sql.Column] = (0 until memory).map { i =>
      coalesce(lag(z, i).over(w), lit(0.0)) * lit(math.pow(k, i))
    }
    rawDaily
      .withColumn("api", round(terms.reduce(_ + _) + lit(1e-9), 4))
      .select(col("station_id"), col("day"), col("raw"), col("api"))
  }

  /** Heat-wave census per (station, year): runs of ≥ `minLen`
    * consecutive days with t_max above `thresh` (the WMO-style
    * heat-wave definition on the ETCCDI summer-day threshold) —
    * number of waves, total wave days, longest wave. Same
    * gaps-and-islands as [[drySpells]] on the hot days; a NULL day
    * breaks a run (an unobserved day cannot evidence a wave).
    *
    * Plan: ONE window per (station, year) + two keyed aggregates,
    * partition-local per station. */
  def heatWaves(tempStats: DataFrame, thresh: Double = 25.0,
      minLen: Int = 3): DataFrame = {
    val base = tempStats.withColumn("yr", year(col("day")))
    val runs = runStats(base.filter(col("t_max") > thresh), minLen)
    base.groupBy(col("station_id"), col("yr"))
      .agg(count(col("t_max")).as("n_obs"))
      .join(runs, Seq("station_id", "yr"), "left")
      .select(col("station_id"), col("yr"), col("n_obs"),
        coalesce(col("n_runs"), lit(0L)).as("n_waves"),
        coalesce(col("run_days"), lit(0L)).as("wave_days"),
        coalesce(col("longest_run"), lit(0L)).as("longest_wave"))
  }

  /** Monthly extremes with their dates (the "when was the wettest /
    * driest day" retrieval — StationBases.get_df's max/min companions
    * made date-aware): per (station, month) the max and min observed
    * daily sum and the EARLIEST day attaining each (deterministic
    * tiebreak).
    *
    * Plan: ONE map-combinable keyed aggregate — both argmaxes are
    * struct-extreme aggregates (max(struct(raw, −day)) /
    * min(struct(raw, day))), so no ranking window ever touches the
    * day frame. */
  def monthlyExtremes(rawDaily: DataFrame): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
    rawDaily.filter(col("raw").isNotNull)
      .withColumn("month", date_trunc("month", col("day")).cast("date"))
      .withColumn("day_ord", datediff(col("day"), epoch))
      .groupBy(col("station_id"), col("month"))
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("raw"), (-col("day_ord")).as("nday"))).as("mx"),
        min(struct(col("raw"), col("day_ord"))).as("mn"))
      .select(col("station_id"), col("month"), col("n_obs"),
        col("mx.raw").as("max_raw"),
        date_add(epoch, (-col("mx.nday")).cast("int")).as("max_day"),
        col("mn.raw").as("min_raw"),
        date_add(epoch, col("mn.day_ord").cast("int")).as("min_day"))
  }

  /** Monthly data-availability report per station: observed-day share,
    * gap count and longest outage run — the operations dashboard
    * behind the reference's raw_from/raw_until bookkeeping (a station
    * with 60% December availability needs its fill share inspected).
    *
    * Plan: the same gaps-and-islands as [[drySpells]] on the MISSING
    * days (run key = day ordinal − row_number), ONE window per
    * (station, month), two keyed aggregates — all partition-local per
    * station. */
  def availability(rawDaily: DataFrame): DataFrame = {
    val base = rawDaily
      .withColumn("month", date_trunc("month", col("day")).cast("date"))
    val w = Window.partitionBy(col("station_id"), col("month")).orderBy(col("day"))
    val runs = base.filter(col("raw").isNull)
      .withColumn("grp",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          - row_number().over(w))
      .groupBy(col("station_id"), col("month"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("station_id"), col("month"))
      .agg(max(col("run_len")).as("max_outage"), count(lit(1)).as("n_gaps"))
    base.groupBy(col("station_id"), col("month"))
      .agg(count(lit(1)).as("n_days"), count(col("raw")).as("n_obs"))
      .join(runs, Seq("station_id", "month"), "left")
      .select(col("station_id"), col("month"), col("n_days"), col("n_obs"),
        round(col("n_obs") / col("n_days").cast("double") + lit(1e-9), 6)
          .as("availability"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("max_outage"), lit(0L)).as("max_outage"))
  }

  /** Daily Hargreaves–Samani reference evapotranspiration (Hargreaves
    * & Samani 1985; FAO-56 §3) from the temperature series — the
    * reference's ET parameter derived where no ET station exists
    * (StationET.py models ET as its own parameter; Hargreaves is the
    * standard way to synthesize it from T alone):
    * `ET0 = 0.0023 · (T + 17.8) · √(Tmax − Tmin) · Ra / λ` with the
    * FAO-56 extraterrestrial radiation Ra from station latitude and
    * day-of-year (declination, sunset hour angle, inverse relative
    * earth–sun distance). Latitude derives from the station grid row
    * folded into a mid-latitude band (10° + 4°·(y mod 10) ∈ [10°,
    * 46°]) so the sunset-hour-angle acos stays in-domain for every
    * station count. Transcendental seams (sin/cos/tan/acos/sqrt) are
    * IEEE doubles on both engines; the final 4-dp round with the 1e-9
    * nudge absorbs any last-ulp libm difference.
    *
    * Plan: ONE dense temperature-stats frame (single events scan and
    * grid join — Series.dailyTempStats), the O(#stations) meta
    * broadcasts, everything else is a stateless per-row projection —
    * a pure map at 100 TB. */
  def etHargreaves(tempStats: DataFrame, meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val j = tempStats
      .join(broadcast(meta.select(col("station_id"), col("y"))), Seq("station_id"))
    val ang = dayofyear(col("day")).cast("double") *
      lit(2.0 * math.Pi) / lit(365.0)
    val phi = radians(lit(10.0) + (col("y") % lit(10.0)) * lit(4.0))
    val delta = lit(0.409) * sin(ang - lit(1.39))
    val dr = lit(1.0) + lit(0.033) * cos(ang)
    val ws = acos(-tan(phi) * tan(delta))
    val ra = lit(24.0 * 60.0 / math.Pi * 0.0820) * dr *
      (ws * sin(phi) * sin(delta) + cos(phi) * cos(delta) * sin(ws))
    j.withColumn("ra", round(ra + lit(1e-9), 4))
      .withColumn("et0",
        when(col("t").isNotNull && col("t_min").isNotNull,
          round(lit(0.0023) * (col("t") + lit(17.8))
            * sqrt(greatest(col("t_max") - col("t_min"), lit(0.0)))
            * ra / lit(2.45) + lit(1e-9), 4)))
      .select(col("station_id"), col("day"), col("t"), col("t_min"),
        col("t_max"), col("ra"), col("et0"))
  }

  /** Pearson correlation of each station's zero-filled daily series
    * with each of its k nearest neighbors (the inter-station
    * dependence map that motivates neighbor-based QC and fill — a
    * low-correlation "neighbor" is a bad donor). Closed-form r from
    * the five sufficient sums; degenerate pairs (either side constant)
    * yield NULL.
    *
    * Plan: the knn map is O(k·#stations) → broadcast; the exploded
    * (station, nb, day) frame joins the daily series once keyed on
    * (nb, day) and aggregates once per pair — cost O(k·days), never
    * all-pairs. */
  def neighborCorr(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val x = rawDaily.select(col("station_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("x"))
    val y = rawDaily.select(col("station_id").as("nb_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("y"))
    x.join(broadcast(knn.select(col("station_id"), col("nb_id"), col("rank"))),
        Seq("station_id"))
      .join(y, Seq("nb_id", "day"))
      .groupBy(col("station_id"), col("nb_id"), col("rank"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("detx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dety", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("r",
        when(col("detx") > 0.0 && col("dety") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("detx") * col("dety")) + lit(1e-9), 6)))
      .select(col("station_id"), col("nb_id"), col("rank"), col("n"), col("r"))
  }

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

  /** Pettitt (1979) non-parametric change-point test per station: the
    * most probable single break in a series' distribution. Uses the
    * rank identity U_t = 2·Σ_{i≤t} r_i − t·(n+1) (midranks for ties),
    * which turns the textbook O(n²) double sum into one rank pass +
    * one cumulative sum — the statistic K = max|U_t| with its day and
    * the approximate significance p ≈ 2·exp(−6K²/(n³+n²)).
    *
    * Plan: two windows over the SAME station partitioning (rank by
    * value, running sum by day) — one shuffle total — then ONE keyed
    * aggregate with an (|U|, earliest-day) struct-max tiebreak.
    * U_t is exactly integer-valued (2·midrank sums are whole), so the
    * argmax is engine-exact, no float comparison. */
  def pettitt(rawDaily: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw"))
    val wStation = Window.partitionBy(col("station_id"))
    val ranked = obs
      .withColumn("rmin", rank().over(wStation.orderBy(col("raw"))))
      .withColumn("ties",
        count(lit(1)).over(Window.partitionBy(col("station_id"), col("raw"))))
      .withColumn("r", col("rmin") + (col("ties") - lit(1)) / lit(2.0))
    val wDay = wStation.orderBy(col("day"))
    val u = ranked
      .withColumn("cumr", sum(col("r"))
        .over(wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(wDay))
      .withColumn("n", count(lit(1)).over(wStation))
      // U_n = 0 by construction; the test statistic ranges t = 1..n-1
      .filter(col("t") < col("n"))
      .withColumn("u",
        (lit(2.0) * col("cumr") - col("t") * (col("n") + lit(1))).cast("long"))
      .withColumn("day_ord",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
    u.groupBy(col("station_id"), col("n"))
      .agg(max(struct(abs(col("u")).as("k"), (-col("day_ord")).as("nday"),
        col("u"))).as("best"))
      .withColumn("k_stat", col("best.k"))
      .withColumn("u_at_break", col("best.u"))
      .withColumn("break_day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          (-col("best.nday")).cast("int")))
      .withColumn("p_value",
        round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) * col("k_stat")
          * col("k_stat") / (pow(col("n"), 3) + pow(col("n"), 2))))
          + lit(1e-9), 6))
      .select(col("station_id"), col("n"), col("k_stat"), col("u_at_break"),
        col("break_day"), col("p_value"))
  }

  /** CUSUM change-point screen per station: standardized cumulative
    * sums S_t = Σ_{i≤t}(x_i − x̄)/σ; a record with a mean shift bows
    * away from zero and the extreme |S_t| marks the candidate break
    * (Page 1954 as the retrospective mean-shift screen hydrologists
    * pair with Pettitt). Reported: the extreme, its day, and the
    * scale-free max|S|/√n an analyst thresholds (~1.36 at α=0.05 by
    * the Kolmogorov bridge approximation).
    *
    * Plan: one keyed moment aggregate (broadcast back by key join),
    * one ordered partition-local cumulative window, ONE keyed
    * struct-max aggregate — mean/σ are rounded BEFORE the cumsum so
    * the running float arithmetic is bit-identical on both engines. */
  def cusum(rawDaily: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw"))
    val moments = obs.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("raw")) + lit(1e-9), 6).as("mean"),
        round(stddev_pop(col("raw")) + lit(1e-9), 6).as("sd"))
      .filter(col("sd") > 0.0)
    val wDay = Window.partitionBy(col("station_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.join(moments, Seq("station_id"))
      .withColumn("s",
        round(sum((col("raw") - col("mean")) / col("sd")).over(wDay)
          + lit(1e-9), 4))
      .withColumn("day_ord",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
      .groupBy(col("station_id"), col("n"), col("mean"), col("sd"))
      .agg(max(struct(abs(col("s")).as("smax"), (-col("day_ord")).as("nday"),
        col("s"))).as("best"))
      .withColumn("s_max", col("best.smax"))
      .withColumn("s_at_break", col("best.s"))
      .withColumn("break_day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          (-col("best.nday")).cast("int")))
      .withColumn("s_norm",
        round(col("s_max") / sqrt(col("n")) + lit(1e-9), 4))
      .select(col("station_id"), col("n"), col("mean"), col("sd"),
        col("s_max"), col("s_at_break"), col("break_day"), col("s_norm"))
  }

  /** Alexandersson SNHT (standard normal homogeneity test) per
    * station — the third member of the homogeneity toolkit beside
    * [[pettitt]] and [[doubleMass]]: T_k = k·z̄₁² + (n−k)·z̄₂² over the
    * standardized series, whose maximum locates a single mean shift
    * (T > ~8.1 significant at α=0.05 for n≈50).
    *
    * Plan: moments (rounded 6 BEFORE standardization), ONE ordered
    * cumulative window; the series total is taken from the LAST
    * cumulative value (struct-max on (k, cumz)) — never an unordered
    * float re-sum, so both engines fold bit-identically — then T_k is
    * a stateless projection and the extreme one keyed struct-argmax. */
  def snht(rawDaily: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw"))
    val moments = obs.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("raw")) + lit(1e-9), 6).as("mean"),
        round(stddev_pop(col("raw")) + lit(1e-9), 6).as("sd"))
      .filter(col("sd") > 0.0)
    val wDay = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val cum = obs.join(moments, Seq("station_id"))
      .withColumn("cumz", sum((col("raw") - col("mean")) / col("sd"))
        .over(wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("k", row_number().over(wDay))
      .withColumn("day_ord",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
    val tot = cum.groupBy(col("station_id"))
      .agg(max(struct(col("k"), col("cumz"))).as("lastc"))
      .select(col("station_id"), col("lastc.cumz").as("totz"))
    cum.join(tot, Seq("station_id"))
      .filter(col("k") < col("n"))
      .withColumn("t_stat",
        round(col("cumz") * col("cumz") / col("k")
          + (col("totz") - col("cumz")) * (col("totz") - col("cumz"))
            / (col("n") - col("k")) + lit(1e-9), 4))
      .groupBy(col("station_id"), col("n"), col("mean"), col("sd"))
      .agg(max(struct(col("t_stat"), (-col("day_ord")).as("nday"),
        col("k"), col("cumz"), col("totz"))).as("best"))
      .withColumn("t_max", col("best.t_stat"))
      .withColumn("break_day",
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          (-col("best.nday")).cast("int")))
      .withColumn("mu1", round(col("mean")
        + col("sd") * col("best.cumz") / col("best.k") + lit(1e-9), 4))
      .withColumn("mu2", round(col("mean")
        + col("sd") * (col("best.totz") - col("best.cumz"))
          / (col("n") - col("best.k")) + lit(1e-9), 4))
      .select(col("station_id"), col("n"), col("t_max"), col("break_day"),
        col("mu1"), col("mu2"))
  }

  /** Seasonal Mann–Kendall trend test per station (Hirsch–Slack): the
    * MK S statistic computed WITHIN each season across periods (so
    * the cycle never masquerades as trend), summed over seasons;
    * variance is the sum of per-season MK variances; z with the ±1
    * continuity correction as in the plain MK. `season` picks the
    * cycle/period roles: "moy" (default — month-of-year seasons
    * across YEARS, the multi-year practice standard) or "dow"
    * (day-of-week seasons across WEEK indices — the cycle a
    * month-long feed actually carries); the structure is identical.
    *
    * Plan: values are pre-aggregated to one avg per (station, season,
    * period) CELL inside the operator, so the pair enumeration input
    * is always the aggregate frame; a loud in-plan `assert_true`
    * guard (same discipline as [[trendSeries]]) bounds the period
    * count per (station, season) at `cap` — the per-cell O(n²) is
    * provably ≤ cap² rows. Two keyed aggregates (per season, per
    * station) follow. At 100 TB: aggregate first, THEN the quadratic,
    * never the reverse — and multi-year histories use "moy" where n =
    * #years. */
  def seasonalMannKendall(rawDaily: DataFrame, season: String = "moy",
      cap: Int = TrendCap): DataFrame = {
    val keyed = season match {
      case "dow" => rawDaily.select(col("station_id"),
        (dayofweek(col("day")) - 1).as("m"),
        floor(datediff(col("day"),
          lit(java.sql.Date.valueOf("1970-01-01"))) / 7).as("wk"),
        col("raw"))
      case "moy" => rawDaily.select(col("station_id"),
        month(col("day")).as("m"),
        year(col("day")).cast("long").as("wk"),
        col("raw"))
    }
    val cells = keyed.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), col("m"), col("wk"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("p"))
    val nPer = count(lit(1))
      .over(Window.partitionBy(col("station_id"), col("m")))
    val seasonal = cells.withColumn("p", col("p") + coalesce(
      assert_true(nPer <= cap,
        concat(lit("graft seasonalMannKendall: (station, season) cell has "),
          nPer, lit(s" > $cap periods under season='$season' — use coarser" +
            " periods (season='moy') or raise the cap"))).cast("double"),
      lit(0.0)))
    val a = seasonal.select(col("station_id"), col("m"),
      col("wk").as("yi"), col("p").as("xi"))
    val b = seasonal.select(col("station_id"), col("m"),
      col("wk").as("yj"), col("p").as("xj"))
    val perMonth = a.join(b, Seq("station_id", "m"))
      .filter(col("yi") < col("yj"))
      .groupBy(col("station_id"), col("m"))
      .agg(sum(signum(col("xj") - col("xi"))).cast("long").as("s_m"))
      .join(seasonal.groupBy(col("station_id"), col("m"))
        .agg(count(lit(1)).as("n_m")), Seq("station_id", "m"))
    val per = perMonth.groupBy(col("station_id"))
      .agg(sum(col("s_m")).as("s"),
        round(sum(col("n_m") * (col("n_m") - 1) * (col("n_m") * 2 + 5))
          / lit(18.0) + lit(1e-9), 6).as("var_s"),
        count(lit(1)).as("n_seasons"))
    per
      .withColumn("z",
        when(col("s") === 0, lit(0.0))
          .otherwise(round(signum(col("s"))
            * (abs(col("s")) - 1) / sqrt(col("var_s")) + lit(1e-9), 4)))
      .withColumn("trend",
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing").otherwise("none"))
      .select(col("station_id"), col("n_seasons"), col("s"), col("var_s"),
        col("z"), col("trend"))
  }

  /** Two-sample Kolmogorov–Smirnov test per station: does the FIRST
    * half of the observed series come from the same distribution as
    * the SECOND half? The distribution-free companion to the
    * mean-shift detectors ([[pettitt]], [[cusum]], [[snht]]) — it
    * catches variance/shape changes those miss. D = max over distinct
    * values of |F₁(v) − F₂(v)|; the significance score
    * c = D·√(n₁n₂/(n₁+n₂)) rejects at ~1.36 (α=0.05).
    *
    * Plan: halves assigned by one ordered row_number window; ties in
    * value are collapsed by a (station, value) aggregate BEFORE the
    * cumulative window (tie-safe: the ECDF step lands after ALL equal
    * values on both sides, identically in both engines); one ordered
    * cumulative window over the distinct-value frame; keyed max. All
    * windows partition by station_id — partition-local at scale. */
  def ksTest(rawDaily: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val obs = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw"))
      .withColumn("k", row_number().over(wDay))
    val counts = obs.groupBy(col("station_id")).agg(count(lit(1)).as("n"))
    val halves = obs.join(counts, Seq("station_id"))
      .withColumn("in1", (col("k") <= col("n") / 2).cast("long"))
      .filter(col("n") >= 4)
    val perValue = halves.groupBy(col("station_id"), col("n"), col("raw"))
      .agg(sum(col("in1")).as("c1"), sum(lit(1L) - col("in1")).as("c2"))
    val wVal = Window.partitionBy(col("station_id")).orderBy(col("raw"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .withColumn("n1", floor(col("n") / 2))
      .withColumn("n2", col("n") - floor(col("n") / 2))
      .withColumn("f1", sum(col("c1")).over(wVal) / col("n1"))
      .withColumn("f2", sum(col("c2")).over(wVal) / col("n2"))
      .groupBy(col("station_id"), col("n1"), col("n2"))
      .agg(round(max(abs(col("f1") - col("f2"))) + lit(1e-9), 6).as("d_stat"))
      .withColumn("ks_score",
        round(col("d_stat") * sqrt(col("n1") * col("n2")
          / (col("n1") + col("n2"))) + lit(1e-9), 4))
      .withColumn("same_dist", col("ks_score") <= 1.358)
      .select(col("station_id"), col("n1"), col("n2"), col("d_stat"),
        col("ks_score"), col("same_dist"))
  }

  /** EWMA control chart per station (truncated-window formulation):
    * the exponentially-weighted moving average as a FINITE 14-lag dot
    * product with renormalized weights — the recursion
    * ewma_t = α·x_t + (1−α)·ewma_{t−1} unrolled and truncated where
    * the weight tail (0.7¹⁴ ≈ 0.7 %) is negligible, because a true
    * recursion is not expressible as a window function in either
    * engine and a closed-form rescaling overflows on long series.
    * Control limits are the standard ±L·σ·√(α/(2−α)) around the
    * station mean. The weights are injected as IDENTICAL decimal
    * literals on both engines (pow() last-ulp differences must not
    * leak into the statistic).
    *
    * Plan: one ordered window produces all 14 lags off a single sort,
    * the dot product is a stateless projection, moments are one keyed
    * aggregate — partition-local per station at any scale. */
  def ewmaControl(rawDaily: DataFrame, alpha: Double = 0.3,
      l: Double = 3.0): DataFrame = {
    val k = 14
    val weights = (0 until k).map(i => alpha * math.pow(1 - alpha, i))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val withLags = (1 until k).foldLeft(
      rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
        .withColumn("lag0", col("x"))) {
      case (df, i) => df.withColumn(s"lag$i", lag(col("x"), i).over(w))
    }
    val num = (0 until k).map(i =>
      when(col(s"lag$i").isNotNull, col(s"lag$i") * lit(weights(i)))
        .otherwise(lit(0.0))).reduce(_ + _)
    val den = (0 until k).map(i =>
      when(col(s"lag$i").isNotNull, lit(weights(i)))
        .otherwise(lit(0.0))).reduce(_ + _)
    val moments = withLags.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("mu"),
        round(stddev_pop(col("x")) + lit(1e-9), 6).as("sigma"))
    val width = l * math.sqrt(alpha / (2 - alpha))
    withLags
      .withColumn("ewma", round(num / den + lit(1e-9), 6))
      .join(moments, Seq("station_id"))
      .withColumn("ucl", round(col("mu") + lit(width) * col("sigma") + lit(1e-9), 6))
      .withColumn("lcl", round(col("mu") - lit(width) * col("sigma") + lit(1e-9), 6))
      .withColumn("flag", col("ewma") > col("ucl") || col("ewma") < col("lcl"))
      .select(col("station_id"), col("day"), col("x"), col("ewma"),
        col("ucl"), col("lcl"), col("flag"))
  }

  /** Brown's double exponential smoothing per station (trend-aware
    * one-step forecast): s′ = EWMA(x), s″ = EWMA(s′), level =
    * 2s′−s″, trend = α/(1−α)·(s′−s″), ŷ_{t+1} = level + trend. Both
    * smoothing passes use the SAME truncated-window formulation as
    * [[ewmaControl]] (14-lag renormalized dot product, weights as
    * identical decimal literals on both engines); s′ is rounded at
    * 6 dp before the second pass so the engines fold identical
    * quantized inputs.
    *
    * Plan: two ordered windows on the same station partitioning and
    * sort (Catalyst shares one exchange; the second window sorts the
    * already-sorted frame), all arithmetic stateless. */
  def brownDouble(rawDaily: DataFrame, alpha: Double = 0.3): DataFrame = {
    val k = 14
    val wts = (0 until k).map(i => alpha * math.pow(1 - alpha, i))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    def smooth(df: DataFrame, src: String, out: String): DataFrame = {
      val lagged = (0 until k).foldLeft(df) {
        case (d, i) => d.withColumn(s"${out}_l$i", lag(col(src), i).over(w))
      }
      val num = (0 until k).map(i =>
        when(col(s"${out}_l$i").isNotNull, col(s"${out}_l$i") * lit(wts(i)))
          .otherwise(lit(0.0))).reduce(_ + _)
      val den = (0 until k).map(i =>
        when(col(s"${out}_l$i").isNotNull, lit(wts(i)))
          .otherwise(lit(0.0))).reduce(_ + _)
      lagged.withColumn(out, round(num / den + lit(1e-9), 6))
        .drop((0 until k).map(i => s"${out}_l$i"): _*)
    }
    val s2 = smooth(smooth(
      rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0))), "x", "s1"),
      "s1", "s2")
    s2.withColumn("level", round(lit(2.0) * col("s1") - col("s2") + lit(1e-9), 6))
      .withColumn("trend", round(lit(alpha / (1 - alpha))
        * (col("s1") - col("s2")) + lit(1e-9), 6))
      .withColumn("yhat_1", round(col("level") + col("trend") + lit(1e-9), 6))
      .select(col("station_id"), col("day"), col("x"), col("s1"), col("s2"),
        col("level"), col("trend"), col("yhat_1"))
  }

  /** Additive Holt–Winters with weekly seasonality — the seasonal
    * step up from [[brownDouble]]: weekday indices from the station
    * climatology (4 dp), Brown's truncated double smoothing on the
    * DESEASONALIZED series, one-step forecast = level + trend + the
    * NEXT day's seasonal index. Truncated-window smoothing instead of
    * the textbook recursion keeps the operator a state-free window
    * pass (engine-exact); the k=14 tail carries < (1−α)^14 ≈ 0.7% of
    * the weight.
    *
    * Plan: two keyed climatology collapses (O(#stations·7) output),
    * one keyed join back, then the same station-partitioned lag
    * windows as brownDouble — the whole pipeline rides ONE station
    * partitioning. */
  def holtWinters(rawDaily: DataFrame, alpha: Double = 0.3): DataFrame = {
    val k = 14
    val wts = (0 until k).map(i => alpha * math.pow(1 - alpha, i))
    val base = rawDaily
      .withColumn("x", coalesce(col("raw"), lit(0.0)))
      .withColumn("wd", dayofweek(col("day")))
    val mu = base.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 4).as("mu"))
    val sIdx = base.groupBy(col("station_id"), col("wd"))
      .agg(round(avg(col("x")) + lit(1e-9), 4).as("wd_mean"))
      .join(mu, Seq("station_id"))
      .withColumn("s_idx", round(col("wd_mean") - col("mu") + lit(1e-9), 4))
      .select(col("station_id"), col("wd"), col("s_idx"))
    val d0 = base.join(sIdx, Seq("station_id", "wd"))
      .withColumn("d", col("x") - col("s_idx"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    def smooth(df: DataFrame, src: String, out: String): DataFrame = {
      val lagged = (0 until k).foldLeft(df) {
        case (dd, i) => dd.withColumn(s"${out}_l$i", lag(col(src), i).over(w))
      }
      val num = (0 until k).map(i =>
        when(col(s"${out}_l$i").isNotNull, col(s"${out}_l$i") * lit(wts(i)))
          .otherwise(lit(0.0))).reduce(_ + _)
      val den = (0 until k).map(i =>
        when(col(s"${out}_l$i").isNotNull, lit(wts(i)))
          .otherwise(lit(0.0))).reduce(_ + _)
      lagged.withColumn(out, round(num / den + lit(1e-9), 6))
        .drop((0 until k).map(i => s"${out}_l$i"): _*)
    }
    val s2 = smooth(smooth(d0, "d", "s1"), "s1", "s2")
    s2.withColumn("level", round(lit(2.0) * col("s1") - col("s2") + lit(1e-9), 6))
      .withColumn("trend", round(lit(alpha / (1 - alpha))
        * (col("s1") - col("s2")) + lit(1e-9), 6))
      .withColumn("wd_next", dayofweek(date_add(col("day"), 1)))
      .join(sIdx.select(col("station_id"), col("wd").as("wd_next"),
        col("s_idx").as("s_next")), Seq("station_id", "wd_next"))
      .select(col("station_id"), col("day"), col("x"), col("s_idx"),
        col("level"), col("trend"),
        round(col("level") + col("trend") + col("s_next") + lit(1e-9), 6)
          .as("yhat_1"))
  }

  /** Viterbi decode of a fixed two-state precipitation-regime HMM
    * (calm / storm; stay-probability 0.9, three observation bands
    * none / light / heavy with pinned emission tables) — regime
    * segmentation as a PURE Catalyst higher-order fold, no UDF: the
    * per-station day-sorted observation array folds through
    * `aggregate()` carrying (best-log-prob, best-path-string) for
    * each end state, 4-dp rounded per step so both engines walk the
    * identical lattice; ties prefer staying (deterministic).
    *
    * Plan: one (station) collect of the day-sorted band array (the
    * DTW collapse shape — bounded by the series length), then a
    * stateless fold per station; output is O(#stations). The path
    * string is bounded by the series length, the same budget as the
    * collected array itself. */
  def viterbiRegimes(rawDaily: DataFrame): DataFrame = {
    def l(x: Double) = math.log(x)
    val lnStay = l(0.9); val lnSwitch = l(0.1)
    val emC = Seq(l(0.35), l(0.6), l(0.05)) // calm: none/light/heavy
    val emS = Seq(l(0.05), l(0.35), l(0.6)) // storm
    val emCArr = s"array(${emC.mkString("D, ")}D)"
    val emSArr = s"array(${emS.mkString("D, ")}D)"
    val base = rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
    // observation bands are STATION-RELATIVE (none / below-mean /
    // above-mean, 4-dp mean) so the regime structure survives any
    // absolute scale of the series
    val mu = base.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 4).as("mu"))
    val series = base.join(mu, Seq("station_id"))
      .withColumn("obs",
        when(col("x") <= 0.0, 1).when(col("x") < col("mu"), 2).otherwise(3))
      .groupBy(col("station_id"))
      .agg(expr("transform(array_sort(collect_list(struct(day, obs))), s -> s.obs)")
        .as("os"))
    val vit = s"""
      aggregate(
        os,
        named_struct('lc', 0.0D, 'ls', 0.0D, 'pc', '', 'ps', ''),
        (st, o) -> named_struct(
          'lc', round(greatest(st.lc + $lnStay, st.ls + $lnSwitch)
            + element_at($emCArr, o), 4),
          'ls', round(greatest(st.ls + $lnStay, st.lc + $lnSwitch)
            + element_at($emSArr, o), 4),
          'pc', concat(CASE WHEN st.lc + $lnStay >= st.ls + $lnSwitch
            THEN st.pc ELSE st.ps END, 'C'),
          'ps', concat(CASE WHEN st.ls + $lnStay >= st.lc + $lnSwitch
            THEN st.ps ELSE st.pc END, 'S')))"""
    series
      .withColumn("v", expr(vit))
      .withColumn("logp",
        round(greatest(col("v.lc"), col("v.ls")) + lit(1e-9), 4))
      .withColumn("path", expr("CASE WHEN v.lc >= v.ls THEN v.pc ELSE v.ps END"))
      .withColumn("n_days", length(col("path")))
      .withColumn("storm_days",
        length(col("path")) - length(regexp_replace(col("path"), "S", "")))
      .withColumn("storm_share",
        round(col("storm_days") / col("n_days").cast("double") + lit(1e-9), 6))
      .withColumn("n_switches", expr(
        // sequence(2, 1) would run DESCENDING in Spark — guard short paths
        "CASE WHEN length(path) >= 2 THEN size(filter(sequence(2, length(path)), " +
          "i -> substring(path, i, 1) != substring(path, i - 1, 1))) ELSE 0 END"))
      .select(col("station_id"), col("n_days"), col("storm_days"),
        col("storm_share"), col("n_switches"), col("logp"))
  }

  /** One-step backtest of [[holtWinters]] against the persistence
    * baseline (x̂_{t+1} = x_t) — does the seasonal model actually beat
    * "tomorrow equals today"? Per station: MAE of both forecasts over
    * the common evaluation days and the skill score 1 − MAE_hw /
    * MAE_persist (> 0 ⇒ the model earns its keep).
    *
    * Plan: the holtWinters frame self-aligns by a lead(1) window per
    * station (no extra join against the actuals), one keyed MAE
    * rollup — cost is holtWinters + one window pass. */
  def holtWintersSkill(rawDaily: DataFrame): DataFrame = {
    val hw = holtWinters(rawDaily)
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val aligned = hw
      .withColumn("x_next", lead(col("x"), 1).over(w))
      .filter(col("x_next").isNotNull)
    aligned.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(abs(col("x_next") - col("yhat_1"))) + lit(1e-9), 4).as("mae_hw"),
        round(avg(abs(col("x_next") - col("x"))) + lit(1e-9), 4).as("mae_persist"))
      .withColumn("skill",
        when(col("mae_persist") > 0.0,
          round(lit(1.0) - col("mae_hw") / col("mae_persist") + lit(1e-9), 4)))
      .select(col("station_id"), col("n"), col("mae_hw"),
        col("mae_persist"), col("skill"))
  }

  /** Split-conformal prediction interval for the [[holtWinters]]
    * one-step forecast — the distribution-free uncertainty wrapper
    * modern forecasting stacks bolt onto any point model: absolute
    * one-step residuals on a calibration window (all but the last 7
    * days) give the per-station 90% score quantile (k-th order
    * statistic, k = min(⌈0.9·(n+1)⌉, n) — the split-conformal
    * finite-sample correction, clamped so tiny calibration sets still
    * pick an existing statistic; ties by day — exact and
    * deterministic), and the held-out week reports the EMPIRICAL
    * coverage of ŷ ± q90, the honesty check conformal methods exist
    * for.
    *
    * Plan: the HW frame + one lead window; the order statistic is a
    * per-station window (partition-local, series-bounded); coverage
    * is one keyed rollup of the 7-day holdout. */
  def conformalInterval(rawDaily: DataFrame): DataFrame = {
    val hw = holtWinters(rawDaily)
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val aligned = hw.withColumn("x_next", lead(col("x"), 1).over(w))
      .filter(col("x_next").isNotNull)
      .withColumn("abs_resid", abs(col("x_next") - col("yhat_1")))
    val horizon = aligned.agg(date_sub(max(col("day")), 7).as("cut"))
    val tagged = aligned.crossJoin(broadcast(horizon))
      .withColumn("calib", col("day") < col("cut"))
    val calib = tagged.filter(col("calib"))
    val counts = calib.groupBy(col("station_id")).agg(count(lit(1)).as("n_calib"))
    val wq = Window.partitionBy(col("station_id"))
      .orderBy(col("abs_resid"), col("day"))
    val q = calib.join(counts, Seq("station_id"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") ===
        least(ceil(lit(0.9) * (col("n_calib") + 1)), col("n_calib")))
      .select(col("station_id"), col("n_calib"),
        round(col("abs_resid") + lit(1e-9), 4).as("q90"))
    tagged.filter(!col("calib"))
      .join(q, Seq("station_id"))
      .groupBy(col("station_id"), col("n_calib"), col("q90"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("abs_resid") <= col("q90"), 1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered") / col("n_eval").cast("double") + lit(1e-9), 6))
      .select(col("station_id"), col("n_calib"), col("q90"), col("n_eval"),
        col("n_covered"), col("coverage"))
      .orderBy(col("station_id"))
  }

  /** Lag-1 Granger causality from each station's rank-1 neighbor —
    * "does knowing the neighbor's yesterday improve my forecast beyond
    * my own yesterday?": restricted model x_t ~ x_{t−1} vs
    * unrestricted x_t ~ x_{t−1} + y_{t−1}, F-test on the SSE drop
    * (1 numerator dof; F ≈ 3.84 critical at 95% for large n). All
    * coefficients come in closed form from one keyed moment aggregate
    * — no iterative fit.
    *
    * Plan: one rank-1 kNN join, one (nb, day) keyed series join, one
    * station-partitioned lag window, ONE 9-sum moment aggregate to
    * O(#stations) and pure arithmetic after. */
  def grangerNeighbor(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val nb1 = knn.filter(col("rank") === 1)
      .select(col("station_id"), col("nb_id"))
    val x = rawDaily.select(col("station_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("x"))
    val y = rawDaily.select(col("station_id").as("nb_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("y"))
    val j = x.join(nb1, Seq("station_id")).join(y, Seq("nb_id", "day"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val lagged = j
      .withColumn("xl", lag(col("x"), 1).over(w))
      .withColumn("yl", lag(col("y"), 1).over(w))
      .filter(col("xl").isNotNull)
    val m = lagged.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("xl")).as("sxl"), sum(col("yl")).as("syl"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("xl") * col("xl")).as("sxlxl"),
        sum(col("yl") * col("yl")).as("sylyl"),
        sum(col("x") * col("xl")).as("sxxl"),
        sum(col("x") * col("yl")).as("sxyl"),
        sum(col("xl") * col("yl")).as("sxlyl"))
    m.withColumn("nd", col("n").cast("double"))
      .withColumn("vx", col("sxx") / col("nd") - (col("sx") / col("nd")) * (col("sx") / col("nd")))
      .withColumn("c11", col("sxlxl") / col("nd") - (col("sxl") / col("nd")) * (col("sxl") / col("nd")))
      .withColumn("c22", col("sylyl") / col("nd") - (col("syl") / col("nd")) * (col("syl") / col("nd")))
      .withColumn("c12", col("sxlyl") / col("nd") - (col("sxl") / col("nd")) * (col("syl") / col("nd")))
      .withColumn("c1y", col("sxxl") / col("nd") - (col("sxl") / col("nd")) * (col("sx") / col("nd")))
      .withColumn("c2y", col("sxyl") / col("nd") - (col("syl") / col("nd")) * (col("sx") / col("nd")))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      .withColumn("sse_r",
        when(col("c11") > 0.0,
          col("nd") * (col("vx") - col("c1y") * col("c1y") / col("c11"))))
      .withColumn("b1",
        when(col("det") > 0.0,
          (col("c1y") * col("c22") - col("c2y") * col("c12")) / col("det")))
      .withColumn("b2",
        when(col("det") > 0.0,
          (col("c2y") * col("c11") - col("c1y") * col("c12")) / col("det")))
      .withColumn("sse_u",
        when(col("det") > 0.0,
          col("nd") * (col("vx") - col("b1") * col("c1y") - col("b2") * col("c2y"))))
      .withColumn("f_stat",
        when(col("sse_u") > 0.0 && col("n") > 3,
          round((col("sse_r") - col("sse_u"))
            / (col("sse_u") / (col("nd") - 3.0)) + lit(1e-9), 4)))
      .select(col("station_id"), col("n"),
        round(col("b2") + lit(1e-9), 6).as("granger_coef"),
        col("f_stat"),
        (col("f_stat") > 3.84).as("causal"))
  }

  /** Partial autocorrelation at lags 1–3 per station via the closed
    * Durbin–Levinson recursion on the (4-dp) ACF — the AR-order
    * diagnostic read next to [[acf]] and [[ljungBox]].
    *
    * Plan: pivots the 3-row-per-station acf frame to columns and runs
    * pure arithmetic; cost is the acf's. */
  def pacf(rawDaily: DataFrame): DataFrame = {
    val r = acf(rawDaily, 3)
      .groupBy(col("station_id"))
      .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"))
    val p = r
      .withColumn("p1", col("r1"))
      .withColumn("p2", (col("r2") - col("r1") * col("r1"))
        / (lit(1.0) - col("r1") * col("r1")))
      .withColumn("phi21", col("r1") * (lit(1.0) - col("p2")))
      .withColumn("p3",
        (col("r3") - col("phi21") * col("r2") - col("p2") * col("r1"))
          / (lit(1.0) - col("phi21") * col("r1") - col("p2") * col("r2")))
    p.select(col("station_id"),
        expr("stack(3, 1, p1, 2, p2, 3, p3) as (lag, pacf_raw)"))
      .withColumn("pacf", round(col("pacf_raw") + lit(1e-9), 4))
      .select(col("station_id"), col("lag"), col("pacf"))
  }

  /** Naive-forecast skill report per station: MAE of the persistence
    * forecast (x̂_t = x_{t−1}) vs the climatology forecast (x̂_t =
    * station mean), and the skill score 1 − MAE_pers/MAE_clim — the
    * sanity baseline every forecasting pipeline publishes before any
    * model earns compute.
    *
    * Plan: one lag window + two keyed aggregates; the climatology MAE
    * reuses the same partitioning. */
  def forecastSkill(rawDaily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val obs = rawDaily.filter(col("raw").isNotNull)
      .withColumn("prev", lag(col("raw"), 1).over(w))
    val clim = obs.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("mean"))
    obs.join(clim, Seq("station_id"))
      .groupBy(col("station_id"), col("mean"))
      .agg(count(col("prev")).as("n_pairs"),
        round(avg(when(col("prev").isNotNull,
          abs(col("raw") - col("prev")))) + lit(1e-9), 6).as("mae_persistence"),
        round(avg(abs(col("raw") - col("mean"))) + lit(1e-9), 6).as("mae_climatology"))
      .withColumn("skill",
        when(col("mae_climatology") > 0.0,
          round(lit(1.0) - col("mae_persistence") / col("mae_climatology")
            + lit(1e-9), 4)))
      .select(col("station_id"), col("n_pairs"), col("mae_persistence"),
        col("mae_climatology"), col("skill"))
  }

  /** Lagged cross-correlation between each station and its k nearest
    * neighbors (lead/lag structure of the field — a storm-advection
    * screen: if r peaks at lag ≠ 0 the neighbor sees the same weather
    * earlier/later). Pearson r of (x_t, y_{t+lag}) for lag ∈
    * {−maxLag..maxLag}, zero-filled series as in [[neighborCorr]].
    *
    * Plan: lags come from one posexplode of a literal array (fan-out
    * 2·maxLag+1 on the knn pair frame, NOT on the series); the join is
    * keyed on (nb_id, shifted day) against the broadcast knn×lag
    * frame; one keyed moment aggregate. No window, no self-join of the
    * full series. */
  /** SAX symbolic representation per station (Lin/Keogh): z-normalize
    * the zero-filled daily series, average into weekly PAA segments,
    * quantize at the N(0,1) quartile breakpoints (±0.6745, 0) into a
    * 4-symbol alphabet a–d, concatenate in week order — the compact
    * series index that makes motif search / similarity a string
    * problem. PAA means are rounded BEFORE quantization so both
    * engines take the same CASE branch at breakpoint-adjacent values.
    *
    * Plan: one keyed moment aggregate, one (station, week) aggregate,
    * one ordered string fold per station (array_sort over ≤ #weeks
    * structs — never a full-series window). */
  def sax(rawDaily: DataFrame): DataFrame = {
    val filled = rawDaily.select(col("station_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("x"),
      floor(datediff(col("day"),
        lit(java.sql.Date.valueOf("1970-01-01"))) / 7).as("week"))
    val moments = filled.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("mean"),
        round(stddev_pop(col("x")) + lit(1e-9), 6).as("sd"))
      .filter(col("sd") > 0.0)
    val paa = filled.join(moments, Seq("station_id"))
      .groupBy(col("station_id"), col("week"))
      .agg(round(avg((col("x") - col("mean")) / col("sd")) + lit(1e-9), 6).as("paa"))
      .withColumn("sym",
        when(col("paa") < -0.6745, "a").when(col("paa") < 0.0, "b")
          .when(col("paa") < 0.6745, "c").otherwise("d"))
    paa.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_weeks"),
        array_join(transform(array_sort(collect_list(struct(col("week"), col("sym")))),
          x => x("sym")), "").as("sax_word"))
      .select(col("station_id"), col("n_weeks"), col("sax_word"))
  }

  def crossCorr(rawDaily: DataFrame, knn: DataFrame, maxLag: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val x = rawDaily.select(col("station_id"), col("day"),
      coalesce(col("raw"), lit(0.0)).as("x"))
    val y = rawDaily.select(col("station_id").as("nb_id"), col("day").as("nb_day"),
      coalesce(col("raw"), lit(0.0)).as("y"))
    val lags = knn.select(col("station_id"), col("nb_id"), col("rank"))
      .withColumn("lag", explode(lit((-maxLag to maxLag).toArray)))
    x.join(broadcast(lags), Seq("station_id"))
      .withColumn("nb_day", date_add(col("day"), col("lag")))
      .join(y, Seq("nb_id", "nb_day"))
      .groupBy(col("station_id"), col("nb_id"), col("rank"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("detx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dety", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("r",
        when(col("detx") > 0.0 && col("dety") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("detx") * col("dety")) + lit(1e-9), 6)))
      .select(col("station_id"), col("nb_id"), col("rank"), col("lag"),
        col("n"), col("r"))
  }

  /** Ljung–Box portmanteau test per station: is the daily series
    * white noise, or does autocorrelation persist over the first
    * `maxLag` lags? `Q = n(n+2) Σ_k ρ_k²/(n−k)`, compared against the
    * χ²(maxLag) 95% critical value — the standard residual diagnostic
    * after a trend/seasonal fit (complements [[acf]] with a single
    * decision statistic).
    *
    * Plan: rides [[acf]]'s one-exchange lag frame; the Q assembly is a
    * keyed aggregate over maxLag rows per station joined with the
    * O(#stations) day-count frame. Nothing beyond acf's cost. */
  def ljungBox(rawDaily: DataFrame, maxLag: Int = 3): DataFrame = {
    // chi2 95% critical values for df = 1..10 (Abramowitz & Stegun
    // table 26.8); maxLag is the df of the portmanteau statistic.
    val crit = Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
      15.507, 16.919, 18.307)
    require(maxLag >= 1 && maxLag <= crit.length, s"maxLag $maxLag out of range")
    val counts = rawDaily.groupBy(col("station_id")).agg(count(lit(1)).as("n"))
    acf(rawDaily, maxLag)
      .join(counts, Seq("station_id"))
      .groupBy(col("station_id"), col("n"))
      .agg(sum(coalesce(col("acf"), lit(0.0)) * coalesce(col("acf"), lit(0.0))
        / (col("n") - col("lag"))).as("s"))
      .withColumn("q_lb",
        round(col("n") * (col("n") + 2) * col("s") + lit(1e-9), 4))
      .withColumn("white_noise_rejected", col("q_lb") > lit(crit(maxLag - 1)))
      .select(col("station_id"), col("n"), col("q_lb"),
        col("white_noise_rejected"))
  }

  /** Tie-corrected Spearman rank correlation of each station's daily
    * series with its k nearest neighbors — the robust companion to
    * [[neighborCorr]] (rank correlation survives the heavy-tailed,
    * zero-inflated precipitation distribution that distorts Pearson).
    * Average ranks for tie blocks, then closed-form Pearson over the
    * rank pairs via the five sufficient sums.
    *
    * Plan: ranks come from ONE window (min-rank and the tie-block size
    * share the same per-station sort — the tie count is a RANGE
    * CURRENT ROW frame on the identical ordering, so Catalyst plans a
    * single exchange + sort); the pair join is the same broadcast-knn
    * shape as neighborCorr, never all-pairs. Ranks are integers or
    * half-integers → exact in doubles, so the only float division is
    * the final rho. */
  def spearmanNeighbors(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val wOrd = Window.partitionBy(col("station_id")).orderBy(col("x"))
    val ranked = rawDaily
      .select(col("station_id"), col("day"), coalesce(col("raw"), lit(0.0)).as("x"))
      .withColumn("r_min", rank().over(wOrd))
      .withColumn("ties", count(lit(1)).over(
        wOrd.rangeBetween(Window.currentRow, Window.currentRow)))
      .withColumn("r", col("r_min") + (col("ties") - 1) / lit(2.0))
      .select(col("station_id"), col("day"), col("r"))
    val y = ranked.select(col("station_id").as("nb_id"), col("day"),
      col("r").as("ry"))
    ranked.join(broadcast(knn.select(col("station_id"), col("nb_id"), col("rank"))),
        Seq("station_id"))
      .join(y, Seq("nb_id", "day"))
      .groupBy(col("station_id"), col("nb_id"), col("rank"))
      .agg(count(lit(1)).as("n"),
        sum(col("r")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("r") * col("r")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("r") * col("ry")).as("sxy"))
      .withColumn("detx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dety", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("rho",
        when(col("detx") > 0.0 && col("dety") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("detx") * col("dety")) + lit(1e-9), 6)))
      .select(col("station_id"), col("nb_id"), col("rank"), col("n"), col("rho"))
  }

  /** Parametric least-squares trend per station (the classical
    * companion to the robust Theil–Sen slope and the Mann–Kendall
    * test): OLS of the zero-filled daily value on the day index, with
    * slope, intercept at the station's first day, and R². Closed form
    * from the five sufficient sums — one scan, no matrix library.
    *
    * Plan: the per-station first day is an unordered window min on
    * the same station partitioning every series operator uses (no
    * extra exchange under subset co-partitioning); everything else is
    * one map-combinable keyed aggregate. */
  def olsTrend(rawDaily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("station_id"))
    val xy = rawDaily
      .withColumn("t", datediff(col("day"), min(col("day")).over(w)).cast("double"))
      .withColumn("yv", coalesce(col("raw"), lit(0.0)))
    xy.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("sx"), sum(col("yv")).as("sy"),
        sum(col("t") * col("t")).as("sxx"),
        sum(col("yv") * col("yv")).as("syy"),
        sum(col("t") * col("yv")).as("sxy"))
      .withColumn("detx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dety", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope",
        when(col("detx") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) / col("detx")
            + lit(1e-9), 6)))
      .withColumn("intercept",
        round((col("sy") - col("slope") * col("sx")) / col("n") + lit(1e-9), 4))
      .withColumn("r2",
        when(col("detx") > 0.0 && col("dety") > 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            * (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("detx") * col("dety")) + lit(1e-9), 6)))
      .select(col("station_id"), col("n"), col("slope"), col("intercept"),
        col("r2"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis over the dense
    * HOURLY series: long-range dependence of the precipitation
    * process (H≈0.5 memoryless, H→1 persistent). For each block size
    * in `blockSizes`, complete blocks yield R/S = (range of the
    * cumulative deviation from the block mean) / (block σ); H is the
    * log–log OLS slope of the per-size mean R/S.
    *
    * Plan: everything partitions by station — the block statistics
    * are ONE keyed aggregate per (station, size, block) on the ×|sizes|
    * exploded hourly frame, the cumulative deviation is a per-block
    * ordered window, and the final log–log fit runs on |sizes| rows
    * per station. Block means and σ are rounded at 6 dp before the
    * cumulation so both engines fold identical quantized values. */
  def hurstRs(hourlyRaw: DataFrame,
      blockSizes: Seq[Int] = Seq(24, 48, 96)): DataFrame = {
    val w = Window.partitionBy(col("station_id"))
    val indexed = hourlyRaw
      .withColumn("yv", coalesce(col("raw"), lit(0.0)))
      .withColumn("idx",
        (unix_timestamp(col("hour")) - unix_timestamp(min(col("hour")).over(w)))
          / lit(3600L))
      .withColumn("bs", explode(lit(blockSizes.toArray)))
      .withColumn("blk", floor(col("idx") / col("bs")))
    val stats = indexed.groupBy(col("station_id"), col("bs"), col("blk"))
      .agg(count(lit(1)).as("n_in"),
        round(avg(col("yv")) + lit(1e-9), 6).as("mu"),
        round(stddev_pop(col("yv")) + lit(1e-9), 6).as("sd"))
      .filter(col("n_in") === col("bs") && col("sd") > 0.0)
    val wB = Window.partitionBy(col("station_id"), col("bs"), col("blk"))
      .orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rs = indexed.join(stats, Seq("station_id", "bs", "blk"))
      .withColumn("cum", sum(col("yv") - col("mu")).over(wB))
      .groupBy(col("station_id"), col("bs"), col("blk"), col("sd"))
      .agg((max(col("cum")) - min(col("cum"))).as("r"))
      .withColumn("rs", col("r") / col("sd"))
      .groupBy(col("station_id"), col("bs"))
      .agg(round(avg(col("rs")) + lit(1e-9), 6).as("mean_rs"),
        count(lit(1)).as("n_blocks"))
      .filter(col("mean_rs") > 0.0)
    // log-log OLS over the per-size points (<= |blockSizes| rows/station)
    rs.select(col("station_id"), log(col("bs").cast("double")).as("lx"),
        log(col("mean_rs")).as("ly"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_sizes"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      .filter(col("n_sizes") > 1)
      .withColumn("hurst",
        round((col("n_sizes") * col("sxy") - col("sx") * col("sy"))
          / (col("n_sizes") * col("sxx") - col("sx") * col("sx"))
          + lit(1e-9), 4))
      .select(col("station_id"), col("n_sizes"), col("hurst"))
  }

  /** Empirical semivariogram of the station period means — THE
    * geostatistics primitive (the kriging/IDW range and sill are read
    * off this curve): γ(h) = ½·mean((v_i − v_j)²) over station pairs
    * binned by separation distance, h ≤ hMax in unit bins.
    *
    * Plan: pair generation is the knnDistBucketed cell trick — build
    * side replicated into its 9 neighbor cells of size hMax, probe
    * joins its own cell (EQUI join; deterministic-complete for
    * dist ≤ hMax), a<b dedup; never all-pairs. The value frame is
    * O(#stations). */
  def variogram(rawDaily: DataFrame, meta: DataFrame,
      hMax: Double = 6.0): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 6).as("v"))
    val pts = ma.join(meta.select(col("station_id"), col("x"), col("y")),
        Seq("station_id"))
      .withColumn("cx", floor(col("x") / lit(hMax)))
      .withColumn("cy", floor(col("y") / lit(hMax)))
    val offsets = Seq(-1, 0, 1)
    val build = pts.select(col("station_id").as("nb_id"), col("x").as("nb_x"),
        col("y").as("nb_y"), col("v").as("nb_v"), col("cx"), col("cy"))
      .withColumn("off", explode(array(offsets.flatMap(dx =>
        offsets.map(dy => struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
      .select(col("nb_id"), col("nb_x"), col("nb_y"), col("nb_v"),
        (col("cx") + col("off.dx")).as("cx"),
        (col("cy") + col("off.dy")).as("cy"))
    pts.join(build, Seq("cx", "cy"))
      .filter(col("station_id") < col("nb_id"))
      .withColumn("dist", sqrt((col("x") - col("nb_x")) * (col("x") - col("nb_x"))
        + (col("y") - col("nb_y")) * (col("y") - col("nb_y"))))
      .filter(col("dist") > 0.0 && col("dist") <= lit(hMax))
      .withColumn("bin", floor(col("dist")).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("dist")) + lit(1e-9), 4).as("mean_dist"),
        // 2-dp: the bin average sums ~1e5-magnitude squares over up
        // to ~1e5 pairs, so engine-vs-oracle summation-order drift
        // can reach ~1e-4 — a 6-dp round would flake on it
        round(avg((col("v") - col("nb_v")) * (col("v") - col("nb_v")))
          / 2 + lit(1e-9), 2).as("gamma"))
      .orderBy(col("bin"))
  }

  /** Peaks-over-threshold GPD fit per station — the OTHER half of
    * extreme-value practice beside the Gumbel block-maxima route:
    * exceedances over the station's exact p95, method-of-moments
    * Generalized Pareto shape/scale (ξ = ½(1 − m̄²/s²) with m̄/s² the
    * excess mean/variance, σ = ½m̄(m̄²/s² + 1)), plus the mean-excess
    * value the POT diagnostic plots.
    *
    * Plan: threshold frame is one keyed exact percentile broadcast
    * back; excess moments one keyed aggregate over the exceedance
    * subset. */
  def potGpd(rawDaily: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val x = rawDaily.select(col("station_id"),
      coalesce(col("raw"), lit(0.0)).as("x"))
    val th = x.groupBy(col("station_id"))
      .agg(round(expr("percentile(x, 0.95D)") + lit(1e-9), 6).as("u"))
    x.join(broadcast(th), Seq("station_id"))
      .filter(col("x") > col("u"))
      .withColumn("e", col("x") - col("u"))
      .groupBy(col("station_id"), col("u"))
      .agg(count(lit(1)).as("n_exc"),
        round(avg(col("e")) + lit(1e-9), 6).as("mean_excess"),
        round(var_samp(col("e")) + lit(1e-9), 6).as("var_excess"))
      .filter(col("var_excess") > 0.0)
      .withColumn("r", col("mean_excess") * col("mean_excess")
        / col("var_excess"))
      .withColumn("xi", round(lit(0.5) * (lit(1.0) - col("r")) + lit(1e-9), 6))
      .withColumn("sigma", round(lit(0.5) * col("mean_excess")
        * (col("r") + lit(1.0)) + lit(1e-9), 6))
      .select(col("station_id"), col("u"), col("n_exc"), col("mean_excess"),
        col("xi"), col("sigma"))
  }

  /** Benjamini–Hochberg FDR correction over the per-station
    * Mann–Kendall trend tests — the multiple-testing discipline a
    * 1500-station trend sweep REQUIRES (at α = 0.05, ~75 stations
    * "trend" by chance alone): two-sided p from the A&S 26.2.17
    * normal-CDF polynomial (identical Horner order on both engines),
    * ranks ascending, reject ranks ≤ max{k : p₍ₖ₎ ≤ kα/m}.
    *
    * Plan: rides mannKendall's z frame (O(#stations)); the global
    * rank runs over that tiny frame. */
  def bhFdr(rawDaily: DataFrame, alpha: Double = 0.05,
      granularity: String = "month", cap: Int = TrendCap): DataFrame = {
    val mk = mannKendall(rawDaily, granularity, cap)
      .select(col("station_id"), col("z"))
    val az = abs(col("z"))
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782)
      + t * (lit(1.781477937) + t * (lit(-1.821255978)
        + t * lit(1.330274429)))))
    val phi = exp(az * az / lit(-2.0)) / lit(math.sqrt(2.0 * math.Pi))
    val wAll = Window.partitionBy()
    val wRank = Window.orderBy(col("p"), col("station_id"))
    mk.withColumn("p", round(lit(2.0) * phi * poly + lit(1e-9), 6))
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("bh_thresh",
        round(col("rnk") * lit(alpha) / col("m") + lit(1e-9), 6))
      .withColumn("kmax", max(when(col("p") <= col("bh_thresh"), col("rnk"))
        .otherwise(lit(0))).over(wAll))
      .withColumn("rejected", col("rnk") <= col("kmax"))
      .select(col("station_id"), col("z"), col("p"), col("rnk"), col("m"),
        col("bh_thresh"), col("rejected"))
  }

  /** First and second diurnal harmonics per station (the DFT bins of
    * the 24-point hour-of-day profile): amplitude 2/24·√(a²+b²) and
    * phase atan2(b, a) for k ∈ {1, 2} — "is the daily cycle a single
    * afternoon peak or bimodal?", the spectral summary of
    * [[diurnalCycle]].
    *
    * Plan: the profile is one keyed aggregate; the harmonic sums are
    * a second keyed aggregate over 24 rows per station with
    * literal-angle cos/sin. */
  def diurnalHarmonics(hourlyRaw: DataFrame): DataFrame = {
    val prof = hourlyRaw
      .withColumn("hod", hour(col("hour")))
      .groupBy(col("station_id"), col("hod"))
      .agg(round(avg(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 6).as("x"))
    val k = explode(lit(Array(1, 2)))
    prof.withColumn("k", k)
      .withColumn("ang", lit(2.0 * math.Pi) * col("k") * col("hod") / lit(24.0))
      .groupBy(col("station_id"), col("k"))
      .agg(round(sum(col("x") * cos(col("ang"))) + lit(1e-9), 6).as("a"),
        round(sum(col("x") * sin(col("ang"))) + lit(1e-9), 6).as("b"),
        round(avg(col("x")) + lit(1e-9), 6).as("mean_x"))
      .withColumn("amplitude",
        round(lit(2.0 / 24.0) * sqrt(col("a") * col("a") + col("b") * col("b"))
          + lit(1e-9), 6))
      .withColumn("phase", round(atan2(col("b"), col("a")) + lit(1e-9), 4))
      .select(col("station_id"), col("k"), col("mean_x"),
        col("amplitude"), col("phase"))
  }

  /** Spectral entropy of the hour-of-day profile per station (the
    * catch22-style signal feature: a pure diurnal cycle concentrates
    * power in one harmonic → H → 0; white noise spreads it → flatness
    * → 1): Fourier power at k = 1..11 over the 24-point profile,
    * normalized to a distribution, Shannon entropy + flatness H/ln K.
    *
    * Plan: one (station, hod) keyed profile aggregate, ×11 harmonic
    * explode of the 24-row-per-station frame, two tiny keyed
    * rollups. */
  def spectralEntropy(hourlyRaw: DataFrame, maxK: Int = 11): DataFrame = {
    val prof = hourlyRaw
      .withColumn("hod", hour(col("hour")))
      .groupBy(col("station_id"), col("hod"))
      .agg(round(avg(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 6).as("x"))
    val power = prof
      .withColumn("k", explode(lit((1 to maxK).toArray)))
      .withColumn("ang", lit(2.0 * math.Pi) * col("k") * col("hod") / lit(24.0))
      .groupBy(col("station_id"), col("k"))
      .agg(round(sum(col("x") * cos(col("ang"))) + lit(1e-9), 6).as("a"),
        round(sum(col("x") * sin(col("ang"))) + lit(1e-9), 6).as("b"))
      .withColumn("pw", col("a") * col("a") + col("b") * col("b"))
    val tot = power.groupBy(col("station_id"))
      .agg(sum(col("pw")).as("pw_tot"), count(lit(1)).as("n_k"))
    power.join(tot, Seq("station_id"))
      .filter(col("pw_tot") > 0.0)
      .withColumn("p", col("pw") / col("pw_tot"))
      .groupBy(col("station_id"), col("n_k"))
      .agg(sum(when(col("p") > 0.0, -col("p") * log(col("p")))
        .otherwise(lit(0.0))).as("h"))
      .withColumn("spectral_entropy", round(col("h") + lit(1e-9), 6))
      .withColumn("flatness",
        round(col("h") / log(col("n_k").cast("double")) + lit(1e-9), 6))
      .select(col("station_id"), col("n_k"), col("spectral_entropy"),
        col("flatness"))
  }

  /** Binned mutual information between station elevation and period
    * mean (the nonlinear-dependence companion of [[kendallTauBinned]],
    * on the SAME decile contingency table): MI = ΣΣ p·ln(p/(pᵢpⱼ)),
    * normalized by ln(bins).
    *
    * Plan: two dim-frame ntile sorts, ≤100-cell table, marginals and
    * the MI fold all on that tiny frame — exact integer counts, so MI
    * is engine-exact before rounding. */
  def miBinned(meta: DataFrame, rawDaily: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val pts = meta.select(col("station_id"), col("elev"))
      .join(ma, Seq("station_id"))
      .withColumn("gx", ntile(10).over(Window.orderBy(col("elev"), col("station_id"))))
      .withColumn("gy", ntile(10).over(Window.orderBy(col("ma"), col("station_id"))))
    val cells = pts.groupBy(col("gx"), col("gy"))
      .agg(count(lit(1)).as("cnt"))
    val rm = cells.groupBy(col("gx")).agg(sum(col("cnt")).as("rn"))
    val cm = cells.groupBy(col("gy")).agg(sum(col("cnt")).as("cn"))
    val n = cells.agg(sum(col("cnt")).as("n"))
    cells.join(broadcast(rm), Seq("gx")).join(broadcast(cm), Seq("gy"))
      .crossJoin(broadcast(n))
      .withColumn("term",
        col("cnt") / col("n").cast("double")
          * log(col("cnt").cast("double") * col("n")
            / (col("rn").cast("double") * col("cn"))))
      .agg(first(col("n")).as("n"), count(lit(1)).as("n_cells"),
        sum(col("term")).as("mi"))
      .withColumn("mi", round(col("mi") + lit(1e-9), 6))
      .withColumn("nmi", round(col("mi") / log(lit(10.0)) + lit(1e-9), 6))
      .select(col("n"), col("n_cells"), col("mi"), col("nmi"))
  }

  /** Rousseeuw–Croux Sₙ robust scale per station: 1.1926 ·
    * med_i( med_j |x_i − x_j| ) — the 50%-breakdown spread estimate
    * that, unlike MAD, needs no location estimate and stays efficient
    * under asymmetry. Runs on the observed series pre-aggregated to
    * `granularity` inside the operator ([[trendSeries]] — "month"
    * default, cap-guarded).
    *
    * Plan: the same per-station pair enumeration as theilSen /
    * mannKendall — bounded at cap² rows per station by
    * [[trendSeries]]'s loud guard; inner medians are one keyed exact
    * percentile per (station, anchor period), the outer median a
    * second keyed percentile over n rows per station. */
  def snScale(rawDaily: DataFrame, granularity: String = "month",
      cap: Int = TrendCap): DataFrame = {
    val x = trendSeries(rawDaily, granularity, cap)
      .select(col("station_id"), col("day"), col("p").as("x"))
    val y = x.select(col("station_id"), col("day").as("day_j"),
      col("x").as("xj"))
    val inner = x.join(y, Seq("station_id"))
      .filter(col("day") =!= col("day_j"))
      .groupBy(col("station_id"), col("day"))
      .agg(round(expr("percentile(abs(x - xj), 0.5D)") + lit(1e-9), 6)
        .as("med_i"))
    inner.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(med_i, 0.5D)") + lit(1e-9), 6).as("med_med"))
      .withColumn("sn", round(lit(1.1926) * col("med_med") + lit(1e-9), 6))
      .select(col("station_id"), col("n"), col("med_med"), col("sn"))
  }

  /** Gumbel (EV-I) fit of the daily block maxima of the hourly series
    * by method of moments — the closed-form extreme-value model next
    * to the empirical Weibull return periods: β = s√6/π, μ = x̄ −
    * 0.5772156649·β, return levels x_T = μ − β·ln(−ln(1−1/T)) for
    * T ∈ {2, 10, 100} blocks.
    *
    * Plan: block maxima are one keyed aggregate, moments a second on
    * O(#station-days) rows; the fit is a stateless projection. */
  def gumbelFit(hourlyRaw: DataFrame): DataFrame = {
    val euler = 0.5772156649
    val maxima = hourlyRaw.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), to_date(col("hour")).as("day"))
      .agg(max(col("raw")).as("mx"))
    def retLevel(t: Double) =
      round(col("mu") - col("beta") * log(-log(lit(1.0) - lit(1.0 / t)))
        + lit(1e-9), 4)
    maxima.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_blocks"),
        round(avg(col("mx")) + lit(1e-9), 6).as("mean_max"),
        round(stddev_samp(col("mx")) + lit(1e-9), 6).as("sd_max"))
      .filter(col("sd_max") > 0.0)
      .withColumn("beta",
        round(col("sd_max") * math.sqrt(6.0) / math.Pi + lit(1e-9), 6))
      .withColumn("mu",
        round(col("mean_max") - lit(euler) * col("beta") + lit(1e-9), 6))
      .withColumn("rl2", retLevel(2))
      .withColumn("rl10", retLevel(10))
      .withColumn("rl100", retLevel(100))
      .select(col("station_id"), col("n_blocks"), col("mu"), col("beta"),
        col("rl2"), col("rl10"), col("rl100"))
  }

  /** Dynamic-time-warping distance between each station's daily
    * series and its k nearest neighbors — the elastic similarity
    * measure that survives phase shifts (a front arriving a day later
    * at the neighbor) where Pearson/Spearman read pure noise.
    * Sakoe–Chiba BANDED DP (|i − j| ≤ `band`): the warping path may
    * deviate at most `band` steps from the diagonal — the standard
    * constraint that (a) keeps the alignment physically meaningful (a
    * front does not arrive a month late) and (b) cuts the kernel from
    * O(n·m) to O(n·band). Each DP row is materialized as ONLY its
    * in-band window (≤ 2·band+1 cells) with the offset derived from
    * the row index; out-of-window reads resolve to +∞. `band` ≥
    * max(n, m) reproduces the full unbanded DP exactly (DtwSpec pins
    * this). Expressed as nested higher-order folds (aggregate /
    * list_reduce) with IDENTICAL fold order on both engines — no UDF,
    * stays in the SQL expression layer. Requires |n − m| ≤ band for a
    * finite distance (the dense co-gridded series have n = m).
    *
    * Plan: each station's series collapses to ONE array row (30
    * values here; `granularity` pre-aggregates to weekly/monthly PAA
    * means at 100 TB, with [[trendSeries]]-style cap guard on the
    * array length), pairs come from the broadcast knn map, and the DP
    * is a per-row expression doing O(n·band) work over two small
    * arrays. Shuffle = O(#stations) array rows. */
  def dtwNeighbors(rawDaily: DataFrame, knn: DataFrame, band: Int = 7,
      granularity: String = "day", cap: Int = 4000): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val dense = rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
    val paa = granularity match {
      case "day" => dense.select(col("station_id"), col("day"), col("x"))
      case g => dense.groupBy(col("station_id"), trunc(col("day"), g).as("day"))
        .agg(round(avg(col("x")) + lit(1e-9), 6).as("x"))
    }
    val nGuard = count(lit(1)).over(Window.partitionBy(col("station_id")))
    val guarded = paa.withColumn("x", col("x") + coalesce(
      assert_true(nGuard <= cap,
        concat(lit("graft dtwNeighbors: per-station series has "), nGuard,
          lit(s" > $cap points at granularity='$granularity' — use a coarser" +
            " PAA granularity (week/month) before the O(n*band) DP")))
        .cast("double"), lit(0.0)))
    val series = guarded
      .groupBy(col("station_id"))
      .agg(expr("transform(array_sort(collect_list(struct(day, x))), s -> s.x)")
        .as("xs"))
    val a = series.select(col("station_id"), col("xs").as("xa"))
    val b = series.select(col("station_id").as("nb_id"), col("xs").as("xb"))
    // Windowed band rows: row i holds D(i, j) for j in [lo_i, hi_i]
    // only; the previous row's offset plo is derivable from i (0 for
    // the virtual row 0, whose single cell is D(0,0)=0). A read of
    // D(i-1, p) outside [plo, plo+size(prev)-1] is +∞. The inner fold
    // seeds with a phantom left-∞ cell (D(i, lo_i - 1) is always out
    // of band) that the closing slice drops.
    // native O(n·band) DP (graft.functions.DtwBand): same rolling band
    // rows, 1e18 out-of-band sentinel and cost + least(diag, up, left)
    // cell arithmetic as the composed aggregate-over-sequence form the
    // DuckDB oracle mirrors (FunctionsSpec pins the two bit-identical
    // on random series) — the composed form walked ~5 interpreted
    // lambda trees per DP cell
    graft.functions.GraftFunctions.register(rawDaily.sparkSession)
    val dtwExpr = s"graft_dtw_band(xa, xb, $band)"
    a.join(broadcast(knn.select(col("station_id"), col("nb_id"), col("rank"))),
        Seq("station_id"))
      .join(b, Seq("nb_id"))
      .withColumn("dtw_raw", expr(dtwExpr))
      .withColumn("n", size(col("xa")))
      .withColumn("dtw", round(col("dtw_raw") + lit(1e-9), 4))
      .withColumn("dtw_per_step",
        round(col("dtw_raw") / col("n") + lit(1e-9), 6))
      .select(col("station_id"), col("nb_id"), col("rank"), col("n"),
        col("dtw"), col("dtw_per_step"))
  }

  /** OHLC downsampling of the hourly series to daily candles — the
    * TSDB compaction staple (open/high/low/close + volume): first and
    * last OBSERVED hourly values per (station, day) via min_by/max_by
    * on the unique hour key, extrema and observation count in the
    * same pass.
    *
    * Plan: ONE map-combinable keyed aggregate — min_by/max_by carry
    * a single (value, key) pair through the combiner, so the shuffle
    * is O(#station-days) regardless of input density. */
  def ohlc(hourlyRaw: DataFrame): DataFrame =
    hourlyRaw.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), to_date(col("hour")).as("day"))
      .agg(min_by(col("raw"), col("hour")).as("open"),
        max(col("raw")).as("high"),
        min(col("raw")).as("low"),
        max_by(col("raw"), col("hour")).as("close"),
        count(lit(1)).as("n_obs"))
      .select(col("station_id"), col("day"), col("open"), col("high"),
        col("low"), col("close"), col("n_obs"))

  /** Mean diurnal cycle per station: the 24-point hour-of-day profile
    * of the zero-filled hourly series with the peak hour flagged —
    * the sub-daily fingerprint (convective afternoon peaks vs
    * stratiform flat profiles) that daily aggregates erase.
    *
    * Plan: one keyed (station, hod) aggregate over the hourly grid;
    * the peak pick is a WindowGroupLimit-able rn=1 over 24 rows per
    * station. */
  def diurnalCycle(hourlyRaw: DataFrame): DataFrame = {
    val prof = hourlyRaw
      .withColumn("hod", hour(col("hour")))
      .groupBy(col("station_id"), col("hod"))
      .agg(count(lit(1)).as("n"),
        round(avg(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 6).as("mean_raw"))
    val w = Window.partitionBy(col("station_id"))
      .orderBy(col("mean_raw").desc, col("hod").asc)
    prof.withColumn("is_peak", row_number().over(w) === 1)
      .select(col("station_id"), col("hod"), col("n"), col("mean_raw"),
        col("is_peak"))
  }

  /** Grubbs outlier statistic per station: the largest standardized
    * deviation G = max|x−x̄|/s of the zero-filled daily series, with
    * the day it occurs (earliest day on ties). The single-number
    * "worst observation" screen beside the per-row z-score/MAD
    * anomaly lists.
    *
    * Plan: one moment aggregate, one broadcast-back join keyed on
    * station, and a WindowGroupLimit-able rn=1 pick (≤1 row per
    * station leaves each map partition). */
  def grubbs(rawDaily: DataFrame): DataFrame = {
    val m = rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
    val moments = m.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x")) + lit(1e-9), 6).as("mu"),
        round(stddev_samp(col("x")) + lit(1e-9), 6).as("sd"))
    val wRank = Window.partitionBy(col("station_id"))
      .orderBy(abs(col("x") - col("mu")).desc, col("day").asc)
    m.join(moments, Seq("station_id"))
      .filter(col("sd") > 0.0)
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .withColumn("g_stat",
        round(abs(col("x") - col("mu")) / col("sd") + lit(1e-9), 4))
      .select(col("station_id"), col("n"), col("mu"), col("sd"),
        col("day").as("peak_day"), col("x").as("x_peak"), col("g_stat"))
  }

  /** Inverse normal quantile z_p for p = 1 − q via Abramowitz &
    * Stegun 26.2.23 (|ε| < 4.5e-4) — mirrored literally in the DuckDB
    * oracle, so the decision thresholds agree bit-for-bit regardless
    * of the approximation error. */
  private def invNormCol(q: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = sqrt(lit(-2.0) * log(q))
    t - (lit(2.515517) + t * (lit(0.802853) + t * lit(0.010328))) /
      (lit(1.0) + t * (lit(1.432788) + t * (lit(0.189269) + t * lit(0.001308))))
  }

  /** Generalized ESD outlier census per station (Rosner 1983, k
    * unrolled rounds) — the multi-outlier extension of the one-shot
    * Grubbs peak ([[grubbs]]), immune to masking: each round
    * recomputes the moments WITHOUT the already-removed extremes,
    * reports the most extreme remaining observation's R statistic,
    * and compares it to the Bonferroni-corrected normal quantile
    * z(1 − α/(2(n+1))) (the t-quantile's large-n limit, approximation
    * mirrored in the oracle).
    *
    * Plan: k = 3 unrolled passes, each one O(#stations) broadcast of
    * the per-station moments, one partition-local rank window and one
    * anti-join on the removed (station, day) keys — no pair joins,
    * no global sorts. */
  def esdOutliers(rawDaily: DataFrame, k: Int = EsdK,
      alpha: Double = EsdAlpha): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    var current = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw").as("x"))
    val rounds = (1 to k).map { i =>
      val mom = current.groupBy(col("station_id"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("x")) + lit(1e-9), 6).as("mu"),
          round(stddev_samp(col("x")) + lit(1e-9), 6).as("sd"))
        .filter(col("sd") > 0.0 && col("n") >= 5)
      val wRank = Window.partitionBy(col("station_id"))
        .orderBy(abs(col("x") - col("mu")).desc, col("day").asc)
      val peak = current.join(broadcast(mom), Seq("station_id"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") === 1)
        .withColumn("r_stat",
          round(abs(col("x") - col("mu")) / col("sd") + lit(1e-9), 4))
        .withColumn("lambda_crit", round(invNormCol(
          lit(alpha) / (lit(2.0) * (col("n") + lit(1)))) + lit(1e-9), 4))
        .withColumn("rejected", col("r_stat") > col("lambda_crit"))
        .select(col("station_id"), lit(i).as("round"), col("n"),
          col("day").as("outlier_day"), col("x").as("x_out"),
          col("r_stat"), col("lambda_crit"), col("rejected"))
      current = current.join(
        peak.select(col("station_id"), col("outlier_day").as("day")),
        Seq("station_id", "day"), "left_anti")
      peak
    }
    rounds.reduce(_ unionByName _)
  }

  /** Two-state wet/dry Markov chain parameters per station — the
    * transition probabilities P(wet|wet) and P(wet|dry) that drive
    * every stochastic weather generator (Richardson WGEN family),
    * estimated from day-over-day transitions of the zero-filled
    * series.
    *
    * Plan: one lag window on the shared station partitioning, one
    * map-combinable keyed aggregate; output is O(#stations). */
  def wetDryMarkov(rawDaily: DataFrame, wetThresh: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val s = rawDaily
      .withColumn("wet", (coalesce(col("raw"), lit(0.0)) > wetThresh).cast("int"))
      .withColumn("prev_wet", lag(col("wet"), 1).over(w))
      .filter(col("prev_wet").isNotNull)
    s.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("wet")).as("n_wet"),
        sum(when(col("prev_wet") === 1 && col("wet") === 1, 1L)
          .otherwise(0L)).as("n_ww"),
        sum(col("prev_wet")).as("n_from_wet"),
        sum(when(col("prev_wet") === 0 && col("wet") === 1, 1L)
          .otherwise(0L)).as("n_dw"))
      .withColumn("p_wet",
        round(col("n_wet") / col("n_trans").cast("double") + lit(1e-9), 6))
      .withColumn("p_w_given_w", when(col("n_from_wet") > 0,
        round(col("n_ww") / col("n_from_wet").cast("double") + lit(1e-9), 6)))
      .withColumn("p_w_given_d", when(col("n_trans") > col("n_from_wet"),
        round(col("n_dw") / (col("n_trans") - col("n_from_wet")).cast("double")
          + lit(1e-9), 6)))
      .select(col("station_id"), col("n_trans"), col("n_wet"), col("n_ww"),
        col("n_dw"), col("p_wet"), col("p_w_given_w"), col("p_w_given_d"))
  }

  /** Monthly diurnal temperature range (the ETCCDI DTR index): mean
    * and maximum of the daily (t_max − t_min) spread per station and
    * calendar month, with the contributing-day count. One keyed
    * aggregate over the dense temperature-extrema grid. */
  def diurnalRange(tempStats: DataFrame): DataFrame =
    tempStats.filter(col("t_min").isNotNull)
      .groupBy(col("station_id"), trunc(col("day"), "month").as("mon"))
      .agg(count(lit(1)).as("n_days"),
        round(avg(col("t_max") - col("t_min")) + lit(1e-9), 4).as("mean_dtr"),
        round(max(col("t_max") - col("t_min")) + lit(1e-9), 3).as("max_dtr"))
      .select(col("station_id"), col("mon"), col("n_days"),
        col("mean_dtr"), col("max_dtr"))

  /** Jarque–Bera normality test per station: JB = n/6·(S² + (K−3)²/4)
    * from the population skewness S and kurtosis K of the daily series
    * (zero-filled gaps, matching the other per-station tests).
    * Precipitation-like daily sums are strongly right-skewed, so JB
    * rejects hard — the test is the standard pre-flight before any
    * Gaussian-assuming downstream (z-scores, control charts).
    *
    * Plan: mean pass + one keyed central-moment aggregate (two scans
    * of the persisted series, both map-combinable). The moment sums
    * stay unrounded; only the O(1)-magnitude ratios S and K round (the
    * cross-engine determinism rule every moment-based test here
    * follows), and JB derives from the rounded pair so it is exact on
    * both engines. */
  def jarqueBera(rawDaily: DataFrame): DataFrame = {
    val x = rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
    val m = x.groupBy(col("station_id"))
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("mu"))
    // explicit products, not pow(): IEEE ·/sqrt are identically rounded
    // on both engines, library pow need not be
    x.join(m, Seq("station_id"))
      .withColumn("d", col("x") - col("mu"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        avg(col("d") * col("d")).as("m2"),
        avg(col("d") * col("d") * col("d")).as("m3"),
        avg(col("d") * col("d") * col("d") * col("d")).as("m4"))
      .withColumn("skew",
        when(col("m2") > 0.0,
          round(col("m3") / (col("m2") * sqrt(col("m2"))) + lit(1e-9), 6)))
      .withColumn("kurt",
        when(col("m2") > 0.0,
          round(col("m4") / (col("m2") * col("m2")) + lit(1e-9), 6)))
      .withColumn("jb",
        when(col("m2") > 0.0,
          round(col("n") / lit(6.0) * (col("skew") * col("skew")
            + (col("kurt") - lit(3.0)) * (col("kurt") - lit(3.0)) / lit(4.0))
            + lit(1e-9), 4)))
      // χ²(2) 95% critical value 5.991 — normality rejected above it
      .withColumn("reject_normal", col("jb") > lit(5.991))
      .select(col("station_id"), col("n"), col("skew"), col("kurt"),
        col("jb"), col("reject_normal"))
  }

  /** Durbin–Watson statistic per station on the residuals of the OLS
    * day-index trend (the autocorrelation companion of q_ols_trend —
    * DW ≈ 2 means uncorrelated residuals, → 0 positive serial
    * correlation, → 4 negative). The slope/intercept quantization
    * matches olsTrend (6/4 dp), and the residuals are rounded at 4 dp
    * before differencing so both engines difference identical values.
    *
    * Plan: closed-form fit = one keyed moment aggregate on the
    * persisted series; residual pass = join of the O(#stations) fit
    * frame back (broadcast-sized), one lag window on the station
    * partitioning, one final keyed aggregate. */
  def durbinWatson(rawDaily: DataFrame): DataFrame = {
    val wS = Window.partitionBy(col("station_id"))
    val wo = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val xy = rawDaily
      .withColumn("t", datediff(col("day"), min(col("day")).over(wS)).cast("double"))
      .withColumn("yv", coalesce(col("raw"), lit(0.0)))
    val fit = xy.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("sx"), sum(col("yv")).as("sy"),
        sum(col("t") * col("t")).as("sxx"), sum(col("t") * col("yv")).as("sxy"))
      .withColumn("detx", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("detx") > 0.0)
      .withColumn("slope",
        round((col("n") * col("sxy") - col("sx") * col("sy")) / col("detx")
          + lit(1e-9), 6))
      .withColumn("icept",
        round((col("sy") - col("slope") * col("sx")) / col("n") + lit(1e-9), 4))
      .select(col("station_id"), col("slope"), col("icept"))
    xy.join(fit, Seq("station_id"))
      .withColumn("e",
        round(col("yv") - col("slope") * col("t") - col("icept") + lit(1e-9), 4))
      .withColumn("e1", lag(col("e"), 1).over(wo))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("e") * col("e")).as("sse"),
        sum(when(col("e1").isNotNull,
          (col("e") - col("e1")) * (col("e") - col("e1")))
          .otherwise(lit(0.0))).as("ssd"))
      .withColumn("dw",
        when(col("sse") > 0.0, round(col("ssd") / col("sse") + lit(1e-9), 6)))
      .select(col("station_id"), col("n"), col("dw"))
  }

  /** Yule–Walker AR(2) fit per station from the lag-1/2
    * autocorrelations (the classical method-of-moments AR estimate):
    * φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²), innovation
    * variance ratio 1 − φ₁r₁ − φ₂r₂. Built directly on [[acf]], so
    * the r's carry acf's 4-dp quantization and the φ's are exact on
    * both engines.
    *
    * Plan: exactly acf's cost (one mean pass + one keyed moment
    * aggregate); the pivot and the closed form run on the
    * O(#stations) ACF frame. */
  def yuleWalkerAr2(rawDaily: DataFrame): DataFrame =
    acf(rawDaily, maxLag = 2).groupBy(col("station_id"))
      .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"))
      .filter(col("r1").isNotNull && col("r2").isNotNull)
      .withColumn("den", lit(1.0) - col("r1") * col("r1"))
      .withColumn("phi1",
        when(col("den") > 0.0,
          round(col("r1") * (lit(1.0) - col("r2")) / col("den") + lit(1e-9), 6)))
      .withColumn("phi2",
        when(col("den") > 0.0,
          round((col("r2") - col("r1") * col("r1")) / col("den") + lit(1e-9), 6)))
      .withColumn("innov_ratio",
        when(col("phi1").isNotNull,
          round(lit(1.0) - col("phi1") * col("r1") - col("phi2") * col("r2")
            + lit(1e-9), 6)))
      .select(col("station_id"), col("r1"), col("r2"), col("phi1"),
        col("phi2"), col("innov_ratio"))

  /** Thornthwaite monthly potential evapotranspiration from the
    * monthly temperature climatology (the classical water-balance
    * PET, unadjusted for day length — companion to the radiation-based
    * [[etHargreaves]]): heat index I = Σ(T/5)^1.514 over the warm
    * calendar months, α = 6.75e-7·I³ − 7.71e-5·I² + 1.792e-2·I
    * + 0.49239, PET = 16·(10T/I)^α mm/month.
    *
    * Plan: one keyed aggregate to the (station, calendar-month)
    * climatology (≤ 12 rows per station), the I rollup to O(#stations)
    * joined back (broadcast-sized), stateless closed form. The monthly
    * means quantize at 4 dp before the pow() chain so both engines
    * exponentiate identical inputs. */
  def petThornthwaite(tempStats: DataFrame): DataFrame = {
    val clim = tempStats.filter(col("t").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("mon"))
      .agg(round(avg(col("t")) + lit(1e-9), 4).as("t_clim"))
    val heat = clim.filter(col("t_clim") > 0.0)
      .groupBy(col("station_id"))
      .agg(round(sum(pow(col("t_clim") / 5.0, 1.514)) + lit(1e-9), 6).as("i"))
    clim.join(heat, Seq("station_id"))
      .withColumn("alpha",
        lit(6.75e-7) * col("i") * col("i") * col("i")
          - lit(7.71e-5) * col("i") * col("i")
          + lit(1.792e-2) * col("i") + lit(0.49239))
      .withColumn("pet",
        when(col("t_clim") > 0.0 && col("i") > 0.0,
          round(lit(16.0) * pow(lit(10.0) * col("t_clim") / col("i"),
            col("alpha")) + lit(1e-9), 4)).otherwise(lit(0.0)))
      .select(col("station_id"), col("mon"), col("t_clim"),
        round(col("alpha") + lit(1e-9), 6).as("alpha"), col("pet"))
  }

  /** Simplified Köppen–Geiger classification per station (Peel et
    * al. 2007 thresholds — the canonical downstream product of the
    * climate normals the reference maintains): from the monthly
    * temperature climatology (4 dp) and a monthly precipitation
    * normal (30 × the calendar month's mean daily sum, 4 dp).
    * Apr–Sep is "summer" (the synthetic grid has no hemisphere).
    * Class priority B (arid) → E (polar) → A (tropical) → C/D per
    * Peel's table, with the s/w/f seasonal letter and a/b/c warmth
    * letter for C/D, W/S+h/k for B, T/F for E, f/m/w for A.
    *
    * Plan: two keyed climatology collapses (≤ 12 rows per station),
    * one conditional-aggregate rollup to O(#stations), stateless rule
    * chain — nothing beyond the daily frames ever shuffles, and every
    * comparison runs on 4-dp-quantized values so both engines walk
    * the identical decision tree. */
  def koppen(tempStats: DataFrame, rawDaily: DataFrame): DataFrame = {
    val tClim = tempStats.filter(col("t").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("mon"))
      .agg(round(avg(col("t")) + lit(1e-9), 4).as("t_clim"))
    val pClim = rawDaily
      .groupBy(col("station_id"), month(col("day")).as("mon"))
      .agg(round(avg(coalesce(col("raw"), lit(0.0))) * lit(30.0)
        + lit(1e-9), 4).as("p_mon"))
    val isSummer = col("mon").between(4, 9)
    val s = tClim.join(pClim, Seq("station_id", "mon"))
      .groupBy(col("station_id"))
      .agg(
        round(avg(col("t_clim")) + lit(1e-9), 4).as("t_ann"),
        min(col("t_clim")).as("t_cold"),
        max(col("t_clim")).as("t_hot"),
        sum(when(col("t_clim") >= 10.0, 1L).otherwise(0L)).as("n_warm"),
        round(sum(col("p_mon")) + lit(1e-9), 4).as("p_ann"),
        min(col("p_mon")).as("p_dry"),
        round(sum(when(isSummer, col("p_mon")).otherwise(0.0))
          + lit(1e-9), 4).as("p_summer"),
        min(when(isSummer, col("p_mon"))).as("ps_dry"),
        max(when(isSummer, col("p_mon"))).as("ps_wet"),
        min(when(!isSummer, col("p_mon"))).as("pw_dry"),
        max(when(!isSummer, col("p_mon"))).as("pw_wet"))
    s.withColumn("pth", lit(2.0) * col("t_ann")
        + when(col("p_summer") / col("p_ann") >= 0.7, 28.0)
          .when(col("p_summer") / col("p_ann") >= 0.3, 14.0).otherwise(0.0))
      .withColumn("main",
        when(col("p_ann") < lit(10.0) * col("pth"), "B")
          .when(col("t_hot") < 10.0, "E")
          .when(col("t_cold") >= 18.0, "A")
          .when(col("t_cold") > 0.0, "C")
          .otherwise("D"))
      .withColumn("sub",
        when(col("main") === "B",
          concat(when(col("p_ann") < lit(5.0) * col("pth"), "W").otherwise("S"),
            when(col("t_ann") >= 18.0, "h").otherwise("k")))
          .when(col("main") === "E",
            when(col("t_hot") > 0.0, "T").otherwise("F"))
          .when(col("main") === "A",
            when(col("p_dry") >= 60.0, "f")
              .when(col("p_dry") >= lit(100.0) - col("p_ann") / lit(25.0), "m")
              .otherwise("w"))
          .otherwise(concat(
            when(col("ps_dry") < 40.0 && col("ps_dry") < col("pw_wet") / lit(3.0), "s")
              .when(col("pw_dry") < col("ps_wet") / lit(10.0), "w")
              .otherwise("f"),
            when(col("t_hot") >= 22.0, "a")
              .when(col("n_warm") >= 4, "b").otherwise("c"))))
      .select(col("station_id"), col("t_ann"), col("t_cold"), col("t_hot"),
        col("p_ann"), col("p_dry"),
        concat(col("main"), col("sub")).as("koppen"))
  }

  /** Conrad continentality index per station (how "oceanic" is the
    * temperature regime?): k = 1.7·A / sin(φ + 10°) − 14 where A is
    * the annual range of the monthly temperature climatology and φ
    * the station latitude (the same y-derived convention as
    * [[etHargreaves]]).
    *
    * Plan: the ≤ 12-row-per-station climatology collapses to one
    * range aggregate, broadcast meta join, stateless closed form on
    * O(#stations) rows. */
  def continentality(tempStats: DataFrame, meta: DataFrame): DataFrame = {
    val clim = tempStats.filter(col("t").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("mon"))
      .agg(round(avg(col("t")) + lit(1e-9), 4).as("t_clim"))
    val range = clim.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_months"),
        round(max(col("t_clim")) - min(col("t_clim")) + lit(1e-9), 4).as("a_range"))
    val phiDeg = lit(10.0) + (col("y") % lit(10.0)) * lit(4.0)
    range.join(broadcast(meta.select(col("station_id"), col("y"))), Seq("station_id"))
      .withColumn("phi_deg", phiDeg)
      .withColumn("conrad",
        round(lit(1.7) * col("a_range") / sin(radians(col("phi_deg") + lit(10.0)))
          - lit(14.0) + lit(1e-9), 4))
      .select(col("station_id"), col("n_months"), col("a_range"),
        col("phi_deg"), col("conrad"))
  }

  /** ETCCDI growing season length per (station, year): days from the
    * first ≥6-day run with daily mean T > 5 °C to the first ≥6-day
    * run with T < 5 °C starting after 1 July; no qualifying warm run
    * → 0, no qualifying cold end → the year runs out (31 Dec bound).
    *
    * Plan: gaps-and-islands run keys from ONE (station, year) ordered
    * window (day ordinal minus per-flag row_number), runs = one keyed
    * aggregate, the start/end picks are minima over the tiny run
    * frame, one final join per (station, year). All partition-local
    * per station. */
  def growingSeasonLength(tempStats: DataFrame, thresh: Double = 5.0,
      minRun: Int = 6): DataFrame = {
    val base = tempStats
      .withColumn("yr", year(col("day")))
      .withColumn("warm", coalesce(col("t") > thresh, lit(false)))
    val w = Window.partitionBy(col("station_id"), col("yr"), col("warm"))
      .orderBy(col("day"))
    val runs = base
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .groupBy(col("station_id"), col("yr"), col("warm"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("run_start"))
    val starts = runs.filter(col("warm") && col("len") >= minRun)
      .groupBy(col("station_id"), col("yr"))
      .agg(min(col("run_start")).as("season_start"))
    val ends = runs.filter(!col("warm") && col("len") >= minRun
        && dayofyear(col("run_start")) >= 183)
      .groupBy(col("station_id"), col("yr"))
      .agg(min(col("run_start")).as("season_end"))
    val bounds = base.groupBy(col("station_id"), col("yr"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("n_days"))
    // day-of-year ints, not nullable dates: a NULL date serializes
    // engine-differently; 0 = "no qualifying run"
    bounds
      .join(starts, Seq("station_id", "yr"), "left")
      .join(ends, Seq("station_id", "yr"), "left")
      .withColumn("start_doy",
        coalesce(dayofyear(col("season_start")), lit(0)))
      .withColumn("end_doy",
        coalesce(dayofyear(col("season_end")), lit(0)))
      .withColumn("gsl",
        when(col("season_start").isNull, lit(0))
          .otherwise(datediff(
            coalesce(col("season_end"), date_add(col("last_day"), 1)),
            col("season_start"))))
      .select(col("station_id"), col("yr"), col("n_days"),
        col("start_doy"), col("end_doy"), col("gsl"))
  }

  /** Poisson-bootstrap confidence interval of each station's daily
    * mean — THE distributed bootstrap: instead of resampling n rows
    * with replacement (which needs global coordination), every row
    * independently draws a Poisson(1) replication weight per replica,
    * so each of the B bootstrap means is one weighted keyed aggregate
    * and the whole thing is a single ×B-exploded map-combinable pass.
    * Weights are DETERMINISTIC: an integer mix of (station, day,
    * replica) mod 10⁴ against the Poisson(1) CDF thresholds
    * (3679/7358/9197/9810) — no RNG, bit-identical on both engines.
    *
    * Plan: ×B explode on the scan, (station, replica) aggregate,
    * station rollup with exact-percentile CI over the B means. */
  def bootstrapCi(rawDaily: DataFrame, b: Int = 20): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
      .withColumn("dord", datediff(col("day"), lit("1970-01-01").cast("date")))
      .withColumn("rep", explode(lit((0 until b).toArray)))
      .withColumn("h",
        ((col("station_id") * 1000003L + col("dord") * 7919L
          + col("rep") * 104729L) % 10000L + 10000L) % 10000L)
      .withColumn("w",
        when(col("h") < 3679, 0).when(col("h") < 7358, 1)
          .when(col("h") < 9197, 2).when(col("h") < 9810, 3).otherwise(4))
    val reps = obs.groupBy(col("station_id"), col("rep"))
      .agg(sum(col("w") * col("raw")).as("sw_x"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .withColumn("boot_mean", round(col("sw_x") / col("sw") + lit(1e-9), 6))
    reps.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_boot"),
        round(avg(col("boot_mean")) + lit(1e-9), 6).as("mean_of_means"),
        round(stddev_pop(col("boot_mean")) + lit(1e-9), 6).as("boot_se"),
        round(expr("percentile(boot_mean, 0.025D)") + lit(1e-9), 4).as("ci_lo"),
        round(expr("percentile(boot_mean, 0.975D)") + lit(1e-9), 4).as("ci_hi"))
  }

  /** Global Moran's I of the station period means over the kNN
    * neighbor graph (THE spatial-autocorrelation statistic: do nearby
    * stations record similar climate?), with the null expectation
    * E[I] = −1/(n−1).
    *
    * Plan: the z-score frame is O(#stations) → broadcast onto the
    * O(k·#stations) edge list twice, one scalar rollup. */
  def moransI(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val gm = ma.agg(round(avg(col("ma")) + lit(1e-9), 6).as("gm"),
      count(lit(1)).as("n"))
    val z = ma.crossJoin(broadcast(gm))
      .select(col("station_id"), (col("ma") - col("gm")).as("z"), col("n"))
    val den = z.agg(sum(col("z") * col("z")).as("den"),
      first(col("n")).as("n"))
    val num = knn.select(col("station_id"), col("nb_id"))
      .join(broadcast(z.select(col("station_id"), col("z"))), Seq("station_id"))
      .join(broadcast(z.select(col("station_id").as("nb_id"), col("z").as("zj"))),
        Seq("nb_id"))
      .agg(sum(col("z") * col("zj")).as("num"), count(lit(1)).as("w_edges"))
    num.crossJoin(broadcast(den))
      .withColumn("morans_i",
        when(col("den") > 0.0,
          round(col("n") / col("w_edges").cast("double")
            * col("num") / col("den") + lit(1e-9), 6)))
      .withColumn("e_i", round(lit(-1.0) / (col("n") - 1) + lit(1e-9), 6))
      .select(col("n"), col("w_edges"), col("morans_i"), col("e_i"))
  }

  /** Local Moran's I (LISA, Anselin 1995) per station over the kNN
    * graph with row-standardized weights: Iᵢ = zᵢ·lag(z)ᵢ/m₂ where
    * lag(z)ᵢ is the neighbor mean of z — the hotspot/coldspot map
    * behind every climate-anomaly atlas, with the HH/LL/HL/LH
    * quadrant label.
    *
    * Plan: same broadcast z map as [[moransI]], one keyed neighbor
    * aggregate, stateless closed form. */
  def localMoran(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val gm = ma.agg(round(avg(col("ma")) + lit(1e-9), 6).as("gm"),
      count(lit(1)).as("n"))
    val z = ma.crossJoin(broadcast(gm))
      .select(col("station_id"), round(col("ma") - col("gm") + lit(1e-9), 6).as("z"))
    val m2 = z.agg((sum(col("z") * col("z")) / count(lit(1))).as("m2"))
    val lagZ = knn.select(col("station_id"), col("nb_id"))
      .join(broadcast(z.select(col("station_id").as("nb_id"), col("z").as("zj"))),
        Seq("nb_id"))
      .groupBy(col("station_id"))
      .agg(round(avg(col("zj")) + lit(1e-9), 6).as("lag_z"))
    z.join(lagZ, Seq("station_id"))
      .crossJoin(broadcast(m2))
      .withColumn("local_i",
        when(col("m2") > 0.0,
          round(col("z") * col("lag_z") / col("m2") + lit(1e-9), 6)))
      .withColumn("quadrant",
        when(col("z") >= 0.0 && col("lag_z") >= 0.0, "HH")
          .when(col("z") < 0.0 && col("lag_z") < 0.0, "LL")
          .when(col("z") >= 0.0, "HL").otherwise("LH"))
      .select(col("station_id"), col("z"), col("lag_z"), col("local_i"),
        col("quadrant"))
  }

  /** Geary's C over the kNN graph — Moran's local-difference twin
    * (C < 1 positive spatial autocorrelation, 1 = none, > 1 negative;
    * C weights squared NEIGHBOR DIFFERENCES where Moran weights
    * cross-products, so it is the more sensitive of the two to local
    * breaks): C = (n−1)·Σw(xᵢ−xⱼ)² / (2W·Σ(xᵢ−x̄)²).
    *
    * Plan: identical shape to [[moransI]] — broadcast value map onto
    * the O(k·n) edge list, two scalar rollups. */
  def gearyC(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val gm = ma.agg(round(avg(col("ma")) + lit(1e-9), 6).as("gm"),
      count(lit(1)).as("n"))
    val den = ma.crossJoin(broadcast(gm))
      .agg(sum((col("ma") - col("gm")) * (col("ma") - col("gm"))).as("den"),
        first(col("n")).as("n"))
    val num = knn.select(col("station_id"), col("nb_id"))
      .join(broadcast(ma.select(col("station_id"), col("ma"))), Seq("station_id"))
      .join(broadcast(ma.select(col("station_id").as("nb_id"), col("ma").as("mj"))),
        Seq("nb_id"))
      .agg(sum((col("ma") - col("mj")) * (col("ma") - col("mj"))).as("num"),
        count(lit(1)).as("w_edges"))
    num.crossJoin(broadcast(den))
      .withColumn("geary_c",
        when(col("den") > 0.0,
          round((col("n") - 1) * col("num")
            / (lit(2.0) * col("w_edges") * col("den")) + lit(1e-9), 6)))
      .select(col("n"), col("w_edges"), col("geary_c"))
  }

  /** Getis–Ord Gi* hotspot z-score per station (the OTHER spatial
    * hotspot statistic beside [[localMoran]] — Gi* asks "is the local
    * NEIGHBORHOOD SUM high?", LISA asks "does i resemble its
    * neighbors?"), star variant: the focal station counts in its own
    * neighborhood. Binary kNN weights give the textbook closed form
    * with Σw = k+1.
    *
    * Plan: one broadcast value map onto the O(k·n) edge list, one
    * keyed neighbor-sum aggregate, scalar moment frame, stateless
    * closed form. */
  def getisOrd(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val g = ma.agg(count(lit(1)).as("n"),
      round(avg(col("ma")) + lit(1e-9), 6).as("xbar"),
      sum(col("ma") * col("ma")).as("sxx"))
    val nbSum = knn.select(col("station_id"), col("nb_id"))
      .join(broadcast(ma.select(col("station_id").as("nb_id"), col("ma").as("xj"))),
        Seq("nb_id"))
      .groupBy(col("station_id"))
      .agg(sum(col("xj")).as("s_nb"), count(lit(1)).as("k"))
    ma.join(nbSum, Seq("station_id"))
      .crossJoin(broadcast(g))
      .withColumn("wsum", col("s_nb") + col("ma"))
      .withColumn("wn", col("k") + 1)
      .withColumn("s",
        sqrt(greatest(col("sxx") / col("n") - col("xbar") * col("xbar"),
          lit(0.0))))
      .withColumn("den",
        col("s") * sqrt(greatest(
          (col("n") * col("wn") - col("wn") * col("wn")).cast("double")
            / (col("n") - 1), lit(0.0))))
      .withColumn("gi_z",
        when(col("den") > 0.0,
          round((col("wsum") - col("xbar") * col("wn")) / col("den")
            + lit(1e-9), 6)))
      .withColumn("hotspot",
        when(col("gi_z") > 1.96, "hot").when(col("gi_z") < -1.96, "cold")
          .otherwise("ns"))
      .select(col("station_id"), col("k"), col("gi_z"), col("hotspot"))
  }

  /** Cutler's RSI over the daily series (the SMA form of the relative
    * strength index — window-expressible, unlike Wilder's recursive
    * smoothing): RS = SMA_p(gains)/SMA_p(losses) on the day-over-day
    * diffs, RSI = 100 − 100/(1+RS); only complete p-day windows
    * report. The momentum twin of [[ewmaControl]]'s level control.
    *
    * Plan: one lag + three trailing frames on ONE (station, day)
    * sort; everything partition-local per station. */
  def rsi(rawDaily: DataFrame, period: Int = 14): DataFrame = {
    val wo = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val wp = wo.rowsBetween(-(period - 1), 0)
    rawDaily.withColumn("x", coalesce(col("raw"), lit(0.0)))
      .withColumn("diff", col("x") - lag(col("x"), 1).over(wo))
      .withColumn("gain", when(col("diff") > 0.0, col("diff")).otherwise(lit(0.0)))
      .withColumn("loss", when(col("diff") < 0.0, -col("diff")).otherwise(lit(0.0)))
      .withColumn("n_w", count(col("diff")).over(wp))
      .withColumn("avg_gain", avg(col("gain")).over(wp))
      .withColumn("avg_loss", avg(col("loss")).over(wp))
      .filter(col("n_w") === period)
      .withColumn("rsi",
        when(col("avg_loss") > 0.0,
          round(lit(100.0) - lit(100.0)
            / (lit(1.0) + col("avg_gain") / col("avg_loss")) + lit(1e-9), 4))
          .otherwise(lit(100.0)))
      .select(col("station_id"), col("day"), col("rsi"))
  }

  /** Kendall's τ-b between station elevation and period-mean value on
    * the decile-binned contingency table (does precipitation climb
    * with elevation, rank-robustly?). Binning first is the
    * scale-correct form: exact pairwise concordance is O(#stations²),
    * the binned version is one keyed aggregate to a ≤ 10×10 cell
    * table and exact O(cells²) concordance counting on that — the
    * grouped-data τ-b of the categorical-statistics textbooks.
    *
    * Plan: ntile deciles over the O(#stations) registry (one dim-frame
    * sort), one aggregate to ≤ 100 cells, constant-bounded nested-loop
    * pairing of the 100-row frame (LIMIT-marked for the plan guard),
    * single-row rollup. */
  def kendallTauBinned(meta: DataFrame, rawDaily: DataFrame): DataFrame = {
    val ma = rawDaily.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("ma"))
    val pts = meta.select(col("station_id"), col("elev"))
      .join(ma, Seq("station_id"))
      .withColumn("gx", ntile(10).over(Window.orderBy(col("elev"), col("station_id"))))
      .withColumn("gy", ntile(10).over(Window.orderBy(col("ma"), col("station_id"))))
    // ≤ 100 cells by construction (10 × 10 deciles); the limit is a
    // structural no-op that marks the side as constant-bounded
    val cells = pts.groupBy(col("gx"), col("gy"))
      .agg(count(lit(1)).as("cnt")).limit(100)
    val a = cells.select(col("gx").as("ax"), col("gy").as("ay"), col("cnt").as("an"))
    val b = cells.select(col("gx").as("cx"), col("gy").as("cy"), col("cnt").as("bn"))
    val prod = a.join(broadcast(b),
      col("ax") < col("cx") || (col("ax") === col("cx") && col("ay") < col("cy")))
    val s = prod.agg(
      sum(when((col("ax") < col("cx") && col("ay") < col("cy"))
          || (col("ax") > col("cx") && col("ay") > col("cy")),
        col("an") * col("bn")).otherwise(lit(0L))).as("concordant"),
      sum(when((col("ax") < col("cx") && col("ay") > col("cy"))
          || (col("ax") > col("cx") && col("ay") < col("cy")),
        col("an") * col("bn")).otherwise(lit(0L))).as("discordant"))
    val marg = cells.agg(
      sum(col("cnt")).as("n"),
      sum(col("cnt") * col("cnt")).as("s_cell"))
    val tx = cells.groupBy(col("gx")).agg(sum(col("cnt")).as("rn"))
      .agg(sum(col("rn") * col("rn")).as("s_row"))
    val ty = cells.groupBy(col("gy")).agg(sum(col("cnt")).as("cn"))
      .agg(sum(col("cn") * col("cn")).as("s_col"))
    s.crossJoin(marg).crossJoin(tx).crossJoin(ty)
      .withColumn("n_pairs", col("n") * (col("n") - 1) / 2)
      // tied-in-x pairs = Σ rn·(rn−1)/2 etc. via the squared sums
      .withColumn("t_x", (col("s_row") - col("n")) / 2)
      .withColumn("t_y", (col("s_col") - col("n")) / 2)
      .withColumn("tau_b",
        when((col("n_pairs") - col("t_x")) > 0 && (col("n_pairs") - col("t_y")) > 0,
          round((col("concordant") - col("discordant")) /
            sqrt((col("n_pairs") - col("t_x")).cast("double")
              * (col("n_pairs") - col("t_y")).cast("double")) + lit(1e-9), 6)))
      .select(col("n"), col("concordant"), col("discordant"), col("tau_b"))
  }

  /** Lyne–Hollick (1979) baseflow separation over the daily series —
    * the hydrograph-splitting staple behind every BFI report. The
    * recursive one-pass filter qf_t = α·qf_{t−1} + (1+α)/2·Δq_t is
    * re-expressed as its exact geometric convolution
    * qf_t = Σ_{i≥0} α^i·(1+α)/2·Δq_{t−i}, truncated at K = 24 terms
    * (α = 0.75 → α²⁴ ≈ 1e-3, below the 6-dp output resolution);
    * quickflow clamps to [0, q], baseflow = q − qf, BFI =
    * Σbaseflow / Σq per station. Truncation is applied IDENTICALLY in
    * the oracle, so parity is exact by construction.
    *
    * Plan: K literal-weight lag terms over one (station ORDER BY day)
    * window — partition-local per station, zero extra shuffle on the
    * grid frame; the BFI ride-along is a window sum on the same
    * partitioning. At 100 TB the filter stays a single per-station
    * scan; K is a constant, not a data term. */
  def baseflow(rawDaily: DataFrame, alpha: Double = 0.75, k: Int = 24): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val wS = Window.partitionBy(col("station_id"))
    val weights = (0 until k).map(i => (1.0 + alpha) / 2.0 * math.pow(alpha, i))
    val base = rawDaily
      .withColumn("q", coalesce(col("raw"), lit(0.0)))
      .withColumn("dq", when(lag(col("q"), 1).over(w).isNull, lit(0.0))
        .otherwise(col("q") - lag(col("q"), 1).over(w)))
    val conv = (0 until k).map { i =>
      val l = lag(col("dq"), i).over(w)
      when(l.isNotNull, l * lit(weights(i))).otherwise(lit(0.0))
    }.reduce(_ + _)
    base
      .withColumn("qf_raw", round(conv + lit(1e-9), 6))
      .withColumn("quickflow",
        least(greatest(col("qf_raw"), lit(0.0)), col("q")))
      .withColumn("baseflow", round(col("q") - col("quickflow") + lit(1e-9), 6))
      .withColumn("bfi",
        round(sum(col("baseflow")).over(wS)
          / sum(col("q")).over(wS) + lit(1e-9), 6))
      .select(col("station_id"), col("day"), col("q"), col("quickflow"),
        col("baseflow"), col("bfi"))
  }

  /** Wilcoxon signed-rank test per station: is the afternoon
    * (hours 12–23) precipitation sum systematically different from the
    * morning (0–11) sum on the same day? The PAIRED complement of the
    * Mann–Whitney two-sample test already on the board. Zero diffs
    * drop (the Wilcoxon convention); |d| ranks are average-ranks via
    * the grouped-count + cumulative-window trick (no per-row sort
    * output), W⁺ = Σ ranks of positive d, normal approximation with
    * the exact tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48.
    *
    * Plan: one (station, day) keyed aggregate over the hourly frame,
    * one (station, |d|) count collapse, one per-station cumulative
    * window on the collapsed frame, one keyed rollup — everything
    * partition-local per station. */
  def wilcoxonSigned(hourlyRaw: DataFrame): DataFrame = {
    val pairs = hourlyRaw
      .withColumn("p", coalesce(col("raw"), lit(0.0)))
      .groupBy(col("station_id"), to_date(col("hour")).as("day"))
      .agg(round(sum(when(hour(col("hour")) < 12, col("p"))
        .otherwise(lit(0.0))) + lit(1e-9), 3).as("am"),
        round(sum(when(hour(col("hour")) >= 12, col("p"))
          .otherwise(lit(0.0))) + lit(1e-9), 3).as("pm"))
      .withColumn("d", round(col("pm") - col("am") + lit(1e-9), 3))
      .filter(col("d") =!= 0.0)
    val byAbs = pairs
      .withColumn("ad", abs(col("d")))
      .groupBy(col("station_id"), col("ad"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("cnt_pos"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAbs
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("avg_rank", col("cum") - (col("cnt") - 1) / 2.0)
      .withColumn("tie3", col("cnt") * col("cnt") * col("cnt") - col("cnt"))
      .groupBy(col("station_id"))
      .agg(sum(col("cnt")).as("n_pairs"),
        round(sum(col("cnt_pos") * col("avg_rank")) + lit(1e-9), 1).as("w_plus"),
        sum(col("tie3")).as("tie_sum"))
      .withColumn("mu", col("n_pairs") * (col("n_pairs") + 1) / 4.0)
      .withColumn("var_w",
        col("n_pairs") * (col("n_pairs") + 1) * (col("n_pairs") * 2 + 1) / 24.0
          - col("tie_sum") / 48.0)
      .filter(col("var_w") > 0.0)
      .withColumn("z", round((col("w_plus") - col("mu")) / sqrt(col("var_w"))
        + lit(1e-9), 4))
      .withColumn("significant", abs(col("z")) > 1.96)
      .select(col("station_id"), col("n_pairs"), col("w_plus"),
        col("z"), col("significant"))
  }

  /** Friedman rank test: do the 7 weekday "treatments" differ across
    * station "blocks"? Per (station, dow) mean daily sum, average-ranked
    * WITHIN each station, rank sums R_j over blocks, χ²_F =
    * 12/(b·k·(k+1))·ΣR_j² − 3·b·(k+1). The k-related-samples
    * complement of the Kruskal–Wallis already on the board.
    *
    * Plan: two keyed aggregates collapse the grid to b×7 rows; the
    * within-station rank is a 7-row window; the rollup is O(k). */
  def friedman(rawDaily: DataFrame): DataFrame = {
    val cell = rawDaily
      .groupBy(col("station_id"), dayofweek(col("day")).as("dow"))
      .agg(round(avg(coalesce(col("raw"), lit(0.0))) + lit(1e-9), 6).as("m"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("m"))
    val ranked = cell
      // average rank among the 7 dow cells of one station: rank() spans
      // ties, count-of-equal closes them — (2·rank + eq − 1)/2
      .withColumn("rnk", rank().over(w))
      .withColumn("eq", count(lit(1)).over(
        Window.partitionBy(col("station_id"), col("m"))))
      .withColumn("avg_rank", (lit(2.0) * col("rnk") + col("eq") - lit(1.0)) / lit(2.0))
    val rj = ranked.groupBy(col("dow"))
      .agg(round(sum(col("avg_rank")) + lit(1e-9), 1).as("r_j"),
        count(lit(1)).as("b"),
        round(avg(col("avg_rank")) + lit(1e-9), 6).as("mean_rank"))
    val stat = rj.agg(
      sum(col("r_j") * col("r_j")).as("sum_r2"),
      max(col("b")).as("blocks"),
      count(lit(1)).as("k"))
      .withColumn("chi2_f",
        round(lit(12.0) / (col("blocks") * col("k") * (col("k") + 1))
          * col("sum_r2") - lit(3.0) * col("blocks") * (col("k") + 1)
          + lit(1e-9), 6))
      .select(col("blocks"), col("k"), col("chi2_f"))
    rj.crossJoin(stat)
      .select(col("dow"), col("b"), col("r_j"), col("mean_rank"),
        col("blocks"), col("k"), col("chi2_f"))
  }

  /** Storm-event rainfall erosivity (the USLE/RUSLE R-factor's EI
    * building block, Wischmeier & Smith 1978) over the sparse hourly
    * series: wet hours (p > wetThresh) split into storms at dry gaps
    * > `gapHours`; per storm, unit energy e_r = 0.29·(1 −
    * 0.72·e^(−0.005·p_r)) per wet hour (the A&S kinetic-energy curve
    * with the intensity scale tuned ÷10 to the synthetic hourly
    * distribution, as all Constants are), storm energy E = Σ e_r·p_r,
    * peak I60 = max hourly depth, EI = E·I60/100. Small storms
    * (total < `minTotal`) are dropped, as the reference's erosivity
    * literature drops < 12.7 mm events.
    *
    * Plan: gaps-and-islands on the WET subset only (the sparse ~9% of
    * grid hours): one (station ORDER BY hour) lag + running sum, one
    * keyed storm aggregate — partition-local per station; at 100 TB
    * the storm id never leaves the station partition. */
  def rainErosivity(hourlyRaw: DataFrame, wetThresh: Double = 10.0,
      gapHours: Int = 6, minTotal: Double = 25.0): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("hour"))
    val wet = hourlyRaw
      .filter(coalesce(col("raw"), lit(0.0)) > wetThresh)
      .withColumn("p", col("raw"))
      .withColumn("gap_h",
        (unix_timestamp(col("hour")) - unix_timestamp(lag(col("hour"), 1).over(w)))
          / lit(3600L))
      .withColumn("new_storm",
        when(col("gap_h").isNull || col("gap_h") > gapHours, 1L).otherwise(0L))
      .withColumn("storm_id", sum(col("new_storm")).over(w))
      .withColumn("e_hour",
        round(lit(0.29) * (lit(1.0) - lit(0.72) * exp(col("p") * lit(-0.005)))
          * col("p") + lit(1e-9), 6))
    wet.groupBy(col("station_id"), col("storm_id"))
      .agg(min(col("hour")).as("storm_start"),
        max(col("hour")).as("storm_end"),
        count(lit(1)).as("n_wet_hours"),
        round(sum(col("p")) + lit(1e-9), 3).as("total_p"),
        round(sum(col("e_hour")) + lit(1e-9), 6).as("energy"),
        round(max(col("p")) + lit(1e-9), 3).as("i60"))
      .filter(col("total_p") >= minTotal)
      .withColumn("ei", round(col("energy") * col("i60") / lit(100.0) + lit(1e-9), 6))
      .select(col("station_id"), col("storm_id"), col("storm_start"),
        col("storm_end"), col("n_wet_hours"), col("total_p"),
        col("energy"), col("i60"), col("ei"))
  }

  /** Circular flood-seasonality statistics per station (Burn 1997 —
    * the regionalization measure for WHEN extremes happen, not how
    * big): each year's maximum maps to an angle
    * θ = 2π(doy−1)/days_in_year on the calendar circle (the leap-year
    * denominator keeps Dec 31 of a 366-day year from aliasing onto
    * Jan 1; the mean-date back-mapping stays the 365-day convention);
    * the mean resultant length r̄ measures how
    * concentrated the flood season is (1 = same date every year,
    * 0 = uniform) and atan2 of the mean vector gives the mean flood
    * date.
    *
    * Plan: annual peaks via one (station, year) rank window
    * (partition-local, deterministic tie-break), circular moments one
    * keyed aggregate — output O(#stations). */
  def floodSeasonality(rawDaily: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
      .withColumn("yr", year(col("day")))
    val w = Window.partitionBy(col("station_id"), col("yr"))
      .orderBy(col("raw").desc, col("day").asc)
    val peaks = obs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("theta", lit(2.0 * math.Pi)
        * (dayofyear(col("day")) - lit(1)).cast("double")
        / datediff(make_date(col("yr") + lit(1), lit(1), lit(1)),
            make_date(col("yr"), lit(1), lit(1))).cast("double"))
    peaks.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_years"),
        round(avg(cos(col("theta"))) + lit(1e-9), 6).as("c_bar"),
        round(avg(sin(col("theta"))) + lit(1e-9), 6).as("s_bar"))
      .withColumn("r_bar", round(sqrt(col("c_bar") * col("c_bar")
        + col("s_bar") * col("s_bar")) + lit(1e-9), 6))
      .withColumn("ang", atan2(col("s_bar"), col("c_bar")))
      .withColumn("mean_doy", round(
        when(col("ang") < 0.0, col("ang") + lit(2.0 * math.Pi)).otherwise(col("ang"))
          / lit(2.0 * math.Pi) * lit(365.0) + lit(1.0) + lit(1e-9), 2))
      .withColumn("seasonal", col("r_bar") > 0.6)
      .select(col("station_id"), col("n_years"), col("mean_doy"),
        col("r_bar"), col("seasonal"))
  }

  /** Budyko-curve water/energy partition per station (Budyko 1974 —
    * the first-order answer to "where does the rain go"): aridity
    * index φ = PET/P from the Thornthwaite monthly climatology
    * ([[petThornthwaite]]) and the 30×-mean-daily monthly
    * precipitation normal (the Köppen convention), evaporative
    * fraction E/P = √(φ·tanh(1/φ)·(1 − e^−φ)) — tanh expanded to its
    * exp identity so both engines compute the identical expression —
    * runoff fraction 1 − E/P, and the water-/energy-limited regime
    * flag at φ = 1.
    *
    * Plan: two keyed climatology collapses + a stateless projection;
    * output O(#stations). */
  def budyko(tempStats: DataFrame, rawDaily: DataFrame): DataFrame = {
    val pet = petThornthwaite(tempStats)
      .groupBy(col("station_id"))
      .agg(round(sum(col("pet")) + lit(1e-9), 4).as("pet_ann"))
    val p = rawDaily.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), month(col("day")).as("mon"))
      .agg(round(avg(col("raw")) * lit(30.0) + lit(1e-9), 4).as("p_mon"))
      .groupBy(col("station_id"))
      .agg(round(sum(col("p_mon")) + lit(1e-9), 4).as("p_ann"))
    val phi = col("aridity")
    // tanh(1/φ) expanded to its exp identity (DuckDB has no tanh)
    val tanhInv = (lit(1.0) - exp(lit(-2.0) / phi)) /
      (lit(1.0) + exp(lit(-2.0) / phi))
    pet.join(p, Seq("station_id"))
      .filter(col("p_ann") > 0.0 && col("pet_ann") > 0.0)
      .withColumn("aridity", round(col("pet_ann") / col("p_ann") + lit(1e-9), 6))
      .withColumn("evap_fraction", round(sqrt(phi * tanhInv
        * (lit(1.0) - exp(-phi))) + lit(1e-9), 6))
      .withColumn("runoff_fraction",
        round(lit(1.0) - col("evap_fraction") + lit(1e-9), 6))
      .withColumn("regime",
        when(col("aridity") > 1.0, lit("water-limited"))
          .otherwise(lit("energy-limited")))
      .select(col("station_id"), col("p_ann"), col("pet_ann"), col("aridity"),
        col("evap_fraction"), col("runoff_fraction"), col("regime"))
  }

  /** Daily periodogram per station — Fourier power of the observed
    * daily series at integer trial periods 2..`maxPeriod` days (the
    * weekly-rhythm detector on the DAILY axis; [[diurnalHarmonics]] /
    * [[spectralEntropy]] read the hour-of-day profile instead):
    * a²+b² with a = Σx·cos(2πt/p), b = Σx·sin(2πt/p) over the
    * day ordinal t, normalized to power share across the scanned
    * periods.
    *
    * Plan: day ordinals from a per-station rank window, one bounded
    * explode (maxPeriod−1 ×) and one keyed aggregate on
    * (station, period); the share join rides a per-station total
    * (broadcast O(#stations)). */
  def periodogramDaily(rawDaily: DataFrame, maxPeriod: Int = 14): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val obs = rawDaily.filter(col("raw").isNotNull)
      .withColumn("t", (row_number().over(w) - lit(1)).cast("double"))
      .withColumn("x", col("raw"))
    val pw = obs
      .withColumn("p", explode(sequence(lit(2), lit(maxPeriod))))
      .withColumn("ang", lit(2.0 * math.Pi) * col("t") / col("p"))
      .groupBy(col("station_id"), col("p"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("x") * cos(col("ang"))) + lit(1e-9), 6).as("a"),
        round(sum(col("x") * sin(col("ang"))) + lit(1e-9), 6).as("b"))
      .withColumn("power",
        round(col("a") * col("a") + col("b") * col("b") + lit(1e-9), 4))
    val tot = pw.groupBy(col("station_id"))
      .agg(sum(col("power")).as("tot"))
      .filter(col("tot") > 0.0)
    pw.join(broadcast(tot), Seq("station_id"))
      .withColumn("power_share", round(col("power") / col("tot") + lit(1e-9), 6))
      .select(col("station_id"), col("p").as("period_days"), col("n"),
        col("power"), col("power_share"))
  }

  /** Weibull fit of the positive daily values per station by the
    * Justus power-law moment approximation (Justus et al. 1978 — the
    * wind-energy standard): shape k = (σ/μ)^−1.086, scale
    * c = μ/Γ(1+1/k) via [[gammaCol]] (oracle: DuckDB's gamma()), plus
    * the distribution mean/P63 sanity columns. Valid for CV in the
    * (0.1, 1) band the approximation covers; stations outside it are
    * filtered rather than mis-fit.
    *
    * Plan: one keyed moment aggregate + a stateless fit projection. */
  def weibullFit(rawDaily: DataFrame): DataFrame = {
    val pos = rawDaily.filter(col("raw").isNotNull && col("raw") > 0.0)
    pos.groupBy(col("station_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("raw")) + lit(1e-9), 6).as("mu"),
        round(stddev_samp(col("raw")) + lit(1e-9), 6).as("sd"))
      .filter(col("n") >= 10 && col("sd") > 0.0)
      .withColumn("cv", round(col("sd") / col("mu") + lit(1e-9), 6))
      .filter(col("cv") > 0.1 && col("cv") < 1.0)
      .withColumn("k", round(pow(col("cv"), lit(-1.086)) + lit(1e-9), 4))
      .withColumn("c",
        round(col("mu") / gammaCol(lit(1.0) + lit(1.0) / col("k")) + lit(1e-9), 4))
      .withColumn("p63", col("c")) // P(X ≤ c) = 1 − e⁻¹ ≈ 0.632 by definition
      .select(col("station_id"), col("n"), col("mu"), col("sd"), col("cv"),
        col("k"), col("c"), col("p63"))
  }

  /** Quantile-mapping bias correction of each station's daily series
    * onto its nearest neighbor's distribution — the NONLINEAR sibling
    * of the multiplicative/additive adjustments (q_adjust_mult/add):
    * each observation maps to its empirical quantile in the source
    * station's CDF (percent_rank, 1%-binned) and reads the neighbor's
    * quantile function at that bin — the standard downscaling /
    * homogenization transform when distributions differ in shape, not
    * just scale.
    *
    * Plan: percent_rank is a per-station window; each station's
    * 101-point quantile table is ONE aggregate row (percentile over
    * an array of percentages), so the mapping join broadcasts an
    * O(#stations × 101) map; no pair explosion, no global sort.
    *
    * Parity note (round-7 ADVICE): Spark `percentile` and DuckDB
    * `quantile_cont` both interpolate linearly at p·(n−1) but are
    * independent implementations — a table value landing within 1e-9
    * of a .xxxx5 boundary could round apart at the 4-dp `mapped`
    * round despite the +1e-9 nudge. Gated at all three SFs without a
    * hit; if a future feed trips it, pre-round qarr to 6 dp on BOTH
    * engines before the mapped round. */
  def quantileMapping(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val obs = rawDaily.filter(col("raw").isNotNull)
    val w = Window.partitionBy(col("station_id")).orderBy(col("raw"), col("day"))
    val ranked = obs
      .withColumn("pr", percent_rank().over(w))
      .withColumn("bin", round(col("pr") * lit(100.0) + lit(1e-9)).cast("int"))
    val qtab = obs.groupBy(col("station_id").as("nb_id"))
      .agg(expr("percentile(raw, array(" +
        (0 to 100).map(b => s"${b / 100.0}D").mkString(", ") + "))").as("qarr"))
    val nearest = knn.filter(col("rank") === 1)
      .select(col("station_id"), col("nb_id"))
    ranked
      .join(broadcast(nearest), Seq("station_id"))
      .join(broadcast(qtab), Seq("nb_id"))
      .withColumn("mapped",
        round(element_at(col("qarr"), col("bin") + 1) + lit(1e-9), 4))
      .select(col("station_id"), col("nb_id"), col("day"), col("raw"),
        col("bin"), col("mapped"))
  }

  /** FAO-56 extraterrestrial radiation and astronomical day length per
    * (station, day) — the radiation ceiling every
    * evapotranspiration / solar-resource model starts from (Allen et
    * al. 1998 eqs. 21-25, 34): solar declination δ = 0.409·sin(2πJ/365
    * − 1.39), inverse relative distance dr = 1 + 0.033·cos(2πJ/365),
    * sunset hour angle ωs = acos(−tan φ·tan δ), Ra = (24·60/π)·Gsc·dr·
    * (ωs·sinφ·sinδ + cosφ·cosδ·sinωs) with Gsc = 0.0820 MJ/m²/min,
    * day length N = 24·ωs/π. Latitude derives deterministically from
    * the registry's grid y, clamped into (−55°, 55°) so ωs stays off
    * the polar domain edge.
    *
    * Plan: a stateless trig projection over the dense grid joined to
    * the broadcast station registry — no shuffle beyond the grid's
    * own build. */
  def solarRa(grid: DataFrame, meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val latDeg = (col("y") % 100) * lit(1.1) - lit(55.0)
    val phi = radians(col("lat_deg"))
    val j = dayofyear(col("day")).cast("double")
    val ang = lit(2.0 * math.Pi) * j / lit(365.0)
    grid.select(col("station_id"), col("day"))
      .join(broadcast(meta.select(col("station_id"),
        round(latDeg + lit(1e-9), 4).as("lat_deg"))), Seq("station_id"))
      .withColumn("decl", round(lit(0.409) * sin(ang - lit(1.39)) + lit(1e-9), 6))
      .withColumn("dr", lit(1.0) + lit(0.033) * cos(ang))
      .withColumn("ws", acos(-tan(phi) * tan(col("decl"))))
      .withColumn("ra", round(lit(24.0 * 60.0 / math.Pi) * lit(0.0820) * col("dr")
        * (col("ws") * sin(phi) * sin(col("decl"))
          + cos(phi) * cos(col("decl")) * sin(col("ws"))) + lit(1e-9), 4))
      .withColumn("daylen_h", round(lit(24.0 / math.Pi) * col("ws") + lit(1e-9), 4))
      .select(col("station_id"), col("day"), col("lat_deg"), col("decl"),
        col("ra"), col("daylen_h"))
  }

  /** Degree-day snowpack model per station (the SWE bookkeeping a
    * snow hydrologist runs before any melt-season forecast):
    * precipitation falls as snow when the daily temperature proxy is
    * below 0 °C, melt is capped degree-day melt min(SWE + snow,
    * ddf·max(0, t)), and the snow-water equivalent accumulates day by
    * day, 4-dp rounded per step so both engines walk the identical
    * state path. Output per station: snow days, peak and final SWE,
    * total melt.
    *
    * Plan: one station-keyed collect of the day-sorted (p, t) array
    * (bounded by the series length — the viterbi/DTW collapse shape),
    * then a stateless higher-order fold; output is O(#stations).
    * Snowfall and the snow-day indicator are precomputed per ROW so
    * the fold lambda is pure arithmetic (round/least/greatest/+). */
  def snowpack(rawDaily: DataFrame, dailyTemp: DataFrame,
      ddf: Double = SnowpackDdf): DataFrame = {
    val joined = rawDaily.select(col("station_id"), col("day"),
        coalesce(col("raw"), lit(0.0)).as("p"))
      .join(dailyTemp.select(col("station_id"), col("day"),
        coalesce(col("t"), lit(0.0)).as("t")), Seq("station_id", "day"))
      .withColumn("snow", when(col("t") < 0.0, col("p")).otherwise(lit(0.0)))
      .withColumn("ind",
        when(col("t") < 0.0 && col("p") > 0.0, lit(1.0)).otherwise(lit(0.0)))
    val series = joined.groupBy(col("station_id"))
      .agg(expr("transform(array_sort(collect_list(struct(day, p, t, snow, ind)))," +
        " s -> array(s.p, s.t, s.snow, s.ind))").as("pt"),
        count(lit(1)).as("n_days"))
    // state a = [swe, peak, melt_total, snow_days]; element x = [p, t, snow, ind]
    val melt = s"least(a[0] + x[2], ${ddf}D * greatest(x[1], 0.0D))"
    val sweNew = s"round(a[0] + x[2] - $melt + 1.0E-9D, 4)"
    val fold = s"""
      aggregate(pt, array(0.0D, 0.0D, 0.0D, 0.0D),
        (a, x) -> array(
          $sweNew,
          greatest(a[1], $sweNew),
          round(a[2] + $melt + 1.0E-9D, 4),
          a[3] + x[3]))"""
    series.withColumn("st", expr(fold))
      .select(col("station_id"), col("n_days"),
        col("st")(3).cast("long").as("snow_days"),
        col("st")(1).as("peak_swe"),
        col("st")(0).as("end_swe"),
        col("st")(2).as("total_melt"))
  }

  /** SCS curve-number storm runoff per station (USDA TR-55): soil
    * retention S = 25400/CN − 254 mm with a deterministic station
    * curve number CN = 60 + station_id mod 40, initial abstraction
    * Ia = 0.2·S, daily runoff Q = (P − Ia)² / (P − Ia + S) when
    * P > Ia else 0. Output per station: wet/runoff day counts,
    * totals and the runoff coefficient ΣQ/ΣP.
    *
    * Plan: a stateless projection over the wet days plus one keyed
    * aggregate — no windows, no joins. */
  def scsRunoff(rawDaily: DataFrame): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull && col("raw") > 0.0)
      .withColumn("cn", lit(60.0) + (col("station_id") % 40).cast("double"))
      .withColumn("s", lit(25400.0) / col("cn") - lit(254.0))
      .withColumn("ia", lit(0.2) * col("s"))
      .withColumn("q", when(col("raw") > col("ia"),
        (col("raw") - col("ia")) * (col("raw") - col("ia"))
          / (col("raw") - col("ia") + col("s"))).otherwise(lit(0.0)))
    obs.groupBy(col("station_id"), col("cn"))
      .agg(count(lit(1)).as("n_wet_days"),
        sum(when(col("q") > 0.0, 1L).otherwise(0L)).as("n_runoff_days"),
        round(sum(col("raw")) + lit(1e-9), 3).as("total_p"),
        round(sum(col("q")) + lit(1e-9), 4).as("total_q"))
      .withColumn("runoff_coef",
        round(col("total_q") / col("total_p") + lit(1e-9), 6))
      .select(col("station_id"), col("cn"), col("n_wet_days"),
        col("n_runoff_days"), col("total_p"), col("total_q"),
        col("runoff_coef"))
  }

  /** LOWESS-style tricube local-linear smoother per station over the
    * observed daily series (Cleveland 1979, fixed ±`half`-day
    * window): each observation contributes to the 2·half+1 target
    * days around it with tricube weight w = (1 − (|u|/(half+1))³)³
    * at offset u = source − target; the smoothed value at a target
    * day is the weighted-least-squares line evaluated at u = 0:
    * ŷ = (S_uu·S_y − S_u·S_uy) / (S_w·S_uu − S_u²).
    *
    * Plan: bounded explode (2·half+1 ×) turns the ±half range join
    * into an equi-join + keyed re-aggregate on (station_id, day) —
    * no per-target rescan of the series, no window over the full
    * history; the fan-out constant is the smoother's own bandwidth. */
  def lowess(rawDaily: DataFrame, half: Int = LowessHalf): DataFrame = {
    val obs = rawDaily.filter(col("raw").isNotNull)
    val contrib = obs
      .withColumn("o", explode(sequence(lit(-half), lit(half))))
      .select(col("station_id"), expr("date_add(day, o)").as("t"),
        (-col("o")).cast("double").as("u"), col("raw"))
      .withColumn("w", pow(lit(1.0)
        - pow(abs(col("u")) / lit((half + 1).toDouble), 3.0), 3.0))
    val sums = contrib.groupBy(col("station_id"), col("t"))
      .agg(count(lit(1)).as("n_window"),
        sum(col("w")).as("sw"),
        sum(col("w") * col("u")).as("su"),
        sum(col("w") * col("raw")).as("sy"),
        sum(col("w") * col("u") * col("u")).as("suu"),
        sum(col("w") * col("u") * col("raw")).as("suy"))
      .withColumnRenamed("t", "day")
    obs.join(sums, Seq("station_id", "day"))
      .withColumn("denom", col("sw") * col("suu") - col("su") * col("su"))
      .filter(col("denom") > 1e-12)
      .withColumn("smooth", round((col("suu") * col("sy") - col("su") * col("suy"))
        / col("denom") + lit(1e-9), 6))
      .withColumn("resid", round(col("raw") - col("smooth") + lit(1e-9), 6))
      .select(col("station_id"), col("day"), col("raw"), col("n_window"),
        col("smooth"), col("resid"))
  }

  /** Lanczos (g = 7, n = 9) Γ(z) as a Column expression, valid for the
    * z ∈ (0.5, 2.5) range the GEV fit needs (no reflection branch).
    * Agrees with a library gamma to ~1e-13 — far inside the 6-decimal
    * round both engines apply, so the DuckDB oracle uses its built-in
    * gamma() against this. */
  private[tsdb] def gammaCol(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val coefs = Seq(676.5203681218851, -1259.1392167224028, 771.32342877765313,
      -176.61502916214059, 12.507343278686905, -0.13857109526572012,
      9.9843695780195716e-6, 1.5056327351493116e-7)
    val series = coefs.zipWithIndex.foldLeft(lit(0.99999999999980993)) {
      case (acc, (c, i)) => acc + lit(c) / (z - lit(1.0) + lit(i + 1.0))
    }
    val t = z - lit(1.0) + lit(7.5)
    lit(math.sqrt(2.0 * math.Pi)) * pow(t, z - lit(0.5)) * exp(-t) * series
  }

  /** Per-station GEV fit by L-moments (Hosking 1990) over daily block
    * maxima of the hourly series — the regional-frequency-analysis
    * standard next to the method-of-moments Gumbel fit
    * ([[gumbelFit]], same block convention): probability-weighted
    * moments b0/b1/b2 from the ranked maxima, L-moments λ1 = b0,
    * λ2 = 2b1 − b0, λ3 = 6b2 − 6b1 + b0, the L-CV and L-skewness
    * ratios, then the GEV shape κ = 7.8590c + 2.9554c² with
    * c = 2/(3 + t3) − ln2/ln3, scale σ = λ2·κ/(Γ(1+κ)(1 − 2^−κ)),
    * location μ = λ1 − σ(1 − Γ(1+κ))/κ and the 100-block return
    * level μ + σ/κ·(1 − (−ln 0.99)^κ). Γ via [[gammaCol]].
    *
    * Plan: block maxima are one keyed aggregate; the PWM sums ride a
    * per-station rank window (partition-local after one hash shuffle
    * on station_id); the fit is a stateless projection. PWMs are
    * b_r = Σ x_(i)·(i−1)…(i−r)/n(n−1)…(n−r) — plain sums of the
    * ranked series, no pair join, O(n log n) per station. */
  def gevLmoments(hourlyRaw: DataFrame): DataFrame = {
    val maxima = hourlyRaw.filter(col("raw").isNotNull)
      .groupBy(col("station_id"), to_date(col("hour")).as("day"))
      .agg(max(col("raw")).as("mx"))
    val wRank = Window.partitionBy(col("station_id")).orderBy(col("mx"), col("day"))
    val pwm = maxima
      .withColumn("r", row_number().over(wRank).cast("double"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("mx")).as("s0"),
        sum((col("r") - lit(1.0)) * col("mx")).as("s1"),
        sum((col("r") - lit(1.0)) * (col("r") - lit(2.0)) * col("mx")).as("s2"))
      .filter(col("n") >= 5.0)
      .withColumn("b0", round(col("s0") / col("n") + lit(1e-9), 6))
      .withColumn("b1", round(col("s1") / (col("n") * (col("n") - lit(1.0)))
        + lit(1e-9), 6))
      .withColumn("b2", round(col("s2")
        / (col("n") * (col("n") - lit(1.0)) * (col("n") - lit(2.0))) + lit(1e-9), 6))
    val lmom = pwm
      .withColumn("l1", col("b0"))
      .withColumn("l2", lit(2.0) * col("b1") - col("b0"))
      .withColumn("l3", lit(6.0) * col("b2") - lit(6.0) * col("b1") + col("b0"))
      .filter(col("l2") > 0.0)
      .withColumn("t_lcv", round(col("l2") / col("l1") + lit(1e-9), 6))
      .withColumn("t3", round(col("l3") / col("l2") + lit(1e-9), 6))
    val c = lit(2.0) / (lit(3.0) + col("t3")) - lit(math.log(2.0) / math.log(3.0))
    lmom
      .withColumn("kappa",
        round(lit(7.8590) * c + lit(2.9554) * c * c + lit(1e-9), 6))
      .filter(abs(col("kappa")) > 1e-6) // Gumbel-limit guard
      .withColumn("g1k", gammaCol(lit(1.0) + col("kappa")))
      .withColumn("sigma", round(col("l2") * col("kappa")
        / (col("g1k") * (lit(1.0) - pow(lit(2.0), -col("kappa"))))
        + lit(1e-9), 6))
      .withColumn("mu", round(col("l1")
        - col("sigma") * (lit(1.0) - col("g1k")) / col("kappa") + lit(1e-9), 6))
      .withColumn("rl100", round(col("mu") + col("sigma") / col("kappa")
        * (lit(1.0) - pow(-log(lit(1.0) - lit(0.01)), col("kappa")))
        + lit(1e-9), 4))
      .select(col("station_id"), col("n").cast("long").as("n_blocks"),
        col("l1"), col("l2"), col("t_lcv"), col("t3"), col("kappa"),
        col("sigma"), col("mu"), col("rl100"))
  }

  /** KPSS level-stationarity test per station (Kwiatkowski–Phillips–
    * Schmidt–Shin 1992) on the observed daily series: partial sums
    * S_t of the demeaned series, η = Σ S_t² / (n²·s²(l)) with the
    * Bartlett-window long-run variance s²(l) = γ̂0 + 2Σ_{j≤l}
    * (1 − j/(l+1))·γ̂_j at fixed truncation l = `maxLag`; H0
    * (level-stationary) rejected at 5% when η > 0.463. The
    * complement of the unit-root view in [[dickeyFuller]] — KPSS
    * takes stationarity as the null.
    *
    * Plan: the station mean is one keyed aggregate broadcast back;
    * S_t a per-station running sum; the γ̂_j lags partition-local
    * window lags — one hash shuffle on station_id end-to-end. */
  def kpss(rawDaily: DataFrame, maxLag: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val obs = rawDaily.filter(col("raw").isNotNull)
    val mu = obs.groupBy(col("station_id"))
      .agg(round(avg(col("raw")) + lit(1e-9), 6).as("mu"),
        count(lit(1)).cast("double").as("n"))
      .filter(col("n") >= (maxLag + 2).toDouble)
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    var e = obs.join(broadcast(mu), Seq("station_id"))
      .withColumn("e", col("raw") - col("mu"))
      .withColumn("s_t", sum(col("e")).over(w))
    (1 to maxLag).foreach { j =>
      e = e.withColumn(s"e_lag$j", lag(col("e"), j).over(w))
    }
    val gammaSums = (1 to maxLag).map(j =>
      sum(col("e") * col(s"e_lag$j")).as(s"g$j"))
    val aggCols = Seq(max(col("n")).as("n"),
      sum(col("s_t") * col("s_t")).as("ss"),
      sum(col("e") * col("e")).as("g0")) ++ gammaSums
    val bartlett = (1 to maxLag).map { j =>
      lit(2.0 * (1.0 - j.toDouble / (maxLag + 1))) * coalesce(col(s"g$j"), lit(0.0))
    }.reduce(_ + _)
    e.groupBy(col("station_id"))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("s2_lrv",
        round((col("g0") + bartlett) / col("n") + lit(1e-9), 6))
      .filter(col("s2_lrv") > 0.0)
      .withColumn("eta",
        round(col("ss") / (col("n") * col("n") * col("s2_lrv")) + lit(1e-9), 6))
      .withColumn("rejected_5pct", col("eta") > 0.463)
      .select(col("station_id"), col("n").cast("long").as("n"),
        col("s2_lrv"), col("eta"), col("rejected_5pct"))
  }

  /** Dickey–Fuller unit-root test per station (the DF(0) regression
    * Δx_t = α + ρ·x_{t−1} + ε, no augmentation): ρ̂ and its
    * t-statistic from closed-form OLS sums; unit root rejected at 5%
    * when t < −2.86 (the DF τ_μ critical value). KPSS's mirror image
    * — here the null IS the unit root.
    *
    * Plan: one partition-local lag window, one keyed aggregate, a
    * stateless fit projection. */
  def dickeyFuller(rawDaily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val obs = rawDaily.filter(col("raw").isNotNull)
      .withColumn("z", lag(col("raw"), 1).over(w))
      .filter(col("z").isNotNull)
      .withColumn("y", col("raw") - col("z"))
    obs.groupBy(col("station_id"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(col("y") * col("z")).as("syz"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") >= 10.0)
      .withColumn("szz_c", col("szz") - col("sz") * col("sz") / col("n"))
      .withColumn("syz_c", col("syz") - col("sy") * col("sz") / col("n"))
      .withColumn("syy_c", col("syy") - col("sy") * col("sy") / col("n"))
      .filter(col("szz_c") > 0.0)
      .withColumn("rho", round(col("syz_c") / col("szz_c") + lit(1e-9), 6))
      .withColumn("rss", col("syy_c") - col("rho") * col("rho") * col("szz_c"))
      .filter(col("rss") > 0.0)
      .withColumn("se", sqrt(col("rss") / (col("n") - lit(2.0)) / col("szz_c")))
      .withColumn("t_stat", round(col("rho") / col("se") + lit(1e-9), 4))
      .withColumn("unit_root_rejected", col("t_stat") < -2.86)
      .select(col("station_id"), col("n").cast("long").as("n"),
        col("rho"), col("t_stat"), col("unit_root_rejected"))
  }

  /** Engle–Granger two-step cointegration test between each station
    * and its NEAREST neighbor (knn rank 1): step 1 fits the
    * long-run relation x_a = α + β·x_b by closed-form OLS over the
    * days both series observe; step 2 runs the no-intercept
    * Dickey–Fuller regression Δu_t = ρ·u_{t−1} on the residuals.
    * Cointegrated at 5% when the residual t-statistic < −3.37 (the
    * Engle–Granger 2-variable critical value — deliberately stricter
    * than the plain DF −2.86, because û is an estimated series).
    *
    * Plan: the paired frame is one equi-join keyed on (nb_id, day)
    * after a broadcast of the O(#stations) rank-1 knn map; OLS and
    * the residual DF are two keyed aggregates over it with the
    * coefficients broadcast back between them — never a pair
    * explosion beyond the k = 1 neighbor fan-out. */
  def engleGranger(rawDaily: DataFrame, knn: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val nearest = knn.filter(col("rank") === 1)
      .select(col("station_id"), col("nb_id"))
    val a = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id"), col("day"), col("raw").as("xa"))
    val b = rawDaily.filter(col("raw").isNotNull)
      .select(col("station_id").as("nb_id"), col("day"), col("raw").as("xb"))
    val paired = a.join(broadcast(nearest), Seq("station_id"))
      .join(b, Seq("nb_id", "day"))
    val ols = paired.groupBy(col("station_id"), col("nb_id"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
        sum(col("xa") * col("xb")).as("sab"),
        sum(col("xb") * col("xb")).as("sbb"))
      .filter(col("n") >= 10.0)
      .withColumn("sbb_c", col("sbb") - col("sb") * col("sb") / col("n"))
      .filter(col("sbb_c") > 0.0)
      .withColumn("beta", round((col("sab") - col("sa") * col("sb") / col("n"))
        / col("sbb_c") + lit(1e-9), 6))
      .withColumn("alpha", round((col("sa") - col("beta") * col("sb")) / col("n")
        + lit(1e-9), 6))
      .select(col("station_id"), col("nb_id"), col("alpha"), col("beta"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("day"))
    val resid = paired.join(broadcast(ols), Seq("station_id", "nb_id"))
      .withColumn("u", col("xa") - col("alpha") - col("beta") * col("xb"))
      .withColumn("u_prev", lag(col("u"), 1).over(w))
      .filter(col("u_prev").isNotNull)
      .withColumn("du", col("u") - col("u_prev"))
    resid.groupBy(col("station_id"), col("nb_id"), col("alpha"), col("beta"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("u_prev") * col("du")).as("sud"),
        sum(col("u_prev") * col("u_prev")).as("suu"),
        sum(col("du") * col("du")).as("sdd"))
      .filter(col("n") >= 10.0 && col("suu") > 0.0)
      .withColumn("rho", round(col("sud") / col("suu") + lit(1e-9), 6))
      .withColumn("rss", col("sdd") - col("rho") * col("rho") * col("suu"))
      .filter(col("rss") > 0.0)
      .withColumn("se", sqrt(col("rss") / (col("n") - lit(1.0)) / col("suu")))
      .withColumn("t_stat", round(col("rho") / col("se") + lit(1e-9), 4))
      .withColumn("cointegrated", col("t_stat") < -3.37)
      .select(col("station_id"), col("nb_id"),
        col("n").cast("long").as("n"), col("alpha"), col("beta"),
        col("rho"), col("t_stat"), col("cointegrated"))
  }
}
