package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tsdb.Climate

/** Scale canary for the pairwise trend/DTW family: the sf0.1 feed is
  * 30 days per station, which can never expose an O(n²)-in-history
  * term — so this harness builds a TALL synthetic daily frame (3
  * stations × 10 years ≈ 120× the per-station test length) and times
  * each operator in the shape round 6 shipped (pair enumeration on
  * the raw daily series) against the round-7 default (pre-aggregated
  * granularity, banded DP), writing the ratios to CANARY_r07.json.
  *
  * Also pins the guard rail: at the default cap, the DAILY shape must
  * refuse to run (loud assert_true) rather than detonate the shuffle.
  */
object ScaleCanary {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("CANARY_r07.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDays = 3650 // 10 years daily, ~120x the 30-day test feed
    val tall = tallDaily(spark, nStations = 3, nDays = nDays)
    tall.persist().count()
    val seasonalTall = tallDaily(spark, nStations = 10, nDays = 7300)
    seasonalTall.persist().count()

    def timed(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def entryAt(op: String, scale: String, before: => DataFrame,
        after: => DataFrame): String = {
      val b = timed(before); val a = timed(after)
      val ratio = if (a > 0) b / a else Double.PositiveInfinity
      println(f"[canary] $op%-22s before=$b%8.2fs after=$a%8.2fs speedup=$ratio%8.1fx")
      f"""    "$op": {"scale": "$scale", "before_sec": $b%.3f, "after_sec": $a%.3f, "speedup": $ratio%.1f}"""
    }
    def entry(op: String, before: => DataFrame, after: => DataFrame): String =
      entryAt(op, s"$nDays days", before, after)

    // the r6 shape = pair enumeration on the raw daily series
    // (cap raised so the guard lets the "before" leg run at all);
    // the r7 shape = the operator's monthly default
    val rows = Seq(
      entry("trend_mk",
        Climate.mannKendall(tall, granularity = "day", cap = 100000),
        Climate.mannKendall(tall)),
      entry("theil_sen",
        Climate.theilSen(tall, granularity = "day", cap = 100000),
        Climate.theilSen(tall)),
      entry("sn_scale",
        Climate.snScale(tall, granularity = "day", cap = 100000),
        Climate.snScale(tall)),
      // dow seasons keep one week-period per WEEK of history (~1043
      // periods per cell on this frame -> ~544k pairs per cell); moy
      // keeps one period per YEAR (20) — measured on a wider frame
      // (10 stations x 20 years) where the per-cell quadratic is the
      // dominant term rather than fixed plan overhead
      entry("seasonal_mk",
        Climate.seasonalMannKendall(seasonalTall, season = "dow", cap = 100000),
        Climate.seasonalMannKendall(seasonalTall)),
      // DTW: the unbanded kernel (band >= n) is run on a 512-day
      // PREFIX only — at 3650 days its O(n·m²) fold-copy cost is the
      // very blowup the band exists to avoid; the banded kernel takes
      // the full 10-year series in stride
      entry("dtw",
        Climate.dtwNeighbors(tall.filter(col("day") < lit("2001-05-27").cast("date")),
          canaryKnn(spark), band = 512, cap = 100000),
        Climate.dtwNeighbors(tall, canaryKnn(spark), band = 7, cap = 100000)),
      // the global-cumsum PATTERN (concurrency / heaps_fit /
      // customer_deciles / abc_xyz): one 20M-row running sum as a
      // single-partition Window.orderBy (the r6 shape — every row
      // through ONE task) vs range-partition + prefix-sum
      entryAt("global_cumsum", s"$CumsumRows rows",
        cumsumSingle(spark), cumsumPrefix(spark)),
    )

    // guard rail: the default cap must REFUSE the daily shape loudly
    val guardMsg =
      try { Climate.mannKendall(tall, granularity = "day").collect(); "NOT-FIRED" }
      catch { case e: Exception =>
        if (e.getMessage != null && e.getMessage.contains("graft trend family"))
          "fired" else s"wrong-error: ${e.getMessage.take(80)}" }
    println(s"[canary] default-cap guard on daily shape: $guardMsg")

    val json = rows.mkString(
      "{\n" + s"""  "n_stations": 3, "n_days": $nDays, "seasonal_frame": "10x7300", "guard_on_daily": "$guardMsg",\n  "ops": {\n""",
      ",\n", "\n  }\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[canary] wrote $out")
    spark.stop()
  }

  /** Deterministic tall daily frame: hash-derived pseudo-random 3-dp
    * values, no Date.now / RNG — reruns are bit-identical. */
  def tallDaily(spark: SparkSession, nStations: Int, nDays: Int): DataFrame =
    spark.range(nStations).selectExpr("id AS station_id")
      .crossJoin(spark.range(nDays).selectExpr(
        "date_add(DATE '2000-01-01', CAST(id AS INT)) AS day"))
      .repartition(32, col("station_id"), col("day"))
      .withColumn("raw",
        round(pmod(hash(col("station_id"), col("day")), lit(10000)) / 100.0, 3))
      .withColumn("n_obs", lit(1L))

  private val CumsumRows = 100000000L

  private def cumsumBase(spark: SparkSession): DataFrame =
    spark.range(CumsumRows).select(col("id"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("v"))

  def cumsumSingle(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cumsumBase(spark).withColumn("c",
      sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def cumsumPrefix(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = cumsumBase(spark).repartitionByRange(col("id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("pid")).agg(sum(col("v")).as("s"))
      .withColumn("offset", coalesce(
        sum(col("s")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("c", sum(col("v")).over(wLocal) + col("offset"))
      .select(col("id"), col("v"), col("c"))
  }

  def canaryKnn(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0L, 1L, 1), (0L, 2L, 2), (1L, 0L, 1), (1L, 2L, 2),
      (2L, 0L, 1), (2L, 1L, 2)).toDF("station_id", "nb_id", "rank")
  }
}
