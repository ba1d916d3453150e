package graft.sources

import graft.SparkSpec
import graft.core.{Joins, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage-layout and skew-join capabilities, asserted at the PLAN
  * level: these are the 100 TB levers (planning-time partition
  * pruning, shuffle-free bucketed joins, salted hot keys), so the
  * specs check the physical plan, not just row equality. */
class SourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)

  test("day-partitioned write prunes excluded days at planning time") {
    val out = Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(
      events.withColumn("day", to_date(col("ts")).cast("string")), out)
    val back = spark.read.parquet(out)
    val days = back.select("day").distinct().count()
    assert(days > 1, "need multiple day partitions for a pruning test")
    val oneDay = back.filter(col("day") === "2024-01-02")
    // the day predicate must be a PartitionFilter (zero I/O for other
    // days), not a post-scan data filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"), s"day filter not pushed to partitions:\n$plan")
    // and the data itself round-trips
    assert(oneDay.count() ===
      events.filter(to_date(col("ts")) === "2024-01-02").count())
  }

  test("bucketed tables join with no exchange on either side") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    val slim = events.select("event_id", "user_id", "value")
    Sources.writeBucketed(slim, "ev_a", "user_id", nBuckets = 4, basePath = wh)
    Sources.writeBucketed(slim, "ev_b", "user_id", nBuckets = 4, basePath = wh)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real shuffle-candidate join; bucketing must replace it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("ev_a").groupBy("user_id").agg(sum("value").as("s"))
        .join(spark.table("ev_b").groupBy("user_id").agg(count(lit(1)).as("n")),
          Seq("user_id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg should be shuffle-free:\n$plan")
      assert(j.count() === slim.select("user_id").distinct().count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_ingest_bucketed: the registered query's plan is exchange-free and row-exact") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so only the bucketing can make it shuffle-free
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Sources.bucketedRoundtrip(spark, "/root/testdata/sf0.001")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed ingest query should be shuffle-free:\n$plan")
      val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      assert(q.count() ===
        ev.filter(col("event_id") % 2 === 0).select("user_id").distinct().count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the unsalted join's rows") {
    val fact = events.select(col("user_id"), col("event_id"), col("value"))
    val dim = events.groupBy("user_id").agg(avg("value").as("user_avg"))
    val plain = fact.join(dim, Seq("user_id"))
      .select("event_id", "user_avg")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val salted = Joins.saltedJoin(fact, dim, "user_id", salt = 5)
      .select("event_id", "user_avg")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(salted === plain)
    // row multiplicity preserved too, not just the distinct set
    assert(Joins.saltedJoin(fact, dim, "user_id", salt = 5).count() ===
      fact.join(dim, Seq("user_id")).count())
  }

  test("compaction collapses a fragmented dataset losslessly") {
    val dir = Files.createTempDirectory("graft_frag").toString + "/t"
    events.repartition(64).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before === 64)
    val checksum = events.agg(sum(col("event_id"))).head().getLong(0)
    Sources.compact(spark, dir, targetMB = 128)
    assert(parquetFiles < before, "compaction must reduce the file count")
    val back = spark.read.parquet(dir)
    assert(back.count() === events.count())
    assert(back.agg(sum(col("event_id"))).head().getLong(0) === checksum)
  }

  test("z-ordered layout keeps 2-D file stats tight: box query touches fewer files") {
    val nFiles = 16
    val zDir = Files.createTempDirectory("graft_z").toString
    val linDir = Files.createTempDirectory("graft_lin").toString
    Sources.writeZOrdered(events, zDir, "ts", "user_id", nFiles)
    // the single-dimension convention the z-layout competes with:
    // range-sorted by time only
    events.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(linDir)

    // lossless: same rows either way
    val zBack = spark.read.parquet(zDir)
    assert(zBack.count() === events.count())
    assert(zBack.agg(sum(col("event_id"))).head().getLong(0) ===
      events.agg(sum(col("event_id"))).head().getLong(0))

    // per-file bounding boxes (what parquet footer stats expose)
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"),
        min(col("user_id")).as("u0"), max(col("user_id")).as("u1"))
      .collect()
    // the query shape a time-sorted layout CANNOT skip for: all of
    // time, a narrow (bottom-decile) user strip. Every time-sorted
    // file spans the full user range -> touches all 16; the z-layout
    // confines the strip to the files of its user sub-range.
    val b = events.agg(
      min(col("ts")).cast("long"), max(col("ts")).cast("long"),
      min(col("user_id")), max(col("user_id"))).head()
    val (tLo, tHi) = (b.getLong(0), b.getLong(1))
    val (uLo, uHi) = (b.getLong(2), b.getLong(3))
    val (qt0, qt1) = (tLo, tHi)
    val (qu0, qu1) = (uLo, uLo + (uHi - uLo) / 10)
    def touched(bs: Array[org.apache.spark.sql.Row]) = bs.count { r =>
      val (t0, t1) = (r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000)
      val (u0, u1) = (r.getLong(3), r.getLong(4))
      t0 <= qt1 && t1 >= qt0 && u0 <= qu1 && u1 >= qu0
    }
    val zTouch = touched(boxes(zDir))
    val linTouch = touched(boxes(linDir))
    // time-sorted layout: every file containing the time slice spans
    // the FULL user range, so all ~10% of files qualify; the z-layout
    // splits that slice across user sub-ranges and skips most of them
    assert(zTouch < linTouch,
      s"z-order should touch fewer files: z=$zTouch linear=$linTouch of $nFiles")
  }

  test("mergeUpsert rewrites only touched day partitions, with exact merge semantics") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    val base = events
      .withColumn("day", to_date(col("ts")).cast("string"))
      .select(col("event_id"), col("user_id"), col("value"), col("day"))
    Sources.writePartitioned(base, dir)
    val days = base.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    assert(days.length >= 3, "need >= 3 day partitions")
    val (touchedDay, untouchedDay) = (days(1), days(0))

    def partFiles(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouchedBefore = partFiles(untouchedDay)

    // one updated key (existing event_id on the touched day, new value)
    // + one brand-new key on the same day
    val someId = base.filter(col("day") === touchedDay)
      .select(min(col("event_id"))).head().getLong(0)
    val updates = spark.createDataFrame(Seq(
      (someId, -1L, 999.25, touchedDay),
      (-42L, -1L, 123.5, touchedDay)))
      .toDF("event_id", "user_id", "value", "day")
    Sources.mergeUpsert(spark, dir, updates, Seq("event_id"))

    val back = spark.read.parquet(dir)
    // untouched partitions: same files, same mtimes — nothing moved
    assert(partFiles(untouchedDay) === untouchedBefore,
      "untouched day partition must not be rewritten")
    // updated key carries the new value; new key exists; row count is
    // base + 1 (one replace, one insert)
    assert(back.filter(col("event_id") === someId)
      .select("value").head().getDouble(0) === 999.25)
    assert(back.filter(col("event_id") === -42L).count() === 1)
    assert(back.count() === base.count() + 1)
    // other rows of the touched day survived the rewrite bit-for-bit
    val expectedTouched = base.filter(col("day") === touchedDay &&
      col("event_id") =!= someId)
    assert(back.filter(col("day") === touchedDay)
      .join(expectedTouched, Seq("event_id"), "left_semi").count() ===
      expectedTouched.count())

    // cross-partition key move (date correction): the key's OLD
    // partition must be rewritten too — no stale duplicate survives
    val movedId = base.filter(col("day") === days(2))
      .select(min(col("event_id"))).head().getLong(0)
    val move = spark.createDataFrame(Seq((movedId, -1L, 55.5, touchedDay)))
      .toDF("event_id", "user_id", "value", "day")
    Sources.mergeUpsert(spark, dir, move, Seq("event_id"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("event_id") === movedId).count() === 1,
      "moved key must exist exactly once after the merge")
    // partition-column type inference reads `day` back as DATE
    assert(after.filter(col("event_id") === movedId)
      .select(col("day").cast("string")).head().getString(0) === touchedDay)
  }

  test("mergeUpsert deletes a partition vacated by a cross-day key move") {
    val dir = Files.createTempDirectory("graft_vacate").toString + "/t"
    val base = spark.createDataFrame(Seq(
      (1L, 1.0, "2024-01-01"), (2L, 2.0, "2024-01-02")))
      .toDF("event_id", "value", "day")
    Sources.writePartitioned(base, dir)
    // the ONLY row of day 2024-01-01 moves to 2024-01-02: dynamic
    // overwrite alone would leave the vacated directory (and its stale
    // copy of key 1) behind because no output row lands in it
    val move = spark.createDataFrame(Seq((1L, 10.0, "2024-01-02")))
      .toDF("event_id", "value", "day")
    Sources.mergeUpsert(spark, dir, move, Seq("event_id"))
    val after = spark.read.parquet(dir)
    assert(after.count() === 2)
    assert(after.filter(col("event_id") === 1L).count() === 1,
      "moved key must not survive in the vacated partition")
    assert(after.filter(col("event_id") === 1L)
      .select(col("day").cast("string")).head().getString(0) === "2024-01-02")
    assert(!new java.io.File(s"$dir/day=2024-01-01").exists(),
      "vacated day directory must be removed")
  }
}
