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
}
