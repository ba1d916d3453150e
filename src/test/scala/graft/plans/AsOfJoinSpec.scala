package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("native as-of join handles ties, gaps, and unmatched keys") {
    val trades = Seq(
      (1L, 10L, "t10"), (1L, 20L, "t20"), (2L, 5L, "t5"), (3L, 7L, "t7"))
      .toDF("key", "t", "tag")
    val quotes = Seq(
      (1L, 10L, 100L, "q_at_10_a"), (1L, 10L, 200L, "q_at_10_b"), // tie on time
      (1L, 15L, 300L, "q_at_15"),
      (2L, 6L, 400L, "q_after")) // after the only key-2 trade
      .toDF("key", "t", "qid", "qtag")
    val out = AsOf.join(trades, quotes, "key", "t", "key", "t",
        tiebreak = Seq("qid"))
      .select($"tag", $"qtag").as[(String, Option[String])]
      .collect().toMap
    assert(out("t10") === Some("q_at_10_b")) // inclusive + max tiebreak
    assert(out("t20") === Some("q_at_15"))   // latest at-or-before
    assert(out("t5") === None)               // quote is in the future
    assert(out("t7") === None)               // key never quoted
  }

  test("native as-of join equals the composed union+window form on sf0.001") {
    val ev = Tables.events(spark, dir)
    val ord = Tables.orders(spark, dir)
    val native = AsOf.join(
        ev.select("event_id", "user_id", "ts"),
        ord.select("o_orderkey", "o_custkey", "o_orderdate"),
        "user_id", "ts", "o_custkey", "o_orderdate",
        tiebreak = Seq("o_orderkey"))
      .select($"event_id", $"user_id", $"ts",
        $"o_orderkey".as("last_orderkey"),
        $"o_orderdate".cast("timestamp").as("last_orderdate"))
    val composed = graft.analytics.Queries.qAsofJoin(spark, dir)
    assert(native.count() === ev.count()) // row-preserving
    val diff = native.unionByName(composed).distinct().count()
    val inter = native.intersect(composed).count()
    assert(inter === native.count(), s"native != composed (union-distinct $diff)")
  }

  test("the physical plan is a streaming merge: no window, no union") {
    val ev = Tables.events(spark, dir)
    val ord = Tables.orders(spark, dir)
    val native = AsOf.join(
      ev.select("event_id", "user_id", "ts"),
      ord.select("o_orderkey", "o_custkey", "o_orderdate"),
      "user_id", "ts", "o_custkey", "o_orderdate", tiebreak = Seq("o_orderkey"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"composed-form machinery leaked into the native plan:\n$plan")
    // exactly the two SMJ-style keyed exchanges, none after the join
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2)
  }

  test("filters push through the as-of plan: key to both sides, time bound to the build side") {
    val ev = Tables.events(spark, dir)
    val ord = Tables.orders(spark, dir)
    def joined = AsOf.join(
      ev.select("event_id", "user_id", "ts"),
      ord.select("o_orderkey", "o_custkey", "o_orderdate"),
      "user_id", "ts", "o_custkey", "o_orderdate", tiebreak = Seq("o_orderkey"))
    val cut = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val filtered = joined
      .filter($"user_id" < 50 && $"ts" <= cut && $"event_id" % 2 === 0)

    // 1) the optimized logical plan has Filters BELOW the as-of node
    val opt = filtered.queryExecution.optimizedPlan
    val asOf = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    def hasFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.nonEmpty
    assert(hasFilter(asOf.left), "left-side filter not pushed")
    assert(hasFilter(asOf.right), "right-side key/time mirror not pushed")

    // 2) the parquet scans carry the pushed predicates
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      "LessThan\\(user_id,50\\)|LessThan\\(o_custkey,50\\)".r.findFirstIn(phys).nonEmpty,
      s"no pushed key predicate in scans:\n$phys")

    // 3) semantics unchanged: equals the composed route filtered above
    val expected = graft.analytics.Queries.qAsofJoin(spark, dir)
      .filter($"user_id" < 50 && $"ts" <= cut && $"event_id" % 2 === 0)
      .select($"event_id", $"user_id", $"ts", $"last_orderkey", $"last_orderdate")
    val actual = filtered
      .select($"event_id", $"user_id", $"ts",
        $"o_orderkey".as("last_orderkey"),
        $"o_orderdate".cast("timestamp").as("last_orderdate"))
    assert(actual.count() === expected.count())
    assert(actual.intersect(expected).count() === expected.count())
  }

  test("a narrow select prunes the as-of children down to needed + operator columns") {
    val ev = Tables.events(spark, dir)   // 6 columns
    val ord = Tables.orders(spark, dir)  // 6 columns
    val narrow = AsOf.join(ev, ord,
        "user_id", "ts", "o_custkey", "o_orderdate", tiebreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
    val opt = narrow.queryExecution.optimizedPlan
    val j = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    // left: event_id + key + time = 3; right: o_orderkey + key + time = 3
    assert(j.left.output.map(_.name).toSet === Set("event_id", "user_id", "ts"),
      s"left not pruned: ${j.left.output.map(_.name)}")
    assert(j.right.output.map(_.name).toSet ===
      Set("o_orderkey", "o_custkey", "o_orderdate"),
      s"right not pruned: ${j.right.output.map(_.name)}")
    // pruning reaches the scan: the read schemas carry only those columns
    val phys = narrow.queryExecution.executedPlan.toString
    assert(!phys.contains("event_type") && !phys.contains("o_totalprice"),
      s"unneeded columns survive to the physical plan:\n$phys")
    assert(narrow.count() === ev.count()) // still row-preserving
  }
}
