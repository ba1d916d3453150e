package graft.analytics

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Event-stream analytics: structural invariants that hold on any
  * input, checked on the sf0.001 driver data. */
class EventAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)

  test("funnel stages are monotonically non-increasing") {
    val rows = EventAnalytics.funnel(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, v, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(u >= v && v >= c && c >= p, s"non-monotone funnel row: $r")
    }
    // total users across cohorts equals the distinct user count
    val total = rows.map(_.getLong(1)).sum
    assert(total === events.select(col("user_id")).distinct().count())
  }

  test("msprt: a strong persistent lift goes significant and stays; a null doesn't") {
    import spark.implicits._
    // 30 days, 200 events/arm/day; arm B converts at 30%, arm A at 10%
    val rows = for {
      d <- 1 to 30; i <- 0 until 400
    } yield {
      val uid = i.toLong // even = variant 1 (B), odd = variant 0 (A)
      val conv =
        if (uid % 2 == 0) (i / 2) % 10 < 3 // 30% of B events
        else (i / 2) % 10 < 1 // 10% of A events
      (d.toLong * 1000 + i, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
        uid, if (conv) "purchase" else "click", 1.0, "{}")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.msprt(ev).orderBy("day").collect()
    assert(out.length === 30)
    // always-valid p is non-increasing by construction (running max)
    val ps = out.map(_.getAs[Double]("p_always_valid"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(out.last.getAs[Boolean]("significant"), out.last.toString)
    // the null: both arms identical -> never significant
    val nullEv = ev.withColumn("event_type",
      when(col("user_id") % 10 < 2, "purchase").otherwise("click"))
    val nullOut = EventAnalytics.msprt(nullEv).collect()
    assert(nullOut.forall(!_.getAs[Boolean]("significant")))
  }

  test("poisson ratio: a doubled event rate in arm B is flagged; symmetric CI signs") {
    import spark.implicits._
    // 100 users per arm; arm B (even uids) emits 2 events/user, arm A 1
    val rows = (0 until 200).flatMap { uid =>
      val n = if (uid % 2 == 0) 2 else 1
      (0 until n).map(k => (uid.toLong * 10 + k,
        java.sql.Timestamp.valueOf("2024-01-05 12:00:00"), uid.toLong, "click", 1.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.poissonRatio(ev).head
    assert(r.getAs[Double]("rate_a") === 1.0 && r.getAs[Double]("rate_b") === 2.0)
    assert(math.abs(r.getAs[Double]("log_ratio") - math.log(2.0)) < 1e-6)
    assert(r.getAs[Boolean]("significant"), r.toString)
    assert(r.getAs[Double]("ci_lo") > 0.0) // the CI excludes ratio 1
  }

  test("funnel stage counts match an independent join-based rebuild") {
    // independent implementation: per-stage minima via joins instead
    // of stacked windows; total converted users must agree
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("mv"))
    val c = events.filter(col("event_type") === "click").as("e")
      .join(v, Seq("user_id")).filter(col("ts") >= col("mv"))
      .groupBy(col("user_id"), col("mv")).agg(min(col("ts")).as("mc"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") >= col("mc"))
      .select(col("user_id")).distinct()
    val f = EventAnalytics.funnel(events)
      .agg(sum(col("n_view")), sum(col("n_click")), sum(col("n_purchase"))).head
    assert(f.getLong(0) === v.count())
    assert(f.getLong(1) === c.count())
    assert(f.getLong(2) === p.count())
  }

  test("retention offset 0 equals cohort size and all offsets are non-negative") {
    val r = EventAnalytics.retention(events)
    assert(r.filter(col("offset_days") < 0).count() === 0)
    val day0 = r.filter(col("offset_days") === 0)
      .agg(sum(col("n_active"))).head.getLong(0)
    // every user is active on their own first day
    assert(day0 === events.select(col("user_id")).distinct().count())
  }

  test("histogram counts partition the events exactly") {
    val h = EventAnalytics.histogram(events)
    assert(h.agg(sum(col("n"))).head.getLong(0) === events.count())
    // bucket_lo is consistent with the bucket index
    assert(h.filter(col("bucket_lo") =!= round(col("bucket") * 5.0 + lit(1e-9), 1))
      .count() === 0)
  }

  test("json props parse every row and values stay in the generated domain") {
    val j = EventAnalytics.jsonProps(events)
    val bad = j.filter(col("n") =!= col("n_k")).count()
    assert(bad === 0, "unparseable props rows")
    j.collect().foreach { r =>
      assert(!r.isNullAt(3) && !r.isNullAt(4))
      assert(r.getLong(3) <= r.getLong(4)) // min <= max
    }
  }

  test("quantiles are ordered and bracket the per-type min/max") {
    val q = EventAnalytics.quantiles(events).collect()
    assert(q.nonEmpty)
    val bounds = events.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    q.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"unordered quantiles: $r")
      val (lo, hi) = bounds(r.getString(0))
      assert(p50 >= lo - 1e-6 && p99 <= hi + 1e-6)
    }
  }

  test("cube subtotal levels are mutually consistent") {
    val c = EventAnalytics.cubeAgg(events).collect()
    val total = events.count()
    // gid=3: grand total; each partial level must re-sum to it
    assert(c.filter(_.getLong(2) == 3L).map(_.getLong(3)).sum === total)
    assert(c.filter(_.getLong(2) == 2L).map(_.getLong(3)).sum === total) // by day
    assert(c.filter(_.getLong(2) == 1L).map(_.getLong(3)).sum === total) // by type
    assert(c.filter(_.getLong(2) == 0L).map(_.getLong(3)).sum === total) // leaves
    // ALL sentinel appears exactly on the rolled-up dimensions
    c.foreach { r =>
      val gid = r.getLong(2)
      assert((r.getString(0) == "ALL") === ((gid & 2L) != 0), s"bad type roll: $r")
      assert((r.getString(1) == "ALL") === ((gid & 1L) != 0), s"bad day roll: $r")
    }
  }

  test("z-score anomalies exceed the threshold and never use future data") {
    val a = EventAnalytics.anomalyZscore(events, lookback = 24, zThresh = 2.5)
    val rows = a.collect()
    assert(rows.nonEmpty, "expected some anomalies at z>=2.5 on sf0.001")
    rows.foreach(r => assert(math.abs(r.getDouble(5)) >= 2.5))
    // leakage check: an injected extreme FIRST event for a fresh user
    // must never be flagged (no prior baseline exists for it)
    val spiked = events.unionByName(
      events.limit(1).select(
        lit(999999L).as("event_id"), col("ts"), lit(424242L).as("user_id"),
        col("event_type"), lit(1e6).as("value"), col("props")))
    assert(EventAnalytics.anomalyZscore(spiked)
      .filter(col("user_id") === 424242L).count() === 0)
  }

  test("table checksum is partitioning- and order-independent, content-sensitive") {
    import graft.sources.Sources
    val base = Sources.tableChecksum(events).head
    // different partitioning / row order must not change the checksum
    val shuffled = Sources.tableChecksum(
      events.repartition(7, col("event_type")).sortWithinPartitions(col("value").desc)).head
    assert(base === shuffled)
    // any single-row content change must flip it
    val tampered = Sources.tableChecksum(
      events.withColumn("value",
        when(col("event_id") === 1, col("value") + 1.0).otherwise(col("value")))).head
    assert(base.getLong(0) === tampered.getLong(0)) // same row count
    assert(base.getLong(1) !== tampered.getLong(1)) // xor flips
  }

  test("hll estimate lands within the expected m=64 error band") {
    // HLL standard error is 1.04/sqrt(64) = 13%; allow 3 sigma
    val rows = EventAnalytics.hllDistinct(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) < 0.40, s"hll estimate too far off: $r")
    }
  }

  test("transition matrix ties out: counts = events - users, origin shares sum to 1") {
    val t = EventAnalytics.transitions(events).collect()
    assert(t.nonEmpty)
    // each user contributes (n_events - 1) transitions
    val totalTrans = t.map(_.getAs[Long]("n")).sum
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(totalTrans === events.count() - nUsers)
    // shares are a probability distribution per origin state
    t.groupBy(_.getAs[String]("prev_type")).foreach { case (origin, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"origin $origin shares sum to $s")
    }
  }

  test("user paths cover every user once and shares sum to 1") {
    val p = EventAnalytics.userPaths(events).collect()
    assert(p.nonEmpty)
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(p.map(_.getAs[Long]("n_users")).sum === nUsers)
    assert(math.abs(p.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    // path depth is bounded and order-deterministic: at most 5 stages
    p.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.split(">").length <= 5, s"path too deep: $path")
    }
  }

  test("window funnel stages are monotone, in-window, and bounded by the plain funnel") {
    val wf = EventAnalytics.windowFunnel(events).collect()
    assert(wf.nonEmpty)
    wf.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click_w"),
        r.getAs[Long]("n_purchase_w"))
      assert(v >= c && c >= p, s"non-monotone window-funnel row: $r")
      assert(r.getAs[Double]("click_rate") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("purchase_rate") <= 1.0 + 1e-9)
    }
    // cohorts cover exactly the users with >= 1 view
    val nViewers = events.filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(wf.map(_.getAs[Long]("n_view")).sum === nViewers)
    // the time constraint can only shrink total conversions vs the
    // unconstrained funnel
    val f = EventAnalytics.funnel(events)
      .agg(sum(col("n_click")), sum(col("n_purchase"))).head
    assert(wf.map(_.getAs[Long]("n_click_w")).sum <= f.getLong(0))
    assert(wf.map(_.getAs[Long]("n_purchase_w")).sum <= f.getLong(1))
  }

  test("active users: dau <= wau <= mau, dau matches a direct daily count") {
    val au = EventAnalytics.activeUsers(events).collect()
    assert(au.nonEmpty)
    au.foreach { r =>
      val (d, w, m) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau"))
      assert(d <= w && w <= m, s"window containment violated: $r")
    }
    val direct = events.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("count")).toMap
    au.foreach { r =>
      assert(r.getAs[Long]("dau") ===
        direct.getOrElse(r.getAs[java.sql.Date]("day"), 0L))
    }
  }

  test("pareto share: tiers nest and shares are consistent fractions") {
    val r = EventAnalytics.paretoShare(events).head
    assert(r.getAs[Long]("n_top1") <= r.getAs[Long]("n_top10"))
    assert(r.getAs[Long]("n_top10") <= r.getAs[Long]("n_users"))
    assert(r.getAs[Double]("share_top1") <= r.getAs[Double]("share_top10") + 1e-9)
    assert(r.getAs[Double]("share_top10") <= 1.0 + 1e-9)
    // top-10% by exact percentile: at most ~10% of users (+ties slack)
    assert(r.getAs[Long]("n_top10") <= math.ceil(r.getAs[Long]("n_users") * 0.11).toLong)
  }

  test("hll set algebra: union bounded by parts, estimates track exact counts") {
    val r = EventAnalytics.hllSetOps(events).head
    val (estA, estB, estU, estI) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_intersection"))
    // union registers are the element-wise max -> estimate between
    // each part and the parts' sum; intersection clamped non-negative
    assert(estU >= math.max(estA, estB) - 1e-6)
    assert(estU <= estA + estB + 1e-6)
    assert(estI >= 0.0)
    // m=64 sketch: generous error bands around the exact counts
    val nU = r.getAs[Long]("n_union_exact").toDouble
    val nI = r.getAs[Long]("n_both_exact").toDouble
    assert(math.abs(estU - nU) / nU < 0.4, s"union est $estU vs exact $nU")
    assert(nI === 0.0 || math.abs(estI - nI) / nI < 0.8,
      s"intersection est $estI vs exact $nI")
  }

  test("rfm covers every user with in-range, metric-monotone quartiles") {
    val r = EventAnalytics.rfm(events).collect()
    assert(r.length === events.select(col("user_id")).distinct().count().toInt)
    r.foreach { row =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val q = row.getAs[Int](c)
        assert(q >= 1 && q <= 4, s"$c out of quartile range: $row")
      }
      assert(row.getAs[String]("segment") ===
        s"${row.getAs[Int]("r_q")}${row.getAs[Int]("f_q")}${row.getAs[Int]("m_q")}")
      assert(row.getAs[Long]("recency_days") >= 0)
    }
    // quartile scores are monotone in their metric: sort by the metric
    // and the score must never decrease
    def monotone(metric: Row => Double, score: Row => Int, name: String): Unit = {
      val sorted = r.sortBy(metric)
      sorted.map(score).zip(sorted.tail.map(score)).foreach { case (a, b) =>
        assert(a <= b, s"$name quartile not monotone")
      }
      // the metric's scoring must actually discriminate (a broken
      // cutoff broadcast collapsing every score to 1 must fail here)
      assert(sorted.map(score).distinct.length >= 2,
        s"$name quartile degenerate: one bucket for all users")
    }
    monotone(_.getAs[Long]("recency_days").toDouble, _.getAs[Int]("r_q"), "recency")
    monotone(_.getAs[Long]("frequency").toDouble, _.getAs[Int]("f_q"), "frequency")
    monotone(_.getAs[Double]("monetary"), _.getAs[Int]("m_q"), "monetary")
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("cohort ltv: hand-checked two-day cohort curve") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-02 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val rows = EventAnalytics.cohortLtv(ev).collect()
    assert(rows.length === 2)
    val r0 = rows(0); val r1 = rows(1)
    assert(r0.getAs[Int]("age") === 0 && r0.getAs[Double]("rev") === 10.0)
    assert(r0.getAs[Double]("cum_rev") === 10.0 && r0.getAs[Double]("ltv") === 10.0)
    assert(r1.getAs[Int]("age") === 1 && r1.getAs[Double]("cum_rev") === 15.0)
    assert(r1.getAs[Long]("n_users") === 1L && r1.getAs[Double]("ltv") === 15.0)
  }

  test("stickiness: hand-checked dau/wau with a returning user") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 11:00:00"), 1.0),
      (2L, ts("2024-01-09 11:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val rows = EventAnalytics.stickiness(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(rows.size === 2) // only days with activity appear
    assert(rows("2024-01-01").getAs[Long]("dau") === 2L)
    assert(rows("2024-01-01").getAs[Long]("wau") === 2L)
    assert(rows("2024-01-09").getAs[Long]("dau") === 1L)
    assert(rows("2024-01-09").getAs[Long]("wau") === 1L) // day-1 is out of window
    assert(rows("2024-01-09").getAs[Double]("stickiness") === 1.0)
  }

  test("benford: digits from fixed-point cents, chi2 constant per type") {
    val rows = EventAnalytics.benford(events).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("digit")).forall(d => d >= 1 && d <= 9))
      assert(rs.map(_.getAs[Double]("chi2")).distinct.length === 1)
      val shareSum = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    }
  }

  test("cvar: tail mean at or above the var threshold, mass consistent") {
    val rows = EventAnalytics.cvar(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("var95"); val c = r.getAs[Double]("cvar95")
      val n = r.getAs[Long]("n_events"); val nt = r.getAs[Long]("n_tail")
      assert(c >= v, s"conditional tail mean below VaR: $r")
      assert(nt <= n / 20 + 1, s"more than ~5% above the 95th percentile: $r")
      // tail_mass = mean-of-tail × tail-count up to rounding
      assert(math.abs(r.getAs[Double]("tail_mass") - c * nt) < 0.5 + 0.001 * nt)
    }
  }

  test("shapley attribution satisfies efficiency and share normalization") {
    val sh = EventAnalytics.shapleyAttribution(events).collect()
    assert(sh.nonEmpty)
    // efficiency axiom: Σφ = v(full set) − v(∅)
    val conv = events.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val vFull = conv.count()
    val chanUsers = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id")).distinct()
    val vEmpty = conv.join(chanUsers, Seq("user_id"), "left_anti").count()
    val tot = sh.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(tot - (vFull - vEmpty).toDouble) < 1e-3,
      s"efficiency: $tot vs ${vFull - vEmpty}")
    val shareSum = sh.flatMap(r => Option(r.getAs[Double]("share"))).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("scd2: crafted stream yields versioned contiguous intervals") {
    import spark.implicits._
    val toy = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view"),
      (2L, "2024-01-01 11:00:00", 7L, "click"), // day-1 last event wins
      (3L, "2024-01-02 09:00:00", 7L, "click"),
      (4L, "2024-01-03 09:00:00", 7L, "view"))
      .map { case (id, t, u, e) => (id, java.sql.Timestamp.valueOf(t), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val iv = EventAnalytics.scd2States(toy).collect()
    assert(iv.length === 2)
    assert(iv(0).getAs[String]("state") === "click")
    assert(iv(0).getAs[Long]("n_days") === 2L)
    assert(iv(0).getAs[java.sql.Date]("valid_to").toString === "2024-01-02")
    assert(iv(1).getAs[String]("state") === "view")
    assert(iv(1).getAs[Boolean]("is_current"))
    assert(iv(1).getAs[java.sql.Date]("valid_to").toString === "9999-12-31")
  }

  test("em mixture recovers two planted value clusters") {
    import spark.implicits._
    val toy = (1 to 50).map(i => (i.toLong, 10.0 + 0.01 * (i % 5))) ++
      (51 to 100).map(i => (i.toLong, 100.0 + 0.01 * (i % 5)))
    val df = toy.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, "view", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.emMixture(df).head
    assert(math.abs(r.getAs[Double]("mu1") - 10.0) < 1.0, r.toString)
    assert(math.abs(r.getAs[Double]("mu2") - 100.0) < 1.0, r.toString)
    assert(math.abs(r.getAs[Double]("pi1") - 0.5) < 0.05)
  }

  test("bimodality: two-point mass flags bimodal, tight cluster does not") {
    import spark.implicits._
    def mk(vals: Seq[Double], typ: String) = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, typ, v)
    }
    // two equal point masses: skew 0, kurtosis 1 → BC = 1 (maximal)
    val bimodal = mk(Seq.fill(30)(0.0) ++ Seq.fill(30)(100.0), "two")
    // peaked symmetric cluster (kurtosis ≈ 3.5) → BC ≈ 0.28 < 5/9
    val uni = mk(Seq.fill(5)(47.0) ++ Seq.fill(20)(49.0) ++ Seq.fill(20)(50.0)
      ++ Seq.fill(20)(51.0) ++ Seq.fill(5)(53.0), "one")
    val df = (bimodal ++ uni)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.bimodality(df).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("two").getAs[Boolean]("bimodal"), r("two").toString)
    assert(math.abs(r("two").getAs[Double]("bc") - 1.0) < 0.01)
    assert(!r("one").getAs[Boolean]("bimodal"), r("one").toString)
  }

  test("abSrm: hand-computed chi-square on a crafted split") {
    import spark.implicits._
    // users {2,4,6} even (variant 1), {7} odd (variant 0); one dup row
    val toy = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 7L), (5L, 2L))
      .map { case (id, u) =>
        (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, "view") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventAnalytics.abSrm(toy).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_a") === 1L && r(0).getAs[Long]("n_b") === 3L)
    assert(r(0).getAs[Double]("chi2") === 1.0) // (1−3)²/4
    assert(r(0).getAs[Double]("share_a") === 0.25)
    assert(!r(0).getAs[Boolean]("srm"))
  }
}
