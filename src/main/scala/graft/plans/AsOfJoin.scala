package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftSqlBridge

/** Native as-of join — a whole-operator Catalyst extension
  * (LogicalPlan + Strategy + SparkPlan, the §4(c) route), used where
  * composing built-ins genuinely costs more: the composed as-of
  * (union both tables + running `last() over` window,
  * [[graft.analytics.Queries.qAsofJoin]]) shuffles and sorts the
  * UNION — probe rows pay the window machinery and the build columns
  * ride along as nulls through the whole exchange. This operator
  * instead declares SortMergeJoin-style requirements (cluster each
  * side by its key, sort by (key, time)) and EnsureRequirements plans
  * the minimal exchanges; the per-partition merge is then a single
  * forward scan of both sorted streams, O(|L| + |R|), buffering
  * exactly ONE build row — the classic streaming merge as-of, the
  * shape kdb/QuestDB/Pandas merge_asof execute on one node, here per
  * co-partition.
  *
  * Semantics: for every left row, the LAST right row of the same key
  * with rightTime <= leftTime (inclusive); ties on rightTime resolve
  * to the last row in `rightTiebreak` ascending order. Unmatched left
  * rows keep nulls on the right — left-outer, row-preserving.
  *
  * Scale shape: identical to a sort-merge join — two keyed shuffles
  * (or zero over bucketed/pre-partitioned inputs: the required
  * distribution is satisfied by bucketing, exactly like SMJ), no
  * window state, no union blow-up; each task streams its key range.
  */
case class AsOfJoinPlan(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; register per-session
  * (GraftSqlBridge does it on first use) or cluster-wide via
  * GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, lt, rk, rt, tb, l, r) =>
      AsOfJoinExec(lk, lt, rk, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming-merge as-of join. Key and time expressions MUST
  * evaluate to long-backed types (LongType; TimestampType = micros) —
  * [[AsOf.join]] normalizes inputs so this holds. */
case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SMJ-style requirements: EnsureRequirements co-partitions the two
  // sides on their keys (inserting exchanges only where the child's
  // existing partitioning — e.g. bucketing — doesn't already satisfy)
  // and sorts each partition, so doExecute sees aligned sorted streams.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    // key/time are attribute refs by construction (AsOf.join projects
    // them as columns) — read them as primitive longs by ordinal; the
    // interpreted-eval path stays as the fallback for direct plan users
    def ordinalOf(e: Expression, out: Seq[Attribute]): Int = e match {
      case a: Attribute => out.indexWhere(_.exprId == a.exprId)
      case _ => -1
    }
    val lkOrd = ordinalOf(leftKey, left.output)
    val ltOrd = ordinalOf(leftTime, left.output)
    val rkOrd = ordinalOf(rightKey, right.output)
    val rtOrd = ordinalOf(rightTime, right.output)
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val toUnsafe = UnsafeProjection.create(allOut, lOut ++ rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rFields = rOut.size
      // one-row lookahead over the right stream, null-keyed rows skipped
      var rHead: InternalRow = null
      var rK = 0L; var rT = 0L
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          if (rkOrd >= 0 && rtOrd >= 0) {
            if (!r.isNullAt(rkOrd) && !r.isNullAt(rtOrd)) {
              rHead = r; rK = r.getLong(rkOrd); rT = r.getLong(rtOrd)
              rValid = true
            }
          } else {
            val k = rkB.eval(r); val t = rtB.eval(r)
            if (k != null && t != null) {
              rHead = r; rK = k.asInstanceOf[Long]; rT = t.asInstanceOf[Long]
              rValid = true
            }
          }
        }
      }
      advanceRight()
      // current best match: the last right row consumed for candK.
      // Sorter output rows are UnsafeRows whose backing buffer the
      // iterator reuses — buffer the candidate via copyFrom into ONE
      // preallocated UnsafeRow instead of allocating a copy per
      // consumed right row.
      val candBuf = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rFields)
      // copyFrom requires a byte[]-backed target at the array base
      // offset; a bare new UnsafeRow has neither (null base, offset 0)
      // and copyFrom into it writes wild memory. Seed a real buffer —
      // copyFrom re-grows it whenever an incoming row is larger.
      candBuf.pointTo(new Array[Byte](64), 64)
      var cand: InternalRow = null
      var candK = 0L
      def bufferCandidate(r: InternalRow): Unit = r match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          candBuf.copyFrom(u); cand = candBuf
        case other => cand = other.copy()
      }
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          var lK = 0L; var lT = 0L; var lNull = false
          if (lkOrd >= 0 && ltOrd >= 0) {
            lNull = l.isNullAt(lkOrd) || l.isNullAt(ltOrd)
            if (!lNull) { lK = l.getLong(lkOrd); lT = l.getLong(ltOrd) }
          } else {
            val lkA = lkB.eval(l); val ltA = ltB.eval(l)
            lNull = lkA == null || ltA == null
            if (!lNull) { lK = lkA.asInstanceOf[Long]; lT = ltA.asInstanceOf[Long] }
          }
          if (lNull) return toUnsafe(joined(l, nullRight))
          // consume right rows that are now in the past of (lK, lT);
          // right sort order makes the last consumed row of lK's run
          // the max-(time, tiebreak) match — buffer just that one
          while (rValid && (rK < lK || (rK == lK && rT <= lT))) {
            if (rK == lK) { bufferCandidate(rHead); candK = lK }
            advanceRight()
          }
          if (cand != null && candK == lK) toUnsafe(joined(l, cand))
          else toUnsafe(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API. */
object AsOf {

  /** As-of join `left` to `right`: for each left row, the latest right
    * row of the same key with `rightTime <= leftTime` (ties → last in
    * ascending `tiebreak` order). Right columns come back nullable;
    * every left row survives. Key columns are normalized to long and
    * time columns to timestamp before planning, so any integer key and
    * date/timestamp time column works. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def att(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    // already-long keys / already-timestamp times are used DIRECTLY
    // (no helper cast column): user filters then sit on the very
    // attribute the operator declares as its key, which is what lets
    // AsOfFilterPushdown mirror them to the other side
    def prep(df: DataFrame, key: String, time: String): (LogicalPlan, Attribute, Attribute) = {
      val needK = df.schema(key).dataType != LongType
      val needT = df.schema(time).dataType != TimestampType
      val df2 = if (needK) df.withColumn("__asof_k", col(key).cast("long")) else df
      val df3 = if (needT) df2.withColumn("__asof_t", col(time).cast("timestamp")) else df2
      val p = df3.queryExecution.analyzed
      (p, att(p, if (needK) "__asof_k" else key), att(p, if (needT) "__asof_t" else time))
    }
    val (lp, lk, lt) = prep(left, leftKey, leftTime)
    val (rp, rk, rt) = prep(right, rightKey, rightTime)
    val plan = AsOfJoinPlan(lk, lt, rk, rt, tiebreak.map(att(rp, _)), lp, rp)
    GraftSqlBridge.ofRows(left.sparkSession, plan, AsOfJoinStrategy)
      .drop("__asof_k", "__asof_t")
  }
}
