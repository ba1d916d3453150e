package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic block release for maintained frames.
  *
  * `Dataset.unpersist()` only talks to the CacheManager, but a
  * `localCheckpoint(eager = true)`'d frame stores its blocks on the
  * UNDERLYING RDD (persisted inside the checkpoint call) — unpersisting
  * the Dataset is a no-op there, and a long-running iterative job or
  * stream would accumulate one superseded checkpoint's blocks per round
  * until the ContextCleaner happens to GC the RDD reference. This
  * helper unpersists the checkpoint's backing RDD directly (the
  * checkpointed Dataset's plan is a bare [[LogicalRDD]] leaf), making
  * the release immediate and deterministic.
  *
  * Only call it on frames that are fully superseded: a locally
  * checkpointed RDD cannot be recomputed (its lineage was truncated),
  * so any later action on the released frame fails loudly rather than
  * silently recomputing stale inputs.
  */
object Checkpoints {

  /** Release a frame's storage now: checkpoint blocks for
    * localCheckpoint'ed frames, cache blocks for persisted ones. */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => df.unpersist()
  }
}
