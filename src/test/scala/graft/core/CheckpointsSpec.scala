package graft.core

import graft.SparkSpec

/** Checkpoints.release must actually free localCheckpoint block storage
  * — Dataset.unpersist on a checkpointed frame is a CacheManager no-op,
  * which is exactly the leak this helper exists to close. */
class CheckpointsSpec extends SparkSpec {

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release frees a localCheckpoint'ed frame's backing RDD blocks") {
    import spark.implicits._
    val before = persistentRddIds
    val ck = (1 to 100).toDF("x").localCheckpoint(true)
    val added = persistentRddIds -- before
    assert(added.nonEmpty, "localCheckpoint should persist a backing RDD")

    // Dataset.unpersist is the documented no-op — blocks survive it
    ck.unpersist(blocking = true)
    assert((persistentRddIds -- before) == added)

    Checkpoints.release(ck)
    assert((persistentRddIds -- before).isEmpty,
      "release must unpersist the checkpoint's backing RDD")
  }

  test("release falls back to Dataset.unpersist for plain persisted frames") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").persist()
    df.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Checkpoints.release(df)
    // the CacheManager entry is gone: re-persisting succeeds cleanly
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
