package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Loader normalization guard.
  *
  * The driver has already changed the physical encoding of
  * events.parquet `ts` once mid-run (long TIMESTAMP(NANOS) →
  * parquet timestamp[us]/TIMESTAMP_NTZ), which silently broke every
  * `unix_micros(ts)` call site for two rounds. This spec pins the
  * loader contract: whatever the driver writes, `Tables.events`
  * must hand operators a plain UTC TimestampType — and must fail
  * loudly (require) rather than pass an unknown encoding through.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events.ts normalizes to TimestampType on every sf dir") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: ts is ${df.schema("ts").dataType}, expected TimestampType")
    }
  }

  test("normalized ts supports unix_micros and bigint cast") {
    // the two access patterns the NTZ regression broke
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(unix_micros(col("ts")).as("us"), col("ts").cast("long").as("s"))
    val row = df.agg(min("us"), min("s")).head()
    assert(!row.isNullAt(0) && !row.isNullAt(1))
    assert(row.getLong(0) / 1000000L == row.getLong(1),
      "unix_micros and bigint-cast must agree on the same instant")
  }
}
