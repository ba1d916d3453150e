package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of queries, printing one line per query as
  * it finishes (unlike Bench, which prints a single summary line). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // match Bench
      .config("spark.shuffle.sort.bypassMergeThreshold", "1") // match Bench
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val shm = new java.io.File("/dev/shm") // match Bench
    if (shm.isDirectory && shm.canWrite)
      builder.config("spark.local.dir", "/dev/shm/graft_spark_local")
    // dev knob: extra session confs as "k=v;k=v" (A/B a conf against
    // the Bench defaults without editing the contract session) —
    // applied last so it can override the defaults above
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      // sentinel: "CLEAR" drops the memoized kind frames mid-sequence,
      // reproducing Bench's warm-pass (recompute-everything) accounting
      if (name == "CLEAR") { graft.tsdb.TsQueries.clearMemo(spark); println("CLEAR") }
      else {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          // noop sink like Bench: count() would let Catalyst prune unused
          // columns (and whole Window nodes) out of the timed plan
          val n = try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            0L
          } catch { case e: Throwable => System.err.println(s"$name ERROR ${e.getMessage}"); -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$name%-24s cold=${times.head._1}%7.2f s warm=${times(1)._1}%7.2f s  rows=${times(1)._2}")
      }
    }
    spark.stop()
  }
}
