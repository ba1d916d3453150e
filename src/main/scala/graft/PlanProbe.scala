package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: break a query's cold time into driver-side planning
  * phases (analysis / optimization / physical planning) vs execution,
  * in a fresh JVM — separates Catalyst/codegen cost (a per-query
  * constant on a real cluster) from distributed work (the term that
  * scales with data volume). Usage: PlanProbe <query> [query...] */
object PlanProbe {
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
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    args.foreach { q =>
      println(s"========== $q ==========")
      val df = t(s"$q build")(SparkEntry.queries(q)(spark, sfDir))
      t(s"$q analyze")(df.queryExecution.analyzed)
      t(s"$q optimize")(df.queryExecution.optimizedPlan)
      t(s"$q physical")(df.queryExecution.executedPlan)
      t(s"$q execute")(df.write.format("noop").mode("overwrite").save())
      t(s"$q execute2")(df.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
