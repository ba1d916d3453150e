package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: run one registered query twice (cold+warm) with a stage
  * listener, printing per-stage wall time, task count, and total task
  * time — the local-mode substitute for the Spark UI's stage table
  * (spark.ui is off in the bench contract session). Never part of the
  * bench/verify contract.
  *
  * Usage: sbt "runMain graft.tools.StageProbe q_dedup_jaccard"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1") // match Bench
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val shm = new java.io.File("/dev/shm") // match Bench
    if (shm.isDirectory && shm.canWrite)
      builder.config("spark.local.dir", "/dev/shm/graft_spark_local")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, submitted: Long, var completed: Long = 0L,
      var tasks: Int = 0, var taskTime: Long = 0L, var gcTime: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, St]()
    val jobs = mutable.LinkedHashMap[Int, (Long, Long, String)]()
    val jobStages = mutable.LinkedHashMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(e.stageInfo.stageId) =
            St(e.stageInfo.name.take(60), System.nanoTime())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(e.stageInfo.stageId).foreach { st =>
            st.completed = System.nanoTime()
            st.tasks = e.stageInfo.numTasks
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(e.stageId).foreach { st =>
            if (e.taskMetrics != null) {
              st.taskTime += e.taskMetrics.executorRunTime
              st.gcTime += e.taskMetrics.jvmGCTime
            }
          }
        }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = (System.nanoTime(), 0L,
            Option(e.properties.getProperty("spark.job.description")).getOrElse(""))
          jobStages(e.jobId) = e.stageIds.map(_.toInt)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach { case (s, _, d) =>
            jobs(e.jobId) = (s, System.nanoTime(), d)
          }
        }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_jaccard")
    names.foreach { name =>
      (1 to 2).foreach { pass =>
        stages.synchronized(stages.clear()); jobs.synchronized(jobs.clear())
        graft.tsdb.TsQueries.clearMemo(spark)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"== $name pass=$pass total=$total%.2f s ==")
        Thread.sleep(300) // let listener events drain
        val sts = stages.synchronized(stages.toSeq)
        val js = jobs.synchronized(jobs.toSeq)
        println(f"  jobs=${js.size} stages=${sts.size} " +
          f"tasks=${sts.map(_._2.tasks).sum}")
        val stMap = sts.toMap
        val jsMap = jobStages.synchronized(jobStages.toMap)
        js.sortBy { case (_, (s, e, _)) => -(e - s) }.take(12).foreach {
          case (id, (s, e, d)) =>
            val dur = if (e > 0) (e - s) / 1e9 else -1.0
            println(f"  job $id%3d ${dur}%6.2f s  $d")
            jsMap.getOrElse(id, Nil).flatMap(sid => stMap.get(sid).map(sid -> _))
              .sortBy(-_._2.taskTime).take(4).foreach { case (sid, st) =>
                val wall = if (st.completed > 0) (st.completed - st.submitted) / 1e9 else -1.0
                println(f"    stage $sid%3d wall=$wall%6.2f s tasks=${st.tasks}%3d " +
                  f"taskTime=${st.taskTime}%6d ms gc=${st.gcTime}%5d ms  ${st.name}")
              }
        }
      }
    }
    spark.stop()
  }
}
