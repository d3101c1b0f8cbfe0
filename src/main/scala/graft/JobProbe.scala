package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profile of one registered query — the local
  * stand-in for the Spark UI's Jobs page (guide §7.1; the bench boxes
  * run with the UI disabled). Prints one line per Spark job with its
  * duration, task count and call site for the LAST rep (warm plans,
  * codegen cache hot — the state the bench's min-of-N prices), plus
  * the driver-side gap between jobs (planning/analysis/collect time
  * never attributed to any job).
  *
  * Usage: runMain graft.JobProbe <sfDir> <query> [reps=2]
  */
object JobProbe {
  private case class Job(id: Int, start: Long, var end: Long = -1L,
      var tasks: Int = 0, var site: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B experiments: SPARK_GRAFT_PROBE_CONF="k=v;k=v" applied to the
    // session before the reps — measurement-only, never used by Bench
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, System.nanoTime())
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.site = Option(e.properties.getProperty("callSite.short")).getOrElse("") +
          " :: " + e.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}x${si.numTasks}").mkString(",")
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = System.nanoTime()
      }
    })

    def f(ns: Long) = "%.3f".formatLocal(java.util.Locale.ROOT, ns / 1e9)
    var repT = 0L
    for (r <- 1 to reps) {
      jobs.clear(); order.clear()
      // mirror Bench.time's inter-query hygiene
      graft.ext.Dedup.unpersistSpanCaches()
      graft.ext.Multimodal.unpersistCaches()
      graft.ext.Analytics.unpersistCaches()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      repT = System.nanoTime() - t0
      println(s"rep $r: total ${f(repT)}s, jobs ${order.size}")
    }
    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.map(jobs.get).sortBy(_.start)
    var prevEnd = -1L
    var gapSum = 0L; var jobSum = 0L
    js.foreach { j =>
      val gap = if (prevEnd < 0) 0L else math.max(0L, j.start - prevEnd)
      gapSum += gap; jobSum += math.max(0L, j.end - j.start)
      println(f"  job ${j.id}%4d dur ${f(j.end - j.start)}s gap ${f(gap)}s tasks ${j.tasks}%4d  ${j.site}")
      prevEnd = math.max(prevEnd, j.end)
    }
    println(s"last rep: ${f(repT)}s total = ${f(jobSum)}s in-jobs + ${f(gapSum)}s inter-job gaps (+ head/tail)")
    spark.stop()
  }
}
