package graft

import org.apache.spark.sql.SparkSession

/** Dump the CANONICALIZED cache-free optimized plan text [[Bench.planHash]]
  * digests — the reproduction tool for a plan-hash instability: run twice
  * (two JVMs), diff the files.
  *
  * Usage: runMain graft.PlanDumpProbe <sfDir> <query> <outFile>
  */
object PlanDumpProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, out) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PROBE_WARM=query1,query2 — run other queries first to
    // reproduce the bench's session state (installed optimizer
    // extensions, session confs) before hashing the target
    sys.env.get("SPARK_GRAFT_PROBE_WARM").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { q => try SparkEntry.queries(q)(spark, sfDir).count()
                      catch { case _: Throwable => () } })
    val df = SparkEntry.queries(name)(spark, sfDir)
    // the string being dumped IS the string being hashed (same helper)
    val canon = Bench.canonicalText(spark, df)
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(canon) finally w.close()
    println(s"hash=${Bench.planHashDf(spark, df)} bytes=${canon.length}")
    spark.stop()
  }
}
