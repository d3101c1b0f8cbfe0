package graft

import org.apache.spark.sql.SparkSession

/** Cost probe for the multiprobe LSH refine's physical tiers:
  * full-width broadcast refine (tier 1), quantized-broadcast slim-
  * stream prefilter (tier 2, r17), and payload-carry prefilter
  * (tier 3 — when even the int8 corpus exceeds a broadcast). All
  * tiers must produce the identical pair set (spec-pinned).
  *
  * Runs `reps` interleaved passes per requested branch (min-of-N on an
  * interleaved schedule separates box contention from a plan
  * difference, the Bench focus-mode protocol) and reports wall time,
  * the pair count (branches must agree — the spec pins set equality at
  * the verify SF), and the Bench-comparable plan digest.
  *
  * Usage: runMain graft.RefineBranchProbe <sfDir> <branchesCsv> [reps=3] [tau=0.45]
  *   branches: broadcast | shuffle | default  (default = the
  *   bytes-derived cutoff picks; records which branch engaged)
  */
object RefineBranchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val branches = args(1).split(",").map(_.trim).toSeq
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val tau = args.drop(3).headOption.map(_.toDouble).getOrElse(0.45)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    def dfFor(branch: String) = {
      val (cutoff, quantCutoff) = branch match {
        case "broadcast" => (Long.MaxValue, -1L)
        case "quant"     => (0L, Long.MaxValue)
        case "shuffle"   => (0L, 0L)
        case "default"   => (-1L, -1L)
        case other => sys.error(s"unknown branch $other")
      }
      graft.ext.Dedup.embeddingCosinePairsLshMultiprobe(
        emb, "vec_id", "embedding", threshold = tau, n = n,
        refineBroadcastMax = cutoff, quantBroadcastMax = quantCutoff)
    }

    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val counts = scala.collection.mutable.Map[String, Long]()
    for (_ <- 1 to reps; b <- branches) {
      val t0 = System.nanoTime()
      val c = dfFor(b).count()
      times(b) = times(b) :+ (System.nanoTime() - t0) / 1e9
      counts(b) = c
    }
    val out = branches.map { b =>
      val ts = times(b).sorted
      val digest = Bench.planHashDf(spark, dfFor(b))
      s""""$b":{"min":${"%.2f".formatLocal(java.util.Locale.ROOT, ts.head)},"median":${"%.2f".formatLocal(java.util.Locale.ROOT, ts(ts.size / 2))},""" +
        s""""max":${"%.2f".formatLocal(java.util.Locale.ROOT, ts.last)},"pairs":${counts(b)},"plan":"$digest"}"""
    }.mkString(",")
    println(s"""{"probe":"refine_branch","dir":"$dir","n":$n,"tau":$tau,"reps":$reps,$out}""")
    spark.stop()
  }
}
