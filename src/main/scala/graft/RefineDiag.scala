package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-wise cost decomposition of the multiprobe LSH refine at a
  * given corpus — pins WHERE the beyond-broadcast branch spends its
  * time, not just the end-to-end number [[RefineBranchProbe]] records.
  * Steps (each a JSON line with wall seconds + row count):
  *
  *   cand — raw candidate-join output volume (slim sides, no refine):
  *          the stream every refine shape must consume.
  *   dist — full distinct of that raw stream: the step the r16
  *          dedupe-first shape stalled in for 31+ min at 200 k vectors
  *          (hash-agg + sort-spill of the whole stream) before being
  *          replaced by the fused map-side prefilter.
  *   bc   — end-to-end broadcast branch (refineBroadcastMax pinned
  *          above n).
  *   qt   — end-to-end quantized-broadcast slim-stream tier
  *          (refineBroadcastMax 0, quantBroadcastMax above n).
  *   sh   — end-to-end payload-carry prefilter tier (both cutoffs 0).
  *
  * Usage: runMain graft.RefineDiag <sfDir> <stepsCsv> [tau=0.45] [tables=0] [budget=0] [depth=0]
  * (tables/budget/depth 0 = corpus-derived — the operator defaults,
  * including the depth-3 escalation at >= 16 derived bits; explicit
  * values sweep the recall/cost frontier with the REAL operator.)
  */
object RefineDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val steps = args(1).split(",").map(_.trim).toSeq
    val tau = args.drop(2).headOption.map(_.toDouble).getOrElse(0.45)
    val tablesArg = args.drop(3).headOption.map(_.toInt).getOrElse(0)
    val budgetArg = args.drop(4).headOption.map(_.toInt).getOrElse(0)
    val depthArg = args.drop(5).headOption.map(_.toInt).getOrElse(0)
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
    println(s"""{"probe":"refine_diag","dir":"$dir","n":$n,"tau":$tau,"tables":$tablesArg,"budget":$budgetArg,"depth":$depthArg}""")

    def slimJoined = {
      val (exact, probed) = graft.ext.Dedup.multiprobeBucketSides(
        emb, "vec_id", "embedding", tables = tablesArg, bits = 0, seed = 42L,
        dim = 64, maxBucket = 100000, n = n, probeBudget = budgetArg, probeDepth = depthArg)
      exact.select(col("id").as("id_x"), col("t"), col("b")).hint("shuffle_hash")
        .join(probed.select(col("id").as("id_y"), col("t"), col("b")), Seq("t", "b"))
        .filter(col("id_x") =!= col("id_y"))
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"))
    }
    def branch(cutoff: Long, quantCutoff: Long = 0L) =
      graft.ext.Dedup.embeddingCosinePairsLshMultiprobe(
        emb, "vec_id", "embedding", threshold = tau, tables = tablesArg,
        n = n, probeBudget = budgetArg, probeDepth = depthArg,
        refineBroadcastMax = cutoff, quantBroadcastMax = quantCutoff)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      val secs = "%.2f".formatLocal(java.util.Locale.ROOT, (System.nanoTime() - t0) / 1e9)
      println(s"""{"step":"$name","secs":$secs,"rows":$c}""")
    }
    steps.foreach {
      case "cand" => timed("cand")(slimJoined.count())
      case "dist" => timed("dist")(slimJoined.distinct().count())
      case "bc"   => timed("bc")(branch(Long.MaxValue).count())
      case "qt"   => timed("qt")(branch(0L, Long.MaxValue).count())
      case "sh"   => timed("sh")(branch(0L).count())
      case other  => sys.error(s"unknown step $other")
    }
    spark.stop()
  }
}
