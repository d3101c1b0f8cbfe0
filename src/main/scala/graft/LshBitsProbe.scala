package graft

import org.apache.spark.sql.SparkSession

/** Capacity-planning probe for the embedding-LSH dedup operator: times
  * [[graft.ext.Dedup.embeddingCosinePairsLsh]] across signature widths
  * on a given data dir, printing one JSON line per width. This is the
  * measurement behind SCALE_MEASURED.md's bits-vs-corpus-size table —
  * candidate volume is ~n²/2^bits per table, so the right `bits` is a
  * function of corpus size (bits ≈ log2(n / target-occupancy)), and
  * this main is how an operator retunes it empirically before a big
  * run (the seeded-plane oracle checks the pair set exactly at any
  * setting, so retuning never loses the correctness gate).
  *
  * Usage: runMain graft.LshBitsProbe <sfDir> <bitsCsv> [reps=3]
  */
object LshBitsProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, bitsCsv) = args.take(2)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = Tables.embeddings(spark, dir).count()
    for (bits <- bitsCsv.split(",").map(_.trim.toInt)) {
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val out = graft.ext.Dedup.embeddingCosinePairsLsh(
          Tables.embeddings(spark, dir), "vec_id", "embedding",
          threshold = 0.45, bits = bits).count()
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val t = samples.map(_._1).min
      println(f"""{"probe":"lsh_bits","dir":"$dir","n":$n,"bits":$bits,"reps":$reps,"min_sec":$t%.2f,"pairs":${samples.head._2}}""")
    }
    spark.stop()
  }
}
