package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codebook-size sweep for the PQ tier: recall@k vs brute cosine truth
  * as `ks` (codewords per subspace) grows — the quantization-distortion
  * knob. Usage: runMain graft.PqKsProbe <sfDir> [q=50] [k=5]
  */
object PqKsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    def fmt(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9) }
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < q)
    val truth = pairsOf(Similarity.bruteTopK(emb, qs, "vec_id", "embedding", k))
    for (ks <- Seq(16, 64, 256); r <- Seq(0, 100)) {
      // rerank=0 is the pure-ADC tier; rerank=100 adds the
      // exact-cosine refine over the 100*k ADC shortlist
      val (got, secs) = timed(pairsOf(
        Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k, ks = ks, n = n,
          rerank = r)))
      println(s"""{"probe":"pq_rerank","dir":"$dir","n":$n,"ks":$ks,"rerank":$r,""" +
        s""""ivfpq":{"secs":${fmt(secs)},"recall_pct":${fmt(100.0 * truth.intersect(got).size / truth.size)}}}""")
    }
    spark.stop()
  }
}
