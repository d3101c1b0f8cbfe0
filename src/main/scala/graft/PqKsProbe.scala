package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codebook-size sweep for the PQ tier: recall@k vs brute cosine truth
  * as `ks` (codewords per subspace), the rerank depth, and TRAINED vs
  * hash-seeded codebooks vary.
  * Usage: runMain graft.PqKsProbe <sfDir> [q=50] [k=5]
  *        [ksCsv=16,64,256] [rerankCsv=0,10,100] [trainedCsv=false,true]
  *        [nProbe=0] [op=ivfpq|pq]
  * op=pq measures the compressed FULL scan ([[graft.ext.Similarity.pqTopK]]
  * — no probe ceiling; nProbe ignored): the default-entry-point floor
  * evidence for the r20 train-by-default contract.
  */
object PqKsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val ksList = args.drop(3).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(16, 64, 256))
    val rerankList = args.drop(4).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0, 10, 100))
    val trainedList = args.drop(5).headOption.map(_.split(",").map(_.toBoolean).toSeq)
      .getOrElse(Seq(false, true))
    // optional explicit probe count (0 = adaptive default): composes
    // the trained/rerank sweep with recall-targeted probing — the
    // rerank ceiling IS the IVF probe ceiling, so lifting nProbe lifts
    // every refined number with it
    val nProbe = args.drop(6).headOption.map(_.toInt).getOrElse(0)
    val op = args.drop(7).headOption.getOrElse("ivfpq")
    val m = args.drop(8).headOption.map(_.toInt).getOrElse(8)
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
    for (ks <- ksList; trained <- trainedList) {
      // rerank=0 is the pure-ADC tier; rerank=10 the r19 derived
      // default (R = defaultRerank(5)); rerank=100 the deep refine.
      // trained=true swaps the hash-seeded codebooks for the
      // per-subspace k-means books (pqTrainCodebooks, 2 rounds) — the
      // quality knob the r18 verdict asked to be measured against the
      // hash-seeded frontier (49 % at ks=64+R100/200k). Books train
      // once per (ks, trained) and serve every rerank depth.
      val (books, trainSecs) =
        if (!trained) (None, 0.0)
        else {
          val (b, s) = timed(Similarity.pqTrainCodebooks(
            emb, "vec_id", "embedding", m = m, ks = ks, iters = 2))
          (Some(b), s)
        }
      for (r <- rerankList) {
        val (got, secs) = timed(pairsOf(
          if (op == "pq")
            Similarity.pqTopK(emb, qs, "vec_id", "embedding", k, m = m, ks = ks,
              rerank = r, trainedCodebooks = books, trainBooks = false)
          else
            Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k, m = m, ks = ks, n = n,
              rerank = r, trainedCodebooks = books, nProbe = nProbe, trainBooks = false)))
        println(s"""{"probe":"pq_rerank","dir":"$dir","n":$n,"m":$m,"ks":$ks,"rerank":$r,"nprobe":$nProbe,""" +
          s""""trained":$trained,"train_secs":${fmt(trainSecs)},""" +
          s""""$op":{"secs":${fmt(secs)},"recall_pct":${fmt(100.0 * truth.intersect(got).size / truth.size)}}}""")
      }
    }
    spark.stop()
  }
}
