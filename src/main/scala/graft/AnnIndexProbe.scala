package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost/amortization probe for the persisted ANN indexes
  * (graft.ext.AnnIndex) — the r18 question: at corpus scale, how much
  * of the in-flight operators' per-batch cost is corpus-side work an
  * index pays ONCE, and where is the brute-force/LSH crossover in
  * query-batch size?
  *
  * For each requested qcount it times, end-to-end (plan + execute +
  * collect pairs):
  *   - brute        exact scan — linear in qcount × corpus
  *   - lsh-direct   in-flight adaptive lshTopK (re-pays signatures +
  *                  hot-bucket census every batch)
  *   - lsh-probe    lshTopKIndexed against a pre-built index (build
  *                  timed once, reported separately)
  *   - ivf-direct / ivf-probe — same split for the IVF tier
  * plus recall vs the brute truth and a pair-identity bit between the
  * direct and indexed answers (they must match exactly — AnnIndexSpec
  * pins it at fixture scale, this records it at corpus scale).
  *
  * Usage: runMain graft.AnnIndexProbe <sfDir> <qcountsCsv> [k=5] [indexDir]
  */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qcounts = args(1).split(",").map(_.trim.toInt).toSeq
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val idxRoot = args.drop(3).headOption.getOrElse(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_ann_index_probe").getAbsolutePath)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{AnnIndex, Similarity}

    def fmt(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()

    val fs = new org.apache.hadoop.fs.Path(idxRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxRoot), true)

    val (lshMeta, lshBuild) = timed(
      AnnIndex.lshIndexWrite(emb, "vec_id", "embedding", s"$idxRoot/lsh", n = n))
    val (ivfMeta, ivfBuild) = timed(
      AnnIndex.ivfIndexWrite(emb, "vec_id", "embedding", s"$idxRoot/ivf", n = n))
    val (pqMeta, pqBuild) = timed(
      AnnIndex.ivfPqIndexWrite(emb, "vec_id", "embedding", s"$idxRoot/ivfpq", n = n))
    println(s"""{"probe":"ann_index_build","dir":"$dir","n":$n,""" +
      s""""lsh_build_secs":${fmt(lshBuild)},"lsh_shape":"${lshMeta.tables}t x ${lshMeta.bits}b",""" +
      s""""ivf_build_secs":${fmt(ivfBuild)},"ivf_shape":"${ivfMeta.lists}L x ${ivfMeta.nProbe}P",""" +
      s""""ivfpq_build_secs":${fmt(pqBuild)},"ivfpq_shape":"${pqMeta.lists}L x ${pqMeta.nProbe}P x m${pqMeta.m}"}""")

    qcounts.foreach { qcount =>
      val qs = emb.filter(col("vec_id") < qcount)
      val (truth, bruteSecs) = timed(
        pairsOf(Similarity.bruteTopK(emb, qs, "vec_id", "embedding", k)))
      def recall(got: Set[(Long, Long)]): Double =
        100.0 * truth.intersect(got).size / truth.size

      val (lshDirect, lshDirectSecs) = timed(
        pairsOf(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, n = n,
          queriesCount = qcount)))
      val (lshProbe, lshProbeSecs) = timed(
        pairsOf(AnnIndex.lshTopKIndexed(spark, s"$idxRoot/lsh", qs, "vec_id", "embedding", k,
          queriesCount = qcount)))
      val (ivfDirect, ivfDirectSecs) = timed(
        pairsOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k, n = n,
          queriesCount = qcount)))
      val (ivfProbe, ivfProbeSecs) = timed(
        pairsOf(AnnIndex.ivfTopKIndexed(spark, s"$idxRoot/ivf", qs, "vec_id", "embedding", k,
          queriesCount = qcount)))
      val (pqDirect, pqDirectSecs) = timed(
        pairsOf(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k, n = n,
          rerank = 0)))
      val (pqProbe, pqProbeSecs) = timed(
        pairsOf(AnnIndex.ivfPqTopKIndexed(spark, s"$idxRoot/ivfpq", qs, "vec_id", "embedding", k,
          queriesCount = qcount, rerank = 0)))

      println(s"""{"probe":"ann_index","dir":"$dir","n":$n,"k":$k,"queries":$qcount,""" +
        s""""brute":{"secs":${fmt(bruteSecs)}},""" +
        s""""lsh_direct":{"secs":${fmt(lshDirectSecs)},"recall_pct":${fmt(recall(lshDirect))}},""" +
        s""""lsh_probe":{"secs":${fmt(lshProbeSecs)},"recall_pct":${fmt(recall(lshProbe))},"identical_to_direct":${lshProbe == lshDirect}},""" +
        s""""ivf_direct":{"secs":${fmt(ivfDirectSecs)},"recall_pct":${fmt(recall(ivfDirect))}},""" +
        s""""ivf_probe":{"secs":${fmt(ivfProbeSecs)},"recall_pct":${fmt(recall(ivfProbe))},"identical_to_direct":${ivfProbe == ivfDirect}},""" +
        s""""ivfpq_direct":{"secs":${fmt(pqDirectSecs)},"recall_pct":${fmt(recall(pqDirect))}},""" +
        s""""ivfpq_probe":{"secs":${fmt(pqProbeSecs)},"recall_pct":${fmt(recall(pqProbe))},"identical_to_direct":${pqProbe == pqDirect}}}""")
    }
    spark.stop()
  }
}
