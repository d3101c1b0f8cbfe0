package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for margin-based bitext mining (ext/Bitext): the
  * registered queries certify the margin math (brute lists) and the
  * approximate seam (pinned 8×8 lists) at dev SFs; this probe prices
  * the PRODUCTION composition — [[graft.ext.Bitext.marginFromLists]]
  * over corpus-ADAPTIVE [[graft.ext.Similarity.lshTopK]] lists, the
  * shape a 100 TB run would use — at real corpus sizes, against the
  * brute-list margins as truth (pair recall of the mined set).
  *
  * Usage: runMain graft.BitextProbe <sfDir> [k=4] [minMicro=1200000]
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val minMicro = args.drop(2).headOption.map(_.toLong).getOrElse(1200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Bitext, Similarity}
    def fmt(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9) }
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "tgt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val emb = Tables.embeddings(spark, dir)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 =!= 0)
    val nS = src.count(); val nT = tgt.count()

    // truth: brute-list margins — the sf-bounded baseline. Only
    // computed while the theta-join stays feasible (~1e8 pairs on this
    // box); past that the probe prices the approximate path alone —
    // exactly the regime where brute truth CANNOT exist and the
    // production path is the only option
    val (truth, bruteSecs) =
      if (nS * nT <= 100000000L)
        timed(pairsOf(Bitext.marginMine(src, tgt, "vec_id", "embedding", k, minMicro)))
      else (Set.empty[(Long, Long)], -1.0)

    // production: adaptive lshTopK lists per side with the DEDUP
    // COUPLING's probe budget (multiprobeBudget/Depth of the derived
    // width), NOT the flat-deep qd:12:3 topK default — bitext mining
    // queries EVERY corpus row, so the probe volume multiplies the
    // corpus like the dedup pair operator, and the flat-deep shape's
    // ~299 keys/table measured an executor OOM at 100k queries/side
    // (the topK default is sized for retrieval batches, not
    // knn-graph construction)
    import graft.ext.Dedup
    def lists(corpus: org.apache.spark.sql.DataFrame, qs: org.apache.spark.sql.DataFrame,
        nC: Long, nQ: Long) = {
      val bits = Dedup.adaptiveLshBits(nC)
      Similarity.lshTopK(corpus, qs, "vec_id", "embedding", k, n = nC,
        queriesCount = nQ,
        probeBudget = Dedup.multiprobeBudget(bits),
        probeDepth = Dedup.multiprobeDepth(bits))
    }
    val (mined, lshSecs) = timed(pairsOf(Bitext.marginFromLists(
      lists(tgt, src, nT, nS), lists(src, tgt, nS, nT), minMicro)))

    val recall = if (truth.isEmpty) -1.0
      else 100.0 * truth.intersect(mined).size / truth.size
    println(s"""{"probe":"bitext_scale","dir":"$dir","n_src":$nS,"n_tgt":$nT,""" +
      s""""k":$k,"min_margin_micro":$minMicro,""" +
      s""""brute":{"secs":${fmt(bruteSecs)},"pairs":${truth.size}},""" +
      s""""lsh_adaptive":{"secs":${fmt(lshSecs)},"pairs":${mined.size},""" +
      s""""truth_pair_recall_pct":${fmt(recall)}}}""")
    spark.stop()
  }
}
