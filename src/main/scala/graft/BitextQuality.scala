package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Post-hoc quality pass for an indexed bitext run: exact-margin
  * PRECISION over the FULL mined set, computable at any corpus size.
  *
  * Why precision and not sampled-anchor recall: at production floors
  * the mining rate is ~0.2 % of sources (970 pairs / 500 k at the
  * 500 k/side boundary), so a 32-anchor sample sees an EXPECTED 0.06
  * truth pairs — anchor recall needs ≥10 k anchors before its
  * numerator is even nonzero, which prices brute lists for ~40 k
  * backward endpoints. Precision inverts the sampling: the mined
  * pairs THEMSELVES are the anchors (bounded by the mined set, never
  * the corpus), their exact forward lists cost |mined srcs| × |tgt|
  * and their endpoints' exact backward lists |endpoints| × |src| —
  * linear passes a 100 TB pipeline can afford nightly. Reported:
  * fraction of mined pairs whose EXACT-neighborhood margin also
  * clears the floor (true positives), and the near-miss band (exact
  * margin within 5 % below the floor) that separates "approximate
  * lists promoted a borderline pair" from "hallucinated pair".
  *
  * Usage: runMain graft.BitextQuality <sfDir> <listsDir> [k=4] [minMicro=1200000]
  *   listsDir = the workDir a [[graft.ext.Bitext.marginMineIndexed]]
  *   run wrote (`fwd_lists/`, `bwd_lists/` under it).
  */
object BitextQuality {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val listsDir = args(1)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val minMicro = args.drop(3).headOption.map(_.toLong).getOrElse(1200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Bitext, Similarity}
    def fmt(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)

    val emb = Tables.embeddings(spark, dir)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 =!= 0)
    // read EXACTLY the batch dirs the mining run's _batches manifest
    // names — globbing subdirectories would union stale pbatch dirs
    // from an earlier wider run or a killed run's torn dir into the
    // audited lists, corrupting the published precision (r20 ADVICE)
    def batchDirs(sub: String): Seq[String] =
      Bitext.listBatchDirs(spark, s"$listsDir/$sub")
    val fwd = spark.read.parquet(batchDirs("fwd_lists"): _*)
    val bwd = spark.read.parquet(batchDirs("bwd_lists"): _*)
    val mined = Bitext.marginFromLists(fwd, bwd, minMicro)
      .select("src_id", "tgt_id", "margin_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact lists ONLY for the mined pairs' endpoints: forward for the
    // mined srcs, backward for their exact-forward tgt endpoints
    val minedSrc = mined.keySet.map(_._1).toSeq
    val srcQ = src.filter(col("vec_id").isin(minedSrc: _*))
    val fwdX = Similarity.bruteTopK(tgt, srcQ, "vec_id", "embedding", k)
    val ends = fwdX.select(col("neighbor_id").as("vec_id")).distinct()
    val bwdX = Similarity.bruteTopK(src, tgt.join(ends, "vec_id"),
      "vec_id", "embedding", k)
    val exact = Bitext.marginFromLists(fwdX, bwdX, Long.MinValue + 1)
      .select("src_id", "tgt_id", "margin_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = mined.size
    val truePos = mined.keys.count(p => exact.get(p).exists(_ >= minMicro))
    val nearMiss = mined.keys.count(p =>
      exact.get(p).exists(m => m < minMicro && m * 100 >= minMicro * 95))
    println(s"""{"probe":"bitext_quality","dir":"$dir","lists":"$listsDir","k":$k,""" +
      s""""min_margin_micro":$minMicro,"mined_pairs":$n,"exact_margin_precision_pct":""" +
      s"""${if (n == 0) -1 else fmt(100.0 * truePos / n)},"near_miss_within_5pct":$nearMiss}""")
    spark.stop()
  }
}
