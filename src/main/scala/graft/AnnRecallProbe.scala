package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/cost probe for the ANN top-k tiers — the r15 verdict's #2:
  * `ann_recall_ivf`/`ann_recall_lsh` pinned recall at the 500-vector
  * verify SF only, the exact blind spot whose dedup-LSH analog hid a
  * 71→25→9 % collapse across corpus decades. For each requested mode
  * this probe builds the top-k query for `qcount` query vectors,
  * times it end-to-end (seed pick + candidate join + re-rank), and
  * reports recall@k against the exact brute-force baseline.
  *
  * Modes:
  *   - brute         exact scan (recall 100 % by construction; the
  *                   cost reference)
  *   - lsh-fixed     the pre-r16 pinned shape (8 tables × 8 bits,
  *                   exact collision)
  *   - lsh-adaptive  derived bits/tables + query-directed probing
  *                   (the r16 default)
  *   - ivf-fixed     the pre-r16 fixed shape (20 lists, 3 probes)
  *   - ivf-adaptive  adaptiveIvfLists/adaptiveIvfProbes (the r16
  *                   default)
  *
  * Usage: runMain graft.AnnRecallProbe <sfDir> <modesCsv> [k=5] [qcount=50]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val modes = args(1).split(",").map(_.trim).toSeq
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val qcount = args.drop(3).headOption.map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Dedup, Similarity}

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < qcount)

    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairsOf(Similarity.bruteTopK(emb, qs, "vec_id", "embedding", k))

    var calibrated: Option[(Int, Int)] = None
    val out = modes.map { m =>
      val t0 = System.nanoTime()
      val got = m match {
        case "brute" =>
          pairsOf(Similarity.bruteTopK(emb, qs, "vec_id", "embedding", k))
        case "lsh-fixed" =>
          pairsOf(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k,
            tables = 8, bits = 8))
        case "lsh-adaptive" =>
          pairsOf(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, n = n))
        case s if s.startsWith("lsh-qd:") =>
          // explicit query-side probe shape sweep: lsh-qd:<budget>:<depth>
          val parts = s.stripPrefix("lsh-qd:").split(":")
          pairsOf(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, n = n,
            probeBudget = parts(0).toInt, probeDepth = parts(1).toInt))
        case "ivf-fixed" =>
          pairsOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k,
            numCentroids = 20, nProbe = 3))
        case "ivf-adaptive" =>
          pairsOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k, n = n))
        case s if s.startsWith("ivf-recall-target") =>
          // calibration (ivfProbesForRecall; target bp after ':',
          // default 8500) then the probe at the chosen count — the
          // calibration seconds are folded into this mode's secs; the
          // calibrated shape + sample recall go in the shape string
          val bp = s.split(":").drop(1).headOption.map(_.toInt).getOrElse(8500)
          val (p, recBp) = Similarity.ivfProbesForRecall(
            emb, "vec_id", "embedding", k, recallTargetBp = bp, n = n)
          calibrated = Some((p, recBp))
          pairsOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k,
            nProbe = p, n = n))
        case s if s.startsWith("ivf-fixedp:") =>
          // probe-only cost at an explicit nProbe (no calibration in
          // the timing) — separates the build-time escalation cost
          // from what a query batch pays at the calibrated count
          pairsOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k,
            nProbe = s.stripPrefix("ivf-fixedp:").toInt, n = n))
        case "lsh-knn" =>
          // the knn-graph shape at DEFAULT args: queries == corpus, so
          // the auto-coupled probe shape must hold (the flat-deep fold
          // measured ~1e9 rows and died at 100k/side pre-r19); recall
          // is judged on the qcount sampled queries of the full graph
          val all = Similarity.lshTopK(emb, emb, "vec_id", "embedding", k,
            n = n, queriesCount = n)
          pairsOf(all.filter(col("query_id") < qcount))
        case other => sys.error(s"unknown mode $other")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = 100.0 * truth.intersect(got).size / truth.size
      val shape = m match {
        case "lsh-adaptive" =>
          val b = Dedup.adaptiveLshBits(n)
          s"${Dedup.multiprobeTables(b)}t x ${b}b qd:${Similarity.TopKProbeBudget}:${Similarity.TopKProbeDepth}"
        case s if s.startsWith("lsh-qd:") =>
          val b = Dedup.adaptiveLshBits(n)
          s"${Dedup.multiprobeTables(b)}t x ${b}b qd:${s.stripPrefix("lsh-qd:")}"
        case "ivf-adaptive" =>
          val l = Similarity.adaptiveIvfLists(n)
          s"${l}L x ${Similarity.adaptiveIvfProbes(l)}P"
        case s if s.startsWith("ivf-recall-target") =>
          val l = Similarity.adaptiveIvfLists(n)
          val (p, bp) = calibrated.getOrElse((-1, -1))
          s"${l}L x ${p}P (calibrated from ${Similarity.adaptiveIvfProbes(l)}P, sample ${bp}bp)"
        case "lsh-knn" =>
          val b = Dedup.adaptiveLshBits(n)
          val (bud, dep) = Similarity.lshAutoShape(b, n, n)
          s"${Dedup.multiprobeTables(b)}t x ${b}b qd:$bud:$dep (auto-coupled, q=n)"
        case "lsh-fixed" => "8t x 8b"
        case "ivf-fixed" => "20L x 3P"
        case s if s.startsWith("ivf-fixedp:") =>
          s"${Similarity.adaptiveIvfLists(n)}L x ${s.stripPrefix("ivf-fixedp:")}P (probe only)"
        case _ => "exact"
      }
      s""""$m":{"shape":"$shape","secs":${"%.2f".formatLocal(java.util.Locale.ROOT, secs)},"recall_pct":${"%.1f".formatLocal(java.util.Locale.ROOT, recall)}}"""
    }.mkString(",")
    println(s"""{"probe":"ann_recall","dir":"$dir","n":$n,"k":$k,"queries":$qcount,$out}""")
    spark.stop()
  }
}
