package graft

import org.apache.spark.sql.SparkSession

/** Recall-planning probe for the embedding-LSH dedup operator: computes
  * the exact cosine ground truth (pairs with cos >= tau) driver-side,
  * then for a grid of (tables, bits) reports how many ground-truth
  * pairs collide in at least one prefix-stable hash table
  * ([[graft.ext.Similarity.hyperplanesPrefix]] — the adaptive path's
  * plane draw). This is the measurement behind the tables-vs-bits
  * coupling in [[graft.ext.Dedup.adaptiveLshTables]]: per-table
  * collision probability is (1 - theta/pi)^bits, so holding a recall
  * floor as the derived width grows requires more tables; the probe
  * turns that formula into recorded numbers on the actual fixtures.
  *
  * Driver-side on purpose: n at the dev SFs is 500-2000, so the exact
  * O(n^2) ground truth and the grid sweep take milliseconds — this is
  * a planning tool, not a scale path.
  *
  * Usage: runMain graft.LshRecallProbe <sfDir> <tablesCsv> <bitsCsv> [tau=0.45] [mode=prefix|seq|multiprobe]
  *
  * mode=seq evaluates the pinned path's sequential-stream planes
  * ([[graft.ext.Similarity.hyperplanes]]) instead — those depend on the
  * full (tables, bits) shape, so each grid point gets its own draw.
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tablesGrid = args(1).split(",").map(_.trim.toInt)
    val bitsGrid = args(2).split(",").map(_.trim.toInt)
    val tau = args.drop(3).headOption.map(_.toDouble).getOrElse(0.45)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    spark.stop()

    val n = rows.length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / math.sqrt(na * nb) * 1e4) / 1e4
    }
    val truth = for {
      i <- rows.indices; j <- (i + 1) until n
      if cos(rows(i)._2, rows(j)._2) >= tau
    } yield (i, j)
    println(s"""{"probe":"lsh_recall","dir":"$dir","n":$n,"tau":$tau,"truth_pairs":${truth.size}}""")

    val mode = args.drop(4).headOption.getOrElse("prefix")
    def signsFor(planes: Array[Array[Array[Double]]]): Array[Array[Array[Boolean]]] =
      rows.map { case (_, v) =>
        planes.map(_.map { p =>
          var d = 0.0; var i = 0
          while (i < 64) { d += v(i) * p(i); i += 1 }
          d >= 0
        })
      }
    // prefix planes are stable in both dimensions, so one max-shape draw
    // covers the whole grid; sequential planes are a per-shape stream.
    val prefixSigns =
      if (mode != "seq") signsFor(graft.ext.Similarity.hyperplanesPrefix(tablesGrid.max, bitsGrid.max, dim = 64))
      else null
    for (bits <- bitsGrid; tables <- tablesGrid) {
      val signs =
        if (mode != "seq") prefixSigns
        else signsFor(graft.ext.Similarity.hyperplanes(tables, bits, dim = 64))
      // "multiprobe" mode scores the hamming<=1 collision the 1-flip
      // probing implements (prefix planes, as the multiprobe operator)
      val maxDiff = if (mode == "multiprobe") 1 else 0
      val hit = truth.count { case (i, j) =>
        (0 until tables).exists(t =>
          (0 until bits).count(b => signs(i)(t)(b) != signs(j)(t)(b)) <= maxDiff)
      }
      val pct = if (truth.isEmpty) 0.0 else hit * 100.0 / truth.size
      println(f"""{"probe":"lsh_recall","mode":"$mode","tables":$tables,"bits":$bits,"hit":$hit,"recall_pct":$pct%.1f}""")
    }
  }
}
