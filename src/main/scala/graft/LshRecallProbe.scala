package graft

import org.apache.spark.sql.SparkSession

/** Recall-planning probe for the embedding-LSH dedup operators: computes
  * the exact cosine ground truth (pairs with cos >= tau) driver-side,
  * then for a grid of (tables, bits) reports how many ground-truth
  * pairs collide under a given probing scheme, and (for the probing
  * modes) the TOTAL candidate-pair volume the scheme would feed the
  * cosine refine — recall is worthless without its cost, so the probe
  * reports both sides of the frontier.
  *
  * Modes:
  *   - prefix      exact bucket collision, prefix-stable planes (the
  *                 adaptive operator's draw)
  *   - seq         exact collision, sequential-stream planes (the
  *                 pinned operator's draw; per-shape plane sets)
  *   - multiprobe  hamming <= 1 (the r14 one-flip probing)
  *   - ham2        hamming <= 2, all C(bits,2) flips — the recall
  *                 ceiling of depth-2 probing, cost-blind
  *   - qd:M:D      query-directed probing (Lv et al., VLDB'07): flips
  *                 restricted to the M lowest-|margin| bits of EITHER
  *                 endpoint, up to D flips (D in {1,2,3}) — near pairs
  *                 differ exactly where a margin is small, so a small M
  *                 buys most of ham<=D's recall at ~(1+M+C(M,2))/
  *                 (1+b+C(b,2)) of its probe volume
  *
  * This is the measurement behind both shape couplings in
  * [[graft.ext.Dedup]]: adaptiveLshTables (tables-vs-bits) and the
  * multiprobe budget (probes-vs-bits). Driver-side on purpose for the
  * dev SFs; ground truth is parallelized so the 20 k-vector data-sf1
  * point stays interactive.
  *
  * Usage: runMain graft.LshRecallProbe <sfDir> <tablesCsv> <bitsCsv> [tau=0.45] [modesCsv=prefix|seq|multiprobe|ham2|qd:M:D,...] [flags: nocand, sample:K]
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
    // SAMPLED ground truth past the all-pairs wall: full truth is
    // n^2/2 cosines (5e11 at 1 M vectors — hours); "sample:K" in the
    // flags arg instead takes K evenly-strided query rows and computes
    // their true pair sets against the WHOLE corpus (K x n cosines —
    // minutes at 1 M). Recall over a uniform row sample is an unbiased
    // estimate of pair recall weighted by per-row pair membership —
    // the production quantity (a row's chance its duplicates are
    // found). Deterministic stride, so re-runs are comparable.
    val flags = args.drop(5).headOption.getOrElse("")
    val sampleK = "sample:(\\d+)".r.findFirstMatchIn(flags).map(_.group(1).toInt).getOrElse(0)
    val queryIdx: Array[Int] =
      if (sampleK <= 0 || sampleK >= n) Array.range(0, n)
      else Array.tabulate(sampleK)(k => (k.toLong * n / sampleK).toInt)
    // ground truth parallelized over the outer index — 2e8 cosine pairs
    // at the 20 k point would otherwise take minutes single-threaded
    val truth: IndexedSeq[(Int, Int)] = {
      import scala.jdk.CollectionConverters._
      val qSet = if (sampleK > 0) queryIdx.toSet else null
      java.util.stream.IntStream.range(0, if (sampleK > 0) queryIdx.length else n)
        .parallel().boxed()
        .flatMap { ii =>
          val i = if (sampleK > 0) queryIdx(ii.intValue) else ii.intValue
          val hits = new java.util.ArrayList[(Int, Int)]()
          // full mode walks j > i (each pair once); sampled mode walks
          // ALL j != i (the sampled row's complete pair set), skipping
          // j-also-sampled duplicates via the canonical orientation
          var j = if (sampleK > 0) 0 else i + 1
          while (j < n) {
            if (j != i && cos(rows(i)._2, rows(j)._2) >= tau
              && (sampleK == 0 || j > i || !qSet.contains(j)))
              hits.add((math.min(i, j), math.max(i, j)))
            j += 1
          }
          hits.stream()
        }
        .collect(java.util.stream.Collectors.toList[(Int, Int)]).asScala.toIndexedSeq
    }
    println(s"""{"probe":"lsh_recall","dir":"$dir","n":$n,"tau":$tau,"truth_pairs":${truth.size},"sampled_queries":${if (sampleK > 0) queryIdx.length else -1}}""")

    // comma-list of modes: the ground truth above is the expensive part
    // at the 200 k point (~2e10 cosines), so one invocation sweeps every
    // probing scheme against the same truth. `seq` draws per-shape plane
    // streams and must run alone.
    val modes = args.drop(4).headOption.getOrElse("prefix").split(",").map(_.trim).toSeq
    require(modes.size == 1 || !modes.contains("seq"), "seq must be the sole mode")
    // per-row, per-table, per-bit signed margins (dot with each plane);
    // sign gives the bucket bit, |margin| ranks probe priority
    def dotsFor(planes: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] = {
      // parallel over rows: 1 M rows x 32 tables x 18 bits is ~37e9
      // multiply-adds — minutes single-threaded, seconds across cores
      val out = new Array[Array[Array[Double]]](n)
      java.util.stream.IntStream.range(0, n).parallel().forEach { r =>
        val v = rows(r)._2
        out(r) = planes.map(_.map { p =>
          var d = 0.0; var i = 0
          while (i < 64) { d += v(i) * p(i); i += 1 }
          d
        })
      }
      out
    }
    // prefix planes are stable in both dimensions, so one max-shape draw
    // covers the whole grid; sequential planes are a per-shape stream.
    val prefixDots =
      if (!modes.contains("seq")) dotsFor(graft.ext.Similarity.hyperplanesPrefix(tablesGrid.max, bitsGrid.max, dim = 64))
      else null

    val qd = "qd:(\\d+):(\\d+)".r

    for (bits <- bitsGrid; tables <- tablesGrid; mode <- modes) {
      val (qdBudget, depth) = mode match {
        case qd(m, d) => (m.toInt, d.toInt)
        case "multiprobe" => (Int.MaxValue, 1)
        case "ham2" => (Int.MaxValue, 2)
        case _ => (0, 0)
      }
      val dots =
        if (mode != "seq") prefixDots
        else dotsFor(graft.ext.Similarity.hyperplanes(tables, bits, dim = 64))
      // packed sign keys + (for qd) low-margin masks per (row, table),
      // parallel over rows (32M 18-element margin sorts at the 1M point)
      val m = math.min(qdBudget, bits)
      val keys = new Array[Array[Long]](n)
      val masks: Array[Array[Long]] =
        if (qdBudget == 0 || qdBudget == Int.MaxValue) null else new Array[Array[Long]](n)
      java.util.stream.IntStream.range(0, n).parallel().forEach { r =>
        val krow = new Array[Long](tables)
        val mrow = if (masks != null) new Array[Long](tables) else null
        var t = 0
        while (t < tables) {
          var k = 0L; var b = 0
          while (b < bits) { if (dots(r)(t)(b) >= 0) k |= (1L << b); b += 1 }
          krow(t) = k
          if (mrow != null) {
            val order = (0 until bits).sortBy(b => (math.abs(dots(r)(t)(b)), b))
            mrow(t) = order.take(m).foldLeft(0L)((acc, b) => acc | (1L << b))
          }
          t += 1
        }
        keys(r) = krow
        if (masks != null) masks(r) = mrow
      }
      def pairHit(i: Int, j: Int): Boolean =
        (0 until tables).exists { t =>
          val diff = keys(i)(t) ^ keys(j)(t)
          val pc = java.lang.Long.bitCount(diff)
          pc <= depth && (masks == null ||
            (diff & ~masks(i)(t)) == 0L || (diff & ~masks(j)(t)) == 0L)
        }
      val hit = truth.count { case (i, j) => pairHit(i, j) }
      val pct = if (truth.isEmpty) 0.0 else hit * 100.0 / truth.size
      // candidate volume: simulate the equi-join (exact keys x probe
      // keys) the operator runs — distinct canonical pairs pre-refine.
      // Skippable (arg 6 = "nocand"): at the 200 k point the pair-set
      // materialization dominates the probe; measure cost there by
      // running the REAL operator in Spark instead.
      val candPairs: Long =
        if (depth == 0 || flags.contains("nocand") || sampleK > 0) -1L
        else {
          val pairs = new java.util.HashSet[Long]()
          for (t <- 0 until tables) {
            val exactMap = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
            for (r <- 0 until n)
              exactMap.computeIfAbsent(keys(r)(t), _ => new java.util.ArrayList[Integer]()).add(r)
            for (r <- 0 until n) {
              val probeBits: IndexedSeq[Int] =
                if (masks == null) 0 until bits
                else (0 until bits).filter(b => (masks(r)(t) & (1L << b)) != 0L)
              val probeKeys = Seq(keys(r)(t)) ++
                probeBits.map(b => keys(r)(t) ^ (1L << b)) ++
                (if (depth >= 2)
                  for (ii <- probeBits.indices; jj <- (ii + 1) until probeBits.length)
                    yield keys(r)(t) ^ (1L << probeBits(ii)) ^ (1L << probeBits(jj))
                else Seq.empty) ++
                (if (depth >= 3)
                  for {
                    ii <- probeBits.indices
                    jj <- (ii + 1) until probeBits.length
                    kk <- (jj + 1) until probeBits.length
                  } yield keys(r)(t) ^ (1L << probeBits(ii)) ^
                    (1L << probeBits(jj)) ^ (1L << probeBits(kk))
                else Seq.empty)
              for (pk <- probeKeys) {
                val hitsList = exactMap.get(pk)
                if (hitsList != null) {
                  val it = hitsList.iterator()
                  while (it.hasNext) {
                    val o = it.next().intValue
                    if (o != r) {
                      val lo = math.min(o, r).toLong; val hi = math.max(o, r).toLong
                      pairs.add(lo * n + hi)
                    }
                  }
                }
              }
            }
          }
          pairs.size().toLong
        }
      println(f"""{"probe":"lsh_recall","mode":"$mode","tables":$tables,"bits":$bits,"hit":$hit,"recall_pct":$pct%.1f,"cand_pairs":$candPairs}""")
    }
  }
}
