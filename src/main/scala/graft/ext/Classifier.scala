package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression TRAINING for the quality/language
  * classifier tier — the step that turns [[TextAnalysis.linearClassifierScore]]
  * from "apply someone else's weights" into a self-contained train→apply
  * pipeline (CCNet/FineWeb train a fastText-style linear model exactly
  * this way: bag-of-terms features, binary label, a few full-batch
  * epochs).
  *
  * Execution shape (the [[Similarity.kmeansCentroids]] discipline): the
  * corpus never leaves the executors — each epoch is ONE aggregate
  * producing k+1 integer gradient sums, and the driver state is the
  * (k+1)-element weight vector, O(features), never O(rows). Feature
  * counts are computed once and reused across epochs; at 100 TB this is
  * E scans (or one scan + cache of a (k+2)-column projection), shuffling
  * a single row per epoch.
  *
  * Determinism (the oracle contract): every float step is restricted to
  * IEEE correctly-rounded ops that are engine-identical (`+ - * / abs
  * floor` — no exp/log, which are libm-dependent). The logistic sigmoid
  * is the rational approximation σ(z) ≈ 0.5 + z / (2·(1+|z|)) — same
  * monotone S-shape, exact in both engines. Per-ROW gradient
  * contributions are discretized to integer micro-units BEFORE the sum,
  * so the epoch aggregate is an integer sum — order-independent, hence
  * identical under any partitioning and in DuckDB. Weight updates use
  * Long division (truncation toward zero), which DuckDB's `//` matches
  * bit-for-bit. The whole training run is therefore replayable as
  * unrolled SQL: same counts, same sums, same updates, same final
  * weights.
  */
object Classifier {

  /** Bias pseudo-feature name — sorts first among [a-z] terms. */
  val BiasFeature = "__bias"

  /** Per-doc feature/label frame: one integer count column `c_i` per
    * term (whitespace-word equality, the [[TextAnalysis]] word model)
    * plus the 0/1 double label `y`. */
  def featureCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      labelExpr: Column
  ): DataFrame = {
    val cs = terms.zipWithIndex.map { case (t, i) =>
      size(expr(s"filter(split($textCol, ' '), x -> x = '$t')")).cast("long").as(s"c$i")
    }
    df.select(Seq(col(idCol), when(labelExpr, lit(1.0)).otherwise(lit(0.0)).as("y")) ++ cs: _*)
  }

  /** Per-row integer-micro gradient contribution for feature count
    * `cj` given the margin column `z` (double): floor((σ(z)−y)·cj·1e6
    * + 0.5). Bias uses cj ≡ 1. */
  private def gradCol(z: Column, y: Column, cj: Column): Column = {
    val sig = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    floor((sig - y) * cj.cast("double") * lit(1000000.0) + lit(0.5)).cast("long")
  }

  /** Full-batch logistic GD: `epochs` rounds, each one distributed
    * aggregate of k+1 integer gradient sums; update `w ← w − (lrMilli ·
    * G) / (1000 · n)` in Long arithmetic on the driver. Weights start
    * at zero (the deterministic seed). Returns
    * `(BiasFeature +: terms) zip weightsMicro`. */
  def trainLogistic(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      labelExpr: Column,
      epochs: Int = 3,
      lrMilli: Long = 500L
  ): Seq[(String, Long)] = {
    val counts = featureCounts(df, idCol, textCol, terms, labelExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = counts.count()
      require(n > 0, "empty training corpus")
      val k = terms.length
      var w = Array.fill(k + 1)(0L) // w(0) = bias
      for (_ <- 1 to epochs) {
        val zMicro = (lit(w(0)) +: (0 until k).map(j => lit(w(j + 1)) * col(s"c$j")))
          .reduce(_ + _)
        val z = zMicro.cast("double") / lit(1000000.0)
        val sums = (gradCol(z, col("y"), lit(1L)).as("g0") +:
          (0 until k).map(j => gradCol(z, col("y"), col(s"c$j")).as(s"g${j + 1}")))
        val row = counts.select(sums: _*)
          .groupBy().agg(sum("g0").as("G0"), (1 to k).map(j => sum(s"g$j").as(s"G$j")): _*)
          .collect().head
        for (j <- 0 to k)
          w(j) = w(j) - (lrMilli * row.getLong(j)) / (1000L * n)
      }
      (BiasFeature +: terms).zip(w.toSeq)
    } finally { counts.unpersist() }
  }

  /** Margin column (micro units, Long) for trained `weightsMicro` over
    * the count columns of [[featureCounts]] output. */
  def marginMicroCol(weightsMicro: Seq[Long]): Column =
    (lit(weightsMicro.head) +: weightsMicro.tail.zipWithIndex.map {
      case (wj, j) => lit(wj) * col(s"c$j")
    }).reduce(_ + _)
}
