package graft

import graft.ext.Classifier
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ClassifierSpec extends SparkSuite {

  private def docsOf(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  // corpus where the teacher rule (more "fast" than "slow") is clean,
  // with noise terms sprinkled so the student has something to ignore
  private val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    (1L to 60L).map { i =>
      val nf = rnd.nextInt(4); val ns = rnd.nextInt(4); val nx = rnd.nextInt(3)
      val words = Seq.fill(nf)("fast") ++ Seq.fill(ns)("slow") ++
        Seq.fill(nx)("pad") ++ Seq("tail")
      i -> rnd.shuffle(words).mkString(" ")
    }
  }

  private val terms = Seq("fast", "slow", "pad")
  private val epochs = 12
  private val lrMilli = 1500L

  /** Driver-side replay of the exact training arithmetic: same IEEE
    * ops in the same association order, same per-row micro
    * discretization, same Long truncating division. */
  private def replayTrain(): Array[Long] = {
    def counts(t: String) = terms.map(w => t.split(" ", -1).count(_ == w).toLong)
    val rows = corpus.map { case (_, t) =>
      val c = counts(t)
      (c, if (c(0) > c(1)) 1.0 else 0.0)
    }
    val n = rows.length.toLong
    val k = terms.length
    val w = Array.fill(k + 1)(0L)
    for (_ <- 1 to epochs) {
      val g = Array.fill(k + 1)(0L)
      rows.foreach { case (c, y) =>
        val zMicro = w(0) + (0 until k).map(j => w(j + 1) * c(j)).sum
        val z = zMicro.toDouble / 1000000.0
        val sig = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        def gd(cj: Long): Long = math.floor((sig - y) * cj.toDouble * 1000000.0 + 0.5).toLong
        g(0) += gd(1L)
        for (j <- 0 until k) g(j + 1) += gd(c(j))
      }
      for (j <- 0 to k) w(j) = w(j) - (lrMilli * g(j)) / (1000L * n)
    }
    w
  }

  test("trainLogistic matches the driver-side replay bit for bit") {
    val df = docsOf(corpus: _*)
    val label = expr("size(filter(split(text, ' '), x -> x = 'fast')) > " +
      "size(filter(split(text, ' '), x -> x = 'slow'))")
    val got = Classifier.trainLogistic(df, "doc_id", "text", terms, label,
      epochs = epochs, lrMilli = lrMilli)
    val want = replayTrain()
    assert(got.map(_._1) == (Classifier.BiasFeature +: terms), got.toString)
    assert(got.map(_._2) == want.toSeq,
      s"\ngot:  ${got.map(_._2)}\nwant: ${want.toSeq}")
  }

  test("the student learns the teacher rule: signs and separation") {
    val df = docsOf(corpus: _*)
    val label = expr("size(filter(split(text, ' '), x -> x = 'fast')) > " +
      "size(filter(split(text, ' '), x -> x = 'slow'))")
    val w = Classifier.trainLogistic(df, "doc_id", "text", terms, label,
      epochs = epochs, lrMilli = lrMilli)
    val wm = w.toMap
    assert(wm("fast") > 0, s"fast weight should be positive: $w")
    assert(wm("slow") < 0, s"slow weight should be negative: $w")
    assert(wm("fast") > math.abs(wm("pad")) && -wm("slow") > math.abs(wm("pad")),
      s"signal terms should dominate the noise term: $w")
    // apply: training-set accuracy must beat the majority class
    val counts = Classifier.featureCounts(df, "doc_id", "text", terms, label)
    val scored = counts.select(col("y"),
      when(Classifier.marginMicroCol(w.map(_._2)) >= 0, 1.0).otherwise(0.0).as("pred"))
    val n = scored.count()
    val correct = scored.filter(col("y") === col("pred")).count()
    val majority = math.max(
      counts.filter(col("y") === 1.0).count(),
      counts.filter(col("y") === 0.0).count())
    assert(correct > majority,
      s"accuracy $correct/$n should beat majority $majority/$n")
  }
}
