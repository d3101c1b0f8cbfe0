package graft.tools

import graft.ext.Classifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the SCALE.md classifier_train entry: times
  * [[Classifier.trainLogistic]] at several epoch counts on sf0.1 so the
  * per-epoch marginal cost separates from the fixed cost (feature-count
  * materialization + session overhead). Run on an otherwise-idle box:
  *
  *   sbt "Test/runMain graft.tools.EpochCost"
  */
object EpochCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("fast", "slow", "join", "hash", "the", "a")
    val label = expr(
      "size(filter(split(text, ' '), x -> x = 'fast')) > size(filter(split(text, ' '), x -> x = 'slow'))")
    // untimed warm-up so codegen/readers don't land in the first sample
    Classifier.trainLogistic(docs, "doc_id", "text", terms, label, epochs = 1)
    val samples = Seq(1, 2, 6, 12).map { e =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Classifier.trainLogistic(docs, "doc_id", "text", terms, label, epochs = e)
        (System.nanoTime() - t0) / 1e9
      }
      e -> ts.min
    }
    val pairs = samples.map { case (e, t) => s""""$e":${"%.3f".format(t)}""" }.mkString(",")
    val (e1, t1) = samples.head
    val (eN, tN) = samples.last
    val perEpoch = (tN - t1) / (eN - e1)
    println(s"""{"metric":"classifier_epoch_cost","sf":"${new java.io.File(sfDir).getName}","min_sec_by_epochs":{$pairs},"per_epoch_sec":${"%.3f".format(perEpoch)},"fixed_sec":${"%.3f".format(t1 - perEpoch)}}""")
    spark.stop()
  }
}
