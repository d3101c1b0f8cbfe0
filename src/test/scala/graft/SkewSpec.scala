package graft

import graft.operators.Skew
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SkewSpec extends SparkSuite {

  // 900 rows on one hot key + 100 spread rows
  private lazy val skewed = spark.createDataFrame(
    spark.sparkContext.parallelize(
      (1 to 900).map(i => Row("hot", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => Row(s"k${i % 10}", i.toLong, i.toDouble))),
    StructType(Seq(
      StructField("k", StringType),
      StructField("row_id", LongType),
      StructField("v", DoubleType))))

  private lazy val dim = spark.createDataFrame(
    spark.sparkContext.parallelize(
      Seq(Row("hot", 1.5) +: (0 until 10).map(i => Row(s"k$i", i.toDouble)): _*)),
    StructType(Seq(StructField("k", StringType), StructField("w", DoubleType))))

  test("saltedJoin equals plain join") {
    val plain = skewed.join(dim, "k").select("k", "row_id", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", col("row_id"), salts = 8)
      .select("k", "row_id", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("AQE skew-join splits the hot partition at runtime (the no-salt path)") {
    // Manual salting (above) is the portable fix; AQE's OptimizeSkewedJoin
    // is the runtime fix — this pins that it actually engages, so SCALE.md
    // can honestly say "salting OR AQE" for skewed keys.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force sort-merge
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fatter rows + higher hot count so one partition clears 8KB
      val big = skewed.withColumn("pad", lpad(col("k"), 200, "x"))
      val joined = big.join(dim, "k")
      // materialize THIS DataFrame's execution (count() would spawn its
      // own QueryExecution and leave this plan un-finalized)
      val n = joined.collect().length
      assert(n == 900 + 100, s"join row parity under AQE: $n")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed SMJ partition:\n${finalPlan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedAgg equals plain agg for decomposable functions") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(
      skewed, "k", col("row_id"),
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")),
      salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
