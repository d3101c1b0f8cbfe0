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
