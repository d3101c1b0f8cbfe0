package graft

import graft.operators.Relational
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RelationalSpec extends SparkSuite {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private lazy val quotes = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("A", ts("2024-01-01T10:00:00Z"), 100.0),
      Row("A", ts("2024-01-01T10:00:05Z"), 101.0),
      Row("A", ts("2024-01-01T10:00:10Z"), 102.0),
      Row("B", ts("2024-01-01T10:00:03Z"), 200.0)
    )),
    StructType(Seq(
      StructField("sym", StringType),
      StructField("qt", TimestampType),
      StructField("price", DoubleType))))

  private lazy val trades = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "A", ts("2024-01-01T10:00:04Z")), // between quotes → 100.0
      Row(2L, "A", ts("2024-01-01T10:00:05Z")), // exactly at quote → inclusive, 101.0
      Row(3L, "A", ts("2024-01-01T10:00:30Z")), // after all → 102.0
      Row(4L, "B", ts("2024-01-01T10:00:00Z")), // before any B quote → unmatched
      Row(5L, "C", ts("2024-01-01T10:00:00Z"))  // key absent on right → unmatched
    )),
    StructType(Seq(
      StructField("trade_id", LongType),
      StructField("sym", StringType),
      StructField("tt", TimestampType))))

  test("asOfJoin picks latest right row at-or-before left time, per key") {
    val got = Relational.asOfJoin(
      trades, quotes, "sym", "sym", "tt", "qt", Seq("price"))
      .orderBy("trade_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Double]("price")).toSeq == Seq(100.0, 101.0, 102.0))
  }

  test("asOfJoin keepUnmatched keeps left rows with null payload") {
    val got = Relational.asOfJoin(
      trades, quotes, "sym", "sym", "tt", "qt", Seq("price"), keepUnmatched = true)
      .orderBy("trade_id").collect()
    assert(got.length == 5)
    assert(got(3).isNullAt(got(3).fieldIndex("price"))) // trade 4: too early
    assert(got(4).isNullAt(got(4).fieldIndex("price"))) // trade 5: no key
  }

  test("rangeJoin matches points into half-open intervals across bucket boundaries") {
    val intervals = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ts("2024-01-01T00:00:00Z"), ts("2024-01-01T02:00:00Z")),
        Row(2L, ts("2024-01-01T01:30:00Z"), ts("2024-01-01T01:45:00Z")) // nested
      )),
      StructType(Seq(
        StructField("iid", LongType),
        StructField("s", TimestampType),
        StructField("e", TimestampType))))
    val points = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, ts("2024-01-01T00:30:00Z")), // interval 1 only
        Row(11L, ts("2024-01-01T01:40:00Z")), // both intervals
        Row(12L, ts("2024-01-01T02:00:00Z")), // end-exclusive → no match
        Row(13L, ts("2024-01-02T00:00:00Z"))  // outside
      )),
      StructType(Seq(StructField("pid", LongType), StructField("t", TimestampType))))
    // 1-hour buckets: interval 1 spans 3 cells, interval 2 one cell
    val got = Relational.rangeJoin(intervals, "s", "e", points, "t", bucketSeconds = 3600)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("topKPerGroup ranks with deterministic tie-break") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("g1", 1L, 5.0), Row("g1", 2L, 5.0), Row("g1", 3L, 1.0),
        Row("g2", 4L, 9.0))),
      StructType(Seq(
        StructField("g", StringType),
        StructField("id", LongType),
        StructField("v", DoubleType))))
    val got = Relational.topKPerGroup(
      df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 2)
      .orderBy("g", "rank").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq(("g1", 1L, 1), ("g1", 2L, 2), ("g2", 4L, 1)))
  }
}
