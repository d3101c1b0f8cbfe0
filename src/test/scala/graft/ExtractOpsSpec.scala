package graft

import graft.config.ExtractQueryConfig
import graft.extract.{Extractor, LongTable}
import graft.operators.ExtractOps._
import graft.time.DeltaTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-operator specs on the reference-shaped long-format fixture
  * (FIXTURES.md §A): irregular sub-second spacing, multiple points per
  * 1 s bin (last-wins), an id absent in some bins (partial-null rows must
  * survive `how="all"` dropna), and a `liner_heater` measurement for the
  * equality-filter case.
  */
class ExtractOpsSpec extends SparkSuite {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private val schema = StructType(Seq(
    StructField("_time", TimestampType),
    StructField("_value", DoubleType),
    StructField("_field", StringType),
    StructField("_measurement", StringType),
    StructField("id", StringType),
    StructField("category", StringType)
  ))

  private lazy val fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      // bin :00 — temp_01 has two points (last wins: 2.0), pressure_02 one
      Row(ts("2024-05-16T10:00:00.100Z"), 1.0, "f", "liner_heater", "temp_01", "c1"),
      Row(ts("2024-05-16T10:00:00.900Z"), 2.0, "f", "liner_heater", "temp_01", "c1"),
      Row(ts("2024-05-16T10:00:00.500Z"), 7.0, "f", "other", "pressure_02", "c2"),
      // bin :01 — only pressure_02 (partial-null wide row must survive)
      Row(ts("2024-05-16T10:00:01.300Z"), 8.0, "f", "other", "pressure_02", "c2"),
      // bin :03 — only temp_01, null value (all-null wide row must drop)
      Row(ts("2024-05-16T10:00:03.100Z"), null, "f", "liner_heater", "temp_01", "c1"),
      // outside range
      Row(ts("2024-05-16T11:30:00.000Z"), 9.0, "f", "other", "temp_01", "c1")
    )), schema)

  test("timeRange is half-open [start, stop)") {
    val got = fixture.transform(timeRange("_time", "2024-05-16T10:00:00Z", "2024-05-16T11:30:00Z"))
    assert(got.count() == 5) // the 11:30:00.000 point is excluded
  }

  test("rowFilter equality and regex forms") {
    assert(fixture.transform(rowFilter("r[\"_measurement\"] == \"liner_heater\"")).count() == 3)
    assert(fixture.transform(rowFilter("r[\"id\"] =~ /.*/")).count() == 6)
    assert(fixture.transform(rowFilter("r[\"id\"] =~ /^temp/")).count() == 4)
  }

  test("dropCols silently skips missing columns") {
    val got = fixture.transform(dropCols(Seq("category", "no_such_column")))
    assert(got.columns.toSeq == Seq("_time", "_value", "_field", "_measurement", "id"))
  }

  test("pivotWide: one row per key, one column per id, first non-null value") {
    val got = fixture
      .transform(timeRange("_time", "2024-05-16T10:00:00Z", "2024-05-16T10:00:01Z"))
      .transform(pivotWide("_time", "id", "_value"))
    assert(got.columns.sorted.toSeq == Seq("_time", "pressure_02", "temp_01"))
    assert(got.count() == 3) // raw timestamps, no resample yet
  }

  test("pivotWideMap is the non-widening pivot") {
    val got = fixture.transform(pivotWideMap("_time", "id", "_value"))
    assert(got.columns.toSeq == Seq("_time", "values"))
    val m = got.orderBy("_time").collect()(0).getMap[String, Double](1)
    assert(m("temp_01") == 1.0)
  }

  test("resampleLast: 1s grid, last non-null per column, empty bins absent") {
    val wide = fixture
      .transform(timeRange("_time", "2024-05-16T10:00:00Z", "2024-05-16T11:00:00Z"))
      .transform(pivotWide("_time", "id", "_value"))
      .transform(resampleLast("_time", "1 second", Seq("temp_01", "pressure_02")))
      .orderBy("_time")
    val rows = wide.collect()
    // bins :00, :01, :03 — :02 never materializes (createEmpty: false)
    assert(rows.length == 3)
    assert(rows(0).getAs[Double]("temp_01") == 2.0)       // last-wins in bin
    assert(rows(0).getAs[Double]("pressure_02") == 7.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("temp_01"))) // partial-null row kept
    assert(rows(1).getAs[Double]("pressure_02") == 8.0)
  }

  test("dropAllNull drops only rows where every value column is null") {
    val wide = fixture
      .transform(timeRange("_time", "2024-05-16T10:00:00Z", "2024-05-16T11:00:00Z"))
      .transform(pivotWide("_time", "id", "_value"))
      .transform(resampleLast("_time", "1 second", Seq("temp_01", "pressure_02")))
      .transform(dropAllNull(Seq("temp_01", "pressure_02")))
    // bin :03 (temp null, pressure absent → all-null) dropped; partial kept
    assert(wide.count() == 2)
  }

  test("thresholdGuard") {
    assert(thresholdGuard(fixture, 10).isEmpty)
    assert(thresholdGuard(fixture, 3).isDefined)
  }

  test("queryDatabase composes the reference §3.1 pipeline end-to-end") {
    val cfg = ExtractQueryConfig(
      deltaTimeStart = DeltaTime(),
      deltaTimeEnd = DeltaTime(hours = 1),
      filter = "r[\"_measurement\"] == \"liner_heater\"",
      columnKey = "id",
      sortBy = Seq("_time"))
    val got = Extractor.queryDatabase(fixture, cfg, "2024-05-16T10:00:00Z")
    val rows = got.collect()
    // only temp_01 passes the filter; its non-null bins: :00 (last=2.0)
    assert(got.columns.toSeq == Seq("temp_01", "_time") || got.columns.toSeq == Seq("_time", "temp_01"))
    assert(rows.map(_.getAs[Double]("temp_01")).toSeq == Seq(2.0))
  }

  test("queryDatabase honors aggregate_function; unknown names throw (§2.2)") {
    val cfg = ExtractQueryConfig(
      deltaTimeEnd = DeltaTime(hours = 1),
      filter = "r[\"_measurement\"] == \"liner_heater\"",
      columnKey = "id",
      aggregateFunction = "mean",
      sortBy = Seq("_time"))
    val got = Extractor.queryDatabase(fixture, cfg, "2024-05-16T10:00:00Z").collect()
    // bin :00 has temp_01 points 1.0 and 2.0 → mean 1.5 (vs last = 2.0)
    assert(got.map(_.getAs[Double]("temp_01")).toSeq == Seq(1.5))
    intercept[IllegalArgumentException] {
      Extractor.queryDatabase(fixture, cfg.copy(aggregateFunction = "bogus"), "2024-05-16T10:00:00Z")
    }
  }

  test("queryDataForDay derives tz from the date (F5: July → -7, not cfg's 0)") {
    import graft.extract.TzMode
    val rows = (0 until 12).map { i =>
      Row(ts(f"2024-07-01T10:${i}%02d:00.000Z"), i.toDouble, "f", "m", "temp_01", "c1")
    } ++ Seq(
      // inside [Jul1 07:00Z, Jul2 07:00Z) — the -7 window — but OUTSIDE
      // the -8 window [08:00Z, ...) and far from the tz=0 window start
      Row(ts("2024-07-01T07:30:00.000Z"), 99.0, "f", "m", "temp_01", "c1"),
      // inside the -8 window, outside the -7 window (>= Jul2 07:00Z stop)
      Row(ts("2024-07-02T07:30:00.000Z"), 50.0, "f", "m", "temp_01", "c1"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val cfg = ExtractQueryConfig(
      filter = "r[\"id\"] =~ /.*/", columnKey = "id", sortBy = Seq("_time"))

    val got = Extractor.queryDataForDay(
      df, java.time.LocalDate.of(2024, 7, 1), cfg, tzMode = TzMode.Reference2024).get
    val vals = got.collect().map(_.getAs[Double]("temp_01")).toSet
    assert(vals.contains(99.0) && !vals.contains(50.0), s"expected the -7 window, got values $vals")
    // timestamps read as local wall-clock: the 07:30Z marker shifts to 00:30
    val minTs = got.agg(min(col("_time"))).collect()(0).getTimestamp(0)
    assert(minTs == ts("2024-07-01T00:30:00Z"))

    // the general zone-rules path agrees with the faithful 2024 rule here
    val zone = Extractor.queryDataForDay(
      df, java.time.LocalDate.of(2024, 7, 1), cfg, tzMode = TzMode.Zone()).get
    assert(zone.collect().map(_.getAs[Double]("temp_01")).toSet == vals)
  }

  test("timeShift moves timestamps by whole hours") {
    val got = fixture.transform(timeShift("_time", -8)).orderBy("_time").collect()
    assert(got(0).getTimestamp(0) == ts("2024-05-16T02:00:00.100Z"))
  }

  test("backfillRange covers [start, end) in one plan") {
    val cfg = ExtractQueryConfig(
      filter = "r[\"id\"] =~ /.*/", columnKey = "id", sortBy = Seq("_time"))
    val got = Extractor.backfillRange(
      fixture, java.time.LocalDate.of(2024, 5, 16), java.time.LocalDate.of(2024, 5, 17), cfg)
    assert(got.count() == 3) // bins :00, :01, 11:30; :03 all-null dropped
  }

  test("resampleFfill carries the previous value across empty bins") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(ts("2024-05-16T00:00:10Z"), "a", 1.0),
        Row(ts("2024-05-16T02:00:05Z"), "a", 3.0), // gap at hour 1
        Row(ts("2024-05-16T00:30:00Z"), "b", 5.0)
      )),
      StructType(Seq(
        StructField("t", TimestampType),
        StructField("series", StringType),
        StructField("v", DoubleType))))
    val got = resampleFfill("t", "1 hour", "series", "v")(df)
      .orderBy("series", "t")
      .collect().map(r => (r.getString(1), r.getTimestamp(0).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-05-16 00:00:00.0", 1.0, false),
      ("a", "2024-05-16 01:00:00.0", 1.0, true), // filled, flagged
      ("a", "2024-05-16 02:00:00.0", 3.0, false),
      ("b", "2024-05-16 00:00:00.0", 5.0, false)))
  }

  test("resampleInterp lerps interior gaps between observed bins") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(ts("2024-05-16T00:00:10Z"), "a", 1.0),
        Row(ts("2024-05-16T03:00:05Z"), "a", 4.0) // 2-bin interior gap
      )),
      StructType(Seq(
        StructField("t", TimestampType),
        StructField("series", StringType),
        StructField("v", DoubleType))))
    val got = resampleInterp("t", "1 hour", "series", "v")(df)
      .orderBy("t")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("2024-05-16 00:00:00.0", 1.0, false),
      ("2024-05-16 01:00:00.0", 2.0, true),
      ("2024-05-16 02:00:00.0", 3.0, true),
      ("2024-05-16 03:00:00.0", 4.0, false)))
  }
}
