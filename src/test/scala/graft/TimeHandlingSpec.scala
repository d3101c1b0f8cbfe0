package graft

import graft.time._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Port of the reference's complete test corpus
  * (`/root/reference/test/test_time_handling.py:1-77`) with the exact
  * expected values, plus ScalaCheck generalizations (SURVEY §5).
  */
class TimeHandlingSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // t1: test_deltatime_unpacking (test_time_handling.py:4-22)
  test("DeltaTime unpacking and defaults") {
    val dt = DeltaTime(1, 2, 3, 4)
    assert(dt.values == ((1, 2, 3, 4)))
    val dt2 = DeltaTime(days = 1, hours = 2, minutes = 3)
    assert(dt2.values == ((1, 2, 3, 0)))
  }

  // t2: test_query_time_construct (test_time_handling.py:25-37)
  test("string + DeltaTime shifts and formats") {
    val queryTime = "2024-05-16T10:00:00Z"
    assert(TimeFormat.format(DeltaTime(0, -2, 0, 0) + queryTime) == "2024-05-16T08:00:00Z")
    assert(TimeFormat.format(DeltaTime(0, 1, 0, 0) + queryTime) == "2024-05-16T11:00:00Z")
  }

  // t3: test_construct_query_time_endpoints (test_time_handling.py:40-50)
  test("construct_query_time_endpoints") {
    val (start, end) = TimeArithmetic.constructQueryTimeEndpoints(
      "2024-05-16T10:00:00Z", DeltaTime.fromSeq(Seq(0, -2, 0, 0)), DeltaTime.fromSeq(Seq(0, 1, 0, 0)))
    assert(start == "2024-05-16T08:00:00Z")
    assert(end == "2024-05-16T11:00:00Z")
  }

  // t4: test_create_query_endpoints_timezone (test_time_handling.py:53-63)
  test("endpoints subtract the tz offset (local -> UTC)") {
    val (start, end) = TimeArithmetic.constructQueryTimeEndpoints(
      "2024-05-16T10:00:00Z", DeltaTime.fromSeq(Seq(0, -2, 0, 0)),
      DeltaTime.fromSeq(Seq(0, 1, 0, 0)), tzOffset = -8)
    assert(start == "2024-05-16T16:00:00Z")
    assert(end == "2024-05-16T19:00:00Z")
  }

  // t5: test_shift_string_time (test_time_handling.py:66-77)
  test("shift_string_time") {
    assert(TimeArithmetic.shiftStringTime("2024-05-16T10:00:00Z", DeltaTime(0, -2, 0, 0)) == "2024-05-16T08:00:00Z")
    assert(TimeArithmetic.shiftStringTime("2024-05-16T10:00:00Z", DeltaTime(0, 1, 0, 0)) == "2024-05-16T11:00:00Z")
    // identity on zero delta; int overload means hours (database_extractor.py:179-180)
    assert(TimeArithmetic.shiftStringTime("2024-05-16T10:00:00Z", DeltaTime()) == "2024-05-16T10:00:00Z")
    assert(TimeArithmetic.shiftStringTime("2024-05-16T10:00:00Z", 3) == "2024-05-16T13:00:00Z")
  }

  test("reference DST rule parity for 2024") {
    import java.time.LocalDateTime
    assert(TimeArithmetic.timezoneOffset2024(LocalDateTime.of(2024, 1, 15, 12, 0)) == -8)
    assert(TimeArithmetic.timezoneOffset2024(LocalDateTime.of(2024, 6, 15, 12, 0)) == -7)
    assert(TimeArithmetic.timezoneOffset2024(LocalDateTime.of(2024, 12, 15, 12, 0)) == -8)
    // zone-rules replacement agrees with the hard-coded table away from transitions
    assert(TimeArithmetic.timezoneOffset(LocalDateTime.of(2024, 1, 15, 12, 0)) == -8)
    assert(TimeArithmetic.timezoneOffset(LocalDateTime.of(2024, 6, 15, 12, 0)) == -7)
  }

  test("generate_datetime_list is inclusive of both endpoints") {
    val xs = TimeArithmetic.generateDatetimeList(
      "2024-02-01T00:00:00Z", "2024-02-04T00:00:00Z", DeltaTime(days = 1))
    assert(xs == Seq(
      "2024-02-01T00:00:00Z", "2024-02-02T00:00:00Z",
      "2024-02-03T00:00:00Z", "2024-02-04T00:00:00Z"))
  }

  test("extract_date") {
    assert(TimeArithmetic.extractDate("2024-05-16T10:00:00Z") == "2024-05-16")
  }

  test("datesInRange is end-exclusive") {
    import java.time.LocalDate
    val ds = TimeArithmetic.datesInRange(LocalDate.of(2024, 2, 27), LocalDate.of(2024, 3, 2))
    assert(ds.map(_.toString) == Seq("2024-02-27", "2024-02-28", "2024-02-29", "2024-03-01"))
  }

  private val smallInt = Gen.choose(-48, 48)
  private val deltaGen = for {
    d <- Gen.choose(-3, 3); h <- smallInt; m <- smallInt; s <- smallInt
  } yield DeltaTime(d, h, m, s)

  // ScalaCheck generalizations of t3/t4 (SURVEY §5 rebuild strategy d)
  test("property: start <= stop iff deltaStart <= deltaEnd") {
    check(Prop.forAll(deltaGen, deltaGen) { (a: DeltaTime, b: DeltaTime) =>
      val (s, e) = TimeArithmetic.constructQueryTimeEndpoints("2024-05-16T10:00:00Z", a, b)
      (s <= e) == (a.toDuration.compareTo(b.toDuration) <= 0)
    })
  }

  test("property: tz offset shifts both endpoints equally") {
    check(Prop.forAll(deltaGen, deltaGen, Gen.choose(-14, 14)) { (a: DeltaTime, b: DeltaTime, tz: Int) =>
      val (s0, e0) = TimeArithmetic.constructQueryTimeEndpoints("2024-05-16T10:00:00Z", a, b)
      val (s1, e1) = TimeArithmetic.constructQueryTimeEndpoints("2024-05-16T10:00:00Z", a, b, tz)
      val shift = java.time.Duration.ofHours(-tz.toLong)
      TimeFormat.parse(s1) == TimeFormat.parse(s0).plus(shift) &&
      TimeFormat.parse(e1) == TimeFormat.parse(e0).plus(shift)
    })
  }
}
