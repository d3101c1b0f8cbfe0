package graft.time

import java.time.format.DateTimeFormatter
import java.time.{Duration, LocalDate, LocalDateTime, ZoneId, ZoneOffset}

/** Duration value type mirroring the reference's `DeltaTime`
  * (`/root/reference/src/database_extractor/database_extractor.py:29-88`):
  * a (days, hours, minutes, seconds) tuple with arithmetic against
  * timestamps and RFC3339 strings. Backed by exact `java.time.Duration`
  * semantics — the reference converts to `timedelta`
  * (`database_extractor.py:44-47`), which is likewise exact (no calendar
  * awareness), so `Duration` is the faithful mapping, not
  * `CalendarInterval`.
  */
final case class DeltaTime(
    days: Int = 0,
    hours: Int = 0,
    minutes: Int = 0,
    seconds: Int = 0
) {
  def toDuration: Duration =
    Duration
      .ofDays(days.toLong)
      .plusHours(hours.toLong)
      .plusMinutes(minutes.toLong)
      .plusSeconds(seconds.toLong)

  /** `DeltaTime + DeltaTime` (`database_extractor.py:66-67`). */
  def +(other: DeltaTime): Duration = toDuration.plus(other.toDuration)

  /** `datetime + DeltaTime` (`database_extractor.py:64-65`). */
  def +(ts: LocalDateTime): LocalDateTime = ts.plus(toDuration)

  /** `str + DeltaTime` — parse with the class time format, shift, return a
    * timestamp (`database_extractor.py:62-63`, exercised by
    * `test/test_time_handling.py:25-37`).
    */
  def +(ts: String): LocalDateTime = TimeFormat.parse(ts).plus(toDuration)

  def -(other: DeltaTime): Duration = toDuration.minus(other.toDuration)

  /** Mapping-protocol `.values()` destructuring analog
    * (`test/test_time_handling.py:4-22`).
    */
  def values: (Int, Int, Int, Int) = (days, hours, minutes, seconds)
}

object DeltaTime {
  /** Reference accepts `DeltaTime | tuple | list` in endpoint construction
    * (`database_extractor.py:226-229`).
    */
  def fromSeq(xs: Seq[Int]): DeltaTime = xs match {
    case Seq()           => DeltaTime()
    case Seq(d)          => DeltaTime(d)
    case Seq(d, h)       => DeltaTime(d, h)
    case Seq(d, h, m)    => DeltaTime(d, h, m)
    case Seq(d, h, m, s, _*) => DeltaTime(d, h, m, s)
  }
}

/** The reference's single time format `%Y-%m-%dT%H:%M:%SZ`
  * (`database_extractor.py:26`): RFC3339 at second precision, UTC implied.
  */
object TimeFormat {
  val Pattern = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  private val fmt = DateTimeFormatter.ofPattern(Pattern)

  def parse(s: String): LocalDateTime = LocalDateTime.parse(s, fmt)
  def format(t: LocalDateTime): String = t.format(fmt)
  def toInstantUtc(s: String): java.time.Instant =
    parse(s).toInstant(ZoneOffset.UTC)
}

/** Flux duration literals (`"1s"`, `"5m"`, `"1h"`, `"1d"` — the
  * reference's `aggregate_window` config format,
  * `database_extractor.py:146,263`) → Spark interval strings.
  */
object FluxDuration {
  private val Form = """(\d+)(ms|s|m|h|d|w)""".r
  def toSparkInterval(flux: String): String = flux.trim match {
    case Form(n, unit) =>
      val u = unit match {
        case "ms" => "millisecond"
        case "s"  => "second"
        case "m"  => "minute"
        case "h"  => "hour"
        case "d"  => "day"
        case "w"  => "week"
      }
      s"$n $u"
    case other =>
      throw new IllegalArgumentException(s"Unsupported Flux duration: $other")
  }
}

object TimeArithmetic {

  /** Port of `shift_string_time` (`database_extractor.py:172-184`):
    * parse, add delta, format back; identity when delta is zero. The
    * reference's bare-`int` overload means hours
    * (`database_extractor.py:179-180`).
    */
  def shiftStringTime(timeString: String, delta: DeltaTime): String =
    if (delta.toDuration.isZero) timeString
    else TimeFormat.format(TimeFormat.parse(timeString).plus(delta.toDuration))

  def shiftStringTime(timeString: String, hours: Int): String =
    shiftStringTime(timeString, DeltaTime(hours = hours))

  /** Port of `construct_query_time_endpoints`
    * (`database_extractor.py:208-237`): `(t + Δstart − tz, t + Δend − tz)`
    * as UTC strings. The tz offset is *subtracted* — local query time to
    * UTC storage time (pinned by `test/test_time_handling.py:53-63`).
    */
  def constructQueryTimeEndpoints(
      queryTime: String,
      deltaStart: DeltaTime,
      deltaEnd: DeltaTime,
      tzOffset: Int = 0
  ): (String, String) = {
    val base = TimeFormat.parse(queryTime)
    val tz = Duration.ofHours(tzOffset.toLong)
    val start = base.plus(deltaStart.toDuration).minus(tz)
    val end = base.plus(deltaEnd.toDuration).minus(tz)
    (TimeFormat.format(start), TimeFormat.format(end))
  }

  /** Replacement for the reference's 2024-only hard-coded DST rule
    * (`database_extractor.py:358-366`, America/Vancouver): use zone rules,
    * correct for every year, same numeric hours contract.
    */
  def timezoneOffset(t: LocalDateTime, zone: String = "America/Vancouver"): Int = {
    val rules = ZoneId.of(zone).getRules
    rules.getOffset(t).getTotalSeconds / 3600
  }

  /** Faithful port of the reference's rule for parity testing: `-7` inside
    * (2024-03-10 02:00, 2024-11-03 01:00) exclusive, else `-8`
    * (`database_extractor.py:358-366`).
    */
  def timezoneOffset2024(t: LocalDateTime): Int = {
    val dstStart = LocalDateTime.of(2024, 3, 10, 2, 0)
    val dstEnd = LocalDateTime.of(2024, 11, 3, 1, 0)
    if (t.isAfter(dstStart) && t.isBefore(dstEnd)) -7 else -8
  }

  /** Port of `generate_datetime_list` (`/root/reference/main.py:75-97`):
    * inclusive `[start, end]` stepped sequence of formatted timestamps.
    */
  def generateDatetimeList(
      start: String,
      end: String,
      step: DeltaTime
  ): Seq[String] = {
    val endT = TimeFormat.parse(end)
    val d = step.toDuration
    require(!d.isZero && !d.isNegative, "step must be positive")
    Iterator
      .iterate(TimeFormat.parse(start))(_.plus(d))
      .takeWhile(!_.isAfter(endT))
      .map(TimeFormat.format)
      .toSeq
  }

  /** Port of `extract_date` (`/root/reference/main.py:100-109`). */
  def extractDate(timeString: String): String =
    TimeFormat.parse(timeString).toLocalDate.toString

  /** Replaces `query_data_for_range`'s hard-coded 2024 month-walk
    * (`database_extractor.py:402-420`) with the evident intent: dates in
    * `[start, end)` — the reference's end-date check fires *before*
    * querying that day, i.e. end-exclusive (see SURVEY §7.4.5 for the
    * documented divergences from its loop quirks).
    */
  def datesInRange(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(end)).toSeq
}
