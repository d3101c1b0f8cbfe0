package graft.config

import graft.time.{DeltaTime, TimeFormat}

/** Mirror of the reference's `DataExtractorQueryConfig` dataclass —
  * same 11 fields, same defaults
  * (`/root/reference/src/database_extractor/database_extractor.py:131-169`).
  *
  * `filter` keeps the reference's observed grammar (equality or regex
  * match on one column — `README.md:38-39`, `config/application.toml:13-15`)
  * but is parsed into a structured [[FilterSpec]] rather than spliced into
  * query text (the reference string-templates it into Flux,
  * `database_extractor.py:294` — a non-goal here; see SURVEY §2.11).
  */
final case class ExtractQueryConfig(
    timeFormat: String = TimeFormat.Pattern,
    deltaTimeStart: DeltaTime = DeltaTime(),
    deltaTimeEnd: DeltaTime = DeltaTime(),
    tzOffset: Int = 0,
    bucket: String = "",
    columnsToDrop: Seq[String] = Nil,
    filter: String = "r[\"_measurement\"] =~ /.*/",
    columnKey: String = "id",
    aggregateFunction: String = "last",
    aggregateWindow: String = "1s",
    sortBy: Seq[String] = Seq("_time", "_field")
)

/** Structured form of the reference's filter strings. Only the two shapes
  * the reference documents are accepted:
  *   - `r["col"] =~ /regex/`   → [[FilterSpec.Regex]]
  *   - `r["col"] == "value"`   → [[FilterSpec.Equals]]
  */
sealed trait FilterSpec {
  def column: String
}
object FilterSpec {
  final case class Regex(column: String, pattern: String) extends FilterSpec
  final case class Equals(column: String, value: String) extends FilterSpec

  private val RegexForm = """\s*r\["([^"]+)"\]\s*=~\s*/(.*)/\s*""".r
  private val EqualsForm = """\s*r\["([^"]+)"\]\s*==\s*"([^"]*)"\s*""".r

  def parse(s: String): FilterSpec = s match {
    case RegexForm(col, pat)  => Regex(col, pat)
    case EqualsForm(col, v)   => Equals(col, v)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported filter (expected r[\"col\"] =~ /re/ or r[\"col\"] == \"v\"): $other"
      )
  }
}

/** Config reader mirroring the reference's `load_config` format switch
  * (`database_extractor.py:91-128`): `.json` and `.yaml`/`.yml` parse
  * via the Jackson already on the Spark classpath, `.toml` via the
  * built-in TOML-subset parser (offline build — no external TOML
  * dependency is resolvable, see build.sbt; the subset covers
  * `application.toml`-shaped files: `[section]` headers, `key = value`
  * with string / int / bool / homogeneous inline-array values, `#`
  * comments), and any other extension loads raw bytes
  * ([[ConfigLoader.loadRaw]], the reference's else branch).
  *
  * All formats normalize to the same `Map[section, Map[key, value]]`
  * with TOML's value types (String / Long / Double / Boolean / List),
  * so [[ConfigLoader.queryConfig]] is format-agnostic; top-level scalar
  * keys land in the `""` section.
  */
object ConfigLoader {
  type Section = Map[String, Any]

  def parseToml(text: String): Map[String, Section] = {
    var section = ""
    val out = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, Any]]()
    out(section) = scala.collection.mutable.Map()
    for (raw <- text.linesIterator) {
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          if (!out.contains(section)) out(section) = scala.collection.mutable.Map()
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"Malformed TOML line: $raw")
          val key = line.substring(0, eq).trim
          val value = parseValue(line.substring(eq + 1).trim)
          out(section)(key) = value
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  def load(path: String): Map[String, Section] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw new java.io.FileNotFoundException(s"File not found: $path")
    lazy val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    if (path.endsWith(".json")) parseJson(text)
    else if (path.endsWith(".yaml") || path.endsWith(".yml")) parseYaml(text)
    else if (path.endsWith(".toml")) parseToml(text)
    else
      throw new IllegalArgumentException(
        s"Unsupported config extension for $path (expected .json/.yaml/.toml); " +
          "for the reference's raw-bytes else branch use loadRaw")
  }

  /** The reference's unknown-extension fallback: raw bytes
    * (`database_extractor.py:126-128`).
    */
  def loadRaw(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  def parseJson(text: String): Map[String, Section] =
    fromTree(new com.fasterxml.jackson.databind.ObjectMapper().readTree(text))

  def parseYaml(text: String): Map[String, Section] =
    fromTree(new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()).readTree(text))

  /** Normalize a Jackson tree to the TOML-shaped section map: one-level
    * object fields become sections, top-level scalars the "" section;
    * numbers map to Long/Double exactly as [[parseValue]] does.
    */
  private def fromTree(root: com.fasterxml.jackson.databind.JsonNode): Map[String, Section] = {
    import com.fasterxml.jackson.databind.JsonNode
    def value(n: JsonNode): Any =
      if (n.isTextual) n.asText
      else if (n.isBoolean) n.asBoolean
      else if (n.isIntegralNumber) n.asLong
      else if (n.isFloatingPointNumber) n.asDouble
      else if (n.isArray) (0 until n.size).map(i => value(n.get(i))).toList
      else if (n.isNull) null
      else if (n.isObject) fields(n).map { case (k, v) => k -> value(v) }.toMap
      else throw new IllegalArgumentException(s"Unsupported config value: $n")
    def fields(n: JsonNode): Seq[(String, JsonNode)] = {
      val it = n.fields()
      val buf = scala.collection.mutable.ListBuffer[(String, JsonNode)]()
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toSeq
    }
    require(root != null && root.isObject, "config root must be an object")
    val (sections, scalars) = fields(root).partition(_._2.isObject)
    val out = scala.collection.mutable.Map[String, Section]()
    out("") = scalars.map { case (k, v) => k -> value(v) }.toMap
    sections.foreach { case (name, node) =>
      out(name) = fields(node).map { case (k, v) => k -> value(v) }.toMap
    }
    out.toMap
  }

  private def stripComment(line: String): String = {
    // '#' outside of quotes starts a comment
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inStr = !inStr
      if (c == '#' && !inStr) return sb.toString
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private[graft] def parseValue(v: String): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case s if s.startsWith("[") && s.endsWith("]") =>
      splitTopLevel(s.substring(1, s.length - 1)).map(x => parseValue(x.trim))
    case "true"  => true
    case "false" => false
    case s if s.matches("[+-]?\\d+") => s.toLong
    case s if s.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => s.toDouble
    case s => s // bare string
  }

  private def splitTopLevel(s: String): List[String] = {
    if (s.trim.isEmpty) return Nil
    val parts = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    for (c <- s) c match {
      case '"'              => inStr = !inStr; cur.append(c)
      case '[' if !inStr    => depth += 1; cur.append(c)
      case ']' if !inStr    => depth -= 1; cur.append(c)
      case ',' if !inStr && depth == 0 => parts += cur.toString; cur.clear()
      case c                => cur.append(c)
    }
    parts += cur.toString
    parts.toList
  }

  /** Build an [[ExtractQueryConfig]] from a parsed `[query]` section using
    * the reference's key names (`config/application.toml:2-16`).
    */
  def queryConfig(section: Section): ExtractQueryConfig = {
    def deltaOf(key: String): DeltaTime = section.get(key) match {
      case Some(xs: List[_]) => DeltaTime.fromSeq(xs.map(x => x.asInstanceOf[Long].toInt))
      case None              => DeltaTime()
      case Some(other) =>
        throw new IllegalArgumentException(s"$key must be an int array, got $other")
    }
    val base = ExtractQueryConfig()
    ExtractQueryConfig(
      timeFormat = section.getOrElse("time_format", base.timeFormat).toString,
      deltaTimeStart = deltaOf("delta_time_start"),
      deltaTimeEnd = deltaOf("delta_time_end"),
      tzOffset = section.get("tz_offset").map(_.asInstanceOf[Long].toInt).getOrElse(0),
      bucket = section.getOrElse("bucket", "").toString,
      columnsToDrop = section.get("columns_to_drop")
        .map(_.asInstanceOf[List[_]].map(_.toString)).getOrElse(Nil),
      filter = section.getOrElse("filter", base.filter).toString,
      columnKey = section.getOrElse("column_key", base.columnKey).toString,
      aggregateFunction = section.getOrElse("aggregate_function", base.aggregateFunction).toString,
      aggregateWindow = section.getOrElse("aggregate_window", base.aggregateWindow).toString,
      sortBy = section.get("sort_by")
        .map(_.asInstanceOf[List[_]].map(_.toString)).getOrElse(base.sortBy)
    )
  }
}
