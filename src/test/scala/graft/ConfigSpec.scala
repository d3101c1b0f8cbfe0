package graft

import graft.config._
import graft.time.DeltaTime
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  // mirrors /root/reference/config/application.toml
  private val appToml =
    """
      |[query]
      |time_format = "%Y-%m-%dT%H:%M:%SZ"  # reference strptime format
      |delta_time_start = [0, 0, 0, 0]
      |delta_time_end = [0, 24, 0, 0]
      |tz_offset = -8
      |columns_to_drop = ["result", "table", "_start", "_stop", "_measurement"]
      |column_key = "id"
      |bucket = "prototype-zero"
      |aggregate_function = "last"
      |aggregate_window = "1s"
      |filter = 'r["id"] =~ /.*/'
      |""".stripMargin.replace("'", "\"")

  test("TOML subset parses the reference application.toml shape") {
    val cfg = ConfigLoader.queryConfig(ConfigLoader.parseToml(appToml)("query"))
    assert(cfg.bucket == "prototype-zero")
    assert(cfg.deltaTimeEnd == DeltaTime(0, 24, 0, 0))
    assert(cfg.tzOffset == -8)
    assert(cfg.columnsToDrop.contains("_measurement"))
    assert(cfg.columnKey == "id")
    assert(cfg.sortBy == Seq("_time", "_field")) // dataclass default (database_extractor.py:153-155)
  }

  test("JSON and YAML configs load the same query config as TOML (load_config format switch)") {
    val appJson =
      """{"query": {
        |  "time_format": "%Y-%m-%dT%H:%M:%SZ",
        |  "delta_time_start": [0, 0, 0, 0],
        |  "delta_time_end": [0, 24, 0, 0],
        |  "tz_offset": -8,
        |  "columns_to_drop": ["result", "table", "_start", "_stop", "_measurement"],
        |  "column_key": "id",
        |  "bucket": "prototype-zero",
        |  "aggregate_function": "last",
        |  "aggregate_window": "1s",
        |  "filter": "r[\"id\"] =~ /.*/"
        |}}""".stripMargin
    val appYaml =
      """query:
        |  time_format: "%Y-%m-%dT%H:%M:%SZ"
        |  delta_time_start: [0, 0, 0, 0]
        |  delta_time_end: [0, 24, 0, 0]
        |  tz_offset: -8
        |  columns_to_drop: [result, table, _start, _stop, _measurement]
        |  column_key: id
        |  bucket: prototype-zero
        |  aggregate_function: last
        |  aggregate_window: 1s
        |  filter: 'r["id"] =~ /.*/'
        |""".stripMargin
    val fromToml = ConfigLoader.queryConfig(ConfigLoader.parseToml(appToml)("query"))
    val fromJson = ConfigLoader.queryConfig(ConfigLoader.parseJson(appJson)("query"))
    val fromYaml = ConfigLoader.queryConfig(ConfigLoader.parseYaml(appYaml)("query"))
    assert(fromJson == fromToml)
    assert(fromYaml == fromToml)
  }

  test("load switches on extension; unknown extensions point at loadRaw") {
    val dir = java.nio.file.Paths.get(SparkSuite.registerForCleanup(
      java.nio.file.Files.createTempDirectory("cfg")))
    val json = dir.resolve("app.json")
    java.nio.file.Files.writeString(json, """{"query": {"bucket": "b1", "tz_offset": -7}}""")
    val cfg = ConfigLoader.queryConfig(ConfigLoader.load(json.toString)("query"))
    assert(cfg.bucket == "b1" && cfg.tzOffset == -7)
    val raw = dir.resolve("blob.bin")
    java.nio.file.Files.write(raw, Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException](ConfigLoader.load(raw.toString))
    assert(ConfigLoader.loadRaw(raw.toString).toSeq == Seq[Byte](1, 2, 3))
    intercept[java.io.FileNotFoundException](ConfigLoader.load(dir.resolve("nope.toml").toString))
  }

  test("defaults match the reference dataclass") {
    val cfg = ExtractQueryConfig()
    assert(cfg.filter == "r[\"_measurement\"] =~ /.*/")
    assert(cfg.columnKey == "id")
    assert(cfg.aggregateFunction == "last")
    assert(cfg.aggregateWindow == "1s")
    assert(cfg.sortBy == Seq("_time", "_field"))
  }

  test("filter grammar: regex and equality forms") {
    assert(FilterSpec.parse("r[\"id\"] =~ /.*/") == FilterSpec.Regex("id", ".*"))
    assert(FilterSpec.parse("r[\"_measurement\"] == \"liner_heater\"") ==
      FilterSpec.Equals("_measurement", "liner_heater"))
    intercept[IllegalArgumentException](FilterSpec.parse("1 == 1; DROP TABLE"))
  }

  test("scalar value forms") {
    assert(ConfigLoader.parseValue("42") == 42L)
    assert(ConfigLoader.parseValue("-8") == -8L)
    assert(ConfigLoader.parseValue("1.5") == 1.5)
    assert(ConfigLoader.parseValue("true") == true)
    assert(ConfigLoader.parseValue("[1, 2]") == List(1L, 2L))
    assert(ConfigLoader.parseValue("[]") == Nil)
  }
}
