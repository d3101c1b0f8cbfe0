package graft.queries

import graft.Tables
import graft.sources.{JdbcSink, JdbcSource, JdbcSourceConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The live-JDBC ingestion path (reference S2,
  * `database_extractor.py:187-205` connect + query), driven through
  * the DRIVER'S DuckDB oracle rather than only specs: a bounded slice
  * of the events table is loaded into an embedded Derby database
  * (in-process — Derby ships on Spark's unmanaged classpath as the
  * Hive-metastore dependency), health-checked with the ping gate,
  * read back through the PARTITIONED JDBC scan (4 parallel range
  * queries — the production shape; one connection per range), and
  * aggregated. The oracle computes the same result straight from
  * the parquet slice, so the cells certify the whole
  * load → ping → partitioned-read chain end-to-end — and, for the
  * upsert query, the WRITE half ([[JdbcSink.upsert]]) including a
  * crash-replay of the same batch.
  *
  * The driver-side loads are INGESTION FIXTURES (bounded by the
  * event_id predicates), not scale paths: at 100 TB the database
  * already exists and only the partitioned read/write runs.
  *
  * Concurrency: the Derby database name is derived from the data
  * directory, so runs over different SF dirs never share state; two
  * CONCURRENT invocations of the same query over the same dir in one
  * JVM would still race on the table (same single-process assumption
  * as the streaming gate replays — the Bench/Verify harnesses run
  * queries serially).
  */
object SourceQueries extends QueryGroup {

  /** In-memory Derby URL namespaced by query and data dir. */
  private def derbyUrl(name: String, dir: String): String = {
    // Derby writes its log under derby.system.home — keep it in tmp
    System.setProperty("derby.system.home", sys.props("java.io.tmpdir"))
    val h = java.lang.Integer.toString(dir.hashCode & 0x7fffffff, 36)
    s"jdbc:derby:memory:${name}_$h;create=true"
  }

  private def recreate(url: String, table: String, ddl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // idempotent per JVM (bench passes re-run the query): drop if present
      try st.execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
      st.execute(ddl)
      st.close()
    } finally conn.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "jdbc_live_roundtrip" -> ((s, dir) => {
      val url = derbyUrl("graftlive", dir)
      // integer millis-of-value (floor(x*1000+0.5)): the repo-wide
      // IEEE-exact discretization, so the partitioned-sum is
      // order-independent and bit-identical to the oracle
      val rows = Tables.events(s, dir)
        .filter(col("event_id") < 2000)
        .select(col("event_id").cast("long"), col("event_type"),
          floor(col("value") * 1000 + 0.5).cast("long").as("value_mil"))
        .collect()
      recreate(url, "events_live",
        "CREATE TABLE events_live (event_id BIGINT NOT NULL, event_type VARCHAR(64), value_mil BIGINT)")
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val ins = conn.prepareStatement("INSERT INTO events_live VALUES (?, ?, ?)")
        rows.foreach { r =>
          ins.setLong(1, r.getLong(0)); ins.setString(2, r.getString(1))
          ins.setLong(3, r.getLong(2)); ins.addBatch()
        }
        ins.executeBatch()
      } finally conn.close()

      val cfg = JdbcSourceConfig(url = url, table = "events_live",
        partitionColumn = Some("event_id"), lowerBound = Some(0L),
        upperBound = Some(2000L), numPartitions = 4)
      require(JdbcSource.ping(cfg), "live-JDBC health probe failed")
      JdbcSource.read(s, cfg)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value_mil").as("sum_value_mil"))
        .orderBy("event_type")
    }),

    // The WRITE half of the live chain: base batch upserted, then an
    // overlapping update batch (+7 on every value, ids [300, 900) —
    // updates for [300, 600), fresh inserts for [600, 900)), then the
    // SAME update batch replayed — the crash-recovery case the sink's
    // DELETE-then-INSERT contract exists for. The readback flows
    // through the partitioned JDBC scan and the oracle recomputes the
    // expected final table from parquet alone, so a duplicate row, a
    // lost update, or a non-idempotent replay all hash-mismatch. The
    // PRIMARY KEY makes Derby itself a second witness: any duplicate
    // insert would abort the query.
    "jdbc_live_upsert_roundtrip" -> ((s, dir) => {
      val url = derbyUrl("graftupsert", dir)
      def slice(lo: Int, hi: Int, bump: Int): DataFrame =
        Tables.events(s, dir)
          .filter(col("event_id") >= lo && col("event_id") < hi)
          .select(col("event_id").cast("long").as("event_id"), col("event_type"),
            (floor(col("value") * 1000 + 0.5).cast("long") + bump).as("value_mil"))
      recreate(url, "events_upsert",
        "CREATE TABLE events_upsert (event_id BIGINT NOT NULL PRIMARY KEY, event_type VARCHAR(64), value_mil BIGINT)")
      val cfg = JdbcSourceConfig(url = url, table = "events_upsert",
        partitionColumn = Some("event_id"), lowerBound = Some(0L),
        upperBound = Some(900L), numPartitions = 4)
      JdbcSink.upsert(slice(0, 600, 0), cfg, Seq("event_id"), numPartitions = 4)
      val update = slice(300, 900, 7)
      JdbcSink.upsert(update, cfg, Seq("event_id"), numPartitions = 4)
      JdbcSink.upsert(update, cfg, Seq("event_id"), numPartitions = 4) // replay: must be a no-op
      require(JdbcSource.ping(cfg), "live-JDBC health probe failed")
      JdbcSource.read(s, cfg)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value_mil").cast("long").as("value_mil"))
        .orderBy("event_id")
    }))

  val oracleSql: Map[String, String] = Map(
    // the oracle never sees Derby — it recomputes the aggregate from
    // the parquet slice the query loaded, closing the loop on the
    // whole load/read chain. CAST the BIGINT sum back from DuckDB's
    // HUGEINT (the r12 hash-compare gotcha).
    "jdbc_live_roundtrip" ->
      """SELECT event_type, count(*) AS n,
  CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_mil
FROM events WHERE event_id < 2000
GROUP BY 1 ORDER BY 1""",

    // expected final table after base + update + replayed update:
    // [0, 300) original values, [300, 900) bumped by 7 — one row per id
    "jdbc_live_upsert_roundtrip" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
  CAST(CAST(floor(value * 1000 + 0.5) AS BIGINT)
       + CASE WHEN event_id >= 300 THEN 7 ELSE 0 END AS BIGINT) AS value_mil
FROM events WHERE event_id >= 0 AND event_id < 900
ORDER BY event_id""")
}
