package graft.queries

import graft.Tables
import graft.operators.ExtractOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second wave of scalar/aggregate function coverage: cube grouping
  * sets, exact percentiles, extended string functions, array and
  * null-handling functions, and the map-typed pivot round-trip
  * (the 100 TB-safe pivot of SURVEY §7.4.1).
  */
object FunctionQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Custom typed Aggregator UDAF (§2.11): quantity-weighted mean
    // price per return flag — exact Long accumulation, one final IEEE
    // division pair, hash-deterministic despite a DOUBLE output.
    "weighted_mean_udaf" -> ((s, dir) => {
      val wavg = udaf(graft.functions.WeightedMeanCents)
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
          floor(col("l_quantity") + 0.5).cast("long").as("qty"))
        .groupBy("l_returnflag")
        .agg(wavg(col("cents"), col("qty")).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // CUBE grouping sets (all 4 combinations), nulls coalesced.
    "cube_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(year(col("o_orderdate")).as("y"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("y", "o_orderpriority")
    }),

    // Exact percentiles (linear interpolation — matches quantile_cont).
    "percentile_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("o_orderpriority")
    }),

    // Extended string functions.
    "string_funcs2" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          trim(lpad(col("p_brand"), 12, "#")).as("padded"),
          reverse(col("p_type")).as("type_rev"),
          split(col("p_type"), " ").getItem(0).as("type_head"),
          translate(col("p_name"), "abc", "xyz").as("translated"))
        .orderBy("p_partkey")
    }),

    // Array functions over the embedding column (scalar outputs only —
    // raw float pass-through stays exact across engines).
    "array_funcs" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          col("embedding").getItem(0).as("first_component"),
          array_max(col("embedding")).as("max_component"),
          array_min(col("embedding")).as("min_component"))
        .orderBy("vec_id")
    }),

    // Null-handling family; nulls manufactured with nullif.
    "null_funcs" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          nullif(col("event_type"), lit("error")).as("masked"),
          coalesce(nullif(col("event_type"), lit("error")), lit("(err)")).as("filled"),
          isnull(nullif(col("event_type"), lit("error"))).as("was_error"))
        .orderBy("event_id")
    }),

    // explode + aggregate + global top-k: corpus token frequencies.
    "token_freq" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)
        .limit(10)
    }),

    // collect_set with deterministic ordering via sort_array.
    "collect_agg" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(array_join(sort_array(collect_set(col("source"))), ",").as("sources"))
        .orderBy("lang")
    }),

    // Gap-based sessionization via the built-in session_window (same
    // code path batch and streaming — Sessionize.sessionWindowAgg);
    // oracle is the classic gaps-and-islands SQL.
    "sessionize" -> ((s, dir) => {
      graft.streaming.Sessionize.sessionWindowAgg(
        Tables.events(s, dir), "user_id", "ts", "value", gap = "1 day")
        .select("user_id", "session_start", "n_events", "total_value")
        .orderBy("user_id", "session_start")
    }),

    // Map-typed pivot round-trip: build the constant-width map pivot,
    // then explode it back to long form — proves the scale-safe pivot
    // carries the same data as the widening one.
    "map_pivot_roundtrip" -> ((s, dir) => {
      val longForm = Tables.events(s, dir)
        .transform(ExtractOps.timeRange("ts", "2024-01-02 00:00:00Z".replace(" ", "T"), "2024-01-03T00:00:00Z"))
        .transform(ExtractOps.resampleLastLong("ts", "1 second", "event_type", "value"))
      ExtractOps.pivotWideMap("ts", "event_type", "value")(longForm)
        .select(col("ts"), explode(col("values")).as(Seq("event_type", "value")))
        .orderBy("ts", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "weighted_mean_udaf" ->
      """SELECT l_returnflag,
  CAST(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
    / 100.0
    / CAST(CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
    AS wavg_price
FROM lineitem GROUP BY 1 ORDER BY 1""",

    "cube_agg" ->
      """SELECT coalesce(y, -1) AS y,
  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
  n, total
FROM (
  SELECT year(o_orderdate) AS y, o_orderpriority,
    count(*) AS n, round(sum(o_totalprice), 2) AS total
  FROM orders GROUP BY CUBE (year(o_orderdate), o_orderpriority))
ORDER BY 1, 2""",

    "percentile_agg" ->
      """SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
  round(min(o_totalprice), 2) AS lo,
  round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY 1 ORDER BY 1""",

    "string_funcs2" ->
      """SELECT p_partkey,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  trim(lpad(p_brand, 12, '#')) AS padded,
  reverse(p_type) AS type_rev,
  string_split(p_type, ' ')[1] AS type_head,
  translate(p_name, 'abc', 'xyz') AS translated
FROM part ORDER BY p_partkey""",

    "array_funcs" ->
      """SELECT vec_id,
  len(embedding) AS dim,
  embedding[1] AS first_component,
  list_max(embedding) AS max_component,
  list_min(embedding) AS min_component
FROM embeddings ORDER BY vec_id""",

    "null_funcs" ->
      """SELECT event_id,
  nullif(event_type, 'error') AS masked,
  coalesce(nullif(event_type, 'error'), '(err)') AS filled,
  nullif(event_type, 'error') IS NULL AS was_error
FROM events ORDER BY event_id""",

    "token_freq" ->
      """SELECT w, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY 1 ORDER BY n DESC, w ASC LIMIT 10""",

    "collect_agg" ->
      """SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
FROM documents GROUP BY 1 ORDER BY 1""",

    "sessionize" ->
      """WITH marks AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marks)
SELECT user_id, min(ts) AS session_start,
  count(*) AS n_events, round(sum(value), 2) AS total_value
FROM numbered GROUP BY user_id, session_id
ORDER BY user_id, session_start""",

    "map_pivot_roundtrip" ->
      """SELECT date_trunc('second', ts) AS ts, event_type, arg_max(value, ts) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
