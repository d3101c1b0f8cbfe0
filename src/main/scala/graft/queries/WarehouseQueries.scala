package graft.queries

import graft.Tables
import graft.ext.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-maintenance suite: the SCD2 merge-into rewrite
  * ([[graft.ext.Warehouse.scd2Merge]]). The dimension, its history,
  * and the update batch are all derived deterministically from the
  * `customer` table so the DuckDB oracle can rebuild the exact same
  * inputs and replay the merge semantics in SQL.
  */
object WarehouseQueries extends QueryGroup {

  private val BatchDate = "1995-06-01"

  /** Deterministic fixture: dimension attrs from customer, integer
    * cents (floor(x*100+0.5), the repo-wide IEEE-exact money rule).
    */
  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("acctbal_cents"),
      col("c_mktsegment").as("segment"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD2 merge: one full-outer join of the open rows vs the batch on
    // the key; closed history never shuffles (union only). The fixture
    // exercises every branch: %13 keys carry a closed history row
    // (must pass through untouched), %7 keys get a changed update
    // (close + reopen), %100==3 keys get a no-op update (carry), and
    // %11 keys arrive offset by 10M as brand-new inserts.
    "merge_scd2" -> ((s, dir) => {
      val b = base(s, dir)
      val history = b.filter(col("c_custkey") % 13 === 0).select(
        col("c_custkey"),
        (col("acctbal_cents") - 500).as("acctbal_cents"),
        col("segment"),
        lit("1985-01-01").as("valid_from"),
        lit("1990-01-01").as("valid_to"),
        lit(false).as("is_current"))
      val open = b.select(
        col("c_custkey"), col("acctbal_cents"), col("segment"),
        lit("1990-01-01").as("valid_from"),
        lit(Warehouse.OpenEnd).as("valid_to"),
        lit(true).as("is_current"))
      val updates = b
        .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 100 === 3)
        .select(
          col("c_custkey"),
          when(col("c_custkey") % 7 === 0, col("acctbal_cents") + 12345)
            .otherwise(col("acctbal_cents")).as("acctbal_cents"),
          col("segment"))
        .unionByName(b.filter(col("c_custkey") % 11 === 0).select(
          (col("c_custkey") + 10000000L).as("c_custkey"),
          col("c_custkey").as("acctbal_cents"),
          lit("NEW").as("segment")))
      Warehouse.scd2Merge(
        history.unionByName(open), updates,
        "c_custkey", Seq("acctbal_cents", "segment"), BatchDate)
        .orderBy("c_custkey", "valid_from", "is_current")
    }),

    // Incremental view maintenance: per-(type,day) partial states are
    // built from two date-disjoint batches, merged, and finalized —
    // the oracle computes the whole aggregate DIRECTLY, so a green
    // hash proves the partial/merge/finalize algebra loses nothing.
    "incremental_agg" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_centi"))
      val batch1 = e.filter(col("day") < "2024-01-15")
      val batch2 = e.filter(col("day") >= "2024-01-15")
      val merged = Warehouse.mergeStates(
        Seq(
          Warehouse.aggState(batch1, Seq("event_type", "day"), "value_centi"),
          Warehouse.aggState(batch2, Seq("event_type", "day"), "value_centi")),
        Seq("event_type", "day"))
      Warehouse.finalizeMean(merged).orderBy("event_type", "day")
    }),

    // Incremental DISTINCT maintenance: per-batch HLL sketches of
    // distinct users per event type, merged across the two
    // date-disjoint batches, estimate read from merged state alone.
    // The sketch estimate is engine-specific, so the RECORDED columns
    // are the exact distinct (oracle-computable) plus a boolean
    // asserting the merged-sketch estimate landed within 5% — ~3× the
    // lgK=12 RSE (~1.6%), so the assertion holds even once a larger SF
    // pushes the sketch out of exact sparse mode (at sf0.01 it is
    // still sparse/exact; ADVICE r5 flagged the old 2% as
    // SF-dependent). GraphWarehouseSpec pins merge ≡ single-pass.
    "incremental_distinct" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val merged = Warehouse.mergeDistinctStates(
        Seq(
          Warehouse.distinctState(e.filter(col("day") < "2024-01-15"), Seq("event_type"), "user_id"),
          Warehouse.distinctState(e.filter(col("day") >= "2024-01-15"), Seq("event_type"), "user_id")),
        Seq("event_type"))
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      Warehouse.finalizeDistinct(merged)
        .join(exact, Seq("event_type"))
        .withColumn("within_tol",
          abs(col("distinct_est") - col("exact_users")).cast("double")
            / col("exact_users") < 0.05)
        .select("event_type", "exact_users", "within_tol")
        .orderBy("event_type")
    }),

    // Incremental QUANTILE maintenance: per-batch fixed-width integer
    // histograms (50-centi bins over the centi-discretized value),
    // merged across the two date-disjoint batches by summing per-bin
    // counts, p50/p95/p99 read from merged state alone as the first
    // bin whose cumulative count covers p‰ — integer-exact in both
    // engines, error bounded by the bin width by construction (no
    // sketch estimate to tolerance-check).
    "incremental_quantile" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_centi"))
      val merged = Warehouse.mergeHistogramStates(
        Seq(
          Warehouse.histogramState(e.filter(col("day") < "2024-01-15"), Seq("event_type"), "value_centi", 50L),
          Warehouse.histogramState(e.filter(col("day") >= "2024-01-15"), Seq("event_type"), "value_centi", 50L)),
        Seq("event_type"))
      Warehouse.finalizeQuantiles(merged, Seq("event_type"), Seq(500, 950, 990), 50L)
        .orderBy("event_type", "p_permille")
    }),

    // Snapshot diff: CDC derived from two full dumps. Both snapshots
    // are deterministic slices of orders (in cents): the old snapshot
    // is missing the %50==3 keys (→ added), the new one is missing
    // %37==5 (→ removed), and %11==0 keys get +777 cents (→ changed);
    // everything else is identical and must NOT appear in the diff.
    "snapshot_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      val oldSnap = o.filter(col("o_orderkey") % 50 =!= 3)
      val newSnap = o.filter(col("o_orderkey") % 37 =!= 5)
        .withColumn("cents",
          when(col("o_orderkey") % 11 === 0, col("cents") + 777).otherwise(col("cents")))
      Warehouse.snapshotDiff(oldSnap, newSnap, "o_orderkey", Seq("cents", "status"))
        .orderBy("o_orderkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "merge_scd2" ->
      s"""WITH base AS (
  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
         c_mktsegment AS segment FROM customer),
hist AS (
  SELECT c_custkey, acctbal_cents - 500 AS acctbal_cents, segment,
         '1985-01-01' AS valid_from, '1990-01-01' AS valid_to, FALSE AS is_current
  FROM base WHERE c_custkey % 13 = 0),
cur AS (
  SELECT c_custkey, acctbal_cents, segment,
         '1990-01-01' AS valid_from, '9999-12-31' AS valid_to, TRUE AS is_current
  FROM base),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN acctbal_cents + 12345 ELSE acctbal_cents END AS acctbal_cents,
         segment
  FROM base WHERE c_custkey % 7 = 0 OR c_custkey % 100 = 3
  UNION ALL
  SELECT c_custkey + 10000000 AS c_custkey, c_custkey AS acctbal_cents, 'NEW' AS segment
  FROM base WHERE c_custkey % 11 = 0),
changedk AS (
  SELECT cur.c_custkey FROM cur JOIN upd USING (c_custkey)
  WHERE cur.acctbal_cents <> upd.acctbal_cents OR cur.segment <> upd.segment),
merged AS (
  SELECT * FROM hist
  UNION ALL
  SELECT * FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM changedk)
  UNION ALL
  SELECT c_custkey, acctbal_cents, segment, valid_from,
         '$BatchDate' AS valid_to, FALSE AS is_current
  FROM cur WHERE c_custkey IN (SELECT c_custkey FROM changedk)
  UNION ALL
  SELECT c_custkey, acctbal_cents, segment, '$BatchDate' AS valid_from,
         '9999-12-31' AS valid_to, TRUE AS is_current
  FROM upd WHERE c_custkey IN (SELECT c_custkey FROM changedk)
     OR c_custkey NOT IN (SELECT c_custkey FROM cur))
SELECT c_custkey, acctbal_cents, segment, valid_from, valid_to, is_current
FROM merged ORDER BY c_custkey, valid_from, is_current""",

    "incremental_agg" ->
      """WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
  FROM events)
SELECT event_type, day,
  CAST(count(*) AS BIGINT) AS s_cnt,
  CAST(sum(value_centi) AS BIGINT) AS s_sum,
  min(value_centi) AS s_min,
  max(value_centi) AS s_max,
  (CAST(sum(value_centi) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS mean_micro
FROM e GROUP BY 1, 2 ORDER BY 1, 2""",

    "incremental_quantile" ->
      """WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
  FROM events),
b1 AS (
  SELECT event_type, value_centi // 50 AS s_bin, CAST(count(*) AS BIGINT) AS s_cnt
  FROM e WHERE day < DATE '2024-01-15' GROUP BY 1, 2),
b2 AS (
  SELECT event_type, value_centi // 50 AS s_bin, CAST(count(*) AS BIGINT) AS s_cnt
  FROM e WHERE day >= DATE '2024-01-15' GROUP BY 1, 2),
st AS (
  SELECT event_type, s_bin, CAST(sum(s_cnt) AS BIGINT) AS s_cnt
  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2) GROUP BY 1, 2),
c AS (
  SELECT event_type, s_bin,
    CAST(sum(s_cnt) OVER (PARTITION BY event_type ORDER BY s_bin) AS BIGINT) AS cum,
    CAST(sum(s_cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM st),
p AS (SELECT * FROM (VALUES (500), (950), (990)) AS t(p_permille))
SELECT event_type, p_permille, CAST(min(s_bin) * 50 AS BIGINT) AS q_value
FROM c CROSS JOIN p
WHERE cum * 1000 >= p_permille * total
GROUP BY 1, 2 ORDER BY 1, 2""",

    "incremental_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
  true AS within_tol
FROM events GROUP BY event_type ORDER BY event_type""",

    "snapshot_diff" ->
      """WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderstatus AS status FROM orders),
olds AS (SELECT * FROM o WHERE o_orderkey % 50 <> 3),
news AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN cents + 777 ELSE cents END AS cents,
         status
  FROM o WHERE o_orderkey % 37 <> 5),
j AS (
  SELECT coalesce(olds.o_orderkey, news.o_orderkey) AS o_orderkey,
         CASE WHEN olds.o_orderkey IS NULL THEN 'added'
              WHEN news.o_orderkey IS NULL THEN 'removed'
              WHEN olds.cents IS DISTINCT FROM news.cents
                OR olds.status IS DISTINCT FROM news.status
                THEN 'changed' END AS change_type,
         olds.cents AS old_cents, news.cents AS new_cents,
         olds.status AS old_status, news.status AS new_status
  FROM olds FULL OUTER JOIN news ON olds.o_orderkey = news.o_orderkey)
SELECT o_orderkey, change_type, old_cents, new_cents, old_status, new_status
FROM j WHERE change_type IS NOT NULL ORDER BY o_orderkey"""
  )
}
