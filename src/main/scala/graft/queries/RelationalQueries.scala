package graft.queries

import graft.Tables
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard relational operator coverage over the TPC-H-ish tables —
  * the categories SURVEY §2.3–§2.8 marks ABSENT in the reference but
  * required of a complete engine: joins (broadcast/semi/anti/outer/
  * as-of), hash aggregation with distinct and rollup, window functions,
  * sorts/top-k, set operations, and the scalar function families.
  *
  * Float discipline for the hash-compare oracle: any aggregated double
  * is `round(…, 2)` (or 6 for transcendentals) identically on both
  * sides; raw stored doubles pass through uncompared-arithmetic and stay
  * exact. Every computed column is aliased identically in Spark and SQL.
  */
object RelationalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hash aggregation with map-side partials — TPC-H Q1 shape. sum_qty
    // is exact (integral doubles); price aggregates rounded.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // 3-way join with selective dimension filter — TPC-H Q3 shape.
    // Catalyst broadcasts the filtered customer side under AQE.
    "q3_join" -> ((s, dir) => {
      val customer = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val orders = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val lineitem = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Explicit broadcast-hash join of a small dimension (SURVEY §2.3).
    "join_broadcast" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    // Left-semi join — EXISTS. Customers with at least one urgent order.
    "semi_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Left-anti join — NOT EXISTS. Customers with no urgent orders.
    "anti_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Left-outer join with empty-side aggregation semantics.
    "outer_join" -> ((s, dir) => {
      Tables.nation(s, dir)
        .join(Tables.supplier(s, dir), col("n_nationkey") === col("s_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(
          count(col("s_suppkey")).as("n_suppliers"),
          round(coalesce(sum(col("s_acctbal")), lit(0.0)), 2).as("total_acctbal"))
        .orderBy("n_name")
    }),

    // As-of join (events ← latest order per user at event time): ONE
    // shuffle via union + ordered window, no n×m expansion. Right ties
    // at (key, time) pre-deduplicated with max for determinism.
    "asof_join" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("o_totalprice"))
      Relational.asOfJoin(
        Tables.events(s, dir).select("event_id", "user_id", "ts"),
        orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payloadCols = Seq("o_totalprice"))
        .orderBy("event_id")
    }),

    // Range (interval) join: lineitems shipped inside each order's
    // 30-day window — bucketed equi-join + refine, not a cartesian.
    "range_join" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("w_end"))
      Relational.rangeJoin(
        orders, "w_start", "w_end",
        Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"), "l_shipdate",
        bucketSeconds = 30L * 86400)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"))
        .orderBy("o_orderkey")
    }),

    // Ranking window — top-3 customers by balance per segment.
    // Same per-segment top-3, but through the custom whole-operator
    // extension (plans/TopKPerKey: LogicalPlan + Strategy + SparkPlan,
    // bounded per-key heaps instead of WindowExec's full partition
    // sort). Emits the top-k SET (no rank column); ordered for the
    // hash compare. PlansSpec asserts WindowExec-free planning.
    "topk_per_group_native" -> ((s, dir) => {
      graft.plans.TopKPerKey(
        Tables.customer(s, dir).select("c_mktsegment", "c_custkey", "c_acctbal"),
        keyCols = Seq("c_mktsegment"),
        orderSpec = Seq("c_acctbal" -> true, "c_custkey" -> false),
        k = 3)
        .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey").asc)
    }),

    "window_rank" -> ((s, dir) => {
      Relational.topKPerGroup(
        Tables.customer(s, dir),
        partition = Seq(col("c_mktsegment")),
        order = Seq(col("c_acctbal").desc, col("c_custkey").asc),
        k = 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rank")
    }),

    // Distribution windows — ntile / percent_rank / cume_dist per
    // priority band (all exact-integer-derived: ntile is integer
    // bucketing, the two ratios are (rank-1)/(n-1) and rank/n IEEE
    // divisions — hash-identical across engines).
    "window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    }),

    // Analytic window — lag within an ordered per-user series.
    "window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select("event_id", "user_id", "value", "prev_value")
        .orderBy("event_id")
    }),

    // Frame-spec window — running sum, rows unbounded preceding.
    "running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("running_value", round(sum(col("value")).over(w), 2))
        .select("event_id", "user_id", "running_value")
        .orderBy("event_id")
    }),

    // Set operations (SURVEY §2.7): distinct union / intersect / except
    // of per-type user populations.
    "set_union" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click").select("user_id")
        .union(e.filter(col("event_type") === "purchase").select("user_id"))
        .distinct()
        .orderBy("user_id")
    }),
    "set_intersect" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "signup").select("user_id")
        .intersect(e.filter(col("event_type") === "error").select("user_id"))
        .orderBy("user_id")
    }),
    "set_except" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
               col("ts") < lit("2024-01-02 12:00:00").cast("timestamp"))
        .select("user_id").distinct()
        .except(e.filter(col("ts") >= lit("2024-01-02 12:00:00").cast("timestamp") &&
                         col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
          .select("user_id"))
        .orderBy("user_id")
    }),

    // Distinct aggregation (exact + approximate is non-deterministic, so
    // only exact is oracle-checked).
    "distinct_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Grouping sets via rollup; grouping nulls coalesced to 'ALL' on both
    // sides to dodge engine-specific null ordering.
    // Arbitrary GROUPING SETS (not expressible as one rollup/cube):
    // per-status, per-priority, and grand-total aggregates in ONE
    // Expand+Aggregate pass over the scan instead of three jobs.
    "grouping_sets_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      o.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("sum_cents"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    "rollup_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Scalar string functions (SURVEY §2.8 family).
    "scalar_string" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          instr(col("p_name"), "a").as("first_a"))
        .orderBy("p_partkey")
    }),

    // Scalar date/time functions.
    "scalar_date" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"))
        .orderBy("o_orderkey")
    }),

    // Scalar math functions. All float-producing paths are reduced to
    // integers via IEEE-exact ops (sqrt is correctly rounded; *, +, floor
    // are exact) so the hash compare vs DuckDB is bit-deterministic —
    // round()'s implementation differs across engines on boundary cases.
    // ln is libm-dependent (last-ulp differences), so it is discretized
    // to 2 decimals where a boundary hit needs a ~1e-13-wide coincidence.
    "scalar_math" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") + 0.5).as("price_round"),
          floor(col("l_discount") * 100).as("disc_pct"),
          ceil(col("l_tax") * 100).as("tax_pct"),
          floor(sqrt(col("l_extendedprice")) * 1e6 + 0.5).as("price_sqrt_micro"),
          floor(log(col("l_extendedprice")) * 100 + 0.5).as("price_ln_centi"),
          abs(col("l_quantity") - lit(25)).as("qty_dev"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // JSON extraction from the events.props text column.
    "json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    }),

    // Conditional expression family.
    "case_when" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          when(col("value") < 5, "low")
            .when(col("value") < 50, "mid")
            .otherwise("high").as("bucket"))
        .orderBy("event_id")
    }),

    // Global top-k with deterministic tie-break.
    "topk_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // TPC-H Q5-shaped 5-way join: Catalyst reorders/broadcasts the dim
    // chain; revenue is integer-cents math (floor(x*100+0.5) is IEEE-
    // exact on the shared double input, and integer sums are
    // associative) so the aggregate is bit-deterministic — the pattern
    // for money aggregation under an exact-hash contract.
    "q5_multi_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).withColumn("rev_c4",
        floor(col("l_extendedprice") * 100 + 0.5) * (lit(100) - floor(col("l_discount") * 100 + 0.5)))
      li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev_c4")).as("rev_c4"))
        .withColumn("revenue", col("rev_c4").cast("double") / 10000)
        .orderBy("n_name")
    }),

    // Value-based (RANGE) window frame: trailing-30-day order count and
    // spend per customer. Frame bounds on epoch seconds so Spark and the
    // oracle agree exactly; spend in integer cents for determinism.
    "range_frame_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // o_orderdate is TIMESTAMP_NTZ (no direct long cast) — go through
      // timestamp first; session TZ is UTC so epochs match the oracle's
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, dir)
        .withColumn("price_cents", floor(col("o_totalprice") * 100 + 0.5))
        .select(
          col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_trailing_30d"),
          sum(col("price_cents")).over(w).as("spend_cents_30d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Two-phase salted aggregation on a 3-value (maximally hot) group
    // key — result provably equal to the plain groupBy (the oracle IS
    // the plain aggregate); the salt spreads each hot key over 16
    // shuffle partitions.
    "skew_salted_agg" -> ((s, dir) => {
      graft.operators.Skew.saltedAgg(
        Tables.lineitem(s, dir), "l_returnflag", col("l_orderkey"),
        partialAggs = Seq(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn")),
        finalAggs = Seq(sum(col("ps")).as("sum_qty"), sum(col("pn")).as("n")),
        salts = 16)
        .orderBy("l_returnflag")
    }),

    // Salted join on the fact table's foreign key + post-join rollup;
    // oracle is the plain join+group.
    "skew_salted_join" -> ((s, dir) => {
      graft.operators.Skew.saltedJoin(
        Tables.lineitem(s, dir).select("l_partkey", "l_quantity", "l_orderkey"),
        Tables.part(s, dir).select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey", col("l_orderkey"), salts = 8)
        .groupBy("p_brand")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // Fixed-width histogram of a measure column (distribution audit).
    "value_histogram" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(floor(col("value") / 10).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"),
          floor(min(col("value")) * 100 + 0.5).as("min_centi"),
          floor(max(col("value")) * 100 + 0.5).as("max_centi"))
        .orderBy("bucket")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(avg(l_quantity), 2) AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10""",

    "join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1""",

    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey""",

    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey""",

    "outer_join" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers,
  round(coalesce(sum(s_acctbal), 0), 2) AS total_acctbal
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY 1 ORDER BY 1""",

    "asof_join" ->
      """WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
  FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts, o.o_totalprice
FROM events e
ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id""",

    "range_join" ->
      """SELECT o_orderkey, count(*) AS n_shipped
FROM orders JOIN lineitem
  ON l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
WHERE o_orderkey < 1000
GROUP BY 1 ORDER BY 1""",

    "topk_per_group_native" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY c_mktsegment
      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer) t
WHERE rn <= 3 ORDER BY c_mktsegment, c_acctbal DESC, c_custkey ASC""",

    "window_rank" ->
      """SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY c_mktsegment
      ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer) t
WHERE rank <= 3 ORDER BY c_mktsegment, rank""",

    "window_lag" ->
      """SELECT event_id, user_id, value,
  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value
FROM events ORDER BY event_id""",

    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
  ntile(4) OVER w AS quartile,
  percent_rank() OVER w AS pr,
  cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderkey""",

    "running_sum" ->
      """SELECT event_id, user_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM events ORDER BY event_id""",

    "set_union" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id""",

    "set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id""",

    "set_except" ->
      """SELECT DISTINCT user_id FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-02 12:00:00'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE ts >= TIMESTAMP '2024-01-02 12:00:00' AND ts < TIMESTAMP '2024-01-03 00:00:00'
ORDER BY user_id""",

    "distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1""",

    "grouping_sets_agg" ->
      """WITH o AS (
  SELECT o_orderstatus, o_orderpriority,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
  CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM o GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority""",

    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
  coalesce(l_linestatus, 'ALL') AS l_linestatus,
  sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY 1, 2""",

    "scalar_string" ->
      """SELECT p_partkey,
  upper(p_name) AS name_upper,
  substr(p_type, 1, 5) AS type_prefix,
  concat(p_brand, '-', p_type) AS brand_type,
  length(p_name) AS name_len,
  instr(p_name, 'a') AS first_a
FROM part ORDER BY p_partkey""",

    "scalar_date" ->
      """SELECT o_orderkey,
  year(o_orderdate) AS y,
  month(o_orderdate) AS m,
  day(o_orderdate) AS d,
  dayofweek(o_orderdate) + 1 AS dow,
  strftime(o_orderdate, '%Y-%m') AS ym,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders ORDER BY o_orderkey""",

    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
  CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS price_round,
  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
  CAST(floor(sqrt(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS price_sqrt_micro,
  CAST(floor(ln(l_extendedprice) * 100 + 0.5) AS BIGINT) AS price_ln_centi,
  abs(l_quantity - 25) AS qty_dev
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber""",

    "json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val
FROM events ORDER BY event_id""",

    "case_when" ->
      """SELECT event_id,
  CASE WHEN value < 5 THEN 'low'
       WHEN value < 50 THEN 'mid'
       ELSE 'high' END AS bucket
FROM events ORDER BY event_id""",

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",

    "q5_multi_join" ->
      """SELECT n_name, count(*) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS rev_c4,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY n_name""",

    "range_frame_sum" ->
      """SELECT o_custkey, o_orderkey,
  count(*) OVER w AS n_trailing_30d,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS spend_cents_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey""",

    "skew_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1""",

    "skew_salted_join" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1""",

    "value_histogram" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS bucket, count(*) AS n,
  CAST(floor(min(value) * 100 + 0.5) AS BIGINT) AS min_centi,
  CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS max_centi
FROM events GROUP BY 1 ORDER BY 1"""
  )
}
