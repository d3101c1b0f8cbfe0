package graft.queries

import graft.Tables
import graft.ext.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analysis suite. The bipartite customer–supplier trade graph is
  * derived from orders ⨝ lineitem (node ids are namespaced by parity:
  * customer k → 2k, supplier k → 2k+1). `pagerank` runs on the
  * symmetrized graph (no sinks — dangling share is provably zero);
  * `pagerank_dangling` runs on the DIRECTED customer→supplier graph,
  * where every supplier is a sink, exercising the dangling-mass
  * redistribution. The DuckDB oracles unroll the fixed 3-iteration
  * loop as chained CTEs — integer-micro arithmetic makes the replay
  * bit-exact (early stop only fires at an exact integer fixpoint, so
  * an unrolled replay of ≥ the executed rounds is always identical).
  */
object GraphQueries extends QueryGroup {

  private val Iters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fixed-iteration integer PageRank over the symmetrized trade
    // graph; top-30 nodes. Per-round: one shuffle of O(|E|)
    // contributions — the Pregel shape that holds at 10^9 edges.
    "pagerank" -> ((s, dir) => {
      val eb = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      // symmetrize in ONE pass over eb: the union-of-two-selects form
      // ran the join+distinct once per branch (same row multiset — the
      // two orientations are disjoint by the parity namespacing)
      val edges = eb.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      Graph.pageRank(edges, "src", "dst", Iters)
        .orderBy(col("pr_micro").desc, col("node").asc)
        .limit(30)
    }),

    // Directed customer→supplier graph: suppliers have no out-arcs, so
    // each round redistributes their whole rank uniformly (D div N)
    // before damping — the sink treatment a real link graph needs.
    "pagerank_dangling" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      Graph.pageRank(edges, "src", "dst", Iters)
        .orderBy(col("pr_micro").desc, col("node").asc)
        .limit(30)
    })
  )

  /** One unrolled PR round: ranks `prev` → ranks over (e, d). */
  private def roundSql(prev: String, out: String): String =
    s"""$out AS (
  SELECT e.dst AS node,
         CAST(150000 + (850 * sum($prev.pr_micro // d.deg)) // 1000 AS BIGINT) AS pr_micro
  FROM e JOIN d ON e.src = d.src JOIN $prev ON $prev.node = e.src
  GROUP BY e.dst)"""

  /** One unrolled dangling-aware round over (e, base, N): every node
    * gets `coalesce(in-edge sum, 0)` plus the round's dangling share
    * `D // N`, then the damping step — exactly Graph.pageRank's
    * integer arithmetic. */
  private def danglingRoundSql(prev: String, out: String): String =
    s"""$out AS (
  SELECT b.node,
         CAST(150000 + (850 * (COALESCE(c.in_sum, 0)
           + ((SELECT COALESCE(sum(p.pr_micro), 0) FROM $prev p
               JOIN base bd ON p.node = bd.node WHERE bd.deg = 0)
              // (SELECT n FROM nn)))) // 1000 AS BIGINT) AS pr_micro
  FROM base b LEFT JOIN (
    SELECT e.dst, sum(p.pr_micro // bc.deg) AS in_sum
    FROM e JOIN base bc ON e.src = bc.node JOIN $prev p ON p.node = e.src
    GROUP BY e.dst) c ON c.dst = b.node)"""

  val oracleSql: Map[String, String] = Map(
    "pagerank" -> {
      val rounds = (1 to Iters).map(i => roundSql(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr_micro FROM d),
$rounds
SELECT node, pr_micro FROM r$Iters
ORDER BY pr_micro DESC, node ASC LIMIT 30"""
    },

    "pagerank_dangling" -> {
      val rounds = (1 to Iters).map(i => danglingRoundSql(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
dd AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
base AS (SELECT n.node, COALESCE(dd.deg, 0) AS deg
         FROM nodes n LEFT JOIN dd USING (node)),
nn AS (SELECT count(*) AS n FROM base),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr_micro FROM base),
$rounds
SELECT node, pr_micro FROM r$Iters
ORDER BY pr_micro DESC, node ASC LIMIT 30"""
    }
  )
}
