package graft

import graft.operators.Relational
import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

/** Specs for the whole-operator Catalyst extension (plans/TopKPerKey):
  * parity with the window spelling, WindowExec-free physical planning,
  * and partitioning-independence under a total order.
  */
class PlansSpec extends SparkSuite {

  private def customer = Tables.customer(spark, "/root/testdata/sf0.001")
    .select("c_mktsegment", "c_custkey", "c_acctbal")

  test("TopKPerKey matches the window row_number spelling row-for-row") {
    val native = TopKPerKey(customer, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val window = Relational.topKPerGroup(customer,
      partition = Seq(col("c_mktsegment")),
      order = Seq(col("c_acctbal").desc, col("c_custkey").asc), k = 3)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == window)
    assert(native.groupBy(_._1).forall(_._2.size == 3), "3 rows per segment")
  }

  test("TopKPerKey plans as the custom exec: no WindowExec, no full Sort") {
    val df = TopKPerKey(customer, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan.take(800))
    // two-phase: the map-side partial cut sits BELOW the exchange, so
    // shuffle volume is <= keys x k rows per map partition
    assert(plan.contains("TopKPerKeyPartial"), plan.take(800))
    assert(plan.indexOf("TopKPerKeyFinal") < plan.indexOf("Exchange"), plan.take(800))
    assert(plan.indexOf("Exchange") < plan.indexOf("TopKPerKeyPartial"), plan.take(800))
    assert(!plan.contains("Window"), "window operator must be gone:\n" + plan.take(800))
    assert(!plan.contains("Sort "), "no partition-wide sort:\n" + plan.take(800))
  }

  test("TopKPerKey is partitioning-independent under a total order") {
    val base = customer
    val a = TopKPerKey(base.repartition(17), Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = TopKPerKey(base.repartition(1), Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("TopKPerKey with k larger than any group returns every row") {
    val n = customer.count()
    val all = TopKPerKey(customer, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 100000)
    assert(all.count() == n)
  }
}
