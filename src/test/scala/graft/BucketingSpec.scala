package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("same-key bucketed tables join with zero Exchange and match the shuffled join") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", "k", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "k", 8)

    // disable broadcast so the test exercises the co-located
    // sort-merge path a 100 TB fact-fact join would take
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")

      val shuffled = li.join(ord, "k")
      assert(j.count() == shuffled.count())
      // spot-check content equality, not just cardinality
      val a = j.groupBy("k").agg(sum("l_quantity").as("q")).orderBy("k").limit(20).collect()
      val b = shuffled.groupBy("k").agg(sum("l_quantity").as("q")).orderBy("k").limit(20).collect()
      assert(a.sameElements(b))
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = spark.table("li_bucketed").groupBy("k").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n${plan.take(1500)}")
    }
  }
}
