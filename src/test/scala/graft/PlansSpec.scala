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

  test("stratifiedSample rides TopKPerKey: WindowExec-free with the map-side partial cut") {
    val plan = graft.ext.Pipeline
      .stratifiedSample(customer, "c_mktsegment", "c_custkey", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      plan.take(800))
    assert(!plan.contains("Window"), "window operator must be gone:\n" + plan.take(800))
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

  test("TopKPerKey null keys and null order values match the window spelling") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // null key forms its own group (like PARTITION BY); null order
    // values sort NULLS LAST under desc — both defaults shared with
    // the col.desc window spelling
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 1L, java.lang.Double.valueOf(5.0)),
        Row("a", 2L, null),
        Row("a", 3L, java.lang.Double.valueOf(7.0)),
        Row("a", 4L, java.lang.Double.valueOf(6.0)),
        Row(null, 5L, java.lang.Double.valueOf(1.0)),
        Row(null, 6L, null))),
      StructType(Seq(StructField("seg", StringType), StructField("id", LongType),
        StructField("bal", DoubleType))))
    val native = TopKPerKey(df, Seq("seg"), Seq("bal" -> true, "id" -> false), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val window = Relational.topKPerGroup(df,
      partition = Seq(col("seg")),
      order = Seq(col("bal").desc, col("id").asc), k = 2)
      .select("seg", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native == window, s"native=$native window=$window")
    assert(native == Set(("a", 3L), ("a", 4L), (null, 5L), (null, 6L)))
  }

  test("TopKPerKey with k larger than any group returns every row") {
    val n = customer.count()
    val all = TopKPerKey(customer, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 100000)
    assert(all.count() == n)
  }

  test("partial pass bounds its map on near-distinct keys (flush-and-restart)") {
    // c_custkey is unique: every row is its own key, the worst case for
    // the partial map. With a tiny cap the partial pass must flush (the
    // metric proves the map never exceeded the cap) and the final answer
    // must be IDENTICAL — early emission only costs shuffle volume.
    import graft.plans.TopKPerKeyExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps materialized shuffle stages in QueryStageExec, a LEAF
    // node — the partial exec lives inside the stage's `plan` field, so a
    // plain collect over the adaptive plan never sees it; recurse into
    // stages explicitly
    def partialFlushes(df: org.apache.spark.sql.DataFrame): Long = {
      def walk(p: SparkPlan): Long = {
        val here = p.collect {
          case e: TopKPerKeyExec if e.partial => e.metrics("partialFlushes").value
        }.sum
        val staged = p.collect { case q: QueryStageExec => q }.map(q => walk(q.plan)).sum
        here + staged
      }
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case p => walk(p)
      }
    }
    // fixed map-side partition count: the flush count depends on rows per
    // map partition, which local[*] would otherwise tie to the box's cores
    val input = customer.repartition(4)
    val uncapped = TopKPerKey(input, Seq("c_custkey"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    withSQLConf("spark.graft.topk.partialMaxKeys" -> "4") {
      val df = TopKPerKey(input, Seq("c_custkey"),
        Seq("c_acctbal" -> true, "c_custkey" -> false), k = 1)
      val capped = df.collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(capped == uncapped)
      // ~150 unique keys over 4 fixed map partitions with a 4-key cap —
      // the bounded map must have flushed; capped==uncapped above already
      // proves correctness, the metric proves the cap engaged
      val flushes = partialFlushes(df)
      assert(flushes > 0, s"expected flushes under a 4-key cap, got $flushes")
    }
    // sanity: grouped keys under the default cap never flush
    val grouped = TopKPerKey(customer, Seq("c_mktsegment"),
      Seq("c_acctbal" -> true, "c_custkey" -> false), k = 3)
    grouped.collect()
    assert(partialFlushes(grouped) == 0,
      "default cap must not flush on 5 segments")
  }

  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("ANN brute re-rank rides TopKPerKey: heap cut, rank over the cut, one hash exchange") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.ext.Similarity
      .bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      plan.take(1200))
    // the rank window consumes the final pass's clustered distribution
    // directly — the candidate set crosses exactly one hash exchange,
    // already cut to <=k rows per query by the map-side partial
    assert(hashExchanges(plan) == 1, plan.take(1200))
    // parity with the window-only spelling, rank column included
    val q = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val ref = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(graft.functions.VectorOps.cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
    assert(out.collect().map(_.toSeq).toSet == ref.collect().map(_.toSeq).toSet)
  }

  test("keepBestPerCluster picks winners via TopKPerKey: window-free, window-identical") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chars")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 3L))
      .toDF("node", "cluster_id")
    val out = graft.ext.Pipeline.keepBestPerCluster(docs, labels, "doc_id", "n_chars")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan.take(1200))
    assert(!plan.contains("Window"),
      "representative pick must not sort-buffer clusters:\n" + plan.take(1200))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ref = docs
      .join(labels.select(col("node"), col("cluster_id").as("__cid")),
        col("doc_id") === col("node"), "left")
      .withColumn("cluster_id", coalesce(col("__cid"), col("doc_id")))
      .drop("node", "__cid")
      .withColumn("keep", row_number().over(w) === 1)
    assert(out.select("doc_id", "cluster_id", "keep").collect().map(_.toSeq).toSet ==
      ref.select("doc_id", "cluster_id", "keep").collect().map(_.toSeq).toSet)
  }

  test("window row_number spelling auto-rewrites to the native top-k operator") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    def spelled = customer.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = spelled.queryExecution.executedPlan.toString
    // Spark's InferWindowGroupLimit proves the pattern; the rewrite
    // swaps its sort-based node for the heap-based native pair
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      plan.take(1200))
    assert(!plan.contains("WindowGroupLimit"), plan.take(1200))
    // rank() keeps >k rows on ties — must NOT rewrite
    val ranked = customer.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(ranked.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank() group limit must stay on Spark's exec")
    // kill switch restores Spark's plan
    withSQLConf("spark.graft.topk.rewriteWindow" -> "false") {
      assert(!spelled.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val off = spelled.collect().map(_.toSeq).toSet
      withSQLConf("spark.graft.topk.rewriteWindow" -> "true") {
        assert(spelled.collect().map(_.toSeq).toSet == off,
          "rewritten output must be bit-identical under a total order")
      }
    }
  }

  test("domainCap rides TopKPerKey: hot domains heap-capped before the exchange") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "n_chars")
    val out = graft.ext.Pipeline.domainCap(docs, "source", "n_chars", "doc_id", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      plan.take(1200))
    assert(hashExchanges(plan) == 1, plan.take(1200))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ref = docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= 5)
    assert(out.collect().map(_.toSeq).toSet == ref.collect().map(_.toSeq).toSet)
  }
}
