package graft

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claims on the behaviors that only matter
  * at 100 TB: partition pruning through a date-partitioned layout, and
  * shuffle-free joins on co-bucketed tables.
  */
class ScaleBehaviorSpec extends SparkSuite {

  test("date-partitioned layout prunes partitions for time-range queries") {
    val tmp = tempDir("graft-scale")
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("date", to_date(col("ts")))
      .write.partitionBy("date").parquet(s"$tmp/events_by_day")

    val pruned = spark.read.parquet(s"$tmp/events_by_day")
      .filter(col("date") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter present, and only the one day's files are read
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-02"), plan.take(800))
    val allDays = spark.read.parquet(s"$tmp/events_by_day")
    assert(pruned.count() > 0 && pruned.count() < allDays.count())
    val scannedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    // force execution to populate metrics, then check one partition dir scanned
    pruned.count()
    scannedFiles.foreach(m => assert(m.value <= 2, s"scanned ${m.value} files"))
  }

  test("dynamic partition pruning: a dim filter prunes the fact's partitions at runtime") {
    val tmp = tempDir("graft-dpp")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.withColumn("date", to_date(col("ts")))
      .write.partitionBy("date").parquet(s"$tmp/fact")

    val fact = spark.read.parquet(s"$tmp/fact")
    // dim: one row per day with an attribute the query filters on —
    // the filter is NOT on the fact side, so static pruning can't see
    // it; only DPP can push the surviving dim keys into the fact scan
    val dim = fact.select("date").distinct()
      .withColumn("dow", dayofweek(col("date")))
    val joined = fact.join(dim.filter(col("dow") === 2), Seq("date"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n${plan.take(1200)}")

    // correctness parity with the fully-static equivalent
    val expected = events.withColumn("date", to_date(col("ts")))
      .filter(dayofweek(col("date")) === 2).count()
    assert(joined.count() == expected)
  }

  test("nanos range pushdown: raw bounds reach the scan, results stay exact") {
    // the rule targets the long-nanos ts layout specifically; the
    // driver's testdata has shipped three ts encodings across rounds,
    // so write our own nanos fixture rather than assume the current one
    val tmp = tempDir("graft-nanos")
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      .write.parquet(s"$tmp/events.parquet")
    val ev = Tables.events(spark, tmp)
    val lo = lit("2024-01-05 00:00:00").cast("timestamp")
    val hi = lit("2024-01-07 00:00:00").cast("timestamp")
    val filtered = ev.filter(col("ts") >= lo && col("ts") < hi)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThanOrEqual(ts,"),
      plan.take(1200))
    // exactness: equals a driver-side filter of the full collect
    val all = ev.select("ts").collect().map(_.getTimestamp(0))
    val loTs = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val hiTs = java.sql.Timestamp.valueOf("2024-01-07 00:00:00")
    val want = all.count(t => !t.before(loTs) && t.before(hiTs))
    assert(filtered.count() == want)
  }

  test("ntz time-range filter reaches PushedFilters (the current driver encoding)") {
    // VERDICT r10 item 7: the NanosRangePushdown rule is long-nanos-
    // specific by design; for the NTZ encoding the range must push
    // NATIVELY — i.e. type coercion must not wrap the scanned column
    // in a cast that hides it from the parquet source
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val filtered = ev.transform(graft.operators.ExtractOps.timeRange(
      "ts", "2024-01-05T00:00:00Z", "2024-01-07T00:00:00Z"))
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range bound did not reach the scan:\n${scan.take(1500)}")
    assert(filtered.count() > 0)
  }

  test("hash sampling is a pure scan-side filter: no exchange, no sort") {
    val plan = ext.Pipeline.hashSample(
      Tables.orders(spark, "/root/testdata/sf0.001"), "o_orderkey", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(!plan.contains("Sort"), plan.take(800))
  }

  test("q5 multi-join broadcasts every dimension (fact side never shuffles pre-agg)") {
    val plan = SparkEntry.queries("q5_multi_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts == 5, s"expected 5 broadcast joins, got $broadcasts\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("bloom prune filters the big side below the join") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val plan = ext.Pipeline.bloomPruneJoin(li, o, "l_orderkey", "o_orderkey", expectedItems = 10000)
      .queryExecution.executedPlan.toString
    // the bloom's might_contain probe must sit upstream of (textually
    // after, in tree print order) the join operator — pruning before
    // the shuffle; native expression, not a Scala UDF, so it rides
    // whole-stage codegen
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx, plan.take(1500))
    assert(!plan.contains("UDF"), plan.take(1500))
  }

  test("dedup_embedding is the ONLY registered query with an unbounded all-pairs join") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    // an equi conjunct keys the shuffle/broadcast hash join: one side's
    // attrs on the left, the other side's on the right (either order)
    def hasEquiKey(j: Join): Boolean =
      j.condition.toSeq.flatMap(conjuncts).exists {
        case eq @ (_: EqualTo | _: EqualNullSafe) =>
          val Seq(l, r) = eq.children
          (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet) ||
            l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)) &&
            l.references.nonEmpty && r.references.nonEmpty
        case _ => false
      }
    // all-pairs = a join with no equi key where BOTH sides are unbounded:
    // a side is bounded if it's a scalar aggregate (maxRows <= 1 — nDocs,
    // profile checks) or carries an explicit broadcast hint (the author
    // declaring it driver-small: ANN query sets, IVF centroids/probes)
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      plan.collect {
        case j: Join
            if !hasEquiKey(j) &&
              j.left.maxRows.forall(_ > 1) && j.right.maxRows.forall(_ > 1) &&
              !j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) &&
              !j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) => j
      }.nonEmpty
    }
    assert(offenders == Seq("dedup_embedding"),
      s"unbounded all-pairs joins outside the documented baseline: $offenders")
  }

  test("semdedup_full's within-cluster refine join is salted (BucketCap present in plan)") {
    // the cluster id is a legal equi key, so the all-pairs fence above
    // can't see a hot-cluster blowup — pin the cap explicitly: the
    // refine self-join must carry the `_salt` column among its keys
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = SparkEntry.queries("semdedup_full")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    val saltedJoins = plan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "_salt")) => j
    }
    assert(saltedJoins.nonEmpty,
      "semdedup_full's refine join lost its BucketCap salt — a hot cluster goes quadratic")
  }

  test("multimodal_image_neardup's chunk join is salted (flat images form one hot bucket)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = SparkEntry.queries("multimodal_image_neardup")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    val saltedJoins = plan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "_salt")) => j
    }
    assert(saltedJoins.nonEmpty,
      "image near-dup chunk join lost its BucketCap salt — monochrome images all " +
        "share fingerprint 0 and would go quadratic in one bucket")
  }

  test("audio and video near-dup ride the same salted banding core (salt present in plan)") {
    // both route through hammingNearDupPairsFromFps; this pins that a
    // future modality-specific fork doesn't drop the BucketCap salt
    // (identical fingerprints — silence-padded audio, still-frame
    // videos — form exactly the hot bucket the cap bounds)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    for (q <- Seq("multimodal_audio_neardup", "multimodal_video_neardup")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      val saltedJoins = plan.collect {
        case j: Join if j.condition.exists(_.references.exists(_.name == "_salt")) => j
      }
      assert(saltedJoins.nonEmpty, s"$q lost its BucketCap salt")
    }
  }

  test("no registered media query moves a binary column through any exchange") {
    // the multimodal design rule ("binary payloads never enter a
    // shuffle" — SCALE.md) as a physical-plan fence: payloads are
    // synthesized/decoded strictly AFTER any exchange (the id-feed
    // repartition carries 8-byte ids; fingerprint joins carry (id, fp)
    // rows), so no Exchange — shuffle or broadcast — may have a
    // BinaryType column in its input schema
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case _ => Nil
      })
      p +: kids.flatMap(nodes)
    }
    for (q <- SparkEntry.queries.keys.toSeq.sorted if q.startsWith("multimodal_")) {
      val exec = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      val offenders = nodes(exec).collect {
        case e: Exchange if e.child.output.exists(_.dataType == BinaryType) =>
          s"${e.nodeName}(${e.child.output.map(_.name).mkString(",")})"
      }
      assert(offenders.isEmpty, s"$q moves binary payloads through an exchange: $offenders")
    }
  }

  test("round-5 additions keep their claimed plan shapes") {
    val dir = "/root/testdata/sf0.001"

    // grouping sets: ONE Expand + aggregate pass, not three jobs
    val gs = graft.queries.RelationalQueries.queries("grouping_sets_agg")(spark, dir)
    val gsPlan = gs.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(gsPlan).size >= 1, gsPlan.take(500))
    assert(gsPlan.split("Scan parquet").length - 1 == 1,
      "grouping sets reads the scan once:\n" + gsPlan.take(1000))

    // hopping window: the 4x row replication happens in Expand/Generate
    // BEFORE one hash aggregate — no join, no window operator
    val hop = graft.queries.ReferenceQueries.queries("hopping_window_agg")(spark, dir)
    val hopPlan = hop.queryExecution.executedPlan.toString
    assert(!hopPlan.contains("Join"), hopPlan.take(500))
    assert(!hopPlan.contains("WindowExec"), hopPlan.take(500))

    // embedding_scale: the per-dimension stats come back as a
    // broadcast (dim-bounded), never a shuffle join on pos
    val es = graft.queries.SimilarityQueries.queries("embedding_scale")(spark, dir)
    val esPlan = es.queryExecution.executedPlan.toString
    assert(esPlan.contains("BroadcastHashJoin"), esPlan.take(800))

    // rolling stats: exactly one exchange — the entity-key shuffle the
    // window needs; no global (empty-partition) window anywhere
    val rs = graft.queries.AnalyticsQueries.queries("rolling_user_stats")(spark, dir)
    val rsPlan = rs.queryExecution.executedPlan.toString
    assert(rsPlan.contains("RangeFrame, -3600"), rsPlan.take(800))
    assert(!rsPlan.contains("SinglePartition"), rsPlan.take(1200))

    // funnel (round-6 rewrite): ONE scan of events and ZERO joins —
    // the per-step join chain that re-derived the prefix per step
    // (O(steps²) scans) is gone; the step walk is a row-local fold
    val fn = graft.queries.AnalyticsQueries.queries("funnel_steps")(spark, dir)
    val fnPlan = fn.queryExecution.executedPlan.toString
    assert(fnPlan.split("Scan parquet").length - 1 == 1,
      "funnel reads events exactly once:\n" + fnPlan.take(1000))
    assert(!fnPlan.contains("Join"), fnPlan.take(1000))

    // drift report: one scan per snapshot regardless of dimension
    // count (3 dims here) — the dims fan out row-locally, never as
    // per-dimension re-scans
    val dr = graft.queries.AnalyticsQueries.queries("drift_report")(spark, dir)
    val drPlan = dr.queryExecution.executedPlan.toString
    assert(drPlan.split("Scan parquet").length - 1 == 2,
      "drift report reads each snapshot exactly once:\n" + drPlan.take(1000))

    // hicard drift: NO totals window anywhere in the plan — a
    // dim-partitioned window would hold one dimension's entire value
    // set (a web-scale vocabulary) in a single partition. Both the
    // output rows and the broadcast totals read the PERSISTED count
    // table (InMemoryTableScan), so the corpus-sized explode runs once
    // per snapshot inside the cache build, never per consumer.
    val dh = graft.queries.AnalyticsQueries.queries("drift_report_hicard")(spark, dir)
    val dhPlan = dh.queryExecution.executedPlan.toString
    assert(!dhPlan.contains("Window"),
      "hicard drift must not use a window:\n" + dhPlan.take(1200))
    assert("InMemoryTableScan".r.findAllIn(dhPlan).size >= 2,
      "both consumers must read the cached count table:\n" + dhPlan.take(1200))
    graft.ext.Analytics.unpersistCaches()
  }

  test("eval-tier queries keep their claimed plan shapes") {
    val dir = "/root/testdata/sf0.001"

    // ndcg: the bounded ranked list broadcasts into BOTH label joins —
    // the corpus-scale labels table never sort-merge-joins
    val nd = graft.queries.EvalQueries.queries("ndcg_at_k")(spark, dir)
    val ndPlan = nd.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(ndPlan).size >= 2, ndPlan.take(1200))
    assert(!ndPlan.contains("SortMergeJoin"), ndPlan.take(1200))

    // wilson: one aggregate pass over one scan — no join, no window
    val wq = graft.queries.EvalQueries.queries("quality_wilson")(spark, dir)
    val wqPlan = wq.queryExecution.executedPlan.toString
    assert(wqPlan.split("Scan parquet").length - 1 == 1, wqPlan.take(800))
    assert(!wqPlan.contains("Join") && !wqPlan.contains("WindowExec"), wqPlan.take(800))

    // majority vote: the arg-max window runs AFTER the (key,label)
    // hash aggregate (partial agg below the exchange), never on raw rows
    val lm = graft.queries.EvalQueries.queries("label_majority")(spark, dir)
    val lmPlan = lm.queryExecution.executedPlan.toString
    assert(lmPlan.indexOf("HashAggregate") >= 0 &&
      lmPlan.indexOf("Window") < lmPlan.indexOf("HashAggregate"),
      "window (printed above) must consume the aggregate (printed below):\n" + lmPlan.take(1200))
    assert(!lmPlan.contains("SinglePartition"), lmPlan.take(1200))
  }

  test("co-bucketed tables sort-merge join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // default warehouse (./spark-warehouse, gitignored) — the
      // warehouse dir is a static conf and can't move per-test
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
        .select("o_orderkey", "o_totalprice")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // bucketed layout satisfies the join's distribution: no shuffle
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(joined.count() == li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
