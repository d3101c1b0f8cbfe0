package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  /** Encoding-agnostic epoch millis: the driver's parquet has shipped
    * `ts` as long-nanos, TIMESTAMP and TIMESTAMP_NTZ across rounds, and
    * Row.getTimestamp ClassCastExceptions on the NTZ → LocalDateTime
    * mapping. Accept either JVM representation.
    */
  private def epochMs(v: Any): Long = v match {
    case t: java.sql.Timestamp      => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case other => fail(s"unexpected timestamp representation: ${other.getClass}")
  }

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

  test("inverted index: a term-bucketed posting table serves df with zero Exchange") {
    // The standing-search layout the BM25 scaladoc points at: tokenize
    // ONCE into a (doc_id, term, tf, dl) posting table bucketed by
    // term; every term-keyed aggregate/join downstream reads the
    // buckets as its distribution.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val postings = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    Bucketing.writeBucketed(postings, "postings_bucketed", "term", 8)

    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      // document frequency — the posting-list aggregate an index serves
      val dfAgg = spark.table("postings_bucketed").groupBy("term")
        .agg(count(lit(1)).as("df"))
      val plan = dfAgg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"df over the bucketed index must not shuffle:\n${plan.take(1500)}")

      // parity: the index is a lossless re-layout of tokenization
      val direct = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(countDistinct("doc_id").as("df"))
      val viaIndex = dfAgg.orderBy("term").collect().map(r => r.getString(0) -> r.getLong(1))
      val viaDirect = direct.orderBy("term").collect().map(r => r.getString(0) -> r.getLong(1))
      assert(viaIndex.sameElements(viaDirect), "index df == direct df")
    }
  }

  test("snapshotDiff over same-key bucketed snapshots plans with zero Exchange") {
    // the nightly-reconciliation layout: both full dumps land bucketed
    // on the key, so the full-outer diff join is a map-side merge
    val o = Tables.orders(spark, "/root/testdata/sf0.001").select(
      col("o_orderkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val oldSnap = o.filter(col("o_orderkey") % 50 =!= 3)
    val newSnap = o.withColumn("cents",
      when(col("o_orderkey") % 11 === 0, col("cents") + 777).otherwise(col("cents")))
    Bucketing.writeBucketed(oldSnap, "snap_old", "o_orderkey", 8)
    Bucketing.writeBucketed(newSnap, "snap_new", "o_orderkey", 8)

    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val diff = graft.ext.Warehouse.snapshotDiff(
        spark.table("snap_old"), spark.table("snap_new"), "o_orderkey", Seq("cents"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must not shuffle:\n${plan.take(1500)}")
      // parity with the shuffled path
      val direct = graft.ext.Warehouse.snapshotDiff(oldSnap, newSnap, "o_orderkey", Seq("cents"))
      assert(diff.count() == direct.count())
      assert(diff.filter(col("change_type") === "added").count() ==
        direct.filter(col("change_type") === "added").count())
    }
  }

  test("writeRangeSorted: disjoint per-file key ranges that prune range scans") {
    val tmp = tempDir("graft-rangesort")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "value")
    Bucketing.writeRangeSorted(events, s"$tmp/by_ts", Seq("ts"), files = 8)

    // one parquet file per range partition, ranges pairwise disjoint
    val files = new java.io.File(s"$tmp/by_ts").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 8, s"${files.length} files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ts"), max("ts")).head()
      (epochMs(r.get(0)), epochMs(r.get(1)))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin, s"file ranges overlap: $aMax > $bMin")
    }

    // footer min/max stats prune a narrow time-range scan to few files
    val narrow = spark.read.parquet(s"$tmp/by_ts")
      .filter(col("ts") >= "2024-01-05 00:00:00" && col("ts") < "2024-01-06 00:00:00")
    narrow.count()
    val scanned = narrow.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    // row-group stats prune at read: a one-day slice of a month touches
    // a small minority of the 8 range files
    assert(narrow.count() > 0)
    scanned.foreach(m => assert(m.value < 8, s"scanned ${m.value} of 8 files"))
  }

  test("compactFiles: fragmented table rewritten to size-targeted files, rows identical") {
    val tmp = tempDir("graft-compact")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "value")
    // simulate a micro-batch sink: 64 tiny files
    events.repartition(64).write.parquet(s"$tmp/frag")
    val fragFiles = new java.io.File(s"$tmp/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 64, s"$fragFiles fragment files")
    val fragBytes = new java.io.File(s"$tmp/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

    // target ~quarter of the input per file -> ceil gives a small count
    val target = fragBytes / 4
    val n = Bucketing.compactFiles(spark, s"$tmp/frag", s"$tmp/compact", target)
    val outFiles = new java.io.File(s"$tmp/compact").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n == outFiles, s"returned $n, wrote $outFiles")
    assert(outFiles < 10, s"$outFiles files after compaction")

    // content identical (same multiset of rows)
    val a = spark.read.parquet(s"$tmp/frag").orderBy("event_id").collect().toSeq
    val b = spark.read.parquet(s"$tmp/compact").orderBy("event_id").collect().toSeq
    assert(a == b, "compaction changed the data")

    // sorted variant restores range clustering during the rewrite
    val n2 = Bucketing.compactFiles(spark, s"$tmp/frag", s"$tmp/compact_sorted", target, Seq("ts"))
    val sortedFiles = new java.io.File(s"$tmp/compact_sorted").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(sortedFiles.length == n2)
    if (sortedFiles.length > 1) {
      val ranges = sortedFiles.map { f =>
        val r = spark.read.parquet(f).agg(min("ts"), max("ts")).head()
        (epochMs(r.get(0)), epochMs(r.get(1)))
      }.sortBy(_._1)
      ranges.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"compacted file ranges overlap: $aMax > $bMin")
      }
    }
  }
}
