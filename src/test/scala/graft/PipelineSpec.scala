package graft

import graft.ext.{Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hashSample is deterministic and close to the target rate") {
    val orders = Tables.orders(spark, sf)
    val a = Pipeline.hashSample(orders, "o_orderkey", 100).select("o_orderkey")
      .as[Long].collect().toSet
    val b = Pipeline.hashSample(orders, "o_orderkey", 100).select("o_orderkey")
      .as[Long].collect().toSet
    assert(a == b, "same rows on rerun")
    val n = orders.count().toDouble
    assert(math.abs(a.size / n - 0.1) < 0.03, s"rate ${a.size / n} near 10%")
    // monotone: widening the window keeps every previously sampled row
    val wider = Pipeline.hashSample(orders, "o_orderkey", 200).select("o_orderkey")
      .as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("stratifiedSample returns at most n per stratum, deterministically") {
    val docs = Tables.documents(spark, sf)
    val s1 = Pipeline.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val s2 = Pipeline.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 == s2)
    val perLang = s1.groupBy(_._1).view.mapValues(_.size)
    assert(perLang.values.forall(_ <= 5))
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(perLang.keySet == langs, "every stratum represented")
  }

  test("bloomPruneJoin equals the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val bloomed = Pipeline.bloomPruneJoin(li, o, "l_orderkey", "o_orderkey", expectedItems = 10000)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("connectedComponents labels chains, cliques, and singleton edges") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (edge)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("a", "b")
    val got = Pipeline.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents handles a long path (diameter > 1 round)") {
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Pipeline.connectedComponents(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (1L to 12L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("connectedComponents matches union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val edgeGen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
      if edges.nonEmpty
    } yield edges

    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }

    val prop = Prop.forAll(edgeGen) { edges =>
      val df = edges.toDF("a", "b")
      val got = Pipeline.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      got == unionFind(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("weightedSample: per-stratum rates, monotone subsets, no exchange") {
    val docs = Tables.documents(spark, sf)
    val rates = Map("en" -> 500, "zh" -> 300, "fr" -> 150)
    val got = Pipeline.weightedSample(docs, "lang", "doc_id", rates, defaultPermille = 50)
    // rate per stratum lands near the target (hash-uniform; generous tolerance)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- totals) {
      val want = rates.getOrElse(lang, 50) / 1000.0
      val have = byLang.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(have - want) < 0.15, s"$lang: $have vs $want")
    }
    // monotone: halving every rate selects a subset
    val half = Pipeline.weightedSample(docs, "lang", "doc_id",
      rates.map { case (k, v) => k -> v / 2 }, defaultPermille = 25)
      .select("doc_id").as[Long].collect().toSet
    val full = got.select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(full))
    // scan-side predicate: no shuffle in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("connectedComponents reliable-checkpoint mode agrees with localCheckpoint") {
    val dir = tempDir("cc_ckpt")
    val pairs = ((1L until 12L).map(i => (i, i + 1)) ++ Seq((20L, 21L))).toDF("a", "b")
    val reliable = Pipeline.connectedComponents(pairs, "a", "b", checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    val local = Pipeline.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    // the reliable path actually wrote checkpoint data to the shared dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, s"no checkpoint files under $dir")
  }

  test("approx profile mode bounds relative error vs the exact profile") {
    val o = Tables.orders(spark, sf)
    val exact = Pipeline.profile(o).collect()(0)
    val approx = Pipeline.profile(o, approxDistinct = true).collect()(0)
    for (c <- o.columns) {
      val e = exact.getAs[Long](s"distinct_$c").toDouble
      val a = approx.getAs[Long](s"distinct_$c").toDouble
      assert(math.abs(a - e) / e < 0.05, s"$c: approx $a vs exact $e")
      assert(exact.getAs[Long](s"null_$c") == approx.getAs[Long](s"null_$c"))
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val row = ev.agg(
      approx_count_distinct(col("user_id")).as("a"),
      countDistinct(col("user_id")).as("e")).collect()(0)
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
  }

  test("percentile_approx within 2% rank error of exact") {
    val o = Tables.orders(spark, sf)
    val approx = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)))
      .collect()(0).getDouble(0)
    val n = o.count()
    val below = o.filter(col("o_totalprice") <= approx).count().toDouble
    assert(math.abs(below / n - 0.5) < 0.02, s"rank of approx median ${below / n}")
  }

  test("piiScrub counts and redacts all three pattern families") {
    val df = Seq(
      (1L, "contact me at bob@example.com or https://x.io/path today"),
      (2L, "account 123456 and pin 42"),
      (3L, "clean text only")
    ).toDF("id", "t")
    val got = TextAnalysis.piiScrub(df, "id", "t")
      .orderBy("id")
      .select("n_emails", "n_urls", "n_digit_runs", "redacted_len")
      .as[(Int, Int, Int, Int)].collect()
    assert(got(0) == ((1, 1, 0, "contact me at <EMAIL> or <URL> today".length)))
    assert(got(1) == ((0, 0, 2, "account <NUM> and pin <NUM>".length)))
    assert(got(2) == ((0, 0, 0, "clean text only".length)))
  }

  test("repetitionRatio flags duplicated words and shingles") {
    val df = Seq(
      (1L, "a b a b a b"),   // 6 words, 2 uniq; 4 shingles ("a b a","b a b","a b a","b a b") 2 uniq
      (2L, "x y z")          // no repetition, 1 shingle
    ).toDF("id", "t")
    val got = TextAnalysis.repetitionRatio(df, "id", "t").orderBy("id")
      .select("n_words", "uniq_words", "dup_word_ratio", "n_shingles", "dup_shingle_ratio")
      .as[(Int, Int, Double, Int, Double)].collect()
    assert(got(0) == ((6, 2, 4.0 / 6, 4, 0.5)))
    assert(got(1) == ((3, 3, 0.0, 1, 0.0)))
  }

  test("tfIdfTopTerms ranks rarer terms above common ones") {
    val df = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common other")
    ).toDF("id", "t")
    val got = TextAnalysis.tfIdfTopTerms(df, "id", "t", k = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    // "common" appears in every doc (df=3); each rare term in one (df=1)
    assert(got == Map(1L -> "rare1", 2L -> "rare2", 3L -> "other"))
  }

  test("count-min estimates overcount only; a wide sketch is exact") {
    import graft.ext.CountMin
    val toks = (Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"))
      .toDF("token")
    val truth = toks.groupBy("token").agg(count(lit(1)).as("true_count"))

    // cramped sketch: collisions allowed, but never an undercount
    val narrow = CountMin.estimate(
      CountMin.sketch(toks, "token", depth = 2, width = 4),
      truth, "token", depth = 2, width = 4)
      .select("token", "true_count", "est_count")
      .as[(String, Long, Long)].collect()
    assert(narrow.length == 3)
    narrow.foreach { case (t, tc, est) => assert(est >= tc, s"$t undercounted") }

    // ample width: no collisions, exact counts
    val wide = CountMin.estimate(
      CountMin.sketch(toks, "token", width = 1024),
      truth, "token", width = 1024)
      .select("token", "true_count", "est_count")
      .as[(String, Long, Long)].collect()
    wide.foreach { case (t, tc, est) => assert(est == tc, s"$t: $est != $tc") }
  }

  test("packSequences start offsets are the exact token prefix sums") {
    import graft.ext.Pipeline
    val docs = (0L until 100L).map(id => (id, (id % 7) + 1)).toDF("doc_id", "n")
    // blockSize 16 forces multiple blocks, exercising the two-phase
    // prefix sum's block rollup and not just the within-block window
    val got = Pipeline.packSequences(docs, "doc_id", "n", seqLen = 10L, blockSize = 16L)
      .orderBy("doc_id")
      .select("doc_id", "n", "start_offset", "bin", "bin_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    val tokens = (0L until 100L).map(id => (id % 7) + 1)
    val prefix = tokens.scanLeft(0L)(_ + _).init
    got.zipWithIndex.foreach { case ((id, n, start, bin, off), i) =>
      assert(id == i && n == tokens(i))
      assert(start == prefix(i), s"doc $id start $start != ${prefix(i)}")
      assert(bin == prefix(i) / 10 && off == prefix(i) % 10)
    }
  }

  test("datasetSplit is exhaustive, stable under subsetting, and never moves rows") {
    import graft.ext.Pipeline
    val docs = Tables.documents(spark, sf).select("doc_id")
    val split = Pipeline.datasetSplit(docs, "doc_id", valPermille = 100, testPermille = 100)
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts.values.sum == docs.count())
    // assignment is a pure function of the key: a subset corpus (e.g.
    // an earlier snapshot) assigns every shared doc identically
    val subset = Pipeline.datasetSplit(
      docs.filter(col("doc_id") < 100), "doc_id", valPermille = 100, testPermille = 100)
      .as[(Long, String)].collect().toMap
    val full = split.filter(col("doc_id") < 100).as[(Long, String)].collect().toMap
    assert(subset == full)
  }

  test("tokenBudgetSample: budget respected, every stratum kept, monotone in budget") {
    val docs = (0 until 60).map(i => (i.toLong, s"s${i % 3}", 100L)).toDF("doc_id", "stratum", "toks")
    val kept = Pipeline.tokenBudgetSample(docs, "stratum", "doc_id", "toks", 350L)
      .select("doc_id", "stratum", "tokens_before")
      .as[(Long, String, Long)].collect()
    // 100-token docs against a 350 budget => exactly 4 kept per stratum
    // (tokens_before 0,100,200,300), independent of which ids hash first
    kept.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.length == 4, s"stratum $s keeps ceil(350/100)=4 docs: ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == Seq(0L, 100L, 200L, 300L))
    }
    // monotone: halving the budget yields a strict subset
    val small = Pipeline.tokenBudgetSample(docs, "stratum", "doc_id", "toks", 150L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(kept.map(_._1).toSet), "lower budget is a subset")
    assert(small.size == 6, "2 docs per stratum at budget 150")
  }

  test("seriesGaps reports exactly the over-threshold spacings per series") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-01-01 00:00:10")),
      ("a", ts("2024-01-01 00:01:00")), // 50s gap
      ("b", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-01 00:02:00")) // 120s gap
    ).toDF("series", "t")
    val out = Pipeline.seriesGaps(df, "series", "t", maxGapMicros = 30L * 1000000L)
      .select("series", "gap_micros").as[(String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 50000000L), ("b", 120000000L)))
  }

  test("fkAudit counts orphans and childless parents exactly") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk") // 99 orphaned
    val parent = Seq((10L, "x"), (20L, "y")).toDF("pk", "attr")       // 20 childless
    val r = Pipeline.fkAudit(child, parent, "fk", "pk").first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 2L, 1L)))
  }

  test("zscoreOutliers flags only the cross-multiplied 3-sigma violations") {
    // 10 values of 100 and one of 1000: the 1000 is the only outlier
    val df = ((1L to 10L).map(i => (i, "g", 100L)) :+ ((11L, "g", 1000L)))
      .toDF("id", "grp", "v")
    val out = Pipeline.zscoreOutliers(df, "grp", "v", z = 3)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(11L), s"only the far point flagged: $out")
    // and a tight cluster flags nothing
    val none = Pipeline.zscoreOutliers(
      (1L to 10L).map(i => (i, "g", 100L + (i % 3))).toDF("id", "grp", "v"),
      "grp", "v", z = 3).count()
    assert(none == 0L)
  }

  test("kAnonSuppress drops exactly the under-k quasi-identifier groups") {
    val rows = Seq.tabulate(10)(i => (i.toLong, "big", "d1")) ++
      Seq((100L, "small", "d1"), (101L, "small", "d1")) ++
      Seq((200L, "big", "d2"))
    val df = rows.toDF("id", "qa", "qb")
    val out = Pipeline.kAnonSuppress(df, Seq("qa", "qb"), k = 3)
      .select("id", "group_size").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 10L).toSeq, "only the size-10 group survives")
    assert(out.forall(_._2 == 10L), "group_size is the quasi-group count")
  }

  test("keepBestPerCluster: one keep per cluster, best quality wins, ties to min id") {
    val docs = Seq(
      (1L, 50L), (2L, 90L), (3L, 90L), // cluster 1: 3 beats 2? no — 2 and 3 tie at 90, min id 2 wins
      (4L, 10L),                       // singleton
      (5L, 70L), (6L, 80L)             // cluster 5: 6 wins on quality
    ).toDF("doc_id", "quality")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "cluster_id")
    val out = Pipeline.keepBestPerCluster(docs, labels, "doc_id", "quality")
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq ==
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(2L, 4L, 6L),
      "kept: tie->min id (2), singleton (4), quality winner (6)")
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"exactly one keep in cluster $c")
    }
  }

  test("count-min never undercounts on random multisets (property)") {
    import graft.ext.CountMin
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tokenGen = Gen.listOfN(60,
      Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "g1", "g2", "h!", "i?"))
    val prop = Prop.forAll(tokenGen) { words =>
      val toks = words.toDF("token")
      val truth = toks.groupBy("token").agg(count(lit(1)).as("true_count"))
      val est = CountMin.estimate(
        CountMin.sketch(toks, "token", depth = 3, width = 8),
        truth, "token", depth = 3, width = 8)
        .select("token", "true_count", "est_count")
        .as[(String, Long, Long)].collect()
      est.length == words.distinct.length &&
        est.forall { case (_, tc, e) => e >= tc }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("robustScale: discrete median/MAD, outliers can't drag the center") {
    // 9 values 10..18 plus one wild outlier; median must stay mid-pack
    // (z-score's mean would move ~1000 units; the median moves 0)
    val vals = (10L to 18L) :+ 10000L
    val df = vals.map(v => ("g", v)).toDF("grp", "v")
    val out = Pipeline.robustScale(df, "grp", "v")
      .select("v", "med", "mad", "robust_e4")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // n=10 → median rank ceil(5000/1000)=5 → value 14
    assert(out.forall(_._2 == 14L), s"median: ${out.head._2}")
    // absdevs sorted: 0,1,1,2,2,3,3,4,4,9986 → rank 5 → 2
    assert(out.forall(_._3 == 2L), s"mad: ${out.head._3}")
    // v=14 → 0; v=16 → (2/2)*1e4 = 10000; outlier huge but finite
    val byV = out.map(r => r._1 -> r._4).toMap
    assert(byV(14L) == 0L && byV(16L) == 10000L && byV(12L) == -10000L)
    assert(byV(10000L) == (10000L - 14L) * 10000L / 2L)
  }

  test("winsorize clips to exact discrete percentile bounds; tiny groups degrade sanely") {
    // group g: values 1..100 → p10 rank ceil(0.10*100)=10 → lo=10;
    // p90 rank ceil(0.90*100)=90 → hi=90
    val g = (1L to 100L).map(v => ("g", v))
    val tiny = Seq(("t", 7L)) // n=1: both ranks pick the only row
    val df = (g ++ tiny).toDF("grp", "v")
    val out = Pipeline.winsorize(df, "grp", "v", loPermille = 100, hiPermille = 900)
      .select("grp", "v", "lo_bound", "hi_bound", "clipped")
      .as[(String, Long, Long, Long, Long)].collect()

    val gRows = out.filter(_._1 == "g")
    assert(gRows.forall(r => r._3 == 10L && r._4 == 90L), "exact rank-picked bounds")
    assert(gRows.filter(_._2 < 10).forall(_._5 == 10L), "low tail clipped up")
    assert(gRows.filter(_._2 > 90).forall(_._5 == 90L), "high tail clipped down")
    assert(gRows.filter(r => r._2 >= 10 && r._2 <= 90).forall(r => r._5 == r._2), "band untouched")

    val t = out.filter(_._1 == "t").head
    assert(t._3 == 7L && t._4 == 7L && t._5 == 7L, "singleton group is its own band")
  }

  test("deterministicShuffle is a dense, rerun-stable, partitioning-independent permutation") {
    val df = (0L until 257L).map(i => (i, s"d$i")).toDF("id", "payload")
    val once = Pipeline.deterministicShuffle(df, "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // dense 0..n-1
    assert(once.values.toSeq.sorted == (0L until 257L).toSeq)
    // independent of input partitioning (the rank is a pure function of the key set)
    val repart = Pipeline.deterministicShuffle(df.repartition(7), "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(repart == once)
    // and it is NOT the identity order (it actually shuffles)
    assert((0L until 257L).count(i => once(i) == i) < 20)
  }

  test("equiDepthBins: rank-exact deciles, sizes within one, monotone boundaries") {
    // 103 rows, values with heavy ties, ids unique — bin must follow
    // global (value, id) rank regardless of the coarse block layout
    val rows = (0L until 103L).map(i => (i, (i * 7919 % 13) * 100))
    val df = rows.toDF("id", "v")
    val out = Pipeline.equiDepthBins(df, "v", "id", nBins = 10, blockWidth = 300L)
      .select("id", "v", "bin").as[(Long, Long, Long)].collect()

    // reference: bin = ((rank-1)*10) div n over (v, id) order
    val expected = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), r) => id -> (r.toLong * 10L) / 103L }.toMap
    out.foreach { case (id, _, bin) => assert(bin == expected(id), s"id=$id") }

    val sizes = out.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"equi-depth: $sizes")
    // boundaries: max(value in bin k) <= min(value in bin k+1)
    val byBin = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    (0L until 9L).foreach { b =>
      assert(byBin(b).max <= byBin(b + 1).min, s"monotone at $b")
    }
  }

  test("dedupSummary: cluster-size histogram with keep-one removable counts") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L),          // chain -> cluster of 3
        Row(10L, 11L), Row(20L, 21L))),    // two clusters of 2
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
    val out = Pipeline.dedupSummary(pairs, "doc_a", "doc_b")
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 2L, 4L, 2L), (3L, 1L, 3L, 2L)))
  }

  test("mixturePlan: integer plan math, saturation at 1000 permille, under-supply visible") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("en", 1000L), Row("en", 1000L),   // available 2000
        Row("zh", 100L),                      // available 100 — under-supplied
        Row("misc", 500L))),
      StructType(Seq(StructField("lang", StringType), StructField("toks", LongType))))
    val out = Pipeline.mixturePlan(df, "lang", "toks", targetTokens = 1000L,
      Map("en" -> 6000, "zh" -> 3000), defaultBp = 1000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // en: desired 600 of 2000 -> 300 permille, expected 600 exactly
    assert(out("en") == (2000L, 6000L, 600L, 300L, 600L))
    // zh: desired 300 but only 100 available -> saturates, expected < desired
    assert(out("zh") == (100L, 3000L, 300L, 1000L, 100L))
    // misc: default weight 10% -> desired 100 of 500 -> 200 permille
    assert(out("misc") == (500L, 1000L, 100L, 200L, 100L))
  }

  test("skewReport: counts/shares exact, cum monotone, top-N via TakeOrdered not global sort") {
    val ev = Tables.events(spark, sf)
    val rep = Pipeline.skewReport(ev, "user_id", topN = 5)
    val rows = rep.orderBy("rank").collect()
    assert(rows.length == 5)
    val total = ev.count()
    val truth = ev.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, c) => (-c, id) }.take(5)
    rows.zip(truth).zipWithIndex.foreach { case ((r, (id, c)), i) =>
      assert(r.getLong(0) == id && r.getLong(1) == c, s"row $i")
      assert(r.getLong(3) == c * 10000L / total, s"share row $i")
    }
    val cums = rows.map(_.getLong(4))
    assert(cums.sorted.sameElements(cums), "cum_bp monotone")
    assert(cums.last == truth.map(_._2).sum * 10000L / total)
    // scale shape: the top-N must come from a K-bounded TakeOrdered,
    // and the rank/cum windows must keep a partition spec (no
    // single-partition WindowExec warning path)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan.take(600))
    assert(plan.contains("pmod(cnt"),
      "bounded partition key must survive optimization:\n" + plan.take(600))
  }
}
