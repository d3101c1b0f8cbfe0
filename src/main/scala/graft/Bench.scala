package graft
import org.apache.spark.sql.SparkSession

/** Benchmark driver. Two modes:
  *
  *   - default sweep (what the round harness runs): every registered query
  *     in 3 full interleaved passes, per-query min across passes
  *     (contention-resistant by construction; `pass_totals` preserves the
  *     raw pass-1 cold sum for round-over-round comparison), one JSON
  *     line at the end with the totals and a per-query map fitted to a
  *     byte budget. `SPARK_GRAFT_BENCH_MINOF` overrides the pass count
  *     (0/1 = the legacy cold+warm pair).
  *   - focus mode (`SPARK_GRAFT_BENCH_FOCUS=q1,q2 SPARK_GRAFT_BENCH_REPS=5`):
  *     the named queries run REPS times *interleaved* (q1,q2,q1,q2,…) and the
  *     JSON reports min/median/max per query. Min-of-N on an interleaved
  *     schedule separates box contention (min ≪ max, high spread) from a plan
  *     regression (min itself moved) — the distinction VERDICT r5 asked to be
  *     recorded as data rather than asserted.
  *
  * Both modes write `planhash.json` (query → 8-hex digest of the canonicalized
  * optimized plan) next to the cwd so a round-over-round bench diff can tell
  * "same plan, different wall time" from "the plan changed". The digest is
  * computed on the *canonicalized* logical plan, so it is stable across JVM
  * runs (expression IDs normalized) but changes whenever the plan shape does.
  */
object Bench {
  private def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)

  /** 8-hex digest of the canonicalized optimized plan — stable across runs,
    * sensitive to plan-shape changes. Cheap: analysis+optimization only, no
    * execution.
    *
    * The optimizer runs on the ANALYZED plan directly, bypassing
    * `QueryExecution.withCachedData`: operators that `persist()` an
    * intermediate (LSH signatures, image fingerprints) would otherwise
    * get an `InMemoryRelation` spliced into `optimizedPlan`, making the
    * digest depend on which caches happen to be registered in this
    * session at hash time — r11's verdict found focus-mode and
    * bench-mode disagreeing on exactly the persisting queries. Hashing
    * the cache-free optimization keeps the digest a pure function of
    * the query code, so cross-session plan-drift comparison is sound.
    *
    * Two JVM-run-specific artifacts are normalized out of the plan
    * text before digesting (typed-Dataset queries embed both):
    * synthetic lambda class identities (`Foo$$Lambda$2700/0x7f..@66..`
    * — the counter and address are assigned per JVM) and object
    * identity hashes (`UnsafeArrayData@582dcbb3`). Canonicalization
    * handles expression ids but not these.
    *
    * Expression ids are ALSO renumbered (first-occurrence order, fixed
    * jvmId) BEFORE the optimizer runs, not just in the final
    * canonicalization: optimizer rules that group or order by
    * expression hashCode (`RewriteDistinctAggregates` buckets distinct
    * aggregates via a HashMap keyed on exprId-bearing expressions)
    * otherwise emit their output in an order that depends on the
    * absolute ids the session's history happened to allocate — the
    * multi-distinct `profile_orders` family hashed differently in
    * sweep vs focus mode purely from exprId drift. Renumbering makes
    * the optimizer's order decisions structural. */
  def planHash(spark: SparkSession, sfDir: String, name: String): String =
    try planHashDf(spark, SparkEntry.queries(name)(spark, sfDir))
    catch { case _: Throwable => "err" }

  /** [[planHash]] for an already-built DataFrame — shared with the
    * offline probes (RefineBranchProbe) so their recorded digests are
    * directly comparable with planhash.json's. */
  def planHashDf(spark: SparkSession, df: org.apache.spark.sql.DataFrame): String =
    try {
      val canon = canonicalText(spark, df)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8"))
      md.take(4).map("%02x".format(_)).mkString
    } catch { case _: Throwable => "err" }

  /** The exact canonical plan text [[planHashDf]] digests — shared with
    * PlanDumpProbe so two-JVM text diffs always diff the string being
    * hashed.
    *
    * ExprIds are renumbered AGAIN after the optimizer: rules like
    * PartitionPruning INSERT subquery expressions
    * (DynamicPruningSubquery) whose ExprId comes fresh off the
    * session's global counter — the canonicalizer orders commutative
    * AND operands by hashCode, so the counter's value at hash time
    * decided where the pruning subquery sorted among its sibling
    * conjuncts (observed: one spurious ann_topk_ivfpq_indexed planhash
    * flip across six same-code bench runs, and a deterministic hash
    * difference between sessions with different query histories). The
    * second renumbering pins optimizer-created ids to first-occurrence
    * order, making the digest a pure function of the plan again. */
  def canonicalText(spark: SparkSession, df: org.apache.spark.sql.DataFrame): String = {
    val cacheFree = renumberExprIds(spark.sessionState.optimizer.execute(
      renumberExprIds(df.queryExecution.analyzed.clone())))
    cacheFree.canonicalized.toString
      .replaceAll("\\$\\$Lambda[^,\\s)\\]]*",
        java.util.regex.Matcher.quoteReplacement("$$Lambda"))
      .replaceAll("@[0-9a-f]+\\b", "@")
  }

  /** Rewrite every exprId to a sequential id (first-occurrence order in
    * a deterministic top-down traversal) under a fixed jvmId, keeping
    * the plan resolved — see [[planHash]]. */
  private def renumberExprIds(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions._
    val map = scala.collection.mutable.HashMap[ExprId, ExprId]()
    val zero = new java.util.UUID(0L, 0L)
    def fresh(old: ExprId): ExprId =
      map.getOrElseUpdate(old, ExprId(map.size.toLong, zero))
    plan.transformAllExpressionsWithSubqueries {
      case a: AttributeReference => a.withExprId(fresh(a.exprId))
      case a: Alias =>
        Alias(a.child, a.name)(fresh(a.exprId), a.qualifier, a.explicitMetadata,
          a.nonInheritableMetadataKeys)
      // optimizer-inserted subqueries carry their own ExprId off the
      // session counter — normalize them too (see planHashDf); the
      // subquery PLAN's attributes are covered by the cases above
      // (transformAllExpressionsWithSubqueries descends into it)
      case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery =>
        d.copy(exprId = fresh(d.exprId))
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
        s.copy(exprId = fresh(s.exprId))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NTZ event-time casts and window bucketing are value-preserving
      // only under the UTC session tz the oracle pins — never inherit
      // the box tz
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warm-up: spin up parquet readers, shuffle machinery, and
    // the codegen compiler once, so the first timed query measures the
    // query and not JVM start-up (~5s otherwise charged to whichever
    // query the Map happens to iterate first)
    try {
      val warm = spark.read.parquet(s"$sfDir/customer.parquet")
      warm.groupBy("c_nationkey").count().count()
    } catch { case _: Throwable => () }

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() } catch { case _: Throwable => () }
      val t = (System.nanoTime() - t0) / 1e9
      // isolate queries: operators may persist() intermediate tables
      // (LSH signatures etc.) — don't let one query's cache residue
      // skew the next query's memory budget. unpersistSpanCaches also
      // empties the span-cache registry (clearCache frees storage but
      // would leave the buffer accumulating plan objects all run)
      graft.ext.Dedup.unpersistSpanCaches()
      graft.ext.Multimodal.unpersistCaches()
      graft.ext.Analytics.unpersistCaches()
      spark.catalog.clearCache()
      t
    }

    val focus = sys.env.get("SPARK_GRAFT_BENCH_FOCUS").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    focus match {
      case Some(names) =>
        val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
        // interleaved schedule: rep-major, so each query's samples are spread
        // across the whole wall-clock window — a transient contention spike
        // inflates one sample of several queries, not all samples of one
        val samples = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
        for (_ <- 1 to reps; n <- names) samples(n) = samples(n) :+ time(n)
        val hashes = names.map(n => n -> planHash(spark, sfDir, n)).toMap
        val qjs = names.map { n =>
          val s = samples(n).sorted
          val med = s(s.length / 2)
          "\"" + n + "\":{\"min\":" + f(s.head) + ",\"median\":" + f(med) +
            ",\"max\":" + f(s.last) + ",\"plan\":\"" + hashes(n) + "\"}"
        }.mkString("{", ",", "}")
        println(s"""{"metric":"focus_min_of_n","unit":"sec","sf":"${new java.io.File(sfDir).getName}","reps":$reps,"queries":$qjs,"value":${f(samples.values.map(_.min).sum)}}""")
      case None =>
        // pass 1 (cold: includes each query's codegen compile) is the
        // headline metric — comparable across rounds. Pass 2 (warm:
        // steady-state plans, what a resident service measures) is
        // reported alongside; the gap is fixed per-query JVM cost, and a
        // contended box inflates the cold pass far more than the warm one.
        //
        // Min-of-N interleaved passes are the DEFAULT (N=3): N full
        // passes instead of the cold+warm pair, reporting the
        // per-query MIN across passes — the focus-mode contention
        // protocol promoted to the whole suite (r10 and r11 each spent
        // an isolation round-trip settling phantoms a min-of-N headline
        // would never have produced; the driver invokes Bench with no
        // env, so the contention-resistant mode must be the default to
        // reach the recorded BENCH_r{N}). Pass-major order spreads each
        // query's samples across the whole wall-clock window, so a
        // transient spike inflates one sample of many queries rather
        // than all samples of one. `queries`/`value` are min-of-all
        // (the contention-resistant floor); `warm_total` is min over
        // passes >= 2 (pure steady-state); `pass_totals` keeps the raw
        // per-pass sums so the pass-1 cold total stays comparable to
        // prior rounds' headline. SPARK_GRAFT_BENCH_MINOF overrides:
        // N>=2 sets the pass count, 0/1 restores the legacy cold+warm
        // pair.
        val names = SparkEntry.queries.keys.toSeq
        val minOf = sys.env.get("SPARK_GRAFT_BENCH_MINOF")
          .flatMap(s => scala.util.Try(s.toInt).toOption)
          .orElse(Some(3)).filter(_ >= 2)
        val passes: Seq[Map[String, Double]] = minOf match {
          case Some(np) => (1 to np).map(_ => names.map(n => n -> time(n)).toMap)
          case None     => Seq(names.map(n => n -> time(n)).toMap,
                               names.map(n => n -> time(n)).toMap)
        }
        val cold = minOf match {
          case Some(_) => names.map(n => n -> passes.map(_(n)).min).toMap
          case None    => passes.head
        }
        val warm = names.map(n => n -> passes.tail.map(_(n)).min).toMap
        // plan-hash dump: full map to a file (small, committed per round);
        // the stdout line only carries a digest-of-digests so a reader can
        // confirm "plans unchanged since last round" from the JSON alone
        val hashes = names.sorted.map(n => n -> planHash(spark, sfDir, n))
        val hashJson = hashes.map { case (n, h) => "\"" + n + "\":\"" + h + "\"" }.mkString("{", ",", "}")
        try {
          val w = new java.io.PrintWriter("planhash.json", "UTF-8")
          try w.println(hashJson) finally w.close()
        } catch { case _: Throwable => () }
        val combined = {
          val md = java.security.MessageDigest.getInstance("MD5").digest(hashes.map(_._2).mkString.getBytes("UTF-8"))
          md.take(4).map("%02x".format(_)).mkString
        }
        // The harness that records this line keeps only the LAST ~2000
        // characters of output, so the line must fit comfortably in that
        // window (BENCH_r04 lost its total to truncation). Defenses:
        // the per-query map is fitted to a tight byte budget by dropping
        // the FASTEST queries first (ascending order ⇒ the slowest
        // entries, the ones a reader compares to baseline, always
        // survive). Keys are unique — strict JSON parsers reject
        // duplicates — and the budget keeps the whole line well inside
        // the window, so "value" early is safe from truncation.
        def js(m: Map[String, Double], budget: Int) = {
          val asc = m.toSeq.sortBy(_._2).map { case (k, v) => "\"" + k + "\":" + f(v) }
          var kept = asc
          while (kept.map(_.length + 1).sum > budget && kept.nonEmpty) kept = kept.tail
          (kept.mkString("{", ",", "}"), asc.length - kept.length)
        }
        val total = if (cold.nonEmpty) cold.values.sum else 0.0
        val warmTotal = if (warm.nonEmpty) warm.values.sum else 0.0
        val sfName = new java.io.File(sfDir).getName
        // staged build/train/calibrate wall-times (Staging class doc):
        // pass 1 paid these once; the per-query min prices the probe.
        // Reported so the build/probe split is visible in bench.json
        // instead of silently vanishing from the headline (r19 verdict)
        val stagedJs = graft.queries.Staging.buildSeconds.toSeq.sortBy(_._1)
          .map { case (n, v) => "\"" + n + "\":" + f(v) }.mkString("{", ",", "}")
        val (qjs, dropped) = js(cold, 1000)
        val minofJs = minOf.map(np =>
          s""""minof":$np,"pass_totals":[${passes.map(p => f(p.values.sum)).mkString(",")}],""")
          .getOrElse("")
        // Build-once vs probe cost for the persisted-index ANN family:
        // the registered `*_indexed` cells build their index INSIDE the
        // timed query (the lifecycle certificate the oracle needs), so
        // suite density charges build-once cost to every run. This
        // split prices the two halves separately — the number a
        // production reading of the bench should use is the PROBE
        // column (an index is built once per corpus snapshot). Printed
        // on its OWN line before the total (the recorder's window keeps
        // the last line) and hedged to bench_split.json.
        // a stale bench_split.json from a previous run must never be
        // read as this run's numbers: delete it BEFORE measuring, so a
        // failure below leaves no file rather than last round's (r19
        // advice — the catch-all swallow otherwise preserved it)
        try new java.io.File("bench_split.json").delete() catch { case _: Throwable => () }
        try {
          import graft.ext.AnnIndex
          import org.apache.spark.sql.functions.col
          val emb = Tables.embeddings(spark, sfDir)
          val n = emb.count()
          val qs = emb.filter(col("vec_id") < 10)
          def t(body: => Unit): Double = {
            val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
          val root = new java.io.File(
            sys.props("java.io.tmpdir"), "graft_bench_split").getAbsolutePath
          val p = new org.apache.hadoop.fs.Path(root)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          val lshB = t(AnnIndex.lshIndexWrite(emb, "vec_id", "embedding", s"$root/lsh", n = n))
          val lshP = t(AnnIndex.lshTopKIndexed(spark, s"$root/lsh", qs,
            "vec_id", "embedding", 5).count())
          val ivfB = t(AnnIndex.ivfIndexWrite(emb, "vec_id", "embedding", s"$root/ivf", n = n))
          val ivfP = t(AnnIndex.ivfTopKIndexed(spark, s"$root/ivf", qs,
            "vec_id", "embedding", 5).count())
          val pqB = t(AnnIndex.ivfPqIndexWrite(emb, "vec_id", "embedding", s"$root/ivfpq", n = n))
          val pqP = t(AnnIndex.ivfPqTopKIndexed(spark, s"$root/ivfpq", qs,
            "vec_id", "embedding", 5, rerankFrom = Some(emb)).count())
          val splitLine =
            s"""{"metric":"ann_index_split","unit":"sec","sf":"$sfName","n":$n,""" +
              s""""lsh":{"build":${f(lshB)},"probe":${f(lshP)}},""" +
              s""""ivf":{"build":${f(ivfB)},"probe":${f(ivfP)}},""" +
              s""""ivfpq":{"build":${f(pqB)},"probe":${f(pqP)}}}"""
          println(splitLine)
          val w = new java.io.PrintWriter("bench_split.json", "UTF-8")
          try w.println(splitLine) finally w.close()
        } catch { case _: Throwable => () }
        val line = s"""{"metric":"total","unit":"sec","value":${f(total)},"sf":"$sfName",$minofJs"plans":"$combined","staged_builds":$stagedJs,"dropped_fastest":$dropped,"queries":$qjs,"warm_total":${f(warmTotal)}}"""
        println(line)
        // file hedge alongside planhash.json: a recorder that misses the
        // stdout line (truncation, prefixing) can pick the same JSON up
        // from the working directory
        try {
          val w = new java.io.PrintWriter("bench.json", "UTF-8")
          try w.println(line) finally w.close()
        } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
