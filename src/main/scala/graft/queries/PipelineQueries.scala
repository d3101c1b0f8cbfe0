package graft.queries

import graft.Tables
import graft.ext.{Dedup, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-infrastructure suite: deterministic sampling, melt/unpivot,
  * bloom-pruned joins, dedup-cluster resolution, and approximate
  * sketches. The md5-derived sampling hash is shared with
  * [[graft.ext.DedupConstants]]'s family so the DuckDB oracle keeps the
  * SAME rows.
  */
object PipelineQueries extends QueryGroup {

  /** Portable key hash, DuckDB spelling (matches Pipeline.keyHash). */
  private[queries] def duckHash(keyCol: String): String =
    s"CAST(('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 15)) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order clustering key over (customer, order-day): the layout
    // that makes range predicates on EITHER dimension prune files —
    // sort/repartitionByRange by this key at write time (ZorderSpec
    // pins the locality win; here the oracle pins every bit of the
    // interleave).
    "zorder_key" -> ((s, dir) => {
      import graft.operators.Zorder
      Tables.orders(s, dir).select(col("o_orderkey"),
        Zorder.zkey(Seq(
          (col("o_custkey"), 0L, 200000L),
          (datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long"), 0L, 4096L)), bits = 16).as("zkey"))
        .orderBy("zkey", "o_orderkey")
    }),

    // Count-min heavy hitters: token frequencies estimated from a
    // fixed 4x256 counter matrix (mergeable, cardinality-independent
    // memory — the sketch answer when the exact per-token shuffle is
    // the bottleneck), reported for the exact top-20 with the
    // one-sided overcount. Oracle replays every counter.
    "heavy_hitters_cms" -> ((s, dir) => {
      import graft.ext.CountMin
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
      val cms = CountMin.sketch(toks, "token")
      val truth = toks.groupBy("token").agg(count(lit(1)).as("true_count"))
        .orderBy(col("true_count").desc, col("token").asc).limit(20)
      CountMin.estimate(cms, truth, "token")
        .withColumn("overcount", col("est_count") - col("true_count"))
        .orderBy(col("true_count").desc, col("token").asc)
    }),

    // Deterministic train/val/test split: hash-permille assignment —
    // stable under reruns and corpus growth (a new doc never moves an
    // old one between splits, the leakage-safety property).
    "dataset_split" -> ((s, dir) => {
      Pipeline.datasetSplit(Tables.documents(s, dir).select("doc_id", "lang"),
        "doc_id", valPermille = 100, testPermille = 100)
        .orderBy("doc_id")
    }),

    // Dedup health report: cluster-size histogram of the MinHash near-
    // dup clusters — dup rate and keep-one removable counts, the
    // numbers a dedup run actually reports.
    "dedup_summary" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.5)
      Pipeline.dedupSummary(pairs, "doc_a", "doc_b")
        .orderBy("cluster_size")
    }),

    // Leakage-safe split: assignment hashes the dedup-cluster
    // representative, so near-dup pairs land in the same split by
    // construction (EvalSpec proves splitLeakage returns empty on it);
    // unique docs keep their dataset_split assignment.
    "split_by_cluster" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      Pipeline.splitByCluster(docs.select("doc_id"), "doc_id",
        pairs, "doc_a", "doc_b", valPermille = 100, testPermille = 100)
        .select("doc_id", "rep_id", "split")
        .orderBy("doc_id")
    }),

    // Sequence packing: documents laid end-to-end in id order, cut
    // into 512-token training windows via the two-phase distributed
    // prefix sum (per-block cumsum + tiny block rollup — never a
    // single-task global window).
    "pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Pipeline.packSequences(docs, "doc_id", "n_tokens", seqLen = 512L)
        .orderBy("doc_id")
    }),

    // Packing measured in REAL subword tokens (ext/Bpe) — bins now
    // correspond to what the training run actually loads per sequence.
    "pack_sequences_bpe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), graft.ext.Bpe.tokenCountCol("text").as("n_tokens"))
      Pipeline.packSequences(docs, "doc_id", "n_tokens", seqLen = 1024L)
        .orderBy("doc_id")
    }),

    // Per-domain cap (Common Crawl "max N pages per domain"): keep the
    // 20 longest docs of each source, ties by id. Hot domains bound
    // their own output at N — the operator REDUCES downstream skew.
    "domain_cap" -> ((s, dir) => {
      Pipeline.domainCap(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        "source", "n_chars", "doc_id", maxPerDomain = 20)
        .orderBy("doc_id")
    }),

    // Exact decile binning of order totals (cents): global-rank
    // equi-depth bins via the two-phase prefix sum — never a
    // single-task ntile — then per-bin count/min/max.
    "quantile_bins" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      Pipeline.equiDepthBins(o, "cents", "o_orderkey", nBins = 10, blockWidth = 1000000L)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .orderBy("bin")
    }),

    // Per-type winsorization of event values: clip into the exact
    // [p01, p99] band (discrete rank-picked percentiles — every bound
    // is one of the group's own integers, no interpolation).
    "winsorize_events" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      Pipeline.winsorize(e, "event_type", "cents", loPermille = 10, hiPermille = 990)
        .select("event_id", "event_type", "cents", "lo_bound", "hi_bound", "clipped")
        .orderBy("event_id")
    }),

    // Robust (median/MAD) scaling of event values per type — the
    // outlier-resistant sibling of z-scores; both statistics are
    // discrete rank-picks, the one float step is IEEE-exact.
    "robust_scale_events" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      Pipeline.robustScale(e, "event_type", "cents")
        .select("event_id", "event_type", "cents", "med", "mad", "robust_e4")
        .orderBy("event_id")
    }),

    // Deterministic corpus shuffle: reproducible hash-order training
    // positions (two-phase rank — never a single-task global sort).
    "corpus_shuffle" -> ((s, dir) => {
      Pipeline.deterministicShuffle(
        Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
        .orderBy("doc_id")
    }),

    // Deterministic 5% hash sample — membership is a pure function of
    // the key, reproducible at any scale / partitioning.
    "sample_hash" -> ((s, dir) => {
      Pipeline.hashSample(Tables.orders(s, dir), "o_orderkey", permille = 50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Deterministic stratified sample: 10 docs per language by hash order.
    "sample_stratified" -> ((s, dir) => {
      Pipeline.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", perStratum = 10)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    }),

    // Mixture planner: the step BEFORE sample_weighted — turn a 100k
    // token budget + target weights (en 50%, zh 30%, fr 15%, others
    // 5%) into the per-language sampling permilles; under-supplied
    // languages saturate at 1000‰ and report expected < desired.
    "mixture_plan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Pipeline.mixturePlan(docs, "lang", "n_tokens", targetTokens = 100000L,
        Map("en" -> 5000, "zh" -> 3000, "fr" -> 1500), defaultBp = 500)
        .orderBy("lang")
    }),

    // Domain-mixing weights: en 500‰, zh 300‰, fr 150‰, others 50‰ —
    // the deterministic mixture-sampling step of a training pipeline.
    "sample_weighted" -> ((s, dir) => {
      Pipeline.weightedSample(Tables.documents(s, dir), "lang", "doc_id",
        Map("en" -> 500, "zh" -> 300, "fr" -> 150), defaultPermille = 50)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // The flagship composition: a realistic LLM training-data pipeline
    // — Gopher quality gate → exact dedup (canonical per text) →
    // decontaminate vs the benchmark slice → mixture-weight sample —
    // as ONE lazy Catalyst plan with a single action. Every stage is
    // the already-oracle-checked operator; this query proves they
    // compose (the oracle replays the whole chain in SQL). Shuffle
    // budget: the quality gate (gopherKeep) and the sampler are pure
    // scan-side predicates, dedup is ONE row_number shuffle on text
    // (exactCanonical, not groupBy + join-back), so the whole pipeline
    // is that shuffle plus the decontamination matched-grams agg and
    // one anti join (AQE broadcasts the small contaminated set).
    // Plan notes (audited via graft.Explain): the gate predicate sits
    // in the scan's Filter; the dedup window plans as WindowGroupLimit
    // — map-side top-1 per text BEFORE its exchange. The dedup subtree
    // appears twice (the contamination branch and the output branch
    // prune different columns, so Catalyst can't reuse the exchange);
    // a production run persists `deduped` between stages — same
    // operators, one materialization — see SCALE.md.
    "pipeline_end_to_end" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(col("doc_id") % 20 === 0)
      val corpus = docs
        .filter(graft.ext.TextAnalysis.gopherKeep("text", minWords = 30, maxWords = 90))
        .filter(col("doc_id") % 20 =!= 0)
      val deduped = graft.ext.Dedup.exactCanonical(corpus, "doc_id", Seq("text"))
      val contaminated = graft.ext.Decontaminate.ngramContamination(
        deduped, "doc_id", "text", evalSet, "doc_id", "text", minShared = 5L)
        .select("doc_id").distinct()
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      Pipeline.weightedSample(clean, "lang", "doc_id",
        Map("en" -> 500, "zh" -> 300, "fr" -> 150), defaultPermille = 50)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // Melt wide metric columns to long (metric, value) rows.
    "unpivot_long" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // Bloom-pruned join: identical rows to the plain join (the oracle
    // IS the plain join); the big side is pruned before its shuffle.
    "bloom_prune_join" -> ((s, dir) => {
      val pricey = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 480000)
        .select("o_orderkey", "o_totalprice")
      Pipeline.bloomPruneJoin(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
        pricey, "l_orderkey", "o_orderkey", expectedItems = 100000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Per-series gap audit, DENSITY-ADAPTIVE (r20): gaps more than 6x
    // the series' own mean inter-arrival (cross-multiplied integers —
    // Pipeline.seriesGapsAdaptive). The fixed 30-minute threshold
    // (Pipeline.seriesGaps, still the API for wall-clock SLAs) was the
    // scale audits' one 0-row artifact: at 10x ingest density no gap
    // ever reached 30 minutes, so the outage report went silently
    // vacuous exactly where it should have kept working.
    "series_gaps" -> ((s, dir) => {
      Pipeline.seriesGapsAdaptive(Tables.events(s, dir), "event_type", "ts",
        factor = 6L)
        .orderBy("event_type", "gap_start")
    }),

    // Referential-integrity audit lineitem→orders (data contract:
    // orphan/childless counts stay visible, not silently dropped).
    "fk_integrity" -> ((s, dir) => {
      Pipeline.fkAudit(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        "l_orderkey", "o_orderkey")
    }),

    // 3-sigma outliers per event_type on centi-discretized values —
    // exact cross-multiplied integer test, no float stats.
    "outlier_events" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_centi"))
      Pipeline.zscoreOutliers(e, "event_type", "value_centi", z = 3)
        .orderBy("event_id")
    }),

    // k-anonymity release gate over events: quasi-identifier =
    // (event_type, day); rows in groups under 8 are suppressed.
    // k=8 exercises both branches at sf0.001 (group sizes 2..15);
    // larger SFs have no under-k quasi-groups in this synthetic data,
    // so the suppression branch there is covered by PipelineSpec.
    "kanon_suppress" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          to_date(col("ts")).as("day"), col("user_id"))
      Pipeline.kAnonSuppress(e, Seq("event_type", "day"), k = 8L)
        .orderBy("event_id")
    }),

    // Token-budget mixture sampling: per source, keep docs in hash
    // order until 700 corpus tokens are reached (prefix-of-hash-order
    // ⇒ rerun-stable and budget-monotone; see Pipeline scaladoc).
    "sample_token_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Pipeline.tokenBudgetSample(d, "source", "doc_id", "n_tokens", budgetTokens = 700L)
        .orderBy("doc_id")
    }),

    // Same budget walk measured in REAL subword tokens (ext/Bpe
    // greedy longest-match), not the whitespace proxy — what a
    // training-mix allocation actually means.
    "sample_token_budget_bpe" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          graft.ext.Bpe.tokenCountCol("text").as("n_tokens"))
      Pipeline.tokenBudgetSample(d, "source", "doc_id", "n_tokens", budgetTokens = 1200L)
        .orderBy("doc_id")
    }),

    // Dedup representative selection: label every doc with its
    // connected-component cluster (singletons = own id) and keep the
    // highest-quality copy per cluster (quality proxy: n_chars).
    "dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars")
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
        .select("doc_a", "doc_b")
      val labels = Pipeline.connectedComponents(pairs, "doc_a", "doc_b")
      Pipeline.keepBestPerCluster(docs, labels, "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Near-dup cluster resolution: connected components over the
    // MinHash-LSH candidate pairs; cluster id = min doc id reachable.
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
        .select("doc_a", "doc_b")
      Pipeline.connectedComponents(pairs, "doc_a", "doc_b")
        .orderBy("node")
    }),

    // Key-skew audit of events.user_id: top-20 heaviest keys with
    // share / cumulative share in basis points — the pre-join salting
    // decision input (TakeOrdered top-N, never a global sort).
    "skew_report" -> ((s, dir) => {
      Pipeline.skewReport(Tables.events(s, dir), "user_id", topN = 20)
        .orderBy("rank")
    }),

    // One-pass data-quality profile of the orders table: null/distinct
    // counts per column + discretized price bounds and date range.
    "profile_orders" -> ((s, dir) => {
      Pipeline.profile(
        Tables.orders(s, dir),
        extra = Seq(
          floor(min(col("o_totalprice")) * 100 + 0.5).as("min_price_centi"),
          floor(max(col("o_totalprice")) * 100 + 0.5).as("max_price_centi"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date")))
    }),

    // The 100 TB profile: HLL++ distinct counts (no Expand ×2·ncols in
    // the plan). Gate-checked like the other sketches: the recorded
    // columns are the EXACT distincts plus per-column booleans asserting
    // the approx estimate (rsd=0.02, deterministic for fixed data)
    // landed within 5%; the oracle supplies exact + literal true.
    "profile_orders_approx" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val approx = Pipeline.profile(o, approxDistinct = true)
      val exact = Pipeline.profile(o)
      val a = approx.select(approx.columns.map(c => col(c).as(s"a_$c")): _*)
      val checks = o.columns.toSeq.flatMap { c =>
        Seq(
          col(s"distinct_$c"),
          (abs(col(s"a_distinct_$c") - col(s"distinct_$c")).cast("double")
            / col(s"distinct_$c") < 0.05).as(s"within_5pct_$c"))
      }
      exact.crossJoin(a).select(col("n_rows") +: checks: _*)
    }),

    // HLL sketch per group, gate-checkable: the sketch estimate itself is
    // engine-specific, so the RECORDED columns are the exact count plus a
    // boolean asserting the HLL++ estimate (rsd=0.02, deterministic for
    // fixed data) landed within 5% — the oracle supplies exact + literal
    // true. PipelineSpec additionally bounds the raw estimate.
    "approx_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .withColumn("within_5pct",
          abs(col("approx_users") - col("exact_users")).cast("double")
            / col("exact_users") < 0.05)
        .select("event_type", "exact_users", "within_5pct")
        .orderBy("event_type")
    }),

    // Quantile sketch (GK percentile_approx), gate-checkable the same
    // way: the GK guarantee is rank error <= n/accuracy (1.5 ranks at
    // accuracy=10000, n=15k), so the approx value sits within a couple of
    // adjacent order statistics of the exact percentile; assert 2%
    // relative value error and record the boolean.
    "approx_quantile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_p50"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("approx_p95"),
          expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
          expr("percentile(o_totalprice, 0.95)").as("exact_p95"),
          count(lit(1)).as("n"))
        .select(
          col("n"),
          (abs(col("approx_p50") - col("exact_p50")) / col("exact_p50") < 0.02)
            .as("p50_within_2pct"),
          (abs(col("approx_p95") - col("exact_p95")) / col("exact_p95") < 0.02)
            .as("p95_within_2pct"))
    })
  )

  /** Transitive closure of the MinHash-LSH pairs as a WITH-body ending
    * in `labeled(node, cluster_id)` — shared by the `dedup_clusters`
    * oracle and the `dedup_keep_best` representative-selection oracle.
    */
  private val clusterCtes = {
    val minhash = DedupQueries.minhashSql
    s"""pairs AS (SELECT doc_a, doc_b FROM ($minhash) t),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
labeled AS (
  SELECT a AS node, least(a, min(b)) AS cluster_id
  FROM reach GROUP BY a)"""
  }

  private val clustersSql =
    s"""WITH RECURSIVE $clusterCtes
SELECT node, cluster_id FROM labeled ORDER BY node"""

  val oracleSql: Map[String, String] = Map(
    "robust_scale_events" ->
      """WITH e AS (
  SELECT event_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r1 AS (
  SELECT event_type, cents,
    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM e),
med AS (
  SELECT event_type, min(cents) AS med FROM r1
  WHERE rn = greatest(1, (500 * n + 999) // 1000) GROUP BY 1),
d AS (
  SELECT e.event_id, e.event_type, e.cents, med.med,
    abs(e.cents - med.med) AS absdev
  FROM e JOIN med USING (event_type)),
r2 AS (
  SELECT event_type, absdev,
    row_number() OVER (PARTITION BY event_type ORDER BY absdev) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
mad AS (
  SELECT event_type, min(absdev) AS mad FROM r2
  WHERE rn = greatest(1, (500 * n + 999) // 1000) GROUP BY 1)
SELECT event_id, d.event_type, cents, med, mad,
  CAST(floor(CAST(cents - med AS DOUBLE) / greatest(1, mad) * 10000.0 + 0.5)
    AS BIGINT) AS robust_e4
FROM d JOIN mad USING (event_type)
ORDER BY event_id""",

    "winsorize_events" ->
      """WITH e AS (
  SELECT event_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_id, event_type, cents,
    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM e),
b AS (
  SELECT event_type,
    min(cents) AS lo_bound, max(cents) AS hi_bound
  FROM r
  WHERE rn = greatest(1, (10 * n + 999) // 1000)
     OR rn = greatest(1, (990 * n + 999) // 1000)
  GROUP BY event_type)
SELECT event_id, e.event_type, cents, lo_bound, hi_bound,
  least(greatest(cents, lo_bound), hi_bound) AS clipped
FROM e JOIN b ON e.event_type = b.event_type
ORDER BY event_id""",

    "corpus_shuffle" ->
      s"""SELECT doc_id, lang,
  CAST(row_number() OVER (ORDER BY ${duckHash("doc_id")}, doc_id) - 1 AS BIGINT)
    AS shuffle_pos
FROM documents ORDER BY doc_id""",

    "quantile_bins" ->
      """WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
r AS (
  SELECT cents,
    ((row_number() OVER (ORDER BY cents, o_orderkey) - 1) * 10)
      // (SELECT count(*) FROM o) AS bin
  FROM o)
SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
  min(cents) AS min_cents, max(cents) AS max_cents
FROM r GROUP BY bin ORDER BY bin""",

    "domain_cap" ->
      """WITH r AS (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS domain_rank
  FROM documents)
SELECT doc_id, source, n_chars, domain_rank FROM r
WHERE domain_rank <= 20 ORDER BY doc_id""",

    "sample_hash" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE ${duckHash("o_orderkey")} % 1000 < 50
ORDER BY o_orderkey""",

    "dataset_split" ->
      s"""SELECT doc_id, lang,
  CASE WHEN ${duckHash("doc_id")} % 1000 >= 900 THEN 'test'
       WHEN ${duckHash("doc_id")} % 1000 >= 800 THEN 'val'
       ELSE 'train' END AS split
FROM documents ORDER BY doc_id""",

    "dedup_summary" ->
      s"""WITH RECURSIVE $clusterCtes,
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS s FROM labeled GROUP BY 1)
SELECT s AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(s * count(*) AS BIGINT) AS n_docs,
  CAST((s - 1) * count(*) AS BIGINT) AS removable
FROM sizes GROUP BY s ORDER BY cluster_size""",

    "split_by_cluster" ->
      s"""WITH RECURSIVE $clusterCtes,
rep AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS rep_id
  FROM documents d LEFT JOIN labeled l ON l.node = d.doc_id)
SELECT doc_id, rep_id,
  CASE WHEN ${duckHash("rep_id")} % 1000 >= 900 THEN 'test'
       WHEN ${duckHash("rep_id")} % 1000 >= 800 THEN 'val'
       ELSE 'train' END AS split
FROM rep ORDER BY doc_id""",

    "pack_sequences" ->
      """WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
b AS (SELECT doc_id, n_tokens, CAST(floor(doc_id / 4096) AS BIGINT) AS blk FROM d),
w AS (SELECT doc_id, n_tokens, blk,
  coalesce(sum(n_tokens) OVER (PARTITION BY blk ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS within
  FROM b),
bt AS (SELECT blk, sum(n_tokens) AS btotal FROM b GROUP BY 1),
bp AS (SELECT blk, coalesce(sum(btotal) OVER (ORDER BY blk
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bprefix FROM bt)
SELECT w.doc_id, w.n_tokens,
  CAST(bp.bprefix + w.within AS BIGINT) AS start_offset,
  CAST(floor((bp.bprefix + w.within) / 512) AS BIGINT) AS bin,
  CAST((bp.bprefix + w.within) % 512 AS BIGINT) AS bin_offset
FROM w JOIN bp USING (blk) ORDER BY w.doc_id""",

    "pack_sequences_bpe" ->
      s"""WITH d AS (
  SELECT doc_id, bpe_tokens AS n_tokens
  FROM (${graft.ext.Bpe.oracleSql("documents", "doc_id", "text")})),
b AS (SELECT doc_id, n_tokens, CAST(floor(doc_id / 4096) AS BIGINT) AS blk FROM d),
w AS (SELECT doc_id, n_tokens, blk,
  coalesce(sum(n_tokens) OVER (PARTITION BY blk ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS within
  FROM b),
bt AS (SELECT blk, sum(n_tokens) AS btotal FROM b GROUP BY 1),
bp AS (SELECT blk, coalesce(sum(btotal) OVER (ORDER BY blk
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bprefix FROM bt)
SELECT w.doc_id, w.n_tokens,
  CAST(bp.bprefix + w.within AS BIGINT) AS start_offset,
  CAST(floor((bp.bprefix + w.within) / 1024) AS BIGINT) AS bin,
  CAST((bp.bprefix + w.within) % 1024 AS BIGINT) AS bin_offset
FROM w JOIN bp USING (blk) ORDER BY w.doc_id""",

    "heavy_hitters_cms" -> {
      val P = graft.ext.DedupConstants.P
      val aL = (0 until 4).map(graft.ext.DedupConstants.a).mkString("[", ", ", "]")
      val bL = (0 until 4).map(graft.ext.DedupConstants.b).mkString("[", ", ", "]")
      def slots(src: String) =
        s"""SELECT $src.*, d, (($aL[d + 1] * h + $bL[d + 1]) % $P) % 256 AS slot
  FROM $src, (SELECT unnest(generate_series(0, 3)) AS d)"""
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
th0 AS (SELECT token, CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % $P AS h FROM toks),
slots AS (${slots("th0")}),
cms AS (SELECT d, slot, count(*) AS cnt FROM slots GROUP BY 1, 2),
truth AS (SELECT token, count(*) AS true_count FROM toks
          GROUP BY 1 ORDER BY count(*) DESC, token LIMIT 20),
th AS (SELECT token, true_count,
         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % $P AS h FROM truth),
ts AS (${slots("th")}),
est AS (SELECT token, true_count, min(cnt) AS est_count
        FROM ts JOIN cms USING (d, slot) GROUP BY 1, 2)
SELECT token, true_count, est_count, est_count - true_count AS overcount
FROM est ORDER BY true_count DESC, token"""
    },

    "zorder_key" ->
      s"""SELECT o_orderkey,
  ${graft.operators.Zorder.zkeySql(Seq(
        ("o_custkey", 0L, 200000L),
        ("CAST(o_orderdate AS DATE) - DATE '1995-01-01'", 0L, 4096L)), bits = 16)} AS zkey
FROM orders ORDER BY zkey, o_orderkey""",

    // Replays the full four-stage pipeline: Gopher rules (same
    // thresholds as quality_filter_gopher), min-id-per-text dedup, the
    // md5-60-bit gram-hash contamination check (shared >= 5 vs the
    // doc_id % 20 = 0 slice), and the per-lang permille hash sample.
    "pipeline_end_to_end" ->
      s"""WITH t AS (
  SELECT doc_id, lang, text, string_split(text, ' ') w, string_split(text, chr(10)) ls
  FROM documents),
m AS (
  SELECT doc_id, lang, text, w,
    len(w) nw, len(ls) nl,
    CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) mean_wl,
    (length(text) - length(regexp_replace(text, '#', '', 'g'))) +
      (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 symbols,
    len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) alpha_words,
    len(list_filter(['the', 'a', 'of', 'and', 'in', 'to', 'is'], s2 -> list_contains(w, s2))) stop_hits,
    len(list_filter(ls, l -> starts_with(l, '- ') OR starts_with(l, '* '))) bullet_lines,
    len(list_filter(ls, l -> l LIKE '%...')) ell_lines
  FROM t),
kept AS (
  SELECT doc_id, lang, text, w FROM m
  WHERE nw >= 30 AND nw <= 90 AND mean_wl >= 3.0 AND mean_wl <= 10.0
    AND CAST(symbols AS DOUBLE) / nw <= 0.1
    AND CAST(alpha_words AS DOUBLE) / nw >= 0.8
    AND stop_hits >= 2
    AND CAST(bullet_lines AS DOUBLE) / nl <= 0.9
    AND CAST(ell_lines AS DOUBLE) / nl <= 0.3),
corpus AS (SELECT * FROM kept WHERE doc_id % 20 <> 0),
dedup AS (SELECT * FROM corpus
  WHERE doc_id IN (SELECT min(doc_id) FROM corpus GROUP BY text)),
cidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) i FROM dedup),
csh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] s FROM cidx),
cg AS (SELECT DISTINCT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % ${graft.ext.DedupConstants.P} g FROM csh),
ev AS (SELECT doc_id, string_split(text, ' ') w FROM documents WHERE doc_id % 20 = 0),
eidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) i FROM ev),
esh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] s FROM eidx),
eg AS (SELECT DISTINCT doc_id eval_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % ${graft.ext.DedupConstants.P} g FROM esh),
contam AS (
  SELECT doc_id FROM (
    SELECT c.doc_id, e2.eval_id, count(DISTINCT c.g) shared
    FROM cg c JOIN eg e2 USING (g) GROUP BY 1, 2) x
  WHERE shared >= 5)
SELECT doc_id, lang FROM dedup
WHERE doc_id NOT IN (SELECT doc_id FROM contam)
  AND ${duckHash("doc_id")} % 1000 <
    CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 300
         WHEN lang = 'fr' THEN 150 ELSE 50 END
ORDER BY doc_id""",

    "sample_weighted" ->
      s"""SELECT doc_id, lang FROM documents
WHERE ${duckHash("doc_id")} % 1000 <
  CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 300
       WHEN lang = 'fr' THEN 150 ELSE 50 END
ORDER BY doc_id""",

    "mixture_plan" ->
      """WITH a AS (
  SELECT lang, CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) AS available
  FROM documents GROUP BY 1),
w AS (
  SELECT lang, available,
    CAST(CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'zh' THEN 3000
              WHEN lang = 'fr' THEN 1500 ELSE 500 END AS BIGINT) AS weight_bp
  FROM a),
d AS (
  SELECT lang, available, weight_bp,
    CAST((100000 * weight_bp) // 10000 AS BIGINT) AS desired
  FROM w),
p AS (
  SELECT lang, available, weight_bp, desired,
    CAST(CASE WHEN available = 0 THEN 0
              ELSE least(1000, (desired * 1000) // available) END AS BIGINT) AS permille
  FROM d)
SELECT lang, available, weight_bp, desired, permille,
  CAST((available * permille) // 1000 AS BIGINT) AS expected
FROM p ORDER BY lang""",

    "sample_stratified" ->
      s"""SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang ORDER BY ${duckHash("doc_id")}, doc_id) AS rn
  FROM documents) t
WHERE rn <= 10 ORDER BY lang, doc_id""",

    "unpivot_long" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber, metric""",

    "bloom_prune_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 480000
ORDER BY l_orderkey, l_linenumber""",

    "dedup_clusters" -> clustersSql,

    "series_gaps" ->
      """WITH e AS (
  SELECT event_type, ts,
    lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev_ts
  FROM events),
st AS (
  SELECT event_type,
    epoch_us(max(ts)) - epoch_us(min(ts)) AS span,
    count(*) - 1 AS gaps
  FROM events GROUP BY 1)
SELECT e.event_type, prev_ts AS gap_start, ts AS gap_end,
  CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) AS gap_micros
FROM e JOIN st USING (event_type)
WHERE prev_ts IS NOT NULL AND st.gaps > 0
  AND CAST(epoch_us(ts) - epoch_us(prev_ts) AS DECIMAL(38,0)) * st.gaps
      > 6 * CAST(st.span AS DECIMAL(38,0))
ORDER BY event_type, gap_start""",

    "fk_integrity" ->
      """SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan_child,
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_parent,
  (SELECT CAST(count(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_childless_parent""",

    "outlier_events" ->
      """WITH e AS (
  SELECT event_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_centi
  FROM events),
s AS (
  -- HUGEINT moments: the Spark side runs the cross-multiplied test in
  -- DECIMAL(38,0) — BIGINT s1*s1 overflows at 10x data (r15 audit)
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(value_centi) AS HUGEINT) AS s1,
    sum(CAST(value_centi AS HUGEINT) * CAST(value_centi AS HUGEINT)) AS s2
  FROM e GROUP BY 1)
SELECT e.event_id, e.event_type, e.value_centi
FROM e JOIN s USING (event_type)
WHERE (s.n * e.value_centi - s.s1) * (s.n * e.value_centi - s.s1)
      > 9 * (s.n * s.s2 - s.s1 * s.s1)
ORDER BY e.event_id""",

    "kanon_suppress" ->
      """WITH e AS (
  SELECT event_id, event_type, CAST(ts AS DATE) AS day, user_id FROM events),
g AS (
  SELECT event_id, event_type, day, user_id,
    CAST(count(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS group_size
  FROM e)
SELECT event_id, event_type, day, user_id, group_size FROM g
WHERE group_size >= 8 ORDER BY event_id""",

    "sample_token_budget" ->
      s"""WITH d AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
      ORDER BY ${duckHash("doc_id")}, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM d)
SELECT doc_id, source, n_tokens, tokens_before FROM w
WHERE tokens_before < 700 ORDER BY doc_id""",

    "sample_token_budget_bpe" ->
      s"""WITH d AS (
  SELECT b.doc_id, doc.source, b.bpe_tokens AS n_tokens
  FROM (${graft.ext.Bpe.oracleSql("documents", "doc_id", "text")}) b
  JOIN documents doc USING (doc_id)),
w AS (
  SELECT doc_id, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
      ORDER BY ${duckHash("doc_id")}, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM d)
SELECT doc_id, source, n_tokens, tokens_before FROM w
WHERE tokens_before < 1200 ORDER BY doc_id""",

    "dedup_keep_best" ->
      s"""WITH RECURSIVE $clusterCtes,
d AS (
  SELECT doc_id, n_chars, coalesce(l.cluster_id, doc_id) AS cluster_id
  FROM documents LEFT JOIN labeled l ON doc_id = l.node)
SELECT doc_id, n_chars, cluster_id,
  (row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) = 1) AS keep
FROM d ORDER BY doc_id""",

    "approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
  true AS within_5pct
FROM events GROUP BY event_type ORDER BY event_type""",

    "approx_quantile" ->
      """SELECT count(*) AS n, true AS p50_within_2pct, true AS p95_within_2pct
FROM orders""",

    "profile_orders_approx" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val perCol = cols.flatMap { c =>
        Seq(
          s"count(DISTINCT $c) AS distinct_$c",
          s"true AS within_5pct_$c")
      }.mkString(",\n  ")
      s"""SELECT count(*) AS n_rows,
  $perCol
FROM orders"""
    },

    "skew_report" ->
      """WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id ASC LIMIT 20),
r AS (
  SELECT user_id, cnt,
    CAST(row_number() OVER w AS INTEGER) AS rank,
    CAST(sum(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM top
  WINDOW w AS (ORDER BY cnt DESC, user_id ASC))
SELECT user_id, cnt, rank,
  CAST((cnt * 10000) // t.total AS BIGINT) AS share_bp,
  CAST((cum * 10000) // t.total AS BIGINT) AS cum_bp
FROM r, t ORDER BY rank""",

    "profile_orders" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val perCol = cols.flatMap { c =>
        Seq(
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$c",
          s"count(DISTINCT $c) AS distinct_$c")
      }.mkString(",\n  ")
      s"""SELECT count(*) AS n_rows,
  $perCol,
  CAST(floor(min(o_totalprice) * 100 + 0.5) AS BIGINT) AS min_price_centi,
  CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS max_price_centi,
  min(o_orderdate) AS min_date,
  max(o_orderdate) AS max_date
FROM orders"""
    }
  )
}
