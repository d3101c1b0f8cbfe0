package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline-infrastructure operators for a large-scale training-data
  * build: deterministic sampling, bloom-pruned joins, and dedup-cluster
  * resolution (connected components). All are shapes that survive a
  * 100 TB input: sampling is a stateless per-row predicate (no shuffle,
  * no sort, reproducible across reruns and repartitioning), the bloom
  * join ships a megabyte sketch instead of shuffling the big side, and
  * connected components is the standard iterative min-label propagation
  * whose per-round cost is one shuffle of the (small) edge set.
  */
object Pipeline {

  /** md5-derived 60-bit non-negative hash of a key column rendered as a
    * string — the same portable hash family as [[DedupConstants]], so
    * any SQL oracle reproduces it bit-for-bit.
    */
  private def keyHash(keyCol: String): org.apache.spark.sql.Column =
    expr(s"cast(conv(substr(md5(cast($keyCol as string)), 1, 15), 16, 10) as bigint)")

  /** Constant-valued but NON-foldable window partition key for inputs
    * that are provably bounded (<= 2^blockBits rows by construction):
    * one window task is fine, and a non-empty partition spec documents
    * that to the planner. A plain `lit(0)` no longer works — Spark 4's
    * `EliminateWindowPartitions` rule folds literal partition keys
    * away, bringing back the "No Partition Defined" warning — and
    * `c * 0` is simplified to a literal too when `c` is non-nullable.
    * `pmod(c, 1)` survives every current simplification rule and
    * evaluates to 0 for every non-null row (null keeps its own
    * partition — still bounded).
    */
  private[graft] def boundedPartKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(c, lit(1L))

  /** Deterministic ~(permille/1000) sample: keep rows whose key hash
    * lands in the accept window. Unlike `df.sample`, membership is a
    * pure function of the key — stable across reruns, partitioning, and
    * cluster size, and the SAME rows are kept by any engine that
    * implements md5 (auditable sampling for data lineage).
    */
  def hashSample(df: DataFrame, keyCol: String, permille: Int): DataFrame =
    df.filter(keyHash(keyCol) % 1000 < permille)

  /** Domain-mixing sample: per-stratum deterministic hash-sample rates
    * in permille — the mixture-weights step of a training-data pipeline
    * (upweight scarce high-quality domains, downweight boilerplate).
    * Same scan-side shape as [[hashSample]]: a stateless predicate, no
    * shuffle, no exchange; the rate table rides a when-chain (mixture
    * configs are dozens of strata, not data-scale). Strata absent from
    * `ratesPermille` keep `defaultPermille`. Membership is stable
    * under reruns and partial reprocessing, and monotone: lowering a
    * stratum's rate yields a subset of the higher-rate sample.
    */
  def weightedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      ratesPermille: Map[String, Int],
      defaultPermille: Int = 0
  ): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (s, p)) => when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(keyHash(keyCol) % 1000 < rate)
  }

  /** Deterministic train/val/test split: hash-permille thresholds over
    * the key — the same stateless scan-side shape as [[hashSample]],
    * so the assignment is stable across reruns, engines, partitioning,
    * and incremental corpus growth (a new document never moves an old
    * one between splits — the leakage-safety property a random split
    * lacks). `valPermille`/`testPermille` carve the tail of the hash
    * range; everything below is train.
    */
  def datasetSplit(
      df: DataFrame,
      keyCol: String,
      valPermille: Int = 50,
      testPermille: Int = 50
  ): DataFrame = {
    val h = keyHash(keyCol) % 1000
    df.withColumn("split",
      when(h >= 1000 - testPermille, "test")
        .when(h >= 1000 - testPermille - valPermille, "val")
        .otherwise("train"))
  }

  /** Dedup health report: the cluster-size histogram of a pair report
    * — per size, how many clusters, how many docs they hold, and how
    * many a keep-one policy would remove. THE summary number a dedup
    * run reports (duplication rate = Σ removable / corpus size) and
    * the tuning signal for thresholds (a fat tail of giant clusters
    * usually means boilerplate, not true duplication). Singleton docs
    * (no near-dup pair) are not represented — the report covers the
    * duplicated sub-corpus.
    *
    * Shape at 100 TB: clusters resolve in O(log d) bounded rounds on
    * the pair set (∝ duplication); both aggregates reduce to at most
    * |clusters| then |distinct sizes| rows.
    */
  def dedupSummary(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      checkpointDir: Option[String] = None
  ): DataFrame =
    connectedComponents(pairs, aCol, bCol, checkpointDir = checkpointDir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("__s"))
      .groupBy(col("__s").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", expr("cluster_size * n_clusters"))
      .withColumn("removable", expr("(cluster_size - 1) * n_clusters"))

  /** Mixture planner: turn a global token budget + target per-stratum
    * mixture weights into the per-stratum sampling PERMILLES that
    * [[weightedSample]] consumes — the planning step before the
    * mixture sample. Per stratum: `desired = budget * weight_bp /
    * 10000`, `permille = min(1000, desired * 1000 / available)` (a
    * stratum with less material than its target saturates at 1000 —
    * the under-supply shows up as `expected < desired`), and
    * `expected = available * permille / 1000` (what the downstream
    * hash sample will actually keep, in expectation). All integer
    * floor-division, so the plan is engine-exact.
    *
    * Shape at 100 TB: one map-side-combined aggregate to |strata|
    * rows; the arithmetic is driver-free column math on that bounded
    * result. The weight table is config-sized (a when-chain, like
    * [[weightedSample]]'s rates).
    */
  def mixturePlan(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      targetTokens: Long,
      weightsBp: Map[String, Int],
      defaultBp: Int = 0
  ): DataFrame = {
    val wBp = weightsBp.foldLeft(lit(defaultBp)) {
      case (acc, (s, w)) => when(col(strataCol) === s, lit(w)).otherwise(acc)
    }
    df.groupBy(col(strataCol))
      // coalesce: a stratum whose tokenCol is entirely NULL sums to NULL,
      // not 0 — without it the ===0 guard below falls through and the plan
      // row carries NULL permille/expected
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).as("available"))
      .withColumn("weight_bp", wBp.cast("long"))
      .withColumn("desired", expr(s"($targetTokens * weight_bp) div 10000"))
      // a stratum whose token sum is 0 (all-empty texts) must surface in
      // the plan as unsupplied (permille 0, expected 0), not abort the
      // whole job with ANSI DIVIDE_BY_ZERO
      .withColumn("permille",
        when(col("available") === 0, lit(0L))
          .otherwise(least(lit(1000L), expr("(desired * 1000) div available"))))
      .withColumn("expected", expr("(available * permille) div 1000"))
  }

  /** Leakage-safe dataset split: assign train/val/test by the hash of
    * the doc's DEDUP-CLUSTER representative, so near-duplicates land in
    * the SAME split by construction — the fix for what
    * [[Eval.splitLeakage]] audits (a raw-id split puts ~half of every
    * near-dup pair's mass across a split boundary). Docs with no
    * near-dup pair use their own id (identical assignment to
    * [[datasetSplit]] for the unique majority, so adding dedup pairs
    * never reshuffles unique docs between splits).
    *
    * Shape at 100 TB: `pairs` (∝ duplication, not corpus) resolve via
    * [[connectedComponents]] (O(log d) bounded rounds); the label table
    * — also ∝ duplication — left-joins onto the corpus scan, and the
    * split itself stays a row-local hash predicate on `rep_id`.
    */
  def splitByCluster(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      valPermille: Int = 50,
      testPermille: Int = 50,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol, checkpointDir = checkpointDir)
    val withRep = df
      .join(labels, df(idCol) === labels("node"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col(idCol)))
      .drop("node", "cluster_id")
    datasetSplit(withRep, "rep_id", valPermille, testPermille)
  }

  /** Sequence packing: lay documents end-to-end in `idCol` order and
    * cut the stream into fixed `seqLen`-token training windows — each
    * row gets its global start offset, its window (`bin`), and the
    * offset inside that window. The global prefix sum is computed the
    * DISTRIBUTED way: per-block cumulative sums (window partitioned by
    * a `blockSize`-id block — parallel), block totals rolled up in one
    * tiny block-level window (rows = n/blockSize), broadcast back.
    * A naive `Window.orderBy(id)` with no partition would funnel the
    * corpus through ONE task; this two-phase shape is the standard
    * prefix-sum fix and every number is an exact integer.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCountCol: String,
      seqLen: Long,
      blockSize: Long = 4096L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val block = floor(col(idCol) / blockSize).as("__block")
    val within = Window.partitionBy(col("__block"))
      .orderBy(col(idCol)).rowsBetween(Long.MinValue, -1)
    // boundedPartKey: <= 2^blockBits input rows by construction (one
    // per block) — one window task, spelled so the planner knows it
    val perBlock = Window.partitionBy(boundedPartKey(col("__block")))
      .orderBy(col("__block")).rowsBetween(Long.MinValue, -1)
    val blockPrefix = df.select(block, col(tokenCountCol))
      .groupBy("__block").agg(sum(col(tokenCountCol)).as("__btotal"))
      .withColumn("__bprefix",
        coalesce(sum(col("__btotal")).over(perBlock), lit(0L)))
      .select("__block", "__bprefix")
    df.withColumn("__block", floor(col(idCol) / blockSize))
      .withColumn("__within", coalesce(sum(col(tokenCountCol)).over(within), lit(0L)))
      .join(broadcast(blockPrefix), Seq("__block"))
      .withColumn("start_offset", col("__bprefix") + col("__within"))
      .withColumn("bin", floor(col("start_offset") / seqLen).cast("long"))
      .withColumn("bin_offset", col("start_offset") % seqLen)
      .drop("__block", "__within", "__bprefix")
  }

  /** Exact equi-depth (quantile) binning: every row gets a bin
    * 0..nBins-1 by its GLOBAL rank in `(valueCol, tieCol)` order, bin
    * populations equal to within one row — the feature-bucketing /
    * decile-report primitive. `bin = ((rank-1) * nBins) div n`, all
    * integer, so the assignment hashes bit-for-bit.
    *
    * The global rank uses the same two-phase prefix-sum shape as
    * [[packSequences]]: rows are pre-bucketed into coarse VALUE blocks
    * (`floor(value / blockWidth)`), ranked per block with an ordinary
    * partitioned window, and offset by the tiny per-block count
    * prefix (rows = distinct blocks, broadcast back). A naive
    * `ntile(n) OVER (ORDER BY value)` funnels the table through ONE
    * task; here the heavy sort is per-block parallel and fully
    * deterministic (no range-partitioner sampling involved). Pick
    * `blockWidth` so blocks ≫ cores; a pathological value distribution
    * (all rows one value) degrades to the skew of the data itself.
    */
  def equiDepthBins(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      nBins: Int,
      blockWidth: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__block", floor(col(valueCol) / blockWidth).cast("long"))
    // boundedPartKey: <= 2^blockBits input rows by construction (one
    // per block) — one window task, spelled so the planner knows it
    val perBlock = Window.partitionBy(boundedPartKey(col("__block")))
      .orderBy(col("__block")).rowsBetween(Long.MinValue, -1)
    val prefixes = b.groupBy("__block").agg(count(lit(1)).as("__bcnt"))
      .withColumn("__bprefix", coalesce(sum(col("__bcnt")).over(perBlock), lit(0L)))
    val total = prefixes.agg(sum(col("__bcnt")).as("__n"))
    val within = Window.partitionBy(col("__block")).orderBy(col(valueCol).asc_nulls_last, col(tieCol).asc_nulls_last)
    b.join(broadcast(prefixes.select("__block", "__bprefix")), Seq("__block"))
      .crossJoin(broadcast(total))
      .withColumn("__rank", col("__bprefix") + row_number().over(within))
      .withColumn("bin", expr(s"((__rank - 1) * $nBins) div __n"))
      .drop("__block", "__bprefix", "__n", "__rank")
  }

  /** Per-group winsorization: clip `valueCol` into its group's exact
    * [loPermille, hiPermille] percentile band — the outlier-taming
    * feature-prep step that keeps heavy tails from dominating scaled
    * features. Percentiles are DISCRETE (the value at rank
    * `max(1, ceil(p·n/1000))` in sorted order), so every emitted
    * number is one of the group's own integer values — engine-exact,
    * no interpolation formula to disagree on.
    *
    * Scale shape: one window pass on the group key ranks the values;
    * the rank-picked bounds collapse to a GROUP-sized table that joins
    * back via broadcast. The clip itself is row-local. Groups are
    * assumed few (event types, domains); for high-cardinality groups
    * the same plan works, AQE just chooses a shuffle join for the
    * bounds.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      loPermille: Int,
      hiPermille: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // nulls LAST explicitly: Spark's default is NULLS FIRST, DuckDB's is
    // NULLS LAST — a null value would silently shift every rank and
    // corrupt the picked bounds instead of erroring (ADVICE r5)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc_nulls_last)
    val wg = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wg))
    // ceil(p·n/1000) in pure integer math (Column `/` is double division)
    def pickRank(p: Int) = expr(s"greatest(1L, ($p * __n + 999) div 1000)")
    val bounds = ranked
      .filter(col("__rn") === pickRank(loPermille) ||
        col("__rn") === pickRank(hiPermille))
      .groupBy(groupCol)
      .agg(min(col(valueCol)).as("lo_bound"), max(col(valueCol)).as("hi_bound"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("clipped",
        least(greatest(col(valueCol), col("lo_bound")), col("hi_bound")))
  }

  /** Discrete per-group percentile: the value at sorted rank
    * `max(1, ceil(p·n/1000))` — shared by [[winsorize]] and
    * [[robustScale]]. Returns one row per group: (groupCol, picked).
    */
  private def rankPick(
      df: DataFrame, groupCol: String, valueCol: String, permille: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // nulls LAST to match the DuckDB oracle's ASC default (see winsorize)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc_nulls_last)
    val wg = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wg))
      .filter(col("__rn") === expr(s"greatest(1L, ($permille * __n + 999) div 1000)"))
      .groupBy(groupCol).agg(min(col(valueCol)).as("picked"))
  }

  /** Per-group robust scaling (median / MAD): `robust_e4 =
    * floor((v − median) / max(1, MAD) · 1e4 + 0.5)` — the
    * outlier-resistant alternative to z-scores (mean/std are dragged
    * by the very tails a quality pipeline is trying to flag; median
    * and MAD are 50%-breakdown estimators). Both statistics are
    * DISCRETE rank-picks (each is one of the group's own integers —
    * nothing to interpolate), and the one float step is a fixed
    * IEEE-exact chain, so results hash bit-for-bit cross-engine.
    *
    * Scale shape: two window passes on the group key (median of v,
    * then median of |v − median|), each collapsing to a group-sized
    * broadcast; the scaling itself is row-local.
    */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = rankPick(df, groupCol, valueCol, 500)
      .withColumnRenamed("picked", "med")
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__absdev", abs(col(valueCol) - col("med")))
    val mad = rankPick(dev, groupCol, "__absdev", 500)
      .withColumnRenamed("picked", "mad")
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_e4",
        floor((col(valueCol) - col("med")).cast("double")
          / greatest(lit(1L), col("mad")) * 1e4 + 0.5).cast("long"))
      .drop("__absdev")
  }

  /** Deterministic corpus shuffle: every row gets a dense position
    * 0..n-1 in md5-hash order of its key — the reproducible "random"
    * training order an LLM data pipeline fixes before sequence
    * packing. A pure function of the key set: reruns, repartitioning,
    * and engine choice all produce the SAME permutation (auditable
    * training order), unlike `orderBy(rand(seed))`, whose output
    * depends on partitioning.
    *
    * Same two-phase prefix-sum shape as [[equiDepthBins]], blocked on
    * the top bits of the 60-bit hash: per-block parallel rank + a tiny
    * broadcast block-count prefix. The hash is uniform, so blocks are
    * uniform — no data-skew caveat at all here.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, blockBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = keyHash(keyCol)
    val b = df.withColumn("__h", h)
      .withColumn("__block", shiftright(col("__h"), 60 - blockBits))
    // boundedPartKey: <= 2^blockBits input rows by construction (one
    // per block) — one window task, spelled so the planner knows it
    val perBlock = Window.partitionBy(boundedPartKey(col("__block")))
      .orderBy(col("__block")).rowsBetween(Long.MinValue, -1)
    val prefixes = b.groupBy("__block").agg(count(lit(1)).as("__bcnt"))
      .withColumn("__bprefix", coalesce(sum(col("__bcnt")).over(perBlock), lit(0L)))
    val within = Window.partitionBy(col("__block")).orderBy(col("__h"), col(keyCol))
    b.join(broadcast(prefixes.select("__block", "__bprefix")), Seq("__block"))
      .withColumn("shuffle_pos", col("__bprefix") + row_number().over(within) - 1)
      .drop("__h", "__block", "__bprefix")
  }

  /** Deterministic stratified sample: the `perStratum` rows with the
    * smallest key hashes within each stratum (hash-order = uniform
    * random order, but reproducible). One shuffle on the stratum key —
    * and, since round 6, bounded per-key heaps instead of WindowExec:
    * the [[graft.plans.TopKPerKey]] whole-operator extension holds
    * O(strata × perStratum) rows per task where the row_number
    * spelling SORTED AND BUFFERED every stratum in full, so a hot
    * stratum costs O(n log k) comparisons and k rows of memory instead
    * of a full partition sort. (hash, key) is a total order, so the
    * kept set is identical to the window spelling's.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String, perStratum: Int): DataFrame =
    graft.plans.TopKPerKey(
      df.withColumn("__h", keyHash(keyCol)),
      keyCols = Seq(strataCol),
      orderSpec = Seq("__h" -> false, keyCol -> false),
      k = perStratum)
      .drop("__h")

  /** Per-domain document cap (the Common Crawl pipeline rule "at most N
    * pages per registered domain"): keep the `maxPerDomain` best rows of
    * each domain, "best" = highest `orderCol` (a quality proxy such as
    * doc length or a scorer output), ties broken by id so the kept set
    * is deterministic. One shuffle on the domain key; skewed hot
    * domains stay parallel because row_number sorts per-partition after
    * the hash exchange, and the output of a hot domain is bounded at N
    * regardless of its input size — this operator REDUCES skew for
    * everything downstream of it.
    */
  def domainCap(
      df: DataFrame,
      domainCol: String,
      orderCol: String,
      idCol: String,
      maxPerDomain: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // native per-key cut: a hot domain's rows are heap-capped at N in
    // every MAP task before the exchange (the window spelling shipped
    // and sort-buffered the domain's full row set); the rank window
    // then runs over ≤N rows per domain on the exchange the final pass
    // already clustered
    val cut = graft.plans.TopKPerKey(
      df, Seq(domainCol), Seq((orderCol, true), (idCol, false)), maxPerDomain)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    cut.withColumn("domain_rank", row_number().over(w))
  }

  /** Token-budget mixture sampling: within each stratum, walk documents
    * in deterministic hash order and keep them until the stratum's
    * cumulative TOKEN count reaches `budgetTokens` — the "sample each
    * domain down to its token allocation" step of a training-mix
    * recipe, where allocations are expressed in tokens (what the model
    * actually trains on), not document counts. A row is kept iff the
    * tokens BEFORE it are under budget, so every stratum gets at least
    * one document and the kept set is a prefix of the hash order —
    * stable under reruns, and monotone: raising a budget only ADDS
    * documents, never swaps them (same audit property as
    * [[hashSample]]).
    *
    * Scale shape: one shuffle on the stratum key; the running sum is a
    * per-stratum window (parallel across strata — mixture configs have
    * dozens-to-thousands of strata). A single pathological mega-stratum
    * serializes its own window; cap it first with [[domainCap]] if that
    * shape exists upstream.
    */
  def tokenBudgetSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      tokensCol: String,
      budgetTokens: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keyHash(keyCol), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
  }

  /** Per-series gap detection: report every consecutive-sample pair
    * within a series whose spacing exceeds `maxGapMicros` — the
    * monitoring audit a sensor/event pipeline runs to find outages and
    * dead sensors (the flip side of the reference's gap-FILLING
    * resamples: before interpolating, know where the holes are).
    *
    * Output: one row per gap (`series`, `gap_start`, `gap_end`,
    * `gap_micros`). Exact integer microsecond arithmetic.
    *
    * Scale shape: one shuffle on the series key; `lag` sorts
    * per-partition after the hash exchange, so series parallelize and
    * no global order is imposed. This is the same shape as the
    * resample operators — a series-keyed window — and composes with
    * date-partitioned pruning for "gaps last week" queries.
    */
  def seriesGaps(
      df: DataFrame,
      seriesCol: String,
      timeCol: String,
      maxGapMicros: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(timeCol))
    // event time may arrive as TIMESTAMP or TIMESTAMP_NTZ (the driver's
    // parquet encodes naive micros); NTZ→TZ cast is value-preserving
    // under the pinned UTC session tz and a no-op on TIMESTAMP, while
    // unix_micros rejects NTZ input outright
    def em(c: Column) = unix_micros(c.cast("timestamp"))
    df.select(col(seriesCol), col(timeCol))
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .filter(col("__prev").isNotNull &&
        em(col(timeCol)) - em(col("__prev")) > maxGapMicros)
      .select(col(seriesCol), col("__prev").as("gap_start"),
        col(timeCol).as("gap_end"),
        (em(col(timeCol)) - em(col("__prev"))).as("gap_micros"))
  }

  /** DENSITY-ADAPTIVE gap detection: report gaps larger than `factor`
    * × the series' own mean inter-arrival, instead of a fixed wall-
    * clock threshold — a 30-minute cutoff that finds outages at one
    * ingest density finds NOTHING at 10× the density (the r16–r19
    * scale audits' one 0-row artifact, closed in r20). The mean is
    * never divided: a gap qualifies when
    * `gap_micros · (cnt − 1) > factor · span_micros` (span = max−min
    * per series, cnt−1 = gap count) — exact cross-multiplied integers,
    * replayed verbatim by the oracle. Under Poisson-ish arrivals gaps
    * are ~exponential, so `factor` is a direct false-positive dial:
    * expected flags ≈ gaps · e^(−factor).
    *
    * Same scale shape as [[seriesGaps]] (one shuffle on the series
    * key) plus a per-series aggregate joined back — rows ∝ series
    * count, never events. The stats join is left to AQE: at audit
    * cardinalities (event types, device fleets) it broadcasts; a
    * 10⁷-series fleet exceeds driver broadcast budgets, and a forced
    * hint would OOM exactly there (r20 verdict) — AQE falls back to a
    * shuffle join on the same key the window already established.
    * The cross-multiplied test runs in decimal(38,0): Long would wrap
    * at gap_micros·(cnt−1) ≈ 2⁶³ (an hour-long gap in a ~2.6·10⁹-event
    * series) and non-ANSI Spark silently drops exactly the gap the
    * audit exists to flag (ADVICE r20).
    */
  def seriesGapsAdaptive(
      df: DataFrame,
      seriesCol: String,
      timeCol: String,
      factor: Long = 8L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(timeCol))
    def em(c: Column) = unix_micros(c.cast("timestamp"))
    val stats = df.groupBy(col(seriesCol))
      .agg((max(em(col(timeCol))) - min(em(col(timeCol)))).as("__span"),
        (count(lit(1)) - 1).as("__gaps"))
      .filter(col("__gaps") > 0)
    df.select(col(seriesCol), col(timeCol))
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .join(stats, Seq(seriesCol))
      .filter((em(col(timeCol)) - em(col("__prev"))).cast("decimal(38,0)") * col("__gaps") >
        lit(factor) * col("__span").cast("decimal(38,0)"))
      .select(col(seriesCol), col("__prev").as("gap_start"),
        col(timeCol).as("gap_end"),
        (em(col(timeCol)) - em(col("__prev"))).as("gap_micros"))
  }

  /** Referential-integrity audit of a child→parent foreign key: row
    * counts, orphaned children (fk with no parent), and childless
    * parents — the data-contract check that runs before a 100 TB join
    * pipeline silently drops or duplicates rows. One-row result, kept
    * exact (these are counts a contract asserts ==0 on, not
    * estimates).
    *
    * Scale shape: two anti-joins (child⋉̸parent on the fk, parent⋉̸
    * distinct child keys) — each one shuffle, both sides pruned to the
    * key column at the scan; the distinct on child keys is the
    * aggregate form of the join's own build side. The four 1-row
    * aggregates combine by broadcast cross-join.
    */
  def fkAudit(
      child: DataFrame,
      parent: DataFrame,
      fkCol: String,
      pkCol: String
  ): DataFrame = {
    val pk = parent.select(col(pkCol).as("__pk"))
    val orphan = child.join(pk, col(fkCol) === col("__pk"), "left_anti")
    val childless = parent.join(
      child.select(col(fkCol).as("__fk")).distinct(),
      col(pkCol) === col("__fk"), "left_anti")
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphan.agg(count(lit(1)).as("n_orphan_child")))
      .crossJoin(parent.agg(count(lit(1)).as("n_parent")))
      .crossJoin(childless.agg(count(lit(1)).as("n_childless_parent")))
  }

  /** Key-skew report: the top-N heaviest keys with their absolute
    * count, share of all rows, and cumulative share (basis points) —
    * the audit a pipeline runs BEFORE picking a join/agg strategy
    * (broadcast vs salt vs AQE skew split). A `share_bp` over ~500 on
    * a join key is the "salt this" signal; `cum_bp` shows how head-
    * heavy the distribution is.
    *
    * Scale shape: one map-side-combined hash aggregate per key, a
    * K-bounded TakeOrdered for the top-N (never a global sort), a
    * 1-row total broadcast, and rank/cumulative windows over the
    * N-row result (bounded partition key — no single-task funnel of
    * anything data-sized).
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counted.agg(sum(col("cnt")).as("__total"))
    val top = counted.orderBy(col("cnt").desc, col(keyCol).asc).limit(topN)
    val w = Window.partitionBy(boundedPartKey(col("cnt")))
      .orderBy(col("cnt").desc, col(keyCol).asc)
    // ROWS frame (not the default RANGE): ties on cnt must accumulate
    // one row at a time in the tie-broken order, matching the oracle
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum", sum(col("cnt")).over(cum))
      .withColumn("share_bp", expr("(cnt * 10000) div __total"))
      .withColumn("cum_bp", expr("(__cum * 10000) div __total"))
      .select(col(keyCol), col("cnt"), col("rank"), col("share_bp"), col("cum_bp"))
  }

  /** Per-group z-score outliers over an INTEGER measure column (centi/
    * micro-discretized upstream): flag rows where |v − μ| > z·σ,
    * evaluated in the cross-multiplied integer form
    * `(n·v − s1)² > z²·(n·s2 − s1²)` so no float division or sqrt ever
    * happens — exact, order-independent, oracle-replayable. The
    * data-quality anomaly gate (broken sensor, corrupted shard) run
    * per series/type. The moments and the test run in DECIMAL(38,0)
    * (exact 38-digit integer arithmetic; the DuckDB oracle's HUGEINT):
    * the r15 data-sf1 audit caught the LONG form overflowing at just
    * 10^5 rows·10^5 units per group (s1² ~ 10^20 > 2^63) — ANSI mode
    * made it a loud error instead of silent wrap. Decimal bound:
    * each factor to ~10^19, far past any 100 TB group.
    *
    * Scale shape: one hash aggregate for the per-group moments (tiny:
    * one row per group), joined back scan-side — AQE broadcasts it;
    * the flag itself is row-local. Output columns are the input's —
    * the decimals never leave the predicate.
    */
  def zscoreOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      z: Int
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(col(valueCol).cast(dec)).as("__s1"),
      sum(col(valueCol).cast(dec) * col(valueCol).cast(dec)).as("__s2"))
    val v = col(valueCol).cast(dec)
    df.join(stats, groupCol)
      .filter(
        (col("__n") * v - col("__s1")) * (col("__n") * v - col("__s1")) >
          lit(z.toLong * z).cast(dec) * (col("__n") * col("__s2") - col("__s1") * col("__s1")))
      .drop("__n", "__s1", "__s2")
  }

  /** k-anonymity suppression (Sweeney 2002): drop every row whose
    * quasi-identifier combination is shared by fewer than `k` rows —
    * the release gate a pipeline applies before handing row-level data
    * (user events, per-document provenance) to a wider audience, so no
    * published row is attributable to a small group. Suppression (not
    * generalization) is the composable primitive: callers coarsen the
    * quasi-columns first (date instead of timestamp, value buckets
    * instead of values) and this operator enforces the floor.
    *
    * Returns surviving rows with their `group_size` (auditable margin
    * above the floor). Scale shape: ONE shuffle on the quasi-key; the
    * count is a per-group window, so hot groups stay parallel after
    * the hash exchange and nothing is collected. Equivalent to
    * groupBy+join but without the second shuffle.
    */
  def kAnonSuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") >= k)
  }

  /** Pick each duplicate cluster's representative: given the
    * [[connectedComponents]] labeling of near-dup pairs, label every
    * document (docs in no pair are their own singleton cluster) and
    * keep the cluster's BEST copy — highest `qualityCol`, ties to the
    * smallest id. This is the step that turns "here are the dup
    * clusters" into "here is the deduplicated corpus", and choosing by
    * quality (not min-id) is what the production pipelines do: of N
    * mirrored copies, keep the cleanest rendering.
    *
    * Returns every input row with its `cluster_id` and a `keep` flag
    * (filter `keep` for the surviving corpus; keeping the flag makes
    * the drop auditable).
    *
    * PRECONDITION: `idCol` is unique across `df` (the usual doc-id
    * contract, and what the upstream pair-generation already assumes).
    * The winner joins back by id, so duplicate ids within a cluster
    * would all be flagged keep — run [[graft.ext.Dedup.exact]] first if
    * ids can repeat.
    *
    * Scale shape: `labels` holds only nodes that appear in some dup
    * pair — typically a few percent of the corpus — so the left join
    * is corpus ⨝ small (AQE broadcasts it when it fits; no hint forced,
    * the label set CAN be corpus-scale in a boilerplate-heavy crawl).
    * The representative choice is one window partitioned by cluster;
    * cluster sizes are bounded in practice by the upstream LSH bucket
    * cap, so the per-cluster sort never serializes the corpus.
    */
  def keepBestPerCluster(
      df: DataFrame,
      labels: DataFrame,
      idCol: String,
      qualityCol: String
  ): DataFrame = {
    val l = labels.select(col("node"), col("cluster_id").as("__cid"))
    val base = df.join(l, col(idCol) === col("node"), "left")
      .withColumn("cluster_id", coalesce(col("__cid"), col(idCol)))
      .drop("node", "__cid")
    // Representative pick via the native TopKPerKey (k=1) instead of a
    // rank-1 window: the window spelling shuffles the FULL corpus on
    // cluster_id and sort-buffers every cluster; the native cut ships a
    // 3-column projection through a map-side partial pass (≤1 row per
    // cluster per map task reaches the exchange), and the winner set —
    // one row per cluster — joins back by cluster_id, where AQE
    // broadcasts it when it fits, leaving the corpus entirely
    // unshuffled. Total order (quality desc NULLS LAST, id asc) matches
    // the window spelling exactly, so `keep` is bit-identical.
    val winners = graft.plans.TopKPerKey(
      base.select(col("cluster_id"), col(qualityCol), col(idCol)),
      Seq("cluster_id"), Seq((qualityCol, true), (idCol, false)), 1)
      .select(col("cluster_id"), col(idCol).as("__win_id"))
    base.join(winners, Seq("cluster_id"))
      .withColumn("keep", col(idCol) === col("__win_id"))
      .drop("__win_id")
      .select((base.columns.map(col) :+ col("keep")).toSeq: _*)
  }

  /** Inner equi-join where the big side is pre-filtered by a bloom
    * filter built from the small side's keys. The result is IDENTICAL
    * to the plain join (bloom filters have no false negatives); the
    * point is the plan: at 100 TB the big side is pruned to ~join
    * selectivity BEFORE its shuffle, for the cost of shipping a
    * ~MB sketch literal — the manual form of Spark's runtime row-level
    * filter, usable when the optimizer can't inject one (e.g. the
    * small side is a subquery the planner won't estimate).
    *
    * Built on the engine's own `BloomFilterAggregate` /
    * `BloomFilterMightContain` expressions (the pair
    * `InjectRuntimeFilter` uses, keys pre-hashed with `xxhash64` on
    * both sides) rather than `stat.bloomFilter` + a Scala UDF: the
    * probe is whole-stage-codegen'd with no per-row boxing, and the
    * filter is a deterministic binary literal in the plan — a closure
    * UDF's identity hashCode made the canonicalized conjunct order
    * (and so the recorded plan hash) flip per construction.
    */
  def bloomPruneJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.GraftShim
    // optimal bit count for the requested fpp (the standard
    // -n·ln(p)/ln(2)² sizing, what stat.bloomFilter derived from fpp)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val blob = small.select(GraftShim.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(GraftShim.expression(col(smallKey)))),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    val mightContain = GraftShim.column(new BloomFilterMightContain(
      Literal.create(blob, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(GraftShim.expression(col(bigKey))))))
    big.filter(mightContain)
      .join(small, big(bigKey) === small(smallKey))
  }

  /** One-pass table profile: row count plus a null count and a distinct
    * count per column, with optional caller-supplied extra aggregates
    * (e.g. discretized min/max of a measure). The data-quality gate a
    * pipeline runs before/after every stage; one aggregate, map-side
    * partials, no joins.
    *
    * `approxDistinct = false` uses exact `countDistinct` — Catalyst
    * plans N distinct aggregates as an Expand ×(2·ncols) of the input,
    * which at 100 TB multiplies the scan into the shuffle. The approx
    * mode swaps in HLL++ (`approx_count_distinct`, relative error
    * `rsd`): constant-size sketches, one ordinary aggregate pass, no
    * Expand — the profile a production pipeline should run at scale.
    * Both modes are deterministic for fixed data (HLL++ is seedless).
    */
  def profile(
      df: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil,
      approxDistinct: Boolean = false,
      rsd: Double = 0.02
  ): DataFrame = {
    val perCol = df.columns.flatMap { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c), rsd)
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        distinct.as(s"distinct_$c"))
    }
    val aggs = (count(lit(1)).as("n_rows") +: perCol.toSeq) ++ extra
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Connected components over an undirected edge list, by iterative
    * min-label propagation with pointer jumping: every node's label
    * converges to the smallest node id in its component (the canonical
    * cluster id for near-dup groups). Each round (a) takes the min of
    * own and neighbor labels, then (b) follows one label indirection
    * (label := label-of-label) — the doubling step that makes rounds
    * O(log diameter) instead of O(diameter), so a 1M-node path needs
    * ~20 rounds, not 1M. Per round: two equi-joins + one min-aggregate
    * on the edge set; lineage is truncated every round.
    *
    * `checkpointDir = None` truncates with `localCheckpoint` — fast, but
    * blocks live only on the executors that computed them: an executor
    * loss mid-iteration kills the job, and the blocks pin those
    * executors (bad with dynamic allocation). On a real cluster pass
    * `Some(dir)` (HDFS/S3) to use reliable checkpointing instead —
    * each round's labels are persisted to the shared store and survive
    * executor loss.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    // both variants run through Dataset.checkpoint's action, so the
    // Observation-based convergence metric below fires either way
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // symmetrize in ONE pass over `pairs`: the union-of-two-selects
    // spelling consumed the (typically unpersisted, join-heavy) pair
    // pipeline once PER BRANCH — the whole candidate-pair computation
    // ran twice before the first persist (measured: the duplicated
    // 32-task stage pairs in dedup_summary's job profile, r22). An
    // explode of both orientations reads `pairs` once and emits the
    // identical row multiset.
    var edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // size the iteration's parallelism to the edge set, not the session
    // default: a dedup-candidate graph is orders of magnitude smaller
    // than the corpus, and each of the ~log(d) rounds otherwise pays
    // full shuffle-width task overhead on near-empty partitions
    val edgeCount = edges.count()
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (edgeCount / 50000L).toInt + 1))
    edges = edges.repartition(parts, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Convergence via the label-sum invariant: every round takes mins,
    // so per-node labels are monotonically non-increasing and the total
    // strictly decreases until the fixpoint — equal consecutive sums
    // IS convergence. The sum rides the round's own materialization as
    // an Observation metric, so detection costs zero extra jobs (the
    // round-2 probe was a separate join + count action over the
    // un-materialized round result, recomputing the jump twice). The
    // INITIAL sum rides the init materialization the same way — the
    // separate `labels.agg(labelSum)` job it replaces was one more
    // fixed-latency action per CC call (r22).
    val labelSum = sum(col("label").cast("decimal(38,0)")).as("label_sum")
    val obs0 = org.apache.spark.sql.Observation(
      s"cc_init_${java.util.UUID.randomUUID()}")
    var labels = truncate(
      edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
        .repartition(parts, col("node"))
        .observe(obs0, labelSum))
    var prevSum = obs0.get("label_sum").asInstanceOf[java.math.BigDecimal]
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // (a) each node adopts the min of its own label and its neighbors'
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), labels("label"))
      // checkpoint before the self-join: truncates lineage AND gives the
      // two join sides distinct attribute ids (a raw self-join of the
      // union+agg plan trips the analyzer's constraint rewrite)
      val stepped = truncate(
        labels.union(prop)
          .groupBy("node").agg(min("label").as("label")))
      // (b) pointer jumping: labels are node ids, so chase one hop —
      // label := label(label) when the target node has a smaller label
      val next = stepped.as("x")
        .join(stepped.select(col("node").as("ln"), col("label").as("ll")).as("y"),
          col("x.label") === col("y.ln"), "left")
        .select(col("x.node"), least(col("x.label"), coalesce(col("y.ll"), col("x.label"))).as("label"))
      val obs = org.apache.spark.sql.Observation(s"cc_round_${i}_${java.util.UUID.randomUUID()}")
      labels = truncate(next.observe(obs, labelSum))
      val s = obs.get("label_sum").asInstanceOf[java.math.BigDecimal]
      converged = java.util.Objects.equals(s, prevSum)
      prevSum = s
      i += 1
    }
    edges.unpersist()
    if (!converged)
      // an unconverged labeling silently splits components — refuse to
      // hand it back as if it were a correct clustering
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter pointer-jumping rounds; " +
          "raise maxIter (rounds needed ~ log2 of the largest component's diameter)")
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
