package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream: sequential funnels and
  * cohort retention — the two queries every product-analytics engine
  * (and every training-data telemetry pipeline) runs at scale.
  * All arithmetic is dates/integers; results hash bit-for-bit.
  */
object Analytics {

  /** Strict sequential funnel: for each user, step k counts only if it
    * happened STRICTLY AFTER that user's step k-1 (first qualifying
    * occurrence each). Returns one row per step with the surviving
    * user count — the classic conversion table.
    *
    * Scale shape: SINGLE PASS over the step-filtered events. One hash
    * aggregate on the user key collects each user's (t, step) events;
    * a row-local fold over the time-sorted list computes the deepest
    * step reached (the greedy first-qualifying-occurrence walk — the
    * fold takes the EARLIEST step-(k+1) event strictly after the
    * step-k reach time, which is exactly the min-t chain definition);
    * a second, one-row aggregate counts survivors per step and
    * `inline`s to the step table. Exactly ONE scan of the events
    * input and ONE user-keyed shuffle regardless of step count — the
    * previous per-step join-chain re-derived the whole prefix for
    * every later step (O(steps²) scans at cluster scale; round-5
    * verdict item 2). Per-user state is that user's step-typed
    * events only (bounded by per-user activity, never corpus-sized).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepIdx = steps.zipWithIndex.map { case (s, i) => (s, i + 1) }
    // 1-based step index, resolved row-local (no join against a step table)
    val sidx = stepIdx.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col("etype") === s, lit(i)).otherwise(acc)
    }
    val e = events
      .select(col(userCol).as("user"), col(typeCol).as("etype"), col(timeCol).as("t"))
      .filter(col("etype").isInCollection(steps))
      .select(col("user"), struct(col("t"), sidx.as("sidx")).as("ev"))
    // Greedy fold over the user's time-sorted events: advance to step
    // k+1 on the first step-(k+1) event with t strictly after the
    // step-k reach time. Sorting the struct (t, sidx) breaks timestamp
    // ties by LOWER step first, and the strict `>` means an event at
    // the same instant as the previous reach never qualifies — the
    // same tie semantics as the min-t chain. The accumulator's t_reach
    // is seeded from the first event (reached=0 ignores it), keeping
    // the fold type-stable for any orderable time column.
    val perUser = e.groupBy("user")
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(
        aggregate(
          col("evs"),
          struct(lit(0).as("reached"), element_at(col("evs"), 1).getField("t").as("t_reach")),
          (acc, x) =>
            when(
              x.getField("sidx") === acc.getField("reached") + 1 &&
                (acc.getField("reached") === 0 || x.getField("t") > acc.getField("t_reach")),
              struct((acc.getField("reached") + 1).as("reached"), x.getField("t").as("t_reach"))
            ).otherwise(acc)
        ).getField("reached").as("reached"))
    // one-row aggregate: survivors at each depth (count ignores the
    // null branch of `when`, and is 0 — not null — on empty input)
    val counts = perUser.agg(
      count(when(col("reached") >= 1, lit(1))).as("n1"),
      stepIdx.drop(1).map { case (_, i) =>
        count(when(col("reached") >= i, lit(1))).as(s"n$i")
      }: _*)
    // 1 row -> steps rows without re-deriving the aggregate per step
    counts.select(inline(array(stepIdx.map { case (s, i) =>
      struct(lit(i).as("step_idx"), lit(s).as("step"), col(s"n$i").as("n_users"))
    }: _*)))
  }

  /** Weekly cohort retention: users are cohorted by the Monday week of
    * their FIRST event; `n_users` counts the cohort's users active in
    * each later week, keyed by whole-week offset. The standard
    * retention triangle, exact (no sampling).
    *
    * Scale shape: first-seen is one hash aggregate on the user key;
    * active weeks are a (user, week) distinct — both user-keyed, so
    * the join between them reuses the partitioning; the final
    * aggregate's keyspace is cohorts × offsets (tiny). Nothing is
    * date-parsed per row beyond `date_trunc`, and no window functions
    * are needed at all.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      timeCol: String
  ): DataFrame = {
    val e = events.select(col(userCol).as("user"), col(timeCol).as("t"))
    val cohorts = e.groupBy("user")
      .agg(to_date(date_trunc("week", min(col("t")))).as("cohort_week"))
    val active = e
      .select(col("user"), to_date(date_trunc("week", col("t"))).as("week"))
      .distinct()
    active.join(cohorts, "user")
      .groupBy("cohort_week",
        "week") // (cohort, week) pairs; offset derived post-agg (row-local)
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"),
        col("n_users"))
  }

  /** Trailing time-window features per entity: for every event, the
    * count / sum / max of that entity's events in the preceding
    * `windowSec` seconds (inclusive of the current instant) — the
    * classic online-feature shape ("purchases in the last hour") that
    * feeds fraud scores and session features.
    *
    * A RANGE frame over epoch seconds, not a ROWS frame: the window is
    * defined by TIME, so gaps and bursts are handled correctly, and
    * equal-timestamp peers all see the same frame — the result is
    * order-independent within ties and therefore deterministic.
    *
    * Scale shape: one shuffle on the entity key, then a per-partition
    * sort — the same cost as any per-entity window. Spark evaluates a
    * trailing range frame with a sliding two-pointer pass (each row
    * enters and leaves the frame once), so cost is O(events per
    * entity), not O(events × window). All arithmetic is integer
    * (epoch seconds, centi-units), so results hash bit-for-bit.
    */
  def rollingStats(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      valueCol: String,
      windowSec: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("t_sec"))
      .rangeBetween(-windowSec, 0)
    events
      // TIMESTAMP_NTZ rejects a direct →BIGINT cast; hop through
      // TIMESTAMP (no-op when already TZ, value-preserving under UTC)
      .withColumn("t_sec", col(timeCol).cast("timestamp").cast("long"))
      .withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col(valueCol)).over(w))
      .withColumn("w_max", max(col(valueCol)).over(w))
  }

  /** Distribution-drift report between two corpus snapshots — the
    * data-quality monitor a daily ingest runs before training mixes
    * shift silently: for every named dimension (categorical column or
    * derived bucket), the per-value counts of both snapshots side by
    * side with the per-dimension totals. One row per (dim, value)
    * observed in EITHER snapshot (absent side = 0). Counts and totals
    * are plain longs — drift measures (L1/TV distance, PSI, χ²) are a
    * reader-side fold over exact integers, so the report itself hashes
    * bit-for-bit cross-engine and never bakes in a libm-dependent log.
    *
    * Scale shape: ONE scan per snapshot regardless of dimension count
    * — the dims fan out row-locally as an exploded (dim, value) map —
    * into one map-side-combined count keyed by (dim, value); dimension
    * cardinality (languages, sources, length buckets), not corpus
    * size, bounds the shuffle and the result. Totals are a
    * dim-partitioned window over the count table (not a groupBy+join,
    * which would re-derive the join subtree and re-scan the
    * snapshots — plan-asserted). Nulls count under the sentinel value
    * "<null>" rather than vanishing (a drift monitor that drops nulls
    * misses the most common ingest bug); a column whose data literally
    * contains the string "<null>" merges with true nulls — pre-map
    * such values if the distinction matters. Each window partition
    * holds one dimension's whole value set — fine for categorical /
    * bucketed dims (the intended use); for an extreme-cardinality dim
    * (per-token drift over a web-scale vocabulary) compute that dim's
    * totals as a scalar aggregate joined back instead.
    */
  def driftReport(
      snapA: DataFrame,
      snapB: DataFrame,
      dims: Seq[(String, org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(dims.nonEmpty, "driftReport needs at least one dimension")
    require(dims.map(_._1).distinct.size == dims.size,
      // fail at call time, not per-row at execution (map() rejects
      // duplicate keys under the default EXCEPTION dedup policy)
      s"duplicate dimension names: ${dims.map(_._1).mkString(", ")}")
    val pairs = dims.flatMap { case (name, c) =>
      Seq(lit(name), coalesce(c.cast("string"), lit("<null>")))
    }
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(map(pairs: _*)).as(Seq("dim", "value")))
      .groupBy("dim", "value").agg(count(lit(1)).as(out))
    val a = counts(snapA, "n_a")
    val b = counts(snapB, "n_b")
    val joined = a.join(b, Seq("dim", "value"), "full_outer")
      .select(col("dim"), col("value"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // totals as a window over the counted rows, NOT a groupBy+join of
    // `joined` — that would re-derive the whole join subtree and scan
    // each snapshot twice (plan-asserted at one scan each). The window
    // runs over the dimension-cardinality-sized count table, so its
    // dim-keyed shuffle is negligible.
    val wDim = org.apache.spark.sql.expressions.Window.partitionBy("dim")
    joined
      .withColumn("tot_a", sum("n_a").over(wDim))
      .withColumn("tot_b", sum("n_b").over(wDim))
      .select("dim", "value", "n_a", "n_b", "tot_a", "tot_b")
  }

  /** Count-table caches registered by [[driftReportHiCard]]; released
    * via [[unpersistCaches]] (Bench/Verify call it between queries) —
    * the same deterministic-release split [[Dedup.unpersistSpanCaches]]
    * and [[Multimodal.unpersistCaches]] manage. */
  private val driftCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Release every drift count-table cache registered since the last
    * call — storage and registry both. */
  def unpersistCaches(): Unit = driftCaches.synchronized {
    driftCaches.foreach(_.unpersist(blocking = false))
    driftCaches.clear()
  }

  /** [[driftReport]] for EXTREME-cardinality dimensions (per-token
    * drift over a web-scale vocabulary) — the scalar-totals alternative
    * that scaladoc promises: same output schema and values, but no
    * window ever holds one dimension's whole value set in a single
    * partition.
    *
    * How: the zero-filled (dim, value, n_a, n_b) count table is built
    * exactly as in [[driftReport]] (one scan and one map-side-combined
    * aggregate per snapshot, full-outer joined) and PERSISTED — it is
    * vocabulary-sized, orders of magnitude smaller than the corpus,
    * and spills to disk if a 10^9-value dim outgrows memory. Totals
    * are then a dim-keyed scalar aggregate OVER THE CACHE (rows
    * proportional to dim count, i.e. nothing) broadcast back onto it.
    * No dim-partitioned window anywhere — the difference between
    * working and one-reducer-per-dim death at web-scale cardinality —
    * and the corpus is still scanned once per snapshot. (A rollup
    * could in principle emit counts and totals from one shuffle
    * without the cache, but Catalyst pushes the grouping-row filters
    * below the aggregate, splitting the exchange into non-reusable
    * variants — measured: it re-scans each snapshot per consumer.)
    * The cache registers for release via [[unpersistCaches]].
    */
  def driftReportHiCard(
      snapA: DataFrame,
      snapB: DataFrame,
      dims: Seq[(String, org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(dims.nonEmpty, "driftReportHiCard needs at least one dimension")
    require(dims.map(_._1).distinct.size == dims.size,
      s"duplicate dimension names: ${dims.map(_._1).mkString(", ")}")
    val pairs = dims.flatMap { case (name, c) =>
      Seq(lit(name), coalesce(c.cast("string"), lit("<null>")))
    }
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(map(pairs: _*)).as(Seq("dim", "value")))
      .groupBy("dim", "value").agg(count(lit(1)).as(out))
    val joined = counts(snapA, "n_a")
      .join(counts(snapB, "n_b"), Seq("dim", "value"), "full_outer")
      .select(col("dim"), col("value"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    driftCaches.synchronized { driftCaches += joined }
    val totals = joined.groupBy("dim")
      .agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    joined.join(broadcast(totals), Seq("dim"))
      .select("dim", "value", "n_a", "n_b", "tot_a", "tot_b")
  }
}
