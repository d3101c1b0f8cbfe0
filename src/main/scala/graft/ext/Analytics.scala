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
    * Scale shape: step 1 is one hash aggregate on the user key; each
    * later step is a semi-join-shaped aggregate against the previous
    * step's (user, t_prev) — every shuffle in the chain is keyed on
    * the SAME user column, so after the first Exchange the plan reuses
    * the partitioning (no re-shuffle per step; AQE confirms). Cost is
    * O(steps · |events of that type|), never a per-user collect or a
    * cross join. The per-step frames shrink monotonically (funnel
    * property), so later steps are cheaper, not costlier.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("user"), col(typeCol).as("etype"), col(timeCol).as("t"))
    // (user, first time reaching step k) — fold the step chain
    var reached = e.filter(col("etype") === steps.head)
      .groupBy("user").agg(min(col("t")).as("t_reach"))
    val counts = Seq.newBuilder[(Int, String, DataFrame)]
    counts += ((1, steps.head, reached))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      reached = e.filter(col("etype") === step)
        .join(reached.select(col("user"), col("t_reach").as("t_prev")), "user")
        .filter(col("t") > col("t_prev"))
        .groupBy("user").agg(min(col("t")).as("t_reach"))
      counts += ((i + 1, step, reached))
    }
    counts.result()
      .map { case (idx, step, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(idx).as("step_idx"), lit(step).as("step"), col("n_users"))
      }
      .reduce(_ unionByName _)
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
      .withColumn("t_sec", col(timeCol).cast("long"))
      .withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col(valueCol)).over(w))
      .withColumn("w_max", max(col(valueCol)).over(w))
  }
}
