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
  * divisions `pr div deg`, the damping step is `(850·Σ) div 1000` —
  * so every shuffled sum is exact integer arithmetic, order-independent
  * under any partitioning, and a SQL oracle replays it bit-for-bit.
  */
object Graph {

  /** Fixed-iteration PageRank. `edges` must already hold every arc
    * (add both directions for an undirected graph) and be
    * deduplicated if multi-edges shouldn't weigh double; every node is
    * assumed to have at least one out-arc (true for symmetrized
    * graphs — otherwise dangling mass is simply dropped, matching the
    * oracle's replay).
    *
    * Scale shape: out-degrees and the (edge ⨝ degree) working set are
    * computed once and cached; each of the `iters` rounds is ONE
    * shuffle — join current ranks to the cached working set on `src`
    * (rank rows are already hash-partitioned on the node key from the
    * previous round's aggregate, so only the contribution re-key on
    * `dst` moves data) and hash-aggregate contributions by `dst`.
    * Per-round cost is O(|E|) with no driver-side state: the classic
    * synchronous PR loop (Page et al., 1999; the Pregel formulation),
    * which holds at 10^9+ edges given edge-set partitioning.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3
  ): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    var rank = deg.select(col("src").as("node"), lit(1000000L).as("pr_micro"))
    for (_ <- 1 to iters) {
      rank = ed.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("pr_micro div deg").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("in_sum"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(850 * in_sum) div 1000")).as("pr_micro"))
    }
    rank
  }
}
