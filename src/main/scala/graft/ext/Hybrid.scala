package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-produced ranked lists (a
  * lexical BM25 probe, a semantic ANN probe, …) into one ranking with
  * Reciprocal Rank Fusion (Cormack et al., SIGIR 2009):
  * `score(d) = Σ_lists 1 / (C + rank_list(d))`, C = 60. RRF needs only
  * RANKS — no score calibration between retrievers — which is exactly
  * why it's the default fusion in search/decontamination stacks that
  * pair an inverted index with a vector index.
  *
  * Repo-wide determinism rule: contributions are the integer micro
  * units `1000000 div (C + rank)`, so the fused score is an exact
  * order-independent integer sum a SQL oracle replays bit-for-bit.
  */
object Hybrid {

  /** Fuse ranked lists sharing (`idCol`, `rankCol`: 1-based) into the
    * top-`k` by RRF score; ties broken by id. Docs absent from a list
    * simply contribute nothing (union + aggregate — no outer-join
    * null-handling, and it generalizes to any number of lists).
    *
    * Scale shape: each input is already a top-k (a few hundred rows at
    * most — retrieval depth, not corpus size), so the union/aggregate
    * is tiny regardless of data scale; the heavy lifting lives in the
    * upstream retrievers, which are scale-shaped on their own
    * (posting-list BM25, bucketed ANN). The final sort is over ≤
    * Σ|lists| rows.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Int = 60
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists
      .map(_.select(col(idCol), expr(s"1000000 div ($c + $rankCol)").as("rrf")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum("rrf").as("rrf_micro"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
