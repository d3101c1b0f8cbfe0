package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-bucket control for the LSH/banding candidate self-joins
  * ([[Dedup.minhashLshPairs]], [[Dedup.simhashPairs]],
  * [[Dedup.embeddingCosinePairsLsh]], [[Similarity.lshTopK]]).
  *
  * An equi-join on bucket keys is quadratic *per bucket*: a skewed hot
  * bucket — e.g. a boilerplate-heavy shard where 10^5 near-identical
  * documents share a band signature — contributes |bucket|² candidate
  * pairs and concentrates them in one shuffle partition. Two bounded
  * alternatives, both deterministic (salts derive from the same
  * md5-hash family as [[DedupConstants]], so an external oracle can
  * replay the exact candidate set):
  *
  *   - [[subSplit]]: salt members of oversized buckets into
  *     ⌈size/cap⌉ sub-buckets → per-bucket work drops from size² to
  *     ~size·cap. The salt is keyed on (member id, band id), so each
  *     band partitions a mega-cluster DIFFERENTLY — pairs missed in
  *     one band's split co-occur in another's with prob
  *     1-(1-1/nsub)^(bands-1), and connected-components closure
  *     ([[Pipeline.connectedComponents]]) stitches the cluster back
  *     together from the union graph.
  *   - [[dropHot]]: remove oversized buckets outright — stop-word
  *     semantics for the query→corpus ANN join, where a bucket holding
  *     a large fraction of the corpus is non-discriminative by
  *     definition and the other T-1 tables keep supplying candidates.
  *
  * Costs one map-side-combinable count per bucket key; the hot-bucket
  * set is tiny (only keys above `cap`), so the correction join
  * broadcasts under AQE. With `cap` above the largest test-SF bucket
  * the output is bit-identical to the uncapped plan (oracle-safe
  * defaults); size `cap` per deployment so cap·bands rows fit one
  * shuffle partition.
  */
object BucketCap {

  /** Portable 60-bit md5 hash (same family as [[DedupConstants]] /
    * [[Pipeline]]'s keyHash — first 15 hex chars, non-negative).
    */
  private def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Adds a `_salt` column: 0 for members of buckets with ≤ cap rows
    * (the common path — bit-identical join behavior), else
    * `md5(saltKey) % ⌈size/cap⌉`. Callers append `_salt` to their
    * bucket join keys. `saltKey` must vary per bucket family (e.g.
    * `concat(id, '#', band)`) so different bands split a hot cluster
    * along different lines — see class doc.
    */
  def subSplit(bucketed: DataFrame, keyCols: Seq[String], saltKey: Column, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val hot = bucketed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > cap)
      .withColumn("_nsub", ceil(col("_bn").cast("double") / cap).cast("long"))
      .select(keyCols.map(col) :+ col("_nsub"): _*)
    bucketed.join(hot, keyCols, "left")
      .withColumn("_salt",
        when(col("_nsub").isNull, lit(0L)).otherwise(pmod(md5Hash60(saltKey), col("_nsub"))))
      .drop("_nsub")
  }

  /** Removes every row belonging to a bucket with more than `cap`
    * members (stop-bucket filter for query→corpus candidate joins).
    */
  def dropHot(bucketed: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val hot = bucketed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > cap)
      .select(keyCols.map(col) :+ lit(true).as("_hot"): _*)
    bucketed.join(hot, keyCols, "left")
      .filter(col("_hot").isNull)
      .drop("_hot")
  }
}
