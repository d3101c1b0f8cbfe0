package graft

import graft.ext.{BucketCap, Dedup, Pipeline}
import org.apache.spark.sql.functions._

/** Hot-bucket cap behavior (SCALE.md risk: a boilerplate shard where
  * thousands of near-identical docs share every band signature makes
  * the candidate self-join quadratic in that bucket).
  */
class BucketCapSpec extends SparkSuite {

  import spark.implicits._

  test("subSplit salts only oversized buckets, deterministically") {
    val bucketed = ((1 to 10).map(i => ("hot", i.toLong)) ++ Seq(("cold", 99L), ("cold", 100L)))
      .toDF("b", "id")
    val salted = BucketCap.subSplit(bucketed, Seq("b"), col("id").cast("string"), cap = 3)
    val cold = salted.filter(col("b") === "cold").select("_salt").distinct().as[Long].collect().toSet
    assert(cold == Set(0L), "under-cap buckets must keep salt 0 (bit-identical join)")
    val hotSalts = salted.filter(col("b") === "hot").select("_salt").distinct().as[Long].collect().toSet
    assert(hotSalts.size > 1 && hotSalts.forall(s => s >= 0 && s < 4), s"10/3 → nsub 4, got $hotSalts")
    // pure function of (bucket size, salt key) — stable across reruns
    val again = BucketCap.subSplit(bucketed, Seq("b"), col("id").cast("string"), cap = 3)
      .orderBy("b", "id").select("_salt").as[Long].collect().toSeq
    assert(again == salted.orderBy("b", "id").select("_salt").as[Long].collect().toSeq)
  }

  test("dropHot removes oversized buckets, keeps the rest") {
    val bucketed = ((1 to 10).map(i => ("hot", i.toLong)) ++ Seq(("cold", 99L), ("cold", 100L)))
      .toDF("b", "id")
    val kept = BucketCap.dropHot(bucketed, Seq("b"), cap = 3)
    assert(kept.select("b").distinct().as[String].collect().toSeq == Seq("cold"))
    assert(kept.count() == 2)
  }

  test("a crafted hot bucket no longer explodes candidates quadratically") {
    val boiler = "the same boilerplate text repeated across many shards of the corpus dump"
    val docs = ((1 to 300).map(i => (i.toLong, boiler)) ++
      (1 to 20).map(i => (1000L + i, s"unique document number $i with distinctive words alpha$i beta$i gamma$i delta$i"))).toDF("doc_id", "text")

    val uncapped = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size >= 300 * 299 / 2, s"300-clique should be all-pairs uncapped, got ${uncapped.size}")

    val capped = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 50)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.nonEmpty && capped.subsetOf(uncapped))
    // per-band work is bounded by size·cap: pairs drop well below the clique
    assert(capped.size < uncapped.size * 0.8,
      s"expected sub-quadratic candidates, got ${capped.size} of ${uncapped.size}")

    // the per-band salts partition the clique differently, so the union
    // graph stays connected — cluster resolution recovers ONE cluster
    val clusters = Pipeline.connectedComponents(
      capped.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
    val cliqueLabels = clusters.filter(col("node") <= 300)
    assert(cliqueLabels.count() == 300, "no clique member may be orphaned")
    assert(cliqueLabels.select("cluster_id").distinct().count() == 1,
      "salt-split must not sever the duplicate cluster")
  }

  test("corpus recall is unchanged at the default cap (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val def_ = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(def_ == wide)
  }
}
