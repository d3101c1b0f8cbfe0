package graft

import graft.ext.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  test("planted contamination is found; clean docs are not flagged") {
    val evalSet = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different benchmark item about quantum flux capacitors")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of eval doc 1 → fully contaminated
      (101L, "the quick brown fox jumps over the lazy dog near the river bank"),
      // partial: shares the 5-word span "the quick brown fox jumps"
      // with eval doc 1 → three 3-grams
      (102L, "yesterday the quick brown fox jumps happily elsewhere entirely unrelated text"),
      // clean
      (103L, "totally unrelated content with no overlap whatsoever in any gram")
    ).toDF("doc_id", "text")

    val all = Decontaminate.ngramContamination(
      corpus, "doc_id", "text", evalSet, "doc_id", "text", minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // 13-word doc → 11 distinct 3-grams, all shared with its eval copy
    assert(all((101L, 1L)) == (11L, 11L))
    // 11-word doc → 9 distinct 3-grams, 3 from the shared span
    assert(all((102L, 1L)) == (3L, 9L))
    assert(!all.keySet.exists(_._1 == 103L), s"clean doc flagged: $all")
    assert(!all.keySet.exists(_._2 == 2L), s"nothing shares grams with eval 2: $all")

    // threshold prunes the partial match
    val strict = Decontaminate.ngramContamination(
      corpus, "doc_id", "text", evalSet, "doc_id", "text", minShared = 5L)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(101L))
  }

  test("eval grams broadcast: no sort-merge join of corpus against eval") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Decontaminate.ngramContamination(
      docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }
}
