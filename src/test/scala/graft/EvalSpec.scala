package graft

import graft.ext.Eval
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for the dataset-evaluation operators: hand-computed NDCG on a
  * tiny fixture, majority-vote tie-breaks, Wilson-bound ordering (the
  * small-perfect vs large-near-perfect property the bound exists for),
  * and eval-overlap boundary cases.
  */
class EvalSpec extends SparkSuite {

  test("dcgWeightsE6: w(1)=1e6, strictly decreasing, cum table monotone") {
    val w = Eval.dcgWeightsE6(10)
    assert(w.head == 1000000L)
    assert(w == w.sortBy(-_), s"not decreasing: $w")
    assert(w.last > 0L)
  }

  test("ndcgAtK matches a hand-computed fixture") {
    // query 100 (label 1) retrieves ranks 1..3 = labels (1, 2, 1):
    // rel = [1,0,1] -> dcg = w1 + w3, n_rel = 2 -> idcg = w1 + w2.
    // query 200 (label 5) retrieves nothing relevant -> ndcg 0.
    val ranked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 1, 11L), Row(100L, 2, 12L), Row(100L, 3, 13L),
        Row(200L, 1, 11L), Row(200L, 2, 12L), Row(200L, 3, 13L))),
      StructType(Seq(StructField("query_id", LongType),
        StructField("rank", IntegerType), StructField("neighbor_id", LongType))))
    val labels = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 1), Row(200L, 5), Row(11L, 1), Row(12L, 2), Row(13L, 1))),
      StructType(Seq(StructField("id", LongType), StructField("lab", IntegerType))))
    val out = Eval.ndcgAtK(ranked, labels, "id", "lab", k = 3)
      .orderBy("query_id").collect()
    val w = Eval.dcgWeightsE6(3)
    val expDcg = w(0) + w(2)
    val expNdcg = (expDcg * 1000000L) / (w(0) + w(1))
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((100L, 2L, expDcg, expNdcg), (200L, 0L, 0L, 0L)))
  }

  test("mrrAtK: first relevant rank reciprocal, zero when none relevant") {
    // query 100 (label 1): ranks 1..3 = labels (2, 1, 1) -> first rel
    // at rank 2 -> rr_e6 = 1e6 div 2 = 500000.
    // query 200 (label 5): nothing relevant -> (0, 0).
    val ranked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 1, 12L), Row(100L, 2, 11L), Row(100L, 3, 13L),
        Row(200L, 1, 11L), Row(200L, 2, 12L), Row(200L, 3, 13L))),
      StructType(Seq(StructField("query_id", LongType),
        StructField("rank", IntegerType), StructField("neighbor_id", LongType))))
    val labels = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, 1), Row(200L, 5), Row(11L, 1), Row(12L, 2), Row(13L, 1))),
      StructType(Seq(StructField("id", LongType), StructField("lab", IntegerType))))
    val out = Eval.mrrAtK(ranked, labels, "id", "lab")
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((100L, 2L, 500000L), (200L, 0L, 0L)))
  }

  test("recallAtK: hit counting, zero-hit queries kept, basis points exact") {
    val mk = (rows: Seq[(Long, Long)]) => spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (q, n) => Row(q, n) }),
      StructType(Seq(StructField("query_id", LongType), StructField("neighbor_id", LongType))))
    val exact = mk(Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)))
    val approx = mk(Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 97L)))
    val out = Eval.recallAtK(exact, approx, k = 2).orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 5000L), (2L, 0L, 0L)))
  }

  test("majorityLabel: highest votes wins, ties break to smallest label") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // user 1: b x2, a x2 -> tie -> 'a' wins
        Row(1L, "b"), Row(1L, "b"), Row(1L, "a"), Row(1L, "a"),
        // user 2: clear majority 'z'
        Row(2L, "z"), Row(2L, "z"), Row(2L, "z"), Row(2L, "y"))),
      StructType(Seq(StructField("u", LongType), StructField("l", StringType))))
    val out = Eval.majorityLabel(df, "u", "l").orderBy("u").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, "a", 2L, 4L, 5000L), (2L, "z", 3L, 4L, 7500L)))
  }

  test("wilsonQuality: 4/4 does NOT outrank 96/100; all-good closed form") {
    val direct = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 4).map(_ => Row("small", 300L)) ++
        (1 to 96).map(_ => Row("large", 300L)) ++ (1 to 4).map(_ => Row("large", 10L)) ++
        (1 to 10).map(_ => Row("perfect", 300L))),
      StructType(Seq(StructField("src", StringType), StructField("chars", LongType))))
    val out = Eval.wilsonQuality(direct, "src", col("chars") >= 300L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (sn, ss, sw) = out("small")
    val (ln, ls, lw) = out("large")
    val (pn, ps, pw) = out("perfect")
    assert((sn, ss) == (4L, 4L) && (ln, ls) == (100L, 96L) && (pn, ps) == (10L, 10L))
    // the whole point of the bound: 96/100 beats 4/4 despite lower rate
    assert(lw > sw, s"large=$lw small=$sw")
    // s = n closed form: inner = 1 -> r = 1e6 -> (n+2)*1e6 - 2e6 = n*1e6
    assert(sw == 4L * 1000000L / (4L + 4L))
    assert(pw == 10L * 1000000L / (10L + 4L))
  }

  test("splitLeakage: only cross-split pairs survive, labels attached to the right side") {
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2L), Row(3L, 4L), Row(5L, 6L))),
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
    val splits = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "train"), Row(2L, "test"),   // leaks
        Row(3L, "train"), Row(4L, "train"),  // same split — fine
        Row(5L, "val"), Row(6L, "train"))),  // leaks
      StructType(Seq(StructField("doc_id", LongType), StructField("split", StringType))))
    val out = Eval.splitLeakage(pairs, splits, "doc_id", "split")
      .orderBy("doc_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 2L, "train", "test"), (5L, 6L, "val", "train")))
  }

  test("splitByCluster: co-locates near-dups (audit empty), unique docs keep their raw split") {
    import graft.ext.Pipeline
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 60L).map(Row(_))),
      StructType(Seq(StructField("doc_id", LongType))))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(10L, 11L), Row(40L, 41L))),
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
    val out = Pipeline.splitByCluster(docs, "doc_id", pairs, "doc_a", "doc_b",
      valPermille = 300, testPermille = 300)
    val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // chain 1-2-3 resolves to rep 1 and one shared split
    assert(Seq(1L, 2L, 3L).map(m(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(m(_)._2).distinct.size == 1)
    assert(m(10L)._2 == m(11L)._2 && m(40L)._2 == m(41L)._2)
    // the audit the operator exists to satisfy
    assert(Eval.splitLeakage(pairs, out, "doc_id", "split").count() == 0L)
    // unique docs: rep = own id, split identical to the raw hash split
    val raw = Pipeline.datasetSplit(docs, "doc_id", valPermille = 300, testPermille = 300)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val paired = Set(1L, 2L, 3L, 10L, 11L, 40L, 41L)
    (1L to 60L).filterNot(paired).foreach { id =>
      assert(m(id)._1 == id && m(id)._2 == raw(id), s"doc $id moved")
    }
  }

  test("ngramOverlap: contained doc scores 10000 bp, disjoint doc 0, short doc dropped") {
    val mk = (id: Long, t: String) => Row(id, t)
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        mk(1L, "alpha beta gamma delta"),        // both 3-grams in eval
        mk(2L, "one two three four five"),       // disjoint
        mk(3L, "too short"))),                   // < 3 words -> no grams
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val eval = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(mk(9L, "alpha beta gamma delta epsilon"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val out = Eval.ngramOverlap(corpus, "doc_id", "text", eval, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 10000L), (2L, 3L, 0L, 0L)))
  }
}
