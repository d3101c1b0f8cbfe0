package graft

import graft.ext.{Lexical, Similarity}
import org.apache.spark.sql.functions._

/** Specs for the lexical models (bigram LM score, BM25 retrieval) and
  * SemDeDup's structural invariants.
  */
class LexicalSpec extends SparkSuite {
  import spark.implicits._

  test("bigramLmScore matches hand-computed micro probabilities") {
    // corpus: "a b" x2 and "a c" -> c1(a)=3, c2(a,b)=2, c2(a,c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val r = Lexical.bigramLmScore(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // doc 1/2: p = (2*1e6) div 3 = 666666; doc 3: (1*1e6) div 3 = 333333
    assert(r == Map(
      1L -> ((1L, 666666L)),
      2L -> ((1L, 666666L)),
      3L -> ((1L, 333333L))))
  }

  test("bm25TopK ranks higher-tf docs first at equal length") {
    val docs = Seq(
      (1L, "x x x pad pad pad pad pad"), // tf(x)=3
      (2L, "x x y pad pad pad pad pad"), // tf(x)=2
      (3L, "x y y pad pad pad pad pad"), // tf(x)=1
      (4L, "y y y pad pad pad pad pad")  // no query term
    ).toDF("doc_id", "text")
    val out = Lexical.bm25TopK(docs, "doc_id", "text", Seq("x"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L), s"tf-monotone ranking, no-match excluded: $out")
  }

  test("bm25TopK length-normalizes: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "x x " + Seq.fill(6)("pad").mkString(" ")),  // dl=8
      (2L, "x x " + Seq.fill(30)("pad").mkString(" "))  // dl=32
    ).toDF("doc_id", "text")
    val out = Lexical.bm25TopK(docs, "doc_id", "text", Seq("x"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L), s"shorter doc first: $out")
  }

  test("semDedup invariants: reps kept, one rep per cluster, drop rule exact") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.semDedup(emb, "vec_id", "embedding", numCentroids = 8, iters = 1, tau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))

    val byList = out.groupBy(_._2)
    byList.foreach { case (_, rows) =>
      val repIds = rows.map(_._3).distinct
      assert(repIds.length == 1, "single rep per cluster")
      assert(repIds.head == rows.map(_._1).min, "rep is the min id")
    }
    out.foreach { case (id, _, rep, cos, keep) =>
      assert(keep == (id == rep || cos < 0.2), "keep rule is exact")
    }
    assert(out.map(_._1).distinct.length == out.length, "each vector scored once")
  }
}
