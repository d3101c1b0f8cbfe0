package graft

import graft.functions.{SketchExprs, VecExprs}
import graft.ext.DedupConstants
import org.apache.spark.sql.functions._

/** The r22 compiled vector expressions must agree BIT-FOR-BIT with the
  * interpreted higher-order spellings they replaced (same sequential
  * IEEE fold — the [[graft.functions.DotProductExpr]] contract, which
  * is also what keeps the DuckDB oracles green). Pinned on real
  * fixture embeddings / documents, not synthetic vectors.
  */
class VecExprsSpec extends SparkSuite {
  import DedupConstants._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private lazy val pairs = emb.as("a")
    .join(emb.as("b"), col("a.vec_id") % 7 === col("b.vec_id") % 7
      && col("a.vec_id") < col("b.vec_id"))
    .select(col("a.v").as("x"), col("b.v").as("y"))

  test("l2sq equals the aggregate(zip_with) HOF fold bit-for-bit") {
    val mismatch = pairs
      .withColumn("native", VecExprs.l2sq(col("x"), col("y")))
      .withColumn("hof", aggregate(
        zip_with(col("x"), col("y"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch == 0)
  }

  test("l2normalize equals the transform-with-norm-guard HOF, including zero-norm rows") {
    val withZero = emb.select(col("v"))
      .union(spark.sql("select array(0.0d, 0.0d, 0.0d) as v"))
    def hofNorm(a: org.apache.spark.sql.Column) = {
      val n = sqrt(graft.functions.DotProductExpr.dot(a, a))
      transform(a.cast("array<double>"),
        x => when(n === lit(0.0), lit(0.0)).otherwise(x / n))
    }
    val mismatch = withZero
      .withColumn("native", VecExprs.l2normalize(col("v")))
      .withColumn("hof", hofNorm(col("v")))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch == 0)
  }

  test("pqDistTable equals the transform+aggregate HOF table build bit-for-bit") {
    val m = 8
    val sub = 64 / m
    // a small real codebook: the first 16 corpus vectors, per-subspace
    val seeds = emb.orderBy("vec_id").limit(16)
      .collect().map(_.getSeq[Double](1).toArray)
    (0 until m).foreach { mi =>
      val book = seeds.map(s => s.slice(mi * sub, (mi + 1) * sub))
      val cbLit = typedlit(book.map(_.toSeq).toSeq)
      val mismatch = emb
        .withColumn("s", slice(col("v"), mi * sub + 1, sub))
        .withColumn("native", VecExprs.pqDistTable(col("s"), book))
        .withColumn("hof", transform(cbLit, cw =>
          aggregate(zip_with(col("s"), cw, (x, c) => (x - c) * (x - c)),
            lit(0.0), (acc, v) => acc + v)))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatch == 0, s"subspace $mi")
    }
  }

  test("slotAgree equals the CASE-WHEN zip_with agreement count bit-for-bit") {
    val sigs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), ext.Dedup.shingleCol("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), SketchExprs.minhashSig(SketchExprs.hashShingles(col("sh"), P)).as("sig"))
    val sigPairs = sigs.as("a")
      .join(sigs.as("b"), col("a.doc_id") % 5 === col("b.doc_id") % 5
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.sig").as("sa"), col("b.sig").as("sb"))
    val mismatch = sigPairs
      .withColumn("native", VecExprs.slotAgree(col("sa"), col("sb")))
      .withColumn("hof", expr(
        "aggregate(zip_with(sa, sb, (p, q) -> CASE WHEN p = q THEN 1.0 ELSE 0.0 END), cast(0.0 as double), (acc, v) -> acc + v)"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch == 0)
  }
}
