package graft

import graft.ext.{Hybrid, Lexical, Similarity}
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

  test("pmiTopPairs: exclusive pair outranks frequent-but-independent pair") {
    // "p q" always co-occur (and only with each other); "a" and "b" are
    // individually frequent but pair only once in three arrangements.
    val docs = Seq(
      (1L, "p q a b"), (2L, "p q b a"), (3L, "p q a c b"),
      (4L, "p q b c a"), (5L, "p q a b")
    ).toDF("doc_id", "text")
    val out = Lexical.pmiTopPairs(docs, "text", minCount = 2, k = 5)
      .select("w1", "w2", "pmi_micro").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val pq = out.find(p => p._1 == "p" && p._2 == "q").get
    val ab = out.find(p => p._1 == "a" && p._2 == "b").get
    assert(pq._3 > ab._3, s"exclusive collocation must outrank independent pair: $pq vs $ab")
    assert(out.head._1 == "p" && out.head._2 == "q", "p q is the top collocation")
  }

  test("pmiTopPairs enforces the minCount floor") {
    val docs = Seq((1L, "r s r s x y"), (2L, "r s")).toDF("doc_id", "text")
    // c2(r,s)=3 survives minCount=3; c2(x,y)=1 and the bridges don't.
    val out = Lexical.pmiTopPairs(docs, "text", minCount = 3, k = 10)
      .select("w1", "w2").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("r", "s")), s"only the floor-clearing pair remains: ${out.toSeq}")
  }

  test("rrfFuse: hand-computed fusion, absence contributes zero, ties to min id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Hybrid.rrfFuse(Seq(a, b), "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 20: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522 (2 lists)
    // 10: 1e6/61 = 16393; 40: 1e6/62 = 16129; 30: 1e6/63 = 15873
    assert(out.toSeq == Seq(
      (20L, 32522L, 2L), (10L, 16393L, 1L), (40L, 16129L, 1L), (30L, 15873L, 1L)))

    // equal ranks in disjoint lists tie on score — min id first
    val t1 = Seq((7L, 1)).toDF("doc_id", "rank")
    val t2 = Seq((3L, 1)).toDF("doc_id", "rank")
    val tied = Hybrid.rrfFuse(Seq(t1, t2), "doc_id", "rank", k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(tied == Seq(3L, 7L), s"tie-break by id: $tied")
  }

  test("ccnetBuckets: tercile cut matches the per-language (score, id) total order") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Lexical.ccnetBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

    // recompute the cut from first principles on the collected scores
    val expected = got.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = rows.length
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, i) =>
        val b = (i.toLong * 3) / n match {
          case 2 => "head"; case 1 => "middle"; case _ => "tail"
        }
        (r._1, b)
      }
    }.toMap
    got.foreach { case (id, _, _, bucket) =>
      assert(bucket == expected(id), s"doc $id: got $bucket expected ${expected(id)}")
    }
    // every language exercises all three buckets (non-vacuous fixture)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._4).distinct.sorted.sameElements(Array("head", "middle", "tail")),
        s"$lang must populate all terciles")
    }
  }

  test("dsirWeightsHashed at collision-free width reproduces whole-unigram DSIR") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docs.filter(col("source") === "src0")
    val whole = Lexical.dsirWeights(docs, target, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val hashed = Lexical.dsirWeightsHashed(docs, target, "doc_id", "text", buckets = 1 << 24)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == whole,
      "with no hash collisions the bucketed ratio table is the unigram table")
  }

  test("dsirWeightsHashed plan: fixed-size ratio table rides a broadcast join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Lexical.dsirWeightsHashed(
      docs, docs.filter(col("source") === "src0"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "per-token scoring join must be map-side (the point of hashing):\n" + plan.take(1200))
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

  test("semDedupFull: no two kept members τ-similar — the guarantee rep-only pruning lacks") {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val tau = 0.2
    val full = Similarity.semDedupFull(emb, "vec_id", "embedding",
      numCentroids = 8, iters = 1, tau = tau)
    val kept = full.filter(col("keep"))
      .select(col("list"), col("vec_id"))

    // all-pairs baseline check over the KEPT set, within clusters: the
    // refine must leave no τ-similar kept pair (rep-only pruning does —
    // asserted below so the spec fails if the fixture stops exercising it)
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
    val keptPairs = kept.as("x").join(kept.as("y"),
        col("x.list") === col("y.list") && col("x.vec_id") < col("y.vec_id"))
      .join(vecs.select(col("vec_id").as("ida"), col("v").as("va")), col("x.vec_id") === col("ida"))
      .join(vecs.select(col("vec_id").as("idb"), col("v").as("vb")), col("y.vec_id") === col("idb"))
      .withColumn("cos", round(VectorOps.cosine(col("va"), col("vb")), 4))
    assert(keptPairs.filter(col("cos") >= tau).count() == 0,
      "full pruning left a τ-similar kept pair")

    // and the single-rep shortcut on the same data DOES leave such a
    // pair (so the guarantee above is non-vacuous on this fixture)
    val repKept = Similarity.semDedup(emb, "vec_id", "embedding",
      numCentroids = 8, iters = 1, tau = tau)
      .filter(col("keep")).select(col("list"), col("vec_id"))
    val repPairs = repKept.as("x").join(repKept.as("y"),
        col("x.list") === col("y.list") && col("x.vec_id") < col("y.vec_id"))
      .join(vecs.select(col("vec_id").as("ida"), col("v").as("va")), col("x.vec_id") === col("ida"))
      .join(vecs.select(col("vec_id").as("idb"), col("v").as("vb")), col("y.vec_id") === col("idb"))
      .withColumn("cos", round(VectorOps.cosine(col("va"), col("vb")), 4))
    assert(repPairs.filter(col("cos") >= tau).count() > 0,
      "fixture no longer exercises the rep-only gap; pick a denser fixture")

    // full pruning can only remove MORE than rep-only (recall direction)
    assert(kept.count() <= repKept.count())
  }
}
