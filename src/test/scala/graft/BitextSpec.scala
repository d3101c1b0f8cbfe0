package graft

import graft.ext.Bitext
import org.apache.spark.sql.DataFrame

/** Hand-computed pins for the margin-based bitext miner
  * ([[graft.ext.Bitext]]): the 4-dim fixture has exact rational
  * cosines, so every neighborhood sum and integer margin is derivable
  * on paper — including the hubness behavior the operator exists for
  * (a pair's raw cosine can be high while its margin is below 1
  * because the endpoints' neighborhoods are themselves high).
  */
class BitextSpec extends SparkSuite {

  // src ids even, tgt ids odd (disjoint — the operator contract).
  // cosines: s0·t1 = 1.0, s0·t3 = 0.6, s0·t5 = 0;
  //          s2·t1 = 0,   s2·t3 = 0.8, s2·t5 = 0.
  private def srcDf: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }
  private def tgtDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      // zero-norm row: excluded from both ranked lists (ANN family
      // contract), so it appears in no neighborhood and no candidate
      (7L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("margins match the hand computation; hubness demotes a high-cosine pair") {
    // k=2 neighborhoods (e4 integer sums):
    //   fwd s0: t1 (10000) + t3 (6000)            -> sum 16000, cnt 2
    //   fwd s2: t3 (8000) + t1 (0, id-asc tiebreak)-> sum  8000, cnt 2
    //   bwd t1: s0 (10000) + s2 (0)               -> sum 10000, cnt 2
    //   bwd t3: s2 (8000) + s0 (6000)             -> sum 14000, cnt 2
    // margins (2*cos*cntA*cntB*1e6 div (sumA*cntB + sumB*cntA)):
    //   (0,1): 2*10000*4e6 div 52000 = 1538461
    //   (0,3): 2* 6000*4e6 div 60000 =  800000  <- cos 0.6 but BELOW
    //          its neighborhoods: the hubness cut
    //   (2,3): 2* 8000*4e6 div 44000 = 1454545
    //   (2,1): cos 0 -> 0
    val rows = Bitext.marginMine(srcDf, tgtDf, "vec_id", "embedding",
      k = 2, minMarginMicro = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (0L, 1L, 10000L, 1538461L),
      (2L, 3L, 8000L, 1454545L)), rows.toString)
    // the demoted pair IS present below the floor, with the pinned margin
    val all = Bitext.marginMine(srcDf, tgtDf, "vec_id", "embedding",
      k = 2, minMarginMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(all((0L, 3L)) == 800000L, all.toString)
    assert(!all.keySet.exists(_._2 == 7L), "zero-norm target never a candidate")
  }

  test("marginMineIndexed: batch-invariant and identical to single-shot indexed lists") {
    // a larger seeded fixture so the LSH lists have real structure
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    val emb = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val src = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
    val tgt = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1)
    def mined(batches: Int, dir: String): Set[String] =
      Bitext.marginMineIndexed(spark, src, tgt, "vec_id", "embedding",
        tempDir(dir), k = 4, minMarginMicro = 0L, probeBatches = batches)
        .collect().map(_.toString).toSet
    val one = mined(1, "bitext-idx-1")
    val three = mined(3, "bitext-idx-3")
    assert(one.nonEmpty, "indexed miner found no pairs on the seeded fixture")
    // per-query top-k is independent of probe batching: the bounded-
    // disk batched path must be ROW-IDENTICAL to the single shot
    assert(three == one, "probe batching changed mined pairs")
    // and the composition equals marginFromLists over the indexed lists
    // built directly — the operator adds batching + staging, never math
    val root = tempDir("bitext-idx-direct")
    graft.ext.AnnIndex.lshIndexWrite(tgt, "vec_id", "embedding", s"$root/t")
    graft.ext.AnnIndex.lshIndexWrite(src, "vec_id", "embedding", s"$root/s")
    val fwd = graft.ext.AnnIndex.lshTopKIndexed(spark, s"$root/t", src,
      "vec_id", "embedding", 4)
    val bwd = graft.ext.AnnIndex.lshTopKIndexed(spark, s"$root/s", tgt,
      "vec_id", "embedding", 4)
    val direct = Bitext.marginFromLists(fwd, bwd, 0L)
      .collect().map(_.toString).toSet
    assert(direct == one)
  }

  test("marginMineIndexed: retry over torn list leftovers is row-identical; concurrent batches too") {
    import spark.implicits._
    val rnd = new scala.util.Random(29L)
    val emb = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val src = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
    val tgt = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1)
    val dir = tempDir("bitext-idx-torn")
    val clean = Bitext.marginMineIndexed(spark, src, tgt, "vec_id", "embedding",
      dir, k = 4, minMarginMicro = 0L, probeBatches = 3)
      .collect().map(_.toString).toSet
    // simulate a run killed between probe batches: pollute one batch
    // dir with WRONG rows (a different corpus' list shape) and drop
    // another entirely — the retry contract is that a plain re-run
    // overwrites every batch dir before the union reads anything, so
    // the result is row-identical to the clean run
    Seq((12345L, 999L, 0.5, 1)).toDF("query_id", "neighbor_id", "cos", "rank")
      .write.mode("overwrite").parquet(s"$dir/fwd_lists/pbatch1")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/bwd_lists/pbatch2"), true)
    val retried = Bitext.marginMineIndexed(spark, src, tgt, "vec_id", "embedding",
      dir, k = 4, minMarginMicro = 0L, probeBatches = 3, indexesPrebuilt = true)
      .collect().map(_.toString).toSet
    assert(retried == clean, "retry over torn list leftovers diverged")
    // concurrent probe batches (disjoint jobs) change scheduling, not
    // rows
    val conc = Bitext.marginMineIndexed(spark, src, tgt, "vec_id", "embedding",
      dir, k = 4, minMarginMicro = 0L, probeBatches = 3, indexesPrebuilt = true,
      concurrentBatches = 3)
      .collect().map(_.toString).toSet
    assert(conc == clean, "concurrent probe batches changed mined pairs")
    // the completed run recorded its batch count: a post-hoc reader
    // resolves EXACTLY this run's batch dirs (never a glob that would
    // pick up stale dirs from an earlier wider run — r20 ADVICE)
    assert(Bitext.listBatchDirs(spark, s"$dir/fwd_lists") ==
      (0 until 3).map(bi => s"$dir/fwd_lists/pbatch$bi"))
    intercept[IllegalArgumentException] {
      Bitext.listBatchDirs(spark, s"$dir/no_such_lists")
    }
  }

  test("deriveMarginFloor: histogram rank pick equals the sorted-prefix selection") {
    // r20 verdict nit: the floor was the max of an orderBy().limit(⌈q·N⌉)
    // prefix — one task gathering q·N longs. The histogram selection must
    // return the identical value on every quantile, including ties (the
    // fixture's margin multiset has duplicates by construction).
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val emb = (0 until 300).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val src = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
    val tgt = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1)
    val fwd = graft.ext.Similarity.bruteTopK(tgt, src, "vec_id", "embedding", 4)
    val bwd = graft.ext.Similarity.bruteTopK(src, tgt, "vec_id", "embedding", 4)
    val margins = Bitext.marginFromLists(fwd, bwd, 1L)
      .select("margin_micro").collect().map(_.getLong(0)).sorted
    assert(margins.length > 50, "fixture produced too few positive margins")
    for (q <- Seq(0.5, 0.9, 0.95, 0.99)) {
      val idx = math.max(1L, math.ceil(q * margins.length).toLong).toInt
      val expected = margins.take(idx).max // the old selection, in-memory
      assert(Bitext.deriveMarginFloor(fwd, bwd, q) == expected,
        s"histogram rank pick diverged at q=$q")
    }
  }

  test("corpus edge: cnt < k cross-multiplies exactly") {
    // k=5 > |tgt|: fwd neighborhoods hold all 3 non-zero targets
    // (sum s0 = 16000, cnt 3; sum s2 = 8000, cnt 3), bwd unchanged
    // (cnt 2). (0,1): 2*10000*3*2*1e6 div (16000*2 + 10000*3) =
    // 120e9 div 62000 = 1935483
    val all = Bitext.marginMine(srcDf, tgtDf, "vec_id", "embedding",
      k = 5, minMarginMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(all((0L, 1L)) == 1935483L, all.toString)
  }
}
