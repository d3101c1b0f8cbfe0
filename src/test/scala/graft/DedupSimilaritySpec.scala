package graft

import graft.ext.{Dedup, DedupConstants, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DedupSimilaritySpec extends SparkSuite {

  private lazy val docs = {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val other = "completely different words about spark catalyst plans and shuffles here"
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, base), Row(2L, base),        // exact dup
        Row(3L, nearDup),                    // near dup of 1/2
        Row(4L, other),
        Row(5L, "tiny doc")                  // < 3 words → no shingles
      )),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("exact dedup keeps min id as canonical with multiplicity") {
    val got = Dedup.exact(docs, "doc_id", Seq("text"))
      .orderBy("canonical_id").collect()
    assert(got.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_copies"))).toSeq ==
      Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("exactCanonical keeps the same canonical rows in one shuffle") {
    val rows = Dedup.exactCanonical(docs, "doc_id", Seq("text"))
    assert(rows.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    assert(rows.columns.toSeq == docs.columns.toSeq) // full rows, no helper cols
    // k=1 top-per-key via the native operator: bounded heaps (one held
    // row per key), map-side partial cut below the exchange, no
    // WindowExec buffering a viral duplicate group
    val plan = rows.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
      plan.take(800))
    assert(!plan.contains("Window"), "window operator must be gone:\n" + plan.take(800))
  }

  test("ngram jaccard finds exact and near dups, skips tiny docs") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val j12 = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getAs[Double]("jaccard")
    assert(j12 == 1.0)
  }

  test("prefix-filtered jaccard equals the full co-occurrence join") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(Dedup.ngramJaccardPairs(docs01, "doc_id", "text", 0.8))
    val pref = pairs(Dedup.ngramJaccardPairsPrefix(docs01, "doc_id", "text", 0.8))
    assert(full.nonEmpty)
    assert(pref == full, s"diff: ${(full diff pref) ++ (pref diff full)}")
    // and on the crafted fixture with an exact dup
    val f = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    val p = pairs(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.5))
    assert(p == f)
  }

  test("minhash LSH candidates cover all high-jaccard pairs") {
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cand), s"missed: ${truth -- cand}")
  }

  test("simhash: identical docs at distance 0, near dups small, distinct docs far") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) <= 6)
    assert(ham(sh(1L), sh(4L)) > 6)
  }

  test("spanDedup keeps only each distinct block's first occurrence") {
    val got = Dedup.spanDedup(docs, "doc_id", "text", blockWords = 5)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 13-word docs cut into blocks of 5/5/3
    assert(got(1L) == ((3L, 0L)))            // canonical: nothing removed
    assert(got(2L) == ((3L, 3L)))            // exact dup of 1: every block removed
    assert(got(3L) == ((3L, 2L)))            // near dup: last block differs
    assert(got(4L) == ((2L, 0L)))            // distinct content (10 words)
    assert(got(5L) == ((1L, 0L)))            // "tiny doc": one short block
  }

  test("incrementalDups via persisted signature table: identical verdicts, no history text") {
    val history = docs.filter(col("doc_id").isin(1L, 4L, 5L))
    val batch = docs.filter(col("doc_id").isin(2L, 3L))
    val direct = Dedup.incrementalDups(history, batch, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id").collect().toSeq

    // materialize the ingest-once signature table, read it back from
    // parquet, and gate the same batch against it — no text column in
    // the table at all, so history re-hashing is structurally impossible
    val tmp = tempDir("graft-sigtab")
    Dedup.signatureTable(history, "doc_id", "text").write.parquet(s"$tmp/sigs")
    val sigs = spark.read.parquet(s"$tmp/sigs")
    assert(!sigs.columns.contains("text"))
    val viaTable = Dedup.incrementalDupsFromSignatures(sigs, batch, "doc_id", "text", threshold = 0.5)
    assert(viaTable.orderBy("doc_id").collect().toSeq == direct)

    // the only parquet scan is the signature table, column-pruned to
    // (doc_id, xhash, sig) — zero text-hashing stages on the history side
    val plan = viaTable.queryExecution.executedPlan.toString
    val scans = plan.split("Scan parquet").length - 1
    assert(scans >= 1 && plan.contains("xhash"), plan.take(1200))
    assert(!plan.contains("Scan parquet") || !plan.split("Scan parquet")
      .drop(1).exists(_.takeWhile(_ != '\n').contains("text")),
      "history scan must not read a text column:\n" + plan.take(1200))
  }

  test("spanDedupClean removes duplicate blocks and reassembles in order") {
    // doc 2 = exact copy of doc 1 (its blocks all remove); doc 3
    // shares only its FIRST block with doc 1 — the cleaned text keeps
    // the tail in position order; the all-removed doc cleans to ""
    val fx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c d e f g h i j"),
        Row(2L, "a b c d e f g h i j"),
        Row(3L, "a b c d e x y z w v"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got = Dedup.spanDedupClean(fx, "doc_id", "text", blockWords = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((2L, 0L, "a b c d e f g h i j")), s"got $got")
    assert(got(2L) == ((2L, 2L, "")), s"got $got")
    assert(got(3L) == ((2L, 1L, "x y z w v")), s"got $got")
  }

  test("spanDedupExact catches a boundary-straddling repeat spanDedup misses") {
    // the shared 6-word run "a b c d e f" starts at word 0 of doc 1 but
    // word 1 of doc 2 — no 5-aligned block is shared, so the block form
    // sees nothing; the stride-1 windows find it at any offset
    val straddle = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c d e f g h i j"),
        Row(2L, "x a b c d e f y z q"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val block = Dedup.spanDedup(straddle, "doc_id", "text", blockWords = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(block(1L) == 0L && block(2L) == 0L, s"block form must miss it: $block")
    val exact = Dedup.spanDedupExact(straddle, "doc_id", "text", windowWords = 5)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1 owns every first occurrence; doc 2's windows at pos 1
    // ("a b c d e") and pos 2 ("b c d e f") are removed — overlapping
    // spans [1,5] and [2,6] union to 6 covered word positions
    assert(exact(1L) == ((6L, 0L, 0L)), s"got $exact")
    assert(exact(2L) == ((6L, 2L, 6L)), s"got $exact")
  }

  test("spanDedupRanges merges overlapping removed windows into maximal intervals") {
    // doc 2 repeats doc 1's 7-word passage "a b c d e f g" at the ODD
    // offset 3 (straddling any 5-block boundary), plus a separate exact
    // 5-word repeat "p q r s t" at offset 12 — two islands expected:
    // windows at pos 3..5 union to [3, 9] (len 7), window at pos 12 is
    // [12, 16] (len 5). The 2-word gap at pos 10-11 keeps them apart.
    val fx = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c d e f g h i j p q r s t u v w"),
        Row(2L, "x y z a b c d e f g m n p q r s t"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got = Dedup.spanDedupRanges(fx, "doc_id", "text", windowWords = 5)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 3L, 7L, 3L), (2L, 12L, 5L, 1L)),
      s"got ${got.toSeq}")
    // a doc-final repeat whose windows clip at the text end: "a b c d e"
    // repeated at the END of doc 4 (pos 2..6 clipped to n-1)
    val clip = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(3L, "a b c d e z z2 z3 z4 z5"),
        Row(4L, "q w a b c d e"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got2 = Dedup.spanDedupRanges(clip, "doc_id", "text", windowWords = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got2.toSeq == Seq((4L, 2L, 5L, 1L)), s"got ${got2.toSeq}")
  }

  test("incrementalDups flags exact / near / novel batch docs against history") {
    val history = docs.filter(col("doc_id").isin(1L, 4L, 5L))
    val batch = docs.filter(col("doc_id").isin(2L, 3L)).union(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(6L, "totally novel content sharing nothing with anything ingested before now"))),
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType)))))
    val got = Dedup.incrementalDups(history, batch, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 3L, 6L))
    val byId = got.map(r => r.getLong(0) -> r).toMap
    // doc 2 is byte-identical to history doc 1: exact AND near (est 1.0)
    assert(byId(2L).getAs[java.lang.Long]("exact_dup_id") == 1L)
    assert(byId(2L).getAs[java.lang.Long]("near_dup_id") == 1L)
    assert(byId(2L).getAs[Double]("near_est") == 1.0)
    assert(!byId(2L).getAs[Boolean]("is_new"))
    // doc 3 is a near dup of 1, not an exact one
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("exact_dup_id")))
    assert(byId(3L).getAs[java.lang.Long]("near_dup_id") == 1L)
    assert(!byId(3L).getAs[Boolean]("is_new"))
    // doc 6 matches nothing
    assert(byId(6L).getAs[Boolean]("is_new"))
  }

  // deterministic synthetic vectors: 10 clusters of 5 near-identical
  // 8-dim vectors → ANN ground truth is the cluster
  private lazy val vecs = {
    val rows = for {
      c <- 0 until 10
      j <- 0 until 5
    } yield {
      val base = Array.tabulate(8)(d => math.sin(c * 8 + d + 1).toFloat)
      val v = base.map(x => x + 0.01f * j)
      Row((c * 5 + j).toLong, v.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  test("bruteTopK returns cluster members as nearest neighbors") {
    val got = Similarity.bruteTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", 4)
      .collect()
    assert(got.length == 4)
    // neighbors of vec 0 are its cluster (ids 1..4)
    assert(got.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("lshTopK recall >= 0.8 vs brute force on the fixture") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(vecs, queries, "vec_id", "embedding", 4, tables = 8, bits = 4, dim = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("lshTopK excludes zero-norm vectors on both sides (no NaN rank-1 neighbors)") {
    // a zero-norm corpus vector colliding with a query scores
    // cos = 0/0 = NaN, and NaN sorts LARGEST under Spark's descending
    // order — unfiltered it would take rank 1 in every matching top-k
    // while the oracle's sigs CTE excludes it. The all-zero vector
    // hashes to the same bucket in every table (all margins 0), so it
    // WOULD collide with queries without the filter.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val zeroRow = Row(99L, Seq.fill(8)(0.0f))
    val withZero = vecs.union(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(zeroRow)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))))
    val queries = withZero.filter(col("vec_id") % 5 === 0 && col("vec_id") < 90)
    val got = Similarity.lshTopK(withZero, queries, "vec_id", "embedding", 4,
      tables = 8, bits = 4, dim = 8).collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("neighbor_id") == 99L),
      "zero-norm corpus vector must never appear as a neighbor")
    assert(!got.exists(r => r.getAs[Double]("cos").isNaN), "NaN cosine leaked into top-k")
    // and as a QUERY the zero vector returns no rows at all
    val zq = Similarity.lshTopK(withZero, withZero.filter(col("vec_id") === 99L),
      "vec_id", "embedding", 4, tables = 8, bits = 4, dim = 8).collect()
    assert(zq.isEmpty, s"zero-norm query must yield no neighbors, got ${zq.length}")
  }

  test("zero-norm hardening holds across the WHOLE cosine family (ANSI divide-by-zero)") {
    // Under Spark 4's default ANSI mode an unguarded cosine on a
    // zero-norm vector is a runtime DIVIDE_BY_ZERO that kills the job
    // (pre-ANSI it was a NaN that sorted rank-1). r16/r17 hardened the
    // LSH tiers; this pins the rest of the family: ANN tiers EXCLUDE
    // zero-norm rows on both sides, total-verdict operators
    // (semdedup) score them 0.0 via cosineSafe and keep them.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val zeroRow = Row(99L, Seq.fill(8)(0.0f))
    val withZero = vecs.union(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(zeroRow)),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))))
    val qs = withZero.filter(col("vec_id") < 3 || col("vec_id") === 99L)

    // bruteTopK: never crashes, never surfaces 99, zero query → no rows
    val brute = Similarity.bruteTopK(withZero, qs, "vec_id", "embedding", 4).collect()
    assert(brute.nonEmpty && !brute.exists(r =>
      r.getAs[Long]("neighbor_id") == 99L || r.getAs[Long]("query_id") == 99L))

    // hardNegatives: same exclusion
    val hn = Similarity.hardNegatives(withZero, qs, "vec_id", "embedding", 4, tauPos = 0.99)
      .collect()
    assert(hn.nonEmpty && !hn.exists(r =>
      r.getAs[Long]("neighbor_id") == 99L || r.getAs[Long]("query_id") == 99L))

    // ivfTopK (adaptive): same exclusion
    val ivf = Similarity.ivfTopK(withZero, qs, "vec_id", "embedding", 4, n = 51L).collect()
    assert(ivf.nonEmpty && !ivf.exists(r =>
      r.getAs[Long]("neighbor_id") == 99L || r.getAs[Long]("query_id") == 99L))

    // semDedup / semDedupFull: TOTAL verdicts — id 99 stays in the
    // output, scored 0.0 vs its rep (orthogonal by convention), kept
    val sd = Similarity.semDedup(withZero, "vec_id", "embedding",
      numCentroids = 4, iters = 1, tau = 0.2).collect()
    assert(sd.length == 51)
    val z = sd.find(_.getAs[Long]("vec_id") == 99L).get
    assert(z.getAs[Boolean]("keep"),
      "zero-norm member must be kept (cosineSafe scores it 0.0 < tau)")
    val sdf = Similarity.semDedupFull(withZero, "vec_id", "embedding",
      numCentroids = 4, iters = 1, tau = 0.2).collect()
    assert(sdf.length == 51 &&
      sdf.find(_.getAs[Long]("vec_id") == 99L).get.getAs[Boolean]("keep"))

    // embeddingContamination: zero rows on either side never report
    val cont = graft.ext.Decontaminate.embeddingContamination(
      withZero, "vec_id", "embedding",
      withZero.filter(col("vec_id") === 99L || col("vec_id") === 0L),
      "vec_id", "embedding", tau = 0.5).collect()
    assert(!cont.exists(r =>
      r.getAs[Long]("train_id") == 99L || r.getAs[Long]("eval_id") == 99L))
  }

  test("embeddingCosinePairsLsh: subset of exact pairs, high recall, no all-pairs join") {
    val exact = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshDf = Dedup.embeddingCosinePairsLsh(
      vecs, "vec_id", "embedding", threshold = 0.95, tables = 8, bits = 4, dim = 8)
    val lsh = lshDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "LSH dedup plan must not contain an all-pairs join")
  }

  test("adaptiveLshBits: integer-exact ceil(log2(n/occ)), clamped [8, 24]") {
    // boundary cases must round exactly as the oracle's shifted-compare
    // scan (4 << b >= n): a float-log implementation can disagree at
    // exact powers of two
    assert(Dedup.adaptiveLshBits(1L) == 8)
    assert(Dedup.adaptiveLshBits(500L) == 8)
    assert(Dedup.adaptiveLshBits(1024L) == 8)   // 4 << 8 == 1024 exactly
    assert(Dedup.adaptiveLshBits(1025L) == 9)
    assert(Dedup.adaptiveLshBits(2000L) == 9)
    assert(Dedup.adaptiveLshBits(20000L) == 13)
    assert(Dedup.adaptiveLshBits(200000L) == 16)
    assert(Dedup.adaptiveLshBits(100000000L) == 24) // cap
  }

  test("adaptiveLshTables: doubles every 2 bits above the floor, capped") {
    // must match the oracle's LEAST(32, 16 << GREATEST(0, (bits-8)//2))
    assert(Dedup.adaptiveLshTables(8) == 16)
    assert(Dedup.adaptiveLshTables(9) == 16)
    assert(Dedup.adaptiveLshTables(10) == 32)
    assert(Dedup.adaptiveLshTables(11) == 32)
    assert(Dedup.adaptiveLshTables(12) == 32) // cap
    assert(Dedup.adaptiveLshTables(24) == 32) // cap
    assert(Dedup.adaptiveLshTables(7) == 16)  // below floor clamps to base
  }

  test("adaptive LSH recall floor: >= 25% of ground-truth pairs at the verify SF") {
    // The contract the tables-vs-bits coupling exists to hold: under the
    // derived (tables, bits) — (16, 8) at this corpus size — the
    // prefix-stable plane draw must recover at least a quarter of the
    // exact cosine >= 0.45 pairs on the driver's sf0.01 fixture
    // (measured 4/14 = 28.6%). A plane re-seed or coupling change that
    // zeroes the dev-SF yield (the r13 regression: 8 fixed tables -> 0
    // pairs at sf0.001) fails here, not in the driver's vacuous-green
    // empty == empty compare.
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingCosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture lost its ground-truth near-dup pairs")
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.25, s"adaptive-LSH recall $recall < 0.25 floor (${lsh.size}/${exact.size} pairs)")
  }

  test("multiprobe LSH: subset of exact, recall >= 50% at the verify SF, pure equi-join plan") {
    // query-directed probing: the derived (16-table-capped, budget-m)
    // low-margin 2-flip probe set must beat the exact-collision
    // adaptive path's recall floor (measured 13/14 = 93% vs 4/14 at
    // sf0.01; 60.6% vs 13% at the 20 k data-sf1 point — the committed
    // recording spec below pins that one) while the plan stays an
    // equi-join on (t, b) — no hamming predicate, no all-pairs join
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mpDf = Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding", threshold = 0.45)
    val mp = mpDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp.subsetOf(exact), s"false positives: ${mp -- exact}")
    assert(exact.nonEmpty)
    val recall = (exact intersect mp).size.toDouble / exact.size
    assert(recall >= 0.5, s"multiprobe recall $recall < 0.5 floor (${mp.size}/${exact.size})")
    val plan = mpDf.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "multiprobe plan must not contain an all-pairs join")
  }

  test("multiprobe refine paths: all three tiers produce identical pairs") {
    // the refineBroadcastMax / quantBroadcastMax knobs walk the tier
    // ladder: full-width broadcast refine (survivor-only distinct) →
    // quantized-broadcast slim-stream prefilter (candidate stream
    // never carries payloads; int8 payload rides a broadcast) →
    // payload-carry prefilter (nothing broadcast at all). Pure plan
    // changes; the pair SET must be identical (the shared bound filter
    // provably never drops a true pair: dot <= d_hat + Cauchy-Schwarz
    // error bound)
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    def df(maxB: Long, quantB: Long) =
      Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding",
        threshold = 0.45, refineBroadcastMax = maxB, quantBroadcastMax = quantB)
    def pairs(maxB: Long, quantB: Long) =
      df(maxB, quantB).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = pairs(Long.MaxValue, -1L)
    val viaQuant = pairs(0L, Long.MaxValue)
    val viaPayload = pairs(0L, 0L)
    assert(viaBroadcast == viaQuant,
      s"tiers disagree: only-broadcast=${viaBroadcast -- viaQuant}, only-quant=${viaQuant -- viaBroadcast}")
    assert(viaBroadcast == viaPayload,
      s"tiers disagree: only-broadcast=${viaBroadcast -- viaPayload}, only-payload=${viaPayload -- viaBroadcast}")
    assert(viaBroadcast.nonEmpty)
    // the beyond-broadcast tiers must keep the candidate stream OUT of
    // any sort: every join hashed, no SortMergeJoin anywhere (the
    // sorted 100x-corpus stream carrying vector payloads was the
    // r16-measured disk cliff)
    for ((quantB, label) <- Seq((Long.MaxValue, "quant"), (0L, "payload-carry"))) {
      val plan = df(0L, quantB).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$label refine must hash-join, never sort the candidate stream")
      assert(plan.contains("ShuffledHashJoin"), plan.take(400))
    }
    // and the quant tier's stream-side joins must be broadcast (the
    // slim stream never shuffles between the (t,b) join and the bound
    // filter)
    assert(df(0L, Long.MaxValue).queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "quant tier must broadcast the int8 payload")
    // the quantized payload is BUILT once: both endpoint joins hang off
    // one canonical broadcast (dataset aliases above it), so the second
    // build side is a ReusedExchange — the full corpus is quantized and
    // broadcast exactly once. Checked with AQE off because the adaptive
    // initial plan prints pre-reuse (runtime stage caching uses the
    // same canonicalized key).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = df(0L, Long.MaxValue).queryExecution.executedPlan.toString
      val builtPayloadBcasts = plan.linesIterator.count(l =>
        l.contains("BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint") &&
          !l.contains("ReusedExchange"))
      assert(builtPayloadBcasts == 1,
        s"expected exactly one built id-keyed payload broadcast, got $builtPayloadBcasts:\n" +
          plan.linesIterator.filter(_.contains("BroadcastExchange")).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("null embedding elements: all three tiers agree (no codegen NPE in the quantized tiers)") {
    // a null ELEMENT inside an embedding reads as 0.0 through the
    // full-width tier's DotProductExpr (zeroed value word under the
    // null bitmap); withInt8Payload coalesces nulls to 0.0 so the
    // quantized tiers score the same pairs instead of NPE-ing inside
    // PackBytesExpr's toByteArray()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(11)
    val dim = 8
    def vec(): Array[java.lang.Float] = Array.fill(dim)(java.lang.Float.valueOf(rnd.nextGaussian().toFloat))
    val base = Array.tabulate(20)(i => (i.toLong, vec()))
    // 21 = copy of 0 with one element nulled: cosine vs 0 stays high
    // (one zeroed coordinate), so the pair (0, 21) is live in every tier
    val withNull = base(0)._2.clone(); withNull(3) = null
    val rows = base.map { case (id, v) => Row(id, v.toSeq) } :+ Row(21L, withNull.toSeq)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    def pairs(maxB: Long, quantB: Long) =
      Dedup.embeddingCosinePairsLshMultiprobe(df, "vec_id", "embedding", threshold = 0.45,
        dim = dim, n = 21L, refineBroadcastMax = maxB, quantBroadcastMax = quantB)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bc = pairs(Long.MaxValue, -1L)
    val qt = pairs(0L, Long.MaxValue)
    val sh = pairs(0L, 0L)
    assert(bc.exists(p => p._1 == 0L && p._2 == 21L),
      s"the null-element near-dup pair must survive the broadcast tier: $bc")
    assert(bc == qt, s"quant tier diverges on null elements: ${(bc diff qt) ++ (qt diff bc)}")
    assert(bc == sh, s"payload-carry tier diverges on null elements: ${(bc diff sh) ++ (sh diff bc)}")
  }

  test("compact prefilter bound: int8 quantization never prunes a true pair, margin is thin") {
    // d_hat + ha*eb + ea*hb + ea*eb >= dot(a,b) for EVERY pair — the
    // exactness contract of the beyond-broadcast branch, checked
    // directly against brute force on deterministic vectors
    val rnd = new scala.util.Random(7)
    val vs = Array.tabulate(40)(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    def q(v: Array[Double]): (Array[Byte], Double) = {
      val s = v.map(math.abs).max
      (v.map(x => math.round(x * 127 / s).toByte), s)
    }
    var maxSlack = 0.0
    for (a <- vs; b <- vs if a._1 < b._1) {
      val dot = a._2.zip(b._2).map { case (x, y) => x * y }.sum
      val (qa, sa) = q(a._2); val (qb, sb) = q(b._2)
      def rec(qv: Array[Byte], s: Double) = qv.map(_.toDouble * s / 127)
      val ea = math.sqrt(a._2.zip(rec(qa, sa)).map { case (x, y) => (x - y) * (x - y) }.sum)
      val eb = math.sqrt(b._2.zip(rec(qb, sb)).map { case (x, y) => (x - y) * (x - y) }.sum)
      val ha = math.sqrt(rec(qa, sa).map(x => x * x).sum)
      val hb = math.sqrt(rec(qb, sb).map(x => x * x).sum)
      val dhat = qa.zip(qb).map { case (x, y) => x.toLong * y }.sum.toDouble * sa * sb / (127.0 * 127.0)
      val ub = dhat + ha * eb + ea * hb + ea * eb
      assert(ub + 1e-12 >= dot, s"bound violated for (${a._1},${b._1}): $ub < $dot")
      maxSlack = math.max(maxSlack, ub - dot)
    }
    // the bound must also be TIGHT enough to prune: the 16-dim worst
    // slack stays under ~0.13 * ||a||*||b|| (~4*sqrt(dim)/254), so a
    // tau-band prefilter admits only a thin margin above true pairs
    val normBound = 4 * math.sqrt(16) / 254
    assert(maxSlack < normBound * 16, s"slack $maxSlack suspiciously loose")
  }

  test("packBytes/dotPacked equal the array<tinyint> spelling, negatives included") {
    // the packed BinaryType payload is a pure representation change:
    // dotPacked(pack(a), pack(b)) must equal dotBytes(a, b) exactly
    // (long integer accumulation either way), across negative bytes
    // and unequal lengths (min-length fold)
    import graft.functions.DotProductExpr.{dotBytes, dotPacked, packBytes}
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      val n = 1 + rnd.nextInt(64)
      Row(i.toLong, Array.fill(n)((rnd.nextInt(255) - 127).toByte).toSeq,
        Array.fill(64)((rnd.nextInt(255) - 127).toByte).toSeq)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("id", LongType),
        StructField("a", ArrayType(ByteType)), StructField("b", ArrayType(ByteType)))))
    val out = df.select(
      dotBytes(col("a"), col("b")).as("viaArray"),
      dotPacked(packBytes(col("a")), packBytes(col("b"))).as("viaPacked"),
      length(packBytes(col("a"))).as("packedLen"),
      size(col("a")).as("arrayLen")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"packed dot diverged: $r")
      assert(r.getInt(2) == r.getInt(3), s"packed length diverged: $r")
    }
  }

  test("embeddingNearDupPairs: the obvious name IS the multiprobe production default") {
    // r15 verdict stretch: a user picking the shortest name must land
    // on the recommended path, not the low-recall replay tier — the
    // alias must forward verbatim (same optimized plan, not just same
    // rows)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val alias = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.45)
    val direct = Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding", threshold = 0.45)
    assert(alias.queryExecution.optimizedPlan.sameResult(direct.queryExecution.optimizedPlan),
      "alias diverged from the multiprobe default")
  }

  test("zero-norm vectors never pair: NaN cosine guard across the refine family") {
    // 0/0 = NaN, and Spark ORDERS NaN above every value, so without
    // the norm guard `cos >= tau` is TRUE and a zero embedding
    // near-dups every bucket-mate (r15 advice). Guarded in prep across
    // embeddingCosinePairs / LSH / multiprobe.
    val rows = (0L to 5L).map { id =>
      val v = if (id == 5L) Array.fill(8)(0.0f)
              else Array.tabulate(8)(d => math.sin(id * 8 + d + 1).toFloat)
      Row(id, v.toSeq)
    }
    val vecs0 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    // tau = -1 would admit EVERY true pair — only the zero vector must
    // be absent, whatever the threshold
    val brute = ids(Dedup.embeddingCosinePairs(vecs0, "vec_id", "embedding", threshold = -1.0))
    assert(!brute.contains(5L), "zero vector paired in brute-force cosine")
    assert(brute.nonEmpty)
    val mp = ids(Dedup.embeddingCosinePairsLshMultiprobe(
      vecs0, "vec_id", "embedding", threshold = -1.0, tables = 4, bits = 3, dim = 8, n = 6L))
    assert(!mp.contains(5L), "zero vector paired in multiprobe refine")
  }

  test("refineBroadcastMax default derives from estimated bytes, not rows") {
    // default -1 → cutoff = 128 MB / (dim*8 + 64) bytes per prep row:
    // dim=64 → ~233k rows (broadcast branch at every dev SF), dim=4096
    // → ~4k rows (wide vectors LOWER the cutoff instead of pressuring
    // the driver — the r15 1M-row default was ~0.5 GB per broadcast)
    assert((128L << 20) / (64L * 8 + 64) == 233016L)
    assert((128L << 20) / (4096L * 8 + 64) == 4088L)
    // and the derived-default plan at sf0.01 (2k vectors) matches the
    // explicit-broadcast plan: same pair set either way is already
    // pinned above; here pin the BRANCH choice itself
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val derived = Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding",
      threshold = 0.45)
    assert(derived.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "below the derived cutoff the refine must broadcast")
  }

  test("multiprobeTables/multiprobeBudget: oracle-identical integer couplings") {
    // must match the oracle's LEAST(32, 8 << GREATEST(0, (bits-8)//4))
    // and LEAST(8, 3 + GREATEST(0, (bits-8)//4))
    assert(Dedup.multiprobeTables(8) == 8)
    assert(Dedup.multiprobeTables(11) == 8)
    assert(Dedup.multiprobeTables(12) == 16)
    assert(Dedup.multiprobeTables(13) == 16)
    assert(Dedup.multiprobeTables(16) == 32)
    assert(Dedup.multiprobeTables(24) == 32) // cap
    assert(Dedup.multiprobeTables(7) == 8)   // below floor clamps to base
    assert(Dedup.multiprobeBudget(8) == 3)
    assert(Dedup.multiprobeBudget(13) == 4)
    assert(Dedup.multiprobeBudget(16) == 5)
    assert(Dedup.multiprobeBudget(24) == 7)
    assert(Dedup.multiprobeBudget(28) == 8)  // cap
  }

  test("lshProbeKeys: exact key first, low-margin flips only, eval == codegen") {
    import graft.functions.AnnExprs
    import org.apache.spark.sql.functions.col
    val planes = Similarity.hyperplanesPrefix(tables = 2, bits = 5, dim = 4)
    import spark.implicits._
    val vs = Seq(
      (1L, Array(0.3, -1.2, 0.8, 0.05)),
      (2L, Array(-0.9, 0.1, 0.02, 1.4)),
      (3L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    val got = vs.select(col("id"), AnnExprs.lshProbeKeys(col("v"), planes, budget = 3, depth = 2).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq))
      .toMap
    // reference semantics recomputed independently per (row, table)
    val raw = vs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, v) <- raw; t <- 0 until 2) {
      val dots = (0 until 5).map(b => (0 until 4).map(i => v(i) * planes(t)(b)(i)).sum)
      val key = (0 until 5).foldLeft(0L)((a, b) => if (dots(b) >= 0) a | (1L << b) else a)
      val sel = (0 until 5).sortBy(b => (math.abs(dots(b)), b)).take(3).sorted
      val expect = Seq(key) ++ sel.map(b => key ^ (1L << b)) ++
        (for (i <- sel.indices; j <- (i + 1) until sel.length)
          yield key ^ (1L << sel(i)) ^ (1L << sel(j)))
      assert(got(id)(t).toSet == expect.toSet, s"probe keys for id=$id t=$t")
      assert(got(id)(t).head == key, "exact key must come first")
      assert(got(id)(t).length == 1 + 3 + 3, "1 + m + C(m,2) keys")
    }
    // interpreted eval path must agree with codegen (same expression,
    // forced through nullSafeEval)
    val expr = graft.functions.HyperplaneProbeKeysExpr(
      org.apache.spark.sql.graftshim.GraftShim.expression(col("v").cast("array<double>")),
      planes, 3, 2)
    for ((id, v) <- raw) {
      val arr = expr.nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      val tbls = (0 until arr.numElements()).map(t =>
        arr.getArray(t).toLongArray().toSeq)
      assert(tbls == (0 until 2).map(t => got(id)(t)), s"eval != codegen for id=$id")
    }
  }

  test("lshProbeKeys depth 3: triples of low-margin flips, superset of depth 2, eval == codegen") {
    // depth-3 probing is the measured fix for the 18-bit (1M-vector)
    // decade, where depth-2 recall falls to 29.4% and qd:6:3 holds
    // 53.5% (recordings/lsh_recall_r16.jsonl sampled-truth rows) —
    // the expression must enumerate exactly 1 + m + C(m,2) + C(m,3)
    // keys, every deeper set containing the shallower one
    import graft.functions.AnnExprs
    import org.apache.spark.sql.functions.col
    val planes = Similarity.hyperplanesPrefix(tables = 2, bits = 6, dim = 4)
    import spark.implicits._
    val vs = Seq(
      (1L, Array(0.3, -1.2, 0.8, 0.05)),
      (2L, Array(-0.9, 0.1, 0.02, 1.4))).toDF("id", "v")
    def keysAt(depth: Int) =
      vs.select(col("id"), AnnExprs.lshProbeKeys(col("v"), planes, budget = 4, depth = depth).as("ks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[Long]](1).map(_.toSet))
        .toMap
    val d2 = keysAt(2); val d3 = keysAt(3)
    val raw = vs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, v) <- raw; t <- 0 until 2) {
      val dots = (0 until 6).map(b => (0 until 4).map(i => v(i) * planes(t)(b)(i)).sum)
      val key = (0 until 6).foldLeft(0L)((a, b) => if (dots(b) >= 0) a | (1L << b) else a)
      val sel = (0 until 6).sortBy(b => (math.abs(dots(b)), b)).take(4).sorted
      val expect = (Seq(key) ++ sel.map(b => key ^ (1L << b)) ++
        (for (i <- sel.indices; j <- (i + 1) until sel.length)
          yield key ^ (1L << sel(i)) ^ (1L << sel(j))) ++
        (for {
          i <- sel.indices; j <- (i + 1) until sel.length; l <- (j + 1) until sel.length
        } yield key ^ (1L << sel(i)) ^ (1L << sel(j)) ^ (1L << sel(l)))).toSet
      assert(d3(id)(t) == expect, s"depth-3 keys for id=$id t=$t")
      assert(d2(id)(t).subsetOf(d3(id)(t)), "depth-2 keys must be a subset of depth-3")
      assert(d3(id)(t).size == 1 + 4 + 6 + 4, "1 + m + C(m,2) + C(m,3) keys")
    }
    // interpreted eval must agree with the codegen result above
    val expr = graft.functions.HyperplaneProbeKeysExpr(
      org.apache.spark.sql.graftshim.GraftShim.expression(col("v").cast("array<double>")),
      planes, 4, 3)
    for ((id, v) <- raw) {
      val arr = expr.nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      val tbls = (0 until arr.numElements()).map(t =>
        arr.getArray(t).toLongArray().toSet)
      assert(tbls == (0 until 2).map(t => d3(id)(t)), s"eval != codegen for id=$id")
    }
  }

  test("scale-pinned recall floors: committed LshRecallProbe recording at 20k/200k/1M") {
    // The floor the query-directed probing exists to hold BEYOND the
    // verify SF: recordings/lsh_recall_r17.jsonl is the committed
    // LshRecallProbe output over the regenerable data-sf1 (20 k
    // vectors, derived bits 13), data-sf10 (200 k, bits 16), and
    // data-sf50 (1 M, bits 18, sampled truth) fixtures at tau=0.45.
    // This spec pins (a) the derived default shape at those corpus
    // sizes, and (b) its RECORDED recall — a coupling change that
    // silently lands on an unmeasured shape fails (a); re-recording
    // with a recall collapse fails (b).
    val lines = {
      val src = scala.io.Source.fromFile("recordings/lsh_recall_r17.jsonl")
      try src.getLines().toList finally src.close()
    }
    def recall(mode: String, tables: Int, bits: Int): Double = {
      val re = ("\"mode\":\"" + java.util.regex.Pattern.quote(mode) +
        "\",\"tables\":" + tables + ",\"bits\":" + bits +
        ",\"hit\":\\d+,\"recall_pct\":([0-9.]+)").r.unanchored
      lines.collectFirst { case re(pct) => pct.toDouble }
        .getOrElse(fail(s"recording missing ($mode, tables=$tables, bits=$bits)"))
    }
    // the derived default shape at the three recorded corpus sizes —
    // depth escalates 2 -> 3 at 16 derived bits (multiprobeDepth)
    assert(Dedup.adaptiveLshBits(20000L) == 13
      && Dedup.multiprobeTables(13) == 16 && Dedup.multiprobeBudget(13) == 4
      && Dedup.multiprobeDepth(13) == 2,
      "derived shape at 20k moved off the recorded (qd:4:2, 16 tables) grid point")
    assert(Dedup.adaptiveLshBits(200000L) == 16
      && Dedup.multiprobeTables(16) == 32 && Dedup.multiprobeBudget(16) == 5
      && Dedup.multiprobeDepth(16) == 3,
      "derived shape at 200k moved off the recorded (qd:5:3, 32 tables) grid point")
    assert(Dedup.adaptiveLshBits(1000000L) == 18
      && Dedup.multiprobeTables(18) == 32 && Dedup.multiprobeBudget(18) == 5
      && Dedup.multiprobeDepth(18) == 3,
      "derived shape at 1M moved off the recorded (qd:5:3, 32 tables) grid point")
    // the recorded floors are HARD CONTRACTS (DedupConstants; measured
    // headroom 60.6 / 68.2 / 41.4 %) — a re-record below them fails
    assert(recall("qd:4:2", 16, 13) >= DedupConstants.MultiprobeRecallFloor20k,
      "recall floor at 20k vectors")
    assert(recall("qd:5:3", 32, 16) >= DedupConstants.MultiprobeRecallFloor200k,
      "recall floor at 200k vectors")
    assert(recall("qd:5:3", 32, 18) >= DedupConstants.MultiprobeRecallFloor1M,
      "recall floor at 1M vectors")
    // and the default must dominate the exact-collision path's cap at
    // the same scale
    assert(recall("qd:4:2", 16, 13) > recall("prefix", 32, 13))
    assert(recall("qd:5:3", 32, 16) > recall("prefix", 32, 16))
    assert(recall("qd:5:3", 32, 18) > recall("prefix", 32, 18))
  }

  test("hyperplanesPrefix: width-b planes are an exact prefix of any wider set") {
    val narrow = Similarity.hyperplanesPrefix(tables = 8, bits = 8, dim = 16)
    val wide = Similarity.hyperplanesPrefix(tables = 8, bits = 24, dim = 16)
    for (t <- 0 until 8; b <- 0 until 8)
      assert(java.util.Arrays.equals(narrow(t)(b), wide(t)(b)), s"plane ($t, $b) differs")
  }

  test("embeddingCosinePairsLsh adaptive default: derived width, still subset of exact") {
    val exact = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bits <= 0 → derived from count (floor 8 at this fixture size),
    // prefix-stable planes — semantics identical to a pinned run at the
    // derived width
    val lsh = Dedup.embeddingCosinePairsLsh(
      vecs, "vec_id", "embedding", threshold = 0.95, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivfTopK recall >= 0.8 vs brute force on the fixture") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 4, numCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("adaptive ANN defaults: derived shapes and recall floors at the verify SF") {
    // the r16 scale fix for the r15 verdict's #2: fixed 20Lx3P IVF and
    // 8tx8b LSH were recall-unmeasured past 500 vectors. Shape
    // couplings must match the oracle's integer derivations, and the
    // adaptive defaults hold the measured floors at the verify SF
    // (recordings/ann_recall_r17.jsonl pins 20k/200k/1M:
    // ivf-adaptive 58.0/65.6/78.4 % vs fixed 44.4/49.6/45.6;
    // lsh-adaptive with the flat deep top-k probe shape (qd:12:3)
    // 98.8/98.8/92.8 % vs the dedup coupling's 36.8/42.8/24.4 —
    // query-side-only probing affords depth the pair operator cannot)
    assert(Similarity.adaptiveIvfLists(500) == 32)
    assert(Similarity.adaptiveIvfLists(2000) == 64)
    assert(Similarity.adaptiveIvfLists(20000) == 256)
    assert(Similarity.adaptiveIvfLists(200000) == 512)
    assert(Similarity.adaptiveIvfLists(1L << 40) == 65536) // cap
    assert(Similarity.adaptiveIvfLists(1) == 16)           // floor
    assert(Similarity.adaptiveIvfProbes(32) == 4)
    assert(Similarity.adaptiveIvfProbes(16) == 3)          // floor
    assert(Similarity.adaptiveIvfProbes(512) == 64)

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteTopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val ivf = recallOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5, n = n))
    assert(ivf >= 0.4, s"adaptive IVF recall $ivf < 0.4 floor at the verify SF")
    val lsh = recallOf(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, n = n))
    assert(lsh >= 0.9, s"adaptive LSH recall $lsh < 0.9 floor at the verify SF")
  }

  test("pqTopK: compressed-scan ranking recovers cluster neighbors") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", 4,
      m = 4, ks = 16, dim = 8, rerank = 0) // pure-ADC tier pinned
    val approx = pq.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall $recall")
    // the scan must stream the corpus against broadcast query tables —
    // no shuffle before the rank
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("ivfProbesForRecall escalates nProbe to the recall target on sampled ground truth") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val lists = Similarity.adaptiveIvfLists(n)
    val p0 = Similarity.adaptiveIvfProbes(lists)
    val cap = math.max(p0, lists / 2)
    val (p, recBp) = Similarity.ivfProbesForRecall(emb, "vec_id", "embedding", 5, n = n,
      sampleQueries = 32)
    assert(p >= p0 && p <= cap, s"p=$p outside [$p0, $cap]")
    // the contract: either the target was met, or the honest ceiling
    // (cap) is returned with its measured recall
    assert(recBp >= 8500 || p == cap, s"p=$p recall=${recBp}bp")
    // determinism
    assert(Similarity.ivfProbesForRecall(emb, "vec_id", "embedding", 5, n = n,
      sampleQueries = 32) == ((p, recBp)))
    // the DEFAULT sample size derives from the target's confidence
    // width (r19 advice: 32 queries was a ±5-6% estimator): ±2.5% at
    // 85%/k=5 needs 157 queries; never below the legacy 32
    assert(Similarity.calibrationSampleSize(8500, 5) == 157)
    assert(Similarity.calibrationSampleSize(8500, 1) == 784)
    assert(Similarity.calibrationSampleSize(5000, 100) == 32)
    val derived = Similarity.ivfProbesForRecall(emb, "vec_id", "embedding", 5, n = n)
    assert(derived._1 >= p0 && derived._1 <= cap)
    // the returned probe count delivers the measured recall through the
    // PUBLIC operator on the same sample — the calibration is not a
    // private code path
    val sample = Similarity.recallSampleQueries(emb, "vec_id", "embedding", 32)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairsOf(Similarity.bruteTopK(emb, sample, "vec_id", "embedding", 5))
    val got = pairsOf(Similarity.ivfTopK(emb, sample, "vec_id", "embedding", 5,
      nProbe = p, n = n))
    val bp = 10000L * (truth intersect got).size / truth.size
    assert(bp == recBp, s"operator recall ${bp}bp != calibration ${recBp}bp")
    // and the escalation genuinely lifted recall past the cost-shaped
    // default's ceiling when it had to escalate
    if (p > p0) {
      val gotP0 = pairsOf(Similarity.ivfTopK(emb, sample, "vec_id", "embedding", 5,
        nProbe = p0, n = n))
      val bp0 = 10000L * (truth intersect gotP0).size / truth.size
      assert(bp > bp0, s"escalated recall ${bp}bp not above default ${bp0}bp")
    }
  }

  test("lshTopK probe shape derives from BOTH sizes: corpus-like query sets auto-couple") {
    import graft.ext.Dedup
    // retrieval batch (queries ≪ corpus): flat deep qd:12:3
    assert(Similarity.lshAutoShape(20, 50L, 1000000L) ==
      ((Similarity.TopKProbeBudget, Similarity.TopKProbeDepth)))
    // corpus-as-queries (knn-graph / bitext): the dedup coupling — the
    // 10⁹-row probe fold r18 measured at 100k×100k must be impossible
    // with default args
    assert(Similarity.lshAutoShape(20, 1000000L, 1000000L) ==
      ((Dedup.multiprobeBudget(20), Dedup.multiprobeDepth(20))))
    // exact boundary: probe fold ≤ factor × corpus fold stays flat
    val keys = Similarity.probeKeysPerTable(20,
      Similarity.TopKProbeBudget, Similarity.TopKProbeDepth)
    val n = 1000000L
    val qAt = Similarity.FlatProbeCorpusFactor * n / keys
    assert(Similarity.lshAutoShape(20, qAt, n)._1 == Similarity.TopKProbeBudget)
    assert(Similarity.lshAutoShape(20, qAt + 1, n)._1 == Dedup.multiprobeBudget(20))
    // end-to-end: queries == corpus at DEFAULT args runs the coupled
    // shape — frame-identical to passing the coupling explicitly
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val nn = emb.count()
    val bits = Dedup.adaptiveLshBits(nn)
    def frame(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos").collect()
        .map(_.toString).sorted.toSeq
    val auto = frame(Similarity.lshTopK(emb, emb, "vec_id", "embedding", 5, n = nn))
    val pinned = frame(Similarity.lshTopK(emb, emb, "vec_id", "embedding", 5, n = nn,
      probeBudget = Dedup.multiprobeBudget(bits), probeDepth = Dedup.multiprobeDepth(bits)))
    assert(auto.nonEmpty && auto == pinned)
    // the coupled shape's recall is STATED, not silent (54% at
    // 200k x 200k defaults, recordings/ann_recall_r19.jsonl;
    // lshAutoShape scaladoc) — pin a fixture floor so it can't degrade
    // further unnoticed
    val truth = Similarity.bruteTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.lshTopK(emb, emb, "vec_id", "embedding", 5, n = nn)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect got).size.toDouble / truth.size
    assert(recall >= 0.3, s"coupled knn-graph recall $recall fell below the stated floor")
  }

  test("pqTrainCodebooks: deterministic, moves the books, never hurts pure-ADC recall") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val t1 = Similarity.pqTrainCodebooks(vecs, "vec_id", "embedding",
      m = 4, ks = 16, dim = 8, iters = 2)
    val t2 = Similarity.pqTrainCodebooks(vecs, "vec_id", "embedding",
      m = 4, ks = 16, dim = 8, iters = 2)
    assert(t1.flatten.flatten.toSeq == t2.flatten.flatten.toSeq,
      "training is not deterministic")
    // iters = 0 is exactly the hash-seeded books; training must move them
    val seeds = Similarity.pqTrainCodebooks(vecs, "vec_id", "embedding",
      m = 4, ks = 16, dim = 8, iters = 0)
    assert(t1.flatten.flatten.toSeq != seeds.flatten.flatten.toSeq,
      "Lloyd rounds left the codebooks untouched")
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(books: Array[Array[Array[Double]]]): Double = {
      val got = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", 4,
        m = 4, ks = 16, dim = 8, rerank = 0, trainedCodebooks = Some(books))
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val rTrained = recallOf(t1)
    val rSeeds = recallOf(seeds)
    assert(rTrained >= rSeeds, s"trained ADC recall $rTrained < hash-seeded $rSeeds")
  }

  test("PQ family defaults run the rerank shape (cos contract), never silent pure-ADC") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    // default rerank derives R = max(50, ceil(250/k)) — deepened in
    // r20 together with trained-by-default books (the R=10 shortlist
    // was the binding loss at 200k: 38 → 57 % recall@5 moving R 10→50
    // on trained ks=256 books, recordings/pq_rerank_r20.jsonl)
    assert(Similarity.defaultRerank(5) == 50 && Similarity.defaultRerank(1) == 250 &&
      Similarity.defaultRerank(100) == 50)
    val dflt = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", 4,
      m = 4, ks = 16, dim = 8)
    // the refined output speaks the family cosine contract, not ADC
    assert(dflt.columns.contains("cos") && !dflt.columns.contains("adist"))
    val rows = dflt.collect()
    assert(rows.nonEmpty && rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0001))
  }

  test("PQ-family DEFAULT calls train their books and meet the stated recall floor") {
    // the r20 quality-floor contract (Similarity.pqTopK/ivfPqTopK
    // trainBooks docs): a bare default call must never silently ship
    // near-noise. Stated floors, pinned here at the verify SF:
    //   - pqTopK (compressed FULL scan + derived rerank): recall@5
    //     >= 0.9 of exact truth — no probe choice to hide behind;
    //   - ivfPqTopK: >= 0.8 x the UNCOMPRESSED ivfTopK recall at the
    //     same (documented, cost-shaped) probe shape — the compressed
    //     tier's own loss is bounded; the probe ceiling itself is the
    //     stated knob (ivfProbesForRecall calibrates it).
    // 200k/1M points for the same shapes: recordings/pq_rerank_r20.jsonl.
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteTopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val pqDflt = Similarity.pqTopK(emb, qs, "vec_id", "embedding", 5)
    val pqR = recallOf(pqDflt)
    assert(pqR >= 0.9, s"default pqTopK recall $pqR below the 0.9 stated floor")
    val ivfR = recallOf(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5, n = n))
    val ivfpqR = recallOf(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 5, n = n))
    assert(ivfpqR >= 0.8 * ivfR,
      s"default ivfPqTopK recall $ivfpqR below 0.8 x the $ivfR probe ceiling")
    // the default call IS the trained call: injecting the books the
    // default would train is frame-identical (pins train-by-default)
    val books = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding")
    def frame(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(frame(pqDflt) == frame(Similarity.pqTopK(emb, qs, "vec_id", "embedding", 5,
      trainedCodebooks = Some(books))))
  }

  test("ivfPqTopK: composed pruning still recovers cluster neighbors") {
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding", 4,
      numCentroids = 8, nProbe = 3, m = 4, ks = 16, dim = 8, rerank = 0)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("kmeansCentroids: deterministic, lowers SSE, and feeds ivfTopK") {
    def sse(cents: Seq[(Long, Array[Double])]): Double =
      vecs.collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        cents.map(c => c._2.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    val seeds = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      numCentroids = 8, iters = 0)
    val trained = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      numCentroids = 8, iters = 5)
    val again = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      numCentroids = 8, iters = 5)
    // exact determinism: integer-discretized sums make reruns bit-equal
    assert(trained.map(_._1) == again.map(_._1))
    for (((_, a), (_, b)) <- trained.zip(again)) assert(a.sameElements(b))
    assert(sse(trained) < sse(seeds), s"${sse(trained)} !< ${sse(seeds)}")

    // trained centroids slot into ivfTopK unchanged
    val queries = vecs.filter(col("vec_id") % 5 === 0)
    val truth = Similarity.bruteTopK(vecs, queries, "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 4,
      numCentroids = 8, nProbe = 3, trainedCentroids = Some(trained))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.8, s"trained-centroid recall $recall")
  }

  test("randomProject roughly preserves pairwise distance ordering (JL property)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 60)
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val proj = Similarity.randomProject(emb, "vec_id", "embedding", outDim = 16, dim = 64)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble / 1e4)).toMap

    def d2(a: Iterable[Double], b: Iterable[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[||Px||^2] = outDim * ||x||^2 for Gaussian P — compare the
    // normalized ratio over sample pairs; JL says it concentrates
    val ids = raw.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length; if (i + j) % 7 == 0
      a = ids(i); b = ids(j)
      dRaw = d2(raw(a), raw(b)); if dRaw > 1e-9
    } yield d2(proj(a), proj(b)) / (16.0 * dRaw)
    assert(ratios.nonEmpty)
    val within = ratios.count(r => r > 0.3 && r < 2.5).toDouble / ratios.size
    assert(within >= 0.9, s"JL concentration: $within of ${ratios.size} pairs in band")

    // reruns are bit-identical (seeded matrix, fixed summation order)
    val again = Similarity.randomProject(emb, "vec_id", "embedding", outDim = 16, dim = 64)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.sameElements(
      Similarity.randomProject(emb, "vec_id", "embedding", outDim = 16, dim = 64)
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))))
  }

  test("standardizeDims: per-dimension z-scores center at ~0 with unit spread") {
    import spark.implicits._
    // dim 0 spread wide, dim 1 narrow with offset — standardization
    // must equalize them; 40 vectors of dim 2
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array((i * 10).toFloat, (1000 + i % 4).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.standardizeDims(vecs, "vec_id", "embedding")
      .as[(Long, Int, Long)].collect()
    assert(out.length == 80)
    val byDim = out.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    byDim.values.foreach { zs =>
      // mean(z) ~ 0 (within discretization: |sum| < n rounding units)
      assert(math.abs(zs.sum) <= zs.length, s"centered: ${zs.sum}")
      // var(z) ~ 1 in e4 units: mean of z^2 near 1e8
      val msq = zs.map(z => z * z).sum / zs.length
      assert(msq > 90000000L && msq < 110000000L, s"unit spread: $msq")
    }
    // both dims now comparable despite 10x raw-scale difference
    val spread = byDim.view.mapValues(zs => zs.max - zs.min).values.toSeq
    assert(spread.max.toDouble / spread.min < 1.5, s"equalized: $spread")
  }
}
