package graft

import graft.streaming.{BatchTable, EmbeddingDedupGate, IndexedEmbeddingGate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-signature embedding gate ([[IndexedEmbeddingGate]]):
  * the load-bearing assertion is VERDICT IDENTITY with
  * [[EmbeddingDedupGate]] under the same pinned shape — the indexed
  * gate changes where the history's LSH keys come from (slim persisted
  * rows vs per-batch re-derivation), never what a verdict says. Plus
  * the store layout contract (slim sigs exclude zero-norm rows, the
  * vector table keeps them for the exact tier) and [[BatchTable]]'s
  * lifecycle over BOTH store tables (replay overwrite, compaction
  * invariance). Fixtures mirror [[EmbeddingGateSpec]].
  */
class IndexedEmbeddingGateSpec extends SparkSuite {

  private def base(f: Int): Array[Float] =
    Array.tabulate(64)(d => math.sin(f * 64 + d + 1).toFloat)
  private def near(f: Int): Array[Float] = {
    val b = base(f)
    Array.tabulate(64)(d => b(d) + 0.001f * math.cos(d + 1).toFloat)
  }
  private val zeros: Array[Float] = Array.fill(64)(0.0f)

  private val b0: Seq[(Long, Array[Float])] =
    Seq(0L -> base(0), 1L -> base(1), 2L -> base(2))
  private val b1: Seq[(Long, Array[Float])] =
    Seq(10L -> near(0), 11L -> base(3), 12L -> base(1))
  private val b2: Seq[(Long, Array[Float])] =
    Seq(20L -> base(0), 21L -> near(2), 22L -> base(4), 23L -> zeros)

  private def dfOf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val verdictCols = Seq("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new")

  private def verdicts(dir: String, id: Long): Set[String] =
    spark.read.parquet(s"$dir/verdicts").filter(col(BatchTable.BatchCol) === id)
      .select(verdictCols.map(col): _*)
      .collect().map(_.toString).toSet

  test("verdicts are frame-identical to EmbeddingDedupGate, batch by batch") {
    val idx = tempDir("graft-idxgate-identity")
    val ref = tempDir("graft-idxgate-reference")
    for (((rows, id)) <- Seq(b0, b1, b2).zipWithIndex) {
      IndexedEmbeddingGate.gateAndIngest(dfOf(rows), "vec_id", "embedding",
        s"$idx/store", s"$idx/verdicts", threshold = 0.45, batchId = id.toLong)
      EmbeddingDedupGate.gateAndIngest(dfOf(rows), "vec_id", "embedding",
        s"$ref/store", s"$ref/verdicts", threshold = 0.45, batchId = id.toLong)
    }
    for (id <- 0L to 2L)
      assert(verdicts(idx, id) == verdicts(ref, id),
        s"batch $id diverged from the in-flight gate")
    // and the verdicts are the known tier picture (guards the identity
    // check against both gates being wrong the same way)
    val v2 = spark.read.parquet(s"$idx/verdicts")
      .filter(col(BatchTable.BatchCol) === 2L).select(verdictCols.map(col): _*)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(4))))
      .toMap
    assert(v2(20L)._1.contains(0L) && !v2(20L)._3, s"exact tier: ${v2(20L)}")
    assert(v2(21L)._1.isEmpty && v2(21L)._2.contains(2L), s"near tier: ${v2(21L)}")
    assert(v2(22L) == ((None, None, true)), s"fresh: ${v2(22L)}")
    assert(v2(23L) == ((None, None, true)), s"zero-norm never near-matches: ${v2(23L)}")
  }

  test("store layout: slim sigs exclude zero-norm rows, vectors keep them for the exact tier") {
    val dir = tempDir("graft-idxgate-layout")
    IndexedEmbeddingGate.gateAndIngest(dfOf(b2), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 0L)
    val vecs = spark.read.parquet(s"$dir/store/vectors")
    assert(vecs.count() == b2.size, "every ingested vector stored once, zero-norm included")
    val sigs = spark.read.parquet(s"$dir/store/sigs")
    // 3 non-zero vectors x 8 pinned tables; the slim schema carries no
    // vector bytes through the fold
    assert(sigs.count() == 3 * 8, s"slim sig rows: ${sigs.count()}")
    assert(sigs.columns.toSet == Set("hid", "t", "b", BatchTable.BatchCol),
      sigs.columns.mkString(","))
    assert(sigs.filter(col("hid") === 23L).isEmpty, "zero-norm row has no signature keys")
    // a later EXACT copy of the zero vector must still exact-match it
    IndexedEmbeddingGate.gateAndIngest(dfOf(Seq(30L -> zeros)), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    val v = spark.read.parquet(s"$dir/verdicts").filter(col("doc_id") === 30L)
      .select(verdictCols.map(col): _*).collect().head
    assert(v.getLong(1) == 23L && !v.getBoolean(4), s"zero vector exact tier: $v")
  }

  test("append -> gate -> compact(both tables) -> gate: verdicts identical; replay overwrites") {
    val plain = tempDir("graft-idxgate-plain")
    val compacted = tempDir("graft-idxgate-compact")
    for (dir <- Seq(plain, compacted); (rows, id) <- Seq(b0, b1).zipWithIndex)
      IndexedEmbeddingGate.gateAndIngest(dfOf(rows), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = id.toLong)
    IndexedEmbeddingGate.compactStore(spark, s"$compacted/store", upToBatch = 0L)
    for (dir <- Seq(plain, compacted))
      IndexedEmbeddingGate.gateAndIngest(dfOf(b2), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 2L)
    assert(verdicts(plain, 2L) == verdicts(compacted, 2L), "compaction changed verdicts")
    for (table <- Seq("vectors", "sigs")) {
      val parts = new java.io.File(s"$compacted/store/$table").listFiles()
        .map(_.getName).filter(_.startsWith(BatchTable.BatchCol)).toSet
      assert(parts == Set(s"${BatchTable.BatchCol}=-1", s"${BatchTable.BatchCol}=1",
        s"${BatchTable.BatchCol}=2"), s"$table partitions: $parts")
    }
    // crash-replay of the latest batch: own-partition exclusion on BOTH
    // store tables, dynamic overwrite on all three sinks
    val before = verdicts(plain, 2L)
    IndexedEmbeddingGate.gateAndIngest(dfOf(b2), "vec_id", "embedding",
      s"$plain/store", s"$plain/verdicts", threshold = 0.45, batchId = 2L)
    assert(verdicts(plain, 2L) == before, "replay changed verdicts")
    assert(spark.read.parquet(s"$plain/store/vectors").count() == (b0 ++ b1 ++ b2).size,
      "vector store holds exactly one row per ingested vector after replay")
    assert(spark.read.parquet(s"$plain/store/sigs").count() == (3 + 3 + 3) * 8,
      "sig store holds exactly tables rows per non-zero vector after replay")
  }

  test("store pins its shape: start() threads a non-default shape, a mismatched gate fails fast") {
    val dir = tempDir("graft-idxgate-shape")
    val schema = dfOf(b0).schema
    dfOf(b0).write.mode("overwrite").parquet(s"$dir/in")
    // day 1 through start() at a NON-default shape — r18's advice found
    // start() hard-wiring the default and silently mixing geometries
    IndexedEmbeddingGate.start(
      graft.streaming.StreamingExtract.source(spark, s"$dir/in", schema),
      "vec_id", "embedding", s"$dir/store", s"$dir/verdicts", s"$dir/ckpt",
      threshold = 0.45, tables = 16, bits = 12)
      .awaitTermination(120000)
    assert(IndexedEmbeddingGate.readShape(spark, s"$dir/store")
      .contains(IndexedEmbeddingGate.GateShape(16, 12, 3, 2, 42L, 64)))
    // a default-shape gate against the 16x12 store must fail fast, not
    // probe wrong geometry silently
    val e = intercept[IllegalArgumentException] {
      IndexedEmbeddingGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    }
    assert(e.getMessage.contains("shape"), e.getMessage)
    // the matching shape gates cleanly and still finds the near-dup
    IndexedEmbeddingGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L,
      tables = 16, bits = 12)
    val day2 = spark.read.parquet(s"$dir/verdicts")
      .filter(col("doc_id") === 12L).select(verdictCols.map(col): _*).collect().head
    assert(day2.getLong(1) == 1L && !day2.getBoolean(4), s"exact tier: $day2")
  }

  test("an ingested store with no pinned shape refuses to pin after the fact") {
    val dir = tempDir("graft-idxgate-unpinned")
    IndexedEmbeddingGate.gateAndIngest(dfOf(b0), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 0L)
    // simulate a pre-pinning store (or a lost pin): signature rows on
    // disk, no shape file. The next gate must NOT write whatever shape
    // it happens to be called with — that would silently legitimize a
    // mismatched geometry, the exact bug pinning targets (r19 advice)
    // shape is a key=value file since r22 (a 1-row parquet dir before)
    val shapePin = new java.io.File(s"$dir/store/shape")
    Option(shapePin.listFiles()).foreach(_.foreach(_.delete()))
    shapePin.delete()
    val e = intercept[IllegalArgumentException] {
      IndexedEmbeddingGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    }
    assert(e.getMessage.contains("refusing to pin"), e.getMessage)
  }

  test("streaming lifecycle via start(): checkpointed day-2 run gates only the new files") {
    val dir = tempDir("graft-idxgate-stream")
    val schema = dfOf(b0).schema
    def src = graft.streaming.StreamingExtract.source(spark, s"$dir/in", schema)

    dfOf(b0).write.mode("overwrite").parquet(s"$dir/in")
    IndexedEmbeddingGate.start(src, "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", s"$dir/ckpt", threshold = 0.45)
      .awaitTermination(120000)
    val v1 = spark.read.parquet(s"$dir/verdicts")
    assert(v1.count() == b0.size && v1.filter(col("is_new")).count() == b0.size,
      "day 1: every vector is new")

    dfOf(b1).write.mode("append").parquet(s"$dir/in")
    IndexedEmbeddingGate.start(src, "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", s"$dir/ckpt", threshold = 0.45)
      .awaitTermination(120000)
    val day2 = spark.read.parquet(s"$dir/verdicts")
      .filter(!col("doc_id").isin(b0.map(_._1): _*))
      .select(verdictCols.map(col): _*)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(4))))
      .toMap
    assert(day2.keySet == b1.map(_._1).toSet, s"day-2 covers exactly the new batch: $day2")
    assert(day2(10L)._2.contains(0L) && day2(12L)._1.contains(1L) &&
      day2(11L) == ((None, None, true)), s"day-2 verdicts: $day2")
  }
}
