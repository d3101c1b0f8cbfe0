package graft

import graft.ext.Dedup
import graft.streaming.{BatchTable, EmbeddingDedupGate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The embedding vector store's full gate lifecycle — append → gate →
  * compact → gate — through the shared [[BatchTable]] component, plus
  * the [[Dedup.incrementalEmbeddingDups]] per-batch body in isolation
  * (the r15 advice item: the operator shipped with a dangling doc link
  * and no coverage). Mirrors [[StreamingImageGateSpec]] for the
  * lifecycle and the incrementalDupsFromSignatures specs for the
  * verdict tiers.
  */
class EmbeddingGateSpec extends SparkSuite {

  // Deterministic 64-dim float vectors: family f's base direction, a
  // near-dup at cosine ~0.99999, and the all-zeros direction-free
  // vector for the NaN-guard probe. Floats round-trip parquet exactly.
  private def base(f: Int): Array[Float] =
    Array.tabulate(64)(d => math.sin(f * 64 + d + 1).toFloat)
  private def near(f: Int): Array[Float] = {
    val b = base(f)
    Array.tabulate(64)(d => b(d) + 0.001f * math.cos(d + 1).toFloat)
  }
  private val zeros: Array[Float] = Array.fill(64)(0.0f)

  // batch 0 seeds three families; batch 1 = near-dup of 0, fresh
  // family 3, EXACT copy of id 1; batch 2 = exact copy of id 0,
  // near-dup of 2, fresh family 4, and the zero vector
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

  private def verdictMap(df: DataFrame): Map[Long, (Option[Long], Option[Long], Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((
      Option(r.get(1)).map(_.toString.toLong),
      Option(r.get(2)).map(_.toString.toLong),
      r.getBoolean(4)))).toMap

  test("incrementalEmbeddingDups: exact tier, near tier, fresh, and the zero-norm guard") {
    val history = dfOf(b0 ++ b1)
    val batch = dfOf(b2)
    val v = verdictMap(Dedup.incrementalEmbeddingDups(
      history, batch, "vec_id", "embedding", threshold = 0.45))
    assert(v.keySet == Set(20L, 21L, 22L, 23L), s"one verdict per batch row: $v")
    // 20 is bit-identical to history id 0 (min over {0}); its best
    // near match is also 0 (cos exactly 1.0 beats 10's ~0.99999)
    assert(v(20L)._1.contains(0L), s"exact tier: ${v(20L)}")
    assert(v(20L)._2.contains(0L), s"near tier prefers the exact-cos history row: ${v(20L)}")
    assert(!v(20L)._3)
    // 21 is a perturbation of family 2 — near of 2, no exact match
    assert(v(21L) == ((None, Some(2L), false)), s"near verdict: ${v(21L)}")
    // 22 is a fresh family
    assert(v(22L) == ((None, None, true)), s"fresh verdict: ${v(22L)}")
    // 23 is the zero vector: cosine is 0/0 = NaN, and NaN >= tau is
    // TRUE under Spark's NaN ordering — without the norm guard this
    // row near-dups every bucket-mate (r15 advice)
    assert(v(23L) == ((None, None, true)), s"zero-norm verdict: ${v(23L)}")
  }

  test("incrementalEmbeddingDups: a zero-norm HISTORY row never near-matches a batch row") {
    // family 4 vs history family 0: the sin-shift correlation is
    // ~cos(64*Δf mod 2π) — Δf=4 gives ~-0.05, safely below tau
    // (Δf=5..6 would be a TRUE near-dup at ~0.75-0.9)
    val history = dfOf(Seq(0L -> base(0), 5L -> zeros))
    val batch = dfOf(Seq(30L -> base(4)))
    val v = verdictMap(Dedup.incrementalEmbeddingDups(
      history, batch, "vec_id", "embedding", threshold = 0.45))
    assert(v(30L) == ((None, None, true)), s"fresh despite zero-norm history row: $v")
  }

  test("append -> gate -> compact -> gate: verdicts identical with and without compaction") {
    val plain = tempDir("graft-embgate-plain")
    val compacted = tempDir("graft-embgate-compact")
    for (dir <- Seq(plain, compacted)) {
      EmbeddingDedupGate.gateAndIngest(dfOf(b0), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 0L)
      EmbeddingDedupGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    }
    EmbeddingDedupGate.compactStore(spark, s"$compacted/store", upToBatch = 0L)
    for (dir <- Seq(plain, compacted))
      EmbeddingDedupGate.gateAndIngest(dfOf(b2), "vec_id", "embedding",
        s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 2L)

    def batchVerdicts(dir: String, id: Long) = verdictMap(
      spark.read.parquet(s"$dir/verdicts").filter(col(BatchTable.BatchCol) === id)
        .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new"))
    val vPlain = batchVerdicts(plain, 2L)
    assert(vPlain == batchVerdicts(compacted, 2L), "compaction changed verdicts")

    // batch 0 is day 1: no store yet, everything new
    assert(batchVerdicts(plain, 0L).values.forall(_ == ((None, None, true))), "day-1 all new")
    // batch 1 gated against batch 0 only: 10 near of 0, 12 exact of 1
    val v1 = batchVerdicts(plain, 1L)
    assert(v1(10L)._2.contains(0L) && !v1(10L)._3, s"near across batches: ${v1(10L)}")
    assert(v1(12L)._1.contains(1L) && !v1(12L)._3, s"exact across batches: ${v1(12L)}")
    assert(v1(11L) == ((None, None, true)), s"fresh family: ${v1(11L)}")
    // batch 2 gated against batches 0+1
    assert(vPlain(20L)._1.contains(0L) && vPlain(21L)._2.contains(2L))
    assert(vPlain(22L) == ((None, None, true)) && vPlain(23L) == ((None, None, true)))

    // compacted layout: batch-0 partition folded away, sentinel present
    val parts = new java.io.File(s"$compacted/store").listFiles()
      .map(_.getName).filter(_.startsWith(BatchTable.BatchCol)).toSet
    assert(parts == Set(s"${BatchTable.BatchCol}=-1", s"${BatchTable.BatchCol}=1",
      s"${BatchTable.BatchCol}=2"), parts.toString)
  }

  test("replay overwrites: re-running a batch leaves one verdict row per vector") {
    val dir = tempDir("graft-embgate-replay")
    EmbeddingDedupGate.gateAndIngest(dfOf(b0), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 0L)
    EmbeddingDedupGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    val before = verdictMap(spark.read.parquet(s"$dir/verdicts")
      .filter(col(BatchTable.BatchCol) === 1L)
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new"))
    // crash-replay of batch 1: own-partition exclusion means the batch
    // must NOT gate against its own prior rows, and dynamic overwrite
    // must not duplicate either sink
    EmbeddingDedupGate.gateAndIngest(dfOf(b1), "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", threshold = 0.45, batchId = 1L)
    val after = verdictMap(spark.read.parquet(s"$dir/verdicts")
      .filter(col(BatchTable.BatchCol) === 1L)
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new"))
    assert(after == before, s"replay changed verdicts: $after vs $before")
    assert(spark.read.parquet(s"$dir/store").count() == (b0 ++ b1).size,
      "store holds exactly one row per ingested vector after replay")
  }

  test("streaming lifecycle via start(): checkpointed day-2 run gates only the new files") {
    val dir = tempDir("graft-embgate-stream")
    val schema = dfOf(b0).schema
    def src = graft.streaming.StreamingExtract.source(spark, s"$dir/in", schema)

    dfOf(b0).write.mode("overwrite").parquet(s"$dir/in")
    EmbeddingDedupGate.start(src, "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", s"$dir/ckpt", threshold = 0.45)
      .awaitTermination(120000)
    val v1 = spark.read.parquet(s"$dir/verdicts")
    assert(v1.count() == b0.size && v1.filter(col("is_new")).count() == b0.size,
      "day 1: every vector is new")

    dfOf(b1).write.mode("append").parquet(s"$dir/in")
    EmbeddingDedupGate.start(src, "vec_id", "embedding",
      s"$dir/store", s"$dir/verdicts", s"$dir/ckpt", threshold = 0.45)
      .awaitTermination(120000)
    val day2 = verdictMap(spark.read.parquet(s"$dir/verdicts")
      .filter(!col("doc_id").isin(b0.map(_._1): _*))
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new"))
    assert(day2.keySet == b1.map(_._1).toSet, s"day-2 covers exactly the new batch: $day2")
    assert(day2(10L)._2.contains(0L) && day2(12L)._1.contains(1L) &&
      day2(11L) == ((None, None, true)), s"day-2 verdicts: $day2")
  }
}
