package graft

import graft.ext.DedupConstants
import graft.functions.SketchExprs
import org.apache.spark.sql.functions._

/** The native codegen sketch expressions must agree bit-for-bit with
  * the SQL spelling the DuckDB oracles use — these specs pin that
  * equivalence on real corpus text (and via the oracle gate, to DuckDB
  * itself).
  */
class SketchExprSpec extends SparkSuite {
  import spark.implicits._
  import DedupConstants._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), ext.Dedup.shingleCol("text").as("sh"))
    .filter(size(col("sh")) > 0)

  test("hashShingles equals the conv(substr(md5)) SQL spelling") {
    val mismatch = docs
      .withColumn("native", SketchExprs.hashShingles(col("sh"), P))
      .withColumn("sql",
        expr(s"transform(sh, s -> cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % $P)"))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(mismatch == 0)
  }

  test("minhashSig equals the per-slot min over affine families") {
    val hs = docs.withColumn("hs", SketchExprs.hashShingles(col("sh"), P))
    val slotMins = (0 until K).map { i =>
      expr(s"array_min(transform(hs, h -> (${a(i)} * h + ${b(i)}) % $P))")
    }
    val mismatch = hs
      .withColumn("native", SketchExprs.minhashSig(col("hs")))
      .withColumn("sql", array(slotMins: _*))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(mismatch == 0)
  }

  test("simhash equals the per-bit vote sum spelling") {
    val hs = docs.withColumn("hs", SketchExprs.hashShingles(col("sh"), SimMod))
    val votes = (0 until SimBits).map { bit =>
      expr(s"CASE WHEN aggregate(hs, 0, (acc, h) -> acc + CASE WHEN (h div ${1L << bit}) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << bit} ELSE 0 END")
    }.reduce(_ + _)
    val mismatch = hs
      .withColumn("native", SketchExprs.simhash(col("hs")))
      .withColumn("sql", votes.cast("long"))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(mismatch == 0)
  }

  test("winnowMin equals the transform/slice SQL spelling") {
    val w = ext.TextConstants.FpWindow
    val hs = docs.withColumn("hs", SketchExprs.hashShingles(col("sh"), P))
      .filter(size(col("hs")) >= w)
    val mismatch = hs
      .withColumn("native", SketchExprs.winnowMin(col("hs"), w))
      .withColumn("sql",
        expr(s"transform(sequence(0, size(hs) - $w), i -> array_min(slice(hs, i + 1, $w)))"))
      .filter(col("native") =!= col("sql"))
      .count()
    assert(mismatch == 0)
    // short input -> empty
    val short = Seq((1L, Seq(1L, 2L))).toDF("id", "hs")
      .select(SketchExprs.winnowMin(col("hs"), w).as("fp")).collect()(0)
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("empty input: hashShingles/minhashSig return empty arrays") {
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "sh")
    val row = empty
      .select(
        SketchExprs.hashShingles(col("sh"), P).as("hs"),
        SketchExprs.minhashSig(SketchExprs.hashShingles(col("sh"), P)).as("sig"))
      .collect()(0)
    assert(row.getSeq[Long](0).isEmpty && row.getSeq[Long](1).isEmpty)
  }
}
