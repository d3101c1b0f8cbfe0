package graft

import graft.ext.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSuite {

  test("decodeStub histogram counts every byte exactly once") {
    val bytes = Array.tabulate(256)(_.toByte)
    val hist = Multimodal.decodeStub(bytes)
    assert(hist.sum == 256)
    assert(hist.forall(_ == 16)) // uniform bytes → 16 per 16-wide bin
  }

  test("resizeStub bounds payload size deterministically") {
    val bytes = Array.tabulate(1000)(_.toByte)
    val small = Multimodal.resizeStub(bytes, 100)
    assert(small.length == 100)
    assert(small.toSeq == Multimodal.resizeStub(bytes, 100).toSeq)
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 100).toSeq == Seq[Byte](1, 2))
  }

  test("frameSampleStub strides frames") {
    val video = Array.tabulate(40)(_.toByte) // 10 frames of 4 bytes
    val frames = Multimodal.frameSampleStub(video, frameBytes = 4, every = 3)
    assert(frames.length == 4) // frames 0,3,6,9
    assert(frames.head.toSeq == Seq[Byte](0, 1, 2, 3))
  }

  test("attachMedia builds binary payload + typed metadata") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, "hello"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val rec = Multimodal.attachMedia(df, "doc_id", "text").collect()(0)
    assert(rec.getAs[Array[Byte]]("media").toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(rec.getStruct(2).getAs[Long]("nBytes") == 5L)
  }

  test("extractFeatures runs batched per-partition and preserves ids") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 200L).map(i => Row(i, s"doc number $i payload"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val feats = Multimodal.featuresOf(df, "doc_id", "text").collect()
    assert(feats.length == 200)
    assert(feats.map(_.id).toSet == (1L to 200L).toSet)
    val f1 = feats.find(_.id == 1L).get
    assert(f1.histogram.sum == "doc number 1 payload".getBytes("UTF-8").length)
  }
}
