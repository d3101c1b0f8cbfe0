package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct, and per-item
  * compute (decode / feature-extract / resize / frame-sample) runs as
  * batched partition-local JVM code over a typed Dataset — the Scala
  * analog of a vectorized (Pandas-style) batch UDF: one iterator per
  * partition, items processed in fixed-size batches, no driver
  * round-trips, schema declared up front.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything
  * around it — schema, Encoders, batch shape, partitioning — is real
  * and tested. Swapping in a JNI/turbojpeg decoder changes one
  * function.
  *
  * 100 TB notes: binary payloads dominate row size — keep them OUT of
  * shuffles (extract features first, shuffle the small feature rows),
  * size `spark.sql.files.maxPartitionBytes` so a partition of blobs
  * fits executor memory, and never pivot/collect a binary column.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, format: String, nBytes: Long, histogram: Array[Long])

  val HistBins = 16

  /** STUB — stands in for a real image/audio decode (`???` in spirit:
    * the codec libraries are unavailable here). Deterministic fake:
    * 16-bin histogram of byte values. Replace with a real decoder
    * without touching any Spark plumbing.
    */
  def decodeStub(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](HistBins)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * HistBins) >> 8) += 1
      i += 1
    }
    hist
  }

  /** STUB resize: a real implementation re-encodes pixels; the fake
    * deterministically truncates/strides the payload to `targetBytes`.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
    }

  /** STUB frame sampling for "video" payloads: treats the payload as
    * fixed-size frames and returns every `every`-th frame.
    */
  def frameSampleStub(bytes: Array[Byte], frameBytes: Int, every: Int): Seq[Array[Byte]] =
    bytes.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % every == 0 => f }
      .toSeq

  /** Wrap a text column as a media payload (utf-8 bytes) with metadata —
    * the ingest adapter used by tests/queries in lieu of real image
    * files.
    */
  def attachMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("raw").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        length(col(payloadCol)).cast("long").as("nBytes")).as("meta"))

  /** Batched feature extraction: mapPartitions over the typed Dataset,
    * processing `batchSize` records at a time (the batch shape a
    * vectorized decoder wants — amortizes codec init per batch, bounds
    * peak memory to one batch of payloads).
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec here
        batch.iterator.map { r =>
          MediaFeatures(r.id, r.meta.format, r.meta.nBytes, decodeStub(r.media))
        }
      }
    }
  }

  /** End-to-end: text table → media records → batched features. */
  def featuresOf(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    extractFeatures(attachMedia(df, idCol, payloadCol).as[MediaRecord])
  }
}
