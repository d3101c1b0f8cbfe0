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
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK, so PNG /
  * BMP / GIF / JPEG payloads are decoded to exact width / height and a
  * 16-bin integer-luminance histogram ([[decodeImage]]) with zero
  * external dependencies. Payloads no JDK reader recognizes (audio,
  * video, raw text bytes) fall back to the declared deterministic stub
  * ([[decodeStub]], a raw byte histogram) — swapping in a JNI codec
  * for those changes one function.
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
  final case class MediaFeatures(id: Long, format: String, nBytes: Long,
      width: Int, height: Int, histogram: Array[Long])

  val HistBins = 16

  /** REAL image decode via the JDK's `javax.imageio` (no external
    * dependency): returns `(formatName, width, height, luminance
    * histogram)` for any payload a registered ImageReader recognizes
    * (PNG / BMP / GIF / JPEG in a stock JDK), None otherwise. The
    * histogram is 16-bin integer luminance — `lum = (299·r + 587·g +
    * 114·b) / 1000` (integer division; equals the gray value exactly on
    * gray pixels), `bin = (lum · 16) >> 8` — all-integer math, so the
    * features are deterministic and cross-engine checkable. */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Array[Long])] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Long](HistBins)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            hist((lum * HistBins) >> 8) += 1
            x += 1
          }
          y += 1
        }
        Some((fmt, w, h, hist))
      } finally reader.dispose()
      // NonFatal, not just IOException: ImageIO readers throw unchecked
      // exceptions (ArrayIndexOutOfBounds, IllegalArgument, ...) on
      // malformed-but-recognized payloads; a corrupt image must fall
      // back to None, not kill the task
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Deterministic tiny grayscale PNG derived from an id — pixel (x,y)
    * has gray value `(31·id + 7·x + 13·y) mod 256`, dimensions
    * `(1 + id mod 8) × (1 + id mod 5)`. Because PNG is lossless, the
    * decode of this payload is analytically predictable from `id`
    * alone, which is what lets a SQL oracle hash-check a real
    * ImageIO round-trip. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 1 + (id % 8).toInt
    val h = 1 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (((31 * id + 7 * x + 13 * y) % 256) + 256) % 256
        img.setRGB(x, y, (g << 16 | g << 8 | g).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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
    * peak memory to one batch of payloads). Payloads a JDK ImageReader
    * recognizes get the REAL decode (format / width / height /
    * luminance histogram); everything else falls back to the declared
    * byte-histogram stub with the carried metadata.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init a non-JDK codec here
        batch.iterator.map { r =>
          decodeImage(r.media) match {
            case Some((fmt, w, h, hist)) =>
              MediaFeatures(r.id, fmt, r.meta.nBytes, w, h, hist)
            case None =>
              MediaFeatures(r.id, r.meta.format, r.meta.nBytes,
                r.meta.width, r.meta.height, decodeStub(r.media))
          }
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
