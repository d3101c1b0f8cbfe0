package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance probe for the persisted LSH index (r19): N daily
  * appends leave N parquet generations that EVERY probe scans
  * ([[graft.ext.AnnIndex.lshIndexAppend]]); [[graft.ext.AnnIndex.lshIndexCompact]]
  * folds them back into one. This probe builds an index shape-pinned to
  * the full corpus, appends the corpus in `appends` slices, measures
  * probe latency against the multi-generation layout, compacts +
  * vacuums, re-measures, and asserts the probe answers are
  * row-identical across the fold.
  *
  * Usage: runMain graft.CompactProbe <sfDir> [appends=20] [q=50] [k=5]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val appends = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val q = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val k = args.drop(3).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.AnnIndex
    def fmt(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9) }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < q)
    val slices = appends + 1
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_compact_probe")
      .getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // build on slice 0 with the shape pinned to the FULL corpus, then
    // one append per remaining slice — the daily-batch lifecycle
    val (_, buildSecs) = timed(AnnIndex.lshIndexWrite(
      emb.filter(pmod(col("vec_id"), lit(slices)) === 0), "vec_id", "embedding",
      root, n = n))
    val (_, appendSecs) = timed {
      for (i <- 1 until slices)
        AnnIndex.lshIndexAppend(spark, root,
          emb.filter(pmod(col("vec_id"), lit(slices)) === i), "vec_id", "embedding")
    }
    def gens(sub: String): Int = new java.io.File(s"$root/$sub").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch="))
    def files(sub: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile) 1 else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      walk(new java.io.File(s"$root/$sub"))
    }
    val gensBefore = gens("sigs"); val filesBefore = files("sigs")
    def probe(): Set[(Long, Long)] =
      AnnIndex.lshTopKIndexed(spark, root, qs, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // min-of-2 probes per layout: the first pays page-cache warmup
    val (before1, beforeSecs1) = timed(probe())
    val (_, beforeSecs2) = timed(probe())
    val (_, compactSecs) = timed(AnnIndex.lshIndexCompact(spark, root))
    val removed = AnnIndex.vacuum(spark, root)
    val gensAfter = gens("sigs"); val filesAfter = files("sigs")
    val (after1, afterSecs1) = timed(probe())
    val (_, afterSecs2) = timed(probe())
    require(after1 == before1, "compaction changed probe answers")
    println(s"""{"probe":"ann_compact","dir":"$dir","n":$n,"appends":$appends,""" +
      s""""build_secs":${fmt(buildSecs)},"appends_secs":${fmt(appendSecs)},""" +
      s""""generations_before":$gensBefore,"sig_files_before":$filesBefore,""" +
      s""""probe_before_secs":[${fmt(beforeSecs1)},${fmt(beforeSecs2)}],""" +
      s""""compact_secs":${fmt(compactSecs)},"vacuum_removed_dirs":$removed,""" +
      s""""generations_after":$gensAfter,"sig_files_after":$filesAfter,""" +
      s""""probe_after_secs":[${fmt(afterSecs1)},${fmt(afterSecs2)}],""" +
      s""""row_identical":true}""")
    spark.stop()
  }
}
