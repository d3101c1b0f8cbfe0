package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up dataset generator (r11 verdict missing-item 1): every
  * 100×-claim in SCALE.md was a design argument validated only at
  * sf0.1, because /root/testdata tops out there. This main
  * union-replicates an sf dir by an integer factor with id/key offsets
  * so the expensive tail (dedup / ANN / pagerank) can be MEASURED at
  * ~10× and its scaling exponents recorded (SCALE_MEASURED.md).
  *
  * Replication is calibrated to keep per-item density constant, so a
  * measurement reflects the engine's scaling, not an artifact of the
  * cloning:
  *   - documents: doc_id offset per replica; every WORD gets a
  *     replica-suffix tag, so each replica carries the original's
  *     internal near-dup structure (same shingle counts, same
  *     signature distributions) but a disjoint vocabulary — no
  *     cross-replica dups, and LSH band buckets stay original-sized
  *     instead of growing 10× denser. n_chars is recomputed.
  *   - embeddings: vec_id offset; vectors are cyclically shifted by
  *     the replica index — norm-preserving, and shifted random
  *     vectors decorrelate, so cosine structure within a replica is
  *     intact while cross-replica buckets stay sparse.
  *   - events: event_id/user_id offsets (10× users, original
  *     per-user activity), ts shifted k seconds to avoid exact-tie
  *     inflation.
  *   - orders/lineitem: orderkey/custkey/suppkey offsets — the
  *     customer–supplier trade graph gets 10× nodes and 10× edges at
  *     constant degree, the shape pagerank must scale against.
  *   - dimension tables copy through unchanged.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [factor=10] [tables]
  * `tables` = optional comma-list restricting which tables are
  * generated (e.g. `embeddings` for a vectors-only corpus at a factor
  * the full-table set would waste disk on).
  */
object ScaleGen {

  /** Per-lap deterministic ±1 sign pattern for embedding replicas past
    * the shift+negate period (factor > 2*dim): lap 0 is the identity —
    * outputs for factor <= 2*dim are bit-identical to the pre-lap
    * scheme, so the committed data-sf1/data-sf10 measurements stay
    * comparable — and each later lap applies a seeded diagonal ±1
    * (norm-preserving; two Lehmer-square rounds with the index
    * re-injected, the decorrelation the affine-mix fixtures proved
    * necessary). Cross-lap cosines concentrate near 0 (std ~1/sqrt(dim))
    * so cross-replica buckets stay sparse at any factor.
    */
  private[graft] def lapSigns(lap: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      if (lap == 0) 1.0f
      else {
        var x = (lap.toLong * 2654435761L + i.toLong * 40503L + 12345L) % 2147483647L
        x = (x * x) % 2147483647L
        x = (x + i.toLong + 48271L) % 2147483647L
        x = (x * x) % 2147483647L
        if ((x & 1L) == 0L) 1.0f else -1.0f
      }
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val only: Set[String] =
      args.drop(3).headOption.map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    def wanted(t: String): Boolean = only.isEmpty || only.contains(t)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    // dims copy through — replicated fact keys that dangle off them
    // are fine for the scaling tail (its queries join only among the
    // replicated tables)
    Seq("region", "nation", "customer", "supplier", "part")
      .filter(wanted).foreach(t => write(read(t), t))

    def replicated(base: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => per(base, k)).reduce(_ unionByName _)

    // documents: tag every word with the replica id (vocabulary
    // becomes disjoint across replicas; in-replica structure exact)
    if (wanted("documents")) {
    val docs = read("documents")
    val docOff = maxOf(docs, "doc_id")
    write(replicated(docs) { (d, k) =>
      if (k == 0) d
      else d.select(
        (col("doc_id") + lit(k * docOff)).as("doc_id"),
        array_join(
          transform(split(col("text"), " "), (w: Column) => concat(w, lit(s"_r$k"))),
          " ").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }, "documents")
    }

    // embeddings: cyclic component shift per replica (norm-preserving).
    // Past one full lap of the dimension (factor > dim, e.g. the 100x
    // point over 64-dim vectors) the shift alone would repeat replica
    // k - dim exactly, so odd laps additionally negate the vector —
    // still norm-preserving, and v / -v sit at cosine -1, the far side
    // of every similarity threshold, so cross-replica buckets stay as
    // sparse as the first lap's.
    if (wanted("embeddings")) {
    val embs = read("embeddings")
    val vecOff = maxOf(embs, "vec_id")
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    // shift+negate has period 2*dim; past one full period each LAP
    // (k / (2*dim)) additionally applies a seeded diagonal ±1
    // (lapSigns) — lap 0 is the identity, so factors <= 2*dim
    // reproduce the historical outputs bit-exactly, and no factor can
    // silently flood the corpus with cross-replica exact duplicates
    write(replicated(embs) { (e, k) =>
      if (k == 0) e
      else {
        val inner = k % (2 * dim)
        val s = inner % dim
        val shifted =
          if (s == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${s + 1}, size(embedding) - $s), " +
            s"slice(embedding, 1, $s))")
        val signed =
          if ((inner / dim) % 2 == 0) col("__shifted")
          else expr("transform(__shifted, x -> -x)")
        val lap = k / (2 * dim)
        val lapped =
          if (lap == 0) col("__signed")
          else zip_with(col("__signed"), typedLit(lapSigns(lap, dim)), (x, sg) => x * sg)
        e.withColumn("__shifted", shifted)
          .withColumn("__signed", signed)
          .select((col("vec_id") + lit(k * vecOff)).as("vec_id"),
            lapped.as("embedding"), col("label"))
      }
    }, "embeddings")
    }

    // events: fresh user population per replica, +k seconds
    if (wanted("events")) {
    val ev = read("events")
    val evOff = maxOf(ev, "event_id")
    val userOff = maxOf(ev, "user_id")
    write(replicated(ev) { (e, k) =>
      if (k == 0) e
      else e.select(
        (col("event_id") + lit(k * evOff)).as("event_id"),
        (col("ts") + expr(s"INTERVAL $k SECOND")).as("ts"),
        (col("user_id") + lit(k * userOff)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")
    }

    // orders + lineitem: consistent orderkey offset; fresh customer /
    // supplier id spaces per replica (constant node degree at 10x nodes)
    if (wanted("orders") || wanted("lineitem")) {
    val orders = read("orders")
    val li = read("lineitem")
    val ordOff = maxOf(orders, "o_orderkey")
    val custOff = maxOf(orders, "o_custkey")
    val suppOff = maxOf(li, "l_suppkey")
    if (wanted("orders"))
    write(replicated(orders) { (o, k) =>
      if (k == 0) o
      else o
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(k * custOff))
    }, "orders")
    if (wanted("lineitem"))
    write(replicated(li) { (l, k) =>
      if (k == 0) l
      else l
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * ordOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * suppOff))
    }, "lineitem")
    }

    println(s"""{"scalegen":"done","src":"$srcDir","out":"$outDir","factor":$factor}""")
    spark.stop()
  }
}
