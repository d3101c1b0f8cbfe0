package graft.ext

import graft.functions.{AnnExprs, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes — the build-once / query-many split the
  * in-flight operators ([[Similarity.lshTopK]], [[Similarity.ivfTopK]])
  * deliberately do not make. At 100 TB the corpus-side work (signature
  * hashing / centroid assignment, the hot-bucket census, one full
  * corpus pass each) dwarfs any single query batch, and a production
  * pipeline amortizes it: the index is materialized to the lake once
  * per corpus snapshot and every retrieval / hard-negative / dedup-gate
  * batch after that pays only the probe-side cost. Measured at 1M
  * vectors (recordings/ann_index_r18.jsonl): the direct operator
  * re-pays ~the full corpus cost per batch, the indexed probe pays
  * seconds.
  *
  * Two layouts, mirroring the two probe disciplines:
  *
  *   - LSH (`lshIndexWrite` / `lshTopKIndexed`): `sigs/` holds the
  *     SLIM exploded signature table (t, b, neighbor_id) — 16 bytes a
  *     row instead of the in-flight frame's vector-carrying rows, so
  *     the T-fold signature expansion costs T×16B/vector on disk, not
  *     T×|vector| — with the hot-bucket census ([[BucketCap.dropHot]])
  *     already applied at build time; `vectors/` holds each surviving
  *     vector ONCE. A probe is: broadcast query probe keys → bucket
  *     join on (t, b) → distinct slim pairs → shuffle-hash join back
  *     to `vectors/` → map-side cosine against the broadcast query
  *     vectors → per-query top-k. Cosine is deterministic per pair, so
  *     scoring after the distinct is result-identical to the in-flight
  *     operator's score-then-distinct (AnnIndexSpec pins frame
  *     equality).
  *   - IVF (`ivfIndexWrite` / `ivfTopKIndexed`): `lists/` is
  *     PARTITIONED BY the assigned centroid list, so a query batch
  *     that probes P of L lists reads ~P/L of the corpus bytes from
  *     disk — genuine IO pruning (the spec asserts the PartitionFilters
  *     reach the scan), where the in-flight operator always rescans and
  *     reassigns the whole corpus. Partition values are fixed-width
  *     strings (`L%019d`) so Hive-style type inference can never flip
  *     the partition column's type between corpora whose list ids do or
  *     don't exceed Int range (list ids are corpus vector ids).
  *
  * Both indexes carry a one-row `meta/` table (kind, shape, dim, seed,
  * corpus count) — the probe side reconstructs the EXACT plane set /
  * probe discipline from it, so an index built at one derived shape is
  * never probed at another. Reading an index of the wrong kind fails
  * fast.
  */
object AnnIndex {

  /** LSH index shape descriptor, persisted at `meta/`. `n` is the
    * corpus size the SHAPE was derived from (pinned at build — size it
    * for the target corpus when building ahead of appends); `rows` is
    * the currently stored vector count, maintained by
    * [[lshIndexAppend]]. Rebuild when `rows` outgrows `n` by a decade:
    * the derived signature width assumes occupancy ~4 at `n`.
    */
  final case class LshMeta(tables: Int, bits: Int, dim: Int, seed: Long,
      maxBucket: Int, n: Long, rows: Long)

  /** IVF index shape descriptor, persisted at `meta/`. `n`/`rows` as
    * in [[LshMeta]]: list count pinned at build, `rows` maintained by
    * [[ivfIndexAppend]].
    */
  final case class IvfMeta(lists: Int, nProbe: Int, dim: Int, n: Long, rows: Long)

  private val KindLsh = "lsh"
  private val KindIvf = "ivf"

  /** Fixed-width, type-inference-proof partition value for an IVF list
    * id (see class doc).
    */
  private def listPart(c: org.apache.spark.sql.Column) =
    format_string("L%019d", c)

  // ------------------------------------------------------------------
  // LSH
  // ------------------------------------------------------------------

  /** Build and persist the LSH index for `corpus` under `path`
    * (`sigs/`, `vectors/`, `meta/`). Shape derivation is byte-identical
    * to the adaptive [[Similarity.lshTopK]]: derived signature width
    * ([[Dedup.adaptiveLshBits]]), coupled table count
    * ([[Dedup.multiprobeTables]]), prefix-stable planes, zero-norm
    * corpus vectors excluded, buckets above `maxBucket` dropped.
    * Returns the persisted meta.
    */
  def lshIndexWrite(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      seed: Long = 42L,
      dim: Int = 64,
      maxBucket: Int = 100000,
      n: Long = -1L
  ): LshMeta = {
    val spark = corpus.sparkSession
    val nn = Dedup.corpusCount(corpus, n, "lshIndexWrite")
    val bits = Dedup.adaptiveLshBits(nn)
    val tables = Dedup.multiprobeTables(bits)
    val planes = Similarity.hyperplanesPrefix(tables, bits, dim, seed)
    val base = corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(VectorOps.norm(col("cv")) > 0)
    // sigs are stored UNCAPPED; the hot-bucket census lives in its own
    // small `hot/` blocklist so [[lshIndexAppend]] can maintain it
    // without rewriting the signature table (a bucket crossing the cap
    // only AFTER an append must still drop — a pre-capped store could
    // never resurrect the rows it already threw away)
    base.select(col("neighbor_id"),
      posexplode(AnnExprs.lshBuckets(col("cv"), planes)).as(Seq("t", "b")))
      .write.mode("overwrite").parquet(s"$path/sigs")
    base.write.mode("overwrite").parquet(s"$path/vectors")
    refreshLshHot(spark, path, maxBucket)
    val stored = spark.read.parquet(s"$path/vectors").count()
    val meta = LshMeta(tables, bits, dim, seed, maxBucket, nn, stored)
    writeLshMeta(spark, path, meta)
    meta
  }

  /** Recompute the hot-bucket blocklist from the slim signature table —
    * one map-side-partial count over 16-byte rows, never touching
    * vectors. Pigeonhole-bounded output (≤ rows·tables/cap buckets), so
    * the probe side can broadcast it.
    */
  private def refreshLshHot(spark: SparkSession, path: String, maxBucket: Int): Unit = {
    val hot = spark.read.parquet(s"$path/sigs")
      .groupBy("t", "b").agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > maxBucket)
      .select("t", "b")
    // stage-then-move: hot/ is an input of the census's own read path
    // on a future refresh only via sigs/, so a direct overwrite is
    // safe; keep it one atomic parquet write
    hot.write.mode("overwrite").parquet(s"$path/hot")
  }

  private def writeLshMeta(spark: SparkSession, path: String, meta: LshMeta): Unit =
    writeMeta(spark, path, KindLsh,
      Seq("tables" -> meta.tables.toLong, "bits" -> meta.bits.toLong,
        "dim" -> meta.dim.toLong, "seed" -> meta.seed,
        "maxBucket" -> meta.maxBucket.toLong, "n" -> meta.n,
        "rows" -> meta.rows))

  /** Append a batch of new vectors to a persisted LSH index WITHOUT
    * re-hashing the existing corpus — the daily-batch maintenance path:
    * hash only the batch with the index's pinned planes, append its
    * slim sigs and vectors, then recompute the hot-bucket blocklist
    * from the signature table (slim scan; see [[refreshLshHot]]).
    * Batch ids must be disjoint from the stored ids (caller contract,
    * same as any corpus union). The SHAPE stays pinned at the build's
    * `n` — build with `n` sized for the target corpus, and rebuild
    * when `rows` outgrows it by a decade. Returns the updated meta.
    */
  def lshIndexAppend(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): LshMeta = {
    val meta = lshMeta(spark, path)
    val planes = Similarity.hyperplanesPrefix(meta.tables, meta.bits, meta.dim, meta.seed)
    val base = batch
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(VectorOps.norm(col("cv")) > 0)
    base.select(col("neighbor_id"),
      posexplode(AnnExprs.lshBuckets(col("cv"), planes)).as(Seq("t", "b")))
      .write.mode("append").parquet(s"$path/sigs")
    base.write.mode("append").parquet(s"$path/vectors")
    refreshLshHot(spark, path, meta.maxBucket)
    val updated = meta.copy(rows = spark.read.parquet(s"$path/vectors").count())
    writeLshMeta(spark, path, updated)
    updated
  }

  /** Load the persisted LSH meta (fails fast on a non-LSH index). */
  def lshMeta(spark: SparkSession, path: String): LshMeta = {
    val m = readMeta(spark, path, KindLsh)
    LshMeta(m("tables").toInt, m("bits").toInt, m("dim").toInt, m("seed"),
      m("maxBucket").toInt, m("n"), m("rows"))
  }

  /** Approximate top-k against a persisted LSH index — the amortized
    * probe side of [[Similarity.lshTopK]]'s adaptive shape (flat deep
    * query-directed probing, [[Similarity.TopKProbeBudget]]:
    * [[Similarity.TopKProbeDepth]] unless overridden). Result frame is
    * identical to running the in-flight operator over the same corpus
    * (AnnIndexSpec pins it): same planes, same capped buckets, same
    * probe keys, same rounded cosine, same (score, neighbor_id)
    * tie-break.
    */
  def lshTopKIndexed(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      probeBudget: Int = 0,
      probeDepth: Int = 0,
      queriesCount: Long = -1L,
      probeBroadcastMax: Long = Similarity.ProbeBroadcastMaxBytes
  ): DataFrame = {
    val meta = lshMeta(spark, path)
    val planes = Similarity.hyperplanesPrefix(meta.tables, meta.bits, meta.dim, meta.seed)
    val budget = if (probeBudget > 0) probeBudget else Similarity.TopKProbeBudget
    val depth = if (probeDepth > 0) probeDepth else Similarity.TopKProbeDepth
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(VectorOps.norm(col("qv")) > 0)
    val qx = qBase.select(col("query_id"),
        posexplode(AnnExprs.lshProbeKeys(col("qv"), planes, budget, depth))
          .as(Seq("t", "bs")))
      .select(col("query_id"), col("t"), explode(col("bs")).as("b"))
    // same probe-side broadcast-vs-shuffle tier switch as lshTopK
    // (slim ~40 B rows here — the indexed probe affords ~7× more
    // queries per broadcast byte than the in-flight operator)
    val keys = Similarity.probeKeysPerTable(meta.bits, budget, depth)
    val maxQ = probeBroadcastMax / math.max(1L, meta.tables.toLong * keys * 40L)
    val qn = if (queriesCount >= 0L) queriesCount
             else qBase.limit(math.min(maxQ + 1L, Int.MaxValue.toLong).toInt).count()
    // candidate ids stay SLIM through the bucket join and the distinct
    // (~16 B rows — the candidate stream is the T×probe-fold expansion,
    // never carry vectors through it: the r15 refine lesson), then one
    // shuffle-hash join rehydrates the surviving pairs from `vectors/`
    // and the broadcast query set supplies qv for the map-side cosine.
    // the hot blocklist is applied at probe time (broadcast anti-join,
    // map-side) — row-identical to a pre-capped store, and it stays
    // correct across appends (see lshIndexWrite)
    val sigs = spark.read.parquet(s"$path/sigs")
      .join(broadcast(spark.read.parquet(s"$path/hot")), Seq("t", "b"), "left_anti")
    // beyond the cap the join stays UNHINTED: AQE picks shuffle-hash
    // while the slim probe build fits executor memory and a spillable
    // sort-merge beyond (a forced shuffle_hash measured an unspillable
    // hash-map OOM on the in-flight operator's vector-carrying frame)
    val cand = (if (qn <= maxQ) sigs.join(broadcast(qx), Seq("t", "b"))
                else sigs.join(qx, Seq("t", "b")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    // the qv rehydrate has its own (much larger) broadcast bound; qn
    // above is truncated at the slim-tier maxQ+1, so it must NOT gate
    // this decision — a truncated count passes for any set size and
    // broadcasts unconditionally (r18 review catch). Row size follows
    // the INDEX's dim (a hard-coded dim-64 size underestimated a
    // 1024-dim index's rows ~13x, letting the broadcast blow past the
    // cap the bound exists to enforce — r18 advice)
    val maxQv = probeBroadcastMax / (40L + 4L * meta.dim)
    val qvn = if (queriesCount >= 0L) queriesCount
              else qBase.limit(math.min(maxQv + 1L, Int.MaxValue.toLong).toInt).count()
    val qvSide =
      if (qvn <= maxQv) broadcast(qBase)
      else qBase
    val scored = cand
      .join(spark.read.parquet(s"$path/vectors").hint("shuffle_hash"), Seq("neighbor_id"))
      .join(qvSide, Seq("query_id"))
      .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 4))
      .select("query_id", "neighbor_id", "cos")
    Similarity.rankedTopK(scored, "cos", scoreDesc = true, k)
  }

  // ------------------------------------------------------------------
  // IVF
  // ------------------------------------------------------------------

  /** Build and persist the IVF index for `corpus` under `path`
    * (`lists/` partitioned by assigned list, `centroids/`, `meta/`).
    * Defaults mirror the adaptive [[Similarity.ivfTopK]]: derived list
    * count ([[Similarity.adaptiveIvfLists]]), coupled probe count
    * ([[Similarity.adaptiveIvfProbes]]), hash-picked seed centroids —
    * pass `trainedCentroids` (e.g. [[Similarity.kmeansCentroids]]) to
    * persist refined lists instead. Returns the persisted meta.
    */
  def ivfIndexWrite(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      numCentroids: Int = 0,
      nProbe: Int = 0,
      trainedCentroids: Option[Seq[(Long, Array[Double])]] = None,
      n: Long = -1L
  ): IvfMeta = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nn = Dedup.corpusCount(corpus, n, "ivfIndexWrite")
    val lists =
      if (numCentroids > 0) numCentroids
      else trainedCentroids.map(_.size).getOrElse(Similarity.adaptiveIvfLists(nn))
    val probeCount = if (nProbe > 0) nProbe else Similarity.adaptiveIvfProbes(lists)
    val cents = trainedCentroids.getOrElse(
      Similarity.seedCentroids(corpus, idCol, vecCol, lists))
    cents.toDF("list", "centv").repartition(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      // zero-norm corpus rows never become candidates (matches
      // ivfTopK's assignment filter; seeding above stays raw — l2-only)
      .filter(VectorOps.norm(col("cv")) > 0)
      .withColumn("listp", listPart(AnnExprs.nearestCentroid(
        col("cv"), cents.map(_._1).toArray, cents.map(_._2).toArray)))
      // pre-shuffle by the partition column: without this, every writer
      // task fans out across every list dir (tasks × lists small files
      // — 32k at 1 M vectors/1024 lists); clustered, each dir gets one
      // file per shuffle partition that holds it (~1)
      .repartition(col("listp"))
      .write.mode("overwrite").partitionBy("listp").parquet(s"$path/lists")
    val stored = spark.read.parquet(s"$path/lists").count()
    val meta = IvfMeta(lists, probeCount,
      cents.headOption.map(_._2.length).getOrElse(64), nn, stored)
    writeIvfMeta(spark, path, meta)
    meta
  }

  private def writeIvfMeta(spark: SparkSession, path: String, meta: IvfMeta): Unit =
    writeMeta(spark, path, KindIvf,
      Seq("lists" -> meta.lists.toLong, "nProbe" -> meta.nProbe.toLong,
        "dim" -> meta.dim.toLong, "n" -> meta.n, "rows" -> meta.rows))

  /** Load the persisted IVF meta (fails fast on a non-IVF index). */
  def ivfMeta(spark: SparkSession, path: String): IvfMeta = {
    val m = readMeta(spark, path, KindIvf)
    IvfMeta(m("lists").toInt, m("nProbe").toInt, m("dim").toInt, m("n"), m("rows"))
  }

  /** The persisted centroids, in (list, centv) driver form — bounded by
    * the IVF contract (centroids are driver-small).
    */
  def ivfCentroids(spark: SparkSession, path: String): Seq[(Long, Array[Double])] =
    spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

  /** Append a batch to a persisted IVF index: assign only the batch
    * against the PINNED centroids and append its rows into the list
    * partitions — no reassignment of the stored corpus, no centroid
    * drift (retrain + rebuild when the corpus outgrows the build's
    * `n`). Batch ids must be disjoint from the stored ids. Returns the
    * updated meta.
    */
  def ivfIndexAppend(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): IvfMeta = {
    val meta = ivfMeta(spark, path)
    val cents = ivfCentroids(spark, path)
    batch
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(VectorOps.norm(col("cv")) > 0)
      .withColumn("listp", listPart(AnnExprs.nearestCentroid(
        col("cv"), cents.map(_._1).toArray, cents.map(_._2).toArray)))
      .repartition(col("listp")) // one file per touched dir, not tasks×lists
      .write.mode("append").partitionBy("listp").parquet(s"$path/lists")
    val updated = meta.copy(rows = spark.read.parquet(s"$path/lists").count())
    writeIvfMeta(spark, path, updated)
    updated
  }

  /** Approximate top-k against a persisted IVF index. The probed-list
    * choice is [[Similarity.ivfQueryProbes]] — the exact helper the
    * in-flight operator runs — and the batch's probed-list union
    * becomes a PARTITION FILTER on `lists/`, so the scan reads only
    * the probed lists' bytes (~nProbe/lists of the corpus for a
    * focused batch). Result frame is identical to the in-flight
    * operator over the same centroids (AnnIndexSpec pins it).
    */
  def ivfTopKIndexed(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 0,
      queriesCount: Long = -1L,
      probeBroadcastMax: Long = Similarity.ProbeBroadcastMaxBytes
  ): DataFrame = {
    val meta = ivfMeta(spark, path)
    val probeCount = if (nProbe > 0) nProbe else meta.nProbe
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val probes = Similarity.ivfQueryProbes(queries, idCol, vecCol, centroids, probeCount)
      .withColumn("listp", listPart(col("list")))
    // the probed-list union is bounded by the list count (IVF contract:
    // centroids are driver-small), so collecting it for the partition
    // filter is O(lists), never O(corpus)
    val probed = probes.select("listp").distinct()
      .collect().map(_.getString(0)).sorted
    val assigned = spark.read.parquet(s"$path/lists")
      .filter(col("listp").isin(probed: _*))
    // same probe-side broadcast-vs-shuffle tier switch as ivfTopK
    val maxQ = probeBroadcastMax / math.max(1L, probeCount.toLong * 304L)
    val qn = if (queriesCount >= 0L) queriesCount
             else queries.limit(math.min(maxQ + 1L, Int.MaxValue.toLong).toInt).count()
    // unhinted beyond the cap — AQE picks shuffle-hash vs spillable
    // sort-merge from actual sizes (see lshTopKIndexed)
    val probeSide =
      if (qn <= maxQ) broadcast(probes.drop("list"))
      else probes.drop("list")
    Similarity.rankedTopK(
      assigned.join(probeSide, Seq("listp"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 4))
        .select("query_id", "neighbor_id", "cos"),
      "cos", scoreDesc = true, k)
  }

  // ------------------------------------------------------------------
  // IVF-PQ
  // ------------------------------------------------------------------

  /** IVF-PQ index shape descriptor, persisted at `meta/`. */
  final case class IvfPqMeta(lists: Int, nProbe: Int, m: Int, ks: Int,
      dim: Int, n: Long, rows: Long)

  private val KindIvfPq = "ivfpq"

  /** Build and persist the IVF-PQ index for `corpus` under `path` —
    * the compressed completion of the index trio, and the layout that
    * actually matters at 10⁹ vectors: `codes/` holds `m` small codes
    * per vector instead of the raw floats (64 float dims → 8 codes, a
    * 32× cut — the full-precision vectors never need to be hot), and
    * is PARTITIONED BY the assigned IVF list like [[ivfIndexWrite]]'s
    * `lists/`, so a probe reads ~nProbe/lists of the already-compressed
    * bytes. `centroids/` and `codebooks/` (m × ks codewords) persist
    * the pinned geometry. Derivations are byte-identical to the
    * in-flight [[Similarity.ivfPqTopK]] (adaptive lists/probes,
    * hash-seeded codebooks), so the indexed probe is answer-identical
    * (AnnIndexSpec pins it). Returns the persisted meta.
    */
  def ivfPqIndexWrite(
      corpus0: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      numCentroids: Int = 0,
      nProbe: Int = 0,
      m: Int = 8,
      ks: Int = 16,
      dim: Int = 64,
      n: Long = -1L
  ): IvfPqMeta = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    // L2-normalized like the in-flight tier (Similarity.normalizedSide
    // — L2 monotone in cosine on unit vectors; zero-norm rows out), so
    // the persisted codes can never disagree with the in-flight
    // encoding
    val corpus = Similarity.normalizedSide(corpus0, idCol, vecCol)
    val spark = corpus.sparkSession
    import spark.implicits._
    // adaptive shape from the PRE-filter frame — matches the oracle's
    // count(*) and the in-flight ivfPqTopK (r18 advice)
    val nn = Dedup.corpusCount(corpus0, n, "ivfPqIndexWrite")
    val lists = if (numCentroids > 0) numCentroids else Similarity.adaptiveIvfLists(nn)
    val probeCount = if (nProbe > 0) nProbe else Similarity.adaptiveIvfProbes(lists)
    val cents = Similarity.seedCentroids(corpus, idCol, vecCol, lists)
    cents.toDF("list", "centv").repartition(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    // hash-seeded PQ codewords, the in-flight derivation verbatim
    // (production would k-means each subspace; the pinned store makes
    // either choice durable)
    val keyHash = expr(
      s"cast(conv(substr(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)")
    val seeds: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"), keyHash.as("h"),
        col(idCol).cast("long").as("id"))
      .orderBy(col("h"), col("id")).limit(ks)
      .collect().map(_.getSeq[Double](0).toArray)
    val codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(mi => seeds.map(s => s.slice(mi * sub, (mi + 1) * sub)))
    // effective ks: a corpus smaller than ks yields fewer seed rows —
    // persist (and record in meta) the codebook actually built, like
    // the in-flight operator (r18 review catch: the 0-until-ks loop
    // indexed past a short codebook)
    val ksEff = seeds.length
    val codeIds = Array.tabulate(ksEff)(_ + 1L)
    (for (mi <- 0 until m; ci <- 0 until ksEff)
      yield (mi, codeIds(ci), codebooks(mi)(ci).toSeq))
      .toDF("mi", "code", "cw").repartition(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    // ONE corpus pass: list + m codes, all row-local argmins; clustered
    // write (see ivfIndexWrite — without the pre-shuffle every task
    // fans across every list dir)
    val vd = col(vecCol).cast("array<double>")
    corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), vd.as("v"))
      .select(col("neighbor_id") +:
        listPart(graft.functions.AnnExprs.nearestCentroid(
          col("v"), cents.map(_._1).toArray, cents.map(_._2).toArray)).as("listp") +:
        (0 until m).map(mi =>
          graft.functions.AnnExprs.nearestCentroid(
            slice(col("v"), mi * sub + 1, sub), codeIds, codebooks(mi)).as(s"code_$mi")): _*)
      .repartition(col("listp"))
      .write.mode("overwrite").partitionBy("listp").parquet(s"$path/codes")
    val stored = spark.read.parquet(s"$path/codes").count()
    val meta = IvfPqMeta(lists, probeCount, m, ksEff, dim, nn, stored)
    writeIvfPqMeta(spark, path, meta)
    meta
  }

  private def writeIvfPqMeta(spark: SparkSession, path: String, meta: IvfPqMeta): Unit =
    writeMeta(spark, path, KindIvfPq,
      Seq("lists" -> meta.lists.toLong, "nProbe" -> meta.nProbe.toLong,
        "m" -> meta.m.toLong, "ks" -> meta.ks.toLong, "dim" -> meta.dim.toLong,
        "n" -> meta.n, "rows" -> meta.rows))

  /** Load the persisted IVF-PQ meta (fails fast on a non-IVF-PQ index). */
  def ivfPqMeta(spark: SparkSession, path: String): IvfPqMeta = {
    val mm = readMeta(spark, path, KindIvfPq)
    IvfPqMeta(mm("lists").toInt, mm("nProbe").toInt, mm("m").toInt,
      mm("ks").toInt, mm("dim").toInt, mm("n"), mm("rows"))
  }

  /** Append a batch to a persisted IVF-PQ index: assign + encode ONLY
    * the batch against the pinned centroids and codebooks, append into
    * the list partitions. Batch ids must be disjoint from the stored
    * ids; rebuild (retrain) when the corpus outgrows the build's `n`.
    */
  def ivfPqIndexAppend(
      spark: SparkSession,
      path: String,
      batch0: DataFrame,
      idCol: String,
      vecCol: String
  ): IvfPqMeta = {
    val meta = ivfPqMeta(spark, path)
    val sub = meta.dim / meta.m
    val cents = ivfCentroids(spark, path)
    val codebooks = readCodebooks(spark, path, meta)
    val codeIds = Array.tabulate(meta.ks)(_ + 1L)
    val batch = Similarity.normalizedSide(batch0, idCol, vecCol)
    val vd = col(vecCol).cast("array<double>")
    batch
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), vd.as("v"))
      .select(col("neighbor_id") +:
        listPart(graft.functions.AnnExprs.nearestCentroid(
          col("v"), cents.map(_._1).toArray, cents.map(_._2).toArray)).as("listp") +:
        (0 until meta.m).map(mi =>
          graft.functions.AnnExprs.nearestCentroid(
            slice(col("v"), mi * sub + 1, sub), codeIds, codebooks(mi)).as(s"code_$mi")): _*)
      .repartition(col("listp"))
      .write.mode("append").partitionBy("listp").parquet(s"$path/codes")
    val updated = meta.copy(rows = spark.read.parquet(s"$path/codes").count())
    writeIvfPqMeta(spark, path, updated)
    updated
  }

  /** The persisted codebooks in driver form — m × ks × (dim/m)
    * doubles, bounded by the PQ contract (codebooks are tiny).
    */
  def ivfPqCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] =
    readCodebooks(spark, path, ivfPqMeta(spark, path))

  private def readCodebooks(spark: SparkSession, path: String,
      meta: IvfPqMeta): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    Array.tabulate(meta.m)(mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3))
  }

  /** Approximate top-k against a persisted IVF-PQ index: probed-list
    * partition filter on the COMPRESSED `codes/` (the scan reads
    * ~nProbe/lists of m-codes-per-vector bytes — raw vectors are never
    * touched), query-side ADC distance tables from the pinned
    * codebooks, per-pair cost `m` lookups. Answer-identical to the
    * in-flight [[Similarity.ivfPqTopK]] over the same corpus
    * (AnnIndexSpec pins it).
    */
  def ivfPqTopKIndexed(
      spark: SparkSession,
      path: String,
      queries0: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 0,
      queriesCount: Long = -1L,
      probeBroadcastMax: Long = Similarity.ProbeBroadcastMaxBytes,
      // the FAISS-style refine layer: ADC ranks a rerank×k shortlist,
      // then exact cosine over `rerankFrom` (the COLD raw-vector
      // table — the index deliberately stores only codes; the re-rank
      // reads raw vectors for the shortlist only, point-lookup-sized)
      rerank: Int = 0,
      rerankFrom: Option[DataFrame] = None
  ): DataFrame = {
    require(rerank <= 0 || rerankFrom.nonEmpty,
      "rerank needs rerankFrom: the IVF-PQ index stores codes only — " +
        "pass the raw-vector table the shortlist rehydrates from")
    val meta = ivfPqMeta(spark, path)
    val sub = meta.dim / meta.m
    val queries = Similarity.normalizedSide(queries0, idCol, vecCol)
    val probeCount = if (nProbe > 0) nProbe else meta.nProbe
    val codebooks = readCodebooks(spark, path, meta)
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val probes = Similarity.pqQueryProbes(queries, idCol, vecCol, centroids, probeCount)
      .withColumn("listp", listPart(col("list")))
    val probed = probes.select("listp").distinct()
      .collect().map(_.getString(0)).sorted
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("listp").isin(probed: _*))
    val vd = col(vecCol).cast("array<double>")
    val dtables = queries
      .select(col(idCol).as("query_id") +: (0 until meta.m).map(mi =>
        slice(vd, mi * sub + 1, sub).as(s"sub_$mi")): _*)
      .select(col("query_id") +: (0 until meta.m).map { mi =>
        val cbLit = typedlit(codebooks(mi).map(_.toSeq).toSeq)
        transform(cbLit, cw =>
          aggregate(zip_with(col(s"sub_$mi"), cw, (x, c) => (x - c) * (x - c)),
            lit(0.0), (acc, v) => acc + v)).as(s"dt_$mi")
      }: _*)
    // probe rows carry the m distance tables (~m*ks*8 B each), so the
    // broadcast affords fewer queries per byte than the raw-IVF probe;
    // unhinted beyond the cap (AQE shuffle-hash vs spillable sort-merge)
    val rowBytes = probeCount.toLong * (meta.m.toLong * meta.ks * 8L + 64L)
    val maxQ = probeBroadcastMax / math.max(1L, rowBytes)
    val qn = if (queriesCount >= 0L) queriesCount
             else queries.limit(math.min(maxQ + 1L, Int.MaxValue.toLong).toInt).count()
    val probeSide0 = probes.drop("list").join(dtables, Seq("query_id"))
    val probeSide = if (qn <= maxQ) broadcast(probeSide0) else probeSide0
    val adist = (0 until meta.m).map(mi =>
      element_at(col(s"dt_$mi"), col(s"code_$mi").cast("int"))).reduce(_ + _)
    val adc = Similarity.rankedTopK(
      codes.join(probeSide, Seq("listp"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("adist", round(adist, 4))
        .select("query_id", "neighbor_id", "adist"),
      "adist", scoreDesc = false, if (rerank > 0) rerank * k else k)
    if (rerank <= 0) adc
    else Similarity.rerankShortlist(adc,
      Similarity.normalizedSide(rerankFrom.get, idCol, vecCol),
      queries, idCol, vecCol, k)
  }

  // ------------------------------------------------------------------
  // meta plumbing
  // ------------------------------------------------------------------

  private def writeMeta(spark: SparkSession, path: String, kind: String,
      fields: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    fields.map { case (f, v) => (kind, f, v) }
      .toDF("kind", "field", "value").repartition(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def readMeta(spark: SparkSession, path: String,
      expectKind: String): Map[String, Long] = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    val kinds = rows.map(_.getString(0)).distinct
    require(kinds.sameElements(Array(expectKind)),
      s"ANN index at $path is kind ${kinds.mkString(",")}, expected $expectKind")
    rows.map(r => r.getString(1) -> r.getLong(2)).toMap
  }
}
