package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared constants for the hash-based dedup family. The DuckDB oracle
  * SQL is generated from the SAME values (DedupQueries), so Spark and
  * the oracle compute bit-identical signatures.
  *
  * Base hash: first 15 hex chars of md5 → 60-bit non-negative integer —
  * portable across engines (both have md5 + hex parsing), deterministic
  * across JVMs (unlike Scala's `hashCode` or Spark's seed-dependent
  * `xxhash64` defaults would be across versions).
  */
object DedupConstants {
  /** Mersenne prime 2^31-1: keeps `a*x+b` under 2^62 (no Long overflow). */
  val P: Long = 2147483647L
  /** MinHash signature length. */
  val K: Int = 16
  /** LSH bands (rows per band = K / Bands = 4 → s-curve threshold ~0.55). */
  val Bands: Int = 4
  def a(i: Int): Long = (i.toLong * 2654435761L + 1103515245L) % P
  def b(i: Int): Long = (i.toLong * 97531L + 12345L) % P

  /** SimHash modulus (32-bit feature hashes). */
  val SimBits: Int = 32
  val SimMod: Long = 4294967296L
  /** SimHash banding: 4 chunks of 8 bits — pigeonhole-complete for
    * hamming <= 3 (Bands - 1).
    */
  val SimChunks: Int = 4

  /** HARD recall floors for the multiprobe LSH production default
    * (dedup_embedding_lsh_multiprobe's derived shape), per corpus
    * decade, as percentages of exact-cosine ground-truth pairs at
    * tau = 0.45. These are CONTRACTS, not observations: the spec
    * fails if the committed recall recording for the shipped shape
    * dips below the floor at that decade — re-tuning the derivations
    * (bits/tables/budget/depth couplings) must re-prove recall, not
    * just cost. Measured headroom r17 (recordings/
    * lsh_recall_r17.jsonl): 60.6% @20k (qd:4:2, bits 13), 68.2% @200k
    * (qd:5:3 — the depth-3 escalation at >= 16 derived bits), 41.4%
    * @1M (qd:5:3, bits 18, sampled truth).
    */
  val MultiprobeRecallFloor20k: Double = 50.0
  val MultiprobeRecallFloor200k: Double = 65.0
  val MultiprobeRecallFloor1M: Double = 35.0
}

/** Deduplication operators for a training-data pipeline, over a
  * `(idCol, textCol)` document table. Four tiers:
  *
  *   - exact: hash groupBy — one shuffle on the full text
  *   - MinHash + LSH banding: near-dup candidates without O(n²) pairs
  *   - SimHash + chunk banding: hamming-ball near-dups
  *   - n-gram Jaccard: exact set similarity (the ground truth the
  *     sketches approximate; O(pairs sharing a shingle))
  *
  * Signature computation is per-row Catalyst higher-order functions
  * (transform/aggregate over arrays) — zero shuffles until the
  * candidate join, which is an equi-join on (band, signature) bucket
  * keys: the shape that scales to 100 TB (shuffle size ∝ docs × bands,
  * never docs²). All hashes derive from [[DedupConstants]] so the
  * DuckDB oracle reproduces them exactly.
  */
object Dedup {
  import DedupConstants._

  /** Exact dedup: canonical (min) id + multiplicity per distinct key.
    * Plain hash aggregate; at scale, pre-hash long texts to
    * `md5(text)` group keys to shrink shuffle rows.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Row-level form of [[exact]]: keep each duplicate group's canonical
    * (min-id) ROW with all its columns — ONE shuffle instead of
    * groupBy + semi-join back, the shape a pipeline wants when it
    * filters dups inline. Rides [[graft.plans.TopKPerKey]] with k=1
    * (id is globally unique, so the order is total): a viral duplicate
    * with millions of copies costs one held row per task instead of
    * WindowExec buffering the whole group, and the map-side partial
    * cut shrinks the shuffle to one row per (map partition, key).
    */
  def exactCanonical(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    graft.plans.TopKPerKey(df, keyCols, Seq(idCol -> false), k = 1)

  /** Word n-gram shingles of `textCol` in document order (duplicates
    * kept — winnowing needs positions).
    */
  def shingleColOrdered(textCol: String, n: Int = 3): Column = {
    val mk = (0 until n).map(j => s"w[i+$j]").mkString("concat(", ", ' ', ", ")")
    // the outer single-element transform binds the split() result to `w`
    // ONCE per row — inlining split into the inner lambda would re-split
    // the full text on every element access (O(words * n * |text|)/row;
    // measured ~5x on the shingle-family queries)
    expr(
      s"""transform(array(split($textCol, ' ')), w ->
            CASE WHEN size(w) >= $n THEN
              transform(sequence(0, size(w) - $n), i -> $mk)
            ELSE array() END)[0]""")
  }

  /** Distinct word n-gram shingles of `textCol` (set semantics, for
    * Jaccard/MinHash/SimHash).
    */
  def shingleCol(textCol: String, n: Int = 3): Column =
    array_distinct(shingleColOrdered(textCol, n))

  /** 60-bit md5-derived hashes of each shingle, reduced mod `m`. */
  private def hashList(shinglesCol: String, m: Long): Column =
    expr(s"transform($shinglesCol, s -> cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % $m)")

  /** Per-document MinHash signature via the native row-local
    * [[graft.functions.MinHashSigExpr]]: one codegen pass over the
    * shingle-hash array computes all K minima — NO explode, NO shuffle;
    * signatures are a map-only projection at any scale. (History: the
    * nested higher-order `aggregate` form evaluated interpreted lambdas
    * per (slot x shingle) — 17 s at sf0.1; the explode + 16-aggregate
    * form fixed that but still shuffled (doc, hash) rows to regroup.)
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.SketchExprs
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), SketchExprs.hashShingles(shingleCol(textCol), P).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col(idCol), SketchExprs.minhashSig(col("hs")).as("sig"))
  }

  /** MinHash near-dup candidate pairs via LSH banding: docs agreeing on
    * ANY band of 4 consecutive signature slots become candidates; pairs
    * are scored by signature agreement (estimated Jaccard) and
    * thresholded. The candidate join shuffles on (band, band-signature)
    * — bucket sizes, not document pairs; buckets above `maxBucket` are
    * salt-split per band ([[BucketCap.subSplit]]) so a boilerplate hot
    * bucket costs ~size·cap, not size².
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      maxBucket: Int = 100000
  ): DataFrame = {
    val rows = K / Bands
    // self-joined below: persist so the signature pipeline (explode +
    // md5 + 16 aggregates) runs once, not once per join side. At 100 TB
    // the equivalent is materializing the signature table to parquet.
    val sigs = minhashSignature(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sigs.select(
      col(idCol), col("sig"),
      explode(expr(s"transform(sequence(0, ${Bands - 1}), b -> struct(b as band, slice(sig, b * $rows + 1, $rows) as bsig))")).as("e"))
      .select(col(idCol), col("sig"), col("e.band").as("band"), col("e.bsig").as("bsig"))
    val salted = BucketCap.subSplit(bands, Seq("band", "bsig"),
      concat_ws("#", col(idCol).cast("string"), col("band").cast("string")), maxBucket)

    val x = salted.select(col(idCol).as("doc_a"), col("sig").as("siga"), col("band"), col("bsig"), col("_salt"))
    val y = salted.select(col(idCol).as("doc_b"), col("sig").as("sigb"), col("band"), col("bsig"), col("_salt"))
    // score and threshold BEFORE the dedup exchange: est_jaccard is a
    // pure row-local function of the two signatures, so scoring each
    // banded match (a pair recurs at most Bands times) costs a few
    // extra slot compares while the distinct's shuffle drops from
    // (pair × two 16-slot sig arrays) rows to 24-byte (a, b, est)
    // rows — and every sub-threshold candidate dies before the
    // exchange instead of after it (filter∘distinct ≡ distinct∘filter
    // for a deterministic per-row score; guide §2.3 project-early).
    x.join(y, Seq("band", "bsig", "_salt"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard",
        // compiled slot-agreement count (VecExprs.slotAgree): same
        // 0.0/1.0 fold as the former zip_with+aggregate HOF, one
        // codegen loop per candidate instead of K interpreted lambdas
        round(graft.functions.VecExprs.slotAgree(col("siga"), col("sigb")) / lit(K), 4))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard").distinct()
  }

  /** Per-document 32-bit SimHash over shingle hashes via the native
    * row-local [[graft.functions.SimHashExpr]]: bit b of the
    * fingerprint is the sign of the per-bit vote sum, computed in one
    * codegen pass over the hash array — no explode, no shuffle.
    * (History: the nested higher-order form evaluated interpreted
    * `power`/lambda per (bit x shingle) — 531 s at sf0.1; the explode +
    * 32-aggregate form fixed that but still shuffled to regroup.) Bit
    * math is `(h >>> b) & 1` on non-negative h — identical to the
    * oracle's exact `floor(h / 2^b) % 2`.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.SketchExprs
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), SketchExprs.hashShingles(shingleCol(textCol), SimMod).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col(idCol), SketchExprs.simhash(col("hs")).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming,
    * via chunk banding (pigeonhole: distance <= SimChunks-1 implies
    * some 8-bit chunk is equal) — equi-join on chunk buckets, then the
    * exact popcount filter. `maxHamming` above SimChunks-1 would lose
    * recall; enforced.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucket: Int = 100000): DataFrame = {
    require(maxHamming <= SimChunks - 1, s"banding complete only up to hamming ${SimChunks - 1}")
    val bitsPerChunk = SimBits / SimChunks
    // persisted for the same self-join reason as minhashLshPairs
    val sh = simhash(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = sh.select(
      col(idCol), col("simhash"),
      explode(expr(s"transform(sequence(0, ${SimChunks - 1}), c -> struct(c as chunk, cast(floor(simhash / power(2, c * $bitsPerChunk)) as bigint) % ${1 << bitsPerChunk} as cval))")).as("e"))
      .select(col(idCol), col("simhash"), col("e.chunk").as("chunk"), col("e.cval").as("cval"))
    val salted = BucketCap.subSplit(chunks, Seq("chunk", "cval"),
      concat_ws("#", col(idCol).cast("string"), col("chunk").cast("string")), maxBucket)
    val x = salted.select(col(idCol).as("doc_a"), col("simhash").as("ha"), col("chunk"), col("cval"), col("_salt"))
    val y = salted.select(col(idCol).as("doc_b"), col("simhash").as("hb"), col("chunk"), col("cval"), col("_salt"))
    // popcount + threshold BEFORE the dedup exchange (same reasoning as
    // minhashLshPairs): the distinct shuffles only surviving
    // (a, b, hamming) rows — candidates beyond maxHamming (the vast
    // majority of banded matches) never cross the wire
    x.join(y, Seq("chunk", "cval", "_salt"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** Exact n-gram Jaccard similarity pairs — the ground truth for the
    * sketches. Cost is bounded by shingle co-occurrence (docs sharing at
    * least one shingle), not n²; at 100 TB, run it only on LSH
    * candidates (join this against [[minhashLshPairs]] output).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    // join on the 60-bit md5 hash of the shingle, not the shingle
    // string: long keys shuffle/compare ~3x cheaper than ~20-char
    // strings, and 60-bit collisions are negligible at any realistic
    // shingle cardinality (~n²/2^61). Hashing is row-local
    // (HashShinglesExpr) before the explode; persisted because it is
    // referenced three times (sizes + both join sides).
    val sh = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.SketchExprs.hashShingles(shingleCol(textCol), -1L)).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("h"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Prefix-filtered exact Jaccard pairs (PPJoin-style): identical
    * results to [[ngramJaccardPairs]], but candidates come from joining
    * only each document's τ-prefix — the first `⌊(1-τ)·n⌋ + 1` shingle
    * hashes in a global (hash-value) order. The prefix-filter theorem
    * guarantees any pair with Jaccard >= τ shares a prefix element, so
    * filtering is exact; candidate volume drops from all
    * shingle-co-occurring pairs to prefix-co-occurring pairs
    * (~(1-τ) of the join input at the first stage, and far fewer
    * pairs). The 100 TB form of the ground-truth verifier.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    import graft.functions.SketchExprs

    // One row per doc: globally-ordered hash list + its τ-prefix,
    // built ENTIRELY row-locally (HashShinglesExpr + sort_array on
    // ~hundreds of elements) — no explode, no groupBy shuffle; the
    // first shuffle in the whole operator is the candidate join.
    // Prefix length is n - ⌈τn⌉ + 1, computed as floor((1-τ)n) + 2:
    // the +2 absorbs the double-rounding slip of (1-τ) (for τ=0.8,
    // 1-τ sits one ulp below 0.2, so floor((1-τ)n) comes up one short
    // exactly when τn is integral). A surplus prefix element only adds
    // candidates, which the exact jaccard filter then removes.
    val lists = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        sort_array(SketchExprs.hashShingles(shingleCol(textCol), -1L)).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("n", size(col("hs")))
      .withColumn("plen", (floor(lit(1.0 - threshold) * col("n")) + 2).cast("int"))
      .withColumn("prefix", slice(col("hs"), lit(1), col("plen")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pre = lists.select(col("doc_id"), explode(col("prefix")).as("h"))
    val cand = pre.select(col("doc_id").as("doc_a"), col("h"))
      .join(pre.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

    // candidate pairs are few; the doc-list joins broadcast under AQE,
    // and the intersection is a per-pair array_intersect, not a join
    cand
      .join(lists.select(col("doc_id").as("doc_a"), col("hs").as("hsa"), col("n").as("na")), Seq("doc_a"))
      .join(lists.select(col("doc_id").as("doc_b"), col("hs").as("hsb"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Span-level dedup (the C4 paper's repeated-span removal, block
    * form): documents are cut into consecutive non-overlapping
    * `blockWords`-word blocks; every DISTINCT block content keeps only
    * its first global occurrence (min doc id, then min position) and
    * all other occurrences are counted as removed — catching the
    * boilerplate that document-level dedup can't (a footer shared by a
    * million otherwise-distinct pages). Per document: block total and
    * removed-block count (the removal rate a pipeline gates on).
    *
    * Shape at 100 TB: blocks are row-local (sequence + slice + one
    * explode), the canonical pick is one hash aggregate on the 60-bit
    * block hash, and the verdict joins back on that hash — shuffle
    * volume ∝ blocks, never pairs; the md5-derived hash keys uniformly
    * so no hot buckets.
    *
    * Cache contract (also [[spanDedupClean]]/[[spanDedupExact]]): the
    * block/window table is `persist()`ed because two branches consume
    * it, and the returned DataFrame is LAZY — the operator cannot
    * unpersist before the caller's action without forcing one here.
    * Long-lived callers own cleanup: run the action, then
    * `spark.catalog.clearCache()` (what Bench/Verify do between
    * queries) or track `spark.sharedState.cacheManager` entries —
    * same contract as [[Bpe.trainMerges]]'s persist/finally block,
    * inverted because here the caller, not the operator, runs the
    * action.
    */
  def spanDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 5
  ): DataFrame = {
    val blocks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__w", split(col(textCol), " "))
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, cast(floor((size(__w) - 1) / $blockWords) as int)), " +
            s"i -> array_join(slice(__w, i * $blockWords + 1, $blockWords), ' '))"))
          .as(Seq("bidx", "btext")))
      .withColumn("h", expr(s"cast(conv(substr(md5(btext), 1, 15), 16, 10) as bigint)"))
      .select("doc_id", "bidx", "h")
      // feeds both the canonical pick and the verdict join — persist so
      // the corpus is scanned and block-hashed once, not per branch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = blocks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("bidx"))).as("first"))
      .select(col("h"), col("first.doc_id").as("cdoc"), col("first.bidx").as("cbidx"))
    blocks.join(canon, Seq("h"))
      .withColumn("kept", col("doc_id") === col("cdoc") && col("bidx") === col("cbidx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"))
  }

  /** [[spanDedup]] that emits the CLEANED corpus — the deliverable a
    * C4-style pipeline actually writes: every non-canonical block is
    * REMOVED from the document text, kept blocks re-joined in
    * position order. Same shuffle shape as the counting form (blocks
    * row-local, one hash agg on the 60-bit hash, verdict join back,
    * then one per-doc aggregate); the reassembly is a row-local
    * `array_sort`+`array_join` over that doc's kept blocks, so no new
    * scale hazard — per-doc memory is the document itself.
    */
  def spanDedupClean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 5
  ): DataFrame = {
    val blocks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__w", split(col(textCol), " "))
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, cast(floor((size(__w) - 1) / $blockWords) as int)), " +
            s"i -> array_join(slice(__w, i * $blockWords + 1, $blockWords), ' '))"))
          .as(Seq("bidx", "btext")))
      .withColumn("h", expr(s"cast(conv(substr(md5(btext), 1, 15), 16, 10) as bigint)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = blocks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("bidx"))).as("first"))
      .select(col("h"), col("first.doc_id").as("cdoc"), col("first.bidx").as("cbidx"))
    blocks.join(canon, Seq("h"))
      .withColumn("kept", col("doc_id") === col("cdoc") && col("bidx") === col("cbidx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"),
        // collect_list skips the null (removed) branch; struct sort is
        // by field order, bidx first — position order restored
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("bidx"), col("btext"))))),
            s => s.getField("btext")),
          " ").as("cleaned_text"))
  }

  /** Unaligned span dedup: the shingle-anchored step toward Lee et
    * al. 2022's suffix-array substring dedup. [[spanDedup]] cuts fixed
    * blocks, so a repeated passage that straddles a block boundary or
    * starts mid-block is invisible; here EVERY `windowWords`-word
    * sliding window (stride 1) is hashed, so a repeat at ANY word
    * offset is caught. Every distinct window content keeps its first
    * global occurrence (min doc id, then min position); all other
    * occurrences are "removed" windows. Because removed windows
    * overlap heavily inside a long repeated passage, the per-doc
    * report is interval-union COVERAGE: how many word positions sit
    * under at least one removed window — the fraction of the doc that
    * is repeated text (what a C4-style pipeline actually gates on).
    *
    * Shape at 100 TB: windows are row-local (one explode, ~n rows per
    * n-word doc vs n/w for the block form — the price of unaligned
    * sensitivity); the canonical pick is one hash aggregate on the
    * 60-bit hash; coverage is a per-doc keyed window (running max of
    * span ends — gaps-and-islands), so every shuffle is ∝ windows and
    * keyed by hash or doc id, never pairs.
    */
  def spanDedupExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowWords: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = windowWords
    val marked = markedWindows(df, idCol, textCol, w)
    val totals = marked.groupBy("doc_id")
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_windows"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"))
    // interval-union coverage of removed windows [pos, min(pos+w-1, n-1)]:
    // running max of prior span ends per doc (gaps-and-islands), each
    // span contributes the positions past that running max — exact
    // integer arithmetic, replayed verbatim by the SQL oracle
    val removed = marked.filter(!col("kept"))
      .select(col("doc_id"), col("pos"),
        least(col("pos") + w - 1, col("n_words") - 1).as("e"))
    val prior = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = removed
      .withColumn("pe", max(col("e")).over(prior))
      .groupBy("doc_id")
      .agg(sum(greatest(
        col("e") - greatest(coalesce(col("pe"), lit(-1L)), col("pos") - 1),
        lit(0L))).as("covered_words"))
    totals.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_windows"), col("n_removed"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"))
  }

  /** Sliding windows of `df` hashed and marked kept/removed — the
    * shared core of [[spanDedupExact]] and [[spanDedupRanges]]: every
    * `w`-word stride-1 window hashed (60-bit md5 prefix), first global
    * occurrence (min doc id, then min position) kept. The window
    * derivation feeds BOTH the canonical pick and the verdict join,
    * and the marked set feeds two downstream branches — persist each
    * so the corpus is scanned (and every window hashed) ONCE, not
    * once per branch (at 100 TB the equivalent is materializing the
    * window table). CACHE LIFETIME: each call pins its own copy, so
    * running [[spanDedupExact]] AND [[spanDedupRanges]] on the same
    * corpus in one session pins the corpus-scale window table twice —
    * call [[unpersistSpanCaches]] between them (Bench/Verify call it
    * between queries — the single release path, which both frees the
    * storage and empties the registry); a
    * pipeline wanting both outputs for one corpus should materialize
    * the window table to parquet instead. */
  private def markedWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int
  ): DataFrame = {
    val wins = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .select(col(idCol).as("doc_id"), col("n_words"),
        posexplode(expr(
          s"transform(sequence(0, cast(greatest(size(__w) - $w, 0) as int)), " +
            s"i -> array_join(slice(__w, i + 1, $w), ' '))"))
          .as(Seq("pos", "wtext")))
      .withColumn("h", expr(s"cast(conv(substr(md5(wtext), 1, 15), 16, 10) as bigint)"))
      .select(col("doc_id"), col("n_words"), col("pos").cast("long").as("pos"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = wins.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      .select(col("h"), col("first.doc_id").as("cdoc"), col("first.pos").as("cpos"))
    val marked = wins.join(canon, Seq("h"))
      .withColumn("kept", col("doc_id") === col("cdoc") && col("pos") === col("cpos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    spanCaches.synchronized { spanCaches += wins; spanCaches += marked }
    marked
  }

  /** Persisted window tables pinned by [[markedWindows]] calls that
    * have not been released yet. */
  private val spanCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Release every window table pinned by prior [[spanDedupExact]] /
    * [[spanDedupRanges]] calls — the targeted alternative to
    * `spark.catalog.clearCache()` when other caches must survive. */
  def unpersistSpanCaches(): Unit = spanCaches.synchronized {
    spanCaches.foreach(_.unpersist(blocking = false))
    spanCaches.clear()
  }

  /** MAXIMAL repeated spans — the Lee et al. 2022 output shape: merge
    * overlapping/adjacent removed windows into maximal (doc_id,
    * span_start, span_len) intervals. Where [[spanDedupExact]] reports
    * per-doc COVERAGE (how much of the doc is repeated), this emits
    * the repeated spans THEMSELVES: a repeated passage of L words
    * yields L−w+1 overlapping removed windows, which collapse here to
    * ONE interval of length L — at any word offset, spanning any block
    * boundary, since the windows are stride-1.
    *
    * Shape at 100 TB: same window table as [[spanDedupExact]] (shuffle
    * ∝ windows, keyed by hash then doc id); the merge is
    * gaps-and-islands — a running max of prior span ends marks island
    * starts, a running sum numbers the islands, one per-doc-keyed
    * aggregate emits the intervals. All integer arithmetic, replayed
    * verbatim by the SQL oracle.
    */
  def spanDedupRanges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowWords: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = windowWords
    val marked = markedWindows(df, idCol, textCol, w)
    val removed = marked.filter(!col("kept"))
      .select(col("doc_id"), col("pos"),
        least(col("pos") + w - 1, col("n_words") - 1).as("e"))
    val prior = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    removed
      .withColumn("pe", max(col("e")).over(prior))
      // a window starts a new island iff it begins past the furthest
      // prior end + 1 (adjacent spans merge: positions stay contiguous)
      .withColumn("is_start",
        when(col("pos") > coalesce(col("pe"), lit(-2L)) + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("is_start")).over(running))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("e")) - min(col("pos")) + 1).as("span_len"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_len", "n_windows")
  }

  /** Incremental dedup gate: flag NEW (batch) documents that exactly or
    * nearly duplicate an already-ingested HISTORY corpus — the daily-
    * ingest shape at 100 TB. History is only ever STREAMED: the exact
    * tier joins it against the broadcast batch texts, the near tier
    * joins its band keys against the broadcast batch band keys, and the
    * per-batch-doc results are batch-sized so the final assembly
    * broadcasts too — no history shuffle, no history self-join
    * anywhere. This convenience form re-hashes the history text per
    * call; production materializes [[signatureTable]] once per ingest
    * and gates every batch through
    * [[incrementalDupsFromSignatures]] — same verdicts, zero history
    * text-hashing (spec-proven).
    *
    * Near-dup = minhash-estimated Jaccard >= `threshold` among LSH band
    * candidates, same constants and signatures as [[minhashLshPairs]].
    * One row per batch document: its exact duplicate's min history id
    * (null if none), its best near-dup history id and estimated Jaccard
    * (best = highest estimate, ties to the smaller id; null if none),
    * and the `is_new` verdict a pipeline gates on.
    */
  def incrementalDups(
      history: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame =
    incrementalDupsFromSignatures(
      signatureTable(history, idCol, textCol), batch, idCol, textCol, threshold)

  /** The ingest-once materialization for [[incrementalDupsFromSignatures]]:
    * one row per document with its 128-bit exact-content hash (`xhash`,
    * md5 hex — the exact tier joins on this, so the text itself never
    * needs to travel or be re-read) and its minhash signature (`sig`,
    * null for docs too short to shingle — they can exact-match but
    * never near-match, same as the re-hash path's filter). Write this
    * to parquet once per ingest; every subsequent batch gate reads it
    * instead of re-hashing the history corpus (round-5 verdict
    * missing-item 3).
    */
  def signatureTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val x = df.select(col(idCol), md5(col(textCol)).as("xhash"))
    x.join(minhashSignature(df, idCol, textCol), Seq(idCol), "left")
  }

  /** [[incrementalDups]] with the history side already in signature
    * form ([[signatureTable]], typically read back from parquet): the
    * history corpus is never text-hashed — its only stages are a
    * column-pruned scan of (id, xhash, sig), a broadcast-hash join per
    * tier, and the matched-rows shuffle. Verdicts are identical to the
    * re-hash path (md5 equality stands in for text equality on the
    * exact tier; the near tier consumes the same signatures).
    */
  def incrementalDupsFromSignatures(
      historySigs: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5
  ): DataFrame = {
    val rows = K / Bands
    def withBands(sigs: DataFrame, sigCol: String): DataFrame =
      sigs.select(col("*"),
        explode(expr(s"transform(sequence(0, ${Bands - 1}), b -> struct(b as band, slice($sigCol, b * $rows + 1, $rows) as piece))")).as("e"))
        .select(sigs.columns.map(col) :+ col("e.band").as("band") :+ col("e.piece").as("piece"): _*)

    // the batch is the small side everywhere: hash it fresh (it's new
    // data — there is nothing materialized to reuse) and broadcast
    val bSig = signatureTable(batch, idCol, textCol)
    val exactM = historySigs.select(col(idCol).as("hid"), col("xhash"))
      .join(broadcast(bSig.select(col(idCol).as("doc_id"), col("xhash"))), "xhash")
      .groupBy("doc_id").agg(min("hid").as("exact_dup_id"))

    val hBands = withBands(
      historySigs.filter(col("sig").isNotNull)
        .select(col(idCol).as("hid"), col("sig").as("hsg")), "hsg")
    val bBands = withBands(
      bSig.filter(col("sig").isNotNull)
        .select(col(idCol).as("doc_id"), col("sig").as("bsg")), "bsg")

    val scored = hBands.join(broadcast(bBands), Seq("band", "piece"))
      .select("doc_id", "bsg", "hid", "hsg").distinct()
      .withColumn("est", round(
        graft.functions.VecExprs.slotAgree(col("bsg"), col("hsg")) / lit(K), 4))
      .filter(col("est") >= threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("est").desc, col("hid").asc)
    val best = scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("doc_id"), col("hid").as("near_dup_id"), col("est").as("near_est"))

    batch.select(col(idCol).as("doc_id"))
      .join(broadcast(exactM), Seq("doc_id"), "left")
      .join(broadcast(best), Seq("doc_id"), "left")
      .withColumn("is_new", col("exact_dup_id").isNull && col("near_dup_id").isNull)
  }

  /** Incremental EMBEDDING dedup: gate a small batch of vectors against
    * an accumulated history (id, vector) store — the semantic-tier
    * analog of [[incrementalDupsFromSignatures]], and the per-batch
    * body of [[graft.streaming.EmbeddingDedupGate]]. Two tiers:
    * EXACT = bit-identical vector (the array-equality join key hashes
    * row-locally — md5-of-text's analog for vectors); NEAR = the
    * query-directed multiprobe candidate stage, batch side probing
    * (flips of up to `depth` of its `budget` lowest-|margin| bits),
    * history side exact keys, then the cosine >= threshold refine and
    * a top-1 rank (highest cosine, ties to the smallest history id).
    *
    * Shape at 100 TB: the batch broadcasts in BOTH tiers; history
    * streams map-side through one column-pruned scan per tier — it is
    * never shuffled and never self-joined, and only candidate rows
    * (∝ matches) reach the rank. The LSH shape is PINNED (not
    * corpus-derived): a persisted gate store must gate every future
    * batch under the signature geometry it was built with — re-shaping
    * means re-ingest, exactly the [[embeddingCosinePairsLsh]] pinned
    * path's contract.
    */
  def incrementalEmbeddingDups(
      history: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 8,
      budget: Int = 3,
      depth: Int = 2,
      seed: Long = 42L,
      dim: Int = 64
  ): DataFrame = {
    import graft.functions.DotProductExpr.dot
    val planes = Similarity.hyperplanesPrefix(tables, bits, dim, seed)
    val h = history.select(col(idCol).as("hid"), col(vecCol).cast("array<double>").as("hv"))
    val b = batch.select(col(idCol).as("doc_id"), col(vecCol).cast("array<double>").as("bv"))
    val exactM = h.join(broadcast(b), col("hv") === col("bv"))
      .groupBy("doc_id").agg(min("hid").as("exact_dup_id"))

    val hKeys = h.select(col("hid"), col("hv"),
      posexplode(graft.functions.AnnExprs.lshBuckets(col("hv"), planes)).as(Seq("t", "b")))
    // the broadcast probe fold is SLIM — the batch vector must not
    // ride the tables × probe-keys expansion (measured: at 1024 dims a
    // 5 k batch's vector-carrying fold serialized 6.3 GiB and died on
    // spark.driver.maxResultSize before any task ran — EmbGateProbe
    // synth:200000:1024); bv re-attaches map-side from the one-row-per-
    // doc batch broadcast AFTER the bucket join
    val bKeys = b.select(col("doc_id"),
      posexplode(graft.functions.AnnExprs.lshProbeKeys(col("bv"), planes, budget, depth))
        .as(Seq("t", "bs")))
      .select(col("doc_id"), col("t"), explode(col("bs")).as("b"))
    val scored = hKeys.join(broadcast(bKeys), Seq("t", "b"))
      .join(broadcast(b), Seq("doc_id"))
      .withColumn("bn", sqrt(dot(col("bv"), col("bv"))))
      .withColumn("hn", sqrt(dot(col("hv"), col("hv"))))
      // zero-norm guard: 0/0 = NaN and NaN >= tau is TRUE under
      // Spark's NaN ordering (see embeddingCosinePairs). A zero
      // vector can still EXACT-match above; it never near-matches.
      .filter(col("bn") > 0 && col("hn") > 0)
      .withColumn("cos", round(dot(col("bv"), col("hv")) / (col("bn") * col("hn")), 4))
      .select("doc_id", "hid", "cos").distinct()
      .filter(col("cos") >= threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("cos").desc, col("hid").asc)
    val best = scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("doc_id"), col("hid").as("near_dup_id"), col("cos").as("near_cos"))

    b.select("doc_id")
      .join(broadcast(exactM), Seq("doc_id"), "left")
      .join(broadcast(best), Seq("doc_id"), "left")
      .withColumn("is_new", col("exact_dup_id").isNull && col("near_dup_id").isNull)
  }

  /** Embedding near-dup pairs: cosine >= threshold over an all-pairs
    * join. Correct baseline at any SF that fits a broadcast; the scale
    * path is LSH bucketing (Similarity.lshBuckets) to cut the pair space
    * before the exact cosine.
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.DotProductExpr.dot
    // cast + norm ONCE per vector, not per pair (the pair join is the
    // O(n²) part; keep its inner loop to a single codegen dot product),
    // and repartition: the nested-loop join's parallelism is the left
    // side's partition count, and a small parquet table reads as ONE split.
    val prep = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      // a zero vector has no direction: its cosine is 0/0 = NaN, and
      // Spark ORDERS NaN above every value, so `cos >= tau` would be
      // TRUE — a zero embedding would near-dup every bucket-mate.
      // Excluded across the cosine-refine family (r15 advice).
      .filter(col("n") > 0)
    val a = prep.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = prep.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Corpus-size-adaptive LSH signature width: the smallest b in
    * [floor, cap] with targetOccupancy * 2^b >= n, i.e.
    * ceil(log2(n / targetOccupancy)) integer-exactly (no float log —
    * the DuckDB oracle derives the same b with a shifted-comparison
    * scan, and a boundary n must round identically on both sides).
    * Candidate volume per table is ~n² / 2^bits, so a FIXED width is a
    * measured scale cliff (bits=8: 582 s at 200 k vectors; bits=16:
    * 5.8 s — SCALE_MEASURED_r12_x100/_lshprobe); tracking the corpus
    * keeps expected bucket occupancy ~targetOccupancy at any n.
    */
  def adaptiveLshBits(n: Long, targetOccupancy: Long = 4L, floor: Int = 8, cap: Int = 24): Int = {
    var b = floor
    while (b < cap && (targetOccupancy << b) < n) b += 1
    b
  }

  /** Resolve the corpus size the adaptive LSH shapes derive from — the
    * r15 verdict's "no silent full-scan count" rule: an explicit
    * `n >= 0` always wins (the registry and any production pipeline
    * know their corpus size); otherwise Catalyst's EXACT row-count
    * statistic when the optimizer can prove one (ANALYZE'd catalog
    * tables propagate it); otherwise one count() pass — metadata-bound
    * on a bare parquet scan, a real job on any derived input — logged
    * loudly with the operator name so the extra scan never hides
    * inside a plan at 100 TB.
    */
  private val log = org.slf4j.LoggerFactory.getLogger("graft.ext.Dedup")
  private[graft] def corpusCount(df: DataFrame, n: Long, op: String): Long =
    if (n >= 0L) n
    else df.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(rc) => rc.longValue
      case None =>
        log.warn(s"$op: corpus size not supplied and no exact row-count " +
          "statistic available - running a count() pass to derive the LSH " +
          "shape; pass n= (or ANALYZE the table) to avoid the extra scan")
        df.count()
    }

  /** Table count coupled to the derived signature width: per-table
    * collision probability for a pair at angle theta is
    * (1 - theta/pi)^bits, so recall at a FIXED table count decays
    * geometrically as [[adaptiveLshBits]] widens the signature with the
    * corpus (measured with LshRecallProbe on the driver fixtures:
    * 8 tables x 8 bits finds 0 of 7 true pairs at n=500; 16 tables
    * finds 4). Doubling tables every 2 derived bits holds the measured
    * dev-SF recall floor (~25-30% at tau=0.45; DedupSimilaritySpec pins
    * it) until the cap; past the cap recall decays by the standard
    * SimHash collision bound — the documented approximation contract
    * (exact recall needs [[embeddingCosinePairs]], the fenced O(n^2)
    * ground truth). Integer-exact (shift/divide only) so the DuckDB
    * oracle derives the identical count from its own count(*).
    */
  def adaptiveLshTables(bits: Int, floor: Int = 8, base: Int = 16, cap: Int = 32): Int =
    math.min(cap, base << math.max(0, (bits - floor) / 2))

  /** THE obvious-name entry point for embedding near-dup pairs —
    * forwards verbatim to [[embeddingCosinePairsLshMultiprobe]], the
    * query-directed multiprobe production default (recall >= 50%
    * scale-pinned at 20 k and 200 k vectors, [[DedupConstants
    * .MultiprobeRecallFloor200k]]). A user reaching for "give me the
    * near-dup pairs" should land here; [[embeddingCosinePairsLsh]]
    * below is the exact-collision HISTORICAL-REPLAY tier whose recall
    * decays with the corpus-adaptive width (13% at 20 k, 4% at 200 k,
    * recordings/lsh_recall_r15.jsonl) — pick it only to replay a
    * pinned signature table, never for a new corpus.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      n: Long = -1L
  ): DataFrame =
    embeddingCosinePairsLshMultiprobe(df, idCol, vecCol, threshold, n = n)

  /** Embedding near-dup pairs, LSH-bucketed: the scale path. Candidates
    * share a random-hyperplane sign-bucket in at least one of `tables`
    * hash tables (row-local fused bucket keys, one map pass), then the
    * exact cosine >= threshold refine runs only on candidates — the
    * self-join shuffles on (table, bucket), never all-pairs. Recall vs
    * [[embeddingCosinePairs]] is the standard SimHash collision bound
    * ((1 - theta/pi)^bits per table); raise `tables` (recall) or `bits`
    * (selectivity: expected bucket occupancy n / 2^bits) to taste.
    * Deterministic: seeded planes, so an external oracle can replay the
    * exact pair set.
    *
    * `bits <= 0` (the DEFAULT) derives BOTH the width and the table
    * count from a corpus count ([[adaptiveLshBits]] +
    * [[adaptiveLshTables]]) — expected bucket occupancy stays ~constant
    * as the corpus grows (closing the fixed-width cliff above) and the
    * table count doubles every 2 derived bits (holding the recall floor
    * the width growth would otherwise erode). The derived path IGNORES
    * the `tables` parameter and uses PREFIX-STABLE planes
    * ([[Similarity.hyperplanesPrefix]], stable in both dimensions) so
    * one oracle plane table covers every derived (tables, bits); an
    * explicit `bits > 0` pins both knobs with the original
    * sequential-stream planes (oracle replay of pinned
    * parameterizations). `n >= 0` supplies a precomputed corpus count
    * for the derived path, skipping the extra count() pass — worth it
    * when the input is an expensive intermediate rather than a parquet
    * scan (where count() is metadata-bound and cheap).
    */
  def embeddingCosinePairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 0,
      seed: Long = 42L,
      dim: Int = 64,
      maxBucket: Int = 100000,
      n: Long = -1L
  ): DataFrame = {
    import graft.functions.DotProductExpr.dot
    val planes =
      if (bits > 0) Similarity.hyperplanes(tables, bits, dim, seed)
      else {
        // count() on a parquet scan is metadata-bound (row-group counts,
        // no column IO) — cheap even at corpus scale, and deterministic
        // per SF so the oracle's own count() derives the same width.
        val derived = adaptiveLshBits(corpusCount(df, n, "embeddingCosinePairsLsh"))
        Similarity.hyperplanesPrefix(adaptiveLshTables(derived), derived, dim, seed)
      }
    val bucketed = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        posexplode(graft.functions.AnnExprs.lshBuckets(col(vecCol), planes)).as(Seq("t", "b")))
    val salted = BucketCap.subSplit(bucketed, Seq("t", "b"),
      concat_ws("#", col("id").cast("string"), col("t").cast("string")), maxBucket)
    val cand = salted.select(col("id").as("id_a"), col("t"), col("b"), col("_salt"))
      .join(salted.select(col("id").as("id_b"), col("t"), col("b"), col("_salt")), Seq("t", "b", "_salt"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val prep = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      // zero-norm vectors excluded: 0/0 = NaN and NaN >= tau is TRUE
      // under Spark's NaN ordering (see embeddingCosinePairs)
      .filter(col("n") > 0)
    cand
      .join(prep.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), Seq("id_a"))
      .join(prep.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), Seq("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Multiprobe table count for a derived signature width: probes
    * substitute for tables, so the count grows HALF as fast as the
    * exact-collision path's [[adaptiveLshTables]] (one doubling per 4
    * derived bits, not per 2) — measured on the driver fixtures
    * (LshRecallProbe, SCALE_MEASURED_r15): 16 tables x budget-4 depth-2
    * probing holds >= 50% recall at 20 k vectors where 32-table
    * exact-collision recovers 13%. Integer-exact for the oracle.
    */
  def multiprobeTables(bits: Int, floor: Int = 8, base: Int = 8, cap: Int = 32): Int =
    math.min(cap, base << math.max(0, (bits - floor) / 4))

  /** Query-directed probe budget for a derived width: +1 low-margin bit
    * per 4 derived bits over the floor — the probe set (1 + m + C(m,2)
    * keys per table) must grow much slower than the width it holds
    * recall against, or candidate volume balloons exactly where the
    * adaptive path slims (the r14 one-flip-of-every-bit probing: 17
    * probes at 16 bits, 36.69 s at 200 k vectors). Integer-exact.
    */
  def multiprobeBudget(bits: Int, floor: Int = 8, base: Int = 3, cap: Int = 8): Int =
    math.min(cap, base + math.max(0, (bits - floor) / 4))

  /** Probe depth for a derived width: 2 flips up to 15 bits, 3 from 16.
    * The escalation axis matters because the two knobs price very
    * differently (r16/r17 measurements, 200 k vectors): widening the
    * BUDGET (5 → 6 at depth 2) costs ~3× — the extra low-margin bit's
    * flips land in the most crowded buckets — for +8 pp recall, while
    * deepening to TRIPLE FLIPS of the SAME 5-bit mask (qd:5:2 → qd:5:3,
    * 16 → 26 keys) measured ~1.07× operator cost for +15.5 pp
    * (52.7 → 68.2 %, recordings/lsh_recall_r16.jsonl full-truth rows;
    * cost RefineDiag min-of-3 fused branch). At the 18-bit (1 M-vector)
    * decade depth-2 recall collapses to 29.4 % and qd:5:3 holds 41.4 %
    * (sampled truth). Below 16 bits the depth-2 recall already clears
    * the floors (60.6 % at the 13-bit decade) — the cheaper shape wins.
    * Integer-exact for the oracle (CASE WHEN bits >= 16).
    */
  def multiprobeDepth(bits: Int): Int = if (bits >= 16) 3 else 2

  /** Embedding near-dup pairs, QUERY-DIRECTED MULTI-PROBE LSH (Lv et
    * al., VLDB'07) — the RECOMMENDED production default of the LSH
    * family: same semantics as [[embeddingCosinePairsLsh]], but each
    * vector also probes buckets reachable by flipping up to `probeDepth`
    * of its `probeBudget` LOWEST-|MARGIN| sign bits (margin = dot with
    * the plane). A near pair disagrees exactly where one endpoint sits
    * close to a hyperplane, so the low-margin flips recover most of a
    * full hamming<=2 probe's recall at a FLAT probe count
    * (1 + m + C(m,2) keys per table) while the corpus-adaptive width
    * grows — recall that collapses with scale on the exact-collision
    * path (13% at 20 k, 4% at 200 k vectors for its 32-table cap,
    * LshRecallProbe tau=0.45) holds at >= 50% at 20 k here.
    *
    * Candidate semantics (what the DuckDB oracle states directly): a
    * pair is a candidate iff in SOME table the signatures differ in at
    * most `probeDepth` bits AND every differing bit is within the probe
    * budget (the m lowest-|margin| bits, ties to the lower index) of AT
    * LEAST ONE endpoint — the join runs both directions and
    * canonicalizes, so probing is symmetric.
    *
    * Still a pure equi-join at scale: the probe side explodes each
    * (table) into the probe-key set ([[graft.functions.AnnExprs
    * .lshProbeKeys]], one fused codegen pass with the signature) and
    * joins the exact side on (t, b) — no hamming predicate in the join
    * condition anywhere. BOTH sides are BucketCap-capped (a skew-hot
    * bucket's probes would otherwise meet the capped exact side at
    * cap x probes). Probe count, table count, and probe DEPTH derive
    * from the corpus-adaptive width ([[multiprobeBudget]],
    * [[multiprobeTables]], [[multiprobeDepth]] — triple flips of the
    * same low-margin mask from 16 derived bits, the measured ~1.07x
    * answer to the wide-signature recall decay) unless pinned; the
    * derived path shares [[adaptiveLshBits]] and the prefix-stable
    * planes, so one embedded oracle plane table covers every corpus
    * size.
    */
  def embeddingCosinePairsLshMultiprobe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 0,
      bits: Int = 0,
      seed: Long = 42L,
      dim: Int = 64,
      maxBucket: Int = 100000,
      n: Long = -1L,
      probeBudget: Int = 0,
      probeDepth: Int = 0,
      refineBroadcastMax: Long = -1L,
      quantBroadcastMax: Long = -1L
  ): DataFrame = {
    import graft.functions.DotProductExpr.dot
    val nEff = corpusCount(df, n, "embeddingCosinePairsLshMultiprobe")
    // Broadcast-refine cutoff, sized in estimated BYTES, not rows: the
    // refine broadcasts the (id, v, n) prep TWICE (id_a and id_b
    // sides), each row ~dim*8 vector bytes + ~64 bytes id/norm/row
    // overhead. Default caps each broadcast at ~128 MB estimated
    // (dim=64: ~230 k rows) so wider vectors LOWER the row cutoff
    // instead of pressuring the driver (the r15 1 M-row default was
    // ~0.5 GB per broadcast at dim=64). Explicit values pin the branch.
    val refineMax =
      if (refineBroadcastMax >= 0) refineBroadcastMax
      else (128L << 20) / (dim.toLong * 8 + 64)
    val (exact, probedCapped) = multiprobeBucketSides(
      df, idCol, vecCol, tables, bits, seed, dim, maxBucket, nEff, probeBudget, probeDepth)
    // both directions meet in the join (x's exact key vs y's probes AND
    // y's exact key vs x's probes) — canonicalized pairs. shuffle_hash:
    // the probe side is (1 + m + C(m,2)) x the exact side — hashing the
    // exact side beats sort-merge's full sort of the probe stream
    val joined = exact.select(col("id").as("id_x"), col("t"), col("b")).hint("shuffle_hash")
      .join(probedCapped.select(col("id").as("id_y"), col("t"), col("b")), Seq("t", "b"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))

    val prep = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      // zero-norm vectors excluded: 0/0 = NaN and NaN >= tau is TRUE
      // under Spark's NaN ordering (see embeddingCosinePairs)
      .filter(col("n") > 0)
    def refine(cand: DataFrame, hint: DataFrame => DataFrame): DataFrame = cand
      .join(hint(prep.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))), Seq("id_a"))
      .join(hint(prep.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))), Seq("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    // Refine-stage shape (the 100x lesson, SCALE_MEASURED_r15): the
    // probing candidate stream is ~100x the corpus, so sort-merge
    // joining it against the vectors — twice — dominates everything
    // (227 s of a 244 s run at 200 k vectors). When the corpus fits a
    // broadcast, refine MAP-SIDE on the raw (duplicated) join output
    // and dedupe only the tau-survivors: one shuffle of bucket rows
    // total, the distinct shrinks from all-candidates to actual pairs,
    // and the duplicated dot products are codegen-cheap.
    // Quantized-broadcast cutoff, also sized in BYTES: the int8
    // payload row is ~(dim + 56) bytes (packed q + four doubles + id),
    // so a 512 MB broadcast covers ~4.5 M vectors at dim 64 — an order
    // of magnitude past the full-width bound, and comfortably under
    // Spark's 8 GB broadcast hard cap.
    val quantMax =
      if (quantBroadcastMax >= 0) quantBroadcastMax
      else (512L << 20) / (dim.toLong + 56)
    // Shared bound-safe prefilter semantics of the two beyond-broadcast
    // tiers — a MAP-SIDE codegen filter prunes every pair whose
    // quantized dot PLUS its Cauchy-Schwarz error bound cannot reach
    // tau:
    //   dot(a,b) <= d_hat + |a_hat||e_b| + |e_a||b_hat| + |e_a||e_b|
    // so no true pair is ever dropped. The refine keeps
    // round(cos, 4) >= tau, which admits true cosines down to
    // tau - 5e-5 (half-up grid) — the prefilter threshold must match
    // that admission edge or it prunes grid-boundary pairs the
    // broadcast branch keeps; the extra 1e-9*n*n absorbs the bound
    // arithmetic's own FP rounding. Only the surviving sliver
    // (~true pairs + a thin margin band) reaches the distinct and the
    // full-width refine, whose exact cosine/round/threshold semantics
    // are IDENTICAL across all three tiers (spec-pinned equality).
    def boundPassOn(
        qx: Column, sx: Column, ex: Column, hx: Column, nx: Column,
        qy: Column, sy: Column, ey: Column, hy: Column, ny: Column): Column = {
      val dhat = graft.functions.DotProductExpr.dotPacked(qx, qy).cast("double") *
        sx * sy / lit(127.0 * 127.0)
      val bnd = hx * ey + ex * hy + ex * ey
      dhat + bnd + lit(1e-9) * nx * ny >= (lit(threshold) - lit(5.1e-5)) * nx * ny
    }
    val boundPass = boundPassOn(
      col("qx"), col("sx"), col("ex"), col("hx"), col("nx"),
      col("qy"), col("sy"), col("ey"), col("hy"), col("ny"))

    // Tier 1 — full-width broadcast refine: map-side exact cosine on
    // the raw (duplicated) join output, dedupe only tau-survivors.
    if (nEff <= refineMax) refine(joined, broadcast).distinct()
    // Tier 2 — QUANTIZED-BROADCAST prefilter (r17): the candidate
    // stream stays SLIM (id_a, id_b) — the (t, b) join shuffles
    // ~24 B rows, 4-5x less than payload-carry at depth 3 (whose
    // ~71 GB spill at the 1 M point exceeded this box's disk) — and
    // the int8 payload rides a BROADCAST joined map-side on both
    // endpoints, then the bound filter prunes before anything
    // shuffles again. Same never-aggregate-the-raw-stream rule: the
    // stream flows map-side through two BroadcastHashJoins + filter;
    // only bound-survivors reach the distinct.
    else if (nEff <= quantMax) {
      // ONE canonical broadcast of the quantized payload, joined twice
      // through dataset aliases. The r17 shape (two differently-aliased
      // projections, each wrapped in its own broadcast()) was measured
      // to ALREADY share one exchange — ReuseExchange canonicalizes
      // alias names away, so the corpus was quantized and broadcast
      // once, not twice — but that reuse hinges on expression
      // canonicalization internals. This shape makes the sharing
      // structural: both BroadcastHashJoin build sides are literally
      // the same plan below a SubqueryAlias, so the second build is a
      // ReusedExchange by construction (spec-asserted in
      // DedupSimilaritySpec) under any canonicalization behavior.
      val payload = broadcast(withInt8Payload(
        df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
          .withColumn("n", sqrt(dot(col("v"), col("v"))))
          .filter(col("n") > 0)).drop("v"))
      val survivors = joined
        .join(payload.as("px"), col("id_a") === col("px.id"))
        .join(payload.as("py"), col("id_b") === col("py.id"))
        .filter(boundPassOn(
          col("px.q"), col("px.s"), col("px.eN"), col("px.nh"), col("px.n"),
          col("py.q"), col("py.s"), col("py.eN"), col("py.nh"), col("py.n")))
        .select("id_a", "id_b")
        .distinct()
      refine(survivors, _.hint("shuffle_hash"))
    }
    // Tier 3 — PAYLOAD-CARRY prefilter: when even the quantized corpus
    // exceeds the broadcast bound (>~4.5 M vectors at dim 64; any
    // 100 TB corpus), the candidate (t, b) join itself carries the
    // ~100 B int8 payload (computed once per vector below the probe
    // explode) and the bound filter runs on the join output — nothing
    // is ever broadcast, nothing scales with the driver. The
    // structural rule, measured the hard way (r16: the dedupe-first
    // shuffled refine was KILLED UNFINISHED at 31 min on the 200 k
    // corpus the broadcast branch refines in ~27 s — its distinct had
    // to hash-aggregate the full ~520 M-row candidate stream before a
    // single pair could be pruned): NEVER aggregate, sort, or re-join
    // the raw candidate stream.
    else {
      val (exactP, probedP) = multiprobeBucketSides(
        df, idCol, vecCol, tables, bits, seed, dim, maxBucket, nEff,
        probeBudget, probeDepth, withPayload = true)
      def named(side: DataFrame, sfx: String) = side.select(
        col("id").as(s"id_$sfx"), col("t"), col("b"),
        col("q").as(s"q$sfx"), col("s").as(s"s$sfx"), col("eN").as(s"e$sfx"),
        col("nh").as(s"h$sfx"), col("n").as(s"n$sfx"))
      val survivors = named(exactP, "x").hint("shuffle_hash")
        .join(named(probedP, "y"), Seq("t", "b"))
        .filter(col("id_x") =!= col("id_y"))
        .filter(boundPass)
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"))
        .distinct()
      refine(survivors, _.hint("shuffle_hash"))
    }
  }

  /** Adds the bound-safe int8 prefilter payload to a `(id, v, n)`
    * vector frame (`n` = ||v||, zero-norm rows already dropped):
    *
    *   q  = round(v * 127 / s), s = max|v_i|      (symmetric int8)
    *   eN = ||v - reconstruct(q)||                (EXACT error norm)
    *   nh = ||reconstruct(q)||
    *
    * The payload travels PACKED (BinaryType, dim raw bytes) — ~16 B/row
    * less than the array<tinyint> UnsafeArrayData form. Shared by the
    * payload-carry candidate sides and the quantized-broadcast refine
    * tier, so the bound filter sees bit-identical quantities in both.
    */
  private[graft] def withInt8Payload(vecs: DataFrame): DataFrame = {
    import graft.functions.DotProductExpr.dotBytes
    // Null ELEMENTS are coalesced to 0.0 throughout the payload math:
    // the full-width tier's DotProductExpr reads a null slot as 0.0
    // (codegen getDouble over the null bitmap's zeroed value word), so
    // without the coalesce a single null element would diverge — the
    // quantized tiers would NPE inside PackBytesExpr's toByteArray()
    // (ArrayData refuses null elements) while tier 1 silently scores
    // the pair. Coalescing keeps the three tiers' pair sets identical
    // on such rows instead of failing with an opaque codegen NPE on
    // exactly two of the three.
    val v0 = (x: Column) => coalesce(x, lit(0.0))
    vecs
      .withColumn("s", array_max(transform(col("v"), x => abs(v0(x)))))
      .withColumn("qa", transform(col("v"),
        x => round(v0(x) * lit(127) / col("s")).cast("tinyint")))
      .withColumn("eN", sqrt(aggregate(
        zip_with(col("v"), col("qa").cast("array<double>"),
          (x, qq) => { val e = v0(x) - qq * col("s") / lit(127.0); e * e }),
        lit(0.0), (acc, e2) => acc + e2)))
      .withColumn("nh",
        sqrt(dotBytes(col("qa"), col("qa")).cast("double")) * col("s") / lit(127.0))
      .withColumn("q", graft.functions.DotProductExpr.packBytes(col("qa")))
      .drop("qa")
  }

  /** The multiprobe candidate stage's two join sides — exact (t, key)
    * rows and probe-key rows, both BucketCap-capped. Shared by the pair
    * operator and the telemetry report so the report measures the
    * EXACT candidate stage production runs.
    */
  private[graft] def multiprobeBucketSides(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int,
      bits: Int,
      seed: Long,
      dim: Int,
      maxBucket: Int,
      n: Long,
      probeBudget: Int,
      probeDepth: Int,
      withPayload: Boolean = false
  ): (DataFrame, DataFrame) = {
    val derived = if (bits > 0) bits
      else adaptiveLshBits(corpusCount(df, n, "multiprobeBucketSides"))
    val tabs = if (tables > 0) tables else multiprobeTables(derived)
    val budget = if (probeBudget > 0) probeBudget else multiprobeBudget(derived)
    val depth = if (probeDepth > 0) probeDepth else multiprobeDepth(derived)
    val planes =
      if (bits > 0) Similarity.hyperplanes(tabs, derived, dim, seed)
      else Similarity.hyperplanesPrefix(tabs, derived, dim, seed)
    import graft.functions.DotProductExpr.{dot, dotBytes}
    // Zero-norm rows can never pair (cos = 0/0 = NaN; the refine's norm
    // guard excludes them) — drop them BEFORE BucketCap in BOTH payload
    // and non-payload modes, so dropHot sees identical bucket counts
    // and the spec-pinned identical-pair-set contract between the
    // broadcast and beyond-broadcast branches holds even on corpora
    // with many zero vectors (all of which share one bucket per table).
    val vecs = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .filter(col("n") > 0)
    // Payload mode (the payload-carry refine tier): compute the int8
    // quantization ONCE PER VECTOR — below the explode, so the ~100 B
    // compact form travels through the probe expansion instead of the
    // ~530 B doubles.
    val vecsEff = if (!withPayload) vecs else withInt8Payload(vecs)
    val carry: Seq[Column] =
      if (withPayload) Seq("q", "s", "eN", "nh", "n").map(col) else Nil
    val bucketed = vecsEff.select(col("id") +: carry :+
      posexplode(graft.functions.AnnExprs.lshBuckets(col("v"), planes)).as(Seq("t", "b")): _*)
    val probed = vecsEff.select(col("id") +: carry :+
      posexplode(graft.functions.AnnExprs.lshProbeKeys(col("v"), planes, budget, depth))
        .as(Seq("t", "bs")): _*)
      .select(col("id") +: carry :+ col("t") :+ explode(col("bs")).as("b"): _*)
    (BucketCap.dropHot(bucketed, Seq("t", "b"), maxBucket),
      BucketCap.dropHot(probed, Seq("t", "b"), maxBucket))
  }

  /** Per-table health telemetry for the multiprobe LSH candidate stage
    * — the ONLINE recall/selectivity proxy a production dedup run
    * reports, so the knob the offline probes (LshRecallProbe) measure
    * is visible on real corpora without computing ground truth:
    * `n_buckets` (occupied buckets; expected occupancy = corpus /
    * n_buckets), `max_bucket` (skew — a bucket near BucketCap's limit
    * is about to be dropped), and `cand_pairs` (distinct candidate
    * pairs that table feeds the refine — a table whose yield collapses
    * signals over-wide signatures, one that explodes signals hot
    * non-discriminative buckets). Integer-only columns; same
    * candidate-stage plan as the pair operator.
    */
  def embeddingLshMultiprobeReport(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int = 0,
      bits: Int = 0,
      seed: Long = 42L,
      dim: Int = 64,
      maxBucket: Int = 100000,
      n: Long = -1L,
      probeBudget: Int = 0,
      probeDepth: Int = 0
  ): DataFrame = {
    val (exact, probedCapped) = multiprobeBucketSides(
      df, idCol, vecCol, tables, bits, seed, dim, maxBucket, n, probeBudget, probeDepth)
    val bstats = exact.groupBy("t", "b").agg(count(lit(1)).as("c"))
      .groupBy("t").agg(count(lit(1)).as("n_buckets"), max("c").as("max_bucket"))
    val cands = exact.select(col("id").as("id_x"), col("t"), col("b"))
      .join(probedCapped.select(col("id").as("id_y"), col("t"), col("b")), Seq("t", "b"))
      .filter(col("id_x") =!= col("id_y"))
      .select(col("t"), least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
      .groupBy("t").agg(count(lit(1)).as("cand_pairs"))
    bstats.join(cands, Seq("t"), "left")
      .select(col("t").cast("long").as("t"), col("n_buckets"), col("max_bucket"),
        coalesce(col("cand_pairs"), lit(0L)).as("cand_pairs"))
      .orderBy("t")
  }
}
