package graft.queries

import graft.Tables
import graft.ext.{Dedup, DedupConstants}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup suite over `documents` / `embeddings` (extension operators —
  * BASELINE.json north star). Oracle SQL for the hash-based sketches is
  * GENERATED from [[DedupConstants]], so Spark and DuckDB compute
  * bit-identical signatures — the oracle checks the algorithm, not just
  * row counts.
  */
object DedupQueries extends QueryGroup {
  import DedupConstants._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup (hash groupBy on full text; all-unique at this SF —
    // multiplicity semantics tested in the unit spec with crafted dups).
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables.documents(s, dir), "doc_id", Seq("text"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")
    }),

    // Row-level canonical keep: each duplicate group's min-id ROW with
    // all columns, through the native TopKPerKey k=1 plan (bounded
    // heaps, map-side partial cut) — the inline-filter form a pipeline
    // composes; registered so the k=1 path is oracle-checked directly.
    "dedup_exact_rows" -> ((s, dir) => {
      Dedup.exactCanonical(Tables.documents(s, dir), "doc_id", Seq("text"))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // MinHash + LSH banding candidates (est Jaccard >= 0.5).
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash hamming-ball pairs (<= 3 of 32 bits).
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Exact 3-gram Jaccard ground truth (>= 0.8), computed with prefix
    // filtering — the oracle (a full co-occurrence join in SQL) proves
    // the prefix-filtered algorithm loses nothing.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairsPrefix(Tables.documents(s, dir), "doc_id", "text", threshold = 0.8)
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding-cosine near-dup pairs (threshold calibrated to the
    // corpus: max pairwise cosine is ~0.51). GROUND-TRUTH BASELINE,
    // sf-bounded by design: the all-pairs theta join is O(n²) and must
    // never run at corpus scale — it exists so the oracle can pin exact
    // semantics and so dedup_embedding_lsh (the production path, below)
    // has a recall target. ScaleBehaviorSpec asserts this is the only
    // registered query with an unbounded nested-loop join; SCALE.md
    // documents the bound.
    "dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingCosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.45)
        .orderBy("id_a", "id_b")
    }),

    // Same semantics, scale path: LSH-bucketed candidates with a
    // CORPUS-DERIVED shape — Dedup.adaptiveLshBits keeps expected
    // bucket occupancy ~4 at any n (closing the r12-measured
    // fixed-width cliff: bits=8 was 582 s at 200 k vectors where the
    // derived 16 is ~6 s) and Dedup.adaptiveLshTables doubles the
    // table count every 2 derived bits (holding the recall floor the
    // width growth erodes; 8 fixed tables had ZERO recall at the smoke
    // SF) — then the exact cosine refine, no all-pairs join anywhere in
    // the plan. The oracle derives the SAME (tables, bits) from its own
    // count(*) and selects that two-dimensional prefix of an embedded
    // max-shape plane table, so the (approximate) pair set is checked
    // exactly at EVERY corpus size, not just the dev SF.
    "dedup_embedding_lsh" -> ((s, dir) => {
      // corpus size passed explicitly (no-silent-count rule, r15
      // verdict #7): one metadata-bound count at the call site, visible
      // instead of hidden inside the operator. The oracle derives the
      // same shape from its own count(*).
      val emb = Tables.embeddings(s, dir)
      Dedup.embeddingCosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.45,
        n = emb.count())
        .orderBy("id_a", "id_b")
    }),

    // The explicit override of the same operator: PINNED 16 tables x
    // 9-bit buckets (the pre-adaptive sequential-stream planes). Kept so
    // the pinned parameterization path stays oracle-checked alongside
    // the adaptive default — retuning the knob never loses the
    // correctness gate, and a user who wants a fixed shape (e.g.
    // replaying a historical signature table) has a checked form to
    // copy. The pin is chosen by LshRecallProbe (mode=seq) to be
    // NON-VACUOUS at both the smoke and verify SFs (2 and 3 pairs) —
    // the r13 12-bit pin found nothing at sf0.01, so its green oracle
    // cell only proved empty == empty.
    "dedup_embedding_lsh_wide" -> ((s, dir) => {
      Dedup.embeddingCosinePairsLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.45, tables = 16, bits = 9)
        .orderBy("id_a", "id_b")
    }),

    // QUERY-DIRECTED multi-probe (Lv et al., VLDB'07) — the RECOMMENDED
    // production default of the LSH family: each vector also probes
    // buckets within depth flips of its lowest-|margin| sign bits
    // (budget, table count, AND depth derived from the corpus-adaptive
    // width: Dedup.multiprobeBudget / multiprobeTables /
    // multiprobeDepth — depth escalates 2 -> 3 at 16 derived bits,
    // where triple flips of the same mask measured ~1.07x cost for
    // +15.5 pp recall at 200 k vectors). Near pairs disagree exactly
    // where a margin is small, so the flat probe budget holds recall
    // the exact-collision path loses with scale: >= 50% at 20 k
    // vectors (tau=0.45) where dedup_embedding_lsh's 32-table cap
    // recovers 13% (LshRecallProbe, SCALE_MEASURED_r15). Same derived
    // width, same prefix-stable planes, still a pure equi-join on
    // (t, b) with BOTH sides BucketCap-capped; the oracle states the
    // semantics directly — hamming <= derived depth with every
    // differing bit inside the low-margin budget of at least one
    // endpoint.
    "dedup_embedding_lsh_multiprobe" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding",
        threshold = 0.45, n = emb.count())
        .orderBy("id_a", "id_b")
    }),

    // PINNED depth-3 multiprobe (8 tables x 8 bits seq planes, budget 4,
    // triple flips): exists so the probe-key expression's DEPTH-3 branch
    // — the measured fix for the 1M-vector decade, where depth-2 recall
    // falls to 29.4% (recordings/lsh_recall_r16.jsonl sampled-truth
    // rows) — runs under the DuckDB oracle at the verify SF. The oracle
    // states hamming <= 3 with low-margin-budget containment directly;
    // the default-coupling escalation (Dedup.multiprobeDepth: 2 -> 3
    // at bits >= 16, shipped r17) lands on this certified branch.
    "dedup_embedding_lsh_multiprobe_d3" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Dedup.embeddingCosinePairsLshMultiprobe(emb, "vec_id", "embedding",
        threshold = 0.45, tables = 8, bits = 8, probeBudget = 4, probeDepth = 3,
        n = emb.count())
        .orderBy("id_a", "id_b")
    }),

    // Per-table health telemetry for the multiprobe candidate stage —
    // the online recall/selectivity proxy (occupied buckets, hottest
    // bucket, candidate yield per table) a production dedup run
    // reports, mirroring what LshRecallProbe measures offline against
    // ground truth. Integer-only; oracle recomputes the same stats from
    // its own derived signatures and masks.
    "dedup_embedding_lsh_report" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Dedup.embeddingLshMultiprobeReport(emb, "vec_id", "embedding", n = emb.count())
        .orderBy("t")
    }),

    // C4-style span dedup: every distinct 5-word block keeps only its
    // first global occurrence — catches shared boilerplate that
    // document-level dedup can't. Shuffle ∝ blocks, never pairs.
    "dedup_spans" -> ((s, dir) => {
      Dedup.spanDedup(Tables.documents(s, dir), "doc_id", "text", blockWords = 5)
        .orderBy("doc_id")
    }),

    // The cleaned-corpus deliverable: duplicate blocks removed from
    // the text itself, kept blocks rejoined in order.
    "dedup_spans_clean" -> ((s, dir) => {
      Dedup.spanDedupClean(Tables.documents(s, dir), "doc_id", "text", blockWords = 5)
        .orderBy("doc_id")
    }),

    // Unaligned (stride-1) span dedup: every 5-word sliding window
    // hashed, first global occurrence kept, per-doc interval-union
    // coverage of removed spans — catches boundary-straddling repeats
    // the block form misses (Lee et al. 2022's target, shingle form).
    "dedup_spans_exact" -> ((s, dir) => {
      Dedup.spanDedupExact(Tables.documents(s, dir), "doc_id", "text", windowWords = 5)
        .orderBy("doc_id")
    }),

    // The Lee et al. output shape: maximal repeated spans themselves —
    // overlapping/adjacent removed windows merged (gaps-and-islands)
    // into (doc_id, span_start, span_len) intervals.
    "dedup_spans_ranges" -> ((s, dir) => {
      Dedup.spanDedupRanges(Tables.documents(s, dir), "doc_id", "text", windowWords = 5)
        .orderBy("doc_id", "span_start")
    }),

    // Character-level verification of the minhash candidates: edit
    // distance over the first 80 chars (Levenshtein is O(len²) per
    // pair — affordable exactly BECAUSE it runs on the LSH candidate
    // set, never all pairs; the truncation bounds the per-pair cost).
    "dedup_fuzzy_edit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("__ta")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("__tb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(substring(col("__ta"), 1, 80), substring(col("__tb"), 1, 80)).as("edit80"))
        .orderBy("doc_a", "doc_b")
    }),

    // Incremental ingest gate: batch docs (doc_id % 5 = 0) checked for
    // exact / minhash near-dups against the already-ingested history
    // (doc_id % 5 != 0). History streams against the broadcast batch —
    // the daily-ingest shape where history is 100 TB and never
    // reshuffles (see Dedup.incrementalDups).
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalDups(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", threshold = 0.5)
        .orderBy("doc_id")
    }),

    // The streaming ingest gate driven through the DRIVER'S oracle, not
    // just specs (r11 verdict item 3): three deterministic micro-batches
    // (doc_id % 3 = batch id) replayed through the exact foreachBatch
    // body — gate against accumulated signatures, write verdicts, append
    // own signatures — with a signature-table compaction between batches
    // 1 and 2, which must be invisible to verdicts. The final verdict
    // log is the result. Fixed staging path (wiped per call) keeps the
    // read plan — and so the plan hash — deterministic. SINGLE-PROCESS
    // ASSUMPTION: concurrent sessions would race on the shared path
    // (the driver's harness never overlaps Verify and Bench; the sbt
    // target lock serializes local runs), and the tmpdir-dependent
    // absolute path makes the plan hash per-machine.
    "streaming_dedup_gate_replay" -> ((s, dir) => {
      import graft.streaming.{BatchTable, StreamingDedupGate}
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_gate_replay").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val docs = Tables.documents(s, dir)
      for (b <- 0L to 2L) {
        StreamingDedupGate.gateAndIngest(
          docs.filter(col("doc_id") % 3 === b), "doc_id", "text",
          s"$root/sigs", s"$root/verdicts", threshold = 0.5, batchId = b)
        // fold batch 0 once batch 1 commits — exercises the compaction
        // path inside an oracle-checked query, not only in specs
        if (b == 1L) StreamingDedupGate.compactSignatures(s, s"$root/sigs", upToBatch = 0L)
      }
      graft.streaming.BatchTable.readAll(s, s"$root/verdicts")
        .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
        .orderBy("doc_id")
    }),

    // The EMBEDDING ingest gate under the driver's oracle — the
    // semantic-tier sibling of streaming_dedup_gate_replay (r15 advice:
    // incrementalEmbeddingDups shipped uncovered): three deterministic
    // micro-batches of vectors (vec_id % 3 = batch id) replayed through
    // EmbeddingDedupGate's foreachBatch body — exact tier =
    // bit-identical vector in an earlier batch, near tier =
    // query-directed multiprobe candidates + cosine refine against the
    // accumulated store — with a store compaction between batches 1
    // and 2 that must not move a verdict. Same fixed-staging-path /
    // single-process assumptions as the text gate replay.
    "streaming_embedding_gate_replay" -> ((s, dir) => {
      import graft.streaming.EmbeddingDedupGate
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_emb_gate_replay").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val emb = Tables.embeddings(s, dir)
      for (b <- 0L to 2L) {
        EmbeddingDedupGate.gateAndIngest(
          emb.filter(col("vec_id") % 3 === b), "vec_id", "embedding",
          s"$root/store", s"$root/verdicts", threshold = 0.45, batchId = b)
        if (b == 1L) EmbeddingDedupGate.compactStore(s, s"$root/store", upToBatch = 0L)
      }
      graft.streaming.BatchTable.readAll(s, s"$root/verdicts")
        .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new")
        .orderBy("doc_id")
    }),

    // The INDEXED embedding gate under the oracle — same pinned shape
    // and verdict semantics as streaming_embedding_gate_replay, but the
    // per-batch probe runs against the PERSISTED slim signature store
    // (graft.streaming.IndexedEmbeddingGate: no store-wide re-hashing
    // per batch — the r18 AnnIndex amortization carried into the
    // streaming lifecycle). Staged as FOUR batches (vec_id % 4) with a
    // compaction of both store tables mid-stream, so the cell is a
    // distinct derivation from the in-flight gate's: three signature
    // appends gate against partitions written by earlier batches, and
    // the compaction must not move a verdict.
    "streaming_indexed_gate_replay" -> ((s, dir) => {
      import graft.streaming.IndexedEmbeddingGate
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_idx_gate_replay").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val emb = Tables.embeddings(s, dir)
      for (b <- 0L to 3L) {
        IndexedEmbeddingGate.gateAndIngest(
          emb.filter(col("vec_id") % 4 === b), "vec_id", "embedding",
          s"$root/store", s"$root/verdicts", threshold = 0.45, batchId = b)
        if (b == 2L) IndexedEmbeddingGate.compactStore(s, s"$root/store", upToBatch = 1L)
      }
      graft.streaming.BatchTable.readAll(s, s"$root/verdicts")
        .select("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new")
        .orderBy("doc_id")
    }),

    // Train/eval decontamination: docs sharing >= 5 distinct 3-gram
    // hashes with the held-out "benchmark" slice (doc_id % 20 = 0 —
    // deterministic split; the corpus's built-in near-dups straddle it,
    // so contamination genuinely exists). Eval grams broadcast; the
    // only shuffle is matched grams (see ext/Decontaminate).
    "decontaminate_ngram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ext.Decontaminate.ngramContamination(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        minShared = 5L)
        .orderBy("doc_id", "eval_id")
    }),

    // SEMANTIC decontamination: train vectors within cosine 0.35 of the
    // held-out benchmark slice (vec_id % 10 = 0) — the paraphrase-level
    // leakage check the n-gram pass can't see. Eval side broadcast; the
    // corpus never shuffles (only contaminated rows reach the top-1
    // rank). tau/slice chosen by a DuckDB yield sweep so the cell is
    // non-vacuous at every dev SF (38 rows at sf0.001, 61 at sf0.01).
    "decontaminate_embedding" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.ext.Decontaminate.embeddingContamination(
        emb.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
        tau = 0.35)
        .orderBy("train_id")
    })
  )

  // ---- oracle SQL, generated from the same constants ----

  /** Shared shingle + hash CTEs (DuckDB 1-based lists). */
  private[queries] def shingleCtes(m: Long): String =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM docs),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
hs AS (SELECT doc_id, list(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $m) AS hs
       FROM sh GROUP BY doc_id)"""

  private val sigList = (0 until K)
    .map(i => s"list_min(list_transform(hs, x -> (${a(i)} * x + ${b(i)}) % $P))")
    .mkString("[", ", ", "]")

  /** Shared CTE prefix: signatures → LSH bands → candidate pairs. */
  private val minhashCandCtes = {
    val rows = K / Bands
    s"""${shingleCtes(P)},
sigs AS (SELECT doc_id, $sigList AS sig FROM hs),
bands AS (
  SELECT doc_id, sig, b, list_slice(sig, b * $rows + 1, b * $rows + $rows) AS bsig
  FROM sigs, (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS siga, y.sig AS sigb
  FROM bands x JOIN bands y ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id)"""
  }

  private val estExpr =
    s"""round(list_sum(list_transform(generate_series(1, $K),
    i -> CASE WHEN siga[i] = sigb[i] THEN 1.0 ELSE 0.0 END)) / $K, 4)"""

  private[queries] val minhashSql =
    s"""$minhashCandCtes
SELECT doc_a, doc_b, $estExpr AS est_jaccard
FROM cand
WHERE $estExpr >= 0.5
ORDER BY doc_a, doc_b"""

  /** Replays the block cut (non-overlapping 5-word slices), the 60-bit
    * md5 block hash, and the (min doc, min position) canonical pick.
    */
  private val spanSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idxd AS (
  SELECT doc_id, w,
    unnest(generate_series(0, CAST(floor((len(w) - 1) / 5) AS BIGINT))) AS i
  FROM docs),
blocks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS bidx,
    CAST(('0x' || substr(md5(
      array_to_string(list_slice(w, i * 5 + 1, i * 5 + 5), ' ')), 1, 15)) AS BIGINT) AS h
  FROM idxd),
canon AS (
  SELECT h, min(struct_pack(doc_id := doc_id, bidx := bidx)) AS first
  FROM blocks GROUP BY h)
SELECT b.doc_id, count(*) AS n_blocks,
  CAST(sum(CASE WHEN b.doc_id = c.first.doc_id AND b.bidx = c.first.bidx
                THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM blocks b JOIN canon c USING (h)
GROUP BY b.doc_id ORDER BY b.doc_id"""

  /** Replays the block dedup and the in-order reassembly: string_agg
    * skips the removed (NULL) branch; ORDER BY bidx restores position
    * order; all-blocks-removed docs coalesce to the empty string. */
  private val spanCleanSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idxd AS (
  SELECT doc_id, w,
    unnest(generate_series(0, CAST(floor((len(w) - 1) / 5) AS BIGINT))) AS i
  FROM docs),
blocks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS bidx,
    array_to_string(list_slice(w, i * 5 + 1, i * 5 + 5), ' ') AS btext,
    CAST(('0x' || substr(md5(
      array_to_string(list_slice(w, i * 5 + 1, i * 5 + 5), ' ')), 1, 15)) AS BIGINT) AS h
  FROM idxd),
canon AS (
  SELECT h, min(struct_pack(doc_id := doc_id, bidx := bidx)) AS first
  FROM blocks GROUP BY h),
marked AS (
  SELECT b.doc_id, b.bidx, b.btext,
    (b.doc_id = c.first.doc_id AND b.bidx = c.first.bidx) AS kept
  FROM blocks b JOIN canon c USING (h))
SELECT doc_id, count(*) AS n_blocks,
  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
  coalesce(string_agg(CASE WHEN kept THEN btext END, ' ' ORDER BY bidx), '')
    AS cleaned_text
FROM marked GROUP BY doc_id ORDER BY doc_id"""

  /** Replays the sliding-window hash, the first-occurrence pick, and
    * the gaps-and-islands coverage sum with the same integer
    * arithmetic (running max of prior span ends; -1 sentinel). */
  private val spanExactSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idxd AS (
  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words,
    unnest(generate_series(0, greatest(CAST(len(w) AS BIGINT) - 5, 0))) AS i
  FROM docs),
wins AS (
  SELECT doc_id, n_words, CAST(i AS BIGINT) AS pos,
    CAST(('0x' || substr(md5(
      array_to_string(list_slice(w, i + 1, i + 5), ' ')), 1, 15)) AS BIGINT) AS h
  FROM idxd),
canon AS (
  SELECT h, min(struct_pack(doc_id := doc_id, pos := pos)) AS first
  FROM wins GROUP BY h),
marked AS (
  SELECT b.doc_id, b.n_words, b.pos,
    least(b.pos + 4, b.n_words - 1) AS e,
    (b.doc_id = c.first.doc_id AND b.pos = c.first.pos) AS kept
  FROM wins b JOIN canon c USING (h)),
totals AS (
  SELECT doc_id, max(n_words) AS n_words, count(*) AS n_windows,
    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
  FROM marked GROUP BY doc_id),
cov AS (
  SELECT doc_id,
    CAST(sum(greatest(e - greatest(COALESCE(pe, -1), pos - 1), 0)) AS BIGINT)
      AS covered_words
  FROM (
    SELECT doc_id, pos, e,
      max(e) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
    FROM marked WHERE NOT kept)
  GROUP BY doc_id)
SELECT t.doc_id, t.n_words, t.n_windows, t.n_removed,
  COALESCE(c.covered_words, 0) AS covered_words
FROM totals t LEFT JOIN cov c USING (doc_id)
ORDER BY t.doc_id"""

  private val spanRangesSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idxd AS (
  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words,
    unnest(generate_series(0, greatest(CAST(len(w) AS BIGINT) - 5, 0))) AS i
  FROM docs),
wins AS (
  SELECT doc_id, n_words, CAST(i AS BIGINT) AS pos,
    CAST(('0x' || substr(md5(
      array_to_string(list_slice(w, i + 1, i + 5), ' ')), 1, 15)) AS BIGINT) AS h
  FROM idxd),
canon AS (
  SELECT h, min(struct_pack(doc_id := doc_id, pos := pos)) AS first
  FROM wins GROUP BY h),
rem AS (
  SELECT b.doc_id, b.pos, least(b.pos + 4, b.n_words - 1) AS e
  FROM wins b JOIN canon c USING (h)
  WHERE NOT (b.doc_id = c.first.doc_id AND b.pos = c.first.pos)),
pe AS (
  SELECT doc_id, pos, e,
    max(e) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM rem),
isl AS (
  SELECT doc_id, pos, e,
    sum(CASE WHEN pos > COALESCE(pe, -2) + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM pe)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
  CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_len,
  CAST(count(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start"""

  private val fuzzyEditSql =
    s"""$minhashCandCtes,
sel AS (SELECT doc_a, doc_b FROM cand WHERE $estExpr >= 0.5)
SELECT doc_a, doc_b,
  levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit80
FROM sel JOIN documents a ON a.doc_id = doc_a
         JOIN documents b ON b.doc_id = doc_b
ORDER BY doc_a, doc_b"""

  private val simhashSql =
    s"""${shingleCtes(SimMod)},
sim AS (SELECT doc_id,
  list_sum(list_transform(generate_series(0, ${SimBits - 1}), b ->
    CASE WHEN list_sum(list_transform(hs, h ->
           CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)) > 0
    THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS simhash
  FROM hs)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b"""

  private val jaccardSql =
    s"""${shingleCtes(P)},
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
  round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 4) >= 0.8
ORDER BY doc_a, doc_b"""

  private val cosineSql =
    """WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS nb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
FROM pairs
WHERE round(dot / (na * nb), 4) >= 0.45 AND na > 0 AND nb > 0
ORDER BY id_a, id_b"""

  /** The seeded hyperplanes as DuckDB VALUES rows — Double.toString
    * round-trips exactly, so the oracle's planes (and therefore buckets)
    * are bit-identical to the Spark side's (same generation as
    * [[SimilarityQueries]]' LSH oracle). Parameterized by (tables,
    * bits) so every parameterization of the operator gets the same
    * oracle rigor.
    */
  private[queries] def embLshPlanes(tables: Int, bits: Int): String =
    graft.ext.Similarity.hyperplanes(tables, bits, dim = 64, seed = 42L)
      .zipWithIndex.flatMap { case (table, t) =>
        table.zipWithIndex.map { case (p, bit) =>
          p.mkString(s"($t, $bit, [", ", ", "])")
        }
      }.mkString(",\n")

  /** The prefix-stable planes (Similarity.hyperplanesPrefix) as DuckDB
    * VALUES rows, at the adaptive path's maximum width — the oracle
    * selects the runtime-derived prefix, so ONE plane table covers
    * every corpus size.
    */
  private[queries] def embLshPlanesPrefix(tables: Int, maxBits: Int): String =
    graft.ext.Similarity.hyperplanesPrefix(tables, maxBits, dim = 64, seed = 42L)
      .zipWithIndex.flatMap { case (table, t) =>
        table.zipWithIndex.map { case (p, bit) =>
          p.mkString(s"($t, $bit, [", ", ", "])")
        }
      }.mkString(",\n")

  /** Corpus-adaptive oracle: derives bits exactly as
    * Dedup.adaptiveLshBits (integer shifted-comparison scan — no float
    * log2, so boundary corpus sizes round identically) and tables as
    * Dedup.adaptiveLshTables (shift of the floored half-difference)
    * from its own count(*), then runs the same
    * bucket/candidate/refine pipeline on that (tables, bits) prefix of
    * the max-shape plane table — hyperplanesPrefix seeds each (t, bit)
    * plane independently, so the table is prefix-stable in BOTH
    * dimensions and one embedded table covers every corpus size.
    */
  private def embLshAdaptiveSql: String =
    s"""WITH planes_all(t, bit, plane) AS (VALUES
${embLshPlanesPrefix(32, 24)}),
nrows AS (SELECT count(*) AS n FROM embeddings),
bsel AS (SELECT COALESCE(min(b), 24) AS bits
         FROM generate_series(8, 24) g(b), nrows
         WHERE (CAST(4 AS BIGINT) << b) >= n),
tsel AS (SELECT LEAST(32, 16 << GREATEST(0, (bits - 8) // 2)) AS tabs FROM bsel),
planes AS (SELECT t, bit, plane FROM planes_all, bsel, tsel
           WHERE planes_all.bit < bsel.bits AND planes_all.t < tsel.tabs),
buckets AS (
  SELECT e.vec_id, p.t,
    CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 64),
        i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])) >= 0
      THEN (CAST(1 AS BIGINT) << p.bit) ELSE 0 END) AS BIGINT) AS b
  FROM embeddings e CROSS JOIN planes p GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM buckets x JOIN buckets y ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
pairs AS (
  SELECT id_a, id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS nb
  FROM cand JOIN embeddings a ON a.vec_id = id_a
            JOIN embeddings b ON b.vec_id = id_b)
SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
FROM pairs
WHERE round(dot / (na * nb), 4) >= 0.45 AND na > 0 AND nb > 0
ORDER BY id_a, id_b"""

  /** Query-directed multi-probe oracle: the probe-key explosion is an
    * equi-join IMPLEMENTATION of "signatures within hamming <=
    * probeDepth in some table, every differing bit inside the
    * low-margin probe budget of at least one endpoint"; the oracle
    * states that semantics directly — per-bit margins, a rank over
    * |margin| (ties to the lower bit), budget masks, and a
    * bit_count(xor()) + mask-containment predicate — a stronger check
    * than replaying the flip enumeration (an off-by-one in the probe
    * set would hash-mismatch here instead of being mirrored). Derives
    * bits, tables, and budget from its own count(*) exactly as
    * Dedup.adaptiveLshBits / multiprobeTables / multiprobeBudget
    * (integer shifts only).
    */
  /** Shared signature+mask CTE chain of the query-directed multiprobe
    * oracles (pair query, telemetry report, and — with `maskRk`
    * overridden to the flat top-k budget — the ANN top-k oracle, whose
    * query-side-only probing affords a deeper mask than the dedup
    * pair coupling).
    */
  private[queries] def embLshMultiprobeSigsCtes: String =
    embLshMultiprobeSigsCtesFor("budget")

  private[queries] def embLshMultiprobeSigsCtesFor(maskRk: String): String =
    s"""WITH planes_all(t, bit, plane) AS (VALUES
${embLshPlanesPrefix(32, 24)}),
nrows AS (SELECT count(*) AS n FROM embeddings),
bsel AS (SELECT COALESCE(min(b), 24) AS bits
         FROM generate_series(8, 24) g(b), nrows
         WHERE (CAST(4 AS BIGINT) << b) >= n),
psel AS (SELECT LEAST(32, 8 << GREATEST(0, (bits - 8) // 4)) AS tabs,
                LEAST(8, 3 + GREATEST(0, (bits - 8) // 4)) AS budget,
                CASE WHEN bits >= 16 THEN 3 ELSE 2 END AS depth
         FROM bsel),
planes AS (SELECT t, bit, plane FROM planes_all, bsel, psel
           WHERE planes_all.bit < bsel.bits AND planes_all.t < psel.tabs),
margins AS (
  SELECT e.vec_id, p.t, p.bit,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])) AS mg
  FROM embeddings e CROSS JOIN planes p
  WHERE list_sum(list_transform(generate_series(1, 64),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) > 0),
sigs AS (
  SELECT vec_id, t,
    CAST(sum(CASE WHEN mg >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN rk <= $maskRk THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS mask
  FROM (SELECT vec_id, t, bit, mg,
          row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(mg), bit) AS rk
        FROM margins), psel
  GROUP BY 1, 2)"""

  /** Pinned-shape query-directed multiprobe oracle: tables/bits/budget/
    * depth explicit, SEQUENTIAL-stream planes (the operator's bits > 0
    * path, like [[embLshSqlFor]]). Same margin/rank/mask semantics as
    * the derived oracle, with the hamming bound at `depth` — the
    * depth-3 instantiation certifies the probe expression's triple-flip
    * branch at the verify SF.
    */
  private def embLshMultiprobePinnedSql(
      tables: Int, bits: Int, budget: Int, depth: Int): String =
    s"""WITH planes(t, bit, plane) AS (VALUES
${embLshPlanes(tables, bits)}),
margins AS (
  SELECT e.vec_id, p.t, p.bit,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])) AS mg
  FROM embeddings e CROSS JOIN planes p),
sigs AS (
  SELECT vec_id, t,
    CAST(sum(CASE WHEN mg >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN rk <= $budget THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS mask
  FROM (SELECT vec_id, t, bit, mg,
          row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(mg), bit) AS rk
        FROM margins)
  GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM sigs x JOIN sigs y
    ON x.t = y.t AND x.vec_id < y.vec_id AND bit_count(xor(x.b, y.b)) <= $depth
    AND ((xor(x.b, y.b) & x.mask) = xor(x.b, y.b)
      OR (xor(x.b, y.b) & y.mask) = xor(x.b, y.b))),
pairs AS (
  SELECT id_a, id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS nb
  FROM cand JOIN embeddings a ON a.vec_id = id_a
            JOIN embeddings b ON b.vec_id = id_b)
SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
FROM pairs
WHERE round(dot / (na * nb), 4) >= 0.45 AND na > 0 AND nb > 0
ORDER BY id_a, id_b"""

  private def embLshMultiprobeSql: String =
    s"""$embLshMultiprobeSigsCtes,
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM sigs x JOIN sigs y
    ON x.t = y.t AND x.vec_id < y.vec_id
    AND bit_count(xor(x.b, y.b)) <= (SELECT depth FROM psel)
    AND ((xor(x.b, y.b) & x.mask) = xor(x.b, y.b)
      OR (xor(x.b, y.b) & y.mask) = xor(x.b, y.b))),
pairs AS (
  SELECT id_a, id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS nb
  FROM cand JOIN embeddings a ON a.vec_id = id_a
            JOIN embeddings b ON b.vec_id = id_b)
SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
FROM pairs
WHERE round(dot / (na * nb), 4) >= 0.45 AND na > 0 AND nb > 0
ORDER BY id_a, id_b"""

  /** Telemetry-report oracle: per-table bucket stats + candidate yield
    * under the same derived shape and mask semantics.
    */
  private def embLshMultiprobeReportSql: String =
    s"""$embLshMultiprobeSigsCtes,
bstats AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_buckets, CAST(max(c) AS BIGINT) AS max_bucket
  FROM (SELECT t, b, count(*) AS c FROM sigs GROUP BY 1, 2) GROUP BY t),
cands AS (
  SELECT t, CAST(count(*) AS BIGINT) AS cand_pairs FROM (
    SELECT DISTINCT x.t AS t, x.vec_id AS id_a, y.vec_id AS id_b
    FROM sigs x JOIN sigs y
      ON x.t = y.t AND x.vec_id < y.vec_id
      AND bit_count(xor(x.b, y.b)) <= (SELECT depth FROM psel)
      AND ((xor(x.b, y.b) & x.mask) = xor(x.b, y.b)
        OR (xor(x.b, y.b) & y.mask) = xor(x.b, y.b)))
  GROUP BY t)
SELECT CAST(b.t AS BIGINT) AS t, n_buckets, max_bucket,
  COALESCE(cand_pairs, 0) AS cand_pairs
FROM bstats b LEFT JOIN cands c ON b.t = c.t
ORDER BY t"""

  /** Embedding-gate-replay oracle: states the accumulated-gate
    * semantics analytically — vec v's history is every vector in a
    * STRICTLY EARLIER batch (vec_id % 3); exact tier = min earlier id
    * with a bit-identical vector; near tier = best cosine >= 0.45
    * among one-sided multiprobe candidates (the BATCH side probes:
    * signatures within hamming <= 2 in some table with every differing
    * bit inside the batch row's 3 lowest-|margin| bits — history uses
    * exact keys only), ties to the smaller history id. Batch-0 rows
    * have no history: both tiers NULL, is_new true (the day-1 branch).
    * The LSH shape is the gate's PINNED (8 tables, 8 bits) geometry,
    * not corpus-derived — a persisted store gates every future batch
    * under the geometry it was built with. Zero-norm vectors never
    * near-match (r15 advice: 0/0 = NaN and NaN >= tau is TRUE under
    * Spark's NaN ordering). Store compaction must not appear in the
    * result at all.
    */
  private def embGateReplaySql: String = embGateReplaySqlFor(3)

  /** Same analytical statement with the batch split parameterized —
    * the indexed gate's replay stages `% 4` so its oracle cell is a
    * distinct derivation (4 appends + a compaction), not a re-run of
    * the in-flight gate's cell.
    */
  private def embGateReplaySqlFor(mod: Int): String =
    s"""WITH planes(t, bit, plane) AS (VALUES
${embLshPlanesPrefix(8, 8)}),
margins AS (
  SELECT e.vec_id, e.vec_id % $mod AS batch, p.t, p.bit,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])) AS mg
  FROM embeddings e CROSS JOIN planes p),
sigs AS (
  SELECT vec_id, batch, t,
    CAST(sum(CASE WHEN mg >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN rk <= 3 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS mask
  FROM (SELECT vec_id, batch, t, bit, mg,
          row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(mg), bit) AS rk
        FROM margins)
  GROUP BY 1, 2, 3),
cand AS (
  SELECT DISTINCT y.vec_id AS doc_id, x.vec_id AS hid
  FROM sigs x JOIN sigs y
    ON x.t = y.t AND x.batch < y.batch
    AND bit_count(xor(x.b, y.b)) <= 2
    AND (xor(x.b, y.b) & y.mask) = xor(x.b, y.b)),
scored AS (
  SELECT doc_id, hid,
    round(list_sum(list_transform(generate_series(1, 64),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(h.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(h.embedding[i] AS DOUBLE) * CAST(h.embedding[i] AS DOUBLE))))), 4) AS cos
  FROM cand JOIN embeddings b ON b.vec_id = doc_id
            JOIN embeddings h ON h.vec_id = hid
  WHERE list_sum(list_transform(generate_series(1, 64),
          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) > 0
    AND list_sum(list_transform(generate_series(1, 64),
          i -> CAST(h.embedding[i] AS DOUBLE) * CAST(h.embedding[i] AS DOUBLE))) > 0),
best AS (
  SELECT doc_id, hid AS near_dup_id, cos AS near_cos,
    row_number() OVER (PARTITION BY doc_id ORDER BY cos DESC, hid ASC) AS r
  FROM scored WHERE cos >= 0.45),
ex AS (
  SELECT b.vec_id AS doc_id, min(h.vec_id) AS exact_dup_id
  FROM embeddings b JOIN embeddings h
    ON h.vec_id % $mod < b.vec_id % $mod AND h.embedding = b.embedding
  GROUP BY 1)
SELECT e.vec_id AS doc_id, ex.exact_dup_id, bs.near_dup_id, bs.near_cos,
  (ex.exact_dup_id IS NULL AND bs.near_dup_id IS NULL) AS is_new
FROM embeddings e
LEFT JOIN ex ON e.vec_id = ex.doc_id
LEFT JOIN (SELECT doc_id, near_dup_id, near_cos FROM best WHERE r = 1) bs
  ON e.vec_id = bs.doc_id
ORDER BY doc_id"""

  private def embLshSqlFor(tables: Int, bits: Int): String =
    s"""WITH planes(t, bit, plane) AS (VALUES
${embLshPlanes(tables, bits)}),
buckets AS (
  SELECT e.vec_id, p.t,
    CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 64),
        i -> CAST(e.embedding[i] AS DOUBLE) * p.plane[i])) >= 0
      THEN (1 << p.bit) ELSE 0 END) AS BIGINT) AS b
  FROM embeddings e CROSS JOIN planes p GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM buckets x JOIN buckets y ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
pairs AS (
  SELECT id_a, id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(generate_series(1, 64),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS nb
  FROM cand JOIN embeddings a ON a.vec_id = id_a
            JOIN embeddings b ON b.vec_id = id_b)
SELECT id_a, id_b, round(dot / (na * nb), 4) AS cos
FROM pairs
WHERE round(dot / (na * nb), 4) >= 0.45 AND na > 0 AND nb > 0
ORDER BY id_a, id_b"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact_rows" ->
      """SELECT doc_id, source, lang, n_chars FROM (
  SELECT doc_id, source, lang, n_chars,
    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1 ORDER BY doc_id""",

    "dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY canonical_id""",
    "dedup_minhash_lsh" -> minhashSql,
    "dedup_simhash" -> simhashSql,
    "dedup_ngram_jaccard" -> jaccardSql,
    "dedup_embedding" -> cosineSql,
    "dedup_embedding_lsh" -> embLshAdaptiveSql,
    "dedup_embedding_lsh_wide" -> embLshSqlFor(16, 9),
    "dedup_embedding_lsh_multiprobe" -> embLshMultiprobeSql,
    "dedup_embedding_lsh_multiprobe_d3" -> embLshMultiprobePinnedSql(8, 8, 4, 3),
    "dedup_embedding_lsh_report" -> embLshMultiprobeReportSql,
    "dedup_spans" -> spanSql,
    "dedup_spans_clean" -> spanCleanSql,
    "dedup_spans_exact" -> spanExactSql,
    "dedup_spans_ranges" -> spanRangesSql,
    "dedup_fuzzy_edit" -> fuzzyEditSql,
    "dedup_incremental" -> incrementalSql,
    "streaming_dedup_gate_replay" -> gateReplaySql,
    "streaming_embedding_gate_replay" -> embGateReplaySql,
    "streaming_indexed_gate_replay" -> embGateReplaySqlFor(4),
    "decontaminate_ngram" -> decontaminateSql,
    "decontaminate_embedding" ->
      """WITH scored AS (
  SELECT t.vec_id AS train_id, v.vec_id AS eval_id,
    round(list_sum(list_transform(generate_series(1, 64),
        i -> CAST(t.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(t.embedding[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))))
      , 4) AS cos
  FROM embeddings t JOIN embeddings v
    ON t.vec_id % 10 != 0 AND v.vec_id % 10 = 0),
ranked AS (
  SELECT train_id, eval_id, cos,
    row_number() OVER (PARTITION BY train_id ORDER BY cos DESC, eval_id ASC) AS r
  FROM scored WHERE cos >= 0.35)
SELECT train_id, eval_id, cos FROM ranked WHERE r = 1
ORDER BY train_id"""
  )

  /** Replays the %5 history/batch split, the exact-text tier, and the
    * band-candidate + signature-agreement near tier. Estimates are
    * k/16 — exactly representable at 4 decimals, so the round() is
    * bit-safe in both engines; best-match ties break to the smaller
    * history id in both.
    */
  private lazy val incrementalSql = {
    val rows = K / Bands
    s"""${shingleCtes(P)},
sigs AS (SELECT doc_id, $sigList AS sig FROM hs),
hb AS (
  SELECT doc_id AS hid, sig AS hsg, b, list_slice(sig, b * $rows + 1, b * $rows + $rows) AS piece
  FROM sigs, (SELECT unnest(generate_series(0, ${Bands - 1})) AS b) WHERE doc_id % 5 <> 0),
bb AS (
  SELECT doc_id, sig AS bsg, b, list_slice(sig, b * $rows + 1, b * $rows + $rows) AS piece
  FROM sigs, (SELECT unnest(generate_series(0, ${Bands - 1})) AS b) WHERE doc_id % 5 = 0),
cand AS (
  SELECT DISTINCT bb.doc_id, bb.bsg, hb.hid, hb.hsg
  FROM hb JOIN bb ON hb.b = bb.b AND hb.piece = bb.piece),
scored AS (
  SELECT doc_id, hid,
    round(list_sum(list_transform(generate_series(1, $K),
      i -> CASE WHEN bsg[i] = hsg[i] THEN 1.0 ELSE 0.0 END)) / $K, 4) AS est
  FROM cand),
best AS (
  SELECT doc_id, hid AS near_dup_id, est AS near_est,
    row_number() OVER (PARTITION BY doc_id ORDER BY est DESC, hid ASC) AS r
  FROM scored WHERE est >= 0.5),
ex AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_dup_id
  FROM documents b JOIN documents h ON b.text = h.text AND h.doc_id % 5 <> 0
  WHERE b.doc_id % 5 = 0 GROUP BY 1)
SELECT d.doc_id, ex.exact_dup_id, bs.near_dup_id, bs.near_est,
  (ex.exact_dup_id IS NULL AND bs.near_dup_id IS NULL) AS is_new
FROM documents d
LEFT JOIN ex ON d.doc_id = ex.doc_id
LEFT JOIN (SELECT doc_id, near_dup_id, near_est FROM best WHERE r = 1) bs ON d.doc_id = bs.doc_id
WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id"""
  }

  /** Replays the three-micro-batch gate lifecycle analytically: doc d's
    * history is every doc in a STRICTLY EARLIER batch (doc_id % 3),
    * exact tier = min earlier-batch doc with equal text, near tier =
    * best band-candidate at est >= 0.5 (ties to smaller history id) —
    * the same verdict incrementalSql checks for the one-shot gate, here
    * accumulated across batches. Batch-0 docs have no history, so both
    * tiers are NULL and is_new is true (the day-1 branch). Compaction
    * between batches must not appear in the result at all.
    */
  private lazy val gateReplaySql = {
    val rows = K / Bands
    s"""${shingleCtes(P)},
sigs AS (SELECT doc_id, $sigList AS sig FROM hs),
bands AS (
  SELECT doc_id, doc_id % 3 AS batch, sig, b,
    list_slice(sig, b * $rows + 1, b * $rows + $rows) AS piece
  FROM sigs, (SELECT unnest(generate_series(0, ${Bands - 1})) AS b)),
cand AS (
  SELECT DISTINCT bb.doc_id, bb.sig AS bsg, hb.doc_id AS hid, hb.sig AS hsg
  FROM bands bb JOIN bands hb
    ON bb.b = hb.b AND bb.piece = hb.piece AND hb.batch < bb.batch),
scored AS (
  SELECT doc_id, hid,
    round(list_sum(list_transform(generate_series(1, $K),
      i -> CASE WHEN bsg[i] = hsg[i] THEN 1.0 ELSE 0.0 END)) / $K, 4) AS est
  FROM cand),
best AS (
  SELECT doc_id, hid AS near_dup_id, est AS near_est,
    row_number() OVER (PARTITION BY doc_id ORDER BY est DESC, hid ASC) AS r
  FROM scored WHERE est >= 0.5),
ex AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_dup_id
  FROM documents b JOIN documents h
    ON b.text = h.text AND h.doc_id % 3 < b.doc_id % 3
  GROUP BY 1)
SELECT d.doc_id, ex.exact_dup_id, bs.near_dup_id, bs.near_est,
  (ex.exact_dup_id IS NULL AND bs.near_dup_id IS NULL) AS is_new
FROM documents d
LEFT JOIN ex ON d.doc_id = ex.doc_id
LEFT JOIN (SELECT doc_id, near_dup_id, near_est FROM best WHERE r = 1) bs
  ON d.doc_id = bs.doc_id
ORDER BY d.doc_id"""
  }

  /** Replays the corpus/eval split, the md5-60-bit gram hash, and the
    * shared-gram counts exactly. `n_grams` counts DISTINCT SHINGLE
    * STRINGS (Spark hashes the distinct-shingle array, so its size is
    * string-distinct even if two strings hash-collide); `shared_grams`
    * counts distinct HASHES on both sides.
    */
  private lazy val decontaminateSql =
    s"""WITH split AS (
  SELECT doc_id, string_split(text, ' ') w, (doc_id % 20 = 0) AS is_eval FROM documents),
idx AS (SELECT doc_id, is_eval, w, unnest(generate_series(1, len(w) - 2)) AS i FROM split),
sh AS (SELECT DISTINCT doc_id, is_eval, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
hg AS (SELECT doc_id, is_eval, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $P AS g FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM sh WHERE NOT is_eval GROUP BY 1),
cg AS (SELECT DISTINCT doc_id, g FROM hg WHERE NOT is_eval),
eg AS (SELECT DISTINCT doc_id AS eval_id, g FROM hg WHERE is_eval),
j AS (SELECT c.doc_id, e.eval_id, count(DISTINCT c.g) AS shared_grams
      FROM cg c JOIN eg e ON c.g = e.g GROUP BY 1, 2)
SELECT j.doc_id, eval_id, shared_grams, n_grams
FROM j JOIN sizes ON j.doc_id = sizes.doc_id
WHERE shared_grams >= 5
ORDER BY j.doc_id, eval_id"""
}
