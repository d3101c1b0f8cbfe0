package graft.queries

import graft.Tables
import graft.ext.{DedupConstants, TextAnalysis, TextConstants}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents`. Oracle SQL is generated from
  * the same marker/stopword/regex constants the Spark operators use
  * ([[TextConstants]]), so both engines score identically.
  */
object TextQueries extends QueryGroup {

  /** Distilled linear-classifier term weights (milli units) shared by
    * the Spark map literal and the oracle's VALUES table. */
  private val ClassifierWeights: Seq[(String, Long)] = Seq(
    "join" -> 120L, "hash" -> 80L, "spark" -> 200L, "stream" -> 90L,
    "window" -> 70L, "filter" -> 50L, "merge" -> 30L,
    "slow" -> -250L, "small" -> -60L, "scan" -> -40L)
  private val ClassifierBias = 10L

  private def classifierValuesSql: String =
    ClassifierWeights.map { case (t, w) =>
      // terms are inlined into a SQL VALUES literal — keep them in the
      // quote-free subset so no escaping question arises
      require(t.matches("[A-Za-z0-9_-]+"), s"classifier term must be plain (got '$t')")
      s"('$t', $w)"
    }.mkString(", ")

  /** Logistic-trainer features and label — a distillation setup: the
    * TEACHER rule labels a document "good" when it mentions `fast` more
    * often than `slow`, and the linear student must re-discover that
    * rule from term counts (the synthetic corpus carries no text↔lang
    * correlation, so a metadata label would only teach the majority
    * class). `fast`/`slow` lead the term list so the label CASE can
    * reuse their count columns (c0/c1) in the oracle replay. */
  private val TrainTerms = Seq("fast", "slow", "join", "hash", "the", "a")
  /** Teacher rule: more `fast` than `slow` mentions. */
  private def trainLabelExpr =
    expr("size(filter(split(text, ' '), x -> x = 'fast')) > size(filter(split(text, ' '), x -> x = 'slow'))")
  private val TrainEpochs = 12
  private val TrainLrMilli = 1500L

  /** Unrolled-epoch SQL replay of [[graft.ext.Classifier.trainLogistic]]:
    * the driver's per-epoch loop becomes one CTE pair per epoch
    * (gradient sums `gr{e}`, weight update `wt{e}`). Every float step is
    * an IEEE correctly-rounded op (`+ - * / abs floor`) in the exact
    * association order the Spark expressions use, per-row contributions
    * are discretized to integer micros BEFORE summing (order-independent
    * sums), and the Long weight update's truncating division is DuckDB's
    * `//` — so the replay is bit-identical, epoch by epoch. */
  private def classifierTrainCtes: String = {
    val k = TrainTerms.length
    val tcCols = TrainTerms.zipWithIndex.map { case (t, j) =>
      s"CAST(SUM(CASE WHEN word = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS c$j"
    }.mkString(",\n    ")
    val cntCols = (0 until k).map(j => s"COALESCE(tc.c$j, 0) AS c$j").mkString(", ")
    def zSql = "(CAST((" + ((s"w0") +: (0 until k).map(j => s"w${j + 1} * c$j"))
      .mkString(" + ") + ") AS DOUBLE) / 1000000.0)"
    def gSql(cj: String) =
      s"CAST(FLOOR((0.5 + $zSql / (2.0 * (1.0 + ABS($zSql))) - y) * CAST($cj AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
    val epochs = (1 to TrainEpochs).map { e =>
      val grCols = (s"SUM(${gSql("1")}) AS G0" +:
        (0 until k).map(j => s"SUM(${gSql(s"c$j")}) AS G${j + 1}")).mkString(",\n    ")
      val wtCols = (0 to k).map(j =>
        s"w$j - ($TrainLrMilli * G$j) // (1000 * n) AS w$j").mkString(", ")
      s"""gr$e AS MATERIALIZED (SELECT
    $grCols
  FROM cnt, wt${e - 1}),
wt$e AS MATERIALIZED (SELECT $wtCols FROM gr$e, wt${e - 1}, nn)"""
    }.mkString(",\n")
    val zeroW = (0 to k).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")
    s"""words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tc AS MATERIALIZED (
  SELECT doc_id,
    $tcCols
  FROM words GROUP BY 1),
cnt AS MATERIALIZED (
  SELECT d.doc_id,
    CASE WHEN COALESCE(tc.c0, 0) > COALESCE(tc.c1, 0) THEN 1.0 ELSE 0.0 END AS y,
    $cntCols
  FROM documents d LEFT JOIN tc USING (doc_id)),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cnt),
wt0 AS (SELECT $zeroW),
$epochs"""
  }

  private def classifierTrainSql: String = {
    val k = TrainTerms.length
    // DuckDB SUM(BIGINT) yields HUGEINT, and HUGEINT propagates through
    // every wt{e} update — cast the final projection back to BIGINT so
    // the type-sensitive parquet compare sees INT64 (values already
    // match; the sibling confusion oracle casts for the same reason).
    val rows = (s"SELECT '${graft.ext.Classifier.BiasFeature}' AS feature, CAST(w0 AS BIGINT) AS weight_micro FROM wt$TrainEpochs" +:
      TrainTerms.zipWithIndex.map { case (t, j) =>
        s"SELECT '$t', CAST(w${j + 1} AS BIGINT) FROM wt$TrainEpochs"
      }).mkString("\n  UNION ALL ")
    s"""WITH $classifierTrainCtes
SELECT feature, weight_micro FROM (
  $rows
) ORDER BY feature"""
  }

  private def classifierTrainedConfusionSql: String = {
    val k = TrainTerms.length
    val marginSql = (s"w0" +: (0 until k).map(j => s"w${j + 1} * c$j")).mkString(" + ")
    s"""WITH $classifierTrainCtes,
scored AS (
  SELECT CAST(cnt.y AS BIGINT) AS label,
    CAST(CASE WHEN ($marginSql) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
  FROM cnt, wt$TrainEpochs)
SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2 ORDER BY 1, 2"""
  }
  import TextConstants._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_langid" -> ((s, dir) => {
      TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
        .select(Seq(col("doc_id")) ++ LangMarkers.map { case (l, _) => col(s"score_$l") } :+ col("predicted_lang"): _*)
        .orderBy("doc_id")
    }),

    // char-bigram n-gram heuristic variant (profiles in LangBigrams)
    "text_langid_ngram" -> ((s, dir) => {
      TextAnalysis.langIdCharNgram(
        Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text")
        .select(Seq(col("doc_id")) ++ LangBigrams.map { case (l, _) => col(s"ngram_$l") } :+ col("predicted_lang"): _*)
        .orderBy("doc_id")
    }),

    "text_quality" -> ((s, dir) => {
      TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Canonicalization before exact dedup: lowercase, punctuation ->
    // space, collapse runs, trim — row-local map inside codegen.
    "text_normalize" -> ((s, dir) => {
      TextAnalysis.normalizeText(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Exact dedup over the NORMALIZED text: catches the case /
    // punctuation / whitespace duplicate variants raw exact dedup
    // misses — same one-hash-aggregate shape, normalization fused
    // into the scan.
    "dedup_exact_norm" -> ((s, dir) => {
      graft.ext.Dedup.exact(
        Tables.documents(s, dir)
          .withColumn("norm_text", TextAnalysis.normalizeTextCol("text")),
        "doc_id", Seq("norm_text"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")
    }),

    // Gopher-rules composite keep/drop filter (row-local, all booleans;
    // thresholds tuned so the synthetic corpus genuinely splits:
    // 30-90 words keeps the bulk, drops the short/long tails).
    "quality_filter_gopher" -> ((s, dir) => {
      TextAnalysis.gopherFilter(Tables.documents(s, dir), "doc_id", "text",
        minWords = 30, maxWords = 90)
        .orderBy("doc_id")
    }),

    "token_count" -> ((s, dir) => {
      TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Real subword counts: greedy longest-match BPE-apply as a
    // row-local codegen fold (ext/Bpe) — the token quantity budgets
    // and packing should be measured in, vs the whitespace estimate.
    "token_count_bpe" -> ((s, dir) => {
      graft.ext.Bpe.bpeTokenCounts(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // BPE training's core aggregate: corpus-wide adjacent char-pair
    // counts (Sennrich et al. round 1) — one explode + one hash agg;
    // the full iterative trainer (ext/Bpe.trainMerges) repeats this
    // per learned merge and is spec-checked on a hand-computed corpus.
    "bpe_pair_counts" -> ((s, dir) => {
      graft.ext.Bpe.pairCounts(Tables.documents(s, dir), "doc_id", "text", topN = 50)
    }),

    // Trained-model application: per-term integer weights (a distilled
    // linear quality classifier) applied as a row-local fold — the
    // CCNet/FineWeb "score every document with the model" gate.
    "quality_classifier" -> ((s, dir) => {
      TextAnalysis.linearClassifierScore(Tables.documents(s, dir), "doc_id", "text",
        ClassifierWeights, biasMilli = ClassifierBias)
        .orderBy("doc_id")
    }),

    // Classifier TRAINING: full-batch logistic GD (en vs non-en over
    // marker-term counts) — one integer-gradient aggregate per epoch,
    // driver state = the weight vector. Deterministic enough to replay
    // epoch-by-epoch in the DuckDB oracle (unrolled CTEs).
    "classifier_train" -> ((s, dir) => {
      import s.implicits._
      graft.ext.Classifier.trainLogistic(
        Tables.documents(s, dir), "doc_id", "text",
        TrainTerms, trainLabelExpr,
        epochs = TrainEpochs, lrMilli = TrainLrMilli)
        .toDF("feature", "weight_micro").orderBy("feature")
    }),

    // The learned weights feeding the apply gate: train, score every
    // document, report the label×prediction confusion counts — the
    // self-contained train→apply loop CCNet/FineWeb-style pipelines run.
    "quality_classifier_trained" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = graft.ext.Classifier.trainLogistic(docs, "doc_id", "text",
        TrainTerms, trainLabelExpr,
        epochs = TrainEpochs, lrMilli = TrainLrMilli)
      graft.ext.Classifier.featureCounts(docs, "doc_id", "text", TrainTerms, trainLabelExpr)
        .select(col("y").cast("long").as("label"),
          when(graft.ext.Classifier.marginMicroCol(w.map(_._2)) >= 0, 1L)
            .otherwise(0L).as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    }),

    // per-language corpus rollup of token counts — the aggregate view a
    // pipeline dashboard wants
    "token_stats_by_lang" -> ((s, dir) => {
      TextAnalysis.tokenCounts(Tables.documents(s, dir).select("doc_id", "lang", "text"), "doc_id", "text")
        .join(Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("total_tokens"))
        // exact-integer IEEE division — bit-identical across engines,
        // unlike round(avg, 2) whose rounding implementations differ
        .withColumn("avg_tokens",
          col("total_tokens").cast("double") / col("n_docs"))
        .orderBy("lang")
    }),

    "doc_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // repetition / boilerplate signals
    "text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionRatio(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // PII scrub over the events' JSON props (the only column with
    // digit runs at this SF; email/url counts exercise the patterns)
    "pii_redact" -> ((s, dir) => {
      TextAnalysis.piiScrub(Tables.events(s, dir), "event_id", "props")
        .orderBy("event_id")
    }),

    // fixed-size training-window chunking: 40-word chunks, 10-word
    // overlap — row-local sequence+slice, no shuffle
    "doc_chunks" -> ((s, dir) => {
      TextAnalysis.chunkDocs(Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 40, overlap = 10)
        .orderBy("doc_id", "chunk_id")
    }),

    // content-defined chunking: rolling-hash boundaries (divisor 16 ⇒
    // ~16-token chunks), insertion-stable — see TextAnalysis.chunkCdc
    "chunk_cdc" -> ((s, dir) => {
      TextAnalysis.chunkCdc(Tables.documents(s, dir), "doc_id", "text", divisor = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // top-3 distinctive terms per doc by tf * N / df (log-free idf)
    "tfidf_top_terms" -> ((s, dir) => {
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    })
  )

  // ---- generated oracle SQL ----

  private def markerList(ms: Seq[String]) = ms.map(m => s"'$m'").mkString("[", ", ", "]")

  private val langidSql = {
    val scores = LangMarkers.map { case (l, ms) =>
      s"len(list_filter(string_split(text, ' '), x -> list_contains(${markerList(ms)}, x))) AS score_$l"
    }.mkString(",\n  ")
    val langs = LangMarkers.map(_._1)
    val chain = langs.init.map { l =>
      val conds = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n    ")
    s"""WITH scored AS (
  SELECT doc_id,
  $scores
  FROM documents)
SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
  CASE $chain
    ELSE '${langs.last}' END AS predicted_lang
FROM scored ORDER BY doc_id"""
  }

  private val langidNgramSql = {
    val scores = LangBigrams.map { case (l, grams) =>
      val terms = grams.map(g =>
        s"(length(text) - length(replace(text, '$g', ''))) // ${g.length}").mkString(" + ")
      s"$terms AS ngram_$l"
    }.mkString(",\n  ")
    val langs = LangBigrams.map(_._1)
    val chain = langs.init.map { l =>
      val conds = langs.filter(_ != l).map(o => s"ngram_$l >= ngram_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n    ")
    s"""WITH scored AS (
  SELECT doc_id,
  $scores
  FROM documents)
SELECT doc_id, ${langs.map(l => s"ngram_$l").mkString(", ")},
  CASE $chain
    ELSE '${langs.last}' END AS predicted_lang
FROM scored ORDER BY doc_id"""
  }

  private val qualitySql = {
    s"""SELECT doc_id,
  len(string_split(text, ' ')) AS n_words,
  round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        / len(string_split(text, ' ')), 4) AS avg_word_len,
  round(CAST(len(list_filter(string_split(text, ' '),
          x -> list_contains(${markerList(Stopwords)}, x))) AS DOUBLE)
        / len(string_split(text, ' ')), 4) AS stopword_ratio,
  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')), 4) AS uniq_ratio
FROM documents ORDER BY doc_id"""
  }

  /** Replays every Gopher rule with the same IEEE-exact divisions and
    * thresholds (30/90 words, 3-10 mean len, 0.1/0.8/0.9/0.3 ratios, 2
    * stopwords). DuckDB `/` on integers is float division like Spark's
    * `/`; the '...' count diff is an exact multiple of 3 so `/ 3` is
    * exact on both engines.
    */
  private val gopherSql = {
    val rules = Seq(
      "nw >= 30 AND nw <= 90" -> "word_count_ok",
      "mean_wl >= 3.0 AND mean_wl <= 10.0" -> "mean_word_len_ok",
      "CAST(symbols AS DOUBLE) / nw <= 0.1" -> "symbol_ok",
      "CAST(alpha_words AS DOUBLE) / nw >= 0.8" -> "alpha_ok",
      "stop_hits >= 2" -> "stopword_ok",
      "CAST(bullet_lines AS DOUBLE) / nl <= 0.9" -> "bullet_ok",
      "CAST(ell_lines AS DOUBLE) / nl <= 0.3" -> "ellipsis_ok")
    val ruleCols = rules.map { case (e, n) => s"($e) AS $n" }.mkString(",\n  ")
    val keep = rules.map { case (e, _) => s"($e)" }.mkString(" AND ")
    s"""WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w, string_split(text, chr(10)) AS ls
  FROM documents),
m AS (
  SELECT doc_id,
    len(w) AS nw, len(ls) AS nl,
    CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_wl,
    (length(text) - length(regexp_replace(text, '#', '', 'g'))) +
      (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS symbols,
    len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
    len(list_filter(${markerList(Stopwords)}, s -> list_contains(w, s))) AS stop_hits,
    len(list_filter(ls, l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS bullet_lines,
    len(list_filter(ls, l -> l LIKE '%...')) AS ell_lines
  FROM t)
SELECT doc_id, nw AS n_words,
  $ruleCols,
  ($keep) AS keep
FROM m ORDER BY doc_id"""
  }

  private val tokenSql =
    s"""SELECT doc_id,
  len(string_split(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '$TokenRegex')) AS re_tokens
FROM documents ORDER BY doc_id"""

  private val tokenStatsSql =
    """SELECT lang, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang"""

  private val fingerprintSql = {
    val p = DedupConstants.P
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - $FpShingle + 1)) AS i FROM docs),
sh AS (SELECT doc_id, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
hs AS (SELECT doc_id, list(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $p ORDER BY i) AS hs
       FROM sh GROUP BY doc_id),
fp AS (SELECT doc_id,
  list_distinct(list_transform(generate_series(1, len(hs) - $FpWindow + 1),
    i -> list_min(list_slice(hs, i, i + $FpWindow - 1)))) AS fp
  FROM hs WHERE len(hs) >= $FpWindow)
SELECT doc_id, len(fp) AS n_fp, list_min(fp) AS min_fp, list_max(fp) AS max_fp
FROM fp ORDER BY doc_id"""
  }

  private val repetitionSql =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id, w,
  CASE WHEN len(w) >= 3
       THEN list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       ELSE [] END AS s
  FROM docs)
SELECT doc_id,
  len(w) AS n_words,
  len(list_distinct(w)) AS uniq_words,
  CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_ratio,
  len(s) AS n_shingles,
  CASE WHEN len(s) > 0
       THEN CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / len(s)
       ELSE 0.0 END AS dup_shingle_ratio
FROM sh ORDER BY doc_id"""

  private val piiSql = {
    import TextAnalysis.{EmailRe, UrlRe, DigitRunRe}
    s"""SELECT event_id,
  len(regexp_extract_all(props, '$EmailRe')) AS n_emails,
  len(regexp_extract_all(props, '$UrlRe')) AS n_urls,
  len(regexp_extract_all(props, '$DigitRunRe')) AS n_digit_runs,
  length(regexp_replace(regexp_replace(regexp_replace(props,
    '$EmailRe', '<EMAIL>', 'g'),
    '$UrlRe', '<URL>', 'g'),
    '$DigitRunRe', '<NUM>', 'g')) AS redacted_len
FROM events ORDER BY event_id"""
  }

  private val tfidfSql =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df_t,
    CAST(tf * n_docs AS DOUBLE) / df_t AS score,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY CAST(tf * n_docs AS DOUBLE) / df_t DESC, term ASC) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, df_t, score, rank
FROM scored WHERE rank <= 3 ORDER BY doc_id, rank"""

  private val chunksSql =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ch AS (SELECT doc_id, w,
  unnest(generate_series(0, CAST(floor((len(w) - 1) / 30) AS BIGINT))) AS cid
  FROM docs)
SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
  array_to_string(list_slice(w, cid * 30 + 1, cid * 30 + 40), ' ') AS chunk_text,
  CAST(len(string_split(array_to_string(list_slice(w, cid * 30 + 1, cid * 30 + 40), ' '), ' '))
    AS INTEGER) AS n_words
FROM ch ORDER BY doc_id, chunk_id"""

  val oracleSql: Map[String, String] = Map(
    "doc_chunks" -> chunksSql,

    "chunk_cdc" -> {
      val p = graft.ext.DedupConstants.P
      def th(tok: String) =
        s"(CAST(('0x' || substr(md5($tok), 1, 15)) AS BIGINT) % $p)"
      s"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (
  SELECT t.doc_id, i,
    (${th("toks[i]")} + 31 * ${th("toks[i-1]")} + 961 * ${th("toks[i-2]")}) % $p AS r
  FROM t, LATERAL (SELECT unnest(generate_series(3, len(toks))) AS i) g),
bnd AS (
  SELECT doc_id, i FROM pos WHERE r % 16 = 0
  UNION
  SELECT doc_id, len(toks) FROM t),
chunks AS (
  SELECT doc_id, i AS e,
    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS INTEGER) AS chunk_idx
  FROM bnd)
SELECT c.doc_id, c.chunk_idx, CAST(c.e - c.s + 1 AS BIGINT) AS n_tokens,
  array_to_string(t.toks[c.s:c.e], ' ') AS chunk_text
FROM chunks c JOIN t USING (doc_id)
ORDER BY doc_id, chunk_idx"""
    },
    "text_langid" -> langidSql,
    "text_langid_ngram" -> langidNgramSql,
    "text_quality" -> qualitySql,

    "text_normalize" ->
      """SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) <> text AS changed
FROM documents ORDER BY doc_id""",

    "dedup_exact_norm" ->
      """WITH n AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
  FROM documents)
SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
FROM n GROUP BY norm_text ORDER BY canonical_id""",
    "quality_filter_gopher" -> gopherSql,
    "token_count" -> tokenSql,
    "token_count_bpe" ->
      (graft.ext.Bpe.oracleSql("documents", "doc_id", "text") + "\nORDER BY doc_id"),

    "bpe_pair_counts" ->
      """WITH words AS (
  SELECT word FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) >= 2),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair
  FROM (SELECT word, unnest(generate_series(1, len(word) - 1)) AS i FROM words)),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1)
SELECT pair, n FROM c ORDER BY n DESC, pair ASC LIMIT 50""",

    "quality_classifier" ->
      s"""WITH wt(term, w) AS (VALUES $classifierValuesSql),
words AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''),
sc AS (
  SELECT ws.doc_id,
    CAST(count(*) AS BIGINT) AS n_words,
    CAST(count(wt.w) AS BIGINT) AS hits,
    CAST($ClassifierBias + coalesce(sum(wt.w), 0) AS BIGINT) AS margin_milli
  FROM words ws LEFT JOIN wt ON ws.word = wt.term
  GROUP BY 1)
SELECT d.doc_id, coalesce(sc.n_words, 0) AS n_words,
  coalesce(sc.hits, 0) AS hits,
  coalesce(sc.margin_milli, $ClassifierBias) AS margin_milli
FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""",
    "classifier_train" -> classifierTrainSql,
    "quality_classifier_trained" -> classifierTrainedConfusionSql,
    "token_stats_by_lang" -> tokenStatsSql,
    "doc_fingerprint" -> fingerprintSql,
    "text_repetition" -> repetitionSql,
    "pii_redact" -> piiSql,
    "tfidf_top_terms" -> tfidfSql
  )
}
