package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared constants for text analysis; the DuckDB oracle SQL
  * (TextQueries) is generated from the same values.
  */
object TextConstants {
  /** Per-language marker (stopword) lists for the n-gram/stopword
    * language-ID heuristic, keyed in alphabetical language order —
    * ties resolve to the alphabetically first language.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "in"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "une", "dans"),
    "zh" -> Seq("de5", "shi4", "bu4", "wo3", "zai4") // romanized markers
  )

  /** Character-bigram profiles for the n-gram language-ID variant —
    * the most frequent bigrams of each language's orthography
    * (public-knowledge frequency tables), alphabetical language order.
    */
  val LangBigrams: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("en", "er", "ch", "de", "ei"),
    "en" -> Seq("th", "he", "in", "er", "an"),
    "es" -> Seq("de", "es", "en", "el", "la"),
    "fr" -> Seq("es", "le", "de", "en", "re"),
    "zh" -> Seq("zh", "sh", "ng", "ao", "ia") // romanized
  )

  /** English stopwords for the quality score's stopword ratio. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** BPE-ish token regex: letter runs, digit runs, or any single
    * non-alphanumeric-non-space symbol.
    */
  val TokenRegex = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Winnowing fingerprint parameters: k-word shingles, window w. */
  val FpShingle = 3
  val FpWindow = 4
}

/** Text analysis operators for a training-data pipeline over a
  * `(idCol, textCol)` table: language ID, quality scoring, token
  * counting, and winnowing document fingerprints. All row-local
  * Catalyst expressions (split/filter/transform/aggregate) — they
  * pipeline inside whole-stage codegen with no shuffle, so throughput
  * scales linearly with input splits at 100 TB.
  */
object TextAnalysis {
  import TextConstants._

  private def wordsCol(textCol: String): Column = split(col(textCol), " ")

  /** Text canonicalization — the normalization pass a C4/Gopher-style
    * pipeline runs BEFORE exact dedup so case/punctuation/whitespace
    * variants of the same document hash together: lowercase, replace
    * every non-alphanumeric with a space, collapse space runs, trim.
    * Row-local (map-only, inside whole-stage codegen); no shuffle.
    *
    * ASCII-safe by construction: the character class keeps only
    * `[a-z0-9 ]`, so engine differences in unicode case folding (the
    * Turkish-İ family) can only appear in the REPLACED characters,
    * never the kept ones — but `lower` itself is applied to the raw
    * string, so corpora with non-ASCII cased letters should lowercase
    * identically in any oracle engine being compared against (true for
    * ICU-less DuckDB + JVM on ASCII; verified for the test corpus).
    */
  def normalizeTextCol(textCol: String): Column =
    trim(regexp_replace(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))

  /** [[normalizeTextCol]] applied per document: (id, norm_text, changed). */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      normalizeTextCol(textCol).as("norm_text"),
      (normalizeTextCol(textCol) =!= col(textCol)).as("changed"))

  /** Marker-count language scores + argmax prediction (first-wins on
    * ties, i.e. alphabetical language preference). A real detector
    * would use char-n-gram profiles; the scoring/argmax plumbing is
    * identical and the marker lists are swappable.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withScores = LangMarkers.foldLeft(df.withColumn("__w", wordsCol(textCol))) {
      case (acc, (lang, markers)) =>
        val markerArr = array(markers.map(lit): _*)
        acc.withColumn(s"score_$lang",
          size(filter(col("__w"), w => array_contains(markerArr, w))))
    }
    // first-wins argmax chain in alphabetical order
    val predicted = LangMarkers.map(_._1).foldRight(lit(LangMarkers.head._1)) {
      case (lang, elseExpr) =>
        val isMax = LangMarkers.map(_._1).filter(_ != lang)
          .map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseExpr)
    }
    withScores
      .withColumn("predicted_lang", predicted)
      .drop("__w")
  }

  /** Char-n-gram language ID: score = total occurrences of each
    * language's characteristic bigrams (substring counting via
    * length-difference — exact, portable to any SQL oracle), argmax
    * with alphabetical tie preference. Complements [[langId]]'s
    * word-marker scoring; same prediction plumbing.
    */
  def langIdCharNgram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withScores = LangBigrams.foldLeft(df) { case (acc, (lang, grams)) =>
      val score = grams.map { g =>
        expr(s"(length($textCol) - length(replace($textCol, '$g', ''))) div ${g.length}")
      }.reduce(_ + _)
      acc.withColumn(s"ngram_$lang", score)
    }
    val langs = LangBigrams.map(_._1)
    val predicted = langs.foldRight(lit(langs.head)) { case (lang, elseExpr) =>
      val isMax = langs.filter(_ != lang)
        .map(o => col(s"ngram_$lang") >= col(s"ngram_$o")).reduce(_ && _)
      when(isMax, lit(lang)).otherwise(elseExpr)
    }
    withScores.withColumn("predicted_lang", predicted)
  }

  /** Quality signals: word count, average word length, stopword ratio,
    * and distinct-word ratio (repetition detector). Ratios rounded to 4
    * for cross-engine comparability.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = wordsCol(textCol)
    val stopArr = array(Stopwords.map(lit): _*)
    df.select(
      col(idCol),
      size(w).as("n_words"),
      round(
        (length(col(textCol)) - (size(w) - 1)).cast("double") / size(w), 4
      ).as("avg_word_len"),
      round(size(filter(w, x => array_contains(stopArr, x))).cast("double") / size(w), 4)
        .as("stopword_ratio"),
      round(size(array_distinct(w)).cast("double") / size(w), 4).as("uniq_ratio"))
  }

  /** Gopher-style document quality filter (Rae et al. 2021, §A1.1 —
    * the rule set most open training pipelines reuse): per-document
    * booleans for each rule plus the composite `keep` verdict. Entirely
    * row-local single-pass projection — at 100 TB this is a map-only
    * scan, no shuffle, codegen end to end. Booleans (not float scores)
    * keep the cross-engine hash trivially stable: every ratio is one
    * IEEE-exact division compared to a threshold, identical in DuckDB.
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [minMeanWordLen, maxMeanWordLen]; symbol-to-word ratio ('#' and
    * '...') <= maxSymbolRatio; fraction of words with an alphabetic
    * char >= minAlphaRatio; >= minStopwords distinct stopwords present;
    * fraction of bullet-started lines <= maxBulletRatio; fraction of
    * ellipsis-ended lines <= maxEllipsisRatio.
    */
  def gopherFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3
  ): DataFrame = {
    val rules = gopherRules(textCol, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, minAlphaRatio, minStopwords, maxBulletRatio, maxEllipsisRatio)
    df.select(
      Seq(col(idCol), size(wordsCol(textCol)).cast("long").as("n_words")) ++
        rules.map { case (name, c) => c.as(name) }: _*)
      .withColumn("keep", rules.map(r => col(r._1)).reduce(_ && _))
  }

  /** The composite keep predicate as ONE column expression — for
    * pipelines that gate on quality inline (a pure scan-side filter,
    * no projection of the rule columns, no join back).
    */
  def gopherKeep(
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3
  ): Column =
    gopherRules(textCol, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, minAlphaRatio, minStopwords, maxBulletRatio, maxEllipsisRatio)
      .map(_._2).reduce(_ && _)

  private def gopherRules(
      textCol: String,
      minWords: Int,
      maxWords: Int,
      minMeanWordLen: Double,
      maxMeanWordLen: Double,
      maxSymbolRatio: Double,
      minAlphaRatio: Double,
      minStopwords: Int,
      maxBulletRatio: Double,
      maxEllipsisRatio: Double
  ): Seq[(String, Column)] = {
    val w = wordsCol(textCol)
    val lines = split(col(textCol), "\n")
    val stopArr = array(Stopwords.map(lit): _*)
    val nWords = size(w)
    val nLines = size(lines)
    val meanWl = (length(col(textCol)) - (nWords - 1)).cast("double") / nWords
    val symbols = (length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))) +
      (length(col(textCol)) - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val alphaWords = size(filter(w, x => x.rlike("[a-zA-Z]")))
    val stopHits = size(filter(stopArr, s => array_contains(w, s)))
    val bulletLines = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    Seq(
      "word_count_ok" -> (nWords >= minWords && nWords <= maxWords),
      "mean_word_len_ok" -> (meanWl >= minMeanWordLen && meanWl <= maxMeanWordLen),
      "symbol_ok" -> (symbols.cast("double") / nWords <= maxSymbolRatio),
      "alpha_ok" -> (alphaWords.cast("double") / nWords >= minAlphaRatio),
      "stopword_ok" -> (stopHits >= minStopwords),
      "bullet_ok" -> (bulletLines.cast("double") / nLines <= maxBulletRatio),
      "ellipsis_ok" -> (ellipsisLines.cast("double") / nLines <= maxEllipsisRatio))
  }

  /** Linear text-classifier APPLICATION (the fastText/CCNet shape: a
    * trained model distilled to per-term integer weights, applied at
    * map cost to gate a corpus). The weight table rides as a Catalyst
    * map literal (the ≤100k-term form of the worker-side model
    * broadcast); scoring is a row-local fold — no UDF, no shuffle, no
    * explode: `margin_milli = bias + Σ weight(word)` in integer milli
    * units, so any engine replays it bit-for-bit. `hits` counts the
    * in-vocabulary words (zero weights are disallowed so a hit is
    * unambiguous); gate on `margin_milli >= 0` or any threshold.
    */
  def linearClassifierScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weightsMilli: Seq[(String, Long)],
      biasMilli: Long = 0L
  ): DataFrame = {
    require(weightsMilli.nonEmpty && weightsMilli.forall(_._2 != 0L),
      "zero weights would make OOV indistinguishable from a hit")
    val m = map(weightsMilli.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.select(
      col(idCol),
      expr(s"size(filter(split($textCol, ' '), x -> x != ''))").cast("long").as("n_words"),
      size(filter(
        transform(expr(s"filter(split($textCol, ' '), x -> x != '')"),
          x => element_at(m, x)),
        w => w.isNotNull)).cast("long").as("hits"),
      (lit(biasMilli) + coalesce(
        aggregate(
          transform(expr(s"filter(split($textCol, ' '), x -> x != '')"),
            x => coalesce(element_at(m, x), lit(0L))),
          lit(0L), (acc, x) => acc + x),
        lit(0L))).as("margin_milli"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(wordsCol(textCol)).as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '${TokenRegex}', 0)")).as("re_tokens"))

  /** Repetition signals (boilerplate / low-quality detector): the
    * fraction of duplicated words and duplicated 3-word shingles.
    * Ratios are exact-integer IEEE divisions — bit-identical in any
    * engine. Row-local, no shuffle.
    */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = Dedup.shingleColOrdered(textCol)
    df.withColumn("__w", wordsCol(textCol))
      .withColumn("__sh", sh)
      .select(
        col(idCol),
        size(col("__w")).as("n_words"),
        size(array_distinct(col("__w"))).as("uniq_words"),
        ((size(col("__w")) - size(array_distinct(col("__w")))).cast("double") / size(col("__w")))
          .as("dup_word_ratio"),
        size(col("__sh")).as("n_shingles"),
        when(size(col("__sh")) > 0,
          (size(col("__sh")) - size(array_distinct(col("__sh")))).cast("double") / size(col("__sh")))
          .otherwise(lit(0.0)).as("dup_shingle_ratio"))
  }

  /** PII-ish scrub: count and redact emails, URLs, and long digit runs
    * (account-number shapes). Patterns avoid backslash classes (`[.]`
    * over `\.`) so Java regex and RE2-based oracles agree literally.
    * Row-local codegen regexps — linear scan at any scale.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val DigitRunRe = "[0-9]{2,}"

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      DigitRunRe, "<NUM>")
    df.select(
      col(idCol),
      size(expr(s"regexp_extract_all($textCol, '$EmailRe', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all($textCol, '$UrlRe', 0)")).as("n_urls"),
      size(expr(s"regexp_extract_all($textCol, '$DigitRunRe', 0)")).as("n_digit_runs"),
      length(redacted).as("redacted_len"))
  }

  /** Top-k distinctive terms per document, scored by tf * N / df — the
    * inverse-document-frequency weight without the log (every operation
    * is an exact integer or one IEEE division, so scores are
    * bit-deterministic across engines; the ranking is the same as
    * tf-idf's for a fixed tf). Two shuffles: the (doc, term) count and
    * the per-term document frequency. Only the one-row corpus count is
    * broadcast; the term↔docFreq join is left to AQE — `docFreq` has
    * one row per distinct term, which at corpus scale is billions of
    * rows and must NOT be forced into a broadcast (AQE still picks a
    * broadcast at small scale, and a shuffled hash join beyond it).
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(wordsCol(textCol)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy("term").agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    terms
      .join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df_t"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df_t"), col("score"), col("rank"))
  }

  /** Fixed-size document chunking with overlap — the window-splitting
    * step before tokenized training: each document becomes
    * ⌈n / (size - overlap)⌉-ish word chunks of up to `size` words,
    * consecutive chunks sharing `overlap` words. Entirely row-local
    * (sequence + slice + one explode) — no shuffle, linear at any
    * scale; chunk_id is the 0-based position so downstream packing is
    * deterministic.
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 40,
      overlap: Int = 10
  ): DataFrame = {
    require(chunkSize > overlap && overlap >= 0, s"need chunkSize > overlap >= 0")
    val step = chunkSize - overlap
    df.withColumn("__w", wordsCol(textCol))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, cast(floor((size(__w) - 1) / $step) as int)), " +
            s"i -> array_join(slice(__w, i * $step + 1, $chunkSize), ' '))"))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_words", size(split(col("chunk_text"), " ")))
  }

  /** Content-defined chunking (the FastCDC/rsync family shape): chunk
    * boundaries fall where a rolling hash of the last 3 tokens hits
    * `r % divisor == 0`, so boundaries are a function of local CONTENT,
    * not position — insert a paragraph at the top of a document and
    * every chunk after the next boundary is byte-identical to before,
    * which is what makes downstream chunk-level dedup/storage
    * incremental. (Fixed-size [[chunkDocs]] shifts every later chunk
    * on any insertion.) Expected chunk length ≈ `divisor` tokens.
    *
    * Determinism: token hashes are the repo's 60-bit md5 family mod
    * [[DedupConstants.P]]; the window fold is `h_i + 31·h_{i-1} +
    * 961·h_{i-2} (mod P)` — all under 2^42, exact in a long, and the
    * oracle replays it bit-for-bit.
    *
    * Scale shape: entirely row-local (hash array → boundary filter →
    * per-boundary struct transform → one posexplode); no shuffle, no
    * per-token rows materialized outside the generator, linear in
    * document length. The boundary list per doc is |tokens|/divisor —
    * tiny — and chunk texts are rebuilt by slicing the one token
    * array.
    */
  def chunkCdc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 16
  ): DataFrame = {
    val P = DedupConstants.P
    val th = // 60-bit md5 hash of one token, folded into [0, P)
      s"(t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % $P)"
    df.withColumn("__toks", wordsCol(textCol))
      .withColumn("__hs", expr(s"transform(__toks, $th)"))
      // boundary positions: i in [3, n] where the 3-token rolling hash
      // divides; the document end is always a boundary (dedup'd)
      // greatest(..., 3) keeps the sequence ascending for sub-3-token
      // docs (Spark's sequence(3, 1) would DESCEND); the i <= size
      // conjunct then empties it, matching DuckDB's empty series
      .withColumn("__b0", expr(
        s"""filter(sequence(3, greatest(size(__toks), 3)),
            i -> i <= size(__toks) AND
                 (element_at(__hs, i) + 31 * element_at(__hs, i - 1)
                  + 961 * element_at(__hs, i - 2)) % $P % $divisor = 0)"""))
      .withColumn("__b", expr(
        """CASE WHEN size(__b0) = 0 OR element_at(__b0, -1) <> size(__toks)
           THEN concat(__b0, array(size(__toks))) ELSE __b0 END"""))
      .select(col(idCol),
        col("__toks"),
        posexplode(expr(
          """transform(__b,
             (e, j) -> struct(CASE WHEN j = 0 THEN 1 ELSE element_at(__b, j) + 1 END AS s,
                              e AS e))"""))
          .as(Seq("__pos", "__c")))
      .select(col(idCol),
        (col("__pos") + 1).cast("int").as("chunk_idx"),
        (col("__c.e") - col("__c.s") + 1).cast("long").as("n_tokens"),
        expr("array_join(slice(__toks, __c.s, __c.e - __c.s + 1), ' ')").as("chunk_text"))
  }

  /** Winnowing document fingerprint (Schleimer et al.'s local algorithm
    * shape): hash k-word shingles (md5-derived, as the dedup family),
    * take the minimum in every sliding window of w consecutive shingle
    * positions, and keep the distinct minima. Emits the fingerprint-set
    * summary (count, min, max) — join-friendly for plagiarism-style
    * matching without shipping full sets.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.SketchExprs
    val p = DedupConstants.P
    // fully row-local: position-ordered shingle hashes (duplicates
    // kept — winnowing needs positions) then one WinnowMinExpr pass
    // for the complete-window minima. No explode, no window shuffle,
    // no regroup. (Evolution: per-output-column interpreted array
    // transforms 19 s → posexplode + two window passes + hash
    // aggregate ~2 s → native expression, map-only.)
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        SketchExprs.winnowMin(
          SketchExprs.hashShingles(Dedup.shingleColOrdered(textCol, FpShingle), p),
          FpWindow).as("fp"))
      .filter(size(col("fp")) > 0)
      .select(
        col(idCol),
        size(array_distinct(col("fp"))).cast("long").as("n_fp"),
        array_min(col("fp")).as("min_fp"),
        array_max(col("fp")).as("max_fp"))
  }
}
