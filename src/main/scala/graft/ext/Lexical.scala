package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical corpus models: an n-gram language-model quality score (the
  * CCNet/KenLM-style "does this read like the corpus" filter) and a
  * BM25-family ranked retrieval probe (the lexical side of a training
  * -data search/decontamination stack).
  *
  * Repo-wide determinism rule: both operators keep every score in
  * integer MICRO units (`(a*1000000) div b` forms only), so shuffled
  * sums are exact, order-independent, and a SQL oracle replays them
  * bit-for-bit — no `log`/float whose libm rounding differs between
  * engines.
  */
object Lexical {

  /** Bigram-LM fluency score per document.
    *
    * Trains on the corpus itself (the CCNet recipe trains on a trusted
    * reference corpus — same plan, different input): unigram counts
    * c1(w), bigram counts c2(w1,w2), and each document scores the mean
    * conditional probability of its own bigrams,
    * `mean_i (c2(w_i, w_{i+1}) · 1e6) div c1(w_i)` — a rational
    * stand-in for perplexity (higher = more fluent/typical; low
    * scores flag gibberish and boilerplate, exactly what the LM
    * quality gate drops).
    *
    * Scale shape: bigram extraction is row-local (one `transform` over
    * the token array, no shuffle); the count tables are plain hash
    * aggregates; the score joins are VOCABULARY-keyed shuffle joins —
    * deliberately NOT broadcast (a corpus-scale n-gram table is the
    * tf-idf-broadcast mistake; AQE may still elect broadcast when the
    * vocab is provably small). Docs with fewer than 2 tokens are
    * dropped (no bigrams to score).
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = t.select(col("doc_id"), explode(expr(
      """transform(sequence(1, size(toks) - 1),
         i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))""")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = t.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bg.join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .select(col("doc_id"), expr("(c2 * 1000000) div c1").as("p_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_micro) div count(1)").as("lm_score_micro"))
  }

  /** Top-k adjacent-pair collocations by a PMI surrogate — the
    * classic "find multi-word expressions" pass (Church & Hanks 1990)
    * a corpus pipeline runs to build tokenizer merge candidates and
    * phrase vocabularies. True PMI is `log P(w1,w2)/(P(w1)P(w2))`;
    * ranking only needs the monotone rational core, so the score is
    * the integer `((c2·10^6) div c1(w1)) · N div c1(w2)` (N = total
    * tokens) — exact, order-independent, oracle-replayable. Bound:
    * the first factor is ≤ 10^6, so the product fits a signed long to
    * N ~ 9·10^12 tokens; beyond that keep the first factor in milli.
    *
    * Pairs rarer than `minCount` are dropped BEFORE the vocabulary
    * joins — at corpus scale that floor is what keeps the candidate
    * set (and the famously heavy-tailed bigram table) manageable.
    *
    * Scale shape: bigram extraction is row-local; counts are hash
    * aggregates; the c1 lookups are vocabulary-keyed shuffle joins
    * (NOT broadcast — same reasoning as [[bigramLmScore]]); the final
    * top-k is a TakeOrdered, never a global sort.
    */
  def pmiTopPairs(
      docs: DataFrame,
      textCol: String,
      minCount: Int,
      k: Int
  ): DataFrame = {
    val t = docs.select(split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val n = uni.agg(sum("c1").as("n_tokens"))
    val big = t.select(explode(expr(
      """transform(sequence(1, size(toks) - 1),
         i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))""")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    big
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c2"),
        expr("((c2 * 1000000) div c1a) * n_tokens div c1b").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** BM25-family top-k retrieval for a fixed bag of query terms.
    *
    * Same shape as Robertson–Spärck Jones BM25 (k1 = 1.2, b = 0.75)
    * with one documented deviation: idf is the RATIONAL surrogate
    * `(N − df + 0.5)/(df + 1)` in micro units rather than its log —
    * log is engine-libm-dependent and ranking only needs a monotone
    * df-penalty. All arithmetic is integer (milli/micro fixed-point).
    * (Bound: idf_micro·tfpart_micro must fit a signed 64-bit long —
    * fine to ~10^11 docs; beyond that keep idf in milli.)
    *
    * Scale shape: the explode is pruned to the query terms at the scan
    * (`isin` pushes through the generator), so per-doc cost is
    * O(matched terms), and the only corpus-scale shuffle is the
    * (doc, term) tf aggregate — exactly the posting-list build. A
    * standing search system materializes that tf table bucketed by
    * term (the inverted index); this operator is the same plan
    * downstream of the scan. df and the corpus stats are tiny
    * (|terms| rows / 1 row) and ride broadcasts.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int
  ): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"), expr("(sum_dl * 1000) div n_docs").as("avgdl_milli"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("norm_milli",
        expr("250 + (750 * ((dl * 1000000) div avgdl_milli)) div 1000"))
      .withColumn("tfpart_micro",
        expr("(tf * 2200 * 1000) div (tf * 1000 + (1200 * norm_milli) div 1000)"))
      .withColumn("idf_micro",
        expr("((n_docs - df) * 1000000 + 500000) div (df + 1)"))
      .select(col("doc_id"),
        expr("(idf_micro * tfpart_micro) div 1000000").as("s_micro"))
      .groupBy("doc_id")
      .agg(sum("s_micro").as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** CCNet-style per-language quality terciles (Wenzek et al., LREC
    * 2020, §4.4): score every document with the corpus bigram LM
    * ([[bigramLmScore]]), rank it WITHIN its language, and cut each
    * language's ranking into equal thirds — `head` (most fluent),
    * `middle`, `tail`. CCNet trains on head+middle and drops or
    * re-filters the tail; bucketing per language is the load-bearing
    * part (absolute LM scores are not comparable across languages, so
    * a global cut would silently drop whole low-resource languages).
    *
    * Scale shape: the within-language rank reuses
    * [[Pipeline.equiDepthBins]]'s two-phase prefix-sum, generalized to
    * a group key. `row_number() OVER (PARTITION BY lang ORDER BY
    * score)` would funnel each language through ONE task — and a
    * 100 TB crawl is mostly one language, so that hot partition IS the
    * corpus. Instead rows pre-bucket into coarse score blocks
    * (`score div blockWidth`), rank per (lang, block) in parallel, and
    * add the per-(lang, block) count prefix — a window over the tiny
    * (lang × blocks) count table, broadcast back. Ties (score, then
    * doc_id) make the cut total-order exact, so the bucket column
    * hashes bit-for-bit.
    */
  def ccnetBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      blockWidth: Long = 50000L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")), Seq("doc_id"))
    val b = scored.withColumn("__block", expr(s"lm_score_micro div $blockWidth"))
    // prefix over per-(lang, block) counts: rows = languages × blocks,
    // bounded; one window task per language over ~20 block rows
    val perLang = Window.partitionBy(col("lang")).orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = b.groupBy("lang", "__block").agg(count(lit(1)).as("__bcnt"))
      .withColumn("__bprefix", coalesce(sum(col("__bcnt")).over(perLang), lit(0L)))
    val totals = b.groupBy("lang").agg(count(lit(1)).as("__n"))
    val within = Window.partitionBy(col("lang"), col("__block"))
      .orderBy(col("lm_score_micro").asc, col("doc_id").asc)
    b.join(broadcast(prefixes.select("lang", "__block", "__bprefix")), Seq("lang", "__block"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("__rank", col("__bprefix") + row_number().over(within))
      .withColumn("ccnet_bucket",
        expr("""CASE ((__rank - 1) * 3) div __n
                WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END"""))
      .select(col("doc_id"), col("lang"), col("lm_score_micro"), col("ccnet_bucket"))
  }

  /** Integer floor-log2 of a positive BIGINT column expression —
    * `length(bin(x)) − 1` — the engine-exact logarithm both Spark and
    * DuckDB compute identically (binary-string length has no floating
    * point to round), used wherever a score needs log-scale shape
    * without libm. */
  private def flog2(c: String): Column = expr(s"length(bin($c + 1)) - 1").cast("long")

  /** DSIR importance weights (Xie et al., NeurIPS 2023): per-document
    * log importance ratio `log p_target(d) − log p_raw(d)` under
    * unigram bag-of-words LMs — the data-selection score that
    * resamples a raw crawl toward the distribution of a trusted
    * target corpus (the paper hashes n-gram features; whole unigrams
    * here keep the oracle readable, and a `hash(w) % B` on the token
    * column is the one-line change to the hashed variant).
    *
    * Per-token weight: `flog2(c_t(w)+1) − flog2(c_s(w)+1) +
    * flog2(N_s+1) − flog2(N_t+1)` with flog2(x) = length(bin(x)) − 1
    * — add-one-smoothed log-count ratios in EXACT integer floor-log2
    * space (documented coarsening: libm `ln` is not engine-exact, and
    * DSIR's selection only needs the ratio's scale, not its mantissa).
    * Document weight = Σ over its tokens; select by
    * `orderBy(dsir_logw desc, id)` + limit, or threshold.
    *
    * Scale shape: two hash-aggregate count tables; the ratio table is
    * VOCABULARY-keyed and joins the exploded corpus as a shuffle join
    * (the [[bigramLmScore]] doctrine — a corpus-scale vocab must not
    * broadcast; AQE still elects broadcast when it measures small);
    * the two totals are 1-row broadcasts. One corpus-keyed aggregate
    * produces the weights.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    def toks(df: DataFrame) =
      df.select(explode(split(col(textCol), " ")).as("w"))
    val srcCnt = toks(raw).groupBy("w").agg(count(lit(1)).as("c_s"))
    val tgtCnt = toks(target).groupBy("w").agg(count(lit(1)).as("c_t"))
    val nS = srcCnt.agg(sum("c_s").as("n_s"))
    val nT = tgtCnt.agg(sum("c_t").as("n_t"))
    val lr = srcCnt.join(tgtCnt, Seq("w"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(nS)).crossJoin(broadcast(nT))
      .select(col("w"),
        (flog2("c_t") - flog2("c_s") + flog2("n_s") - flog2("n_t")).as("lr"))
    raw.select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .join(lr, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr").as("dsir_logw"))
  }

  /** [[dsirWeights]] with HASHED features — the variant Xie et al.
    * actually run at scale (§2.2: n-gram features hashed into 10k
    * buckets). Tokens map to `hash60(w) mod buckets` (the repo's
    * portable 60-bit md5 prefix, engine-identical in DuckDB), so the
    * log-ratio table is FIXED-SIZE `buckets` rows regardless of
    * vocabulary — which flips the join doctrine: unlike the
    * whole-unigram ratio table (vocabulary-scale, must shuffle), a
    * few-thousand-row table is exactly what `broadcast()` is for, so
    * the per-token scoring join is a map-side broadcast join and the
    * only corpus-scale shuffle left is the per-doc aggregate.
    * Collisions fold rare features together — the paper's accepted
    * trade; the smoothed ratio arithmetic is unchanged.
    */
  def dsirWeightsHashed(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096
  ): DataFrame = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val bucketOf = expr(
      s"cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint) % $buckets")
    def feats(df: DataFrame) =
      df.select(explode(split(col(textCol), " ")).as("w")).select(bucketOf.as("f"))
    val srcCnt = feats(raw).groupBy("f").agg(count(lit(1)).as("c_s"))
    val tgtCnt = feats(target).groupBy("f").agg(count(lit(1)).as("c_t"))
    val nS = srcCnt.agg(sum("c_s").as("n_s"))
    val nT = tgtCnt.agg(sum("c_t").as("n_t"))
    val lr = srcCnt.join(tgtCnt, Seq("f"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(nS)).crossJoin(broadcast(nT))
      .select(col("f"),
        (flog2("c_t") - flog2("c_s") + flog2("n_s") - flog2("n_t")).as("lr"))
    raw.select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .select(col("doc_id"), bucketOf.as("f"))
      .join(broadcast(lr), Seq("f"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr").as("dsir_logw"))
  }
}
