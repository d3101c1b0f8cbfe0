package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class TextAnalysisSpec extends SparkSuite {

  private def docsOf(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("normalizeText canonicalizes case/punct/whitespace; variants collapse under exact dedup") {
    val df = docsOf(
      1L -> "Hello, World!",
      2L -> "hello   world",   // whitespace + case variant of 1
      3L -> "HELLO WORLD.",    // punctuation + case variant of 1
      4L -> "goodbye world")
    val norm = TextAnalysis.normalizeText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(norm(1L) == (("hello world", true)))
    assert(norm(2L) == (("hello world", true)))
    assert(norm(3L) == (("hello world", true)))
    assert(norm(4L) == (("goodbye world", false)))

    // raw exact dedup sees 4 distinct docs; normalized sees 2 groups
    val normed = df.withColumn("norm_text", TextAnalysis.normalizeTextCol("text"))
    val groups = graft.ext.Dedup.exact(normed, "doc_id", Seq("norm_text"))
      .collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups == Map(1L -> 3L, 4L -> 1L), s"got $groups")
  }

  test("Bpe greedy longest-match: hand-walked tokenizations") {
    // "theorem":  the|or|e|m          -> 4  ("theo" not in vocab, "the" is;
    //                                        then "or", then single chars)
    // "lighting": l|ight|ing          -> 3  (max-munch prefers the 4-char
    //                                        "ight" over 2-char "in" later)
    // runs of spaces produce empty words — filtered, not counted
    val df = docsOf(1L -> "theorem lighting", 2L -> "a  b", 3L -> "")
    val got = graft.ext.Bpe.bpeTokenCounts(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 7L)), s"got $got")
    assert(got(2L) == ((2L, 2L)), s"got $got")
    assert(got(3L) == ((0L, 0L)), s"got $got")
  }

  test("BpeTokenCountExpr carries a 20k-piece vocabulary through codegen") {
    // the inlined-CASE spelling this expression replaced generated one
    // SQL literal per piece and hit Janino's 64KB method ceiling in the
    // hundreds; the probe holds pieces as data, so vocab size must be
    // a non-event. CODEGEN_ONLY + fallback=false turn any silent
    // interpreted-mode fallback into a hard failure.
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val vocab = (1 to 20000).map { _ =>
      val len = 2 + rnd.nextInt(5)
      (1 to len).map(_ => alpha(rnd.nextInt(26))).mkString
    }.distinct
    // driver-side reference tokenizer: same greedy longest-match walk
    val pieceSet = vocab.toSet
    val lens = vocab.map(_.length).distinct.sorted.reverse
    def refCount(text: String): Long =
      text.split(" ", -1).filter(_.nonEmpty).map { w =>
        var p = 0; var n = 0L
        while (p < w.length) {
          val l = lens.find(l => p + l <= w.length && pieceSet(w.substring(p, p + l))).getOrElse(1)
          p += l; n += 1
        }
        n
      }.sum
    val texts = Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaabbbcccdddeee fffggghhh", 3L -> "", 4L -> "xy  zw")
    val df = docsOf(texts: _*)
    withSQLConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val got = df.select(col("doc_id"),
        graft.ext.Bpe.tokenCountCol("text", vocab).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.foreach { case (id, t) =>
        assert(got(id) == refCount(t), s"doc $id: got ${got(id)}, ref ${refCount(t)}")
      }
    }
    // structural equality: two instances over equal vocab seqs must be
    // equal (canonicalization requirement — vocab is Seq, not Array)
    import graft.functions.BpeTokenCountExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    val child = Literal.create("x", org.apache.spark.sql.types.StringType)
    assert(BpeTokenCountExpr(child, vocab) == BpeTokenCountExpr(child, vocab.toList))
  }

  test("Bpe.trainMerges learns the hand-computed merge sequence") {
    // corpus: "abab abab cd" ×1  → words: abab, abab, cd
    // round 1 pairs: ab×4, ba×2, cd×1  → merge (a,b) n=4
    // round 2 symbols: [ab,ab]×2, [c,d] → pairs: (ab,ab)×2, (c,d)×1
    //   → merge (ab,ab) n=2
    // round 3 symbols: [abab]×2, [c,d] → only (c,d)×1 → merge (c,d)
    val df = docsOf(1L -> "abab abab cd")
    val merges = graft.ext.Bpe.trainMerges(df, "doc_id", "text", rounds = 3)
    assert(merges == Seq(("a", "b", 4L), ("ab", "ab", 2L), ("c", "d", 1L)), merges.toString)
    // exhausted corpus (every word a single symbol): further rounds
    // return early without error
    val more = graft.ext.Bpe.trainMerges(df, "doc_id", "text", rounds = 10)
    assert(more.length == 3, s"dry after the 3 learnable merges: $more")
  }

  test("Bpe.trainMerges matches a driver-side reference trainer over 30 rounds") {
    // the incremental loop (carry symbol arrays, apply only the newest
    // merge, checkpoint) must learn the exact same table as the naive
    // reference algorithm; 30 rounds also exercises the constant-depth
    // claim — the old formulation's plan grew one nested fold per round
    val rnd = new scala.util.Random(7)
    val vocabWords = Seq("the", "theory", "other", "mother", "there",
      "aaaa", "abab", "banana", "cabbage", "deed", "needed", "feedee")
    val texts = (1 to 40).map { i =>
      i.toLong -> (1 to 12).map(_ => vocabWords(rnd.nextInt(vocabWords.length))).mkString(" ")
    }
    // driver-side reference: word-count dict, count pairs weighted,
    // tie-break (count desc, a asc, b asc), apply merge left-to-right
    var dict: Map[List[String], Long] = texts.flatMap(_._2.split(" "))
      .filter(_.length >= 2).groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.length.toLong }
    def refRound(): Option[(String, String, Long)] = {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n) }
      if (counts.isEmpty) None
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        dict = dict.toSeq.map { case (syms, n) =>
          val out = collection.mutable.ListBuffer.empty[String]
          var prev: String = null
          syms.foreach { x =>
            if (prev == null) prev = x
            else if (prev == a && x == b) prev = a + b
            else { out += prev; prev = x }
          }
          if (prev != null) out += prev
          out.toList -> n
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        dict = dict.filter(_._1.length >= 2)
        Some((a, b, c))
      }
    }
    val expected = Iterator.continually(refRound()).takeWhile(_.isDefined).map(_.get).take(30).toSeq
    val df = docsOf(texts: _*)
    val got = graft.ext.Bpe.trainMerges(df, "doc_id", "text", rounds = 30)
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("Bpe.pairCounts counts every adjacent char pair occurrence") {
    val df = docsOf(1L -> "aaa ab", 2L -> "ab x")
    // "aaa" → aa,aa ; "ab" → ab ; "ab" → ab ; "x" filtered (len 1)
    val got = graft.ext.Bpe.pairCounts(df, "doc_id", "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("aa", 2L), ("ab", 2L)), got.toString)
  }

  test("linearClassifierScore applies term weights as a row-local fold") {
    val w = Seq("good" -> 100L, "bad" -> -200L)
    val df = docsOf(1L -> "good good bad other", 2L -> "nothing matches here", 3L -> "")
    val got = TextAnalysis.linearClassifierScore(df, "doc_id", "text", w, biasMilli = 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 3L, 5L + 100L + 100L - 200L)), s"got $got")
    assert(got(2L) == ((3L, 0L, 5L)), s"got $got")
    assert(got(3L) == ((0L, 0L, 5L)), s"got $got")
  }

  test("langId scores markers and predicts with alphabetical tie-break") {
    val df = docsOf(
      1L -> "the cat and the dog sat in a box",       // en markers: the,a,and,in
      2L -> "der hund und die katze ist da",          // de markers
      3L -> "xyz qqq zzz")                            // no markers → tie → de
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("predicted_lang")).toSeq == Seq("en", "de", "de"))
    assert(got(0).getAs[Int]("score_en") == 5) // the×2, and, in, a
    assert(got(1).getAs[Int]("score_de") == 4)
  }

  test("qualityScore ratios") {
    val got = TextAnalysis.qualityScore(docsOf(1L -> "the the spark"), "doc_id", "text").collect()(0)
    assert(got.getAs[Int]("n_words") == 3)
    assert(got.getAs[Double]("stopword_ratio") == 0.6667)
    assert(got.getAs[Double]("uniq_ratio") == 0.6667)
    // (13 chars - 2 spaces) / 3 words
    assert(got.getAs[Double]("avg_word_len") == 3.6667)
  }

  test("tokenCounts: whitespace vs regex tokens") {
    val got = TextAnalysis.tokenCounts(docsOf(1L -> "ab3 c-d e99"), "doc_id", "text").collect()(0)
    assert(got.getAs[Int]("ws_tokens") == 3)
    // ab,3 | c,-,d | e,99 → 7
    assert(got.getAs[Int]("re_tokens") == 7)
  }

  test("fingerprint is stable and content-sensitive") {
    val base = "one two three four five six seven eight nine ten"
    val a = TextAnalysis.fingerprint(docsOf(1L -> base, 2L -> base), "doc_id", "text").collect()
    assert(a(0).getAs[Long]("n_fp") == a(1).getAs[Long]("n_fp"))
    assert(a(0).getAs[Long]("min_fp") == a(1).getAs[Long]("min_fp"))
    val b = TextAnalysis.fingerprint(
      docsOf(1L -> base, 2L -> base.replace("five", "FIVE")), "doc_id", "text").collect()
    assert(b(0).getAs[Long]("min_fp") != b(1).getAs[Long]("min_fp") ||
           b(0).getAs[Long]("max_fp") != b(1).getAs[Long]("max_fp") ||
           b(0).getAs[Long]("n_fp") != b(1).getAs[Long]("n_fp"))
  }

  test("fingerprint skips docs shorter than the window") {
    val got = TextAnalysis.fingerprint(docsOf(1L -> "too short text here"), "doc_id", "text")
    // 4 words → 2 shingles < window of 4 → filtered
    assert(got.count() == 0)
  }

  test("gopherFilter: each rule fires on its crafted document") {
    val docs = docsOf(
      1L -> "the data is in a table and the scan is fast so keep it whole here now",
      2L -> "- alpha\n- beta\n- gamma",        // every line bullet-started
      3L -> "so...\nmaybe...\nyes...\nplain",  // 3/4 lines ellipsis-ended
      4L -> "#### #### #### the of",           // symbol-heavy, low alpha
      5L -> "zz yy xx ww vv"                   // no stopwords
    )
    val rows = TextAnalysis.gopherFilter(docs, "doc_id", "text", minWords = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("bullet_ok") && !rows(2L).getAs[Boolean]("keep"))
    assert(!rows(3L).getAs[Boolean]("ellipsis_ok"))
    assert(!rows(4L).getAs[Boolean]("symbol_ok"))
    assert(!rows(4L).getAs[Boolean]("alpha_ok"))
    assert(rows(4L).getAs[Boolean]("stopword_ok")) // "the" + "of" = 2 hits
    assert(!rows(5L).getAs[Boolean]("stopword_ok"))
    assert(rows(5L).getAs[Boolean]("alpha_ok"))
    // keep is exactly the conjunction of the seven rule columns
    for ((_, r) <- rows) {
      val conj = Seq("word_count_ok", "mean_word_len_ok", "symbol_ok", "alpha_ok",
        "stopword_ok", "bullet_ok", "ellipsis_ok").forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == conj)
    }
  }

  test("chunkDocs: stride, overlap, and tail coverage") {
    import spark.implicits._
    val words = (0 until 100).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("id", "t")
    val got = graft.ext.TextAnalysis.chunkDocs(df, "id", "t", chunkSize = 40, overlap = 10)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_words")
      .as[(Int, String, Int)].collect()
    // starts 0, 30, 60, 90: three full 40-word chunks + a 10-word tail
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(got.map(_._3).toSeq == Seq(40, 40, 40, 10))
    assert(got(0)._2.startsWith("w0 ") && got(0)._2.endsWith(" w39"))
    assert(got(1)._2.startsWith("w30 ")) // 10-word overlap with chunk 0
    assert(got(3)._2 == (90 until 100).map(i => s"w$i").mkString(" "))
  }

  test("chunkCdc: chunks tile the document exactly; short docs are one chunk") {
    import spark.implicits._
    val words = (0 until 200).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "a b"), (3L, "solo")).toDF("id", "t")
    val got = TextAnalysis.chunkCdc(df, "id", "t", divisor = 16)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
    val d1 = got.filter(_._1 == 1L)
    // chunks reassemble the document exactly, indices are 1..k
    assert(d1.map(_._4).mkString(" ") == words.mkString(" "))
    assert(d1.map(_._2).toSeq == (1 to d1.length).toSeq)
    assert(d1.map(_._3).sum == 200L)
    assert(d1.length > 3, s"divisor 16 on 200 tokens should cut several chunks: ${d1.length}")
    // sub-3-token docs: single whole-doc chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 1, 2L, "a b")))
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 1, 1L, "solo")))
  }

  test("chunkCdc boundaries are content-defined: a head insertion leaves the tail chunks identical") {
    import spark.implicits._
    val words = (0 until 300).map(i => s"t${(i * 7919) % 101}")
    val base = words.mkString(" ")
    val shifted = "inserted tokens up front " + base
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "t")
    val chunks = TextAnalysis.chunkCdc(df, "id", "t", divisor = 16)
      .orderBy("id", "chunk_idx").select("id", "chunk_text")
      .as[(Long, String)].collect()
    val c1 = chunks.filter(_._1 == 1L).map(_._2)
    val c2 = chunks.filter(_._1 == 2L).map(_._2)
    // after the rolling hash resynchronizes (3-token window), every
    // later boundary depends only on content — the common tail of the
    // two chunk lists must cover most of the document
    val commonTail = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(commonTail >= c1.length - 2,
      s"fixed-size chunking would share NO chunks; CDC shares all but the head: " +
        s"$commonTail of ${c1.length}")
    // and the fixed-size control really does shift everything
    val fixed = TextAnalysis.chunkDocs(df, "id", "t", chunkSize = 16, overlap = 0)
      .select("id", "chunk_text").as[(Long, String)].collect()
    val f1 = fixed.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert(f1.intersect(f2).isEmpty, "control: fixed-size chunks all shift on insertion")
  }
}
