package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable greedy longest-match probe over a BPE/WordPiece merge
  * vocabulary: a hash set of pieces plus the distinct piece lengths in
  * descending order. The vocabulary rides to executors as ONE broadcast
  * object (Catalyst reference object), so probe cost per cursor position
  * is O(distinct piece lengths) hash lookups — independent of vocabulary
  * SIZE. This is what lets tokenizer-apply carry a real 30k–100k-piece
  * merge table: the inlined SQL CASE/IN spelling it replaces generates
  * one literal per piece and hits Janino's 64 KB method ceiling somewhere
  * in the hundreds.
  *
  * Word semantics match `filter(split(text, ' '), x -> x != '')`: words
  * are maximal runs of non-space characters (0x20 only), empty words
  * never produced. Matching is by Java chars; identical to the SQL
  * substring walk for any ASCII vocabulary (the oracle's domain).
  */
final class BpeProbe(vocab: Array[String]) extends Serializable {
  private val pieces = {
    val s = new java.util.HashSet[String](math.max(16, vocab.length * 2))
    vocab.foreach { p => if (p.length >= 2) s.add(p) }
    s
  }
  // candidate lengths, longest first; single chars are the implicit
  // fallback alphabet so they never need probing
  private val lengths: Array[Int] =
    vocab.map(_.length).filter(_ >= 2).distinct.sortBy(-_).toArray

  /** Greedy piece length at `start` within word [wordStart, wordEnd):
    * longest candidate whose full extent fits and matches; else 1. */
  private def pieceLenAt(s: String, start: Int, wordEnd: Int): Int = {
    var li = 0
    while (li < lengths.length) {
      val len = lengths(li)
      if (start + len <= wordEnd && pieces.contains(s.substring(start, start + len)))
        return len
      li += 1
    }
    1
  }

  /** Total subword-token count of the space-split text under greedy
    * longest-match. Called from generated code (one static-shaped call
    * per row — stays inside whole-stage codegen). */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var ntok = 0L
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var end = i
        while (end < n && s.charAt(end) != ' ') end += 1
        var p = i
        while (p < end) { p += pieceLenAt(s, p, end); ntok += 1 }
        i = end
      }
    }
    ntok
  }
}

/** `string -> bigint`: subword-token count of the text under greedy
  * longest-match over `vocab` — the native-expression form of
  * [[graft.ext.Bpe.tokenCountCol]]'s cursor walk, with the vocabulary
  * held as DATA on a reference object instead of inlined SQL literals.
  *
  * `vocab` stays a `Seq[String]`, so case-class equality/canonicalization
  * is structural for free (the Array-field pitfall MatVecExpr documents
  * does not arise); the probe table is built lazily per (de)serialized
  * instance and shipped once per task binary, not once per row.
  */
case class BpeTokenCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val probe = new BpeProbe(vocab.toArray)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    probe.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("bpeProbe", probe, classOf[BpeProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $probeRef.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCountExpr {
  def tokenCount(text: Column, vocab: Seq[String]): Column =
    GraftShim.column(BpeTokenCountExpr(
      GraftShim.expression(text.cast("string")), vocab))
}
