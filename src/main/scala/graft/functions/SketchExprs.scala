package graft.functions

import graft.ext.DedupConstants
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Thread-local MD5 + 60-bit extraction shared by interpreted eval and
  * generated code. Equivalent to the SQL spelling
  * `cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)` — the first 60
  * bits of the digest, big-endian — which is also how every DuckDB
  * oracle derives its hashes, so all three paths agree bit-for-bit.
  */
object SketchHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val md = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (md(i) & 0xffL); i += 1 }
    (v << 4) | ((md(7) & 0xf0L) >>> 4)
  }
}

/** `array<string> -> array<long>`: the 60-bit md5 hash of each element,
  * reduced mod `m` (`m <= 0` keeps the raw 60-bit value). One codegen
  * loop per row — the row-local replacement for the explode + per-row
  * md5 projection (no row expansion, no interpreted higher-order
  * lambda).
  */
case class HashShinglesExpr(child: Expression, m: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = SketchHash.hash60(arr.getUTF8String(i).getBytes)
      out(i) = if (m > 0) h % m else h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val reduce = if (m > 0) s" % ${m}L" else ""
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.SketchHash.hash60($a.getUTF8String($i).getBytes())$reduce;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> -> array<long>`: the K MinHash slots — minima of the
  * affine families `(a_i * h + b_i) % P` from [[DedupConstants]] — in
  * ONE pass over the hash array. Row-local: at 100 TB, signatures are a
  * map-only projection (the old explode + 16-aggregate shape shuffled
  * (doc, hash) rows to group them back). Empty input yields an empty
  * array; callers filter.
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  import DedupConstants.{K, P}

  private val A: Array[Long] = Array.tabulate(K)(DedupConstants.a)
  private val B: Array[Long] = Array.tabulate(K)(DedupConstants.b)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val mins = Array.fill(K)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var j = 0
        while (j < K) {
          val v = (A(j) * h + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $mins;
         |if ($n == 0) {
         |  $mins = new long[0];
         |} else {
         |  $mins = new long[$K];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $K; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> -> long`: the SimHash fingerprint — per-bit majority
  * vote over the low [[DedupConstants.SimBits]] bits of each hash — in
  * one pass. Row-local replacement for the explode + 32-aggregate
  * shape. Empty input is the caller's responsibility (filter first).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  import DedupConstants.SimBits

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](SimBits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < SimBits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimBits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[$SimBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < $SimBits; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $SimBits; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> -> array<long>`: the minimum of every complete sliding
  * window of `w` consecutive elements, in position order — the
  * winnowing step (Schleimer et al.) as one row-local pass. Inputs
  * shorter than `w` yield an empty array (no complete window). Replaces
  * a posexplode + count-window + sliding-min-window + regroup pipeline
  * (two partition-wide window passes and a shuffle) for fingerprinting.
  */
case class WinnowMinExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - w + 1
    if (m <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var mn = arr.getLong(i)
        var j = 1
        while (j < w) { val v = arr.getLong(i + j); if (v < mn) mn = v; j += 1 }
        out(i) = mn
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mn = ctx.freshName("mn")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |int $m = $n - $w + 1;
         |long[] $out = ($m <= 0) ? new long[0] : new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $mn = $c.getLong($i);
         |  for (int $j = 1; $j < $w; $j++) {
         |    long $v = $c.getLong($i + $j);
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $out[$i] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExprs {
  /** md5-60-bit hash of each array element, mod m. */
  def hashShingles(shingles: Column, m: Long): Column =
    GraftShim.column(HashShinglesExpr(GraftShim.expression(shingles), m))

  /** K-slot MinHash signature of a hash array. */
  def minhashSig(hashes: Column): Column =
    GraftShim.column(MinHashSigExpr(GraftShim.expression(hashes)))

  /** SimHash fingerprint of a hash array. */
  def simhash(hashes: Column): Column =
    GraftShim.column(SimHashExpr(GraftShim.expression(hashes)))

  /** Sliding-window minima (winnowing) of a hash array. */
  def winnowMin(hashes: Column, w: Int): Column =
    GraftShim.column(WinnowMinExpr(GraftShim.expression(hashes), w))
}
