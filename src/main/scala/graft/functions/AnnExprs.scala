package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `array<double> -> array<long>`: all T random-hyperplane LSH bucket
  * keys of a vector in one fused pass — bucket t packs the sign bits of
  * the dot products with that table's planes. Row-local: replaces the
  * planes cross-join + grouped bit-sum (a corpus x (T x bits) row
  * expansion and one shuffle) with a map-only projection. The planes
  * array rides along as a referenced object (broadcast-sized: T x bits
  * x dim doubles).
  */
case class HyperplaneBucketsExpr(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val tables = planes.length
  @transient private lazy val bits = planes(0).length
  @transient private lazy val dim = planes(0)(0).length
  // flattened [t*bits*dim + b*dim + i] layout for tight codegen loops
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        System.arraycopy(planes(t)(b), 0, out, (t * bits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        val off = (t * bits + b) * dim
        var i = 0
        while (i < n) { s += v.getDouble(i) * flat(off + i); i += 1 }
        if (s >= 0) acc |= (1L << b)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $acc = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $s = 0.0;
         |    int $off = ($t * $bits + $b) * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $c.getDouble($i) * $flatRef[$off + $i];
         |    }
         |    if ($s >= 0) $acc |= (1L << $b);
         |  }
         |  $out[$t] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  // content-based equality (see MatVecExpr): Array fields compare by
  // reference under case-class equals, breaking canonicalization
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBucketsExpr => child == h.child &&
      planes.length == h.planes.length &&
      planes.indices.forall(t => planes(t).length == h.planes(t).length &&
        planes(t).indices.forall(b => java.util.Arrays.equals(planes(t)(b), h.planes(t)(b))))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      planes.map(_.map(java.util.Arrays.hashCode).toSeq).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> array<array<long>>`: per hash table, the vector's
  * QUERY-DIRECTED multi-probe key set (Lv et al., VLDB'07): the exact
  * bucket key first, then keys with 1, (if `depth >= 2`) 2, and (if
  * `depth >= 3`) 3 sign bits flipped — flips restricted to the `budget` bits with the SMALLEST
  * |margin| (dot product with the plane; ties to the lower bit index).
  * A near-duplicate pair disagrees exactly where one endpoint sits
  * close to a hyperplane, so flipping only low-margin bits buys most of
  * hamming<=2's recall at (1 + budget + C(budget,2)) probes per table
  * instead of (1 + bits + C(bits,2)) — the probe budget stays flat as
  * the corpus-adaptive signature widens. Row-local and fused with the
  * signature computation (one pass over the planes); the candidate
  * join downstream stays a pure equi-join on (t, key).
  */
case class HyperplaneProbeKeysExpr(
    child: Expression,
    planes: Array[Array[Array[Double]]],
    budget: Int,
    depth: Int)
    extends UnaryExpression {

  require(depth >= 1 && depth <= 3, s"probe depth must be 1..3, got $depth")

  @transient private lazy val tables = planes.length
  @transient private lazy val bits = planes(0).length
  @transient private lazy val dim = planes(0)(0).length
  @transient private lazy val m = math.min(budget, bits)
  @transient private lazy val nKeys = 1 + m +
    (if (depth >= 2) m * (m - 1) / 2 else 0) +
    (if (depth >= 3) m * (m - 1) * (m - 2) / 6 else 0)
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        System.arraycopy(planes(t)(b), 0, out, (t * bits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    out
  }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[AnyRef](tables)
    var t = 0
    while (t < tables) {
      val absm = new Array[Double](bits)
      var key = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        val off = (t * bits + b) * dim
        var i = 0
        while (i < n) { s += v.getDouble(i) * flat(off + i); i += 1 }
        if (s >= 0) key |= (1L << b)
        absm(b) = math.abs(s)
        b += 1
      }
      // m lowest |margin| bits; strict < keeps the LOWER index on ties
      val used = new Array[Boolean](bits)
      val sel = new Array[Int](m)
      var k = 0
      while (k < m) {
        var best = -1
        var bb = 0
        while (bb < bits) {
          if (!used(bb) && (best < 0 || absm(bb) < absm(best))) best = bb
          bb += 1
        }
        used(best) = true; sel(k) = best; k += 1
      }
      java.util.Arrays.sort(sel)
      val keys = new Array[Long](nKeys)
      var p = 0
      keys(p) = key; p += 1
      var a = 0
      while (a < m) { keys(p) = key ^ (1L << sel(a)); p += 1; a += 1 }
      if (depth >= 2) {
        var i = 0
        while (i < m) {
          var j = i + 1
          while (j < m) {
            keys(p) = key ^ (1L << sel(i)) ^ (1L << sel(j)); p += 1; j += 1
          }
          i += 1
        }
      }
      if (depth >= 3) {
        var i = 0
        while (i < m) {
          var j = i + 1
          while (j < m) {
            var l = j + 1
            while (l < m) {
              keys(p) = key ^ (1L << sel(i)) ^ (1L << sel(j)) ^ (1L << sel(l))
              p += 1; l += 1
            }
            j += 1
          }
          i += 1
        }
      }
      out(t) = new GenericArrayData(keys)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshProbePlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val key = ctx.freshName("key")
      val absm = ctx.freshName("absm")
      val used = ctx.freshName("used")
      val sel = ctx.freshName("sel")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val bb = ctx.freshName("bb")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val l = ctx.freshName("l")
      val depth2 = if (depth >= 2)
        s"""
           |for (int $i = 0; $i < $m; $i++) {
           |  for (int $j = $i + 1; $j < $m; $j++) {
           |    $keys[$p++] = $key ^ (1L << $sel[$i]) ^ (1L << $sel[$j]);
           |  }
           |}
         """.stripMargin
      else ""
      val depth3 = if (depth >= 3)
        s"""
           |for (int $i = 0; $i < $m; $i++) {
           |  for (int $j = $i + 1; $j < $m; $j++) {
           |    for (int $l = $j + 1; $l < $m; $l++) {
           |      $keys[$p++] = $key ^ (1L << $sel[$i]) ^ (1L << $sel[$j]) ^ (1L << $sel[$l]);
           |    }
           |  }
           |}
         """.stripMargin
      else ""
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |Object[] $out = new Object[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  double[] $absm = new double[$bits];
         |  long $key = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $s = 0.0;
         |    int $off = ($t * $bits + $b) * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $c.getDouble($i) * $flatRef[$off + $i];
         |    }
         |    if ($s >= 0) $key |= (1L << $b);
         |    $absm[$b] = java.lang.Math.abs($s);
         |  }
         |  boolean[] $used = new boolean[$bits];
         |  int[] $sel = new int[$m];
         |  for (int $k = 0; $k < $m; $k++) {
         |    int $best = -1;
         |    for (int $bb = 0; $bb < $bits; $bb++) {
         |      if (!$used[$bb] && ($best < 0 || $absm[$bb] < $absm[$best])) $best = $bb;
         |    }
         |    $used[$best] = true; $sel[$k] = $best;
         |  }
         |  java.util.Arrays.sort($sel);
         |  long[] $keys = new long[$nKeys];
         |  int $p = 0;
         |  $keys[$p++] = $key;
         |  for (int $i = 0; $i < $m; $i++) { $keys[$p++] = $key ^ (1L << $sel[$i]); }
         |  $depth2
         |  $depth3
         |  $out[$t] = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneProbeKeysExpr => child == h.child &&
      budget == h.budget && depth == h.depth &&
      planes.length == h.planes.length &&
      planes.indices.forall(t => planes(t).length == h.planes(t).length &&
        planes(t).indices.forall(b => java.util.Arrays.equals(planes(t)(b), h.planes(t)(b))))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + budget) + depth) +
      planes.map(_.map(java.util.Arrays.hashCode).toSeq).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> long`: the id of the nearest centroid (squared-L2,
  * ties to the smaller id — same order as `ORDER BY d ASC, list ASC`).
  * Row-local replacement for the centroid cross-join + rank-1 window
  * (which shuffled the whole corpus). Centroids ride along as referenced
  * objects; at 100 TB that is exactly the IVF contract (centroid table
  * broadcast, corpus map-partitioned).
  */
case class NearestCentroidExpr(
    child: Expression,
    centroidIds: Array[Long],
    centroids: Array[Array[Double]]
) extends UnaryExpression {

  @transient private lazy val k = centroids.length
  @transient private lazy val dim = if (k == 0) 0 else centroids(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var i = 0
    while (i < k) { System.arraycopy(centroids(i), 0, out, i * dim, dim); i += 1 }
    out
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var best = -1L
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      var d = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { val x = v.getDouble(i) - flat(off + i); d += x * x; i += 1 }
      if (d < bestD || (d == bestD && centroidIds(c) < best)) { bestD = d; best = centroidIds(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfCentroids", flat, "double[]")
    val idsRef = ctx.addReferenceObj("ivfCentroidIds", centroidIds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |long $best = -1L;
         |double $bestD = Double.MAX_VALUE;
         |for (int $ci = 0; $ci < $k; $ci++) {
         |  double $d = 0.0;
         |  int $off = $ci * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $c.getDouble($i) - $flatRef[$off + $i];
         |    $d += $x * $x;
         |  }
         |  if ($d < $bestD || ($d == $bestD && $idsRef[$ci] < $best)) {
         |    $bestD = $d; $best = $idsRef[$ci];
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  // content-based equality (see MatVecExpr)
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroidExpr => child == n.child &&
      java.util.Arrays.equals(centroidIds, n.centroidIds) &&
      centroids.length == n.centroids.length &&
      centroids.indices.forall(i => java.util.Arrays.equals(centroids(i), n.centroids(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(centroidIds)) +
      centroids.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> array<double>`: dense matrix-vector product —
  * `out[j] = Σ_i mat[j][i] * v[i]`, i ascending (the accumulation
  * order is part of the contract: the DuckDB oracle replays the same
  * left-to-right chain, so projections are bit-identical). Row-local
  * map-only projection; the matrix rides along as a referenced object
  * (outDim x dim doubles — broadcast-sized). Used for seeded
  * Johnson-Lindenstrauss dimensionality reduction.
  */
case class MatVecExpr(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val outDim = mat.length
  @transient private lazy val dim = if (outDim == 0) 0 else mat(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](outDim * dim)
    var j = 0
    while (j < outDim) { System.arraycopy(mat(j), 0, out, j * dim, dim); j += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      val off = j * dim
      var i = 0
      while (i < n) { s += v.getDouble(i) * flat(off + i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("projMat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |double[] $out = new double[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  double $s = 0.0;
         |  int $off = $j * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $c.getDouble($i) * $flatRef[$off + $i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  // content-based equality: the compiler-generated case-class equals
  // compares Array fields by reference, so two expressions built from
  // equal matrices never compare equal — defeating semanticEquals-based
  // subexpression elimination when the same projection is referenced
  // twice (ADVICE r5)
  override def equals(other: Any): Boolean = other match {
    case m: MatVecExpr => child == m.child && mat.length == m.mat.length &&
      mat.indices.forall(j => java.util.Arrays.equals(mat(j), m.mat(j)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + mat.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnnExprs {
  /** All T LSH bucket keys of a vector (cast to array<double>). */
  def lshBuckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftShim.column(HyperplaneBucketsExpr(
      GraftShim.expression(vec.cast("array<double>")), planes))

  /** Per table, the query-directed multi-probe key set (exact key +
    * low-margin flips up to `depth`).
    */
  def lshProbeKeys(vec: Column, planes: Array[Array[Array[Double]]],
      budget: Int, depth: Int): Column =
    GraftShim.column(HyperplaneProbeKeysExpr(
      GraftShim.expression(vec.cast("array<double>")), planes, budget, depth))

  /** Dense mat-vec projection (cast to array<double>). */
  def matVec(vec: Column, mat: Array[Array[Double]]): Column =
    GraftShim.column(MatVecExpr(
      GraftShim.expression(vec.cast("array<double>")), mat))

  /** Nearest centroid id by squared L2, ties to the smaller id. */
  def nearestCentroid(vec: Column, ids: Array[Long], centroids: Array[Array[Double]]): Column =
    GraftShim.column(NearestCentroidExpr(
      GraftShim.expression(vec.cast("array<double>")), ids, centroids))
}
