package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Compiled replacements for the remaining interpreted higher-order
  * vector expressions in the ANN/dedup hot paths (guide §4: eliminate
  * non-codegen expressions in the hot path). Each mirrors its HOF
  * spelling's accumulation ORDER exactly — same sequential
  * left-to-right IEEE fold — so results are bit-identical to the HOF
  * form and to the DuckDB oracles (the [[DotProductExpr]] contract).
  * Like [[DotProductExpr]], unequal lengths clamp to the shorter side;
  * every caller feeds equal-dimension arrays.
  */
object VecExprs {

  /** Squared L2 distance — compiled [[VectorOps.l2sq]]:
    * `Σ_i (a_i − b_i)²`, i ascending, each squared diff computed then
    * added (the `aggregate(zip_with(...))` order).
    */
  def l2sq(a: Column, b: Column): Column =
    GraftShim.column(L2SqExpr(
      GraftShim.expression(a.cast("array<double>")),
      GraftShim.expression(b.cast("array<double>"))))

  /** Compiled [[VectorOps.l2normalize]]: `x_i / ‖x‖` with zero-norm
    * rows mapping to all-zero (the `when(n === 0, 0.0)` guard). The
    * norm is `sqrt(Σ x_i²)` with the same ascending accumulation as
    * [[DotProductExpr.dot]], and the per-element division is the same
    * single IEEE op — the interpreted form re-evaluated the norm
    * subtree PER ELEMENT (dim × dim multiplies per row).
    */
  def l2normalize(a: Column): Column =
    GraftShim.column(L2NormalizeExpr(
      GraftShim.expression(a.cast("array<double>"))))

  /** Compiled PQ query distance table: for each codeword c of
    * `codebook`, `out[c] = Σ_i (x_i − cb[c][i])²` — the
    * `transform(cbLit, cw => aggregate(zip_with(sub, cw, (x,c) →
    * (x−c)·(x−c)), 0.0, acc+v))` spelling, which evaluated ks × dim
    * interpreted lambdas per query row.
    */
  def pqDistTable(sub: Column, codebook: Array[Array[Double]]): Column =
    GraftShim.column(PqDistTableExpr(
      GraftShim.expression(sub.cast("array<double>")), codebook))

  /** Compiled MinHash signature agreement count: the number of equal
    * slots of two `array<bigint>` signatures, as a double — the
    * `aggregate(zip_with(a, b, CASE WHEN p=q THEN 1.0 ELSE 0.0), 0.0,
    * acc+v)` spelling. Sums of 0.0/1.0 are exact integers in double,
    * and the ascending order matches the HOF fold.
    */
  def slotAgree(a: Column, b: Column): Column =
    GraftShim.column(SlotAgreeExpr(
      GraftShim.expression(a.cast("array<bigint>")),
      GraftShim.expression(b.cast("array<bigint>"))))
}

/** See [[VecExprs.l2sq]]. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("l2N")
      val s = ctx.freshName("l2S")
      val i = ctx.freshName("l2I")
      val d = ctx.freshName("l2D")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** See [[VecExprs.l2normalize]]. */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    val nm = math.sqrt(s)
    val out = new Array[Double](n)
    if (nm != 0.0) { i = 0; while (i < n) { out(i) = x.getDouble(i) / nm; i += 1 } }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("nrmN")
      val s = ctx.freshName("nrmS")
      val i = ctx.freshName("nrmI")
      val v = ctx.freshName("nrmV")
      val nm = ctx.freshName("nrm")
      val out = ctx.freshName("nrmOut")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |double $nm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |if ($nm != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $a.getDouble($i) / $nm; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[VecExprs.pqDistTable]]. */
case class PqDistTableExpr(child: Expression, codebook: Array[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val ks = codebook.length
  @transient private lazy val dim = if (ks == 0) 0 else codebook(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](ks * dim)
    var c = 0
    while (c < ks) { System.arraycopy(codebook(c), 0, out, c * dim, dim); c += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val out = new Array[Double](ks)
    var c = 0
    while (c < ks) {
      var s = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { val d = x.getDouble(i) - flat(off + i); s += d * d; i += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqBook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("pqN")
      val out = ctx.freshName("pqOut")
      val c = ctx.freshName("pqC")
      val s = ctx.freshName("pqS")
      val off = ctx.freshName("pqOff")
      val i = ctx.freshName("pqI")
      val d = ctx.freshName("pqD")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $out = new double[$ks];
         |for (int $c = 0; $c < $ks; $c++) {
         |  double $s = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $flatRef[$off + $i];
         |    $s += $d * $d;
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  // content-based equality over the codebook (see NearestCentroidExpr:
  // reference equality on Array fields defeats canonicalization and
  // common-subexpression elimination)
  override def equals(other: Any): Boolean = other match {
    case p: PqDistTableExpr => child == p.child &&
      codebook.length == p.codebook.length &&
      codebook.indices.forall(i => java.util.Arrays.equals(codebook(i), p.codebook(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + codebook.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[VecExprs.slotAgree]]. */
case class SlotAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) s += 1.0; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("agN")
      val s = ctx.freshName("agS")
      val i = ctx.freshName("agI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $s += 1.0;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
