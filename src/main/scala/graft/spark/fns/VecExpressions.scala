package graft.spark.fns

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the embedding hot paths. The previous
  * cosine was a `zip_with` + `aggregate` expression chain — higher-order
  * functions run INTERPRETED per row (each element applies a lambda through
  * the expression evaluator), which made the O(corpus × queries) scoring
  * loops of brute-force/LSH/IVF ANN the bench's slowest stage after minhash.
  */
object VecKernels extends Serializable {

  /** Cosine similarity of two float32 vectors in double math, accumulating
    * left to right — the SAME operations in the SAME order as the old
    * zip_with/aggregate chain, so results are bit-identical (q_ann_topk's
    * rank parity with DuckDB depends on this). Callers guard equal lengths
    * (CosineF32Expr returns NULL on mismatch, like the old chain — NOT NaN,
    * which Spark orders ABOVE every number and would pass >= filters). */
  def cosineF32(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IEEE-754 double -> SIGNED long whose signed order equals the double's
    * numeric order (the standard sortable-bits transform: flip the low 63
    * bits when the sign bit is set). -0.0 normalizes to +0.0 FIRST — Spark
    * SQL comparisons and sorts treat them as equal, and the selection this
    * kernel feeds must rank them identically to an engine sort. NaN is NOT
    * ordered (maps above +Inf) — callers must not feed NaN keys. */
  def sortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }
}

/** `cosine_f32(array<float>, array<float>) -> double`, whole-stage
  * codegen'd via a single static call (no lambda interpretation, no
  * per-element boxing). */
case class CosineF32Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null else VecKernels.cosineF32(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.spark.fns.VecKernels.cosineF32($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_f32"
}

/** `sortable_double_bits(double) -> long`: order-preserving bit transform
  * (see [[VecKernels.sortableBits]]) — the key-discretization primitive of
  * the distributed exact top-k selection ([[graft.spark.sample.Sampling
  * .topKFlags]]): signed comparisons and arithmetic-shift bucket prefixes
  * of the result respect the double's numeric order. */
case class SortableDoubleBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    VecKernels.sortableBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.VecKernels.sortableBits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sortable_double_bits"
}

object VecExpressions {
  def cosineF32(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineF32Expr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sortableDoubleBits(c: Column): Column =
    GraftColumnBridge.column(SortableDoubleBitsExpr(GraftColumnBridge.expression(c)))
}
