package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float/double vector kernels for the similarity hot path.
  *
  * WHY custom Expressions (SURVEY §2.11 preference order): the dot
  * product IS expressible with built-ins —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — and that form stays the
  * oracle-documentation twin. But the HOF composition materializes the
  * zipped product array per row and walks generic ArrayData twice; for a
  * brute-force scan over N vectors × dim 64 the intermediate allocation
  * dominates. These are the (b)-tier custom scalar Expression case: one
  * fused loop over the two arrays, no intermediate, full whole-stage
  * codegen via a static kernel call (same structure as [[SimHash64]]).
  *
  * Bit-identical to the HOF composition by construction: elements are
  * widened to double and accumulated LEFT-TO-RIGHT from 0.0 — the same
  * IEEE operation order `aggregate` folds in — and the null semantics
  * match `zip_with`+`aggregate` exactly (length mismatch zips a null,
  * any null element poisons the sum → NULL result). VecMathSpec pins
  * equality on real embeddings and the null/ragged cases.
  *
  * Scale note: at 100 TB these run inside the scan's codegen stage, so
  * brute-force probe scans and LSH-candidate cosine verification stay
  * CPU-bound on the fused loop instead of allocation-bound.
  */
object VecMath {

  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def get(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Fused dot product; null (boxed) when lengths differ or any element
    * is null — the exact zip_with+aggregate semantics. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean)
      : java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, aFloat) * get(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Fused squared L2 norm; null when any element is null. */
  def normSq(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = get(a, i, aFloat)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column API: fused `aggregate(zip_with(a, b, _*_), 0d, _+_)`. */
  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Column API: fused squared norm (dot of a vector with itself). */
  def vecNormSq(a: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecNormSq(Bridge.expression(a)))
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecMath.isVec(left.dataType) && VecMath.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double>, got " +
        s"${left.dataType.simpleString(100)}, " +
        s"${right.dataType.simpleString(100)}")

  private def aFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def bFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
        java.lang.Double $r =
          graft.functions.VecMath.dot($a, $b, $aFloat, $bFloat);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

case class VecNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecMath.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm_sq requires array<float|double>, got " +
        child.dataType.simpleString(100))

  private def aFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any =
    VecMath.normSq(a.asInstanceOf[ArrayData], aFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("nsqRes")
      s"""
        java.lang.Double $r = graft.functions.VecMath.normSq($a, $aFloat);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : VecNormSq = copy(child = newChild)

  override def prettyName: String = "vec_norm_sq"
}
