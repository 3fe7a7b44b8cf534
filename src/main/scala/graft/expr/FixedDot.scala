package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fused FIXED-POINT dot product over two `array<float>` columns:
  * per element, `floor(x·y·10⁹)` as a long, accumulated in a 64-bit
  * integer — EXACTLY the semantics of the composable
  * `aggregate(zip_with(...))` formulation in
  * [[graft.functions.VectorFns.dotFixed9]], but as one codegen'd
  * primitive loop (no intermediate array allocation, no interpreted
  * lambdas, inside whole-stage codegen — the [[FloatDot]] speedup,
  * ~4×, applied to the bit-reproducible tier the oracle-checked
  * similarity operators must use).
  *
  * Element math is double multiply → floor → long add: per-element
  * IEEE-identical in any engine and integer-associative after that, so
  * results are bit-equal to the HOF formulation and to the DuckDB
  * replays, under any partitioning.
  *
  * Element types: `array<float>` and `array<double>` (mixed allowed) —
  * per element everything widens to double first, exactly as the HOF
  * lambda's `cast("double")` did.
  *
  * Null semantics match the HOF formulation on EVERY input, so the two
  * are interchangeable: a null array yields null; unequal lengths yield
  * null (zip_with pads the shorter side with null → the sum is null);
  * a null ELEMENT on either side yields null (null product poisons the
  * aggregate). The engine's vectors are non-null fixed-width, so the
  * hot path never takes the null branches — they exist for contract
  * fidelity, not speed.
  */
case class FixedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def numericElem(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem(left.dataType) && numericElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fixed_dot expects array<float|double> on both sides, got (${left.dataType}, ${right.dataType})")

  private def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  // null even on non-null children: length mismatch / null element
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lDouble = isDouble(left.dataType); val rDouble = isDouble(right.dataType)
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += math.floor(xv * yv * 1e9).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(buf: String, idx: String, dbl: Boolean): String =
        if (dbl) s"$buf.getDouble($idx)" else s"((double) $buf.getFloat($idx))"
      val xs = get(a, i, isDouble(left.dataType))
      val ys = get(b, i, isDouble(right.dataType))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) java.lang.Math.floor($xs * $ys * 1.0E9);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): FixedDot =
    copy(left = newLeft, right = newRight)
}

object FixedDot {
  /** Column-level entry point: `fixed_dot(a, b)`. */
  def fixedDot(a: Column, b: Column): Column =
    Bridge.toColumn(FixedDot(Bridge.toExpression(a), Bridge.toExpression(b)))
}
