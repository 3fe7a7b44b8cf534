package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fused dot product over two `array<float>` columns, accumulating in
  * double — the throughput tier of the similarity stack (SURVEY §7.4:
  * "a native Catalyst Expression with doGenCode beats a Scala UDF").
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), …)`)
  * allocates an intermediate array per row and evaluates the lambdas
  * interpreted; this expression generates a single primitive loop over
  * the two `ArrayData` buffers — no allocation, no boxing, inside
  * whole-stage codegen. Use for scoring/ranking at scale; the
  * fixed-point [[graft.functions.VectorFns.dotFixed9]] remains the
  * bit-reproducible tier for oracle-checked results.
  *
  * Null ELEMENTS are not expected (embedding vectors are dense); a null
  * array yields null. Lengths may differ — the shorter prefix is used.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"float_dot expects (array<float>, array<float>), got ($l, $r)")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Column-level entry point: `float_dot(a, b)`. */
  def floatDot(a: Column, b: Column): Column =
    Bridge.toColumn(FloatDot(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Register `graft_dot` for SQL callers. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => FloatDot(exprs.head, exprs(1)), "scala_udf")
}
