package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd CONTENT-DEFINED-CHUNKING boundary scan: the exact
  * Gear/FastCDC cut rule of [[graft.operators.Chunking.cdcChunks]]
  * (h = 2h + gear[b] mod 2^30 over the UTF-8 bytes; cut after byte i
  * when h < 2^(30−maskBits); final cut at the text end) as ONE native
  * expression returning the cut positions `array<long>` — so the whole
  * chunking pipeline stays inside whole-stage codegen instead of
  * crossing the typed mapPartitions boundary (deserialize → Scala
  * iterator → re-serialize per row).
  *
  * Byte-identical to the imperative loop by construction (same gear
  * table object, same arithmetic — `CdcSpec` proves equality on real
  * corpus data). Empty/null input → empty array / null, matching the
  * mapPartitions variant's "no rows" behavior downstream.
  */
case class GearCuts(child: Expression, maskBits: Int) extends UnaryExpression {

  require(maskBits >= 2 && maskBits <= 20,
    s"maskBits must be in [2,20], got $maskBits")

  private val threshold = 1L << (30 - maskBits)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gear_cuts expects a string column, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val gear = graft.operators.Chunking.gearTable
    val buf = new Array[Long](n + 1)
    var m = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 2 + gear(bytes(i) & 0xff)) % (1L << 30)
      if (h < threshold) { buf(m) = i + 1; m += 1 }
      i += 1
    }
    if (m == 0 || buf(m - 1) != n) { buf(m) = n; m += 1 }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gearRef = ctx.addReferenceObj("gearTable",
      graft.operators.Chunking.gearTable, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $a.getBytes();
         |int $n = $b.length;
         |if ($n == 0) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $buf = new long[$n + 1];
         |  int $m = 0;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $h = ($h * 2 + $gearRef[$b[$i] & 0xff]) % 1073741824L;
         |    if ($h < ${threshold}L) { $buf[$m++] = $i + 1; }
         |  }
         |  if ($m == 0 || $buf[$m - 1] != $n) { $buf[$m++] = $n; }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $m));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GearCuts =
    copy(child = newChild)
}

object GearCuts {
  /** Column-level entry point: `gear_cuts(text, maskBits)`. */
  def gearCuts(text: Column, maskBits: Int): Column =
    Bridge.toColumn(GearCuts(Bridge.toExpression(text), maskBits))
}
