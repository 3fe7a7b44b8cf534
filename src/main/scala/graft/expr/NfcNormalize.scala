package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * canonicalization step a multilingual corpus needs before any
  * hash-based dedup (a composed "é" and its decomposed e+U+0301 form are
  * byte-different but the same text, so un-normalized corpora leak
  * duplicates past every fingerprint operator).
  *
  * Spark has no normalizer builtin; a Scala UDF would deserialize every
  * row out of Tungsten. This expression stays inside whole-stage codegen
  * (`doGenCode` emits a static call) and fast-paths the overwhelmingly
  * common case — text already in NFC (all-ASCII in particular) — by
  * returning the input buffer untouched, no allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects a string, got $t")
  }

  override def dataType: DataType = child.dataType

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static helper the generated code calls. Returns the INPUT buffer
    * when the text is already NFC — zero-copy on ASCII corpora.
    */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def nfcCol(c: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(c)))

  /** Register `graft_nfc` for SQL callers. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "scala_udf")
}
