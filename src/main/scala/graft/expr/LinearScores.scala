package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen'd LINEAR-CLASSIFIER scoring — the actual fastText serving
  * architecture: the whole (bucket × class) weight table rides along as
  * ONE flat long[] reference (bounded: B·C entries — the same
  * bounded-broadcast contract as [[graft.operators.Bloom]]'s bitmap),
  * and each document's C class scores compute in a single native loop
  * over its tokens (unigram + bigram md5 buckets, weight adds). The
  * corpus pays ONE scan with ZERO exchanges for inference — no feature
  * explode, no (doc, bucket) aggregate, no model join; the only shuffle
  * left in [[graft.operators.Classifier.predictFused]] is whatever the
  * caller does with the scores.
  *
  * Scores are exact long sums in the same h60-bucket discipline as the
  * composable formulation — bit-identical results (ClassifierSpec).
  * Null array → null; null element → null.
  *
  * Output: array<long> of length nClasses.
  */
case class LinearScores(child: Expression, weights: Array[Long],
                        buckets: Int, nClasses: Int) extends UnaryExpression {

  require(buckets >= 2 && nClasses >= 1, s"bad dims ($buckets, $nClasses)")
  require(weights.length == buckets * nClasses,
    s"weights must be buckets*nClasses = ${buckets * nClasses} longs, got ${weights.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"linear_scores expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val words = new Array[Array[Byte]](n)
    i = 0
    while (i < n) { words(i) = arr.getUTF8String(i).getBytes; i += 1 }
    LinearScores.scoresOf(words, weights, buckets, nClasses)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      val cls = classOf[LinearScores].getName
      s"""
         |int $n = $a.numElements();
         |byte[][] $words = new byte[$n][];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $words[$i] = $a.getUTF8String($i).getBytes();
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $cls.scoresOf($words, $wRef, $buckets, $nClasses);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LinearScores =
    copy(child = newChild)

  // weights arrays are fat — keep them out of toString/explain output
  override def toString: String = s"linear_scores(${child.toString}, B=$buckets, C=$nClasses)"
}

object LinearScores {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** public + JVM-static-reachable: called from generated Java. */
  def scoresOf(words: Array[Array[Byte]], weights: Array[Long],
               buckets: Int, nClasses: Int): UnsafeArrayData = {
    val acc = new Array[Long](nClasses)
    val digest = md.get()
    def add(bucket: Int): Unit = {
      val base = bucket * nClasses
      var c = 0
      while (c < nClasses) { acc(c) += weights(base + c); c += 1 }
    }
    def h60(): Long = {
      val d = digest.digest()
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h >>> 4
    }
    val n = words.length
    var i = 0
    while (i < n) {
      digest.reset(); digest.update(words(i))
      add((h60() % buckets).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      digest.reset()
      digest.update(words(i)); digest.update('_'.toByte); digest.update(words(i + 1))
      add((h60() % buckets).toInt)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  /** Column-level entry point. */
  def linearScores(tokens: Column, weights: Array[Long],
                   buckets: Int, nClasses: Int): Column =
    Bridge.toColumn(LinearScores(Bridge.toExpression(tokens), weights, buckets, nClasses))
}
