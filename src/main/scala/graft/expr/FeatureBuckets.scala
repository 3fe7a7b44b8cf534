package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen'd HASHED-FEATURE extraction for the linear classifier
  * ([[graft.operators.Classifier]]): word unigrams + adjacent-pair
  * bigrams ("a_b"), each md5-hashed to a bucket in [0, buckets), as ONE
  * native loop over the token array — replacing the interpreted
  * `zip_with(slice, slice)` bigram lambda plus per-feature
  * `conv(substring(md5(...)))` chain that dominated the classifier's
  * profile (the [[FixedDot]]/[[GearCuts]] story applied to feature
  * hashing).
  *
  * Bucket math is BIT-IDENTICAL to the Column formulation:
  * md5 of the feature's UTF-8 bytes, first 15 hex digits as a long
  * (== the digest's first 8 bytes, big-endian, >>> 4), mod buckets —
  * the engine-portable h60 discipline. Null array → null; null
  * elements are impossible from `tokens()` but poison to null for
  * contract fidelity.
  *
  * Output: array<long> of length max(2n−1, 0) — n unigram buckets then
  * n−1 bigram buckets.
  */
case class FeatureBuckets(child: Expression, buckets: Int) extends UnaryExpression {

  require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"feature_buckets expects array<string>, got $t")
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
    FeatureBuckets.bucketsOf(words, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      val cls = classOf[FeatureBuckets].getName
      s"""
         |int $n = $a.numElements();
         |byte[][] $words = new byte[$n][];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $words[$i] = $a.getUTF8String($i).getBytes();
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $cls.bucketsOf($words, $buckets);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeatureBuckets =
    copy(child = newChild)
}

object FeatureBuckets {

  /** Shared by eval and generated code: one md5 per unigram and per
    * bigram (word, '_', next word), digest head as a 60-bit long, mod
    * buckets. A thread-local digest instance — executors reuse it per
    * partition instead of allocating per feature.
    */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def h60(digest: java.security.MessageDigest): Long = {
    val d = digest.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** public + JVM-static-reachable: called from generated Java. */
  def bucketsOf(words: Array[Array[Byte]], buckets: Int): UnsafeArrayData = {
    val n = words.length
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](2 * n - 1)
    val digest = md.get()
    var i = 0
    while (i < n) {
      digest.reset(); digest.update(words(i))
      out(i) = h60(digest) % buckets
      i += 1
    }
    i = 0
    while (i < n - 1) {
      digest.reset()
      digest.update(words(i)); digest.update('_'.toByte); digest.update(words(i + 1))
      out(n + i) = h60(digest) % buckets
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-level entry point: `feature_buckets(tokens, buckets)`. */
  def featureBuckets(tokens: Column, buckets: Int): Column =
    Bridge.toColumn(FeatureBuckets(Bridge.toExpression(tokens), buckets))
}
