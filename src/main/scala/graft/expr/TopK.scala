package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer top-k aggregator (SURVEY §7.4): per group, keep the k
  * best (score, id) pairs. A `row_number() OVER (ORDER BY score)` window
  * sorts EVERY candidate of a group and spills for hot groups; this
  * aggregator carries at most k entries per partial buffer, combines
  * map-side, and never materializes the full candidate list — the shape
  * that survives a billion-candidate ANN verify stage.
  *
  * Deterministic total order: score descending, id ascending on ties.
  */
final case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(buf: Seq[Scored]): Seq[Scored] =
    buf.sortWith(better).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size < k) trim(buf :+ x)
    else if (better(x, buf.last)) trim(buf.init :+ x)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    trim(b1 ++ b2)

  override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
