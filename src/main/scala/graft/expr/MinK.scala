package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer min-k aggregator over (hash, id) pairs, ordered
  * lexicographically by hash then id — the sampling dual of
  * [[TopKAggregator]]: per group, keep the k SMALLEST entries. Partial
  * buffers never exceed k entries and combine map-side, so a fixed-size
  * per-stratum sample costs one aggregation shuffle of k rows per
  * (partition, stratum) — no per-stratum full sort, no window spill on a
  * hot stratum (the failure mode of `row_number() OVER (PARTITION BY
  * stratum)` at 100 TB).
  */
final case class HashedId(hash: String, id: Long)

class MinKAggregator(k: Int) extends Aggregator[HashedId, Seq[HashedId], Seq[HashedId]] {
  require(k > 0)

  private def before(a: HashedId, b: HashedId): Boolean =
    a.hash < b.hash || (a.hash == b.hash && a.id < b.id)

  private def trim(buf: Seq[HashedId]): Seq[HashedId] =
    buf.sortWith(before).take(k)

  override def zero: Seq[HashedId] = Seq.empty

  override def reduce(buf: Seq[HashedId], x: HashedId): Seq[HashedId] =
    if (buf.size < k) trim(buf :+ x)
    else if (before(x, buf.last)) trim(buf.init :+ x)
    else buf

  override def merge(b1: Seq[HashedId], b2: Seq[HashedId]): Seq[HashedId] =
    trim(b1 ++ b2)

  override def finish(buf: Seq[HashedId]): Seq[HashedId] = trim(buf)

  override def bufferEncoder: Encoder[Seq[HashedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedId]]()

  override def outputEncoder: Encoder[Seq[HashedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedId]]()
}
