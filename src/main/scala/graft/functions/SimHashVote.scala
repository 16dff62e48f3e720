package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-buffer SimHash aggregate: 32 per-bit ±1 vote counters in one
  * array buffer (vs 32 independent `sum(CASE …)` aggregates), folded to
  * the signature in `finish`. Bit-equal to the expression formulation in
  * the DuckDB oracle: bit j of the result is set iff the vote sum is
  * strictly positive. */
class SimHashVote(bits: Int) extends Aggregator[Long, Array[Long], Long] with Serializable {

  override def zero: Array[Long] = Array.fill(bits)(0L)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < bits) {
      buf(j) += (((h >> j) & 1L) * 2 - 1) // +1 if bit set, else -1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
