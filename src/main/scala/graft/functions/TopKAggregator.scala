package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One scored candidate: an id and its score. */
case class ScoredId(id: Long, score: Double)

/** Bounded top-k as a typed `Aggregator` — the two-phase top-k pattern
  * for distributed ranking (and the library's UDAF surface, SURVEY.md §2
  * row 19).
  *
  * Used as `groupBy(key).agg(topK(id, score))`, Spark plans it as an
  * ObjectHashAggregate with partial aggregation: every partition reduces
  * its rows into a local k-bounded buffer (map-side), the shuffle moves at
  * most k rows per partition per key, and the final merge combines the
  * per-partition buffers. Contrast with
  * `row_number().over(Window.partitionBy(key))`, which funnels EVERY
  * scored row for a key into one task — a straggler/OOM at 100 TB.
  *
  * Ordering: score descending, id ascending on ties — the buffer is kept
  * sorted, so `finish` emits the ranked top-k directly.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  // java.lang.Double.compare gives a total order (NaN greatest, matching
  // Spark SQL's ordering) — raw > / == would treat a NaN score (e.g.
  // cosine of a zero-norm vector) inconsistently between the buffer-full
  // and buffer-filling paths
  private def beats(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.lengthCompare(k) >= 0 && !beats(x, buf.last)) buf
    else {
      val (better, rest) = buf.span(beats(_, x))
      (better ++ (x +: rest)).take(k)
    }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    insert(buf, x)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregator {

  /** Untyped entry point: `df.groupBy(key).agg(topK(idCol, scoreCol))`
    * returns `array<struct<id,score>>` ranked best-first.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId])
}
