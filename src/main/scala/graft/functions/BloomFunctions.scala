package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's bloom-filter expressions — the same
  * machinery AQE's InjectRuntimeFilter uses, exposed for EXPLICIT
  * bloom pre-filtering: build a compact sketch over a dimension's join
  * keys, ship it as a literal (what a runtime filter broadcasts), and
  * drop non-joining fact rows BEFORE the shuffle. At 100 TB this is
  * the difference between shuffling the whole fact table and shuffling
  * only its joinable fraction when the optimizer cannot prove the
  * filter itself (e.g. the dim predicate is data-dependent).
  *
  * Bloom contract: NO false negatives (every true match passes), small
  * false-positive rate (spurious rows survive to the exact join, which
  * discards them) — so the pre-filter never changes results.
  */
object BloomFunctions {

  /** Aggregate a LONG column into a bloom-filter sketch (binary). */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftShims.toColumn(
      new BloomFilterAggregate(
        GraftShims.toExpression(c),
        Literal(expectedItems), Literal(numBits), 0, 0)
        .toAggregateExpression())

  /** Membership probe of a LONG column against a sketch literal. */
  def mightContain(sketch: Array[Byte], c: Column): Column =
    GraftShims.toColumn(
      BloomFilterMightContain(
        Literal(sketch, BinaryType), GraftShims.toExpression(c)))

  /** Driver-side probe of a serialized sketch (the [[bloomAgg]] binary,
    * which is `org.apache.spark.util.sketch.BloomFilter.writeTo`
    * format) against one already-hashed LONG. `might_contain` the
    * EXPRESSION requires a constant sketch — per-row sketches (a
    * manifest's one-bloom-per-file column) are probed here instead,
    * on the coordinator, where file pruning happens anyway.
    */
  def mightContainSerialized(sketch: Array[Byte], hashed: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(sketch))
      .mightContainLong(hashed)
}
