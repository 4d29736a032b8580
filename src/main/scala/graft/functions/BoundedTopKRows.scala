package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Catalyst aggregate keeping the k first rows of each group under a
  * lexicographic sort-key order — the bounded-heap half of the
  * window-top-k rewrite ([[graft.plans.WindowTopKRule]]).
  *
  * `child` must be a struct `(key_0, …, key_{n-1}, payload)`: the first
  * `ascending.length` fields are the sort keys (per-key direction /
  * null placement in `ascending` / `nullsFirst`, mirroring the window's
  * `ORDER BY`), the last field carries the original row. The buffer
  * holds at most k rows, so Spark plans it as an ObjectHashAggregate
  * with a PARTIAL phase: each map task reduces its rows to ≤ k per key
  * before the shuffle — the two-phase shape that replaces the
  * all-rows-to-one-task window sort.
  *
  * Rows are stored as copied UnsafeRows: the evaluated struct's string
  * fields are views into the (reused) input buffer, so storing the raw
  * eval result would corrupt the heap one input row later.
  *
  * Ties on the full key tuple are broken arbitrarily — the same
  * non-determinism `row_number()` itself has under a non-total order.
  */
case class BoundedTopKRows(
    child: Expression,
    k: Int,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")
  require(ascending.length == nullsFirst.length)
  // The generic update path skips a null struct value outright. That is
  // unreachable from WindowTopKRule (CreateNamedStruct is never null),
  // and for any other caller silently dropping rows would diverge from
  // row_number() null-ordering semantics — so refuse nullable children.
  require(!child.nullable,
    "BoundedTopKRows requires a non-nullable struct child; a null struct " +
      "has no row_number() ranking to preserve")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val keyTypes: Array[DataType] =
    structType.fields.take(ascending.length).map(_.dataType)
  private lazy val keyOrderings: Array[Ordering[Any]] =
    keyTypes.map(dt =>
      TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]])
  private lazy val project = UnsafeProjection.create(structType)

  // Fast path: when the child is the rule-built CreateNamedStruct,
  // project its FIELD expressions with one codegen'd UnsafeProjection
  // straight off the input row — no interpreted struct eval, no
  // intermediate GenericInternalRow. (Lazy vals initialize on first
  // update, after the exec has bound the expression tree.)
  private lazy val fastProj: UnsafeProjection = child match {
    case s: CreateNamedStruct => UnsafeProjection.create(s.valExprs)
    case _ => null
  }

  /** The window's ORDER BY as a total preorder over stored rows. */
  private def compareRows(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < keyTypes.length) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      val c =
        if (an && bn) 0
        else if (an) { if (nullsFirst(i)) -1 else 1 }
        else if (bn) { if (nullsFirst(i)) 1 else -1 }
        else {
          val base = keyOrderings(i)
            .compare(a.get(i, keyTypes(i)), b.get(i, keyTypes(i)))
          if (ascending(i)) base else -base
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty

  /** Keep `buf` sorted best-first; O(1) reject once full. `row` may be
    * the projection's REUSED output — it is only copied on insertion,
    * so the (common) rejected row costs one compare and no allocation.
    */
  private def insert(
      buf: ArrayBuffer[InternalRow], row: InternalRow,
      needCopy: Boolean): ArrayBuffer[InternalRow] = {
    if (buf.length >= k && compareRows(row, buf.last) >= 0) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compareRows(buf(mid), row) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, if (needCopy) row.copy() else row)
    if (buf.length > k) buf.remove(k, buf.length - k)
    buf
  }

  override def update(
      buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    if (fastProj != null) insert(buf, fastProj(input), needCopy = true)
    else {
      val v = child.eval(input)
      if (v == null) buf
      else insert(buf, project(v.asInstanceOf[InternalRow]), needCopy = true)
    }
  }

  override def merge(
      buf: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    // rows in `other` are owned (deserialized or previously copied)
    other.foreach(insert(buf, _, needCopy = false))
    buf
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.length)
    buf.foreach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf += row
      i += 1
    }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "bounded_topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKRows =
    copy(child = newChild)
}
