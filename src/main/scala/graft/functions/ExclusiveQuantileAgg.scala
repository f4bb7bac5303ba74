package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Sorted-multiset buffer: contiguous sorted array with binary-search
  * insertion (memcpy shift). For the expanding window use-case inserts are
  * O(log n) search + O(n) shift — the shift is a single arraycopy, far
  * cheaper in practice than re-sorting a collected list per row.
  */
final class SortedBuf(var arr: Array[Double], var size: Int) {
  def insert(v: Double): Unit = {
    if (size == arr.length) {
      val next = new Array[Double](math.max(16, arr.length * 2))
      System.arraycopy(arr, 0, next, 0, size)
      arr = next
    }
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // total order (Double.compare), matching Arrays.sort: a primitive
      // '<' is always false against NaN, which inserted NaN at the FRONT
      // and let later values land before it — the buffer silently lost
      // sortedness and the interpolated order statistics diverged from
      // the Arrays.sort-based paths (SlidingQuantileWindowExec,
      // QuantileExactExclusive) on NaN-bearing input (r13 review)
      if (java.lang.Double.compare(arr(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    System.arraycopy(arr, lo, arr, lo + 1, size - lo)
    arr(lo) = v
    size += 1
  }
}

/** Exact exclusive quantile as a `TypedImperativeAggregate` — the
  * performant end-state for the EXPANDING no-lookahead quantile
  * (SURVEY.md §4.3.1b). Over a frame `ROWS BETWEEN UNBOUNDED PRECEDING
  * AND 1 PRECEDING` Spark's unbounded-preceding frame processor feeds
  * rows incrementally, so the sorted multiset is maintained across the
  * whole partition: O(n·shift) total instead of collect+sort per row
  * (O(n²·log n)). Also valid as a plain aggregate.
  *
  * NOT for sliding (rolling) frames: Spark rebuilds the buffer per row
  * there, making this O(w²)/row — the `slice(collect_list)` form stays
  * the right choice for rolling windows.
  *
  * Same semantics as [[QuantileExactExclusive]]: h = q·(n+1), endpoints
  * clamped, linear interpolation, NULLs skipped, empty → NULL.
  */
case class ExclusiveQuantileAgg(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortedBuf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "exclusive_quantile_agg"

  override def createAggregationBuffer(): SortedBuf =
    new SortedBuf(new Array[Double](16), 0)

  override def update(buf: SortedBuf, input: InternalRow): SortedBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: SortedBuf, other: SortedBuf): SortedBuf = {
    // both buffers are sorted: one linear two-pointer pass, not n×insert
    // (the window path never merges, but the grouped-aggregate path does,
    // where per-insert shifts would degrade toward O(n·m))
    if (other.size == 0) return buf
    val out = new Array[Double](buf.size + other.size)
    var i = 0; var j = 0; var k = 0
    while (i < buf.size && j < other.size) {
      // total order here too: primitive '<=' is false whenever EITHER
      // operand is NaN, so a NaN at the head of `other` (e.g. a partial
      // buffer holding only NaN) would jump the queue ahead of smaller
      // values and unsort the merged buffer (r13 review, same hole as
      // insert's)
      if (java.lang.Double.compare(buf.arr(i), other.arr(j)) <= 0) {
        out(k) = buf.arr(i); i += 1
      } else { out(k) = other.arr(j); j += 1 }
      k += 1
    }
    while (i < buf.size) { out(k) = buf.arr(i); i += 1; k += 1 }
    while (j < other.size) { out(k) = other.arr(j); j += 1; k += 1 }
    buf.arr = out
    buf.size = out.length
    buf
  }

  override def eval(buf: SortedBuf): Any = {
    val m = buf.size
    if (m == 0) null
    else {
      val h = q * (m + 1)
      if (h < 1.0) buf.arr(0)
      else if (h >= m) buf.arr(m - 1)
      else {
        val fh = math.floor(h)
        val idx = fh.toInt
        buf.arr(idx - 1) + (h - fh) * (buf.arr(idx) - buf.arr(idx - 1))
      }
    }
  }

  override def serialize(buf: SortedBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SortedBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(16, n))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new SortedBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExclusiveQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExclusiveQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExclusiveQuantileAgg =
    copy(child = newChildren.head)
}
