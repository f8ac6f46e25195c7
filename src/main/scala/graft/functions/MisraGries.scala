package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a native Catalyst aggregate — the
  * bounded-memory "find the frequent items without a full groupBy" operator
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12). Spark has no frequent-items aggregate expression
  * (DataFrameStatFunctions.freqItems is a whole-plan method, not composable
  * inside an agg), so this is the custom-Expression tier of the build
  * brief's preference order.
  *
  * Semantics: maintains at most `k` (item, count) counters. When an unseen
  * item arrives with all counters full, every counter is decremented by the
  * minimum of the k+1 candidate counts and zeros are dropped — the classic
  * guarantee follows: any item with true frequency > N/(k+1) over an
  * N-element stream is still present in the summary. `eval` returns ONLY
  * the candidate item array (lexicographically sorted): the counts are
  * undercounts and deliberately not exposed — callers re-count the ≤ k
  * candidates exactly (a broadcast-join-sized second pass) and threshold,
  * which makes the final heavy-hitter set EXACT and independent of
  * partitioning/merge order. That two-pass contract is what lets an
  * approximate sketch feed a hash-checkable deterministic query.
  *
  * Scale shape: one streaming pass, O(k) state per partial aggregate,
  * byte-serialized between map and reduce sides like any
  * TypedImperativeAggregate; merging two summaries is the same
  * decrement-reduce, so partials combine map-side. At 100 TB the full
  * groupBy alternative shuffles every distinct token; this ships 32 sketches
  * of k entries.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, "misra_gries requires k >= 1")

  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // SQL-registered: without this, a non-string column passes analysis and
  // every task dies with ClassCastException in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string column, got ${child.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** MG insert-then-reduce: after adding, if k+1 counters exist, subtract
    * the minimum count from all and drop zeros (removes at least the
    * minimum entry itself). Total decrement mass ≤ totalWeight/(k+1). */
  private def add(
      buf: mutable.HashMap[UTF8String, Long],
      key: UTF8String, inc: Long): Unit = {
    buf.updateWith(key) {
      case Some(c) => Some(c + inc)
      case None    => Some(inc)
    }
    if (buf.size > k) {
      val minC = buf.valuesIterator.min
      buf.filterInPlace((_, c) => c > minC)
      if (minC > 0) buf.mapValuesInPlace((_, c) => c - minC)
    }
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // input UTF8Strings may point into reused row buffers — copy before keying
    if (v != null) add(buf, v.asInstanceOf[UTF8String].copy(), 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) => add(buf, key, c) }
    buf
  }

  /** Candidate items only, lexicographically sorted (binary order) so the
    * array is identical however partials merged. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val arr: Array[AnyRef] = buf.keysIterator.toArray[AnyRef]
    java.util.Arrays.sort(arr) // UTF8String's natural (binary) order
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
