package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded smallest-K-per-group as a NATIVE Catalyst aggregate — the
  * zero-copy sibling of the typed `TopK.TopKAgg` Aggregator. The typed
  * version pays an encoder boundary: every input row is deserialized
  * into a Scala tuple before the buffer sees it, which measured ~3 s
  * over the 25M-row ADC join in `ann_topk_pq` (as much as the window
  * formulation it replaced). This TypedImperativeAggregate evaluates its
  * two child expressions directly against the InternalRow — no encoder,
  * no tuple allocation on the reject path — so the per-row cost is two
  * long reads and a K-element scan.
  *
  * Semantics: keeps the K smallest (dist, id) pairs in (dist ASC, id
  * ASC) order; `eval` returns array<struct<id, dist>> sorted ascending,
  * so `posexplode` yields ranks directly. O(K) state per partial buffer,
  * byte-serialized map→reduce like any TypedImperativeAggregate; merge
  * is the same bounded insert, so partials combine map-side and only
  * ≤ K·partitions rows per group ever reach the shuffle — the same
  * 100 TB story as TopKAgg, now without the serialization tax.
  */
case class TopKMinAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k >= 1, "topk_min requires k >= 1")

  override def prettyName: String = if (distinct) "topk_min_distinct" else "topk_min"
  override def children: Seq[Expression] = dist :: id :: Nil
  override def nullable: Boolean = false

  // SQL-registered, so analysis-time validation is the only thing between
  // a mistyped column and a per-task ClassCastException on executors
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (dist.dataType != LongType || id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_min requires (bigint dist, bigint id), got " +
          s"${dist.dataType.catalogString}, ${id.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("dist", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  /** (d1,i1) strictly worse (greater) than (d2,i2) in (dist, id) order. */
  @inline private def worse(d1: Long, i1: Long, d2: Long, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  private def add(buf: mutable.ArrayBuffer[(Long, Long)], d: Long, i: Long): Unit = {
    if (distinct) {
      // `topk_min_distinct`: one slot per id — a candidate that reaches
      // the same group through several index probes (multi-probe LSH,
      // multiple hash tables) must not occupy k slots. K and the buffer
      // are tiny, so a linear id scan beats any auxiliary set.
      var j = 0
      while (j < buf.size) {
        if (buf(j)._2 == i) {
          if (buf(j)._1 > d) buf(j) = ((d, i))
          return
        }
        j += 1
      }
    }
    if (buf.size < k) buf += ((d, i))
    else {
      // locate the current worst entry (K is small — linear scan beats
      // maintaining a heap for K ≈ 5)
      var wi = 0; var j = 1
      while (j < buf.size) {
        if (worse(buf(j)._1, buf(j)._2, buf(wi)._1, buf(wi)._2)) wi = j
        j += 1
      }
      if (worse(buf(wi)._1, buf(wi)._2, d, i)) buf(wi) = ((d, i))
    }
  }

  override def update(
      buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val dv = dist.eval(input)
    val iv = id.eval(input)
    if (dv != null && iv != null)
      add(buf, dv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Long, Long)],
      other: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    other.foreach { case (d, i) => add(buf, d, i) }
    buf
  }

  /** Ascending (dist, id) array of struct(id, dist) — rank = position. */
  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    val sorted = buf.sortBy(identity)
    new GenericArrayData(sorted.map { case (d, i) =>
      new GenericInternalRow(Array[Any](i, d))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (d, i) => out.writeLong(d); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren.head, id = newChildren(1))
}
