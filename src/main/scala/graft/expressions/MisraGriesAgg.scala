package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982, "Finding
  * repeated elements") as a mergeable `TypedImperativeAggregate`:
  * at most `k − 1` counters; any item whose true frequency exceeds
  * n/k is GUARANTEED to survive with counter ≥ freq − n/k, and the
  * merge operation preserves that ε = 1/k error bound across
  * arbitrary partitionings (Agarwal et al. 2013, "Mergeable
  * Summaries") — which is exactly what makes the two-phase
  * [[graft.operators.HeavyHitters]] pipeline's OUTPUT deterministic
  * even though the intermediate counter values are partition-order
  * dependent.
  *
  * Buffer is O(k) memory regardless of input size or cardinality —
  * the constant-memory substitute for a full groupBy at 100 TB.
  * Output: `array<struct<item, lower>>` sorted (lower desc, item asc);
  * `lower` is the surviving counter, a LOWER bound on the item's
  * frequency (within n/k of exact).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with org.apache.spark.sql.graftbridge.StringInputTypes {

  require(k >= 2 && k <= 100000, s"graft_misra_gries needs 2 <= k <= 1e5, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lower", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Shrink to ≤ k−1 counters by subtracting the k-th largest count
    * from every counter and dropping the non-positive — one step of
    * the MG decrement generalized to merges.
    */
  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k - 1) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - k + 1 - 1) // k-th largest
      val dead = buf.iterator
        .filter(_._2 <= d).map(_._1).toArray
      buf.mapValuesInPlace((_, c) => c - d)
      dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None =>
          buf(item) = 1L
          shrink(buf)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) =>
      b1(item) = b1.getOrElse(item, 0L) + c
    }
    shrink(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => out.writeUTF(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
