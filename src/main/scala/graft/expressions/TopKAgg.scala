package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k buffer: a binary heap of (score, id) pairs with the
  * WORST element at the root, so inserting into a full buffer is one
  * compare + O(log k) sift. Score order is Spark's double total order
  * (`java.lang.Double.compare`: NaN greatest, -0.0 < 0.0), ties by
  * smaller id — exactly `row_number() over (order by score [asc|desc],
  * id asc)`.
  */
final class TopKBuffer(val k: Int, val asc: Boolean) {
  // Grown geometrically up to k: a "rank everything" call with a huge
  // k must not preallocate k slots per group.
  var scores = new Array[Double](math.min(k, 16))
  var ids = new Array[Long](math.min(k, 16))
  var size = 0

  private def ensureRoom(): Unit = if (size == scores.length && size < k) {
    val cap = math.min(k.toLong, scores.length * 2L).toInt
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  /** True iff (s1,i1) ranks strictly worse than (s2,i2). */
  @inline def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c > 0 else c < 0 } else i1 > i2
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  private def siftUp(start: Int): Unit = {
    var c = start
    while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
      swap(c, (c - 1) / 2); c = (c - 1) / 2
    }
  }

  private def siftDown(start: Int): Unit = {
    var p = start
    var done = false
    while (!done) {
      val l = 2 * p + 1; val r = l + 1
      var w = p
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == p) done = true else { swap(p, w); p = w }
    }
  }

  def insert(s: Double, i: Long): Unit = {
    if (size < k) {
      ensureRoom()
      scores(size) = s; ids(size) = i; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i; siftDown(0)
    }
  }

  /** Entries best-first — the `row_number` order. */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(j => (scores(j), ids(j))).toArray
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}

/** Per-group bounded top-k as a mergeable `TypedImperativeAggregate` —
  * the two-stage replacement for `row_number() over (partition by
  * q_id)` in scan-side top-k ranking.
  *
  * Why not the window: the window hash-partitions the ENTIRE scored
  * set (|corpus| × |queries| rows) on q_id, so with Q queries at most
  * Q reducers are active no matter the cluster size — the one
  * scale-killer the round-6 audit found in the brute-scan ANN paths.
  * This aggregate runs map-side (partial ObjectHashAggregate) on each
  * scan partition, keeping a k-bounded heap per query, so only
  * Q × k × partitions rows of (score, id) cross the exchange; the
  * final merge is Q tiny heap unions. Same output, shuffle volume
  * independent of corpus size.
  *
  * Output: `array<struct<id:bigint, score:double>>` sorted best-first
  * (posexplode position + 1 ≡ `row_number`). Ordering is score
  * asc/desc by Spark's double total order, ties by smaller id —
  * identical to `Window.orderBy(score, id)`, asserted hash-identical
  * to the window form in the e01/e13 oracle rows.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    scoreAsc: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.graftbridge.ScoreIdInputTypes {

  require(k >= 1, s"graft_topk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, scoreAsc)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < b2.size) { b1.insert(b2.scores(j), b2.ids(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s)): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var j = 0
    while (j < buf.size) {
      out.writeDouble(buf.scores(j)); out.writeLong(buf.ids(j)); j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k, scoreAsc)
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.insert(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}
