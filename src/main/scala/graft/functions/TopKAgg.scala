package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k set for [[TopKByScore]]: the k best (score, id) pairs
  * under (score DESC, id ASC), kept in a binary min-heap whose root is the
  * WORST retained pair — insertion against a full buffer is one root
  * comparison (O(1) reject for the common below-threshold row, O(log k)
  * replace otherwise). Memory: 16·k bytes + constant.
  */
final class TopKBuffer(val k: Int) {
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var n = 0

  /** Spark SQL's double ordering: NaN largest, -0.0 == 0.0. Plain `<` would
    * let NaN occupy heap slots irremovably; raw `Double.compare` would rank
    * -0.0 below 0.0 where the window-function twin ties them.
    */
  @inline private def cmp(sa: Double, sb: Double): Int =
    java.lang.Double.compare(if (sa == 0.0) 0.0 else sa, if (sb == 0.0) 0.0 else sb)

  /** a strictly worse than b under (score DESC, id ASC)? */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = cmp(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i // find the worst among node and children
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def add(score: Double, id: Long): Unit =
    if (n < k) { scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1) }
    else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Result rows, best first — same total order as [[worse]] (NaN largest,
    * -0.0 == 0.0).
    */
  def toArrayData: GenericArrayData = {
    val idx = (0 until n).sortWith { (a, b) =>
      val c = cmp(scores(a), scores(b))
      if (c != 0) c > 0 else ids(a) < ids(b)
    }
    new GenericArrayData(idx.map(i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i)))).toArray[Any])
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

/** Per-group exact top-k as a TYPED AGGREGATE: `topk_by_score(struct(score,
  * id), k)` → `array<struct<score,id>>`, best first, ties by ascending id.
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy(g)
  * .orderBy(...))` shuffles and SORTS every candidate row before discarding
  * all but k per group. The aggregate keeps a 16·k-byte heap per group,
  * combines map-side (partial heaps merge like any partial aggregate), and
  * only k rows per group ever cross the shuffle — at 100 TB the difference
  * between shuffling the corpus and shuffling k·|groups| rows.
  * Identical output contract to the window formulation (differential spec
  * pins it).
  */
case class TopKByScore(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {
  require(k > 0, "topk_by_score: k must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(fields)
        if fields.length == 2 && fields(0).dataType == DoubleType && fields(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // fail at ANALYSIS (clear message) instead of a runtime
        // ClassCastException in update() — the SQL-registered form accepts
        // any struct otherwise
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_by_score requires struct<score:double,id:bigint>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) b.add(r.getDouble(0), r.getLong(1))
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.mergeFrom(o); b }

  override def eval(b: TopKBuffer): Any = b.toArrayData

  override def serialize(b: TopKBuffer): Array[Byte] = b.serialize()

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val m = bb.getInt
    var i = 0
    while (i < m) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
}
