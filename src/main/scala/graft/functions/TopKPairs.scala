package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Bounded per-group top-k as a NATIVE aggregate (the scale form of
  * the posts_per_user limit): keeps the k best (score DESC, id ASC)
  * pairs in an O(k) buffer that merges map-side, where the window
  * row_number form must hash-exchange and fully SORT every group's
  * rows (a user with a million events sorts a million rows to keep 3).
  * Same family as Spark's own percentile/collect_list
  * (TypedImperativeAggregate → ObjectHashAggregate), so this is a
  * Catalyst expression in whole-plan aggregation, not a UDF — and
  * unlike collect_list-then-slice the partial state is bounded at k,
  * not the group size.
  *
  * Ordering contract (mirrors LimitPerKey's `value DESC, id ASC`):
  * a pair beats another on higher score, ties to the smaller id; the
  * output array is emitted in that order.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sorted-insert with O(1) early reject: a full buffer whose worst
    * entry beats the candidate never shifts anything.
    */
  private def insert(buf: ArrayBuffer[(Double, Long)], cand: (Double, Long)): Unit = {
    if (buf.length == k && beats(buf.last, cand)) return
    var i = buf.length
    buf.append(cand) // placeholder; shifted below
    while (i > 0 && beats(cand, buf(i - 1))) {
      buf(i) = buf(i - 1)
      i -= 1
    }
    buf(i) = cand
    if (buf.length > k) buf.remove(k)
    ()
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map(t => InternalRow(t._1, t._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](math.max(n, k) + 1)
    var i = 0
    while (i < n) { buf.append((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
