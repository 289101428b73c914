package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, attach the single right row
  * with the greatest (rightTime, rightTie) such that rightTime <=
  * leftTime within the same key group; unmatched left rows keep nulls
  * (LEFT OUTER as-of).
  *
  * This is the operator form of the reference's "latest prior state"
  * lookups; Spark lacks it natively (the compositional fallback — range
  * join + row_number, see Analytics.asofJoin — materializes every
  * candidate pair). This physical operator is a streaming merge: both
  * sides hash-partitioned by key and sorted by (key, time), O(1) state
  * per partition, no candidate blow-up — the shape that survives 100 TB.
  *
  * Key and tie expressions must be LongType; time may be any type whose
  * eval is a Long (TimestampType micros included).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

/** Planner rule mapping the logical node to its physical form
  * (registered via GraftSession / GraftExtensions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides co-partitioned on the key with a pinned partition count
    * (pinning keeps AQE from coalescing the two exchanges differently,
    * which would break the one-to-one zip below).
    */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = n) :: Nil
  }

  /** Sorted merge order: key, then event time; the right side also
    * sorts the tie-break column so "last consumed" == "greatest
    * (time, tie)" — the deterministic winner.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val nRightCols = right.output.length

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      // SparkPlan contract: doExecute output must be UnsafeRow (consumers
      // like getByteArrayRdd / shuffle / sort cast unconditionally)
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRight = new GenericInternalRow(nRightCols)
      // O(1) merge state: the best-so-far anchor for the current key
      var lastAnchor: InternalRow = null
      var lastAnchorKey: Long = 0L

      lIter.map { lRow =>
        val kRaw = lKeyB.eval(lRow)
        val tRaw = lTimeB.eval(lRow)
        if (kRaw == null || tRaw == null) {
          // SQL join semantics: null keys/times never match
          toUnsafe(joined(lRow, nullRight))
        } else {
          val k = kRaw.asInstanceOf[Long]
          val t = tRaw.asInstanceOf[Long]
          // consume right rows up to (k, t]; remember the last one of key k
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rkRaw = rKeyB.eval(head)
            val rtRaw = if (rkRaw == null) null else rTimeB.eval(head)
            if (rkRaw == null || rtRaw == null) {
              rBuf.next() // null-keyed/timed anchors can never match — skip
            } else {
              val rk = rkRaw.asInstanceOf[Long]
              if (rk < k || (rk == k && rtRaw.asInstanceOf[Long] <= t)) {
                val consumed = rBuf.next()
                if (rk == k) {
                  lastAnchor = consumed.copy()
                  lastAnchorKey = rk
                }
              } else advancing = false
            }
          }
          if (lastAnchor != null && lastAnchorKey == k) toUnsafe(joined(lRow, lastAnchor))
          else toUnsafe(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
