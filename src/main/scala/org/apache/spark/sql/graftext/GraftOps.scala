package org.apache.spark.sql.graftext

import graft.plans.AsOfJoin
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.{DataFrame, Row}

/** Bridge from the engine's custom logical operators into the public
  * Dataset API. Lives under org.apache.spark.sql because lifting a
  * LogicalPlan into a DataFrame (Dataset.ofRows) is private[sql] — the
  * standard extension-library pattern.
  */
object GraftOps {

  /** As-of join `left` to `right`: per left row, the latest right row
    * (by `rightTimeCol`, ties by `rightTieCol`) with time <= left time
    * in the same key group; left-outer semantics.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCol: String): DataFrame = {
    val l = left.asInstanceOf[Dataset[Row]]
    val r = right.asInstanceOf[Dataset[Row]]
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    // the physical operator unboxes keys/ties as Long and times as the
    // Long-backed timestamp — validate here, not with a mid-query CCE
    def requireType(a: Attribute, ok: Set[org.apache.spark.sql.types.DataType]): Attribute = {
      require(ok.contains(a.dataType), s"asofJoin column ${a.name} must be ${ok.mkString("/")}, got ${a.dataType}")
      a
    }
    def keyAttr(p: LogicalPlan, name: String) = requireType(attr(p, name), Set(LongType))
    def timeAttr(p: LogicalPlan, name: String) = requireType(attr(p, name), Set(LongType, TimestampType))
    Dataset.ofRows(
      l.sparkSession.asInstanceOf[SparkSession],
      AsOfJoin(
        lp, rp,
        keyAttr(lp, leftKeyCol), keyAttr(rp, rightKeyCol),
        timeAttr(lp, leftTimeCol), timeAttr(rp, rightTimeCol),
        keyAttr(rp, rightTieCol)))
  }

  /** Register the session's StateStoreCoordinator RPC endpoint (a
    * private[sql] lazy val on StreamingQueryManager). A streaming
    * query registers it as a side effect, but a session that ONLY
    * reads state (`format("statestore")` over an existing checkpoint —
    * the serving path) never starts one, and the state source's
    * provider lookup then dies with RpcEndpointNotFoundException.
    */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.asInstanceOf[SparkSession].streams.stateStoreCoordinator
    ()
  }
}
