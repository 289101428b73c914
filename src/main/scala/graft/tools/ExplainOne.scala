package graft.tools
import graft.{GraftSession, SparkEntry}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("===== toString =====")
    val plan = df.queryExecution.executedPlan.toString
    println(plan.take(3000))
    def n(sub: String) = plan.sliding(sub.length).count(_ == sub)
    println(s"[audit-one] bcast=${n("BroadcastHashJoin") + n("BroadcastNestedLoop")} " +
      s"smj=${n("SortMergeJoin")} xchg=${n("Exchange")} wscg=${n("*(")}")
    spark.stop()
  }
}
