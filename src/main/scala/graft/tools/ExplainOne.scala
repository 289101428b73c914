package graft.tools
import graft.{GraftSession, SparkEntry}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("===== toString =====")
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
