package graft.tools
import graft.{GraftSession, SparkEntry}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    println("===== toString =====")
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
