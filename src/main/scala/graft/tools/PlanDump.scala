package graft.tools

import graft.{GraftSession, SparkEntry}

/** Write `.explain("formatted")` for one or more catalog queries to
  * files (dev tool for the plans/r10/ before/after evidence).
  *
  *   sbt 'runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [dir]'
  *
  * Emits <outDir>/<query>_<suffix>.txt containing the formatted plan
  * (pre-execution, AQE initial plan) plus the executed-plan summary
  * counts (exchanges, join strategies, codegen spans) after a noop
  * run, so plan-shape claims are checkable from the files alone.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.local()
    val noCut = sys.env.get("SPARK_GRAFT_NO_CUT").contains("1")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = (if (noCut) "(SPARK_GRAFT_NO_CUT=1: Lineage.cut rendered as identity so " +
        "the full logical chain is visible; the production plan pins each cut)\n" else "") +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      def n(sub: String) = executed.sliding(sub.length).count(_ == sub)
      val summary =
        s"== Executed-plan summary (after noop run, AQE final) ==\n" +
          s"Exchange=${n("Exchange")} BroadcastHashJoin=${n("BroadcastHashJoin")} " +
          s"SortMergeJoin=${n("SortMergeJoin")} ShuffledHashJoin=${n("ShuffledHashJoin")} " +
          s"BroadcastNestedLoop=${n("BroadcastNestedLoop")} wscg=${n("*(")}\n"
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"),
        s"== $name @ $dir ==\n$summary\n$formatted")
      println(s"[plandump] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
