package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints a one-line physical-plan audit per catalog query: whether the
  * scan has pushed filters, whether joins broadcast, whether top-k plans
  * as TakeOrderedAndProject, and how many exchanges (shuffles) the plan
  * has. Dev tool for the scale review in SURVEY.md §5.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // optional 2nd arg: comma-separated query names (incremental re-audit)
    val only: Set[String] = args.drop(1).headOption.map(_.split(',').toSet).getOrElse(Set.empty)
    val spark = GraftSession.local()
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => only(kv._1))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      // collect() executes df's OWN QueryExecution (a write would spawn
      // a fresh one), so AQE finalizes and codegen stages materialize
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def n(sub: String) = plan.sliding(sub.length).count(_ == sub)
      val flags = Seq(
        if (plan.contains("PushedFilters: [")
          && !plan.contains("PushedFilters: []")) "push" else "-",
        if (n("BroadcastHashJoin") + n("BroadcastNestedLoop") > 0)
          s"bcast=${n("BroadcastHashJoin") + n("BroadcastNestedLoop")}" else "-",
        if (n("SortMergeJoin") > 0) s"smj=${n("SortMergeJoin")}" else "-",
        if (plan.contains("TakeOrderedAndProject")) "topk" else "-",
        s"xchg=${n("Exchange")}",
        // codegen'd operators print with a "*(stageId)" prefix
        s"wscg=${n("*(")}",
        // advised vs configured shuffle partitions (Advisor): flags the
        // queries where the static knob is mis-sized for the input
        s"shufadv=${Advisor.advisedShufflePartitions(df)}/" +
          spark.conf.get("spark.sql.shuffle.partitions"))
      println(f"[audit] $name%-18s ${flags.mkString(" ")}")
    }
    spark.stop()
  }
}
