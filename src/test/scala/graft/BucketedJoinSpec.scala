package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 evidence: bucketing both sides of the likes join on the
  * join key makes the join shuffle-free — the layout that turns the
  * engine's hottest fact-fact join into a local merge at 100 TB.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("bucketed layout removes the shuffle from the likes join") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS likes_b")
    spark.sql("DROP TABLE IF EXISTS posts_b")
    // the in-memory catalog can't see tables written by a previous JVM —
    // clear their warehouse locations on disk too
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("likes_b", "posts_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    Tables
      .lineitem(spark, dir)
      .select(col("l_suppkey").as("u"), col("l_partkey").as("p"))
      .write.bucketBy(8, "p").sortBy("p").saveAsTable("likes_b")
    Tables
      .part(spark, dir)
      .select(col("p_partkey").as("p"), col("p_name"))
      .write.bucketBy(8, "p").sortBy("p").saveAsTable("posts_b")

    // force the non-broadcast path so the bucket layout has to carry it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("likes_b").join(spark.table("posts_b"), "p")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    }
  }
}
