package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join stress: injects a hot key that dwarfs the median
  * partition and verifies (a) the answer is exact and (b) AQE actually
  * split the skewed partition (the `isSkewJoin`/skew marker on the
  * sort-merge join). This is the safety net the catalog's fact-fact
  * joins rely on at 100 TB — `skew_salted_agg` covers aggregation
  * skew explicitly; this pins JOIN skew handling.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)

  test("AQE splits a skewed join partition and keeps the join exact") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k)).toMap
    // force a shuffle join (no broadcast escape hatch) and scale the
    // skew thresholds down so the test-sized hot key trips the splitter
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // a join feeding a same-key aggregation pins its partitioning, so
    // plain AQE declines to split (the split would need a re-shuffle);
    // this knob accepts that extra shuffle — at 100 TB the re-shuffle
    // costs minutes, an unsplit hot partition costs the whole job
    conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try {
      // 200k rows on ONE key + a uniform tail vs a small dimension:
      // the hot key's partition is ~1000x the median
      val left = spark
        .range(0, 220000)
        .select(
          when(col("id") < 200000, lit(7L)).otherwise(col("id") % 97).as("k"),
          (col("id") % 1000).as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"), (col("id") * 10).as("dim"))
      val joined = left.join(right, "k").groupBy(col("k")).agg(
        count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val rows = joined.collect()
      // exactness: the hot key keeps every one of its 200k rows
      val hot = rows.find(_.getAs[Long]("k") == 7L).get
      val expectedHot = 200000L + (200000L until 220000L).count(_ % 97 == 7)
      assert(hot.getAs[Long]("n") == expectedHot, s"hot-key count ${hot.getAs[Long]("n")} != $expectedHot")
      // the skew split must actually have fired
      val plan = joined.queryExecution.executedPlan.toString
      assert(
        plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"no skew-join marker in plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
