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

  test("viral post: 100k likers through both like-graph two-hops, answers exact") {
    // the batch mirror of the likesGraphStream 100k-liker pin: one post
    // with 100k likers (users 0-9 also like posts 1-10) must flow
    // through likes_weighted / likes_bylikers without a hot-key blowup
    // and with byte-exact scores (computed here by the same
    // round-then-decimal-sum arithmetic the engine declares)
    import java.math.{BigDecimal => JBD}
    import java.math.RoundingMode.HALF_UP
    val fans = spark.range(0, 100000).select(col("id").as("u"), lit(999L).as("p"))
    val smalls = spark.range(0, 10).select(col("id").as("u"))
      .crossJoin(spark.range(1, 11).select(col("id").as("p")))
    val likes = fans.unionByName(smalls)

    def r10(x: Double) = JBD.valueOf(x).setScale(10, HALF_UP)
    def times(w: JBD, n: Long) = w.multiply(JBD.valueOf(n))
    def emit8(x: JBD) = x.setScale(8, HALF_UP).doubleValue

    // ---- likes_weighted: weight(u) = 1/(5 + n_likes(u))
    // users 0-9 hold 11 edges (w = 1/16); users 10-99999 hold one (1/6)
    val weighted = queries.FeedBlocks.likesWeightedOver(likes).collect()
    val viralScore = emit8(times(r10(1.0 / 16), 10).add(times(r10(1.0 / 6), 99990)))
    val smallScore = emit8(times(r10(1.0 / 16), 10))
    assert(weighted.length == 11)
    val top = weighted.head
    assert(top.getAs[Long]("p") == 999L && top.getAs[Long]("n_likers") == 100000L)
    assert(top.getAs[Double]("like_score") == viralScore, s"viral score ${top.toSeq}")
    assert(weighted(1).getAs[Long]("p") == 1L)
    assert(weighted(1).getAs[Double]("like_score") == smallScore)

    // ---- likes_bylikers: seeds = viral + posts 1-9 (ties break p asc,
    // so post 10 misses the top-10 cut); f1 curator weight = 1/likers(seed)
    val byl = queries.FeedBlocks.likesBylikersOver(likes)
    val rows = byl.collect()
    val fanScore = r10(1.0 / 100000) // each fan's curator score
    val superFan = times(r10(1.0 / 10), 9).add(fanScore) // users 0-9: 9 small seeds + viral
    val viral2 = emit8(times(superFan, 10).add(times(fanScore, 99990)))
    val small2 = emit8(times(superFan, 10))
    assert(rows.length == 11)
    assert(rows.head.getAs[Long]("p") == 999L && rows.head.getAs[Double]("score") == viral2)
    assert(rows(1).getAs[Long]("p") == 1L && rows(1).getAs[Double]("score") == small2)

    // the hot key must never enter an unsplittable shuffle join: the
    // seeds join stays the PINNED broadcast even with the size-based
    // threshold off (aggregations absorb the key map-side)
    val conf = spark.conf
    val savedBc = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = queries.FeedBlocks.likesBylikersOver(likes)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"seeds join lost its broadcast:\n${plan.take(1500)}")
    } finally savedBc.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(v =>
      conf.set("spark.sql.autoBroadcastJoinThreshold", v))
  }
}
