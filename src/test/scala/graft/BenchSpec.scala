package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's clean-state contract (r9): between timed
  * queries every pinned block and cached relation is released, so a
  * query's number never pays for its predecessors' storage. The r8
  * driver bench charged late-catalog rows 6-10× their isolated cost
  * because Lineage.cut localCheckpoint blocks accumulated unreleased
  * across ~780 executions.
  */
class BenchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("resetSharedState releases every pinned block and cached relation") {
    import org.apache.spark.sql.functions._
    // run a query that pins blocks via Lineage.cut, and cache a relation
    SparkEntry.queries("page_rank")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val cached = Tables.documents(spark, dir).cache()
    cached.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the fixture must actually pin blocks, or this spec tests nothing")
    Bench.resetSharedState(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "pinned RDD blocks survived the reset")
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached relations survived the reset")
    // queries still run correctly from the clean state (cuts re-pin
    // within their own execution)
    assert(SparkEntry.queries("page_rank")(spark, dir).count() > 0)
  }

  test("runIsolated forks a fresh JVM and returns parseable per-pass samples") {
    // the v4-chunked contract: heavy rows are timed in their own JVM
    // and merged back — this pins the fork + JSON round-trip on a cheap
    // row so a classpath/arg regression fails the suite, not BENCH_r{N}
    val r = Bench.runIsolated(Seq("sort_random"), dir)
    assert(r.isDefined, "fresh-JVM chunk failed (see stderr for the child log path)")
    val samples = r.get("sort_random")
    assert(samples.length == 2, s"expected 2 pass samples, got $samples")
    assert(samples.flatten.nonEmpty && samples.flatten.forall(t => t > 0 && t < 300),
      s"implausible isolated samples: $samples")
  }
}
