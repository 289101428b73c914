package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR, forcing full execution through the noop sink
  * (a bare .count() would let column pruning skip computed columns).
  * Prints ONE JSON line for the driver.
  */
object Bench {

  /** Reset the shared-JVM state one query leaves for the next —
    * spec-pinned (BenchSpec): after reset no pinned RDD blocks and no
    * cached relations remain, so query N+1 starts from the same
    * storage state as an isolated run. r8 adjudication: without this,
    * Lineage.cut localCheckpoint blocks piled up over ~780 executions
    * and inflated late-catalog rows 6-10× their isolated cost.
    */
  def resetSharedState(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg: comma-separated query names (local profiling subset)
    val only: Set[String] = args.headOption.map(_.split(',').toSet).getOrElse(Set.empty)
    // a typo'd subset would otherwise silently benchmark nothing
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      System.err.println(s"[bench] unknown query names ignored: ${unknown.toSeq.sorted.mkString(", ")}")
    def selected = if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => only(kv._1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    // one warm-up pass over a tiny SF amortizes JIT/codegen compilation
    // out of the measured numbers (the driver measures steady-state)
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // TWO COMPLETE PASSES over the catalog, per-query min ACROSS passes
    // (not min-of-two-consecutive): back-to-back runs of the same query
    // share whatever GC/codegen-cache pileup its 100 predecessors left
    // behind, so both samples are biased the same way — r4's driver run
    // recorded a 7.9x phantom regression that an isolated JVM couldn't
    // reproduce. Separating the two samples by a full catalog pass
    // decorrelates the noise; the min is then a defensible steady-state.
    val names = selected.toSeq.sortBy(_._1)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      // reset shared-JVM state OUTSIDE the timed window (see
      // resetSharedState; the GC also lets the ContextCleaner reap
      // orphaned shuffle files before the next timing starts)
      resetSharedState(spark)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val passes = (1 to 2).map { _ => names.map { case (n, fn) => n -> timeOne(n, fn) } }
    val results = names.map { case (name, _) =>
      // a failed attempt must not masquerade as a fast run
      val goodTimes = passes.flatMap(_.collect { case (`name`, (t, true)) => t })
      (name, if (goodTimes.nonEmpty) goodTimes.min else -1.0, goodTimes.nonEmpty)
    }
    // failed queries serialize as null, never a numeric sentinel: a
    // consumer that sums the map without reading "failed" should break
    // loudly, not ingest -1.0 as a timing
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) f"$v%.3f" else "null") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // per-pass raw samples + a harness version stamp: cross-round totals
    // are only comparable under the SAME methodology (the r4→r5 harness
    // change read as a phantom 1.22× regression until adjudicated), so
    // the JSON self-describes how it was measured
    val perPass = names.map { case (name, _) =>
      val samples = passes.map(_.collectFirst { case (`name`, (t, ok)) => if (ok) f"$t%.3f" else "null" }
        .getOrElse("null"))
      "\"" + name + "\":[" + samples.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","harness":"2-pass-min/v3-cleanstate","queries":$qs,"passes":$perPass,"failed":$failed,"sf":"$sfDir"}"""
    // Persist FIRST, then print: the driver's log-tail capture clipped
    // the head of the stdout line in r3 AND r4 ("parsed": null) — the
    // authoritative copy is the file; the canonical path is named in
    // PROGRESS.jsonl and SURVEY §5 so the driver/judge can pick it up.
    // Default is RELATIVE (resolved against the launch dir — sbt runs
    // from the repo root), so a checkout elsewhere still works;
    // SPARK_GRAFT_BENCH_OUT pins the canonical absolute path.
    val outFile = java.nio.file.Paths
      .get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      .toAbsolutePath
    try java.nio.file.Files.writeString(outFile, line + "\n")
    catch {
      case e: Throwable => System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(s"[bench] full JSON persisted to $outFile")
    println(line)
    spark.stop()
  }
}
