package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off profiler for VERDICT r9 item 5: is the firehose bench cost
  * the PARSE (the engine's per-record front door — the thing worth
  * measuring) or the deterministic raw-JSON fixture synthesis (test
  * harness work)? Times, at SPARK_GRAFT_SF_DIR:
  *   - synth only: events → concat'd raw JSON lines → noop
  *   - parse: synth + from_json projection → noop
  *   - feed_from_firehose: the full catalog query
  * 3 reps each after one warm-up; prints min seconds per stage.
  */
object FirehoseProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    import graft.sources.Firehose
    import graft.Tables
    def stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "synth_only" -> (() => Firehose.synthPostRecords(Tables.events(spark, dir))),
      "parse" -> (() =>
        Firehose.parsePostRecords(Firehose.synthPostRecords(Tables.events(spark, dir)))),
      "feed_from_firehose" -> (() => graft.SparkEntry.queries("feed_from_firehose")(spark, dir)))
    for ((name, fn) <- stages) {
      fn().write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[firehose-profile] $name%-20s min=${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
