package graft.tools

import org.apache.spark.sql.DataFrame

/** Shuffle-partition advisory (SURVEY §7): derive the right
  * `spark.sql.shuffle.partitions` for a query from its input size
  * instead of inheriting a global constant.
  *
  * The static knob matters in both directions: a tiny input on the
  * session default (32 here, 200 upstream) pays scheduler + shuffle-file
  * overhead per empty partition; a 100 TB input on the same constant
  * puts ~3 TB in each reducer and spills. AQE's partition coalescing
  * repairs the small side at runtime but never the large side — the
  * INITIAL partition count is its upper bound — so deployments still
  * need a sane static value per pipeline.
  *
  * Advice = ceil(total leaf input bytes / target partition bytes),
  * clamped to [1, cap]. Leaf bytes come from Catalyst statistics (file
  * sizes for parquet relations — the same numbers the planner's
  * broadcast decisions use); `targetBytes` defaults to the 64 MiB AQE
  * advisory partition size so static advice and runtime coalescing
  * agree on the goal shape.
  */
object Advisor {

  /** Leaves with no real statistics are excluded rather than letting
    * them poison the estimate: a LogicalRDD (lineage-cut checkpoint,
    * RDD handoff) has no relation behind it and reports a garbage
    * size (measured ~1.9e15 for a 16-row checkpoint), and anything at
    * the defaultSizeInBytes sentinel is equally meaningless. File
    * relations — the leaves that actually dominate input size — carry
    * real file-length stats and are always kept.
    */
  private val UnknownSize = BigInt(Long.MaxValue) / 2

  def leafInputBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan
      .collectLeaves()
      .filterNot(_.getClass.getSimpleName == "LogicalRDD")
      .map(_.stats.sizeInBytes)
      .filter(_ < UnknownSize)
      .sum

  def advisedShufflePartitions(
      df: DataFrame,
      targetBytes: Long = 64L * 1024 * 1024,
      cap: Int = 100000): Int = {
    val bytes = leafInputBytes(df)
    val raw = (bytes + targetBytes - 1) / targetBytes
    raw.min(cap).max(1).toInt
  }
}
