package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental counter maintenance — the batch form of the reference's
  * run_update_counts_query (main.rs:3815), done as DELTA MERGE instead
  * of recompute: fold only the new interactions into the previous
  * counter table. At 100 TB this is the difference between touching the
  * day's delta and rescanning the full history on every refresh.
  *
  * Counters here are per-key (n, total) — both algebraic, so
  * merge(prev, delta) ≡ recompute(full) exactly (test-pinned), and the
  * merge is a key-partitioned full-outer join + coalesced sums.
  */
object IncrementalCounters {

  /** Aggregate a raw interaction relation into the counter shape. */
  def countersOf(interactions: DataFrame, keyCol: String, valueCol: String): DataFrame =
    interactions
      .groupBy(col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("total"))

  /** Merge a delta's counters into the previous counter state. */
  def merge(prev: DataFrame, deltaCounters: DataFrame): DataFrame = {
    val p = prev.select(col("key"), col("n").as("p_n"), col("total").as("p_total"))
    val d = deltaCounters.select(col("key"), col("n").as("d_n"), col("total").as("d_total"))
    p.join(d, Seq("key"), "full_outer")
      .select(
        col("key"),
        (coalesce(col("p_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
        (coalesce(col("p_total"), lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 6))) +
          coalesce(col("d_total"), lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 6))))
          .as("total"))
  }
}
