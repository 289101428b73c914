package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the engine's table catalog.
  *
  * Each loader is a plain parquet scan: Catalyst pushes filters and
  * prunes columns into the scan, so callers never pre-materialize.
  * At 100 TB these paths would be time/key-partitioned directories and
  * the same code gets partition pruning for free.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): read as long nanos (see
    * GraftSession) and converted via integral division — `ts div 1000`
    * keeps full int64 precision where a double division would not.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  // NOTE (r10, measured): fanning embeddings HERE for every consumer
  // was a wash (family A/B 39.6 → 38.3 s): the brute-distance rows won
  // 1-2 s each, but the multi-pipeline reports (ann_recall_report,
  // ann_probe_curve, embed_kmeans_report) reference this table many
  // times and paid the exchange + planning cost per reference. The fan
  // is applied inside the measured winners instead.
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
