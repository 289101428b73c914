package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each key runs one operator's query; `oracleSql` holds the DuckDB
  * equivalent the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("feed_pipeline")(spark, "/root/testdata/sf0.001")

  private lazy val catalog: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.FeedBlocks.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.GraphOps.queries ++
      graft.queries.Round2Ops.queries ++
      graft.queries.Round3Ops.queries ++
      graft.queries.Round4Ops.queries ++
      graft.queries.Round5Ops.queries ++
      graft.queries.Round6Ops.queries ++
      graft.queries.Round8Ops.queries ++
      graft.queries.Round9Ops.queries ++
      graft.queries.Round10Ops.queries ++
      graft.queries.Round11Ops.queries ++
      graft.queries.Round12Ops.queries ++
      graft.queries.Round13Ops.queries ++
      graft.queries.Round14Ops.queries ++
      graft.queries.Round15Ops.queries ++
      graft.queries.Round16Ops.queries ++
      graft.queries.Round17Ops.queries ++
      graft.queries.Round18Ops.queries ++
      graft.queries.Round19Ops.queries ++
      graft.queries.Round20Ops.queries ++
      graft.queries.Round21Ops.queries ++
      graft.queries.Round22Ops.queries ++
      graft.queries.Round23Ops.queries ++
      graft.queries.Round24Ops.queries ++
      graft.queries.Round25Ops.queries ++
      graft.queries.DssOps.queries ++
      graft.queries.BehaviorOps.queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, fn) =>
      k -> ((s: SparkSession, dir: String) => fn(GraftSession.tune(s), dir))
    }

  /** DuckDB oracle SQL per query key (rows-only ops omitted). */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracles ++
      graft.queries.FeedBlocks.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.GraphOps.oracles ++
      graft.queries.Round2Ops.oracles ++
      graft.queries.Round3Ops.oracles ++
      graft.queries.Round4Ops.oracles ++
      graft.queries.Round5Ops.oracles ++
      graft.queries.Round6Ops.oracles ++
      graft.queries.Round8Ops.oracles ++
      graft.queries.Round9Ops.oracles ++
      graft.queries.Round10Ops.oracles ++
      graft.queries.Round11Ops.oracles ++
      graft.queries.Round12Ops.oracles ++
      graft.queries.Round13Ops.oracles ++
      graft.queries.Round14Ops.oracles ++
      graft.queries.Round15Ops.oracles ++
      graft.queries.Round16Ops.oracles ++
      graft.queries.Round17Ops.oracles ++
      graft.queries.Round18Ops.oracles ++
      graft.queries.Round19Ops.oracles ++
      graft.queries.Round20Ops.oracles ++
      graft.queries.Round21Ops.oracles ++
      graft.queries.Round22Ops.oracles ++
      graft.queries.Round23Ops.oracles ++
      graft.queries.Round24Ops.oracles ++
      graft.queries.Round25Ops.oracles ++
      graft.queries.DssOps.oracles ++
      graft.queries.BehaviorOps.oracles
}
