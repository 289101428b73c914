package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions (beyond the reference's surface): the
  * normalization-aware side of the dedup family. Byte-exact dedup
  * (dedup_exact_docs) misses re-encodings — the same article with
  * different casing, punctuation or whitespace is a distinct hash.
  * Real intake pipelines (CCNet, RefinedWeb) normalize BEFORE hashing;
  * these two operators add that step and the cross-source audit built
  * on it.
  */
object Round5Ops {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** The CCNet-style pre-hash normalization: lowercase, strip
    * non-alphanumerics, collapse whitespace. A codegen'd per-row map —
    * composes with scan pushdown, shuffles nothing by itself. Mirrored
    * literally in the DuckDB oracles (regexp_replace global flag).
    */
  private def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  private val NormSqlExpr =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** #81 normalization-aware exact dedup: hash the NORMALIZED text,
    * keep the min doc_id per group (order-free, same keep rule as the
    * whole dedup family), report how many variants collapsed. One
    * hash-key shuffle — identical scale shape to dedup_exact_docs; the
    * planted-variant test pins that case/punctuation/whitespace
    * variants fold into one survivor while distinct docs survive.
    */
  def dedupNormalized(s: SparkSession, dir: String): DataFrame =
    dedupNormalizedOver(docs(s, dir))

  /** The core over any (doc_id, text) frame — test entry point. */
  private[graft] def dedupNormalizedOver(d: DataFrame): DataFrame =
    d.select(col("doc_id"), md5(normText(col("text"))).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("n_variants"))
      .orderBy(col("doc_id"))

  val dedupNormalizedSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, md5($NormSqlExpr) AS h FROM documents
       |)
       |SELECT min(doc_id) AS doc_id, count(*) AS n_variants
       |FROM n GROUP BY h ORDER BY doc_id""".stripMargin

  /** #82 cross-source duplication audit: per source, how many docs are
    * duplicated (normalized-hash collisions) anywhere, and how many
    * collide with a DIFFERENT source — the mirror/re-crawl overlap a
    * data recipe must know before weighting sources (the corpus_mix
    * companion). Shape: one shuffle on the hash (stats agg + join on
    * the SAME key — co-partitioned, no extra exchange), then one
    * shuffle on source; both keys are the natural ones at 100 TB.
    */
  def corpusOverlapReport(s: SparkSession, dir: String): DataFrame =
    corpusOverlapReportOver(docs(s, dir))

  private[graft] def corpusOverlapReportOver(d: DataFrame): DataFrame = {
    val n = d.select(col("doc_id"), col("source"), md5(normText(col("text"))).as("h"))
    val stats = n
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_copies"), count_distinct(col("source")).as("n_sources"))
    n.join(stats, Seq("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_duplicated"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("n_cross_source"))
      .orderBy(col("source"))
  }

  val corpusOverlapReportSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, source, md5($NormSqlExpr) AS h FROM documents
       |), st AS (
       |  SELECT h, count(*) AS n_copies, count(DISTINCT source) AS n_sources
       |  FROM n GROUP BY h
       |)
       |SELECT n.source, count(*) AS n_docs,
       |  CAST(SUM(CASE WHEN st.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicated,
       |  CAST(SUM(CASE WHEN st.n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source
       |FROM n JOIN st USING (h)
       |GROUP BY n.source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_normalized" -> (dedupNormalized(_, _)),
    "corpus_overlap_report" -> (corpusOverlapReport(_, _)))

  val oracles: Map[String, String] = Map(
    "dedup_normalized" -> dedupNormalizedSql,
    "corpus_overlap_report" -> corpusOverlapReportSql)
}
