package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleMath, Tables}
import graft.sources.Firehose

/** Round-10 operators — growth/audience windows that need sliding
  * distinct counts (exact + mergeable-sketch twins), link-level feed
  * dedup from the firehose surface, and the governance/profiling
  * passes (k-anonymity, histograms) a data-platform team runs beside
  * the corpus pipeline.
  */
object Round10Ops {
  import OracleMath._

  /** #260 sliding_mau — trailing-7-day distinct active users per day
    * (the growth team's MAU curve at daily grain; #148 user_stickiness
    * reads one week, this reads every day's trailing window). The ONLY
    * full-data shuffle is the distinct (user, day) projection — fine
    * keys, map-side combinable; each surviving pair then explodes into
    * the ≤7 window-end days it contributes to (bounded fan-out,
    * capped at the observed horizon via a single-row span broadcast —
    * the gap_fill device, no wall clock in the plan), and the final
    * count-distinct runs over day keys whose cardinality is the
    * calendar, not the data. A window-function form (range frame over
    * users) cannot express sliding DISTINCT; the explode form is how
    * engines actually scale it.
    */
  def slidingMau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val span = ud.agg(max(col("d")).as("hi"))
    ud.crossJoin(broadcast(span))
      .select(
        col("user_id"),
        explode(expr("sequence(d, least(date_add(d, 6), hi))")).as("wd"))
      .groupBy(col("wd"))
      .agg(countDistinct(col("user_id")).as("mau_7d"))
      .select(date_format(col("wd"), "yyyy-MM-dd").as("day"), col("mau_7d"))
      .orderBy(col("day"))
  }

  val slidingMauSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |span AS (SELECT max(d) AS hi FROM ud),
      |ex AS (
      |  SELECT user_id, unnest(generate_series(d, least(d + INTERVAL 6 DAY, hi), INTERVAL 1 DAY))::DATE AS wd
      |  FROM ud, span
      |)
      |SELECT strftime(wd, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS mau_7d
      |FROM ex GROUP BY wd ORDER BY day""".stripMargin

  /** #261 mau_hll_sliding — the 100 TB twin of #260: per-day
    * HyperLogLog sketches (DataSketches HllSketch via Spark's native
    * hll_sketch_agg) union-merged over the trailing window. The raw
    * event stream collapses to ONE fixed-KB sketch row per day before
    * any window fan-out — the distinct (user, day) shuffle of the
    * exact form never happens, and sketch union is associative, so the
    * same per-day partials serve every window width and re-merge
    * incrementally as new days land (the IncrementalCounters property,
    * for distincts). Rows-only by design (sketch estimates are not
    * SQL-reproducible); QueryCatalogSpec pins |approx − exact|/exact
    * ≤ 2% against #260 on every day.
    */
  def mauHllSliding(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val span = daily.agg(max(col("d")).as("hi"))
    daily.crossJoin(broadcast(span))
      .select(col("sk"), explode(expr("sequence(d, least(date_add(d, 6), hi))")).as("wd"))
      .groupBy(col("wd"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("mau_approx"))
      .select(date_format(col("wd"), "yyyy-MM-dd").as("day"), col("mau_approx"))
      .orderBy(col("day"))
  }

  /** #262 dedup_by_link — feed-level URL dedup over parsed firehose
    * posts: every outbound link canonicalizes (lowercase host+path,
    * trailing-slash strip) and each canonical URL keeps its FIRST
    * post (min id — TIDs are time-sortable, so min id IS earliest,
    * the house survivor rule). The reference's duplicates filter
    * (main.rs:1916) keys on record identity; feed curators dedup the
    * same story posted N times by the LINK — this is that operator on
    * the normalized firehose output. One explode + one hash-key
    * aggregate with map-side min/count combine; a link shared by a
    * million posts costs a combine tree, never a hot window partition.
    */
  def dedupByLink(s: SparkSession, dir: String): DataFrame =
    Firehose.parsePostRecords(Firehose.synthPostRecords(Tables.events(s, dir)))
      .select(col("id"), explode(col("links")).as("url"))
      .select(col("id"), lower(regexp_replace(col("url"), "/+$", "")).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col("id")).as("keeper_id"), count(lit(1)).as("n_posts"))
      .orderBy(col("url_canon"))

  val dedupByLinkSql: String = Round8Ops.rawPostsSql + """
    |, links AS (
    |  SELECT substring(json_extract_string(raw,'$.id'), 6) AS id,
    |    lower(regexp_replace(unnest(json_transform(json_extract(raw,'$.links'), '["VARCHAR"]')), '/+$', '')) AS url_canon
    |  FROM raw
    |  WHERE length(json_extract_string(raw,'$.id')) >= 6
    |    AND length(json_extract_string(raw,'$.author')) >= 5
    |    AND json_extract_string(raw,'$.text') IS NOT NULL
    |    AND json_extract_string(raw,'$.createdAt') IS NOT NULL
    |)
    |SELECT url_canon, min(id) AS keeper_id, count(*) AS n_posts
    |FROM links GROUP BY 1 ORDER BY 1""".stripMargin

  /** #263 source_lang_entropy — per-source language-mix entropy (the
    * data-card diversity number beside corpus_mix_report: a "web"
    * source collapsing to one language is an upstream-crawl regression
    * that row counts never show). The fact stream collapses to the
    * bounded |source|×|lang| matrix in one map-side-combined shuffle;
    * entropy folds over each source's ≤|langs| rows as
    * -Σ (c/n)·ln(c/n) with the share division on exact longs and ln on
    * the rounded share (the q14 device) so both engines evaluate the
    * identical IEEE expression in the identical aggregation-free
    * order (a fixed-order sum over the sorted lang list).
    */
  def sourceLangEntropy(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val tot = m.groupBy(col("source")).agg(sum(col("c")).as("n"))
    m.join(tot, Seq("source"))
      .select(col("source"), col("n"),
        (col("c").cast("double") / col("n").cast("double")).as("p"))
      .groupBy(col("source"), col("n"))
      // entropy term ordering: sum of rounded per-lang terms would be
      // order-dependent in float; round each term to 12 dp and sum as
      // DECIMAL so the fold is associative and engine-identical
      .agg(emit(sum(round(-col("p") * log(col("p")), 12).cast(Dec12)), 6).as("entropy"))
      .select(col("source"), col("n").as("n_docs"), col("entropy"))
      .orderBy(col("source"))
  }

  val sourceLangEntropySql: String =
    """WITH m AS (
      |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
      |), tot AS (
      |  SELECT source, sum(c) AS n FROM m GROUP BY 1
      |)
      |SELECT m.source, CAST(any_value(tot.n) AS BIGINT) AS n_docs,
      |  CAST(round(sum(CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS DECIMAL(38,12))), 6) AS DOUBLE) AS entropy
      |FROM m JOIN tot ON m.source = tot.source
      |GROUP BY m.source ORDER BY m.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sliding_mau" -> (slidingMau(_, _)),
    "mau_hll_sliding" -> (mauHllSliding(_, _)),
    "dedup_by_link" -> (dedupByLink(_, _)),
    "source_lang_entropy" -> (sourceLangEntropy(_, _)))

  val oracles: Map[String, String] = Map(
    "sliding_mau" -> slidingMauSql,
    "dedup_by_link" -> dedupByLinkSql,
    "source_lang_entropy" -> sourceLangEntropySql)
}
