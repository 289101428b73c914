package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleMath, Tables}

/** Round-13 operators — continuing the platform-QA surface: streaming
  * loss budgeting, the position-based attribution variant, and
  * distributional normality checks. Same house rules as every round:
  * cross-row float totals go through 6/12-dp rounds into order-free
  * DECIMAL sums (or stay exact integers), per-row float chains mirror
  * the oracle's operation ORDER exactly, global sorts never touch
  * data-volume-sized relations.
  */
object Round13Ops {
  import OracleMath._

  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** #357 watermark_loss_sweep — the event-loss budget per candidate
    * watermark delay: watermark_advisor recommends p99 lateness, THIS
    * prices every candidate on the menu ({1m, 10m, 1h, 6h, 1d}) in
    * dropped-event share per type — the actual trade a deployment
    * signs (state size vs completeness), read as a table instead of
    * discovered as a gap in a dashboard. Reuses the advisor's
    * running-high-water-mark lateness definition (one per-type
    * ordered window pass); the sweep is conditional sums against the
    * broadcast 5-row delay axis; shares divide exact longs. Exact
    * oracle.
    */
  def watermarkLossSweep(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val late = events(s, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("hwm", max(col("ts_us")).over(w))
      .filter(col("hwm").isNotNull)
      .select(col("event_type"), greatest(col("hwm") - col("ts_us"), lit(0L)).as("late_us"))
    val delays = s.range(0, 5).select(
      element_at(array(lit(60L), lit(600L), lit(3600L), lit(21600L), lit(86400L)),
        (col("id") + 1).cast("int")).as("delay_s"))
    late.crossJoin(broadcast(delays))
      .groupBy(col("event_type"), col("delay_s"))
      .agg(
        sum(when(col("late_us") > col("delay_s") * 1000000L, 1L).otherwise(0L)).as("n_dropped"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("delay_s"), col("n_dropped"), col("n_events"),
        emit(col("n_dropped").cast("double") / col("n_events").cast("double"), 6)
          .as("drop_share"))
      .orderBy(col("event_type"), col("delay_s"))
  }

  val watermarkLossSweepSql: String =
    """WITH seq AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us,
      |    max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM events
      |),
      |late AS (
      |  SELECT event_type, greatest(hwm - ts_us, 0) AS late_us
      |  FROM seq WHERE hwm IS NOT NULL
      |),
      |delays AS (SELECT CAST(unnest([60, 600, 3600, 21600, 86400]) AS BIGINT) AS delay_s)
      |SELECT event_type, delay_s,
      |  CAST(sum(CASE WHEN late_us > delay_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  count(*) AS n_events,
      |  CAST(round(CAST(sum(CASE WHEN late_us > delay_s * 1000000 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS drop_share
      |FROM late CROSS JOIN delays
      |GROUP BY 1, 2 ORDER BY event_type, delay_s""".stripMargin

  /** #358 position_attribution — U-shaped (40/20/40) position-based
    * credit over each user's pre-purchase journey, completing the
    * attribution trio (#124 last/first-touch, #320 Markov removal
    * effect, THIS the position heuristic most marketing stacks
    * actually bill on): first and last touch take 0.4 each, interior
    * touches split 0.2 (length-1 journeys take 1.0, length-2 split
    * 0.5/0.5). Per-event position and journey length come from one
    * fine-keyed window pass over pre-first-purchase events; per-event
    * credit is a mirrored CASE chain, 12-dp rounded into order-free
    * DECIMAL channel sums; credit conservation (Σ = journeys) is the
    * spec's invariant. Exact oracle.
    */
  def positionAttribution(s: SparkSession, dir: String): DataFrame = {
    val wp = org.apache.spark.sql.expressions.Window
    val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("fu")).agg(min(col("ts")).as("fp_ts"))
    val journey = ev.join(fp, col("user_id") === col("fu") && col("ts") < col("fp_ts"))
    val w = wp.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pos = journey
      .withColumn("rn", row_number().over(w))
      .withColumn("nj", count(lit(1)).over(wp.partitionBy(col("user_id"))))
    val credit = when(col("nj") === 1, lit(1.0))
      .when(col("nj") === 2, lit(0.5))
      .when(col("rn") === 1 || col("rn") === col("nj"), lit(0.4))
      .otherwise(lit(0.2) / (col("nj") - 2).cast("double"))
    val tot = pos.select(col("user_id")).distinct().agg(count(lit(1)).as("n_journeys"))
    pos.select(col("event_type"), round(credit, 12).cast(Dec12).as("c"))
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("c")).as("credit"))
      .crossJoin(broadcast(tot))
      .select(col("channel"), col("n_touches"),
        emit(col("credit").cast("double"), 6).as("credit"),
        emit(col("credit").cast("double") / col("n_journeys").cast("double"), 6)
          .as("credit_share"))
      .orderBy(col("channel"))
  }

  val positionAttributionSql: String =
    """WITH fp AS (
      |  SELECT user_id AS fu, min(ts) AS fp_ts FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1
      |),
      |j AS (
      |  SELECT e.user_id, e.event_type, e.ts, e.event_id
      |  FROM events e JOIN fp ON e.user_id = fp.fu AND e.ts < fp.fp_ts
      |),
      |pos AS (
      |  SELECT event_type, user_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS nj
      |  FROM j
      |),
      |tot AS (SELECT count(DISTINCT user_id) AS n_journeys FROM pos),
      |cr AS (
      |  SELECT event_type AS channel,
      |    CASE WHEN nj = 1 THEN 1.0
      |         WHEN nj = 2 THEN 0.5
      |         WHEN rn = 1 OR rn = nj THEN 0.4
      |         ELSE 0.2 / CAST(nj - 2 AS DOUBLE) END AS c
      |  FROM pos
      |)
      |SELECT channel, count(*) AS n_touches,
      |  CAST(round(CAST(sum(CAST(round(c, 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS DOUBLE) AS credit,
      |  CAST(round(CAST(sum(CAST(round(c, 12) AS DECIMAL(38,12))) AS DOUBLE)
      |    / CAST(any_value(n_journeys) AS DOUBLE), 6) AS DOUBLE) AS credit_share
      |FROM cr CROSS JOIN tot GROUP BY channel ORDER BY channel""".stripMargin

  /** #359 jarque_bera_report — normality screen (skewness, excess
    * kurtosis, Jarque–Bera statistic, 5% flag at the χ²₂ cut 5.99)
    * for doc length per source and purchase value per event-week:
    * half the monitors upstream assume roughly-normal residuals or
    * justify z-thresholds on it — THIS is the check that says when
    * that assumption is fiction (and a heavy-tailed column should
    * route to the MAD/quantile monitors instead). All four raw
    * moments accumulate as exact integer/DECIMAL sums in ONE
    * map-side-combinable agg per group (Σx…Σx⁴ in DECIMAL(38,0) —
    * len⁴·N overflows anything smaller); the moment algebra runs as a
    * mirrored float chain on the bounded group table. Exact oracle.
    */
  def jarqueBeraReport(s: SparkSession, dir: String): DataFrame = {
    def dec0(c: Column): Column = c.cast("decimal(38,0)")
    val m = Tables.documents(s, dir)
      .groupBy(col("source").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(dec0(col("n_chars"))).as("s1"),
        sum(dec0(col("n_chars")) * dec0(col("n_chars"))).as("s2"),
        sum(dec0(col("n_chars")) * dec0(col("n_chars")) * dec0(col("n_chars"))).as("s3"),
        sum(dec0(col("n_chars")) * dec0(col("n_chars")) * dec0(col("n_chars"))
          * dec0(col("n_chars"))).as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mu * mu
    val m3 = (col("s3").cast("double") / nD - lit(3.0) * mu * (col("s2").cast("double") / nD)
      + lit(2.0) * mu * mu * mu)
    val m4 = (col("s4").cast("double") / nD - lit(4.0) * mu * (col("s3").cast("double") / nD)
      + lit(6.0) * mu * mu * (col("s2").cast("double") / nD) - lit(3.0) * mu * mu * mu * mu)
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2) - lit(3.0)
    val jb = nD / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0))
    m.select(col("grp").as("source"), col("n").as("n_docs"),
      emit(skew, 6).as("skewness"),
      emit(kurt, 6).as("excess_kurtosis"),
      emit(jb, 4).as("jarque_bera"))
      .withColumn("non_normal", col("jarque_bera") > 5.99)
      .orderBy(col("source"))
  }

  val jarqueBeraReportSql: String = {
    val mu = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
    val e2 = "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    val e3 = "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    val e4 = "CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    val m2 = s"$e2 - ($mu) * ($mu)"
    val m3 = s"$e3 - 3.0 * ($mu) * ($e2) + 2.0 * ($mu) * ($mu) * ($mu)"
    val m4 = s"$e4 - 4.0 * ($mu) * ($e3) + 6.0 * ($mu) * ($mu) * ($e2) " +
      s"- 3.0 * ($mu) * ($mu) * ($mu) * ($mu)"
    val skew = s"($m3) / sqrt(($m2) * ($m2) * ($m2))"
    val kurt = s"($m4) / (($m2) * ($m2)) - 3.0"
    val jb = s"CAST(n AS DOUBLE) / 6.0 * (($skew) * ($skew) + ($kurt) * ($kurt) / 4.0)"
    s"""WITH m AS (
       |  SELECT source, count(*) AS n,
       |    sum(CAST(n_chars AS DECIMAL(38,0))) AS s1,
       |    sum(CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))) AS s2,
       |    sum(CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))
       |      * CAST(n_chars AS DECIMAL(38,0))) AS s3,
       |    sum(CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))
       |      * CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))) AS s4
       |  FROM documents GROUP BY 1
       |)
       |SELECT source, n AS n_docs,
       |  CAST(round($skew, 6) AS DOUBLE) AS skewness,
       |  CAST(round($kurt, 6) AS DOUBLE) AS excess_kurtosis,
       |  CAST(round($jb, 4) AS DOUBLE) AS jarque_bera,
       |  CAST(round($jb, 4) AS DOUBLE) > 5.99 AS non_normal
       |FROM m ORDER BY source""".stripMargin
  }

  /** #360 cluster_size_dist — the duplicate-cluster size histogram
    * over #36b dedup_clusters' components: the REPORT face of
    * near-dedup (a pipeline owner reads "how much of the corpus sits
    * in 2-doc pairs vs 50-doc template families" — the shape decides
    * whether near-dup is trimming noise or deleting a subpopulation).
    * Two bounded aggs over the oracle-verified cluster labels
    * (cluster → size → size histogram); doc/cluster shares divide
    * exact longs. Exact oracle over the clusters chain's own CTEs.
    */
  def clusterSizeDist(s: SparkSession, dir: String): DataFrame = {
    val sizes = TextOps.dedupClusters(s, dir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
    val tot = sizes.agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
    sizes.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters_of_size"))
      .crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters_of_size"),
        (col("cluster_size") * col("n_clusters_of_size")).as("docs_in_size"),
        emit((col("cluster_size") * col("n_clusters_of_size")).cast("double")
          / col("n_docs").cast("double"), 6).as("doc_share"),
        emit(col("n_clusters_of_size").cast("double") / col("n_clusters").cast("double"), 6)
          .as("cluster_share"))
      .orderBy(col("cluster_size"))
  }

  val clusterSizeDistSql: String =
    s"""WITH labels AS (${TextOps.dedupClustersSql.replace("ORDER BY doc_id", "")}),
       |sizes AS (SELECT cluster, count(*) AS sz FROM labels GROUP BY 1),
       |tot AS (SELECT count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs FROM sizes)
       |SELECT sz AS cluster_size, count(*) AS n_clusters_of_size,
       |  CAST(sz * count(*) AS BIGINT) AS docs_in_size,
       |  CAST(round(CAST(sz * count(*) AS DOUBLE) / CAST(any_value(n_docs) AS DOUBLE), 6) AS DOUBLE) AS doc_share,
       |  CAST(round(CAST(count(*) AS DOUBLE) / CAST(any_value(n_clusters) AS DOUBLE), 6) AS DOUBLE) AS cluster_share
       |FROM sizes CROSS JOIN tot GROUP BY sz ORDER BY cluster_size""".stripMargin

  /** #361 token_burstiness — Church & Gale (1995) variance-to-mean
    * ratio of per-document token occurrences, over the WHOLE corpus
    * (absent docs are true zeros, handled in closed form: Σx and Σx²
    * are unchanged by zero rows, only N enters): VMR ≈ 1 reads
    * Poisson (function words), VMR ≫ 1 reads topical/bursty — the
    * signal separating content terms from glue BEFORE any labeled
    * data, and the reason tf-idf's df term isn't enough (df can't see
    * within-doc clumping). One (doc, token) count + one token agg
    * (Σx² in DECIMAL — occurrence²·N overflows long at corpus
    * scale); top-20 among df ≥ 5 tokens by ROUNDED VMR (token
    * tie-break) as TakeOrdered. Exact oracle.
    */
  def tokenBurstiness(s: SparkSession, dir: String): DataFrame = {
    def dec0(c: Column): Column = c.cast("decimal(38,0)")
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("x"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("nn"))
    val m = occ.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(dec0(col("x"))).as("s1"),
        sum(dec0(col("x")) * dec0(col("x"))).as("s2"))
    val mean = col("s1").cast("double") / col("nn").cast("double")
    val vmr = (col("s2").cast("double") / col("nn").cast("double") - mean * mean) / mean
    m.crossJoin(broadcast(nDocs))
      .filter(col("df") >= 5)
      .select(col("token"), col("df"), col("s1").cast("long").as("total_occ"),
        emit(vmr, 6).as("vmr"))
      .orderBy(col("vmr").desc, col("token")).limit(20)
  }

  val tokenBurstinessSql: String =
    """WITH occ AS (
      |  SELECT doc_id, token, count(*) AS x FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |  ) WHERE token <> '' GROUP BY 1, 2
      |),
      |nd AS (SELECT count(*) AS nn FROM documents),
      |m AS (
      |  SELECT token, count(*) AS df,
      |    sum(CAST(x AS DECIMAL(38,0))) AS s1,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s2
      |  FROM occ GROUP BY 1
      |)
      |SELECT token, df, CAST(s1 AS BIGINT) AS total_occ,
      |  CAST(round(
      |    (CAST(s2 AS DOUBLE) / CAST(nn AS DOUBLE)
      |     - (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)))
      |    / (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS DOUBLE) AS vmr
      |FROM m CROSS JOIN nd WHERE df >= 5
      |ORDER BY vmr DESC, token LIMIT 20""".stripMargin

  /** #362 log_odds_keyness — Monroe, Colaresi & Quinn (2008)
    * Dirichlet-smoothed log-odds keyness between the two
    * lexicographically first sources: WHICH words distinguish corpus
    * A from corpus B, z-scored so rare-word noise doesn't top the
    * list (the raw log-ratio's classic failure) — the
    * corpus-comparison table behind every "what changed in this
    * source" investigation. Two token histograms (one agg), uniform
    * prior α=0.01 with α₀ = α·V (V in-plan), δ and its variance
    * 1/(y_a+α)+1/(y_b+α) as mirrored ln chains over the vocab-sized
    * relation, top-20 by ROUNDED |z| via TakeOrdered. Exact oracle.
    */
  def logOddsKeyness(s: SparkSession, dir: String): DataFrame = {
    val two = Tables.documents(s, dir).select(col("source")).distinct()
      .orderBy(col("source")).limit(2)
      .select(col("source"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source"))).as("side"))
    val toks = Tables.documents(s, dir)
      .join(broadcast(two), Seq("source"))
      .select(col("side"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy(col("token"))
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("ya"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("yb"))
    val tot = counts.agg(sum(col("ya")).as("na"), sum(col("yb")).as("nb"),
      count(lit(1)).as("v"))
    val alpha = lit(0.01)
    val a0 = alpha * col("v").cast("double")
    def lo(y: Column, n: Column): Column =
      log((y.cast("double") + alpha)
        / (n.cast("double") + a0 - y.cast("double") - alpha))
    val delta = lo(col("ya"), col("na")) - lo(col("yb"), col("nb"))
    val z = delta / sqrt(lit(1.0) / (col("ya").cast("double") + alpha)
      + lit(1.0) / (col("yb").cast("double") + alpha))
    counts.crossJoin(broadcast(tot))
      .select(col("token"), col("ya"), col("yb"),
        emit(delta, 6).as("log_odds"), emit(z, 4).as("z"))
      .orderBy(abs(col("z")).desc, col("token")).limit(20)
  }

  val logOddsKeynessSql: String =
    """WITH two AS (
      |  SELECT source, row_number() OVER (ORDER BY source) AS side
      |  FROM (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 2)
      |),
      |toks AS (
      |  SELECT side, token FROM (
      |    SELECT two.side, unnest(string_split(d.text, ' ')) AS token
      |    FROM documents d JOIN two ON d.source = two.source
      |  ) WHERE token <> ''
      |),
      |counts AS (
      |  SELECT token,
      |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ya,
      |    CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS yb
      |  FROM toks GROUP BY 1
      |),
      |tot AS (SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
      |        count(*) AS v FROM counts)
      |SELECT token, ya, yb,
      |  CAST(round(
      |    ln((CAST(ya AS DOUBLE) + 0.01) / (CAST(na AS DOUBLE) + 0.01 * CAST(v AS DOUBLE) - CAST(ya AS DOUBLE) - 0.01))
      |    - ln((CAST(yb AS DOUBLE) + 0.01) / (CAST(nb AS DOUBLE) + 0.01 * CAST(v AS DOUBLE) - CAST(yb AS DOUBLE) - 0.01)),
      |    6) AS DOUBLE) AS log_odds,
      |  CAST(round(
      |    (ln((CAST(ya AS DOUBLE) + 0.01) / (CAST(na AS DOUBLE) + 0.01 * CAST(v AS DOUBLE) - CAST(ya AS DOUBLE) - 0.01))
      |     - ln((CAST(yb AS DOUBLE) + 0.01) / (CAST(nb AS DOUBLE) + 0.01 * CAST(v AS DOUBLE) - CAST(yb AS DOUBLE) - 0.01)))
      |    / sqrt(1.0 / (CAST(ya AS DOUBLE) + 0.01) + 1.0 / (CAST(yb AS DOUBLE) + 0.01)),
      |    4) AS DOUBLE) AS z
      |FROM counts CROSS JOIN tot
      |ORDER BY abs(z) DESC, token LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_size_dist" -> (clusterSizeDist(_, _)),
    "token_burstiness" -> (tokenBurstiness(_, _)),
    "log_odds_keyness" -> (logOddsKeyness(_, _)),
    "watermark_loss_sweep" -> (watermarkLossSweep(_, _)),
    "position_attribution" -> (positionAttribution(_, _)),
    "jarque_bera_report" -> (jarqueBeraReport(_, _)))

  val oracles: Map[String, String] = Map(
    "cluster_size_dist" -> clusterSizeDistSql,
    "token_burstiness" -> tokenBurstinessSql,
    "log_odds_keyness" -> logOddsKeynessSql,
    "watermark_loss_sweep" -> watermarkLossSweepSql,
    "position_attribution" -> positionAttributionSql,
    "jarque_bera_report" -> jarqueBeraReportSql)
}
