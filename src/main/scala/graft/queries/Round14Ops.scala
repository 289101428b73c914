package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleMath, Tables}

/** Round-14 operators (repo round 8) — two axes the catalog did not
  * yet cover: collocation mining (PMI over adjacent word pairs — the
  * phrase-discovery primitive under every "merge multiword entities
  * before training" preprocessing recipe) and lead-lag causal
  * screening (a Granger-style F-test between daily event series —
  * the first question a growth team asks of two correlated metrics).
  * House rules as ever: cross-row totals stay exact (integer counts,
  * DECIMAL(38,0) cross-products), per-row float chains mirror the
  * oracle's operation order, rankings sort on ROUNDED measures with
  * unique tie-breaks, bounded outputs.
  */
object Round14Ops {
  import OracleMath._

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** #377 bigram_pmi — pointwise mutual information over adjacent
    * word pairs: PMI(a,b) = ln(N·c(ab) / (c(a·)·c(·b))) with position
    * marginals (c(a·) = count as FIRST element, c(·b) = as second), a
    * count floor of 5 (PMI is degenerate on rare pairs — the standard
    * Church–Hanks guard), top-50 by rounded PMI. word_bigrams (#265)
    * reports conditional next-word probability INSIDE a head; PMI is
    * the corpus-level collocation strength that finds multiword
    * phrases regardless of head frequency. Scale: one zip_with
    * adjacency explode (join-free, each row's own array), two bounded
    * vocabulary aggregates, marginal joins keyed on words; the only
    * data-sized shuffle is the (w1,w2) count. The global top-50 sorts
    * the count-floored pair VOCABULARY (bounded), not the corpus.
    * Exact oracle: PMI doubles derive from exact longs identically in
    * both engines; ranking on the 6-dp round with (w1,w2) tie-break.
    */
  def bigramPmi(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        "filter(zip_with(w, slice(w, 2, size(w)), (a, b) -> struct(a AS w1, b AS w2)), p -> p.w2 IS NOT NULL)"))
        .as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    // counts feeds FOUR consumers (floor-filtered pairs, both position
    // marginals, the total): cut it so the corpus tokenization and the
    // (w1,w2) shuffle run once — it is pair-vocabulary sized, the same
    // materialization class as the BM25 postings
    val counts = graft.Lineage.cut(
      grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c")))
    val n = counts.agg(sum(col("c")).cast("long").as("n"))
    val firsts = counts.groupBy(col("w1")).agg(sum(col("c")).cast("long").as("c1"))
    val seconds = counts.groupBy(col("w2")).agg(sum(col("c")).cast("long").as("c2"))
    counts
      .filter(col("c") >= 5)
      .join(firsts, Seq("w1"))
      .join(seconds, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(
        col("w1"), col("w2"), col("c"), col("c1"), col("c2"),
        emit(log(col("n").cast("double") * col("c").cast("double")
          / (col("c1").cast("double") * col("c2").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(50)
  }

  val bigramPmiSql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS w FROM documents
      |), grams AS (
      |  SELECT w[i] AS w1, w[i+1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
      |  WHERE w[i] <> '' AND w[i+1] <> ''
      |), counts AS (
      |  SELECT w1, w2, count(*) AS c FROM grams GROUP BY 1, 2
      |), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts),
      |firsts AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM counts GROUP BY 1),
      |seconds AS (SELECT w2, CAST(sum(c) AS BIGINT) AS c2 FROM counts GROUP BY 1)
      |SELECT counts.w1, counts.w2, c, c1, c2,
      |  (CAST(round(ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE)
      |    / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS DOUBLE) + 0.0) AS pmi
      |FROM counts
      |JOIN firsts ON counts.w1 = firsts.w1
      |JOIN seconds ON counts.w2 = seconds.w2
      |CROSS JOIN n
      |WHERE c >= 5
      |ORDER BY pmi DESC, counts.w1, counts.w2 LIMIT 50""".stripMargin

  /** #378 granger_daily — one-lag Granger-causality screen between
    * the view and purchase daily-count series, BOTH directions: does
    * yesterday's x improve today's y beyond y's own yesterday? F =
    * (SSR_restricted − SSR_unrestricted)·(n−3) / SSR_unrestricted for
    * the nested OLS pair y_t ~ y_{t−1} [+ x_{t−1}], solved in CLOSED
    * FORM from the centered moment matrix (2×2 normal equations by
    * determinant) — no iteration, no solver. Every moment is an exact
    * integer (daily counts and their cross-products, DECIMAL(38,0)
    * sums over the zero-filled day grid), so both engines derive the
    * identical doubles. Scale: the only data-sized work is the daily
    * count; everything after lives on the |days|-bounded grid. The
    * cutoff column is the 5% F(1, 60) point — honest at these day
    * counts (n−3 ≈ 27–360); readers with other horizons read f_stat.
    * Exact oracle.
    */
  def grangerDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val grid = span.select(explode(expr("sequence(0, datediff(hi, lo))")).as("k"))
      .crossJoin(broadcast(span))
    def series(t: String) = grid
      .join(
        daily.filter(col("event_type") === t)
          .crossJoin(broadcast(span))
          .select(datediff(col("d"), col("lo")).as("k"), col("x")),
        Seq("k"), "left")
      .select(col("k"), coalesce(col("x"), lit(0L)).as(t))
    val aligned = series("view").join(series("purchase"), Seq("k"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    // the |days|-bounded lagged grid feeds both direction aggregates:
    // cut it so the daily count and calendar join run once
    val lagged = graft.Lineage.cut(aligned
      .withColumn("vl", lag(col("view"), 1).over(w))
      .withColumn("pl", lag(col("purchase"), 1).over(w))
      .filter(col("vl").isNotNull))
    def dir0(name: String, y: String, yl: String, xl: String) = {
      def d0(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
      lagged.agg(
        count(lit(1)).as("n"),
        d0(col(y)).as("sy"), d0(col(yl)).as("syl"), d0(col(xl)).as("sxl"),
        d0(col(y) * col(y)).as("syy"),
        d0(col(y) * col(yl)).as("syyl"),
        d0(col(y) * col(xl)).as("syxl"),
        d0(col(yl) * col(yl)).as("sylyl"),
        d0(col(yl) * col(xl)).as("sylxl"),
        d0(col(xl) * col(xl)).as("sxlxl"))
        .select(lit(name).as("direction"), col("n"),
          col("sy").cast("double").as("sy"), col("syl").cast("double").as("syl"),
          col("sxl").cast("double").as("sxl"), col("syy").cast("double").as("syy"),
          col("syyl").cast("double").as("syyl"), col("syxl").cast("double").as("syxl"),
          col("sylyl").cast("double").as("sylyl"), col("sylxl").cast("double").as("sylxl"),
          col("sxlxl").cast("double").as("sxlxl"))
    }
    val m = dir0("view_to_purchase", "purchase", "pl", "vl")
      .unionByName(dir0("purchase_to_view", "view", "vl", "pl"))
    val nD = col("n").cast("double")
    val cyy = col("syy") - col("sy") * col("sy") / nD
    val cyyl = col("syyl") - col("sy") * col("syl") / nD
    val cyxl = col("syxl") - col("sy") * col("sxl") / nD
    val cylyl = col("sylyl") - col("syl") * col("syl") / nD
    val cylxl = col("sylxl") - col("syl") * col("sxl") / nD
    val cxlxl = col("sxlxl") - col("sxl") * col("sxl") / nD
    val ssrR = cyy - cyyl * cyyl / cylyl
    val det = cylyl * cxlxl - cylxl * cylxl
    val b = (cyyl * cxlxl - cyxl * cylxl) / det
    val c = (cyxl * cylyl - cyyl * cylxl) / det
    val ssrU = cyy - b * cyyl - c * cyxl
    val f = (ssrR - ssrU) * (nD - lit(3.0)) / ssrU
    m.select(
      col("direction"), col("n"),
      emit(ssrR, 6).as("ssr_restricted"),
      emit(ssrU, 6).as("ssr_unrestricted"),
      emit(f, 4).as("f_stat"),
      lit(4.0).as("f_cut_5pct_df1_60"),
      (round(f, 4).cast("double") > 4.0).as("lagged_signal"))
      .orderBy(col("direction"))
  }

  val grangerDailySql: String = {
    def side(name: String, y: String, yl: String, xl: String) =
      s"""SELECT '$name' AS direction, count(*) AS n,
         |  CAST(sum(CAST($y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST($yl AS DECIMAL(38,0))) AS DOUBLE) AS syl,
         |  CAST(sum(CAST($xl AS DECIMAL(38,0))) AS DOUBLE) AS sxl,
         |  CAST(sum(CAST($y * $y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         |  CAST(sum(CAST($y * $yl AS DECIMAL(38,0))) AS DOUBLE) AS syyl,
         |  CAST(sum(CAST($y * $xl AS DECIMAL(38,0))) AS DOUBLE) AS syxl,
         |  CAST(sum(CAST($yl * $yl AS DECIMAL(38,0))) AS DOUBLE) AS sylyl,
         |  CAST(sum(CAST($yl * $xl AS DECIMAL(38,0))) AS DOUBLE) AS sylxl,
         |  CAST(sum(CAST($xl * $xl AS DECIMAL(38,0))) AS DOUBLE) AS sxlxl
         |FROM lagged""".stripMargin
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type FROM events
      |  WHERE event_type IN ('view', 'purchase')
      |), span AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
      |grid AS (
      |  SELECT unnest(generate_series(0, datediff('day', lo, hi))) AS k FROM span
      |), daily AS (
      |  SELECT datediff('day', lo, d) AS k, event_type, count(*) AS x
      |  FROM ev, span GROUP BY 1, 2
      |), aligned AS (
      |  SELECT g.k,
      |    coalesce(v.x, 0) AS view, coalesce(p.x, 0) AS purchase
      |  FROM grid g
      |  LEFT JOIN daily v ON v.k = g.k AND v.event_type = 'view'
      |  LEFT JOIN daily p ON p.k = g.k AND p.event_type = 'purchase'
      |), lagged AS (
      |  SELECT view, purchase,
      |    lag(view) OVER (ORDER BY k) AS vl,
      |    lag(purchase) OVER (ORDER BY k) AS pl
      |  FROM aligned QUALIFY vl IS NOT NULL
      |), m AS (
      |""".stripMargin +
      side("view_to_purchase", "purchase", "pl", "vl") +
      "\n  UNION ALL\n" +
      side("purchase_to_view", "view", "vl", "pl") +
      """
        |), f AS (
        |  SELECT direction, n,
        |    syy - sy * sy / n AS cyy,
        |    syyl - sy * syl / n AS cyyl,
        |    syxl - sy * sxl / n AS cyxl,
        |    sylyl - syl * syl / n AS cylyl,
        |    sylxl - syl * sxl / n AS cylxl,
        |    sxlxl - sxl * sxl / n AS cxlxl
        |  FROM m
        |), sol AS (
        |  SELECT direction, n, cyy, cyyl, cyxl, cylyl,
        |    cyy - cyyl * cyyl / cylyl AS ssr_r,
        |    (cyyl * cxlxl - cyxl * cylxl) / (cylyl * cxlxl - cylxl * cylxl) AS b,
        |    (cyxl * cylyl - cyyl * cylxl) / (cylyl * cxlxl - cylxl * cylxl) AS c
        |  FROM f
        |), ssr AS (
        |  SELECT direction, n, ssr_r,
        |    cyy - b * cyyl - c * cyxl AS ssr_u
        |  FROM sol
        |)
        |SELECT direction, n,
        |  (CAST(round(ssr_r, 6) AS DOUBLE) + 0.0) AS ssr_restricted,
        |  (CAST(round(ssr_u, 6) AS DOUBLE) + 0.0) AS ssr_unrestricted,
        |  (CAST(round((ssr_r - ssr_u) * (n - 3.0) / ssr_u, 4) AS DOUBLE) + 0.0) AS f_stat,
        |  CAST(4.0 AS DOUBLE) AS f_cut_5pct_df1_60,
        |  CAST(round((ssr_r - ssr_u) * (n - 3.0) / ssr_u, 4) AS DOUBLE) > 4.0 AS lagged_signal
        |FROM ssr ORDER BY direction""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bigram_pmi" -> (bigramPmi(_, _)),
    "granger_daily" -> (grangerDaily(_, _)))

  val oracles: Map[String, String] = Map(
    "bigram_pmi" -> bigramPmiSql,
    "granger_daily" -> grangerDailySql)
}
