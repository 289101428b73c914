package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleMath, Tables}

/** Round-12 operators — the governance/compliance layer and the
  * statistically-careful reporting a production data platform runs on
  * top of its pipelines: right-to-be-forgotten cascade audits, a
  * differentially-private count release (deterministic noise so the
  * oracle can verify the mechanism), and Wilson score intervals for
  * rate reports (the "is this conversion change real" primitive).
  * Every cross-row float total follows the house order-free rule
  * (DECIMAL sums or exact integers), and per-row float chains mirror
  * the oracle's operation ORDER exactly so 6-dp emits are identical.
  */
object Round12Ops {
  import OracleMath._

  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** #304 user_erasure_audit — the right-to-be-forgotten cascade
    * (GDPR Art. 17): given a batch of erasure requests (here the
    * deterministic `id % 13 = 0` slice of each id space), report per
    * table how many rows the erasure would delete and keep, BEFORE
    * running the destructive sweep — the audit a data-protection
    * officer signs off on. The cascade is the star schema's FK order:
    * requested customers → their orders → those orders' lineitems;
    * `events` is keyed by its own user-id space. Scale shape: the
    * request set is a tiny relation (a fraction of one dimension), so
    * every membership test is a broadcast semi join against it — and
    * the lineitem cascade joins only the DELETED orders' keys
    * (runtime Bloom pruning applies at 100 TB), never orders×lineitem.
    * Each table contributes one conditional aggregate over one scan;
    * the output is a bounded 4-row report. Exact oracle.
    */
  def userErasureAudit(s: SparkSession, dir: String): DataFrame = {
    val requests = Tables.customer(s, dir)
      .filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("req_key"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(requests), col("c_custkey") === col("req_key"), "left")
      .agg(
        sum(when(col("req_key").isNotNull, 1L).otherwise(0L)).as("rows_delete"),
        sum(when(col("req_key").isNull, 1L).otherwise(0L)).as("rows_keep"))
      .select(lit("customer").as("entity"), col("rows_delete"), col("rows_keep"))
    val deletedOrders = Tables.orders(s, dir)
      .join(broadcast(requests), col("o_custkey") === col("req_key"), "left_semi")
      .select(col("o_orderkey").as("del_okey"))
    val ord = Tables.orders(s, dir)
      .join(broadcast(requests), col("o_custkey") === col("req_key"), "left")
      .agg(
        sum(when(col("req_key").isNotNull, 1L).otherwise(0L)).as("rows_delete"),
        sum(when(col("req_key").isNull, 1L).otherwise(0L)).as("rows_keep"))
      .select(lit("orders").as("entity"), col("rows_delete"), col("rows_keep"))
    val li = Tables.lineitem(s, dir)
      .join(deletedOrders, col("l_orderkey") === col("del_okey"), "left")
      .agg(
        sum(when(col("del_okey").isNotNull, 1L).otherwise(0L)).as("rows_delete"),
        sum(when(col("del_okey").isNull, 1L).otherwise(0L)).as("rows_keep"))
      .select(lit("lineitem").as("entity"), col("rows_delete"), col("rows_keep"))
    val ev = events(s, dir)
      .agg(
        sum(when(col("user_id") % 13 === 0, 1L).otherwise(0L)).as("rows_delete"),
        sum(when(col("user_id") % 13 =!= 0, 1L).otherwise(0L)).as("rows_keep"))
      .select(lit("events").as("entity"), col("rows_delete"), col("rows_keep"))
    cust.unionByName(ord).unionByName(li).unionByName(ev).orderBy(col("entity"))
  }

  val userErasureAuditSql: String =
    """WITH req AS (SELECT c_custkey AS req_key FROM customer WHERE c_custkey % 13 = 0),
      |del_orders AS (
      |  SELECT o_orderkey AS del_okey FROM orders
      |  WHERE o_custkey IN (SELECT req_key FROM req)
      |)
      |SELECT * FROM (
      |  SELECT 'customer' AS entity,
      |    CAST(sum(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_delete,
      |    CAST(sum(CASE WHEN c_custkey % 13 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS rows_keep
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders',
      |    CAST(sum(CASE WHEN o_custkey IN (SELECT req_key FROM req) THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN o_custkey IN (SELECT req_key FROM req) THEN 0 ELSE 1 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem',
      |    CAST(sum(CASE WHEN l_orderkey IN (SELECT del_okey FROM del_orders) THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN l_orderkey IN (SELECT del_okey FROM del_orders) THEN 0 ELSE 1 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'events',
      |    CAST(sum(CASE WHEN user_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN user_id % 13 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |  FROM events
      |) ORDER BY entity""".stripMargin

  /** #305 dp_noisy_counts — an (ε=1)-differentially-private release of
    * the per-type event counts under the Laplace mechanism (Dwork,
    * McSherry, Nissim & Smith 2006): count + Lap(Δ/ε) with sensitivity
    * Δ=1 for a per-user... per-ROW count here (the mechanism, not a
    * privacy proof over user contribution bounds). The noise draw is
    * DETERMINISTIC so the release is auditable and the oracle can
    * verify the mechanism itself: u = (first-6-hex of
    * md5('dp:'||type) + 0.5) / 16^6 ∈ (0,1), the house md5-uniform
    * device, then the Laplace inverse CDF
    * −b·sign(u−½)·ln(1−2|u−½|). In production the same column
    * expression reads its 6 hex digits from a per-release secret salt;
    * nothing else changes. Scale: ONE map-side-combinable count per
    * type — |types| rows of noise arithmetic after the aggregate,
    * free at any volume. Exact oracle: identical md5 and ln argument
    * both engines, 6-dp emit.
    */
  def dpNoisyCounts(s: SparkSession, dir: String): DataFrame = {
    val b = 1.0 // Δ/ε = 1/1
    val u = (conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 6), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(16777216.0)
    val noise =
      when(u < 0.5, lit(b) * log(lit(2.0) * u))
        .otherwise(lit(-b) * log(lit(2.0) * (lit(1.0) - u)))
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("event_type"),
        lit(1.0).as("epsilon"),
        emit(col("n").cast("double") + noise, 6).as("noisy_count"))
      .orderBy(col("event_type"))
  }

  val dpNoisyCountsSql: String =
    """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |u AS (
      |  SELECT event_type, n,
      |    (CAST(concat('0x', substr(md5('dp:' || event_type), 1, 6)) AS BIGINT) + 0.5)
      |      / 16777216.0 AS u
      |  FROM c
      |)
      |SELECT event_type, CAST(1.0 AS DOUBLE) AS epsilon,
      |  CAST(round(CAST(n AS DOUBLE) +
      |    CASE WHEN u < 0.5 THEN 1.0 * ln(2.0 * u)
      |         ELSE -1.0 * ln(2.0 * (1.0 - u)) END, 6) AS DOUBLE) AS noisy_count
      |FROM u ORDER BY event_type""".stripMargin

  /** #306 wilson_ci_report — per-type success-rate report with Wilson
    * score intervals (Wilson 1927), the binomial CI that behaves at
    * small n and extreme rates where the naive ±z√(p̂q̂/n) interval
    * escapes [0,1]: success := value ≥ 50 (the engagement threshold),
    * z = 1.96. This is the primitive under every "did the rate really
    * move" call in an experiment/monitoring readout. Scale: one
    * conditional count aggregate per type (map-side combine), then
    * |types| rows of closed-form arithmetic — nothing after the agg
    * scales with data. Exact oracle: n and k are exact longs; the
    * float chain (÷, ×, sqrt — all correctly-rounded IEEE ops) is
    * written in the identical order both engines, 6-dp emit.
    */
  def wilsonCiReport(s: SparkSession, dir: String): DataFrame = {
    val z = 1.96
    val agg = events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val margin = lit(z) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD)
    agg.select(
      col("event_type"), col("n"), col("k"),
      emit(p, 6).as("rate"),
      emit((center - margin) / denom, 6).as("ci_lo"),
      emit((center + margin) / denom, 6).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  val wilsonCiReportSql: String =
    """WITH agg AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM events GROUP BY 1
      |),
      |f AS (
      |  SELECT event_type, n, k,
      |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    CAST(n AS DOUBLE) AS nd,
      |    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
      |  FROM agg
      |)
      |SELECT event_type, n, k,
      |  CAST(round(p, 6) AS DOUBLE) AS rate,
      |  CAST(round((p + z2 / (2.0 * nd)
      |        - CAST(1.96 AS DOUBLE) * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd))
      |      / (1.0 + z2 / nd), 6) AS DOUBLE) AS ci_lo,
      |  CAST(round((p + z2 / (2.0 * nd)
      |        + CAST(1.96 AS DOUBLE) * sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd))
      |      / (1.0 + z2 / nd), 6) AS DOUBLE) AS ci_hi
      |FROM f ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "user_erasure_audit" -> (userErasureAudit(_, _)),
    "dp_noisy_counts" -> (dpNoisyCounts(_, _)),
    "wilson_ci_report" -> (wilsonCiReport(_, _)))

  val oracles: Map[String, String] = Map(
    "user_erasure_audit" -> userErasureAuditSql,
    "dp_noisy_counts" -> dpNoisyCountsSql,
    "wilson_ci_report" -> wilsonCiReportSql)
}
