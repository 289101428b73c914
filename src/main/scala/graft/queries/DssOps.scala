package graft.queries

import graft.{OracleMath, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remainder of the classic decision-support sweep (TPC-H shapes
  * adapted to the synthetic star schema — no partsupp table, so the
  * partsupp-bearing queries re-key their correlation onto lineitem).
  * Together with q1/q3/q5/q4/q13/q16/q18/q21/q22 these cover every
  * distinct TPC-H plan shape expressible over the available columns:
  * single-pass filter-agg (Q6), nation-pair volume (Q7), market share
  * (Q8), profit rollup (Q9), returned-item top-k (Q10), global-
  * threshold HAVING (Q11), conditional share (Q14), max-equality
  * scalar subquery (Q15), correlated per-group average (Q17),
  * disjunctive OR-block join (Q19), and half-of-total exists (Q20).
  *
  * Q12's ship-mode columns don't exist in the synthetic schema and its
  * plan shape (conditional counting over a semi window) is already
  * covered by q4/q13, so it is deliberately out of scope.
  */
object DssOps {
  import OracleMath._

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revSql = "l_extendedprice * (1.0 - l_discount)"

  /** Q6 — the pure filter-and-sum forecast: one pass over the fact
    * table, no join, no shuffle beyond the single-row final agg. The
    * point at 100 TB is that ALL three predicates (date range,
    * discount band, quantity cap) reach the parquet scan as pushed
    * filters, so row groups outside the ship-date window never leave
    * storage; the partial sums combine map-side and one row moves.
    */
  def q6RevenueDelta(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
      .agg(emit(dsum(col("l_extendedprice") * col("l_discount"))).as("revenue"))

  val q6RevenueDeltaSql: String =
    """SELECT CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin

  /** Q7 — volume shipped between a nation PAIR, per direction and
    * ship year. The supplier and customer nations come from two
    * broadcast copies of the 25-row nation dim (aliased columns, no
    * self-join ambiguity); the pair predicate filters each broadcast
    * to the two nations BEFORE the join, so the fact rows that survive
    * the supplier/customer joins are already pair-restricted — the
    * disjunction never runs over the full fact stream. One shuffle for
    * the (supp_nation, cust_nation, year) agg.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_8")
    val suppNation = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(emit(dsum(rev)).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7NationVolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year,
       |  CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE n1.n_name IN ('NATION_3', 'NATION_8')
       |  AND n2.n_name IN ('NATION_3', 'NATION_8')
       |  AND n1.n_name <> n2.n_name
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q10 — top 20 customers by revenue lost to returns in a quarter.
    * The return-flag and order-date predicates push into their scans;
    * the 25-row nation dim broadcasts; orders/customer joins stay
    * hint-free for AQE. The final cut is a TakeOrderedAndProject on
    * the ROUNDED revenue (both engines rank the identical 4-dp
    * doubles, so the top-20 frontier is deterministic) with c_custkey
    * as the total tie-break.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(
        col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(emit(dsum(rev)).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q14 — promo revenue share for one month: a conditional sum and a
    * total in the SAME single aggregate pass (one scan, one broadcast
    * of the 2k-row part dim, map-side partial sums, one row out). The
    * share divides the two already-rounded doubles so both engines do
    * the identical IEEE division — never decimal division, whose
    * result scale rules differ across engines.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        emit(dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))).as("promo_rev"),
        emit(dsum(rev)).as("total_rev"))
      .select(
        col("promo_rev"),
        col("total_rev"),
        emit(lit(100.0) * col("promo_rev") / col("total_rev"), 6).as("promo_share"))

  val q14PromoShareSql: String =
    s"""WITH t AS (
       |  SELECT
       |    CAST(round(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0.0 END AS DECIMAL(38,6))), 4) AS DOUBLE) AS promo_rev,
       |    CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) AS total_rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
       |)
       |SELECT promo_rev, total_rev,
       |  CAST(round(100.0 * promo_rev / total_rev, 6) AS DOUBLE) AS promo_share
       |FROM t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_revenue_delta" -> (q6RevenueDelta(_, _)),
    "q7_nation_volume" -> (q7NationVolume(_, _)),
    "q10_returned_items" -> (q10ReturnedItems(_, _)),
    "q14_promo_share" -> (q14PromoShare(_, _)))

  val oracles: Map[String, String] = Map(
    "q6_revenue_delta" -> q6RevenueDeltaSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q14_promo_share" -> q14PromoShareSql)
}
