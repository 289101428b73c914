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
    """SELECT (CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS revenue
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
       |  (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS revenue
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
       |  (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS revenue
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
       |    (CAST(round(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0.0 END AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS promo_rev,
       |    (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS total_rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
       |)
       |SELECT promo_rev, total_rev,
       |  (CAST(round(100.0 * promo_rev / total_rev, 6) AS DOUBLE) + 0.0) AS promo_share
       |FROM t""".stripMargin

  /** Q2 — the minimum-cost supplier per part (no partsupp table, so
    * supply cost is re-keyed onto observed trade: a supplier's unit
    * cost for a part is its average unit price across that part's
    * lineitems). The correlated MIN subquery becomes a window-min over
    * l_partkey — a fine-grained skew-safe key, ONE exchange shared by
    * the min and the equality filter, where the groupBy-min + join-back
    * form would shuffle the same rows twice. Part filter pushes to the
    * part scan and the 2k-row dim broadcasts; region restriction
    * prunes the supplier side before the cost agg sees it. Ties on the
    * rounded min keep ALL suppliers at the minimum (Q2 semantics), so
    * no arbitrary tie-break hides inside the operator; the final
    * order is total.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val euSup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val parts = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") >= 25)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    val cost = Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(euSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("p_type"),
        col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(emit(dsum(col("l_extendedprice") / col("l_quantity")) / count(lit(1)), 6)
        .as("unit_cost"))
    cost
      .withColumn("min_cost", min(col("unit_cost")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("unit_cost") === col("min_cost"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"), col("unit_cost"))
      .orderBy(col("unit_cost"), col("p_partkey"), col("s_name"))
      .limit(50)
  }

  val q2MinCostSupplierSql: String =
    """WITH pc AS (
      |  SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
      |    (CAST(round(SUM(CAST(l_extendedprice / l_quantity AS DECIMAL(38,6))) / count(*), 6) AS DOUBLE) + 0.0) AS unit_cost
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_type = 'LARGE' AND p_size >= 25 AND r_name = 'EUROPE'
      |  GROUP BY 1, 2, 3, 4, 5
      |),
      |mc AS (SELECT p_partkey, min(unit_cost) AS min_cost FROM pc GROUP BY 1)
      |SELECT pc.p_partkey, p_brand, s_name, n_name, unit_cost
      |FROM pc JOIN mc ON pc.p_partkey = mc.p_partkey AND pc.unit_cost = mc.min_cost
      |ORDER BY unit_cost, pc.p_partkey, s_name LIMIT 50""".stripMargin

  /** Q11 — "important stock": per-part traded value from one region's
    * suppliers, kept only when it exceeds a FRACTION of the global
    * total — the scalar-subquery HAVING. The total is a single-row
    * broadcast (sum of the per-part DECIMAL sums — associative, so it
    * equals the oracle's flat sum bit-for-bit), never a second scan of
    * the fact table; the threshold compare runs on ROUNDED doubles so
    * both engines cut the identical frontier. One shuffle on
    * l_partkey; the supplier restriction joins a 100-row dim the
    * planner broadcasts.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val asiaSup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, dir)
      .join(asiaSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice")).as("value_dec"))
    val total = perPart.agg(
      emit(lit(0.0008) * sum(col("value_dec")).cast("double"), 4).as("threshold"))
    perPart
      .crossJoin(broadcast(total))
      .select(col("l_partkey"), emit(col("value_dec")).as("value"), col("threshold"))
      .filter(col("value") > col("threshold"))
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11ImportantPartsSql: String =
    """WITH pp AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS value_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1
      |),
      |t AS (
      |  SELECT (CAST(round(0.0008 * CAST(SUM(value_dec) AS DOUBLE), 4) AS DOUBLE) + 0.0) AS threshold
      |  FROM pp
      |)
      |SELECT l_partkey, (CAST(round(value_dec, 4) AS DOUBLE) + 0.0) AS value
      |FROM pp, t
      |WHERE CAST(round(value_dec, 4) AS DOUBLE) > threshold
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** Q15 — the top supplier(s) by quarterly revenue: the max-equality
    * scalar subquery. Per-supplier revenue aggregates once (date
    * filter pushed to the scan, map-side combine onto ~|suppliers|
    * rows); the max is a single-row broadcast compared against the
    * ROUNDED revenue, so the "top" frontier — including genuine ties,
    * which Q15 must keep — is engine-deterministic. The supplier-name
    * join happens AFTER the max cut, on the one surviving row.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val perSup = Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(emit(dsum(rev)).as("total_rev"))
    val maxRev = perSup.agg(max(col("total_rev")).as("max_rev"))
    perSup
      .crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    s"""WITH ps AS (
       |  SELECT l_suppkey,
       |    (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY 1
       |)
       |SELECT s_suppkey, s_name, total_rev
       |FROM ps JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM ps)
       |ORDER BY s_suppkey""".stripMargin

  /** Q17 — small-quantity-order revenue: the correlated per-group
    * average. Restricting to the brand FIRST (pushed filter + 2k-row
    * part broadcast) means the per-part average aggregates only the
    * brand's lineitems — correlation is per part, so pre-filtering
    * changes nothing — and the avg-side relation is bounded by the
    * brand's part count, which AQE broadcasts back onto the same
    * filtered stream. The quantity cut compares against the ROUNDED
    * half-average; one final single-row sum.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val liBrand = Tables.lineitem(s, dir)
      .join(
        broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#3")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val avgQty = liBrand
      .groupBy(col("l_partkey").as("ak_partkey"))
      .agg(emit(lit(0.5) * (dsum(col("l_quantity")) / count(lit(1))).cast("double"), 6)
        .as("half_avg_qty"))
    liBrand
      .join(avgQty, col("l_partkey") === col("ak_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(emit(dsum(col("l_extendedprice")) / lit(7.0), 4).as("avg_yearly"))
  }

  val q17SmallQuantitySql: String =
    """WITH lb AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3'
      |),
      |aq AS (
      |  SELECT l_partkey AS ak_partkey,
      |    (CAST(round(0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) / count(*) AS DOUBLE), 6) AS DOUBLE) + 0.0) AS half_avg_qty
      |  FROM lb GROUP BY 1
      |)
      |SELECT (CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) / 7.0, 4) AS DOUBLE) + 0.0) AS avg_yearly
      |FROM lb JOIN aq ON l_partkey = ak_partkey
      |WHERE l_quantity < half_avg_qty""".stripMargin

  /** Q8 — one nation's market share inside a region's market, per
    * order year: conditional sum over supplier nation / total, both in
    * ONE aggregate pass (never two scans). Customer-region and
    * part-type predicates prune via broadcast dims before the fact
    * joins; the share divides two already-rounded doubles (the q14
    * device) so both engines run the identical IEEE division. Grouping
    * key is the order year — bounded output, map-side combine.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val amerCust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .select(col("c_custkey"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(s, dir)
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(amerCust, col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        emit(dsum(when(col("supp_nation") === "NATION_1", rev).otherwise(lit(0.0))))
          .as("nation_rev"),
        emit(dsum(rev)).as("total_rev"))
      .select(
        col("o_year"), col("nation_rev"), col("total_rev"),
        emit(col("nation_rev") / col("total_rev"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    s"""WITH t AS (
       |  SELECT year(o_orderdate) AS o_year,
       |    (CAST(round(SUM(CAST(CASE WHEN n2.n_name = 'NATION_1' THEN $revSql ELSE 0.0 END AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS nation_rev,
       |    (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS total_rev
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1
       |)
       |SELECT o_year, nation_rev, total_rev,
       |  (CAST(round(nation_rev / total_rev, 6) AS DOUBLE) + 0.0) AS mkt_share
       |FROM t ORDER BY o_year""".stripMargin

  /** Q9 — product-line profit by supplier nation and order year, with
    * the cost leg re-keyed onto the part's retail price (no partsupp):
    * profit = revenue − 0.4·retailprice·quantity, a per-row double
    * expression both engines evaluate identically before the exact
    * DECIMAL sum. The p_name substring filter prunes the 2k-row part
    * dim in its broadcast; output is bounded at |nations|×|years|.
    */
  def q9ProfitByNation(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir).filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val profit = rev - lit(0.4) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(s, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(emit(dsum(profit)).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q9ProfitByNationSql: String =
    s"""SELECT n_name, year(o_orderdate) AS o_year,
       |  (CAST(round(SUM(CAST($revSql - 0.4 * p_retailprice * l_quantity AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  /** Q19 — the disjunctive-predicate join: three (brand, size,
    * quantity) OR-blocks over lineitem⋈part. The brand/size legs of
    * the disjunction reference only part columns, so their OR-union
    * prunes the broadcast dim at its scan; the mixed residual runs as
    * a post-join filter over rows that already matched some block's
    * dim half — the planner cannot push a cross-table OR further, and
    * that's the shape under test. Single-row revenue out.
    */
  def q19DisjunctiveJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(1, 25)))
      .select(col("p_partkey"), col("p_brand"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1.0, 20.0)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10.0, 30.0)) ||
          (col("p_brand") === "Brand#24" && col("l_quantity").between(20.0, 40.0)))
      .agg(emit(dsum(rev)).as("revenue"))
  }

  val q19DisjunctiveJoinSql: String =
    s"""SELECT (CAST(round(SUM(CAST($revSql AS DECIMAL(38,6))), 4) AS DOUBLE) + 0.0) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 20.0)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10.0 AND 30.0)
       |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20.0 AND 40.0)""".stripMargin

  /** Q20 — dominant suppliers: suppliers shipping MORE THAN HALF of a
    * part's total 1997 volume, counted per supplier (no partsupp
    * availqty, so the half-of-total correlation runs supplier-share vs
    * part total). Per-(part, supplier) sums aggregate first; the part
    * total is a window-sum over the SAME fine-grained partkey exchange
    * (no join-back); the dominance test compares 2·pair > total in
    * exact DECIMAL — no rounding, no float frontier at all. The
    * supplier-name join happens after the per-supplier count, on at
    * most |suppliers| rows.
    */
  def q20DominantSuppliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("pair_qty"))
    pairs
      .withColumn("part_qty", sum(col("pair_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("pair_qty") * lit(2) > col("part_qty"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_parts"))
      .orderBy(col("s_suppkey"))
  }

  val q20DominantSuppliersSql: String =
    """WITH pairs AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(38,6))) AS pair_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2
      |),
      |shares AS (
      |  SELECT l_suppkey,
      |    SUM(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty, pair_qty
      |  FROM pairs
      |),
      |dom AS (
      |  SELECT l_suppkey, count(*) AS n_parts FROM shares
      |  WHERE pair_qty * 2 > part_qty GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, n_name, n_parts
      |FROM dom JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin

  /** #138 supplier_scorecard — the WIDE operational report: every
    * supplier KPI in ONE aggregate pass over the fact stream
    * (return rate, slow-ship rate, revenue, avg discount), plus each
    * supplier's share of total revenue. The shape under test is
    * many-conditional-measures-one-scan: each KPI is a conditional
    * sum inside the same groupBy, so adding a metric costs zero extra
    * scans or shuffles — the difference between a scorecard that runs
    * nightly and five queries that each re-read 100 TB. Slow-ship
    * joins orders only for o_orderdate (fact-fact on the natural
    * orderkey, hint-free); the 25-row nation dim broadcasts; the
    * revenue total is a single-row broadcast derived FROM the
    * per-supplier aggregate (no second fact scan — the q11 device);
    * share divides already-rounded doubles (the q14 device); top-25
    * is a TakeOrderedAndProject on rounded revenue with suppkey
    * tie-break.
    */
  def supplierScorecard(s: SparkSession, dir: String): DataFrame =
    scorecardTail(s, dir, scorecardPartials(scorecardLi(s, dir)))

  /** The scorecard's fact input: lineitem with its order date. */
  private[graft] def scorecardLi(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))

  /** Per-supplier ALGEBRAIC partials (counts + exact decimal sums):
    * every scorecard measure derives from these, so
    * merge(history, delta) ≡ recompute — the property
    * scorecard_incremental (Round8Ops) is built on.
    */
  private[graft] def scorecardPartials(li: DataFrame): DataFrame =
    li.groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("n_slow"),
        dsum(rev).as("rev_d"),
        dsum(col("l_discount")).as("disc_d"))

  /** Rates + revenue share + top-25 over any per-supplier partials. */
  private[graft] def scorecardTail(s: SparkSession, dir: String, per: DataFrame): DataFrame = {
    val total = per.agg(emit(sum(col("rev_d"))).as("total_rev"))
    per
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .crossJoin(broadcast(total))
      .select(
        col("s_suppkey"), col("s_name"), col("n_name").as("nation"),
        col("n_lines"),
        emit(col("n_returned") / col("n_lines"), 6).as("return_rate"),
        emit(col("n_slow") / col("n_lines"), 6).as("slow_rate"),
        round(col("disc_d").cast("double") / col("n_lines"), 6).as("avg_discount"),
        emit(col("rev_d")).as("revenue"),
        col("total_rev"))
      .withColumn("rev_share", emit(col("revenue") / col("total_rev"), 6))
      .drop("total_rev")
      .orderBy(col("revenue").desc, col("s_suppkey"))
      .limit(25)
  }

  val supplierScorecardSql: String =
    s"""WITH per AS (
       |  SELECT l_suppkey, count(*) AS n_lines,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       |    CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
       |    SUM(CAST($revSql AS DECIMAL(38,6))) AS rev_d,
       |    SUM(CAST(l_discount AS DECIMAL(38,6))) AS disc_d
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1
       |),
       |t AS (SELECT (CAST(round(SUM(rev_d), 4) AS DOUBLE) + 0.0) AS total_rev FROM per)
       |SELECT s_suppkey, s_name, n_name AS nation, n_lines,
       |  (CAST(round(n_returned / n_lines, 6) AS DOUBLE) + 0.0) AS return_rate,
       |  (CAST(round(n_slow / n_lines, 6) AS DOUBLE) + 0.0) AS slow_rate,
       |  round(CAST(disc_d AS DOUBLE) / n_lines, 6) AS avg_discount,
       |  (CAST(round(rev_d, 4) AS DOUBLE) + 0.0) AS revenue,
       |  (CAST(round(CAST(round(rev_d, 4) AS DOUBLE) / total_rev, 6) AS DOUBLE) + 0.0) AS rev_share
       |FROM per
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |CROSS JOIN t
       |ORDER BY revenue DESC, s_suppkey LIMIT 25""".stripMargin

  /** #146 discount_uplift — does discounting move volume, per brand:
    * Pearson correlation of (l_discount, l_quantity) across a brand's
    * order lines, beside the mean discount and mean quantity (the
    * pricing team's first elasticity read; a brand with deep discounts
    * and r≈0 is burning margin). Discounts and quantities are
    * fixed-point decimals, so every moment (Σx, Σy, Σxy, Σx², Σy²)
    * sums EXACT decimals with map-side combine — one brand-key
    * aggregate over one scan (2k-row part dim broadcast), |brands|
    * bounded out; r is one double expression over exact values (the
    * zipf-slope device), σ=0 → r=0. Means use the avg_bal device.
    */
  def discountUplift(s: SparkSession, dir: String): DataFrame = {
    // fan the fact scan (r11, StageProfile): the fused
    // scan→bcast-join→6-decimal-sum partial agg ran 2.1 s of CPU on
    // the scan's 3 tasks while 29 cores idled — the price_elasticity
    // shape exactly; decimal sums are order-free so the result is
    // unchanged (fan is the identity at production split counts)
    val li = graft.GraftSession.fan(Tables.lineitem(s, dir), col("l_partkey"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val m = li
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_discount")).as("sx"),
        dsum(col("l_quantity")).as("sy"),
        dsum(col("l_discount") * col("l_quantity")).as("sxy"),
        dsum(col("l_discount") * col("l_discount")).as("sxx"),
        dsum(col("l_quantity") * col("l_quantity")).as("syy"))
    // cross-products run in DOUBLE over the exact decimal sums: the
    // two engines clip decimal×decimal precision differently (Spark
    // rounds the scale, DuckDB widens or errors), while double
    // products of identical inputs are bit-identical IEEE
    def d(c: Column): Column = c.cast("double")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
      sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
    m.select(
        col("p_brand"), col("n"),
        round(col("sx").cast("double") / col("n"), 6).as("avg_discount"),
        round(col("sy").cast("double") / col("n"), 6).as("avg_quantity"),
        when(den === 0.0, lit(0.0)).otherwise(emit(num / den, 6)).as("r_disc_qty"))
      .orderBy(col("p_brand"))
  }

  val discountUpliftSql: String =
    """WITH m AS (
      |  SELECT p_brand, count(*) AS n,
      |    SUM(CAST(l_discount AS DECIMAL(38,6))) AS sx,
      |    SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sy,
      |    SUM(CAST(l_discount * l_quantity AS DECIMAL(38,6))) AS sxy,
      |    SUM(CAST(l_discount * l_discount AS DECIMAL(38,6))) AS sxx,
      |    SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS syy
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1
      |)
      |SELECT p_brand, n,
      |  round(CAST(sx AS DOUBLE) / n, 6) AS avg_discount,
      |  round(CAST(sy AS DOUBLE) / n, 6) AS avg_quantity,
      |  CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |            sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN 0.0
      |       ELSE (CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |         (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |          sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS DOUBLE) + 0.0) END AS r_disc_qty
      |FROM m ORDER BY p_brand""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "discount_uplift" -> (discountUplift(_, _)),
    "supplier_scorecard" -> (supplierScorecard(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q9_profit_by_nation" -> (q9ProfitByNation(_, _)),
    "q19_disjunctive_join" -> (q19DisjunctiveJoin(_, _)),
    "q20_dominant_suppliers" -> (q20DominantSuppliers(_, _)),
    "q2_min_cost_supplier" -> (q2MinCostSupplier(_, _)),
    "q11_important_parts" -> (q11ImportantParts(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q17_small_quantity" -> (q17SmallQuantity(_, _)),
    "q6_revenue_delta" -> (q6RevenueDelta(_, _)),
    "q7_nation_volume" -> (q7NationVolume(_, _)),
    "q10_returned_items" -> (q10ReturnedItems(_, _)),
    "q14_promo_share" -> (q14PromoShare(_, _)))

  val oracles: Map[String, String] = Map(
    "discount_uplift" -> discountUpliftSql,
    "supplier_scorecard" -> supplierScorecardSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_profit_by_nation" -> q9ProfitByNationSql,
    "q19_disjunctive_join" -> q19DisjunctiveJoinSql,
    "q20_dominant_suppliers" -> q20DominantSuppliersSql,
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_quantity" -> q17SmallQuantitySql,
    "q6_revenue_delta" -> q6RevenueDeltaSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q14_promo_share" -> q14PromoShareSql)
}
