package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q2_filter_pushdown" -> (Relational.q2FilterPushdown _),
    "q3_topn_join" -> (Relational.q3TopnJoin _),
    "q4_multijoin_rollup" -> (Relational.q4MultijoinRollup _),
    "q5_taxonomy_rollup" -> (Relational.q5TaxonomyRollup _),
    "q6_contingency" -> (Relational.q6Contingency _),
    "q7_abundance_matrix" -> (Relational.q7AbundanceMatrix _),
    "q8_window_rank" -> (Relational.q8WindowRank _),
    "q9_semijoin" -> (Relational.q9Semijoin _),
    "q10_antijoin" -> (Relational.q10Antijoin _),
    "q11_outer_join" -> (Relational.q11OuterJoin _),
    "q12_distinct_union" -> (Relational.q12DistinctUnion _),
    "q13_diversity" -> (Relational.q13Diversity _),
    "q14_relative_abundance" -> (Relational.q14RelativeAbundance _),
    "q15_having" -> (Relational.q15Having _),
    "q16_conditional_agg" -> (Relational.q16ConditionalAgg _),
    "q17_in_subquery" -> (Relational.q17InSubquery _),
    "q18_sql_api" -> (Relational.q18SqlApi _),
    "q19_grouping_sets" -> (Relational.q19GroupingSets _),
    "q20_percentiles" -> (Relational.q20Percentiles _),
  )

  /** DuckDB-equivalent ANSI SQL per query key (same parquet tables,
    * registered under their bare table names). Aliases match the Spark
    * output columns exactly — the driver's compare requires it. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND l_quantity > 45 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",
    "q3_topn_join" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",
    "q4_multijoin_rollup" -> """
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM region
      JOIN nation ON r_regionkey = n_regionkey
      JOIN customer ON n_nationkey = c_nationkey
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",
    "q5_taxonomy_rollup" -> """
      SELECT p_type, p_brand,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS abundance,
        count(*) AS n_obs
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_brand
      ORDER BY p_type, p_brand""",
    "q6_contingency" -> """
      SELECT c_mktsegment,
        count(CASE WHEN r_name = 'AFRICA' THEN 1 END) AS "AFRICA",
        count(CASE WHEN r_name = 'AMERICA' THEN 1 END) AS "AMERICA",
        count(CASE WHEN r_name = 'ASIA' THEN 1 END) AS "ASIA",
        count(CASE WHEN r_name = 'EUROPE' THEN 1 END) AS "EUROPE",
        count(CASE WHEN r_name = 'MIDDLE EAST' THEN 1 END) AS "MIDDLE EAST"
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q7_abundance_matrix" -> """
      SELECT n_name,
        CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "ECONOMY",
        CAST(sum(CASE WHEN p_type = 'LARGE' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "LARGE",
        CAST(sum(CASE WHEN p_type = 'MEDIUM' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "MEDIUM",
        CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "PROMO",
        CAST(sum(CASE WHEN p_type = 'SMALL' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "SMALL",
        CAST(sum(CASE WHEN p_type = 'STANDARD' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "STANDARD"
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",
    "q8_window_rank" -> """
      WITH rev AS (
        SELECT r_name, p_brand,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, p_brand)
      SELECT r_name, p_brand, revenue, rnk FROM (
        SELECT r_name, p_brand, revenue,
          CAST(row_number() OVER (PARTITION BY r_name ORDER BY revenue DESC, p_brand) AS INT) AS rnk
        FROM rev) t
      WHERE rnk <= 3
      ORDER BY r_name, rnk""",
    "q9_semijoin" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "q10_antijoin" -> """
      SELECT c_custkey, c_name, c_acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""",
    "q11_outer_join" -> """
      SELECT c_custkey, c_mktsegment,
        count(o_orderkey) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
      ORDER BY c_custkey""",
    "q12_distinct_union" -> """
      SELECT p_type AS v FROM part
      UNION
      SELECT o_orderpriority AS v FROM orders
      ORDER BY v""",
    "q13_diversity" -> """
      WITH by_type AS (
        SELECT c_mktsegment, p_type, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, p_type),
      shares AS (
        SELECT c_mktsegment,
          CAST(qty AS DOUBLE) / CAST(sum(qty) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS p
        FROM by_type)
      SELECT c_mktsegment, count(*) AS richness,
        round(-sum(p * ln(p)), 6) AS shannon
      FROM shares
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q14_relative_abundance" -> """
      WITH per_brand AS (
        SELECT p_type, p_brand, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type, p_brand)
      SELECT p_type, p_brand,
        CAST(qty AS DOUBLE) AS abundance,
        round(CAST(qty AS DOUBLE) / CAST(sum(qty) OVER (PARTITION BY p_type) AS DOUBLE), 6) AS rel_abundance
      FROM per_brand
      ORDER BY p_type, p_brand""",
    "q15_having" -> """
      SELECT p_brand,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        count(*) AS n_obs
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50000.0
      ORDER BY p_brand""",
    "q16_conditional_agg" -> """
      SELECT l_linestatus,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_qty,
        CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS kept_qty,
        count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
        count(*) AS n_total
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",
    "q17_in_subquery" -> """
      SELECT l_returnflag,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
        count(*) AS n_items
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q18_sql_api" -> """
      SELECT n_name,
        CAST(year(o_orderdate) AS INT) AS oyear,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'F'
      GROUP BY n_name, year(o_orderdate)
      ORDER BY n_name, oyear""",
    "q19_grouping_sets" -> """
      SELECT coalesce(p_type, 'ALL') AS lvl_type,
        coalesce(p_brand, 'ALL') AS lvl_brand,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS abundance
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand)
      ORDER BY lvl_type, lvl_brand""",
    "q20_percentiles" -> """
      SELECT o_orderpriority,
        round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        count(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
  )
}
