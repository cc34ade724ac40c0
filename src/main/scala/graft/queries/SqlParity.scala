package graft.queries

/** Spark-SQL texts for representative catalog queries — the thin SQL
  * layer of the engine (SURVEY §0): the same computation a user would
  * type into `spark.sql(...)` against registered table views. The
  * DataFrame implementation stays the engine of record (it is what the
  * driver's oracle gates); SqlParitySpec proves the SQL surface returns
  * IDENTICAL rows, so callers can freely mix the two.
  *
  * Dialect notes vs the DuckDB oracle strings: Spark spells integer
  * division `div`, timestamps `TIMESTAMP '…'`, and supports
  * GROUPING(...)/ROLLUP/CUBE natively with the same bitmask order.
  */
object SqlParity {

  import Dsl._

  /** query name → Spark SQL over temp views named like the test tables. */
  val sql: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${decSumSql("l_quantity")} AS sum_qty,
        ${decSumSql("l_extendedprice")} AS sum_base_price,
        ${decSumExprSql(s"${d2Sql("l_extendedprice")} * (1 - ${drSql("l_discount")})")} AS sum_disc_price,
        ${decSumExprSql(s"${d2Sql("l_extendedprice")} * (1 - ${drSql("l_discount")}) * (1 + ${drSql("l_tax")})")} AS sum_charge,
        ${decAvgSql("l_quantity")} AS avg_qty,
        ${decAvgSql("l_extendedprice")} AS avg_price,
        ${decAvgSql("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2000-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q06_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "q07_semi_join" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "q19_top_k" -> s"""
      SELECT o_custkey, ${decSumSql("o_totalprice")} AS spend,
        COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
      ORDER BY spend DESC, o_custkey ASC LIMIT 50""",

    "q23_rollup" -> s"""
      SELECT r_name, n_name, COUNT(*) AS n_customers,
        ${decSumSql("c_acctbal")} AS sum_acctbal,
        CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "q30_cube" -> s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        ${decSumSql("o_totalprice")} AS revenue,
        CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
          AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        o_orderpriority ASC NULLS FIRST""",
  )
}
