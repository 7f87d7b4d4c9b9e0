package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Relational operator inventory (SURVEY.md §2) expressed over the driver's
  * TPC-H-ish tables. Each entry here has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Determinism rules for oracle parity:
  *   - fractional-money sums go through the cents trick
  *     (`CAST(ROUND(SUM(x*100)) AS BIGINT)`) so double association order
  *     can't flip a bit;
  *   - every query ends in an ORDER BY over a unique key set;
  *   - DuckDB's SUM(int) is HUGEINT → always cast to BIGINT in the oracle.
  */
object CoreQueries {

  import QueryShared.cents

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-class: grouped aggregation with map-side partials (SURVEY §2.4).
    "q_agg_pricing" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          cents(col("l_extendedprice")).as("sum_base_cents"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000))
            .cast("long").as("sum_disc_e4"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J2-class: two-hop FK resolution — lineitem→orders→customer→nation
    // (reference: entry→meter-reading entry→reading-type entry,
    // lib/personalgreenbutton/src/lib.rs:58-83). nation/region are tiny →
    // broadcast; orders/customer co-shuffle on their keys.
    "q_join_two_hop" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          cents(col("l_extendedprice")).as("sum_base_cents"))
        .orderBy(col("n_name"))
    }),

    // O1-class: multi-key global sort (range partition + per-partition sort;
    // reference permutation sort timeseries.rs:116-138) + top-k limit.
    "q_sort_multikey" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          col("l_quantity"))
        .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // A3-class: window partition-by + intra-group order (reference
    // sort_and_chunk, timeseries.rs:62-147): first 3 shipments per supplier.
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(
          col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_suppkey"), col("rn"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(ROUND(SUM(l_extendedprice*100)) AS BIGINT) AS sum_base_cents,
        |  CAST(ROUND(SUM(l_extendedprice*(1.0-l_discount)*10000)) AS BIGINT) AS sum_disc_e4,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_join_two_hop" ->
      """SELECT n_name,
        |  COUNT(*) AS n_rows,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(ROUND(SUM(l_extendedprice*100)) AS BIGINT) AS sum_base_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sort_multikey" ->
      """SELECT l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date, l_quantity
        |FROM lineitem
        |ORDER BY ship_date, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_window_topk" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, ship_date FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin
  )
}
