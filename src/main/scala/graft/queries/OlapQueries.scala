package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** OLAP surface beyond the reference's own inventory — distinct
  * aggregation, ROLLUP, pivot, and set operations — so the engine covers
  * what an analytics user expects even though the reference never issues
  * them (SURVEY §2.5 "no grouping sets/cube/rollup, no distinct-count").
  * Same determinism discipline as CoreQueries.
  */
object OlapQueries {
  private type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // COUNT(DISTINCT) — the distinct-aggregation plan shape (Expand +
    // two-phase aggregate).
    "q41_count_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // ROLLUP over the region/nation hierarchy (grouping sets). Expressed
    // through the spark.sql surface: Dataset Column refs to grouping
    // columns after the rollup Expand trip the ambiguous-self-join
    // detector in Spark 4.
    "q42_rollup" -> ((s, d) => {
      customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .createOrReplaceTempView("graft_q42_src")
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_customers,
          |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double)
          |    AS total_bal
          |FROM graft_q42_src
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    // Pivot: order count per (year, status) with statuses as columns.
    "q43_pivot" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("anio"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .orderBy("anio")
    }),

    // Set operations: high-balance vs building-segment customer keys.
    "q44_setops" -> ((s, d) => {
      val c = customer(s, d)
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val both = rich.intersect(building)
        .withColumn("which", lit("both"))
      val richOnly = rich.except(building)
        .withColumn("which", lit("rich_only"))
      both.unionByName(richOnly)
        .orderBy("which", "c_custkey")
    }),

    // CUBE over (event_type, hour-of-day): all four grouping sets in one
    // pass (Expand + two-phase aggregate). SQL surface for the same
    // reason as q42; NULLS FIRST makes the marker rows order-stable.
    "q59_cube" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
        .createOrReplaceTempView("graft_q59_src")
      s.sql(
        """SELECT event_type, hr, count(*) AS n,
          |  cast(sum(cast(value AS decimal(18,2))) AS double)
          |    AS total_value
          |FROM graft_q59_src
          |GROUP BY CUBE (event_type, hr)
          |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin)
    }),

    // Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    // a hand-picked set list — (status, priority), each alone, and the
    // grand total — in ONE Expand + two-phase aggregate pass instead of
    // four scans unioned. Labels are coalesced (the grouping columns
    // are never null in the data), keeping the output engine-neutral
    // without grouping_id() encodings.
    "q88_grouping_sets" -> ((s, d) => {
      orders(s, d)
        .select("o_orderstatus", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("graft_q88_src")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  count(*) AS n_orders,
          |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
          |    AS total
          |FROM graft_q88_src
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q41_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q42_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q43_pivot" ->
      """SELECT year(o_orderdate) AS anio,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY anio""".stripMargin,

    "q44_setops" ->
      """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |building AS (SELECT c_custkey FROM customer
        |             WHERE c_mktsegment = 'BUILDING')
        |SELECT c_custkey, 'both' AS which
        |FROM (SELECT c_custkey FROM rich INTERSECT
        |      SELECT c_custkey FROM building)
        |UNION ALL
        |SELECT c_custkey, 'rich_only' AS which
        |FROM (SELECT c_custkey FROM rich EXCEPT
        |      SELECT c_custkey FROM building)
        |ORDER BY which, c_custkey""".stripMargin,

    "q59_cube" ->
      """WITH e AS (SELECT * REPLACE (cast(ts AS timestamp) AS ts) FROM events)
        |SELECT event_type, cast(extract(hour FROM ts) AS int) AS hr,
        |  count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
        |FROM e
        |GROUP BY CUBE (event_type, hr)
        |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin,

    "q88_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
  )
}
