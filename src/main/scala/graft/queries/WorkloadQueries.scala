package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Headline analytic workloads in the LDBC SNB interactive/BI shape
  * (BASELINE.md acceptance workloads): multi-hop joins + aggregation +
  * top-k over the property-graph star schema, plus a typed-Dataset
  * (KeyValueGroupedDataset) workload over events. These are the bench
  * centerpieces — the plans to watch in `graft.tools.Explain`. */
object WorkloadQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // IC-style: customers of one nation → orders → parts; top-10 parts
    // by total quantity (3-hop expand + agg + TopN). Joins shuffle on
    // the fk; the final TopN is TakeOrderedAndProject (no global sort).
    "q_ldbc_ic" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_nationkey") === 1)
        .select(col("c_custkey"))
      val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity"))
      val part = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      cust.join(orders, cust("c_custkey") === orders("o_custkey"))
        .join(li, orders("o_orderkey") === li("l_orderkey"))
        .join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("total_qty").desc, col("p_partkey"))
        .limit(10)
    }),

    // BI-style: revenue + order count per nation per order-year over
    // the full fact table (wide agg; partial aggregation map-side).
    "q_ldbc_bi" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val nation = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      t(s, dir, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("order_cnt"),
          floor(sum(col("o_totalprice")) * 100.0 + 0.5).cast("double")
            .divide(lit(100.0)).as("revenue"))
    }),

    // typed Dataset surface: KeyValueGroupedDataset.mapGroups per-user
    // rollup with exact integer-cents arithmetic (order-independent)
    "q_typed_session" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          var n = 0L; var cents = 0L
          it.foreach { case (_, v) => n += 1; cents += math.round(v * 100) }
          (uid, n, cents)
        }
        .toDF("user_id", "n_events", "total_cents")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_ldbc_ic" ->
      """SELECT p_partkey, p_name,
        |  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE c_nationkey = 1
        |GROUP BY p_partkey, p_name
        |ORDER BY total_qty DESC, p_partkey LIMIT 10""".stripMargin,
    "q_ldbc_bi" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  count(*) AS order_cnt,
        |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q_typed_session" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id""".stripMargin
  )
}
