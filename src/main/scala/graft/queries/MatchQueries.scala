package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphModel
import graft.plans.MatchBuilder
import graft.traverse.Traverse.In

/** SparkEntry registrations for the MATCH clause-pipeline surface
  * (SURVEY.md §3 entry point 1): label seek → expand → append props →
  * where, plus OPTIONAL MATCH (left join connector) and pattern
  * predicates (semi/anti) — all through graft.plans.MatchBuilder. */
object MatchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def gm(s: SparkSession, dir: String) = GraphModel(s, dir)

  val queries: Map[String, Q] = Map(
    // MATCH (c:customer {mktsegment})-[:placed]->(o:order) WHERE ...
    "q_match_basic" -> ((s, dir) => {
      val g = gm(s, dir)
      MatchBuilder(g)
        .seek("customer", "c", col("mktsegment") === "BUILDING")
        .expand("c", "placed", "o")
        .withProps("o", "order")
        .where(col("o_totalprice") > 300000)
        .ret(col("c"), col("c_name"), col("o"), col("o_totalprice"))
    }),

    // MATCH (c:customer) OPTIONAL MATCH (c)-[:placed]->(o big) RETURN
    "q_match_optional" -> ((s, dir) => {
      val g = gm(s, dir)
      val bigOrders = g.placed.filter(col("totalprice") > 400000)
        .select(col("src").as("c"), col("dst").as("o"))
      MatchBuilder(g)
        .seek("customer", "c",
          expr("CAST(substr(vid, 3, 10) AS BIGINT) <= 100"))
        .optional(bigOrders, Seq("c"))
        .ret(col("c"), col("o"))
    }),

    // MATCH (p:part) WHERE NOT (p)<-[:has_part]-() — anti pattern pred
    "q_match_pattern_pred" -> ((s, dir) => {
      val g = gm(s, dir)
      MatchBuilder(g)
        .seek("part", "p")
        .wherePattern("p", "has_part", anti = true, dir = In)
        .ret(col("p"), col("p_name"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_match_basic" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS c_name,
        |       'o:' || o_orderkey AS o, o_totalprice AS o_totalprice
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 300000""".stripMargin,
    "q_match_optional" ->
      """SELECT 'c:' || c_custkey AS c, 'o:' || o_orderkey AS o
        |FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_totalprice > 400000
        |WHERE c_custkey <= 100""".stripMargin,
    "q_match_pattern_pred" ->
      """SELECT 'p:' || p_partkey AS p, p_name AS p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin
  )
}
