package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.GraphAlgos
import graft.graph.GraphModel
import graft.functions.Fn.roundPortable

/** SparkEntry registrations for whole-graph analytics (the reference
  * ecosystem's nebula-algorithm capability set): degrees, weakly
  * connected components, PageRank. WCC/PageRank run fixed synchronous
  * iteration counts of exactly-specified update rules, so the DuckDB
  * oracle replays the algorithm itself (min-label flow with self-loops;
  * damped contribution sums with zero-weight self-edges). */
object AlgoQueries {
  type Q = (SparkSession, String) => DataFrame

  private def gm(s: SparkSession, dir: String) = GraphModel(s, dir)

  val queries: Map[String, Q] = Map(
    "q_algo_degree" -> ((s, dir) => {
      val g = gm(s, dir)
      GraphAlgos.degrees(g.vertices, g.edges)
    }),
    "q_algo_wcc" -> ((s, dir) => {
      val g = gm(s, dir)
      GraphAlgos.connectedComponents(g.vertices, g.edges, iters = 6)
    }),
    "q_algo_pagerank" -> ((s, dir) => {
      val g = gm(s, dir)
      GraphAlgos.pageRank(g.vertices, g.edges, iters = 3)
        .select(col("vid"), roundPortable(col("pr"), 4).as("pr"))
    })
  )

  private val vertsCte =
    """V AS (SELECT 'c:' || c_custkey AS vid FROM customer
      |  UNION ALL SELECT 's:' || s_suppkey FROM supplier
      |  UNION ALL SELECT 'p:' || p_partkey FROM part
      |  UNION ALL SELECT 'n:' || n_nationkey FROM nation
      |  UNION ALL SELECT 'r:' || r_regionkey FROM region
      |  UNION ALL SELECT 'o:' || o_orderkey FROM orders)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_algo_degree" ->
      s"""WITH ${GraphQueries.edgesCte}, $vertsCte
        |SELECT v.vid,
        |  coalesce(o.c, 0) AS out_deg, coalesce(i.c, 0) AS in_deg
        |FROM V v
        |LEFT JOIN (SELECT src, count(*) AS c FROM E GROUP BY src) o ON o.src = v.vid
        |LEFT JOIN (SELECT dst, count(*) AS c FROM E GROUP BY dst) i ON i.dst = v.vid""".stripMargin,
    "q_algo_wcc" ->
      s"""WITH RECURSIVE ${GraphQueries.edgesCte}, $vertsCte,
        |UE AS (SELECT src, dst FROM E UNION ALL SELECT dst, src FROM E
        |       UNION ALL SELECT vid, vid FROM V),
        |lp(iter, vid, label) AS (
        |  SELECT 0, vid, vid FROM V
        |  UNION ALL
        |  SELECT lp.iter + 1, ue.dst, min(lp.label)
        |  FROM lp JOIN UE ue ON ue.src = lp.vid
        |  WHERE lp.iter < 6
        |  GROUP BY lp.iter + 1, ue.dst
        |)
        |SELECT vid, label FROM lp WHERE iter = 6""".stripMargin,
    "q_algo_pagerank" ->
      s"""WITH RECURSIVE ${GraphQueries.edgesCte}, $vertsCte,
        |od AS (SELECT src, count(*) AS od FROM E GROUP BY src),
        |C AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / od.od AS w
        |      FROM E e JOIN od ON od.src = e.src
        |      UNION ALL SELECT vid, vid, CAST(0.0 AS DOUBLE) FROM V),
        |pr(iter, vid, pr) AS (
        |  SELECT 0, vid, CAST(1.0 AS DOUBLE) FROM V
        |  UNION ALL
        |  -- (1.0 - 0.85) not a 0.15 literal: matches the engine's IEEE
        |  -- computed teleport constant bit-for-bit
        |  SELECT pr.iter + 1, c.dst, (CAST(1.0 AS DOUBLE) - 0.85) + 0.85 * sum(pr.pr * c.w)
        |  FROM pr JOIN C c ON c.src = pr.vid
        |  WHERE pr.iter < 3
        |  GROUP BY pr.iter + 1, c.dst
        |)
        |SELECT vid, floor(pr * 10000.0 + 0.5) / 10000.0 AS pr
        |FROM pr WHERE iter = 3""".stripMargin
  )
}
