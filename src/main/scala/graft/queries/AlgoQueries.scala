package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.GraphAlgos
import graft.graph.GraphModel
import graft.functions.Fn.roundPortable

/** SparkEntry registrations for whole-graph analytics (the reference
  * ecosystem's nebula-algorithm capability set): degrees, weakly
  * connected components, PageRank, triangle counting, local clustering
  * coefficient, weighted SSSP, k-core, label propagation, neighbor
  * Jaccard, deterministic random walks. Iterative algorithms run fixed
  * synchronous iteration counts of exactly-specified update rules, so
  * the DuckDB oracle replays the algorithm itself (min-label flow with
  * self-loops; damped contribution sums; bounded-hop Bellman-Ford);
  * triangle/cc replay the degree-ordered orientation in SQL. */
object AlgoQueries {
  type Q = (SparkSession, String) => DataFrame

  private def gm(s: SparkSession, dir: String) = GraphModel(s, dir)

  val queries: Map[String, Q] = Map(
    "q_algo_degree" -> ((s, dir) => {
      val g = gm(s, dir)
      GraphAlgos.degrees(g.vertices, g.edges)
    }),
    // WCC/PageRank ride the message-adjacency abstraction: when the
    // graph store is enabled (Verify/Bench do), every round's message
    // join reads the bucketed layout with zero edge-side Exchange and
    // no block-manager copy of the edge set; flat sessions fall back
    // to the repartition+persist frame. Results are identical (same
    // message multisets).
    "q_algo_wcc" -> ((s, dir) => {
      val g = gm(s, dir)
      val adj = g.adjacencyBoth
      try GraphAlgos.connectedComponents(g.vertices, adj, iters = 6,
        untilConverged = false)
      finally adj.release()
    }),
    "q_algo_pagerank" -> ((s, dir) => {
      val g = gm(s, dir)
      val adj = g.adjacencyOut
      try GraphAlgos.pageRank(g.vertices, adj, iters = 3,
          damping = 0.85, tol = 0.0)
        .select(col("vid"), roundPortable(col("pr"), 4).as("pr"))
      finally adj.release()
    }),
    // Triangle counting needs a graph with triangles — the TPC-H graph
    // is multipartite — so project a co-purchase graph first (parts
    // sharing an order; 1-in-10 orders, deterministic key sample).
    // The projection itself is the realistic part: one self-join
    // shuffled on the order key, then the degree-ordered wedge join.
    "q_algo_triangles" -> ((s, dir) =>
      GraphAlgos.triangleCounts(coPurchase(s, dir))),
    // Local clustering coefficient over the same co-purchase projection.
    "q_algo_clustering" -> ((s, dir) =>
      GraphAlgos.clusteringCoefficients(coPurchase(s, dir))),
    // Weighted SSSP from customer 1 over the unified edge view;
    // weight = rank+1 (deterministic, integral-valued doubles so the
    // oracle's path sums are bit-exact). 4 rounds = graph diameter
    // (c→o→p/s→n→r).
    "q_algo_sssp" -> ((s, dir) => {
      val g = gm(s, dir)
      // stored path: weight derived from the bucketed scan's rank
      // column — every relaxation join edge-side Exchange-free
      val adj = g.adjacencyOut(keep = Seq("rank"))
      try GraphAlgos.sssp(s, adj, "c:1", iters = 4,
        w = (col("rank") + 1).cast("double"))
      finally adj.release()
    }),
    // 4-core of the co-purchase graph, 6 fixed peeling rounds (the
    // oracle unrolls the same rounds as a CTE chain).
    "q_algo_kcore" -> ((s, dir) =>
      GraphAlgos.kCore(coPurchase(s, dir), k = 4, iters = 6)),
    // betweenness centrality from a seed sample (BetweennessAlgo):
    // Brandes forward sigma levels + backward dependency accumulation,
    // depth 3; the oracle unrolls both passes level by level
    "q_algo_betweenness" -> ((s, dir) => {
      val g = gm(s, dir)
      val seeds = g.customers
        .filter(expr("CAST(substr(vid, 3, 10) AS BIGINT) <= 5"))
        .select("vid")
      // stored path: the simple-view dedup is an exchange-free local
      // aggregation over the bucketed scan; both Brandes passes join
      // the edge side in place
      val adj = g.adjacencyOutDistinct
      try GraphAlgos.betweenness(seeds, adj, maxSteps = 3)
        .select(col("vid"), roundPortable(col("bc"), 6).as("bc"))
      finally adj.release()
    }),
    // closeness centrality of sampled seeds (ClosenessAlgo): one
    // multi-origin BFS covers all 10 seeds, closeness =
    // (reached-1)/sum(dist) within 4 hops
    "q_algo_closeness" -> ((s, dir) => {
      val g = gm(s, dir)
      val seeds = g.customers
        .filter(expr("CAST(substr(vid, 3, 10) AS BIGINT) <= 10"))
        .select("vid")
      GraphAlgos.closeness(seeds, g.edges, maxSteps = 4)
        .select(col("vid"), col("reached"),
          roundPortable(col("closeness"), 6).as("closeness"))
    }),
    // 3 synchronous LPA rounds over the unified graph (most-frequent
    // neighbor label, ties -> min label).
    "q_algo_lpa" -> ((s, dir) => {
      val g = gm(s, dir)
      // stored path: the `_und` table IS the simple undirected view
      // LPA is defined over — zero edge-side Exchange per round
      val adj = g.adjacencyUnd(dropSelfLoops = true)
      try GraphAlgos.labelPropagation(g.vertices, adj, iters = 3)
      finally adj.release()
    }),
    // SCC over the directed KNOWS graph (adjacent-order customers —
    // the only cyclic subgraph in the star schema): pinned FW-BW
    // coloring, 2 phases × 6 rounds, oracle replays every round
    "q_algo_scc" -> ((s, dir) => {
      // 1-in-7 adjacency sample: the full KNOWS graph is dense enough
      // to be one giant SCC (degenerate evidence); the sparse cut has
      // real component structure — cycles, chains, singletons
      val orders = graft.Tables.load(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) === 0)
      val o2 = orders.select((col("o_orderkey") - 7).as("k2"),
        col("o_custkey").as("cust2"))
      val knows = orders.join(o2, col("o_orderkey") === col("k2"))
        .filter(col("o_custkey") =!= col("cust2"))
        .select(concat(lit("per:"), col("o_custkey")).as("src"),
          concat(lit("per:"), col("cust2")).as("dst")).distinct()
      val verts = knows.select(col("src").as("vid"))
        .unionByName(knows.select(col("dst").as("vid"))).distinct()
      GraphAlgos.sccPinned(verts, knows, phases = 2, rounds = 6)
    }),
    // HANP: LPA with hop attenuation + node preference (deg-weighted
    // votes, scores decay 1/16 per hop — dyadic, so exact replay)
    "q_algo_hanp" -> ((s, dir) => {
      val g = gm(s, dir)
      val adj = g.adjacencyUnd(dropSelfLoops = true)
      try GraphAlgos.hanp(g.vertices, adj, iters = 3, delta = 0.0625)
      finally adj.release()
    }),
    // Louvain-style modularity ascent on the co-purchase graph, 6
    // gated rounds (~half the vertices move per round; all-integer
    // scores; oracle-replayable).
    "q_algo_louvain" -> ((s, dir) =>
      GraphAlgos.louvain(coPurchase(s, dir), iters = 6)),
    // MULTI-LEVEL Louvain (Blondel et al. 2008): 4 move rounds, then
    // contract communities to a weighted supergraph (inter-community
    // super-edges + self-loop weights), 4 more rounds there, contract
    // AGAIN, 4 rounds on the level-3 supergraph, unfold the 3-deep
    // chain. The oracle replays the whole hierarchy — every level's
    // rounds, both contraction aggregations, and the unfold joins —
    // exactly (integer weights, md5 gates salted per level). The
    // production entry point louvainMultiLevelAuto runs the same
    // machinery to the canonical no-moves convergence instead of a
    // pinned depth (AlgoSpec pins its behavior on a 3-tier fixture).
    "q_algo_louvain_ml" -> ((s, dir) =>
      GraphAlgos.louvainMultiLevel(coPurchase(s, dir), levels = 3,
        iters = 4)),
    // node2vec-style walk corpus: 5 deterministic steps per customer.
    "q_algo_walks" -> ((s, dir) => randomWalkQuery(s, dir)),
    // node2vec-biased walks (p=q=4 → dyadic weights, bit-exact oracle
    // replay of the cumulative-weight pick); 3 steps, seeds = customers
    // with custkey <= 300 over the undirected unified graph
    "q_algo_node2vec" -> ((s, dir) => {
      val g = gm(s, dir)
      val starts = g.customers
        .filter(expr("CAST(substr(vid, 3, 10) AS BIGINT) <= 300"))
        .select("vid")
      // undNeighbors IS distinct(E ∪ revE) — the stored `_und` scan
      // (flat sessions derive it per query, as before)
      GraphAlgos.node2vecWalksSimple(g.undNeighbors(), starts, len = 3)
    }),
    // Neighbor-set Jaccard between orders sharing parts; hub parts
    // (in-degree > 40) dropped before pairing — the skew guard that
    // keeps the pair count linear-ish at 100 TB.
    "q_algo_jaccard" -> ((s, dir) => {
      val e = graft.Tables.load(s, dir, "lineitem").select(
        concat(lit("o:"), col("l_orderkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst"))
      GraphAlgos.jaccardSimilarity(e, maxNbrDeg = 40)
    })
  )

  /** Deterministic 5-step walks from every customer over the
    * undirected unified graph (walks on the directed TPC-H DAG die at
    * the part/region sinks after ~3 hops; node2vec corpora walk the
    * undirected view). */
  private def randomWalkQuery(s: SparkSession, dir: String): DataFrame = {
    val g = gm(s, dir)
    val starts = g.customers.select("vid")
    // undNeighbors IS distinct(E ∪ revE) — stored `_und` scan when
    // attached, per-query derivation when flat
    GraphAlgos.randomWalksSimple(g.undNeighbors(), starts, len = 5)
  }

  /** The co-purchase projection shared by the triangle-family queries:
    * parts sharing an order (1-in-10 orders, deterministic key sample). */
  private def coPurchase(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey").as("ok"),
        concat(lit("p:"), col("l_partkey")).as("pk")).distinct()
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
  }

  /** DuckDB twin of `coPurchase` + its canonical undirected view. */
  private val coPurchaseCtes =
    """LI AS (SELECT DISTINCT l_orderkey AS ok, 'p:' || l_partkey AS pk
      |            FROM lineitem WHERE l_orderkey % 10 = 0),
      |UND AS (SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
      |        FROM LI x JOIN LI y ON x.ok = y.ok AND x.pk < y.pk
      |        WHERE x.pk <> y.pk)""".stripMargin

  private val vertsCte =
    """V AS (SELECT 'c:' || c_custkey AS vid FROM customer
      |  UNION ALL SELECT 's:' || s_suppkey FROM supplier
      |  UNION ALL SELECT 'p:' || p_partkey FROM part
      |  UNION ALL SELECT 'n:' || n_nationkey FROM nation
      |  UNION ALL SELECT 'r:' || r_regionkey FROM region
      |  UNION ALL SELECT 'o:' || o_orderkey FROM orders)""".stripMargin

  /** One unrolled Louvain move round in DuckDB SQL — the replay twin
    * of GraphAlgos.louvainMoves. `t` disambiguates CTE names per level
    * ("" keeps level-1's historical names), `aPfx` the assignment CTE
    * prefix, `n`/`deg` the level's adjacency/degree CTEs, `salt` the
    * md5 mover-gate's level tag, `weighted` switches kin from edge
    * counts to summed super-edge weights. All-integer scores, so the
    * replay is bit-exact. */
  private def louvainRoundSql(r: Int, t: String, aPfx: String, n: String,
      deg: String, salt: String, weighted: Boolean): String = {
    val kin = if (weighted) "sum(w)::BIGINT" else "count(*)"
    val nbrW = if (weighted) ", n.w" else ""
    s"""NBR$t$r AS MATERIALIZED (SELECT n.src AS vid, a.c$nbrW
       |  FROM $n n JOIN $aPfx$r a ON a.vid = n.dst),
       |KIN$t$r AS MATERIALIZED (SELECT vid, c, $kin AS kin
       |  FROM NBR$t$r GROUP BY 1, 2),
       |SZ$t$r AS MATERIALIZED (SELECT c, count(*) AS sz FROM $aPfx$r GROUP BY 1),
       |ST$t$r AS MATERIALIZED (SELECT a.c, sum(d.k)::BIGINT AS st
       |  FROM $aPfx$r a JOIN $deg d ON d.vid = a.vid GROUP BY 1),
       |STAY$t$r AS MATERIALIZED (SELECT a.vid,
       |    (SELECT m2 FROM M) * coalesce(k2.kin, 0) - d.k * (s.st - d.k) AS stay
       |  FROM $aPfx$r a JOIN $deg d ON d.vid = a.vid
       |  JOIN ST$t$r s ON s.c = a.c
       |  LEFT JOIN KIN$t$r k2 ON k2.vid = a.vid AND k2.c = a.c),
       |CAND$t$r AS MATERIALIZED (SELECT k.vid, k.c, a.c AS c_i,
       |    (SELECT m2 FROM M) * k.kin -
       |      d.k * (s.st - CASE WHEN k.c = a.c THEN d.k ELSE 0 END) AS score
       |  FROM KIN$t$r k JOIN ST$t$r s ON s.c = k.c JOIN SZ$t$r z ON z.c = k.c
       |  JOIN $deg d ON d.vid = k.vid JOIN $aPfx$r a ON a.vid = k.vid
       |  JOIN SZ$t$r zi ON zi.c = a.c
       |  WHERE NOT (zi.sz = 1 AND z.sz = 1 AND k.c > a.c)),
       |P$t$r AS MATERIALIZED (SELECT vid, c FROM
       |  (SELECT cd.vid, cd.c, row_number() OVER
       |     (PARTITION BY cd.vid ORDER BY cd.score DESC, cd.c) AS rn
       |   FROM CAND$t$r cd JOIN STAY$t$r sy ON sy.vid = cd.vid
       |   WHERE cd.c = cd.c_i OR cd.score > sy.stay)
       |  WHERE rn = 1),
       |$aPfx${r + 1} AS MATERIALIZED (SELECT a.vid,
       |    CASE WHEN ('0x' || substr(md5(a.vid || '$salt|$r'), 1, 15))::BIGINT % 2 = 0
       |           AND p.c IS NOT NULL THEN p.c ELSE a.c END AS c
       |  FROM $aPfx$r a LEFT JOIN P$t$r p ON p.vid = a.vid)""".stripMargin
  }

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
        |FROM pr WHERE iter = 3""".stripMargin,
    "q_algo_triangles" ->
      s"""WITH $coPurchaseCtes,
        |DEG AS (SELECT vid, count(*) AS deg FROM
        |          (SELECT a AS vid FROM UND UNION ALL SELECT b FROM UND)
        |        GROUP BY vid),
        |ORT AS (SELECT
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
        |         THEN u.a ELSE u.b END AS u,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
        |         THEN u.b ELSE u.a END AS v
        |  FROM UND u JOIN DEG da ON da.vid = u.a JOIN DEG db ON db.vid = u.b),
        |T AS (SELECT d1.u AS x, d1.v AS y, d2.v AS z
        |      FROM ORT d1 JOIN ORT d2 ON d2.u = d1.v
        |      JOIN ORT d3 ON d3.u = d1.u AND d3.v = d2.v)
        |SELECT vid, count(*) AS triangles FROM
        |  (SELECT x AS vid FROM T UNION ALL SELECT y FROM T
        |   UNION ALL SELECT z FROM T)
        |GROUP BY vid""".stripMargin,
    "q_algo_clustering" ->
      s"""WITH $coPurchaseCtes,
        |DEG AS (SELECT vid, count(*) AS deg FROM
        |          (SELECT a AS vid FROM UND UNION ALL SELECT b FROM UND)
        |        GROUP BY vid),
        |ORT AS (SELECT
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
        |         THEN u.a ELSE u.b END AS u,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
        |         THEN u.b ELSE u.a END AS v
        |  FROM UND u JOIN DEG da ON da.vid = u.a JOIN DEG db ON db.vid = u.b),
        |T AS (SELECT d1.u AS x, d1.v AS y, d2.v AS z
        |      FROM ORT d1 JOIN ORT d2 ON d2.u = d1.v
        |      JOIN ORT d3 ON d3.u = d1.u AND d3.v = d2.v),
        |TC AS (SELECT vid, count(*) AS c FROM
        |         (SELECT x AS vid FROM T UNION ALL SELECT y FROM T
        |          UNION ALL SELECT z FROM T)
        |       GROUP BY vid)
        |SELECT d.vid,
        |  CASE WHEN d.deg < 2 THEN CAST(0 AS DOUBLE)
        |       ELSE (coalesce(tc.c, 0) * CAST(2 AS DOUBLE)) /
        |            (d.deg * (d.deg - 1)) END AS cc
        |FROM DEG d LEFT JOIN TC tc ON tc.vid = d.vid""".stripMargin,
    "q_algo_betweenness" ->
      s"""WITH ${GraphQueries.edgesCte},
        |ED AS (SELECT DISTINCT src, dst FROM E),
        |seeds AS (SELECT 'c:' || c_custkey AS vid FROM customer WHERE c_custkey <= 5),
        |L0 AS (SELECT vid AS origin, vid, CAST(1 AS BIGINT) AS sigma FROM seeds),
        |L1 AS (SELECT l.origin, e.dst AS vid, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM L0 l JOIN ED e ON e.src = l.vid
        |       WHERE NOT EXISTS (SELECT 1 FROM L0 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |       GROUP BY 1, 2),
        |L2 AS (SELECT l.origin, e.dst AS vid, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM L1 l JOIN ED e ON e.src = l.vid
        |       WHERE NOT EXISTS (SELECT 1 FROM L0 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |         AND NOT EXISTS (SELECT 1 FROM L1 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |       GROUP BY 1, 2),
        |L3 AS (SELECT l.origin, e.dst AS vid, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM L2 l JOIN ED e ON e.src = l.vid
        |       WHERE NOT EXISTS (SELECT 1 FROM L0 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |         AND NOT EXISTS (SELECT 1 FROM L1 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |         AND NOT EXISTS (SELECT 1 FROM L2 p WHERE p.origin = l.origin AND p.vid = e.dst)
        |       GROUP BY 1, 2),
        |D3 AS (SELECT origin, vid, sigma, CAST(0.0 AS DOUBLE) AS delta FROM L3),
        |D2 AS (SELECT l.origin, l.vid, l.sigma,
        |         coalesce((SELECT sum(CAST(l.sigma AS DOUBLE) / w.sigma * (1.0 + w.delta))
        |                   FROM ED e JOIN D3 w ON w.origin = l.origin AND w.vid = e.dst
        |                   WHERE e.src = l.vid), 0.0) AS delta
        |       FROM L2 l),
        |D1 AS (SELECT l.origin, l.vid, l.sigma,
        |         coalesce((SELECT sum(CAST(l.sigma AS DOUBLE) / w.sigma * (1.0 + w.delta))
        |                   FROM ED e JOIN D2 w ON w.origin = l.origin AND w.vid = e.dst
        |                   WHERE e.src = l.vid), 0.0) AS delta
        |       FROM L1 l),
        |A AS (SELECT origin, vid, delta FROM D1
        |      UNION ALL SELECT origin, vid, delta FROM D2
        |      UNION ALL SELECT origin, vid, delta FROM D3)
        |SELECT vid, floor(sum(delta) * 1000000.0 + 0.5) / 1000000.0 AS bc
        |FROM A GROUP BY vid""".stripMargin,
    "q_algo_closeness" ->
      s"""WITH RECURSIVE ${GraphQueries.edgesCte},
        |seeds AS (SELECT 'c:' || c_custkey AS vid FROM customer WHERE c_custkey <= 10),
        |r(origin, vid, dist) AS (
        |  SELECT vid, vid, 0 FROM seeds
        |  UNION
        |  SELECT r.origin, e.dst, r.dist + 1 FROM r JOIN E e ON e.src = r.vid WHERE r.dist < 4
        |),
        |md AS (SELECT origin, vid, MIN(dist) AS dist FROM r GROUP BY origin, vid),
        |ag AS (SELECT origin AS vid, count(*) - 1 AS reached,
        |              CAST(sum(dist) AS BIGINT) AS sum_dist
        |       FROM md GROUP BY origin)
        |SELECT vid, reached,
        |  CASE WHEN sum_dist > 0
        |       THEN floor((CAST(reached AS DOUBLE) / sum_dist) * 1000000.0 + 0.5) / 1000000.0
        |       ELSE CAST(0.0 AS DOUBLE) END AS closeness
        |FROM ag""".stripMargin,
    "q_algo_sssp" ->
      s"""WITH RECURSIVE ${GraphQueries.edgesCte},
        |EW AS (SELECT src, dst, CAST(rank + 1 AS DOUBLE) AS w FROM E),
        |sp(iter, vid, dist) AS (
        |  SELECT 0, 'c:1', CAST(0.0 AS DOUBLE)
        |  UNION ALL
        |  SELECT sp.iter + 1, e.dst, min(sp.dist + e.w)
        |  FROM sp JOIN EW e ON e.src = sp.vid
        |  WHERE sp.iter < 4
        |  GROUP BY 1, 2
        |)
        |SELECT vid, min(dist) AS dist FROM sp GROUP BY vid""".stripMargin,
    "q_algo_kcore" -> {
      // unrolled peeling rounds: recursive CTEs can't reference the
      // working table twice (degree filter + edge filter), so the
      // oracle replays the fixed rounds as a plain CTE chain.
      // MATERIALIZED is load-bearing: each round references the
      // previous one three times, so inlining would be 3^rounds scans
      val rounds = (0 until 6).map { r =>
        s"""D$r AS MATERIALIZED (SELECT vid, count(*) AS deg FROM
           |          (SELECT a AS vid FROM E$r UNION ALL SELECT b FROM E$r)
           |        GROUP BY vid),
           |K$r AS MATERIALIZED (SELECT vid FROM D$r WHERE deg >= 4),
           |E${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM E$r e
           |  JOIN K$r ka ON ka.vid = e.a JOIN K$r kb ON kb.vid = e.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH $coPurchaseCtes,
        |E0 AS MATERIALIZED (SELECT a, b FROM UND),
        |$rounds
        |SELECT DISTINCT vid FROM
        |  (SELECT a AS vid FROM E6 UNION ALL SELECT b FROM E6)""".stripMargin
    },
    "q_algo_lpa" -> {
      // MATERIALIZED for the same reason as q_algo_kcore: L{r+1}
      // references L{r} twice
      val rounds = (0 until 3).map { r =>
        s"""CNT$r AS MATERIALIZED (SELECT n.dst AS vid, l.label, count(*) AS cnt
           |          FROM N n JOIN L$r l ON l.vid = n.src GROUP BY 1, 2),
           |P$r AS MATERIALIZED (SELECT vid, label FROM
           |          (SELECT vid, label, row_number() OVER
           |             (PARTITION BY vid ORDER BY cnt DESC, label) AS rn
           |           FROM CNT$r) WHERE rn = 1),
           |L${r + 1} AS MATERIALIZED (SELECT l.vid, coalesce(p.label, l.label) AS label
           |  FROM L$r l LEFT JOIN P$r p ON p.vid = l.vid)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphQueries.edgesCte}, $vertsCte,
        |UE AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM E WHERE src <> dst),
        |N AS (SELECT a AS src, b AS dst FROM UE
        |      UNION ALL SELECT b, a FROM UE),
        |L0 AS (SELECT vid, vid AS label FROM V),
        |$rounds
        |SELECT vid, label FROM L3""".stripMargin
    },
    "q_algo_scc" -> {
      val P = 2; val R = 6
      val phases = (1 to P).map { p =>
        val fwd = (0 until R).map { r =>
          s"""C${p}_${r + 1} AS MATERIALIZED (SELECT vid, min(color) AS color FROM (
             |  SELECT vid, color FROM C${p}_$r
             |  UNION ALL
             |  SELECT e.dst AS vid, c.color FROM ER$p e JOIN C${p}_$r c ON c.vid = e.src
             |) GROUP BY vid)""".stripMargin
        }.mkString(",\n")
        val bwd = (0 until R).map { r =>
          s"""B${p}_${r + 1} AS MATERIALIZED (SELECT DISTINCT vid, root FROM (
             |  SELECT vid, root FROM B${p}_$r
             |  UNION ALL
             |  SELECT e.src AS vid, b.root FROM ER$p e
             |  JOIN B${p}_$r b ON b.vid = e.dst
             |  JOIN C${p}_$R c ON c.vid = e.src AND c.color = b.root
             |))""".stripMargin
        }.mkString(",\n")
        s"""ER$p AS MATERIALIZED (SELECT k.src, k.dst FROM K k
           |  JOIN R$p a ON a.vid = k.src JOIN R$p b ON b.vid = k.dst),
           |C${p}_0 AS (SELECT vid, vid AS color FROM R$p),
           |$fwd,
           |B${p}_0 AS (SELECT vid, vid AS root FROM C${p}_$R WHERE vid = color),
           |$bwd,
           |A$p AS MATERIALIZED (SELECT vid, root AS scc_id FROM B${p}_$R),
           |R${p + 1} AS MATERIALIZED (SELECT r.vid FROM R$p r
           |  WHERE NOT EXISTS (SELECT 1 FROM A$p a WHERE a.vid = r.vid))""".stripMargin
      }.mkString(",\n")
      val unions = (1 to P).map(p =>
        s"SELECT vid, scc_id FROM A$p").mkString("\nUNION ALL ")
      s"""WITH K0 AS (
        |  SELECT a.o_custkey AS s, b.o_custkey AS d
        |  FROM orders a JOIN orders b ON b.o_orderkey = a.o_orderkey + 7
        |  WHERE a.o_orderkey % 7 = 0 AND a.o_custkey <> b.o_custkey),
        |K AS (SELECT DISTINCT 'per:' || s AS src, 'per:' || d AS dst FROM K0),
        |R1 AS MATERIALIZED (
        |  SELECT src AS vid FROM K UNION SELECT dst FROM K),
        |$phases
        |$unions
        |UNION ALL SELECT vid, vid AS scc_id FROM R${P + 1}""".stripMargin
    },
    "q_algo_hanp" -> {
      // unrolled like LPA, with deg-weighted scored votes; all score
      // arithmetic is dyadic (1/16 granularity) so sums are exact in
      // any order and the argmax replays bit-for-bit
      val rounds = (0 until 3).map { r =>
        s"""CNT$r AS MATERIALIZED (
           |  SELECT n.dst AS vid, l.label, sum(l.score * d.deg) AS f,
           |         max(l.score) AS smax
           |  FROM N n JOIN L$r l ON l.vid = n.src JOIN DEG d ON d.src = n.src
           |  GROUP BY 1, 2),
           |P$r AS MATERIALIZED (SELECT vid, label, smax FROM
           |  (SELECT vid, label, smax, row_number() OVER
           |     (PARTITION BY vid ORDER BY f DESC, label) AS rn
           |   FROM CNT$r) WHERE rn = 1),
           |L${r + 1} AS MATERIALIZED (
           |  SELECT l.vid, coalesce(p.label, l.label) AS label,
           |    CASE WHEN p.vid IS NULL THEN l.score
           |         ELSE greatest(p.smax - 0.0625, CAST(0.0 AS DOUBLE)) END AS score
           |  FROM L$r l LEFT JOIN P$r p ON p.vid = l.vid)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphQueries.edgesCte}, $vertsCte,
        |UE AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM E WHERE src <> dst),
        |N AS (SELECT a AS src, b AS dst FROM UE
        |      UNION ALL SELECT b, a FROM UE),
        |DEG AS (SELECT src, count(*) AS deg FROM N GROUP BY src),
        |L0 AS (SELECT vid, vid AS label, CAST(1.0 AS DOUBLE) AS score FROM V),
        |$rounds
        |SELECT vid, label, score FROM L3""".stripMargin
    },
    "q_algo_louvain" -> {
      // synchronous modularity-ascent rounds, unrolled — generated by
      // the SAME template as the multi-level oracle's levels, so the
      // two replays can never drift apart
      val rounds = (0 until 6).map(r =>
        louvainRoundSql(r, "", "A", "N", "DEG", "", weighted = false))
        .mkString(",\n")
      s"""WITH $coPurchaseCtes,
        |N AS (SELECT a AS src, b AS dst FROM UND
        |      UNION ALL SELECT b, a FROM UND),
        |M AS (SELECT count(*) * 2 AS m2 FROM UND),
        |DEG AS MATERIALIZED (SELECT src AS vid, count(*) AS k FROM N GROUP BY 1),
        |A0 AS (SELECT vid, vid AS c FROM DEG),
        |$rounds
        |SELECT vid, c FROM A6""".stripMargin
    },
    "q_algo_louvain_ml" -> {
      // the full THREE-level hierarchy: 4 unrolled level-1 rounds, a
      // contraction (weighted super-edges + self-loop weights), 4
      // weighted level-2 rounds with the SAME m2 (total weight is
      // invariant under contraction), a second contraction (level-2
      // intra-edges + rolled-up prior self-weights), 4 level-3 rounds,
      // then the unfold chain A4 → B4 → C4
      val l1 = (0 until 4).map(r =>
        louvainRoundSql(r, "", "A", "N", "DEG", "", weighted = false))
        .mkString(",\n")
      val l2 = (0 until 4).map(r =>
        louvainRoundSql(r, "B", "B", "N2", "DEG2", "|L2", weighted = true))
        .mkString(",\n")
      val l3 = (0 until 4).map(r =>
        louvainRoundSql(r, "C", "C", "N3", "DEG3", "|L3", weighted = true))
        .mkString(",\n")
      s"""WITH $coPurchaseCtes,
        |N AS (SELECT a AS src, b AS dst FROM UND
        |      UNION ALL SELECT b, a FROM UND),
        |M AS (SELECT count(*) * 2 AS m2 FROM UND),
        |DEG AS MATERIALIZED (SELECT src AS vid, count(*) AS k FROM N GROUP BY 1),
        |A0 AS (SELECT vid, vid AS c FROM DEG),
        |$l1,
        |SUPER AS MATERIALIZED (
        |  SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
        |         count(*)::BIGINT AS w
        |  FROM UND u JOIN A4 x ON x.vid = u.a JOIN A4 y ON y.vid = u.b
        |  WHERE x.c <> y.c GROUP BY 1, 2),
        |SELFW AS MATERIALIZED (
        |  SELECT x.c AS vid, count(*)::BIGINT AS sw
        |  FROM UND u JOIN A4 x ON x.vid = u.a JOIN A4 y ON y.vid = u.b
        |  WHERE x.c = y.c GROUP BY 1),
        |N2 AS (SELECT a AS src, b AS dst, w FROM SUPER
        |       UNION ALL SELECT b, a, w FROM SUPER),
        |DEG2 AS MATERIALIZED (
        |  SELECT vid, sum(k)::BIGINT AS k FROM (
        |    SELECT src AS vid, sum(w) AS k FROM N2 GROUP BY 1
        |    UNION ALL SELECT vid, 2 * sw FROM SELFW) GROUP BY 1),
        |B0 AS (SELECT vid, vid AS c FROM DEG2),
        |$l2,
        |SUPER2 AS MATERIALIZED (
        |  SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
        |         sum(u.w)::BIGINT AS w
        |  FROM SUPER u JOIN B4 x ON x.vid = u.a JOIN B4 y ON y.vid = u.b
        |  WHERE x.c <> y.c GROUP BY 1, 2),
        |SELFW2 AS MATERIALIZED (
        |  SELECT vid, sum(sw)::BIGINT AS sw FROM (
        |    SELECT x.c AS vid, u.w AS sw
        |    FROM SUPER u JOIN B4 x ON x.vid = u.a JOIN B4 y ON y.vid = u.b
        |    WHERE x.c = y.c
        |    UNION ALL
        |    SELECT b.c AS vid, s.sw FROM SELFW s JOIN B4 b ON b.vid = s.vid
        |  ) GROUP BY 1),
        |N3 AS (SELECT a AS src, b AS dst, w FROM SUPER2
        |       UNION ALL SELECT b, a, w FROM SUPER2),
        |DEG3 AS MATERIALIZED (
        |  SELECT vid, sum(k)::BIGINT AS k FROM (
        |    SELECT src AS vid, sum(w) AS k FROM N3 GROUP BY 1
        |    UNION ALL SELECT vid, 2 * sw FROM SELFW2) GROUP BY 1),
        |C0 AS (SELECT vid, vid AS c FROM DEG3),
        |$l3
        |SELECT a.vid, cc.c FROM A4 a JOIN B4 b ON b.vid = a.c
        |JOIN C4 cc ON cc.vid = b.c""".stripMargin
    },
    "q_algo_walks" -> {
      val steps = (1 to 5).map { i =>
        s"""P$i AS (SELECT w.walker, w.cur,
           |  ('0x' || substr(md5(w.walker || '|$i'), 1, 15))::BIGINT % od.od AS pick
           |  FROM W${i - 1} w JOIN OD od ON od.src = w.cur),
           |W$i AS MATERIALIZED (SELECT p.walker, a.dst AS cur
           |  FROM P$i p JOIN ADJ a ON a.src = p.cur AND a.idx = p.pick)""".stripMargin
      }.mkString(",\n")
      val unions = (1 to 5).map(i =>
        s"UNION ALL SELECT walker, $i, cur FROM W$i").mkString("\n")
      s"""WITH ${GraphQueries.edgesCte},
        |UE AS (SELECT src, dst FROM E UNION ALL SELECT dst, src FROM E),
        |SIMPLE AS MATERIALIZED (SELECT DISTINCT src, dst FROM UE),
        |ADJ AS MATERIALIZED (SELECT src, dst,
        |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
        |  FROM SIMPLE),
        |OD AS MATERIALIZED (SELECT src, count(*) AS od FROM SIMPLE GROUP BY src),
        |W0 AS (SELECT 'c:' || c_custkey AS walker, 'c:' || c_custkey AS cur
        |       FROM customer),
        |$steps
        |SELECT walker, 0 AS step, cur AS vid FROM W0
        |$unions""".stripMargin
    },
    "q_algo_node2vec" -> {
      val steps = (1 to 3).map { i =>
        s"""X$i AS (SELECT w.walker, w.cur, w.prev, s.dst AS cand,
           |  CASE WHEN s.dst = w.prev THEN 0.25
           |       WHEN EXISTS (SELECT 1 FROM SIMPLE p
           |                    WHERE p.src = w.prev AND p.dst = s.dst) THEN 1.0
           |       ELSE 0.25 END AS wt
           |  FROM N${i - 1} w JOIN SIMPLE s ON s.src = w.cur),
           |U$i AS (SELECT *, sum(wt) OVER (PARTITION BY walker ORDER BY cand
           |                                ROWS UNBOUNDED PRECEDING) AS cw
           |        FROM X$i),
           |V$i AS (SELECT *, max(cw) OVER (PARTITION BY walker) AS tw FROM U$i),
           |N$i AS MATERIALIZED (
           |  SELECT walker, cand AS cur, pcur AS prev FROM (
           |    SELECT v.walker, v.cand, v.cur AS pcur,
           |           row_number() OVER (PARTITION BY v.walker ORDER BY v.cand) AS rn
           |    FROM V$i v
           |    WHERE v.cw > (('0x' || substr(md5(v.walker || '|$i'), 1, 13))::BIGINT
           |                  / 4503599627370496.0) * v.tw
           |  ) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val unions = (1 to 3).map(i =>
        s"UNION ALL SELECT walker, $i, cur FROM N$i").mkString("\n")
      s"""WITH ${GraphQueries.edgesCte},
        |UE AS (SELECT src, dst FROM E UNION ALL SELECT dst, src FROM E),
        |SIMPLE AS MATERIALIZED (SELECT DISTINCT src, dst FROM UE),
        |N0 AS (SELECT 'c:' || c_custkey AS walker, 'c:' || c_custkey AS cur,
        |              'c:' || c_custkey AS prev
        |       FROM customer WHERE c_custkey <= 300),
        |$steps
        |SELECT walker, 0 AS step, cur AS vid FROM N0
        |$unions""".stripMargin
    },
    "q_algo_jaccard" ->
      """WITH E AS (SELECT DISTINCT 'o:' || l_orderkey AS src,
        |                           'p:' || l_partkey AS dst FROM lineitem),
        |ND AS (SELECT dst, count(*) AS nd FROM E GROUP BY dst),
        |C AS (SELECT e.src, e.dst FROM E e
        |      JOIN ND ON ND.dst = e.dst AND ND.nd <= 40),
        |D AS (SELECT src AS v, count(*) AS d FROM C GROUP BY src),
        |CM AS (SELECT x.src AS a, y.src AS b, count(*) AS common
        |       FROM C x JOIN C y ON x.dst = y.dst AND x.src < y.src
        |       GROUP BY 1, 2)
        |SELECT cm.a, cm.b,
        |  (cm.common * CAST(1 AS DOUBLE)) / (da.d + db.d - cm.common) AS jaccard
        |FROM CM cm JOIN D da ON da.v = cm.a JOIN D db ON db.v = cm.b""".stripMargin
  )
}
