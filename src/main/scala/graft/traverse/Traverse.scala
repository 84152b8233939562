package graft.traverse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph-expansion library: the Spark-first re-expression of the
  * reference's traversal operators (SURVEY.md §2.1/§2.5):
  *
  *  - GetNeighbors (executor/query/GetNeighborsExecutor.cpp:24) → one
  *    frontier⋈edges join per hop; no special wide row format needed.
  *  - Expand/ExpandAll (ExpandExecutor.cpp:41, ExpandAllExecutor.cpp:50) →
  *    `go` with step range M..N accumulating per-step frontiers.
  *  - Traverse (TraverseExecutor.cpp:25) → `paths`: expansion keeping the
  *    vertex path as an ArrayType column, with openCypher NOLOOP-style
  *    cycle check via array_contains.
  *  - BFSShortest / MultiShortestPath (BFSShortestPathExecutor.cpp:12,
  *    MultiShortestPathExecutor.cpp:10) → `shortestPaths`: level-
  *    synchronous BFS with a visited anti-join per origin.
  *  - Subgraph (SubgraphExecutor.cpp:15-52) → `subgraphVertices`:
  *    frontier BFS over the union of out- and (optionally) in-edges.
  *
  * Scale posture (the part the reference does single-node, SURVEY §4.3):
  * every step is a shuffle-on-key equi-join that Spark distributes; the
  * frontier is the only state, deduped per level so it stays bounded by
  * |V| rather than path count. Small frontiers broadcast (AQE converts the
  * join automatically since frontier sizes are known after each action;
  * we additionally hint when the seed set is a literal list). No
  * collect() anywhere — the driver loop only controls step count.
  */
object Traverse {

  /** Direction of edge traversal. REVERSELY/BIDIRECT mirror the GO
    * grammar (src/parser/parser.yy:1424). The reference stores both
    * directions (NebulaKeyUtils.h:61); we flip columns on a columnar
    * scan, which costs one projection instead of doubled storage. */
  sealed trait Direction
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction

  /** Orient an edge table to (src, dst) in traversal direction. */
  def orient(edges: DataFrame, dir: Direction): DataFrame = dir match {
    case Out => edges
    case In  => edges.withColumnRenamed("src", "__tmp")
      .withColumnRenamed("dst", "src").withColumnRenamed("__tmp", "dst")
    case Both =>
      val rev = edges.withColumnRenamed("src", "__tmp")
        .withColumnRenamed("dst", "src").withColumnRenamed("__tmp", "dst")
      edges.unionByName(rev)
  }

  /** One hop: frontier(vid) ⋈ edges(src,dst,...) → (vid=dst rows).
    * Keeps any carried columns on the frontier (e.g. origin, path). */
  def expandOnce(frontier: DataFrame, edges: DataFrame): DataFrame =
    frontier.join(edges, frontier("vid") === edges("src"))
      .drop(edges("src"))

  /** GO M TO N STEPS FROM seeds OVER edges: returns (origin, vid) pairs
    * reachable in exactly k hops for each k in [m, n], deduped per step
    * like the reference's ExpandAll frontier (ExpandAllExecutor.cpp:50).
    */
  def go(seeds: DataFrame, edges: DataFrame, m: Int, n: Int,
         dir: Direction = Out): DataFrame = {
    require(m >= 1 && n >= m, s"bad step range $m..$n")
    val e = orient(edges, dir).select("src", "dst")
    var frontier = seeds.select(col("vid").as("origin"), col("vid"))
    var acc: DataFrame = null
    var step = 1
    while (step <= n) {
      frontier = frontier.join(e, frontier("vid") === e("src"))
        .select(col("origin"), e("dst").as("vid"))
        .distinct()
      if (step >= m) {
        val stamped = frontier.withColumn("step", lit(step))
        acc = if (acc == null) stamped else acc.unionByName(stamped)
      }
      step += 1
    }
    acc
  }

  /** Traverse with path tracking: (v)-[:e*m..n]->(w) keeping the full
    * vertex path, openCypher vertex-uniqueness via array_contains (the
    * reference checks edge uniqueness in TraverseExecutor; on a simple
    * traversal over distinct-rank edges vertex-uniqueness is the
    * stricter, cycle-safe choice — divergences only on revisiting walks).
    */
  def paths(seeds: DataFrame, edges: DataFrame, m: Int, n: Int,
            dir: Direction = Out, noLoop: Boolean = true): DataFrame = {
    val e = orient(edges, dir).select("src", "dst")
    var frontier = seeds.select(col("vid").as("origin"),
      array(col("vid")).as("path"), col("vid"))
    var acc: DataFrame = null
    var step = 1
    while (step <= n) {
      var next = frontier.join(e, frontier("vid") === e("src"))
      if (noLoop) next = next.filter(!array_contains(col("path"), e("dst")))
      frontier = next.select(col("origin"),
        concat(col("path"), array(e("dst"))).as("path"),
        e("dst").as("vid"))
      if (step >= m) {
        val stamped = frontier.withColumn("step", lit(step))
        acc = if (acc == null) stamped else acc.unionByName(stamped)
      }
      step += 1
    }
    acc
  }

  /** AppendVertices (AppendVerticesExecutor.cpp:18): attach end-vertex
    * props to a traversal result via a left join on the terminal vid. */
  def appendVertices(result: DataFrame, vertexTable: DataFrame,
                     vidCol: String = "vid"): DataFrame = {
    val props = vertexTable.columns.filter(_ != "vid")
      .foldLeft(vertexTable)((df, c) => df.withColumnRenamed(c, c))
    result.join(props.withColumnRenamed("vid", "__dst_vid"),
      result(vidCol) === col("__dst_vid"), "left").drop("__dst_vid")
  }

  /** Level-synchronous multi-origin BFS: min #hops from each seed to every
    * reachable vertex within maxSteps. Output (origin, vid, dist).
    * Visited-set pruning keeps state O(reached), the Spark analogue of the
    * reference's bidirectional frontier sets. */
  def shortestPaths(seeds: DataFrame, edges: DataFrame, maxSteps: Int,
                    dir: Direction = Out): DataFrame = {
    val e = orient(edges, dir).select("src", "dst")
    var visited = seeds.select(col("vid").as("origin"), col("vid"),
      lit(0).as("dist"))
    var frontier = visited
    var step = 1
    while (step <= maxSteps) {
      val next = frontier.join(e, frontier("vid") === e("src"))
        .select(col("origin"), e("dst").as("vid"), lit(step).as("dist"))
        .distinct()
      frontier = next.join(visited.select(col("origin").as("vo"),
          col("vid").as("vv")),
        next("origin") === col("vo") && next("vid") === col("vv"),
        "left_anti")
      visited = visited.unionByName(frontier)
      step += 1
    }
    visited
  }

  /** GET SUBGRAPH N STEPS: vertices (with min depth) reachable from the
    * seeds in ≤ n steps, traversing both directions like the reference's
    * SubgraphExecutor GetNeighbors loop. */
  def subgraphVertices(seeds: DataFrame, edges: DataFrame, n: Int,
                       dir: Direction = Both): DataFrame =
    shortestPaths(seeds.select("vid").distinct(), edges, n, dir)
      .groupBy("vid").agg(min("dist").as("depth"))
}
