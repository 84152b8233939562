package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.traverse.Traverse
import graft.traverse.Traverse.{Direction, Out}

/** FIND PATH family (SURVEY.md §2.5): src→dst endpoint semantics with
  * path reconstruction, re-expressed as level-synchronous DataFrame BFS.
  *
  *  - `shortestPaths` ≈ BFSShortestPathExecutor.cpp:12 /
  *    MultiShortestPathExecutor.cpp:10 (FIND SHORTEST PATH FROM a,b TO
  *    c,d): first hit per (src,dst) pair wins; all equal-length shortest
  *    paths for that pair are returned (pass `singlePath=true` for one
  *    deterministic representative).
  *  - `allPaths` ≈ AllPathsExecutor.cpp:19 (FIND ALL PATH ... UPTO n
  *    STEPS, NOLOOP): every simple path up to n steps between the sets.
  *
  * Scale: the expansion loop materializes + truncates lineage per step
  * (localCheckpoint) and prunes per-origin visited sets, but the
  * frontier carries one row PER PATH (the path array column) — on dense
  * graphs equal-length-path multiplicity makes it far larger than
  * |reached|, so the hop join's broadcast hint is gated through
  * Traverse.maybeBroadcast (BroadcastFrontierRows cap); above the cap
  * the join shuffles, which is the correct plan for a huge frontier.
  * `stepLimit` bounds the worst-case fan-out the same way the
  * reference's step-limit pushdown does
  * (PushStepLimitDownGetNeighborsRule.cpp). The dst set is broadcast
  * unconditionally — it is a user-supplied endpoint list, not a
  * growing frontier.
  */
object PathFinder {

  /** Shortest paths from every vid in `srcs` to every vid in `dsts`
    * reachable within maxSteps. Output (src, dst, path, hops) where
    * path = "a->b->c". BFS with per-origin visited pruning: a (src,dst)
    * pair is emitted the first level it is reached, which is its
    * shortest distance; ties (multiple shortest paths) all survive
    * unless singlePath. */
  def shortestPaths(srcs: DataFrame, dsts: DataFrame, edges: DataFrame,
                    maxSteps: Int, dir: Direction = Out,
                    singlePath: Boolean = false): DataFrame = {
    val e = Traverse.persistEdges(
      Traverse.orient(edges, dir).select("src", "dst"), maxSteps)
    val dstSet = broadcast(dsts.select(col("vid").as("__target")).distinct())
      .localCheckpoint()

    var frontier = srcs.select(col("vid").as("origin"),
      array(col("vid")).as("path"), col("vid")).localCheckpoint()
    var visited = frontier.select(col("origin"), col("vid")).localCheckpoint()
    // pairs already answered: stop extending them
    var found: DataFrame = null
    var cnt = frontier.count()
    var step = 1
    while (step <= maxSteps && cnt > 0) {
      val nextRaw = Traverse.maybeBroadcast(frontier, cnt)
        .join(e, frontier("vid") === e("src"))
        .select(col("origin"),
          concat(col("path"), array(e("dst"))).as("path"),
          e("dst").as("vid"))
      // per-origin shortest semantics: drop vertices already visited
      val next = nextRaw.join(
          visited.select(col("origin").as("vo"), col("vid").as("vv")),
          nextRaw("origin") === col("vo") && nextRaw("vid") === col("vv"),
          "left_anti")
        .localCheckpoint()
      val hits = next.join(dstSet, next("vid") === col("__target"))
        .select(col("origin").as("src"), col("vid").as("dst"),
          array_join(col("path"), "->").as("path"), lit(step).as("hops"))
      found = if (found == null) hits else found.unionByName(hits)
      visited = visited.unionByName(next.select("origin", "vid"))
        .localCheckpoint()
      frontier = next
      cnt = frontier.count()
      step += 1
    }
    Traverse.releaseEdges(e, maxSteps) // hits live in checkpointed blocks
    val out =
      if (found == null)
        srcs.sparkSession.emptyDataFrame
          .select(lit("").as("src"), lit("").as("dst"),
            lit("").as("path"), lit(0).as("hops")).limit(0)
      else found
    if (singlePath) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("src"), col("dst")).orderBy(col("path"))
      out.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    } else out
  }

  /** All simple paths (NOLOOP semantics: no repeated vertex) from srcs
    * to dsts up to maxSteps. Output (src, dst, path, hops). `stepLimit`
    * caps per-vertex fan-out each hop — the blowup control the
    * reference applies to ALL PATH. */
  def allPaths(srcs: DataFrame, dsts: DataFrame, edges: DataFrame,
               maxSteps: Int, dir: Direction = Out,
               stepLimit: Int = 0): DataFrame = {
    val e0 = Traverse.orient(edges, dir).select("src", "dst")
    val e = Traverse.persistEdges(
      if (stepLimit > 0) Traverse.capPerSrc(e0, stepLimit) else e0, maxSteps)
    val dstSet = broadcast(dsts.select(col("vid").as("__target")).distinct())
      .localCheckpoint()

    var frontier = srcs.select(col("vid").as("origin"),
      array(col("vid")).as("path"), col("vid")).localCheckpoint()
    var found: DataFrame = null
    var cnt = frontier.count()
    var step = 1
    while (step <= maxSteps && cnt > 0) {
      val next = Traverse.maybeBroadcast(frontier, cnt)
        .join(e, frontier("vid") === e("src"))
        .filter(!array_contains(col("path"), e("dst")))
        .select(col("origin"),
          concat(col("path"), array(e("dst"))).as("path"),
          e("dst").as("vid"))
        .localCheckpoint()
      val hits = next.join(dstSet, next("vid") === col("__target"))
        .select(col("origin").as("src"), col("vid").as("dst"),
          array_join(col("path"), "->").as("path"), lit(step).as("hops"))
      found = if (found == null) hits else found.unionByName(hits)
      frontier = next
      cnt = frontier.count()
      step += 1
    }
    Traverse.releaseEdges(e, maxSteps) // hits live in checkpointed blocks
    if (found == null)
      srcs.sparkSession.emptyDataFrame
        .select(lit("").as("src"), lit("").as("dst"),
          lit("").as("path"), lit(0).as("hops")).limit(0)
    else found
  }
}
