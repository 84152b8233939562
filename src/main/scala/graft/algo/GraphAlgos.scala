package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics (the capability set of the reference
  * ecosystem's Spark-based nebula-algorithm package — degrees,
  * connected components, PageRank) as iterative DataFrame programs.
  *
  * Determinism: WCC and PageRank run a FIXED number of synchronous
  * iterations of an exactly-specified update rule, so an external
  * oracle can replay them step for step (and a fixed iteration count
  * is also the production-sane choice: convergence detection costs an
  * extra action per round).
  *
  * Scale: each iteration is one shuffle on dst (message aggregation)
  * + one join on vid (state update), with the state frame
  * checkpointed per round — same posture as the traversal loops.
  * PageRank contributions use map-side combine via groupBy.sum.
  */
object GraphAlgos {

  /** In/out degree per vertex (0-degree vertices kept). */
  def degrees(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val outD = edges.groupBy(col("src").as("vid"))
      .agg(count(lit(1)).as("out_deg"))
    val inD = edges.groupBy(col("dst").as("vid"))
      .agg(count(lit(1)).as("in_deg"))
    vertices.select("vid")
      .join(outD, Seq("vid"), "left_outer")
      .join(inD, Seq("vid"), "left_outer")
      .select(col("vid"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Weakly connected components by synchronous min-label propagation
    * over the undirected edge view. Labels are exact strings (min vid
    * in component reached so far), so results are bit-reproducible.
    *
    * `untilConverged=false` (oracle mode): exactly `iters` rounds —
    * an external oracle can replay them step for step. Correct only
    * when iters ≥ graph diameter.
    *
    * `untilConverged=true` (production mode): a changed-label count
    * (one cheap action per round against the already-checkpointed
    * state) stops the loop as soon as a round changes nothing, with
    * `iters` as the safety cap — correct on ANY diameter. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          iters: Int,
                          untilConverged: Boolean = false): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("vid"), col("vid").as("label"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (round < iters && (!untilConverged || changed > 0)) {
      val fromNbrs = und.join(labels, und("src") === labels("vid"))
        .groupBy(und("dst").as("vid"))
        .agg(min(col("label")).as("nbr_label"))
      val upd = labels.join(fromNbrs, Seq("vid"), "left_outer")
        .select(col("vid"), col("label").as("__old"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint()
      if (untilConverged)
        changed = upd.filter(col("label") =!= col("__old")).count()
      // the new checkpoint holds every row — free the superseded one
      graft.traverse.Traverse.freeCheckpoint(labels)
      labels = upd.drop("__old")
      round += 1
    }
    try { und.unpersist(blocking = false) } catch { case _: Throwable => () }
    labels
  }

  /** PageRank, `iters` synchronous rounds, damping 0.85:
    * pr' = (1-d) + d·Σ_in pr/out_deg  (unnormalized Brin-Page form;
    * dangling vertices contribute nothing, matching the classic
    * iterative formulation). */
  /** `tol > 0` adds convergence detection: stop when the max absolute
    * rank change in a round falls below `tol` (`iters` stays the
    * safety cap); `tol = 0` replays exactly `iters` rounds. */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
               damping: Double = 0.85, tol: Double = 0.0): DataFrame = {
    val e = edges.select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    var pr = vertices.select(col("vid"), lit(1.0).as("pr")).localCheckpoint()
    var round = 0
    var delta = Double.MaxValue
    while (round < iters && (tol <= 0.0 || delta > tol)) {
      val contrib = e.join(outDeg, Seq("src"))
        .join(pr, e("src") === pr("vid"))
        .select(e("dst").as("vid"), (col("pr") / col("od")).as("c"))
        .groupBy("vid").agg(sum(col("c")).as("inflow"))
      val upd = pr.join(contrib, Seq("vid"), "left_outer")
        .select(col("vid"), col("pr").as("__old"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        .localCheckpoint()
      if (tol > 0.0)
        delta = upd.agg(max(abs(col("pr") - col("__old")))).head.getDouble(0)
      graft.traverse.Traverse.freeCheckpoint(pr) // superseded by upd
      pr = upd.drop("__old")
      round += 1
    }
    try { e.unpersist(blocking = false) } catch { case _: Throwable => () }
    pr
  }
}
