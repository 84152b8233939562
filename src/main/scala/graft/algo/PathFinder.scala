package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.traverse.Traverse
import graft.traverse.Traverse.{Direction, Out}
import graft.Ckpt.MatOps

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
    // BIDIRECTIONAL meet-in-the-middle (BFSShortestPathExecutor.cpp:12
    // runs left AND right frontiers): a forward ball of ⌈n/2⌉ levels
    // from srcs and a backward ball of ⌊n/2⌋ levels from dsts (over
    // reversed edges), joined on the meeting vertex. On a graph of
    // branching factor b this visits O(b^(n/2)) vertices per side
    // instead of O(b^n) — the exponential difference on long caps.
    //
    // Exactness: every shortest o→t path (o ≠ t) visits its k-th
    // vertex at forward depth exactly k and backward depth exactly
    // L−k (else a shortcut would beat L), so EVERY split of every
    // shortest path meets — the per-pair min + distinct below returns
    // exactly the all-shortest-paths set the single-direction BFS
    // produced. Self-pairs never match (the forward loop seeded its
    // visited set with the origin), mirrored by the origin ≠ target
    // filter.
    val e0 = Traverse.orient(edges, dir).select("src", "dst")
    val fMax = (maxSteps + 1) / 2
    val bMax = maxSteps / 2
    val eF = Traverse.persistEdges(e0, fMax)
    val eB = Traverse.persistEdges(
      e0.select(col("dst").as("src"), col("src").as("dst")), bMax)

    // one BFS ball: (origin, vid, path, depth) rows for every vertex at
    // its per-origin first-arrival depth ≤ lvls, all tied paths kept
    def ball(seeds: DataFrame, e: DataFrame,
             lvls: Int): (DataFrame, Seq[DataFrame]) = {
      var frontier = seeds.select(col("vid").as("origin"), col("vid"),
        array(col("vid")).as("path"), lit(0).as("depth")).mat()
      var visited = frontier.select("origin", "vid").mat()
      var levels = Vector(frontier)
      var acc = frontier
      var cnt = frontier.count()
      var d = 1
      while (d <= lvls && cnt > 0) {
        val next = Traverse.maybeBroadcast(frontier, cnt)
          .join(e, frontier("vid") === e("src"))
          .select(col("origin"), e("dst").as("vid"),
            concat(col("path"), array(e("dst"))).as("path"),
            lit(d).as("depth"))
          .join(visited.select(col("origin").as("vo"), col("vid").as("vv")),
            col("origin") === col("vo") && col("vid") === col("vv"),
            "left_anti")
          .mat()
        cnt = next.count()
        if (cnt > 0) {
          val v2 = visited.unionByName(next.select("origin", "vid")).mat()
          Traverse.freeCheckpoint(visited)
          visited = v2
          levels :+= next
          acc = acc.unionByName(next)
          frontier = next
        } else Traverse.freeCheckpoint(next)
        d += 1
      }
      Traverse.freeCheckpoint(visited)
      (acc, levels)
    }

    val (fAll, fLevels) = ball(srcs, eF, fMax)
    val (bAll, bLevels) = ball(dsts.select(col("vid")).distinct(), eB, bMax)
    val f = fAll.select(col("origin"), col("vid"),
      col("path").as("__fpath"), col("depth").as("__fd"))
    val b = bAll.select(col("origin").as("__target"), col("vid"),
      col("path").as("__bpath"), col("depth").as("__bd"))
    val cand = f.join(b, Seq("vid"))
      .filter(col("origin") =!= col("__target"))
      .withColumn("hops", col("__fd") + col("__bd"))
    import org.apache.spark.sql.expressions.Window
    val pw = Window.partitionBy("origin", "__target")
    // a length-L path meets at EVERY split vertex — canonicalize on
    // the ⌈L/2⌉ split instead of a distinct: prefix-multiplicity ×
    // suffix-multiplicity at one split reproduces the single-direction
    // loop's row multiplicity exactly (parallel (src,dst) edge rows
    // legitimately duplicate a vid-rendered path)
    val out = cand.withColumn("__min", min(col("hops")).over(pw))
      .filter(col("hops") === col("__min") &&
        col("__fd") === floor((col("hops") + 1) / 2).cast("int"))
      .select(col("origin").as("src"), col("__target").as("dst"),
        array_join(concat(col("__fpath"),
          slice(reverse(col("__bpath")), lit(2), size(col("__bpath")))), "->")
          .as("path"),
        col("hops"))
      .mat() // result-sized; lets every level checkpoint be freed
    fLevels.foreach(Traverse.freeCheckpoint)
    bLevels.foreach(Traverse.freeCheckpoint)
    Traverse.releaseEdges(eF, fMax)
    Traverse.releaseEdges(eB, bMax)
    if (singlePath) {
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
      .mat()

    var frontier = srcs.select(col("vid").as("origin"),
      array(col("vid")).as("path"), col("vid")).mat()
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
        .mat()
      // hits checkpointed (small) so superseded frontiers can be freed
      val hits = next.join(dstSet, next("vid") === col("__target"))
        .select(col("origin").as("src"), col("vid").as("dst"),
          array_join(col("path"), "->").as("path"), lit(step).as("hops"))
        .mat()
      found = if (found == null) hits else found.unionByName(hits)
      Traverse.freeCheckpoint(frontier) // consumed by next + hits
      frontier = next
      cnt = frontier.count()
      step += 1
    }
    Traverse.freeCheckpoint(frontier)
    Traverse.freeCheckpoint(dstSet)
    Traverse.releaseEdges(e, maxSteps) // hits are checkpointed
    if (found == null)
      srcs.sparkSession.emptyDataFrame
        .select(lit("").as("src"), lit("").as("dst"),
          lit("").as("path"), lit(0).as("hops")).limit(0)
    else found
  }

  /** FIND {SHORTEST|ALL|NOLOOP} PATH ... YIELD path — typed steps with
    * the reference's whole-path serialization (Path.cpp toString):
    * `<("v0")-[:etype@rank]->("v1")<-[:t]-("v2")...>`, rank omitted
    * when 0, reverse-traversed steps arrow `<-[:t]-`.
    *
    * Mode semantics (AllPathsExecutor.cpp:334-366):
    *  - all:     trail — no repeated EDGE (stored identity, keyEqual
    *             normalizes direction, Edge.cpp:128);
    *  - noloop:  no repeated VERTEX;
    *  - shortest: per-(origin,target) BFS level pruning, all ties at
    *             the first hit level survive (MultiShortestPath).
    *
    * `edges` must carry (src, dst, etype, rank) in STORED direction;
    * orientation happens here so every step keeps its stored endpoints
    * for rendering and edge-identity checks. Scale posture matches the
    * other loops: per-step localCheckpoint, gated broadcasts, all
    * checks are column predicates (no driver-side path work). */
  def typedPaths(srcs: DataFrame, dsts: DataFrame, edges: DataFrame,
                 maxSteps: Int, mode: String, dir: Direction = Out,
                 alias: String = "p"): DataFrame = {
    val strVid = edges.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val base = typedPathsRaw(srcs, dsts, edges, maxSteps, mode, dir)
    // `__path_<alias>`: hidden structured twin of the rendered path —
    // downstream pipes use it for ORDER BY (reference Path::operator<
    // compares src then step sequence, Path.h:211) and for
    // length/nodes/relationships; Gql.runScript drops it from the
    // final frame
    base.select(renderTypedPath(col("vids"), col("steps"), strVid).as(alias),
      struct(col("vids"), col("steps")).as(s"__path_$alias"))
  }

  /** typedPaths without the rendering: raw (vids, steps) rows — the
    * MATCH shortestPath()/allShortestPaths() surface binds pattern
    * variables straight off the structured columns. */
  def typedPathsRaw(srcs: DataFrame, dsts: DataFrame, edges: DataFrame,
                    maxSteps: Int, mode: String,
                    dir: Direction = Out): DataFrame = {
    val strVid = edges.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val vt = if (strVid) "string" else "bigint"
    val stepT = s"array<struct<s:$vt,d:$vt,t:string,r:bigint,rev:boolean>>"
    val fwd = edges.select(col("src"), col("dst"), col("etype"), col("rank"),
      col("src").as("ss"), col("dst").as("sd"), lit(false).as("rev"))
    def bwd = edges.select(col("dst").as("src"), col("src").as("dst"),
      col("etype"), col("rank"),
      col("src").as("ss"), col("dst").as("sd"), lit(true).as("rev"))
    val e0 = dir match {
      case Out => fwd
      case Traverse.In => bwd
      case Traverse.Both => fwd.unionByName(bwd)
    }
    // DISJOINT endpoint sets take the bidirectional route (two half-
    // depth balls instead of one full-depth ball — the 15-hop MATCH
    // shortestPath caps are exponentially cheaper). Overlapping sets
    // keep the single-direction loop: a src==dst pair's shortest path
    // is a CYCLE (visited starts empty below), whose split-invariant
    // does not hold for the meet-in-the-middle argument.
    if (mode == "shortest" && maxSteps >= 1 &&
        srcs.join(dsts, Seq("vid"), "left_semi").isEmpty)
      return typedBidiShortest(srcs, dsts, e0, maxSteps, stepT)
    val e = Traverse.persistEdges(e0, maxSteps)
    val dstSet = broadcast(dsts.select(col("vid").as("__target")).distinct())
      .mat()

    var frontier = srcs.select(col("vid").as("origin"), col("vid"),
      array(col("vid")).as("vids"), array().cast(stepT).as("steps"))
      .mat()
    // visited starts EMPTY (not seeded with the origin): a src that is
    // also a dst must be re-reachable for the self-pair's cycle paths
    // (ShortestPath.feature `FROM "Tim Duncan" TO "Tim Duncan"
    // BIDIRECT` expects the 2-hop loops); re-reaching the origin never
    // shortens any other pair, so the extra frontier rows are dominated
    var visited =
      if (mode == "shortest")
        frontier.select(col("origin"), col("vid")).limit(0).mat()
      else null: DataFrame
    var found: DataFrame = null
    var cnt = frontier.count()
    var step = 1
    while (step <= maxSteps && cnt > 0) {
      val hop = Traverse.maybeBroadcast(frontier, cnt)
        .join(e, frontier("vid") === e("src"))
      // every mode forbids re-walking the same stored edge: ALL is
      // trail semantics outright, and SHORTEST's cycle paths (self-pair
      // BIDIRECT) must use two distinct stored edges
      // (ShortestPathBase.h:56 hasSameEdge)
      val noRepeat = hop.filter(!exists(col("steps"), st =>
        st("s") === e("ss") && st("d") === e("sd") &&
          st("t") === e("etype") && st("r") === e("rank")))
      val filteredHop = mode match {
        case "noloop" => hop.filter(!array_contains(col("vids"), e("dst")))
        case _ => noRepeat
      }
      var next = filteredHop.select(col("origin"), e("dst").as("vid"),
        concat(col("vids"), array(e("dst"))).as("vids"),
        concat(col("steps"), array(struct(e("ss").as("s"), e("sd").as("d"),
          e("etype").as("t"), e("rank").as("r"), e("rev").as("rev"))))
          .as("steps"))
      if (mode == "shortest")
        next = next.join(
          visited.select(col("origin").as("vo"), col("vid").as("vv")),
          next("origin") === col("vo") && next("vid") === col("vv"),
          "left_anti")
      next = next.mat()
      // hits checkpointed (small) so superseded frontiers can be freed
      val hits = next.join(dstSet, next("vid") === col("__target"))
        .select(col("vids"), col("steps"))
        .mat()
      found = if (found == null) hits else found.unionByName(hits)
      if (mode == "shortest") {
        val v2 = visited.unionByName(next.select("origin", "vid"))
          .mat()
        Traverse.freeCheckpoint(visited)
        visited = v2
      }
      Traverse.freeCheckpoint(frontier) // consumed by next + hits
      frontier = next
      cnt = frontier.count()
      step += 1
    }
    Traverse.freeCheckpoint(frontier)
    if (visited != null) Traverse.freeCheckpoint(visited)
    Traverse.freeCheckpoint(dstSet)
    Traverse.releaseEdges(e, maxSteps)
    if (found == null)
      srcs.sparkSession.emptyDataFrame
        .select(array(lit("")).cast(s"array<$vt>").as("vids"),
          array().cast(stepT).as("steps")).limit(0)
    else found
  }

  /** Meet-in-the-middle twin of the typedPathsRaw shortest loop for
    * DISJOINT endpoint sets (the reference's left/right frontiers,
    * BFSShortestPathExecutor.cpp:12): a ⌈n/2⌉-level forward ball from
    * srcs and a ⌊n/2⌋-level backward ball from dsts over the
    * REVERSED orientation (each oriented row flipped; the recorded
    * step struct is unchanged — it is what the forward traversal at
    * that position would have written). Shortest o→t paths (o ≠ t)
    * place their k-th vertex at forward depth k and backward depth
    * L−k exactly, so every split meets; per-pair min + distinct
    * reproduce the single-direction result set bit-for-bit. */
  private def typedBidiShortest(srcs: DataFrame, dsts: DataFrame,
                                e0: DataFrame, maxSteps: Int,
                                stepT: String): DataFrame = {
    val fMax = (maxSteps + 1) / 2
    val bMax = maxSteps / 2
    val eF = Traverse.persistEdges(e0, fMax)
    val eB = Traverse.persistEdges(
      e0.select(col("dst").as("src"), col("src").as("dst"), col("etype"),
        col("rank"), col("ss"), col("sd"), col("rev")), bMax)

    def ball(seeds: DataFrame, e: DataFrame,
             lvls: Int): (DataFrame, Seq[DataFrame]) = {
      var frontier = seeds.select(col("vid").as("origin"), col("vid"),
        array(col("vid")).as("vids"), array().cast(stepT).as("steps"),
        lit(0).as("depth")).mat()
      var visited = frontier.select("origin", "vid").mat()
      var levels = Vector(frontier)
      var acc = frontier
      var cnt = frontier.count()
      var d = 1
      while (d <= lvls && cnt > 0) {
        val next = Traverse.maybeBroadcast(frontier, cnt)
          .join(e, frontier("vid") === e("src"))
          .select(col("origin"), e("dst").as("vid"),
            concat(col("vids"), array(e("dst"))).as("vids"),
            concat(col("steps"), array(struct(e("ss").as("s"),
              e("sd").as("d"), e("etype").as("t"), e("rank").as("r"),
              e("rev").as("rev")))).as("steps"),
            lit(d).as("depth"))
          .join(visited.select(col("origin").as("vo"), col("vid").as("vv")),
            col("origin") === col("vo") && col("vid") === col("vv"),
            "left_anti")
          .mat()
        cnt = next.count()
        if (cnt > 0) {
          val v2 = visited.unionByName(next.select("origin", "vid")).mat()
          Traverse.freeCheckpoint(visited)
          visited = v2
          levels :+= next
          acc = acc.unionByName(next)
          frontier = next
        } else Traverse.freeCheckpoint(next)
        d += 1
      }
      Traverse.freeCheckpoint(visited)
      (acc, levels)
    }

    val (fAll, fLevels) = ball(srcs.select("vid").distinct(), eF, fMax)
    val (bAll, bLevels) = ball(dsts.select("vid").distinct(), eB, bMax)
    val f = fAll.select(col("origin"), col("vid"),
      col("vids").as("__fv"), col("steps").as("__fs"),
      col("depth").as("__fd"))
    val b = bAll.select(col("origin").as("__target"), col("vid"),
      col("vids").as("__bv"), col("steps").as("__bs"),
      col("depth").as("__bd"))
    import org.apache.spark.sql.expressions.Window
    val pw = Window.partitionBy("origin", "__target")
    // assemble: forward prefix ++ reversed backward suffix (the meeting
    // vertex is the last element of both vids arrays — drop one copy).
    // A length-L path meets at every split vertex — canonicalizing on
    // the ⌈L/2⌉ split keeps each (vids, steps) row exactly once, with
    // the same multiplicity the single-direction loop produced
    val out = f.join(b, Seq("vid"))
      .withColumn("__hops", col("__fd") + col("__bd"))
      .withColumn("__min", min(col("__hops")).over(pw))
      .filter(col("__hops") === col("__min") &&
        col("__fd") === floor((col("__hops") + 1) / 2).cast("int"))
      .select(
        concat(col("__fv"),
          slice(reverse(col("__bv")), lit(2), size(col("__bv")))).as("vids"),
        concat(col("__fs"), reverse(col("__bs"))).as("steps"))
      .mat() // result-sized; frees every level checkpoint below
    fLevels.foreach(Traverse.freeCheckpoint)
    bLevels.foreach(Traverse.freeCheckpoint)
    Traverse.releaseEdges(eF, fMax)
    Traverse.releaseEdges(eB, bMax)
    out
  }

  /** Path serialization from the traversal vertex sequence + typed
    * steps (Path.cpp toString, relax-comparison form: tags/props
    * omitted, `@0` omitted). */
  private[graft] def renderTypedPath(vids: org.apache.spark.sql.Column,
                                     steps: org.apache.spark.sql.Column,
                                     strVid: Boolean): org.apache.spark.sql.Column = {
    def node(v: org.apache.spark.sql.Column) =
      if (strVid) concat(lit("(\""), v, lit("\")"))
      else concat(lit("("), v.cast("string"), lit(")"))
    concat(
      lit("<"), node(element_at(vids, 1)),
      array_join(zip_with(steps,
        slice(vids, lit(2), greatest(size(vids) - 1, lit(0))),
        (st, v) => concat(
          when(st("rev"), lit("<-[:")).otherwise(lit("-[:")), st("t"),
          when(st("r") =!= 0, concat(lit("@"), st("r").cast("string")))
            .otherwise(lit("")),
          when(st("rev"), lit("]-")).otherwise(lit("]->")),
          node(v))), ""),
      lit(">"))
  }
}
