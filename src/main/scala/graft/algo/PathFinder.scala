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
  /** One side of the adaptive meet-in-the-middle search: frontier,
    * accumulated levels (every row at its per-origin first-arrival
    * depth — all tied paths kept), visited pruning, checkpoint
    * lifecycle. `expand` applies the caller's raw one-hop extension,
    * prunes it against visited, checkpoints, and bumps the depth. */
  private final class BidiSide(seed0: DataFrame) {
    var frontier: DataFrame = seed0
    var acc: DataFrame = seed0
    var levels: Vector[DataFrame] = Vector(seed0)
    // DISTINCT (origin, vid) membership set: the frontier carries one
    // row per PATH, so deduping each level before it joins the set
    // keeps both the per-level anti-join's build side and the
    // met-pairs join proportional to |reached|, not to path
    // multiplicity (which grows exponentially on dense graphs)
    private var visited = seed0.select("origin", "vid").distinct().mat()
    var top = 0
    var cnt: Long = frontier.count()
    /** Final expansion depth per PRUNED origin (stopped early because
      * all its pairs resolved) — driver-side, bounded by the pruning
      * seed-size gate. Unpruned origins implicitly cap at `top`. */
    val capsLocal = scala.collection.mutable.HashMap.empty[Any, Int]
    /** The side's full (origin, vid) reached set — one incremental
      * DISTINCT materialized frame, so the met-pairs check never
      * re-distincts the accumulated ball. */
    def visitedSet: DataFrame = visited
    def expand(raw: DataFrame): DataFrame = {
      val next = raw.join(
          visited.select(col("origin").as("vo"), col("vid").as("vv")),
          col("origin") === col("vo") && col("vid") === col("vv"),
          "left_anti")
        .mat()
      cnt = next.count()
      if (cnt > 0) {
        // next's pairs are disjoint from visited (the anti-join), so
        // union-of-distincts stays distinct without a global re-dedup
        val v2 = visited
          .unionByName(next.select("origin", "vid").distinct()).mat()
        Traverse.freeCheckpoint(visited)
        visited = v2
        levels :+= next
        acc = acc.unionByName(next)
        frontier = next
        top += 1
        next
      } else { Traverse.freeCheckpoint(next); null }
    }
    /** Stop expanding fully-resolved origins: record their final
      * depth (= current top) and filter them out of the frontier with
      * a literal predicate — it FUSES into the next hop join's scan
      * of the frontier checkpoint, costing no extra action or copy.
      * `cnt` intentionally keeps the pre-filter count (a safe upper
      * bound for the smaller-side choice and the broadcast gate). */
    def prune(newlyDone: Iterable[Any]): Unit = if (newlyDone.nonEmpty) {
      newlyDone.foreach(o => capsLocal(o) = top)
      frontier = frontier.filter(!col("origin").isin(newlyDone.toSeq: _*))
    }
    /** The (origin, __cap) frame for the assembly's per-origin split —
      * tiny by the gate, so callers broadcast it. None when nothing
      * was pruned. */
    def capsFrame: Option[DataFrame] = if (capsLocal.isEmpty) None else {
      val spark = acc.sparkSession
      val of = levels(0).schema("origin")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        of.copy(name = "origin"),
        org.apache.spark.sql.types.StructField("__cap",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
      val rows = capsLocal.toSeq.map { case (o, d) =>
        org.apache.spark.sql.Row(o, d) }
      Some(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema))
    }
    def close(): Unit = Traverse.freeCheckpoint(visited)
  }

  /** ADAPTIVE bidirectional meet-in-the-middle driver (the reference's
    * left/right frontiers, BFSShortestPathExecutor.cpp:12), shared by
    * the plain and typed shortest-path surfaces. Each step expands the
    * SMALLER frontier (asymmetric endpoint sets never blow up the big
    * side), and the search stops as soon as ANY of:
    *  - every (src, dst) pair has met — a pair's first meet happens
    *    exactly when fTop + bTop reaches its distance (levels grow one
    *    at a time, and a shortest path splits at every index), so on
    *    fully-reachable endpoint sets the search runs distance-many
    *    level expansions TOTAL, not maxSteps;
    *  - either frontier empties — that side's ball is complete, so
    *    every reachable pair already meets it (at depth-0 on the other
    *    side if nowhere else);
    *  - fTop + bTop = maxSteps — the cap.
    * On a graph of branching factor b the two balls visit O(b^(n/2))
    * vertices instead of the single-direction O(b^n).
    *
    * Exactness: every vertex of a shortest o→t path (o ≠ t) sits at
    * forward depth = its index and backward depth = L − index (else a
    * shortcut would beat L), so all shortest paths meet at every
    * computed split; the caller reconstructs at the single canonical
    * split min(fTop, L) — always computed, see the inequalities in
    * the assembly — which reproduces the single-direction loop's row
    * multiset (prefix-multiplicity × suffix-multiplicity at one split
    * = whole-path multiplicity). Pairs with src == dst never meet
    * here (cycle semantics stay on the single-direction loop).
    *
    * `pairsTotal` counts the resolvable (src ≠ dst) endpoint pairs;
    * pass -1 to disable the met-pairs early exit. Returns the two
    * sides, closed, with all level checkpoints still live. */
  private def bidiDrive(fSide: BidiSide, bSide: BidiSide,
                        eF: DataFrame, eB: DataFrame, maxSteps: Int,
                        pairsTotal: Long,
                        extendF: (DataFrame, Long, Int) => DataFrame,
                        extendB: (DataFrame, Long, Int) => DataFrame)
      : Unit = {
    var met = 0L
    var metPairs: DataFrame = null
    // Resolved-pair pruning, gated to COLLECTABLE endpoint sets (the
    // reference's FIND SHORTEST endpoint lists are user-supplied and
    // small): both seed sets are collected once, the per-origin
    // requirement map lives on the driver (overlap with the other
    // endpoint set lowers a requirement by one — src == dst pairs
    // never resolve here), and each meets-level pays ONE extra
    // collect (per-origin met counts, ≤ seed-sized). A single-seed
    // side never prunes (its full resolution IS the loop's exit
    // condition), so single-pair deep searches like LDBC IC13 skip
    // the bookkeeping entirely.
    val PruneMaxSeeds = 1024
    var needFm: Map[Any, Long] = null
    var needBm: Map[Any, Long] = null
    if (pairsTotal >= 2) {
      val sv = fSide.levels(0).select(col("origin")).distinct()
        .limit(PruneMaxSeeds + 1).collect().map(_.get(0)).toSeq
      val dv = bSide.levels(0).select(col("origin")).distinct()
        .limit(PruneMaxSeeds + 1).collect().map(_.get(0)).toSeq
      if (sv.size <= PruneMaxSeeds && dv.size <= PruneMaxSeeds) {
        val sSet = sv.toSet; val dSet = dv.toSet
        if (sv.size > 1) needFm = sv.map(o =>
          o -> (dv.size - (if (dSet(o)) 1 else 0)).toLong).toMap
        if (dv.size > 1) needBm = dv.map(o =>
          o -> (sv.size - (if (sSet(o)) 1 else 0)).toLong).toMap
      }
    }
    /** Origins of `side` (po = the metPairs column it owns) that have
      * met EVERY required counterpart — stop expanding them. Their
      * already-computed levels stay for the assembly; capsLocal
      * records each pruned origin's final depth, which the assemblies'
      * per-origin canonical split uses (a pruned ball is complete up
      * to its cap, and every pair of a pruned origin met while both
      * balls were still within their caps — see the split inequality
      * in the assembly comments). */
    def pruneResolved(side: BidiSide, po: String,
                      need: Map[Any, Long]): Unit =
      if (metPairs != null && need != null) {
        val metCnt = metPairs.groupBy(col(po).as("origin"))
          .agg(count(lit(1)).as("__met")).collect()
        val done = metCnt.iterator
          .filter(r => need.getOrElse(r.get(0), Long.MaxValue) <= r.getLong(1))
          .map(_.get(0))
          .filterNot(side.capsLocal.contains)
          .toSeq
        side.prune(done)
      }
    def recordMeets(newLevel: DataFrame, other: BidiSide,
                    newIsFwd: Boolean): Unit =
      if (newLevel != null && pairsTotal >= 0) {
        val nl = newLevel.select(col("origin"), col("vid")).distinct()
        // the other side's reached set is its incrementally-maintained
        // visited frame — no per-level re-distinct of the whole ball
        val ot = other.visitedSet.select(col("origin").as("__o2"), col("vid"))
        val p0 = nl.join(ot, Seq("vid"))
        val pairs =
          (if (newIsFwd)
             p0.select(col("origin").as("__po"), col("__o2").as("__pt"))
           else
             p0.select(col("__o2").as("__po"), col("origin").as("__pt")))
            .filter(col("__po") =!= col("__pt"))
            .distinct()
        // incremental: only genuinely NEW pairs join the met set (and
        // bump the count) — the accumulated set is never re-distincted
        val fresh =
          (if (metPairs == null) pairs
           else pairs.join(metPairs
               .select(col("__po").as("__mo"), col("__pt").as("__mt")),
             col("__po") === col("__mo") && col("__pt") === col("__mt"),
             "left_anti")).mat()
        val freshCnt = fresh.count()
        if (freshCnt > 0) {
          met += freshCnt
          val m2 = (if (metPairs == null) fresh
                    else metPairs.unionByName(fresh)).mat()
          if (metPairs != null) Traverse.freeCheckpoint(metPairs)
          metPairs = m2
          // new meets may have fully resolved some endpoints: stop
          // expanding them (seeded many-pair searches otherwise keep
          // growing every origin's ball until the LAST pair resolves)
          if (met < pairsTotal) {
            pruneResolved(fSide, "__po", needFm)
            pruneResolved(bSide, "__pt", needBm)
          }
        }
        Traverse.freeCheckpoint(fresh)
      }
    while (fSide.top + bSide.top < maxSteps &&
           fSide.cnt > 0 && bSide.cnt > 0 &&
           (pairsTotal < 0 || met < pairsTotal)) {
      if (fSide.cnt <= bSide.cnt) {
        val nl = fSide.expand(
          extendF(fSide.frontier, fSide.cnt, fSide.top + 1))
        recordMeets(nl, bSide, newIsFwd = true)
      } else {
        val nl = bSide.expand(
          extendB(bSide.frontier, bSide.cnt, bSide.top + 1))
        recordMeets(nl, fSide, newIsFwd = false)
      }
    }
    if (metPairs != null) Traverse.freeCheckpoint(metPairs)
    fSide.close(); bSide.close()
  }

  /** Resolvable-pair count for the met-pairs early exit: |srcs|×|dsts|
    * minus the overlap (src == dst pairs never resolve here). Three
    * cheap actions over the seed frames. */
  private def resolvablePairs(srcs: DataFrame, dsts: DataFrame): Long = {
    val s = srcs.select("vid").distinct()
    val d = dsts.select("vid").distinct()
    val sCnt = s.count(); val dCnt = d.count()
    sCnt * dCnt - s.join(d, Seq("vid"), "left_semi").count()
  }

  /** Step-cap threshold for the bidirectional strategy. Shallow caps
    * keep the single-direction loop: its level count is already small,
    * and a backward ball from a high-fan-in endpoint set (e.g. sink
    * vertices every edge points at) can cost more than the whole
    * forward search — measured 1.6-2.6× on the 4-hop star-schema
    * queries. Deep caps are where the forward ball's exponent
    * dominates and the two half-depth balls (plus the met-pairs early
    * exit) win — measured 0.69× on the 15-hop LDBC IC13. */
  val BidiMinSteps = 6

  /** Conf key overriding [[BidiMinSteps]] per session — for operators
    * who know their graph's backward fan shape. An AUTOMATIC per-query
    * probe was tried and rejected with measurement (round 13): the
    * natural signal, 1-hop in-degree of the dst set, is demonstrably
    * insufficient — on the 4-hop star-schema caps the backward level-1
    * ball from the region sinks is 25 rows (looks bidi-safe) while the
    * explosion arrives at depth 2 (the full customer/supplier layer)
    * and forced bidi measures 1.66× the forward loop; seeing depth 2
    * means running two backward hops, i.e. paying most of the loss
    * before deciding. A constant calibrated on the measured crossover,
    * overridable where the operator knows better, beats a probe that
    * is wrong exactly on the shapes it exists to protect. */
  val ConfBidiMinSteps = "spark.graft.bidiMinSteps"

  private def bidiMinSteps(df: DataFrame): Int =
    df.sparkSession.conf.get(ConfBidiMinSteps, BidiMinSteps.toString).toInt

  def shortestPaths(srcs: DataFrame, dsts: DataFrame, edges: DataFrame,
                    maxSteps: Int, dir: Direction = Out,
                    singlePath: Boolean = false): DataFrame = {
    if (maxSteps < bidiMinSteps(edges))
      return forwardShortest(srcs, dsts, edges, maxSteps, dir, singlePath)
    val e0 = Traverse.orient(edges, dir).select("src", "dst")
    val eF = Traverse.persistEdges(e0, maxSteps)
    val eB = Traverse.persistEdges(
      e0.select(col("dst").as("src"), col("src").as("dst")), maxSteps)

    def seed(seeds: DataFrame) = new BidiSide(
      seeds.select(col("vid").as("origin"), col("vid"),
        array(col("vid")).as("path"), lit(0).as("depth")).mat())
    def extend(e: DataFrame)(frontier: DataFrame, cnt: Long,
                             d: Int): DataFrame =
      Traverse.maybeBroadcast(frontier, cnt)
        .join(e, frontier("vid") === e("src"))
        .select(col("origin"), e("dst").as("vid"),
          concat(col("path"), array(e("dst"))).as("path"),
          lit(d).as("depth"))

    val fS = seed(srcs)
    val bS = seed(dsts.select(col("vid")).distinct())
    bidiDrive(fS, bS, eF, eB, maxSteps,
      resolvablePairs(srcs, dsts), extend(eF), extend(eB))

    val f = fS.acc.select(col("origin"), col("vid"),
      col("path").as("__fpath"), col("depth").as("__fd"))
    val b = bS.acc.select(col("origin").as("__target"), col("vid"),
      col("path").as("__bpath"), col("depth").as("__bd"))
    val cand = f.join(b, Seq("vid"))
      .filter(col("origin") =!= col("__target"))
      .withColumn("hops", col("__fd") + col("__bd"))
    import org.apache.spark.sql.expressions.Window
    val pw = Window.partitionBy("origin", "__target")
    // canonical split min(fcap_o, L), fcap_o = the origin's FINAL
    // forward depth (fS.top, or its prune depth if it resolved early):
    // always within both computed ball depths for a met pair — o's
    // ball is complete to fcap_o; and if fcap_o < L the pair met while
    // o was active, so some meet vertex v has bwd depth ≥ L − fcap_o,
    // putting the backward ball's cap at ≥ L − fcap_o too. One split
    // keeps the single-direction row multiplicity exactly (parallel
    // (src, dst) edge rows legitimately duplicate a vid-rendered path).
    val withCap = fS.capsFrame match {
      case None => cand.withColumn("__cap", lit(fS.top))
      case Some(caps) => cand.join(broadcast(caps), Seq("origin"), "left_outer")
        .withColumn("__cap", coalesce(col("__cap"), lit(fS.top)))
    }
    val out = withCap.withColumn("__min", min(col("hops")).over(pw))
      .filter(col("hops") === col("__min") &&
        col("__fd") === least(col("__cap"), col("hops")))
      .select(col("origin").as("src"), col("__target").as("dst"),
        array_join(concat(col("__fpath"),
          slice(reverse(col("__bpath")), lit(2), size(col("__bpath")))), "->")
          .as("path"),
        col("hops"))
      .mat() // result-sized; lets every level checkpoint be freed
    fS.levels.foreach(Traverse.freeCheckpoint)
    bS.levels.foreach(Traverse.freeCheckpoint)
    Traverse.releaseEdges(eF, maxSteps)
    Traverse.releaseEdges(eB, maxSteps)
    if (singlePath) {
      val w = Window.partitionBy(col("src"), col("dst")).orderBy(col("path"))
      out.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    } else out
  }

  /** The classic single-direction BFS (shallow caps — see
    * BidiMinSteps): per-origin visited pruning, hits collected the
    * first level each (src, dst) pair is reached. */
  private def forwardShortest(srcs: DataFrame, dsts: DataFrame,
                              edges: DataFrame, maxSteps: Int,
                              dir: Direction,
                              singlePath: Boolean): DataFrame = {
    val e = Traverse.persistEdges(
      Traverse.orient(edges, dir).select("src", "dst"), maxSteps)
    val dstSet = broadcast(dsts.select(col("vid").as("__target")).distinct())
      .mat()

    var frontier = srcs.select(col("vid").as("origin"),
      array(col("vid")).as("path"), col("vid")).mat()
    var visited = frontier.select(col("origin"), col("vid")).mat()
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
        .mat()
      // checkpoint the (small) per-level hits so `found` never holds a
      // reference to the (large) frontier checkpoints — which can then
      // be freed as soon as they are superseded (session hygiene)
      val hits = next.join(dstSet, next("vid") === col("__target"))
        .select(col("origin").as("src"), col("vid").as("dst"),
          array_join(col("path"), "->").as("path"), lit(step).as("hops"))
        .mat()
      found = if (found == null) hits else found.unionByName(hits)
      val v2 = visited.unionByName(next.select("origin", "vid"))
        .mat()
      Traverse.freeCheckpoint(visited) // superseded by v2
      Traverse.freeCheckpoint(frontier) // consumed by next + hits
      visited = v2
      frontier = next
      cnt = frontier.count()
      step += 1
    }
    Traverse.freeCheckpoint(frontier) // rows live in visited / hits
    Traverse.freeCheckpoint(visited)
    Traverse.freeCheckpoint(dstSet)
    Traverse.releaseEdges(e, maxSteps) // hits are checkpointed
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
    // Deep-cap DISJOINT endpoint sets take the bidirectional route
    // (adaptive half-depth balls + met-pairs early exit instead of one
    // full-depth ball — the 15-hop MATCH shortestPath caps are
    // exponentially cheaper; see BidiMinSteps for the shallow-cap
    // evidence). Overlapping sets keep the single-direction loop: a
    // src==dst pair's shortest path is a CYCLE (visited starts empty
    // below), whose split-invariant does not hold for the
    // meet-in-the-middle argument. The disjointness probe (one limit-1
    // semi-join action) is only paid on deep caps.
    if (mode == "shortest" && maxSteps >= bidiMinSteps(edges) &&
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
    * DISJOINT endpoint sets, built on the adaptive [[bidiDrive]]: the
    * backward ball walks the REVERSED orientation (each oriented row
    * flipped; the recorded step struct is unchanged — it is what the
    * forward traversal at that position would have written), the
    * smaller frontier expands first, and the search stops at the
    * first level where every pair has met. Per-pair min + the
    * canonical split reproduce the single-direction result set
    * bit-for-bit. */
  private def typedBidiShortest(srcs: DataFrame, dsts: DataFrame,
                                e0: DataFrame, maxSteps: Int,
                                stepT: String): DataFrame = {
    val eF = Traverse.persistEdges(e0, maxSteps)
    val eB = Traverse.persistEdges(
      e0.select(col("dst").as("src"), col("src").as("dst"), col("etype"),
        col("rank"), col("ss"), col("sd"), col("rev")), maxSteps)

    def seed(seeds: DataFrame) = new BidiSide(
      seeds.select(col("vid").as("origin"), col("vid"),
        array(col("vid")).as("vids"), array().cast(stepT).as("steps"),
        lit(0).as("depth")).mat())
    def extend(e: DataFrame)(frontier: DataFrame, cnt: Long,
                             d: Int): DataFrame =
      Traverse.maybeBroadcast(frontier, cnt)
        .join(e, frontier("vid") === e("src"))
        .select(col("origin"), e("dst").as("vid"),
          concat(col("vids"), array(e("dst"))).as("vids"),
          concat(col("steps"), array(struct(e("ss").as("s"),
            e("sd").as("d"), e("etype").as("t"), e("rank").as("r"),
            e("rev").as("rev")))).as("steps"),
          lit(d).as("depth"))

    val sSet = srcs.select("vid").distinct()
    val dSet = dsts.select("vid").distinct()
    val pairsTotal = sSet.count() * dSet.count() // disjoint by the gate
    val fS = seed(sSet)
    val bS = seed(dSet)
    bidiDrive(fS, bS, eF, eB, maxSteps, pairsTotal, extend(eF), extend(eB))

    val f = fS.acc.select(col("origin"), col("vid"),
      col("vids").as("__fv"), col("steps").as("__fs"),
      col("depth").as("__fd"))
    val b = bS.acc.select(col("origin").as("__target"), col("vid"),
      col("vids").as("__bv"), col("steps").as("__bs"),
      col("depth").as("__bd"))
    import org.apache.spark.sql.expressions.Window
    val pw = Window.partitionBy("origin", "__target")
    // assemble: forward prefix ++ reversed backward suffix (the meeting
    // vertex is the last element of both vids arrays — drop one copy);
    // the canonical per-origin min(fcap_o, L) split keeps each
    // (vids, steps) row exactly once (see shortestPaths)
    val joined = f.join(b, Seq("vid"))
    val withCap = fS.capsFrame match {
      case None => joined.withColumn("__cap", lit(fS.top))
      case Some(caps) => joined.join(broadcast(caps), Seq("origin"), "left_outer")
        .withColumn("__cap", coalesce(col("__cap"), lit(fS.top)))
    }
    val out = withCap
      .withColumn("__hops", col("__fd") + col("__bd"))
      .withColumn("__min", min(col("__hops")).over(pw))
      .filter(col("__hops") === col("__min") &&
        col("__fd") === least(col("__cap"), col("__hops")))
      .select(
        concat(col("__fv"),
          slice(reverse(col("__bv")), lit(2), size(col("__bv")))).as("vids"),
        concat(col("__fs"), reverse(col("__bs"))).as("steps"))
      .mat() // result-sized; frees every level checkpoint below
    fS.levels.foreach(Traverse.freeCheckpoint)
    bS.levels.foreach(Traverse.freeCheckpoint)
    Traverse.releaseEdges(eF, maxSteps)
    Traverse.releaseEdges(eB, maxSteps)
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
