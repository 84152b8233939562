package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.GraphCatalog
import graft.operators.Apply
import graft.traverse.Traverse
import graft.traverse.Traverse.{Direction, Out}

/** MATCH clause pipeline builder — the Spark re-expression of the
  * reference's MatchPlanner chain (SURVEY.md §3 entry point 1:
  * planner/match/MatchPlanner.cpp:26, MatchClausePlanner.cpp:18,
  * SegmentsConnector.cpp):
  *
  *   seek (start point) → traverse steps → appendVertices → where →
  *   optional-match (left join) → pattern predicate (semi/anti) →
  *   with/return (project).
  *
  * Seeks are just filters over vertex tables — Catalyst picks the
  * access path (the reference's seek-strategy priority list collapses
  * into predicate pushdown, PlannersRegister.cpp:94-118). Connectors
  * are joins (SegmentsConnector innerJoin/leftJoin/cartesianProduct →
  * Apply.*).
  *
  * The builder keeps a single DataFrame as the binding table (same
  * row-shape idea as the reference's intermediate DataSet) with one
  * column per bound variable; each step renames its output into the
  * variable's name space (`v`, `e_src`, ...).
  */
final case class MatchBuilder(g: GraphCatalog, binding: DataFrame) {

  /** (v:label WHERE pred) — start a pattern from a labeled vertex
    * seek (LabelIndexSeek/ScanSeek equivalent). Binds `as` to vid and
    * `as_<prop>` columns. */
  def seek(label: String, as: String, pred: Column = lit(true)): MatchBuilder = {
    val tbl = vertexTable(label).filter(pred)
    val named = tbl.columns.foldLeft(tbl)((df, c) =>
      df.withColumnRenamed(c, if (c == "vid") as else s"${as}_$c"))
    copy(binding =
      if (binding == null) named
      else binding.crossJoin(named)) // disconnected pattern → cartesian
  }

  /** -[:etype*m..n]-> from variable `from`, binding end vertex to `to`.
    * Single-step (m=n=1) keeps it relational; ranges go through the
    * traversal loop. */
  def expand(from: String, etype: String, to: String, m: Int = 1, n: Int = 1,
             dir: Direction = Out): MatchBuilder = {
    val seeds = binding.select(col(from).as("vid")).distinct()
    val reached = Traverse.go(seeds, g.edgesByType(etype), m, n, dir)
      .select(col("origin").as(from), col("vid").as(to))
    copy(binding = binding.join(reached, Seq(from)))
  }

  /** AppendVertices: pull the end vertex's props into the binding. */
  def withProps(v: String, label: String): MatchBuilder = {
    val tbl = vertexTable(label)
    val named = tbl.columns.foldLeft(tbl)((df, c) =>
      df.withColumnRenamed(c, if (c == "vid") v else s"${v}_$c"))
    copy(binding = binding.join(named, Seq(v), "left_outer"))
  }

  /** WHERE over the binding table. */
  def where(pred: Column): MatchBuilder = copy(binding = binding.filter(pred))

  /** OPTIONAL MATCH segment → left join on the shared variables
    * (SegmentsConnector.cpp:39). */
  def optional(segment: DataFrame, on: Seq[String]): MatchBuilder =
    copy(binding = Apply.leftJoin(binding, segment, on))

  /** Pattern predicate WHERE (v)-[:e]->() / NOT ... → semi/anti join
    * (PatternApplyExecutor). */
  def wherePattern(from: String, etype: String, anti: Boolean = false,
                   dir: Direction = Out): MatchBuilder = {
    val ends = Traverse.orient(g.edgesByType(etype), dir)
      .select(col("src").as(from))
    copy(binding = Apply.patternApply(binding, ends, Seq(from), anti))
  }

  /** RETURN clause. */
  def ret(cols: Column*): DataFrame = binding.select(cols: _*)

  /** Any GraphCatalog serves the label lookup — the TPC-H graph, the
    * nba fixtures, a lakehouse binding (no hardcoded schema). */
  private def vertexTable(label: String): DataFrame = g.vertexTable(label)
}

object MatchBuilder {
  def apply(g: GraphCatalog): MatchBuilder = MatchBuilder(g, null)
}
