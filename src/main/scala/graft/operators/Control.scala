package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Control-flow operators (SURVEY.md §2.6). In the reference these are
  * scheduler-level plan nodes (Loop/Select/PassThrough/Assign in
  * executor/logic/); on Spark the driver program IS the control flow,
  * so these are thin, documented equivalents — they exist to make the
  * mapping explicit (and to carry the one real concern: caching a
  * variable consumed by more than one branch).
  */
object Control {

  /** Loop (LoopExecutor.cpp:15): run `body` while `cond` holds, max
    * `maxIter`. The condition is driver-side (like the reference's
    * loop-condition variable). Returns the final state. */
  def loop[S](init: S, maxIter: Int)(cond: S => Boolean)(body: S => S): S = {
    var s = init
    var i = 0
    while (i < maxIter && cond(s)) { s = body(s); i += 1 }
    s
  }

  /** Select (SelectExecutor.cpp:15): conditional subplan choice. */
  def select(cond: => Boolean)(ifTrue: => DataFrame)(ifFalse: => DataFrame): DataFrame =
    if (cond) ifTrue else ifFalse

  /** PassThrough (PassThroughExecutor.cpp:11): one variable fanned out
    * to multiple consumers — on Spark that means caching it so each
    * consumer doesn't recompute the lineage. */
  def passThrough(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    df.persist(level)

  /** Assign (AssignExecutor.cpp:12): `$var = <subplan>` — a Scala val.
    * Provided for mapping completeness; `assign(df)(f)` scopes the
    * variable like the reference's symbol table does. */
  def assign[T](df: DataFrame)(use: DataFrame => T): T = use(df)

  /** UnionAllVersionVar (UnionAllVersionVarExecutor.cpp:12): union all
    * versions a loop variable took — accumulate and reduce. */
  def unionAllVersions(versions: Seq[DataFrame]): DataFrame = {
    require(versions.nonEmpty, "no versions to union")
    versions.reduce(_ unionByName _)
  }
}
