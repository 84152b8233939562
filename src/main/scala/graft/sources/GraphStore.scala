package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed on-disk graph layout — the Spark-native analogue of the
  * reference's storage partitioning. The reference shards every vertex
  * and its out/in edge keys to partition hash(vid) % parts
  * (src/common/utils/NebulaKeyUtils.h:58-111), which is what makes its
  * GetNeighbors a partition-local read. The Spark equivalent is a
  * bucketed table: `bucketBy(n, key).sortBy(key)` bakes
  * HashPartitioning(key, n) into the FILES, so any join on that key
  * reuses the layout instead of shuffling.
  *
  * Two copies of the edge set are written, exactly like the reference's
  * double-keyed edge storage (each edge stored under its src partition
  * AND its dst partition):
  *   - `<name>_out`: bucketed+sorted by src  (out-adjacency)
  *   - `<name>_in` : bucketed+sorted by dst  (in-adjacency)
  *   - `<name>_v`  : vertices bucketed by vid
  *
  * The payoff, proven in PlanSpec: `twoHop` (in-adjacency ⋈
  * out-adjacency on the middle vertex) plans as a sort-merge join with
  * ZERO Exchange — at 100 TB the edge table is never shuffled, the
  * dominant cost of naive multi-hop expansion. Iterative frontiers
  * (Traverse/GraphAlgos) get the same benefit: the frontier repartitions
  * to the table's bucketing; the edge side stays where it was written.
  *
  * Tables are registered in the session catalog with explicit parquet
  * paths under `dir`, so the layout survives the session (re-`attach` to
  * reuse) and nothing lands in the default warehouse.
  */
object GraphStore {

  /** Write `edges` (src, dst, ...) and `vertices` (vid, ...) as a
    * bucketed store named `name`. Idempotent: Overwrite mode. */
  def write(edges: DataFrame, vertices: DataFrame, name: String,
            dir: String, buckets: Int = 32): Unit = {
    def save(df: DataFrame, table: String, key: String): Unit = {
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", s"$dir/$table")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
    }
    save(edges, s"${name}_out", "src")
    save(edges, s"${name}_in", "dst")
    save(vertices, s"${name}_v", "vid")
  }

  /** Out-adjacency (bucketed by src). */
  def outEdges(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_out")

  /** In-adjacency (bucketed by dst). */
  def inEdges(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_in")

  /** Vertices (bucketed by vid). */
  def vertices(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_v")

  /** All 2-hop paths (a)-[e1]->(m)-[e2]->(b): in-adjacency joined to
    * out-adjacency on the middle vertex. Both sides are bucketed on
    * their join key (dst / src), so the plan is a shuffle-FREE
    * sort-merge join — the property that makes whole-graph 2-hop
    * expansion feasible at 100 TB. Columns: a, m, b, etype1, etype2. */
  def twoHop(spark: SparkSession, name: String): DataFrame = {
    val e1 = inEdges(spark, name)
      .select(col("src").as("a"), col("dst").as("m"),
        col("etype").as("etype1"))
    val e2 = outEdges(spark, name)
      .select(col("src").as("m2"), col("dst").as("b"),
        col("etype").as("etype2"))
    // merge hint: neither side of an edge-×-edge join is broadcastable
    // at scale, and SMJ over the co-bucketed layouts needs no exchange;
    // without the hint a small-data run would broadcast and hide the
    // layout property this operator exists to exercise
    e1.join(e2.hint("merge"), e1("m") === e2("m2")).drop("m2")
  }

  /** One expansion step of an arbitrary frontier against the stored
    * out-adjacency. Only the frontier (small) shuffles — it inherits
    * the table's bucket partitioning through the join; the edge side
    * reads in place. */
  def expand(spark: SparkSession, name: String, frontier: DataFrame,
             vidCol: String = "vid"): DataFrame = {
    val e = outEdges(spark, name)
    frontier.join(e, frontier(vidCol) === e("src"))
  }
}
