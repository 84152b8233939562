package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured keyed table: the high-churn sibling of
  * Mutations.KeyedTable. KeyedTable rewrites the WHOLE table per
  * mutation batch (one staged merge — right for occasional DML);
  * LogTable APPENDS each batch as an immutable delta segment and
  * resolves the current state at READ time by last-writer-wins over
  * (key, segment sequence), with delete tombstones. That makes
  * streaming ingest cost O(batch) per microbatch instead of O(table) —
  * the same base+delta design as the reference's storage engine, where
  * writes land in a RocksDB memtable/WAL and reads merge LSM levels
  * (src/kvstore/RocksEngine.cpp), with `compact()` playing the role of
  * its manual compaction job (src/storage/admin/CompactTask.cpp).
  *
  * Layout: `path/seg=NNNNNNNN/` parquet dirs, NNNNNNNN a zero-padded
  * monotonically increasing sequence. Every row carries the writer's
  * `op` ('insert' | 'delete'). Each segment is written to a staging
  * dir and renamed into place (checked, via the Hadoop FileSystem API
  * — HDFS/S3-connector safe like Mutations), so readers see whole
  * segments or nothing.
  *
  * Read cost is one window over base+deltas (a single shuffle on the
  * key); `compact()` folds everything into a fresh seg=0 so the read
  * amplification is bounded by compaction cadence — the ingest loop
  * calls it every N batches, exactly like an LSM.
  */
final case class LogTable(spark: SparkSession, path: String,
                          keys: Seq[String]) {
  import org.apache.hadoop.fs.Path

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val SegRe = "seg=(\\d{8})".r

  /** Existing segment sequence numbers, ascending. */
  def segments: Seq[Long] = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case SegRe(n) => Some(n.toLong)
        case _ => None
      }
    }.sorted
  }

  def exists: Boolean = segments.nonEmpty

  private def segPath(seq: Long): String = f"$path/seg=$seq%08d"

  /** Append one mutation batch (rows with an `op` column: 'insert' |
    * 'delete'; delete rows need only their keys) as a new immutable
    * segment. O(batch): the existing table is never read or
    * rewritten. */
  def append(batch: DataFrame): Unit = {
    require(batch.columns.contains("op"),
      "LogTable.append needs an op column ('insert' | 'delete')")
    val seq = segments.lastOption.getOrElse(-1L) + 1
    val stage = new Path(path + f".stage-$seq%08d")
    batch.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    moveIntoTable(stage, seq)
  }

  /** Checked rename of a staged segment into the table. The table
    * root is created first: FileSystem.rename fails (HDFS/S3) or
    * silently degrades to a non-atomic copy (RawLocalFileSystem) when
    * the destination's parent does not exist. */
  private def moveIntoTable(stage: Path, seq: Long): Unit = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) require(f.mkdirs(root), s"mkdirs $root failed")
    val target = new Path(segPath(seq))
    require(f.rename(stage, target), s"rename $stage -> $target failed")
  }

  /** Current state: per key, the row from the HIGHEST segment wins;
    * tombstones drop the key. Within one segment a delete outranks an
    * insert of the same key ('delete' < 'insert' lexically — matching
    * the statement order GraphIngest applies: inserts, then deletes).
    * Callers must not put two CONFLICTING inserts for one key in a
    * single batch (cross-batch conflicts resolve by sequence). One
    * shuffle (the window on the key). */
  def read: DataFrame = {
    val segs = segments
    require(segs.nonEmpty, s"LogTable at $path has no segments")
    val all = segs.map { s =>
      spark.read.parquet(segPath(s)).withColumn("__seg", lit(s))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__seg").desc, col("op").asc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") === "insert")
      .drop("__rn", "__seg", "op")
  }

  /** Fold all segments into a single fresh segment holding the
    * resolved state (bounds read amplification; call every N appends).
    * Staged: the new segment lands before the old ones are removed, so
    * a crash mid-compaction leaves a readable (if larger) table —
    * read resolves the duplicate rows to the same values because the
    * compacted segment has the highest sequence. */
  def compact(): Unit = {
    val old = segments
    if (old.size <= 1) return
    // the parquet write below fully materializes the resolved state
    // while the old segments still exist; they are only removed after
    // the rename lands, so no lineage survives onto deleted paths
    val resolved = read.withColumn("op", lit("insert"))
    val seq = old.last + 1
    val stage = new Path(path + f".stage-$seq%08d")
    resolved.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    moveIntoTable(stage, seq)
    old.foreach { s =>
      val p = new Path(segPath(s))
      require(fs(p).delete(p, true), s"delete $p failed")
    }
  }
}
