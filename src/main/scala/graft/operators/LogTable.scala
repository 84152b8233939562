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
    * rewritten.
    *
    * Writer-safe: the sequence number is CLAIMED by the rename, not by
    * the pre-scan — rename-to-existing fails on every Hadoop
    * FileSystem, so when two writers race the same number the loser
    * observes the failure and retries with the next one. The staged
    * batch is written once; only the (cheap) rename retries. */
  def append(batch: DataFrame): Unit = {
    require(batch.columns.contains("op"),
      "LogTable.append needs an op column ('insert' | 'delete')")
    var seq = segments.lastOption.getOrElse(-1L) + 1
    val stage = new Path(path + f".stage-$seq%08d-${java.util.UUID.randomUUID().toString.take(8)}")
    batch.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    writeKeyStats(stage)
    var attempts = 0
    while (!moveIntoTable(stage, seq)) {
      attempts += 1
      require(attempts < 1000, s"could not claim a segment seq after $attempts tries")
      seq = math.max(seq + 1, segments.lastOption.getOrElse(-1L) + 1)
    }
  }

  /** Min/max of the first key column over the staged batch, written as
    * a `.keyrange` sidecar INSIDE the segment dir (so the rename
    * carries it atomically with the data). Powers `prunedSegments`. */
  private def writeKeyStats(stage: Path): Unit = {
    val df = spark.read.parquet(stage.toString)
    val k = keys.head
    val row = df.agg(min(col(k).cast("string")).as("lo"),
      max(col(k).cast("string")).as("hi")).head
    if (!row.isNullAt(0)) {
      val f = fs(stage)
      val out = f.create(new Path(stage, ".keyrange"), true)
      try out.write(s"${row.getString(0)}\n${row.getString(1)}"
        .getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Parse a segment's `.keyrange` sidecar: (min, max) of its first
    * key column. None for legacy segments written before stats. */
  private def keyRange(seq: Long): Option[(String, String)] = {
    val p = new Path(segPath(seq), ".keyrange")
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        new String(buf.toByteArray, "UTF-8").split("\n", 2) match {
          case Array(lo, hi) => Some((lo, hi))
          case _ => None
        }
      } finally in.close()
    }
  }

  /** Checked rename of a staged segment into the table; false when the
    * target sequence is already claimed by another writer. The table
    * root is created first: FileSystem.rename fails (HDFS/S3) or
    * silently degrades to a non-atomic copy (RawLocalFileSystem) when
    * the destination's parent does not exist. */
  private def moveIntoTable(stage: Path, seq: Long): Boolean = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) require(f.mkdirs(root), s"mkdirs $root failed")
    val target = new Path(segPath(seq))
    if (f.exists(target)) false
    else f.rename(stage, target)
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
    resolve(segs, None)
  }

  /** Segments whose first-key [min, max] stats may intersect
    * [lo, hi]. Legacy segments without a `.keyrange` sidecar are
    * always kept (pruning must stay sound). */
  def prunedSegments(lo: String, hi: String): Seq[Long] =
    segments.filter { s =>
      keyRange(s) match {
        case Some((mn, mx)) => !(mx < lo || mn > hi)
        case None => true
      }
    }

  /** Range/point lookup on the FIRST key column: resolves
    * last-writer-wins over ONLY the segments whose min/max stats may
    * contain the range — sound because every segment holding any row
    * of a key (insert or tombstone) contains that key and therefore
    * survives the overlap test. A point lookup on a compacted-plus-
    * fresh-deltas table scans O(deltas touching the key), not
    * O(all segments) — the LSM read path the reference gets from
    * RocksDB's SST min/max pruning. */
  def readRange(lo: String, hi: String): DataFrame = {
    val all = segments
    require(all.nonEmpty, s"LogTable at $path has no segments")
    val segs = prunedSegments(lo, hi)
    if (segs.isEmpty)
      resolve(Seq(all.head), None).limit(0)
    else resolve(segs, Some((lo, hi)))
  }

  /** LWW resolution over the given segments, optionally pre-filtered
    * to a first-key range (the filter is applied per segment BEFORE
    * the window, so the shuffle carries only the range's rows). */
  private def resolve(segs: Seq[Long],
                      range: Option[(String, String)]): DataFrame = {
    val all = segs.map { s =>
      val df = spark.read.parquet(segPath(s)).withColumn("__seg", lit(s))
      range match {
        case Some((lo, hi)) =>
          val k = col(keys.head).cast("string")
          df.filter(k >= lo && k <= hi)
        case None => df
      }
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
    var seq = old.last + 1
    val stage = new Path(path + f".stage-$seq%08d-compact")
    resolved.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    writeKeyStats(stage)
    var attempts = 0
    while (!moveIntoTable(stage, seq)) {
      attempts += 1
      require(attempts < 1000, s"could not claim a segment seq after $attempts tries")
      seq = math.max(seq + 1, segments.lastOption.getOrElse(-1L) + 1)
    }
    old.foreach { s =>
      val p = new Path(segPath(s))
      require(fs(p).delete(p, true), s"delete $p failed")
    }
  }
}
