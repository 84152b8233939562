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
object LogTable {
  /** Conf key: orphaned-stage TTL in ms (see gcOrphanStages). */
  val ConfStageTtl = "spark.graft.logtable.stageTtlMs"
  val DefaultStageTtlMs: Long = 12L * 3600 * 1000
}

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
    * Writer-safe: the sequence number is CLAIMED by moving the staged
    * dir into place (see claimSegment — the loser of a race observes
    * the collision and retries with the next number). The staged batch
    * is written once; only the claim retries. */
  def append(batch: DataFrame): Unit = {
    require(batch.columns.contains("op"),
      "LogTable.append needs an op column ('insert' | 'delete')")
    val stage = stagePath()
    batch.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    writeKeyStats(stage)
    claimSegment(stage, fresh = true)
    gcOrphanStages()
  }

  /** Staging dirs live INSIDE the table root under a dot-hidden name:
    * Spark's file index skips dot/underscore basenames at every level,
    * so even a stage dir that lands NESTED inside a claimed segment
    * during the claimSegment TOCTOU window (rename onto a dir that
    * appeared after the pre-check moves the source into it) is
    * invisible to concurrent readers until it is un-nested. */
  private def stagePath(): Path =
    new Path(path,
      f".stage-${java.util.UUID.randomUUID().toString.take(12)}")

  /** Claim the next free sequence for a fully-written staged segment.
    * Two losing modes, both detected:
    *  - the target already exists at the pre-check → try the next seq;
    *  - the TOCTOU window: Hadoop `rename` onto a directory that
    *    appeared after the pre-check does NOT fail — it moves the
    *    source INTO it as a child. Detected by checking for the nested
    *    dir after the rename; the nested dir is moved back out to a
    *    fresh stage path and the claim retries with the next seq.
    * `fresh = false` (compaction) ABORTS instead of retrying past a
    * concurrent writer: a compaction snapshot that landed ABOVE a
    * newer append would resurrect its deleted keys under
    * last-writer-wins. Returns the claimed seq, or -1 on abort. */
  private def claimSegment(stage0: Path, fresh: Boolean): Long = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) require(f.mkdirs(root), s"mkdirs $root failed")
    var stage = stage0
    var seq = segments.lastOption.getOrElse(-1L) + 1
    var attempts = 0
    while (attempts < 1000) {
      val target = new Path(segPath(seq))
      if (!f.exists(target) && f.rename(stage, target)) {
        val nested = new Path(target, stage.getName)
        if (!f.exists(nested)) return seq // clean claim
        // lost the TOCTOU race: un-nest back to a fresh stage
        val stage2 = stagePath()
        require(f.rename(nested, stage2), s"un-nest $nested failed")
        stage = stage2
      }
      if (!fresh) { // compaction: a newer segment exists — abort
        require(f.delete(stage, true), s"delete aborted stage $stage failed")
        return -1L
      }
      attempts += 1
      seq = math.max(seq + 1, segments.lastOption.getOrElse(-1L) + 1)
    }
    throw new IllegalStateException(
      s"could not claim a segment seq after $attempts tries")
  }

  /** Min/max of the first key column over the staged batch, written as
    * a `.keyrange` sidecar INSIDE the segment dir (so the claim moves
    * it atomically with the data). Base64 of the UTF-8 bytes — safe
    * for keys containing newlines, and compared in UTF-8 byte order
    * (Spark's own string collation) by prunedSegments. Powers
    * `prunedSegments`. */
  private def writeKeyStats(stage: Path): Unit = {
    val df = spark.read.parquet(stage.toString)
    val k = keys.head
    val row = df.agg(min(col(k).cast("string")).as("lo"),
      max(col(k).cast("string")).as("hi")).head
    if (!row.isNullAt(0)) {
      val b64 = java.util.Base64.getEncoder
      def enc(s: String) = b64.encodeToString(s.getBytes("UTF-8"))
      val f = fs(stage)
      val out = f.create(new Path(stage, ".keyrange"), true)
      try out.write(s"b64\n${enc(row.getString(0))}\n${enc(row.getString(1))}"
        .getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Remove crashed writers' orphaned staging dirs: root-level
    * `.stage-*` entries older than [[LogTable.ConfStageTtl]] (default
    * 12 h — conservative against a live writer's longest plausible
    * batch write; a dir being written keeps a fresh mtime as files
    * land in it). Runs piggybacked on append/compact, so a table that
    * keeps ingesting self-heals after any writer crash; dot-hidden
    * dirs were already invisible to readers, this just stops the disk
    * leak. Safety does not DEPEND on the TTL: even if a pathological
    * >TTL writer lost its stage, its claimSegment rename would fail
    * loudly (require) — the claim protocol is untouched. */
  private def gcOrphanStages(): Unit = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) return
    val ttl = spark.conf.get(LogTable.ConfStageTtl,
      LogTable.DefaultStageTtlMs.toString).toLong
    val cutoff = System.currentTimeMillis() - ttl
    f.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith(".stage-") &&
          st.getModificationTime < cutoff)
        try { f.delete(st.getPath, true); () }
        catch { case _: Throwable => () } // best-effort: next cycle retries
    }
  }

  /** Parse a segment's `.keyrange` sidecar: (min, max) UTF-8 key bytes
    * of its first key column. None for segments without (readable)
    * stats — those are never pruned. */
  private def keyRange(seq: Long): Option[(Array[Byte], Array[Byte])] = {
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
        new String(buf.toByteArray, "UTF-8").split("\n", 3) match {
          case Array("b64", lo, hi) =>
            val d = java.util.Base64.getDecoder
            Some((d.decode(lo), d.decode(hi)))
          case _ => None // unknown format: sound fallback (no pruning)
        }
      } finally in.close()
    }
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

  /** Unsigned-lexicographic UTF-8 byte compare — Spark's own string
    * collation (UTF8String.compareTo), so the pruning decision agrees
    * with the range filter `resolve` pushes into each segment scan
    * (Java String compare is UTF-16 and disagrees above the BMP). */
  private def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Segments whose first-key [min, max] stats may intersect
    * [lo, hi]. Segments without a (readable) `.keyrange` sidecar are
    * always kept (pruning must stay sound). */
  def prunedSegments(lo: String, hi: String): Seq[Long] = {
    val loB = lo.getBytes("UTF-8")
    val hiB = hi.getBytes("UTF-8")
    segments.filter { s =>
      keyRange(s) match {
        case Some((mn, mx)) =>
          !(byteCompare(mx, loB) < 0 || byteCompare(mn, hiB) > 0)
        case None => true
      }
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
    gcOrphanStages()
    val old = segments
    if (old.size <= 1) return
    // the parquet write below fully materializes the resolved state
    // while the old segments still exist; they are only removed after
    // the claim lands, so no lineage survives onto deleted paths
    val resolved = read.withColumn("op", lit("insert"))
    val stage = stagePath()
    resolved.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    writeKeyStats(stage)
    // fresh = false: if ANY segment landed after `old` was listed, the
    // snapshot is stale — claiming a higher sequence would let
    // last-writer-wins resurrect keys the concurrent segment deleted.
    // Abort instead (the staged snapshot is discarded); the next
    // compaction cadence retries against the newer log.
    val seq = claimSegment(stage, fresh = false)
    if (seq < 0 || seq != old.last + 1) {
      // seq > old.last + 1 means a writer landed in the claim window
      // itself — the snapshot is already IN the log but stale rows in
      // it are outranked only by later sequences, which is exactly the
      // unsound case. Remove it again and let the next cycle compact.
      if (seq >= 0) {
        val p = new Path(segPath(seq))
        require(fs(p).delete(p, true), s"delete stale compaction $p failed")
      }
      return
    }
    old.foreach { s =>
      val p = new Path(segPath(s))
      require(fs(p).delete(p, true), s"delete $p failed")
    }
  }
}
