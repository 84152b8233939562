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
  *   - `<name>_und`: the SIMPLE undirected neighbor view — distinct
  *     (src, dst) over both orientations, self-loops once — bucketed by
  *     src. The undirected iterative algorithms (LPA, HANP, walks,
  *     node2vec) consume exactly this view; deriving it per run costs a
  *     cluster-wide distinct of the edge set, so the store pays that
  *     shuffle ONCE at build and every run reads the layout in place.
  *   - `<name>_v`  : vertices bucketed by vid
  *
  * The edge tables carry the edges frame's FULL column set — edge
  * properties included when the caller passes a wide frame — so
  * property-projecting traversals (GO YIELD, MATCH edge bindings) read
  * props from the same partition-local scan as the adjacency, the
  * reference's economics exactly: the row blob at the edge key IS the
  * property value (src/storage/query/GetNeighborsProcessor.cpp:32,
  * src/common/utils/NebulaKeyUtils.h:61). Column pruning keeps
  * adjacency-only readers narrow.
  *
  * The payoff, proven in PlanSpec: `twoHop` (in-adjacency ⋈
  * out-adjacency on the middle vertex) plans as a sort-merge join with
  * ZERO Exchange — at 100 TB the edge table is never shuffled, the
  * dominant cost of naive multi-hop expansion. Iterative frontiers
  * (Traverse/GraphAlgos) get the same benefit: the frontier repartitions
  * to the table's bucketing; the edge side stays where it was written.
  *
  * `ensure` is the main-surface entry (round-11): it builds the store
  * for a dataset ONCE per JVM (keyed by dataset identity, name derived
  * from a hash so concurrent queries on different datasets never race a
  * fixed table name) and re-serves the same tables to every subsequent
  * query — GraphModel attaches through it, so GO / MATCH / the
  * algorithms all ride the layout instead of re-shuffling the edge
  * frame per query. The reference amortizes its layout the same way:
  * NebulaKeyUtils partitioning is written once at load and serves every
  * GetNeighbors (src/storage/query/GetNeighborsProcessor.cpp:32).
  *
  * Tables are registered in the session catalog with explicit parquet
  * paths under `dir`, so the layout survives the session and nothing
  * lands in the default warehouse. A `_GRAFT_META` marker (written
  * LAST, after `_v` — its presence proves completeness) records the
  * bucket count and per-table schemas, so a LATER session pointing
  * `spark.graft.graphstore.dir` at the same root re-attaches with
  * catalog DDL over the existing files instead of rebuilding —
  * build-once/attach-many, the only sane deployment shape at 100 TB
  * (measured: the sf30 rebuild a fresh catalog used to pay was
  * 650-900 s; attach is seconds).
  */
object GraphStore {

  /** Conf key: root directory for `ensure`d stores. Empty/unset =
    * store-backing off (GraphModel falls back to flat parquet views). */
  val ConfDir = "spark.graft.graphstore.dir"
  /** Conf key: bucket count for `ensure`d stores. 32 matches local[32];
    * on a real cluster size it like shuffle partitions (e.g. 2-4× the
    * executor-core count) — more buckets = more parallelism per scan,
    * fewer rows per bucket file. */
  val ConfBuckets = "spark.graft.graphstore.buckets"

  /** Bumped whenever the on-disk layout changes shape (new tables,
    * different columns/partitioning). Folded into the `ensure` name
    * hash, so a persistent root written by an OLDER layout simply
    * hashes to a different name and is rebuilt instead of passing the
    * completeness probe and failing later with missing-table/column
    * errors at query time. v2 = round-12 layout (wide prop columns,
    * etype directory partitioning, `_und` table). */
  private val LayoutVersion = "v2"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.get(ConfDir, "").nonEmpty

  /** Turn store-backing on with a JVM-managed root (created now,
    * recursively deleted on JVM exit). No-op when a root is already
    * configured — an explicitly configured root is caller-owned. */
  def enableManaged(spark: SparkSession): Unit = synchronized {
    if (!enabled(spark)) {
      val dir = java.nio.file.Files.createTempDirectory("graft-gstore")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try deleteRecursively(dir.toFile) catch { case _: Throwable => () }))
      spark.conf.set(ConfDir, dir.toString)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(); ()
  }

  // one lock object per store name; the catalog-existence check under
  // it serializes concurrent first-touch so the three saveAsTable
  // writes happen exactly once per catalog (bucketing METADATA lives in
  // the catalog, so a fresh catalog must rebuild even if files exist —
  // parquet files alone cannot prove the hash layout)
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build (or reuse) the bucketed store for the dataset identified by
    * `key` (e.g. its directory path) and return the store name. The
    * name is a hash of (root, key): deterministic for reuse, unique per
    * dataset so concurrent queries never collide on a fixed name. */
  def ensure(spark: SparkSession, key: String)
            (edges: => DataFrame, vertices: => DataFrame): String = {
    val root = spark.conf.get(ConfDir)
    // default bucket count follows the session's shuffle parallelism
    // (itself data-size-derived in Verify/Bench — see graft.Tune), so
    // bucketed joins never cap the rest of the plan's parallelism
    val buckets = spark.conf.get(ConfBuckets,
      spark.conf.get("spark.sql.shuffle.partitions", "32")).toInt
    val name = "gs_" + java.security.MessageDigest.getInstance("MD5")
      .digest(s"$root|$key|$LayoutVersion".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    locks.computeIfAbsent(name, _ => new Object).synchronized {
      // _v is written LAST — its presence proves a complete store
      if (!spark.catalog.tableExists(s"${name}_v")) {
        // a FRESH catalog (new JVM / new metastore) attaching to a
        // root some earlier session already built must not rewrite the
        // data: the meta marker (written after _v, so its presence
        // proves completeness) carries everything registration needs,
        // and attach becomes catalog DDL over the existing files —
        // seconds instead of the full build (measured 650-900 s at
        // sf30). This is the deployment posture at 100 TB: one
        // build-once job, every later session attaches.
        if (!registerExisting(spark, name, s"$root/$name"))
          write(edges, vertices, name, s"$root/$name", buckets)
      }
    }
    name
  }

  /** Write `edges` (src, dst, ...) and `vertices` (vid, ...) as a
    * bucketed store named `name`. Idempotent: Overwrite mode. */
  def write(edges: DataFrame, vertices: DataFrame, name: String,
            dir: String, buckets: Int = 32): Unit = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def save(df: DataFrame, table: String, key: String): Unit = {
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val w = df.write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", s"$dir/$table")
      // edge tables additionally PARTITION by etype (directory-level,
      // the reference's type-prefixed edge keys): a typed traversal
      // prunes to its types' files instead of scanning the interleaved
      // union — bucketing (and the exchange-free joins it buys) is
      // per-table and survives partitioning
      val parted = df.columns.contains("etype")
      (if (parted) w.partitionBy("etype") else w)
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
      // registration recipe for later sessions: the CATALOG schema
      // (saveAsTable moves partition columns last — record it as
      // written, not as passed)
      entries += Seq(table, key, if (parted) "etype" else "",
        spark.table(table).schema.toDDL).mkString("\t")
    }
    invalidate(name) // fixed-name rebuild: drop memoized resolutions
    save(edges, s"${name}_out", "src")
    save(edges, s"${name}_in", "dst")
    // simple undirected neighbor view: distinct over both orientations
    // (reciprocal edges keep one row per orientation; self-loops one
    // row total). The ONE distinct shuffle the undirected algorithms
    // would otherwise each pay per run.
    save(edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(),
      s"${name}_und", "src")
    save(vertices, s"${name}_v", "vid")
    // marker LAST (after _v): its presence proves a complete store to
    // any later session's registerExisting
    writeText(edges.sparkSession, s"$dir/$MetaFile",
      (s"buckets=$buckets" +: entries).mkString("\n"))
  }

  /** Completeness + registration marker written at the store root. */
  private val MetaFile = "_GRAFT_META"

  /** Re-register a complete store written by an EARLIER session into
    * this session's catalog — DDL over the existing files, no data
    * rewrite. Bucket count and schemas come from the marker (they must
    * describe the files as written; the current session's conf has no
    * say). Returns false when no marker exists (nothing to attach). */
  private def registerExisting(spark: SparkSession, name: String,
                               dir: String): Boolean =
    readText(spark, s"$dir/$MetaFile") match {
      case None => false
      case Some(text) =>
        val lines = text.split("\n").toSeq
        val buckets = lines.head.stripPrefix("buckets=").toInt
        invalidate(name)
        lines.tail.foreach { line =>
          val Array(table, key, parts, schema) = line.split("\t", 4)
          spark.sql(s"DROP TABLE IF EXISTS $table")
          val partClause =
            if (parts.nonEmpty) s"PARTITIONED BY ($parts)" else ""
          spark.sql(
            s"""CREATE TABLE $table ($schema) USING parquet
               |$partClause
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
               |LOCATION '$dir/$table'""".stripMargin)
          // directory-partitioned tables need partition discovery; the
          // listing is per-etype-directory, not per-file
          if (parts.nonEmpty)
            spark.sql(s"MSCK REPAIR TABLE $table")
        }
        true
    }

  private def writeText(spark: SparkSession, path: String,
                        text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession,
                       path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  // Resolved-table memo: one spark.table() costs ~10-30 ms of catalog
  // + partition-metadata resolution, and a single MATCH/GO plans
  // against the same stored table several times per query (hop
  // frames, schema probes, adjacency sides) — on sub-second queries
  // that resolution dominated the stored-vs-flat gap (round-12
  // q_nql_match_var residual). DataFrames are immutable views over a
  // shared FileStatusCache, so one resolution per (session, table) is
  // always safe; write() invalidates its name (fixed-name rebuilds in
  // tests). WeakHashMap on the session: closed sessions drop their
  // entries with the session itself.
  private val tableCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def cachedTable(spark: SparkSession, table: String): DataFrame = {
    val per = tableCache.synchronized {
      var m = tableCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        tableCache.put(spark, m)
      }
      m
    }
    per.computeIfAbsent(table, t => spark.table(t))
  }

  private def invalidate(name: String): Unit = tableCache.synchronized {
    tableCache.values.forEach { m =>
      val it = m.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(name)) it.remove()
    }
  }

  /** Out-adjacency (bucketed by src). */
  def outEdges(spark: SparkSession, name: String): DataFrame =
    cachedTable(spark, s"${name}_out")

  /** In-adjacency (bucketed by dst). */
  def inEdges(spark: SparkSession, name: String): DataFrame =
    cachedTable(spark, s"${name}_in")

  /** In-adjacency REVERSED to traversal orientation: (src = stored dst,
    * dst = stored src), so its rows are hash-partitioned by the NEW
    * src. The rename is a projection — alias-aware planning keeps the
    * bucketed layout visible to joins on the new src. */
  def inEdgesReversed(spark: SparkSession, name: String): DataFrame = {
    val e = inEdges(spark, name)
    val rest = e.columns.filterNot(c => c == "src" || c == "dst")
    e.select((col("dst").as("src") +: col("src").as("dst") +:
      rest.map(col)): _*)
  }

  /** Simple undirected neighbor view (src, dst), bucketed by src:
    * distinct over both orientations, self-loops once. `dropSelfLoops`
    * filters (src ≠ dst) — a partition-preserving filter — for the
    * algorithms defined over the loop-free simple graph (LPA, HANP). */
  def undNeighbors(spark: SparkSession, name: String,
                   dropSelfLoops: Boolean = false): DataFrame = {
    val t = cachedTable(spark, s"${name}_und")
    if (dropSelfLoops) t.filter(col("src") =!= col("dst")) else t
  }

  /** Vertices (bucketed by vid). */
  def vertices(spark: SparkSession, name: String): DataFrame =
    cachedTable(spark, s"${name}_v")

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
