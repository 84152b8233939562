package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Property-graph view over the test tables, following the reference's
  * data model (SURVEY.md §1): one table per tag (vertex label) keyed by
  * `vid`, one table per edge type keyed by `(src, dst, rank)`.
  *
  * Reference semantics mirrored here:
  *  - vid is a string (Nebula default FIXED_STRING vid,
  *    src/interface/meta.thrift:114); we namespace by label so vids are
  *    globally unique across tags: "c:42", "o:17", ...
  *  - edge identity includes `rank` (src/common/utils/NebulaKeyUtils.h:61);
  *    rank defaults to 0 and carries l_linenumber for lineitem edges.
  *  - a unified `edges` view (src, dst, etype, rank) supports untyped
  *    traversal (`GO ... OVER *`) and the path algorithms; per-type tables
  *    keep their properties for property-projecting traversals.
  *
  * Scale notes: every derived frame is a narrow projection over a parquet
  * scan — column pruning reaches the reader, no materialization. On a real
  * cluster these would be bucketed by src (Nebula partitions by
  * hash(vid), NebulaKeyUtils.h:58-111); in local mode we rely on
  * shuffle-on-key + AQE which is plan-equivalent.
  */
class GraphModel(val spark: SparkSession, sfDir: String) extends GraphCatalog {
  import GraphModel._
  import spark.implicits._

  private def t(name: String): DataFrame = Tables.load(spark, sfDir, name)

  // ---- per-tag vertex tables: (vid, props...) ----
  def customers: DataFrame = t("customer")
    .select(vid("c", $"c_custkey"), $"c_name".as("name"),
      $"c_nationkey".as("nationkey"), $"c_acctbal".as("acctbal"),
      $"c_mktsegment".as("mktsegment"))
  def suppliers: DataFrame = t("supplier")
    .select(vid("s", $"s_suppkey"), $"s_name".as("name"),
      $"s_nationkey".as("nationkey"), $"s_acctbal".as("acctbal"))
  def parts: DataFrame = t("part")
    .select(vid("p", $"p_partkey"), $"p_name".as("name"),
      $"p_brand".as("brand"), $"p_type".as("ptype"), $"p_size".as("psize"))
  def nations: DataFrame = t("nation")
    .select(vid("n", $"n_nationkey"), $"n_name".as("name"))
  def regions: DataFrame = t("region")
    .select(vid("r", $"r_regionkey"), $"r_name".as("name"))
  def orders: DataFrame = t("orders")
    .select(vid("o", $"o_orderkey"), $"o_orderstatus".as("status"),
      $"o_totalprice".as("totalprice"), $"o_orderpriority".as("priority"))

  /** Union view of all vertices: (vid, label) — the reference's
    * "MATCH (v) without a label sees all tags" requirement (SURVEY §7.4). */
  def vertices: DataFrame = Seq(
    customers.select($"vid", lit("customer").as("label")),
    suppliers.select($"vid", lit("supplier").as("label")),
    parts.select($"vid", lit("part").as("label")),
    nations.select($"vid", lit("nation").as("label")),
    regions.select($"vid", lit("region").as("label")),
    orders.select($"vid", lit("order").as("label"))
  ).reduce(_ unionByName _)

  // ---- per-edge-type tables: (src, dst, rank, props...) ----
  /** customer -[placed]-> order */
  def placed: DataFrame = t("orders").select(
    vid("c", $"o_custkey", "src"), vid("o", $"o_orderkey", "dst"),
    lit(0L).as("rank"), $"o_totalprice".as("totalprice"),
    $"o_orderdate".as("orderdate"))
  /** order -[has_part]-> part (rank = line number: duplicate parts per
    * order stay distinct edges, like Nebula's serve(:RANK)) */
  def hasPart: DataFrame = t("lineitem").select(
    vid("o", $"l_orderkey", "src"), vid("p", $"l_partkey", "dst"),
    $"l_linenumber".cast("long").as("rank"), $"l_quantity".as("quantity"),
    $"l_extendedprice".as("extendedprice"), $"l_discount".as("discount"))
  /** order -[has_supp]-> supplier */
  def hasSupp: DataFrame = t("lineitem").select(
    vid("o", $"l_orderkey", "src"), vid("s", $"l_suppkey", "dst"),
    $"l_linenumber".cast("long").as("rank"), $"l_quantity".as("quantity"))
  /** customer|supplier -[in_nation]-> nation */
  def inNation: DataFrame = t("customer").select(
      vid("c", $"c_custkey", "src"), vid("n", $"c_nationkey", "dst"),
      lit(0L).as("rank"))
    .unionByName(t("supplier").select(
      vid("s", $"s_suppkey", "src"), vid("n", $"s_nationkey", "dst"),
      lit(0L).as("rank")))
  /** nation -[in_region]-> region */
  def inRegion: DataFrame = t("nation").select(
    vid("n", $"n_nationkey", "src"), vid("r", $"n_regionkey", "dst"),
    lit(0L).as("rank"))

  /** Unified edge view (src, dst, etype, rank) derived per query from
    * the flat parquet tables — one projection per type, no shuffle. */
  private def flatEdges: DataFrame = Seq(
    placed.select($"src", $"dst", lit("placed").as("etype"), $"rank"),
    hasPart.select($"src", $"dst", lit("has_part").as("etype"), $"rank"),
    hasSupp.select($"src", $"dst", lit("has_supp").as("etype"), $"rank"),
    inNation.select($"src", $"dst", lit("in_nation").as("etype"), $"rank"),
    inRegion.select($"src", $"dst", lit("in_region").as("etype"), $"rank")
  ).reduce(_ unionByName _)

  /** The per-type edge prop columns (beyond src/dst/rank), DERIVED
    * from the per-type frames so the stored edgesWithProps projection
    * can never drift from the flat path when a type gains a column —
    * drives the stored projection's column ORDER, which must replicate
    * the flat union's exactly (edge-struct field order is user-visible
    * in MATCH edge rendering). Lazy: resolves each frame's schema once
    * per model. */
  private lazy val edgeTypeProps: Map[String, Seq[String]] =
    edgeTypeNames.map { t =>
      t -> flatEdgesByType(t).columns.toSeq
        .filterNot(Seq("src", "dst", "rank").contains)
    }.toMap

  /** WIDE unified edge view — (src, dst, etype, rank, all props...)
    * with per-type props NULL-padded. This is what the GraphStore
    * persists: edge properties live in the same bucketed layout as
    * the adjacency, so property-projecting traversals (GO YIELD,
    * MATCH edge bindings, `$$`-prop filters) read props from the
    * hash(src) partition-local scan instead of re-deriving flat
    * per-type unions per query — the reference's economics (the row
    * blob at the edge key IS the value, NebulaKeyUtils.h:61;
    * GetNeighborsProcessor.cpp:32 serves props from the same read). */
  private def flatEdgesWide: DataFrame =
    edgeTypeNames.map { t =>
      flatEdgesByType(t).withColumn("etype", lit(t))
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  /** The dataset's bucketed GraphStore name, built once per JVM when
    * store-backing is on (spark.graft.graphstore.dir set — Verify and
    * Bench enable it). The store is the reference's storage posture
    * (NebulaKeyUtils hash(vid) partitioning, written at load, serving
    * every GetNeighbors): every GO / MATCH / algorithm over `edges`
    * then rides the hash(src) file layout instead of re-deriving and
    * re-shuffling the union view per query. */
  private lazy val storeName: Option[String] =
    if (graft.sources.GraphStore.enabled(spark))
      Some(graft.sources.GraphStore.ensure(spark, sfDir)(flatEdgesWide, vertices))
    else None

  /** The attached store's name (None when store-backing is off) — for
    * callers that address the bucketed tables directly (twoHop). */
  def store: Option[String] = storeName

  /** Unified edge view (src, dst, etype, rank) — `GO ... OVER *`.
    * Store-backed (bucketed by src; column pruning drops the prop
    * columns at the scan) when the graph store is enabled; the flat
    * per-query union otherwise. */
  def edges: DataFrame = storeName
    .map(n => graft.sources.GraphStore.outEdges(spark, n)
      .select($"src", $"dst", $"etype", $"rank"))
    .getOrElse(flatEdges)

  /** Typed union with props — stored path reads the wide bucketed
    * table (filter + projection over the hash(src) layout, column
    * order replicated from the flat union so edge-struct rendering is
    * identical); flat path unions the per-type tables. */
  override def edgesWithProps(etypes: Seq[String]): DataFrame =
    storeName match {
      case Some(n) if etypes.nonEmpty && etypes.distinct == etypes =>
        etypes.foreach { t =>
          if (!edgeTypeProps.contains(t))
            throw new IllegalArgumentException(s"unknown edge type $t")
        }
        // replay the flat unionByName(allowMissingColumns) column
        // order: first type's columns, then each later type's new ones
        val cols = scala.collection.mutable.LinkedHashSet.empty[String]
        etypes.foreach { t =>
          (Seq("src", "dst", "rank") ++ edgeTypeProps(t) :+ "__etype")
            .foreach(cols += _)
        }
        val wide = graft.sources.GraphStore.outEdges(spark, n)
        val base = if (etypes.toSet == edgeTypeNames.toSet) wide
                   else wide.filter($"etype".isin(etypes: _*))
        base.select(cols.toSeq.map {
          case "__etype" => $"etype".as("__etype")
          case c => col(c)
        }: _*)
      case _ => super.edgesWithProps(etypes)
    }

  /** StoredAdjacency side-caching posture for THIS dataset — the
    * `spark.graft.adjacency.cache` dial (auto mode: cache while the
    * dataset fits the byte budget; a 100-TB run re-reads the bucketed
    * files instead of duplicating the edge set into the block
    * manager). Either way the joins stay edge-side exchange-free —
    * caching a bucketed scan preserves its HashPartitioning. */
  private lazy val cacheAdj: Boolean =
    graft.algo.Adjacency.cacheSides(spark, sfDir)

  /** Message adjacency over the unified view for the iterative
    * algorithms — both directions (undirected algorithms). Stored:
    * out table + reversed in table, each join exchange-free on the
    * edge side. Flat: one repartition+persist frame. */
  def adjacencyBoth: graft.algo.Adjacency = storeName match {
    case Some(n) => new graft.algo.StoredAdjacency(Seq(
      graft.sources.GraphStore.outEdges(spark, n),
      graft.sources.GraphStore.inEdgesReversed(spark, n)),
      cacheSides = cacheAdj)
    case None => new graft.algo.FrameAdjacency(
      flatEdges.select($"src", $"dst")
        .unionByName(flatEdges.select($"dst".as("src"), $"src".as("dst"))))
  }

  /** Directed (out-edge) message adjacency for the iterative
    * algorithms. */
  def adjacencyOut: graft.algo.Adjacency = adjacencyOut(Nil)

  /** Directed adjacency retaining extra edge columns (e.g. `rank` to
    * derive a weight) — payloads of `send` may reference them. The
    * flat fallback projects from the WIDE union so prop-column keeps
    * resolve in both postures (column pruning reaches the scans
    * either way). */
  def adjacencyOut(keep: Seq[String]): graft.algo.Adjacency = storeName match {
    case Some(n) => new graft.algo.StoredAdjacency(Seq(
      graft.sources.GraphStore.outEdges(spark, n)), keep, cacheAdj)
    case None => new graft.algo.FrameAdjacency(
      if (keep.forall(Seq("etype", "rank").contains)) flatEdges
      else flatEdgesWide, keep)
  }

  /** Directed adjacency over the DISTINCT (src, dst) simple view —
    * path-counting algorithms (betweenness) that must see each
    * neighbor pair once. Stored: the dedup is an exchange-free local
    * aggregation (hash(src) bucketing satisfies the (src, dst)
    * clustering), so the edge set still never shuffles. */
  def adjacencyOutDistinct: graft.algo.Adjacency = storeName match {
    case Some(n) => new graft.algo.StoredAdjacency(Seq(
      graft.sources.GraphStore.outEdges(spark, n)
        .select($"src", $"dst").distinct()), cacheSides = cacheAdj)
    case None => new graft.algo.FrameAdjacency(
      flatEdges.select($"src", $"dst").distinct())
  }

  /** Simple undirected neighbor frame (src, dst): distinct over both
    * orientations, self-loops once (or dropped). Stored: the `_und`
    * bucketed table — the cluster-wide distinct was paid once at store
    * build. Flat: derived per query. */
  def undNeighbors(dropSelfLoops: Boolean = false): DataFrame =
    storeName match {
      case Some(n) =>
        graft.sources.GraphStore.undNeighbors(spark, n, dropSelfLoops)
      case None =>
        val und = flatEdges.select($"src", $"dst")
          .unionByName(flatEdges.select($"dst".as("src"), $"src".as("dst")))
          .distinct()
        if (dropSelfLoops) und.filter($"src" =!= $"dst") else und
    }

  /** Message adjacency over the simple undirected neighbor view — the
    * undirected iterative algorithms (LPA, HANP). */
  def adjacencyUnd(dropSelfLoops: Boolean = true): graft.algo.Adjacency =
    storeName match {
      case Some(n) => new graft.algo.StoredAdjacency(Seq(
        graft.sources.GraphStore.undNeighbors(spark, n, dropSelfLoops)),
        cacheSides = cacheAdj)
      case None => new graft.algo.FrameAdjacency(undNeighbors(dropSelfLoops))
    }

  // ---- GraphCatalog conformance ----
  def allEdges: DataFrame = edges
  def allVertices: DataFrame = vertices
  def vertexTable(tag: String): DataFrame = tag match {
    case "customer" => customers
    case "supplier" => suppliers
    case "part" => parts
    case "nation" => nations
    case "region" => regions
    case "order" => orders
    case other => throw new IllegalArgumentException(s"unknown tag $other")
  }

  def tagNames: Seq[String] =
    Seq("customer", "supplier", "part", "nation", "region", "order")
  def edgeTypeNames: Seq[String] =
    Seq("placed", "has_part", "has_supp", "in_nation", "in_region")

  /** One edge type's rows, flat-table column order (src, dst, rank,
    * props...). Stored path: the wide bucketed table with an etype
    * PARTITION filter + the type's column projection — the pruning the
    * round-12 directory layout was built for (a typed traversal scans
    * only its type's files, never the interleaved union; the scan
    * keeps the hash(src) bucketing, so typed GO hops stay
    * exchange-free on the edge side). The reference serves typed reads
    * from the same type-prefixed keys as everything else
    * (src/common/utils/NebulaKeyUtils.h:61). Flat sessions project the
    * per-type source table directly. */
  def edgesByType(etype: String): DataFrame = storeName match {
    case Some(n) => typedFrames.synchronized {
      typedFrames.getOrElseUpdate(etype, {
        val props = edgeTypeProps.getOrElse(etype,
          throw new IllegalArgumentException(s"unknown edge type $etype"))
        graft.sources.GraphStore.outEdges(spark, n)
          .filter($"etype" === etype)
          .select(("src" +: "dst" +: "rank" +: props).map(col): _*)
      })
    }
    case None => flatEdgesByType(etype)
  }

  // per-model memo of the stored typed frames: one query's planner
  // touches the same type several times (data frame + schema probes),
  // and each construction re-analyzes a filter+projection over the
  // catalog table — measurable on sub-second queries
  private val typedFrames =
    scala.collection.mutable.HashMap.empty[String, DataFrame]

  /** The flat per-type frames — the store's own build input, the
    * schema source of truth (edgeTypeProps), and the store-off
    * fallback. */
  private def flatEdgesByType(etype: String): DataFrame = etype match {
    case "placed"    => placed
    case "has_part"  => hasPart
    case "has_supp"  => hasSupp
    case "in_nation" => inNation
    case "in_region" => inRegion
    case other => throw new IllegalArgumentException(s"unknown edge type $other")
  }
}

object GraphModel {
  /** Namespaced string vid, e.g. vid("c", $"c_custkey") => "c:42". */
  def vid(ns: String, key: org.apache.spark.sql.Column,
          as: String = "vid"): org.apache.spark.sql.Column =
    concat(lit(ns + ":"), key.cast("string")).as(as)

  /** The same vid expression in DuckDB SQL, for oracle queries. */
  def vidSql(ns: String, keyExpr: String): String = s"'$ns:' || $keyExpr"

  def apply(spark: SparkSession, sfDir: String) = new GraphModel(spark, sfDir)
}
