package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.geo.Spherical
import graft.geo.Spherical.{Shape, SPoint}

/** Column wrappers for the geography predicates (reference:
  * src/common/geo/GeoFunction.cpp; FunctionManager.cpp:393-426).
  * Geography values travel as canonical WKT strings (Dml.GeoVal), so
  * every function parses per row; malformed WKT → SQL NULL (the
  * reference's BAD_DATA), never an exception — a throwing UDF would
  * fail the whole stage. */
object GeoFn {

  private def sh(w: String): Option[Shape] =
    Option(w).flatMap(Spherical.parseWkt)

  private val intersectsU = udf((a: String, b: String) =>
    for { sa <- sh(a); sb <- sh(b) } yield Spherical.intersects(sa, sb))
  private val coversU = udf((a: String, b: String) =>
    for { sa <- sh(a); sb <- sh(b) } yield Spherical.covers(sa, sb))
  private val coveredByU = udf((a: String, b: String) =>
    for { sa <- sh(a); sb <- sh(b) } yield Spherical.coveredBy(sa, sb))
  private val distanceU = udf((a: String, b: String) =>
    for { sa <- sh(a); sb <- sh(b) } yield Spherical.distanceMeters(sa, sb))
  private val dWithinU = udf((a: String, b: String, d: java.lang.Double) =>
    if (d == null) None
    else for { sa <- sh(a); sb <- sh(b) }
      yield Spherical.dWithin(sa, sb, d, exclusive = false))
  // S2_CellIdFromPoint over a non-point shape is BAD_DATA (GeoBase
  // .feature rows "102"/"103") — a per-row typed null, so the result
  // column is a string: either the cell id's digits or the sentinel
  private val cellIdU = udf((a: String) =>
    Option(a).map(w => Spherical.parseWkt(w) match {
      case Some(SPoint(p)) => Spherical.leafCellId(p).toString
      case _ => ErrVal.BadData
    }))
  private val cellIdLevelU = udf((a: String, level: Int) =>
    if (level < 0 || level > 30) None
    else sh(a).collect { case SPoint(p) => Spherical.cellIdAtLevel(p, level) })
  /** S2_CoveringCellIds — full RegionCoverer over any shape (points
    * short-circuit to their leaf cell). Optional args follow
    * FunctionManager.cpp:2860-2912: (geo[, minLevel, maxLevel,
    * maxCells, bufferMeters]); out-of-range args are BAD_DATA → NULL.
    * Buffered coverings (bufferMeters > 0, an S2ShapeIndexBuffered
    * Region) are not replicated — NULL, documented divergence. */
  private val coveringU =
    udf((a: String, minLevel: Int, maxLevel: Int, maxCells: Int,
         bufferMeters: Double) =>
      if (minLevel < 0 || minLevel > 30 || maxLevel < 0 || maxLevel > 30 ||
          maxLevel < minLevel || maxCells <= 0 || bufferMeters != 0.0) None
      else sh(a).map(s =>
        Spherical.coveringCellIds(s, minLevel, maxLevel, maxCells)))

  def intersects(a: Column, b: Column): Column = intersectsU(a, b)
  def covers(a: Column, b: Column): Column = coversU(a, b)
  def coveredBy(a: Column, b: Column): Column = coveredByU(a, b)
  def distance(a: Column, b: Column): Column = distanceU(a, b)
  def dWithin(a: Column, b: Column, d: Column): Column =
    dWithinU(a, b, d.cast("double"))
  def cellIdFromPoint(a: Column): Column = cellIdU(a)
  def cellIdFromPoint(a: Column, level: Column): Column =
    cellIdLevelU(a, level.cast("int"))
  def coveringCellIds(a: Column, minLevel: Column, maxLevel: Column,
                      maxCells: Column, bufferMeters: Column): Column =
    coveringU(a, minLevel.cast("int"), maxLevel.cast("int"),
      maxCells.cast("int"), bufferMeters.cast("double"))
  def coveringCellIds(a: Column): Column =
    coveringCellIds(a, org.apache.spark.sql.functions.lit(0),
      org.apache.spark.sql.functions.lit(30),
      org.apache.spark.sql.functions.lit(8),
      org.apache.spark.sql.functions.lit(0.0))
}
