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
  /** Covering of a point region is its leaf cell; line/polygon
    * coverings need the full S2RegionCoverer and stay unsupported. */
  private val coveringPointU = udf((a: String) =>
    sh(a).collect { case SPoint(p) => Seq(Spherical.leafCellId(p)) })

  def intersects(a: Column, b: Column): Column = intersectsU(a, b)
  def covers(a: Column, b: Column): Column = coversU(a, b)
  def coveredBy(a: Column, b: Column): Column = coveredByU(a, b)
  def distance(a: Column, b: Column): Column = distanceU(a, b)
  def dWithin(a: Column, b: Column, d: Column): Column =
    dWithinU(a, b, d.cast("double"))
  def cellIdFromPoint(a: Column): Column = cellIdU(a)
  def cellIdFromPoint(a: Column, level: Column): Column =
    cellIdLevelU(a, level.cast("int"))
  def coveringCellIdsPoint(a: Column): Column = coveringPointU(a)
}
