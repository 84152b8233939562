package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Spherical
import graft.geo.Spherical._

/** Golden values from the reference's own TCK
  * (tests/tck/features/geo/GeoBase.feature) — the S2-backed results
  * our spherical math must reproduce. */
class GeoSpec extends AnyFunSuite {

  private def shape(wkt: String): Shape = parseWkt(wkt).get

  private val pt38 = shape("POINT(3 8)")
  private val pt72 = shape("POINT(72.3 84.6)")
  private val line = shape("LINESTRING(3 8, 4.7 73.23)")
  private val poly = shape("POLYGON((0 1, 1 2, 2 3, 0 1))")

  test("point-point distance matches S2 bit-for-bit") {
    val d = distanceMeters(pt38, pt72)
    assert(d == 8909524.383934561)
  }

  test("leaf cell ids match S2CellId goldens") {
    assert(leafCellId(fromLonLat(3, 8)) == 1166542697063163289L)
    assert(leafCellId(fromLonLat(72.3, 84.6)) == 4987215245349669805L)
  }

  test("ST_Intersects dispatch") {
    assert(intersects(pt38, pt38))
    assert(intersects(pt38, line)) // endpoint
    assert(!intersects(pt38, poly))
    assert(intersects(shape("POINT(0 1)"), poly)) // polygon vertex
    assert(intersects(shape("POINT(4.7 73.23)"), line))
    assert(!intersects(pt72, line))
    // polygon with a hole: POINT(-1 -1) is inside shell, outside hole
    val holed = shape(
      "POLYGON((-20 -20, -20 20, 20 20, 20 -20, -20 -20), (1 1, 2 2, 0 2, 1 1))")
    assert(intersects(shape("POINT(-1 -1)"), holed))
    assert(intersects(holed, shape("POINT(-1 -1)")))
    // point inside the hole does NOT intersect
    assert(!intersects(shape("POINT(1 1.7)"), holed))
  }

  test("ST_Covers / ST_CoveredBy dispatch") {
    assert(covers(pt38, pt38))
    assert(covers(line, pt38))
    assert(!covers(poly, pt38))
    val big = shape("POLYGON((-0.7 3.8,3.6 3.2,1.8 -0.8,-3.4 2.4,-0.7 3.8))")
    assert(covers(big, poly))
    assert(coveredBy(poly, big))
    assert(!covers(big, pt38))
    assert(!covers(big, line))
  }

  test("ST_Distance ordering against golden thresholds") {
    assert(distanceMeters(pt38, pt38) == 0.0)
    assert(distanceMeters(pt38, line) == 0.0)
    val dPoly = distanceMeters(pt38, poly)
    assert(dPoly >= 1.0 && dPoly <= 8909524.383934561)
    val d72 = distanceMeters(pt38, pt72)
    assert(d72 >= 8909524.383934561 && d72 < 8909524.383934563)
  }

  test("ST_DWithin inclusive/exclusive") {
    assert(dWithin(pt38, pt72, 8909524.383934561, exclusive = false))
    assert(!dWithin(pt38, pt72, 8909524.383934561, exclusive = true))
    assert(dWithin(pt38, line, 100.0, exclusive = false))
    assert(!dWithin(pt38, poly, 100.0, exclusive = false))
  }

  test("updated linestring from UPDATE scenario") {
    val l2 = shape("LINESTRING(3 8, 6 16)")
    assert(dWithin(l2, pt38, 100.0, exclusive = false))
    assert(covers(l2, pt38))
  }

  test("WKT parse failures yield None, never throw") {
    assert(parseWkt("LINESTRING(0 1, 2xxxx").isEmpty)
    assert(parseWkt("garbage").isEmpty)
    assert(parseWkt("POINT()").isEmpty)
  }
}
