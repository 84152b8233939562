package graft.geo

/** Spherical geometry for the geography type: WKT shapes evaluated on
  * the unit sphere, matching the reference's S2-backed semantics
  * (src/common/geo/GeoFunction.cpp; datatypes/Geography.h:39-43).
  *
  * Everything here is re-derived from the published S2 geometry model
  * (Google's s2geometry documentation): lat/lng → unit vectors, great-
  * circle arcs, chord angles, and the quadratic cube-face cell
  * decomposition. No reference code is transliterated — the reference
  * delegates to the S2 C++ library; we implement the same math.
  *
  * Scale posture: all functions are pure per-row math over small WKT
  * strings — they run inside codegen'd UDF calls with no state, no
  * driver participation, and no shuffle implications.
  */
object Spherical {

  /** S2Earth's radius constant (6371.01 km) — distances are meters. */
  val EarthRadiusMeters: Double = 6371010.0

  // ---- shapes ------------------------------------------------------

  final case class V3(x: Double, y: Double, z: Double) {
    def dot(o: V3): Double = x * o.x + y * o.y + z * o.z
    def cross(o: V3): V3 =
      V3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
    def norm: Double = math.sqrt(this.dot(this))
    def unit: V3 = { val n = norm; V3(x / n, y / n, z / n) }
    def +(o: V3): V3 = V3(x + o.x, y + o.y, z + o.z)
    def -(o: V3): V3 = V3(x - o.x, y - o.y, z - o.z)
    def *(s: Double): V3 = V3(x * s, y * s, z * s)
    def unary_- : V3 = V3(-x, -y, -z)
  }

  sealed trait Shape
  final case class SPoint(p: V3) extends Shape
  final case class SLine(pts: IndexedSeq[V3]) extends Shape
  /** loops(0) = outer shell, rest = holes (WKT ring order). */
  final case class SPoly(loops: IndexedSeq[IndexedSeq[V3]]) extends Shape

  def fromLonLat(lonDeg: Double, latDeg: Double): V3 = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    V3(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon),
      math.sin(lat))
  }

  /** Parse canonical (or any) WKT POINT/LINESTRING/POLYGON. Returns
    * None on malformed text — callers surface SQL NULL, never throw
    * (a throwing UDF would fail the whole job). */
  def parseWkt(wkt: String): Option[Shape] = try {
    val s = wkt.trim
    val u = s.toUpperCase
    def nums(body: String): IndexedSeq[V3] =
      body.split(",").toIndexedSeq.map { pair =>
        val xy = pair.trim.split("\\s+")
        fromLonLat(xy(0).toDouble, xy(1).toDouble)
      }
    if (u.startsWith("POINT")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      val p = nums(body)
      if (p.length != 1) None else Some(SPoint(p.head))
    } else if (u.startsWith("LINESTRING")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      val p = nums(body)
      if (p.length < 2) None else Some(SLine(p))
    } else if (u.startsWith("POLYGON")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      // split "(...),(...)" ring list
      val rings = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var start = -1
      body.zipWithIndex.foreach { case (c, i) =>
        if (c == '(') { if (depth == 0) start = i + 1; depth += 1 }
        else if (c == ')') { depth -= 1
          if (depth == 0) rings += body.substring(start, i) }
      }
      val loops = rings.toIndexedSeq.map(nums)
      if (loops.isEmpty || loops.exists(_.length < 4)) None
      // drop the closing vertex (WKT rings repeat the first point)
      else Some(SPoly(loops.map(l => l.dropRight(1))))
    } else None
  } catch { case _: Exception => None }

  // ---- core arc math -----------------------------------------------

  /** Angle between unit vectors — S1Angle(x, y): atan2(‖x×y‖, x·y).
    * This exact formulation reproduces the reference's ST_Distance
    * doubles bit-for-bit (GeoBase.feature's 8909524.383934561). */
  def angle(a: V3, b: V3): Double = math.atan2(a.cross(b).norm, a.dot(b))

  /** Leaf-cell-scale tolerance (radians) standing in for S2's
    * MayIntersect(S2Cell(point)) point-on-object tests: a level-30
    * cell spans ~2^-30 of a face (~1.2e-9 rad circumradius). */
  private val LeafTol = 2e-9

  /** Distance (radians) from point x to the minor arc a→b. */
  def pointToArc(x: V3, a: V3, b: V3): Double = {
    val endpointMin = math.min(angle(x, a), angle(x, b))
    val n = a.cross(b)
    val nn = n.norm
    if (nn < 1e-30) return endpointMin // degenerate edge
    // closest point on the great circle
    val proj = (x - n * (x.dot(n) / (nn * nn))).unit
    // on-arc test: the projection lies on the minor arc iff its angles
    // to both endpoints sum to the arc length (small-eps tolerance).
    // Endpoint distances are ALWAYS candidates (S2's UpdateMinDistance
    // model) so a vertex-coincident point reports exactly 0.
    val ab = angle(a, b)
    if (math.abs(angle(a, proj) + angle(proj, b) - ab) < 1e-9)
      math.min(angle(x, proj), endpointMin)
    else endpointMin
  }

  def pointToLine(x: V3, l: SLine): Double =
    l.pts.sliding(2).map { s => pointToArc(x, s(0), s(1)) }.min

  private def ringEdges(ring: IndexedSeq[V3]): Iterator[(V3, V3)] =
    ring.indices.iterator.map(i => (ring(i), ring((i + 1) % ring.length)))

  def pointToRing(x: V3, ring: IndexedSeq[V3]): Double =
    ringEdges(ring).map { case (a, b) => pointToArc(x, a, b) }.min

  /** Proper-crossing test for minor arcs (a,b) × (c,d): both great-
    * circle sign conditions hold AND one of the two antipodal
    * intersection candidates lies on both arcs. */
  def arcsCross(a: V3, b: V3, c: V3, d: V3): Boolean = {
    val n1 = a.cross(b); val n2 = c.cross(d)
    val s1 = n1.dot(c); val s2 = n1.dot(d)
    val s3 = n2.dot(a); val s4 = n2.dot(b)
    if (s1 * s2 >= 0 || s3 * s4 >= 0) return false
    val p = n1.cross(n2)
    if (p.norm < 1e-30) return false // same great circle
    val cand = p.unit
    def onArc(x: V3, u: V3, v: V3): Boolean =
      math.abs(angle(u, x) + angle(x, v) - angle(u, v)) < 1e-9
    (onArc(cand, a, b) && onArc(cand, c, d)) ||
      (onArc(-cand, a, b) && onArc(-cand, c, d))
  }

  /** Point-in-ring by crossing parity from an anchor chosen outside.
    * WKT rings here are small (≪ hemisphere, the reference normalizes
    * loops to the smaller side), so the antipode of the vertex
    * centroid is safely outside. Boundary membership is handled by
    * callers via pointToRing before calling this. */
  def insideRing(x: V3, ring: IndexedSeq[V3]): Boolean = {
    val centroid = ring.reduce(_ + _).unit
    val anchor = -centroid
    var crossings = 0
    ringEdges(ring).foreach { case (a, b) =>
      if (arcsCross(x, anchor, a, b)) crossings += 1
    }
    crossings % 2 == 1
  }

  /** Interior-or-boundary containment of a point in a polygon
    * (shell minus holes, boundary within leaf tolerance counts). */
  def polyContains(x: V3, poly: SPoly, boundaryTol: Double = LeafTol): Boolean = {
    val onBoundary = poly.loops.exists(r => pointToRing(x, r) <= boundaryTol)
    if (onBoundary) return true
    if (!insideRing(x, poly.loops.head)) return false
    !poly.loops.tail.exists(h => insideRing(x, h))
  }

  /** Strict interior containment (boundary does NOT count) — used for
    * covers(polygon, polygon) vertex checks where S2's semi-open
    * boundary model admits shared boundaries. */
  private def polyContainsLoose(x: V3, poly: SPoly): Boolean =
    polyContains(x, poly, boundaryTol = 1e-12)

  private def lineEdges(l: SLine): Iterator[(V3, V3)] =
    l.pts.sliding(2).map(s => (s(0), s(1)))

  private def polyEdges(p: SPoly): Iterator[(V3, V3)] =
    p.loops.iterator.flatMap(ringEdges)

  private def edgesCross(e1: Iterator[(V3, V3)],
                         e2: IndexedSeq[(V3, V3)]): Boolean =
    e1.exists { case (a, b) => e2.exists { case (c, d) => arcsCross(a, b, c, d) } }

  // ---- predicates (GeoFunction.cpp:22-96 dispatch) -----------------

  def intersects(sa: Shape, sb: Shape): Boolean = (sa, sb) match {
    case (SPoint(a), SPoint(b)) => angle(a, b) <= LeafTol
    case (SPoint(a), l: SLine) => pointToLine(a, l) <= LeafTol
    case (l: SLine, SPoint(b)) => pointToLine(b, l) <= LeafTol
    case (SPoint(a), p: SPoly) => polyContains(a, p)
    case (p: SPoly, SPoint(b)) => polyContains(b, p)
    case (l1: SLine, l2: SLine) =>
      edgesCross(lineEdges(l1), lineEdges(l2).toIndexedSeq) ||
        l2.pts.exists(v => pointToLine(v, l1) <= LeafTol) ||
        l1.pts.exists(v => pointToLine(v, l2) <= LeafTol)
    case (l: SLine, p: SPoly) => linePolyIntersects(l, p)
    case (p: SPoly, l: SLine) => linePolyIntersects(l, p)
    case (p1: SPoly, p2: SPoly) =>
      edgesCross(polyEdges(p1), polyEdges(p2).toIndexedSeq) ||
        p2.loops.head.exists(v => polyContains(v, p1)) ||
        p1.loops.head.exists(v => polyContains(v, p2))
  }

  private def linePolyIntersects(l: SLine, p: SPoly): Boolean =
    edgesCross(lineEdges(l), polyEdges(p).toIndexedSeq) ||
      l.pts.exists(v => polyContains(v, p))

  def covers(sa: Shape, sb: Shape): Boolean = (sa, sb) match {
    case (SPoint(a), SPoint(b)) => a.x == b.x && a.y == b.y && a.z == b.z
    case (SPoint(_), _) => false
    case (l: SLine, SPoint(b)) => pointToLine(b, l) <= LeafTol
    case (l1: SLine, l2: SLine) =>
      // S2Polyline::NearlyCovers(1e-15 rad), either orientation:
      // every vertex and edge midpoint of b must lie on a's path
      val tol = 1e-7 // WKT doubles round-trip; exact-on-path in practice
      val samples = l2.pts ++ lineEdges(l2).map { case (u, v) => (u + v).unit }
      samples.forall(s => pointToLine(s, l1) <= tol)
    case (_: SLine, _) => false
    case (p: SPoly, SPoint(b)) => polyContains(b, p)
    case (p: SPoly, l: SLine) =>
      !edgesCross(lineEdges(l), polyEdges(p).toIndexedSeq) &&
        l.pts.forall(v => polyContainsLoose(v, p))
    case (p1: SPoly, p2: SPoly) =>
      !edgesCross(polyEdges(p2), polyEdges(p1).toIndexedSeq) &&
        p2.loops.head.forall(v => polyContainsLoose(v, p1))
    case _ => false
  }

  def coveredBy(sa: Shape, sb: Shape): Boolean = covers(sb, sa)

  // ---- distance (GeoFunction.cpp:288-380 dispatch) -----------------

  def distanceRad(sa: Shape, sb: Shape): Double = (sa, sb) match {
    case (SPoint(a), SPoint(b)) => angle(a, b)
    case (SPoint(a), l: SLine) => pointToLine(a, l)
    case (l: SLine, SPoint(b)) => pointToLine(b, l)
    case (SPoint(a), p: SPoly) =>
      if (polyContains(a, p)) 0.0 else p.loops.map(r => pointToRing(a, r)).min
    case (p: SPoly, SPoint(b)) => distanceRad(SPoint(b), p)
    case (l1: SLine, l2: SLine) =>
      if (intersects(l1, l2)) 0.0
      else math.min(l1.pts.map(v => pointToLine(v, l2)).min,
        l2.pts.map(v => pointToLine(v, l1)).min)
    case (l: SLine, p: SPoly) =>
      if (intersects(l, p)) 0.0
      else {
        val boundary = p.loops.map(r =>
          l.pts.map(v => pointToRing(v, r)).min).min
        val back = ringsToLineMin(p, l)
        math.min(boundary, back)
      }
    case (p: SPoly, l: SLine) => distanceRad(l, p)
    case (p1: SPoly, p2: SPoly) =>
      if (intersects(p1, p2)) 0.0
      else {
        val d1 = p1.loops.flatten.map(v =>
          p2.loops.map(r => pointToRing(v, r)).min).min
        val d2 = p2.loops.flatten.map(v =>
          p1.loops.map(r => pointToRing(v, r)).min).min
        math.min(d1, d2)
      }
  }

  private def ringsToLineMin(p: SPoly, l: SLine): Double =
    p.loops.flatten.map(v => pointToLine(v, l)).min

  def distanceMeters(sa: Shape, sb: Shape): Double =
    distanceRad(sa, sb) * EarthRadiusMeters

  def dWithin(sa: Shape, sb: Shape, meters: Double,
              exclusive: Boolean): Boolean = {
    val d = distanceMeters(sa, sb)
    if (exclusive) d < meters else d <= meters
  }

  // ---- S2 cell ids (quadratic projection + Hilbert curve) ----------

  private val SwapMask = 1
  private val InvertMask = 2
  private val LookupBits = 4
  private val kPosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val kPosToOrientation: Array[Int] =
    Array(SwapMask, 0, 0, InvertMask + SwapMask)
  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIJ = new Array[Int](1 << (2 * LookupBits + 2))
  private def initLookup(level: Int, i: Int, j: Int, origOrientation: Int,
                         orientation: Int, pos: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
      lookupIJ((pos << 2) + origOrientation) = (ij << 2) + orientation
    } else {
      val r = kPosToIJ(orientation)
      var idx = 0
      while (idx < 4) {
        initLookup(level + 1, (i << 1) + (r(idx) >> 1), (j << 1) + (r(idx) & 1),
          origOrientation, orientation ^ kPosToOrientation(idx),
          (pos << 2) + idx)
        idx += 1
      }
    }
  }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, SwapMask, 0)
  initLookup(0, 0, 0, InvertMask, InvertMask, 0)
  initLookup(0, 0, 0, SwapMask | InvertMask, SwapMask | InvertMask, 0)

  /** xyz → (face, u, v) per the S2 cube-face projection. */
  private def xyzToFaceUV(p: V3): (Int, Double, Double) = {
    val abs = Array(math.abs(p.x), math.abs(p.y), math.abs(p.z))
    val axis = if (abs(0) > abs(1)) { if (abs(0) > abs(2)) 0 else 2 }
               else { if (abs(1) > abs(2)) 1 else 2 }
    val comp = axis match { case 0 => p.x case 1 => p.y case _ => p.z }
    val face = if (comp < 0) axis + 3 else axis
    val (u, v) = face match {
      case 0 => (p.y / p.x, p.z / p.x)
      case 1 => (-p.x / p.y, p.z / p.y)
      case 2 => (-p.x / p.z, -p.y / p.z)
      case 3 => (p.z / p.x, p.y / p.x)
      case 4 => (p.z / p.y, -p.x / p.y)
      case _ => (-p.y / p.z, -p.x / p.z)
    }
    (face, u, v)
  }

  /** S2's quadratic UV→ST transform. */
  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private val MaxSize = 1 << 30
  private def stToIJ(s: Double): Int =
    math.max(0, math.min(MaxSize - 1, Math.round(MaxSize * s - 0.5).toInt))

  /** Leaf (level-30) S2CellId for a point, via the face-local Hilbert
    * curve (4 bits per step with the generated lookup tables). */
  def leafCellId(p: V3): Long = {
    val (face, u, v) = xyzToFaceUV(p)
    val i = stToIJ(uvToST(u)); val j = stToIJ(uvToST(v))
    var n: Long = face.toLong << 60
    var bits: Int = face & SwapMask
    var k = 7
    while (k >= 0) {
      val mask = (1 << LookupBits) - 1
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask) << 2
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  /** CellId at an arbitrary level = leaf with trailing bits replaced
    * by the level's sentinel (parent() semantics). */
  def cellIdAtLevel(p: V3, level: Int): Long = {
    val leaf = leafCellId(p)
    if (level >= 30) leaf
    else {
      val lsb = 1L << (2 * (30 - level))
      (leaf & -lsb) | lsb
    }
  }
}
