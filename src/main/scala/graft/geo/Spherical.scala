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

  // ---- S2 region covering ------------------------------------------
  // Re-derivation of the public S2RegionCoverer algorithm (the
  // reference links s2geometry from Geography.h:39-43 and calls
  // GetCovering with min_level/max_level/max_cells options from
  // GeoFunction.cpp:411-476). Nothing below is vendored: cell-id bit
  // ops, the candidate priority queue, and the cell-union
  // normalization are re-implemented from the published algorithm.

  private def lsbForLevel(level: Int): Long = 1L << (2 * (30 - level))
  def cellLevel(id: Long): Int =
    30 - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
  def cellParentAt(id: Long, level: Int): Long = {
    val nl = lsbForLevel(level); (id & -nl) | nl
  }
  private def cellChildren(id: Long): Array[Long] = {
    val l = id & -id
    val step = l >> 2
    Array(id - l + step, id - l + 3 * step, id - l + 5 * step, id - l + 7 * step)
  }
  private def cellContainsCell(a: Long, b: Long): Boolean = {
    val l = a & -a
    b >= a - l + 1 && b <= a + l - 1
  }

  /** id → (face, i, j) — S2CellId::ToFaceIJOrientation via the
    * inverse Hilbert lookup table (orientation not needed here). */
  private def cellToFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var bits = face & SwapMask
    var i = 0; var j = 0
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) 30 - 7 * LookupBits else LookupBits
      bits += (((id >>> (k * 2 * LookupBits + 1)).toInt &
        ((1 << (2 * nbits)) - 1)) << 2)
      bits = lookupIJ(bits)
      i += (bits >> (LookupBits + 2)) << (k * LookupBits)
      j += ((bits >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  /** Encode (face, i, j) to a leaf id — leafCellId's loop from
    * explicit ij coordinates. */
  private def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
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

  /** S2CellId::FromFaceIJWrap — ij coordinates that fell off the face
    * are projected onto the adjacent face via the LINEAR st→uv
    * transform (per the S2 source; the quadratic one would distort
    * the wrap point). */
  private def fromFaceIJWrap(face: Int, i: Int, j: Int): Long = {
    val ic = math.max(-1, math.min(MaxSize, i))
    val jc = math.max(-1, math.min(MaxSize, j))
    val kScale = 1.0 / MaxSize
    val kLimit = 1.0 + 2.220446049250313e-16
    val u = math.max(-kLimit, math.min(kLimit,
      kScale * (2.0 * (ic - MaxSize / 2) + 1)))
    val v = math.max(-kLimit, math.min(kLimit,
      kScale * (2.0 * (jc - MaxSize / 2) + 1)))
    val (f2, u2, v2) = xyzToFaceUV(faceUVtoXYZ(face, u, v))
    fromFaceIJ(f2, stToIJ(0.5 * (u2 + 1)), stToIJ(0.5 * (v2 + 1)))
  }
  private def fromFaceIJSame(face: Int, i: Int, j: Int, same: Boolean): Long =
    if (same) fromFaceIJ(face, i, j) else fromFaceIJWrap(face, i, j)

  /** S2CellId::AppendVertexNeighbors — the (3 or 4) cells at `level`
    * around the leaf cell's closest parent-cell vertex. */
  private def vertexNeighbors(leafId: Long, level: Int): Seq[Long] = {
    val (face, i, j) = cellToFaceIJ(leafId)
    val halfsize = 1 << (30 - (level + 1))
    val size = halfsize << 1
    val (ioffset, isame) =
      if ((i & halfsize) != 0) (size, i + size < MaxSize)
      else (-size, i - size >= 0)
    val (joffset, jsame) =
      if ((j & halfsize) != 0) (size, j + size < MaxSize)
      else (-size, j - size >= 0)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    out += cellParentAt(leafId, level)
    out += cellParentAt(fromFaceIJSame(face, i + ioffset, j, isame), level)
    out += cellParentAt(fromFaceIJSame(face, i, j + joffset, jsame), level)
    if (isame || jsame)
      out += cellParentAt(
        fromFaceIJSame(face, i + ioffset, j + joffset, isame && jsame), level)
    out.toSeq
  }

  /** S2's quadratic ST→UV transform (inverse of uvToST). */
  private def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3) * (4 * s * s - 1)
    else (1.0 / 3) * (1 - 4 * (1 - s) * (1 - s))

  private def faceUVtoXYZ(face: Int, u: Double, v: Double): V3 = face match {
    case 0 => V3(1, u, v)
    case 1 => V3(-u, 1, v)
    case 2 => V3(-u, -v, 1)
    case 3 => V3(-1, -v, -u)
    case 4 => V3(v, -1, -u)
    case _ => V3(v, u, -1)
  }

  /** Project p onto `face`; None when p is on the opposite
    * hemisphere (S2::FaceXYZtoUV validity test). */
  private def faceXYZtoUV(face: Int, p: V3): Option[(Double, Double)] = {
    val ok = face match {
      case 0 => p.x > 0; case 1 => p.y > 0; case 2 => p.z > 0
      case 3 => p.x < 0; case 4 => p.y < 0; case _ => p.z < 0
    }
    if (!ok) None
    else Some(face match {
      case 0 => (p.y / p.x, p.z / p.x)
      case 1 => (-p.x / p.y, p.z / p.y)
      case 2 => (-p.x / p.z, -p.y / p.z)
      case 3 => (p.z / p.x, p.y / p.x)
      case 4 => (p.z / p.y, -p.x / p.y)
      case _ => (-p.y / p.z, -p.x / p.z)
    })
  }

  /** Cell geometry for the region tests: face-local uv rectangle plus
    * the 4 corner vertices (S2Cell::GetVertex order). */
  private final case class CellGeom(id: Long, face: Int,
                                    uLo: Double, uHi: Double,
                                    vLo: Double, vHi: Double) {
    val verts: Array[V3] = Array(
      faceUVtoXYZ(face, uLo, vLo).unit, faceUVtoXYZ(face, uHi, vLo).unit,
      faceUVtoXYZ(face, uHi, vHi).unit, faceUVtoXYZ(face, uLo, vHi).unit)
    def edges: IndexedSeq[(V3, V3)] =
      (0 until 4).map(k => (verts(k), verts((k + 1) & 3)))
    def containsPoint(p: V3): Boolean = faceXYZtoUV(face, p) match {
      case Some((u, v)) => u >= uLo && u <= uHi && v >= vLo && v <= vHi
      case None => false
    }
  }
  private def cellGeom(id: Long): CellGeom = {
    val (face, i, j) = cellToFaceIJ(id)
    val size = 1 << (30 - cellLevel(id))
    val iLo = i & -size; val jLo = j & -size
    def st(x: Int): Double = x * (1.0 / MaxSize)
    CellGeom(id, face, stToUV(st(iLo)), stToUV(st(iLo + size)),
      stToUV(st(jLo)), stToUV(st(jLo + size)))
  }

  private sealed trait CovRegion {
    def mayIntersect(c: CellGeom): Boolean
    def containsCell(c: CellGeom): Boolean
    def capBound: (V3, Double) // (center, radius radians)
  }

  private final class LineRegion(l: SLine) extends CovRegion {
    private val le = lineEdges(l).toIndexedSeq
    // closed vertex-in-cell tests (S2Cell::Contains is closed, so a
    // vertex exactly on a cell border touches BOTH sides) + strict
    // proper-crossing tests — mirrors S2Polyline::MayIntersect
    def mayIntersect(c: CellGeom): Boolean =
      l.pts.exists(c.containsPoint) ||
        c.edges.exists { case (a, b) =>
          le.exists { case (u, v) => arcsCross(a, b, u, v) } }
    def containsCell(c: CellGeom): Boolean = false // curves contain no cell
    val capBound: (V3, Double) = shapeCapBound(lineEdges(l))
  }

  private final class PolyRegion(p: SPoly) extends CovRegion {
    private val pe = polyEdges(p).toIndexedSeq
    private val pv = p.loops.flatten
    private def crossings(c: CellGeom): Boolean =
      c.edges.exists { case (a, b) =>
        pe.exists { case (u, v) => arcsCross(a, b, u, v) } }
    // EXACT interior test (boundaryTol 0): the default leaf-scale
    // tolerance (~1.3 cm) lights up every cell near a sliver polygon
    // and breaks the nc==1 free-descent chains S2 produces along the
    // boundary of thin shapes
    private def inside(x: V3): Boolean = polyContains(x, p, boundaryTol = 0)
    def mayIntersect(c: CellGeom): Boolean =
      pv.exists(c.containsPoint) ||
        c.verts.exists(inside) || crossings(c)
    def containsCell(c: CellGeom): Boolean =
      c.verts.forall(inside) &&
        !pv.exists(c.containsPoint) && !crossings(c)
    val capBound: (V3, Double) = shapeCapBound(polyEdges(p))
  }

  /** Bounding cap via a lat/lng rectangle over the edges (interior
    * great-circle latitude extrema included), then
    * S2LatLngRect::GetCapBound's pole-cap vs mid-cap choice. */
  private def shapeCapBound(edges: Iterator[(V3, V3)]): (V3, Double) = {
    var latLo = Double.MaxValue; var latHi = -Double.MaxValue
    var lngLo = Double.MaxValue; var lngHi = -Double.MaxValue
    def add(p0: V3): Unit = {
      val p = p0.unit
      val lat = math.asin(math.max(-1.0, math.min(1.0, p.z)))
      val lng = math.atan2(p.y, p.x)
      latLo = math.min(latLo, lat); latHi = math.max(latHi, lat)
      lngLo = math.min(lngLo, lng); lngHi = math.max(lngHi, lng)
    }
    edges.foreach { case (a, b) =>
      add(a); add(b)
      val n = a.cross(b)
      if (n.norm > 1e-30) {
        val nu = n.unit
        val horiz = math.sqrt(math.max(0.0, nu.x * nu.x + nu.y * nu.y))
        if (horiz > 1e-30) {
          val top = V3(-nu.x * nu.z, -nu.y * nu.z, horiz * horiz).unit
          def onMinor(x: V3): Boolean =
            math.abs(angle(a, x) + angle(x, b) - angle(a, b)) < 1e-9
          if (onMinor(top)) add(top)
          if (onMinor(-top)) add(-top)
        }
      }
    }
    // pole cap
    val (poleZ, poleAngle) =
      if (latLo + latHi < 0) (-1.0, math.Pi / 2 + latHi)
      else (1.0, math.Pi / 2 - latLo)
    val pole = (V3(0, 0, poleZ), poleAngle)
    if (lngHi - lngLo < 2 * math.Pi) {
      val midLat = (latLo + latHi) / 2; val midLng = (lngLo + lngHi) / 2
      def pt(lng: Double, lat: Double): V3 =
        V3(math.cos(lat) * math.cos(lng), math.cos(lat) * math.sin(lng),
          math.sin(lat))
      val center = pt(midLng, midLat)
      var maxAng = 0.0
      for (lat <- Seq(latLo, latHi); lng <- Seq(lngLo, lngHi))
        maxAng = math.max(maxAng, angle(center, pt(lng, lat)))
      if (maxAng < poleAngle) (center, maxAng) else pole
    } else pole
  }

  /** S2::kMinWidth.GetLevelForMinValue — max level whose min cell
    * width is at least `value` (quadratic-projection derivative). */
  private val MinWidthDeriv = 2 * math.sqrt(2.0) / 3
  private def levelForMinWidth(value: Double): Int = {
    if (value <= 0) return 30
    val x = value / MinWidthDeriv
    // frexp exponent: x = m * 2^e with m in [0.5, 1)
    val e = Math.getExponent(x) + 1
    math.max(0, math.min(30, 1 - e))
  }

  /** S2CellUnion::Normalize — ascending order, drop contained cells,
    * merge complete sibling quadruples into their parent. */
  private def normalizeCells(ids: Seq[Long]): Seq[Long] = {
    def areSiblings(a: Long, b: Long, c: Long, d: Long): Boolean = {
      if ((a ^ b ^ c) != d) return false
      var mask = (d & -d) << 1
      mask = ~(mask + (mask << 1))
      val m = d & mask
      (a & mask) == m && (b & mask) == m && (c & mask) == m &&
        cellLevel(d) > 0
    }
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    ids.sorted.foreach { id0 =>
      var id = id0
      if (!(out.nonEmpty && cellContainsCell(out.last, id))) {
        while (out.nonEmpty && cellContainsCell(id, out.last))
          out.remove(out.size - 1)
        while (out.size >= 3 &&
            areSiblings(out(out.size - 3), out(out.size - 2),
              out(out.size - 1), id)) {
          out.remove(out.size - 1); out.remove(out.size - 1)
          out.remove(out.size - 1)
          id = cellParentAt(id, cellLevel(id) - 1)
        }
        out += id
      }
    }
    out.toSeq
  }

  /** S2RegionCoverer::GetCovering (exterior covering, level_mod 1).
    * Points short-circuit to their leaf cell (GeoFunction.cpp:440). */
  def coveringCellIds(shape: Shape, minLevel: Int = 0, maxLevel: Int = 30,
                      maxCells: Int = 8): Seq[Long] = shape match {
    case SPoint(p) => Seq(leafCellId(p))
    case _ =>
      val region: CovRegion = shape match {
        case l: SLine => new LineRegion(l)
        case p: SPoly => new PolyRegion(p)
        case _ => return Nil
      }
      val result = scala.collection.mutable.ArrayBuffer[Long]()
      final class Cand(val id: Long, val isTerminal: Boolean) {
        var numChildren = 0
        val children = new Array[Cand](4)
      }
      // max-heap on (priority, cellId) — the C++ queue breaks priority
      // ties by candidate POINTER, i.e. by allocator accident; some
      // deterministic rule is needed here, and largest-cell-id-first
      // reproduces the reference's recorded coverings (GeoBase
      // .feature rows "102"/"103").
      implicit val ord: Ordering[(Int, Long, Cand)] =
        Ordering.by(t => (t._1, t._2))
      val pq = scala.collection.mutable.PriorityQueue.empty[(Int, Long, Cand)]

      def newCandidate(id: Long): Cand = {
        val g = cellGeom(id)
        if (!region.mayIntersect(g)) null
        else {
          val lvl = cellLevel(id)
          val terminal = lvl >= minLevel &&
            (lvl + 1 > maxLevel || region.containsCell(g))
          new Cand(id, terminal)
        }
      }
      def addCandidate(cand: Cand): Unit = {
        if (cand == null) return
        if (cand.isTerminal) { result += cand.id; return }
        var numTerminals = 0
        cellChildren(cand.id).foreach { child =>
          val c = newCandidate(child)
          if (c != null) {
            cand.children(cand.numChildren) = c
            cand.numChildren += 1
            if (c.isTerminal) numTerminals += 1
          }
        }
        if (cand.numChildren == 0) ()
        else if (numTerminals == 4 && cellLevel(cand.id) >= minLevel)
          result += cand.id // all children terminal → keep the parent
        else {
          val priority =
            -((((cellLevel(cand.id) << 2) + cand.numChildren) << 2) +
              numTerminals)
          pq.enqueue((priority, cand.id, cand))
        }
      }

      // initial candidates: a ≤4-cell covering of the bounding cap
      // when it is small enough, else the 6 cube faces
      var needFaces = true
      if (maxCells >= 4) {
        val (capCenter, capRadius) = region.capBound
        val lvl = math.min(levelForMinWidth(2 * capRadius),
          math.min(maxLevel, 29))
        if (lvl > 0) {
          vertexNeighbors(leafCellId(capCenter.unit), lvl)
            .foreach(id => addCandidate(newCandidate(id)))
          needFaces = false
        }
      }
      if (needFaces)
        (0 until 6).foreach { f =>
          addCandidate(newCandidate((f.toLong << 61) + lsbForLevel(0)))
        }

      while (pq.nonEmpty && result.size < maxCells) {
        val cand = pq.dequeue()._3
        val expand = cellLevel(cand.id) < minLevel || cand.numChildren == 1 ||
          pq.size + result.size + cand.numChildren <= maxCells
        if (expand) {
          var k = 0
          while (k < cand.numChildren) { addCandidate(cand.children(k)); k += 1 }
        } else result += cand.id
      }
      normalizeCells(result.toSeq)
  }
}
