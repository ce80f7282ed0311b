package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class GeomSpec extends AnyFunSuite with graft.PropHelper {

  // ---- ring closure (reference utils.py:40-41) ----
  test("closeRing appends first point when open") {
    val r = Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0)
    val c = Geom.closeRing(r)
    assert(c.length == 8 && c(6) == 0.0 && c(7) == 0.0)
    assert(Geom.closeRing(c) sameElements c) // idempotent
  }

  test("closeRing exact tuple equality, not epsilon") {
    val r = Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1e-16, 0.0)
    assert(Geom.closeRing(r).length == r.length + 2)
  }

  // ---- gaussian smoothing (reference utils.py:27-31, scipy reflect) ----
  test("gaussianFilter1d matches scipy-semantics golden vector") {
    val xs = Array(116.300, 116.304, 116.304, 116.300, 116.300, 116.3011, 116.3302, 116.2999)
    val expected = Array(116.30141754224849, 116.30258206964272, 116.3025731117152,
      116.30137706937033, 116.30212993602525, 116.30776283763007,
      116.31241918986458, 116.30893824350338)
    val got = Geom.gaussianFilter1d(xs, 1.0)
    got.zip(expected).foreach { case (g, e) => assert(Math.abs(g - e) < 1e-12, s"$g vs $e") }
  }

  test("gaussianFilter1d short array (n < kernel radius) reflect mode") {
    val got = Geom.gaussianFilter1d(Array(1.0, 2.0, 3.0), 1.0)
    val expected = Array(1.4220737662726832, 2.0, 2.5779262337273168)
    got.zip(expected).foreach { case (g, e) => assert(Math.abs(g - e) < 1e-12) }
  }

  test("gaussian kernel sums to 1 and is symmetric") {
    val k = Geom.gaussianKernel(1.0)
    assert(k.length == 9) // truncate=4.0, sigma=1 => radius 4
    assert(Math.abs(k.sum - 1.0) < 1e-15)
    k.indices.foreach(i => assert(k(i) == k(k.length - 1 - i)))
  }

  test("smoothing preserves constant sequences") {
    val got = Geom.gaussianFilter1d(Array.fill(10)(7.5), 2.0)
    got.foreach(v => assert(Math.abs(v - 7.5) < 1e-12))
  }

  // ---- strict containment (reference utils.py:50-52) ----
  val square: Array[Array[Double]] = Array(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0))

  test("containsStrict: interior in, exterior out, boundary OUT (shapely contains)") {
    assert(Geom.containsStrict(square, 2.0, 2.0))
    assert(!Geom.containsStrict(square, 5.0, 2.0))
    assert(!Geom.containsStrict(square, 2.0, 0.0))  // on edge
    assert(!Geom.containsStrict(square, 0.0, 0.0))  // on vertex
    assert(!Geom.containsStrict(square, 4.0, 4.0))  // on vertex
    assert(!Geom.containsStrict(square, 0.0, 2.0))  // on vertical edge
  }

  test("containsStrict multi-ring = disjoint pieces (engine produces no holes)") {
    // second ring is a separate piece away from the first
    val pieces = square :+ Array(10.0, 10.0, 12.0, 10.0, 12.0, 12.0, 10.0, 12.0)
    assert(Geom.containsStrict(pieces, 2.0, 2.0))   // inside piece 1
    assert(Geom.containsStrict(pieces, 11.0, 11.0)) // inside piece 2
    assert(!Geom.containsStrict(pieces, 7.0, 7.0))  // between pieces
    assert(!Geom.containsStrict(pieces, 10.0, 11.0)) // on piece boundary
  }

  test("containsStrict concave polygon") {
    // U-shape
    val u = Array(Array(0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 4.0, 6.0, 4.0, 2.0, 2.0, 2.0, 2.0, 6.0, 0.0, 6.0))
    assert(Geom.containsStrict(u, 1.0, 5.0))
    assert(Geom.containsStrict(u, 5.0, 5.0))
    assert(!Geom.containsStrict(u, 3.0, 5.0)) // in the notch
    assert(Geom.containsStrict(u, 3.0, 1.0))
  }

  test("containsStrict agrees with winding-number brute force on random convex polys") {
    val gen = for {
      n <- Gen.choose(3, 12)
      cx <- Gen.choose(-50.0, 50.0)
      cy <- Gen.choose(-50.0, 50.0)
      rad <- Gen.choose(1.0, 20.0)
      px <- Gen.choose(-80.0, 80.0)
      py <- Gen.choose(-80.0, 80.0)
    } yield (n, cx, cy, rad, px, py)
    forAllN(gen) { case (n, cx, cy, rad, px, py) =>
      // regular n-gon => convex; strict containment has an easy oracle:
      // distance from center along each half-plane
      val ring = new Array[Double](2 * n)
      (0 until n).foreach { i =>
        val a = 2 * Math.PI * i / n
        ring(2 * i) = cx + rad * Math.cos(a)
        ring(2 * i + 1) = cy + rad * Math.sin(a)
      }
      val poly = Array(ring)
      // oracle: all cross products strictly positive (CCW ring)
      var strictlyIn = true
      (0 until n).foreach { i =>
        val j = (i + 1) % n
        val cross = (ring(2 * j) - ring(2 * i)) * (py - ring(2 * i + 1)) -
          (ring(2 * j + 1) - ring(2 * i + 1)) * (px - ring(2 * i))
        if (cross <= 0) strictlyIn = false
      }
      assert(Geom.containsStrict(poly, px, py) == strictlyIn)
    }
  }

  // ---- envelope / area ----
  test("envelope matches geopandas total_bounds order (minx,miny,maxx,maxy)") {
    val e = Geom.envelope(Array(3.0, -1.0, -2.0, 5.0, 1.0, 1.0))
    assert(e sameElements Array(-2.0, -1.0, 3.0, 5.0))
  }

  test("signed area CCW positive, CW negative; closed == open") {
    val ccw = Array(0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0)
    assert(Geom.signedArea(ccw) == 4.0)
    assert(Geom.signedArea(Geom.toCCW(ccw.reverse)) == 4.0)
    assert(Geom.signedArea(Geom.closeRing(ccw)) == 4.0)
  }

  // ---- validity (reference utils.py:35-38, 57-62) ----
  test("isRingValid: degenerate and self-intersecting rings invalid") {
    assert(!Geom.isRingValid(Array(0.0, 0.0, 1.0, 1.0)))                       // 2 pts
    assert(!Geom.isRingValid(Array(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)))             // zero area
    assert(!Geom.isRingValid(Array(0.0, 0.0, 2.0, 2.0, 2.0, 0.0, 0.0, 2.0)))   // bowtie
    assert(Geom.isRingValid(Array(0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0)))    // square
  }

  // ---- intersection (reference utils.py:55-66) ----
  test("intersection of overlapping squares") {
    val a = Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0)
    val b = Array(2.0, 2.0, 6.0, 2.0, 6.0, 6.0, 2.0, 6.0)
    val r = Geom.intersection(a, b)
    assert(r != null)
    assert(Math.abs(Geom.area(r) - 4.0) < 1e-12)
    val e = Geom.envelope(r)
    assert(e sameElements Array(2.0, 2.0, 4.0, 4.0))
  }

  test("intersection disjoint -> null (reference None on empty)") {
    val a = Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0)
    val b = Array(5.0, 5.0, 6.0, 5.0, 6.0, 6.0, 5.0, 6.0)
    assert(Geom.intersection(a, b) == null)
  }

  test("intersection touching-edge only -> null (zero area)") {
    val a = Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0)
    val b = Array(1.0, 0.0, 2.0, 0.0, 2.0, 1.0, 1.0, 1.0)
    assert(Geom.intersection(a, b) == null)
  }

  test("intersection degenerate input -> null") {
    assert(Geom.intersection(Array(0.0, 0.0, 1.0, 1.0), square(0)) == null)
  }

  test("intersection concave subject x convex clip") {
    // U-shape clipped by a square over the notch: two legs remain =>
    // S-H produces a connected (degenerate-bridge) ring; area must equal
    // legs' area
    val u = Array(0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 4.0, 6.0, 4.0, 2.0, 2.0, 2.0, 2.0, 6.0, 0.0, 6.0)
    val clip = Array(0.0, 3.0, 6.0, 3.0, 6.0, 6.0, 0.0, 6.0)
    val r = Geom.intersection(u, clip)
    assert(r != null)
    assert(Math.abs(Geom.area(r) - 12.0) < 1e-9) // two 2x3 legs
  }

  test("intersection clipped subset area <= both inputs (property)") {
    val gen = for {
      x1 <- Gen.choose(-10.0, 10.0); y1 <- Gen.choose(-10.0, 10.0)
      w1 <- Gen.choose(0.5, 10.0); h1 <- Gen.choose(0.5, 10.0)
      x2 <- Gen.choose(-10.0, 10.0); y2 <- Gen.choose(-10.0, 10.0)
      w2 <- Gen.choose(0.5, 10.0); h2 <- Gen.choose(0.5, 10.0)
    } yield (x1, y1, w1, h1, x2, y2, w2, h2)
    forAllN(gen) { case (x1, y1, w1, h1, x2, y2, w2, h2) =>
      val a = Array(x1, y1, x1 + w1, y1, x1 + w1, y1 + h1, x1, y1 + h1)
      val b = Array(x2, y2, x2 + w2, y2, x2 + w2, y2 + h2, x2, y2 + h2)
      val r = Geom.intersection(a, b)
      val ix = Math.max(0.0, Math.min(x1 + w1, x2 + w2) - Math.max(x1, x2))
      val iy = Math.max(0.0, Math.min(y1 + h1, y2 + h2) - Math.max(y1, y2))
      val expected = ix * iy
      if (expected == 0.0) assert(r == null)
      else assert(r != null && Math.abs(Geom.area(r) - expected) < 1e-9)
    }
  }

  // ---- triangulation + general (concave x concave) intersection ----
  test("triangulation partitions the ring: triangle areas sum to ring area") {
    val uShape = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    val tris = Geom.triangulate(uShape)
    assert(tris != null && tris.length == Geom.nPts(uShape) - 2)
    val sum = tris.map(Geom.area).sum
    assert(Math.abs(sum - Geom.area(uShape)) < 1e-9)
  }

  test("concave x concave intersection: exact area via disjoint pieces") {
    val uShape = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    val lShape = Array(1.0, 1, 7, 1, 7, 3, 3, 3, 3, 6, 1, 6)
    assert(!Geom.isConvex(uShape) && !Geom.isConvex(lShape))
    val pieces = Geom.intersectionPieces(uShape, lShape)
    assert(pieces != null && pieces.nonEmpty)
    val got = pieces.map(Geom.area).sum
    // deterministic grid integration over the envelope as the oracle
    val n = 600
    var hits = 0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val px = 0.0 + 7.0 * (i + 0.5) / n
        val py = 0.0 + 6.0 * (j + 0.5) / n
        if (Geom.containsStrict(Array(uShape), px, py) &&
            Geom.containsStrict(Array(lShape), px, py)) hits += 1
        j += 1
      }
      i += 1
    }
    val est = hits.toDouble * (7.0 * 6.0) / (n.toDouble * n)
    assert(Math.abs(got - est) < 0.05 * est, s"pieces=$got grid=$est")
    // pieces stay within both inputs
    assert(got <= Geom.area(uShape) + 1e-9 && got <= Geom.area(lShape) + 1e-9)
    // and every strictly-interior intersection sample is covered by a piece
    var covered = true
    var k = 0
    while (k < n && covered) {
      val px = 7.0 * (k + 0.5) / n; val py = 6.0 * (k + 0.37) / n
      if (Geom.containsStrict(Array(uShape), px, py) &&
          Geom.containsStrict(Array(lShape), px, py))
        covered = Geom.covers(pieces, px, py)
      k += 1
    }
    assert(covered)
  }

  test("intersectionPieces properties on random concave rings") {
    val rnd = new scala.util.Random(13)
    var tested = 0
    (0 until 150).foreach { _ =>
      def noisyRing(cx: Double, cy: Double): Array[Double] = {
        val n = 6 + rnd.nextInt(18)
        (0 until n).flatMap { i =>
          val a = 2 * Math.PI * i / n
          val rr = 0.5 + rnd.nextDouble() * 1.5 // strong radial noise -> concave
          Seq(cx + rr * Math.cos(a), cy + 0.8 * rr * Math.sin(a))
        }.toArray
      }
      val s = noisyRing(0, 0)
      val c = noisyRing(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)
      if (Geom.isRingValid(s) && Geom.isRingValid(c)) {
        tested += 1
        val pieces = Geom.intersectionPieces(s, c)
        if (pieces != null) {
          val a = pieces.map(Geom.area).sum
          assert(a > 0 && a <= Geom.area(s) + 1e-9 && a <= Geom.area(c) + 1e-9)
          // spot-check piece membership: sampled piece-interior-ish points
          // (centroids of pieces) must lie in BOTH inputs (covers-level)
          pieces.foreach { p =>
            val n = Geom.nPts(p)
            var gx = 0.0; var gy = 0.0
            (0 until n).foreach { i => gx += p(2 * i); gy += p(2 * i + 1) }
            gx /= n; gy /= n
            // centroid of a (convex-ish S-H) piece; skip if it fell outside
            // its own piece (possible for weird concave pieces)
            if (Geom.covers(Array(p), gx, gy)) {
              assert(Geom.covers(Array(s), gx, gy), s"piece centroid outside subject")
              assert(Geom.covers(Array(c), gx, gy), s"piece centroid outside clip")
            }
          }
        }
      }
    }
    assert(tested > 50) // the generator must actually produce valid rings
  }

  test("concave x concave disjoint -> null") {
    val uShape = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    val far = uShape.zipWithIndex.map { case (v, i) => if (i % 2 == 0) v + 100 else v }
    assert(Geom.intersectionPieces(uShape, far) == null)
  }

  // ---- Greiner–Hormann true-boundary tracing ----
  test("GH: offset squares -> the exact overlap square, one piece") {
    val a = Array(0.0, 0, 2, 0, 2, 2, 0, 2)
    val b = Array(1.0, 1, 3, 1, 3, 3, 1, 3)
    val gh = Geom.intersectionBoundary(a, b)
    assert(gh != null && gh.length == 1)
    assert(Math.abs(Geom.area(gh(0)) - 1.0) < 1e-12)
    val pts = (0 until Geom.nPts(gh(0))).map(i => (gh(0)(2 * i), gh(0)(2 * i + 1))).toSet
    assert(pts == Set((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)))
  }

  test("GH: every result edge midpoint lies ON an input boundary (true boundary, " +
    "no triangulation seams)") {
    val uShape = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    val lShape = Array(1.0, 1, 7, 1, 7, 3, 3, 3, 3, 6, 1, 6)
    val gh = Geom.intersectionBoundary(uShape, lShape)
    assert(gh != null && gh.nonEmpty)
    gh.foreach { p =>
      val n = Geom.nPts(p)
      (0 until n).foreach { i =>
        val j = (i + 1) % n
        val mx = (p(2 * i) + p(2 * j)) / 2; val my = (p(2 * i + 1) + p(2 * j + 1)) / 2
        assert(Geom.onBoundary(Array(uShape), mx, my) ||
          Geom.onBoundary(Array(lShape), mx, my),
          s"edge midpoint ($mx,$my) on neither input boundary")
      }
    }
  }

  test("GH: genuinely multi-piece crossing (bar through a U) -> two true pieces") {
    val uShape = Array(0.0, 0, 6, 0, 6, 6, 4, 6, 4, 2, 2, 2, 2, 6, 0, 6)
    // a thin horizontal bar crossing both arms above the notch floor
    val bar = Array(-1.0, 3, 7, 3, 7, 5, -1, 5)
    val gh = Geom.intersectionBoundary(uShape, bar)
    assert(gh != null && gh.length == 2)
    // each arm contributes a 2x2 rectangle
    gh.foreach(p => assert(Math.abs(Geom.area(p) - 4.0) < 1e-12))
  }

  test("GH: containment and disjoint without crossings") {
    val big = Array(0.0, 0, 10, 0, 10, 10, 0, 10)
    val uShape = Array(1.0, 1, 6, 1, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 1, 4)
    val inside = Geom.intersectionBoundary(uShape, big)
    assert(inside != null && inside.length == 1 &&
      Math.abs(inside(0).sorted.sum - uShape.sorted.sum) < 1e-12) // subject returned
    val outside = Geom.intersectionBoundary(uShape,
      big.zipWithIndex.map { case (v, i) => if (i % 2 == 0) v + 100 else v })
    assert(outside != null && outside.isEmpty)
  }

  test("GH: degenerate contact (shared vertex on edge) -> null, fallback exact area") {
    val uShape = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    // clip with one vertex exactly ON the subject's bottom edge -> GH refuses
    val touching = Array(3.0, 0, 8, -2, 8, 3, 3, 3, 5, 1)
    assert(!Geom.isConvex(touching))
    val gh = Geom.intersectionBoundary(uShape, touching)
    assert(gh == null)
    // intersectionPieces still answers via the triangulated partition
    val pieces = Geom.intersectionPieces(uShape, touching)
    assert(pieces != null && pieces.nonEmpty)
    val got = pieces.map(Geom.area).sum
    // grid oracle over the joint envelope
    val n = 500
    var hits = 0
    (0 until n).foreach { i =>
      (0 until n).foreach { j =>
        val px = 0.0 + 8.0 * (i + 0.5) / n
        val py = -2.0 + 6.0 * (j + 0.5) / n
        if (Geom.containsStrict(Array(uShape), px, py) &&
            Geom.containsStrict(Array(touching), px, py)) hits += 1
      }
    }
    val est = hits.toDouble * (8.0 * 6.0) / (n.toDouble * n)
    assert(Math.abs(got - est) < 0.08 * Math.max(est, 0.1), s"pieces=$got grid=$est")
  }

  test("self-intersection invariant: area(A ∩ A) == area(A) on random concave rings") {
    // every vertex of A lies on A's own boundary, so GH always refuses and
    // the triangulated fallback carries the case — this pins the fallback's
    // exactness under maximal degeneracy (all edges shared)
    val rnd = new scala.util.Random(41)
    var ok = 0
    (0 until 150).foreach { _ =>
      val n = 6 + rnd.nextInt(14)
      val ring = (0 until n).flatMap { i =>
        val a = 2 * Math.PI * i / n
        val rr = 0.5 + rnd.nextDouble() * 1.5
        Seq(rr * Math.cos(a), 0.8 * rr * Math.sin(a))
      }.toArray
      if (Geom.isRingValid(ring)) {
        val p = Geom.intersectionPieces(ring, ring)
        assert(p != null, "A ∩ A must not be empty")
        val got = p.map(Geom.area).sum
        val want = Geom.area(ring)
        assert(Math.abs(got - want) <= 1e-9 * want, s"got=$got want=$want")
        ok += 1
      }
    }
    assert(ok > 100)
  }

  test("shared-edge contact: GH refuses, convex fast path stays exact") {
    // b = the right half of a (shares a's corners at x=2 and overlaps two
    // full edge segments): the classic all-degenerate contact
    val a = Array(0.0, 0, 2, 0, 2, 2, 0, 2)
    val b = Array(1.0, 0, 2, 0, 2, 2, 1, 2)
    assert(Geom.intersectionBoundary(a, b) == null) // vertex-on-boundary gate
    val pieces = Geom.intersectionPieces(a, b)
    assert(pieces != null && pieces.length == 1)
    assert(Math.abs(pieces.map(Geom.area).sum - 2.0) < 1e-12) // == area(b), b ⊂ a
    // concave variant of the same contact goes through the triangulated
    // fallback and must stay exact too
    val u = Array(0.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 2, 2, 2, 4, 0, 4)
    val half = Array(3.0, 0, 6, 0, 6, 4, 4, 4, 4, 2, 3, 2) // right part, shares edges
    assert(!Geom.isConvex(u) && !Geom.isConvex(half))
    assert(Geom.intersectionBoundary(u, half) == null)
    val p2 = Geom.intersectionPieces(u, half)
    assert(p2 != null)
    assert(Math.abs(p2.map(Geom.area).sum - Geom.area(half)) < 1e-9) // half ⊂ u
  }

  test("GH vs triangulated partition: areas agree on random concave pairs") {
    val rnd = new scala.util.Random(29)
    var ghHits = 0
    (0 until 120).foreach { _ =>
      def noisyRing(cx: Double, cy: Double): Array[Double] = {
        val n = 6 + rnd.nextInt(14)
        (0 until n).flatMap { i =>
          val a = 2 * Math.PI * i / n
          val rr = 0.5 + rnd.nextDouble() * 1.5
          Seq(cx + rr * Math.cos(a), cy + 0.8 * rr * Math.sin(a))
        }.toArray
      }
      val s = noisyRing(0, 0)
      val c = noisyRing(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)
      if (Geom.isRingValid(s) && Geom.isRingValid(c) &&
          !Geom.isConvex(s) && !Geom.isConvex(c)) {
        val gh = Geom.intersectionBoundary(s, c)
        if (gh != null && gh.nonEmpty) {
          ghHits += 1
          val ghArea = gh.map(Geom.area).sum
          // independent exact-area oracle: triangulate both, S-H all pairs
          val tris = for {
            ts <- Geom.triangulate(s).toSeq
            tc <- Geom.triangulate(c).toSeq
            p = Geom.intersection(ts, tc) if p != null
          } yield Geom.area(p)
          val triArea = tris.sum
          assert(Math.abs(ghArea - triArea) < 1e-9 * Math.max(1.0, triArea),
            s"GH=$ghArea triangulated=$triArea")
          // true-boundary property: every piece edge midpoint within float
          // noise of an input boundary (crossing coords are computed, so
          // the exact on-segment predicate can't be used here)
          def distToRing(ring: Array[Double], px: Double, py: Double): Double = {
            val n = Geom.nPts(ring)
            var best = Double.MaxValue
            (0 until n).foreach { i =>
              val j = (i + 1) % n
              val ax = ring(2 * i); val ay = ring(2 * i + 1)
              val bx = ring(2 * j); val by = ring(2 * j + 1)
              val dx = bx - ax; val dy = by - ay
              val len2 = dx * dx + dy * dy
              val t = if (len2 == 0) 0.0
                else Math.max(0.0, Math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
              val ex = ax + t * dx - px; val ey = ay + t * dy - py
              best = Math.min(best, Math.sqrt(ex * ex + ey * ey))
            }
            best
          }
          gh.foreach { p =>
            val n = Geom.nPts(p)
            (0 until n).foreach { i =>
              val j = (i + 1) % n
              val mx = (p(2 * i) + p(2 * j)) / 2
              val my = (p(2 * i + 1) + p(2 * j + 1)) / 2
              val d = Math.min(distToRing(s, mx, my), distToRing(c, mx, my))
              assert(d < 1e-9, s"piece edge midpoint $d off both input boundaries")
            }
          }
        }
      }
    }
    assert(ghHits > 20, s"GH path exercised only $ghHits times — generator too degenerate")
  }

  // ---- haversine / viewport ----
  test("haversine known distance (1 deg lat ~ 111.2km)") {
    val d = Geom.haversineM(0, 0, 0, 1)
    assert(Math.abs(d - 111195.0) < 100.0)
    assert(Geom.haversineM(10, 20, 10, 20) == 0.0)
  }

  test("viewport math matches reference constants (utils.py:69-80)") {
    // 0.01 x 0.01 degrees at equator-ish latitude 0:
    val v = Geom.viewport(116.30, 39.98, 116.31, 39.99)
    val centerLat = 39.985
    val widthM = 0.01 * 111000.0 * Math.cos(Math.toRadians(centerLat))
    val heightM = 0.01 * 111000.0
    assert(Math.abs(v(0) - widthM / 0.2 / 300.0) < 1e-9)
    assert(Math.abs(v(1) - heightM / 0.2 / 300.0) < 1e-9)
    assert(Math.abs(v(2) - 1.0 / Math.cos(Math.toRadians(centerLat))) < 1e-12)
    assert(v(3) == 15.0) // marker pixels = 3m / 0.2 m/px
  }
}
