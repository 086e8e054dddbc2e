package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Mmsi, Sketches, TextFunctions}
import graft.geo.{GeoFunctions, Projection, TileMath}
import graft.raster.{Codecs, Geoid, GeoidGrid}

/** ScalaCheck properties for the pure functions (SURVEY §5 plan): codecs,
  * projections, tile math, geoid grids, fingerprints, DSL parsing.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a property with a fixed seed (deterministic CI) and surface the
    * falsifying case in the assertion message.
    */
  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("terrain codec: decode∘encode = clamp, within quantization") {
    check(forAll(Gen.choose(-20000.0, 2000000.0)) { e =>
      val (r, g, b) = Codecs.elevationToRgb(e)
      val back = Codecs.terrainRgbToElevation(r, g, b)
      val clamped = math.max(-10000.0, math.min(1667721.5, e))
      r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255 &&
        math.abs(back - clamped) <= 0.05 + 1e-9
    })
  }

  test("dBZ palette: total function, first-match bucket is correct") {
    check(forAll(Gen.choose(0, 255)) { px =>
      val dbz = Codecs.rainviewerToDbz(px)
      val c = Codecs.dbzColor(dbz)
      val inRange = dbz >= -32 && dbz <= 95
      val transparentIff = (c == Codecs.DbzTransparent) == (dbz < 0)
      val bucketOk = c == Codecs.DbzTransparent || {
        val idx = Codecs.DbzPalette.indexWhere(dbz < _._1)
        if (idx < 0) c == Codecs.DbzTop
        else c == Codecs.DbzPalette(idx)._2 &&
          Codecs.DbzPalette.take(idx).forall(dbz >= _._1)
      }
      inRange && transparentIff && bucketOk
    })
  }

  test("NZTM inverse lands in the projection's valid neighborhood") {
    // eastings/northings across the NZTM domain → lat/lon near NZ
    val gen = for {
      e <- Gen.choose(1000000.0, 2100000.0)
      n <- Gen.choose(4700000.0, 6200000.0)
    } yield (e, n)
    check(forAll(gen) { case (e, n) =>
      val (lat, lon) = Projection.inverse(e, n)
      lat > -60 && lat < -25 && lon > 160 && lon < 187
    })
  }

  test("mercator: tile containment is consistent with pixel math") {
    val gen = for {
      lon <- Gen.choose(-179.9, 179.9)
      lat <- Gen.choose(-84.9, 84.9)
      z <- Gen.choose(0, 12)
    } yield (lon, lat, z)
    check(forAll(gen) { case (lon, lat, z) =>
      val (tx, ty) = TileMath.mercatorTile(lon, lat, z)
      val px = TileMath.lonToMercatorX(lon, z)
      val py = TileMath.latToMercatorY(lat, z)
      tx == math.floor(px / 256).toInt && ty == math.floor(py / 256).toInt &&
        tx >= 0 && tx < (1 << z) && ty >= 0 && ty < (1 << z)
    })
  }

  test("geoid GTX: build∘parse round-trips and interpolation is bounded by cell corners") {
    val gen = for {
      nrows <- Gen.choose(2, 6)
      ncols <- Gen.choose(2, 6)
      vals <- Gen.listOfN(nrows * ncols, Gen.choose(-50f, 50f))
      fr <- Gen.choose(0.01, 0.99)
      fc <- Gen.choose(0.01, 0.99)
    } yield (nrows, ncols, vals, fr, fc)
    check(forAll(gen) { case (nrows, ncols, vals, fr, fc) =>
      val g = GeoidGrid(-45.0, 170.0, 1.0, 1.0, nrows, ncols, vals.toArray)
      val parsed = Geoid.parseGtx(Geoid.toGtxBytes(g))
      val lat = -45.0 + fr
      val lon = 170.0 + fc
      val s = parsed.separation(lat, lon)
      val corners = Seq(vals(0), vals(1), vals(ncols), vals(ncols + 1)).map(_.toDouble)
      parsed.values.toSeq == vals &&
        s >= corners.min - 1e-6 && s <= corners.max + 1e-6
    })
  }

  test("point-in-polygon: column form ≡ scala form is grid-tested; scala form respects convex membership") {
    // For a convex polygon, ray-cast must agree with the half-plane test
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val gen = for {
      x <- Gen.choose(-5.0, 15.0)
      y <- Gen.choose(-5.0, 15.0)
    } yield (x, y)
    check(forAll(gen) { case (x, y) =>
      val rayCast = GeoFunctions.pointInPolygon(x, y, square)
      val halfPlane = x > 0 && x < 10 && y > 0 && y < 10
      // points on the boundary are rounding-dependent; skip them
      val onEdge = x == 0 || x == 10 || y == 0 || y == 10
      onEdge || rayCast == halfPlane
    })
  }

  test("MMSI classification is total and stable across the 9-digit space") {
    check(forAll(Gen.choose(0L, 999999999L)) { m =>
      val c = Mmsi.classify(m)
      Set("aton", "sar", "coast", "group", "vessel", "invalid").contains(c.name)
    })
  }

  test("fingerprints: FNV-1a and md5-prefix are deterministic and spread") {
    check(forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val fa = TextFunctions.fingerprint64(a)
      (fa == TextFunctions.fingerprint64(a)) && (a == b || fa != TextFunctions.fingerprint64(b) || a.isEmpty)
    })
  }

  test("universal hash family: in-range, deterministic, seed-separated") {
    val gen = for {
      h <- Gen.choose(0L, (1L << 60) - 1)
      i <- Gen.choose(0, Sketches.NumHashes - 1)
    } yield (h, i)
    check(forAll(gen) { case (h, i) =>
      val a = Sketches.hashA(i)
      val hp = h % Sketches.P31
      val v = (a * hp + Sketches.hashB(i)) % Sketches.P31
      v >= 0 && v < Sketches.P31 && a >= 1 && a < Sketches.P31
    })
  }

  test("filter DSL parser: every generated clause parses to the expected AST shape") {
    import graft.dsl.FilterDsl
    val path = Gen.identifier.suchThat(_.nonEmpty)
    val num = Gen.choose(-1000, 1000)
    val op = Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
    check(forAll(path, op, num) { (p, o, n) =>
      FilterDsl.parse(s"$p $o $n") match {
        case Some(FilterDsl.Compare(pp, oo, FilterDsl.LNum(d))) =>
          pp == p && oo == o && d == n.toDouble
        case _ => false
      }
    })
  }

  test("stub resizer: exact size contract, content sampled from the input") {
    import graft.raster.Multimodal.{MediaRow, StubResizer}
    val gen = for {
      n <- Gen.choose(0, 2000)
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 64)
      seed <- Gen.choose(0, 250)
    } yield (n, w, h, seed)
    check(forAll(gen) { case (n, w, h, seed) =>
      val payload = Array.tabulate(n)(i => ((i * 7 + seed) % 251).toByte)
      val out = StubResizer.resize(MediaRow(1L, "image/png", payload), w, h)
      val again = StubResizer.resize(MediaRow(1L, "image/png", payload), w, h)
      out.payload.length == w * h &&
        out.payload.sameElements(again.payload) &&
        (payload.isEmpty || out.payload.forall(payload.contains(_))) &&
        (payload.nonEmpty || out.payload.forall(_ == 0))
    })
  }

  test("stub frame sampler: cardinality formula, tiling, monotone timestamps") {
    import graft.raster.Multimodal.{MediaRow, StubFrameSampler}
    import StubFrameSampler.{FrameBytes, FrameMs}
    val gen = for {
      n <- Gen.choose(0, 5000)
      everyMs <- Gen.choose(1L, 400L)
    } yield (n, everyMs)
    check(forAll(gen) { case (n, everyMs) =>
      val payload = Array.tabulate(n)(i => (i % 251).toByte)
      val frames = StubFrameSampler.sample(MediaRow(1L, "video/mp4", payload), everyMs).toSeq
      val step = math.max(1L, everyMs / FrameMs).toInt
      val nFrames = n / FrameBytes
      val wantCount = if (nFrames == 0) 0 else (nFrames + step - 1) / step
      frames.size == wantCount &&
        frames.forall(f => f.payload.length == FrameBytes && f.t_ms == f.frame_idx * FrameMs) &&
        frames.map(_.frame_idx) == (0 until nFrames by step).toSeq &&
        frames.forall(f =>
          f.payload.sameElements(payload.slice(f.frame_idx * FrameBytes, (f.frame_idx + 1) * FrameBytes)))
    })
  }

  test("PII scrub: residual-free and idempotent over generated delimited corpora") {
    import java.util.regex.Pattern
    val pats = Seq(TextFunctions.PiiEmailPattern, TextFunctions.PiiPhonePattern,
      TextFunctions.PiiIpPattern).map(Pattern.compile)
    val word = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    val alpha = Gen.alphaLowerStr.suchThat(_.length >= 2).map(_.take(6))
    val email = for { a <- alpha; d <- alpha } yield s"$a@$d.com"
    val phone = for {
      cc <- Gen.choose(1, 999); mid <- Gen.choose(10, 9999)
      tail <- Gen.choose(10000, 99999999); dash <- Gen.oneOf(" ", "-")
    } yield s"+$cc$dash$mid$dash$tail"
    val ip = for {
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
      c <- Gen.choose(0, 255); e <- Gen.choose(0, 255)
    } yield s"$a.$b.$c.$e"
    val doc = Gen.listOf(Gen.oneOf(word, email, phone, ip)).map(_.mkString(" "))
    check(forAll(doc) { s =>
      val once = TextFunctions.redactPiiString(s)
      pats.forall(!_.matcher(once).find()) &&
        TextFunctions.redactPiiString(once) == once
    })
  }

  test("PII scrub boundary: undelimited email adjacency leaves a stable domain fragment") {
    // two emails with no delimiter between them: the first match's greedy
    // local part consumes the second email's local part, so the second
    // '@domain' survives as an unredacted fragment — a DETECTION gap on
    // pathological input, not an idempotence gap: the token's '>' can't
    // start a local part, so a re-scrub is still a no-op. Identical in
    // java.util.regex and RE2, so cross-engine parity holds here too.
    val once = TextFunctions.redactPiiString("a@b.comx@y.com")
    assert(once === "<EMAIL>@y.com")
    assert(TextFunctions.redactPiiString(once) === once)
  }
}
