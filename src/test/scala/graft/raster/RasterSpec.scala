package graft.raster

import graft.SparkSpec

/** Property tests for the typed raster pipeline (R1-R5, C16-C18, C27, S11). */
class RasterSpec extends SparkSpec {

  test("terrain-RGB decode∘encode = clamped identity (property sweep)") {
    // elevations across and beyond the representable range [-10000, 1667721.5]
    val cases = Seq(-20000.0, -10000.0, -9999.9, -1.0, -0.05, 0.0, 0.04, 0.1,
      1.0, 17.26, 100.0, 8848.86, 1667721.5, 2000000.0)
    cases.foreach { e =>
      val (r, g, b) = Codecs.elevationToRgb(e)
      val back = Codecs.terrainRgbToElevation(r, g, b)
      val clamped = math.max(-10000.0, math.min(1667721.5, e))
      assert(math.abs(back - clamped) <= 0.05 + 1e-9, s"elev $e -> $back")
    }
  }

  test("GTX parse is the inverse of GTX build; bilinear matches hand values (S11/C18)") {
    // 3x3 grid, 1-degree spacing, lat -45..-43, lon 170..172
    val g = GeoidGrid(-45.0, 170.0, 1.0, 1.0, 3, 3,
      Array(10f, 20f, 30f, 40f, 50f, 60f, 70f, 80f, 90f))
    val parsed = Geoid.parseGtx(Geoid.toGtxBytes(g))
    assert((parsed.latMin, parsed.lonMin, parsed.dlat, parsed.dlon,
      parsed.nrows, parsed.ncols) === ((-45.0, 170.0, 1.0, 1.0, 3, 3)))
    assert(parsed.values.toSeq === g.values.toSeq)
    // exact grid points
    assert(parsed.separation(-45.0, 170.0) === 10.0)
    assert(parsed.separation(-44.0, 171.0) === 50.0)
    // midpoint of the first cell: mean of 10,20,40,50
    assert(math.abs(parsed.separation(-44.5, 170.5) - 30.0) < 1e-9)
    // quarter point
    assert(math.abs(parsed.separation(-44.75, 170.25) - (10 * .75 * .75 + 20 * .75 * .25 + 40 * .25 * .75 + 50 * .25 * .25)) < 1e-9)
    // outside / last-row guard → 0; negative lon wraps to +360
    assert(parsed.separation(-50.0, 170.5) === 0.0)
    assert(parsed.separation(-43.0, 171.5) === 0.0) // r0 = nrows-1 guard
    assert(parsed.separation(-44.5, 170.5 - 360.0) === parsed.separation(-44.5, 170.5))
  }

  test("R1 recolor: palette mapping, snow-bit masking, transparency preserved") {
    // pixels: value 0 (dBZ -32 → transparent), value 60 (28 dBZ → 4f78ff),
    // value 60|128 (snow bit, same dBZ), fully transparent input
    val px = new Array[Byte](4 * 4)
    def set(i: Int, v: Int, a: Int): Unit = {
      px(i * 4) = v.toByte; px(i * 4 + 3) = a.toByte
    }
    set(0, 0, 255); set(1, 60, 255); set(2, 60 | 128, 255); set(3, 99, 0)
    val out = Tiles.recolor(Tile(5, 1, 2, 2, 2, px)).pixels
    assert(out(3) === 0.toByte, "dBZ < 0 → transparent")
    val expected = (0x4f.toByte, 0x78.toByte, 0xff.toByte)
    assert((out(4), out(5), out(6)) === expected && out(7) === 255.toByte)
    assert((out(8), out(9), out(10)) === expected, "snow bit masked to same color")
    assert(out(15) === 0.toByte, "transparent input stays transparent")
  }

  test("R2 crop+upscale: quadrant pixels replicate by the scale factor") {
    // 4x4 tile with distinct red channel per pixel
    val px = new Array[Byte](4 * 4 * 4)
    for (i <- 0 until 16) { px(i * 4) = (i + 1).toByte; px(i * 4 + 3) = 255.toByte }
    val t = Tile(8, 3, 3, 4, 4, px)
    // bottom-right quadrant at scale 2 → source pixels 10,11,14,15 (0-based: (2,2)..(3,3))
    val out = Tiles.cropUpscale(t, 2, 1, 1).pixels
    def red(x: Int, y: Int): Int = out((y * 4 + x) * 4) & 0xff
    assert(red(0, 0) === 11 && red(1, 0) === 11 && red(2, 0) === 12 && red(3, 0) === 12)
    assert(red(0, 2) === 15 && red(3, 3) === 16)
  }

  test("R3 upscale doubles dimensions with nearest-neighbor semantics") {
    val px = Array[Byte](1, 0, 0, -1, 2, 0, 0, -1, 3, 0, 0, -1, 4, 0, 0, -1)
    val out = Tiles.upscale(Tile(0, 0, 0, 2, 2, px), 2)
    assert(out.width === 4 && out.height === 4)
    assert((out.pixels(0), out.pixels(4)) === ((1.toByte, 1.toByte)))
    assert(out.pixels((2 * 4 + 2) * 4) === 4.toByte) // bottom-right block
  }

  test("R4 reprojection: constant-elevation source + geoid = constant + separation") {
    // constant 100 m source tiles everywhere; flat 5 m geoid
    val (r, g, b) = Codecs.elevationToRgb(100.0)
    def constTile(z: Int, x: Int, y: Int): Tile = {
      val px = new Array[Byte](Tiles.TileSize * Tiles.TileSize * 4)
      var i = 0
      while (i < px.length) {
        px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte; px(i + 3) = 255.toByte
        i += 4
      }
      Tile(z, x, y, Tiles.TileSize, Tiles.TileSize, px)
    }
    val geoid = GeoidGrid(-90.0, 0.0, 1.0, 1.0, 180, 360,
      Array.fill(180 * 360)(5f))
    // a 4326 tile well inside NZ: z=6, lon ~172-175, lat ~-45..-42
    val z = 6; val x = 125; val y = 47
    assert(graft.geo.TileMath.tileOverlapsNZ(z, x, y))
    val sources = Reproject.coveringMercTiles(z, x, y)
      .map(k => (k.x, k.y) -> constTile(k.z, k.x, k.y)).toMap
    assert(sources.size >= 2, s"expected a multi-tile gather, got ${sources.size}")
    val out = Reproject.reprojectTile(z, x, y, sources, geoid)
    // every output pixel decodes to 100 + 5 within the 0.1 m quantization
    val samples = Seq((0, 0), (128, 128), (255, 255), (17, 203))
    samples.foreach { case (px0, py0) =>
      val i = (py0 * Tiles.TileSize + px0) * 4
      val e = Codecs.terrainRgbToElevation(out.pixels(i) & 0xff,
        out.pixels(i + 1) & 0xff, out.pixels(i + 2) & 0xff)
      assert(math.abs(e - 105.0) <= 0.05 + 1e-9, s"pixel ($px0,$py0) -> $e")
    }
  }

  test("K3: PNG encode/decode round-trips every channel including alpha") {
    val px = new Array[Byte](8 * 8 * 4)
    for (i <- 0 until 64) {
      px(i * 4) = (i * 3).toByte; px(i * 4 + 1) = (255 - i).toByte
      px(i * 4 + 2) = (i * 7 % 256).toByte
      px(i * 4 + 3) = (if (i % 5 == 0) 0 else 255).toByte
    }
    val t = Tile(3, 1, 2, 8, 8, px)
    val back = Png.decode(3, 1, 2, Png.encode(t))
    assert(back.width === 8 && back.height === 8)
    // PNG is lossless; TYPE_INT_ARGB premultiplies nothing — exact bytes,
    // except channels under alpha=0 which PNG encoders may zero
    for (i <- 0 until 64) {
      val a = px(i * 4 + 3)
      assert(back.pixels(i * 4 + 3) === a, s"alpha at $i")
      if (a != 0) {
        assert(back.pixels(i * 4) === px(i * 4), s"r at $i")
        assert(back.pixels(i * 4 + 1) === px(i * 4 + 1), s"g at $i")
        assert(back.pixels(i * 4 + 2) === px(i * 4 + 2), s"b at $i")
      }
    }
    // sea-level tile encodes to a valid PNG with the right magic
    val pngBytes = Png.encode(Tiles.seaLevelTile(0, 0, 0, 16))
    assert(pngBytes.take(8).toSeq === Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
  }

  test("R4 dataset pipeline: gather + pure map + sea-level prune (distributed form)") {
    import spark.implicits._
    val z = 6; val x = 125; val y = 47 // NZ tile
    val sea = Reproject.TileKey(6, 10, 10) // far from NZ → pruned to sea level
    val (r, g, b) = Codecs.elevationToRgb(250.0)
    val srcTiles = Reproject.coveringMercTiles(z, x, y).map { k =>
      val px = new Array[Byte](Tiles.TileSize * Tiles.TileSize * 4)
      var i = 0
      while (i < px.length) {
        px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte; px(i + 3) = 255.toByte
        i += 4
      }
      Tile(k.z, k.x, k.y, Tiles.TileSize, Tiles.TileSize, px)
    }
    val geoid = spark.sparkContext.broadcast(
      GeoidGrid(-90.0, 0.0, 1.0, 1.0, 180, 360, Array.fill(180 * 360)(2f)))
    val out = Reproject.reprojectDataset(
      Seq(Reproject.TileKey(z, x, y), sea).toDS(), srcTiles.toDS(), geoid)
      .collect().map(t => (t.z, t.x, t.y) -> t).toMap
    assert(out.size === 2)
    val nzTile = out((z, x, y))
    val e = Codecs.terrainRgbToElevation(nzTile.pixels(0) & 0xff,
      nzTile.pixels(1) & 0xff, nzTile.pixels(2) & 0xff)
    assert(math.abs(e - 252.0) <= 0.05 + 1e-9)
    val seaTile = out((sea.z, sea.x, sea.y))
    val se = Codecs.terrainRgbToElevation(seaTile.pixels(0) & 0xff,
      seaTile.pixels(1) & 0xff, seaTile.pixels(2) & 0xff)
    assert(se === 0.0)
  }
}
