package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.geo.TileMath
import graft.raster.{Codecs, GeoidGrid, Reproject, Tile, Tiles}

/** Raster-pipeline queries (SURVEY §2.9).
  *
  * q46 drives the REAL typed `Dataset[Tile]` operators (R1 recolor → R2
  * crop+upscale) and reduces each output tile to channel checksums; the
  * DuckDB oracle computes the same sums relationally (per-pixel palette
  * case ladder over the quadrant × the upscale replication factor) — a
  * per-pixel-sum check of the whole typed pipeline.
  *
  * q47 is the multimodal-column surface: media as opaque binary + typed
  * metadata, with deterministic byte-level features both engines can
  * compute. q71 puts the typed 1→N frame-sampling operator under the same
  * oracle gate via hex-space byte slicing.
  */
object RasterQueries {

  private val Side = 8 // pixels per tile edge; 64 events = one tile
  private val PixelsPerTile = Side * Side

  val q46 = GraftQuery(
    "q46_tile_recolor_checksum", "R1 R2 R3 R5 C17 C27",
    (s, d) => {
      import s.implicits._
      val byTile = Window.partitionBy(col("tile_id")).orderBy(col("event_id"))
      val px = Tables.events(s, d)
        .withColumn("k", Synthetic.k)
        .withColumn("tile_id", expr("event_id div 64"))
        .withColumn("pos", row_number().over(byTile) - 1)
        // COMPLETE tiles only: the corpus tail yields a partial tile whose
        // pixels may all fall outside its crop quadrant — the relational
        // oracle's GROUP BY then has no rows for it while mapGroups would
        // still emit one. A real tile pipeline never renders partial
        // tiles either; sf0.1's 32-pixel tail tile exposed the mismatch.
        .withColumn("tile_n",
          count(lit(1)).over(Window.partitionBy(col("tile_id"))))
        .filter(col("tile_n") === PixelsPerTile)
        .withColumn("v", (col("k") + (col("event_id") % 2).cast("int") * 128))
        .withColumn("a", when(col("k") % 11 === 0, 0).otherwise(255))
        .select(col("tile_id"), col("pos"), col("v"), col("a"))
        .as[(Long, Int, Int, Int)]
      val sums = px.groupByKey(_._1).mapGroups { (tid, rows) =>
        val arr = new Array[Byte](PixelsPerTile * 4)
        rows.foreach { case (_, pos, v, a) =>
          arr(pos * 4) = v.toByte
          arr(pos * 4 + 3) = a.toByte
        }
        val tile = Tile(0, (tid % 2).toInt, ((tid / 2) % 2).toInt, Side, Side, arr)
        val out = Tiles.cropUpscale(Tiles.recolor(tile), 2, tile.x, tile.y)
        var (sr, sg, sb, n) = (0L, 0L, 0L, 0L)
        var i = 0
        while (i < out.pixels.length) {
          sr += out.pixels(i) & 0xff
          sg += out.pixels(i + 1) & 0xff
          sb += out.pixels(i + 2) & 0xff
          if ((out.pixels(i + 3) & 0xff) != 0) n += 1
          i += 4
        }
        (tid, sr, sg, sb, n)
      }
      sums.toDF("tile_id", "sum_r", "sum_g", "sum_b", "n_opaque")
        .orderBy(col("tile_id"))
    },
    Some {
      val color = Codecs.dbzColorSql("((v & 127) - 32)")
      def chan(idx: Int): String = {
        val whens = (Codecs.DbzPalette.map(_._2) :+ Codecs.DbzTop).map { h =>
          s"WHEN color = '$h' THEN ${Integer.parseInt(h.substring(idx * 2, idx * 2 + 2), 16)}"
        }
        s"(CASE ${whens.mkString(" ")} ELSE 0 END)"
      }
      s"""WITH p0 AS (
          SELECT event_id // 64 AS tile_id,
            (${Synthetic.kSql} + (event_id % 2) * 128) AS v,
            CASE WHEN ${Synthetic.kSql} % 11 = 0 THEN 0 ELSE 255 END AS a,
            row_number() OVER (PARTITION BY event_id // 64 ORDER BY event_id) - 1 AS pos,
            COUNT(*) OVER (PARTITION BY event_id // 64) AS tile_n
          FROM events),
        p AS (SELECT * FROM p0 WHERE tile_n = $PixelsPerTile),
        q AS (SELECT tile_id, v, a, pos % $Side AS px, pos // $Side AS py,
            tile_id % 2 AS sx, (tile_id // 2) % 2 AS sy FROM p),
        sel AS (SELECT * FROM q
          WHERE px >= sx * ${Side / 2} AND px < sx * ${Side / 2} + ${Side / 2}
            AND py >= sy * ${Side / 2} AND py < sy * ${Side / 2} + ${Side / 2}),
        c AS (SELECT tile_id,
            CASE WHEN a = 0 THEN 'transparent' ELSE $color END AS color FROM sel)
        SELECT tile_id,
          CAST(4 * SUM(${chan(0)}) AS BIGINT) AS sum_r,
          CAST(4 * SUM(${chan(1)}) AS BIGINT) AS sum_g,
          CAST(4 * SUM(${chan(2)}) AS BIGINT) AS sum_b,
          CAST(4 * SUM(CASE WHEN color = 'transparent' THEN 0 ELSE 1 END) AS BIGINT) AS n_opaque
        FROM c GROUP BY tile_id ORDER BY tile_id"""
    })

  /** Multimodal binary columns: payload = UTF-8 bytes of the document text
    * (the deterministic stand-in for real media), features = byte-level
    * metadata both engines compute identically.
    */
  val q47 = GraftQuery(
    "q47_multimodal_binary", "S11 P4",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          lower(substring(hex(col("payload")), 1, 16)).as("head_hex"),
          (length(col("payload")) % 512).cast("long").as("fake_width"),
          (expr("length(payload) div 512") + 1).as("fake_height"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS payload_md5,
        lower(substring(hex(encode(text)), 1, 16)) AS head_hex,
        octet_length(encode(text)) % 512 AS fake_width,
        octet_length(encode(text)) // 512 + 1 AS fake_height,
        ascii(substring(text, 1, 1)) AS first_byte
      FROM documents ORDER BY doc_id"""))

  /** Multimodal frame sampling (L12) under the oracle gate: the REAL typed
    * operator ([[graft.raster.Multimodal.sampleFrames]] — the 1→N flatMap
    * expansion, batched per partition, StubFrameSampler's fixed-size-frame
    * model) runs over document bytes as the media stand-in; the oracle
    * re-derives every frame relationally — per-doc frame count from the
    * byte length, every-2nd-frame stride, and frame CONTENT via hex-space
    * byte slicing (DuckDB cannot slice BLOBs, so both engines emit the
    * frame as a hex string: Spark `hex(payload)` of the byte slice, DuckDB
    * `substring(hex(encode(text)))` — 2 hex chars per byte).
    */
  val q71 = {
    import graft.raster.Multimodal
    val fb = Multimodal.StubFrameSampler.FrameBytes // 64 bytes / frame
    val fm = Multimodal.StubFrameSampler.FrameMs // 40 ms / frame
    val everyMs = 2 * fm // sample every 2nd frame
    // derive the frame-index stride ONCE and interpolate it into BOTH
    // sides — a hardcoded oracle stride would silently break parity if the
    // sampling interval changed on the Scala side
    val step = everyMs / fm
    GraftQuery(
      "q71_frame_sample", "L12",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), lit("video/mp4").as("mime"),
            col("text").cast("binary").as("payload"))
          .as[Multimodal.MediaRow]
        Multimodal.sampleFrames(media, everyMs = everyMs, Multimodal.StubFrameSampler)
          .toDF()
          .select(col("media_id").as("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"), col("t_ms"),
            lower(hex(col("payload"))).as("frame_hex"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some(s"""WITH f AS (SELECT doc_id, encode(text) AS b,
              octet_length(encode(text)) // $fb AS nf FROM documents),
          idx AS (SELECT doc_id, b, UNNEST(range(0, nf, $step)) AS fi FROM f)
        SELECT doc_id, fi AS frame_idx, fi * $fm AS t_ms,
          lower(substring(hex(b), CAST(fi * ${2 * fb} + 1 AS INT), ${2 * fb})) AS frame_hex
        FROM idx ORDER BY doc_id, frame_idx"""))
  }

  /** R4 under the oracle gate: the FULL reprojection gather
    * (`Reproject.reprojectDataset` — fan-out to covering Mercator tiles,
    * shuffle keyed by output tile, broadcast geoid, per-pixel gather loop)
    * reduced to per-tile channel checksums; the DuckDB oracle recomputes
    * every output pixel relationally (bounds → Mercator floor sample →
    * Terrain-RGB decode → bilinear geoid → re-encode).
    *
    * Requests are data-derived (the distinct z=6 EPSG:4326 tiles containing
    * each event's lat/lon); source pixels and geoid values are closed-form
    * functions of (tile, index) so both engines synthesize them
    * independently. Every 5th source tile is withheld to exercise the
    * missing-source branch (elevation 0, NO geoid — the reference only adds
    * the geoid inside `if (src)`).
    */
  val q69 = {
    val Z = 6
    val Mz = Reproject.mercZoomFor(Z) // 7
    // static covering rectangle of the whole NZ box at z=6 → mz=7 (shared
    // constants; the data-derived requests sample a subset of it)
    val nzTiles = for {
      x <- 123 to 127; y <- 44 to 49
      if TileMath.tileOverlapsNZ(Z, x, y)
    } yield (x, y)
    val cover = nzTiles.flatMap { case (x, y) => Reproject.coveringMercTiles(Z, x, y) }
    val (sx0, sx1) = (cover.map(_.x).min, cover.map(_.x).max)
    val (sy0, sy1) = (cover.map(_.y).min, cover.map(_.y).max)

    GraftQuery(
      "q69_reproject_checksum", "R4 C16 C18",
      (s, d) => {
        import s.implicits._
        val requests = Synthetic.withGeo(Tables.events(s, d))
          .select(
            floor((col("lon") + 180) / 360 * (2 * (1 << Z))).cast("int").as("x"),
            floor((lit(90) - col("lat")) / 180 * (1 << Z)).cast("int").as("y"))
          .distinct()
          .select(lit(Z).as("z"), col("x"), col("y"))
          .as[Reproject.TileKey]
        val srcKeys = for {
          sx <- sx0 to sx1; sy <- sy0 to sy1
          if (sx + sy) % 5 != 0 // withheld tiles → missing-source branch
        } yield (sx, sy)
        val sources = s.createDataset(srcKeys).repartition(8).map { case (sx, sy) =>
          val px = Array.tabulate(256 * 256 * 4)(i => ((sx * 31 + sy * 17 + i) % 256).toByte)
          Tile(Mz, sx, sy, 256, 256, px)
        }
        val geoid = GeoidGrid(-90.0, 0.0, 1.0, 1.0, 181, 361,
          Array.tabulate(181 * 361)(i => ((i / 361 * 7 + i % 361 * 13) % 50).toFloat))
        Reproject.reprojectDataset(requests, sources, s.sparkContext.broadcast(geoid))
          .map { t =>
            var sr = 0L; var sg = 0L; var sb = 0L; var i = 0
            while (i < t.pixels.length) {
              sr += t.pixels(i) & 0xff; sg += t.pixels(i + 1) & 0xff
              sb += t.pixels(i + 2) & 0xff
              i += 4
            }
            (t.z, t.x, t.y, sr, sg, sb)
          }
          .toDF("z", "x", "y", "sum_r", "sum_g", "sum_b")
          .orderBy(col("x"), col("y"))
      },
      Some {
        val numX = 2 * (1 << Z); val numY = 1 << Z
        // item pixel channels: closed-form function of (source tile, index)
        def chan(off: Int) = s"((sx * 31 + sy * 17 + idx + $off) % 256)"
        val decode = Codecs.elevationDecodeSql(chan(0), chan(1), chan(2))
        s"""WITH req AS (
            SELECT DISTINCT CAST(floor((lon + 180) / 360 * $numX) AS INT) AS x,
                            CAST(floor((90 - lat) / 180 * $numY) AS INT) AS y
            FROM (SELECT ${Synthetic.latSql} AS lat, ${Synthetic.lonSql} AS lon FROM events)),
          px AS (SELECT x, y, CAST(p % 256 AS INT) AS opx, CAST(p // 256 AS INT) AS opy
            FROM req CROSS JOIN range(0, 65536) t(p)),
          ll AS (SELECT *,
              (x / ${numX.toDouble}e0 * 360 - 180)
                + ((opx + 0.5e0) / 256) * (((x + 1) / ${numX.toDouble}e0 * 360 - 180)
                  - (x / ${numX.toDouble}e0 * 360 - 180)) AS lon,
              (90 - y / ${numY.toDouble}e0 * 180)
                - ((opy + 0.5e0) / 256) * ((90 - y / ${numY.toDouble}e0 * 180)
                  - (90 - (y + 1) / ${numY.toDouble}e0 * 180)) AS lat
            FROM px),
          m AS (SELECT *, ${TileMath.mercatorXSql("lon", Mz)} AS mx,
              ${TileMath.mercatorYSql("lat", Mz)} AS my FROM ll),
          st AS (SELECT *, CAST(floor(mx / 256) AS INT) AS sx,
              CAST(floor(my / 256) AS INT) AS sy FROM m),
          sm AS (SELECT *,
              greatest(0, least(255, CAST(floor(mx - sx * 256.0e0) AS INT))) AS lx,
              greatest(0, least(255, CAST(floor(my - sy * 256.0e0) AS INT))) AS ly,
              (sx BETWEEN $sx0 AND $sx1 AND sy BETWEEN $sy0 AND $sy1
                AND (sx + sy) % 5 <> 0) AS avail
            FROM st),
          iv AS (SELECT *, (ly * 256 + lx) * 4 AS idx,
              floor(lat - (-90.0e0)) AS r0d, floor(CASE WHEN lon < 0 THEN lon + 360 ELSE lon END) AS c0d,
              (lat - (-90.0e0)) AS grow,
              (CASE WHEN lon < 0 THEN lon + 360 ELSE lon END - 0.0e0) AS gcol
            FROM sm),
          gg AS (SELECT *, CAST(r0d AS INT) AS r0, CAST(c0d AS INT) AS c0,
              grow - r0d AS fr, gcol - c0d AS fc FROM iv),
          sep AS (SELECT *,
              CAST((r0 * 7 + c0 * 13) % 50 AS DOUBLE) * (1 - fr) * (1 - fc)
                + CAST((r0 * 7 + (c0 + 1) * 13) % 50 AS DOUBLE) * (1 - fr) * fc
                + CAST(((r0 + 1) * 7 + c0 * 13) % 50 AS DOUBLE) * fr * (1 - fc)
                + CAST(((r0 + 1) * 7 + (c0 + 1) * 13) % 50 AS DOUBLE) * fr * fc AS g_sep
            FROM gg),
          ev AS (SELECT x, y,
              CASE WHEN avail THEN ($decode) + g_sep ELSE 0.0e0 END AS elev
            FROM sep),
          enc AS (SELECT x, y, ${Codecs.elevationEncodedSql("elev")} AS e FROM ev)
          SELECT $Z AS z, x, y,
            CAST(SUM((e >> 16) & 255) AS BIGINT) AS sum_r,
            CAST(SUM((e >> 8) & 255) AS BIGINT) AS sum_g,
            CAST(SUM(e & 255) AS BIGINT) AS sum_b
          FROM enc GROUP BY x, y ORDER BY x, y"""
      })
  }

  /** K3 oracle-gated end-to-end (VERDICT r12 #6): the PNG codec inside a
    * driver-checked query. Each complete tile is recolored (R1), encoded
    * to REAL PNG bytes (ImageIO), decoded back, and reduced to channel
    * checksums over the DECODED pixels — so a lossy or corrupting codec
    * diverges the sums from the oracle, which computes the recolored
    * pixel math relationally (q46's palette ladder, minus the crop
    * stage). PNG bytes are not canonical across encoders, so the BYTES
    * are asserted engine-side only: `roundtrip_ok` ANDs the PNG magic
    * with byte-exact pixel equality through the round trip, and the
    * oracle pins it TRUE — lossless-codec-or-red, per tile, in the gate.
    * (Recolored pixels are (0,0,0,0) or opaque palette colors, so no
    * encoder alpha-premultiplication ambiguity exists to launder loss.)
    */
  val q136 = GraftQuery(
    "q136_png_roundtrip", "K3 R1 C17",
    (s, d) => {
      import s.implicits._
      // r19 optimization (guide §2.4): the old form derived `pos` with a
      // row_number window and completeness (`tile_n == 64`) with a second
      // window over the same key — an Exchange(tile_id) + sort paid
      // BEFORE the typed groupByKey repeated its own shuffle on the
      // opaque key. For a COMPLETE tile both are pure arithmetic:
      // event_id is unique, tile_id = event_id div 64, so a tile with 64
      // rows holds exactly the 64 consecutive ids and
      // pos == event_id % 64; an incomplete tile is dropped by the group
      // itself (flatMapGroups emits nothing under 64 rows — the same
      // rows the tile_n filter removed). One shuffle total, no windows.
      val px = Tables.events(s, d)
        .withColumn("k", Synthetic.k)
        .withColumn("tile_id", expr("event_id div 64"))
        .withColumn("pos", (col("event_id") % 64).cast("int"))
        .withColumn("v", (col("k") + (col("event_id") % 2).cast("int") * 128))
        .withColumn("a", when(col("k") % 11 === 0, 0).otherwise(255))
        .select(col("tile_id"), col("pos"), col("v"), col("a"))
        .as[(Long, Int, Int, Int)]
      val sums = px.groupByKey(_._1).flatMapGroups { (tid, rows) =>
        val arr = new Array[Byte](PixelsPerTile * 4)
        var nRows = 0
        rows.foreach { case (_, pos, v, a) =>
          arr(pos * 4) = v.toByte
          arr(pos * 4 + 3) = a.toByte
          nRows += 1
        }
        if (nRows != PixelsPerTile) Iterator.empty
        else {
          val tile = Tile(0, (tid % 2).toInt, ((tid / 2) % 2).toInt, Side, Side, arr)
          val rec = Tiles.recolor(tile)
          val bytes = graft.raster.Png.encode(rec)
          val back = graft.raster.Png.decode(rec.z, rec.x, rec.y, bytes)
          var (sr, sg, sb, n) = (0L, 0L, 0L, 0L)
          var i = 0
          while (i < back.pixels.length) {
            sr += back.pixels(i) & 0xff
            sg += back.pixels(i + 1) & 0xff
            sb += back.pixels(i + 2) & 0xff
            if ((back.pixels(i + 3) & 0xff) != 0) n += 1
            i += 4
          }
          val ok = bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
            bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte &&
            bytes(3) == 'G'.toByte &&
            java.util.Arrays.equals(back.pixels, rec.pixels)
          Iterator.single((tid, sr, sg, sb, n, ok))
        }
      }
      sums
        .toDF("tile_id", "sum_r", "sum_g", "sum_b", "n_opaque", "roundtrip_ok")
        .orderBy(col("tile_id"))
    },
    Some {
      val color = Codecs.dbzColorSql("((v & 127) - 32)")
      def chan(idx: Int): String = {
        val whens = (Codecs.DbzPalette.map(_._2) :+ Codecs.DbzTop).map { h =>
          s"WHEN color = '$h' THEN ${Integer.parseInt(h.substring(idx * 2, idx * 2 + 2), 16)}"
        }
        s"(CASE ${whens.mkString(" ")} ELSE 0 END)"
      }
      s"""WITH p0 AS (
          SELECT event_id // 64 AS tile_id,
            (${Synthetic.kSql} + (event_id % 2) * 128) AS v,
            CASE WHEN ${Synthetic.kSql} % 11 = 0 THEN 0 ELSE 255 END AS a,
            COUNT(*) OVER (PARTITION BY event_id // 64) AS tile_n
          FROM events),
        p AS (SELECT * FROM p0 WHERE tile_n = $PixelsPerTile),
        c AS (SELECT tile_id,
            CASE WHEN a = 0 THEN 'transparent' ELSE $color END AS color FROM p)
        SELECT tile_id,
          CAST(SUM(${chan(0)}) AS BIGINT) AS sum_r,
          CAST(SUM(${chan(1)}) AS BIGINT) AS sum_g,
          CAST(SUM(${chan(2)}) AS BIGINT) AS sum_b,
          CAST(SUM(CASE WHEN color = 'transparent' THEN 0 ELSE 1 END) AS BIGINT) AS n_opaque,
          TRUE AS roundtrip_ok
        FROM c GROUP BY tile_id ORDER BY tile_id"""
    })

  val all: Seq[GraftQuery] = Seq(q46, q47, q69, q71, q136)
}
