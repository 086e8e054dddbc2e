package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.raster.{Codecs, Tile, Tiles}

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
  * compute.
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
      s"""WITH p AS (
          SELECT event_id // 64 AS tile_id,
            (${Synthetic.kSql} + (event_id % 2) * 128) AS v,
            CASE WHEN ${Synthetic.kSql} % 11 = 0 THEN 0 ELSE 255 END AS a,
            row_number() OVER (PARTITION BY event_id // 64 ORDER BY event_id) - 1 AS pos
          FROM events),
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
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          lower(substring(hex(col("payload")), 1, 16)).as("head_hex"),
          (length(col("payload")) % 512).as("fake_width"),
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

  val all: Seq[GraftQuery] = Seq(q46, q47)
}
