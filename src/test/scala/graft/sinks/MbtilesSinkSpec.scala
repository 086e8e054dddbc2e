package graft.sinks

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K4 against a real JDBC database (embedded Derby): schema + unique tile
  * index creation, XYZ→TMS flip, batched-commit insert, and the resume
  * contract — a re-run writes zero duplicate tiles into the DB and an
  * overlapping batch writes only its new keys, with the unique index as the
  * backstop for rows racing past the anti-join.
  */
class MbtilesSinkSpec extends SparkSpec {

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("mbtiles").toString
    s"jdbc:derby:$dir/tiles.db;create=true"
  }

  private def tiles(zooms: Seq[(Int, Int, Int)]) = {
    import spark.implicits._
    zooms.toDF("zoom_level", "tile_column", "xyz_row")
      .withColumn("tile_row", MbtilesSink.xyzToTms(col("zoom_level"), col("xyz_row")))
      .withColumn("tile_data",
        concat(lit("png:"), col("zoom_level"), lit("/"), col("tile_column"),
          lit("/"), col("xyz_row")).cast("binary"))
      .drop("xyz_row")
  }

  test("xyzToTms matches the reference flip (2**z - 1) - y") {
    import spark.implicits._
    val flipped = Seq((0, 0), (2, 0), (2, 3), (15, 12345), (33, 7)).toDF("z", "y")
      .select(MbtilesSink.xyzToTms(col("z"), col("y"))).as[Long].collect().toSeq
    assert(flipped === Seq(0L, 3L, 0L, (1L << 15) - 1 - 12345,
      (1L << 33) - 1 - 7)) // > int range: the long cast must not wrap
  }

  test("only integrity violations count as duplicates; real errors propagate") {
    val dup = new java.sql.SQLIntegrityConstraintViolationException("dup", "23505")
    val wrapped = new java.sql.BatchUpdateException("batch failed", "HY000", 0,
      Array.empty[Int], null)
    wrapped.setNextException(dup)
    val dead = new java.sql.SQLException("connection closed", "08003")
    assert(MbtilesSink.isDuplicate(dup))
    assert(MbtilesSink.isDuplicate(new java.sql.SQLException("unique", "23505")))
    assert(MbtilesSink.isDuplicate(wrapped), "chained violations must be found")
    assert(!MbtilesSink.isDuplicate(dead), "a dead connection is not a duplicate")
    // class 23 but NOT a duplicate: a NOT NULL / FK failure is real data
    // loss if swallowed — must propagate
    assert(!MbtilesSink.isDuplicate(
      new java.sql.SQLIntegrityConstraintViolationException("null tile_data", "23502")))
    // MySQL-family drivers report the XOPEN class code 23000 for dup keys
    assert(MbtilesSink.isDuplicate(
      new java.sql.SQLIntegrityConstraintViolationException("dup entry", "23000")))
    // sqlite-jdbc throws a PLAIN SQLException with a null state — only the
    // result-code message identifies the unique violation
    assert(MbtilesSink.isDuplicate(new java.sql.SQLException(
      "[SQLITE_CONSTRAINT_UNIQUE] A UNIQUE constraint failed (UNIQUE constraint failed: tiles.zoom_level, tiles.tile_column, tiles.tile_row)")))
    assert(!MbtilesSink.isDuplicate(new java.sql.SQLException(
      "[SQLITE_BUSY] The database file is locked")))
  }

  test("zoom past 30 fails loud instead of wrapping through the int key") {
    val url = freshUrl()
    import spark.implicits._
    val bad = Seq((33, 0, 7)).toDF("zoom_level", "tile_column", "xyz_row")
      .withColumn("tile_row", MbtilesSink.xyzToTms(col("zoom_level"), col("xyz_row")))
      .withColumn("tile_data", lit("x").cast("binary"))
      .drop("xyz_row")
    val err = intercept[Exception] { MbtilesSink.appendNew(bad, url) }
    assert(err.getMessage != null)
  }

  test("re-run writes zero duplicate tiles; overlap writes only new keys") {
    val url = freshUrl()
    val grid = for (x <- 0 to 7; y <- 0 to 7) yield (3, x, y)
    val batch1 = tiles(grid.take(40))
    val overlap = tiles(grid.drop(20)) // 20 old + 24 new

    assert(MbtilesSink.appendNew(batch1, url) === 40L)
    assert(MbtilesSink.tileCount(url) === 40L)
    assert(MbtilesSink.appendNew(batch1, url) === 0L, "pure re-run must be a no-op")
    assert(MbtilesSink.appendNew(overlap, url) === 24L, "only the non-overlapping keys write")
    assert(MbtilesSink.tileCount(url) === 64L)

    // key uniqueness holds in the DB itself, not just in our accounting
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM (SELECT DISTINCT zoom_level, tile_column, tile_row FROM tiles) t")
      rs.next(); assert(rs.getLong(1) === 64L)
    } finally conn.close()
  }

  test("unique index backstop: raw duplicate insert is rejected by the DB") {
    val url = freshUrl()
    assert(MbtilesSink.appendNew(tiles(Seq((1, 0, 0))), url) === 1L)
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement("INSERT INTO tiles VALUES (?, ?, ?, ?)")
      ps.setInt(1, 1); ps.setInt(2, 0); ps.setInt(3, 1); ps.setBytes(4, Array[Byte](1))
      intercept[java.sql.SQLException](ps.executeUpdate())
    } finally conn.close()
    // and appendNew's row-level replay path swallows it instead of failing
    assert(MbtilesSink.appendNew(tiles(Seq((1, 0, 0), (1, 1, 0))), url) === 1L)
    assert(MbtilesSink.tileCount(url) === 2L)
  }

  test("metadata rows are written once, on first creation only") {
    val url = freshUrl()
    val meta = Seq("name" -> "graft-test", "format" -> "png", "minzoom" -> "0")
    MbtilesSink.appendNew(tiles(Seq((0, 0, 0))), url, metadata = meta)
    MbtilesSink.appendNew(tiles(Seq((1, 0, 0))), url, metadata = meta)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM metadata")
      rs.next(); assert(rs.getLong(1) === 3L, "resume must not re-insert metadata")
    } finally conn.close()
  }
}
