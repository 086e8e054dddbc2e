package graft.sinks

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** K4 made concrete: the MBTiles JDBC sink
  * (`scripts/download_nationalmap/create_nationalmap_mbtiles.py:92-106`
  * schema + unique `tile_index`, `:103-106` `tile_exists` resume skip,
  * `:186-198` batched commit + IntegrityError duplicate swallow,
  * `:173-176` XYZ→TMS row flip before insert).
  *
  * Spark-first shape:
  *  - resume = one distributed LEFT ANTI join of the incoming tile frame
  *    against the sink's `(zoom_level, tile_column, tile_row)` keys, read
  *    back through Spark's JDBC source (column-pruned to the key triple) —
  *    the relational form of the reference's per-tile `tile_exists` loop;
  *  - write = `foreachPartition` with one connection per partition, a
  *    prepared INSERT batched N-at-a-time with a commit per batch (the
  *    reference commits every 10 downloads), and a row-by-row replay that
  *    swallows unique-index violations if a batch trips the index — the
  *    same backstop the reference's `except sqlite3.IntegrityError` gives;
  *  - the DB's unique index stays the source of truth, so concurrent
  *    partitions (or a crash between anti-join and insert) can never
  *    produce duplicate tiles.
  *
  * Tested against embedded Derby (the JDBC engine on the provided
  * classpath); the SQL used is deliberately vanilla so a SQLite/MBTiles
  * JDBC URL works unchanged.
  */
object MbtilesSink {

  /** MBTiles stores rows bottom-up (TMS); web-XYZ counts top-down. The
    * reference flips with `tms_y = (2**zoom - 1) - y`; the long cast keeps
    * the COLUMN exact through zoom 52 (pow doubles are exact to 2^53).
    * End-to-end the sink's MBTiles schema stores INTEGER keys, so
    * [[appendNew]] enforces zoom ≤ 30 (fail-loud) rather than letting the
    * int cast wrap.
    */
  def xyzToTms(zoom: Column, y: Column): Column =
    (pow(lit(2.0), zoom.cast("double")) - 1).cast("long") - y.cast("long")

  val KeyCols = Seq("zoom_level", "tile_column", "tile_row")

  /** True only for UNIQUE violations (the duplicate-tile race this sink
    * swallows): the typed subclass or SQLState 23505, checked across the
    * chained-exception list because batch drivers wrap the violation in a
    * `BatchUpdateException`. Deliberately NOT the whole SQLState class 23 —
    * a NOT NULL (23502) or FK (23503) failure is a real data error that
    * must propagate into task failure, not be dropped as "duplicate".
    */
  private[sinks] def isDuplicate(e: SQLException): Boolean = {
    import scala.jdk.CollectionConverters._
    // unique-violation states: 23505 is SQL-standard, 23000 is the XOPEN
    // class code MySQL-family drivers report for ER_DUP_ENTRY
    def dupState(s: String): Boolean = s == "23505" || s == "23000"
    // sqlite-jdbc throws a PLAIN SQLException (often null SQLState); its
    // unique violation is identifiable only by the result-code message
    def dupMessage(sq: SQLException): Boolean =
      Option(sq.getMessage).exists(m =>
        m.contains("SQLITE_CONSTRAINT_UNIQUE") || m.contains("UNIQUE constraint failed"))
    e.iterator().asScala.exists {
      // the typed subclass still spans class 23 (Derby raises it for NOT
      // NULL too), so the state must agree — null state gets the benefit
      // of the doubt only on the typed subclass
      case sq: java.sql.SQLIntegrityConstraintViolationException =>
        sq.getSQLState == null || dupState(sq.getSQLState)
      case sq: SQLException =>
        Option(sq.getSQLState).exists(dupState) || dupMessage(sq)
      case _ => false
    }
  }

  /** Creates `metadata` + `tiles` + the unique tile index when the target
    * DB does not have them yet, inserting the metadata rows on first
    * creation only (the reference's `if not resuming` block). Returns true
    * when this call created the schema — i.e. a fresh, non-resume run.
    */
  def ensureSchema(url: String, metadata: Seq[(String, String)]): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val tables = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var exists = false
      while (tables.next())
        if (tables.getString("TABLE_NAME").equalsIgnoreCase("tiles")) exists = true
      if (!exists) {
        val st = conn.createStatement()
        st.executeUpdate(
          "CREATE TABLE metadata (name VARCHAR(255), value VARCHAR(1024))")
        st.executeUpdate(
          "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, " +
            "tile_row INTEGER, tile_data BLOB)")
        st.executeUpdate(
          "CREATE UNIQUE INDEX tile_index ON tiles (zoom_level, tile_column, tile_row)")
        val ps = conn.prepareStatement("INSERT INTO metadata VALUES (?, ?)")
        metadata.foreach { case (k, v) =>
          ps.setString(1, k); ps.setString(2, v); ps.executeUpdate()
        }
        ps.close(); st.close()
      }
      !exists
    } finally conn.close()
  }

  /** Append tiles not already in the DB. `df` must carry the four MBTiles
    * columns (`tile_row` already TMS — apply [[xyzToTms]] upstream if the
    * pipeline is XYZ). Returns rows actually inserted — 0 on a pure re-run —
    * as a BEST-EFFORT count: if a task fails after committing some batches,
    * Spark discards that attempt's accumulator updates and the retry
    * swallows the already-committed rows as duplicates, undercounting. The
    * DB is still exactly right (the unique index is the source of truth);
    * callers needing an exact count should diff [[tileCount]] around the
    * write.
    */
  def appendNew(
      df: DataFrame,
      url: String,
      metadata: Seq[(String, String)] = Seq("format" -> "png"),
      batchSize: Int = 10): Long = {
    val spark = df.sparkSession
    val fresh = ensureSchema(url, metadata)
    // MBTiles stores the key triple as INTEGER; zoom > 30 would silently
    // wrap tile_row through the int cast, so fail loud instead (no real
    // tileset exceeds z=22)
    val incoming =
      df.select(
        when(col("zoom_level") <= 30, col("zoom_level").cast("int"))
          .otherwise(raise_error(concat(lit("MBTiles zoom out of range: "),
            col("zoom_level")))).as("zoom_level"),
        col("tile_column").cast("int"),
        col("tile_row").cast("int"), col("tile_data"))
    val toWrite =
      if (fresh) incoming
      else {
        val existing = spark.read.format("jdbc")
          .option("url", url).option("dbtable", "tiles").load()
          .select(KeyCols.map(col): _*)
        incoming.join(existing, KeyCols, "left_anti")
      }
    val written = spark.sparkContext.longAccumulator("mbtiles_tiles_written")
    toWrite.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement("INSERT INTO tiles VALUES (?, ?, ?, ?)")
          val pending = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          def flush(): Unit = if (pending.nonEmpty) {
            pending.foreach { r =>
              ps.setInt(1, r.getInt(0)); ps.setInt(2, r.getInt(1))
              ps.setInt(3, r.getInt(2)); ps.setBytes(4, r.getAs[Array[Byte]](3))
              ps.addBatch()
            }
            try {
              ps.executeBatch()
              written.add(pending.size)
            } catch {
              case e: SQLException if isDuplicate(e) =>
                // a tile slipped in between the anti-join and this insert —
                // replay one-by-one, letting the unique index drop the dups.
                // ONLY unique-index violations are swallowed (the
                // reference's `except sqlite3.IntegrityError`); any other
                // SQLException (dead connection, disk full, type mismatch)
                // propagates so Spark's task failure/retry kicks in instead
                // of silently dropping the partition's remaining tiles
                conn.rollback()
                ps.clearBatch()
                pending.foreach { r =>
                  try {
                    ps.setInt(1, r.getInt(0)); ps.setInt(2, r.getInt(1))
                    ps.setInt(3, r.getInt(2)); ps.setBytes(4, r.getAs[Array[Byte]](3))
                    ps.executeUpdate()
                    written.add(1)
                  } catch {
                    case e2: SQLException if isDuplicate(e2) => () // duplicate tile
                  }
                }
            }
            conn.commit() // the reference's commit-every-N
            pending.clear()
          }
          rows.foreach { r => pending += r; if (pending.size >= batchSize) flush() }
          flush()
          ps.close()
        } finally conn.close()
      }
    }
    written.value
  }

  /** Point lookup used by specs and by callers that want the reference's
    * literal `tile_exists` check.
    */
  def tileCount(url: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM tiles")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }
}
