package graft.sinks

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions.col

/** K4/K6: idempotent, resumable keyed sink — the MBTiles pattern
  * (`scripts/download_nationalmap/create_nationalmap_mbtiles.py:92-106`
  * unique-index dedup + `tile_exists` skip, `:190-198` batched commit)
  * re-expressed Spark-first:
  *
  *  - resume = LEFT ANTI join of the incoming batch against the sink's
  *    existing keys (the relational form of `tile_exists` per row — one
  *    distributed join instead of n point lookups),
  *  - batch commit = the sink's natural append atomicity (one file per
  *    partition; a re-run after a crash re-reads existing keys and writes
  *    only the difference, exactly like the reference's resume).
  *
  * Scale: the anti-join shuffles on the sink key — the same partitioning
  * the write uses; for a key-ordered sink a broadcast of the key BOUNDS
  * would prune further, but correctness only needs the anti-join.
  */
object ResumableSink {

  /** Append only rows whose key is not already present; returns the number
    * of rows written (0 on a pure re-run — idempotent).
    */
  def appendNew(df: DataFrame, keys: Seq[String], path: String): Long = {
    val spark = df.sparkSession
    val existing =
      try Some(spark.read.parquet(path))
      catch { case _: AnalysisException => None } // first run: nothing to skip
    val fresh = existing match {
      case Some(e) =>
        df.join(e.select(keys.map(col): _*).distinct(), keys, "left_anti")
      case None => df
    }
    fresh.cache()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode("append").parquet(path)
      n
    } finally fresh.unpersist()
  }
}
