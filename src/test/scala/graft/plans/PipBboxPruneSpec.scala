package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.geo.GeoFunctions

/** Native PIP expression + the bbox-prune optimizer rule: results match
  * the unrolled Column form, the rule injects range guards exactly once,
  * and the guards reach the parquet scan as pushed filters (which the
  * ray-cast itself never can).
  */
class PipBboxPruneSpec extends SparkSpec {
  import spark.implicits._

  private val ring = Seq( // L-shaped (concave) test ring
    (0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0))

  test("native expression agrees with the unrolled Column tree on a concave ring") {
    GraftExtensions.register(spark)
    val pts = (for (x <- -2 to 12; y <- -2 to 12) yield (x + 0.5, y + 0.5)).toDF("x", "y")
    val both = pts.select(col("x"), col("y"),
      GraftExtensions.pointInPolygon(col("x"), col("y"), ring).as("native"),
      GeoFunctions.pointInPolygonColumn(col("x"), col("y"), ring).as("unrolled"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(2) === r.getBoolean(3), s"(${r.getDouble(0)}, ${r.getDouble(1)})")
      assert(r.getBoolean(2) ===
        GeoFunctions.pointInPolygon(r.getDouble(0), r.getDouble(1), ring))
    }
  }

  test("rule injects the bbox guard exactly once (idempotent across passes)") {
    GraftExtensions.register(spark)
    // non-foldable source, or ConvertToLocalRelation evaluates the filter away
    val pts = spark.range(40)
      .select((col("id") - 20).cast("double").as("x"),
        (col("id") % 13).cast("double").as("y"))
    val df = pts.filter(GraftExtensions.pointInPolygon(col("x"), col("y"), ring))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_point_in_polygon"), optimized)
    // exactly one guard per bound and coordinate (x and y) — fixed-point
    // optimizer iteration must not stack duplicates
    assert(">= 0.0".r.findAllIn(optimized).length === 2, s"bbox guards:\n$optimized")
    assert("<= 10.0".r.findAllIn(optimized).length === 2, s"bbox guards:\n$optimized")
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (x, y) =>
      assert(GeoFunctions.pointInPolygon(x, y, ring), s"($x, $y)")
    }
    assert(got.nonEmpty)
  }

  test("bbox guards push down to the parquet scan") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("pip_parquet").toString + "/pts"
    (for (i <- 1 to 1000) yield (i * 0.05 - 10.0, i * 0.03 - 5.0)).toDF("lon", "lat")
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(GraftExtensions.pointInPolygon(col("lon"), col("lat"), ring))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: ["), physical)
    assert(physical.contains("GreaterThanOrEqual(lon,0.0)") ||
      physical.contains("GreaterThanOrEqual(lon, 0.0)"),
      s"bbox not pushed to parquet:\n$physical")
    // and the answer is still exact
    val got = scan.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (x, y) =>
      assert(GeoFunctions.pointInPolygon(x, y, ring), s"($x, $y)")
    }
    assert(got.nonEmpty)
  }
}
