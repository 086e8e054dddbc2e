package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cache-lifetime contract (VERDICT r4 #4): a library user composing
  * registry queries must not accumulate cached relations silently. Builders
  * persist shared projections through [[CacheScope.tracked]]; callers wrap
  * build + materialization in [[CacheScope.scoped]], which releases them.
  */
class CacheScopeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // Spark 4's Dataset-typed lookup wants the classic Dataset subtype; the
  // (session, plan) overload is the stable way in from library code
  private def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
    spark.sharedState.cacheManager.lookupCachedData(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed).isDefined

  test("every registry query leaves the session cache empty after a scoped run (no external clear)") {
    spark.sharedState.cacheManager.clearCache()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached relations behind after its scope closed")
    }
  }

  test("tracked persists for the duration of the scope and releases on exit") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v").filter(col("v") > 1)
    CacheScope.scoped {
      CacheScope.tracked(df)
      df.write.format("noop").mode("overwrite").save()
      assert(isCached(df), "tracked frame must be cached while the scope is open")
    }
    assert(!isCached(df), "tracked frame must be released when the scope closes")
  }

  test("scopes nest: an inner scope releases only its own frames") {
    import spark.implicits._
    val outerDf = Seq(1).toDF("a")
    val innerDf = Seq(2).toDF("b")
    CacheScope.scoped {
      CacheScope.tracked(outerDf)
      CacheScope.scoped {
        CacheScope.tracked(innerDf)
        innerDf.write.format("noop").mode("overwrite").save()
      }
      assert(!isCached(innerDf), "inner frame released by inner scope")
      assert(isCached(outerDf), "outer frame survives the inner scope")
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("tracked outside any scope degrades to a plain persist (ad-hoc exploration)") {
    import spark.implicits._
    assert(!CacheScope.inScope)
    val df = Seq(9).toDF("z")
    CacheScope.tracked(df)
    assert(isCached(df))
    df.unpersist(blocking = false)
  }
}
