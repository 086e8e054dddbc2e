package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The jsonais canonicalizer's two implementations — declarative Column
  * dispatch and the typed fast path — must agree row-for-row, including on
  * adversarial inputs (empty msgs, invalid MMSIs, garbage, truncation).
  */
class JsonaisSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    // dialect 0: msgs[], first element invalid → second wins
    """{"msgs":[{"mmsi":"7","lat":"-41.1","lon":"174.1"},{"mmsi":"512000001","lat":"-41.2","lon":"174.2","rxtime":"20240101000000","course":"12.5","speed":"7"}]}""",
    // empty msgs = early null even though a top-level mmsi follows
    """{"msgs":[],"mmsi":"512000002","lat":"-41","lon":"174"}""",
    // minimal
    """{"mmsi":"512000003","lat":"-42.5","lon":"173.5","rxtime":"20240102030405"}""",
    // groups
    """{"groups":[{"msgs":[{"mmsi":"512000004","lat":"-43.0","lon":"172.0","rxtime":"20240103000000"}]}]}""",
    // APRS
    """{"call":"512000005","lat":"-44.0","lng":"171.0","time":"2024-01-04T05:06:07Z","course":"90"}""",
    // direct with uppercase MMSI + coord sanity pass
    """{"MMSI":"512000006","latitude":"-45.0","longitude":"170.0","rxtime":"20240105000000"}""",
    // direct failing coord sanity → null
    """{"mmsi":"512000007","latitude":"-95.0","longitude":"170.0"}""",
    // truncated AIS-catcher → regex salvage
    """{"protocol":"jsonaiscatcher","msgs":[{"mmsi":"512000008","lat":"-46.0","lon":"169.0","rxtime":"20240106000000"}],"setting":"N/A""",
    // garbage → null
    """not json at all""",
    // unknown keys only → null
    """{"foo": 1, "bar": {"baz": 2}}""",
    // invalid mmsi everywhere → null
    """{"mmsi":"5","lat":"-41.0","lon":"174.0"}""")

  private lazy val df = payloads.zipWithIndex
    .map { case (p, i) => (i.toLong, p) }.toDF("event_id", "payload")

  test("typed fast path == Column dispatch on every dialect and edge case") {
    val viaColumn = Jsonais.canonicalizeDf(df, col("payload"), "canon")
      .filter(col("canon").isNotNull)
      .select(col("event_id"), col("canon.mmsi"), col("canon.lat"), col("canon.lon"),
        col("canon.ts_sec"), col("canon.cog"), col("canon.sog"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val viaTyped = Jsonais.canonicalizeTyped(df, col("payload"), "event_id")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(viaTyped.length === viaColumn.length)
    viaTyped.zip(viaColumn).foreach { case (t, c) =>
      assert(t === c, s"typed=$t column=$c")
    }
    // expected survivors: dialects 0,2,3,4,5 and the salvage row
    val ids = viaTyped.map(_.head.asInstanceOf[Long]).toSet
    assert(ids === Set(0L, 2L, 3L, 4L, 5L, 7L))
  }

  test("canonical values recover exactly what was encoded") {
    val got = Jsonais.canonicalizeTyped(df, col("payload"), "event_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(1) === 512000001L, "first VALID msgs element wins")
    assert(got(0L).getDouble(2) === -41.2)
    assert(got(4L).getLong(4) === java.time.Instant.parse("2024-01-04T05:06:07Z").getEpochSecond)
    assert(got(5L).getLong(1) === 512000006L, "uppercase MMSI dialect")
    assert(got(7L).getLong(1) === 512000008L, "truncated document salvage")
  }
}
