package graft.sources

import graft.SparkSpec

/** q237 (J8 oracle promotion, VERDICT r18 #6): the relational rate-limit
  * ledger accounting must agree, day for day, with the IMPERATIVE
  * `RestPatterns.rateLimitedLookup` loop run over the same fixture
  * request log — lookups, cache skips, and the 2 s queue spacing are the
  * same numbers whether computed by the loop or by the aggregate.
  */
class RestLedgerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("relational ledger accounting == imperative rateLimitedLookup replay") {
    val got = graft.SparkEntry.queries("q237_lookup_rate_ledger")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap

    // independent fixture replay in plain Scala (the engine loader only
    // normalizes ts to epoch nanos; the accounting below is independent)
    val events = graft.core.Tables.events(spark, dir)
      .selectExpr("event_id", "ts div 1000 AS tsu")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val requests = events
      .map { case (id, tsu) => (id % 311, tsu, tsu / 86400000000L) }
      .filter { case (vessel, _, _) => vessel % 3 == 0 }
    assert(requests.nonEmpty, "fixture yields requests")
    val byDay = requests.groupBy(_._3)
    assert(byDay.size > 1, "the 30-day fixture spans multiple ledger days")
    assert(got.keySet === byDay.keySet)

    byDay.foreach { case (day, reqs) =>
      // the day's queue: one entry per vessel, in first-request order
      // (the reference's per-vessel dedup before queueing)
      val queue = reqs.groupBy(_._1).toSeq
        .map { case (v, rs) => (rs.map(_._2).min, v) }
        .sorted.map { case (_, v) => v.toString }
      // drive the REAL imperative loop: empty ledger (24 h cache reset at
      // the day boundary), stub fetcher, recorded sleeps
      var sleptMs = 0L
      val out = RestPatterns.rateLimitedLookup(
        keys = queue, ledger = Set.empty,
        fetcher = new RestPatterns.Fetcher {
          def fetch(url: String): Either[String, String] = Right("ok")
        },
        urlFor = k => s"stub://$k", minIntervalMs = 2000L,
        sleep = ms => sleptMs += ms)
      val lookups = out.count(_._2.isDefined)
      val (nReq, nLook, nSkip, spanSec, nCodes, topCode, topCodeN) = got(day)
      assert(nReq === reqs.size.toLong, s"day $day n_requests")
      assert(nLook === lookups.toLong, s"day $day n_lookups")
      assert(nSkip === (reqs.size - lookups).toLong, s"day $day n_cache_skips")
      // 1 req / 2 s: the loop slept 2000 ms per post-first lookup —
      // exactly span_sec seconds of queue drain
      assert(spanSec * 1000L === sleptMs, s"day $day span vs recorded sleeps")
      // suggested-mapping aggregation replayed in plain Scala
      val codeOf = (v: Long) => (v % 5) match {
        case 0 => 30L; case 1 => 37L; case 2 => 52L; case 3 => 60L
        case _ => 70L
      }
      val suggest = queue.map(k => codeOf(k.toLong))
        .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      assert(nCodes === suggest.size.toLong, s"day $day n_codes")
      val (expTop, expTopN) = suggest.toSeq.maxBy { case (c, n) => (n, -c) }
      assert(topCode === expTop && topCodeN === expTopN, s"day $day top code")
    }
  }
}
