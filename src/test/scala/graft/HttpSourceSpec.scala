package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.HttpSource
import graft.sources.HttpSource.{HttpResponse, ReplayTransport, RetryPolicy}

/** Drives the backoff ladder through scripted 429/5xx/timeout sequences and
  * the mapPartitions plumbing end to end — no network, fully deterministic. */
class HttpSourceSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  private def recordingSleeper: (collection.mutable.ArrayBuffer[Long], Long => Unit) = {
    val slept = collection.mutable.ArrayBuffer[Long]()
    (slept, ms => slept += ms)
  }

  test("5xx walks the ladder 0.25/0.5/1/2 then succeeds on the 5th attempt") {
    val t = new ReplayTransport(Map("u" -> (Seq.fill(4)(HttpResponse(503, Map.empty, "")) :+
      HttpResponse(200, Map.empty, "ok"))))
    val (slept, sleeper) = recordingSleeper
    val r = RetryPolicy.run("u", t, sleeper)
    assert(r.status == 200 && r.body.contains("ok") && r.attempts == 5)
    assert(slept.toSeq == Seq(250L, 500L, 1000L, 2000L))
  }

  test("429 honors Retry-After seconds; absent header falls back to the rung") {
    val t = new ReplayTransport(Map("u" -> Seq(
      HttpResponse(429, Map("Retry-After" -> "3"), ""),
      HttpResponse(429, Map.empty, ""), // no header → ladder rung for attempt 1
      HttpResponse(200, Map.empty, "ok"))))
    val (slept, sleeper) = recordingSleeper
    val r = RetryPolicy.run("u", t, sleeper)
    assert(r.status == 200 && r.attempts == 3)
    assert(slept.toSeq == Seq(3000L, 500L))
  }

  test("timeouts are retryable like 5xx; exhaustion reports the last status") {
    val t = new ReplayTransport(Map("u" -> Seq(HttpResponse(-1, Map.empty, ""))))
    val (slept, sleeper) = recordingSleeper
    val r = RetryPolicy.run("u", t, sleeper)
    assert(r.status == -1 && r.body.isEmpty && r.attempts == 5)
    // ladder caps at its last rung (cse_client.py: min(attempt, len-1))
    assert(slept.toSeq == Seq(250L, 500L, 1000L, 2000L, 4000L))
  }

  test("hard 4xx gives up immediately without sleeping") {
    val t = new ReplayTransport(Map("u" -> Seq(HttpResponse(403, Map.empty, "denied"))))
    val (slept, sleeper) = recordingSleeper
    val r = RetryPolicy.run("u", t, sleeper)
    assert(r.status == 403 && r.body.isEmpty && r.attempts == 1 && slept.isEmpty)
  }

  test("fetch: per-partition transport, failures land as rows not exceptions") {
    import spark.implicits._
    val script: Map[String, Seq[HttpResponse]] = Map(
      "a" -> Seq(HttpResponse(200, Map.empty, "A")),
      "b" -> Seq(HttpResponse(503, Map.empty, ""), HttpResponse(200, Map.empty, "B")),
      "c" -> Seq(HttpResponse(404, Map.empty, "")))
    val urls = Seq("a", "b", "c").toDF("url").repartition(2)
    val out = HttpSource.fetch(urls, "url", () => new ReplayTransport(script),
        sleeper = _ => ()) // don't actually wait in the test
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), Option(r.getString(2)), r.getInt(3)))).toMap
    assert(out("a") == ((200, Some("A"), 1)))
    assert(out("b") == ((200, Some("B"), 2)))
    assert(out("c") == ((404, None, 1)))
  }

  test("rate limiter spaces consecutive requests by the minimum interval") {
    var now = 0L
    val (slept, sleeper) = recordingSleeper
    val rl = new HttpSource.RateLimiter(1000L, () => 150L, () => now, sleeper)
    assert(rl.acquire() == 0L)    // first request: free
    now += 200                     // 200ms later: must wait 800 + jitter
    rl.acquire()
    assert(slept.toSeq == Seq(950L))
    now += 5000                    // long idle: free again
    rl.acquire()
    assert(slept.toSeq == Seq(950L))
  }

  test("rate limiter stays at steady-state spacing when the sleeper advances the clock") {
    // Under a REAL sleeper the clock advances by `wait` during the sleep. If
    // lastAt were re-read from the clock after sleeping (+wait again), it
    // would land ~2×wait in the future and every back-to-back acquire would
    // grow by ~minInterval. Model the real clock and pin the steady state.
    var now = 0L
    val slept = collection.mutable.ArrayBuffer[Long]()
    val sleeper: Long => Unit = ms => { slept += ms; now += ms }
    val rl = new HttpSource.RateLimiter(1000L, () => 0L, () => now, sleeper)
    rl.acquire()                   // free
    (1 to 4).foreach(_ => rl.acquire()) // back-to-back: each waits exactly 1000
    assert(slept.toSeq == Seq(1000L, 1000L, 1000L, 1000L))
  }
}
