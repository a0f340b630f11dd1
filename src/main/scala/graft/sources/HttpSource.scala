package graft.sources

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Distributed HTTP fetch connector — the production shell behind the S1/S4
  * fixture sources (SURVEY §2.1): the reference fetches SERP pages and place
  * details with a rate limiter + exponential backoff
  * (cse_client.py:74-121 `_rate_limit_delay`/`_retry_request`); this is the
  * same contract as a Spark source stage, with the I/O seam injected so the
  * whole ladder is testable offline.
  *
  * Architecture:
  *  - `Transport` is the single I/O seam — a function from request to
  *    response. Production would wire `java.net.http.HttpClient` here; this
  *    environment has zero egress, so the shipped transports are the
  *    deterministic [[ReplayTransport]] (scripted responses, used by
  *    HttpSourceSpec to drive the ladder through 429/5xx sequences) and any
  *    user-provided one. The FACTORY is what ships to executors (a live
  *    client is not serializable; one client per partition is the correct
  *    pooling granularity anyway).
  *  - [[RetryPolicy]] is the reference's exact ladder: delays
  *    0.25/0.5/1/2/4 s, at most 5 attempts; 429 honors `Retry-After`
  *    (falling back to the ladder rung), 5xx and timeouts walk the ladder,
  *    any other non-200 gives up immediately (cse_client.py:96-118). The
  *    sleeper is injected so tests assert the delay sequence instead of
  *    waiting it out.
  *  - [[RateLimiter]] enforces the per-worker minimum spacing with jitter
  *    (cse_client.py:74-86); jitter is injected for determinism.
  *  - [[fetch]] is the Spark plumbing: `mapPartitions`, one transport +
  *    limiter per partition. Scale contract: parallelism = partitions, so
  *    the GLOBAL request rate is partitions × per-worker rate — size
  *    `repartition(n)` to the provider's quota, exactly how the reference
  *    sizes its single-process loop. Results carry (status, attempts) so
  *    failures are DATA, not exceptions: a 100 TB-scale crawl must not lose
  *    a stage to one dead URL.
  */
object HttpSource {

  final case class HttpResponse(status: Int, headers: Map[String, String], body: String)

  /** The single I/O seam. `send` may throw [[TimeoutException]] — treated as
    * a retryable failure like a 5xx. */
  trait Transport extends Serializable { def send(url: String): HttpResponse }
  final class TimeoutException(msg: String) extends RuntimeException(msg)

  /** Scripted transport: each URL consumes its scripted responses in order
    * (the last one repeats if the ladder retries past the script). Entirely
    * deterministic — the offline stand-in for a live client. */
  final class ReplayTransport(script: Map[String, Seq[HttpResponse]]) extends Transport {
    private val cursors = scala.collection.mutable.Map[String, Int]()
    val log = scala.collection.mutable.ArrayBuffer[String]()
    def send(url: String): HttpResponse = {
      val seq = script.getOrElse(url,
        Seq(HttpResponse(404, Map.empty, s"unscripted $url")))
      val i = cursors.getOrElse(url, 0)
      cursors(url) = i + 1
      log += s"$url#$i"
      val r = seq(math.min(i, seq.size - 1))
      if (r.status == -1) throw new TimeoutException(url) // scripted timeout
      r
    }
  }

  /** cse_client.py:90 `backoff_delays = [0.25, 0.5, 1.0, 2.0, 4.0]`. */
  val LadderMs: Vector[Long] = Vector(250L, 500L, 1000L, 2000L, 4000L)
  val MaxRetries = 5

  final case class FetchResult(url: String, status: Int, body: Option[String],
    attempts: Int, sleptMs: Long)

  /** The reference's `_retry_request` as a pure fold over the transport:
    * 200 → done; 429 → sleep Retry-After (seconds) if present else the
    * ladder rung; 5xx / timeout → ladder rung; anything else → give up with
    * that status. Returns the LAST status when attempts run out. */
  object RetryPolicy {
    def run(url: String, transport: Transport, sleep: Long => Unit,
        maxRetries: Int = MaxRetries): FetchResult = {
      var slept = 0L
      var last = 0
      var attempt = 0
      while (attempt < maxRetries) {
        val rung = LadderMs(math.min(attempt, LadderMs.size - 1))
        val resp =
          try transport.send(url)
          catch { case _: TimeoutException => HttpResponse(-1, Map.empty, "") }
        last = resp.status
        resp.status match {
          case 200 =>
            return FetchResult(url, 200, Some(resp.body), attempt + 1, slept)
          case 429 =>
            val ms = resp.headers.get("Retry-After")
              .flatMap(s => scala.util.Try(s.trim.toLong * 1000).toOption)
              .getOrElse(rung)
            sleep(ms); slept += ms
          case s if s >= 500 || s == -1 =>
            sleep(rung); slept += rung
          case s =>
            return FetchResult(url, s, None, attempt + 1, slept) // hard 4xx
        }
        attempt += 1
      }
      FetchResult(url, last, None, maxRetries, slept)
    }
  }

  /** cse_client.py:74-86 — minimum spacing between consecutive requests from
    * one worker, plus jitter. Clock and sleeper injected for tests. */
  final class RateLimiter(minIntervalMs: Long, jitterMs: () => Long,
      clock: () => Long, sleep: Long => Unit) extends Serializable {
    private var lastAt = Long.MinValue
    def acquire(): Long = {
      val now = clock()
      val wait =
        if (lastAt == Long.MinValue || now - lastAt >= minIntervalMs) 0L
        else (minIntervalMs - (now - lastAt)) + jitterMs()
      if (wait > 0) sleep(wait)
      // The intended SEND time is now + wait. Under a real sleeper the clock
      // has already advanced by ~wait when we get here, so re-reading the
      // clock and adding wait again would park lastAt ~2×wait in the future
      // and grow every subsequent spacing by ~minIntervalMs (unbounded
      // over-throttling). Anchor on the pre-sleep timestamp instead — correct
      // under both real and injected clocks.
      lastAt = now + wait
      wait
    }
  }

  implicit private val fetchResultEnc: Encoder[FetchResult] = Encoders.product[FetchResult]

  /** Distributed fetch: one transport + limiter per PARTITION (the pooling
    * and rate-accounting unit), results as data. `sleeper` defaults to a
    * real sleep; specs inject a recorder. */
  def fetch(urls: DataFrame, urlCol: String,
      transportFactory: () => Transport,
      minIntervalMs: Long = 0L,
      sleeper: Long => Unit = Thread.sleep(_: Long),
      jitterMs: () => Long = () => 0L): DataFrame = {
    import urls.sparkSession.implicits._
    val sleepF = sleeper // avoid closing over the default-arg sugar
    urls.select(col(urlCol).cast("string")).as[String]
      .mapPartitions { part =>
        val transport = transportFactory()
        val limiter = new RateLimiter(minIntervalMs, jitterMs,
          () => System.nanoTime() / 1000000L, sleepF)
        part.map { url =>
          limiter.acquire()
          RetryPolicy.run(url, transport, sleepF)
        }
      }
      .toDF()
  }
}
