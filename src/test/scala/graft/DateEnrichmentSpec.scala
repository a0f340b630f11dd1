package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.domain.DateEnrichment

/** Pins the S8 precedence semantics (date_enricher.py:42-77) beyond the
  * oracle hash: strategy order, validation fall-through, per-pattern order. */
class DateEnrichmentSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  private lazy val out = DateEnrichment.qDatePrecedence(spark, "")
    .collect()
    .map(r => r.getString(0) -> ((Option(r.getString(1)), Option(r.getString(2)), r.getString(3))))
    .toMap

  test("serp beats a present JSON-LD date (strategy order)") {
    assert(out("m01") == ((Some("2024-03-15"), Some("low"), "serp")))
  }

  test("rss beats OpenGraph; exact link match required") {
    assert(out("m02") == ((Some("2024-03-20"), Some("high"), "rss")))
  }

  test("within HTML: JSON-LD beats OpenGraph beats meta") {
    assert(out("m03") == ((Some("2024-05-01"), Some("high"), "schema_org")))
    assert(out("m04") == ((Some("2024-04-11"), Some("medium"), "opengraph")))
    assert(out("m05") == ((Some("2024-01-20"), Some("medium"), "meta_article")))
  }

  test("url inference: year-first and day-first patterns") {
    assert(out("m06") == ((Some("2024-03-15"), Some("low"), "url_inference")))
    assert(out("m11") == ((Some("2023-03-15"), Some("low"), "url_inference")))
  }

  test("invalid dates fall through to the next strategy") {
    // serp 2030 (future) and meta 2031 both fail validation → Last-Modified
    assert(out("m09") == ((Some("2023-01-10"), Some("low"), "http_last_modified")))
  }

  test("nothing extractable → unknown with null date") {
    assert(out("m08") == ((None, None, "unknown")))
  }

  test("serp ISO pattern (second in pattern order) matches") {
    assert(out("m10") == ((Some("2024-07-03"), Some("low"), "serp")))
  }
}
