package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.expr.TextAlgo

/** Golden-vector parity with the reference's Python utilities (values computed
  * with CPython unicodedata/difflib against the exact reference algorithms:
  * matching.py:19-72 normalize, scoring.py:250-267 trigram, scoring.py:219
  * SequenceMatcher ratio, dedup.py:18-45 dedupe_key, matching.py:102-115
  * haversine), plus ScalaCheck properties.
  */
class TextAlgoSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    PropDrive.forAll(gen, n)(f)
  private def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    PropDrive.forAll(genA, genB)(f)

  // ---- polyHash golden vectors (CPython `for ch in s` codepoint fold —
  // pins the CODEPOINT-iteration contract the DuckDB `unicode(s[i])` replay
  // depends on: the fox emoji is ONE codepoint 0x1F98A = 129418, two UTF-16
  // chars; a char-iterating fold would hash its surrogates instead)
  test("polyHash golden vectors incl. supplementary plane") {
    val golden = Seq(
      ("", 0L, 0L),
      ("a", 97L, 97L),
      ("abc", 96354L, 1677554L),
      ("the", 114801L, 2004401L),
      ("hello world", 1835087470L, 1031902938L),
      ("🦊", 129418L, 129418L), // 🦊 U+1F98A, supplementary plane
      ("a🦊b", 4105273L, 18618473L),
      ("café", 3045921L, 224239221L))
    for ((s, h31, h131) <- golden) {
      assert(TextAlgo.polyHash(s, 31L) == h31, s"polyHash($s, 31)")
      assert(TextAlgo.polyHash(s, 131L) == h131, s"polyHash($s, 131)")
    }
    // blank strings: whitespace codepoints fold like any other
    assert(TextAlgo.polyHash(" ", 31L) == 32L)
  }

  test("polyHash2 packs both bases of polyHash in one walk (incl. astral chars)") {
    val strs = Gen.listOf(Gen.frequency(
      4 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', 'é', '中'),
      1 -> Gen.const('\uD83E'), // lone high surrogate: charCount path
      1 -> Gen.const("🦊"))).map(_.mkString)
    forAll(strs) { s =>
      val packed = TextAlgo.polyHash2(s)
      assert(packed == (TextAlgo.polyHash(s, 31L) | (TextAlgo.polyHash(s, 131L) << 31)))
      assert((packed >>> 62) == 0L) // both hashes < 2^31: 62-bit pack
    }
  }

  // ---- normalize golden vectors
  test("normalize matches reference") {
    assert(TextAlgo.normalize("L'Ambroisie") == "lambroisie")
    assert(TextAlgo.normalize("Café de Flore") == "cafe de flore")
    assert(TextAlgo.normalize("Le Cœur & l'Esprit") == "le coeur and lesprit")
    assert(TextAlgo.normalize("Chez Saint-Germain") == "chez saint germain")
    assert(TextAlgo.normalize("La Brasserie du Marché") == "la brasserie du marche")
    assert(TextAlgo.normalize("A  &  B") == "a and b")
    assert(TextAlgo.normalize("  Le St Tropez  ") == "le saint tropez")
    assert(TextAlgo.normalize("") == "")
    assert(TextAlgo.normalize(null) == "")
  }

  test("normalize is idempotent") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = TextAlgo.normalize(s)
      assert(TextAlgo.normalize(once) == once)
    }
  }

  // ---- trigram golden vectors (10dp)
  private def approx(a: Double, b: Double, eps: Double = 1e-9) = math.abs(a - b) <= eps

  test("trigram similarity matches reference") {
    assert(approx(TextAlgo.trigramSimilarity("L'Ambroisie", "lambroisie"), 0.6666666667, 1e-9))
    assert(approx(TextAlgo.trigramSimilarity("Café de Flore", "cafe de flore paris review"), 0.34375))
    assert(approx(TextAlgo.trigramSimilarity("Le Cœur & l'Esprit", "le coeur and lesprit"), 0.3666666667, 1e-9))
    assert(approx(TextAlgo.trigramSimilarity("Chez Saint-Germain", " st germain bistro"), 0.1818181818, 1e-9))
    assert(approx(TextAlgo.trigramSimilarity("La Brasserie du Marché", "best brasserie marche in paris 2024"), 0.2708333333, 1e-9))
    assert(approx(TextAlgo.trigramSimilarity("Septime", "Septime - the hottest table in town"), 0.2105263158, 1e-9))
  }

  test("trigram properties: symmetric, bounded, self=1") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val s = TextAlgo.trigramSimilarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(approx(s, TextAlgo.trigramSimilarity(b, a)))
    }
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { a =>
      assert(approx(TextAlgo.trigramSimilarity(a, a), 1.0))
    }
  }

  // ---- fuzzy (SequenceMatcher.ratio) golden vectors
  test("fuzzy ratio matches CPython difflib") {
    def f(a: String, b: String) = TextAlgo.fuzzyRatio(a.toLowerCase, b.toLowerCase)
    assert(approx(f("L'Ambroisie", "lambroisie"), 0.9523809524, 1e-9))
    assert(approx(f("Café de Flore", "cafe de flore paris review"), 0.6153846154, 1e-9))
    assert(approx(f("Le Cœur & l'Esprit", "le coeur and lesprit"), 0.7894736842, 1e-9))
    assert(approx(f("Chez Saint-Germain", " st germain bistro"), 0.5555555556, 1e-9))
    assert(approx(f("La Brasserie du Marché", "best brasserie marche in paris 2024"), 0.5614035088, 1e-9))
    assert(approx(f("Septime", "Septime - the hottest table in town"), 0.3333333333, 1e-9))
  }

  test("trigram + fuzzy codepoint contract (supplementary plane, CPython parity)") {
    // U+1F98A fox, U+1F355 pizza — each ONE codepoint (two UTF-16 chars).
    // Values computed with CPython: a char-windowing implementation slices
    // surrogates and gets e.g. 0.909090… instead of 0.9 on the first fuzzy.
    val fox = "\uD83E\uDD8A"
    val pizza = "\uD83C\uDF55"
    assert(approx(TextAlgo.trigramSimilarity(s"caf\u00e9 $fox bar", s"cafe $fox bar"), 0.6, 1e-12))
    assert(TextAlgo.trigramSimilarity(s"$fox$pizza", s"$fox$pizza") == 1.0)
    assert(approx(TextAlgo.trigramSimilarity(s"fox $fox den", "fox den"), 2.0 / 3.0, 1e-12))
    assert(approx(TextAlgo.trigramSimilarity(s"$fox abc", s"$fox abd"), 0.4, 1e-12))
    assert(approx(TextAlgo.fuzzyRatio(s"caf\u00e9 $fox bar", s"cafe $fox bar"), 0.9, 1e-12))
    assert(approx(TextAlgo.fuzzyRatio(s"fox $fox den", "fox den"), 0.875, 1e-12))
    assert(approx(TextAlgo.fuzzyRatio(s"$fox abc", s"$fox abd"), 0.8, 1e-12))
    // BMP behavior is UNCHANGED by the codepoint walk (fast path)
    assert(approx(TextAlgo.trigramSimilarity("classic bistro", "classic bistro paris"),
      0.6521739130434783, 1e-12))
    assert(approx(TextAlgo.fuzzyRatio("new trendy cafe", "new trendy cafe paris review"),
      0.6976744186046512, 1e-12))
  }

  test("fuzzy ratio bounded and 1.0 on equal strings") {
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val r = TextAlgo.fuzzyRatio(a, b)
      assert(r >= 0.0 && r <= 1.0)
    }
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { a =>
      assert(approx(TextAlgo.fuzzyRatio(a, a), 1.0))
    }
  }

  // ---- stopwords / tokens
  test("stopword removal matches reference") {
    assert(TextAlgo.removeStopwords("Le restaurant de la Tour") == "tour")
    assert(TextAlgo.removeStopwords("chez paris au bar et ou un une") == "")
    // token length is CODEPOINTS (CPython len): a double emoji is len 2 ->
    // dropped, even though it spans 4 UTF-16 chars
    val fox2 = "\uD83E\uDD8A" * 2
    val fox3 = "\uD83E\uDD8A" * 3
    assert(TextAlgo.removeStopwords(fox2 + " tour") == "tour")
    assert(TextAlgo.removeStopwords(fox3 + " tour") == fox3 + " tour")
    // the tokenizer's whitespace class is pinned to [ \t\n\x0B\f\r] in BOTH
    // dialects (the oracle spells it explicitly — RE2's \s lacks \x0B), and
    // lowercasing is Locale.ROOT so a Turkish-locale JVM can't flip 'I'
    assert(TextAlgo.removeStopwords("tourmontparnasse") == "tour montparnasse")
    assert(TextAlgo.removeStopwords("TOUR EIFFEL") == "tour eiffel")
  }

  test("discriminant tokens") {
    assert(TextAlgo.discriminantTokens("Restaurant Le Chateaubriand") == Set("chateaubriand"))
    assert(TextAlgo.discriminantTokens("The Bar") == Set.empty[String])
  }

  // ---- dedupe key golden vectors
  test("dedupe_key matches reference") {
    assert(TextAlgo.dedupeKey("https://www.lefooding.com/fr/fr/restaurants/le-rigmarole-v2")
      == "www.lefooding.com/restaurants/le-rigmarole")
    assert(TextAlgo.dedupeKey("https://guide.michelin.com/fr/paris/abc.html")
      == "guide.michelin.com/paris/abc")
    assert(TextAlgo.dedupeKey("http://timeout.fr/en/food/best-bistros-part3/")
      == "timeout.fr/food/best-bistros")
    assert(TextAlgo.dedupeKey("https://blog.example.co/posts/new-cafe-2024")
      == "blog.example.co/posts/new-cafe")
    assert(TextAlgo.dedupeKey("https://x.com/a/b/c-update/") == "x.com/a/b/c")
    assert(TextAlgo.dedupeKey("https://x.com/") == "x.com")
  }

  // ---- domain extraction
  test("domain_of fallback chain matches reference") {
    assert(TextAlgo.domainOf("https://www.lefooding.com/x", null, null) == "lefooding.com")
    assert(TextAlgo.domainOf("lefooding.com/x", null, null) == "lefooding.com")
    assert(TextAlgo.domainOf(null, "WWW.Timeout.FR:443/paris", null) == "timeout.fr")
    assert(TextAlgo.domainOf(null, null, "https://www.abc.fr/x/y") == "abc.fr")
    assert(TextAlgo.domainOf(null, null, null) == "")
  }

  test("apex + subdomain match") {
    assert(TextAlgo.apexDomain("guide.michelin.com") == "michelin.com")
    assert(TextAlgo.apexDomain("www.lefooding.com") == "lefooding.com")
    assert(TextAlgo.isSubdomainMatch("guide.michelin.com", "michelin.com"))
    assert(!TextAlgo.isSubdomainMatch("michelin.com.evil.io", "michelin.com"))
  }

  // ---- geo
  test("haversine matches reference formula") {
    assert(approx(TextAlgo.haversineMeters(48.8566, 2.3522, 45.7640, 4.8357), 391498.9316742573, 1e-4))
    assert(approx(TextAlgo.haversineMeters(48.8566, 2.3522, 48.8606, 2.3376), 1157.0046974814777, 1e-6))
    assert(TextAlgo.haversineMeters(48.0, 2.0, 48.0, 2.0) == 0.0)
  }

  test("point in ring: unit square") {
    val ring = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(1.0, 1.0), Array(0.0, 1.0))
    assert(TextAlgo.pointInRing(0.5, 0.5, ring))
    assert(!TextAlgo.pointInRing(1.5, 0.5, ring))
    assert(!TextAlgo.pointInRing(-0.1, 0.5, ring))
  }
}
