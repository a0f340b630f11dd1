package graft.expr

import java.text.Normalizer

/** Pure text/URL/geo algorithms with the exact semantics of the reference's
  * Python utilities (cited per function). Kept free of Spark types so the same
  * code backs Catalyst expressions, plain Scala tests, and driver-side tools.
  *
  * Object methods compile to static forwarders, so generated code can call
  * `graft.expr.TextAlgo.normalize(...)` directly from whole-stage codegen.
  */
object TextAlgo {

  // Precompiled patterns: String.replaceAll/split recompile their regex on
  // every call, which dominates per-row cost in the hot join paths (J5).
  private val punctRe = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}_\\s]")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val extRe = java.util.regex.Pattern.compile("\\.[^/]*$")
  private val suffixRe = java.util.regex.Pattern.compile("-(part\\d+|update|v\\d+|\\d+)$")
  private val ccLangRe = java.util.regex.Pattern.compile("^/(?:us|uk|ca|au|br|de|it|es|fr)/(?:en|fr|de|it|es|pt_BR|pt)/")
  private val langRe = java.util.regex.Pattern.compile("^/(?:en|fr|de|it|es|pt)/")

  // ------------------------------------------------------------- normalize

  /** Text normalization (reference: mention_scanner/matching.py:19-72).
    * Chain: NFD accent strip → variation substitutions (apostrophes, café,
    * ligatures, ampersand, st/ste) → punctuation→space → whitespace collapse →
    * lowercase+trim.
    */
  def normalize(text: String): String = {
    if (text == null || text.isEmpty) return ""
    // NFD + drop combining marks (Mn)
    val nfd = Normalizer.normalize(text, Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    var t = handleVariations(sb.toString)
    t = punctRe.matcher(t).replaceAll(" ")
    t = wsRe.matcher(t).replaceAll(" ")
    t.toLowerCase(java.util.Locale.ROOT).trim
  }

  /** Variation substitutions, applied in the reference's order
    * (matching.py:36-68). Lowercases first, as the reference does. */
  private def handleVariations(text0: String): String = {
    var text = text0.toLowerCase(java.util.Locale.ROOT)
    val variations = Seq(
      "\u2019" -> "'", // typographic apostrophe → ASCII
      "'" -> "",       // remove apostrophes entirely
      "`" -> "",
      "caf\u00e9" -> "cafe",
      "caf\u00e9s" -> "cafes",
      "\u0153" -> "oe",
      "\u00e6" -> "ae",
      " & " -> " and ",
      "&" -> "and",
      " st " -> " saint ",
      " ste " -> " sainte ")
    variations.foreach { case (from, to) => text = text.replace(from, to) }
    text
  }

  // -------------------------------------------------------------- trigram

  /** Padded character trigram set (scoring.py:255-257: two-space padding).
    * Windows are CODEPOINTS, as in CPython slicing (and DuckDB `substr`, so
    * the oracle replay agrees on astral input) — a supplementary-plane char
    * like U+1F98A is one trigram element, not a surrogate pair. The all-BMP
    * common case keeps the allocation-free substring walk. */
  def trigrams(s: String): Set[String] = {
    val padded = "  " + s.toLowerCase(java.util.Locale.ROOT) + "  "
    if (padded.length == padded.codePointCount(0, padded.length))
      (0 until padded.length - 2).map(i => padded.substring(i, i + 3)).toSet
    else {
      val cps = padded.codePoints().toArray
      (0 until cps.length - 2).map(i => new String(cps, i, 3)).toSet
    }
  }

  /** Trigram Jaccard similarity (scoring.py:250-267 / matching.py:81-100). */
  def trigramSimilarity(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    val ta = trigrams(a)
    val tb = trigrams(b)
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val inter = ta.intersect(tb).size
    val union = ta.union(tb).size
    if (union > 0) inter.toDouble / union else 0.0
  }

  // ------------------------------------------------- fuzzy (Ratcliff-Obershelp)

  /** SequenceMatcher.ratio() semantics (scoring.py:219): 2·M/T where M is the
    * total length of matching blocks found by recursive longest-common-block
    * search with the "popularity" junk heuristic DISABLED (reference inputs are
    * short titles/snippets, where CPython's autojunk has no effect below 200
    * chars). Lowercasing is the caller's job, as in the reference.
    */
  def fuzzyRatio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    // CPython sequences are CODEPOINTS: an astral char is one element, and
    // ratio()'s T = len(a)+len(b) counts codepoints (TextAlgoSpec pins the
    // fox-emoji vectors against difflib)
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val matched = matchingBlocksTotal(ca, cb)
    2.0 * matched / (ca.length + cb.length)
  }

  private def matchingBlocksTotal(a: Array[Int], b: Array[Int]): Int = {
    // b-index positions per element, as CPython's b2j
    val b2j = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
    var i = 0
    while (i < b.length) {
      val c = b(i)
      var l = b2j.get(c)
      if (l == null) { l = new java.util.ArrayList[Integer](); b2j.put(c, l) }
      l.add(i)
      i += 1
    }

    // find longest matching block in a[alo,ahi) x b[blo,bhi)  (difflib algorithm)
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = new java.util.HashMap[Integer, Integer]()
      var ia = alo
      while (ia < ahi) {
        val newj2len = new java.util.HashMap[Integer, Integer]()
        val positions = b2j.get(a(ia))
        if (positions != null) {
          val it = positions.iterator()
          while (it.hasNext) {
            val jj = it.next().intValue()
            if (jj >= blo && jj < bhi) {
              val k = Option(j2len.get(jj - 1)).map(_.intValue).getOrElse(0) + 1
              newj2len.put(jj, k)
              if (k > bestsize) { besti = ia - k + 1; bestj = jj - k + 1; bestsize = k }
            }
          }
        }
        j2len = newj2len
        ia += 1
      }
      // extend over equal elements on both flanks (difflib does this for junk;
      // with no junk the core loop already finds the maximal block)
      (besti, bestj, bestsize)
    }

    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
      val (bi, bj, size) = longestMatch(alo, ahi, blo, bhi)
      if (size == 0) 0
      else size + recurse(alo, bi, blo, bj) + recurse(bi + size, ahi, bj + size, bhi)
    }

    recurse(0, a.length, 0, b.length)
  }

  /** Whitespace tokens with Spark `split(trim(text), '\s+')` semantics:
    * empty/blank input yields one empty token (String.split behavior). */
  def simHashTokens(text: String): Array[String] =
    wsRe.split(if (text == null) "" else text.trim)

  /** Modulus shared by every oracle-replayable string hash (2^31 − 1). */
  val PolyP = 2147483647L

  /** Polynomial rolling hash over codepoints mod [[PolyP]] — the engine's
    * oracle-replayable string hash: DuckDB computes the identical value as
    * `list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1,
    * length(s)+1), i -> CAST(unicode(s[i]) AS BIGINT))), (acc,cp) ->
    * (acc*base+cp) % 2147483647)`. All intermediates stay below 2^42, so
    * both engines evaluate in exact 64-bit integer arithmetic — which is
    * what lets MinHash/SimHash queries carry full hash oracles instead of
    * rows-only checks. Empty string hashes to 0. */
  def polyHash(s: String, base: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % PolyP
      i += Character.charCount(cp)
    }
    acc
  }

  /** Both simhash bases (31 and 131) of [[polyHash]] in ONE codepoint walk,
    * packed as `h31 | (h131 << 31)` — each hash is < 2^31 so the pack is
    * lossless and fits 62 bits. The packed layout is exactly the simhash62
    * vote layout (bits 0–30 vote on h31, bits 31–61 on h131), so the hot
    * kernel votes directly on this value with no unpacking. Bit-identical
    * to `polyHash(s, 31) | (polyHash(s, 131) << 31)` (TextAlgoSpec pins
    * this). */
  def polyHash2(s: String): Long = {
    var a = 0L
    var b = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 31L + cp) % PolyP
      b = (b * 131L + cp) % PolyP
      i += Character.charCount(cp)
    }
    a | (b << 31)
  }

  /** Distinct word n-grams of whitespace-tokenized text (generalized
    * [[wordShingles]]; the 8-gram form drives benchmark decontamination).
    * Empty below n tokens; grams joined by one space — replayable in DuckDB
    * as list_transform over range(len(words) - n + 1). */
  def wordNgrams(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val t = text.trim
    if (t.isEmpty) return Array.empty
    val words = wsRe.split(t)
    if (words.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n - 1 < words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  /** Gopher/MassiveText-style repetition counters of whitespace-tokenized
    * text in ONE pass: [n_words, n_distinct_words, top_word_count,
    * n_bigrams, n_distinct_bigrams]. Tokenization is [[simHashTokens]]
    * (Spark `split(trim(text), '\s+')` semantics), bigrams are adjacent
    * token pairs joined by one space — both replayable in DuckDB with
    * string_split_regex + list_transform/range. */
  def repetitionCounts(text: String): Array[Long] = {
    val words = simHashTokens(text)
    val wc = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i < words.length) {
      val c = wc.merge(words(i), 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val nBigrams = math.max(words.length - 1, 0)
    val bg = new java.util.HashSet[String]()
    i = 0
    while (i + 1 < words.length) {
      bg.add(words(i) + " " + words(i + 1))
      i += 1
    }
    Array(words.length.toLong, wc.size.toLong, top, nBigrams.toLong, bg.size.toLong)
  }

  /** Distinct word 3-grams of whitespace-tokenized text (the MinHash/Jaccard
    * shingle set; empty below 3 tokens). Single pass — replaces the
    * posexplode + window-lead formulation, which forced a shuffle+sort per
    * document. */
  def wordShingles(text: String): Array[String] = {
    if (text == null) return Array.empty
    val t = text.trim
    if (t.isEmpty) return Array.empty
    val words = wsRe.split(t)
    if (words.length < 3) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < words.length) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  // ------------------------------------------------------------- stopwords

  /** Public so the P13 oracle SQL derives its IN-list from the same source
    * (single point of truth; a list edit cannot desynchronize the gate). */
  val stopwordsKiss = Set("le", "la", "les", "du", "de", "des", "un",
    "une", "et", "ou", "restaurant", "cafe", "bar", "chez", "aux", "au", "paris")

  /** KISS stopword removal (scoring.py:270-279): FR/venue stopwords, drop
    * tokens ≤2 chars, rejoin with single spaces. */
  def removeStopwords(text: String): String = {
    val stop = stopwordsKiss
    // CPython len() counts codepoints: an astral-only word like a double
    // emoji has len 2 and is dropped, even though it spans 4 UTF-16 chars
    wsRe.split(text.toLowerCase(java.util.Locale.ROOT)).iterator
      .filter(w => w.nonEmpty && !stop.contains(w) && w.codePointCount(0, w.length) > 2)
      .mkString(" ")
  }

  /** Discriminant tokens (matching.py:117-125): normalized words >3 chars not
    * in the venue stopword list (note: contains accented 'café' on purpose —
    * the reference checks post-normalization tokens against it verbatim). */
  def discriminantTokens(text: String): Set[String] = {
    val stop = Set("restaurant", "caf\u00e9", "bar", "brasserie", "bistro", "the", "une", "des", "les")
    normalize(text).split(" ").iterator
      .filter(w => w.codePointCount(0, w.length) > 3 && !stop.contains(w)).toSet
  }

  /** Combined name score (scoring.py:209-230): max of raw fuzzy, trigram, and
    * stopword-normalized fuzzy. */
  def nameScore(poiName: String, text: String): Double = {
    if (poiName == null || poiName.isEmpty) return 0.0
    if (text == null || text.trim.isEmpty) return 0.0
    val fuzzy = fuzzyRatio(poiName.toLowerCase(java.util.Locale.ROOT), text.toLowerCase(java.util.Locale.ROOT))
    val tri = trigramSimilarity(poiName, text)
    val np = removeStopwords(poiName)
    val nt = removeStopwords(text)
    val fuzzy2 = if (np.nonEmpty && nt.nonEmpty) math.max(fuzzy, fuzzyRatio(np, nt)) else fuzzy
    math.max(fuzzy2, tri)
  }

  // ------------------------------------------------------------ URL / domain

  /** Registrable-domain extraction (domains.py:34-83): url netloc (scheme
    * defaulted), else displayLink (port/path stripped), else regex on
    * formattedUrl; lowercased, www-stripped; "" if all absent. */
  def domainOf(url: String, displayLink: String, formattedUrl: String): String = {
    def stripWww(d: String) = if (d.startsWith("www.")) d.substring(4) else d
    if (url != null && url.nonEmpty) {
      val u = if (url.startsWith("http://") || url.startsWith("https://")) url else "http://" + url
      val netloc = netlocOf(u)
      if (netloc.nonEmpty) return stripWww(netloc.toLowerCase(java.util.Locale.ROOT))
    }
    if (displayLink != null && displayLink.nonEmpty) {
      val d = stripWww(displayLink.toLowerCase(java.util.Locale.ROOT).split(':')(0).split('/')(0))
      if (d.nonEmpty) return d
    }
    if (formattedUrl != null && formattedUrl.nonEmpty) {
      val m = "^(?:https?://)?([^/]+)".r.findFirstMatchIn(formattedUrl)
      if (m.isDefined) return stripWww(m.get.group(1).toLowerCase(java.util.Locale.ROOT))
    }
    ""
  }

  /** Apex (eTLD+1 approximation: last two labels — domains.py:13-32). */
  def apexDomain(domain: String): String = {
    if (domain == null || domain.isEmpty) return ""
    var d = domain.toLowerCase(java.util.Locale.ROOT)
    if (d.startsWith("http")) d = netlocOf(d)
    if (d.startsWith("www.")) d = d.substring(4)
    val parts = d.split('.')
    if (parts.length >= 2) parts.takeRight(2).mkString(".") else d
  }

  /** Subdomain suffix match (domains.py:85-100). */
  def isSubdomainMatch(candidate: String, apex: String): Boolean = {
    if (candidate == null || candidate.isEmpty || apex == null || apex.isEmpty) false
    else apexDomain(candidate) == apex || candidate.endsWith("." + apex)
  }

  /** URL → dedupe key (dedup.py:18-45): netloc + path without trailing slash,
    * file extension, -partN/-update/-vN/-N suffixes, and language prefixes. */
  def dedupeKey(url: String): String = {
    if (url == null) return ""
    try {
      val netloc = netlocOf(url)
      var path = pathOf(url)
      while (path.endsWith("/")) path = path.substring(0, path.length - 1)
      path = extRe.matcher(path).replaceAll("")
      path = suffixRe.matcher(path).replaceAll("")
      path = ccLangRe.matcher(path).replaceAll("/")
      path = langRe.matcher(path).replaceAll("/")
      netloc + path
    } catch { case _: Exception => url }
  }

  private def netlocOf(url: String): String = {
    val afterScheme = {
      val i = url.indexOf("://")
      if (i >= 0) url.substring(i + 3) else return ""
    }
    val end = afterScheme.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end >= 0) afterScheme.substring(0, end) else afterScheme
  }

  private def pathOf(url: String): String = {
    // urlparse semantics: without a scheme the whole string is the path
    val i = url.indexOf("://")
    val p0 =
      if (i < 0) url
      else {
        val rest = url.substring(i + 3)
        val slash = rest.indexOf('/')
        if (slash < 0) return ""
        rest.substring(slash)
      }
    val cut = p0.indexWhere(c => c == '?' || c == '#')
    if (cut >= 0) p0.substring(0, cut) else p0
  }

  // ------------------------------------------------------------------- geo

  /** Haversine distance in meters (matching.py:102-115; R=6371000). */
  def haversineMeters(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val R = 6371000.0
    val phi1 = math.toRadians(lat1)
    val phi2 = math.toRadians(lat2)
    val dPhi = math.toRadians(lat2 - lat1)
    val dLambda = math.toRadians(lng2 - lng1)
    val a = math.sin(dPhi / 2) * math.sin(dPhi / 2) +
      math.cos(phi1) * math.cos(phi2) * math.sin(dLambda / 2) * math.sin(dLambda / 2)
    R * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  // ------------------------------------------- DuckDB oracle replays (SQL)
  // Generators for the oracle-side half of the replayable-kernel contract
  // (cf. TextDedup's polyHash replay): each emits DuckDB SQL that recomputes
  // the corresponding kernel above, so the driver can hash-compare instead
  // of settling for a rows-only check.

  /** DuckDB replay of [[normalize]] over a string SQL expression `c`.
    * `strip_accents` ≙ NFD + drop-Mn for the composed accents the reference
    * handles; the variation chain and the punctuation/whitespace passes
    * mirror matching.py:19-72 in the same order. (The http→netloc branch of
    * the URL helpers is not needed here — inputs are names, not URLs.) */
  def normalizeSql(c: String): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val variations = Seq(
      "\u2019" -> "'", // typographic apostrophe → ASCII
      "'" -> "",        // then remove apostrophes entirely
      "`" -> "",
      "caf\u00e9" -> "cafe",
      "caf\u00e9s" -> "cafes",
      "\u0153" -> "oe",
      "\u00e6" -> "ae",
      " & " -> " and ",
      "&" -> "and",
      " st " -> " saint ",
      " ste " -> " sainte ")
    val replaced = variations.foldLeft(s"lower(strip_accents($c))") {
      case (acc, (from, to)) => s"replace($acc, ${lit(from)}, ${lit(to)})"
    }
    s"trim(regexp_replace(regexp_replace($replaced, '[^\\p{L}\\p{N}_ \\t\\n\\x0B\\f\\r]', ' ', 'g'), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
  }

  /** Two-space padding of [[trigrams]] over expression `c` (scoring.py:255). */
  def trigramPadSql(c: String): String = s"concat('  ', lower($c), '  ')"

  /** DuckDB replay of [[trigrams]] over a PRE-PADDED string column `p`
    * (build `p` with [[trigramPadSql]] in an earlier CTE so the padded
    * value is computed once, not once per window). */
  def trigramSetSql(p: String): String =
    s"list_distinct(list_transform(range(1, length($p) - 1), i -> substr($p, i, 3)))"

  /** Jaccard over two trigram-set list columns, with the null/empty-input
    * guard of [[trigramSimilarity]] applied by the caller's WHERE/CASE —
    * prefer [[trigramJaccardGuardedSql]], which applies it structurally. */
  def trigramJaccardSql(ta: String, tb: String): String =
    s"len(list_intersect($ta, $tb)) * 1.0 / (len($ta) + len($tb) - len(list_intersect($ta, $tb)))"

  /** [[trigramJaccardSql]] with [[trigramSimilarity]]'s null/empty-input
    * guard built in: `rawA`/`rawB` are the UNPADDED input expressions the
    * trigram sets were built from. Without this, DuckDB's concat silently
    * swallows a NULL pad argument and two empty inputs would score 1.0 over
    * the degenerate {"   "} sets, where Spark returns 0.0. */
  def trigramJaccardGuardedSql(rawA: String, rawB: String, ta: String, tb: String): String =
    s"CASE WHEN coalesce($rawA, '') = '' OR coalesce($rawB, '') = '' THEN 0.0 " +
      s"ELSE ${trigramJaccardSql(ta, tb)} END"

  /** Ray-casting point-in-polygon over a single ring of (lng,lat) pairs
    * (shapely usage at h3_scheduler.py:441-446 re-expressed; no PostGIS). */
  def pointInRing(lng: Double, lat: Double, ring: Array[Array[Double]]): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val xi = ring(i)(0); val yi = ring(i)(1)
      val xj = ring(j)(0); val yj = ring(j)(1)
      val intersects = ((yi > lat) != (yj > lat)) &&
        (lng < (xj - xi) * (lat - yi) / (yj - yi) + xi)
      if (intersects) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}
