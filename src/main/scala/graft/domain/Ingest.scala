package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion stage projections/filters P1–P5 + the novelty gate (SURVEY §2.2,
  * §3.2; reference: google_places_ingester.py:76-109,297-422,
  * h3_scheduler.py:313-321).
  *
  * One declarative select per search-result batch — the reference's
  * row-at-a-time to_poi_row becomes a filter+project pipeline Catalyst can
  * push into the scan. The category/subcategory maps are literal broadcast
  * maps (config.json:208-240 shape).
  */
object Ingest {

  /** category_map (config.json:208-240 shape, trimmed to the 4 categories). */
  val categoryMap: Seq[(String, String)] = Seq(
    "restaurant" -> "restaurant", "food" -> "restaurant",
    "bar" -> "bar", "night_club" -> "bar",
    "cafe" -> "cafe", "coffee_shop" -> "cafe",
    "bakery" -> "bakery")

  val subcategoryMap: Seq[(String, String)] = Seq(
    "french_restaurant" -> "french", "italian_restaurant" -> "italian",
    "wine_bar" -> "wine", "coffee_shop" -> "specialty_coffee")

  /** (result_id, place_id, name, types, formatted_address, lat, lng, rating,
    * user_ratings_total, price_level, city_slug) — fixture covering: allowed /
    * disallowed types, missing place_id / coords, quality-gate pass & fail,
    * country from address vs city_slug fallback vs drop, long-name truncation. */
  val placesResults: Seq[(String, Option[String], Option[String], Seq[String], String, Option[Double], Option[Double], Option[Double], Option[Int], Option[Int], String)] = Seq(
    ("r1", Some("pl1"), Some("Chez Panisse"), Seq("restaurant", "food"),
      "12 Rue de la Paix, 75002 Paris, France", Some(48.869), Some(2.331), Some(4.6), Some(220), Some(2), "paris"),
    ("r2", Some("pl2"), Some("Zzz Club"), Seq("night_club"),
      "3 Rue Oberkampf, Paris", Some(48.864), Some(2.370), Some(4.4), Some(80), Some(3), "paris"),
    ("r3", Some("pl3"), Some("Mediocre Diner"), Seq("restaurant"),
      "9 Rue X, 75010 Paris, France", Some(48.876), Some(2.358), Some(3.9), Some(400), Some(1), "paris"),
    ("r4", Some("pl4"), Some("Gift Shop"), Seq("store", "souvenir_shop"),
      "1 Rue Y, 75001 Paris, France", Some(48.861), Some(2.336), Some(4.8), Some(500), None, "paris"),
    ("r5", None, Some("No Place Id"), Seq("cafe"),
      "2 Rue Z, 75001 Paris, France", Some(48.860), Some(2.340), Some(4.5), Some(100), None, "paris"),
    ("r6", Some("pl6"), Some("No Coords Cafe"), Seq("cafe"),
      "4 Rue W, 75001 Paris, France", None, None, Some(4.5), Some(100), None, "paris"),
    ("r7", Some("pl7"), Some("Wine & Co " + ("x" * 250)), Seq("bar", "wine_bar"),
      "8 Quai V, Lyon", Some(45.762), Some(4.835), Some(4.7), Some(60), Some(2), "lyon"),
    ("r8", Some("pl8"), Some("Nouveau Bistro 2025"), Seq("restaurant", "french_restaurant"),
      "5 Rue N, 75011 Paris, France", Some(48.858), Some(2.380), Some(4.1), Some(12), None, "paris"))

  def placesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    placesResults.toDF("result_id", "place_id", "name", "types", "formatted_address",
      "lat", "lng", "rating", "user_ratings_total", "price_level", "city_slug")
  }

  def placesValues: String = placesResults.map {
    case (rid, pid, n, ts, addr, lat, lng, r, urt, pl, slug) =>
      def so(v: Option[String]) = v.map(x => s"'${x.replace("'", "''")}'").getOrElse("CAST(NULL AS VARCHAR)")
      def d(v: Option[Double]) = v.map(x => s"CAST($x AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
      def i(v: Option[Int]) = v.map(_.toString).getOrElse("CAST(NULL AS INTEGER)")
      val tl = ts.map(t => s"'$t'").mkString("[", ", ", "]")
      s"('$rid', ${so(pid)}, ${so(n)}, $tl, '${addr.replace("'", "''")}', ${d(lat)}, ${d(lng)}, ${d(r)}, ${i(urt)}, ${i(pl)}, '$slug')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS pr(result_id, place_id, name, types, formatted_address, lat, lng, rating, user_ratings_total, price_level, city_slug)"

  /** First-match map lookup rendered as a CASE over the type list (the
    * reference iterates the type list in order, google_places_ingester.py:87-93). */
  private def mapCase(v: String, m: Seq[(String, String)]): String =
    m.map { case (k, x) => s"WHEN $v = '$k' THEN '$x'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  /** P1–P5 in one pipeline: drop rows missing place_id/name/coords, type
    * allowlist (P2), first-match category (P3), quality gate exposed as a
    * column (P4 — the FSM gates on `novelty OR quality`, h3_scheduler.py:313),
    * country extraction with fallback-else-drop (P5), truncating casts. */
  def toPoiRows(results: DataFrame): DataFrame = {
    val allowed = categoryMap.map(_._1)
    val category = expr(s"filter(transform(types, t -> ${mapCase("t", categoryMap)}), x -> x IS NOT NULL)[0]")
    val subcats = expr(s"array_distinct(filter(transform(types, t -> ${mapCase("t", subcategoryMap)}), x -> x IS NOT NULL))")
    val lastField = trim(element_at(split(col("formatted_address"), ", "), -1))
    val countryFromAddr = when(length(lastField) > 2, lastField)
    val country = coalesce(countryFromAddr,
      when(col("city_slug") === "paris", "France"))
    results
      .filter(col("place_id").isNotNull && col("name").isNotNull &&
        col("lat").isNotNull && col("lng").isNotNull)
      .filter(arrays_overlap(col("types"), array(allowed.map(lit): _*)))
      .withColumn("category", category)
      .filter(col("category").isNotNull)
      .withColumn("country", country)
      .filter(col("country").isNotNull)
      .select(
        col("result_id"),
        col("place_id").as("google_place_id"),
        substring(col("name"), 1, 200).as("name"),
        col("category"),
        subcats.as("subcategories"),
        col("city_slug"),
        initcap(regexp_replace(col("city_slug"), "_", " ")).as("city"),
        col("country"),
        col("lat"), col("lng"),
        substring(col("formatted_address"), 1, 255).as("address_street"),
        col("price_level").cast("string").as("price_level"),
        (coalesce(col("rating"), lit(0.0)) >= 4.3 &&
          coalesce(col("user_ratings_total"), lit(0)) >= 50).as("passes_quality_gate"))
  }

  def qIngestPoiRows(spark: SparkSession, dir: String): DataFrame =
    toPoiRows(placesDf(spark))
      .withColumn("subcategories", concat_ws("|", col("subcategories")))
      .withColumn("name_len", length(col("name")).cast("long"))
      .drop("name") // 250-char name hashes fine but keep output narrow

  /** opening_hours JSON fixture: well-formed, empty periods, malformed, null
    * (google_places_ingester.py:406-408 keeps only `periods`). */
  val openingHours: Seq[(Int, Option[String])] = Seq(
    (1, Some("""{"periods": [{"open": {"day": 1, "hour": 9, "minute": 0}, "close": {"day": 1, "hour": 18, "minute": 30}}, {"open": {"day": 2, "hour": 9, "minute": 0}, "close": {"day": 2, "hour": 18, "minute": 0}}], "open_now": true}""")),
    (2, Some("""{"periods": [], "open_now": false}""")),
    (3, Some("""not json""")),
    (4, None))

  /** Nested-struct data model (SURVEY §1.3): parse the opening_hours JSON
    * into struct<periods: array<struct<open/close: struct<day,hour,minute>>>>,
    * dropping open_now — then flatten back out for the oracle (which counts
    * structure via regex on the raw string: different mechanism, same value). */
  def qOpeningHours(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val point = StructType(Seq(StructField("day", IntegerType),
      StructField("hour", IntegerType), StructField("minute", IntegerType)))
    val schema = StructType(Seq(StructField("periods", ArrayType(
      StructType(Seq(StructField("open", point), StructField("close", point)))))))
    openingHours.toDF("poi_ref", "opening_hours_raw")
      .withColumn("oh", from_json(col("opening_hours_raw"), schema))
      .select(
        col("poi_ref"),
        coalesce(size(col("oh.periods")), lit(-1)).cast("long").as("n_periods"),
        // get() (not [0]): ANSI mode throws on out-of-bounds for empty periods
        expr("get(oh.periods, 0).open.day").cast("long").as("first_open_day"),
        expr("get(oh.periods, 0).close.hour").cast("long").as("first_close_hour"))
  }

  // --------------------------------------------------- S2 text search query

  /** Text-search responses, one row per (query, rank): raw new-API JSON
    * (google_places_ingester.py:239-295). Covers >5 results (truncated),
    * missing rating, nested displayName/location. */
  val textSearchResults: Seq[(String, String, String, Int, String)] = Seq(
    ("t1", "Chez Panisse", "paris", 1, """{"id":"pl1","displayName":{"text":"Chez Panisse"},"location":{"latitude":48.857,"longitude":2.352},"types":["restaurant","food"],"formattedAddress":"1 Rue A, 75001 Paris, France","rating":4.7,"userRatingCount":210}"""),
    ("t1", "Chez Panisse", "paris", 2, """{"id":"pl9","displayName":{"text":"Chez Panisse II"},"location":{"latitude":48.861,"longitude":2.349},"types":["restaurant"],"formattedAddress":"2 Rue B, 75002 Paris, France","rating":4.1,"userRatingCount":80}"""),
    ("t1", "Chez Panisse", "paris", 3, """{"id":"pl10","displayName":{"text":"Panisse Corner"},"location":{"latitude":48.852,"longitude":2.360},"types":["restaurant","cafe"],"formattedAddress":"3 Rue C, 75003 Paris, France"}"""),
    ("t1", "Chez Panisse", "paris", 4, """{"id":"pl11","displayName":{"text":"Maison Panisse"},"location":{"latitude":48.850,"longitude":2.340},"types":["restaurant"],"formattedAddress":"4 Rue D, 75004 Paris, France","rating":3.9,"userRatingCount":12}"""),
    ("t1", "Chez Panisse", "paris", 5, """{"id":"pl12","displayName":{"text":"Panisse Express"},"location":{"latitude":48.845,"longitude":2.330},"types":["restaurant"],"formattedAddress":"5 Rue E, 75005 Paris, France","rating":4.0,"userRatingCount":33}"""),
    ("t1", "Chez Panisse", "paris", 6, """{"id":"pl13","displayName":{"text":"Sixth Result"},"location":{"latitude":48.840,"longitude":2.320},"types":["restaurant"],"formattedAddress":"6 Rue F, 75006 Paris, France","rating":4.9,"userRatingCount":999}"""),
    ("t2", "Secret Wine Bar", "paris", 1, """{"id":"pl4","displayName":{"text":"Secret Wine Bar"},"location":{"latitude":48.870,"longitude":2.360},"types":["bar","wine_bar"],"formattedAddress":"7 Rue G, 75007 Paris, France","rating":4.7,"userRatingCount":120}"""))

  /** S2 — text-search projection (google_places_ingester.py:239-295): query
    * string "{poi_name} {city}", first 5 results (maxResultCount), new→legacy
    * field conversion from the nested JSON. */
  def qTextSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    textSearchResults.toDF("query_id", "poi_name", "city", "rnk", "result_json")
      .filter(col("rnk") <= 5) // maxResultCount: 5
      .select(
        col("query_id"),
        concat(col("poi_name"), lit(" "), col("city")).as("search_query"),
        col("rnk").cast("long").as("rnk"),
        get_json_object(col("result_json"), "$.id").as("place_id"),
        get_json_object(col("result_json"), "$.displayName.text").as("name"),
        get_json_object(col("result_json"), "$.location.latitude").cast("double").as("lat"),
        get_json_object(col("result_json"), "$.location.longitude").cast("double").as("lng"),
        get_json_object(col("result_json"), "$.rating").cast("double").as("rating"),
        get_json_object(col("result_json"), "$.userRatingCount").cast("long").as("user_ratings_total"),
        get_json_object(col("result_json"), "$.formattedAddress").as("formatted_address"))
  }

  // ------------------------------------------------ S3 details lookup query

  /** Place-details responses keyed by place_id: raw new-API JSON
    * (google_places_ingester.py:115-162). */
  val placeDetails: Seq[(String, String)] = Seq(
    ("pl1", """{"formattedAddress":"1 Rue A, 75001 Paris, France","internationalPhoneNumber":"+33 1 11 11 11 11","websiteUri":"https://chezpanisse.fr","rating":4.7,"userRatingCount":210,"priceLevel":"PRICE_LEVEL_EXPENSIVE","currentOpeningHours":{"periods":[{"open":{"day":1,"hour":9},"close":{"day":1,"hour":18}},{"open":{"day":2,"hour":9},"close":{"day":2,"hour":18}}]},"photos":[{"name":"places/pl1/photos/a"},{"name":"places/pl1/photos/b"}]}"""),
    ("pl2", """{"formattedAddress":"9 Rue Z, 75009 Paris, France","rating":4.2,"userRatingCount":55,"photos":[{"name":"places/pl2/photos/a"}]}"""),
    ("pl3", """{"formattedAddress":"3 Rue C, 75003 Paris, France","websiteUri":"https://mediocre.example","rating":3.1,"userRatingCount":900,"priceLevel":"PRICE_LEVEL_MODERATE","currentOpeningHours":{"periods":[{"open":{"day":5,"hour":12},"close":{"day":5,"hour":23}}]}}"""),
    ("pl7", """{"formattedAddress":"7 Rue W, 75011 Paris, France","internationalPhoneNumber":"+33 1 77 77 77 77","rating":4.8,"userRatingCount":310,"currentOpeningHours":{"periods":[]}}"""))

  /** S3 — details broadcast-lookup enrichment (google_places_ingester.py:
    * 115-162): accepted pois ⋈ details on place_id; new→legacy conversion
    * (websiteUri→website, phone used for both legacy fields, photos→refs). */
  def qDetailsLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val details = placeDetails.toDF("place_id", "details_json")
    val pois = placesDf(spark)
      .filter(col("place_id").isNotNull)
      .select(col("result_id"), col("place_id"))
    pois.join(broadcast(details), Seq("place_id"), "left")
      .select(
        col("result_id"), col("place_id"),
        get_json_object(col("details_json"), "$.formattedAddress").as("formatted_address"),
        get_json_object(col("details_json"), "$.websiteUri").as("website"),
        get_json_object(col("details_json"), "$.internationalPhoneNumber").as("international_phone_number"),
        get_json_object(col("details_json"), "$.internationalPhoneNumber").as("formatted_phone_number"),
        get_json_object(col("details_json"), "$.rating").cast("double").as("rating"),
        get_json_object(col("details_json"), "$.userRatingCount").cast("long").as("user_ratings_total"),
        get_json_object(col("details_json"), "$.priceLevel").as("price_level"),
        json_array_length(get_json_object(col("details_json"), "$.currentOpeningHours.periods")).cast("long").as("n_periods"),
        json_array_length(get_json_object(col("details_json"), "$.photos")).cast("long").as("n_photos"),
        get_json_object(col("details_json"), "$.photos[0].name").as("first_photo_ref"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_ingest_poi_rows" -> (qIngestPoiRows _),
    "p1_opening_hours" -> (qOpeningHours _),
    "s2_text_search" -> (qTextSearch _),
    "s3_details_lookup" -> (qDetailsLookup _))

  private def openingHoursValues: String = openingHours.map { case (i, s) =>
    val v = s.map(x => "'" + x.replace("'", "''") + "'").getOrElse("CAST(NULL AS VARCHAR)")
    s"($i, $v)"
  }.mkString("(VALUES ", ", ", ")") + " AS oh(poi_ref, opening_hours_raw)"

  private def textSearchValues: String = textSearchResults.map {
    case (qid, pn, city, rnk, js) =>
      s"('$qid', '${pn.replace("'", "''")}', '$city', $rnk, '${js.replace("'", "''")}')"
  }.mkString("(VALUES ", ", ", ")") +
    " AS ts(query_id, poi_name, city, rnk, result_json)"

  private def detailsValues: String = placeDetails.map { case (pid, js) =>
    s"('$pid', '${js.replace("'", "''")}')"
  }.mkString("(VALUES ", ", ", ")") + " AS pd(place_id, details_json)"

  /** The P1–P5 ingest replay over a parameterized search-result relation
    * (fixture VALUES for the base check; the customer-derived volume places
    * in the composed e2e pipeline). Same text, one proof. */
  private[domain] def p1PoiRowsSqlFrom(src: String): String =
    s"""WITH projected AS (
       |  SELECT result_id, place_id AS google_place_id,
       |    substring(name, 1, 200) AS name,
       |    list_filter(list_transform(types, t -> ${mapCase("t", categoryMap)}), x -> x IS NOT NULL)[1] AS category,
       |    coalesce(array_to_string(list_distinct(list_filter(list_transform(types, t -> ${mapCase("t", subcategoryMap)}), x -> x IS NOT NULL)), '|'), '') AS subcategories,
       |    city_slug,
       |    -- initcap equivalent for single-word slugs
       |    upper(substring(replace(city_slug, '_', ' '), 1, 1)) || substring(replace(city_slug, '_', ' '), 2) AS city,
       |    CASE WHEN length(trim(string_split(formatted_address, ', ')[-1])) > 2
       |         THEN trim(string_split(formatted_address, ', ')[-1])
       |         WHEN city_slug = 'paris' THEN 'France' END AS country,
       |    lat, lng,
       |    substring(formatted_address, 1, 255) AS address_street,
       |    CAST(price_level AS VARCHAR) AS price_level,
       |    (coalesce(rating, 0.0) >= 4.3 AND coalesce(user_ratings_total, 0) >= 50) AS passes_quality_gate,
       |    CAST(length(substring(name, 1, 200)) AS BIGINT) AS name_len
       |  FROM $src
       |  WHERE place_id IS NOT NULL AND name IS NOT NULL
       |    AND lat IS NOT NULL AND lng IS NOT NULL
       |    AND len(list_intersect(types, [${categoryMap.map(c => s"'${c._1}'").mkString(", ")}])) > 0)
       |SELECT result_id, google_place_id, category, subcategories, city_slug,
       |  city, country, lat, lng, address_street, price_level,
       |  passes_quality_gate, name_len
       |FROM projected
       |WHERE category IS NOT NULL AND country IS NOT NULL""".stripMargin

  val oracles: Map[String, String] = Map(
    "p1_opening_hours" ->
      s"""SELECT poi_ref,
         |  CASE WHEN opening_hours_raw IS NULL
         |         OR NOT contains(opening_hours_raw, '"periods"')
         |       THEN -1
         |       ELSE len(regexp_extract_all(opening_hours_raw, '"open": \\{')) END AS n_periods,
         |  TRY_CAST(regexp_extract(opening_hours_raw,
         |    '"open": \\{"day": ([0-9]+)', 1) AS BIGINT) AS first_open_day,
         |  TRY_CAST(regexp_extract(opening_hours_raw,
         |    '"close": \\{"day": [0-9]+, "hour": ([0-9]+)', 1) AS BIGINT) AS first_close_hour
         |FROM $openingHoursValues""".stripMargin,
    "p1_ingest_poi_rows" -> p1PoiRowsSqlFrom(placesValues),
    "s2_text_search" ->
      s"""SELECT query_id, poi_name || ' ' || city AS search_query,
         |  CAST(rnk AS BIGINT) AS rnk,
         |  json_extract_string(result_json, '$$.id') AS place_id,
         |  json_extract_string(result_json, '$$.displayName.text') AS name,
         |  CAST(json_extract_string(result_json, '$$.location.latitude') AS DOUBLE) AS lat,
         |  CAST(json_extract_string(result_json, '$$.location.longitude') AS DOUBLE) AS lng,
         |  CAST(json_extract_string(result_json, '$$.rating') AS DOUBLE) AS rating,
         |  CAST(json_extract_string(result_json, '$$.userRatingCount') AS BIGINT) AS user_ratings_total,
         |  json_extract_string(result_json, '$$.formattedAddress') AS formatted_address
         |FROM $textSearchValues
         |WHERE rnk <= 5""".stripMargin,
    "s3_details_lookup" ->
      s"""SELECT result_id, p.place_id,
         |  json_extract_string(details_json, '$$.formattedAddress') AS formatted_address,
         |  json_extract_string(details_json, '$$.websiteUri') AS website,
         |  json_extract_string(details_json, '$$.internationalPhoneNumber') AS international_phone_number,
         |  json_extract_string(details_json, '$$.internationalPhoneNumber') AS formatted_phone_number,
         |  CAST(json_extract_string(details_json, '$$.rating') AS DOUBLE) AS rating,
         |  CAST(json_extract_string(details_json, '$$.userRatingCount') AS BIGINT) AS user_ratings_total,
         |  json_extract_string(details_json, '$$.priceLevel') AS price_level,
         |  CAST(json_array_length(details_json, '$$.currentOpeningHours.periods') AS BIGINT) AS n_periods,
         |  CAST(json_array_length(details_json, '$$.photos') AS BIGINT) AS n_photos,
         |  json_extract_string(details_json, '$$.photos[0].name') AS first_photo_ref
         |FROM (SELECT result_id, place_id FROM $placesValues
         |      WHERE place_id IS NOT NULL) p
         |LEFT JOIN $detailsValues ON pd.place_id = p.place_id""".stripMargin)
}
