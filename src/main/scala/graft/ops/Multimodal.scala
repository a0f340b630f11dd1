package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (driver mandate): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode / feature
  * extraction as a per-partition batch stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a clearly
  * marked deterministic stub ([[StubDecoder]]); everything around it — binary
  * column handling, metadata struct schema, partition-batched extraction via
  * mapPartitions (the Scala analogue of mapInPandas batches), feature schema —
  * is real and tested. Swapping StubDecoder for a JNI/codec implementation
  * changes no plumbing.
  */
object Multimodal {

  /** Typed row for the extraction stage. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features: byte stats stand in for decoded-frame features. */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
    byte_sum: Long, first_byte: Int, n_frames: Long, format: String)

  /** Deterministic stand-in for the real decoder (no codecs in this
    * environment). Replace with a real implementation behind the same
    * signature; the dataflow does not change. */
  object StubDecoder {
    def decode(payload: Array[Byte], mediaType: String): MediaFeatures0 = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      // fake "frames": one frame per 1000 bytes, min 1
      MediaFeatures0(payload.length.toLong, sum,
        if (payload.length > 0) payload(0) & 0xff else -1,
        math.max(payload.length / 1000, 1).toLong, "stub/raw")
    }
  }
  case class MediaFeatures0(byteLen: Long, byteSum: Long, firstByte: Int,
    nFrames: Long, format: String)

  /** documents.text bytes stand in for media payloads: binary column + typed
    * metadata struct, exactly the shape a real image table would have. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lit("image/stub").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text")).cast("long").as("content_length"),
        col("source").as("origin"),
        col("lang").as("tag")).as("metadata"))

  /** Feature extraction via mapPartitions: the decoder is invoked once per
    * row inside a partition batch — at scale this is where a model/codec
    * would amortize per-batch initialization (the mapInPandas pattern). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (decoder/model handle)
        rows.map { r =>
          val f = StubDecoder.decode(r.payload, r.media_type)
          MediaFeatures(r.doc_id, r.media_type, f.byteLen, f.byteSum,
            f.firstByte, f.nFrames, f.format)
        }
      }
      .toDF()
  }

  /** Oracle-checkable slice of the multimodal pipeline: byte length and frame
    * count are reproducible from the text in SQL; byte_sum/first_byte are
    * covered by MultimodalSpec. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("n_frames"), col("format"))

  // ------------------------------------------------ A14 real photo metrics

  /** Raw uncompressed RGB container: [w:int32 BE][h:int32 BE][h rows of
    * w (r,g,b) byte triplets]. A REAL decode path (no codecs needed), so the
    * reference's pixel metrics (photo_manager.py:135-238) run on real pixel
    * data instead of the byte-stat stub. */
  object RawRgb {
    def encode(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val out = new Array[Byte](8 + w * h * 3)
      out(0) = (w >> 24).toByte; out(1) = (w >> 16).toByte
      out(2) = (w >> 8).toByte; out(3) = w.toByte
      out(4) = (h >> 24).toByte; out(5) = (h >> 16).toByte
      out(6) = (h >> 8).toByte; out(7) = h.toByte
      var i = 8
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pixel(x, y)
          out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
          i += 3
          x += 1
        }
        y += 1
      }
      out
    }

    /** Nearest-neighbor resize (the standard thumbnailing step of a photo
      * pipeline): out(x, y) = in(x·w/w', y·h/h') with integer division —
      * a REAL pixel operation, deterministic, no codec needed. */
    def resize(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      def i32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      val w = i32(0); val h = i32(4)
      encode(outW, outH, (x, y) => {
        val sx = x * w / outW
        val sy = y * h / outH
        val o = 8 + (sy * w + sx) * 3
        (payload(o) & 0xff, payload(o + 1) & 0xff, payload(o + 2) & 0xff)
      })
    }

    /** One pass over the pixels: integer channel sums/sum-of-squares (exact
      * in Long) + the HSV-S per-pixel sum, combined exactly like PIL's
      * ImageStat (photo_manager.py:164-196): brightness = mean of channel
      * means, contrast = mean of channel population stddevs, saturation =
      * mean S where S = (max-min)*255/max. */
    def decode(payload: Array[Byte]): PhotoStats = {
      def i32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      val w = i32(0); val h = i32(4)
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var qr = 0L; var qg = 0L; var qb = 0L
      var ss = 0.0
      var i = 8
      var p = 0L
      while (p < n) {
        val r = payload(i) & 0xff; val g = payload(i + 1) & 0xff; val b = payload(i + 2) & 0xff
        sr += r; sg += g; sb += b
        qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
        val mx = math.max(r, math.max(g, b))
        val mn = math.min(r, math.min(g, b))
        if (mx > 0) ss += (mx - mn) * 255.0 / mx
        i += 3
        p += 1
      }
      val nd = n.toDouble
      val mr = sr.toDouble / nd; val mg = sg.toDouble / nd; val mb = sb.toDouble / nd
      def std(q: Long, m: Double) = math.sqrt(q.toDouble / nd - m * m)
      PhotoStats(w, h,
        (mr + mg + mb) / 3.0,
        (std(qr, mr) + std(qg, mg) + std(qb, mb)) / 3.0,
        ss / nd,
        payload.length.toLong)
    }
  }

  case class PhotoStats(width: Int, height: Int, brightness: Double,
    contrast: Double, saturation: Double, file_size: Long)
  case class PhotoRow(photo_id: String, payload: Array[Byte])
  case class PhotoDecoded(photo_id: String, width: Int, height: Int,
    brightness: Double, contrast: Double, saturation: Double, file_size: Long)

  /** Synthetic raw-RGB fixtures: horizontal two-band images (rows < split are
    * color1, rest color2; split = h → solid). Band saturations are multiples
    * of 0.25 so per-pixel summation is float-exact and the oracle's
    * closed-form integer statistics agree bit-for-bit. */
  val photoFixture: Seq[(String, Int, Int, Int, (Int, Int, Int), (Int, Int, Int))] = Seq(
    ("p1", 800, 600, 600, (120, 90, 60), (0, 0, 0)),   // solid; oversize file
    ("p2", 400, 300, 150, (200, 200, 200), (40, 40, 40)), // grey bands: S=0
    ("p3", 160, 90, 90, (255, 0, 0), (0, 0, 0)),       // saturated 16:9, small
    ("p4", 400, 400, 100, (60, 120, 180), (10, 20, 30))) // square, dark

  /** A14 — photo-quality scoring on decoded pixels (photo_manager.py:135-238):
    * decode via mapPartitions, then the reference's 6 banded metrics and
    * weighted total as codegen'd columns. */
  def mmPhotoQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = photoFixture.map { case (id, w, h, split, c1, c2) =>
      PhotoRow(id, RawRgb.encode(w, h, (_, y) => if (y < split) c1 else c2))
    }
    val decoded = rows.toDS().mapPartitions { it =>
      it.map { r =>
        val s = RawRgb.decode(r.payload)
        PhotoDecoded(r.photo_id, s.width, s.height, s.brightness, s.contrast,
          s.saturation, s.file_size)
      }
    }.toDF()

    val b = col("brightness"); val c = col("contrast"); val s = col("saturation")
    val pc = (col("width") * col("height")).cast("double")
    val resScore = when(pc >= 480000.0, least(lit(1.0), pc / 960000.0))
      .otherwise(pc / 480000.0)
    val brightScore = when(b >= 80.0 && b <= 180.0, 1.0)
      .when(b < 80.0, b / 80.0)
      .otherwise(greatest(lit(0.1), lit(1.0) - (b - 180.0) / 75.0))
    val contrastScore = when(c >= 20.0 && c <= 60.0, 1.0)
      .when(c < 20.0, c / 20.0)
      .otherwise(greatest(lit(0.1), lit(1.0) - (c - 60.0) / 40.0))
    val satScore = when(s >= 60.0 && s <= 200.0, 1.0)
      .when(s < 60.0, s / 60.0)
      .otherwise(greatest(lit(0.3), lit(1.0) - (s - 200.0) / 55.0))
    val aspect = col("width").cast("double") / col("height").cast("double")
    val ratios = Seq(16.0 / 9.0, 4.0 / 3.0, 3.0 / 2.0, 1.0)
    val close = ratios.map(r => abs(aspect - r) < 0.2).reduce(_ || _)
    val near = ratios.map(r => abs(aspect - r) < 0.5).reduce(_ || _)
    val compScore = when(close, 1.0).when(near, 0.8).otherwise(0.5)
    val fs = col("file_size").cast("double")
    val sizeScore = when(fs >= 50000.0 && fs <= 500000.0, 1.0)
      .when(fs < 50000.0, fs / 50000.0)
      .otherwise(greatest(lit(0.3), lit(1.0) - (fs - 500000.0) / 1000000.0))
    val total = lit(0.25) * resScore + lit(0.20) * brightScore +
      lit(0.20) * contrastScore + lit(0.15) * satScore +
      lit(0.10) * compScore + lit(0.10) * sizeScore

    decoded.select(col("photo_id"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      col("file_size"),
      round(b, 6).as("brightness"),
      round(c, 6).as("contrast"),
      round(s, 6).as("saturation"),
      round(resScore, 6).as("score_resolution"),
      round(brightScore, 6).as("score_brightness"),
      round(contrastScore, 6).as("score_contrast"),
      round(satScore, 6).as("score_saturation"),
      round(compScore, 6).as("score_composition"),
      round(sizeScore, 6).as("score_file_size"),
      round(total, 6).as("total_score"))
  }

  /** A14/driver-mandate — thumbnail resize stage: decode → nearest-neighbor
    * resize to 160×120 → pixel stats of the RESIZED image, all inside one
    * mapPartitions batch (where a real pipeline amortizes codec state). The
    * oracle recomputes the resized band geometry in closed form. */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (outW, outH) = (160, 120)
    val rows = photoFixture.map { case (id, w, h, split, c1, c2) =>
      PhotoRow(id, RawRgb.encode(w, h, (_, y) => if (y < split) c1 else c2))
    }
    rows.toDS().mapPartitions { it =>
      it.map { r =>
        val s = RawRgb.decode(RawRgb.resize(r.payload, outW, outH))
        PhotoDecoded(r.photo_id, s.width, s.height, s.brightness, s.contrast,
          s.saturation, s.file_size)
      }
    }.toDF()
      .select(col("photo_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("file_size"),
        round(col("brightness"), 6).as("brightness"),
        round(col("contrast"), 6).as("contrast"),
        round(col("saturation"), 6).as("saturation"))
  }

  /** Multi-frame raw container (video stand-in): [nframes][w][h] int32
    * header, then nframes w×h×3 RGB frames. */
  object RawVideo {
    def encode(nframes: Int, w: Int, h: Int,
        framePixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val frameBytes = w * h * 3
      val out = new Array[Byte](12 + nframes * frameBytes)
      def put(o: Int, v: Int): Unit = {
        out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
        out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      }
      put(0, nframes); put(4, w); put(8, h)
      var f = 0
      while (f < nframes) {
        var i = 12 + f * frameBytes
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = framePixel(f, x, y)
            out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
            i += 3
            x += 1
          }
          y += 1
        }
        f += 1
      }
      out
    }

    /** Stats of one frame without copying it out of the container. */
    def frameStats(payload: Array[Byte], frame: Int): PhotoStats = {
      def i32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      val w = i32(4); val h = i32(8)
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 12 + frame * w * h * 3
      var p = 0L
      while (p < n) {
        sr += payload(i) & 0xff; sg += payload(i + 1) & 0xff; sb += payload(i + 2) & 0xff
        i += 3
        p += 1
      }
      val nd = n.toDouble
      PhotoStats(w, h, (sr / nd + sg / nd + sb / nd) / 3.0, 0.0, 0.0, n * 3)
    }
  }

  case class FrameRow(vid_id: String, frame_idx: Int, width: Int, height: Int,
    brightness: Double)

  /** (vid_id, nframes, w, h, baseR, baseG, baseB, step): frame f is solid
    * ((base + f·step) mod 256, …) — per-frame stats are closed-form. */
  val videoFixture: Seq[(String, Int, Int, Int, Int, Int, Int, Int)] = Seq(
    ("v1", 10, 32, 24, 10, 20, 30, 7),
    ("v2", 7, 16, 16, 200, 100, 50, 31),
    ("v3", 1, 8, 8, 0, 0, 0, 0))

  val FrameSampleEvery = 3

  /** Driver-mandate frame sampling: every k-th frame of each "video", stats
    * per sampled frame — one input row fans out to many output rows inside
    * a mapPartitions batch (the mapInPandas shape for a real codec). */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = videoFixture.map { case (id, nf, w, h, br, bg, bb, step) =>
      PhotoRow(id, RawVideo.encode(nf, w, h, (f, _, _) =>
        ((br + f * step) % 256, (bg + f * step) % 256, (bb + f * step) % 256)))
    }
    rows.toDS().mapPartitions { it =>
      it.flatMap { r =>
        val nframes = ((r.payload(0) & 0xff) << 24) | ((r.payload(1) & 0xff) << 16) |
          ((r.payload(2) & 0xff) << 8) | (r.payload(3) & 0xff)
        (0 until nframes).filter(_ % FrameSampleEvery == 0).map { f =>
          val s = RawVideo.frameStats(r.payload, f)
          FrameRow(r.photo_id, f, s.width, s.height, s.brightness)
        }
      }
    }.toDF()
      .select(col("vid_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("brightness"), 6).as("brightness"))
  }

  // ------------------------------------------------------------- audio

  /** Raw 16-bit PCM mono container (audio stand-in, same role as RawRgb /
    * RawVideo): [sample_rate int32][n_samples int32] header, then int16 BE
    * samples. The fixture waveform is a square wave with a piecewise-constant
    * amplitude (first `split` samples at a1, rest at a2), so windowed energy
    * statistics have exact closed forms the oracle recomputes. */
  object RawPcm {
    def encode(rate: Int, total: Int, split: Int, a1: Int, a2: Int): Array[Byte] = {
      val out = new Array[Byte](8 + total * 2)
      def put(o: Int, v: Int): Unit = {
        out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
        out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      }
      put(0, rate); put(4, total)
      var i = 0
      while (i < total) {
        val a = if (i < split) a1 else a2
        val s = if (i % 2 == 0) a else -a
        out(8 + i * 2) = (s >> 8).toByte
        out(8 + i * 2 + 1) = s.toByte
        i += 1
      }
      out
    }

    /** Per-1-second-window accumulators over the payload: (window_idx,
      * n, sum of squares, silent-sample count, peak |amplitude|). */
    def windowStats(payload: Array[Byte], silenceThr: Int): Seq[(Int, Int, Long, Int, Int)] = {
      def i32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      val rate = i32(0); val total = i32(4)
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Int, Int)]()
      var w = 0
      while (w * rate < total) {
        val end = math.min((w + 1) * rate, total)
        var i = w * rate
        var sumSq = 0L; var silent = 0; var peak = 0
        while (i < end) {
          val s = ((payload(8 + i * 2) << 8) | (payload(8 + i * 2 + 1) & 0xff)).toShort.toInt
          val a = math.abs(s)
          sumSq += a.toLong * a
          if (a < silenceThr) silent += 1
          if (a > peak) peak = a
          i += 1
        }
        out += ((w, end - w * rate, sumSq, silent, peak))
        w += 1
      }
      out.toSeq
    }
  }

  case class AudioWindowRow(clip_id: String, window_idx: Int, n_samples: Int,
    rms: Double, silence_ratio: Double, peak: Int)

  /** (clip_id, rate, total, split, a1, a2): split is deliberately NOT
    * window-aligned for a1/a3, so boundary windows mix both amplitudes. */
  val audioFixture: Seq[(String, Int, Int, Int, Int, Int)] = Seq(
    ("a1", 800, 3200, 2000, 1000, 0),
    ("a2", 1000, 3000, 1000, 8000, 300),
    ("a3", 500, 1500, 700, 50, 4000))

  val SilenceThreshold = 100

  /** Driver-mandate audio feature extraction: decode → windowed RMS energy /
    * silence ratio / peak per 1-second window, 1→N fan-out inside one
    * mapPartitions batch (the mapInPandas shape for a real audio codec). */
  def mmAudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = audioFixture.map { case (id, rate, total, split, a1, a2) =>
      PhotoRow(id, RawPcm.encode(rate, total, split, a1, a2))
    }
    rows.toDS().mapPartitions { it =>
      it.flatMap { r =>
        RawPcm.windowStats(r.payload, SilenceThreshold).map {
          case (w, n, sumSq, silent, peak) =>
            AudioWindowRow(r.photo_id, w, n,
              math.sqrt(sumSq.toDouble / n), silent.toDouble / n, peak)
        }
      }
    }.toDF()
      .select(col("clip_id"), col("window_idx").cast("long").as("window_idx"),
        col("n_samples").cast("long").as("n_samples"),
        round(col("rms"), 6).as("rms"),
        round(col("silence_ratio"), 6).as("silence_ratio"),
        col("peak").cast("long").as("peak"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_photo_quality" -> (mmPhotoQuality _),
    "mm_resize" -> (mmResize _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_audio_energy" -> (mmAudioEnergy _))

  /** Oracle: the same statistics in closed form from the band parameters —
    * integer channel sums (exact), the identical variance/sqrt expression
    * shape, and the identical banding/weights. */
  private def photoValues: String = photoFixture.map {
    case (id, w, h, split, (r1, g1, b1), (r2, g2, b2)) =>
      s"('$id', $w, $h, $split, $r1, $g1, $b1, $r2, $g2, $b2)"
  }.mkString("(VALUES ", ", ", ")") +
    " AS ph(photo_id, w, h, split, r1, g1, b1, r2, g2, b2)"

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id, 'image/stub' AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  greatest(CAST(strlen(text) // 1000 AS BIGINT), 1) AS n_frames,
        |  'stub/raw' AS format
        |FROM documents""".stripMargin,
    "mm_photo_quality" ->
      s"""WITH stats AS (
         |  SELECT photo_id, w, h,
         |    CAST(8 + w * h * 3 AS BIGINT) AS file_size,
         |    CAST(w AS DOUBLE) * CAST(h AS DOUBLE) AS n,
         |    CAST(split AS BIGINT) * w AS n1, CAST(h - split AS BIGINT) * w AS n2,
         |    r1, g1, b1, r2, g2, b2,
         |    CASE WHEN greatest(r1, g1, b1) = 0 THEN 0.0
         |         ELSE (greatest(r1, g1, b1) - least(r1, g1, b1)) * 255.0
         |              / greatest(r1, g1, b1) END AS s1,
         |    CASE WHEN greatest(r2, g2, b2) = 0 THEN 0.0
         |         ELSE (greatest(r2, g2, b2) - least(r2, g2, b2)) * 255.0
         |              / greatest(r2, g2, b2) END AS s2
         |  FROM $photoValues),
         |agg AS (
         |  SELECT photo_id, w, h, file_size, n,
         |    CAST(n1 * r1 + n2 * r2 AS DOUBLE) / n AS mr,
         |    CAST(n1 * g1 + n2 * g2 AS DOUBLE) / n AS mg,
         |    CAST(n1 * b1 + n2 * b2 AS DOUBLE) / n AS mb,
         |    CAST(n1 * r1 * r1 + n2 * r2 * r2 AS DOUBLE) / n AS qr,
         |    CAST(n1 * g1 * g1 + n2 * g2 * g2 AS DOUBLE) / n AS qg,
         |    CAST(n1 * b1 * b1 + n2 * b2 * b2 AS DOUBLE) / n AS qb,
         |    (CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2) / n AS sat
         |  FROM stats),
         |m AS (
         |  SELECT photo_id, w, h, file_size,
         |    (mr + mg + mb) / 3.0 AS brightness,
         |    (sqrt(qr - mr * mr) + sqrt(qg - mg * mg) + sqrt(qb - mb * mb)) / 3.0 AS contrast,
         |    sat AS saturation,
         |    CAST(w AS DOUBLE) * CAST(h AS DOUBLE) AS pc,
         |    CAST(w AS DOUBLE) / CAST(h AS DOUBLE) AS aspect
         |  FROM agg),
         |scored AS (
         |  SELECT *,
         |    CASE WHEN pc >= 480000.0 THEN least(1.0, pc / 960000.0)
         |         ELSE pc / 480000.0 END AS score_resolution,
         |    CASE WHEN brightness >= 80.0 AND brightness <= 180.0 THEN 1.0
         |         WHEN brightness < 80.0 THEN brightness / 80.0
         |         ELSE greatest(0.1, 1.0 - (brightness - 180.0) / 75.0) END AS score_brightness,
         |    CASE WHEN contrast >= 20.0 AND contrast <= 60.0 THEN 1.0
         |         WHEN contrast < 20.0 THEN contrast / 20.0
         |         ELSE greatest(0.1, 1.0 - (contrast - 60.0) / 40.0) END AS score_contrast,
         |    CASE WHEN saturation >= 60.0 AND saturation <= 200.0 THEN 1.0
         |         WHEN saturation < 60.0 THEN saturation / 60.0
         |         ELSE greatest(0.3, 1.0 - (saturation - 200.0) / 55.0) END AS score_saturation,
         |    CASE WHEN abs(aspect - 16.0/9.0) < 0.2 OR abs(aspect - 4.0/3.0) < 0.2
         |           OR abs(aspect - 3.0/2.0) < 0.2 OR abs(aspect - 1.0) < 0.2 THEN 1.0
         |         WHEN abs(aspect - 16.0/9.0) < 0.5 OR abs(aspect - 4.0/3.0) < 0.5
         |           OR abs(aspect - 3.0/2.0) < 0.5 OR abs(aspect - 1.0) < 0.5 THEN 0.8
         |         ELSE 0.5 END AS score_composition,
         |    CASE WHEN file_size >= 50000.0 AND file_size <= 500000.0 THEN 1.0
         |         WHEN file_size < 50000.0 THEN file_size / 50000.0
         |         ELSE greatest(0.3, 1.0 - (file_size - 500000.0) / 1000000.0) END AS score_file_size
         |  FROM m)
         |SELECT photo_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  file_size,
         |  CAST(round(brightness, 6) AS DOUBLE) AS brightness,
         |  CAST(round(contrast, 6) AS DOUBLE) AS contrast,
         |  CAST(round(saturation, 6) AS DOUBLE) AS saturation,
         |  CAST(round(score_resolution, 6) AS DOUBLE) AS score_resolution,
         |  CAST(round(score_brightness, 6) AS DOUBLE) AS score_brightness,
         |  CAST(round(score_contrast, 6) AS DOUBLE) AS score_contrast,
         |  CAST(round(score_saturation, 6) AS DOUBLE) AS score_saturation,
         |  CAST(round(score_composition, 6) AS DOUBLE) AS score_composition,
         |  CAST(round(score_file_size, 6) AS DOUBLE) AS score_file_size,
         |  CAST(round(0.25 * score_resolution + 0.20 * score_brightness
         |    + 0.20 * score_contrast + 0.15 * score_saturation
         |    + 0.10 * score_composition + 0.10 * score_file_size, 6) AS DOUBLE) AS total_score
         |FROM scored""".stripMargin,
    "mm_resize" ->
      s"""WITH geo AS (
         |  -- nearest-neighbor row mapping: resized row y samples source row
         |  -- (y*h)//120; band-1 rows in the 120-row output counted exactly
         |  SELECT photo_id,
         |    (SELECT count(*) FROM range(120) t(y) WHERE (y * h) // 120 < split) AS rows1,
         |    r1, g1, b1, r2, g2, b2,
         |    CASE WHEN greatest(r1, g1, b1) = 0 THEN 0.0
         |         ELSE (greatest(r1, g1, b1) - least(r1, g1, b1)) * 255.0
         |              / greatest(r1, g1, b1) END AS s1,
         |    CASE WHEN greatest(r2, g2, b2) = 0 THEN 0.0
         |         ELSE (greatest(r2, g2, b2) - least(r2, g2, b2)) * 255.0
         |              / greatest(r2, g2, b2) END AS s2
         |  FROM $photoValues),
         |agg AS (
         |  SELECT photo_id,
         |    rows1 * 160 AS n1, (120 - rows1) * 160 AS n2,
         |    CAST(160 * 120 AS DOUBLE) AS n,
         |    r1, g1, b1, r2, g2, b2, s1, s2
         |  FROM geo),
         |m AS (
         |  SELECT photo_id,
         |    CAST(n1 * r1 + n2 * r2 AS DOUBLE) / n AS mr,
         |    CAST(n1 * g1 + n2 * g2 AS DOUBLE) / n AS mg,
         |    CAST(n1 * b1 + n2 * b2 AS DOUBLE) / n AS mb,
         |    CAST(n1 * r1 * r1 + n2 * r2 * r2 AS DOUBLE) / n AS qr,
         |    CAST(n1 * g1 * g1 + n2 * g2 * g2 AS DOUBLE) / n AS qg,
         |    CAST(n1 * b1 * b1 + n2 * b2 * b2 AS DOUBLE) / n AS qb,
         |    (CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2) / n AS sat
         |  FROM agg)
         |SELECT photo_id,
         |  CAST(160 AS BIGINT) AS width, CAST(120 AS BIGINT) AS height,
         |  CAST(8 + 160 * 120 * 3 AS BIGINT) AS file_size,
         |  CAST(round((mr + mg + mb) / 3.0, 6) AS DOUBLE) AS brightness,
         |  CAST(round((sqrt(qr - mr * mr) + sqrt(qg - mg * mg)
         |    + sqrt(qb - mb * mb)) / 3.0, 6) AS DOUBLE) AS contrast,
         |  CAST(round(sat, 6) AS DOUBLE) AS saturation
         |FROM m""".stripMargin,
    "mm_audio_energy" -> {
      val audioValues = audioFixture.map { case (id, rate, total, split, a1, a2) =>
        s"('$id', $rate, $total, $split, $a1, $a2)"
      }.mkString("(VALUES ", ", ", ")") +
        " AS a(clip_id, rate, total, split, a1, a2)"
      val maxWin = audioFixture.map(f => f._3 / f._2).max
      // per window: n1 = samples still in the first amplitude segment —
      // exact integer band split, same closed-form style as the photo oracle
      s"""WITH win AS (
         |  SELECT clip_id, rate, a1, a2, k,
         |    greatest(0, least(rate, split - k * rate)) AS n1
         |  FROM $audioValues, range($maxWin) t(k)
         |  WHERE k < total // rate),
         |w2 AS (SELECT *, rate - n1 AS n2 FROM win)
         |SELECT clip_id, CAST(k AS BIGINT) AS window_idx,
         |  CAST(rate AS BIGINT) AS n_samples,
         |  CAST(round(sqrt(CAST(n1 * a1 * a1 + n2 * a2 * a2 AS DOUBLE) / rate), 6)
         |    AS DOUBLE) AS rms,
         |  CAST(round(CAST((CASE WHEN a1 < $SilenceThreshold THEN n1 ELSE 0 END
         |    + CASE WHEN a2 < $SilenceThreshold THEN n2 ELSE 0 END) AS DOUBLE)
         |    / rate, 6) AS DOUBLE) AS silence_ratio,
         |  CAST(greatest(CASE WHEN n1 > 0 THEN a1 ELSE 0 END,
         |    CASE WHEN n2 > 0 THEN a2 ELSE 0 END) AS BIGINT) AS peak
         |FROM w2""".stripMargin
    },
    "mm_frame_sample" -> {
      val videoValues = videoFixture.map { case (id, nf, w, h, br, bg, bb, step) =>
        s"('$id', $nf, $w, $h, $br, $bg, $bb, $step)"
      }.mkString("(VALUES ", ", ", ")") +
        " AS v(vid_id, nframes, w, h, br, bg, bb, step)"
      val maxFrames = videoFixture.map(_._2).max
      s"""SELECT vid_id, CAST(f AS BIGINT) AS frame_idx,
         |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(round((((br + f * step) % 256) + ((bg + f * step) % 256)
         |    + ((bb + f * step) % 256)) / 3.0, 6) AS DOUBLE) AS brightness
         |FROM $videoValues, range($maxFrames) t(f)
         |WHERE f < nframes AND f % $FrameSampleEvery = 0""".stripMargin
    })
}
