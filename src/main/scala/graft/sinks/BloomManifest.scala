package graft.sinks

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SHARDED PARQUET BLOOM MANIFEST — the bloom probe past driver scale
  * (r18 verdict, the round's headline). The `_KEYBLOOM.tsv` sidecar
  * ([[KeyBloom]]) materializes EVERY file's bloom on the driver per probe;
  * at its own mandated production sizing (`bitsFor` caps at 8 MB/file)
  * that is ~80 GB of driver heap at just 10⁴ production files — the one
  * boundary between this table format and the 100 TB dedup gate. This
  * backend removes it with the Iceberg manifest move: the blooms become
  * DATA — a parquet table `_KEYBLOOM_PQ/` inside the version directory —
  * and the probe becomes a Spark JOB that collects ONLY admitted file
  * names, never a bloom word.
  *
  * REPRESENTATION — sparse words: one row per NON-ZERO bloom word,
  * `(cname, kind, bits, k, file, idx, word)`. Two regimes, one schema:
  * at test scale a file holds few keys, so rows ≈ rows·k regardless of
  * `bits` — production bloom sizing (2²⁶ bits) costs nothing to declare;
  * at production density (~4M rows/file) the words saturate and the
  * manifest approaches the dense 8 MB/file — which is exactly why it
  * lives in executor-scanned parquet, not driver memory. Shards are
  * range-partitioned and sorted on `(cname, idx)`, so a point probe's
  * `idx IN (…)` pushes into the parquet reader and prunes row groups —
  * the manifest skips inside itself.
  *
  * PROBE — one equi-join, no bloom ever crosses to the driver: each probe
  * key explodes to its k `(bits, k, idx, mask)` positions (same
  * [[KeyBloom.hashPair]] double-hash walk as the build side, per distinct
  * (bits, k) in the header); positions broadcast-join manifest rows on
  * `(bits, k, idx)`; a key hits a file's position iff the word covers the
  * mask, and a file is ADMITTED iff some key hits ALL k of its positions
  * (`countDistinct(position) == k` — an absent row is a zero word, a
  * miss, and inner-join absence encodes it for free). Driver traffic is
  * the admitted names — O(result), not O(files·bits).
  *
  * HEADER — `_KEYBLOOM_PQ/_HEADER.tsv`, one line per (file, column):
  * kind/bits/k. Coverage and sizing are driver decisions over file NAMES
  * (the same O(files) class as `_KEYSTATS` itself — names, not bloom
  * payloads); 0-row files appear in the header but have no word rows, so
  * every probe misses them: whole-file skip by construction.
  *
  * MAINTENANCE — staging passes rewrite the manifest DISTRIBUTED: carried
  * rows survive via a semi-join on the reused names, fresh files rebuild
  * per bloomed column in one pass over just-written bytes
  * ([[maintainStage]], invoked from [[KeyBloom.maintainStage]] so every
  * existing staging site composes). The rewrite is O(manifest) executor
  * IO per staging pass with zero driver materialization — the
  * append-only delta-manifest refinement can land behind this same API.
  * A column a full-rewrite kernel drops lapses gracefully, mirroring the
  * TSV path. [[AtomicTable.restoreVersion]] carries the manifest by
  * hard-linking its shards.
  *
  * The TSV sidecar remains the small-table fast path; tables opt into
  * this backend with [[indexBloomManifest]], and every probe site
  * (stats-read, targeted delete, keyed merge / DFP join) consults both. */
object BloomManifest {

  val ManifestDir = "_KEYBLOOM_PQ"
  val HeaderFile = "_HEADER.tsv"

  /** Above this many distinct probe word-indices the `idx IN (…)` scan
    * pushdown is skipped (the join alone still filters) — a 10⁵-literal
    * In would cost Catalyst more than it prunes. */
  val MaxIdxPushdown = 8192

  /** Probe keys beyond this are a bulk changeset, not a point lookup —
    * the position list is driver-built, so the probe declines and the
    * caller stays on the stats ladder. */
  val MaxProbeKeys: Int = KeyedMerge.DriverKeyThreshold

  final case class HeaderRow(kind: String, bits: Int, k: Int)

  /** The probe's verdict: `covered` files carry a manifest bloom for the
    * column (a covered, non-admitted file is PROVABLY key-free);
    * `admitted` files might contain a probe key. */
  final case class Probe(covered: Set[String], admitted: Set[String])

  def manifestPath(versionDir: Path): Path = versionDir.resolve(ManifestDir)

  def exists(versionDir: Path): Boolean =
    Files.exists(manifestPath(versionDir).resolve(HeaderFile))

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  def loadHeader(versionDir: Path): Map[(String, String), HeaderRow] = {
    val p = manifestPath(versionDir).resolve(HeaderFile)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      val a = line.split("\t", 5)
      (dec(a(0)), dec(a(1))) -> HeaderRow(a(2), a(3).toInt, a(4).toInt)
    }.toMap
  }

  private def writeHeader(manifestDir: Path,
      rows: Map[(String, String), HeaderRow]): Unit = {
    val body = rows.toSeq.sortBy(_._1).map { case ((f, c), h) =>
      s"${enc(f)}\t${enc(c)}\t${h.kind}\t${h.bits}\t${h.k}"
    }.mkString("\n")
    val tmp = manifestDir.resolve(s".$HeaderFile.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestDir.resolve(HeaderFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Columns the live manifest blooms (staging rewrites add native blooms
    * for these too, like the TSV path). */
  private[sinks] def coveredColumns(versionDir: Path): Set[String] =
    loadHeader(versionDir).keys.map(_._2).toSet

  /** The k (idx, mask) word positions of a key at (bits, k) — the SAME
    * double-hash walk as [[KeyBloom.BloomRow.mightContain]]; build and
    * probe must be this one function applied on either side. */
  private def positions(bytes: Array[Byte], bits: Int, k: Int): Array[(Int, Long)] = {
    val (h1, h2) = KeyBloom.hashPair(bytes)
    Array.tabulate(k) { i =>
      val pos = (((h1 + i * h2) % bits + bits) % bits).toInt
      (pos >>> 6, 1L << (pos & 63))
    }
  }

  /** ONE distributed build pass over `files` for `keyCol`: explode keys to
    * word positions, `bit_or`-reduce per (file, idx) — only non-zero words
    * become rows, and none of them ever reaches the driver. Returns the
    * row frame and the key kind. */
  private def buildRowsDf(spark: SparkSession, files: Seq[Path], keyCol: String,
      bits: Int, k: Int): (DataFrame, String) = {
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"bits must be a power of two >= 64: $bits")
    val kind = spark.read.parquet(files.head.toString).schema(keyCol).dataType match {
      case LongType | IntegerType => "long"
      case StringType => "string"
      case t => throw new IllegalArgumentException(
        s"bloom manifest supports BIGINT/INT/STRING keys, not $t")
    }
    val masks =
      if (kind == "long") udf((key: java.lang.Long) =>
        if (key == null) Array.empty[(Int, Long)]
        else positions(KeyBloom.longBytes(key), bits, k))
      else udf((s: String) =>
        if (s == null) Array.empty[(Int, Long)]
        else positions(KeyBloom.stringBytes(s), bits, k))
    val df = spark.read.parquet(files.map(_.toString): _*)
      .select(input_file_name().as("f"), explode(masks(col(keyCol))).as("m"))
      .groupBy(col("f"), col("m._1").as("idx"))
      .agg(expr("bit_or(m._2)").as("word"))
      .select(lit(keyCol).as("cname"), lit(kind).as("kind"),
        lit(bits).as("bits"), lit(k).as("k"),
        expr("url_decode(element_at(split(f, '/'), -1))").as("file"),
        col("idx"), col("word"))
    (df, kind)
  }

  /** Write `rows` as the manifest parquet at `manifestDir` (fresh dir),
    * range-sharded and sorted on (cname, idx) so probe pushdown prunes
    * row groups. No explicit shard count: AQE coalesces the range
    * exchange to byte-sized outputs, so a test-scale manifest lands in
    * one shard and a production-density one (≈ dense bits/8 per file)
    * fans out to as many as its bytes need — sizing by DATA, not by a
    * file-count heuristic that would misfire at one of the two regimes. */
  private def writeShards(rows: DataFrame, manifestDir: Path): Unit =
    rows.repartitionByRange(col("cname"), col("idx"))
      .sortWithinPartitions(col("cname"), col("idx"))
      .write.mode("overwrite").parquet(manifestDir.toString)

  /** Build (or extend) the LIVE version's bloom MANIFEST for `keyCol` at
    * `bits` — the 10⁶-file twin of [[KeyBloom.indexKeyBloom]]. Metadata
    * augmentation only; the build is distributed end to end (the driver
    * handles file NAMES). Extending an existing manifest rewrites it in
    * one executor pass (read ∪ fresh rows → re-shard); a crash mid-swap
    * leaves no manifest and every probe falls back to the stats ladder —
    * re-index to recover. Returns the number of files indexed. */
  def indexBloomManifest(spark: SparkSession, root: String, keyCol: String,
      bits: Int = KeyBloom.DefaultBits, k: Int = KeyBloom.NumHashes): Int = {
    val live = AtomicTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no live version at $root"))
    val liveDir = java.nio.file.Paths.get(root, live)
    TargetedDelete.requireFlatLayout(liveDir, "bloom manifest indexing")
    val files = TargetedDelete.partFiles(liveDir)
    val header = loadHeader(liveDir)
    val missing = files.filter(f => !header.contains((f.getFileName.toString, keyCol)))
    if (missing.isEmpty) return 0
    val (freshRows, kind) = buildRowsDf(spark, missing, keyCol, bits, k)
    val mPath = manifestPath(liveDir)
    val tmp = liveDir.resolve(s".$ManifestDir.tmp")
    AtomicTable.deleteRecursively(tmp)
    val all =
      if (Files.exists(mPath) && header.nonEmpty)
        spark.read.parquet(mPath.toString).unionByName(freshRows)
      else freshRows
    writeShards(all, tmp)
    AtomicTable.deleteRecursively(mPath)
    Files.move(tmp, mPath, StandardCopyOption.ATOMIC_MOVE)
    writeHeader(mPath, header ++ missing.map(f =>
      (f.getFileName.toString, keyCol) -> HeaderRow(kind, bits, k)))
    // first-bloom witness for the advisor's structural-vs-drift call
    Maintenance.recordBloomBaseline(spark, root, keyCol)
    missing.size
  }

  /** Distributed point probe: which covered files might contain any of
    * `keyBytes`? None when the version has no manifest rows of this
    * (column, kind) — caller falls back to the TSV/stats ladder — or when
    * the key set is beyond point-lookup size. The job collects admitted
    * file names ONLY. */
  def probe(spark: SparkSession, versionDir: Path, keyCol: String,
      kind: String, keyBytes: Seq[Array[Byte]]): Option[Probe] = {
    if (keyBytes.isEmpty || keyBytes.size > MaxProbeKeys) return None
    val header = loadHeader(versionDir).collect {
      case ((f, c), h) if c == keyCol && h.kind == kind => f -> h
    }
    if (header.isEmpty) return None
    val mPath = manifestPath(versionDir)
    if (!Files.exists(mPath)) return None
    val covered = header.keySet
    val combos = header.values.map(h => (h.bits, h.k)).toSet.toSeq
    val pos: Seq[(Int, Int, Int, Long, Int, Int)] = for {
      (bits, k) <- combos
      (kb, keyId) <- keyBytes.zipWithIndex
      (pws, i) <- positions(kb, bits, k).zipWithIndex
    } yield (bits, k, pws._1, pws._2, keyId, i)
    import spark.implicits._
    val posDf = pos.toDF("bits", "k", "idx", "mask", "keyId", "p")
    val idxs = pos.map(_._3).distinct
    val m0 = spark.read.parquet(mPath.toString)
      .filter(col("cname") === keyCol && col("kind") === kind)
    // scan pushdown on the sorted idx: the manifest prunes its own row
    // groups for a point probe
    val m = if (idxs.size <= MaxIdxPushdown)
      m0.filter(col("idx").isin(idxs.map(Int.box): _*)) else m0
    val admitted = m.join(broadcast(posDf), Seq("bits", "k", "idx"))
      .filter((col("word").bitwiseAND(col("mask"))) =!= 0L)
      .groupBy(col("file"), col("keyId"))
      .agg(countDistinct(col("p")).as("hits"), first(col("k")).as("kk"))
      .filter(col("hits") === col("kk"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    Some(Probe(covered, admitted))
  }

  /** Past this many shard files a staging pass COMPACTS the manifest
    * (filter to live rows + re-sort) instead of linking it forward — the
    * delta ledger's amortization bound. Each delta pass adds at most a
    * handful of shards, so a merge cadence pays one O(manifest) rewrite
    * per ~64 merges and O(batch) everywhere else. */
  val CompactShardThreshold = 64

  private def shardFiles(mPath: Path): Seq[Path] =
    if (!Files.isDirectory(mPath)) Seq.empty
    else {
      val st = Files.list(mPath)
      try st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally st.close()
    }

  /** BULK probe — the >10⁵-key regime the driver-built position list
    * cannot serve: `keys` arrive as a one-column DataFrame (the merge's
    * checkpointed distinct key set), explode to positions EXECUTOR-side,
    * and join the manifest distributed-to-distributed. Same admission
    * rule as [[probe]]; only admitted file NAMES are collected (O(files)
    * driver — the same class as the file listing itself). No idx
    * pushdown (a bulk key set touches most word indices anyway — the
    * join IS the filter). Returns None when the version has no manifest
    * rows of this (column, kind). */
  def probeBulk(spark: SparkSession, versionDir: Path, keyCol: String,
      kind: String, keys: DataFrame): Option[Probe] = {
    val header = loadHeader(versionDir).collect {
      case ((f, c), h) if c == keyCol && h.kind == kind => f -> h
    }
    if (header.isEmpty) return None
    val mPath = manifestPath(versionDir)
    if (!Files.exists(mPath)) return None
    val covered = header.keySet
    val combos = header.values.map(h => (h.bits, h.k)).toSet.toSeq
    val keyed = keys.toDF("__k")
    val posPerCombo = combos.map { case (bits, k) =>
      val posUdf =
        if (kind == "long") udf((key: java.lang.Long) =>
          if (key == null) Array.empty[(Int, Long, Int)]
          else positions(KeyBloom.longBytes(key), bits, k).zipWithIndex
            .map { case ((i, m), p) => (i, m, p) })
        else udf((s: String) =>
          if (s == null) Array.empty[(Int, Long, Int)]
          else positions(KeyBloom.stringBytes(s), bits, k).zipWithIndex
            .map { case ((i, m), p) => (i, m, p) })
      keyed.select(col("__k"), explode(posUdf(col("__k"))).as("m"))
        .select(lit(bits).as("bits"), lit(k).as("k"),
          col("m._1").as("idx"), col("m._2").as("mask"),
          col("__k").as("keyId"), col("m._3").as("p"))
    }
    val posDf = posPerCombo.reduce(_.unionByName(_))
    val m = spark.read.parquet(mPath.toString)
      .filter(col("cname") === keyCol && col("kind") === kind)
    val admitted = m.join(posDf, Seq("bits", "k", "idx"))
      .filter((col("word").bitwiseAND(col("mask"))) =!= 0L)
      .groupBy(col("file"), col("keyId"))
      .agg(countDistinct(col("p")).as("hits"), first(col("k")).as("kk"))
      .filter(col("hits") === col("kk"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    Some(Probe(covered, admitted))
  }

  /** Stage-side manifest lifecycle, DELTA-LEDGER shaped (the refinement
    * the first cut documented as future work): the predecessor's shard
    * files are HARD-LINKED into the stage manifest (O(1) metadata each)
    * and only the fresh files' rows are written as NEW shards — a
    * micro-batch merge pays O(batch) manifest IO, not O(manifest). Rows
    * for files the pass removed go STALE in the linked shards, which is
    * sound by construction: the header (rewritten every pass) defines
    * coverage, probes are consulted only for names in the live file
    * list, and writer-UUID part names are never reused — a stale row can
    * never be attributed to a live file. Staleness is bounded by
    * [[CompactShardThreshold]]: past it the pass compacts (semi-join to
    * the reused names + re-sort), and [[compactManifest]] offers the
    * same rewrite on demand. Fresh files rebuild per bloomed column at
    * the column's max declared (bits, k). Invoked from
    * [[KeyBloom.maintainStage]], so every staging pass (delete, merge,
    * compaction, recluster, append) self-maintains the manifest exactly
    * like the TSV sidecar. The whole pass is executor-side: the driver
    * never holds a bloom word. */
  private[sinks] def maintainStage(spark: SparkSession, liveDir: Path,
      stageDir: Path, reusedNames: Set[String]): Unit = {
    val header = loadHeader(liveDir)
    if (header.isEmpty) return
    val mPath = manifestPath(liveDir)
    if (!Files.exists(mPath)) return
    val freshFiles = TargetedDelete.partFiles(stageDir)
      .filterNot(p => reusedNames(p.getFileName.toString))
    // graceful lapse for dropped/retyped columns (mirrors the TSV path)
    val freshCols: Set[String] =
      if (freshFiles.isEmpty) Set.empty
      else spark.read.parquet(freshFiles.head.toString).schema.fields.collect {
        case f if Set[org.apache.spark.sql.types.DataType](
          LongType, IntegerType, StringType)(f.dataType) => f.name
      }.toSet
    val cols = header.keys.map(_._2).toSeq.distinct.sorted.filter(freshCols.contains)
    val freshPerCol = cols.map { c =>
      val hs = header.collect { case ((_, cc), h) if cc == c => h }
      val bits = hs.map(_.bits).max
      val k = hs.map(_.k).max
      (c, bits, k, buildRowsDf(spark, freshFiles, c, bits, k))
    }
    val outDir = manifestPath(stageDir)
    val oldShards = shardFiles(mPath)
    if (oldShards.size < CompactShardThreshold) {
      // DELTA pass: link the ledger forward, append only the batch's rows
      Files.createDirectories(outDir)
      oldShards.foreach { s =>
        try Files.createLink(outDir.resolve(s.getFileName.toString), s)
        catch {
          case _: UnsupportedOperationException |
               _: java.nio.file.FileSystemException =>
            Files.copy(s, outDir.resolve(s.getFileName.toString))
        }
      }
      if (freshPerCol.nonEmpty) {
        val tmp = stageDir.resolve(".KEYBLOOM_PQ.fresh")
        AtomicTable.deleteRecursively(tmp)
        writeShards(freshPerCol.map(_._4._1).reduce(_.unionByName(_)), tmp)
        TargetedDelete.moveStagedParts(tmp, outDir)
      }
    } else {
      // COMPACT pass: drop the accumulated stale rows, restore one
      // globally-sorted shard set
      import spark.implicits._
      val keepNames = reusedNames.toSeq.toDF("file")
      val carried = spark.read.parquet(mPath.toString)
        .join(keepNames, Seq("file"), "left_semi")
        .select(col("cname"), col("kind"), col("bits"), col("k"),
          col("file"), col("idx"), col("word"))
      writeShards((carried +: freshPerCol.map(_._4._1)).reduce(_.unionByName(_)),
        outDir)
    }
    val carriedHeader = header.filter { case ((f, _), _) => reusedNames(f) }
    val freshHeader = freshPerCol.flatMap { case (c, bits, k, (_, kind)) =>
      freshFiles.map(f => (f.getFileName.toString, c) -> HeaderRow(kind, bits, k))
    }.toMap
    writeHeader(outDir, carriedHeader ++ freshHeader)
  }

  /** On-demand manifest compaction of the LIVE version: rewrite the shard
    * set filtered to the live file list (dropping every delta pass's
    * stale rows), re-sorted for probe pushdown. Metadata-only from the
    * table's point of view — data files and the header are untouched.
    * Returns the shard count after. */
  def compactManifest(spark: SparkSession, root: String): Int = {
    val live = AtomicTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no live version at $root"))
    val liveDir = java.nio.file.Paths.get(root, live)
    val mPath = manifestPath(liveDir)
    if (!Files.exists(mPath) || loadHeader(liveDir).isEmpty) return 0
    import spark.implicits._
    val liveNames = TargetedDelete.partFiles(liveDir)
      .map(_.getFileName.toString).toDF("file")
    val compacted = spark.read.parquet(mPath.toString)
      .join(liveNames, Seq("file"), "left_semi")
      .select(col("cname"), col("kind"), col("bits"), col("k"),
        col("file"), col("idx"), col("word"))
    val header = loadHeader(liveDir)
    val tmp = liveDir.resolve(s".$ManifestDir.tmp")
    AtomicTable.deleteRecursively(tmp)
    writeShards(compacted, tmp)
    AtomicTable.deleteRecursively(mPath)
    Files.move(tmp, mPath, StandardCopyOption.ATOMIC_MOVE)
    writeHeader(mPath, header)
    shardFiles(mPath).size
  }
}
