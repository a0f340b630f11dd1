package graft.sinks

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHARDED PARQUET BLOOM MANIFEST — the bloom probe past driver scale
  * (r18 verdict, the round's headline). The `_KEYBLOOM.tsv` sidecar
  * ([[KeyBloom]]) materializes EVERY file's bloom on the driver per probe;
  * at its own mandated production sizing (`bitsFor` caps at 8 MB/file)
  * that is ~80 GB of driver heap at just 10⁴ production files — the one
  * boundary between this table format and the 100 TB dedup gate. This
  * backend removes it with the Iceberg manifest move: the blooms become
  * DATA — a parquet table under `_KEYBLOOM_PQ/` inside the version
  * directory — and the probe becomes a Spark JOB that collects ONLY
  * admitted file names, never a bloom word.
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
  * LAYOUT — generations under one atomic pointer: shards live in
  * `_KEYBLOOM_PQ/g{N}/`, and the single-file `_HEADER.tsv` (replaced by
  * ATOMIC_MOVE, like every pointer in this repo) names the live
  * generation on its `@gen` line. A rebuild (index extension, manifest
  * compaction) writes the NEXT generation completely, flips the header,
  * and prunes all generations but the new one and its immediate
  * predecessor — so an in-flight probe that resolved the old header
  * keeps its shards for a full generation (the AtomicTable KeepVersions
  * discipline applied to the manifest itself), a crash before the flip
  * leaves the old manifest intact, and a crash after it leaves only an
  * orphan directory the next rebuild clears. Readers never observe an
  * absent or half-deleted manifest.
  *
  * PROBE — one equi-join, no bloom ever crosses to the driver: each probe
  * key explodes to its k `(bits, k, idx, mask)` positions (same
  * [[KeyBloom.hashPair]] double-hash walk as the build side, per distinct
  * (bits, k) in the header); positions join manifest rows on
  * `(bits, k, idx)`; a key hits a file's position iff the word covers the
  * mask, and a file is ADMITTED iff some key hits ALL k of its positions
  * (`countDistinct(position) == k` — an absent row is a zero word, a
  * miss, and inner-join absence encodes it for free). [[probe]] builds
  * positions on the driver (point lookups), [[probeBulk]] explodes them
  * executor-side from a key DataFrame (the >10⁵-key merge regime); both
  * share one admission pipeline. Driver traffic is the admitted names —
  * O(result), not O(files·bits). Callers gate the job on a non-empty
  * stats-admitted candidate set, so an already-pruned operation never
  * pays a manifest scan.
  *
  * HEADER — one line per (file, column): kind/bits/k. Coverage and sizing
  * are driver decisions over file NAMES (the same O(files) class as
  * `_KEYSTATS` itself — names, not bloom payloads); 0-row files appear in
  * the header but have no word rows, so every probe misses them:
  * whole-file skip by construction.
  *
  * MAINTENANCE — DELTA-LEDGER shaped: a staging pass HARD-LINKS the live
  * generation's shards into the stage manifest (O(1) metadata each) and
  * appends only the fresh files' rows as new shards — a micro-batch merge
  * pays O(batch) manifest IO, not O(manifest). Rows for removed files go
  * stale in the linked shards, which is sound by construction: the header
  * (rewritten every pass) defines coverage, probes are consulted only for
  * names in the live file list, and writer-UUID part names are never
  * reused. Staleness is bounded by [[CompactShardThreshold]] (past it the
  * pass compacts via the semi-join rewrite) and [[compactManifest]] offers
  * the same rewrite on demand. A column a full-rewrite kernel drops lapses
  * gracefully, mirroring the TSV path. [[AtomicTable.restoreVersion]]
  * carries the manifest by hard-linking its shards.
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
    * the position list is driver-built, so [[probe]] declines and the
    * caller uses [[probeBulk]] or stays on the stats ladder. */
  val MaxProbeKeys: Int = KeyedMerge.DriverKeyThreshold

  /** Past this many shard files a staging pass COMPACTS the manifest
    * (filter to live rows + re-sort) instead of linking it forward — the
    * delta ledger's amortization bound. Each delta pass adds at most a
    * handful of shards, so a merge cadence pays one O(manifest) rewrite
    * per ~64 merges and O(batch) everywhere else. */
  val CompactShardThreshold = 64

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

  private def headerLines(versionDir: Path): Seq[String] = {
    val p = manifestPath(versionDir).resolve(HeaderFile)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
  }

  def loadHeader(versionDir: Path): Map[(String, String), HeaderRow] =
    headerLines(versionDir).filterNot(_.startsWith("@")).map { line =>
      val a = line.split("\t", 5)
      (dec(a(0)), dec(a(1))) -> HeaderRow(a(2), a(3).toInt, a(4).toInt)
    }.toMap

  /** The live shard generation named by the header's `@gen` line. */
  private def liveGen(versionDir: Path): Option[String] =
    headerLines(versionDir).collectFirst {
      case l if l.startsWith("@gen\t") => l.split("\t", 2)(1)
    }

  /** The live generation's shard directory, if the manifest is intact. */
  def shardDir(versionDir: Path): Option[Path] =
    liveGen(versionDir).map(manifestPath(versionDir).resolve)
      .filter(Files.isDirectory(_))

  private def writeHeader(manifestDir: Path, gen: String,
      rows: Map[(String, String), HeaderRow]): Unit = {
    val body = (s"@gen\t$gen" +: rows.toSeq.sortBy(_._1).map { case ((f, c), h) =>
      s"${enc(f)}\t${enc(c)}\t${h.kind}\t${h.bits}\t${h.k}"
    }).mkString("\n")
    Files.createDirectories(manifestDir)
    val tmp = manifestDir.resolve(s".$HeaderFile.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestDir.resolve(HeaderFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Next generation name: one past the largest on disk (crashed orphans
    * included, so a retry never collides with its own debris). */
  private def nextGen(manifestDir: Path): String = {
    val n =
      if (!Files.isDirectory(manifestDir)) 0L
      else {
        val st = Files.list(manifestDir)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(s => s.startsWith("g") && s.drop(1).nonEmpty &&
            s.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).foldLeft(0L)(math.max)
        finally st.close()
      }
    s"g${n + 1}"
  }

  /** Drop every generation but `keep` — called AFTER a header flip, so
    * the predecessor in `keep` gives in-flight probes their grace. */
  private def pruneGens(manifestDir: Path, keep: Set[String]): Unit = {
    if (!Files.isDirectory(manifestDir)) return
    val st = Files.list(manifestDir)
    val stale =
      try st.iterator().asScala.filter(p => Files.isDirectory(p) &&
        !keep(p.getFileName.toString)).toList
      finally st.close()
    stale.foreach(AtomicTable.deleteRecursively)
  }

  /** Columns the live manifest blooms (staging rewrites add native blooms
    * for these too, like the TSV path). */
  private[sinks] def coveredColumns(versionDir: Path): Set[String] =
    loadHeader(versionDir).keys.map(_._2).toSet

  /** Files the manifest covers for (keyCol, kind) — header-only, no job.
    * Callers use this to build the stats-admitted candidate set BEFORE
    * paying for a probe job. */
  private[sinks] def coveredFiles(versionDir: Path, keyCol: String,
      kind: String): Set[String] =
    loadHeader(versionDir).collect {
      case ((f, c), h) if c == keyCol && h.kind == kind => f
    }.toSet

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
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
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
    val masked = spark.read.parquet(files.map(_.toString): _*)
      .select(input_file_name().as("f"), explode(masks(col(keyCol))).as("m"))
    (rowsFromMasks(masked, keyCol, kind, bits, k), kind)
  }

  /** The shared row shape both build regimes reduce into. */
  private def rowsFromMasks(masked: DataFrame, cname: String, kind: String,
      bits: Int, k: Int): DataFrame =
    masked.groupBy(col("f"), col("m._1").as("idx"))
      .agg(expr("bit_or(m._2)").as("word"))
      .select(lit(cname).as("cname"), lit(kind).as("kind"),
        lit(bits).as("bits"), lit(k).as("k"),
        expr("url_decode(element_at(split(f, '/'), -1))").as("file"),
        col("idx"), col("word"))

  /** [[buildRowsDf]] dispatching on the column name: a COMPOSITE name
    * ([[CompositeKey.Sep]]-joined components) hashes the length-framed
    * canonical tuple bytes under the single composite cname — the probe
    * side ([[probe]]/[[probeBulkBytes]]) is already generic over
    * (cname, kind, bytes) and needs nothing. */
  private def buildRowsDfFor(spark: SparkSession, files: Seq[Path],
      cname: String, bits: Int, k: Int): (DataFrame, String) =
    if (!CompositeKey.isComposite(cname)) buildRowsDf(spark, files, cname, bits, k)
    else {
      require(bits >= 64 && (bits & (bits - 1)) == 0,
        s"bits must be a power of two >= 64: $bits")
      val keyCols = CompositeKey.componentsOf(cname)
      val schema = spark.read.parquet(files.head.toString).schema
      val kinds = CompositeKey.kindsOf(schema, keyCols).getOrElse(
        throw new IllegalArgumentException(
          s"composite bloom manifest supports BIGINT/INT/STRING components, got " +
            keyCols.map(c => schema(c).dataType).mkString(", ")))
      val kind = CompositeKey.kindName(kinds)
      val masks = udf((b: Array[Byte]) =>
        if (b == null) Array.empty[(Int, Long)] else positions(b, bits, k))
      val bytesCol = CompositeKey.bytesUdf(kinds)(
        struct(CompositeKey.keySelect(kinds, keyCols): _*))
      val masked = spark.read.parquet(files.map(_.toString): _*)
        .select(input_file_name().as("f"), explode(masks(bytesCol)).as("m"))
      (rowsFromMasks(masked, cname, kind, bits, k), kind)
    }

  /** Write `rows` as a shard generation, range-sharded and sorted on
    * (cname, idx) so probe pushdown prunes row groups. No explicit shard
    * count: AQE coalesces the range exchange to byte-sized outputs, so a
    * test-scale manifest lands in one shard and a production-density one
    * (≈ dense bits/8 per file) fans out to as many as its bytes need —
    * sizing by DATA, not by a file-count heuristic that would misfire at
    * one of the two regimes. */
  private def writeShards(rows: DataFrame, genDir: Path): Unit =
    rows.repartitionByRange(col("cname"), col("idx"))
      .sortWithinPartitions(col("cname"), col("idx"))
      .write.mode("overwrite").parquet(genDir.toString)

  /** Publish `rows` as the live version's next manifest generation:
    * write the new generation completely, flip the header atomically,
    * prune all but {new, predecessor}. Crash before the flip → old
    * manifest intact (orphan generation cleared by the next attempt);
    * crash after it → fully consistent. */
  private def publishGen(spark: SparkSession, liveDir: Path, rows: DataFrame,
      header: Map[(String, String), HeaderRow]): Unit = {
    val mPath = manifestPath(liveDir)
    val prev = liveGen(liveDir)
    val gen = nextGen(mPath)
    val genDir = mPath.resolve(gen)
    AtomicTable.deleteRecursively(genDir)
    writeShards(rows, genDir)
    writeHeader(mPath, gen, header)
    pruneGens(mPath, Set(gen) ++ prev)
  }

  /** Build (or extend) the LIVE version's bloom MANIFEST for `keyCol` at
    * `bits` — the 10⁶-file twin of [[KeyBloom.indexKeyBloom]]. Metadata
    * augmentation only; the build is distributed end to end (the driver
    * handles file NAMES). Extending an existing manifest rewrites it as
    * the next generation in one executor pass (read ∪ fresh rows →
    * re-shard) under the atomic header flip. Returns the number of files
    * indexed. */
  def indexBloomManifest(spark: SparkSession, root: String, keyCol: String,
      bits: Int = KeyBloom.DefaultBits, k: Int = KeyBloom.NumHashes): Int =
    indexManifestFor(spark, root, keyCol, bits, k)

  /** [[indexBloomManifest]]'s COMPOSITE twin: manifest-bloom the key TUPLE
    * under one manifest column — the >= 10⁶-file path for composite point
    * merges/deletes/reads ([[CompositeKey]]). */
  def indexBloomManifestTuple(spark: SparkSession, root: String,
      keyCols: Seq[String], bits: Int = KeyBloom.DefaultBits,
      k: Int = KeyBloom.NumHashes): Int = {
    require(keyCols.size >= 2, "composite manifest needs >= 2 key columns")
    indexManifestFor(spark, root, CompositeKey.colName(keyCols), bits, k)
  }

  private def indexManifestFor(spark: SparkSession, root: String, keyCol: String,
      bits: Int, k: Int): Int = {
    val live = AtomicTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no live version at $root"))
    val liveDir = java.nio.file.Paths.get(root, live)
    TargetedDelete.requireFlatLayout(liveDir, "bloom manifest indexing")
    val files = TargetedDelete.partFiles(liveDir)
    val header = loadHeader(liveDir)
    // orphan sweep BEFORE the early return (r19 advice): a crash between a
    // prior migration's header flip and its legacy-shard deletion leaves
    // top-level pre-generation shards behind, and the retry would hit the
    // missing.isEmpty return before ever reaching the cleanup — dead bytes
    // forever. With a live generation the header owns coverage, so any
    // top-level shard is provably stale.
    if (shardDir(liveDir).isDefined)
      shardFiles(manifestPath(liveDir)).foreach(Files.deleteIfExists(_))
    val missing = files.filter(f => !header.contains((f.getFileName.toString, keyCol)))
    if (missing.isEmpty) return 0
    val (freshRows, kind) = buildRowsDfFor(spark, missing, keyCol, bits, k)
    // carry: live generation first; a LEGACY (pre-generation) manifest's
    // top-level shards migrate into the new generation; a header with no
    // rows anywhere is STALE COVERAGE and must be dropped, not republished
    // — coverage without rows would read as "provably key-free" everywhere
    val legacy = shardFiles(manifestPath(liveDir))
    val (carriedRows, carriedHeader) = shardDir(liveDir) match {
      case Some(d) if header.nonEmpty =>
        (Some(spark.read.parquet(d.toString)), header)
      case None if header.nonEmpty && legacy.nonEmpty =>
        (Some(spark.read.parquet(legacy.map(_.toString): _*)), header)
      case _ => (None, Map.empty[(String, String), HeaderRow])
    }
    val all = carriedRows.fold(freshRows)(_.unionByName(freshRows))
    publishGen(spark, liveDir, all, carriedHeader ++ missing.map(f =>
      (f.getFileName.toString, keyCol) -> HeaderRow(kind, bits, k)))
    // a migrated legacy layout leaves its top-level shards behind — gone
    // now that the generation holds their rows
    if (shardDir(liveDir).isDefined) legacy.foreach(Files.deleteIfExists(_))
    // first-bloom witness for the advisor's structural-vs-drift call
    Maintenance.recordBloomBaseline(spark, root, keyCol)
    missing.size
  }

  /** The shared admission pipeline both probe regimes feed: join position
    * rows against the manifest on (bits, k, idx), a key hits a file's
    * position iff the word covers the mask, and a file is admitted iff
    * some key hits ALL k of its positions. Collects admitted NAMES only. */
  private def admit(m: DataFrame, posDf: DataFrame): Set[String] =
    m.join(posDf, Seq("bits", "k", "idx"))
      .filter((col("word").bitwiseAND(col("mask"))) =!= 0L)
      .groupBy(col("file"), col("keyId"))
      .agg(countDistinct(col("p")).as("hits"), first(col("k")).as("kk"))
      .filter(col("hits") === col("kk"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet

  /** Distributed point probe: which covered files might contain any of
    * `keyBytes`? None when the version has no manifest of this
    * (column, kind) — caller falls back to the TSV/stats ladder — or when
    * the key set is beyond point-lookup size. */
  def probe(spark: SparkSession, versionDir: Path, keyCol: String,
      kind: String, keyBytes: Seq[Array[Byte]]): Option[Probe] = {
    if (keyBytes.isEmpty || keyBytes.size > MaxProbeKeys) return None
    val header = loadHeader(versionDir).collect {
      case ((f, c), h) if c == keyCol && h.kind == kind => f -> h
    }
    if (header.isEmpty) return None
    val mDir = shardDir(versionDir).getOrElse(return None)
    val covered = header.keySet
    val combos = header.values.map(h => (h.bits, h.k)).toSet.toSeq
    val pos: Seq[(Int, Int, Int, Long, Int, Int)] = for {
      (bits, k) <- combos
      (kb, keyId) <- keyBytes.zipWithIndex
      (pws, i) <- positions(kb, bits, k).zipWithIndex
    } yield (bits, k, pws._1, pws._2, keyId, i)
    import spark.implicits._
    val posDf = broadcast(pos.toDF("bits", "k", "idx", "mask", "keyId", "p"))
    val idxs = pos.map(_._3).distinct
    val m0 = spark.read.parquet(mDir.toString)
      .filter(col("cname") === keyCol && col("kind") === kind)
    // scan pushdown on the sorted idx: the manifest prunes its own row
    // groups for a point probe
    val m = if (idxs.size <= MaxIdxPushdown)
      m0.filter(col("idx").isin(idxs.map(Int.box): _*)) else m0
    val admitted = admit(m, posDf)
    recordProbe(versionDir, keyCol, mDir, admitted.size)
    Some(Probe(covered, admitted))
  }

  /** Probe-cost telemetry (r19 verdict item 5): every probe appends
    * `probe <cname> <shardsScanned> <admitted>` to the table's operations
    * log — [[Maintenance.adviseManifest]] reads it to recommend manifest
    * compaction from OBSERVED cost (a delta-ledger-bloated shard set makes
    * every probe scan more files even when the row volume is flat), not
    * just the staging pass's shard-count threshold. Best-effort like all
    * telemetry; a probe never fails because its line could not land. */
  /** Shard count per GENERATION dir, cached (r20 advice item 4): a
    * generation's shard set is immutable once published (publishGen writes
    * a fresh gen-N dir and flips the header), so re-listing the directory
    * on EVERY probe — multiplied by the per-column probes of a composite
    * assignment — was pure read-path overhead for best-effort telemetry.
    * Bounded: entries are tiny and generations are pruned; evict beyond a
    * generous cap so a long-lived session over many tables stays flat. */
  private val shardCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def shardCount(mDir: Path): Int = {
    if (shardCounts.size > 4096) shardCounts.clear()
    shardCounts.computeIfAbsent(mDir.toString, _ => shardFiles(mDir).size)
  }

  private def recordProbe(versionDir: Path, cname: String, mDir: Path,
      admitted: Int): Unit = {
    val root = Option(versionDir.getParent).map(_.toString).getOrElse(return)
    Maintenance.recordProbe(root, cname, shardCount(mDir), admitted)
  }

  /** BULK probe — the >10⁵-key regime the driver-built position list
    * cannot serve: `keys` arrive as a one-column DataFrame (the merge's
    * checkpointed distinct key set), explode to positions EXECUTOR-side,
    * and join the manifest distributed-to-distributed. Same admission
    * rule as [[probe]] via the shared pipeline. No idx pushdown (a bulk
    * key set touches most word indices anyway — the join IS the filter). */
  def probeBulk(spark: SparkSession, versionDir: Path, keyCol: String,
      kind: String, keys: DataFrame): Option[Probe] = {
    val toBytes =
      if (kind == "long") udf((key: java.lang.Long) =>
        if (key == null) null else KeyBloom.longBytes(key))
      else udf((s: String) =>
        if (s == null) null else KeyBloom.stringBytes(s))
    probeBulkBytes(spark, versionDir, keyCol, kind,
      keys.toDF("__k").select(toBytes(col("__k")).as("__k")))
  }

  /** The BYTES-generic bulk probe both the typed form and the COMPOSITE
    * assignment feed ([[CompositeKey.touched]]'s distributed regime): the
    * key frame arrives as ONE binary column of canonical bytes, explodes
    * to positions executor-side, and joins the manifest
    * distributed-to-distributed — the probe layer never knows whether the
    * bytes frame a single value or a length-framed tuple. */
  def probeBulkBytes(spark: SparkSession, versionDir: Path, keyCol: String,
      kind: String, keyBytes: DataFrame): Option[Probe] = {
    val header = loadHeader(versionDir).collect {
      case ((f, c), h) if c == keyCol && h.kind == kind => f -> h
    }
    if (header.isEmpty) return None
    val mDir = shardDir(versionDir).getOrElse(return None)
    val covered = header.keySet
    val combos = header.values.map(h => (h.bits, h.k)).toSet.toSeq
    val keyed = keyBytes.toDF("__k").na.drop()
    val posPerCombo = combos.map { case (bits, k) =>
      val posUdf = udf((b: Array[Byte]) =>
        if (b == null) Array.empty[(Int, Long, Int)]
        else positions(b, bits, k).zipWithIndex
          .map { case ((i, m), p) => (i, m, p) })
      keyed.select(col("__k"), explode(posUdf(col("__k"))).as("m"))
        .select(lit(bits).as("bits"), lit(k).as("k"),
          col("m._1").as("idx"), col("m._2").as("mask"),
          base64(col("__k")).as("keyId"), col("m._3").as("p"))
    }
    val m = spark.read.parquet(mDir.toString)
      .filter(col("cname") === keyCol && col("kind") === kind)
    val admitted = admit(m, posPerCombo.reduce(_.unionByName(_)))
    recordProbe(versionDir, keyCol, mDir, admitted.size)
    Some(Probe(covered, admitted))
  }

  private def shardFiles(genDir: Path): Seq[Path] =
    if (!Files.isDirectory(genDir)) Seq.empty
    else {
      val st = Files.list(genDir)
      try st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally st.close()
    }

  /** Stage-side manifest lifecycle (see the object doc's MAINTENANCE
    * section): DELTA pass links the live generation's shards into the
    * stage's `g1` and appends only fresh rows; past
    * [[CompactShardThreshold]] shards it compacts instead. Invoked from
    * [[KeyBloom.maintainStage]], so every staging pass (delete, merge,
    * compaction, recluster, append) self-maintains the manifest exactly
    * like the TSV sidecar. Executor-side throughout: the driver never
    * holds a bloom word. */
  private[sinks] def maintainStage(spark: SparkSession, liveDir: Path,
      stageDir: Path, reusedNames: Set[String]): Unit = {
    val header = loadHeader(liveDir)
    if (header.isEmpty) return
    // a LEGACY (pre-generation) manifest's top-level shards serve as the
    // live shard set — the staging pass migrates them into the stage's
    // generation instead of silently dropping the index; a header with no
    // rows anywhere is stale coverage and lapses (correctly: coverage
    // without rows must never propagate)
    val liveShards = shardDir(liveDir)
      .getOrElse {
        val legacy = shardFiles(manifestPath(liveDir))
        if (legacy.isEmpty) return else manifestPath(liveDir)
      }
    val freshFiles = TargetedDelete.partFiles(stageDir)
      .filterNot(p => reusedNames(p.getFileName.toString))
    // graceful lapse for dropped/retyped columns (mirrors the TSV path)
    val freshCols: Set[String] =
      if (freshFiles.isEmpty) Set.empty
      else KeyBloom.bloomableCols(spark, freshFiles.head)
    // composite columns survive iff every component does (same graceful
    // lapse as the TSV path)
    val cols = header.keys.map(_._2).toSeq.distinct.sorted
      .filter(c => CompositeKey.componentsOf(c).forall(freshCols.contains))
    val freshPerCol = cols.map { c =>
      val hs = header.collect { case ((_, cc), h) if cc == c => h }
      val bits = hs.map(_.bits).max
      val k = hs.map(_.k).max
      (c, bits, k, buildRowsDfFor(spark, freshFiles, c, bits, k))
    }
    val outM = manifestPath(stageDir)
    val outGen = outM.resolve("g1")
    val old = shardFiles(liveShards)
    if (old.size < CompactShardThreshold) {
      // DELTA pass: link the ledger forward, append only the batch's rows
      Files.createDirectories(outGen)
      old.foreach(s =>
        TargetedDelete.linkOrCopyStrict(s, outGen.resolve(s.getFileName.toString)))
      if (freshPerCol.nonEmpty) {
        val tmp = stageDir.resolve(".KEYBLOOM_PQ.fresh")
        AtomicTable.deleteRecursively(tmp)
        writeShards(freshPerCol.map(_._4._1).reduce(_.unionByName(_)), tmp)
        TargetedDelete.moveStagedParts(tmp, outGen)
      }
    } else {
      // COMPACT pass: drop the accumulated stale rows, restore one
      // globally-sorted shard set
      import spark.implicits._
      val keepNames = reusedNames.toSeq.toDF("file")
      // explicit shard paths, not the directory: a legacy manifest dir may
      // also hold a crashed rebuild's orphan generation subdirectory
      val carried = spark.read.parquet(old.map(_.toString): _*)
        .join(keepNames, Seq("file"), "left_semi")
        .select(col("cname"), col("kind"), col("bits"), col("k"),
          col("file"), col("idx"), col("word"))
      writeShards((carried +: freshPerCol.map(_._4._1)).reduce(_.unionByName(_)),
        outGen)
    }
    val carriedHeader = header.filter { case ((f, _), _) => reusedNames(f) }
    val freshHeader = freshPerCol.flatMap { case (c, bits, k, (_, kind)) =>
      freshFiles.map(f => (f.getFileName.toString, c) -> HeaderRow(kind, bits, k))
    }.toMap
    writeHeader(outM, "g1", carriedHeader ++ freshHeader)
  }

  /** On-demand manifest compaction of the LIVE version: rewrite the shard
    * set filtered to the live file list (dropping every delta pass's
    * stale rows) as the next generation under the atomic header flip.
    * Metadata-only from the table's point of view — data files and header
    * entries are untouched. Returns the live generation's shard count. */
  def compactManifest(spark: SparkSession, root: String): Int = {
    val live = AtomicTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no live version at $root"))
    val liveDir = java.nio.file.Paths.get(root, live)
    val header = loadHeader(liveDir)
    val mDir = shardDir(liveDir)
    if (header.isEmpty || mDir.isEmpty) return 0
    import spark.implicits._
    val liveNames = TargetedDelete.partFiles(liveDir)
      .map(_.getFileName.toString).toDF("file")
    val compacted = spark.read.parquet(mDir.get.toString)
      .join(liveNames, Seq("file"), "left_semi")
      .select(col("cname"), col("kind"), col("bits"), col("k"),
        col("file"), col("idx"), col("word"))
    publishGen(spark, liveDir, compacted, header)
    shardDir(liveDir).map(shardFiles(_).size).getOrElse(0)
  }
}
