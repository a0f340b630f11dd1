package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** S22 — TARGETED ROW DELETE on the atomic table (beyond-reference, the
  * GDPR/"opted-out documents" move a training-data lakehouse cannot skip):
  * delete a key set from the live version by rewriting ONLY the data files
  * whose parquet FOOTER statistics intersect the keys, and carrying every
  * untouched file into the new version as a HARD LINK — O(1) per file, no
  * data movement, exactly the remove-file/add-file reuse a Delta/Iceberg
  * commit log expresses by reference (reference: the engine's own
  * AtomicTable protocol; the reference pipeline's deletes are Postgres row
  * deletes, utils/database.py — this is the lakehouse re-expression).
  *
  * Scale shape: the pruning decision reads footer METADATA only (one
  * ~KB-sized read per file, no row groups); the rewrite job scans just the
  * intersecting files; the link step is metadata-only. On an id-clustered
  * layout (range-partitioned write — the natural layout for a corpus keyed
  * by doc_id), a clustered delete set (one user / one source's documents)
  * touches a handful of files no matter how large the table is. Version
  * pruning stays safe under links: deleting an old version's directory
  * unlinks names, never inodes, so the new version's linked files survive.
  *
  * Cross-filesystem fallback: if the stage directory cannot hard-link to
  * the live files (different device), the file is copied — same semantics,
  * the reuse is an optimization, not a correctness dependency. */
object TargetedDelete {

  /** What the delete touched — the audit row a maintenance job logs. */
  final case class DeleteStats(version: String, totalFiles: Int,
      rewrittenFiles: Int, reusedFiles: Int)

  /** Parquet part files of a directory (skips markers/CRCs). */
  private def partFiles(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    finally st.close()
  }

  /** Does `f`'s footer admit any of `sorted` in some row group's
    * [min, max] for `keyCol`? Missing/empty statistics are treated as
    * intersecting (conservative: rewrite rather than silently keep). */
  private def footerIntersects(f: Path, keyCol: String, sorted: Array[Long]): Boolean = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getBlocks.asScala.exists { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == keyCol) match {
          case None => true
          case Some(cc) =>
            val st = cc.getStatistics
            if (st == null || !st.hasNonNullValue) true
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                // any key in [mn, mx]: first key >= mn must be <= mx
                val i = {
                  val idx = java.util.Arrays.binarySearch(sorted, mn.longValue)
                  if (idx >= 0) idx else -idx - 1
                }
                i < sorted.length && sorted(i) <= mx.longValue
              case _ => true
            }
        }
      }
    } finally r.close()
  }

  /** Link (or copy, cross-device) `src` into `dir` under its own name. */
  private def linkInto(dir: Path, src: Path): Unit = {
    val dst = dir.resolve(src.getFileName)
    try Files.createLink(dst, src)
    catch { case _: UnsupportedOperationException | _: java.io.IOException =>
      Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES) }
  }

  /** Delete all rows whose `keyCol` (BIGINT) is in `keys` from the live
    * version of the AtomicTable at `root`, publishing the result as the next
    * version. Single-writer path (composes with [[AtomicTable.commit]]'s
    * cadence; for concurrent writers run it through mergeCommit's merge
    * function instead). */
  def deleteKeys(spark: SparkSession, root: String, keyCol: String,
      keys: Seq[Long]): DeleteStats = {
    val live = AtomicTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no live version at $root"))
    val liveDir = Paths.get(root, live)
    val files = partFiles(liveDir)
    val sorted = keys.distinct.sorted.toArray
    val (touched, reused) = files.partition(footerIntersects(_, keyCol, sorted))

    val stageDir = Paths.get(root, s".stage-del-${java.util.UUID.randomUUID()}")
    Files.createDirectories(stageDir)
    if (touched.nonEmpty) {
      // one job over ONLY the intersecting files
      val rewriteOut = stageDir.resolve("rewrite")
      // NULL keys are never in the delete set — keep them explicitly:
      // NOT(NULL IN (...)) is NULL and a bare filter would DROP such rows
      spark.read.parquet(touched.map(_.toString): _*)
        .filter(col(keyCol).isNull || !col(keyCol).isin(sorted.map(Long.box): _*))
        .write.mode("overwrite").parquet(rewriteOut.toString)
      partFiles(rewriteOut).foreach { f =>
        Files.move(f, stageDir.resolve(f.getFileName))
      }
      val rest = Files.list(rewriteOut)
      try rest.iterator().asScala.toSeq.foreach(Files.delete)
      finally rest.close()
      Files.delete(rewriteOut)
    }
    reused.foreach(linkInto(stageDir, _))

    val next = "v" + (live.drop(1).toLong + 1)
    Files.move(stageDir, Paths.get(root, next), StandardCopyOption.ATOMIC_MOVE)
    AtomicTable.publish(root, next)
    DeleteStats(next, files.size, touched.size, reused.size)
  }

  // ---- declared query -------------------------------------------------

  /** The opted-out set: one contiguous id block (a withdrawn source's docs
    * on the id-clustered layout) plus two singletons. Present at every SF
    * (ids < 500). */
  val DeleteFrom = 100L; val DeleteTo = 299L
  val DeleteSingles: Seq[Long] = Seq(7L, 421L)
  def deleteSet: Seq[Long] = (DeleteFrom to DeleteTo) ++ DeleteSingles

  def tableRoot(dir: String): String =
    "spark-warehouse/s22_docs_" + new java.io.File(dir).getName

  /** Build the id-clustered corpus table, delete the opted-out set through
    * the footer-pruned path, and aggregate the SURVIVING live version — the
    * oracle replays the survivor aggregate over the parquet source, so the
    * hash row covers layout, pruning, rewrite, link reuse, and the version
    * flip end to end. */
  def qS22TargetedDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = tableRoot(dir)
    AtomicTable.deleteRecursively(Paths.get(root))
    AtomicTable.commit(
      Tables.documents(spark, dir)
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions(col("doc_id")), root)
    deleteKeys(spark, root, "doc_id", deleteSet)
    spark.read.parquet(s"$root/${AtomicTable.currentVersion(root).get}")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id")).as("sum_ids"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s22_targeted_delete" -> (qS22TargetedDelete _))

  val oracles: Map[String, String] = Map(
    "s22_targeted_delete" ->
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents
         |WHERE NOT (doc_id BETWEEN $DeleteFrom AND $DeleteTo
         |           OR doc_id IN (${DeleteSingles.mkString(", ")}))
         |GROUP BY lang, source""".stripMargin)
}
