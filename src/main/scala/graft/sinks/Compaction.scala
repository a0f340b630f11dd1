package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** S18 — size-aware SMALL-FILE COMPACTION, the table-maintenance half of the
  * sink story (S9/S10 mutate state, S16/S17 lay data out; this repairs the
  * layout drift that incremental writers leave behind). Every micro-batch
  * appender and every over-parallel writer fragments partition directories
  * into kilobyte files; at 100 TB the scan-planning and open() overhead of
  * millions of small files dominates query time, so compactors run as
  * routine maintenance (Delta OPTIMIZE, Iceberg rewrite_data_files — this
  * is that operator on plain parquet).
  *
  * Shape, deliberately scale-honest:
  *  - the DECISION is metadata-only: directory listing → per-partition
  *    (file count, bytes) → target file count `max(1, ceil(bytes/target))`;
  *    only partitions holding MORE files than their target are touched;
  *  - the REWRITE is one job, not a per-partition loop: affected partitions
  *    are read back with a partition-pruned filter, hash-repartitioned on
  *    (partition, salt) where salt < the partition's target count — each
  *    (partition, salt) combo lands in exactly one task, so a directory
  *    receives at most its target number of files;
  *  - the COMMIT uses dynamic partition overwrite (a write-local option, no
  *    session conf leak): only rewritten directories are replaced —
  *    CompactionSpec pins byte-identical survival of untouched partitions.
  */
object Compaction {

  def tableDir(dir: String): String =
    "spark-warehouse/s18_events_frag_" + new java.io.File(dir).getName

  val FragmentFiles = 8      // deliberate writer over-parallelism
  val TargetBytes = 4L << 20 // 4 MiB target → one file per directory here

  /** The fragmented starting state: an over-parallel partitioned write
    * ([[FragmentFiles]] files in every event_type directory). */
  def fragmentWrite(spark: SparkSession, dir: String): String = {
    val out = tableDir(dir)
    Tables.events(spark, dir)
      .repartition(FragmentFiles)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    out
  }

  /** Metadata-only partition census: partition value → (files, bytes). */
  def partitionStats(spark: SparkSession, path: String): Map[String, (Int, Long)] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path))
      .filter(d => d.isDirectory && d.getPath.getName.contains("=")).map { d =>
      val parts = fs.listStatus(d.getPath).filter(_.getPath.getName.startsWith("part-"))
      d.getPath.getName.split("=", 2)(1) -> ((parts.length, parts.map(_.getLen).sum))
    }.toMap
  }

  /** Compact every partition holding more files than its size target; leave
    * the rest untouched on disk. Returns the affected partition values. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = TargetBytes): Seq[String] = {
    val stats = partitionStats(spark, path)
    val goal = stats.map { case (p, (_, bytes)) =>
      p -> math.max(1L, (bytes + targetBytes - 1) / targetBytes) }
    val affected = stats.collect { case (p, (files, _)) if files > goal(p) => p }.toSeq
    if (affected.nonEmpty) {
      val saltFor = affected.foldLeft(lit(1L)) { (acc, p) =>
        when(col("event_type") === p, lit(goal(p))).otherwise(acc) }
      val totalFiles = affected.map(goal(_).toInt).sum
      // materialize the affected slice BEFORE overwriting: Spark (rightly)
      // refuses to overwrite a path its plan still reads. The production
      // form stages to a new version directory and swaps a manifest
      // (AtomicTable's protocol) — here the affected slice is the small
      // fraction being compacted, so an eager local materialization is the
      // same read-before-delete discipline without the extra table layer.
      val staged = spark.read.parquet(path)
        .filter(col("event_type").isin(affected: _*)) // partition-pruned read
        .withColumn("salt", pmod(col("event_id"), saltFor))
        .repartition(totalFiles, col("event_type"), col("salt"))
        .drop("salt")
        .localCheckpoint(true)
      staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic") // replace ONLY written dirs
        .partitionBy("event_type").parquet(path)
    }
    affected
  }

  /** The driver-gated round trip: fragment → compact → aggregate read-back;
    * the oracle replays the aggregate over the parquet SOURCE, so the hash
    * row proves the rewrite lost and duplicated nothing. */
  def qS18Compaction(spark: SparkSession, dir: String): DataFrame = {
    val path = fragmentWrite(spark, dir)
    compact(spark, path)
    spark.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("event_id")).as("n_distinct_ids"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s18_compaction" -> (qS18Compaction _))

  val oracles: Map[String, String] = Map(
    "s18_compaction" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(round(sum(value), 4) AS DOUBLE) AS sum_value,
        |  count(DISTINCT event_id) AS n_distinct_ids
        |FROM events GROUP BY event_type""".stripMargin)
}
