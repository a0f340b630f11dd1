package graft

import graft.sinks.AtomicTable

/** Child-process writer for the CROSS-PROCESS optimistic-concurrency race
  * (OccCrossProcessSpec): its own JVM, its own SparkSession, its own OS file
  * handles — so the rename-CAS and the `_lock` file path are exercised
  * between real processes, not just threads sharing a JVM monitor. */
object OccChild {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nBatches) = args
    val spark = Sessions.local(2)
    try {
      import spark.implicits._
      (0 until nBatches.toInt).foreach { b =>
        val incoming = Seq((s"w$writerId-b$b", writerId)).toDF("id", "writer")
        AtomicTable.mergeCommit(spark, root) {
          case None       => incoming
          case Some(live) => live.unionByName(incoming)
        }
      }
    } finally spark.stop()
    System.exit(0)
  }
}
