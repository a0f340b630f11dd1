package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.AtomicTable

/** TWO REAL PROCESSES racing [[AtomicTable.mergeCommit]] against one table:
  * the in-JVM race specs (SinkSpec) cover the monitor + lock composition;
  * this one removes the shared JVM entirely, so mutual exclusion and the
  * version-claim CAS rest ONLY on the OS primitives (rename(2), advisory
  * file lock) — the deployment reality for two ingester processes sharing
  * a table. The child is a separate `java` process with its own
  * SparkSession ([[OccChild]]); tests fork, so `java.class.path` is the
  * real test classpath and the child can reuse it verbatim. */
class OccCrossProcessSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4)

  test("two processes: every batch lands exactly once, the version chain is linear") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graftoccx").toString
    val batchesEach = 3

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val child = new ProcessBuilder(
      javaBin, "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.OccChild", root, "child", batchesEach.toString)
      .redirectErrorStream(true)
      .redirectOutput(java.nio.file.Files.createTempFile("occchild", ".log").toFile)
      .start()

    // parent races its own commits while the child JVM boots and commits
    (0 until batchesEach).foreach { b =>
      val incoming = Seq((s"wparent-b$b", "parent")).toDF("id", "writer")
      AtomicTable.mergeCommit(spark, root) {
        case None       => incoming
        case Some(live) => live.unionByName(incoming)
      }
    }
    assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "child process did not finish in time")
    assert(child.exitValue() == 0, s"child failed with ${child.exitValue()}")

    val rows = AtomicTable.read(spark, root).collect().map(_.getString(0))
    assert(rows.length == 2 * batchesEach,
      s"expected ${2 * batchesEach} rows, got ${rows.length}: ${rows.mkString(",")}")
    assert(rows.distinct.length == rows.length, "a CAS retry double-applied a batch")
    assert(rows.count(_.startsWith("wparent")) == batchesEach)
    assert(rows.count(_.startsWith("wchild")) == batchesEach)
    // 6 commits → exactly v6 live: nobody skipped or reused a version number
    assert(AtomicTable.currentVersion(root).contains(s"v${2 * batchesEach}"))
  }
}
