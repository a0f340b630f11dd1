package graft.ops

import org.apache.spark.sql.SparkSession

/** One reusable TUNED child session per caller session for driver-paced
  * iteration loops (the CC contraction, PageRank, k-hop): AQE off — its
  * per-stage adaptive re-planning adds a barrier + scheduling round per
  * shuffle, which dominates on a model-sized iterate whose join sides are
  * already explicitly staged/broadcast — and shuffle partitions sized to the
  * iterate (~250k rows per partition, min 2, capped at the caller's own
  * setting so a cluster-sized conf still wins at scale). All tuning is
  * scoped to the child's private SQLConf: nothing leaks into queries running
  * concurrently on the caller session (advisor r11/r12 lineage, first built
  * for the contraction loop in TextDedup). The child is REUSED across calls
  * (one per caller; WeakHashMap so a collected caller releases it) and loops
  * `synchronized` on it, so two concurrent loops serialize instead of racing
  * its conf.
  */
private[ops] object LoopSession {

  private val sessions = new java.util.WeakHashMap[SparkSession, SparkSession]()

  def forCaller(parent: SparkSession): SparkSession = sessions.synchronized {
    var c = sessions.get(parent)
    if (c == null) { c = parent.newSession(); sessions.put(parent, c) }
    c
  }

  /** Size the child's shuffle width to an iterate of `rows` rows. Call
    * inside the loop's `synchronized` block, BEFORE any child-side
    * materialization. At 100 TB the same formula sizes UP with the data. */
  def tune(caller: SparkSession, loop: SparkSession, rows: Long): Unit = {
    val partsWas = caller.conf.get("spark.sql.shuffle.partitions", "200")
    val parts = math.max(2L, math.min(partsWas.toLong, rows / 250000L + 1L))
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    loop.conf.set("spark.sql.shuffle.partitions", parts.toString)
  }
}
