package org.apache.spark.sql

/** Bridge into `private[sql]` session internals (same convention as
  * [[GraftColumnBridge]]).
  *
  * `reRoot` moves a DataFrame between two sessions that share one
  * SparkContext (e.g. the contraction loop's tuned child session and its
  * caller) WITHOUT the public-Row round trip: `createDataFrame(df.rdd, …)`
  * deserializes every InternalRow to an external Row and back, a full extra
  * pass over the data in each direction. The physical `InternalRow` RDD is
  * already context-scoped (sessions only own plans/confs, never data), so it
  * can be handed to the target session's planner as-is.
  */
object GraftSessionBridge {
  def reRoot(target: SparkSession, df: DataFrame): DataFrame = {
    val t = target.asInstanceOf[classic.SparkSession]
    val d = df.asInstanceOf[classic.Dataset[Row]]
    t.internalCreateDataFrame(d.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
