package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Build-time SQL registration of the engine's custom Catalyst expressions
  * (SURVEY §2.10) — the deployment path for pure-SQL consumers (Thrift
  * server, notebooks, `spark.sql(...)` without touching the Scala API):
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions   // set at cluster startup
  * }}}
  *
  * (`spark.sql.extensions` is a static conf resolved when the SparkContext
  * is created — set it in spark-defaults/submit conf, not on a live
  * session. Programmatic equivalent: `builder.withExtensions(new
  * GraftExtensions().apply(_))`.)
  *
  * Unlike [[graft.expr.functions.registerAll]] (session-scoped temp
  * functions), injection happens while the session is being BUILT, so the
  * functions exist in every derived session and survive `newSession()`.
  * Both surfaces share one builder list, so they can't drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.expr.functions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[expr.Expressions.type].getName, name),
        builder))
    }
    // the scale-safe spatial plan, automatically (SURVEY §4 item 2): a
    // non-tiny point_in_ring join is rewritten to the cell-cover equi-join
    ext.injectOptimizerRule(_ => graft.plans.CellJoinRewrite)
  }
}
