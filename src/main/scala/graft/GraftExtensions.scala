package graft

import graft.functions.DotProductFF
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook exposing the engine's native expressions
  * to SQL users:
  *
  * {{{
  * spark-shell --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT dot_ff(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * [[GraftExtensions.register]] does the same for an already-running
  * session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRule)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private val injections = Seq(
    (FunctionIdentifier("dot_ff"),
      new ExpressionInfo(classOf[DotProductFF].getName, "dot_ff"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "dot_ff takes exactly 2 arguments")
        DotProductFF(args(0), args(1))
      }))

  /** Register the functions into an existing session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, ident, info, builder)
    }
}
