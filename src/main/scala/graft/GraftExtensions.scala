package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b) ...")`
  * works next to the Column API.
  *
  * Activate with:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or at runtime via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectOptimizerRule(_ => graft.plans.LargeNotInListToAntiJoin)
  }
}

object GraftExtensions {
  private val dotFunction = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      DotProduct(children(0), children(1)))

  /** Runtime registration on an existing session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LargeNotInListToAntiJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LargeNotInListToAntiJoin
  }

  /** Register every engine table of a data dir as a temp view, giving the
    * full `spark.sql(...)` surface over the same data the Column-API
    * queries read. */
  def registerViews(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables(spark, dir, t).createOrReplaceTempView(t)
    }
}
