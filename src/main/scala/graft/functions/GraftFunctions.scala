package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.call_function

/** Registration for graft's custom Catalyst expressions.
  *
  * Two paths:
  *  - `GraftFunctions.register(spark)` — imperative, used by the query
  *    library (idempotent; temp-function registry).
  *  - `spark.sql.extensions=graft.functions.GraftSparkExtensions` — the
  *    deployment path: every session (driver and executors' plans alike)
  *    gets the functions injected at build time.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Column API: cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
