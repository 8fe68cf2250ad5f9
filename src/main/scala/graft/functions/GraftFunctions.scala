package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.{call_function, lit}

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

  private def intArg(e: Expression, fn: String): Int = e.eval() match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "simhash64" -> (exprs => SimHash64Expr(exprs(0))),
    "minhash_signature" -> (exprs =>
      MinHashSignatureExpr(exprs(0), intArg(exprs(1), "minhash_signature"))),
    "ngram_shingles" -> (exprs =>
      NgramShinglesExpr(exprs(0), intArg(exprs(1), "ngram_shingles"))),
    "intersect_count" -> (exprs => IntersectCount(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Column API: cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Column API: left-to-right dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Column API: 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** Column API: k-element MinHash signature of an array<string> column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    call_function("minhash_signature", shingles, lit(k))

  /** Column API: distinct word n-gram shingles of an array<string> column. */
  def ngramShingles(tokens: Column, n: Int): Column =
    call_function("ngram_shingles", tokens, lit(n))

  /** Column API: |A ∩ B| of two array<string> columns (set semantics). */
  def intersectCount(a: Column, b: Column): Column =
    call_function("intersect_count", a, b)
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs(0))))
  }
}
