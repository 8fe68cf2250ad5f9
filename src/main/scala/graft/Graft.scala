package graft

import graft.crypto.EncryptionPolicy
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade: one import to get the whole engine.
  *
  * {{{
  * import graft.Graft
  * Graft.init(spark, "/data/corpus")          // temp views + functions
  * spark.sql("SELECT ... FROM lineitem ...")  // plain Spark SQL
  * Graft.query("q23_cosine_topk")(spark, dir) // named operators
  * Graft.writeEncrypted(df, path, policy, kmsUrl)
  * }}}
  */
object Graft {

  /** Register every corpus table as a temp view plus graft's custom
    * functions (cosine_sim, dot_product, simhash64, minhash_signature,
    * ngram_shingles, intersect_count). Idempotent.
    */
  def init(spark: SparkSession, sfDir: String): Unit = {
    GraftFunctions.register(spark)
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
  }

  /** All named operators (SURVEY.md §2 / §8). */
  def queryNames: Seq[String] = Registry.all.map(_.name)

  def query(name: String): (SparkSession, String) => DataFrame =
    Registry.all.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(
        s"unknown query '$name'; known: ${queryNames.mkString(", ")}"))
      .fn

  def writeEncrypted(df: DataFrame, path: String, policy: EncryptionPolicy,
      kmsUrl: String): Unit =
    io.EncryptedParquet.write(df, path, policy, kmsUrl)

  def readEncrypted(spark: SparkSession, path: String, kmsUrl: String,
      token: Option[String]): DataFrame =
    io.EncryptedParquet.read(spark, path, kmsUrl, token)
}
