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

  /** The engine's session-level conf, applied ONCE at session setup (all
    * entry points — Bench, Verify, Graft.init, the test base — call this)
    * so no individual query needs to mutate session state:
    *
    *  - `icu.caseMappings.enabled=false`: JVM case mappings instead of
    *    ICU — identical on ASCII corpora, avoids ICU's tens-of-seconds
    *    single-threaded static init serializing every task thread.
    *  - `legacy.parquet.nanosAsLong=true`: events corpora have shipped as
    *    parquet TIMESTAMP(NANOS), which the vectorized reader otherwise
    *    rejects; under this conf they scan as longs and `Tables.events`
    *    (type-adaptive) converts to a µs timestamp. Harmless for the
    *    current TIMESTAMP(MICROS) corpus — the conf only affects NANOS
    *    columns.
    *  - `legacy.bucketedTableScan.outputOrdering=true`: report per-bucket
    *    sort order from bucketed scans. Spark 3+ dropped it because
    *    multi-file buckets interleave (SPARK-28595); `Layout`'s writer
    *    guarantees ONE file per bucket, exactly the regime where the
    *    ordering is sound — and what keeps the bucketed fact-fact join
    *    sort-free. HARD REQUIREMENT of a tuned session: any bucketed
    *    table it reads must hold one file per bucket. Layout enforces
    *    this at write AND at table registration (it throws on a
    *    multi-file bucket dir); register external bucketed tables
    *    through Layout or validate the same invariant first.
    *
    * Idempotent; ConfHygieneSpec asserts that, given a tuned session, no
    * registered query leaves session conf changed.
    */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
  }

  /** Register every corpus table as a temp view plus graft's custom
    * functions (cosine_sim, dot_product, simhash64, minhash_signature,
    * ngram_shingles, intersect_count). Idempotent.
    */
  def init(spark: SparkSession, sfDir: String): Unit = {
    tune(spark)
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
