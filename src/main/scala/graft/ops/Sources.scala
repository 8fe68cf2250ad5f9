package graft.ops

import java.util.concurrent.ConcurrentHashMap

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Non-parquet source formats: JSON-lines and CSV readers as first-class
  * query surfaces. The engine's canonical store is parquet, but a 100 TB
  * ingestion pipeline starts from whatever the producers emit — JSONL
  * event logs, CSV dumps — and the correctness contract is that a query
  * over those formats returns byte-identical results to the same query
  * over the parquet copy (each oracle below runs on the parquet table).
  *
  * Both readers take an EXPLICIT schema: schema inference reads the data
  * twice and guesses types per-file — at scale the schema is a contract,
  * not a discovery. Fixtures are written once per dataset into RAM-backed
  * scratch (same pattern as Layout).
  */
object Sources {

  private def shmDir(suffix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft-sources") else
      new java.io.File(sys.props("java.io.tmpdir"), "graft-sources")
    new java.io.File(base, suffix).toString
  }

  private val jsonDirs = new ConcurrentHashMap[String, (String, StructType)]()
  private val csvDirs = new ConcurrentHashMap[String, (String, StructType)]()

  /** events (µs timestamps dropped — the JSON copy carries the analytic
    * columns) re-emitted as JSON lines, once per JVM per dataset.
    * Fixture dirs (and the in-JVM memo) are keyed by `Tables.datasetTag`
    * — source size/mtime, not just path — so regenerated testdata can
    * never be served a stale copy (the same staleness fix Layout got).
    */
  private[ops] def jsonEvents(s: SparkSession, d: String): (String, StructType) =
    jsonDirs.computeIfAbsent(Tables.datasetTag(d), tag => {
      val df = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val dir = shmDir(s"$tag/events_json")
      if (!new java.io.File(dir, "_SUCCESS").exists())
        df.write.mode("overwrite").json(dir)
      (dir, df.schema)
    })

  /** lineitem measures re-emitted as a headered CSV, once per JVM. */
  private[ops] def csvLineitem(s: SparkSession, d: String): (String, StructType) =
    csvDirs.computeIfAbsent(Tables.datasetTag(d), tag => {
      val df = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      val dir = shmDir(s"$tag/lineitem_csv")
      if (!new java.io.File(dir, "_SUCCESS").exists())
        df.write.mode("overwrite").option("header", "true").csv(dir)
      (dir, df.schema)
    })

  /** Q46 — JSON-lines source: aggregate over the JSONL copy of events;
    * oracle runs the same SQL on the parquet table, so a hash match
    * proves the JSON read path is value-exact (longs, doubles, strings).
    */
  val q46: Q = Q(
    "q46_json_source",
    (s, d) => {
      val (dir, schema) = jsonEvents(s, d)
      s.read.schema(schema).json(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Canon.rsum(col("value")).as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n_events,
            |  count(DISTINCT user_id) AS n_users,
            |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_value
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q47 — CSV source: aggregate over the headered CSV copy of lineitem
    * measures; oracle on the parquet table proves CSV round-trips
    * numerics exactly (Spark writes shortest-roundtrip doubles).
    */
  val q47: Q = Q(
    "q47_csv_source",
    (s, d) => {
      val (dir, schema) = csvLineitem(s, d)
      s.read.schema(schema).option("header", "true").csv(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          Canon.rsum(col("l_quantity")).as("sum_qty"),
          Canon.ravg(col("l_extendedprice")).as("avg_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_items,
            |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_qty,
            |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val orcDirs = new ConcurrentHashMap[String, (String, StructType)]()

  /** orders re-emitted as ORC (Spark's second built-in columnar format),
    * once per JVM.
    */
  private[ops] def orcOrders(s: SparkSession, d: String): (String, StructType) =
    orcDirs.computeIfAbsent(Tables.datasetTag(d), tag => {
      val df = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
      val dir = shmDir(s"$tag/orders_orc")
      if (!new java.io.File(dir, "_SUCCESS").exists())
        df.write.mode("overwrite").orc(dir)
      (dir, df.schema)
    })

  /** Q51 — ORC source: the same aggregate over the ORC copy of orders and
    * the parquet oracle. ORC is columnar like parquet, so this also
    * exercises the second vectorized reader + its predicate/pruning path.
    */
  val q51: Q = Q(
    "q51_orc_source",
    (s, d) => {
      val (dir, schema) = orcOrders(s, d)
      s.read.schema(schema).orc(dir)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          Canon.rsum(col("o_totalprice")).as("total_price"))
        .orderBy("o_orderpriority", "o_orderstatus")
    },
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
            |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_price
            |FROM orders GROUP BY o_orderpriority, o_orderstatus
            |ORDER BY o_orderpriority, o_orderstatus""".stripMargin))

  private val evoDirs = new ConcurrentHashMap[String, (String, String)]()

  /** Two generations of the documents table, written once per JVM: the
    * v1 writer emitted (doc_id, lang); the v2 writer added `n_chars`.
    * Even-keyed docs land in v1, odd-keyed in v2 — so a merged read sees
    * both schemas interleaved, the real shape of a long-lived dataset.
    */
  private[ops] def evolvedDocs(s: SparkSession, d: String): (String, String) =
    evoDirs.computeIfAbsent(Tables.datasetTag(d), tag => {
      val base = Tables.documents(s, d)
      val dir = shmDir(s"$tag/docs_evolved")
      val (v1, v2) = (s"$dir/v1", s"$dir/v2")
      if (!new java.io.File(v1, "_SUCCESS").exists())
        base.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(v1)
      if (!new java.io.File(v2, "_SUCCESS").exists())
        base.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(v2)
      (v1, v2)
    })

  /** Q74 — schema-evolution read: `mergeSchema` over the v1+v2 parquet
    * generations yields the union schema with v1 rows null in the added
    * column; the aggregate separates evolved coverage (`n_with_chars`,
    * `total_chars` count/sum only v2 rows via null semantics) from the
    * full population (`n_docs`). Oracle reproduces the generation split
    * relationally from the source table. At 100 TB this is the standard
    * additive-column migration: no rewrite of old data, scans pay one
    * footer-merge planning pass, and readers see one logical schema.
    */
  val q74: Q = Q(
    "q74_schema_evolution",
    (s, d) => {
      val (v1, v2) = evolvedDocs(s, d)
      s.read.option("mergeSchema", "true").parquet(v1, v2)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("n_chars")).as("n_with_chars"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
            |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
            |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS total_chars
            |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  val queries: Seq[Q] = Seq(q46, q47, q51, q74)
}
