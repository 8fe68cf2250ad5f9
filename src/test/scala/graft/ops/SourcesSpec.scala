package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Source-format round-trips behind q46/q47: the JSON and CSV copies must
  * carry the parquet tables' rows value-exactly (the oracle hash-match is
  * the end check; these pin the mechanism at row level). Fixture paths
  * come from the Sources accessors, not hardcoded roots, so the spec
  * holds wherever the fixtures land (/dev/shm or tmpdir fallback).
  */
class SourcesSpec extends SparkTestBase {

  test("JSON-lines copy of events round-trips rows exactly") {
    val want = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val (jsonDir, schema) = Sources.jsonEvents(spark, sfDir)
    val back = spark.read.schema(schema).json(jsonDir)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "JSON copy must round-trip longs/doubles/strings exactly")
    assert(Sources.q46.fn(spark, sfDir).columns.toSeq ==
      Seq("event_type", "n_events", "n_users", "total_value"))
  }

  test("CSV copy of lineitem measures round-trips doubles exactly") {
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val (csvDir, schema) = Sources.csvLineitem(spark, sfDir)
    val back = spark.read.schema(schema).option("header", "true").csv(csvDir)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "CSV copy must round-trip numeric columns exactly")
  }

  test("ORC copy of orders round-trips rows exactly") {
    val want = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
    val (orcDir, schema) = Sources.orcOrders(spark, sfDir)
    val back = spark.read.schema(schema).orc(orcDir)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "ORC copy must round-trip rows exactly")
  }

  test("mergeSchema read unifies the two document generations") {
    val (v1, v2) = Sources.evolvedDocs(spark, sfDir)
    val merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    // union schema, with the v2-only column nullable
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars"))
    assert(merged.schema("n_chars").nullable)
    val docs = Tables.documents(spark, sfDir)
    assert(merged.count() == docs.count(), "no row lost across generations")
    // v1 (even-keyed) rows read the added column as null; v2 rows carry it
    assert(merged.filter(col("n_chars").isNull &&
      pmod(col("doc_id"), lit(2)) === 1).count() == 0)
    assert(merged.filter(pmod(col("doc_id"), lit(2)) === 0)
      .filter(col("n_chars").isNotNull).count() == 0)
    // and the carried values are the source table's, exactly
    val v2back = merged.filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"))
    val v2want = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("n_chars"))
    assert(v2back.exceptAll(v2want).isEmpty && v2want.exceptAll(v2back).isEmpty)
  }
}
