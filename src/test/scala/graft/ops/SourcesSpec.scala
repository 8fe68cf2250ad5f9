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
}
