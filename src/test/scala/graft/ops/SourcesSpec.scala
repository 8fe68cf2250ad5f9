package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Source-format round-trips behind q46/q47: the JSON and CSV copies must
  * carry the parquet tables' rows value-exactly (the oracle hash-match is
  * the end check; these pin the mechanism at row level).
  */
class SourcesSpec extends SparkTestBase {

  test("JSON-lines copy of events round-trips rows exactly") {
    val want = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val got = Sources.q46.fn(spark, sfDir) // builds the fixture
    assert(got.columns.toSeq == Seq("event_type", "n_events", "n_users", "total_value"))
    // row-level: re-read the fixture directly and compare to the source
    val dir = new java.io.File("/dev/shm/graft-sources")
    assert(dir.exists(), "fixture root must exist after building q46")
    val jsonDir = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .find(_.getName == "events_json").map(_.getPath)
      .getOrElse(fail("events_json fixture not found"))
    val back = spark.read.schema(want.schema).json(jsonDir)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "JSON copy must round-trip longs/doubles/strings exactly")
  }

  test("CSV copy of lineitem measures round-trips doubles exactly") {
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    Sources.q47.fn(spark, sfDir).collect() // builds the fixture
    val dir = new java.io.File("/dev/shm/graft-sources")
    val csvDir = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .find(_.getName == "lineitem_csv").map(_.getPath)
      .getOrElse(fail("lineitem_csv fixture not found"))
    val back = spark.read.schema(want.schema).option("header", "true").csv(csvDir)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "CSV copy must round-trip numeric columns exactly")
  }
}
