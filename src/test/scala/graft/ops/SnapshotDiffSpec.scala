package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot diff / CDC classification (q71): every status on crafted
  * snapshots, null-payload handling, and the registered query's class
  * partition covering the whole key universe.
  */
class SnapshotDiffSpec extends SparkTestBase {

  test("classifyDiff covers all four statuses") {
    import spark.implicits._
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newDf = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("doc_id", "text")
    val got = Relational.classifyDiff(oldDf, newDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("q71 classes partition the key universe") {
    val rows = Relational.q71.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("added", "changed", "removed", "unchanged"))
    val docs = graft.Tables.documents(spark, sfDir)
    val total = docs.count()
    val added = docs.filter(pmod(col("doc_id"), lit(19)) === 0).count()
    // every old key appears exactly once (added keys are extra)
    assert(rows.values.map(_._1).sum == total + added)
    val removed = docs.filter(pmod(col("doc_id"), lit(17)) === 0).count()
    assert(rows("removed")._1 == removed)
    // changed = %13 survivors of the %17 drop
    val changed = docs.filter(pmod(col("doc_id"), lit(13)) === 0 &&
      pmod(col("doc_id"), lit(17)) =!= 0).count()
    assert(rows("changed")._1 == changed)
  }
}
