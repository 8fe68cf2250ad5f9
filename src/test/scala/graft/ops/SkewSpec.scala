package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals plain join and spreads the hot key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key — the shape AQE alone can't fix when a
    // single key exceeds one reducer.
    val large = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "b"), (42L, "c")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", salts = 8,
      saltOn = Seq("payload"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // the salt must actually split the hot key across buckets
    val buckets = large.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 1L)
      .groupBy("__salt").count().collect()
    assert(buckets.length == 8, s"hot key not spread: ${buckets.mkString(",")}")
  }

  test("default salt basis skips unhashable columns (maps) and still matches") {
    import spark.implicits._
    // xxhash64 rejects MapType recursively; both a top-level map and a
    // map nested inside a struct must be excluded from the salt basis.
    val large = spark.range(1000)
      .select((col("id") % 5).as("k"), col("id").as("payload"),
        map(lit("a"), col("id")).as("props"),
        struct(map(lit("b"), col("id")).as("tags"), col("id").as("v")).as("nested"))
    val small = Seq((0L, "x"), (1L, "y"), (4L, "z")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", salts = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
