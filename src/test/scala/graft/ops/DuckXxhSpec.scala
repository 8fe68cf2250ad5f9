package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Guard preconditions of the xxh64-in-DuckDB oracles (q22b/q22c): the
  * generated SQL implements the `len < 32` xxHash64 path and extracts
  * UTF-8 bytes via `ord(substr(...))`, which is byte-exact only for
  * ASCII. The SQL itself raises `error(...)` when either limit is hit —
  * this spec pins the limits on every test corpus FIRST, so a
  * regenerated corpus that breaks them fails as a named invariant here,
  * not as an opaque oracle error in the driver gate. Shingle strings
  * are three tokens + two spaces, so `3·maxTokenBytes + 2 < 32` bounds
  * them without materializing the shingle universe.
  */
class DuckXxhSpec extends SparkTestBase {

  test("corpus tokens fit the xxh64-SQL oracle limits (ASCII, shingles < 32 bytes)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { sf =>
        val toks = Tables.documents(spark, sf)
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
        val r = toks.agg(
          max(octet_length(col("tok"))).as("maxb"),
          sum(when(col("tok").rlike("[^\\x00-\\x7F]"), 1).otherwise(0)).as("nonascii"))
          .collect()(0)
        val maxb = r.getInt(0)
        assert(r.getLong(1) === 0L, s"$sf: non-ASCII tokens break the byte extraction")
        assert(maxb * 3 + 2 < 32,
          s"$sf: max token $maxb bytes — 3-gram shingles would exceed the 32-byte xxh64-SQL path")
      }
  }

  test("generated oracle SQL embeds the loud guard, not a silent fallback") {
    Seq(DuckXxh.q22bOracleSql, DuckXxh.q22cOracleSql).foreach { sql =>
      assert(sql.contains("error('token unsupported by xxh64 oracle"),
        "oracle SQL must fail loudly on tokens outside the supported path")
    }
  }
}
