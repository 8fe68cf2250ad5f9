package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the events timestamp conversion law for WHICHEVER physical type
  * the corpus currently ships (the generator changed encodings mid-build:
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS), and may change again):
  *
  *  - nanos-as-long corpus: loader value must equal floor(raw_ns / 1000)
  *    exactly. Round-1 regression guarded here: `col("ts") / 1000L` was
  *    double division and epoch nanos exceed double's 2^53 integer range,
  *    putting ~12% of rows off by 1 µs.
  *  - µs (NTZ) corpus: loader must preserve the exact microsecond value
  *    under the UTC session timezone (cast, no arithmetic).
  *
  * An unrecognized physical type must FAIL analysis loudly (the loader
  * throws), not silently mis-convert — that failure mode is what let a
  * corpus regeneration take down 12 queries unnoticed in round 6.
  */
class TablesSpec extends SparkTestBase {

  private def rawEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  test("events loader emits TimestampType matching the physical encoding exactly") {
    val raw = rawEvents
    // Expected epoch-µs per event, derived independently of the loader.
    val expected = raw.schema("ts").dataType match {
      case LongType =>        // nanos corpus: exact floor division
        raw.select(col("event_id"), expr("ts DIV 1000").as("want_us"))
      case TimestampNTZType => // µs corpus: value-preserving under UTC
        raw.select(col("event_id"),
          unix_micros(col("ts").cast(TimestampType)).as("want_us"))
      case TimestampType =>
        raw.select(col("event_id"), unix_micros(col("ts")).as("want_us"))
      case other => fail(s"unaudited events.ts physical type: $other")
    }
    val conv = Tables.events(spark, sfDir)
    assert(conv.schema("ts").dataType === TimestampType,
      "loader contract: ts is always a µs TimestampType")
    val bad = expected.join(
        conv.select(col("event_id"), unix_micros(col("ts")).as("got_us")),
        "event_id")
      .where(col("got_us") =!= col("want_us"))
      .count()
    assert(bad === 0L)
  }

  test("precision contract matches the physical type") {
    val raw = rawEvents
    raw.schema("ts").dataType match {
      case LongType =>
        // Sub-µs precision is real in a nanos corpus — the truncation the
        // loader documents actually truncates something.
        val nonAligned = raw.where(expr("ts % 1000 != 0")).count()
        assert(nonAligned > 0L,
          "nanos corpus unexpectedly µs-aligned; conversion claims need re-checking")
      case TimestampNTZType | TimestampType =>
        // µs corpus: the loader must be lossless — second-fraction spread
        // proves values aren't being collapsed by a stray DIV/round.
        val distinctMicros = Tables.events(spark, sfDir)
          .select((unix_micros(col("ts")) % 1000000L).as("frac"))
          .where(col("frac") =!= 0L).distinct().count()
        assert(distinctMicros > 1L,
          "µs corpus lost its sub-second spread through the loader")
      case other => fail(s"unaudited events.ts physical type: $other")
    }
  }

  test("schema canary: every table scans with its audited column names and types") {
    // The driver regenerates /root/testdata between rounds and has
    // changed physical types mid-build before (events.ts NANOS → MICROS
    // broke 12 queries and cost most of round 6 — the failure surfaced
    // as cryptic per-query analysis errors). This canary makes the next
    // drift a one-line diagnosis: each column lists its AUDITED types —
    // the encodings the loaders and oracles have actually been checked
    // against — and anything else fails here first, by name.
    import org.apache.spark.sql.types._
    val audited: Map[String, Map[String, Set[DataType]]] = Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
        "n_regionkey" -> Set(IntegerType)),
      "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
        "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
        "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
        "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
        "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> Set(TimestampType, TimestampNTZType),
        "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
        "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
        "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
        "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
        "l_shipdate" -> Set(TimestampType, TimestampNTZType)),
      "events" -> Map("event_id" -> Set(LongType),
        // the three encodings Tables.events is audited for
        "ts" -> Set(LongType, TimestampType, TimestampNTZType),
        "user_id" -> Set(LongType), "event_type" -> Set(StringType),
        "value" -> Set(DoubleType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
          ArrayType(DoubleType), ArrayType(DoubleType, false)),
        "label" -> Set(IntegerType)))
    val drift = Tables.all.flatMap { t =>
      val schema = Tables.load(spark, sfDir, t).schema
      val exp = audited(t)
      val missing = exp.keySet -- schema.fieldNames.toSet
      val extra = schema.fieldNames.toSet -- exp.keySet
      val wrongType = schema.fields.toSeq
        .filter(f => exp.get(f.name).exists(ok => !ok.contains(f.dataType)))
        .map(f => s"$t.${f.name} scans as ${f.dataType} (audited: ${exp(f.name).mkString("/")})")
      missing.map(c => s"$t.$c missing") ++ extra.map(c => s"$t.$c unexpected") ++ wrongType
    }
    assert(drift.isEmpty,
      s"testdata drifted from the audited encodings — re-audit loaders/oracles for:\n  " +
        drift.mkString("\n  "))
  }

  test("Canon.r4z collapses IEEE -0.0 and is identity elsewhere") {
    import spark.implicits._
    // -0.00003 rounds to zero-from-below: DuckDB's C round keeps the sign
    // bit while Spark's BigDecimal round drops it — r4z pins BOTH paths
    // to +0.0 so the driver's stringified compare can't see "-0.0".
    val rows = Seq(-0.00003, -0.0, 0.0, -0.12345, 2.71828).toDF("x")
      .select(graft.Canon.r4z(col("x")).as("r")).collect().map(_.getDouble(0))
    assert(rows.forall(v => java.lang.Double.doubleToRawLongBits(v) !=
      java.lang.Double.doubleToRawLongBits(-0.0)), s"negative zero survived: ${rows.toSeq}")
    assert(rows(3) == -0.1235 && rows(4) == 2.7183, s"rounding changed: ${rows.toSeq}")
  }
}
