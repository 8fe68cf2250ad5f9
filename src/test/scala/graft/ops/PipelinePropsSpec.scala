package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property laws for the round-8 pipeline operators on RANDOM corpora
  * (raw ScalaCheck generators with fixed seeds, same discipline as
  * EncryptedRoundtripProps): invariants that must hold for any input,
  * not just the crafted fixtures.
  */
class PipelinePropsSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private def textGen(n: Int): Gen[String] =
    Gen.listOfN(n, word).map(_.mkString(" "))

  private def randomDocs(seed: Long, n: Int = 30): Seq[(Long, String, String)] =
    (1L to n).map { i =>
      val len = sample(Gen.chooseNum(1, 40), seed + i)
      (i, s"src${i % 3}", sample(textGen(len), seed * 31 + i))
    }

  test("chunk dedup: duplicating the whole corpus marks every chunk duplicated") {
    for (trial <- 1 to 3) {
      val docs = randomDocs(trial * 100L)
      val doubled = docs ++ docs.map { case (id, s, t) => (id + 1000L, s, t) }
      val out = Dedup.chunkDedup(doubled.toDF("doc_id", "source", "text"), W = 4)
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"trial $trial: doc ${r.getLong(0)} has non-dup chunks in a fully-cloned corpus")
        assert(!r.getBoolean(4))
      }
    }
  }

  test("chunk dedup: chunk counts conserve ceil(tokens/W) per doc") {
    val docs = randomDocs(7L)
    val out = Dedup.chunkDedup(docs.toDF("doc_id", "source", "text"), W = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, _, t) =>
      val want = math.ceil(t.split(" ").length / 4.0).toLong
      assert(out(id) == want, s"doc $id: ${out(id)} chunks, want $want")
    }
  }

  test("LM familiarity: every reference-slice doc is fully in-vocab with familiarity >= 1") {
    for (trial <- 1 to 3) {
      val docs = randomDocs(trial * 997L).filter(_._3.split(" ").length >= 2)
      val out = TextOps.lmFamiliarity(
        docs.toDF("doc_id", "source", "text"), refSource = "src0").collect()
      val refIds = docs.filter(_._2 == "src0").map(_._1).toSet
      out.filter(r => refIds(r.getLong(0))).foreach { r =>
        assert(r.getLong(2) == 0L, s"ref doc ${r.getLong(0)} has OOV bigrams vs itself")
        assert(r.getDouble(3) >= 1.0, "a ref bigram occurs at least once in the ref slice")
        assert(r.getBoolean(4))
      }
    }
  }

  test("funnel: stage counts are monotonically non-increasing on random streams") {
    for (trial <- 1 to 3) {
      val types = Gen.oneOf("signup", "click", "purchase", "view")
      val rows = (1L to 200L).map { i =>
        (sample(Gen.chooseNum(1L, 20L), trial * 7L + i),
          sample(types, trial * 13L + i),
          new java.sql.Timestamp(1700000000000L + sample(Gen.chooseNum(0L, 10_000_000L), trial * 17L + i)))
      }
      val r = Relational.funnel(rows.toDF("user_id", "event_type", "ts")).collect().head
      val (n, s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= s1 && s1 >= s2 && s2 >= s3, s"trial $trial: $n >= $s1 >= $s2 >= $s3 violated")
    }
  }

  test("retention: every cohort's offset-0 row exists and counts the whole cohort") {
    for (trial <- 1 to 3) {
      val rows = (1L to 300L).map { i =>
        (sample(Gen.chooseNum(1L, 25L), trial * 3L + i), "e",
          new java.sql.Timestamp(1700000000000L + sample(Gen.chooseNum(0L, 40L * 86400000L), trial * 5L + i)))
      }
      val df = rows.toDF("user_id", "event_type", "ts")
      val out = Relational.retentionCohorts(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // users grouped by their true first week must equal the offset-0 census
      val weekOf = (ts: java.sql.Timestamp) => // Monday-aligned: days since 1970-01-05 (day 4), UTC
        Math.floorDiv(ts.getTime / 86400000L - 4, 7)
      val cohorts = rows.groupBy(_._1).values
        .map(es => es.map(e => weekOf(e._3)).min)
        .groupBy(identity).map { case (w, us) => w -> us.size.toLong }
      cohorts.foreach { case (w, size) =>
        assert(out((w, 0L)) == size, s"cohort $w offset-0: ${out.get((w, 0L))} vs $size")
      }
    }
  }

  test("shardOf: a single shard collapses everything to shard 0; assignment is total") {
    val ids = (1L to 100L).toDF("doc_id")
    val one = ids.select(Layout.shardOf(col("doc_id"), nShards = 1)).distinct().collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(0L))
    val k = ids.select(Layout.shardOf(col("doc_id"), nShards = 7))
      .agg(min("shard"), max("shard"), count(lit(1))).collect().head
    assert(k.getLong(0) >= 0L && k.getLong(1) <= 6L && k.getLong(2) == 100L)
  }
}
