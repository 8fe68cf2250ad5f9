package graft.ops

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for large joins (SURVEY.md §4 scale posture).
  *
  * Spark's AQE handles moderate skew by splitting oversized sort-merge
  * partitions, but a pathological hot key (one key = 10% of 100 TB) still
  * serializes on a single reducer chain. Salting fixes it structurally:
  * the skewed (large) side gets a uniform random-ish salt derived from a
  * row fingerprint; the small side is replicated once per salt value.
  * Join keys become (key, salt) — the hot key spreads over `salts`
  * reducers exactly.
  */
object Skew {

  /** Salted inner equi-join of `large` and `small` on `key`.
    *
    * @param salts  number of ways to split each hot key (= replication
    *               factor of the small side; keep ≤ 64)
    * @param saltOn cheap columns whose values vary within a key — the
    *               salt is `xxhash64(key, saltOn…)`. Empty (default)
    *               falls back to every atomic-typed column, which is
    *               correct but pays per-row hashing of the whole 100 TB
    *               side; at scale name one or two cheap columns.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, saltOn: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    // The salt must (a) vary WITHIN a hot key so its rows spread across
    // reducers, (b) be deterministic under task retries (rand() is not,
    // monotonically_increasing_id is not), and (c) stay cheap per row.
    // Hash the key plus caller-named cheap columns; the fallback skips
    // columns containing MapType at ANY nesting depth (xxhash64's type
    // check is recursive — a map has no canonical entry order to hash).
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case st: StructType => st.fields.exists(f => containsMap(f.dataType))
      case at: ArrayType => containsMap(at.elementType)
      case _ => false
    }
    val basis = key +: (
      if (saltOn.nonEmpty) saltOn
      else large.schema.fields.iterator.collect {
        case f if f.name != key && !containsMap(f.dataType) => f.name
      }.toSeq)
    // A key-only basis makes the salt CONSTANT within each key: results
    // stay correct, but hot keys land on one reducer anyway while the
    // small side still pays `salts`-way replication — the mitigation
    // silently does nothing for the cost. Warn loudly rather than
    // require(): the caller may legitimately know the key distribution
    // is fine and want the API uniformity. (Round-4 advisor finding.)
    if (basis.size <= 1)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"saltedJoin on '$key': no non-key salt columns available — the " +
          s"salt is constant per key, so hot keys will NOT be split but " +
          s"the small side is still replicated ${salts}x. Name varying " +
          "cheap columns via saltOn, or drop the salting.")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(basis.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Q37 — the salted join as a first-class query: brand revenue via
    * lineitem ⋈ part through `saltedJoin` on a pinned shuffle join (the
    * scenario salting exists for — a broadcastable side needs no salt).
    * The oracle is the PLAIN join SQL: hash-matching it proves salting
    * is result-transparent, which is the entire contract of the
    * technique.
    */
  val q37: Q = Q(
    "q37_skew_salted_join",
    (s, d) => {
      val l = Tables.lineitem(s, d).select(col("l_partkey"), col("l_extendedprice"))
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        .hint("shuffle_hash")
      saltedJoin(l, p, "l_partkey", salts = 16, saltOn = Seq("l_extendedprice"))
        .groupBy("p_brand")
        .agg(Canon.rsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
            |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
            |  count(*) AS n_items
            |FROM lineitem JOIN part ON l_partkey = p_partkey
            |GROUP BY p_brand
            |ORDER BY p_brand""".stripMargin))

  val queries: Seq[Q] = Seq(q37)
}
