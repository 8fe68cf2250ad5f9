package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sampling operators — the training-data-pipeline primitives for corpus
  * downsizing and class rebalancing.
  *
  * Two variants, because they answer different production needs:
  *  - hash-based (q34a): membership is a pure function of the row KEY, so
  *    the sample is reproducible across runs, partitionings, clusters and
  *    even joins (sampling orders and lineitem by the same key hash keeps
  *    referential integrity) — the only sampling discipline that survives
  *    a 100 TB pipeline being re-run incrementally.
  *  - Bernoulli stratified (q34b): `sampleBy` with per-stratum fractions,
  *    the class-rebalance primitive. Membership depends on seed +
  *    partition layout, so it is repeatable on a fixed layout but not
  *    content-stable under repartitioning.
  *
  * Neither is ANSI-portable (hash functions / RNG streams differ across
  * engines) → rows-only driver checks; SamplingSpec pins determinism,
  * proportions, and the join-consistency property.
  */
object Sampling {

  /** Deterministic 10% key-hash sample of orders, aggregated per status
    * so the result is small and layout-independent: membership =
    * pmod(xxhash64(o_orderkey), 100) < 10. One scan, no shuffle before
    * the final tiny aggregate — the filter is codegen'd and pushes
    * nothing to the driver.
    */
  val q34a: Q = Q(
    "q34a_sample_hash",
    (s, d) => {
      Tables.orders(s, d)
        .filter(pmod(xxhash64(col("o_orderkey")), lit(100)) < 10)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("o_orderstatus")
    },
    None)

  /** Seeded stratified sample: rebalance order priorities to fixed
    * per-stratum keep-fractions, reported as per-stratum sampled counts.
    */
  val q34b: Q = Q(
    "q34b_sample_stratified",
    (s, d) => {
      val fractions = Map(
        "1-URGENT" -> 0.5, "2-HIGH" -> 0.4, "3-MEDIUM" -> 0.3,
        "4-NOT SPECIFIED" -> 0.2, "5-LOW" -> 0.1)
      Tables.orders(s, d)
        .stat.sampleBy("o_orderpriority", fractions, seed = 42L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("o_orderpriority")
    },
    None)

  val queries: Seq[Q] = Seq(q34a, q34b)
}
