package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the documents table — the training-data-
  * pipeline surface: exact dedup, exact n-gram Jaccard, MinHash+LSH
  * near-dup, and SimHash fingerprints.
  *
  * Scale posture: exact dedup and MinHash/SimHash are one-or-two-shuffle
  * pipelines (explode → groupBy → band-join) whose intermediate volume is
  * O(docs × shingles); the exact-Jaccard all-pairs join is the quadratic
  * baseline used as the correctness oracle and the verification stage on
  * LSH candidates, never the 100 TB path. All expressions are built-in
  * (codegen'd) higher-order functions — no UDFs.
  */
object Dedup {

  /** Canonical text form shared by all dedup ops: lowercase, trimmed,
    * whitespace-collapsed.
    */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  def tokens(c: Column): Column = split(normText(c), " ")

  /** Token 3-gram shingles, distinct, as strings, from a *materialized*
    * token-array attribute. Documents shorter than 3 tokens produce an
    * empty set.
    */
  def shinglesFromTokens(tk: Column): Column =
    array_distinct(
      when(size(tk) < 3, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(tk) - 3),
          i => array_join(slice(tk, i + 1, lit(3)), " "))))

  /** One-expression convenience for small/test inputs (see shingleDocs for
    * why the hot path materializes tokens first).
    */
  def shingles(c: Column): Column = shinglesFromTokens(tokens(c))

  /** Docs with their shingle sets, materialized behind shuffle barriers.
    *
    * The barriers matter a lot: Catalyst inlines a column's defining
    * expression into downstream uses, and higher-order-function lambdas
    * re-evaluate inlined subexpressions per element — nested lambdas make
    * that multiplicative (32 hash functions × 50 shingles × regex
    * tokenize ≈ 10⁵ regex evals per row when fully inlined; observed as
    * minutes of CPU per task). Materializing (1) the token array and then
    * (2) the shingle array behind repartition exchanges makes every
    * downstream reference a plain attribute read, restoring the intended
    * once-per-row cost. The doc_id partitioning is also what co-locates
    * docs for the candidate-verification joins at scale.
    */
  def shingleDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      // A single-row-group parquet file scans as ONE partition; spreading
      // raw (id, text) rows first makes tokenization partition-parallel
      // instead of single-threaded in the scan stage.
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      // >= 3 tokens ⇔ non-empty shingle set. Filtering HERE (on tk, before
      // the shingle projection) matters: a later filter(size(sh)>0) gets
      // pushed below the exchanges with the whole shingle expression
      // re-inlined into the scan predicate — the monster this function
      // exists to avoid.
      .filter(size(col("tk")) >= 3)
      .repartition(col("doc_id"))
      .select(col("doc_id"), shinglesFromTokens(col("tk")).as("sh"))
      // cache(): the InMemoryRelation is the one true optimizer wall.
      // Without it, InferFiltersFromGenerate synthesizes size(sh)>0 under
      // every explode(sh) and predicate pushdown re-substitutes the whole
      // tokenize+shingle expression through the exchanges into the
      // single-partition scan (≈100 interpreted regex-splits per row,
      // re-executed per subtree copy — observed 26s-vs-285s bimodal runs
      // depending on AQE stage reuse). The cached shingle table is also
      // shared by all downstream uses (explode, counts, verification
      // joins) instead of recomputed per copy. Caching doc shingles is
      // the standard materialization step of a dedup pipeline at any
      // scale (disk-backed at 100 TB).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(shingle, seed) over the doc's shingle set.
    * One pass, no explode — stays inside whole-stage codegen.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleCol, s => xxhash64(s, h))))

  /** 64-bit SimHash over the token multiset: bit b is set iff the majority
    * of token hashes have bit b set. `hashCol` must be a *materialized*
    * array<long> attribute (see shingleDocs for why): the 64 bit-majority
    * expressions each scan it, so an inlined defining expression would
    * re-execute 64×.
    */
  def simhashFromHashes(hashCol: Column): Column = {
    val n = size(hashCol)
    (0 until 64).map { b =>
      val ones = size(filter(hashCol,
        h => shiftrightunsigned(h, b).bitwiseAND(lit(1L)) === lit(1L)))
      when(ones * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Convenience for small/test inputs: tokenize + hash + simhash in one
    * expression tree (fine when evaluated once per row).
    */
  def simhash64(tokenCol: Column): Column =
    simhashFromHashes(transform(tokenCol, t => xxhash64(t)))

  /** Q21 — exact dedup by normalized text: deterministic keeper = min
    * doc_id per text group. Single hash-shuffle on the normalized text.
    */
  val q21: Q = Q(
    "q21_dedup_exact",
    (s, d) => {
      Tables.documents(s, d)
        .groupBy(normText(col("text")).as("norm"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .select("keeper_id", "n_copies")
        .orderBy("keeper_id")
    },
    Some("""SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            |FROM documents
            |GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')
            |ORDER BY keeper_id""".stripMargin))

  /** Q22a — exact n-gram Jaccard near-dup pairs (threshold 0.5): the
    * count-based exact set-similarity join. Explode the cached shingle
    * table, equi-join on shingle with a size-ratio pruning predicate
    * (Jaccard ≥ 0.5 ⇒ max(|A|,|B|) ≤ 2·min — drops mismatched-size pairs
    * before the aggregate), count intersections per pair, Jaccard from
    * exact integer counts.
    *
    * Everything in the hot path is codegen'd (hash join + hash aggregate
    * over longs/strings). Intersections are COUNTED, never materialized:
    * an array_intersect-per-candidate formulation was measured 5-10×
    * slower here — interpreted OpenHashSet builds with per-element boxing,
    * re-evaluated for each of ~10⁵ candidates (see git history for the
    * abandoned PPJoin variant). At 100 TB the same shape holds: the
    * shuffle key is the shingle, hot-shingle fanout is bounded by a
    * document-frequency cap upstream (drop shingles with df > corpus%,
    * standard practice) — not needed at bench scale.
    */
  val q22a: Q = Q(
    "q22a_jaccard_pairs",
    (s, d) => {
      val t = 0.5
      val docs = shingleDocs(s, d)
      val ex = docs.select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("s"))
      val a = ex.as("a")
      val b = ex.as("b")
      val inter = a.join(b,
          col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) <= lit(2) * least(col("a.n"), col("b.n")))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("i"))
      inter
        .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
        .filter(col("jaccard") >= t)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("da", "db")
    },
    Some("""WITH toks AS (
            |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
            |  FROM documents),
            |sh AS (
            |  SELECT DISTINCT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS s
            |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) i
            |  WHERE len(t) >= 3),
            |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            |inter AS (
            |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT da, db, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
            |FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
            |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
            |ORDER BY da, db""".stripMargin))

  /** Q22b — MinHash + LSH near-dup pairs: the 100 TB path. 32 hashes in
    * 8 bands × 4 rows; candidate pairs from band-bucket equality joins;
    * candidates verified with exact Jaccard via array_intersect (cheap —
    * only on candidates). Same 0.5 threshold as q22a; ScalaTest asserts
    * candidate recall over q22a's ground truth. No SQL oracle: band
    * hashing isn't portable to DuckDB (rows-only driver check).
    */
  val q22b: Q = Q(
    "q22b_minhash_pairs",
    (s, d) => {
      val numHashes = 32
      val bands = 8
      val rows = numHashes / bands
      val docs = shingleDocs(s, d)
      // Signature computed once per row, materialized behind a second
      // barrier so the 8 band-hash slices read a plain attribute instead
      // of re-inlining the 32-hash expression.
      val banded = docs
        .select(col("doc_id"), minhashSignature(col("sh"), numHashes).as("sig"))
        .repartition(col("doc_id"))
        .select(
          col("doc_id"),
          explode(transform(
            sequence(lit(0), lit(bands - 1)),
            b => struct(
              b.as("band_idx"),
              xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b).as("band_hash"))))
            .as("band"))
        .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
      val a = banded.as("a")
      val b = banded.as("b")
      val candidates = a.join(b,
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      candidates
        .join(docs.select(col("doc_id"), col("sh").as("sa")), col("da") === col("doc_id"))
        .drop("doc_id")
        .join(docs.select(col("doc_id"), col("sh").as("sb")), col("db") === col("doc_id"))
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("i") / (size(col("sa")) + size(col("sb")) - col("i")))
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("da", "db")
    },
    None)

  /** Q22c — SimHash fingerprints + near-dup pairs at Hamming distance ≤ 3,
    * banded on 4×16-bit chunks so at least one band matches any pair
    * within distance 3 (pigeonhole). Rows-only driver check; ScalaTest
    * covers fingerprint determinism and known-dup recall.
    */
  val q22c: Q = Q(
    "q22c_simhash_pairs",
    (s, d) => {
      // Token hashes materialized behind a barrier: the 64 per-bit
      // majority counts then scan an in-memory array instead of
      // re-tokenizing 64× (see shingleDocs).
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          transform(tokens(col("text")), t => xxhash64(t)).as("th"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), simhashFromHashes(col("th")).as("fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // shiftrightunsigned needs a literal shift; build 4 bands explicitly.
      val bandCols = (0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_val")))
      val withBands = docs.select(col("doc_id"), col("fp"),
        explode(array(bandCols: _*)).as("band"))
        .select(col("doc_id"), col("fp"), col("band.band_idx"), col("band.band_val"))
      val a = withBands.as("a")
      val b = withBands.as("b")
      a.join(b,
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("da", "db")
    },
    None)

  val queries: Seq[Q] = Seq(q21, q22a, q22b, q22c)
}
