package graft.ops

/** Spark-compatible XXH64, re-expressed as DuckDB SQL (r9 verdict item
  * 4): the hash-bearing dedup queries (q22c SimHash pairs, q22b MinHash
  * pairs) emit values derived from xxhash64 token/shingle hashes, so a
  * DuckDB oracle must reproduce Spark's XXH64 bit-for-bit — reference
  * `XXH64.hashUTF8String/hashLong/hashInt` (Spark's
  * `org.apache.spark.sql.catalyst.expressions.XXH64`, seed 42), the
  * public xxHash64 algorithm.
  *
  * Formulation notes:
  *   - All arithmetic is mod 2^64. DuckDB BIGINT/UBIGINT ops ERROR on
  *     overflow rather than wrap, so every multiply/add/shift-left is
  *     routed through UHUGEINT (uint128) with an explicit `% 2^64`
  *     (`mm`/`am`/`rot` below). SUMs likewise: DuckDB's sum(UHUGEINT)
  *     aggregates in DOUBLE and corrupts low bits — aggregate in
  *     HUGEINT (int128) instead (`fp` CTE in the q22c oracle).
  *   - Strings are hashed via their UTF-8 bytes. The generated CTEs
  *     implement the `len < 32` xxHash64 path (up to three 8-byte
  *     lanes + 4-byte chunk + tail bytes, unrolled) and extract bytes
  *     with `ord(substr(...))`, which equals the UTF-8 byte only for
  *     ASCII — both limits are GUARDED: a token that is >= 32 bytes or
  *     non-ASCII makes the oracle raise `error(...)` rather than
  *     silently diverge. Corpus tokens are short ASCII words (max 8
  *     bytes at every SF; DuckXxhSpec pins the guard).
  *   - Equality-only hash chains (MinHash band hashes) are NOT
  *     replicated; band equality is expressed as equality of the
  *     band's signature-min tuple, the same collision-freedom argument
  *     the q33 fingerprint oracle rests on.
  */
object DuckXxh {

  private val M = "18446744073709551616::UHUGEINT"
  // xxHash64 primes, decimal (they exceed Long.MaxValue — kept as SQL
  // literal strings; DuckDB parses them as UBIGINT/UHUGEINT in context).
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  /** (a * b) mod 2^64 as UBIGINT. */
  private def mm(a: String, b: String): String =
    s"CAST((($a)::UHUGEINT * ($b)::UHUGEINT % $M) AS UBIGINT)"

  /** (a + b) mod 2^64 as UBIGINT. */
  private def am(a: String, b: String): String =
    s"CAST(((($a)::UHUGEINT + ($b)::UHUGEINT) % $M) AS UBIGINT)"

  /** rotate-left by r (1..63) on a UBIGINT expression. */
  private def rot(x: String, r: Int): String =
    s"(CAST((($x)::UHUGEINT * ${1L << r}::UHUGEINT % $M) AS UBIGINT) | (($x) >> ${64 - r}))"

  private def xr(a: String, b: String): String = s"xor($a, $b)"

  /** One 8-byte-lane fold step: acc' = rotl27(acc ^ round0(lane))*P1+P4. */
  private def step8(acc: String, lane: String): String =
    am(mm(rot(xr(acc, mm(rot(mm(lane, P2), 31), P1)), 27), P1), P4)

  /** CTE chain hashing each row of relation `src`(tok VARCHAR) with
    * xxhash64(tok, seed=42); terminates in relation `hv`(tok, h UBIGINT).
    * Paste after a WITH clause that defines `src`.
    */
  def stringHashCtes(src: String): String = {
    def b(i: String) = s"bytes[$i]"
    val lane4 =
      s"(${b("p0+1")} + ${b("p0+2")}*256::UBIGINT + ${b("p0+3")}*65536::UBIGINT + ${b("p0+4")}*16777216::UBIGINT)"
    s"""xtb AS (SELECT tok,
       |  CASE WHEN octet_length(encode(tok)) >= 32 OR octet_length(encode(tok)) != length(tok)
       |       THEN error('token unsupported by xxh64 oracle (>=32 bytes or non-ASCII)')
       |       ELSE octet_length(encode(tok))::UBIGINT END AS len,
       |  list_transform(range(1, length(tok)+1), i -> ord(substr(tok, i, 1))::UBIGINT) AS bytes
       | FROM $src),
       |xtl AS (SELECT *, (len // 8)::INT AS nl, (len % 8)::INT AS rem,
       |  list_transform(range(0, (len // 8)::INT), j ->
       |    bytes[8*j+1] + bytes[8*j+2]*256::UBIGINT + bytes[8*j+3]*65536::UBIGINT + bytes[8*j+4]*16777216::UBIGINT +
       |    bytes[8*j+5]*4294967296::UBIGINT + bytes[8*j+6]*1099511627776::UBIGINT +
       |    bytes[8*j+7]*281474976710656::UBIGINT + bytes[8*j+8]*72057594037927936::UBIGINT) AS lanes8
       | FROM xtb),
       |xs0 AS (SELECT *, ${am(am("42::UBIGINT", P5), "len")} AS acc FROM xtl),
       |xs1 AS (SELECT * REPLACE (CASE WHEN nl >= 1 THEN ${step8("acc", "lanes8[1]")} ELSE acc END AS acc) FROM xs0),
       |xs2 AS (SELECT * REPLACE (CASE WHEN nl >= 2 THEN ${step8("acc", "lanes8[2]")} ELSE acc END AS acc) FROM xs1),
       |xs3 AS (SELECT *, 8*nl AS p0 FROM (SELECT * REPLACE (CASE WHEN nl >= 3 THEN ${step8("acc", "lanes8[3]")} ELSE acc END AS acc) FROM xs2)),
       |xs4 AS (SELECT * REPLACE (CASE WHEN rem >= 4 THEN ${am(mm(rot(xr("acc", mm(lane4, P1)), 23), P2), P3)} ELSE acc END AS acc),
       |  CASE WHEN rem >= 4 THEN p0+4 ELSE p0 END AS p FROM xs3),
       |xs5 AS (SELECT * REPLACE (CASE WHEN len > p THEN ${mm(rot(xr("acc", mm(b("p+1"), P5)), 11), P1)} ELSE acc END AS acc),
       |  CASE WHEN len > p THEN p+1 ELSE p END AS p2 FROM xs4),
       |xs6 AS (SELECT * REPLACE (CASE WHEN len > p2 THEN ${mm(rot(xr("acc", mm(b("p2+1"), P5)), 11), P1)} ELSE acc END AS acc),
       |  CASE WHEN len > p2 THEN p2+1 ELSE p2 END AS p3 FROM xs5),
       |xs7 AS (SELECT * REPLACE (CASE WHEN len > p3 THEN ${mm(rot(xr("acc", mm(b("p3+1"), P5)), 11), P1)} ELSE acc END AS acc) FROM xs6),
       |xa1 AS (SELECT *, ${mm(xr("acc", "acc >> 33"), P2)} AS av1 FROM xs7),
       |xa2 AS (SELECT *, ${mm(xr("av1", "av1 >> 29"), P3)} AS av2 FROM xa1),
       |hv AS (SELECT tok, xor(av2, av2 >> 32) AS h FROM xa2)""".stripMargin
  }

  /** Inline Spark `XXH64.hashInt(i, seed)` over UBIGINT SQL expressions
    * (i must already be the unsigned 32-bit value): fmix is inlined via
    * the two staged columns the caller provides — so this returns the
    * PRE-avalanche accumulator; chain with [[fmix1]]/[[fmix2]]/[[fmix3]]
    * column stages (expression reuse keeps the SQL size linear).
    */
  def hashIntAcc(i: String, seed: String): String =
    am(mm(rot(xr(am(am(seed, P5), "4::UBIGINT"), mm(i, P1)), 23), P2), P3)

  /** fmix stage expressions: f1 = (x ^ x>>33)*P2; f2 = (f1 ^ f1>>29)*P3;
    * result = f2 ^ f2>>32. Stage across CTE columns.
    */
  def fmix1(x: String): String = mm(xr(x, s"$x >> 33"), P2)
  def fmix2(x: String): String = mm(xr(x, s"$x >> 29"), P3)
  def fmix3(x: String): String = xr(x, s"$x >> 32")

  /** Unsigned UBIGINT column rendered as Spark's signed BIGINT (two's
    * complement) — for outputs and signed-min comparisons.
    */
  def toSigned(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::UBIGINT THEN ($x)::HUGEINT - $M::HUGEINT ELSE ($x)::HUGEINT END AS BIGINT)"

  /** The q22b oracle: MinHash + banded-LSH near-dup pairs. Rebuilds the
    * whole pipeline in SQL — df-capped shingle sets (q22a's CTEs), the
    * 32-element signature `sig[h] = min_s hashInt(h, xxh64(shingle))`
    * (signed min, Spark's array_min), 8 bands of 4 — with ONE
    * structural substitution: Spark buckets candidates by a CHAINED
    * band hash (`minhashBandsLong`), the oracle by equality of the
    * band's signature 4-tuple. Band-hash equality ⟺ tuple equality up
    * to xxh64 collisions — the same collision-freedom argument the q33
    * fingerprint oracle rests on (and any collision-induced false
    * candidate would additionally have to pass exact Jaccard ≥ 0.5 to
    * change the output).
    */
  def q22bOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS s
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) i
       |  WHERE len(t) >= 3),
       |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM sh),
       |keep AS (
       |  SELECT s FROM sh GROUP BY s
       |  HAVING count(*) <= greatest(1000, CAST(floor(0.005 * (SELECT nd FROM nd)) AS BIGINT))),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
       |sv(tok) AS (SELECT DISTINCT s FROM shc),
       |${stringHashCtes("sv")},
       |shh AS (SELECT shc.doc_id, hv.h FROM shc JOIN hv ON shc.s = hv.tok),
       |seeds(hidx) AS (SELECT unnest(range(0, 32))),
       |mh0 AS (SELECT doc_id, hidx, ${hashIntAcc("hidx::UBIGINT", "h")} AS x FROM shh CROSS JOIN seeds),
       |mh1 AS (SELECT doc_id, hidx, ${fmix1("x")} AS x FROM mh0),
       |mh2 AS (SELECT doc_id, hidx, ${fmix2("x")} AS x FROM mh1),
       |mh3 AS (SELECT doc_id, hidx, ${toSigned(fmix3("x"))} AS v FROM mh2),
       |sig AS (SELECT doc_id, hidx, min(v) AS m FROM mh3 GROUP BY doc_id, hidx),
       |bnd AS (SELECT doc_id, (hidx // 4)::INT AS b, list(m ORDER BY hidx) AS key
       |        FROM sig GROUP BY doc_id, (hidx // 4)::INT),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM bnd a JOIN bnd b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
       |FROM cand JOIN inter USING (da, db)
       |JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
       |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
       |ORDER BY da, db""".stripMargin

  /** The q22c oracle: SimHash-64 fingerprints per document (majority bit
    * over xxhash64 token hashes, duplicates counted — `HashKernels
    * .simhash64`'s exact rule), then ALL pairs at Hamming distance <= 3.
    * The banded LSH q22c runs on the Spark side is EXACT for this radius
    * (pigeonhole over 4x16-bit bands: <=3 differing bits leave at least
    * one band identical), so the oracle needs no banding — its result
    * set is definitionally the same.
    */
  def q22cOracleSql: String = {
    val bitvals = (0 until 64)
      .map(i => s"($i, ${java.lang.Long.toUnsignedString(1L << i)}::UHUGEINT)")
      .mkString(", ")
    s"""WITH n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm FROM documents),
       |t AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM n),
       |v AS (SELECT DISTINCT tok FROM t),
       |${stringHashCtes("v")},
       |th AS (SELECT t.doc_id, hv.h FROM t JOIN hv USING (tok)),
       |bt(bit, bitval) AS (VALUES $bitvals),
       |bits AS (SELECT doc_id, bit, bitval, count(*) AS ntok,
       |  sum(CASE WHEN (h >> bit) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE 0 END) AS ones
       |  FROM th CROSS JOIN bt GROUP BY doc_id, bit, bitval),
       |fp AS (SELECT doc_id,
       |  CAST(CAST(sum(CASE WHEN ones*2 > ntok THEN bitval::HUGEINT ELSE 0::HUGEINT END) AS UHUGEINT) AS UBIGINT) AS fpu
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |  CAST(bit_count(xor(a.fpu, b.fpu)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fpu, b.fpu)) <= 3
       |ORDER BY da, db""".stripMargin
  }
}
