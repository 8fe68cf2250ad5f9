package graft.ops

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical data-quality auditing: the distribution-shape checks a
  * curation pipeline runs before trusting a corpus — categorical entropy,
  * inequality (Gini), digit-law conformance (Benford), and categorical
  * independence (chi-square). Every query reduces to integer counts plus
  * a tiny post-aggregation table, so the statistics cost one key-shuffle
  * with map-side combine no matter the input size; the float algebra
  * follows q116's discipline (pre-rounded irrational terms summed in
  * DECIMAL — order-independent, bit-identical cross-engine; closed-form
  * arithmetic in IEEE doubles on the exact sums, rounded last).
  */
object StatOps {
  import Canon._

  /** Q118 — categorical entropy profile of the documents table's lang
    * and source columns: Shannon entropy in nats, the one-number
    * balance check ("is this corpus 99% one language?") curation
    * dashboards track per snapshot. BOTH category censuses come out of
    * ONE scan via GROUPING SETS (q106/q107's single-pass discipline —
    * Expand sits under the exchange, so only combined partials
    * shuffle); grouping_id labels the branch, immune to values in
    * either column. −Σ p·ln p accumulates 12-dp-rounded DECIMAL terms
    * (q116's regressor discipline) over the O(categories) result —
    * the per-branch window sees the post-aggregation table, not rows —
    * negated and rounded last (r4z: a single-category column yields
    * −0.0 otherwise).
    */
  /** The q118 body over any (lang, source) frame. */
  def entropyProfile(docsDf: DataFrame): DataFrame = {
    val cells = docsDf
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source"))),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
      .select(when(col("gid") === 1, lit("lang")).otherwise(lit("source"))
        .as("column_name"), col("cnt"))
    val withTotal = cells.withColumn("n_rows",
      sum(col("cnt")).over(Window.partitionBy("column_name")))
    withTotal
      .select(col("column_name"), col("cnt"), col("n_rows"),
        round((col("cnt") / col("n_rows")) *
            log(col("cnt") / col("n_rows")), 12)
          .cast("decimal(26,12)").as("t"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("n_categories"), max(col("n_rows")).as("n_rows"),
        r4z(-sum(col("t")).cast("double")).as("entropy"))
      .orderBy("column_name")
  }

  val q118: Q = Q(
    "q118_entropy_profile",
    (s, d) => entropyProfile(Tables.spread(Tables.documents(s, d), col("doc_id"))),
    Some("""WITH lc AS (SELECT lang AS v, count(*) AS cnt FROM documents GROUP BY 1),
            |lt AS (SELECT cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n_rows FROM lc),
            |le AS (SELECT 'lang' AS column_name, count(*) AS n_categories,
            |    max(n_rows) AS n_rows,
            |    round(CAST(-sum(CAST(round((cnt * 1.0 / n_rows) * ln(cnt * 1.0 / n_rows), 12)
            |      AS DECIMAL(26,12))) AS DOUBLE), 4) + 0 AS entropy
            |  FROM lt),
            |sc AS (SELECT source AS v, count(*) AS cnt FROM documents GROUP BY 1),
            |st AS (SELECT cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n_rows FROM sc),
            |se AS (SELECT 'source' AS column_name, count(*) AS n_categories,
            |    max(n_rows) AS n_rows,
            |    round(CAST(-sum(CAST(round((cnt * 1.0 / n_rows) * ln(cnt * 1.0 / n_rows), 12)
            |      AS DECIMAL(26,12))) AS DOUBLE), 4) + 0 AS entropy
            |  FROM st)
            |SELECT * FROM le UNION ALL SELECT * FROM se ORDER BY column_name""".stripMargin))

  /** Q119 — Gini coefficient of customer spend per market segment: the
    * inequality index behind every "whale concentration" dashboard
    * (q104 reports the crossover ranks; q119 reports the single
    * standard index). Customers rank ascending by exact DECIMAL spend
    * inside a segment partition (key tiebreak — permuting equal spends
    * leaves Σ rank·x unchanged, so ties are value-safe); the classic
    * identity G = 2·Σ(rᵢxᵢ)/(n·Σx) − (n+1)/n runs on exact
    * DECIMAL(38,6) sums — the (25,6)×(12,0) product stays inside both
    * engines' fixed-width multiply — with IEEE division last.
    */
  /** The q119 body over orders- and customer-shaped frames. */
  def giniBySegment(ordersDf: DataFrame, customerDf: DataFrame): DataFrame = {
    val per = ordersDf.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(25,6)")).as("spend"))
      .join(broadcast(customerDf.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spend").asc, col("o_custkey").asc)
    per.select(col("c_mktsegment"), col("spend").cast("decimal(25,6)").as("spend"),
        row_number().over(w).cast("decimal(12,0)").as("rnk"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("sx"),
        sum(col("spend") * col("rnk")).as("srx"))
      .select(col("c_mktsegment"), col("n_customers"),
        r4z(lit(2.0) * col("srx").cast("double") /
            (col("n_customers") * col("sx").cast("double")) -
          (col("n_customers") + lit(1.0)) / col("n_customers")).as("gini"),
        round(col("sx").cast("double"), 4).as("segment_revenue"))
      .orderBy("c_mktsegment")
  }

  val q119: Q = Q(
    "q119_gini_spend",
    (s, d) => giniBySegment(
      Tables.spread(Tables.orders(s, d), col("o_orderkey")), Tables.customer(s, d)),
    Some("""WITH per AS (
            |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
            |    AS DECIMAL(25,6)) AS spend
            |  FROM orders GROUP BY 1),
            |j AS (
            |  SELECT c.c_mktsegment, p.o_custkey, p.spend
            |  FROM per p JOIN customer c ON p.o_custkey = c.c_custkey),
            |r AS (
            |  SELECT c_mktsegment, spend,
            |    CAST(row_number() OVER (PARTITION BY c_mktsegment
            |      ORDER BY spend, o_custkey) AS DECIMAL(12,0)) AS rnk
            |  FROM j),
            |a AS (
            |  SELECT c_mktsegment, count(*) AS n_customers,
            |    sum(spend) AS sx, sum(spend * rnk) AS srx
            |  FROM r GROUP BY 1)
            |SELECT c_mktsegment, n_customers,
            |  round(2.0 * CAST(srx AS DOUBLE) / (n_customers * CAST(sx AS DOUBLE)) -
            |        (n_customers + 1.0) / n_customers, 4) + 0 AS gini,
            |  round(CAST(sx AS DOUBLE), 4) AS segment_revenue
            |FROM a ORDER BY c_mktsegment""".stripMargin))

  /** Q120 — Benford first-digit audit of line-item extended prices: the
    * fraud/synthetic-data screen — naturally-grown monetary amounts
    * follow P(d) = log10(1 + 1/d), fabricated ones usually don't. The
    * first significant digit comes from the INTEGER STRING of
    * floor(price) (both engines format integers identically), never
    * from floor(log10 x) whose libm ulp at exact powers of ten flips
    * the digit cross-engine. One 9-group census; shares divide by the
    * windowed total over the 9-row result.
    */
  /** The q120 body over any frame with an `amount` column. Amounts below
    * 1 are filtered INSIDE the helper (r9 ADVICE): an amount in (0, 1)
    * would yield digit 0 and expected_share = log10(1 + 1/0) — Infinity
    * in Spark vs a divide-by-zero NULL/error in a DuckDB oracle — and a
    * negative amount a '-' substring → NULL digit. Benford's law is
    * only stated for first SIGNIFICANT digits anyway; guarding here
    * (not at the call site) means reuse on another column can't
    * silently diverge cross-engine.
    */
  def benfordProfile(amounts: DataFrame): DataFrame = {
    val d = amounts
      .filter(col("amount") >= 1)
      .select(substring(floor(col("amount")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    d.withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("expected_share"))
      .orderBy("digit")
  }

  val q120: Q = Q(
    "q120_benford_digits",
    (s, d) => benfordProfile(Tables.spread(Tables.lineitem(s, d), col("l_orderkey"))
      .select(col("l_extendedprice").as("amount"))),
    Some("""WITH d AS (
            |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
            |    AS INTEGER) AS digit
            |  FROM lineitem WHERE l_extendedprice >= 1),
            |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
            |t AS (SELECT digit, n, sum(n) OVER () AS total FROM c)
            |SELECT digit, n, round(n * 1.0 / total, 4) AS share,
            |  round(log10(1.0 + 1.0 / digit), 4) AS expected_share
            |FROM t ORDER BY digit""".stripMargin))

  /** Q121 — chi-square independence of lang × source in the documents
    * table: "do sources specialize by language?" — the categorical
    * association test a corpus census runs before stratifying by either
    * column. ONE scan builds the contingency cells; row/column margins
    * and the grand total are window sums OVER THE CELLS (O(langs ×
    * sources) rows — no second pass, no join). Absent cells (O = 0)
    * never materialize, but their χ² mass folds in algebraically:
    * Σ_zero (0−E)²/E = Σ_zero E = N − Σ_obs E, so the sum runs over
    * observed cells as Σ[(O−E)²/E − E] and adds N back at the end —
    * exact, grid-join-free. Expected counts and the per-cell terms are
    * IEEE doubles on exact integers, 9-dp-rounded into DECIMAL for the
    * order-independent final sum.
    */
  /** The q121 body over any (lang, source) frame. */
  def chi2Independence(docsDf: DataFrame): DataFrame = {
    val cells = docsDf.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("rl", sum(col("o")).over(Window.partitionBy("lang")))
      .withColumn("cs", sum(col("o")).over(Window.partitionBy("source")))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = col("rl").cast("double") * col("cs") / col("n")
    val dev = col("o") - e
    m.select(col("lang"), col("source"), col("n"),
        round(dev * dev / e - e, 9).cast("decimal(28,9)").as("t"))
      .agg(sum(col("t")).as("chi2s"),
        max(col("n")).as("n_rows"),
        count(lit(1)).as("n_cells"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
      .select(col("n_rows"), col("n_cells"), col("n_langs"), col("n_sources"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
        r4z(col("chi2s").cast("double") + col("n_rows")).as("chi2"))
  }

  val q121: Q = Q(
    "q121_chi2_independence",
    (s, d) => chi2Independence(Tables.spread(Tables.documents(s, d), col("doc_id"))),
    Some("""WITH cells AS (
            |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
            |m AS (
            |  SELECT lang, source, o,
            |    sum(o) OVER (PARTITION BY lang) AS rl,
            |    sum(o) OVER (PARTITION BY source) AS cs,
            |    sum(o) OVER () AS n
            |  FROM cells),
            |terms AS (
            |  SELECT lang, source, n,
            |    CAST(round((o - rl * 1.0 * cs / n) * (o - rl * 1.0 * cs / n) /
            |               (rl * 1.0 * cs / n) - rl * 1.0 * cs / n, 9)
            |      AS DECIMAL(28,9)) AS t
            |  FROM m)
            |SELECT CAST(max(n) AS BIGINT) AS n_rows,
            |  count(*) AS n_cells,
            |  count(DISTINCT lang) AS n_langs,
            |  count(DISTINCT source) AS n_sources,
            |  (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof,
            |  round(CAST(sum(t) AS DOUBLE) + max(n), 4) + 0 AS chi2
            |FROM terms""".stripMargin))

  /** Daily revenue series: one key-shuffled aggregate with map-side
    * combine, 4-dp-rounded into DECIMAL(18,4) so every downstream
    * product stays inside both engines' 38-digit fixed-width multiply.
    * Day count is calendar-bounded (~10³ rows at ANY corpus size), so
    * the time-series queries below may run unpartitioned windows over
    * it — the windows see the post-aggregation table, never rows.
    */
  private def dailyRevenue(ordersDf: DataFrame): DataFrame =
    ordersDf.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum(col("o_totalprice").cast("decimal(38,6)")), 4)
        .cast("decimal(18,4)").as("x"))

  private val DailySql =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4)
      |      AS DECIMAL(18,4)) AS x
      |  FROM orders GROUP BY 1""".stripMargin

  /** Q122 — lag-1 autocorrelation of daily revenue: the one-number
    * persistence check ("does a strong day predict the next?") behind
    * seasonality/anomaly dashboards (q91 fits a trend; q122 measures
    * serial dependence). Consecutive-day pairs come from one lead
    * window over the daily table; Pearson r runs on exact DECIMAL sums
    * of the (18,4) series and its lag — (18,4)×(18,4) products stay
    * fixed-width — with the divide and the IEEE-correctly-rounded sqrt
    * (deterministic cross-engine, unlike libm ln/log10) applied last.
    */
  /** The q122 body over an orders-shaped frame. */
  def autocorrDaily(ordersDf: DataFrame): DataFrame = {
    val pairs = dailyRevenue(ordersDf)
      .withColumn("y", lead(col("x"), 1).over(Window.orderBy("day")))
      .filter(col("y").isNotNull)
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_pairs"),
        r4z((col("n_pairs") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n_pairs") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            (col("n_pairs") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))))
          .as("autocorr"))
  }

  val q122: Q = Q(
    "q122_autocorr_daily",
    (s, d) => autocorrDaily(Tables.spread(Tables.orders(s, d), col("o_orderkey"))),
    Some(s"""WITH daily AS ($DailySql),
            |p AS (
            |  -- (19,4) operands: DuckDB multiplies width-18 decimals in
            |  -- int64 (overflows); 19+19 = 38 takes the int128 path.
            |  SELECT CAST(x AS DECIMAL(19,4)) AS x,
            |    CAST(lead(x) OVER (ORDER BY day) AS DECIMAL(19,4)) AS y
            |  FROM daily),
            |pairs AS (SELECT x, y FROM p WHERE y IS NOT NULL),
            |sums AS (
            |  SELECT count(*) AS n_pairs, sum(x) AS sx, sum(y) AS sy,
            |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
            |  FROM pairs)
            |SELECT n_pairs,
            |  round((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            |    sqrt((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
            |         (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0
            |    AS autocorr
            |FROM sums""".stripMargin))

  /** Q123 — CUSUM changepoint scan of daily revenue: the day where the
    * cumulative sum deviates most from the uniform-growth line — the
    * standard "did the level shift, and when?" detector run before
    * trusting a before/after comparison. The statistic max|S_k − (k/n)·S_n|
    * is computed as max|n·S_k − k·S_n|/n so EVERYTHING up to the final
    * divide is exact DECIMAL on integers — no float accumulates across
    * days, and the argmax day is an exact comparison with a
    * deterministic earliest-day tiebreak (TakeOrdered over the daily
    * table, no global sort of anything row-sized).
    */
  /** The q123 body over an orders-shaped frame. */
  def cusumChangepoint(ordersDf: DataFrame): DataFrame = {
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val c = dailyRevenue(ordersDf).select(col("day"),
      sum(col("x")).over(wCum).cast("decimal(24,4)").as("sk"),
      sum(col("x")).over(wAll).cast("decimal(24,4)").as("sn"),
      count(lit(1)).over(wAll).as("n_days"),
      row_number().over(Window.orderBy("day")).cast("long").as("k"))
    c.select(col("day"), col("n_days"),
        abs(col("sk") * col("n_days").cast("decimal(8,0)") -
          col("k").cast("decimal(8,0)") * col("sn")).as("absdev"))
      .orderBy(col("absdev").desc, col("day").asc)
      .limit(1)
      .select(col("n_days"), Canon.fmtDate(col("day")).as("change_day"),
        r4z(col("absdev").cast("double") / col("n_days")).as("max_cusum"))
  }

  val q123: Q = Q(
    "q123_cusum_changepoint",
    (s, d) => cusumChangepoint(Tables.spread(Tables.orders(s, d), col("o_orderkey"))),
    Some(s"""WITH daily AS ($DailySql),
            |c AS (
            |  SELECT day,
            |    CAST(sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            |      AND CURRENT ROW) AS DECIMAL(24,4)) AS sk,
            |    CAST(sum(x) OVER () AS DECIMAL(24,4)) AS sn,
            |    count(*) OVER () AS n_days,
            |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
            |  FROM daily),
            |d AS (
            |  SELECT day, CAST(n_days AS BIGINT) AS n_days,
            |    abs(sk * CAST(n_days AS DECIMAL(8,0)) -
            |        CAST(k AS DECIMAL(8,0)) * sn) AS absdev
            |  FROM c)
            |SELECT n_days, strftime(day, '%Y-%m-%d') AS change_day,
            |  round(CAST(absdev AS DOUBLE) / n_days, 4) + 0 AS max_cusum
            |FROM d ORDER BY absdev DESC, day LIMIT 1""".stripMargin))

  /** Q124 — population stability index of the order-priority mix
    * between the first and second half of the time range: THE
    * categorical drift metric ML monitoring runs on every feature
    * (q89 tracks numeric quantile drift; q124 is its categorical
    * sibling). ONE scan builds the (day, priority) census; the split
    * date and per-half totals are windows over that calendar-bounded
    * table; the per-bucket shares pivot via conditional aggregation
    * (no join), and PSI = Σ (p₁−p₂)·ln(p₁/p₂) accumulates
    * 12-dp-rounded DECIMAL terms. Buckets absent from either half are
    * excluded (PSI is undefined at zero mass) and reported via
    * n_buckets so the exclusion is visible, not silent.
    */
  /** The q124 body over an orders-shaped frame. */
  def psiPriorityDrift(ordersDf: DataFrame): DataFrame = {
    val census = ordersDf
      .groupBy(to_date(col("o_orderdate")).as("day"),
        col("o_orderpriority").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy()
    val halves = census
      .withColumn("mind", min(col("day")).over(wAll))
      .withColumn("maxd", max(col("day")).over(wAll))
      .withColumn("h", when(datediff(col("day"), col("mind")) * 2 <=
        datediff(col("maxd"), col("mind")), lit(1)).otherwise(lit(2)))
      .groupBy("bucket", "h").agg(sum(col("cnt")).as("cnt"))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy("h")))
    val byBucket = halves.groupBy("bucket")
      .agg(sum(when(col("h") === 1, col("cnt"))).as("c1"),
        sum(when(col("h") === 2, col("cnt"))).as("c2"),
        max(when(col("h") === 1, col("tot"))).as("t1"),
        max(when(col("h") === 2, col("tot"))).as("t2"))
      .filter(col("c1").isNotNull && col("c2").isNotNull)
    val p1 = col("c1") / col("t1")
    val p2 = col("c2") / col("t2")
    byBucket
      .select(col("c1"), col("c2"), col("t1"), col("t2"),
        round((p1 - p2) * log(p1 / p2), 12).cast("decimal(26,12)").as("t"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("t1")).as("n_h1"), max(col("t2")).as("n_h2"),
        r4z(sum(col("t")).cast("double")).as("psi"))
  }

  val q124: Q = Q(
    "q124_psi_priority_drift",
    (s, d) => psiPriorityDrift(Tables.spread(Tables.orders(s, d), col("o_orderkey"))),
    Some("""WITH census AS (
            |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority AS bucket,
            |    count(*) AS cnt
            |  FROM orders GROUP BY 1, 2),
            |halves AS (
            |  SELECT bucket,
            |    CASE WHEN date_diff('day', min(day) OVER (), day) * 2 <=
            |      date_diff('day', min(day) OVER (), max(day) OVER ())
            |      THEN 1 ELSE 2 END AS h,
            |    cnt
            |  FROM census),
            |hc AS (
            |  SELECT bucket, h, CAST(sum(cnt) AS BIGINT) AS cnt
            |  FROM halves GROUP BY 1, 2),
            |ht AS (
            |  SELECT bucket, h, cnt, CAST(sum(cnt) OVER (PARTITION BY h) AS BIGINT) AS tot
            |  FROM hc),
            |b AS (
            |  SELECT bucket,
            |    sum(CASE WHEN h = 1 THEN cnt END) AS c1,
            |    sum(CASE WHEN h = 2 THEN cnt END) AS c2,
            |    max(CASE WHEN h = 1 THEN tot END) AS t1,
            |    max(CASE WHEN h = 2 THEN tot END) AS t2
            |  FROM ht GROUP BY 1),
            |terms AS (
            |  SELECT CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
            |    CAST(t1 AS BIGINT) AS t1, CAST(t2 AS BIGINT) AS t2,
            |    CAST(round((c1 * 1.0 / t1 - c2 * 1.0 / t2) *
            |               ln((c1 * 1.0 / t1) / (c2 * 1.0 / t2)), 12)
            |      AS DECIMAL(26,12)) AS t
            |  FROM b WHERE c1 IS NOT NULL AND c2 IS NOT NULL)
            |SELECT count(*) AS n_buckets,
            |  max(t1) AS n_h1, max(t2) AS n_h2,
            |  round(CAST(sum(t) AS DOUBLE), 4) + 0 AS psi
            |FROM terms""".stripMargin))

  /** Q125 — calendar-gap completeness audit of the order stream: which
    * days are missing entirely — the data-arrival check every ingest
    * pipeline runs before a time-series query is trusted (q50 fills
    * gaps; q125 measures them). One distinct-day census (map-side
    * combined, calendar-bounded), one lead window over it; the summary
    * is all exact integers, with the telescoping invariant
    * missing_days = span_days − n_days pinned in spec.
    */
  /** The q125 body over an orders-shaped frame. */
  def calendarGaps(ordersDf: DataFrame): DataFrame = {
    val days = ordersDf.select(to_date(col("o_orderdate")).as("day")).distinct()
    val g = days
      .withColumn("nxt", lead(col("day"), 1).over(Window.orderBy("day")))
      .withColumn("gap", datediff(col("nxt"), col("day")) - 1)
    g.agg(count(lit(1)).cast("long").as("n_days"),
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long").as("span_days"),
        coalesce(sum(when(col("gap") > 0, col("gap"))), lit(0)).cast("long")
          .as("missing_days"),
        sum(when(col("gap") > 0, 1L).otherwise(0L)).cast("long").as("n_gaps"),
        coalesce(max(col("gap")), lit(0)).cast("long").as("max_gap"))
  }

  val q125: Q = Q(
    "q125_calendar_gaps",
    (s, d) => calendarGaps(Tables.spread(Tables.orders(s, d), col("o_orderkey"))),
    Some("""WITH days AS (
            |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
            |g AS (
            |  SELECT day,
            |    date_diff('day', day, lead(day) OVER (ORDER BY day)) - 1 AS gap
            |  FROM days)
            |SELECT count(*) AS n_days,
            |  CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS span_days,
            |  CAST(coalesce(sum(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT)
            |    AS missing_days,
            |  CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
            |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
            |FROM g""".stripMargin))

  /** Q126 — weekday seasonality index: mean daily revenue per ISO
    * weekday relative to the overall daily mean — the 7-row calendar
    * profile (is Sunday 0.8× or 1.2× of normal?) read before any
    * day-over-day comparison is trusted, and the categorical companion
    * to q122's serial-dependence check. Rides the same calendar-bounded
    * daily census; the overall mean comes from one window over it (no
    * second scan). Weekday numbering is pinned to ISO (1 = Monday) —
    * Spark's `weekday` (0 = Monday) + 1 equals DuckDB's `isodow`,
    * avoiding the 0-vs-1-based Sunday trap of both engines' `dayofweek`;
    * names render via the English formatter on both sides. Index =
    * (Σ_dow/n_dow)/(Σ_all/n_all) — two IEEE divisions on exact DECIMAL
    * sums, rounded last.
    */
  /** The q126 body over an orders-shaped frame. */
  def weekdaySeasonality(ordersDf: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val t = dailyRevenue(ordersDf)
      .select((weekday(col("day")) + 1).cast("long").as("dow"),
        date_format(col("day"), "EEEE").as("day_name"), col("x"))
      .withColumn("sall", sum(col("x")).over(wAll))
      .withColumn("nall", count(lit(1)).over(wAll))
    t.groupBy("dow", "day_name")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sd"),
        max(col("sall")).as("sall"), max(col("nall")).as("nall"))
      .select(col("dow"), col("day_name"), col("n_days"),
        round(col("sd").cast("double"), 4).as("sum_revenue"),
        r4z((col("sd").cast("double") / col("n_days")) /
          (col("sall").cast("double") / col("nall"))).as("seasonality_index"))
      .orderBy("dow")
  }

  val q126: Q = Q(
    "q126_weekday_seasonality",
    (s, d) => weekdaySeasonality(Tables.spread(Tables.orders(s, d), col("o_orderkey"))),
    Some(s"""WITH daily AS ($DailySql),
            |t AS (
            |  SELECT isodow(day) AS dow, dayname(day) AS day_name, x,
            |    sum(x) OVER () AS sall, count(*) OVER () AS nall
            |  FROM daily)
            |SELECT CAST(dow AS BIGINT) AS dow, day_name, count(*) AS n_days,
            |  round(CAST(sum(x) AS DOUBLE), 4) AS sum_revenue,
            |  round((CAST(sum(x) AS DOUBLE) / count(*)) /
            |        (CAST(max(sall) AS DOUBLE) / max(nall)), 4) + 0
            |    AS seasonality_index
            |FROM t GROUP BY 1, 2 ORDER BY dow""".stripMargin))

  val queries: Seq[Q] = Seq(q118, q119, q120, q121, q122, q123, q124, q125, q126)
}
