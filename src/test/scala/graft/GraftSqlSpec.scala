package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, StockPipeline}
import graft.plans.GroupedTopK

/** The BigQuery-compat shim runs the reference's dashboard SQL verbatim
  * (README.md:671-795): QUALIFY queries produce the same rows as the
  * engine's DataFrame pipelines AND lower to GroupedTopK; TIMESTAMP_SUB
  * / CURRENT_TIMESTAMP rewrite to the injected deterministic clock. */
class GraftSqlSpec extends SparkSpec {

  private lazy val ana = {
    val df = StockPipeline.analysis(spark, "/root/testdata/sf0.001")
    df.createOrReplaceTempView("realtime_analysis")
    df
  }

  // README.md:679-689, verbatim
  private val refQ1 = """
SELECT
    ticker,
    latest_price,
    total_volume_1m,
    total_value_1m,
    sma_5m,
    is_volume_spike,
    window_timestamp
FROM `stock_market_dataset.realtime_analysis`
QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY window_timestamp DESC) = 1
ORDER BY total_value_1m DESC;
"""

  // README.md:755-763, verbatim
  private val refQ6 = """
SELECT
    ticker,
    latest_price,
    sma_5m,
    ((latest_price - sma_5m) / sma_5m) * 100 as momentum_pct,
    window_timestamp
FROM `stock_market_dataset.realtime_analysis`
QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY window_timestamp DESC) = 1
ORDER BY momentum_pct DESC;
"""

  // README.md:727-733, verbatim
  private val refQ4 = """
SELECT
    AVG(system_latency) as avg_latency_seconds,
    MAX(system_latency) as max_latency_seconds,
    MIN(system_latency) as min_latency_seconds,
    COUNT(*) as total_records
FROM `stock_market_dataset.realtime_analysis`
WHERE window_timestamp > TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 1 HOUR);
"""

  test("reference Q1 verbatim: same rows as the DataFrame pipeline, lowered to GroupedTopK") {
    ana // materialize view
    val q = GraftSql.sql(spark, refQ1)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.nonEmpty, opt.toString)
    // the QUALIFY row_number must be gone (the analysis view's own
    // spike-frame avg window legitimately remains)
    val rnWindows = opt.collect {
      case w: LogicalWindow if w.windowExpressions.exists(_.collectFirst {
        case _: org.apache.spark.sql.catalyst.expressions.RowNumber => ()
      }.nonEmpty) => w
    }
    assert(rnWindows.isEmpty, opt.toString)
    val got = q.collect().sortBy(_.getAs[String]("ticker"))
    val want = Analytics.q1Dashboard(ana).collect().sortBy(_.getAs[String]("ticker"))
    assert(got.length === want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      q.columns.foreach(c => assert(g.getAs[Any](c) === w.getAs[Any](c), c))
    }
  }

  test("reference Q6 verbatim: momentum values match (modulo rounding presentation)") {
    ana
    val got = GraftSql.sql(spark, refQ6).collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[Double]("momentum_pct")).toMap
    val want = Analytics.q6Momentum(ana).collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[Double]("momentum_pct")).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    // engine pipeline rounds to 6; the raw reference text doesn't
    got.foreach { case (t, v) => assert(math.abs(v - want(t)) < 5e-7, t) }
  }

  test("reference Q4 verbatim: TIMESTAMP_SUB + injected CURRENT_TIMESTAMP") {
    ana
    val nowExpr = "SELECT max(window_timestamp) FROM realtime_analysis"
    val got = GraftSql.sql(spark, refQ4, now = Some(nowExpr)).head()
    val nowTs = spark.sql(nowExpr).head().getTimestamp(0)
    val expected = ana
      .filter(col("window_timestamp") >
        lit(nowTs) - expr("INTERVAL 1 HOUR"))
      .agg(avg("system_latency"), max("system_latency"),
        min("system_latency"), count(lit(1))).head()
    assert(math.abs(got.getDouble(0) - expected.getDouble(0)) < 1e-9)
    assert(got.getDouble(1) === expected.getDouble(1))
    assert(got.getDouble(2) === expected.getDouble(2))
    assert(got.getLong(3) === expected.getLong(3))
  }

  test("WITH-CTE + QUALIFY: the CTE body sits at paren depth > 0, so the " +
      "top-level scan rewrites correctly and lowers to GroupedTopK") {
    ana
    val q = """
WITH recent AS (
  SELECT ticker, latest_price, window_timestamp
  FROM `stock_market_dataset.realtime_analysis`)
SELECT ticker, latest_price, window_timestamp
FROM recent
QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY window_timestamp DESC) = 1
ORDER BY ticker;
"""
    val df = GraftSql.sql(spark, q)
    val got = df.collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[Double]("latest_price")).toMap
    val want = Analytics.q1Dashboard(ana).collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[Double]("latest_price")).toMap
    assert(got === want && got.nonEmpty)
    assert(df.queryExecution.optimizedPlan
      .collect { case g: graft.plans.GroupedTopK => g }.nonEmpty)
    assert(df.queryExecution.optimizedPlan
      .collect { case w: LogicalWindow => w }.isEmpty)
  }

  // ---- the remaining reference queries, verbatim (README.md:696-794,
  // app.py:28-95) — with this block every SQL statement the reference
  // ships runs unchanged through the shim ----

  private val refQ2 = """
SELECT
    ticker,
    latest_price,
    sma_5m,
    (latest_price - sma_5m) as price_diff,
    window_timestamp
FROM `stock_market_dataset.realtime_analysis`
WHERE latest_price > sma_5m
ORDER BY window_timestamp DESC
LIMIT 10;
"""

  private val refQ3 = """
SELECT
    ticker,
    total_value_1m,
    total_volume_1m,
    latest_price,
    window_timestamp
FROM `stock_market_dataset.realtime_analysis`
ORDER BY total_value_1m DESC
LIMIT 5;
"""

  private val refQ5 = """
SELECT
    ticker,
    STDDEV(latest_price) as price_stddev,
    AVG(latest_price) as avg_price,
    (STDDEV(latest_price) / AVG(latest_price)) * 100 as volatility_pct
FROM `stock_market_dataset.realtime_analysis`
WHERE window_timestamp >= TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 10 MINUTE)
GROUP BY ticker
ORDER BY volatility_pct DESC;
"""

  private val refQ7 = """
SELECT
    window_timestamp,
    system_latency,
    ticker,
    total_volume_1m
FROM `stock_market_dataset.realtime_analysis`
WHERE system_latency > 30
ORDER BY system_latency DESC;
"""

  private val refQ8 = """
SELECT
    ticker,
    AVG(ai_sentiment) as avg_sentiment,
    AVG(latest_price) as avg_price,
    COUNT(*) as data_points,
    CORR(ai_sentiment, latest_price) as sentiment_price_correlation
FROM `stock_market_dataset.realtime_analysis`
WHERE window_timestamp >= TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 1 HOUR)
GROUP BY ticker
ORDER BY avg_sentiment DESC;
"""

  private val nowSql = "SELECT max(window_timestamp) FROM realtime_analysis"
  private def nowTs = spark.sql(nowSql).head().getTimestamp(0)

  test("reference Q2 verbatim: buy-signal rows (tie-safe multiset compare)") {
    ana
    val got = GraftSql.sql(spark, refQ2).collect()
    assert(got.length === 10)
    got.foreach(r => assert(
      r.getAs[Double]("latest_price") > r.getAs[Double]("sma_5m")))
    // ORDER BY ts DESC LIMIT 10 has cross-ticker timestamp ties: assert
    // the timestamp MULTISET matches the true top-10
    val wantTs = ana.filter(col("latest_price") > col("sma_5m"))
      .select("window_timestamp").collect().map(_.getTimestamp(0))
      .sortBy(-_.getTime).take(10).toSeq
    assert(got.map(_.getAs[java.sql.Timestamp]("window_timestamp"))
      .sortBy(-_.getTime).toSeq === wantTs)
  }

  test("reference Q3 verbatim: top-5 traded-value minutes") {
    ana
    val got = GraftSql.sql(spark, refQ3).collect()
      .map(_.getAs[Double]("total_value_1m")).toSeq
    val want = ana.select("total_value_1m").collect().map(_.getDouble(0))
      .sorted.reverse.take(5).toSeq
    assert(got === want)
  }

  test("reference Q5 verbatim: volatility over the trailing 10 minutes") {
    ana
    // a single-row ticker in the window gives NULL stddev on both sides
    def nd(r: org.apache.spark.sql.Row, i: Int): Double =
      if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
    def close(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-9
    val got = GraftSql.sql(spark, refQ5, now = Some(nowSql)).collect()
      .map(r => r.getAs[String]("ticker") -> (nd(r, 1), nd(r, 2))).toMap
    val want = ana
      .filter(col("window_timestamp") >= lit(nowTs) - expr("INTERVAL 10 MINUTES"))
      .groupBy(col("ticker"))
      .agg(stddev_samp(col("latest_price")).as("sd"),
        avg(col("latest_price")).as("ap")).collect()
      .map(r => r.getString(0) -> (nd(r, 1), nd(r, 2))).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (t, (sd, ap)) =>
      assert(close(sd, want(t)._1), t)
      assert(close(ap, want(t)._2), t)
    }
  }

  test("reference Q7 verbatim: latency spikes") {
    ana
    val got = GraftSql.sql(spark, refQ7).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_timestamp"),
        r.getAs[String]("ticker"))).toSet
    val want = ana.filter(col("system_latency") > 30)
      .select("window_timestamp", "ticker").collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("reference Q8 verbatim: sentiment correlation over the trailing hour") {
    ana
    val got = GraftSql.sql(spark, refQ8, now = Some(nowSql)).collect()
      .map(r => r.getAs[String]("ticker") ->
        (r.getAs[Long]("data_points"), r.getAs[Double]("avg_sentiment"))).toMap
    val want = ana
      .filter(col("window_timestamp") >= lit(nowTs) - expr("INTERVAL 1 HOUR"))
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n"), avg(col("ai_sentiment")).as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (t, (n, s)) =>
      assert(n === want(t)._1, t)
      assert(math.abs(s - want(t)._2) < 1e-9, t)
    }
  }

  test("dashboard overview + drill-down + distinct tickers verbatim (app.py)") {
    ana
    // app.py:28-36 — f-string table name maps through the backtick rule
    val overview = GraftSql.sql(spark, """
SELECT
    window_timestamp,
    ticker,
    latest_price
FROM `proj.stock_market_dataset.realtime_analysis`
ORDER BY window_timestamp DESC
LIMIT 500
""").collect()
    assert(overview.length === 500)
    val wantTs = ana.select("window_timestamp").collect()
      .map(_.getTimestamp(0)).sortBy(-_.getTime).take(500).toSeq
    assert(overview.map(_.getTimestamp(0)).sortBy(-_.getTime).toSeq === wantTs)
    // app.py:79-95 — drill-down for one key (ts unique within a ticker)
    val drill = GraftSql.sql(spark, """
SELECT
    window_timestamp,
    latest_price,
    high_price_1m,
    total_volume_1m,
    total_value_1m,
    sma_5m,
    is_volume_spike,
    system_latency,
    ai_sentiment,
    ai_summary
FROM `proj.stock_market_dataset.realtime_analysis`
WHERE ticker = 'purchase'
ORDER BY window_timestamp DESC
LIMIT 100
""").collect()
    val wantDrill = ana.filter(col("ticker") === "purchase")
      .orderBy(col("window_timestamp").desc).limit(100)
      .select("window_timestamp", "latest_price", "high_price_1m",
        "total_volume_1m", "total_value_1m", "sma_5m", "is_volume_spike",
        "system_latency", "ai_sentiment", "ai_summary").collect()
    assert(drill.length === wantDrill.length && drill.nonEmpty)
    drill.zip(wantDrill).foreach { case (g, w) => assert(g === w) }
    // app.py:70 — distinct-ticker fallback
    val tickers = GraftSql.sql(spark,
      "SELECT DISTINCT ticker FROM `proj.stock_market_dataset.realtime_analysis`")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(tickers === ana.select("ticker").distinct()
      .collect().map(_.getString(0)).sorted.toSeq)
  }

  test("rewrite is lexical and shape-preserving for out-of-corpus SQL") {
    assert(GraftSql.rewrite("SELECT 1") === "SELECT 1")
    assert(GraftSql.rewrite("SELECT * FROM `a.b.c` WHERE x > 0") ===
      "SELECT * FROM c WHERE x > 0")
    assert(GraftSql.rewrite("SELECT * FROM `a.b.c`",
      tableMap = Map("a.b.c" -> "view_c")) === "SELECT * FROM view_c")
  }

  test("negative cases: string literals survive every rewrite " +
      "byte-for-byte") {
    // TIMESTAMP_SUB / INTERVAL text inside a literal is data, not SQL
    val lit = "SELECT 'TIMESTAMP_SUB(ts, INTERVAL 5 MINUTE)' AS s FROM t"
    assert(GraftSql.rewrite(lit) === lit)
    // CURRENT_TIMESTAMP() inside a literal stays put even with an
    // injected clock; the real call outside is still rewritten
    val mixed = "SELECT 'CURRENT_TIMESTAMP()' AS s, CURRENT_TIMESTAMP() AS t"
    assert(GraftSql.rewrite(mixed, now = Some("TIMESTAMP '2024-01-01'")) ===
      "SELECT 'CURRENT_TIMESTAMP()' AS s, (TIMESTAMP '2024-01-01') AS t")
    // backtick paths inside a literal are data; '' escapes respected
    val bt = "SELECT '`a.b.c` isn''t a table ref' AS s FROM `x.y.z`"
    assert(GraftSql.rewrite(bt) ===
      "SELECT '`a.b.c` isn''t a table ref' AS s FROM z")
  }

  test("negative cases: backslash-escaped quotes keep the literal mask " +
      "in sync (BigQuery allows both \\' and '')") {
    // the \' must NOT terminate the literal — the FROM and QUALIFY
    // inside it are data; the real FROM follows
    val bs = "SELECT 'it\\'s FROM fake QUALIFY' AS s FROM `x.y.z`"
    assert(GraftSql.rewrite(bs) ===
      "SELECT 'it\\'s FROM fake QUALIFY' AS s FROM z")
    // a desynced mask would also mis-place rewrite spans: the function
    // call AFTER a backslash-escaped literal must still rewrite
    val after = "SELECT 'a\\'b' AS s, " +
      "TIMESTAMP_SUB(ts, INTERVAL 5 MINUTE) AS t FROM t"
    assert(GraftSql.rewrite(after) ===
      "SELECT 'a\\'b' AS s, (ts - INTERVAL 5 MINUTE) AS t FROM t")
    // backslash before a non-quote char is a plain escape, not a
    // terminator hazard
    val plain = "SELECT 'a\\nb' AS s FROM t QUALIFY rn = 1"
    assert(GraftSql.rewrite(plain).trim ===
      "SELECT 'a\\nb' AS s FROM (SELECT *, (rn = 1) AS __keep FROM t) " +
        "WHERE __keep")
    // trailing backslash at end-of-string: unterminated literal passes
    // through shape-preserved (no index overrun)
    val trail = "SELECT 'oops\\"
    assert(GraftSql.rewrite(trail) === trail)
  }

  test("literal-in-argument: TIMESTAMP_SUB with a literal first arg " +
      "still rewrites, carrying the literal through verbatim") {
    assert(GraftSql.rewrite(
      "SELECT * FROM t WHERE ts > " +
        "TIMESTAMP_SUB(TIMESTAMP '2024-01-01 00:00:00', INTERVAL 1 DAY)") ===
      "SELECT * FROM t WHERE ts > " +
        "(TIMESTAMP '2024-01-01 00:00:00' - INTERVAL 1 DAY)")
    // a comma INSIDE the argument's literal must not split the args
    assert(GraftSql.rewrite(
      "SELECT TIMESTAMP_SUB(coalesce(ts, TIMESTAMP 'a,b'), INTERVAL 5 MINUTE) AS x") ===
      "SELECT (coalesce(ts, TIMESTAMP 'a,b') - INTERVAL 5 MINUTE) AS x")
  }

  test("double-quoted strings: masked like single-quoted — no keyword " +
      "steering, no rewrites inside") {
    val q = "SELECT \" FROM fake \" AS s, '`a.b.c`' AS t FROM `x.y.z` " +
      "QUALIFY rn = 1"
    assert(GraftSql.rewrite(q).trim ===
      "SELECT \" FROM fake \" AS s, '`a.b.c`' AS t FROM (SELECT *, " +
        "(rn = 1) AS __keep FROM z) WHERE __keep")
  }

  test("negative cases: keywords inside literals never steer the " +
      "QUALIFY split") {
    // a FROM inside a string literal must not be taken as the real FROM
    val q = "SELECT x, ' FROM fake ' AS s FROM t " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY x ORDER BY y) = 1"
    assert(GraftSql.rewrite(q).trim ===
      "SELECT x, ' FROM fake ' AS s FROM (SELECT *, " +
        "(ROW_NUMBER() OVER (PARTITION BY x ORDER BY y) = 1) " +
        "AS __keep FROM t) WHERE __keep")
    // an ORDER inside a literal after QUALIFY must not truncate the
    // predicate
    val q2 = "SELECT x FROM t QUALIFY rn = 1 AND s <> ' ORDER junk ' " +
      "ORDER BY x"
    assert(GraftSql.rewrite(q2) ===
      "SELECT x FROM (SELECT *, (rn = 1 AND s <> ' ORDER junk ') " +
        "AS __keep FROM t) WHERE __keep ORDER BY x")
  }

  test("negative cases: out-of-corpus QUALIFY shapes fail cleanly or " +
      "pass through") {
    // QUALIFY inside a subquery sits at paren depth > 0: the shim does
    // not claim it — passes through for the SQL parser to reject
    val sub = "SELECT * FROM (SELECT x FROM t QUALIFY rn = 1) s"
    assert(GraftSql.rewrite(sub) === sub)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(GraftSql.rewrite(sub))
    }
    // top-level QUALIFY with no top-level FROM: clean failure, not a
    // mangled query
    intercept[IllegalArgumentException] {
      GraftSql.rewrite("SELECT 1 QUALIFY rn = 1")
    }
    // unterminated literal: shape-preserved pass-through (the parser
    // owns the rejection)
    val unterm = "SELECT 'oops FROM t"
    assert(GraftSql.rewrite(unterm) === unterm)
  }
}
