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

  test("rewrite is lexical and shape-preserving for out-of-corpus SQL") {
    assert(GraftSql.rewrite("SELECT 1") === "SELECT 1")
    assert(GraftSql.rewrite("SELECT * FROM `a.b.c` WHERE x > 0") ===
      "SELECT * FROM c WHERE x > 0")
    assert(GraftSql.rewrite("SELECT * FROM `a.b.c`",
      tableMap = Map("a.b.c" -> "view_c")) === "SELECT * FROM view_c")
  }
}
