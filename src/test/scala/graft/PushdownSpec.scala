package graft

/** Scan-level efficiency evidence on REGISTERED queries: filters reach
  * the parquet scan (`PushedFilters`) and unused columns never leave it
  * (`ReadSchema`). At 100 TB these two lines of the plan are the
  * difference between reading terabytes and reading gigabytes — a
  * regression here (a transform that breaks pushdown, a select that
  * drags the fat `text` column along) is invisible to correctness tests
  * and caught only by looking at the scan.
  */
class PushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("stock_normalize: price null-filter is pushed into the events scan " +
      "and the unused user_id column is pruned") {
    val plan = planOf("stock_normalize")
    assert(plan.contains("PushedFilters: [IsNotNull(value)"),
      s"events scan should push IsNotNull(value):\n$plan")
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("user_id"),
      s"normalize never touches user_id — scan must prune it: $readSchema")
  }

  test("corpus_shuffle: the fat text column never reaches the plan") {
    // the documents scan runs inside shuffleOrder's eager checkpoint,
    // already projected to (doc_id, shuffle_key, bucket) — the executed
    // plan reads that slim ExistingRDD, and no stage resurrects text
    val plan = planOf("corpus_shuffle")
    assert(plan.contains("Scan ExistingRDD[doc_id"), plan)
    assert(!plan.contains("text#"),
      s"shuffle order is pure id/hash math — text must never appear:\n$plan")
  }

  test("q10_tickers: events scan prunes user_id (value/props stay: the " +
      "normalize null-filters consume them)") {
    val plan = planOf("q10_tickers")
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.nonEmpty, plan)
    assert(!readSchema.contains("user_id"),
      s"distinct-ticker count never touches user_id: $readSchema")
  }
}
