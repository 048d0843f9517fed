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

  private def planOf(name: String): String = {
    // FileScan metadata (ReadSchema/PushedFilters) is truncated at 100
    // chars by default — enough to hide the very column an assertion
    // is about; widen it so the evidence is the full scan line
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
  }

  /** All parquet FileScan lines over `table` in the plan. */
  private def scansOf(plan: String, table: String): Seq[String] =
    plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(s"$table.parquet"))
      .toSeq

  private def readSchemaOf(scanLine: String): String =
    "ReadSchema: struct<[^>]*>".r.findFirstIn(scanLine).getOrElse("")

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

  // ---- bench slowest-ten: scan evidence locked per query ----------------
  // These are the queries where a pruning/pushdown regression costs the
  // most at 100 TB; each assertion states the scan property that makes
  // the query's cost model hold.

  test("dedup pair queries read only (doc_id, text) from documents") {
    // shingle/banding pipelines are pure text math: the lang/source/
    // n_chars columns must never reach any of their documents scans
    for (q <- Seq("dedup_jaccard_pairs", "dedup_containment_pairs")) {
      val scans = scansOf(planOf(q), "documents")
      assert(scans.nonEmpty, s"$q: expected documents FileScans in the plan")
      scans.foreach { s =>
        val rs = readSchemaOf(s)
        assert(rs.nonEmpty, s"$q: unparseable scan line: $s")
        for (fat <- Seq("lang", "source", "n_chars"))
          assert(!rs.contains(fat), s"$q: $fat must be pruned from: $rs")
      }
    }
  }

  test("ANN probe/graph queries never rescan the raw embedding column " +
      "after the unitized/code pins") {
    // The ADC/cell pipelines pin slim (vec_id, unit, cell) / code tables
    // once; if the raw `embedding` float column reappears in the final
    // plan, a probe stage is re-reading the base table — the exact
    // rescan the PQ/IVF design exists to avoid (64× more bytes at rest).
    for (q <- Seq("sim_pagerank", "sim_knn_graph_mp", "sim_ivfpq_topk",
        "sim_ivfpq_residual")) {
      val plan = planOf(q)
      assert(!plan.contains("embedding#"),
        s"$q: raw embedding column resurrected after the pinned build:\n" +
          plan.linesIterator.filter(_.contains("embedding#")).mkString("\n"))
    }
  }

  test("bounded query sets push their vec_id range into the embeddings scan") {
    // the 20-query probe side must reach the scan as a pushed range —
    // at 100 TB this is the difference between reading 20 rows' worth
    // of row groups and the whole base table on the query side
    for (q <- Seq("sim_pq_topk", "sim_recall_report")) {
      val plan = planOf(q)
      assert(plan.contains("LessThan(vec_id,20)"),
        s"$q: query-set scan must push vec_id < nQueries:\n" +
          scansOf(plan, "embeddings").mkString("\n"))
    }
  }

  test("corpus capstones scan documents per-use, never one fat scan") {
    // corpus_curated composes quality (doc_id,text,n_chars), dedup
    // (doc_id,text) and report (doc_id,lang,source) stages — each scan
    // reads its own projection; a scan carrying BOTH text and lang
    // would mean one fat scan is feeding everything
    val curated = scansOf(planOf("corpus_curated"), "documents")
    assert(curated.nonEmpty)
    curated.foreach { s =>
      val rs = readSchemaOf(s)
      assert(!(rs.contains("text") && rs.contains("lang")),
        s"corpus_curated: per-use pruning lost — fat scan: $rs")
    }
    // the ensemble's dedup-spine pass needs ids only — at least one
    // scan must be doc_id-alone (no text bytes moved for the spine)
    val ensemble = scansOf(planOf("corpus_signal_ensemble"), "documents")
    assert(ensemble.exists(readSchemaOf(_) === "ReadSchema: struct<doc_id:bigint>"),
      s"corpus_signal_ensemble: expected a doc_id-only spine scan:\n" +
        ensemble.map(readSchemaOf).mkString("\n"))
  }

  test("rel_basket_pairs: every lineitem scan reads only the two key " +
      "columns — the quadratic pair join never moves payload bytes") {
    val scans = scansOf(planOf("rel_basket_pairs"), "lineitem")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(readSchemaOf(s) ===
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>",
        s"basket pairs must scan keys only: ${readSchemaOf(s)}")
    }
  }

  test("rel_skyline: the part scan prunes the unused name/type columns") {
    val scans = scansOf(planOf("rel_skyline"), "part")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val rs = readSchemaOf(s)
      assert(!rs.contains("p_name") && !rs.contains("p_type"),
        s"skyline touches 4 columns only: $rs")
    }
  }

  test("rel_profile: ONE orders scan feeds all six column profiles") {
    val scans = scansOf(planOf("rel_profile"), "orders")
    assert(scans.length === 1,
      s"profiling must be single-pass, found ${scans.length} scans")
  }

  test("stock_gapfill and rel_event_transitions prune the events " +
      "columns they never touch") {
    val gf = scansOf(planOf("stock_gapfill"), "events")
    assert(gf.nonEmpty)
    gf.foreach { s =>
      assert(!readSchemaOf(s).contains("user_id"),
        s"gapfill never touches user_id: ${readSchemaOf(s)}")
    }
    val et = scansOf(planOf("rel_event_transitions"), "events")
    assert(et.nonEmpty)
    et.foreach { s =>
      val rs = readSchemaOf(s)
      assert(!rs.contains("props") && !rs.contains("value"),
        s"transitions never touch props/value: $rs")
    }
  }

  test("round-7 additions prune their scans: RFM reads three orders " +
      "columns, rolling-corr ignores user_id, readability/zipf/dsir " +
      "never drag n_chars, expectations is ONE orders scan") {
    // rfm pins its customer-grain aggregate (round-9), which wraps the
    // orders scan in a LogicalRDD in the default mode — inspect the
    // plan with pins disabled so the scan is visible again
    val prevMode = sys.props.get(graft.Materialize.modeProp)
    sys.props(graft.Materialize.modeProp) = "none"
    try {
      val rfm = scansOf(planOf("rel_rfm"), "orders")
      assert(rfm.nonEmpty)
      rfm.foreach { s =>
        val rs = readSchemaOf(s)
        assert(!rs.contains("o_orderpriority") && !rs.contains("o_orderstatus"),
          s"rfm needs only custkey/date/price: $rs")
      }
    } finally {
      prevMode match {
        case Some(v) => sys.props(graft.Materialize.modeProp) = v
        case None => sys.props.remove(graft.Materialize.modeProp)
      }
    }
    val rc = scansOf(planOf("stock_rolling_corr"), "events")
    assert(rc.nonEmpty)
    rc.foreach { s =>
      assert(!readSchemaOf(s).contains("user_id"),
        s"rolling corr never touches user_id: ${readSchemaOf(s)}")
    }
    Seq("text_readability", "text_zipf").foreach { q =>
      val ds = scansOf(planOf(q), "documents")
      assert(ds.nonEmpty, q)
      ds.foreach { s =>
        assert(!readSchemaOf(s).contains("n_chars"),
          s"$q computes from text only: ${readSchemaOf(s)}")
      }
    }
    // one-pass suite: exactly one orders scan feeds all six checks
    assert(scansOf(planOf("rel_expectations"), "orders").size === 1,
      "the expectation suite must cost one scan")
  }

  test("sample_reservoir: the fat text column is pruned from the " +
      "documents scan (only keys + attrs feed the bottom-k)") {
    val plan = planOf("sample_reservoir")
    val scans = scansOf(plan, "documents")
    assert(scans.nonEmpty, plan)
    scans.foreach { sc =>
      assert(!readSchemaOf(sc).contains("text"),
        s"reservoir reads doc_id/lang/source only: $sc")
    }
  }

  test("rel_cohort_retention: the orders scan reads only custkey + " +
      "orderdate") {
    val plan = planOf("rel_cohort_retention")
    val scans = scansOf(plan, "orders")
    assert(scans.nonEmpty, plan)
    scans.foreach { sc =>
      val rs = readSchemaOf(sc)
      assert(!rs.contains("o_totalprice") && !rs.contains("o_orderstatus"),
        s"cohorts need only (o_custkey, o_orderdate): $sc")
    }
  }

  test("stock_lead_lag / stock_ou_halflife: unused events columns " +
      "(user_id, event_id) never leave the scan") {
    Seq("stock_lead_lag", "stock_ou_halflife").foreach { q =>
      val plan = planOf(q)
      val scans = scansOf(plan, "events")
      assert(scans.nonEmpty, s"$q:\n$plan")
      scans.foreach { sc =>
        val rs = readSchemaOf(sc)
        assert(!rs.contains("user_id") && !rs.contains("event_id"),
          s"$q bars need (event_type, ts, value, props) only: $sc")
      }
    }
  }
}
