package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semi/anti-join and rollup semantics on literal frames (the sf-data
  * versions of these are degenerate: every dim row is referenced). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("scd2History: per-user intervals tile the timeline — valid_to " +
      "chains to the next valid_from, versions are contiguous, exactly " +
      "one current row per user") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val hist = graft.operators.Relational.scd2History(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(4),
        Option(r.getTimestamp(5)), r.getBoolean(6)))
    assert(hist.nonEmpty)
    hist.groupBy(_._1).foreach { case (user, rows) =>
      val byVersion = rows.sortBy(_._2)
      // versions 1..k with no gaps
      assert(byVersion.map(_._2).toSeq === (1L to rows.length).toSeq,
        s"user $user: versions not contiguous")
      // half-open intervals chain with no gaps or overlaps
      byVersion.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $user v${a._2}: valid_to must equal next valid_from")
        case _ =>
      }
      // exactly the last version is current (NULL valid_to)
      assert(byVersion.count(_._5) === 1 && byVersion.last._5,
        s"user $user: exactly one current row, and it is the last version")
    }
  }

  test("left_semi with non-equi conjunct keeps each order at most once") {
    val orders = Seq((1L, ts("1996-02-01")), (2L, ts("1996-03-01")),
      (3L, ts("1996-04-01")))
      .toDF("o_orderkey", "o_orderdate")
    // order 1: two qualifying lineitems (must not double-count);
    // order 2: lineitem shipped same day (strict > fails); order 3: none.
    val lineitem = Seq((1L, ts("1996-02-10")), (1L, ts("1996-02-20")),
      (2L, ts("1996-03-01")))
      .toDF("l_orderkey", "l_shipdate")
    val out = orders.join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L))
  }

  test("left_anti keeps exactly the unmatched rows") {
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
    val orders = Seq(Tuple1(1L), Tuple1(1L)).toDF("o_custkey")
    val out = customer.join(orders,
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 3L))
  }

  test("count-min sketch never undercounts; tight on this cardinality") {
    val out = graft.operators.Relational
      .cmsUserCounts(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("cms_never_undercounts"),
        s"user ${r.getAs[Long]("user_id")}")
      assert(r.getAs[Boolean]("cms_within_eps"),
        s"user ${r.getAs[Long]("user_id")}")
    }
  }

  test("lateSuppliers (Q21 shape): only the sole-late supplier of a " +
      "multi-supplier order counts") {
    // order 1: suppliers 10 (late) and 11 (on time)  -> 10 counts
    // order 2: supplier 10 alone, late               -> no other supplier
    // order 3: suppliers 10 and 11, BOTH late        -> neither counts
    // order 4: suppliers 10, 11 on time              -> nobody late
    val l = Seq(
      (1L, 10L, ts("1996-06-01")), (1L, 11L, ts("1996-01-15")),
      (2L, 10L, ts("1996-06-01")),
      (3L, 10L, ts("1996-06-01")), (3L, 11L, ts("1996-07-01")),
      (4L, 10L, ts("1996-01-10")), (4L, 11L, ts("1996-01-10")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Seq((1L, ts("1996-01-01")), (2L, ts("1996-01-01")),
      (3L, ts("1996-01-01")), (4L, ts("1996-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val s = Seq((10L, "S10"), (11L, "S11")).toDF("s_suppkey", "s_name")
    val out = graft.operators.Relational
      .lateSuppliersOn(l, o, s, lateDays = 90, k = 10).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "S10")
    assert(out(0).getLong(1) === 1L) // only order 1's late line
  }

  test("orderCountDist (Q13 shape): zero-order customers land in the " +
      "zero bucket") {
    // customers 1 (two orders), 2 (one order), 3 (none): the zero
    // bucket exists ONLY because the join is left outer — this is the
    // row a WHERE-side predicate placement would silently drop
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((1L, 100L), (1L, 101L), (2L, 102L))
      .toDF("o_custkey", "o_orderkey")
    val out = graft.operators.Relational
      .orderCountDistOn(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("topSupplier (Q15 shape): revenue ties are all kept") {
    // suppliers 10 and 11 tie at 200.0; supplier 12 trails
    val l = Seq((10L, 200.0, 0.0), (11L, 100.0, 0.0), (11L, 100.0, 0.0),
      (12L, 50.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val s = Seq((10L, "S10"), (11L, "S11"), (12L, "S12"))
      .toDF("s_suppkey", "s_name")
    val out = graft.operators.Relational.topSupplierOn(l, s)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq === Seq((10L, 200.0), (11L, 200.0)))
  }

  test("trailingSpend: the RANGE frame is a value window — 90 days in, " +
      "91 days out, peers share totals") {
    val orders = Seq(
      (1L, 100L, ts("1996-01-01"), 10.0),
      (1L, 101L, ts("1996-03-31"), 20.0), // day 90 after 1/1 -> includes it
      (1L, 102L, ts("1996-07-01"), 40.0), // 92 days after 3/31 -> alone
      (2L, 200L, ts("1996-05-05"), 7.0),  // same-instant peers:
      (2L, 201L, ts("1996-05-05"), 9.0))  //   both see both (RANGE)
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.Relational.trailingSpendOn(orders, days = 90)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(3), r.getLong(4))).toMap
    assert(out(100L) === (10.0, 1L))
    assert(out(101L) === (30.0, 2L)) // 90-day bound is inclusive
    assert(out(102L) === (40.0, 1L)) // 92 days: prior order aged out
    assert(out(200L) === (16.0, 2L)) // RANGE peers: identical frames
    assert(out(201L) === (16.0, 2L))
  }

  test("rollingActiveUsers: WAU window is 7 days inclusive, repeat " +
      "activity counts once, report days are observed days only") {
    // user 1: days 1, 2 and 9; user 2: day 2 only
    val events = Seq(
      (1L, ts("1996-01-01")), (1L, ts("1996-01-02")), (1L, ts("1996-01-09")),
      (2L, ts("1996-01-02")))
      .toDF("user_id", "ts")
    val out = graft.operators.Relational.rollingActiveUsersOn(events)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (ts("1996-01-01"), 1L, 1L),
      // day 2: both users in the window; user 1's two active days
      // contribute ONE distinct user
      (ts("1996-01-02"), 2L, 2L),
      // day 9: window is [jan 3, jan 9] — the jan 2 burst aged out
      (ts("1996-01-09"), 1L, 1L)))
  }

  test("funnelWindowed: conversion needs a purchase AFTER the first " +
      "view and WITHIN the horizon") {
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, u, Timestamp.valueOf(t), typ)
    val events = Seq(
      // user 1: purchase 59 min after the view -> converted
      e(1, 1L, "1996-01-01 10:00:00", "view"),
      e(2, 1L, "1996-01-01 10:59:00", "purchase"),
      // user 2: purchase 61 min after the view -> horizon expired
      e(3, 2L, "1996-01-01 10:00:00", "view"),
      e(4, 2L, "1996-01-01 11:01:00", "purchase"),
      // user 3: only a purchase BEFORE the view -> not converted
      e(5, 3L, "1996-01-01 09:00:00", "purchase"),
      e(6, 3L, "1996-01-01 10:00:00", "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Relational
      .funnelWindowedOn(events, "1 hour")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("rollup emits group, subtotal and grand-total rows") {
    val df = Seq(("O", "HIGH", 10.0), ("O", "LOW", 20.0), ("F", "HIGH", 5.0))
      .toDF("status", "prio", "price")
    val out = df.rollup(col("status"), col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
      .collect()
    assert(out.length === 6) // 3 leaves + 2 subtotals + 1 grand total
    val grand = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n") === 3L && grand.getAs[Double]("total") === 35.0)
  }

  test("partSkyline: exactly the non-dominated set per brand " +
      "(brute-force dominance check on sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val parts = graft.sources.Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = parts.filter { case (brand, key, price, size) =>
      !parts.exists { case (b2, k2, p2, s2) =>
        b2 == brand && k2 != key && p2 <= price && s2 >= size &&
          (p2 < price || s2 > size)
      }
    }.map(t => (t._1, t._2)).toSet
    val got = graft.operators.Relational.partSkyline(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.size < parts.length, "some parts are dominated")
  }

  test("basketPairs: apriori item prune is result-invariant vs the " +
      "naive unpruned pair join") {
    val dir = "/root/testdata/sf0.001"
    val items = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    val got = graft.operators.Relational.basketPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("eventTransitions: probabilities row-normalize to 1 per source " +
      "type and counts total n_events - n_users") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.eventTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (from, rows) =>
      val p = rows.map(_._3).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from: probs sum to $p")
    }
    val ev = graft.sources.Tables.events(spark, dir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(out.map(_._2).sum === nEvents - nUsers,
      "each user's chain of k events yields k-1 transitions")
  }

  test("abTestOn: identical arms give t=0, a shifted arm moves t with " +
      "the documented sign") {
    def ev(id: Long, u: Long, v: Double) =
      (id, u, Timestamp.valueOf("1996-01-01 00:00:00"), "click", v)
    // arms split on user_id % 2: even users arm A, odd users arm B
    val same = (1L to 40L).map(u => ev(u, u, 5.0 + (u % 4)))
    val out = graft.operators.Relational.abTestOn(
      same.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .collect().head
    assert(out.getAs[Long]("n_a") === 20L && out.getAs[Long]("n_b") === 20L)
    // u%4 cycles 1,2,3,0 over consecutive users: both arms see {0+5,2+5}
    // or {1+5,3+5}... verify means differ by exactly the parity shift
    val shifted = (1L to 40L).map(u =>
      ev(u, u, if (u % 2 == 0) 10.0 else 6.0))
    val out2 = graft.operators.Relational.abTestOn(
      shifted.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .collect().head
    assert(out2.getAs[Double]("mean_a") === 10.0)
    assert(out2.getAs[Double]("mean_b") === 6.0)
    // zero within-arm variance → t is +inf-ish guarded by var=0: the
    // statistic is NULL (0/0 → NaN→NULL is not expected here; variance
    // 0 makes the denominator 0) — add jitter instead for a finite t
    val jittered = (1L to 40L).map(u =>
      ev(u, u, (if (u % 2 == 0) 10.0 else 6.0) + (u % 8) / 100.0))
    val out3 = graft.operators.Relational.abTestOn(
      jittered.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .collect().head
    assert(out3.getAs[Double]("t_stat") > 0,
      "arm A mean is higher → positive t by the (mean_a - mean_b) sign")
  }

  test("timeToConvertOn: converts only on a purchase strictly after " +
      "the first signup; non-signup users are absent") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, u, Timestamp.valueOf(t), typ)
    val events = Seq(
      ev(1, 1L, "1996-01-01 10:00:00", "signup"),
      ev(2, 1L, "1996-01-01 12:30:00", "purchase"), // +2.5h → converts
      ev(3, 2L, "1996-01-01 09:00:00", "purchase"), // before signup
      ev(4, 2L, "1996-01-01 10:00:00", "signup"),   // → not converted
      ev(5, 3L, "1996-01-01 08:00:00", "purchase")) // no signup → absent
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Relational.timeToConvertOn(events)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((Some(9000L * 1000000L), true))) // 2.5 h in µs
    assert(out(2L) === ((None, false)))
  }

  test("revenueConcentration: shares and customer counts grow with the " +
      "slice, every share is a valid fraction, top-10% holds well over " +
      "10% of revenue (the Pareto signal)") {
    val out = graft.operators.Relational
      .revenueConcentration(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 5L, 10L))
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2, "thresholds shrink as the slice widens")
        assert(a._3 <= b._3 && a._4 <= b._4,
          "counts and shares grow with the slice")
      case _ =>
    }
    out.foreach { case (_, _, n, share) =>
      assert(n > 0 && share > 0 && share <= 1.0)
    }
    assert(out.last._4 > 0.10,
      "top decile must out-hold its population share")
  }

  test("giniRevenue: matches the brute-force rank formula and lands in " +
      "[0, 1)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.giniRevenue(spark, dir)
      .collect().head
    val (n, total, gini) =
      (out.getLong(0), out.getDouble(1), out.getDouble(2))
    val revs = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    assert(n === revs.length.toLong)
    val s = revs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val exp = 2.0 * s / (n * revs.sum) - (n + 1.0) / n
    assert(math.abs(gini - exp) < 1e-5, s"$gini vs $exp")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("fuzzyPairsOf: finds substitutions and insert/deletes, excludes " +
      "distance-2 and transpositions, equals brute-force levenshtein=1") {
    val names = Seq("cat", "cut", "cart", "dog", "dig", "dogs", "act",
      "house", "mouse", "horse", "hose")
    val got = graft.operators.Relational.fuzzyPairsOf(
      names.toDF("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- names; b <- names if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    assert(got === expected)
    assert(got(("cat", "cut")) && got(("cart", "cat")), "sub + insert")
    assert(!got(("act", "cat")), "transposition is distance 2")
    assert(got(("house", "mouse")) && got(("horse", "house")))
    assert(!got(("dig", "dogs")), "distance 2 (sub + insert) excluded")
  }

  test("entityGroupsOf: transitive typo chains collapse to one entity " +
      "(min key), unrelated names stay singletons") {
    // chain: smith ~ smyth ~ smythe (transitively one entity even
    // though smith↔smythe is distance 2); jones isolated
    val cust = Seq((10L, "smith"), (20L, "smyth"), (30L, "smythe"),
      (40L, "jones"), (50L, "janes"))
      .toDF("c_custkey", "c_name")
    val out = graft.operators.Relational.entityGroupsOf(cust)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L))
  }

  test("topPathsOn: sessions split at the 30-min gap, paths keep event " +
      "order and truncate to the step cap") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, u, Timestamp.valueOf(t), typ)
    val events = Seq(
      // user 1, session 1: view>click>purchase
      ev(1, 1L, "1996-01-01 10:00:00", "view"),
      ev(2, 1L, "1996-01-01 10:05:00", "click"),
      ev(3, 1L, "1996-01-01 10:10:00", "purchase"),
      // user 1, session 2 (gap exactly 30 min from last → NEW session)
      ev(4, 1L, "1996-01-01 10:40:00", "view"),
      // user 2: one long session of 7 events → truncated to 5
      ev(5, 2L, "1996-01-01 09:00:00", "view"),
      ev(6, 2L, "1996-01-01 09:01:00", "view"),
      ev(7, 2L, "1996-01-01 09:02:00", "view"),
      ev(8, 2L, "1996-01-01 09:03:00", "view"),
      ev(9, 2L, "1996-01-01 09:04:00", "view"),
      ev(10, 2L, "1996-01-01 09:05:00", "click"),
      ev(11, 2L, "1996-01-01 09:06:00", "purchase"),
      // user 3: same journey as user 1's first session
      ev(12, 3L, "1996-01-01 12:00:00", "view"),
      ev(13, 3L, "1996-01-01 12:01:00", "click"),
      ev(14, 3L, "1996-01-01 12:02:00", "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Relational.topPathsOn(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "view>click>purchase" -> 2L, // users 1 + 3
      "view" -> 1L,                // the gap-split second session
      "view>view>view>view>view" -> 1L)) // truncated at 5 steps
  }

  test("streaming transition steps (flatMapGroupsWithState) aggregate " +
      "to exactly the batch LEAD-window transition counts, including " +
      "cross-trigger boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[graft.streaming.TransEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[graft.streaming.TransEvent]
    val q = graft.streaming.TransitionState.steps(stream.toDS())
      .writeStream.format("memory").queryName("trans_sink")
      .outputMode("append").start()
    try {
      // three triggers: cross-trigger steps only exist because the
      // carry survives in state
      events.grouped(math.max(events.length / 3, 1)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("trans_sink")
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.Relational
        .eventTransitionsOn(graft.sources.Tables.events(spark, dir))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("survivalKm: curve starts at <= 1, is monotone non-increasing, " +
      "risk sets telescope, and matches a direct product-limit " +
      "recomputation") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.survivalKm(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    out.map(_._4).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9); case _ => ()
    }
    assert(out.head._4 <= 1.0 + 1e-9)
    // risk set telescopes: n_risk(i+1) = n_risk(i) - n_dur(i); we can
    // recover n_dur from the collected rows only through the direct
    // recomputation below, so recompute everything from the orders
    import java.time.temporal.ChronoUnit
    val co = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2)))
    val cutoff = co.map(_._2).max
    val durs = co.map { case (f, l) =>
      (ChronoUnit.DAYS.between(f.toLocalDate, l.toLocalDate),
        l.isBefore(cutoff.minusDays(
          graft.operators.Relational.KmChurnDays)))
    }
    def g12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var atRisk = durs.length.toLong
    var logSum = BigDecimal(0)
    var dead = false
    val expect = durs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, rows) =>
        val d = rows.count(_._2).toLong
        val nr = atRisk
        if (d == nr) dead = true
        else if (d < nr) logSum += g12(math.log(1.0 - d.toDouble / nr))
        atRisk -= rows.length
        val s = if (dead) 0.0
          else BigDecimal(math.exp(logSum.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, nr, d, s)
    }
    assert(out.toSeq === expect)
  }

  test("seasonalityDft: power shares are bounded by 1 and match a " +
      "direct projection recomputation on the same grid") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.seasonalityDft(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq ===
      graft.operators.Relational.DftPeriods.map(_.toLong))
    out.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0 + 1e-6) }
    val daily = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_orderdate")).agg(count(lit(1)).as("x"))
      .collect().map(r =>
        (r.getAs[java.time.LocalDateTime](0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).min
    val n = daily.length.toDouble
    val mean = daily.map(_._2).sum / n
    def g10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    graft.operators.Relational.DftPeriods.foreach { p =>
      val terms = daily.map { case (d, x) =>
        val t = java.time.temporal.ChronoUnit.DAYS.between(d0, d)
        val ang = 2 * math.Pi * (t % p).toDouble / p
        val xc = x.toDouble - mean
        (g10(xc * math.cos(ang)), g10(xc * math.sin(ang)), g10(xc * xc))
      }
      val a = terms.map(_._1).sum.toDouble
      val b = terms.map(_._2).sum.toDouble
      val ss = terms.map(_._3).sum.toDouble
      val expect = BigDecimal((a * a + b * b) / (n * ss))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out.find(_._1 == p.toLong).get._3 === expect, s"period $p")
    }
  }

  test("theilDecomposition: within terms are non-negative, shares " +
      "normalize, and within+between reconstructs the global Theil") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.theilDecomposition(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    out.foreach { case (n, _, _, tw, _, _) =>
      assert(tw >= -1e-9, s"nation $n within-Theil must be >= 0")
    }
    // global Theil from the raw per-customer revenues
    val xs = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
        .as("x"))
      .collect().map(_.getDouble(1)).filter(_ > 0)
    val mu = xs.sum / xs.length
    val global = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    val reconstructed = out.map(_._5).sum + out.map(_._6).sum
    assert(math.abs(reconstructed - global) < 1e-3,
      s"$reconstructed vs $global")
  }

  test("markovStationaryOn: mass is conserved across iterations and " +
      "the result matches a direct power-iteration recomputation") {
    import java.sql.Timestamp
    def ev(id: Long, user: Long, min: Int, tpe: String) =
      (id, user,
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          min * 60000L), tpe)
    // user 1: a->b->a->b (a<->b cycle); user 2: a->c, c is absorbing
    // (no out-transition) and must keep its mass
    val events = Seq(
      ev(0, 1, 0, "a"), ev(1, 1, 1, "b"), ev(2, 1, 2, "a"),
      ev(3, 1, 3, "b"),
      ev(4, 2, 0, "a"), ev(5, 2, 1, "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Relational.markovStationaryOn(events)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set("a", "b", "c"))
    assert(math.abs(out.values.sum - 1.0) < 1e-5)
    // direct recomputation on the identical grid: P(a->b)=2/3,
    // P(a->c)=1/3, P(b->a)=1, c dangles
    def g12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val p = Map(("a", "b") -> 2.0 / 3, ("a", "c") -> 1.0 / 3,
      ("b", "a") -> 1.0)
    var pi = Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3)
    (1 to graft.operators.Relational.MarkovIters).foreach { _ =>
      val inflow = Seq("a", "b", "c").map { s =>
        s -> p.collect { case ((f, t), pr) if t == s =>
          g12(pi(f) * pr) }.sum.toDouble
      }.toMap
      pi = Seq("a", "b", "c").map { s =>
        s -> (inflow(s) + (if (s == "c") pi("c") else 0.0))
      }.toMap
    }
    pi.foreach { case (s, v) =>
      val expect = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(s) === expect, s"state $s")
    }
  }

  test("benfordScreen: digit counts match the brute-force cents-string " +
      "extraction, shares sum to 1, chi2 terms are non-negative") {
    val dir = "/root/testdata/sf0.001"
    val expected = graft.sources.Tables.orders(spark, dir)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = graft.operators.Relational.benfordScreen(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(4)))
    assert(out.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    out.foreach { case (d, n, _, chi2) =>
      assert(n === expected(d.toInt), s"digit $d")
      assert(chi2 >= 0.0)
    }
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
  }

  test("duplicatePaymentsOn: catches a near-equal pair ACROSS the " +
      "digit-length band boundary, excludes over-tolerance, " +
      "over-window and cross-customer pairs") {
    def o(key: Long, cust: Long, price: Double, date: String) =
      (key, cust, price, Timestamp.valueOf(date + " 00:00:00"))
    val orders = Seq(
      // 999.99 vs 1000.01: within 0.01%, but their cents have
      // DIFFERENT digit counts (99999 vs 100001) — only the adjacent-
      // band probe can pair them
      o(1, 1L, 999.99, "1996-01-01"), o(2, 1L, 1000.01, "1996-01-03"),
      // same customer, 20% apart → excluded by tolerance
      o(3, 2L, 100.00, "1996-01-01"), o(4, 2L, 120.00, "1996-01-02"),
      // same customer, near amount, 9 days apart → excluded by window
      o(5, 3L, 500.00, "1996-01-01"), o(6, 3L, 501.00, "1996-01-10"),
      // near amount, near date, DIFFERENT customers → excluded
      o(7, 4L, 250.00, "1996-01-01"), o(8, 5L, 250.00, "1996-01-02"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = graft.operators.Relational.duplicatePaymentsOn(orders)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("cohortLtv: cumulative revenue is monotone per cohort, the " +
      "grand total equals the orders total, and offset 0 holds every " +
      "cohort's first month") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.cohortLtv(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (cohort, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 === 0L,
        s"cohort $cohort must start at offset 0 (its own first month)")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 >= a._5, s"cum not monotone")
        case _ =>
      }
      assert(math.abs(sorted.last._5 - rows.map(_._4).sum) < 1e-3)
    }
    val total = graft.sources.Tables.orders(spark, dir)
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(out.map(_._4).sum - total) < 1e-3,
      "LTV cells must conserve total revenue")
    assert(out.map(_._3).sum ===
      graft.sources.Tables.orders(spark, dir).count())
  }

  test("abcParts: ranks, cumulative shares and classes match the " +
      "brute-force descending prefix sum; classes partition the " +
      "ranking into contiguous blocks") {
    val dir = "/root/testdata/sf0.001"
    val revs = graft.sources.Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,6)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .sortBy { case (k, d) => (-d.doubleValue, k) }
    val total = revs.map(_._2.doubleValue).sum
    val out = graft.operators.Relational.abcParts(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getString(4)))
      .sortBy(_._2)
    assert(out.length === revs.length)
    var cum = BigDecimal(0)
    out.zip(revs).zipWithIndex.foreach {
      case (((key, rank, share, cls), (ekey, erev)), i) =>
        assert(key === ekey && rank === i + 1L)
        cum += BigDecimal(erev)
        val eshare = cum.toDouble / total
        assert(math.abs(share - eshare) < 1e-5, s"rank ${i + 1}")
        val ecls = if (eshare <= 0.80) "A" else if (eshare <= 0.95) "B"
          else "C"
        assert(cls === ecls, s"rank ${i + 1}: $cls vs $ecls")
    }
    // contiguous class blocks in rank order
    val classes = out.map(_._4).mkString
    assert("^A+B+C+$".r.findFirstIn(classes).isDefined, classes.take(50))
  }

  test("shipLatency: percentiles are ordered p50<=p90<=p99 and " +
      "non-negative for every priority") {
    val out = graft.operators.Relational
      .shipLatency(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 5) // the five order priorities
    out.foreach { r =>
      val (p50, p90, p99) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 >= 0 && p50 <= p90 && p90 <= p99, r.toString)
    }
  }

  test("vocabCoverage: coverage grows with k, caps at 1, and the " +
      "top-1 row matches the most frequent token's share") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.TextAnalysis.vocabCoverage(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 5L, 10L, 25L))
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 <= b._3 && a._4 <= b._4, "coverage must grow with k")
      case _ =>
    }
    out.foreach { case (k, nTerms, _, cov) =>
      assert(nTerms <= k && cov > 0 && cov <= 1.0)
    }
    val top = graft.operators.TextAnalysis.tokenHistogram(docs)
      .collect().head.getLong(1)
    assert(out.head._3 === top, "k=1 coverage is the top token's count")
  }

  test("ordersProfile: one row per column, counts match direct queries") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.sources.Tables.orders(spark, dir)
    val prof = graft.operators.Relational.ordersProfile(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size === 6)
    val n = o.count()
    prof.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_nulls") === 0L) // sf data has no nulls
    }
    assert(prof("o_orderkey").getAs[Long]("n_distinct") === n)
    assert(prof("o_orderstatus").getAs[Long]("n_distinct") ===
      o.select("o_orderstatus").distinct().count())
    // numeric columns carry min/max in the num slots, strings in str
    assert(!prof("o_totalprice").isNullAt(
      prof("o_totalprice").fieldIndex("min_num")))
    assert(prof("o_orderpriority").isNullAt(
      prof("o_orderpriority").fieldIndex("min_num")))
    assert(!prof("o_orderdate").isNullAt(
      prof("o_orderdate").fieldIndex("min_str")))
  }

  test("regrTrend: slope/intercept reproduce the closed-form OLS fit " +
      "computed independently from the monthly revenue series") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.regrTrend(spark, dir).collect()
    assert(out.nonEmpty)
    // independent recomputation for one nation via plain SQL + local math
    val nation = out.head.getString(0)
    val pts = graft.sources.Tables.orders(spark, dir)
      .join(graft.sources.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .collect()
      .map(r => ((r.getTimestamp(0).toLocalDateTime.getYear - 1992) * 12 +
        r.getTimestamp(0).toLocalDateTime.getMonthValue - 1).toDouble ->
        r.getDouble(1))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = out.find(_.getString(0) == nation).get
    assert(row.getLong(1) === pts.length.toLong)
    assert(math.abs(row.getDouble(2) - slope) < 1e-3)
    assert(math.abs(row.getDouble(3) - (sy - slope * sx) / n) < 1.0)
  }

  test("weightedMedian: the reported price splits each brand's quantity " +
      "mass — weight strictly below it < half total, at-or-below ≥ half") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("q"))
    val out = graft.operators.Relational.weightedMedian(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.take(5).foreach { r =>
      val (brand, tot, med) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val below = li.filter(col("p_brand") === brand &&
        col("l_extendedprice") < med)
        .agg(coalesce(sum(col("q")), lit(0L))).collect().head.getLong(0)
      val atOrBelow = li.filter(col("p_brand") === brand &&
        col("l_extendedprice") <= med)
        .agg(sum(col("q"))).collect().head.getLong(0)
      assert(2 * below < tot, s"$brand: mass below median must be < half")
      assert(2 * atOrBelow >= tot, s"$brand: mass through median ≥ half")
    }
  }

  test("basketRules: confidences are exact pair/item ratios and " +
      "bounded by 1; row set matches basketPairs") {
    val dir = "/root/testdata/sf0.001"
    val rules = graft.operators.Relational.basketRules(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(7), r.getDouble(8)))
    val pairs = graft.operators.Relational.basketPairs(spark, dir)
      .select("part_a", "part_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rules.map(x => (x._1, x._2)).toSet === pairs)
    rules.foreach { case (_, _, po, oa, ob, cab, cba) =>
      assert(cab <= 1.0 && cba <= 1.0)
      assert(math.abs(cab - po.toDouble / oa) < 1e-6)
      assert(math.abs(cba - po.toDouble / ob) < 1e-6)
    }
  }

  test("attributionLinear: total credit equals the number of touched " +
      "purchases (each splits exactly one unit)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.attributionLinear(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    // conservation: summed credit across types = distinct purchases
    // that had ≥1 prior-hour touch
    val e = graft.sources.Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val touched = p.join(
        e.filter(col("event_type") =!= "purchase")
          .select(col("user_id").as("tu"), col("ts").as("tts")),
        col("pu") === col("tu") && col("tts") < col("pts") &&
          col("tts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select("pid").distinct().count()
    val total = out.map(_._4).sum
    assert(math.abs(total - touched.toDouble) < 1e-3,
      s"credit $total vs touched purchases $touched")
  }

  test("segmentMigration: quintiles span 1..5, matrix counts only " +
      "customers active in both halves") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.segmentMigration(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, n) =>
      assert(a >= 1 && a <= 5 && b >= 1 && b <= 5 && n > 0)
    }
    // total = customers with orders in both halves, computed directly
    val o = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("tu"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (o.map(_._2).min, o.map(_._2).max)
    val mid = (lo + hi) / 2
    val both = o.groupBy(_._1).count { case (_, ts) =>
      ts.exists(_._2 < mid) && ts.exists(_._2 >= mid)
    }
    assert(out.map(_._3).sum === both.toLong)
  }

  test("repeatRate: ratios recompute from direct counts; every " +
      "rate in [0, 1], orders-per-buyer ≥ 1") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.repeatRate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.foreach { case (_, buyers, repeat, orders, rate, opb) =>
      assert(repeat <= buyers && orders >= buyers)
      assert(math.abs(rate - repeat.toDouble / buyers) < 1e-6)
      assert(math.abs(opb - orders.toDouble / buyers) < 1e-6)
      assert(opb >= 1.0)
    }
  }

  test("concurrency: timeline equals the naive global running sum, " +
      "ends at zero, and the peak flag marks exactly the maximum") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.concurrency(spark, dir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.nonEmpty)
    // naive check: cumulative net deltas in t order equal concurrency
    var run = 0L
    out.foreach { case (_, d, c, _) => run += d; assert(c === run) }
    assert(run === 0L, "every started session eventually ends")
    val mx = out.map(_._3).max
    assert(mx > 1L, "sessions genuinely overlap in the sf data")
    out.foreach { case (_, _, c, p) => assert(p === (c == mx)) }
  }

  test("pitJoin: every purchase inside its user's history matches " +
      "EXACTLY one version, and the matched interval brackets its ts") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Relational.pitJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    // exactly-one: fact ids are unique in the output
    assert(out.map(_._1).distinct.length === out.length,
      "half-open tiling must yield one version per fact")
    // bracket check against the dimension itself
    val dim = graft.operators.Relational.scd2History(
        graft.sources.Tables.events(spark, dir))
      .select(col("user_id"), col("version"),
        col("valid_from").cast("timestamp"),
        col("valid_to").cast("timestamp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), Option(r.getTimestamp(3))))).toMap
    out.take(200).foreach { case (_, user, ts, version) =>
      val (from, to) = dim((user, version))
      assert(!ts.before(from))
      to.foreach(t => assert(ts.before(t)))
    }
  }

  test("weightedMedian property: on seeded random (brand, price, qty) " +
      "data it equals the lower median of the weight-expanded multiset") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      (s"B${rnd.nextInt(4)}",
        (rnd.nextInt(50) + 1).toDouble,      // price
        (rnd.nextInt(5) + 1).toLong)          // weight
    }
    // the operator reads tables from a dir, so recompute its core
    // directly from a literal frame through the same expressions
    val df = rows.toDF("p_brand", "price", "w")
      .groupBy(col("p_brand"), col("price"))
      .agg(sum(col("w")).as("w"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand")).orderBy(col("price"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("p_brand"))
    val got = df
      .select(col("p_brand"), col("price"), col("w"),
        sum(col("w")).over(cum).as("cw"), sum(col("w")).over(tot).as("tw"))
      .groupBy(col("p_brand"))
      .agg(min(when(lit(2) * col("cw") >= col("tw"), col("price")))
        .as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // naive reference: expand each row into `weight` copies, take the
    // lower median of the sorted expansion
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val expanded = rs.flatMap(r => Seq.fill(r._3.toInt)(r._2)).sorted
      val lowerMedian = expanded((expanded.size - 1) / 2)
      assert(got(brand) === lowerMedian, s"brand $brand")
    }
  }

  test("rfm: scores span 1..5, extremes score 5, and score order " +
      "follows metric order") {
    val out = graft.operators.Relational.rfm(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, _, rs, fs, ms, rfm) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(rfm === s"$rs$fs$ms")
    }
    // the biggest spender lands in the top monetary quintile
    val top = out.maxBy(_._4)
    assert(top._7 === 5L)
    // monotonicity: more frequent never scores lower
    val sorted = out.sortBy(x => (x._3, x._1)).toSeq
    sorted.sliding(2).foreach {
      case Seq(a, b) => if (b._3 > a._3) assert(b._6 >= a._6)
      case _ => ()
    }
  }

  test("expectations: all six checks pass on the clean sf data, " +
      "metrics are the ratios they claim") {
    val out = graft.operators.Relational
      .expectations(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(out.size === 6)
    out.foreach { case (name, (_, passed)) =>
      assert(passed, s"check $name must pass on clean sf data")
    }
    assert(out("orderkey_unique")._1 === 1.0)
    assert(out("custkey_complete")._1 === 1.0)
    val n = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .count()
    assert(out("row_count_positive")._1 === n.toDouble)
  }

  test("woeBins: bins partition all lines, shares are exact ratios, " +
      "WOE sign tracks good/bad imbalance") {
    val out = graft.operators.Relational
      .woeBins(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val total = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_._2).sum === total)
    out.foreach { case (_, nAll, g, b, woe) =>
      assert(g + b === nAll)
      woe.foreach { w =>
        val totG = out.map(_._3).sum.toDouble
        val totB = out.map(_._4).sum.toDouble
        val expected = math.log((g / totG) / (b / totB))
        assert(math.abs(w - expected) < 1e-5)
      }
    }
  }

  test("orderGaps: gaps recomputed by hand for one customer; " +
      "single-order customers are absent") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    val out = graft.operators.Relational.orderGaps(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val multi = orders.filter(_._2.length >= 2)
    assert(out.keySet === multi.keySet)
    multi.take(5).foreach { case (ck, os) =>
      val sorted = os.sortBy(o => (o._2.getTime, o._3))
      val gaps = sorted.sliding(2).map { w =>
        (w(1)._2.getTime - w(0)._2.getTime) / 86400000L
      }.toSeq
      val (n, mean, mn, mx) = out(ck)
      assert(n === sorted.length.toLong)
      assert(mn === gaps.min && mx === gaps.max)
      assert(math.abs(mean - gaps.sum.toDouble / gaps.size) < 1e-3)
    }
  }

  test("modeReturnflag: one row per priority, the flag really is the " +
      "most frequent (ties to the smallest flag)") {
    val dir = "/root/testdata/sf0.001"
    val counts = graft.sources.Tables.orders(spark, dir)
      .join(graft.sources.Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .count().collect()
      .groupBy(_.getString(0))
    val out = graft.operators.Relational.modeReturnflag(spark, dir)
      .collect()
    assert(out.map(_.getString(0)).toSet === counts.keySet)
    out.foreach { r =>
      val best = counts(r.getString(0))
        .map(x => (x.getLong(2), x.getString(1))).sortBy(x => (-x._1, x._2))
        .head
      assert((r.getLong(2), r.getString(1)) === best)
    }
  }

  test("cohortRetention: month-zero rows are complete cohorts " +
      "(retention exactly 1), counts never exceed the cohort size, and " +
      "cohort sizes sum to the distinct customer count (sf0.001)") {
    val out = graft.operators.Relational.cohortRetention(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val m0 = out.filter(_.getLong(1) == 0L)
    m0.foreach { r =>
      assert(r.getLong(3) === r.getLong(2), s"month-0 not full: $r")
      assert(r.getDouble(4) === 1.0)
    }
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(1) >= 0L)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    val nCust = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_custkey").distinct().count()
    assert(m0.map(_.getLong(2)).sum === nCust,
      "cohort sizes must partition the customer universe")
  }

  test("ols2: coefficients match a local double-precision OLS solve " +
      "to 1e-4, r2 in [0,1], qty coefficient near the univariate " +
      "slope (sf0.001)") {
    val out = graft.operators.Relational
      .ols2(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val rows = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .select("l_quantity", "l_discount", "l_extendedprice")
      .collect()
      .map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
    val n = rows.length.toDouble
    assert(r.getLong(0) === rows.length)
    val (sx1, sx2, sy) = (rows.map(_._1).sum, rows.map(_._2).sum,
      rows.map(_._3).sum)
    val s11 = rows.map(t => t._1 * t._1).sum - sx1 * sx1 / n
    val s12 = rows.map(t => t._1 * t._2).sum - sx1 * sx2 / n
    val s22 = rows.map(t => t._2 * t._2).sum - sx2 * sx2 / n
    val s1y = rows.map(t => t._1 * t._3).sum - sx1 * sy / n
    val s2y = rows.map(t => t._2 * t._3).sum - sx2 * sy / n
    val syy = rows.map(t => t._3 * t._3).sum - sy * sy / n
    val det = s11 * s22 - s12 * s12
    val b1 = (s1y * s22 - s2y * s12) / det
    val b2 = (s2y * s11 - s1y * s12) / det
    assert(math.abs(r.getDouble(1) - b1) < 1e-4 * math.max(1.0, math.abs(b1)))
    assert(math.abs(r.getDouble(2) - b2) < 1e-4 * math.max(1.0, math.abs(b2)))
    val r2 = (b1 * s1y + b2 * s2y) / syy
    assert(math.abs(r.getDouble(4) - r2) < 1e-4)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    // qty and discount are nearly orthogonal in this data, so the
    // two-feature qty coefficient must sit near the univariate slope
    val uni = s1y / s11
    assert(math.abs(r.getDouble(1) - uni) <
      0.1 * math.max(1.0, math.abs(uni)),
      s"b_qty ${r.getDouble(1)} far from univariate slope $uni")
  }

  test("spearman: matches a local midrank recomputation and is " +
      "bounded in [-1,1] (sf0.001)") {
    val out = graft.operators.Relational
      .spearman(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val rows = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .select("l_quantity", "l_extendedprice").collect()
      .map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r.getLong(0) === rows.length)
    def midranks(vs: Array[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v); val at = sorted.count(_ == v)
        v -> (below + (at + 1) / 2.0)
      }.toMap
    }
    val mx = midranks(rows.map(_._1)); val my = midranks(rows.map(_._2))
    val xs = rows.map(t => mx(t._1)); val ys = rows.map(t => my(t._2))
    val n = rows.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val num = xs.zip(ys).map(t => t._1 * t._2).sum - sx * sy / n
    val den = math.sqrt((xs.map(v => v * v).sum - sx * sx / n) *
      (ys.map(v => v * v).sum - sy * sy / n))
    val rho = num / den
    assert(math.abs(r.getDouble(1) - rho) < 1e-5,
      s"rho ${r.getDouble(1)} vs local $rho")
    assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
  }

  test("atkinson: matches a local recomputation, AM-GM holds, index " +
      "in [0,1) (sf0.001)") {
    val out = graft.operators.Relational
      .atkinson(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val xs = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum("o_totalprice").as("x"))
      .collect().map(_.getDouble(1)).filter(_ > 0)
    assert(r.getLong(0) === xs.length)
    val mean = xs.sum / xs.length
    val geo = math.exp(xs.map(math.log).sum / xs.length)
    assert(math.abs(r.getDouble(1) - mean) < 1e-3 * mean)
    assert(math.abs(r.getDouble(2) - geo) < 1e-3 * geo)
    assert(r.getDouble(2) <= r.getDouble(1), "AM-GM: geo <= mean")
    val a = 1.0 - geo / mean
    assert(math.abs(r.getDouble(3) - a) < 1e-5)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
  }

  test("bm25Top: scores match a local BM25 recomputation over the " +
      "fixed query (sf0.001)") {
    import graft.operators.TextAnalysis._
    val out = graft.operators.TextAnalysis
      .bm25Top(graft.sources.Tables
        .documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.length === bm25TopK)
    val texts = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    val n = texts.size
    val avgdl = texts.values.map(_.length).sum.toDouble / n
    val dfm = Bm25Terms.map(t =>
      t -> texts.values.count(_.contains(t))).toMap
    def score(toks: Seq[String]): Double = Bm25Terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      val df = dfm(t).toDouble
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (Bm25K1 + 1.0)) /
        (tf + Bm25K1 * (1.0 - Bm25B + Bm25B * toks.length / avgdl))
    }.sum
    val expect = texts.map { case (id, toks) =>
      (id, toks.length.toLong, score(toks))
    }.toSeq.sortBy(t => (-t._3, t._1)).take(bm25TopK)
    out.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      .zip(expect).foreach { case (r, (id, dl, s)) =>
        assert(r.getLong(0) === id, s"doc order ($id)")
        assert(r.getLong(1) === dl, s"$id dl")
        assert(math.abs(r.getDouble(2) - s) < 1e-5, s"$id score")
      }
  }

  test("forecastNaive: MAE/bias/MAPE match a local month-shifted " +
      "recomputation (sf0.001)") {
    val out = graft.operators.Relational
      .forecastNaive(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val monthly = graft.sources.Tables
      .orders(spark, "/root/testdata/sf0.001")
      .selectExpr("year(o_orderdate) * 12 + month(o_orderdate) AS m",
        "CAST(o_totalprice AS DECIMAL(18,6)) AS x")
      .groupBy("m").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect().map(x => x.getInt(0) -> x.getDecimal(1)).toMap
    val pairs = monthly.flatMap { case (m, rev) =>
      monthly.get(m - 12).map(pred => (rev, pred))
    }.toSeq
    assert(r.getLong(0) === pairs.length.toLong)
    val n = pairs.length.toDouble
    val errs = pairs.map { case (a, p) => a.subtract(p).doubleValue() }
    val mae = errs.map(math.abs).sum / n
    val bias = errs.sum / n
    val mape = pairs.map { case (a, p) =>
      math.abs(a.subtract(p).doubleValue()) / a.doubleValue() }.sum / n
    assert(math.abs(r.getDouble(1) - mae) < 1e-3 * math.max(1.0, mae))
    assert(math.abs(r.getDouble(2) - bias) <
      1e-3 * math.max(1.0, math.abs(bias)))
    assert(math.abs(r.getDouble(3) - mape) < 1e-5)
  }

  test("miLangSource: MI/H/NMI match a local count recomputation, " +
      "0 <= MI <= min(H) (sf0.001)") {
    val out = graft.operators.TextAnalysis
      .miLangSource(graft.sources.Tables
        .documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.length === 1)
    val r = out.head
    val rows = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = rows.length.toDouble
    assert(r.getLong(0) === rows.length.toLong)
    val joint = rows.groupBy(identity).view.mapValues(_.size).toMap
    val ml = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val ms = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val mi = joint.map { case ((l, s), c) =>
      (c / n) * math.log((c / n) / ((ml(l) / n) * (ms(s) / n)))
    }.sum
    def h(m: Map[String, Int]) =
      m.values.map(c => -(c / n) * math.log(c / n)).sum
    assert(math.abs(r.getDouble(1) - mi) < 1e-5, "mi")
    assert(math.abs(r.getDouble(2) - h(ml)) < 1e-5, "h_lang")
    assert(math.abs(r.getDouble(3) - h(ms)) < 1e-5, "h_source")
    assert(r.getDouble(1) >= -1e-9 &&
      r.getDouble(1) <= math.min(h(ml), h(ms)) + 1e-9)
    assert(math.abs(r.getDouble(4) -
      mi / math.sqrt(h(ml) * h(ms))) < 1e-4, "nmi")
  }

  test("rake: top phrases match a local degree/frequency " +
      "recomputation (sf0.001)") {
    val out = graft.operators.TextAnalysis
      .rake(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(out.length === graft.operators.TextAnalysis.rakeTopK)
    val stop = graft.operators.TextAnalysis.stopwords.toSet
    val texts = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0))
    // phrases: maximal stopword-free runs
    val phrases = texts.flatMap { t =>
      val toks = t.trim.split("\\s+").toSeq
      val runs = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      toks.foreach { tk =>
        if (stop(tk)) { if (cur.nonEmpty) { runs += cur.toSeq }; cur.clear() }
        else cur += tk
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size)
    val deg = phrases.flatMap(p => p.map(_ -> p.length))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val score = (p: Seq[String]) =>
      p.map(w => deg(w).toDouble / freq(w)).sum
    val grouped = phrases.groupBy(_.mkString(" ")).map { case (txt, ps) =>
      (txt, ps.head.length, ps.size, score(ps.head))
    }.toSeq
    val top = grouped
      .sortBy { case (txt, _, _, s) => (-s, txt) }
      .take(graft.operators.TextAnalysis.rakeTopK)
    val sorted = out.sortBy(r => (-r.getDouble(3), r.getString(0)))
    sorted.zip(top).foreach { case (r, (txt, nw, no, s)) =>
      assert(r.getString(0) === txt, "phrase")
      assert(r.getLong(1) === nw.toLong, s"$txt n_words")
      assert(r.getLong(2) === no.toLong, s"$txt n_occur")
      assert(math.abs(r.getDouble(3) - s) < 1e-5, s"$txt score")
    }
  }

  test("dpRelease: noise matches the inverse-CDF Laplace from the " +
      "salted hash, count error bounded by the epsilon tail (sf0.001)") {
    val out = graft.operators.Relational
      .dpRelease(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val trueCounts = graft.sources.Tables
      .customer(spark, "/root/testdata/sf0.001")
      .join(graft.sources.Tables.nation(spark, "/root/testdata/sf0.001"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .groupBy("n_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def lap(salt: String, name: String, b: Double): Double = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + name).getBytes("UTF-8"))
      val hex = md5.map(x => f"${x & 0xff}%02x").mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      val lnr = BigDecimal(math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      -b * math.signum(u - 0.5) * lnr
    }
    out.foreach { r =>
      val name = r.getString(0)
      assert(r.getDouble(1) === 1.0)
      val expect = trueCounts(name) + lap("graft-dp:count:", name, 1.0)
      assert(math.abs(r.getDouble(2) - expect) < 1e-5,
        s"$name released count")
      // Laplace(1) noise: |noise| < 25 with overwhelming margin
      assert(math.abs(r.getDouble(2) - trueCounts(name)) < 25.0)
    }
  }

  test("weibullFit: shape/scale/r2 match a local probability-plot " +
      "regression (sf0.001)") {
    val out = graft.operators.Relational
      .weibullFit(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val orders = graft.sources.Tables
      .orders(spark, "/root/testdata/sf0.001")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS DATE) AS d").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDate(2).toLocalDate))
    val gaps = orders.groupBy(_._1).values.flatMap { os =>
      val s = os.sortBy(o => (o._3.toEpochDay, o._2))
      s.zip(s.drop(1)).map { case (a, b) =>
        (b._2, b._3.toEpochDay - a._3.toEpochDay)
      }
    }.filter(_._2 > 0).toSeq
    val n = gaps.length
    assert(r.getLong(0) === n.toLong)
    val ranked = gaps.sortBy(g => (g._2, g._1)).zipWithIndex
    val xy = ranked.map { case ((_, gap), i) =>
      val f = (i + 1 - 0.3) / (n + 0.4)
      (math.log(gap.toDouble), math.log(-math.log(1.0 - f)))
    }
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val vx = xy.map(t => t._1 * t._1).sum - sx * sx / n
    val vy = xy.map(t => t._2 * t._2).sum - sy * sy / n
    val cxy = xy.map(t => t._1 * t._2).sum - sx * sy / n
    val k = cxy / vx
    val scale = math.exp(-((sy - k * sx) / n) / k)
    assert(math.abs(r.getDouble(1) - k) < 1e-4 * math.max(1.0, k), "shape")
    assert(math.abs(r.getDouble(2) - scale) <
      1e-3 * math.max(1.0, scale), "scale")
    assert(math.abs(r.getDouble(3) - cxy * cxy / (vx * vy)) < 1e-4, "r2")
    assert(r.getDouble(3) > 0.5, "a Weibull plot on waiting times " +
      "should fit reasonably")
  }

  test("seasonalDecompose: trend kills a 12-month cycle, seasonal " +
      "sums to ~0, parts reassemble the series (sf0.001)") {
    val out = graft.operators.Relational
      .seasonalDecompose(spark, "/root/testdata/sf0.001").collect()
    assert(out.length >= 24, "needs multiple years of months")
    // edge months: first 6 and last 6 have NULL trend and residual
    assert(out.take(6).forall(_.isNullAt(2)))
    assert(out.takeRight(6).forall(_.isNullAt(2)))
    val interior = out.filter(r => !r.isNullAt(2))
    assert(interior.nonEmpty)
    // local recomputation of the centered MA
    val rev = out.map(r => r.getDouble(1))
    interior.foreach { r =>
      val i = out.indexWhere(_.getTimestamp(0) == r.getTimestamp(0))
      val t = (rev(i - 6) * 0.5 + (i - 5 to i + 5).map(rev).sum +
        rev(i + 6) * 0.5) / 12.0
      assert(math.abs(r.getDouble(2) - t) < 1e-2 * math.max(1.0, t),
        s"month $i trend")
      // decomposition identity on interior months (revenue is output
      // at 2dp, parts at 6dp -> tolerance dominated by the 2dp round)
      val reassembled = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(reassembled - r.getDouble(1)) < 2e-2,
        s"month $i identity")
    }
    // seasonal indices: 12 distinct values summing to ~0
    val seas = out.map(_.getDouble(3)).distinct
    assert(seas.length <= 12)
    assert(math.abs(seas.sum) < 1e-3, s"seasonal sum ${seas.sum}")
  }

  test("naiveBayes: predictions match a local smoothed-count argmax, " +
      "accuracy consistent with the combo distribution (sf0.001)") {
    val out = graft.operators.Relational
      .naiveBayes(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val rows = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(year(l_shipdate) AS BIGINT) AS y",
        "CAST(floor((l_quantity - 1.0) / 10.0) AS BIGINT) AS b",
        "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nTotal = rows.length.toDouble
    val nC = rows.groupBy(_._3).view.mapValues(_.size).toMap
    val nYc = rows.groupBy(r => (r._3, r._1)).view.mapValues(_.size).toMap
    val nBc = rows.groupBy(r => (r._3, r._2)).view.mapValues(_.size).toMap
    val vYear = rows.map(_._1).distinct.length
    val vBand = rows.map(_._2).distinct.length
    val combos = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3)).toMap
    assert(out.length === combos.size)
    out.foreach { r =>
      val (sm, ls) = (r.getLong(0), r.getLong(1))
      val flags = combos((sm, ls))
      assert(r.getLong(2) === flags.length.toLong)
      val scores = nC.keys.toSeq.sorted.map { c =>
        val s = math.log(nC(c) / nTotal) +
          math.log((nYc.getOrElse((c, sm), 0) + 1).toDouble /
            (nC(c) + vYear)) +
          math.log((nBc.getOrElse((c, ls), 0) + 1).toDouble /
            (nC(c) + vBand))
        c -> s
      }
      // argmax with ties to smallest flag
      val maxS = scores.map(_._2).max
      val pred = scores.filter(t => math.abs(t._2 - maxS) < 1e-9)
        .map(_._1).min
      assert(r.getString(3) === pred, s"$sm/$ls pred")
      val nCorrect = flags.count(_ == pred).toLong
      assert(r.getLong(5) === nCorrect, s"$sm/$ls n_correct")
      assert(math.abs(r.getDouble(6) - nCorrect / flags.length.toDouble)
        < 1e-6)
    }
  }

  test("priceElasticity: slope/r2 match a local log-log OLS per brand, " +
      "r2 in [0,1] (sf0.001)") {
    val out = graft.operators.Relational
      .priceElasticity(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val pt = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
    val rows = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select("p_brand", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
      .filter { case (_, q, p, d) => q != 0.0 && p / q * (1.0 - d) > 0.0 }
      .groupBy(_._1)
    out.foreach { row =>
      val brand = row.getString(0)
      val xs = rows(brand).map { case (_, q, p, d) =>
        (math.log(p / q * (1.0 - d)), math.log(q))
      }
      assert(row.getLong(1) === xs.length.toLong)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map(t => t._1 * t._2).sum
      val sxx = xs.map(t => t._1 * t._1).sum
      val syy = xs.map(t => t._2 * t._2).sum
      val beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val r2 = math.pow(sxy - sx * sy / n, 2) /
        ((sxx - sx * sx / n) * (syy - sy * sy / n))
      if (!row.isNullAt(2))
        assert(math.abs(row.getDouble(2) - beta) <
          1e-4 * math.max(1.0, math.abs(beta)), s"$brand beta")
      if (!row.isNullAt(3)) {
        assert(math.abs(row.getDouble(3) - r2) < 1e-4, s"$brand r2")
        assert(row.getDouble(3) >= -1e-9 && row.getDouble(3) <= 1.0 + 1e-9)
      }
    }
  }

  test("mannKendall: S/Var/z/sen match a local pairwise recomputation " +
      "(sf0.001)") {
    val out = graft.operators.Relational
      .mannKendall(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val monthly = graft.sources.Tables
      .orders(spark, "/root/testdata/sf0.001")
      .selectExpr("year(o_orderdate) * 12 + month(o_orderdate) AS m",
        "CAST(o_totalprice AS DECIMAL(18,6)) AS x")
      .groupBy("m").agg(org.apache.spark.sql.functions.sum("x").as("x"))
      .collect()
      .map(row => (row.getInt(0).toLong, row.getDecimal(1)))
      .sortBy(_._1)
    val n = monthly.length
    assert(r.getLong(0) === n.toLong)
    val pairs = for {
      i <- monthly.indices; j <- (i + 1) until n
    } yield (monthly(i), monthly(j))
    assert(r.getLong(1) === pairs.length.toLong)
    val s = pairs.map { case ((_, xi), (_, xj)) =>
      xj.compareTo(xi).sign.toLong
    }.sum
    assert(r.getLong(2) === s)
    val tieTerm = monthly.groupBy(_._2).values
      .map(g => g.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS =
      (n.toLong * (n - 1) * (2L * n + 5) - tieTerm).toDouble / 18.0
    assert(math.abs(r.getDouble(3) - varS) < 1e-6 * varS)
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    assert(math.abs(r.getDouble(4) - z) < 1e-5 * math.max(1.0, math.abs(z)))
    val slopes = pairs.map { case ((mi, xi), (mj, xj)) =>
      xj.subtract(xi).doubleValue() / (mj - mi).toDouble
    }.sorted
    val m = slopes.length
    val sen = (slopes((m + 1) / 2 - 1) + slopes((m + 2) / 2 - 1)) / 2.0
    assert(math.abs(r.getDouble(5) - sen) <
      1e-5 * math.max(1.0, math.abs(sen)))
  }

  test("kruskalWallis: H matches a local midrank recomputation, tie " +
      "correction in (0,1], h_adj = h/c (sf0.001)") {
    val out = graft.operators.Relational
      .kruskalWallis(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val rows = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val n = rows.length
    assert(r.getLong(0) === n)
    val sorted = rows.map(_._2).sorted
    val mr = rows.map(_._2).distinct.map { v =>
      val below = sorted.count(_ < v); val at = sorted.count(_ == v)
      v -> (below + (at + 1) / 2.0)
    }.toMap
    val h = 12.0 / (n.toDouble * (n + 1)) *
      rows.groupBy(_._1).values.map { g =>
        val rbar = g.map(t => mr(t._2)).sum / g.length
        g.length * (rbar - (n + 1) / 2.0) * (rbar - (n + 1) / 2.0)
      }.sum
    assert(math.abs(r.getDouble(2) - h) < 1e-4 * math.max(1.0, h),
      s"H ${r.getDouble(2)} vs local $h")
    val tieSum = rows.map(_._2).groupBy(identity).values
      .map(g => g.length.toDouble * g.length * g.length - g.length).sum
    val c = 1.0 - tieSum / (n.toDouble * n * n - n)
    assert(math.abs(r.getDouble(3) - c) < 1e-6)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    assert(math.abs(r.getDouble(4) - h / c) < 1e-4 * math.max(1.0, h / c))
  }

  test("chi2: matches a local recomputation from the contingency " +
      "cells, df consistent, cramers_v in [0,1] (sf0.001)") {
    val out = graft.operators.Relational
      .chi2(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val cells = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    val statuses = cells.keys.map(_._1).toSeq.distinct
    val priorities = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum.toDouble
    assert(r.getLong(0) === cells.values.sum)
    assert(r.getLong(1) === statuses.size && r.getLong(2) === priorities.size)
    assert(r.getLong(3) === (statuses.size - 1) * (priorities.size - 1))
    val chi2 = (for (s <- statuses; p <- priorities) yield {
      val o = cells.getOrElse((s, p), 0L).toDouble
      val e = cells.filter(_._1._1 == s).values.sum.toDouble *
        cells.filter(_._1._2 == p).values.sum.toDouble / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(r.getDouble(4) - chi2) < 1e-6 * math.max(1.0, chi2))
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    val v = math.sqrt(chi2 / (n *
      math.min(statuses.size - 1, priorities.size - 1)))
    assert(math.abs(r.getDouble(5) - v) < 1e-5)
  }

  test("anova: SSB + SSW equals total SS, F matches the local " +
      "closed form, eta_sq in [0,1] (sf0.001)") {
    val out = graft.operators.Relational
      .anova(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 1)
    val r = out.head
    val ys = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val n = ys.length
    assert(r.getLong(0) === n)
    val k = ys.map(_._1).distinct.length
    assert(r.getLong(1) === k)
    val mean = ys.map(_._2).sum / n
    val sst = ys.map(t => (t._2 - mean) * (t._2 - mean)).sum
    val ssb = r.getDouble(2); val ssw = r.getDouble(3)
    assert(math.abs(ssb + ssw - sst) < 1e-6 * sst,
      s"SSB+SSW=$ssb+$ssw must equal SST=$sst")
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getDouble(4) - f) < 1e-4 * math.max(1.0, f))
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("dormancy: bands partition the customer universe, min/max days " +
      "respect the stated edges, shares sum to 1 (sf0.001)") {
    val out = graft.operators.Relational
      .dormancy(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val nCust = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_custkey").distinct().count()
    assert(out.map(_.getLong(1)).sum === nCust)
    val edges = Map(0L -> (0L, 30L), 31L -> (31L, 60L), 61L -> (61L, 90L),
      91L -> (91L, 180L), 181L -> (181L, Long.MaxValue))
    out.foreach { r =>
      val (lo, hi) = edges(r.getLong(0))
      assert(r.getLong(2) >= lo && r.getLong(3) <= hi, s"band edges: $r")
      assert(r.getLong(2) <= r.getLong(3))
    }
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }
}
