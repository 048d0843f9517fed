package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Semantics tests for incremental (batch-vs-index) dedup on a
  * hand-built corpus: exact fingerprint hits, LSH-verified near-dups,
  * and fresh documents each classify correctly, with `dup_of` pointing
  * at the earliest matching document. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // 12 tokens -> 10 shingles; `near` changes only the last token, so the
  // two shingle sets share 9 of 11 distinct shingles (Jaccard 0.818,
  // well over the 0.5 verify threshold and band-collision-prone by
  // construction — fixed strings, fixed md5, deterministic forever).
  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val near =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val other =
    "completely different subject matter about weather patterns and rainfall"
  private val fresh =
    "unique fresh content nothing like any earlier document in the corpus"

  test("editPairs: candidate pairs carry the exact Levenshtein " +
      "distance and normalized similarity; identical docs score 1") {
    val d = docs(0L -> base, 1L -> near, 2L -> base, 3L -> other)
    val out = Dedup.editPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // base vs near differ only in the final token (mu -> nu): one
    // substitution = distance 1
    assert(out.keySet.contains((0L, 1L)) && out.keySet.contains((0L, 2L)))
    val (la, lb, d01, s01) = out((0L, 1L))
    assert(la === base.length.toLong && lb === near.length.toLong)
    assert(d01 === 1L)
    val expSim = BigDecimal(1.0 - 1.0 / base.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s01 === expSim)
    // identical copies: distance 0, similarity exactly 1
    assert(out((0L, 2L)) === ((base.length.toLong, base.length.toLong,
      0L, 1.0)))
    // the unrelated doc never collides into a candidate pair
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("thresholdSweep: pair counts are monotone non-increasing in " +
      "the threshold and the 0.5 row equals minhashPairs") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.thresholdSweep(d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq === Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    assert(out.map(_._2).distinct.length === 1, "one shared candidate set")
    out.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a); case _ => ()
    }
    val n05 = Dedup.minhashPairs(d).count()
    assert(out.head._3 === n05)
    out.foreach { case (_, nc, np, nd, prec) =>
      assert(nd <= np)
      val expect = BigDecimal(np.toDouble / nc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(prec === expect)
    }
  }

  test("clusterSizes: histogram counts every document exactly once " +
      "and matches the clusters output") {
    val d = docs(0L -> base, 1L -> base, 2L -> near, 3L -> other,
      4L -> fresh)
    val out = Dedup.clusterSizes(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 0,1,2 cluster together (exact+near); 3 and 4 are singletons
    assert(out.toSet === Set((1L, 2L, 2L), (3L, 1L, 3L)))
    assert(out.map(_._3).sum === 5L)
    // consistency with the components operator on the real corpus
    val real = graft.sources.Tables.documents(spark,
      "/root/testdata/sf0.001")
    val hist = Dedup.clusterSizes(real).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cl = Dedup.clustersBigStar(Dedup.minhashPairs(real)).collect()
      .map(r => r.getLong(1))
    val expect = cl.groupBy(identity).values.map(_.length)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    hist.filter(_._1 > 1).foreach { case (sz, n) =>
      assert(expect(sz.toInt) === n, s"size $sz")
    }
    assert(hist.map { case (s, n) => s * n }.sum === real.count())
  }

  test("sourceMatrix: pair counts roll up to unordered source cells " +
      "and match the verified pair list exactly") {
    val d = Seq(
      (0L, base, "en", "srcA", base.length.toLong),
      (1L, base, "en", "srcB", base.length.toLong),
      (2L, near, "en", "srcA", near.length.toLong),
      (3L, other, "en", "srcC", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.sourceMatrix(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pairs = Dedup.minhashPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = Map(0L -> "srcA", 1L -> "srcB", 2L -> "srcA",
      3L -> "srcC")
    val expect = pairs
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) (sa, sb) else (sb, sa))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out === expect)
    assert(out.values.sum === pairs.length.toLong)
    // srcC's unrelated doc never pairs
    assert(!out.keySet.exists { case (a, b) =>
      a == "srcC" || b == "srcC" })
  }

  test("incremental: exact, near, and new batch docs classify correctly") {
    val d = docs(
      0L -> base, 1L -> other,
      10L -> base,  // exact dup of 0
      11L -> base,  // exact dup of 0 (and of 10 — min wins)
      12L -> near,  // near dup of 0
      13L -> fresh) // genuinely new
    val out = Dedup.incremental(d, batchMinId = 10L).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L, 13L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(byId(10L) === ("exact_dup", Some(0L)))
    assert(byId(11L) === ("exact_dup", Some(0L)))
    assert(byId(12L) === ("near_dup", Some(0L)))
    assert(byId(13L) === ("new", None))
  }

  test("incremental: existing-corpus docs never appear in the output") {
    val d = docs(0L -> base, 1L -> base, 10L -> fresh)
    val out = Dedup.incremental(d, batchMinId = 10L).collect()
    // doc 1 duplicates doc 0 but both predate the batch — not reported
    assert(out.map(_.getLong(0)).toSeq === Seq(10L))
    assert(out(0).getString(1) === "new")
  }

  // 8-token blocks (Dedup.spanTokens = 8) so span boundaries are exact
  private val blockA = "a1 a2 a3 a4 a5 a6 a7 a8"
  private val blockB = "b1 b2 b3 b4 b5 b6 b7 b8"
  private val blockC = "c1 c2 c3 c4 c5 c6 c7 c8"

  test("spanDedup: cross-doc and within-doc repeated spans drop; " +
      "first occurrence survives; clean text reassembles in order") {
    val d = docs(
      0L -> s"$blockA $blockB",            // first occurrences of A and B
      1L -> s"$blockC $blockA",            // A already seen in doc 0
      2L -> s"$blockB $blockB $blockC")    // within-doc repeat + C from doc 1
    val out = Dedup.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(0L) === ((2L, 0L, s"$blockA $blockB")))
    assert(out(1L) === ((2L, 1L, blockC)))
    assert(out(2L) === ((3L, 3L, ""))) // B (doc 0), B again, C (doc 1)
  }

  test("spanDedup: a doc with no duplicated spans is untouched " +
      "(trailing short span included)") {
    val d = docs(3L -> s"$blockA x1 x2 x3") // 11 tokens -> spans of 8 + 3
    val out = Dedup.spanDedup(d).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 2L)            // n_spans
    assert(out(0).getLong(2) === 0L)            // n_dup_spans
    assert(out(0).getString(3) === s"$blockA x1 x2 x3")
  }

  test("containmentPairs: a short doc quoted inside a long one reports " +
      "with containment 1.0 while Jaccard stays far below threshold") {
    // long doc: 60 distinct tokens -> 58 shingles; short doc: its first
    // 12 tokens -> 10 shingles, all contained. Jaccard = 10/58 ≈ 0.17
    // (below the 0.3 pairs threshold), containment_a = 1.0.
    val longToks = (1 to 60).map(i => s"w$i").mkString(" ")
    val shortToks = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = docs(0L -> shortToks, 1L -> longToks, 2L -> other)
    val out = Dedup.containmentPairs(d).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)))
    assert(r.getDouble(2) === 1.0, "containment_a: short fully inside long")
    assert(r.getDouble(3) < 0.2, "containment_b small")
    assert(r.getDouble(4) < 0.3, "Jaccard misses this pair by design")
    // and the symmetric operator indeed does not report it
    assert(Dedup.jaccardPairs(d).collect().isEmpty)
  }

  test("spanDedup: null text and empty token arrays emit no phantom spans") {
    // sequence(0, -1) is DESCENDING in Spark ([0, -1] — two phantom
    // spans); the guard must mirror the oracle's empty range instead.
    val d = Seq((0L, null.asInstanceOf[String], "en", "src0", 0L),
        (1L, s"$blockA $blockB", "en", "src0", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.spanDedup(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L), "null-text doc contributes zero spans")
    // the guarded index expression itself: empty array -> empty spans
    val idx = spark.sql(
      "SELECT transform(filter(sequence(0, greatest((size(x) + 7) div 8 - 1, 0)), " +
        "i -> i * 8 < size(x)), i -> i) AS s " +
        "FROM (SELECT cast(array() AS array<string>) AS x)").head()
    assert(idx.getSeq[Int](0).isEmpty)
  }

  test("substringDedup: an UNALIGNED repeated passage is caught " +
      "(where aligned spans would miss it)") {
    // doc 1 repeats doc 0's 8-token block shifted by 3 tokens — span
    // boundaries don't line up, but every-offset windows match exactly
    val d = docs(
      0L -> s"$blockA x1 x2 x3",
      1L -> s"y1 y2 y3 $blockA")
    val sub = Dedup.substringDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(sub(0L) === ((11L, 0L, s"$blockA x1 x2 x3")))
    assert(sub(1L) === ((11L, 8L, "y1 y2 y3")), "shifted block removed")
    // the aligned-span form misses it: doc 1's spans are (y1..a5)(a6 a7 a8)
    val span = Dedup.spanDedup(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(span(1L) === 0L, "aligned spans cannot see the shifted copy")
  }

  test("substringDedup: overlapping dup windows cover the union of " +
      "positions; short docs pass through") {
    val d = docs(
      0L -> s"$blockA a9",          // 9 tokens: windows at offsets 0,1
      1L -> s"$blockA a9 tail end", // repeats BOTH windows, shifted range
      2L -> "tiny doc")             // < w tokens: no windows
    val out = Dedup.substringDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(0L)._2 === 0L)
    // doc 1: windows 0 (a1..a8) and 1 (a2..a9) both dup -> union covers
    // positions 0..8 (9 tokens), leaving "tail end"
    assert(out(1L) === ((11L, 9L, "tail end")))
    assert(out(2L) === ((2L, 0L, "tiny doc")))
  }

  test("simhashPairs: 16-bit banding is COMPLETE at hamming <= 3 " +
      "(equals the all-pairs scan on sf0.001)") {
    import org.apache.spark.sql.functions._
    // independent evidence beyond the oracle (which mirrors the same
    // banding): brute-force every pair's hamming distance and assert
    // the pigeonhole join found exactly the qualifying set
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = Dedup.simhash(d)
    val a = sigs.select(col("doc_id").as("doc_a"),
      col("sim_lo").as("la"), col("sim_hi").as("ha"))
    val b = sigs.select(col("doc_id").as("doc_b"),
      col("sim_lo").as("lb"), col("sim_hi").as("hb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(expr("la ^ lb")) + bit_count(expr("ha ^ hb")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simhashPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must contain close pairs")
  }

  test("dfProfile: histogram mass equals the distinct shingle-hash " +
      "count, cumulative share ends at 1, cap flag at the threshold") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Dedup.dfProfile(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    val totalShingles = graft.operators.Dedup.shingleHashes(d)
      .select("h").distinct().count()
    assert(out.map(_._2).sum === totalShingles)
    assert(out.last._3 === totalShingles)
    assert(math.abs(out.last._4 - 1.0) < 1e-9)
    out.foreach { case (df, _, _, _, cap) =>
      assert(cap === (df <= graft.operators.Dedup.jaccardMaxDf))
    }
    out.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => ()
    }
  }

  test("keepBest: the cluster keeper is the longest member with ties " +
      "to the smallest doc_id, and every cluster has exactly one keeper") {
    // base/near form one near-dup cluster; `near` is the same length as
    // base, so the tie rule (smallest doc_id) decides; a longer third
    // member must take over
    val longer = base + " extra trailing tokens here"
    val out = Dedup.keepBest(docs(
      (1L, base), (2L, near), (7L, longer + " x"),
      (8L, longer + " y"))).collect()
    // doc 7/8: same length -> 7 keeps; cluster of 1/2/7/8? base, near
    // and the two longer docs all share the 9-shingle prefix - they
    // cluster together; keeper = the longest (7 or 8, same n_chars,
    // tie -> 7)
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (_, rows) =>
      val keepers = rows.filter(_.getBoolean(3))
      assert(keepers.length === 1, s"one keeper per cluster: $rows")
      val k = keepers.head
      // the keeper is a max-n_chars member (checked via the fixture:
      // doc ids 7/8 are longest; 7 wins the tie)
      assert(rows.forall(_.getLong(2) === k.getLong(0)))
    }
    val keeperIds = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(keeperIds.contains(7L) && !keeperIds.contains(8L),
      s"length-then-id rule must pick 7, got $keeperIds")
  }

  test("winnowFingerprints: density bounded by the window guarantee, " +
      "no fingerprints for docs without a complete window") {
    val d = docs(
      (1L, "a b c d e f g h i j k l m n o p"), // 14 grams, 11 windows
      (2L, "a b c d"),                         // 2 grams < w -> none
      (3L, "q r"))                             // no grams at all
    val out = Dedup.winnowFingerprints(d).collect()
    assert(out.forall(_.getLong(0) == 1L),
      "short docs must produce no fingerprints")
    val sel = out.map(r => (r.getLong(1), r.getLong(2)))
    val nWindows = 14 - Dedup.winnowW + 1
    // one selection per window, dedup across overlapping windows:
    // between ceil(windows/w) and windows distinct (h, pos) picks
    assert(sel.length >= (nWindows + Dedup.winnowW - 1) / Dedup.winnowW)
    assert(sel.length <= nWindows)
    // every selected position is a valid gram index
    assert(sel.forall(t => t._2 >= 0 && t._2 < 14))
  }

  test("winnowingPairs: the k+w-1 guarantee surfaces a long shared " +
      "substring; overlap and containment identities hold") {
    // doc 2 embeds doc 1's 16-token run after a distinct prefix: every
    // window over the shared run picks the same fingerprints
    val shared = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12 m13 m14 m15 m16"
    val d = docs(
      (1L, shared),
      (2L, "z1 z2 z3 z4 " + shared),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"))
    val out = Dedup.winnowingPairs(d).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      s"shared 16-token run must produce the (1,2) pair, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not pair")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= Dedup.winnowMinShared)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
