package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, dir)

  test("chunk: chunks reassemble to the tokenized document") {
    val rebuilt = Packing.chunk(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.functions.Portable.tokens(col("text"))).as("orig"))
    val bad = rebuilt.join(orig, Seq("doc_id"))
      .filter(col("rebuilt") =!= col("orig")).count()
    assert(bad === 0)
  }

  test("chunk: every chunk except a doc's last is exactly full") {
    val rows = Packing.chunk(docs)
      .withColumn("is_last", col("chunk_id") ===
        max(col("chunk_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(!col("is_last") &&
        col("n_chunk_tokens") =!= Packing.chunkTokens)
      .count()
    assert(rows === 0)
  }

  test("chunkOverlap: full coverage, fixed overlap, last window hits the end") {
    val size = Packing.chunkTokens
    val stride = Packing.overlapStride
    val ch = Packing.chunkOverlap(docs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    // every token covered: per doc, last start + its length == n tokens
    val n = docs.select(col("doc_id"),
      size_of_tokens.as("n"))
    val lastEnd = ch.groupBy("doc_id")
      .agg(max(col("chunk_id") * stride + col("n_chunk_tokens")).as("covered"))
    assert(lastEnd.join(n, Seq("doc_id"))
      .filter(col("covered") =!= col("n")).count() === 0)
    // every non-last window is exactly `size` tokens starting at
    // chunk_id*stride -> consecutive windows overlap by size - stride
    val notFull = ch
      .withColumn("is_last", col("chunk_id") === max(col("chunk_id")).over(w))
      .filter(!col("is_last") && col("n_chunk_tokens") =!= size).count()
    assert(notFull === 0)
    // reassembly: stripping the first (size - stride) tokens of every
    // non-first chunk rebuilds the tokenized document
    // (all chunks of a doc explode from one row, so the per-doc
    // collect_list partial preserves chunk order — same as the chunk
    // reassembly test above)
    val rebuilt = ch
      .withColumn("tail", when(col("chunk_id") === 0, col("chunk_text"))
        .otherwise(concat_ws(" ", slice(split(col("chunk_text"), " "),
          size - stride + 1, size))))
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("tail"))).as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.functions.Portable.tokens(col("text"))).as("orig"))
    assert(rebuilt.join(orig, Seq("doc_id"))
      .filter(col("rebuilt") =!= col("orig")).count() === 0)
  }

  private def size_of_tokens =
    size(graft.functions.Portable.tokens(col("text"))).cast("long")

  test("packAssign: bucketed scan equals the global-window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id"),
      size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n_tokens"))
    val naive = t.withColumn("cum_naive",
      sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val bad = Packing.packAssign(docs).join(naive, Seq("doc_id"))
      .filter(col("cum_tokens") =!= col("cum_naive")).count()
    assert(bad === 0)
    // pack ids are non-decreasing in doc order and start at 0
    val packs = Packing.packAssign(docs).orderBy("doc_id")
      .select("pack_id").collect().map(_.getLong(0))
    assert(packs.head === 0L)
    assert(packs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("packSequences: separators count n_docs-1; totals match packAssign") {
    val seqs = Packing.packSequences(docs).collect()
    assert(seqs.nonEmpty)
    val assigned = Packing.packAssign(docs)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("nt"))
      .collect().map(r => r.getAs[Long]("pack_id") ->
        (r.getAs[Long]("nd"), r.getAs[Long]("nt"))).toMap
    seqs.foreach { r =>
      val (nd, nt) = assigned(r.getAs[Long]("pack_id"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_tokens") === nt)
      val seps = r.getAs[String]("sequence_text")
        .split("\\s+").count(_ == Packing.eodToken)
      assert(seps === nd - 1, s"pack ${r.getAs[Long]("pack_id")}")
    }
  }

  test("shuffleOrder: ord is the exact rank of (shuffle_key, doc_id)") {
    val rows = Packing.shuffleOrder(docs).collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("ord")).sorted.toSeq === (1L to n).toSeq)
    val byKey = rows.sortBy(r =>
      (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
    assert(byKey.map(_.getAs[Long]("ord")).toSeq === (1L to n).toSeq)
  }

  test("splitAssign: deterministic, all splits present, ~90/5/5") {
    val counts = Packing.splitAssign(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.8)
    assert(counts("val") > 0 && counts("test") > 0)
  }

  test("shardAssign: per-split contiguous ords, full shards except the tail") {
    val rows = Packing.shardAssign(docs, shardSize = 8L).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet === Set("train", "val", "test"))
    for ((_, rs) <- bySplit) {
      val ords = rs.map(_.getAs[Long]("split_ord")).sorted.toSeq
      assert(ords === (1L to rs.length).toSeq)
      assert(rs.forall(r => r.getAs[Long]("shard_id") ===
        (r.getAs[Long]("split_ord") - 1) / 8))
      val sizes = rs.groupBy(_.getAs[Long]("shard_id"))
        .map { case (s, g) => s -> g.length }
      val lastShard = sizes.keys.max
      assert(sizes.filter(_._1 != lastShard).values.forall(_ == 8))
    }
    // split_ord is the global shuffled order restricted to the split
    val globalOrd = Packing.shuffleOrder(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ord")).toMap
    for ((_, rs) <- bySplit) {
      val bySplitOrd = rs.sortBy(_.getAs[Long]("split_ord"))
        .map(_.getAs[Long]("doc_id"))
      val byGlobal = rs.sortBy(r => globalOrd(r.getAs[Long]("doc_id")))
        .map(_.getAs[Long]("doc_id"))
      assert(bySplitOrd.toSeq === byGlobal.toSeq)
    }
  }

  test("writeTrainingShards: one file per shard, rows in training order") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val assigned = Packing.shardAssign(docs, shardSize = 8L)
    graft.sources.Sinks.writeTrainingShards(assigned, out)
    val splitDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(splitDirs.map(_.getName).toSet ===
      Set("split=train", "split=val", "split=test"))
    for (sd <- splitDirs; shard <- sd.listFiles().filter(_.isDirectory)) {
      val parts = shard.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"$shard has ${parts.length} files")
    }
    assert(spark.read.parquet(out).count() === assigned.count())
    // inside a shard file, rows sit in training order (a loader can
    // stream the file sequentially without sorting)
    val shard0 = new java.io.File(out, "split=train/shard_id=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val inFile = spark.read.parquet(shard0.toString)
      .select("split_ord").collect().map(_.getLong(0)).toSeq
    assert(inFile === inFile.sorted)
    assert(inFile.length === 8)
  }

  test("chunk + splitAssign run unchanged on a stream (shared ops)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rows = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "alpha beta"))
    def asDocs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        length(col("_2")).cast("long").as("n_chars"))
    val stream = MemoryStream[(Long, String)]
    val streamed = Packing.chunk(asDocs(stream.toDF()), chunkSize = 4)
    val q = streamed.writeStream.format("memory")
      .queryName("chunk_sink").outputMode("append").start()
    val stream2 = MemoryStream[(Long, String)]
    val q2 = Packing.splitAssign(asDocs(stream2.toDF())).writeStream
      .format("memory").queryName("split_sink").outputMode("append").start()
    val stream3 = MemoryStream[(Long, String)]
    val q3 = Packing.chunkOverlap(asDocs(stream3.toDF()), chunkSize = 4,
        stride = 3).writeStream
      .format("memory").queryName("overlap_sink").outputMode("append").start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      stream2.addData(rows: _*); q2.processAllAvailable()
      stream3.addData(rows: _*); q3.processAllAvailable()
      val batchDocs = asDocs(spark.createDataFrame(rows).toDF("_1", "_2"))
      assert(spark.table("chunk_sink").orderBy("doc_id", "chunk_id").collect().toSeq ===
        Packing.chunk(batchDocs, chunkSize = 4)
          .orderBy("doc_id", "chunk_id").collect().toSeq)
      assert(spark.table("split_sink").orderBy("doc_id").collect().toSeq ===
        Packing.splitAssign(batchDocs).orderBy("doc_id").collect().toSeq)
      assert(spark.table("overlap_sink").orderBy("doc_id", "chunk_id").collect().toSeq ===
        Packing.chunkOverlap(batchDocs, chunkSize = 4, stride = 3)
          .orderBy("doc_id", "chunk_id").collect().toSeq)
    } finally { q.stop(); q2.stop(); q3.stop() }
  }

  test("plan: pack/shuffle data-sized stages stay partition-parallel") {
    Seq(Packing.packAssign(docs), Packing.shuffleOrder(docs)).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      // bucket offsets join in via broadcast, never a shuffled join
      assert(p.contains("BroadcastExchange"), p)
      assert(!p.contains("SortMergeJoin"), p)
      // the data-sized window is keyed by bucket (partition-parallel).
      // A Window node prints `Window [fns], [partSpec], [orderSpec]`;
      // the metadata-sized offsets window (unpartitioned, ORDER BY
      // bucket) prints only `..., [bucket#.. ASC ...]` and must NOT
      // satisfy this — we require a real `[bucket#..]` PARTITION spec
      // followed by an order spec.
      val bucketPartSpec = """\[bucket#\d+L?\], \[""".r
      assert(p.linesIterator.exists(l =>
        l.contains("Window") && bucketPartSpec.findFirstIn(l).isDefined), p)
      // and no data-sized global window: any Window touching doc_id or
      // shuffle_key must carry that bucket partition spec
      assert(p.linesIterator.forall(l =>
        !l.contains("Window") ||
          !(l.contains("doc_id#") || l.contains("shuffle_key#")) ||
          bucketPartSpec.findFirstIn(l).isDefined), p)
    }
  }

  test("zorder: z matches the reference Morton interleave and zrank is " +
      "the contiguous (z, doc_id) order") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = Packing.zorderLayout(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, xb, yb, z, _) =>
      assert(xb >= 0 && xb < 16 && yb >= 0 && yb < 16, s"doc $id: 4-bit dims")
      assert(z === morton(xb, yb, 4), s"doc $id: Morton interleave")
    }
    // zrank = 0..n-1 in (z, doc_id) order, computed WITHOUT any global
    // data-sized window (two-level scan with z as the band)
    assert(rows.map(_._5).sorted.toSeq === (0L until rows.length).toSeq)
    assert(rows.sortBy(r => (r._4, r._1)).map(_._5).toSeq ===
      (0L until rows.length).toSeq)
    // both dimensions genuinely vary — the layout is 2-D, not a sort
    assert(rows.map(_._2).distinct.length > 1)
    assert(rows.map(_._3).distinct.length > 1)
  }

  test("zorder locality: a z-range block is simultaneously narrow in " +
      "BOTH dimension bands (the property file pruning relies on)") {
    val rows = Packing.zorderLayout(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._3)
    // cut the layout into 16 contiguous zrank "files": each file's
    // x-band and y-band spans must average far below the global span
    // (a 1-D sort would leave the other dimension full-width ~15)
    val files = rows.grouped(math.max(rows.length / 16, 1)).toSeq
    def spans(sel: ((Long, Long, Long)) => Long): Double = {
      val s = files.map(f => sel(f.maxBy(sel)) - sel(f.minBy(sel)))
      s.sum.toDouble / s.length
    }
    val (xSpan, ySpan) = (spans(_._1), spans(_._2))
    assert(xSpan < 8 && ySpan < 8,
      f"mean per-file band spans x=$xSpan%.1f y=$ySpan%.1f — " +
        "expected both << 15 for a genuine space-filling layout")
  }

  test("shardStats: every doc counted once, shards never overfill, and " +
      "the per-shard checksums xor back to the corpus checksum") {
    val stats = Packing.shardStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(stats.nonEmpty)
    // doc conservation: shard counts per split match the assignment
    val assigned = Packing.shardAssign(docs).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard_id")))
    assert(stats.map(_._3).sum === assigned.length)
    stats.foreach { case (split, shard, n, lo, hi, chars, _) =>
      assert(n <= Packing.shardDocs, s"$split/$shard overfilled: $n")
      assert(lo <= hi && chars > 0)
      assert(assigned.count(a => a._1 == split && a._2 == shard) === n)
    }
    // xor is associative/commutative: folding the per-shard checksums
    // must reproduce the corpus-wide manifest value
    val corpus = graft.operators.Curation.corpusChecksum(docs)
      .collect().head.getAs[Long]("content_xor")
    assert(stats.map(_._7).reduce(_ ^ _) === corpus,
      "shard checksums must compose to the corpus checksum")
  }

  test("attentionMass: shares are exact n-squared ratios that sum to 1 " +
      "with cross_share, and a single-doc pack is pure within-mass") {
    import spark.implicits._
    import graft.operators.Packing
    // budget 10: docs of 4+6 fill pack 0 exactly; a 10-token doc owns
    // pack 1; 3+3 land in pack 2
    val d = Seq(
      (1L, Seq.fill(4)("t").mkString(" ")),
      (2L, Seq.fill(6)("t").mkString(" ")),
      (3L, Seq.fill(10)("t").mkString(" ")),
      (4L, Seq.fill(3)("t").mkString(" ")),
      (5L, Seq.fill(3)("t").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Packing.attentionMass(d, budget = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p0 = out(0L)
    assert((p0.getLong(1), p0.getLong(2)) === ((2L, 10L)))
    assert(p0.getDouble(3) === r6((16.0 + 36.0) / 100.0))
    val p1 = out(1L)
    assert(p1.getLong(1) === 1L && p1.getDouble(3) === 1.0 &&
      p1.getDouble(4) === 0.0)
    out.values.foreach { r =>
      assert(math.abs(r.getDouble(3) + r.getDouble(4) - 1.0) < 2e-6)
    }
  }

  test("chunkDedup: planted duplicate chunks are counted with the " +
      "keep-first rule; clean docs report zero") {
    import spark.implicits._
    val c = Packing.chunkTokens
    val block = (0 until c).map(i => s"w$i").mkString(" ")
    val other = (0 until c).map(i => s"x$i").mkString(" ")
    val tail = "unique tail tokens"
    // doc 1: block + other; doc 2: block twice (one self-dup, one
    // cross-doc dup); doc 3: clean
    val d = Seq(
      (1L, s"$block $other"),
      (2L, s"$block $block"),
      (3L, s"$tail"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Packing.chunkDedup(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 0L, 0L)))       // first occurrences
    assert(out(2L) === ((2L, 2L, 2L)))       // both chunks dup doc 1's
    assert(out(3L) === ((1L, 0L, 0L)))
    // real data: invariants hold corpus-wide
    val real = Packing.chunkDedup(docs).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= r.getLong(2))
      assert(math.abs(r.getDouble(4) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }
}
