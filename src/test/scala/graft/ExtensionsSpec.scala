package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Semantics tests for the training-data-pipeline operators (text
  * analysis, dedup, similarity) on hand-checkable fixtures. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text stats: token counts, ratios, language heuristic") {
    val st = TextAnalysis.stats(docs(
      (1L, "the cat and the hat is a cat"),
      (2L, "el perro de la casa que y el")))
      .orderBy("doc_id").collect()
    assert(st(0).getAs[Long]("n_tokens") === 8L)
    assert(st(0).getAs[String]("lang_pred") === "en") // 4 en markers
    assert(st(0).getAs[Double]("stopword_ratio") === 0.625) // the,and,the,is,a of 8
    assert(st(1).getAs[String]("lang_pred") === "es")
  }

  test("text: identical normalized text -> identical fingerprint") {
    val st = TextAnalysis.stats(docs(
      (1L, "hello   world foo"),
      (2L, "  hello world   foo "))).collect()
    assert(st.map(_.getAs[String]("fingerprint")).distinct.length === 1)
    assert(st.map(_.getAs[Long]("fingerprint64")).distinct.length === 1)
  }

  test("dedup exact: normalized duplicates collapse to min doc_id") {
    val d = Dedup.exact(docs(
      (5L, "a b c"), (3L, "A  b C"), (9L, "other text here"))).collect()
    assert(d.length === 2)
    val dup = d.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dup.getAs[Long]("rep_doc_id") === 3L)
  }

  test("dedup shingles: word 3-grams, distinct, short docs excluded") {
    val sh = Dedup.shingles(docs((1L, "a b c d"), (2L, "x y"))).collect()
    assert(sh.map(_.getAs[String]("shingle")).sorted.toSeq ===
      Seq("a b c", "b c d")) // doc 2 has <3 tokens
  }

  test("dedup minhash: near-identical docs pair, unrelated don't") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w30", "zz")
    val other = (1 to 30).map(i => s"q$i").mkString(" ")
    val pairs = Dedup.minhashPairs(docs((1L, base), (2L, nearDup), (3L, other)))
      .collect()
    assert(pairs.length === 1)
    assert((pairs(0).getAs[Long]("doc_a"), pairs(0).getAs[Long]("doc_b")) === (1L, 2L))
    assert(pairs(0).getAs[Double]("jaccard") > 0.85)
  }

  test("dedup simhash: identical text -> hamming 0 pair; signature stable") {
    val s = Dedup.simhash(docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma")))
      .collect()
    assert(s(0).getAs[Long]("sim_lo") === s(1).getAs[Long]("sim_lo"))
    assert(s(0).getAs[Long]("sim_hi") === s(1).getAs[Long]("sim_hi"))
    val p = Dedup.simhashPairs(docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma")))
      .collect()
    assert(p.length === 1 && p(0).getAs[Long]("hamming") === 0L)
  }

  test("dedup clusters: transitive chains collapse to the min doc_id") {
    // chain 1-2-3 (via pairs (1,2),(2,3)) and isolated pair (7,9)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val c = Dedup.clusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  private def vecs(rows: (Long, Seq[Float], Int)*): DataFrame =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("similarity: brute-force top-k exact ranking") {
    val df = vecs(
      (0L, Seq(1f, 0f), 0),   // query
      (1L, Seq(1f, 0.01f), 0), // nearly parallel
      (2L, Seq(0.7f, 0.7f), 1), // 45 degrees
      (3L, Seq(0f, 1f), 1))   // orthogonal
    val top = Similarity.bruteForceTopK(df, k = 3, nQueries = 1).collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top(0).getAs[Double]("cosine") > 0.999)
    assert(top(2).getAs[Double]("cosine") === 0.0)
  }

  test("similarity: near-dup pairs finds duplicated vectors only") {
    val df = vecs(
      (0L, Seq(1f, 2f, 3f), 0), (1L, Seq(1f, 2f, 3f), 0),
      (2L, Seq(-3f, 1f, 0.5f), 1))
    val p = Similarity.nearDupPairs(df, 0.99, dim = 3).collect()
    assert(p.length === 1)
    assert((p(0).getAs[Long]("vec_a"), p(0).getAs[Long]("vec_b")) === (0L, 1L))
  }

  test("similarity: int8 quantization bounds codes and approximates cosine") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Similarity.quantized(emb)
    // true tinyint column, codes within the symmetric int8 range
    assert(q.schema("q").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val codes = q.select(explode(col("q")).as("c")).agg(
      min(col("c")), max(col("c"))).head()
    assert(codes.getByte(0) >= -127 && codes.getByte(1) <= 127)
    // reconstructed cosine tracks the exact cosine closely at dim 64
    val exact = Similarity.bruteForceTopK(emb, k = 3, nQueries = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val approx = Similarity.quantizedTopK(emb, k = 3, nQueries = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = exact.keySet intersect approx.keySet
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(exact(k) - approx(k)) < 0.02, s"pair $k")
    }
  }

  test("similarity: k-means build is deterministic and partition-invariant") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (asg, cents) = Similarity.kmeans(emb)
    val a = asg.select("vec_id", "cell").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (asg2, _) = Similarity.kmeans(emb.repartition(7))
    val b = asg2.select("vec_id", "cell").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq) // layout-independent assignments
    // non-degenerate clustering: more than one cell in use
    assert(a.map(_._2).distinct.length > 1)
    assert(cents.count() === a.map(_._2).distinct.length.toLong)
  }

  test("similarity: IVF probes restrict search to nearest cells") {
    // label 0 points near +x, label 1 near +y; query near +x must rank
    // label-0 vectors first even with nprobe=2 (all cells searched here).
    val df = vecs(
      (0L, Seq(10f, 0.1f), 0), (1L, Seq(9f, 0.2f), 0), (2L, Seq(8f, 0f), 0),
      (3L, Seq(0.1f, 10f), 1), (4L, Seq(0f, 9f), 1))
    val top = Similarity.ivfTopK(df, k = 2, nQueries = 1, nprobe = 1).collect()
    // (8,0) is more parallel to (10,0.1) than (9,0.2); both are label 0.
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 1L))
  }

  test("similarity: SRP signatures equal for identical vectors; LSH top-1 recall is sane") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sigs = Similarity.unitized(emb)
      .withColumn("sig", Similarity.srpSignature(col("unit")))
    // deterministic: same vector -> same signature on every evaluation
    val s1 = sigs.orderBy("vec_id").limit(5).collect().map(_.getAs[Long]("sig"))
    val s2 = sigs.orderBy("vec_id").limit(5).collect().map(_.getAs[Long]("sig"))
    assert(s1.toSeq === s2.toSeq)
    // SRP-LSH retrieves NEAR-DUPLICATES (high bit-agreement), not
    // nearest neighbors in orthogonal noise: plant 20 perturbed copies
    // of base vectors as queries and require top-1 recall of the twin.
    // (cos ~0.999 -> per-bit disagreement ~1.4% -> P(either 8-bit band
    // matches) ~0.98; on random data recall is near 0 by design.)
    val base = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        val twin = v.zipWithIndex.map { case (x, d) =>
          x + (if (d % 7 == 0) 0.001f else -0.001f) }
        (i.toLong, twin.toSeq, r.getAs[Int]("label"))
      }
    import spark.implicits._
    val planted = base.toSeq.toDF("vec_id", "embedding", "label")
      .union(emb.filter(col("vec_id") >= 100))
    val lsh = Similarity.lshTopK(planted, k = 1, nQueries = 20).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val recall = (0 until 20).count(i => lsh.get(i.toLong).contains(i + 100L)) / 20.0
    assert(recall >= 0.8, s"LSH planted-twin recall $recall")
  }
}
