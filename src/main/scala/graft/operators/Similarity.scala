package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: Array[Float], label): brute-force cosine top-k as
  * the exact baseline, an IVF (inverted-file) variant as the scale path,
  * and embedding-cosine near-duplicate pairs for dedup.
  *
  * Dot products use the `zip_with`/`aggregate` higher-order functions —
  * codegen'd Catalyst expressions, summed sequentially left-to-right in
  * double precision, which is bit-identical to the DuckDB oracle's
  * `list_inner_product(a::DOUBLE[], b::DOUBLE[])`.
  *
  * Scale notes (100 TB):
  *   - Brute force broadcasts the (small) query set and streams the base
  *     table — one map-side pass plus a top-k per query
  *     (TakeOrdered-style, no global sort). Exact but O(|Q|·n).
  *   - IVF: centroids are a tiny aggregate (k×dim doubles, broadcast);
  *     each query probes `nprobe` partitions, cutting the scan to
  *     nprobe/k of the base table. The partition key (label/centroid id)
  *     is the natural bucketing column for the base table on disk, so at
  *     cluster scale the probe is partition-pruned I/O, not a filter.
  *   - Near-dup pairs: the exact all-pairs form below is O(n²)/2 —
  *     correct at test scale; the scale path is signed-random-projection
  *     banding, same pigeonhole pattern as [[Dedup.simhashPairs]].
  */
object Similarity {

  /** Sequential double-precision dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity, rounded to 6 decimals (shared with the oracle). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Exact brute-force cosine top-k neighbors for queries vec_id <
    * nQueries: (query_id, neighbor_id, cosine, rank). Total order via
    * (cosine desc, neighbor_id) tiebreak. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5,
      nQueries: Int = 20): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = embeddings.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cosine"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-label centroids: (label, centroid: Array[Double]). The existing
    * `label` column plays the role of the IVF coarse quantizer's cell
    * assignment (k-means would produce it in a real build pass). */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))

  /** IVF top-k: each query probes the `nprobe` nearest centroids and
    * searches only vectors in those cells. Same output shape as
    * [[bruteForceTopK]]; approximate by construction. */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 20,
      nprobe: Int = 2): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("label"))
    val probes = queries.crossJoin(broadcast(centroids(embeddings)))
      .select(col("query_id"), col("qv"), col("label"),
        cosine(col("qv"), col("centroid")).as("cdist"))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    val probesRenamed = probes.withColumnRenamed("label", "probes_label")
    val scored = embeddings.join(broadcast(probesRenamed),
        col("label") === col("probes_label") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("cosine"))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (dedup modality): all pairs
    * with cosine ≥ threshold. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.9): DataFrame =
    embeddings.as("a").join(embeddings.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
}
