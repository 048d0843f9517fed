package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Materialize.PinOps

/** Training-data curation operators over the `documents` table — the
  * selection/downsampling layer of an LLM data pipeline: rule-based
  * quality filtering (Gopher/C4-style), n-gram repetition detection, and
  * deterministic sampling (Bernoulli-by-hash and exact-k stratified).
  *
  * Everything is codegen'd column expressions plus hash aggregations
  * with an exact DuckDB twin ([[graft.OraclesCuration]]); the rule
  * thresholds and hash salts live here once and the oracle SQL is
  * generated from them.
  *
  * Scale notes (100 TB):
  *   - [[qualityFilter]] is pure map-side work over the scan — the keep
  *     decision is pushed-down-able (a literal predicate over scan
  *     columns), so the downstream pipeline reads only survivors.
  *   - [[repetition]] shuffles n-gram rows once on the high-cardinality
  *     (doc_id, gram) key with full partial aggregation.
  *   - Sampling by a salted content-independent hash is reproducible
  *     across runs/clusters (no RNG state) and map-side; stratified
  *     exact-k goes through [[TopK]]'s bounded heap, not a per-stratum
  *     sort.
  */
object Curation {

  // ---- Gopher/C4-style quality rules (thresholds shared w/ oracle) ----
  val minTokens = 10
  val maxTokens = 100000
  val minMeanWordLen = 2.0
  val maxMeanWordLen = 12.0
  val maxPunctRatio = 0.3
  val minStopwords = 2

  private def toks: Column = Portable.tokens(col("text"))

  /** Rule-based document filter: each rule as an auditable boolean plus
    * the final keep flag (the shape quality-filter reports need — you
    * tune thresholds by looking at per-rule kill rates). */
  def qualityFilter(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_word_len",
        round(length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          col("n_tokens"), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col("text"), "[a-z0-9\\s]", ""))
          .cast("double") / col("n_chars"), 4))
      .withColumn("n_stopwords",
        size(filter(toks, t =>
          t.isin(TextAnalysis.stopwords.map(lit(_)): _*))).cast("long"))
      .withColumn("r_token_count",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
      .withColumn("r_punct_ratio", col("punct_ratio") <= maxPunctRatio)
      .withColumn("r_stopwords", col("n_stopwords") >= minStopwords)
      .withColumn("keep",
        col("r_token_count") && col("r_mean_word_len") &&
          col("r_punct_ratio") && col("r_stopwords"))
      // no presentation sort here: the op is stream-safe (stateless
      // map-side); the registered query adds its ORDER BY
      .select("doc_id", "n_tokens", "mean_word_len", "punct_ratio",
        "n_stopwords", "r_token_count", "r_mean_word_len", "r_punct_ratio",
        "r_stopwords", "keep")

  /** Pareto frontier of documents per language on the two primary
    * selection axes — n_tokens (more is better: long coherent docs)
    * vs punct_ratio (less is better: markup/boilerplate noise) — the
    * multi-objective "which documents are undominated tradeoffs"
    * selection view (a budgeted curation pass keeps the frontier
    * first, then fills from the dominated interior by a scalar
    * score; cf. [[Relational.partSkyline]], whose banded plan this
    * reuses). A document is dominated iff another same-language doc
    * is no worse on both axes and strictly better on one; exact
    * signal ties stay on the frontier together (standard skyline tie
    * semantics).
    *
    * Scale: NO pairwise join and NO global window — max(n_tokens)
    * per DISTINCT (lang, punct_ratio) (map-side combine collapses
    * the data grain), a running-max window over the distinct-ratio
    * band (punct_ratio is 4dp-rounded, so ≤ 3001 rows per language
    * REGARDLESS of corpus size), and one join-back. The oracle
    * states the pure NOT-EXISTS dominance semantics; hash equality
    * certifies the banded plan equivalent. */
  def paretoDocs(documents: DataFrame): DataFrame = {
    val sig = qualityFilter(documents)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"))
    val docs = documents.select(col("doc_id"), col("lang"))
      .join(sig, Seq("doc_id"))
    val perRatio = docs.groupBy(col("lang"), col("punct_ratio"))
      .agg(max(col("n_tokens")).as("ratio_max"))
    val w = Window.partitionBy(col("lang")).orderBy(col("punct_ratio"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = perRatio
      .withColumn("prev_max", max(col("ratio_max")).over(w))
    docs.join(verdict, Seq("lang", "punct_ratio"))
      .filter(!(coalesce(col("prev_max") >= col("n_tokens"), lit(false)) ||
        col("ratio_max") > col("n_tokens")))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("punct_ratio"))
      .orderBy(col("lang"), col("punct_ratio"), col("doc_id"))
  }

  /** Corpus composition report — the per-(language, source) dashboard a
    * curation run starts and ends with: document and token counts,
    * quality-gate pass rate, exact-duplicate rate. Pure composition of
    * verified operators over grouped aggregates: one metrics pass
    * ([[qualityFilter]]), one fingerprint aggregation, one group-by on
    * the (lang, source) grid — every stage partial-aggregates; the
    * output is O(#langs × #sources). Rates are IEEE sums of 0/1 doubles
    * (exact integers ≤ 2^53, order-independent) over one division. */
  def corpusReport(documents: DataFrame): DataFrame = {
    val q = qualityFilter(documents).select(col("doc_id"), col("n_tokens"),
      col("keep"))
    val fp = documents.select(col("doc_id"),
      md5(TextAnalysis.normalizedText(col("text"))).as("fingerprint"))
    val firstFp = fp.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("first_doc"))
    val dup = fp.join(firstFp, Seq("fingerprint"))
      .select(col("doc_id"), (col("doc_id") =!= col("first_doc")).as("is_dup"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(q, Seq("doc_id")).join(dup, Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("keep").cast("double")), 6).as("quality_keep_rate"),
        round(avg(col("is_dup").cast("double")), 6).as("dup_rate"))
      .orderBy(col("lang"), col("source"))
  }

  /** Temperature-based mixture plan — the multilingual-rebalancing
    * recipe every LLM data mix uses (upsample low-resource languages,
    * damp the head): per language, share = its token fraction of the
    * corpus; the T-tempered share is share^(1/T) renormalized, and the
    * sampling factor tempered/original is what a sampler like
    * [[sampleMixture]] applies. T = 2 here so the tempering is sqrt —
    * IEEE-correctly-rounded in both engines, no libm pow divergence.
    *
    * Scale (100 TB): one token-count aggregation on lang (partial
    * map-side combine), then all tempering math runs on the O(#langs)
    * aggregate — a broadcast-sized plan table, never a second corpus
    * pass. */
  def mixturePlan(documents: DataFrame): DataFrame = {
    // materialize the O(#langs) aggregate ONCE: total/tempered/normalizer
    // all re-reference it, and without this each reference re-plans the
    // corpus aggregation — three full passes at 100 TB instead of one
    val perLang = documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"))
      .pin(eager = true)
    val tot = perLang.agg(sum(col("n_tokens")).as("total_tokens"))
    val tempered = perLang.crossJoin(broadcast(tot))
      .withColumn("share", col("n_tokens").cast("double") / col("total_tokens"))
      .withColumn("tw", sqrt(col("share")))
    // decimal-exact normalizer: order-independent under any partitioning
    // (tw is rounded to 12 decimals before summing on BOTH engines)
    val z = tempered.agg(
      sum(col("tw").cast("decimal(28,12)")).cast("double").as("z"))
    tempered.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("tw") / col("z"), 6).as("tempered_share"),
        round(col("tw") / col("z") / col("share"), 6).as("sample_factor"))
      .orderBy(col("lang"))
  }

  /** Replicate count / hash salt / Poisson(1) CDF for
    * [[bootstrapCi]] — shared with the oracle generator. The
    * cumulative probabilities are computed once in Scala and
    * interpolated as shortest-round-trip double literals, so both
    * engines threshold against bit-identical values. */
  val BootstrapReps = 20
  val bootSalt = "graft-boot:"
  val poissonCum: Seq[Double] = {
    val e = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      cum += e / fact
      cum
    }
  }

  /** Deterministic Poisson bootstrap over document token lengths: each
    * (replicate, doc) pair draws a Poisson(1) resample weight from a
    * salted-hash uniform (the online-bootstrap trick — at corpus scale
    * a true resample-with-replacement would need a global shuffle per
    * replicate; hash-Poisson weights need ZERO coordination and are
    * reproducible forever), and each replicate reports its weighted
    * mean length. The spread across the [[BootstrapReps]] replicate
    * means IS the sampling distribution of the mean — the basis of
    * every bootstrap CI. All sums are exact integers (weights ×
    * integer lengths); one shuffle on the replicate id. */
  def bootstrapCi(documents: DataFrame): DataFrame = {
    val lens = documents.select(col("doc_id"),
      size(toks).cast("long").as("l"))
    val reps = lens.select(col("doc_id"), col("l"),
      explode(sequence(lit(0), lit(BootstrapReps - 1))).as("rep"))
    val u = graft.functions.Portable.hash32(
      concat(lit(bootSalt), col("rep").cast("string"), lit(":"),
        col("doc_id").cast("string"))).cast("double") /
      lit(4294967296.0)
    val w = poissonCum.zipWithIndex
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), 0)) {
        case (acc, (c, k)) => acc.when(u < lit(c), k)
      }.otherwise(poissonCum.length).cast("long")
    reps.select(col("rep").cast("long").as("replicate"), col("l"),
        w.as("w"))
      .groupBy(col("replicate"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("l")).as("wl"))
      .select(col("replicate"), col("n_eff"),
        when(col("n_eff") > 0,
          round(col("wl").cast("double") / col("n_eff"), 6))
          .as("mean_len"))
      .orderBy(col("replicate"))
  }

  /** Target sample size for [[neymanAllocation]] — shared with the
    * oracle generator. */
  val NeymanSampleSize = 1000L

  /** Neyman-optimal stratified-sampling allocation per source: sample
    * n_h ∝ N_h·S_h (stratum size × within-stratum length stddev)
    * instead of proportionally — the variance-minimizing design for a
    * fixed labeling/eval budget (a big but homogeneous source needs
    * FEWER samples than proportional; a small, wildly varied one needs
    * more). Per-stratum moments are exact INTEGER sums (token lengths),
    * the N_h·S_h terms go through the 1e-6 decimal grid for the
    * order-independent normalizer, and the output is sources-sized.
    * Zero-variance strata allocate 0 (their one value is already
    * known), stated identically by the oracle. */
  def neymanAllocation(documents: DataFrame): DataFrame = {
    val m = documents
      .select(col("source"), size(toks).cast("long").as("l"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("l")).as("s1"),
        sum(col("l") * col("l")).as("s2"))
      .pin(eager = true)
    val nd = col("n_docs").cast("double")
    val sd = sqrt(greatest(
      col("s2") / nd - (col("s1") / nd) * (col("s1") / nd), lit(0.0)))
    val scored = m.select(col("source"), col("n_docs"),
      round(sd, 6).as("sd_len"),
      round(nd * sd, 6).cast("decimal(28,6)").as("nhsh"))
    val tots = scored.agg(sum(col("nhsh")).as("tot_nhsh"),
      sum(col("n_docs")).as("tot_docs"))
    scored.crossJoin(broadcast(tots))
      .select(col("source"), col("n_docs"), col("sd_len"),
        round(col("n_docs").cast("double") / col("tot_docs"), 6)
          .as("prop_share"),
        round(col("nhsh").cast("double") / col("tot_nhsh"), 6)
          .as("neyman_share"),
        round(col("nhsh").cast("double") / col("tot_nhsh") *
          lit(NeymanSampleSize), 2).as("alloc"))
      .orderBy(col("source"))
  }

  /** Reservoir size for [[reservoirSample]], shared with the oracle
    * generator. */
  val ReservoirK = 100

  /** Deterministic priority (bottom-k) sample: each document draws a
    * salted-hash priority and the k smallest win — the distributed
    * equivalent of reservoir sampling (identical marginal: every doc
    * has the same chance under a random hash), but associative, so a
    * 1000-executor run computes it as a bounded top-k with NO global
    * sort or sequential scan — and REPRODUCIBLE, unlike an actual
    * reservoir, whose result depends on encounter order.
    *
    * Scale: TakeOrdered — per-partition bounded heaps, k rows to the
    * driver stage; the rank window runs over the k-row slice only
    * (plan-audited). */
  def reservoirSample(documents: DataFrame): DataFrame = {
    val pri = documents.select(col("doc_id"), col("lang"), col("source"),
        Portable.hash32(concat(lit(sampleSalt),
          col("doc_id").cast("string"))).as("priority"))
      .orderBy(col("priority"), col("doc_id")).limit(ReservoirK)
    pri.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("priority"), col("doc_id"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** Temperature grid for [[temperatureMix]], shared with the oracle
    * generator. */
  val MixAlphas: Seq[Double] = Seq(0.3, 0.5, 0.7)

  /** Temperature-scaled source sampling weights: w_i ∝ n_i^α for each
    * α in [[MixAlphas]] — the standard multilingual/multi-source
    * rebalancing curve (α = 1 keeps the natural token share, α → 0
    * flattens toward uniform; XLM-R popularized α = 0.3). One row per
    * source with the natural share and each tempered weight, so a mix
    * designer reads the whole trade-off at once.
    *
    * Determinism: n^α is stated as exp(α·ln n) on proven-parity
    * doubles, rounded to the 1e-6 grid and summed as DECIMAL — the
    * [[neymanAllocation]] exact-normalizer recipe. Scale: one hash
    * aggregate to the (bounded) source grain; everything after is
    * metadata-sized. */
  def temperatureMix(documents: DataFrame): DataFrame = {
    val per = documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"))
      .pin(eager = true)
    // zero-token source => mass 0 => weight 0 (not NULL): the log
    // argument is NULL-guarded inline (the engine-wide ln(0)/div-0
    // convention — a CASE around the whole exp is not vectorization-
    // safe in every engine), then the NULL mass coalesces to 0 so the
    // source stays in the output with an explicit zero weight instead
    // of silently dropping out of the normalizers.
    def mass(a: Double) =
      round(coalesce(exp(lit(a) *
        log(when(col("n_tokens") > 0, col("n_tokens").cast("double")))),
        lit(0.0)), 6).cast("decimal(28,6)")
    val scored = per.select(col("source"), col("n_docs"), col("n_tokens"),
      mass(MixAlphas(0)).as("m03"), mass(MixAlphas(1)).as("m05"),
      mass(MixAlphas(2)).as("m07"))
    val tots = scored.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("m03")).as("t03"), sum(col("m05")).as("t05"),
      sum(col("m07")).as("t07"))
    scored.crossJoin(broadcast(tots))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot_tokens"), 6).as("share"),
        round(col("m03").cast("double") / col("t03").cast("double"), 6)
          .as("w_t03"),
        round(col("m05").cast("double") / col("t05").cast("double"), 6)
          .as("w_t05"),
        round(col("m07").cast("double") / col("t07").cast("double"), 6)
          .as("w_t07"))
      .orderBy(col("source"))
  }

  /** Token budget and repeat ceiling for [[tokenEpochs]] — shared with
    * the oracle generator. */
  val EpochTokenBudget = 10000000L
  val EpochRepeatCap = 4.0

  /** Data-constrained training plan per source: allocate the
    * [[EpochTokenBudget]]-token budget across sources by the
    * sqrt-tempered mixture weights and report how many EPOCHS of each
    * source that allocation implies (allocated / unique tokens) — the
    * Muennighoff-style check that a mixture doesn't silently repeat a
    * small source past the ~[[EpochRepeatCap]]-epoch
    * diminishing-returns ceiling. Same one-pass aggregate +
    * broadcast-normalizer shape as [[mixturePlan]] (sources-sized
    * everything after the first scan); epochs and the cap flag are
    * double math on exact integer counts. */
  def tokenEpochs(documents: DataFrame): DataFrame = {
    val perSource = documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"))
      .pin(eager = true)
    val tot = perSource.agg(sum(col("n_tokens")).as("total_tokens"))
    val tempered = perSource.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_tokens").cast("double") / col("total_tokens"))
      .withColumn("tw", sqrt(col("share")))
    val z = tempered.agg(
      sum(col("tw").cast("decimal(28,12)")).cast("double").as("z"))
    val alloc = col("tw") / col("z") * lit(EpochTokenBudget)
    tempered.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("tw") / col("z"), 6).as("weight"),
        round(alloc, 2).as("alloc_tokens"),
        round(alloc / col("n_tokens"), 6).as("epochs"),
        (alloc / col("n_tokens") > EpochRepeatCap).as("over_cap"))
      .orderBy(col("source"))
  }

  /** Per-language ADAPTIVE length filter: corpus-derived p5/p95 token
    * bounds per language instead of [[qualityFilter]]'s global
    * constants — the Dolma-style per-source calibration (a threshold
    * right for English prose kills CJK or code). Per-language exact
    * p5/p95 via the distributed distinct-value scan
    * ([[Quantiles.exactPercentilesBy]] ≡ Spark `percentile` ≡ DuckDB
    * `quantile_cont` at round-6, proven by rel_quantiles — never the
    * per-group value→count buffer); the bounds table is O(#languages)
    * and broadcasts into the keep join. The keep decision compares
    * against the ROUNDED bounds so both engines decide from
    * bit-identical thresholds. */
  def lengthAdaptive(documents: DataFrame): DataFrame = {
    val t = documents.select(col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"))
    val bounds = Quantiles.exactPercentilesBy(
        t.select(col("lang"), col("n_tokens").as("v")),
        Seq("lang"), Seq(0.05, 0.95))
      .select(col("lang"), round(element_at(col("bs"), 1), 6).as("p5"),
        round(element_at(col("bs"), 2), 6).as("p95"))
    t.join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("p5"), col("p95"),
        (col("n_tokens") >= col("p5") && col("n_tokens") <= col("p95"))
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  /** N-gram repetition metrics (the Gopher repetition signals, at the
    * token and bigram level): duplicate-gram fraction and most-frequent-
    * gram fraction. High values mark boilerplate/spam documents. */
  def repetition(documents: DataFrame): DataFrame = {
    def gramStats(grams: DataFrame, gramCol: String, prefix: String) =
      grams.groupBy(col("doc_id"), col(gramCol)).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"n_$prefix"),
          count(lit(1)).as(s"n_distinct_$prefix"),
          max(col("c")).as("top_c"))
        .select(col("doc_id"),
          col(s"n_$prefix").cast("long").as(s"n_$prefix"),
          round((col(s"n_$prefix") - col(s"n_distinct_$prefix"))
            .cast("double") / col(s"n_$prefix"), 6).as(s"dup_${prefix}_ratio"),
          round(col("top_c").cast("double") / col(s"n_$prefix"), 6)
            .as(s"top_${prefix}_ratio"))
    val tokens = documents.select(col("doc_id"), explode(toks).as("token"))
    val bigrams = documents
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i+1]))")).as("bigram"))
    gramStats(tokens, "token", "token")
      .join(gramStats(bigrams, "bigram", "bigram"), Seq("doc_id"), "left")
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination (the step that keeps eval data out of
    * training corpora): for each training document, the fraction of its
    * distinct word-3-gram shingles that appear anywhere in the eval
    * set's shingle universe; docs above `threshold` are flagged for
    * removal. Asymmetric containment, not Jaccard — a short eval prompt
    * embedded in a long page must still flag the page.
    *
    * Scale shape: the eval universe is tiny (benchmarks are small) —
    * broadcast it; the probe side is one map-side semi-join over the
    * exploded shingles plus a per-doc count aggregation. Documents with
    * fewer than 3 tokens have no shingles and are out of scope (same as
    * the dedup operators). */
  def decontaminate(documents: DataFrame, evalMaxId: Long = 20,
      threshold: Double = 0.5): DataFrame =
    decontaminateOf(Dedup.shingles(documents), evalMaxId, threshold)

  /** [[decontaminate]] over a precomputed distinct-shingle set — lets
    * [[curatedCorpus]] share one shingle materialization with the
    * near-dup branch. */
  private def decontaminateOf(sh: DataFrame, evalMaxId: Long = 20,
      threshold: Double = 0.5): DataFrame = {
    val evalSh = sh.filter(col("doc_id") < evalMaxId)
      .select(col("shingle")).distinct()
    val train = sh.filter(col("doc_id") >= evalMaxId)
    val counts = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = train.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_eval_sh"))
    counts.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_eval_sh"), lit(0L)).as("n_eval_sh"),
        round(coalesce(col("n_eval_sh"), lit(0L)).cast("double") /
          col("n_sh"), 6).as("contamination"))
      .withColumn("flagged", col("contamination") >= threshold)
      .orderBy(col("doc_id"))
  }

  /** [[decontaminate]] with a BLOOM-FILTER pre-filter — the at-scale
    * form: when the eval universe outgrows a broadcast hash join (many
    * benchmarks × many shingles), the probe side first passes through a
    * fixed-size Bloom sketch of the eval shingles, built DISTRIBUTED by
    * Spark's native `BloomFilterAggregate` and probed by
    * `BloomFilterMightContain` (the engine's own runtime-filter
    * machinery — codegen'd Catalyst expressions, no UDF; the sketch
    * reaches the scan as a scalar subquery exactly like an injected
    * runtime filter). Only surviving candidates hit the exact
    * verification join, so the expensive join's probe side shrinks to
    * ~the truly-contaminated rows + the fpp tail.
    *
    * Because a Bloom filter has NO false negatives, the output is
    * row-for-row [[decontaminate]]'s — the oracle states the plain
    * exact SQL, and hash equality proves the whole Bloom path
    * value-invisible (the salted-join proof pattern).
    *
    * Upgrade note: this method splices non-public Catalyst internals
    * ([[BloomFilterAggregate]], [[BloomFilterMightContain]],
    * [[ScalarSubquery]] via GraftGlue) whose constructor signatures have
    * shifted across Spark minor releases — it is the most
    * upgrade-fragile code in the repo, deliberately: Spark exposes no
    * public Scala surface for an injected bloom runtime filter, and the
    * SQL-function route (`bloom_filter_agg`/`might_contain`) is not
    * registered in vanilla 4.x either. The result is value-verified
    * against the exact plain-SQL oracle, so an API break on upgrade is
    * a compile/runtime failure, never silent corruption; CurationSpec
    * pins the constructor arity for the running Spark version. */
  def decontaminateBloom(documents: DataFrame, evalMaxId: Long = 20,
      threshold: Double = 0.5, expectedItems: Long = 1L << 16,
      numBits: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftGlue
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val sh = Dedup.shingles(documents)
    val evalSh = sh.filter(col("doc_id") < evalMaxId)
      .select(col("shingle")).distinct()
    val train = sh.filter(col("doc_id") >= evalMaxId)
    val bloomDf = evalSh.select(GraftGlue.toColumn(
      new BloomFilterAggregate(
        GraftGlue.toExpression(xxhash64(col("shingle"))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression()).as("bf"))
    val mightContain = GraftGlue.toColumn(BloomFilterMightContain(
      ScalarSubquery(GraftGlue.logicalPlan(bloomDf), Seq.empty),
      GraftGlue.toExpression(xxhash64(col("shingle")))))
    val counts = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = train.filter(mightContain) // Bloom pre-filter: no false negatives
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_eval_sh"))
    counts.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_eval_sh"), lit(0L)).as("n_eval_sh"),
        round(coalesce(col("n_eval_sh"), lit(0L)).cast("double") /
          col("n_sh"), 6).as("contamination"))
      .withColumn("flagged", col("contamination") >= threshold)
      .orderBy(col("doc_id"))
  }

  /** Per-(lang, source) NEAR-dup rate report — the observability twin
    * of [[corpusReport]]'s exact-dup column: how much of each segment
    * the MinHash+LSH near-dup pass would drop, the per-source signal a
    * crawl pipeline uses to spot mirror-heavy or boilerplate-heavy
    * feeds. Composes the verified pair → CC chain; `n_kept` counts
    * cluster representatives plus untouched singletons, so
    * `n_docs − n_kept` is exactly the near-dup removal. */
  def dedupRates(documents: DataFrame): DataFrame = {
    val near = graft.operators.Dedup.clustersBigStar(
      graft.operators.Dedup.minhashPairs(documents))
      .select(col("doc_id"),
        (col("cluster_id") === col("doc_id")).as("near_rep"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(near, Seq("doc_id"), "left")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("near_rep").isNotNull, 1)).as("n_clustered"),
        count(when(coalesce(col("near_rep"), lit(true)), 1)).as("n_kept"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_clustered"), col("n_kept"),
        round(lit(1) - col("n_kept").cast("double") / col("n_docs"), 6)
          .as("dup_share"))
      .orderBy(col("lang"), col("source"))
  }

  /** Token-savings accounting for the keeper rule: per source, how
    * many tokens the executed delete list
    * ([[graft.operators.Dedup.keepBest]] — keep the longest cluster
    * member) actually removes. [[dedupRates]] counts DOCUMENTS under
    * the min-id representative; this is the BUDGET view — tokens are
    * what training runs pay for — under the canonical-keeper policy.
    * Unclustered documents are always kept. Exact integer sums; one
    * left join at the document grain onto the shared pair→CC chain. */
  def dedupSavings(documents: DataFrame): DataFrame = {
    val tl = documents.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"))
    val kb = graft.operators.Dedup.keepBest(documents)
      .select(col("doc_id"), col("keep"))
    tl.join(kb, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(coalesce(col("keep"), lit(true)), col("n_tokens"))
          .otherwise(lit(0L))).as("n_tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_tokens_kept"),
        (col("n_tokens") - col("n_tokens_kept")).as("tokens_saved"),
        when(col("n_tokens") > 0,
          round((col("n_tokens") - col("n_tokens_kept")) /
            when(col("n_tokens") > 0, col("n_tokens")), 6))
          .as("savings_share"))
      .orderBy(col("source"))
  }

  /** Corpus manifest — the reproducibility primitive a versioned data
    * pipeline publishes with every release: document/token counts plus
    * ORDER-INSENSITIVE content checksums (bit_xor of each document's
    * content fingerprint — layout, partitioning, and row order cannot
    * change the value; any single-character edit flips it). Two runs of
    * a deterministic pipeline must produce identical manifests; a
    * consumer verifies a delivered corpus against the manifest without
    * trusting row order. One aggregation pass, constant-size output. */
  def corpusChecksum(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.Portable.hash32(
          TextAnalysis.normalizedText(col("text"))).as("h"),
        size(toks).cast("long").as("n_tokens"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        bit_xor(col("h")).as("content_xor"),
        // id-coupled variant detects content swapped BETWEEN ids; the
        // (id, hash) pair is RE-HASHED before the xor — an arithmetic
        // coupling like h*31+id cancels under xor (the +id touches low
        // bits that xor out pairwise), a hash mix cannot
        bit_xor(graft.functions.Portable.hash32(concat(
          col("doc_id").cast("string"), lit(":"), col("h").cast("string"))))
          .as("content_id_xor"))

  /** Multi-signal curation ensemble (the DataComp/DCLM-style filter
    * stack): per document, every model/heuristic signal the library
    * computes — rule-based quality gate, bigram-LM perplexity, hashed
    * classifier score, and the EMBEDDING-space signal (cosine to the
    * document's label centroid; `vec_id` keys the same corpus as
    * `doc_id`) — plus an ensemble keep decision with corpus-derived
    * thresholds: perplexity at or below the corpus median (fluent half)
    * and centroid cosine at or above the corpus p10 (drop the 10%
    * embedding outliers). Thresholds are exact percentiles ROUNDED to 6
    * before comparing (the [[lengthAdaptive]] contract), so both
    * engines gate on bit-identical values; docs with no bigrams have no
    * perplexity and fail the fluency gate (conservative).
    *
    * Scale: four verified operator pipelines joined on doc_id (each one
    * or two corpus-pass aggregations), two exact-percentile thresholds
    * via the distributed [[Quantiles.exactPercentiles]] scan (the float
    * domains are corpus-sized, so the one-buffer aggregate is exactly
    * the shape that would not survive 100 TB) broadcast into the
    * gate — no new shuffle shapes. */
  def signalEnsemble(documents: DataFrame,
      embeddings: DataFrame): DataFrame = {
    val q = qualityFilter(documents)
      .select(col("doc_id"), col("keep").as("q_keep"))
    // pp and cos each feed BOTH the threshold pass and the per-doc
    // join; the pins keep the bigram-LM / centroid machinery
    // single-pass (the ccnetBuckets lesson: without the cut each
    // consumer re-plans and re-executes the post-exchange tail of a
    // corpus-sized pipeline)
    val pp = TextAnalysis.perplexity(documents)
      .select(col("doc_id"), col("perplexity"))
      .pin(eager = true)
    val cls = TextAnalysis.classifierScore(documents)
      .select(col("doc_id"), col("score").as("cls_score"))
    val cos = Similarity.centroidCosines(embeddings)
      .select(col("vec_id").as("doc_id"),
        col("cosine").as("centroid_cosine"))
      .pin(eager = true)
    // ONE grouped percentile pass over a tagged union instead of two
    // independent exactPercentiles trees: the banding machinery (min/max
    // aggregate, band offsets window, cumulative window, probe
    // resolution) runs once, grouped by signal tag — per-group results
    // are bit-identical to the per-subset ungrouped calls (same
    // interpolation on the same per-group lo/hi/n). Both requested
    // fractions are computed for both groups; each branch reads its own.
    // The isNotNull gate restores the old empty-input contract: either
    // percentile input empty → no thresholds row → empty output (the
    // crossJoin of an empty one-row frame did the same).
    val thresholds = Quantiles.exactPercentilesBy(
        pp.select(lit("pp").as("sig"), col("perplexity").as("v"))
          .unionByName(cos.select(lit("cos").as("sig"),
            col("centroid_cosine").as("v"))),
        Seq("sig"), Seq(0.5, 0.1))
      .groupBy()
      .agg(
        max(when(col("sig") === "pp",
          round(element_at(col("bs"), 1), 6))).as("pp_median"),
        max(when(col("sig") === "cos",
          round(element_at(col("bs"), 2), 6))).as("cos_p10"))
      .filter(col("pp_median").isNotNull && col("cos_p10").isNotNull)
    documents.select(col("doc_id"))
      .join(q, Seq("doc_id"))
      .join(pp, Seq("doc_id"), "left")
      .join(cls, Seq("doc_id"))
      .join(cos, Seq("doc_id"), "left")
      .crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("q_keep"), col("perplexity"),
        col("cls_score"), col("centroid_cosine"),
        (col("q_keep") &&
          coalesce(col("perplexity") <= col("pp_median"), lit(false)) &&
          coalesce(col("centroid_cosine") >= col("cos_p10"), lit(false)))
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The capstone: training-corpus selection composing the verified
    * curation operators — a document enters the corpus iff it
    *   (a) passes the quality gates ([[qualityFilter]]),
    *   (b) is its exact-duplicate group's representative
    *       ([[Dedup.exact]]: min doc_id per fingerprint),
    *   (c) is its near-duplicate cluster's representative
    *       ([[Dedup.clustersBigStar]] over MinHash+LSH pairs; docs in no
    *       pair are trivially their own representative),
    *   (d) is not contaminated by the eval set ([[decontaminate]]; docs
    *       out of decontamination scope — eval docs, <3-token docs —
    *       pass trivially).
    * Per-criterion booleans are kept for auditability (the kill-rate
    * report every curation pipeline needs). */
  def curatedCorpus(documents: DataFrame): DataFrame = {
    // The distinct-shingle set is the dominant intermediate of both the
    // near-dup branch (minhash → LSH → Jaccard verify uses it twice)
    // and the decontamination branch. Materialize it once instead of
    // re-tokenizing + re-exploding + re-distinct-shuffling the corpus
    // per branch (the oracle's single shared `sh` CTE, mirrored).
    val sh = Dedup.shingles(documents).pin()
    val quality = qualityFilter(documents)
      .select(col("doc_id"), col("keep").as("q_keep"))
    val exactReps = Dedup.exact(documents)
      .select(col("rep_doc_id").as("doc_id"), lit(true).as("is_exact_rep"))
    val nearReps = Dedup.clustersBigStar(Dedup.minhashPairsOf(sh))
      .select(col("doc_id"),
        (col("cluster_id") === col("doc_id")).as("near_rep"))
    val decon = decontaminateOf(sh)
      .select(col("doc_id"), col("flagged"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(quality, Seq("doc_id"))
      .join(exactReps, Seq("doc_id"), "left")
      .join(nearReps, Seq("doc_id"), "left")
      .join(decon, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        col("q_keep"),
        coalesce(col("is_exact_rep"), lit(false)).as("is_exact_rep"),
        coalesce(col("near_rep"), lit(true)).as("near_dup_rep"),
        coalesce(!col("flagged"), lit(true)).as("decontaminated"))
      .withColumn("keep",
        col("q_keep") && col("is_exact_rep") && col("near_dup_rep") &&
          col("decontaminated"))
      .orderBy(col("doc_id"))
  }

  /** Subword budget and score-band count for [[budgetSelect]] — shared
    * with the oracle generator. */
  val selectBudget = 40000L
  val selectBands = 32

  /** The score band — bucket key of the two-level scan shared by
    * [[budgetSelect]] and [[curriculumOrder]]: a pure function of the
    * score, so equal scores can never straddle a band boundary and
    * band order IS score order. Both edge guards are defensive (the
    * sigmoid's image is well inside (0,1)). */
  private def scoreBand(bands: Int): Column =
    greatest(least(floor((lit(1.0) - col("score")) * bands),
      lit(bands - 1L)), lit(0L))

  /** Token-budget corpus selection: fill a fixed training budget
    * ([[selectBudget]] BPE subwords) with the best-scoring documents —
    * the greedy knapsack every "train on the top-quality slice" job
    * runs. Documents are ranked by the hashed-classifier score
    * (desc, doc_id tiebreak); a document is selected iff the running
    * subword total THROUGH it still fits the budget. Everything stays
    * auditable: every document keeps its score, cost and running total
    * plus the final boolean.
    *
    * Scale (100 TB): the running total in score order is the same
    * two-level scan as [[Packing.packAssign]] — never a global window.
    * Score bands replace doc_id ranges as the bucket key: band
    * b = floor((1−score)·B) is a pure function of score, so equal
    * scores can never straddle a band boundary and band order IS score
    * order. The sigmoid's image is well inside (0,1) (margin ∈
    * [−0.5, 0.5] ⇒ score ∈ [0.0067, 0.9933]), so both edge guards are
    * defensive only. Band sizes follow the score distribution (not
    * uniform like doc_id ranges), which affects task balance, not
    * correctness — a skewed corpus tunes `bands` up. */
  def budgetSelect(documents: DataFrame,
      budget: Long = selectBudget, bands: Int = selectBands): DataFrame = {
    // one tokenization pass feeds both per-doc columns; the 3-long
    // projection is checkpointed so the band-partials branch and the
    // window branch don't each re-score the corpus
    val scored = documents
      .withColumn("tk", toks)
      .select(col("doc_id"),
        TextAnalysis.clsScore(TextAnalysis.clsMargin(col("tk"))).as("score"),
        graft.functions.BpeExprs.bpeCount(col("text")).as("n_subwords"))
      .pin()
    val banded = scored.withColumn("bucket", scoreBand(bands))
    val offsets = Packing.exclusivePrefix(
      banded.groupBy(col("bucket")).agg(sum(col("n_subwords")).as("part")),
      "part")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    banded.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_subwords",
        col("offset") + sum(col("n_subwords")).over(w))
      .select(col("doc_id"), col("score"), col("n_subwords"),
        col("cum_subwords"), (col("cum_subwords") <= budget).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Stage count and shuffle salt for [[curriculumOrder]] — shared with
    * the oracle generator. */
  val curriculumStages = 10
  val curriculumSalt = "curr1"

  /** Curriculum ordering — the staged-training schedule: every document
    * gets its EXACT global rank by classifier score (desc, doc_id
    * tiebreak), the rank maps to one of [[curriculumStages]] equal
    * stages (stage 0 = best decile, trained first), and a salted
    * content-independent hash gives the deterministic within-stage
    * shuffle key (the [[Packing.shuffleOrder]] recipe — curriculum
    * between stages, i.i.d. within a stage).
    *
    * Scale (100 TB): the global rank is the [[budgetSelect]] two-level
    * score-band scan with COUNTS instead of token sums — band offsets
    * broadcast, rank = offset + within-band row_number; no global
    * window anywhere. The stage formula ((rank−1)·S) div N is exact
    * integer math on the broadcast corpus count. */
  def curriculumOrder(documents: DataFrame,
      stages: Int = curriculumStages, bands: Int = selectBands): DataFrame = {
    val scored = documents
      .withColumn("tk", toks)
      .select(col("doc_id"),
        TextAnalysis.clsScore(TextAnalysis.clsMargin(col("tk"))).as("score"))
      .pin()
    val banded = scored.withColumn("bucket", scoreBand(bands))
    val offsets = Packing.exclusivePrefix(
      banded.groupBy(col("bucket")).agg(count(lit(1)).as("part")), "part")
    val n = scored.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id"))
    banded.join(broadcast(offsets), Seq("bucket"))
      .crossJoin(broadcast(n))
      .withColumn("rank", col("offset") + row_number().over(w))
      .select(col("doc_id"), col("score"), col("rank"),
        expr(s"((rank - 1) * $stages) div n_docs").as("stage"),
        Portable.hash32(concat(lit(curriculumSalt),
          col("doc_id").cast("string"))).as("stage_key"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-free train/val/test split: every near-duplicate CLUSTER
    * lands wholly in one split. The plain per-document hash split
    * ([[Packing.splitAssign]]) lets two near-copies straddle train and
    * test — the classic eval-leak that inflates benchmarks; here the
    * split hash is taken on the cluster representative (group_id =
    * LSH-cluster min id; singleton docs are their own group), so
    * near-copies can't separate BY CONSTRUCTION. Same salt and 90/5/5
    * thresholds as the per-doc split: singletons get identical
    * assignments, only clustered docs move (onto their rep's split).
    *
    * Scale: the cluster build is the verified MinHash+LSH chain +
    * size-adaptive CC; after it, one doc_id equi-join attaches the
    * O(docs-in-pairs) cluster table and the hash/split math is pure
    * map-side. */
  def splitLeakFree(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(Dedup.clustersBigStar(Dedup.minhashPairs(documents))
          .select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split_bucket", Packing.splitBucketOf(col("group_id")))
      .withColumn("split", Packing.splitOf(col("split_bucket")))
      .select("doc_id", "lang", "source", "group_id", "split_bucket", "split")
      .orderBy(col("doc_id"))

  /** Salt for [[sampleWeighted]] — shared with the oracle generator. */
  val weightedSalt = "graft-weighted:"

  /** Score-proportional deterministic sampling — soft quality
    * filtering: each document survives with probability equal to its
    * classifier score (a hard threshold keeps a 0.51 doc and kills a
    * 0.49 doc; sampling ∝ score keeps the corpus' quality GRADIENT
    * while still downweighting the tail — the soft-filter recipe
    * data-mix papers use). Deterministic: accept iff the salted
    * content-independent hash, as a uniform draw on [0, 2³²), falls
    * under score·2³² — reproducible across runs, clusters and
    * partition layouts, no RNG state. Pure map-side, stream-safe; all
    * rows keep score + draw + verdict for audit. */
  def sampleWeighted(documents: DataFrame): DataFrame =
    documents
      .withColumn("tk", toks)
      .select(col("doc_id"),
        TextAnalysis.clsScore(TextAnalysis.clsMargin(col("tk"))).as("score"),
        Portable.hash32(concat(lit(weightedSalt),
          col("doc_id").cast("string"))).as("accept_key"))
      .withColumn("accepted",
        col("accept_key").cast("double") < col("score") * 4294967296.0)
      .orderBy(col("doc_id"))

  /** Deterministic "next crawl" snapshot for [[upsertPlan]] — the
    * in-query fixture (the [[withContact]]/mm_decode precedent; the
    * corpus has no second snapshot to diff against): every doc_id ≡ 0
    * (mod 10) is re-crawled with changed content, ≡ 5 disappeared
    * upstream, ≡ 3 additionally spawned a NEW page at doc_id + 10⁶.
    * Production swaps this for the actual incoming batch. */
  private def incomingSnapshot(documents: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(10L))
    documents.filter(m =!= 0 && m =!= 5)
      .unionByName(documents.filter(m === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]"))))
      .unionByName(documents.filter(m === 3)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  /** CDC/MERGE action plan: diff the current corpus against an
    * incoming snapshot by content hash and emit per-key actions —
    * insert (new key), delete (gone upstream), update (key present,
    * content changed), unchanged. This is the decision layer of every
    * incremental corpus refresh (the streaming ingest sinks apply
    * actions; this computes them set-wise for a batch snapshot).
    *
    * Scale (100 TB): ONE full-outer equi-join on the key carrying only
    * (key, 32-hex hash) — content never joins; the hash projections
    * partial-aggregate nothing and shuffle two narrow columns. */
  def upsertPlan(documents: DataFrame): DataFrame = {
    // presence markers, not hash nullability: a NULL-text row would
    // null its md5 and masquerade as an absent side
    val cur = documents.select(col("doc_id"),
      md5(col("text")).as("cur_hash"), lit(true).as("in_cur"))
    val inc = incomingSnapshot(documents).select(col("doc_id"),
      md5(col("text")).as("inc_hash"), lit(true).as("in_inc"))
    cur.join(inc, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_cur").isNull, "insert")
          .when(col("in_inc").isNull, "delete")
          .when(col("cur_hash") <=> col("inc_hash"), "unchanged")
          .otherwise("update").as("action"))
      .orderBy(col("doc_id"))
  }

  // ---- PII detection / redaction ----
  // RE2-safe patterns (no backrefs/lookaround) so Java regex (Spark)
  // and RE2 (DuckDB) match identically.
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"
  val ipPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The synthetic corpus contains no digits, so the fixture for the PII
    * operator is built inside the query: every third document gets a
    * deterministic contact-info suffix (both engines state the same
    * construction — the mm_decode fake-codec precedent). Production
    * swaps this for the raw text column. */
  private def withContact: Column =
    when(pmod(col("doc_id"), lit(3L)) === 0,
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com phone 555-"),
        lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
        lit(" ip 10."), pmod(col("doc_id"), lit(200L)).cast("string"),
        lit(".0.1")))
      .otherwise(col("text"))

  /** PII scan + redaction: per-document match counts for email / phone /
    * IP patterns and the text with each match class replaced by a
    * placeholder (the scrubbing pass every training corpus needs before
    * release). Pure map-side regex — codegen'd, embarrassingly
    * parallel, no shuffle. Redaction order (email, phone, ip) is part
    * of the contract: placeholders contain no digits, so later passes
    * can't re-match inside earlier replacements. */
  def piiScan(documents: DataFrame): DataFrame =
    documents
      .withColumn("txt", withContact)
      .select(col("doc_id"),
        size(regexp_extract_all(col("txt"), lit(emailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("txt"), lit(phonePattern), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("txt"), lit(ipPattern), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("txt"), emailPattern, "<EMAIL>"),
            phonePattern, "<PHONE>"),
          ipPattern, "<IP>").as("redacted"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
      // stream-safe (stateless map-side): registration adds the ORDER BY
      .select("doc_id", "n_emails", "n_phones", "n_ips", "has_pii", "redacted")

  // ---- deterministic sampling ----
  val sampleSalt = "graft-sample:"

  /** Salted content-independent sampling hash in [0, 100). */
  def sampleBucket(docId: Column): Column =
    pmod(Portable.hash32(concat(lit(sampleSalt), docId.cast("string"))), lit(100L))

  /** Bernoulli-by-hash sampling: keep ~pct% of documents,
    * deterministically (same docs every run, any cluster, any partition
    * layout — the reproducibility property training pipelines need). */
  def sampleBernoulli(documents: DataFrame, pct: Int = 20): DataFrame =
    documents
      .withColumn("sample_bucket", sampleBucket(col("doc_id")))
      .filter(col("sample_bucket") < pct)
      .select("doc_id", "lang", "source", "sample_bucket")
      .orderBy("doc_id")

  /** Systematic-sampling interval and salt — shared with the oracle. */
  val sysK = 10
  val sysSalt = "graft-sys:"

  /** Systematic sampling: order the corpus by a salted portable hash
    * (a reproducible random permutation) and take every [[sysK]]-th
    * document — the design that GUARANTEES the ⌈n/k⌉ sample size and
    * even coverage of the hash order, where Bernoulli sampling only
    * hits both in expectation. The global rank is the
    * [[Relational.bandedRank]] two-level band scan (no data-sized
    * sort); the oracle states the naive global window and hash
    * equality proves the rewrite. */
  def sampleSystematic(documents: DataFrame,
      k: Int = sysK): DataFrame = {
    val base = documents.select(col("doc_id"), col("lang"),
      col("source"),
      graft.functions.Portable.hash32(
        concat(lit(sysSalt), col("doc_id").cast("string"))).as("h"))
    Relational.bandedRank(base, "h", "doc_id", "rank", desc = false)
      .filter((col("rank") - 1) % k === 0)
      .select(col("doc_id"), col("lang"), col("source"), col("rank"))
      .orderBy(col("rank"))
  }

  // ---- corpus mixture (domain reweighting) ----
  val mixSalt = "graft-mix:"

  /** Per-source mixture weights in percent. 100 = keep once; > 100
    * upsamples (repeat factor); < 100 downsamples; sources not listed
    * get [[mixDefaultPct]]. Shared with the oracle generator. */
  val mixWeights: Seq[(String, Int)] =
    Seq("src0" -> 150, "src1" -> 100, "src2" -> 60, "src3" -> 30, "src4" -> 10)
  val mixDefaultPct = 50

  /** Corpus mixture sampling — the domain-reweighting step of a
    * training-data pipeline: each document appears `weight div 100`
    * times plus one more with probability `weight mod 100` (decided by a
    * salted deterministic hash, so the mixture is reproducible on any
    * cluster/partitioning). Upsampled copies carry `copy_id` so
    * downstream shuffling spreads them apart. Pure map-side explode —
    * no shuffle, stream-safe. */
  def sampleMixture(documents: DataFrame,
      weights: Seq[(String, Int)] = mixWeights,
      defaultPct: Int = mixDefaultPct): DataFrame = {
    // repeat factor and fractional part resolved per-branch as literals
    // (no runtime float division — exact for any weight magnitude)
    def perSource(f: Int => Long): Column =
      weights.foldRight(lit(f(defaultPct)): Column) { case ((s, w), e) =>
        when(col("source") === s, lit(f(w))).otherwise(e)
      }
    documents
      .withColumn("mix_bucket",
        pmod(Portable.hash32(concat(lit(mixSalt), col("doc_id").cast("string"))),
          lit(100L)))
      .withColumn("n_copies",
        perSource(_ / 100L) +
          when(col("mix_bucket") < perSource(_ % 100L), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_copies"))))
      .select("doc_id", "lang", "source", "mix_bucket", "n_copies", "copy_id")
  }

  /** Exact-k-per-stratum sampling (stratified by lang), ordered by the
    * same deterministic hash (doc_id tiebreak) through the bounded-heap
    * [[TopK]] operator — no per-stratum sort. */
  def sampleStratified(documents: DataFrame, k: Int = 25): DataFrame =
    TopK.perKey(
        documents.withColumn("sample_key",
          Portable.hash32(concat(lit(sampleSalt), col("doc_id").cast("string")))),
        Seq("lang"), Seq("sample_key" -> false, "doc_id" -> false), k)
      .select(col("lang"), col("doc_id"), col("sample_key"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("lang"), col("rn"))

  // ---- DSIR importance weighting (domain-targeted selection) ----

  /** Hashed-feature bucket count for [[dsirScores]] — shared with the
    * oracle generator. Small enough that every bucket is populated at
    * test scale; at production scale this is the DSIR paper's 10k-ish
    * hashed n-gram space (a constant — the weight table NEVER grows
    * with the corpus). */
  val dsirBuckets = 64

  /** Target-domain predicate for [[dsirScores]]: English documents
    * stand in for the high-quality target corpus. */
  val dsirTargetLang = "en"

  /** DSIR importance scores (Data Selection via Importance Resampling,
    * Xie et al. 2023, arXiv:2302.03169): per document, the mean hashed-
    * unigram log-likelihood ratio between a target-domain distribution
    * (lang = [[dsirTargetLang]]) and the raw-corpus distribution —
    * documents that "look like" the target score high and a sampler
    * can resample the raw corpus toward the target domain.
    *
    * Mechanics: tokens hash into [[dsirBuckets]] buckets
    * ([[Portable.hash32]] mod B — content-only, reproducible anywhere);
    * bucket unigram models are Laplace-smoothed (+1 / +B); the per-
    * bucket log-ratio table is METADATA-sized (B rows) and broadcast
    * into one map-side join against the exploded tokens; the per-doc
    * mean is a single hash aggregate. A doc's token rows never leave
    * their scan partition before the doc-keyed aggregate, so the
    * float log-sum accumulates in token order on both engines (the
    * [[TextAnalysis.perplexity]] determinism argument).
    *
    * Scale: two corpus passes (bucket counts, then scoring) and one
    * broadcast of B rows — no data-sized shuffle besides the doc-keyed
    * aggregate itself. */
  def dsirScores(documents: DataFrame): DataFrame =
    dsirScoreAgainst(documents, dsirWeights(documents))

  /** The DSIR per-bucket log-ratio weight table (bkt, lw) — B metadata
    * rows, the "trained importance model". Built once per reference
    * corpus; scoring passes (batch or streaming) consume it. */
  def dsirWeights(documents: DataFrame): DataFrame = {
    val tok = dsirTokens(documents)
    val rc = tok.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
    val tc = tok.filter(col("lang") === dsirTargetLang)
      .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val tots = tok.agg(
      count(lit(1)).as("rtot"),
      count(when(col("lang") === dsirTargetLang, 1)).as("ttot"))
    val b = lit(dsirBuckets.toDouble)
    rc.join(tc, Seq("bkt"), "left").crossJoin(broadcast(tots))
      .select(col("bkt"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
            (col("ttot").cast("double") + b)) -
          log((col("cr") + lit(1)).cast("double") /
            (col("rtot").cast("double") + b))).as("lw"))
  }

  private def dsirTokens(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"), explode(toks).as("t"))
      .select(col("doc_id"), col("lang"),
        pmod(Portable.hash32(col("t")), lit(dsirBuckets.toLong)).as("bkt"))

  /** Score `docs` against a prebuilt weight table: per doc, the mean
    * log-ratio of its token buckets. Scoring needs only (doc_id, text)
    * — the lang column is a training-side (weights) concern. Buckets
    * absent from the table (possible only when `docs` extends past the
    * reference corpus's vocabulary) contribute nothing — with B
    * buckets of hashed unigrams, every bucket is populated by any
    * realistic reference. */
  def dsirScoreAgainst(docs: DataFrame, weights: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(toks).as("t"))
      .select(col("doc_id"),
        pmod(Portable.hash32(col("t")), lit(dsirBuckets.toLong)).as("bkt"))
      .join(broadcast(weights), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lw")) / count(lit(1)), 6).as("dsir_logw"))
      .orderBy(col("doc_id"))

  /** Classifier-vs-rules calibration curve: bucket every document by
    * its hashed-classifier score (fixed-width tenths — no global rank,
    * so the binning is one map-side expression at any scale) and
    * report the rule-based [[qualityFilter]] keep rate per bucket —
    * the agreement curve that says whether the learned scorer and the
    * Gopher-style rules rank quality the same way (a flat curve means
    * the classifier adds no signal; an inverted one means a bug). All
    * ratios are exact integer quotients. */
  def classifierCalibration(documents: DataFrame): DataFrame = {
    val scored = graft.operators.TextAnalysis.classifierScore(documents)
      .select(col("doc_id"),
        least(floor(col("score") * 10), lit(9L)).cast("long").as("bucket"))
    val kept = qualityFilter(documents).select(col("doc_id"), col("keep"))
    scored.join(kept, Seq("doc_id"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("n_keep"))
      .select(col("bucket"), col("n_docs"), col("n_keep"),
        round(col("n_keep").cast("double") / col("n_docs"), 6)
          .as("keep_rate"))
      .orderBy(col("bucket"))
  }

  /** Decile lift/gains table for the hashed quality classifier scored
    * against the rule-based keep label — the standard model-eval
    * artifact (does ranking by classifier score concentrate the
    * keepers at the top, and by how much over random). Score deciles
    * come from [[Quantiles.exactPercentiles]]' banded distinct-value
    * scan — never a global sort — and ride a one-row broadcast into a
    * single bucket assignment; decile 9 is the top tenth. Cumulative
    * capture and lift are windows over the ten aggregate rows, not the
    * data; counts are exact integers and every ratio is double math in
    * one pinned order. */
  def liftTable(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.operators.TextAnalysis.classifierScore(documents)
      .select(col("doc_id"), col("score"))
    val kept = qualityFilter(documents).select(col("doc_id"), col("keep"))
    val ps = (1 to 9).map(_ / 10.0)
    val bs = Quantiles.exactPercentiles(
      scored.select(col("score").as("v")), ps)
    val bucketed = scored.join(kept, Seq("doc_id"))
      .crossJoin(broadcast(bs))
      .select(col("keep"),
        ps.indices.map(i =>
          when(col("score") >= element_at(col("bs"), i + 1), 1)
            .otherwise(0)).reduce(_ + _).cast("long").as("decile"))
    val counts = bucketed.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("n_pos"))
    val tot = counts.agg(sum(col("n_docs")).as("tot_docs"),
      sum(col("n_pos")).as("tot_pos"))
    val wd = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(tot))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_docs"), 6)
          .as("pos_rate"),
        sum(col("n_docs")).over(wd).as("cum_docs"),
        sum(col("n_pos")).over(wd).as("cum_pos"),
        col("tot_docs"), col("tot_pos"))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        col("pos_rate"),
        when(col("tot_pos") > 0,
          round(col("cum_pos").cast("double") / col("tot_pos"), 6))
          .as("cum_capture"),
        when(col("tot_pos") > 0,
          round((col("cum_pos").cast("double") / col("tot_pos")) /
            (col("cum_docs").cast("double") / col("tot_docs")), 6))
          .as("lift"))
      .orderBy(col("decile").desc)
  }

  /** Bucket width / cap for [[lengthPsi]] — shared with the oracle
    * generator. */
  val PsiBucketChars = 64
  val PsiMaxBucket = 7L

  /** Population Stability Index of the document-length distribution
    * between the first and second half of the corpus (by doc_id) —
    * the drift monitor a continuously-ingesting pipeline runs on every
    * snapshot pair (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted). Buckets are fixed [[PsiBucketChars]]-char bins capped
    * at [[PsiMaxBucket]], so the bucket scheme never depends on the
    * data; shares are Laplace-smoothed (+0.5 per bucket) so an empty
    * side stays finite; each (p−q)·ln(p/q) term rounds to the 1e-10
    * grid and decimal-sums into the total — exact, order-independent,
    * output bounded by the bucket count at any corpus size. */
  def lengthPsi(documents: DataFrame): DataFrame = {
    val md = documents.agg(max(col("doc_id")).as("max_doc"))
    val b = documents.crossJoin(broadcast(md))
      .select(least(floor(col("n_chars") / PsiBucketChars),
          lit(PsiMaxBucket)).cast("long").as("bucket"),
        (col("doc_id") * 2 <= col("max_doc")).as("is_ref"))
    val counts = b.groupBy(col("bucket")).agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val tots = counts.agg(sum(col("n_ref")).as("tot_ref"),
      sum(col("n_cur")).as("tot_cur"), count(lit(1)).as("nb"))
    val j = counts.crossJoin(broadcast(tots))
    val p = (col("n_ref") + lit(0.5)) /
      (col("tot_ref") + lit(0.5) * col("nb"))
    val q = (col("n_cur") + lit(0.5)) /
      (col("tot_cur") + lit(0.5) * col("nb"))
    val term = (p - q) * log(p / q)
    val withTerm = j.select(col("bucket"), col("n_ref"), col("n_cur"),
      round(p, 6).as("p_ref"), round(q, 6).as("p_cur"),
      round(term, 6).as("psi_term"),
      round(term, 10).cast("decimal(18,10)").as("t10"))
    val total = withTerm.agg(
      round(sum(col("t10")).cast("double"), 6).as("psi_total"))
    withTerm.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("psi_term"), col("psi_total"))
      .orderBy(col("bucket"))
  }

  /** Document-length Gini — inequality of the token distribution
    * across documents (0 = uniform lengths, →1 = a few giants carry
    * the corpus), the corpus-health scalar next to the per-source
    * report. Exact global ranks come from the banded two-level scan
    * (the [[graft.operators.Relational.giniRevenue]] pattern — value
    * bands from a broadcast min/max, per-band row_number + broadcast
    * exclusive offsets, no global window), and every sum is INTEGER
    * (lengths × ranks), so the single output row is bit-stable under
    * any partitioning. */
  def lengthGini(documents: DataFrame, nBands: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val len = documents.select(col("doc_id"),
      size(toks).cast("long").as("nt"))
    val mm = len.agg(min(col("nt")).as("lo"), max(col("nt")).as("hi"))
    val banded = len.crossJoin(broadcast(mm))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("nt") - col("lo")) / (col("hi") - col("lo")) * nBands),
          lit(nBands - 1L)).cast("long")))
    val wo = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("part"))
      .withColumn("offset", coalesce(sum(col("part")).over(wo), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wb = Window.partitionBy(col("bucket"))
      .orderBy(col("nt"), col("doc_id"))
    val ranked = banded.join(broadcast(offsets), Seq("bucket"))
      .select(col("nt"),
        (col("offset") + row_number().over(wb)).cast("long").as("rank"))
    ranked
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nt") * col("rank")).as("s"))
      .select(col("n_docs"), col("total_tokens"),
        round(lit(2.0) * col("s") /
          (col("n_docs") * col("total_tokens")) -
          (col("n_docs") + 1).cast("double") / col("n_docs"), 6)
          .as("length_gini"))
  }

  /** DSIR selection budget — docs kept by [[dsirSelect]]. */
  val dsirSelectN = 200

  /** DSIR-ranked selection: the top-[[dsirSelectN]] documents by mean
    * importance log-ratio — the "resample toward the target domain"
    * step the DSIR scores exist for. Global top-k plans as
    * TakeOrderedAndProject (per-partition bounded heaps + one final
    * merge — never a full sort), and the rank column is a window over
    * the ALREADY-SELECTED k rows (metadata-sized, the bounded
    * exception). Deterministic ties by doc_id. */
  def dsirSelect(documents: DataFrame, n: Int = dsirSelectN): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    dsirScores(documents)
      .orderBy(col("dsir_logw").desc, col("doc_id"))
      .limit(n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("dsir_logw").desc, col("doc_id"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** Streaming DSIR scoring: the weight table resolved to a LITERAL
    * map (B entries — metadata-sized, the legitimate bounded collect),
    * so scoring is a stateless per-row projection — no join, no
    * aggregation, no watermark; it runs identically on a stream or a
    * batch frame (the production shape: ingest-time scoring against a
    * periodically-rebuilt model). The per-row fold sums the token
    * weights in array order — the same order the batch aggregate
    * accumulates — so the streaming twin is bit-identical to
    * [[dsirScoreAgainst]] (spec-locked). */
  def dsirScoreWithModel(docs: DataFrame,
      model: Map[Long, Double]): DataFrame = {
    val m = typedlit(model)
    val bkts = transform(toks,
      t => pmod(Portable.hash32(t), lit(dsirBuckets.toLong)))
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("dsir_logw",
        round(
          aggregate(bkts, lit(0.0),
            (acc, b) => acc + coalesce(element_at(m, b), lit(0.0))) /
            col("n_tokens"), 6))
      .select(col("doc_id"), col("n_tokens"), col("dsir_logw"))
  }

  /** ROC AUC of the hashed classifier score against the rule-based
    * keep label — the threshold-free ranking-quality companion to
    * [[kappa]] (agreement at one threshold) and the lift table
    * (deciles): AUC is exactly P(score of a random kept doc > score
    * of a random dropped doc), computed by the Mann–Whitney rank-sum
    * identity. Everything is EXACT integer arithmetic until one final
    * division: per-distinct-score (n_pos, n_neg) cells, negatives-
    * strictly-below via the banded two-level prefix scan (band
    * offsets over the bounded `__bucket` grid + in-band partitioned
    * running sums — no global data-sized window; the oracle states
    * the naive global-window form and hash equality proves the
    * rewrite), ties contributing the exact half via the doubled
    * numerator Σ n1·(2·below + n0_at) / (2·n1·n0).
    *
    * Scale: two label passes joined on doc_id, one hash aggregate to
    * the distinct-score grain, banded prefix, one scalar aggregate —
    * every stage partial-aggregates map-side. */
  def auc(documents: DataFrame): DataFrame = {
    val scored = graft.operators.TextAnalysis.classifierScore(documents)
      .select(col("doc_id"), col("score"))
      .join(qualityFilter(documents).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
    val byScore = scored.groupBy(col("score"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n0"))
      .pin()
    val nBands = 128
    val mm = byScore.agg(min(col("score")).as("lo"),
      max(col("score")).as("hi"))
    val banded = byScore.crossJoin(broadcast(mm))
      .withColumn("__bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("score") - col("lo")) / (col("hi") - col("lo"))
            * nBands), lit(nBands - 1L)).cast("long")))
      .drop("lo", "hi")
    val wo = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy(col("__bucket"))
      .agg(sum(col("n0")).as("part"))
      .withColumn("__offset", coalesce(sum(col("part")).over(wo), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val wb = Window.partitionBy(col("__bucket")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = banded.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("below",
        col("__offset") + coalesce(sum(col("n0")).over(wb), lit(0L)))
    val t = cum.agg(
      sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
      count(lit(1)).as("n_scores"),
      sum(col("n1").cast("decimal(19,0)") *
        (lit(2L) * col("below") + col("n0")).cast("decimal(19,0)"))
        .cast("double").as("numer2"))
    val den = lit(2.0) * col("n_pos").cast("double") *
      col("n_neg").cast("double")
    val aucRaw = col("numer2") / when(den =!= 0.0, den)
    t.select(col("n_pos"), col("n_neg"), col("n_scores"),
      round(aucRaw, 6).as("auc"),
      round(lit(2.0) * aucRaw - 1.0, 6).as("gini_coef"))
  }

  /** Expected calibration error + Brier score of the hashed
    * classifier probability against the rule-based keep label — the
    * one-row summary of what [[classifierCalibration]]'s bin table
    * shows: ECE = Σ_b (n_b/n)·|keep_rate_b − mean_score_b| over the
    * same fixed 10-bin grid, max_gap its worst bin, and Brier the
    * binned-free mean squared probability error. Bin cells are exact
    * integers; score sums ride the 1e-6 decimal grid; per-bin gap
    * terms are pinned doubles crossed to DECIMAL(38,18) before the
    * order-independent sum over the bounded grid; Brier's squared
    * errors accumulate the same way over the corpus.
    *
    * Scale: one doc-keyed join of the two label passes, one hash
    * aggregate to the 10-bin grid plus one scalar aggregate. */
  def ece(documents: DataFrame): DataFrame = {
    val scored = graft.operators.TextAnalysis.classifierScore(documents)
      .select(col("doc_id"), col("score"))
      .join(qualityFilter(documents).select(col("doc_id"), col("keep")),
        Seq("doc_id"))
      .select(col("score"), col("keep"),
        least(floor(col("score") * 10), lit(9L)).cast("long").as("bucket"),
        (col("score") - when(col("keep"), 1.0).otherwise(0.0)).as("err"))
      .pin()
    val bins = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"),
        count(when(col("keep"), 1)).as("n_keep"),
        sum(col("score").cast("decimal(18,6)")).cast("double").as("s_score"))
    val tot = scored.agg(count(lit(1)).as("n"),
      sum((col("err") * col("err")).cast("decimal(38,18)"))
        .cast("double").as("sq_err"))
    val nbd = col("n_b").cast("double")
    val gap = abs(col("n_keep").cast("double") / nbd -
      col("s_score") / nbd)
    bins.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        sum(((nbd / col("n").cast("double")) * gap)
          .cast("decimal(38,18)")).cast("double").as("ece_raw"),
        max(gap).as("max_gap_raw"),
        max(col("sq_err") / col("n").cast("double")).as("brier_raw"))
      .select(col("n_docs"), col("n_bins"),
        round(col("ece_raw"), 6).as("ece"),
        round(col("max_gap_raw"), 6).as("max_gap"),
        round(col("brier_raw"), 6).as("brier"))
  }

  /** Score threshold at which the hashed classifier votes "keep" —
    * shared with the kappa oracle. */
  val kappaClsThreshold = 0.5

  /** Cohen's kappa between the hashed-classifier keep vote
    * (score ≥ [[kappaClsThreshold]]) and the rule-based
    * [[qualityFilter]] keep label — chance-corrected inter-rater
    * agreement, the one number that says whether the learned scorer
    * and the Gopher-style rules are interchangeable raters (κ≈0 means
    * the classifier agrees no better than chance even if raw accuracy
    * looks high under class imbalance). Output is the full 2×2
    * confusion plus p_o, p_e, kappa. Exact integer cells; p_e's
    * products stay in integer space until one double division; the
    * 1−p_e divisor is NULL-guarded (ANSI + CSE safe). Scale: one
    * doc-keyed join of two map-side label passes and a single scalar
    * aggregate — no data-sized shuffle beyond the join. */
  def kappa(documents: DataFrame): DataFrame = {
    val cls = graft.operators.TextAnalysis.classifierScore(documents)
      .select(col("doc_id"),
        (col("score") >= kappaClsThreshold).as("cls_keep"))
    val rules = qualityFilter(documents).select(col("doc_id"), col("keep"))
    val cells = cls.join(rules, Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("cls_keep") && col("keep"), 1)).as("n_both_keep"),
        count(when(col("cls_keep") && !col("keep"), 1)).as("n_cls_only"),
        count(when(!col("cls_keep") && col("keep"), 1)).as("n_rule_only"),
        count(when(!col("cls_keep") && !col("keep"), 1)).as("n_both_drop"))
    val po = (col("n_both_keep") + col("n_both_drop")).cast("double") /
      col("n_docs")
    val pe = ((col("n_both_keep") + col("n_cls_only")) *
        (col("n_both_keep") + col("n_rule_only")) +
      (col("n_rule_only") + col("n_both_drop")) *
        (col("n_cls_only") + col("n_both_drop"))).cast("double") /
      (col("n_docs") * col("n_docs"))
    cells.select(col("n_docs"), col("n_both_keep"), col("n_cls_only"),
      col("n_rule_only"), col("n_both_drop"),
      round(po, 6).as("p_o"), round(pe, 6).as("p_e"),
      round((po - pe) /
        when(lit(1.0) - pe =!= 0.0, lit(1.0) - pe), 6).as("kappa"))
  }

  /** Chinchilla planning constants — shared with the oracle generator.
    * C ≈ [[ChinchillaFlopsPerTokenParam]]·N·D (the 6ND rule) and
    * D_opt = [[ChinchillaTokensPerParam]]·N_opt (Hoffmann et al. 2022's
    * ~20 tokens/param compute-optimal ratio), so
    * N_opt = √(C / 120). The budget grid spans seven decades. */
  val ChinchillaTokensPerParam = 20.0
  val ChinchillaFlopsPerTokenParam = 6.0
  val ChinchillaBudgets: Seq[Double] =
    Seq(1e18, 1e19, 1e20, 1e21, 1e22, 1e23, 1e24)

  /** Compute-optimal data-budget table: for each FLOP budget in
    * [[ChinchillaBudgets]], the Chinchilla-optimal parameter and token
    * counts, how many EPOCHS of THIS corpus that token budget implies,
    * and whether it clears the [[EpochRepeatCap]] repeat ceiling — the
    * one-page answer to "which model scales can this corpus feed
    * compute-optimally" that a data-acquisition plan starts from (the
    * [[tokenEpochs]] sibling: that allocates a fixed budget across
    * sources; this sweeps budgets against the whole corpus).
    *
    * Determinism: one exact integer token-count aggregate; each row is
    * closed-form double math on a literal budget (the Scala-double
    * round-trip convention), giant counts rounded at integer precision
    * (round(x, 0) — exact on both engines at any magnitude, unlike
    * fractional rounding), ratios on the 1e-6 grid. Scale: one corpus
    * scan; the table is 7 rows. */
  def chinchillaPlan(documents: DataFrame): DataFrame = {
    val tot = documents.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("corpus_tokens"))
    val grid = ChinchillaBudgets.map(c => (c,
      math.sqrt(c / (ChinchillaFlopsPerTokenParam * ChinchillaTokensPerParam))))
    val rows = grid.map { case (c, nOpt) =>
      tot.select(lit(c).as("flops"),
        round(lit(nOpt), 0).as("n_params_opt"),
        round(lit(ChinchillaTokensPerParam * nOpt), 0).as("d_tokens_opt"),
        col("corpus_tokens"),
        round(lit(ChinchillaTokensPerParam * nOpt) /
          col("corpus_tokens").cast("double"), 6).as("epochs_needed"))
    }
    rows.reduce(_ unionByName _)
      .select(col("flops"), col("n_params_opt"), col("d_tokens_opt"),
        col("corpus_tokens"), col("epochs_needed"),
        (col("epochs_needed") <= EpochRepeatCap).as("feasible"))
      .orderBy(col("flops"))
  }
}
