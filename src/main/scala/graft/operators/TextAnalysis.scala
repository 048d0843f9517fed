package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Materialize.PinOps

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars): language-ID
  * (marker-token heuristic), quality scoring, token counting (whitespace
  * + BPE-ish regex), and document fingerprinting.
  *
  * Everything is a pure codegen'd column expression (no UDFs) with an
  * exact DuckDB twin in [[graft.Oracles]] — the marker lists and formulas
  * live here once and the oracle SQL is generated from them.
  *
  * Scale note (100 TB): all per-document metrics are embarrassingly
  * parallel map-side work over the parquet scan — no shuffle at all.
  * The only shuffles in this module are the token-histogram groupBy
  * (high-cardinality key, partial aggregation applies) and final
  * presentation sorts.
  */
object TextAnalysis {

  /** Language marker tokens. Shared with the oracle generator. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  /** English stopwords used by the quality score. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in", "or")

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def toks: Column = Portable.tokens(col("text"))

  /** Per-document BPE-style subword counts — the tokenizer-aware budget
    * next to the whitespace baseline: greedy longest-match over the
    * fixed literal merge table ([[graft.functions.BpeCountImpl.vocab]]),
    * one native codegen'd scan per document
    * ([[graft.functions.BpeExprs.bpeCount]]). The oracle states the
    * identical greedy match as a character-indexed fold per token,
    * summed — whitespace never matches, so the whole-text scan and the
    * per-token sum agree by construction. Pure map-side; no shuffle. */
  def bpeSubwords(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.BpeExprs.bpeCount(col("text")).as("n_subwords"))
      .withColumn("subwords_per_token",
        round(col("n_subwords").cast("double") / col("n_tokens"), 6))
      .orderBy(col("doc_id"))

  /** BPE merge INDUCTION, round 1 — the training half of the
    * tokenizer-aware story ([[bpeSubwords]] consumes a fixed merge
    * table; this op is how such tables are learned): the top-`k` most
    * frequent adjacent character pairs across every token occurrence in
    * the corpus, which is exactly the pair-frequency ranking BPE
    * training merges from (Sennrich et al. 2016, algorithm 1's first
    * iteration). Pairs never span tokens (BPE's word-boundary rule).
    * One explode + one hash aggregation on a ≤|alphabet|² key space —
    * map-side combine makes the shuffle metadata-sized at any corpus.
    * The empty/1-char-token guard mirrors the oracle's empty range
    * (sequence(1, 0) is DESCENDING in Spark — the spanRows lesson). */
  def bpeMerges(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(toks).as("w"))
      .select(explode(expr(
        "transform(filter(sequence(1, greatest(length(w) - 1, 1)), " +
          "i -> i <= length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(k)

  private def countIn(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isin(words.map(lit(_)): _*)))

  /** Normalized text: lowercase, whitespace collapsed — the dedup key. */
  def normalizedText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Per-document metrics. Input: documents table. */
  def stats(documents: DataFrame): DataFrame = {
    val langCounts = markers.map { case (l, ws) => l -> countIn(toks, ws) }
    val Seq(cEn, cEs, cDe, cFr) = langCounts.map(_._2)
    documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).cast("long"))
      .withColumn("avg_token_len",
        round(length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
          col("n_tokens"), 4))
      .withColumn("stopword_ratio",
        round(countIn(toks, stopwords).cast("double") / col("n_tokens"), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col("text"), "[a-z0-9\\s]", ""))
          .cast("double") / col("n_chars"), 4))
      .withColumn("quality_score",
        round(least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
          col("stopword_ratio") * 0.3 +
          (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.2, 6))
      .withColumn("fingerprint", md5(normalizedText(col("text"))))
      .withColumn("fingerprint64", Portable.hash32(normalizedText(col("text"))))
      // polynomial rolling hash over token hashes: order-sensitive, so
      // permuted documents get distinct prints (unlike a bag-of-tokens
      // hash); oracle twin uses list_reduce with the same (31, p) params
      .withColumn("fingerprint_roll",
        aggregate(transform(toks, t => Portable.hash32(t)), lit(0L),
          (acc, h) => pmod(acc * 31 + h, lit(Portable.P31))))
      .withColumn("lang_pred",
        when(cEn >= cEs && cEn >= cDe && cEn >= cFr && cEn > 0, "en")
          .when(cEs >= cDe && cEs >= cFr && cEs > 0, "es")
          .when(cDe >= cFr && cDe > 0, "de")
          .when(cFr > 0, "fr")
          .otherwise("unk"))
      .select("doc_id", "lang", "lang_pred", "n_tokens", "n_bpe_tokens",
        "avg_token_len", "stopword_ratio", "punct_ratio", "quality_score",
        "fingerprint", "fingerprint64", "fingerprint_roll")
  }

  /** Language-ID confusion counts: declared lang vs heuristic prediction. */
  def langConfusion(documents: DataFrame): DataFrame =
    stats(documents)
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))

  /** Corpus token histogram, top 20 (explode → groupBy → top-k). */
  /** Tokenizer vocab-coverage curve: the share of ALL corpus token
    * occurrences covered by the top-k most frequent terms, at several
    * k — the measurement that sizes a tokenizer vocabulary (where the
    * curve flattens, added vocab buys nothing). Integer counts end to
    * end. The ranking window runs over the TERM AGGREGATE (vocab-
    * sized, the hot/cold argument — at a web-scale vocabulary this is
    * the banded descending prefix of `Relational.abcParts`), never the
    * corpus. */
  /** CCNet head/middle/tail partition: each document bucketed by its
    * bigram-LM perplexity against its LANGUAGE's terciles — the
    * CCNet-style quality split (fluent third / middle / noisy tail)
    * that decides what a pretraining mix keeps, computed per language
    * so a hard language is not penalized for being rare. Terciles
    * ride the grouped banded percentile scan and broadcast back —
    * O(#langs) thresholds at any corpus size. */
  def ccnetBuckets(documents: DataFrame): DataFrame = {
    // The (doc_id, perplexity, lang) frame feeds BOTH the per-language
    // tercile thresholds and the bucket assignment; without the pin the
    // whole bigram-LM pipeline appears twice in one plan (exchange
    // reuse shares the shuffles but each consumer re-plans and
    // re-executes the post-exchange tail). One eager cut keeps the LM
    // machinery single-pass and both consumers' trees leaf-short.
    val withLang = perplexity(documents)
      .select(col("doc_id"), col("perplexity"))
      .join(documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .pin(eager = true)
    val th = Quantiles.exactPercentilesBy(
      withLang.select(col("lang"), col("perplexity").as("v")),
      Seq("lang"), Seq(1.0 / 3, 2.0 / 3))
    withLang.join(broadcast(th), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("perplexity"),
        when(col("perplexity") <= element_at(col("bs"), 1), "head")
          .when(col("perplexity") <= element_at(col("bs"), 2), "middle")
          .otherwise("tail").as("ccnet_bucket"))
      .orderBy(col("doc_id"))
  }

  def vocabCoverage(documents: DataFrame,
      ks: Seq[Int] = Seq(1, 5, 10, 25)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = documents
      .select(explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
    // pre-limit to the top-max(ks) slice (a distributed TakeOrdered)
    // BEFORE the rank/cumsum window: the cumulative coverage of ranks
    // ≤ k only reads the ordering's prefix, so the global window runs
    // over ≤ max(ks) rows instead of the whole (unbounded) vocabulary
    val top = terms.orderBy(col("freq").desc, col("token")).limit(ks.max)
    val w = Window.orderBy(col("freq").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .cast("long"))
      .withColumn("cum", sum(col("freq")).over(w))
    val total = terms.agg(sum(col("freq")).as("n_total"))
    ranked
      .select(col("rank"), col("cum"),
        explode(array(ks.map(lit(_)): _*)).as("k"))
      .filter(col("rank") <= col("k"))
      .groupBy(col("k").cast("long").as("k"))
      .agg(count(lit(1)).as("n_terms"), max(col("cum")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("n_terms"), col("covered_tokens"),
        round(col("covered_tokens").cast("double") / col("n_total"), 6)
          .as("coverage"))
      .orderBy(col("k"))
  }

  /** Top-k for [[zipf]] — shared with the oracle generator. */
  /** BM25 parameters and the fixed query — shared with the oracle. */
  val Bm25Terms = Seq("spark", "join", "merge", "window")
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val bm25TopK = 20

  /** BM25 retrieval scoring of the corpus against the fixed
    * [[Bm25Terms]] query: the Robertson/Sparck-Jones ranking function
    * with term-frequency saturation (k1) and length normalization (b)
    * that tf-idf lacks — the engine's full-text-search primitive.
    * Per-doc term frequencies and lengths come from one exploded
    * hash aggregate; corpus stats (N, df per term, avg length) are a
    * one-row broadcast; each idf rides the round-12 grid and the
    * ≤|terms| score sum is stated in fixed term order. Top-k is a
    * TakeOrderedAndProject.
    *
    * Scale: one explode + one doc-grain aggregate + a broadcast
    * scalar — no data-sized join or window anywhere. */
  def bm25Top(documents: DataFrame, k: Int = bm25TopK): DataFrame = {
    val perDoc = documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        Bm25Terms.map(t =>
          sum(when(col("token") === t, 1L).otherwise(0L))
            .as(s"tf_$t")): _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
            .as(s"df_$t")): _*)
    val nd = col("n_docs").cast("double")
    val score = Bm25Terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = round(log((nd - df + 0.5) / (df + 0.5) + 1.0), 12)
      idf * (tf * lit(Bm25K1 + 1.0)) /
        (tf + lit(Bm25K1) * (lit(1.0 - Bm25B) +
          lit(Bm25B) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Mutual information between document language and source:
    * MI = Σ p(l,s)·ln(p(l,s)/(p(l)p(s))) from exact joint counts,
    * plus the marginal entropies and NMI = MI/√(H_l·H_s) — the
    * dependence census a corpus-mixture designer reads before
    * stratifying (high NMI: language and source are redundant strata;
    * ≈0: independent axes that must BOTH be balanced). Every log term
    * rides the round-12/DECIMAL(28,12) grid (order-independent sums);
    * counts stay BIGINT until one final division.
    *
    * Scale: one (lang, source) hash aggregate — the joint grid is
    * metadata-sized, everything downstream is per-cell algebra. */
  def miLangSource(documents: DataFrame): DataFrame = {
    val joint = documents.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("nls"))
      .pin(eager = true)
    val tot = joint.agg(sum(col("nls")).as("n"))
    val ml = joint.groupBy(col("lang")).agg(sum(col("nls")).as("nl"))
    val ms = joint.groupBy(col("source")).agg(sum(col("nls")).as("ns"))
    val nd = col("n").cast("double")
    val pls = col("nls").cast("double") / nd
    val mi = joint
      .join(broadcast(ml), Seq("lang"))
      .join(broadcast(ms), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(round(pls * log(pls /
          ((col("nl").cast("double") / nd) *
            (col("ns").cast("double") / nd))), 12)
        .cast("decimal(28,12)").as("term"))
      .agg(sum(col("term")).cast("double").as("mi"))
    def entropy(m: DataFrame, cnt: String, as: String) =
      m.crossJoin(broadcast(tot))
        .select(round(-((col(cnt).cast("double") / nd) *
            log(col(cnt).cast("double") / nd)), 12)
          .cast("decimal(28,12)").as("term"))
        .agg(sum(col("term")).cast("double").as(as))
    val hl = entropy(ml, "nl", "hl")
    val hs = entropy(ms, "ns", "hs")
    tot.crossJoin(broadcast(mi)).crossJoin(broadcast(hl))
      .crossJoin(broadcast(hs))
      .select(col("n").as("n_docs"),
        round(col("mi"), 6).as("mi"),
        round(col("hl"), 6).as("h_lang"),
        round(col("hs"), 6).as("h_source"),
        round(col("mi") / when(col("hl") * col("hs") > 0.0,
          sqrt(col("hl") * col("hs"))), 6).as("nmi"))
  }

  /** RAKE phrase budget — shared with the oracle. */
  val rakeTopK = 10

  /** RAKE keyword extraction (Rapid Automatic Keyword Extraction) at
    * corpus level: candidate phrases are maximal stopword-free token
    * runs (the [[stopwords]] list splits them), word score =
    * degree/frequency over ALL phrase occurrences (degree = Σ length
    * of phrases containing the word — co-occurrence weight), phrase
    * score = Σ member word scores on the round-12 decimal grid, and
    * the release is the top-[[rakeTopK]] distinct phrases by score —
    * the unsupervised keyword surface a corpus triage starts from.
    * The word-stats attach rides [[Skew.hotColdJoin]] (hot tokens
    * broadcast, cold shuffle) exactly like tf-idf; the top-k is a
    * TakeOrderedAndProject, never a global sort.
    *
    * Scale: one explode + one running-count window per doc (pos
    * order), two vocab-sized hash aggregates, the skew-safe join. */
  def rake(documents: DataFrame, k: Int = rakeTopK,
      hotVocab: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val stop = col("token").isin(stopwords: _*)
    val marked = documents
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos"), col("token"),
        sum(when(stop, 1L).otherwise(0L)).over(w).as("phrase_id"),
        stop.as("is_stop"))
      .filter(!col("is_stop"))
      // feeds word stats AND phrase assembly
      .pin(eager = true)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("phrase_id"))
    val withLen = marked.withColumn("plen", count(lit(1)).over(wp))
    val wordStats = withLen.groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = Skew
      .hotColdJoin(withLen, wordStats, Seq("token"), col("freq"),
        hotVocab)
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          s => s.getField("token")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(round(col("deg").cast("double") / col("freq").cast("double"),
          12).cast("decimal(28,12)")).cast("double").as("score"))
    scored.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occur"),
        max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
      .select(col("phrase"), col("n_words"), col("n_occur"),
        round(col("score"), 6).as("score"))
  }

  val zipfTopK = 100

  /** Zipf rank-frequency profile: the top-[[zipfTopK]] tokens with
    * their global rank, observed corpus share, and the share Zipf's
    * law predicts from the rank-1 frequency (f₁/rank) — the standard
    * sanity plot for tokenizer/corpus health (a corpus that deviates
    * hard from Zipf usually means boilerplate, spam, or a broken
    * tokenizer). All ratios are per-row double math over exact integer
    * counts (observed/expected shares never sum floats), so both
    * engines agree bit-for-bit.
    *
    * Scale: one token hash-aggregate (vocab-sized); the rank-≤-k
    * filter is lowered so the global rank window runs over a
    * TakeOrdered top-k slice only (plan-audited), matching
    * [[vocabCoverage]]'s explicit pre-limit. */
  def zipf(documents: DataFrame, k: Int = zipfTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = documents
      .select(explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
    val total = terms.agg(sum(col("freq")).as("n_total"))
    val ranked = terms
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .cast("long"))
      .filter(col("rank") <= k)
    val f1 = ranked.filter(col("rank") === 1)
      .select(col("freq").as("f1"))
    ranked.crossJoin(broadcast(total)).crossJoin(broadcast(f1))
      .select(col("rank"), col("token"), col("freq"),
        round(col("freq").cast("double") / col("n_total"), 6)
          .as("obs_share"),
        round(col("f1").cast("double") / col("rank") / col("n_total"), 6)
          .as("zipf_share"))
      .orderBy(col("rank"))
  }

  def tokenHistogram(documents: DataFrame): DataFrame =
    documents
      .select(explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)

  /** TF-IDF top-3 terms per document: tf × (ln((N+1)/(df+1)) + 1),
    * ranked per doc through the custom [[TopK]] operator. One token
    * explode, two hash aggregations (doc-term tf, corpus df), a
    * broadcast scalar N, and a bounded-heap top-k — every stage
    * partial-aggregates map-side.
    *
    * The df table is vocab-sized (unbounded on a web corpus: typos,
    * numbers, URLs), so the tf⋈df join goes through
    * [[Skew.hotColdJoin]]: top-`hotVocab` tokens by df broadcast (they
    * carry the skew mass), the tail shuffle-joins on a flat key. The
    * default keeps BOTH branches value-exercised at test scale (sf0.01
    * vocab is 31 tokens); production tunes it up (e.g. 10⁵) — results
    * are identical at any value. */
  def tfidfTop(documents: DataFrame, k: Int = 3,
      hotVocab: Int = 16): DataFrame = {
    val tokens = documents.select(col("doc_id"),
      explode(Portable.tokens(col("text"))).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tokens.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val scored = Skew.hotColdJoin(tf, df, Seq("token"), col("df"), hotVocab)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("tf") * (log((col("n_docs") + 1).cast("double") /
          (col("df") + 1)) + 1), 6).as("tfidf"))
    TopK.perKey(scored, Seq("doc_id"),
        Seq("tfidf" -> true, "token" -> false), k)
      .select(col("doc_id"), col("token"), col("tf"),
        col("tfidf"), col("rn").cast("long").as("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Corpus bigram histogram, top 30 (n-gram language-model profile). */
  def bigramHistogram(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i+1]))")).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("bigram"))
      .limit(30)

  /** Hashed-feature dimension and weight coefficients for
    * [[classifierScore]] — shared with the oracle generator. The
    * coefficient pair is drawn from the same deterministic universal-
    * hash sequence as the MinHash seeds (index 16 — one (a,b) pair,
    * disjoint from [[Dedup.coeffs]]' 0-15). */
  val clsDim = 1024
  val clsCoeffs: (Long, Long) = {
    val cs = Portable.hashCoeffs(18)
    cs(16)
  }

  /** Feature-hashing weight table: w(j) = ((a·(j+1) + b) mod p)/p − 0.5
    * for j in 0 until [[clsDim]] — the same derivation as the SRP
    * hyperplanes, emitted as one array literal so no row recomputes it. */
  def clsWeights: Seq[Double] = {
    val (a, b) = clsCoeffs
    Seq.tabulate(clsDim)(j =>
      ((a * (j + 1) + b) % Portable.P31).toDouble / Portable.P31 - 0.5)
  }

  /** fastText-style hashed linear classifier score per document — the
    * model-based quality-classifier stage of a training-data pipeline
    * (the seam where a learned fastText/logreg model plugs in; the
    * weight table here is the deterministic stand-in, exactly like the
    * LLM-enrichment stub). Each token hashes into one of [[clsDim]]
    * buckets; the document's margin is the mean bucket weight
    * (sequential left-to-right fold, so both engines sum in the same
    * order); score = sigmoid(margin × 10), label = margin > 0.
    *
    * Scale (100 TB): pure map-side codegen — the weight table is an
    * O(clsDim) literal in the plan, tokens never shuffle, no aggregation
    * anywhere. Stream-safe for the same reason (no sort, no state): the
    * identical transform runs under readStream (StreamingSpec parity).
    * The real model swaps in by replacing the weight array (same plan);
    * a 10⁶-bucket production table would move from a plan literal to a
    * broadcast join on bucket id. */
  /** The hashed-classifier margin over a token-array column — shared by
    * [[classifierScore]] and [[Curation.budgetSelect]] so the formula
    * cannot drift between the report and the selection that ranks by
    * it. Sequential left-to-right fold: both engines sum in the same
    * order. */
  private[operators] def clsMargin(tk: Column): Column = {
    val w = typedLit(clsWeights)
    round(
      aggregate(
        transform(tk, t =>
          element_at(w, (pmod(Portable.hash32(t), lit(clsDim)) + 1)
            .cast("int"))),
        lit(0.0), (acc, x) => acc + x) / size(tk), 6)
  }

  /** score = sigmoid(margin × 10), rounded to the shared 6dp grid. */
  private[operators] def clsScore(margin: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-margin * 10)), 6)

  def classifierScore(documents: DataFrame): DataFrame = {
    documents
      .withColumn("tk", toks)
      .withColumn("margin", clsMargin(col("tk")))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        col("margin"),
        clsScore(col("margin")).as("score"),
        (col("margin") > 0).as("label"))
  }

  /** Lexical diversity per document: type-token ratio and hapax ratio
    * (share of tokens occurring exactly once in the doc) — the
    * vocabulary-richness signals that separate template/boilerplate
    * text (low TTR, low hapax) from natural prose. Exact rational
    * arithmetic; two hash aggregations on (doc, token) then doc — both
    * partial-aggregate map-side, nothing corpus-global. */
  def lexicalDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("cnt") === 1).cast("long")).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_tokens"), 6)
          .as("hapax_ratio"))
      .orderBy(col("doc_id"))

  /** N-gram novelty per document: the fraction of its distinct hashed
    * 3-gram shingles that occur in NO other document (corpus-wide
    * document frequency 1) — the informativeness signal dual to the
    * dedup family: boilerplate-heavy docs score near 0, genuinely new
    * content near 1. Rational arithmetic (one division, rounded), so
    * both engines agree exactly.
    *
    * Scale (100 TB): reuses [[Dedup.shingleHashes]] (shingles hashed to
    * 32 bits BEFORE the first shuffle) and one df aggregation; the
    * df-attach join goes through [[Skew.hotColdJoin]] because the
    * shingle-df table is corpus-vocabulary-sized and its head (the
    * boilerplate shingles this signal exists to catch) is exactly the
    * skew mass a plain shuffle join would hot-spot on. */
  def novelty(documents: DataFrame, hotK: Int = 16): DataFrame = {
    // post-hash distinct: the (doc_id, h) universe the dedup family
    // shuffles on (a 32-bit collision inside one doc must count once)
    val sh = Dedup.shingleHashes(documents).distinct().pin()
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    Skew.hotColdJoin(sh, df, Seq("h"), col("df"), hotK)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        round(col("n_unique").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Add-k smoothing constant and LM pruning floor for [[perplexity]] —
    * shared with the oracle generator so the formulas cannot drift. */
  val ppK = 0.5
  val ppMinCount = 2L

  /** Bigram language-model perplexity per document — the CCNet-style
    * quality signal (docs scoring far from the corpus LM are outliers:
    * boilerplate, gibberish, wrong-language). The LM is trained on the
    * corpus itself: P(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V) with
    * add-k smoothing; bigrams seen fewer than [[ppMinCount]] times are
    * pruned from the LM and score as unseen — the same pruning KenLM
    * applies to bound model size at scale. Docs with fewer than two
    * tokens have no bigrams and are out of scope.
    *
    * Scale (100 TB): both LM tables are vocab-sized aggregates, orders
    * of magnitude smaller than the corpus — but still unbounded, so the
    * unigram context join goes through [[Skew.hotColdJoin]]: the
    * top-`hotVocab` context words broadcast (a shuffled join on w1
    * would put every "the" bigram in one partition — the hottest skew
    * key a text corpus has — so the skew mass must ride the broadcast
    * branch), the long tail shuffle-joins on a flat key. The pruned
    * bigram LM joins by (w1, w2), a far flatter key. Doc bigrams are a
    * map-side explode; the per-doc reduction partial-aggregates. */
  def perplexity(documents: DataFrame, k: Double = ppK,
      minCount: Long = ppMinCount, hotVocab: Int = 16): DataFrame = {
    val docBigrams = documents
      .withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val lm = docBigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val cnt1 = docBigrams.groupBy(col("w1"))
      .agg(count(lit(1)).as("cnt1"))
    val vocab = documents.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("n_vocab"))
    Skew.hotColdJoin(docBigrams.join(lm, Seq("w1", "w2"), "left"),
        cnt1, Seq("w1"), col("cnt1"), hotVocab)
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((coalesce(col("c12"), lit(0L)) + lit(k)) /
        (col("cnt1") + lit(k) * col("n_vocab"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-sum(col("lp")) / count(lit(1))), 6).as("perplexity"))
      .orderBy(col("doc_id"))
  }

  /** Heaps-law vocabulary growth: distinct-vocabulary size at ten
    * corpus prefixes (by doc_id order) — the curve that says whether
    * more data still buys new vocabulary or the corpus has saturated.
    * The classic "distinct over growing prefix" is O(K·corpus) naively;
    * here each token reduces to its FIRST containing doc (one hash
    * aggregate), and every checkpoint is a count over that vocab-sized
    * table — exact integers, one corpus scan total. */
  def vocabGrowth(documents: DataFrame, steps: Int = 10): DataFrame = {
    val firstDoc = documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val maxDoc = documents.agg(max(col("doc_id")).as("max_doc"),
      count(lit(1)).as("n_docs"))
    firstDoc.crossJoin(broadcast(maxDoc))
      .select(col("first_doc"), col("max_doc"),
        explode(sequence(lit(1), lit(steps))).as("step"))
      .withColumn("cutoff", expr(s"(max_doc * step) div $steps"))
      .filter(col("first_doc") <= col("cutoff"))
      .groupBy(col("step").cast("long").as("step"))
      .agg(max(col("cutoff")).as("max_doc_id"),
        count(lit(1)).as("vocab_size"))
      .orderBy(col("step"))
  }

  /** Per-source keyword count for [[sourceKeywords]]. */
  val keywordsPerSource = 3

  /** Distinctive keywords per source: source-level TF-IDF — token
    * count within the source × ln(#sources/#sources-containing) — the
    * "what is this source about" characterization (a token every
    * source shares scores 0; a source-exclusive one gets the full idf
    * boost). Counts and document frequencies are exact integers over
    * two hash aggregates; the idf is one ln per token on identical
    * doubles; top-[[keywordsPerSource]] per source selects through a
    * source-partitioned rank with (score desc, token) determinism. */
  def sourceKeywords(documents: DataFrame,
      k: Int = keywordsPerSource): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents
      .select(col("source"), explode(toks).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df_sources"))
    val nSources = documents.agg(countDistinct(col("source")).as("n_sources"))
    val scored = tf.join(df, Seq("token"))
      .crossJoin(broadcast(nSources))
      .withColumn("score",
        round(col("tf") * log(col("n_sources").cast("double") /
          col("df_sources")), 6))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("token"), col("tf"),
        col("df_sources"), col("score"))
      .orderBy(col("source"), col("rank"))
  }

  /** Top-k for [[pmiCollocations]] — shared with the oracle. */
  val pmiTopK = 20

  /** PMI collocations: pointwise mutual information of the corpus's
    * most frequent bigrams — ln(c₁₂·N / (c₁•·c•₂)) over within-bigram
    * marginals, the classic collocation-mining statistic (high-PMI
    * frequent bigrams are multiword units; near-zero means the pair
    * co-occurs by chance). All counts are exact integers from two
    * hash aggregates; one ln per REPORTED row. */
  def pmiCollocations(documents: DataFrame, k: Int = pmiTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bigrams = documents
      .withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val n = bigrams.agg(count(lit(1)).as("n_bigrams"))
    val ranked = c12
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c12").desc, col("w1"), col("w2"))).cast("long"))
      .filter(col("rank") <= k)
    ranked
      .join(c1, Seq("w1")).join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("rank"), col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast("double") * col("n_bigrams") /
          (col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy(col("rank"))
  }


  /** Vocabulary-richness (hapax) report per language: token count N,
    * vocabulary V, hapax count V₁ (tokens seen exactly once), the
    * type-token ratio V/N, the hapax share V₁/V, and Honoré's
    * R = 100·ln N / (1 − V₁/V) — the classic richness statistic that
    * diverges as everything becomes a one-off. The fast screen for
    * boilerplate (low TTR, low hapax share) vs noisy/OCR text (hapax
    * share → 1) per language slice.
    *
    * Determinism: every count is an exact integer from two hash
    * aggregates; the ratios and ln run on exact longs in one pinned
    * order. Scale: (lang, token) then lang grain — vocab-sized
    * shuffle, bounded output. */
  def hapaxReport(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("lang"), explode(toks).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
    tf.groupBy(col("lang"))
      .agg(sum(col("freq")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("freq") === 1, 1)).as("hapax"))
      .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
        round(col("vocab") / col("n_tokens"), 6).as("ttr"),
        round(col("hapax") / col("vocab"), 6).as("hapax_share"),
        // NULL divisor when V1 = V: ANSI raises on x/0 even for
        // doubles, and the outer `when` may not shield a hoisted
        // subexpression — dividing by NULL is safe under both
        when(col("hapax") < col("vocab"),
          round(lit(100.0) * log(col("n_tokens").cast("double")) /
            when(col("hapax") < col("vocab"),
              lit(1.0) - col("hapax") / col("vocab")), 6))
          .as("honore_r"))
      .orderBy(col("lang"))
  }

  /** Yule's K and Simpson's D lexical-concentration indices per
    * language — the frequency-of-frequencies pair (how dominated the
    * corpus is by its head types, the repetition signal at the VOCAB
    * grain where [[TextAnalysis.repetitionReport]] works at the doc
    * grain): K = 10⁴·(Σ fₘm² − N)/N², D = Σ f(f−1) / (N(N−1)) — the
    * probability two random tokens are the same type. A curation
    * consumer reads a rising K/D as template/boilerplate flooding
    * that per-doc filters miss.
    *
    * Determinism: every sum is INTEGER (freq-of-freq moments); the
    * only float ops are the two final divisions on exact BIGINTs
    * (squares taken AFTER the double cast — a 100-TB corpus's N²
    * overflows int64, so the cast order is load-bearing at scale,
    * stated identically in the oracle). Scale: two hash aggregates
    * (token → freq → freq-of-freq) then a per-lang fold; the
    * vocab-grain middle table is the largest stage and it is exactly
    * [[hapaxReport]]'s, which measures flat. */
  def yuleSimpson(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("lang"), explode(toks).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
    val fof = tf.groupBy(col("lang"), col("freq").as("m"))
      .agg(count(lit(1)).as("fm"))
    val nd = col("n_tokens").cast("double")
    // second moments ride a DECIMAL(38,0) grid: fm·m² overflows int64
    // once a head token's frequency passes ~3e9 (plausible at corpus
    // scale), and 38 integer digits cover fm·m² for any m < 1e12 —
    // exact and order-independent, unlike a double sum
    val mDec = col("m").cast("decimal(38,0)")
    // fail-loud overflow guard: Spark's non-ANSI DECIMAL(38,0) sum
    // returns NULL on overflow while the oracle's HUGEINT stays exact
    // to ~1.7e38 — past 1e38 the gate would read as a confusing
    // NULL-vs-value mismatch, so raise instead (a moment grid that
    // wide means the grid itself needs rethinking, not a quiet NULL)
    def checked(c: Column, nm: String): Column = coalesce(c,
      raise_error(lit(s"yuleSimpson: $nm overflowed DECIMAL(38,0)")))
    fof.groupBy(col("lang"))
      .agg(sum(col("m") * col("fm")).as("n_tokens"),
        sum(col("fm")).as("vocab"),
        sum(col("fm") * mDec * mDec).as("s2"),
        sum(col("fm") * mDec * (mDec - 1)).as("rep2"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        round(lit(10000.0) * (checked(col("s2"), "s2") - col("n_tokens")) /
            (nd * nd), 6)
          .as("yule_k"),
        when(col("n_tokens") > 1,
          round(checked(col("rep2"), "rep2") / (nd * (nd - lit(1.0))), 6))
          .as("simpson_d"))
      .orderBy(col("lang"))
  }

  /** Head-coverage thresholds, shared with the oracle generator. */
  val HeadKs = Seq(10, 100, 1000)

  /** Token-mass head coverage per language: the share of all token
    * occurrences covered by the top-10/100/1000 types (rank by freq,
    * ties broken by token — a stated total order) — the curve a
    * tokenizer/stopword design reads ([[zipfReport]] fits the slope;
    * this reports the actionable cumulative mass at the cut points a
    * vocab budget actually uses).
    *
    * Determinism: all sums are integer token counts; the only float
    * op is the final share division. Scale: totals (n_tokens, vocab)
    * come from the UNRANKED per-language aggregate — no window ever
    * sees the full vocabulary — and head mass from a per-language
    * top-max([[HeadKs]]) slice: the rank filter sits directly on the
    * `row_number`, so the window-group-limit rewrite bounds every
    * language's sort to max(HeadKs) rows per task (the
    * [[vocabCoverage]] recipe, per group; `TextPlanShapeSpec` asserts
    * the limit is in the plan). A web-scale vocabulary is unbounded;
    * the head cut is not. */
  def headCoverage(documents: DataFrame): DataFrame = {
    // pinned: both the totals branch and the head branch read the
    // term-frequency table — without the cut each re-runs the
    // corpus-grain explode+count (the expensive stage; tf itself is
    // vocab-grain, the cheap thing to materialize)
    val tf = documents
      .select(col("lang"), explode(toks).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
      .pin()
    val totals = tf.groupBy(col("lang"))
      .agg(sum(col("freq")).as("n_tokens"), count(lit(1)).as("vocab"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("freq").desc, col("token"))
    // rank filter IMMEDIATELY over the row_number: the group-limit
    // rewrite turns the per-language sort into a bounded top-k
    val head = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HeadKs.max)
    val aggs = HeadKs.map(k =>
      sum(when(col("rank") <= k, col("freq")).otherwise(lit(0L)))
        .as(s"top$k"))
    val heads = head.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
    totals.join(heads, Seq("lang"))
      .select(col("lang") +: col("n_tokens") +: col("vocab") +:
        HeadKs.map(k =>
          round(col(s"top$k") / col("n_tokens"), 6)
            .as(s"top${k}_share")): _*)
      .orderBy(col("lang"))
  }

  /** Corpus entropy rate: the unigram Shannon entropy H(W) and the
    * bigram conditional entropy H(W₂|W₁) — the information-theoretic
    * complexity pair (their gap is the mutual information a 1-token
    * context buys; a corpus whose conditional entropy collapses is
    * templated and will compress/ memorize easily). All probabilities
    * are exact integer-count ratios from three hash aggregates; every
    * −p·ln(·) term rounds to the 1e-12 grid and decimal-sums, so both
    * scalars are order-independent under any partitioning and nothing
    * data-sized crosses an executor boundary. */
  def entropyRate(documents: DataFrame): DataFrame = {
    val bigrams = documents
      .withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val nb = bigrams.agg(count(lit(1)).as("nb"))
    val pb = col("c12").cast("double") / col("nb")
    val cond = c12.join(c1, Seq("w1")).crossJoin(broadcast(nb))
      .select(round(-pb * log(col("c12").cast("double") / col("c1")),
        12).cast("decimal(18,12)").as("t"))
      .agg(round(sum(col("t")).cast("double"), 6).as("entropy_rate"))
    val uni = documents.select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val m = uni.agg(sum(col("c")).as("m"), count(lit(1)).as("vocab"))
    val pu = col("c").cast("double") / col("m")
    val unigram = uni.crossJoin(broadcast(m))
      .select(col("m"), col("vocab"),
        round(-pu * log(pu), 12).cast("decimal(18,12)").as("t"))
      .groupBy(col("m"), col("vocab"))
      .agg(round(sum(col("t")).cast("double"), 6)
        .as("unigram_entropy"))
    unigram.crossJoin(broadcast(cond))
      .select(col("m").as("n_tokens"), col("vocab"),
        col("unigram_entropy"), col("entropy_rate"),
        round(col("unigram_entropy") - col("entropy_rate"), 6)
          .as("mutual_info"))
  }

  /** Top-k for [[burstiness]] — shared with the oracle generator. */
  val burstTopK = 20

  /** Token burstiness: the variance-to-mean ratio of per-document
    * counts for the corpus's top tokens — the corpus-linguistics
    * dispersion statistic (VMR 1 = Poisson scatter; ≫ 1 = the token
    * CLUMPS in few documents — topical or boilerplate; function words
    * sit near or below 1). Zero-count documents enter the moments
    * implicitly through the corpus doc count, so everything reduces to
    * three exact integers per token (Σc, Σc², df) and one closed form.
    * One token hash-aggregate, one top-k — no per-doc×token matrix is
    * ever materialized. */
  def burstiness(documents: DataFrame, k: Int = burstTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val perToken = counts.groupBy(col("token"))
      .agg(sum(col("c")).as("total_count"),
        sum(col("c") * col("c")).as("sum_sq"),
        count(lit(1)).as("doc_freq"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val ranked = perToken
      .withColumn("rank", row_number().over(
        Window.orderBy(col("total_count").desc, col("token"))).cast("long"))
      .filter(col("rank") <= k)
    val dd = col("n_docs").cast("double")
    val mean = col("total_count").cast("double") / dd
    ranked.crossJoin(broadcast(nDocs))
      .select(col("rank"), col("token"), col("total_count"),
        col("doc_freq"),
        round((col("sum_sq").cast("double") / dd - mean * mean) / mean, 6)
          .as("vmr"))
      .orderBy(col("rank"))
  }

  /** Pairwise source vocabulary overlap: Jaccard similarity of the
    * distinct token sets of every source pair — the redundancy map
    * that says which crawl sources contribute NEW vocabulary and
    * which merely mirror each other. One distinct (source, token)
    * projection; the self-join fans out per token to at most
    * sources²/2 rows — bounded by the (metadata-sized) source count,
    * never the corpus — and every measure is an exact integer ratio. */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val st = documents
      .select(col("source"), explode(toks).as("token")).distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n_terms"))
    val common = st.select(col("source").as("source_a"), col("token"))
      .join(st.select(col("source").as("source_b"), col("token")),
        Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_terms").as("terms_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_terms").as("terms_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("terms_a"),
        col("terms_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("terms_a") + col("terms_b") - col("n_common")), 6)
          .as("vocab_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Per-source language entropy: Shannon entropy (nats) of each
    * source's language mix — the diversity statistic a mixture planner
    * reads next to token shares (a zero-entropy source is monolingual;
    * entropy near ln(#langs) means uniform coverage). Shares are exact
    * integer ratios; each −p·ln p term rounds to a fixed 12-decimal
    * grid and sums as DECIMAL — the language count per source is tiny
    * but the decimal sum makes the aggregate order-independent on
    * principle, not by luck. */
  def langEntropy(documents: DataFrame): DataFrame = {
    val counts = documents.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val tots = counts.groupBy(col("source"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_langs"))
    val p = col("n").cast("double") / col("tot")
    counts.join(broadcast(tots), Seq("source"))
      .select(col("source"), col("n_langs"), col("tot"),
        round(-p * log(p), 12).cast("decimal(18,12)").as("term"))
      .groupBy(col("source"))
      .agg(max(col("n_langs")).as("n_langs"),
        max(col("tot")).as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("lang_entropy"))
      .orderBy(col("source"))
  }

  /** Jensen–Shannon divergence of each source's unigram distribution
    * vs the whole-corpus distribution — the data-mixing diagnostic
    * (DoReMi-style reweighting reads exactly this: a source with JSD
    * near 0 adds no distributional novelty; a high-JSD source shifts
    * the mixture). Exact by construction: shares are integer-count
    * ratios, every per-token 0.5·(p·ln(p/m) + q·ln(q/m)) term rounds
    * to the 1e-12 grid and sums as DECIMAL — order-independent under
    * any partitioning. Scale: the grid is |vocab| × |sources| rows
    * (sources are a small broadcast side); everything else is hash
    * aggregation on (source, token) — no data-sized window, no
    * driver-side state. */
  def jsDivergence(documents: DataFrame): DataFrame = {
    val sc = documents
      .select(col("source"), explode(toks).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_st"))
    val stot = sc.groupBy(col("source"))
      .agg(sum(col("n_st")).as("tot_s"), count(lit(1)).as("vocab_s"))
    val cc = sc.groupBy(col("token")).agg(sum(col("n_st")).as("n_t"))
    val ctot = cc.agg(sum(col("n_t")).as("tot_c"))
    val grid = cc.crossJoin(broadcast(ctot))
      .crossJoin(broadcast(stot))
      .join(sc, Seq("source", "token"), "left")
    val p = coalesce(col("n_st"), lit(0L)).cast("double") / col("tot_s")
    val q = col("n_t").cast("double") / col("tot_c")
    val m = (p + q) / lit(2)
    val term = (when(p > lit(0.0), p * log(p / m)).otherwise(lit(0.0)) +
      q * log(q / m)) * lit(0.5)
    grid
      .select(col("source"), col("tot_s"), col("vocab_s"),
        round(term, 12).cast("decimal(18,12)").as("term"))
      .groupBy(col("source"))
      .agg(max(col("tot_s")).as("n_tokens"),
        max(col("vocab_s")).as("vocab_size"),
        round(sum(col("term")).cast("double"), 6).as("js_divergence"))
      .orderBy(col("source"))
  }

  /** Tokenizer fertility by language — subwords per whitespace word
    * and characters per subword, the tokenizer-health metric a
    * multilingual corpus is profiled with before training (a language
    * whose fertility balloons is being shredded by the vocab and will
    * eat budget). Per-document counts are the shared codegen'd BPE
    * scan ([[graft.functions.BpeExprs.bpeCount]]) plus two integer
    * lengths; the per-language rollup is exact integer sums with two
    * final divisions — map-side everything, one tiny shuffle on lang. */
  def fertility(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"),
        size(toks).cast("long").as("nt"),
        graft.functions.BpeExprs.bpeCount(col("text")).as("ns"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long")
          .as("nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("ns")).as("n_subwords"), sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_tokens"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subwords"), 6)
          .as("chars_per_subword"))
      .orderBy(col("lang"))

  /** Flesch readability per document — reading-ease and Flesch-Kincaid
    * grade from three integer counts: sentences (runs of `.!?`,
    * floored at 1 so headline-style fragments don't divide by zero),
    * words (the shared whitespace tokenizer), and syllables
    * approximated as vowel runs (`[aeiouy]+` over the lowercased text
    * — the standard cheap heuristic; no dictionary in either engine).
    * The two scores are per-row double math over those exact counts,
    * stated in one pinned order and rounded 4 — fully map-side, no
    * shuffle at any scale. */
  def readability(documents: DataFrame): DataFrame = {
    val words = size(toks).cast("long")
    val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val syls = greatest(
      regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1))
      .cast("long")
    val wps = col("n_words").cast("double") / col("n_sentences")
    val spw = col("n_syllables").cast("double") / col("n_words")
    documents
      .select(col("doc_id"), sents.as("n_sentences"), words.as("n_words"),
        syls.as("n_syllables"))
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
          .as("flesch"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
          .as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  /** n-gram sizes the duplication census reports — shared with the
    * oracle generator. 3 is the repetition-analysis standard; 8 is the
    * long-gram grain where only genuine copies collide. */
  val DupNgramNs: Seq[Int] = Seq(3, 8)

  /** Duplicated-n-gram census per source (Lee et al. 2022's
    * "deduplicating training data" corpus diagnostic, at corpus grain
    * rather than pair grain): for each n in [[DupNgramNs]], the
    * source's total and distinct word-n-gram counts, the hottest
    * gram's repeat count, and the duplicate share
    * (total − distinct) / total — the fraction of n-gram occurrences
    * that are re-occurrences. High short-gram share = repetitive
    * prose; ANY long-gram share = copied passages the pair-grain dedup
    * family ([[graft.operators.Dedup]]) should be pointed at.
    *
    * Scale: one explode + hash aggregate to the (source, gram) grain
    * per n — vocab-sized intermediates with map-side partials, no
    * window, no pairs. */
  def dupNgrams(documents: DataFrame): DataFrame = {
    def forN(n: Int): DataFrame = {
      val gram = (0 until n).map(j => s"tk[i+$j]").mkString(", ")
      val counts = documents
        .withColumn("tk", toks)
        .filter(size(col("tk")) >= n)
        .select(col("source"), explode(expr(
          s"transform(sequence(0, size(tk) - $n), " +
            s"i -> concat_ws(' ', $gram))")).as("gram"))
        .groupBy(col("source"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_ngrams"),
          count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("max_repeat"))
        .select(lit(n.toLong).as("n"), col("source"), col("n_ngrams"),
          col("n_distinct"), col("max_repeat"),
          round((col("n_ngrams") - col("n_distinct")).cast("double") /
            col("n_ngrams"), 6).as("dup_share"))
    }
    DupNgramNs.map(forN).reduce(_ unionByName _)
      .orderBy(col("n"), col("source"))
  }

  /** Stopword-profile drift per source: the source's total stopword
    * share plus the cosine between its per-stopword frequency vector
    * and the corpus-wide one — the register/style drift gauge
    * (function-word distributions are the classic stylometry signal:
    * content-independent, so a source that diverges here writes
    * DIFFERENTLY, not just about different things). Vectors live on
    * the fixed [[stopwords]] axis.
    *
    * Determinism: shares are exact integer-count ratios (identical
    * doubles both engines); every cosine term (p·q, p², q²) rounds to
    * the 1e-12 grid and sums as DECIMAL — order-independent; the final
    * ratio is double math with the NULL-divisor guard on zero norms.
    * Scale: one conditional hash aggregate to the (source × 8) grid;
    * the corpus profile is a broadcast of that grid's rollup. */
  def stopwordProfile(documents: DataFrame): DataFrame = {
    val grid = documents
      .select(col("source"), explode(toks).as("token"))
      .filter(col("token").isin(stopwords: _*))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_st"))
    val totals = documents
      .select(col("source"), size(toks).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
    val corpusTok = grid.groupBy(col("token"))
      .agg(sum(col("n_st")).as("n_ct"))
    val corpusTot = totals.agg(sum(col("n_tokens")).as("n_corpus"))
    val terms = grid
      .join(totals, Seq("source"))
      .join(broadcast(corpusTok), Seq("token"))
      .crossJoin(broadcast(corpusTot))
    val p = col("n_st").cast("double") / col("n_tokens")
    val q = col("n_ct").cast("double") / col("n_corpus")
    val agg = terms
      .select(col("source"), col("n_tokens"), col("n_st"),
        round(p * q, 12).cast("decimal(28,12)").as("pq"),
        round(p * p, 12).cast("decimal(28,12)").as("pp"),
        round(q * q, 12).cast("decimal(28,12)").as("qq"))
      .groupBy(col("source"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        sum(col("n_st")).as("stop_tokens"),
        sum(col("pq")).cast("double").as("spq"),
        sum(col("pp")).cast("double").as("spp"),
        sum(col("qq")).cast("double").as("sqq"))
    val den = sqrt(col("spp")) * sqrt(col("sqq"))
    agg.select(col("source"), col("n_tokens"), col("stop_tokens"),
        round(col("stop_tokens").cast("double") / col("n_tokens"), 6)
          .as("stop_share"),
        when(den > 0.0, round(col("spq") / when(den > 0.0, den), 6))
          .as("profile_cosine"))
      .orderBy(col("source"))
  }

  /** Heaps-law fit over the [[vocabGrowth]] checkpoints: OLS of
    * ln V on ln N (V = distinct vocabulary, N = prefix token count at
    * the same ten doc-id cutoffs) — the scaling-law read of the growth
    * curve: β near 1 says vocabulary still grows linearly with data
    * (more data keeps buying new tokens), β near 0 says saturation;
    * K is the fitted prefactor. The capacity question "how much new
    * vocabulary does the next 10× buy" is exp of this fit.
    *
    * Determinism: checkpoint counts are exact integers (the
    * [[vocabGrowth]] first-doc reduction plus one conditional
    * token-count aggregate); the ln terms round to the 1e-12 grid and
    * the five OLS moment sums accumulate as DECIMAL over the ten-row
    * grid; the closed form is double math in one pinned order with
    * NULL-divisor guards. Scale: two corpus-scan hash aggregates;
    * everything after is a ten-row reduction. */
  def heapsFit(documents: DataFrame, steps: Int = 10): DataFrame = {
    val growth = vocabGrowth(documents, steps)
      .select(col("step"), col("max_doc_id"), col("vocab_size"))
    val maxDoc = documents.agg(max(col("doc_id")).as("max_doc"))
    val prefixTokens = documents
      .select(col("doc_id"), size(toks).cast("long").as("nt"))
      .crossJoin(broadcast(maxDoc))
      .select(col("doc_id"), col("nt"),
        explode(sequence(lit(1), lit(steps))).as("step"))
      .filter(col("doc_id") <= expr(s"(max_doc * step) div $steps"))
      .groupBy(col("step").cast("long").as("step"))
      .agg(sum(col("nt")).as("prefix_tokens"))
    val pts = growth.join(prefixTokens, Seq("step"))
      .select(
        round(log(col("prefix_tokens").cast("double")), 12)
          .cast("decimal(28,12)").as("x"),
        round(log(col("vocab_size").cast("double")), 12)
          .cast("decimal(28,12)").as("y"))
      .select(col("x"), col("y"),
        round(col("x").cast("double") * col("y").cast("double"), 12)
          .cast("decimal(28,12)").as("xy"),
        round(col("x").cast("double") * col("x").cast("double"), 12)
          .cast("decimal(28,12)").as("xx"),
        round(col("y").cast("double") * col("y").cast("double"), 12)
          .cast("decimal(28,12)").as("yy"))
    val m = pts.agg(count(lit(1)).as("n_steps"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("xy")).cast("double").as("sxy"),
      sum(col("xx")).cast("double").as("sxx"),
      sum(col("yy")).cast("double").as("syy"))
    val nd = col("n_steps").cast("double")
    val vx = col("sxx") - col("sx") * col("sx") / nd
    val vy = col("syy") - col("sy") * col("sy") / nd
    val cxy = col("sxy") - col("sx") * col("sy") / nd
    m.select(col("n_steps"), col("sx"), col("sy"), vx.as("vx"),
        vy.as("vy"), cxy.as("cxy"))
      .select(col("n_steps"),
        round(col("cxy") / when(col("vx") =!= 0.0, col("vx")), 6)
          .as("heaps_beta"),
        round(exp((col("sy") - (col("cxy") /
          when(col("vx") =!= 0.0, col("vx"))) * col("sx")) /
          col("n_steps").cast("double")), 6).as("heaps_k"),
        when(col("vx") =!= 0.0 && col("vy") =!= 0.0,
          round(col("cxy") * col("cxy") /
            when(col("vx") * col("vy") =!= 0.0, col("vx") * col("vy")), 6))
          .as("r2"))
  }

  /** STTR segment length — shared with the oracle generator. */
  val SttrSegment = 50

  /** Standardized (segmental) type–token ratio per source: each doc
    * splits into [[SttrSegment]]-token segments, TTR = distinct/size is
    * computed per FULL segment, and docs average their segments —
    * the length-robust lexical-diversity measure (plain TTR falls with
    * doc length mechanically, so [[lexicalDiversity]]-style whole-doc
    * ratios can't compare a tweet to a book chapter; STTR can).
    * Source rollup: mean doc STTR + how many docs were measurable
    * (≥ 1 full segment).
    *
    * Determinism: distinct counts are exact integers; each segment TTR
    * and each doc mean rides the 1e-12-grid DECIMAL sum recipe; one
    * final 1e-6 round. Scale: one explode + two hash aggregates
    * ((doc, segment, token) → (doc, segment) → doc), one source
    * aggregate — no windows, no pairs. */
  def sttr(documents: DataFrame): DataFrame = {
    val segTokens = documents
      .select(col("source"), col("doc_id"),
        posexplode(toks).as(Seq("pos", "token")))
      .select(col("source"), col("doc_id"),
        expr(s"pos div $SttrSegment").cast("long").as("seg"), col("token"))
    val segSizes = segTokens.groupBy(col("source"), col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("token")).as("n_types"))
      .filter(col("n_tok") === SttrSegment) // full segments only
    val docTtr = segSizes
      .select(col("source"), col("doc_id"),
        round(col("n_types").cast("double") / SttrSegment, 12)
          .cast("decimal(18,12)").as("ttr"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        (sum(col("ttr")).cast("double") / count(lit(1))).as("doc_sttr"))
    docTtr
      .select(col("source"),
        round(col("doc_sttr"), 12).cast("decimal(18,12)").as("ds"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_measured"),
        round(sum(col("ds")).cast("double") / count(lit(1)), 6)
          .as("mean_sttr"))
      .orderBy(col("source"))
  }
}
