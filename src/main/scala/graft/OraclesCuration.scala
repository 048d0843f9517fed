package graft

import graft.operators.{Curation, TextAnalysis}

/** DuckDB oracle SQL for the curation operators (quality filtering,
  * repetition detection, deterministic sampling) — generated from the
  * same thresholds/salts the Spark side uses so they can never drift. */
object OraclesCuration {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private val toksCte =
    "toks AS (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)"

  private val sampleKeySql =
    s"('0x' || substr(md5('${Curation.sampleSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT"

  /** Per-doc quality metrics CTE (`m`), shared by the filter query and
    * the curated-corpus capstone. Requires `toks` in scope. */
  private[graft] val qualityMCte = s"""m AS (
  SELECT doc_id,
    len(tk)::BIGINT AS n_tokens,
    round(len(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len(tk), 4) AS mean_word_len,
    round(len(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))::DOUBLE / n_chars, 4) AS punct_ratio,
    len(list_filter(tk, t -> t IN ${inList(TextAnalysis.stopwords)}))::BIGINT AS n_stopwords
  FROM toks)"""

  private[graft] val qKeepExpr =
    s"""(n_tokens >= ${Curation.minTokens} AND n_tokens <= ${Curation.maxTokens}
     AND mean_word_len >= ${Curation.minMeanWordLen} AND mean_word_len <= ${Curation.maxMeanWordLen}
     AND punct_ratio <= ${Curation.maxPunctRatio} AND n_stopwords >= ${Curation.minStopwords})"""

  /** Classifier-vs-rules calibration: score tenths (from the shared
    * classifier chain) against the quality keep rate. */
  private val classifierCalibrationSql = s"""
WITH $toksCte${OraclesExt.clsScCtes},
$qualityMCte,
sb AS (
  SELECT sc.doc_id,
    CAST(least(floor(round(1.0 / (1.0 + exp(-margin * 10)), 6) * 10), 9)
      AS BIGINT) AS bucket
  FROM sc),
kp AS (SELECT doc_id, $qKeepExpr AS keep FROM m)
SELECT bucket, count(*)::BIGINT AS n_docs,
  count(*) FILTER (keep)::BIGINT AS n_keep,
  round(count(*) FILTER (keep)::DOUBLE / count(*), 6) AS keep_rate
FROM sb JOIN kp USING (doc_id)
GROUP BY bucket ORDER BY bucket"""

  /** The four signal chains of the curation ensemble, each restated
    * from the same constants its standalone oracle uses (perplexity:
    * [[TextAnalysis.ppK]]/[[TextAnalysis.ppMinCount]]; classifier:
    * [[TextAnalysis.clsCoeffs]]/[[TextAnalysis.clsDim]]; centroid
    * cosine: the sim_outliers chain over embeddings). */
  private val ensembleSql: String = {
    val (ca, cb) = TextAnalysis.clsCoeffs
    val p = graft.functions.Portable.P31
    s"""
WITH $toksCte,
$qualityMCte,
bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
  FROM toks WHERE len(tk) >= 2),
lm AS (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY w1, w2
  HAVING count(*) >= ${TextAnalysis.ppMinCount}),
c1 AS (SELECT w1, count(*)::BIGINT AS cnt1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT t)::BIGINT AS n_vocab
  FROM (SELECT unnest(tk) AS t FROM toks)),
ppd AS (
  SELECT doc_id, round(exp(-sum(lp) / count(*)), 6) AS perplexity FROM (
    SELECT doc_id,
      ln((coalesce(c12, 0) + ${TextAnalysis.ppK}) /
         (cnt1 + ${TextAnalysis.ppK} * n_vocab)) AS lp
    FROM bg LEFT JOIN lm USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
  GROUP BY doc_id),
wt AS (
  SELECT list((($ca * (j + 1) + $cb) % $p)::DOUBLE / $p - 0.5 ORDER BY j) AS wv
  FROM range(${TextAnalysis.clsDim}) t(j)),
clsd AS (
  SELECT doc_id,
    round(1.0 / (1.0 + exp(-margin * 10)), 6) AS cls_score FROM (
    SELECT doc_id,
      round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(tk,
        t -> wv[(('0x' || substr(md5(t), 1, 8))::BIGINT % ${TextAnalysis.clsDim} + 1)::INT])),
        (acc, x) -> acc + x) / len(tk), 6) AS margin
    FROM toks CROSS JOIN wt)),
eb AS (
  SELECT vec_id, label,
    list_transform(embedding::DOUBLE[],
      x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS ev
  FROM embeddings),
ecm AS (
  SELECT label, pos, CAST(CAST(sum(CAST(x AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
  FROM (SELECT label, unnest(ev) AS x, unnest(range(len(ev))) AS pos FROM eb)
  GROUP BY label, pos),
ect AS (
  SELECT label, list_transform(c0,
    x -> x / sqrt(list_inner_product(c0, c0))) AS centroid
  FROM (SELECT label, list(cv ORDER BY pos) AS c0 FROM ecm GROUP BY label)),
cosd AS (
  SELECT b.vec_id AS doc_id,
    round(list_inner_product(b.ev, c.centroid), 6) AS centroid_cosine
  FROM eb b JOIN ect c ON b.label = c.label),
th AS (
  SELECT
    (SELECT round(quantile_cont(perplexity, 0.5)::DOUBLE, 6) FROM ppd) AS pp_median,
    (SELECT round(quantile_cont(centroid_cosine, 0.1)::DOUBLE, 6) FROM cosd) AS cos_p10)
SELECT m.doc_id, $qKeepExpr AS q_keep,
  ppd.perplexity, clsd.cls_score, cosd.centroid_cosine,
  ($qKeepExpr
   AND coalesce(ppd.perplexity <= th.pp_median, FALSE)
   AND coalesce(cosd.centroid_cosine >= th.cos_p10, FALSE)) AS keep
FROM m
LEFT JOIN ppd USING (doc_id)
JOIN clsd USING (doc_id)
LEFT JOIN cosd USING (doc_id)
CROSS JOIN th
ORDER BY doc_id"""
  }

  val all: Map[String, String] = Map(
    "corpus_classifier_calibration" -> classifierCalibrationSql,
    // ROC AUC via the Mann-Whitney rank-sum identity: the oracle
    // states the NAIVE global-window negatives-below prefix on the
    // distinct-score grain; the engine runs the banded two-level scan
    // — hash equality proves the rewrite. Exact integers until one
    // final division (doubled numerator carries tie halves exactly).
    "corpus_auc" -> s"""
WITH $toksCte${OraclesExt.clsScCtes},
$qualityMCte,
cl AS (
  SELECT doc_id, round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score
  FROM sc),
kp AS (SELECT doc_id, $qKeepExpr AS keep FROM m),
j AS (SELECT score, keep FROM cl JOIN kp USING (doc_id)),
byscore AS (
  SELECT score,
    count(*) FILTER (keep)::BIGINT AS n1,
    count(*) FILTER (NOT keep)::BIGINT AS n0
  FROM j GROUP BY 1),
cum AS (
  SELECT score, n1, n0,
    coalesce(CAST(sum(n0) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      0) AS below
  FROM byscore),
t AS (
  SELECT CAST(sum(n1) AS BIGINT) AS n_pos,
    CAST(sum(n0) AS BIGINT) AS n_neg,
    count(*)::BIGINT AS n_scores,
    CAST(CAST(sum(n1 * (2 * below + n0)) AS VARCHAR) AS DOUBLE)
      AS numer2
  FROM cum)
SELECT n_pos, n_neg, n_scores,
  round(numer2 / (CASE WHEN 2.0 * CAST(n_pos AS DOUBLE) *
      CAST(n_neg AS DOUBLE) <> 0.0
    THEN 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) END), 6)
    AS auc,
  round(2.0 * (numer2 / (CASE WHEN 2.0 * CAST(n_pos AS DOUBLE) *
      CAST(n_neg AS DOUBLE) <> 0.0
    THEN 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) END))
    - 1.0, 6) AS gini_coef
FROM t""",
    // expected calibration error + Brier score: exact integer bin
    // cells, 1e-6-grid score sums, pinned per-bin gap terms crossed
    // to the DECIMAL(38,18) grid (VARCHAR-mediated where magnitudes
    // demand) before the bounded-grid sum
    "corpus_ece" -> s"""
WITH $toksCte${OraclesExt.clsScCtes},
$qualityMCte,
cl AS (
  SELECT doc_id, round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score
  FROM sc),
kp AS (SELECT doc_id, $qKeepExpr AS keep FROM m),
j AS (
  SELECT score, keep,
    CAST(least(floor(score * 10), 9) AS BIGINT) AS bucket,
    score - (CASE WHEN keep THEN 1.0 ELSE 0.0 END) AS err
  FROM cl JOIN kp USING (doc_id)),
bins AS (
  SELECT bucket, count(*)::BIGINT AS n_b,
    count(*) FILTER (keep)::BIGINT AS n_keep,
    CAST(CAST(sum(score::DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
      AS s_score
  FROM j GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS n,
    CAST(CAST(sum(CAST(err * err AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sq_err
  FROM j),
s AS (
  SELECT max(n) AS n_docs, count(*)::BIGINT AS n_bins,
    CAST(CAST(sum(CAST((CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE)) *
      abs(CAST(n_keep AS DOUBLE) / CAST(n_b AS DOUBLE) -
        s_score / CAST(n_b AS DOUBLE)) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS ece_raw,
    max(abs(CAST(n_keep AS DOUBLE) / CAST(n_b AS DOUBLE) -
      s_score / CAST(n_b AS DOUBLE))) AS max_gap_raw,
    max(sq_err / CAST(n AS DOUBLE)) AS brier_raw
  FROM bins CROSS JOIN tot)
SELECT n_docs, n_bins, round(ece_raw, 6) AS ece,
  round(max_gap_raw, 6) AS max_gap, round(brier_raw, 6) AS brier
FROM s""",
    // Cohen's kappa: classifier keep-vote vs rule-based keep label —
    // exact 2x2 integer cells, one double division per rate, NULL-
    // guarded 1-p_e divisor (matches the Spark side's CSE-safe guard)
    "corpus_kappa" -> s"""
WITH $toksCte${OraclesExt.clsScCtes},
$qualityMCte,
cl AS (
  SELECT doc_id,
    round(1.0 / (1.0 + exp(-margin * 10)), 6) >=
      ${Curation.kappaClsThreshold} AS cls_keep
  FROM sc),
kp AS (SELECT doc_id, $qKeepExpr AS keep FROM m),
cells AS (
  SELECT count(*)::BIGINT AS n_docs,
    count(*) FILTER (cls_keep AND keep)::BIGINT AS n_both_keep,
    count(*) FILTER (cls_keep AND NOT keep)::BIGINT AS n_cls_only,
    count(*) FILTER (NOT cls_keep AND keep)::BIGINT AS n_rule_only,
    count(*) FILTER (NOT cls_keep AND NOT keep)::BIGINT AS n_both_drop
  FROM cl JOIN kp USING (doc_id)),
pp AS (
  SELECT *,
    (n_both_keep + n_both_drop)::DOUBLE / n_docs AS po,
    ((n_both_keep + n_cls_only) * (n_both_keep + n_rule_only) +
     (n_rule_only + n_both_drop) * (n_cls_only + n_both_drop))::DOUBLE /
      (n_docs * n_docs) AS pe
  FROM cells)
SELECT n_docs, n_both_keep, n_cls_only, n_rule_only, n_both_drop,
  round(po, 6) AS p_o, round(pe, 6) AS p_e,
  round((po - pe) / (CASE WHEN 1.0 - pe <> 0.0 THEN 1.0 - pe END), 6)
    AS kappa
FROM pp""",
    // doc-length Gini: oracle states the plain global rank; the engine
    // runs the banded two-level scan — hash equality proves it
    "corpus_length_gini" -> s"""
WITH $toksCte,
l AS (SELECT doc_id, len(tk)::BIGINT AS nt FROM toks),
r AS (
  SELECT nt, row_number() OVER (ORDER BY nt, doc_id)::BIGINT AS rank
  FROM l)
SELECT count(*)::BIGINT AS n_docs,
  CAST(sum(nt) AS BIGINT) AS total_tokens,
  round(2.0 * CAST(sum(nt * rank) AS DOUBLE) /
      (count(*) * CAST(sum(nt) AS DOUBLE)) -
    CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS length_gini
FROM r""",
    // deterministic Poisson bootstrap: salted-hash uniforms, shared
    // Poisson(1) CDF literals, exact integer weighted sums
    "sample_bootstrap_ci" -> {
      val cumCase = Curation.poissonCum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"""
WITH $toksCte,
lens AS (SELECT doc_id, len(tk)::BIGINT AS l FROM toks),
reps AS (
  SELECT doc_id, l, unnest(range(${Curation.BootstrapReps})) AS rep
  FROM lens),
uw AS (
  SELECT rep, l,
    ('0x' || substr(md5('${Curation.bootSalt}' || rep::VARCHAR || ':' ||
      doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0 AS u
  FROM reps),
ww AS (
  SELECT rep, l,
    CAST(CASE $cumCase ELSE ${Curation.poissonCum.length} END AS BIGINT)
      AS w
  FROM uw)
SELECT CAST(rep AS BIGINT) AS replicate,
  CAST(sum(w) AS BIGINT) AS n_eff,
  CASE WHEN sum(w) > 0 THEN
    round(CAST(sum(w * l) AS DOUBLE) / sum(w), 6) END AS mean_len
FROM ww GROUP BY rep ORDER BY replicate"""
    },
    // Neyman stratified allocation: integer length moments, 1e-6-grid
    // N_h*S_h normalizer, pinned-order shares
    "sample_neyman" -> s"""
WITH $toksCte,
m AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    CAST(sum(len(tk)) AS BIGINT) AS s1,
    CAST(sum(len(tk)::BIGINT * len(tk)::BIGINT) AS BIGINT) AS s2
  FROM toks GROUP BY 1),
sc AS (
  SELECT source, n_docs,
    round(sqrt(greatest(
      s2 / CAST(n_docs AS DOUBLE) -
        (s1 / CAST(n_docs AS DOUBLE)) * (s1 / CAST(n_docs AS DOUBLE)),
      0.0)), 6) AS sd_len,
    CAST(round(CAST(n_docs AS DOUBLE) * sqrt(greatest(
      s2 / CAST(n_docs AS DOUBLE) -
        (s1 / CAST(n_docs AS DOUBLE)) * (s1 / CAST(n_docs AS DOUBLE)),
      0.0)), 6) AS DECIMAL(28,6)) AS nhsh
  FROM m),
t AS (
  SELECT CAST(sum(nhsh) AS DECIMAL(38,6)) AS tot_nhsh,
    CAST(sum(n_docs) AS BIGINT) AS tot_docs
  FROM sc)
SELECT source, n_docs, sd_len,
  round(n_docs::DOUBLE / tot_docs, 6) AS prop_share,
  round(CAST(nhsh AS DOUBLE) / CAST(tot_nhsh AS DOUBLE), 6)
    AS neyman_share,
  round(CAST(nhsh AS DOUBLE) / CAST(tot_nhsh AS DOUBLE) *
    ${Curation.NeymanSampleSize}, 2) AS alloc
FROM sc CROSS JOIN t ORDER BY source""",
    // deterministic priority (bottom-k) sample: salted-hash priority,
    // stated tie rule, rank over the k-row slice
    "sample_reservoir" -> s"""
SELECT doc_id, lang, source, priority,
  row_number() OVER (ORDER BY priority, doc_id)::BIGINT AS rank
FROM (
  SELECT doc_id, lang, source, $sampleKeySql AS priority
  FROM documents)
QUALIFY row_number() OVER (ORDER BY priority, doc_id)
  <= ${Curation.ReservoirK}
ORDER BY rank""",
    // temperature-scaled source mix: n^alpha stated as exp(alpha*ln n)
    // on proven-parity doubles, 1e-6-grid masses, exact decimal
    // normalizers (the neyman recipe)
    "corpus_temperature_mix" -> {
      val a = graft.operators.Curation.MixAlphas
      s"""
WITH $toksCte,
per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    CAST(sum(len(tk)) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1),
sc AS (
  -- zero-token source => mass 0 (ln arg NULL-guarded, NULL coalesces)
  SELECT source, n_docs, n_tokens,
    CAST(round(coalesce(exp(${a(0)} * ln(CASE WHEN n_tokens > 0
      THEN CAST(n_tokens AS DOUBLE) END)), 0.0), 6)
      AS DECIMAL(28,6)) AS m03,
    CAST(round(coalesce(exp(${a(1)} * ln(CASE WHEN n_tokens > 0
      THEN CAST(n_tokens AS DOUBLE) END)), 0.0), 6)
      AS DECIMAL(28,6)) AS m05,
    CAST(round(coalesce(exp(${a(2)} * ln(CASE WHEN n_tokens > 0
      THEN CAST(n_tokens AS DOUBLE) END)), 0.0), 6)
      AS DECIMAL(28,6)) AS m07
  FROM per),
t AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
    CAST(sum(m03) AS DECIMAL(38,6)) AS t03,
    CAST(sum(m05) AS DECIMAL(38,6)) AS t05,
    CAST(sum(m07) AS DECIMAL(38,6)) AS t07
  FROM sc)
SELECT source, n_docs, n_tokens,
  round(n_tokens / CAST(tot_tokens AS DOUBLE), 6) AS share,
  round(CAST(m03 AS DOUBLE) / CAST(t03 AS DOUBLE), 6) AS w_t03,
  round(CAST(m05 AS DOUBLE) / CAST(t05 AS DOUBLE), 6) AS w_t05,
  round(CAST(m07 AS DOUBLE) / CAST(t07 AS DOUBLE), 6) AS w_t07
FROM sc CROSS JOIN t ORDER BY source"""
    },
    // data-constrained token-epochs plan: sqrt-tempered source weights
    // (decimal-grid normalizer), budget allocation, epoch counts
    "corpus_token_epochs" -> s"""
WITH $toksCte,
ps AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    sum(len(tk))::BIGINT AS n_tokens
  FROM toks GROUP BY 1),
tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM ps),
tp AS (
  SELECT source, n_docs, n_tokens,
    n_tokens::DOUBLE / total_tokens AS share,
    sqrt(n_tokens::DOUBLE / total_tokens) AS tw
  FROM ps CROSS JOIN tt),
nz AS (SELECT CAST(CAST(sum(CAST(tw AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS z
  FROM tp)
SELECT source, n_docs, n_tokens,
  round(share, 6) AS share,
  round(tw / z, 6) AS weight,
  round(tw / z * ${Curation.EpochTokenBudget}, 2) AS alloc_tokens,
  round(tw / z * ${Curation.EpochTokenBudget} / n_tokens, 6) AS epochs,
  (tw / z * ${Curation.EpochTokenBudget} / n_tokens >
    ${Curation.EpochRepeatCap}) AS over_cap
FROM tp CROSS JOIN nz ORDER BY source""",
    // classifier decile lift/gains: quantile_cont thresholds (the
    // engine's banded exact percentiles), integer counts, pinned-order
    // capture/lift ratios over the ten aggregate rows
    "corpus_lift_table" -> {
      val decileExpr = (1 to 9).map(i =>
        s"CASE WHEN scd.score >= (SELECT quantile_cont(score, 0.$i) " +
          "FROM scd) THEN 1 ELSE 0 END").mkString(" + ")
      s"""
WITH $toksCte${OraclesExt.clsScCtes},
$qualityMCte,
scd AS (
  SELECT doc_id, round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score
  FROM sc),
kp AS (SELECT doc_id, $qKeepExpr AS keep FROM m),
bkt AS (
  SELECT kp.keep, ($decileExpr)::BIGINT AS decile
  FROM scd JOIN kp USING (doc_id)),
c AS (
  SELECT decile, count(*)::BIGINT AS n_docs,
    count(*) FILTER (keep)::BIGINT AS n_pos
  FROM bkt GROUP BY 1),
t AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
    CAST(sum(n_pos) AS BIGINT) AS tot_pos
  FROM c)
SELECT decile, n_docs, n_pos,
  round(n_pos::DOUBLE / n_docs, 6) AS pos_rate,
  CASE WHEN tot_pos > 0 THEN
    round(CAST(sum(n_pos) OVER cw AS DOUBLE) / tot_pos, 6)
  END AS cum_capture,
  CASE WHEN tot_pos > 0 THEN
    round((CAST(sum(n_pos) OVER cw AS DOUBLE) / tot_pos) /
      (CAST(sum(n_docs) OVER cw AS DOUBLE) / tot_docs), 6)
  END AS lift
FROM c CROSS JOIN t
WINDOW cw AS (ORDER BY decile DESC ROWS BETWEEN UNBOUNDED PRECEDING
  AND CURRENT ROW)
ORDER BY decile DESC"""
    },
    // length-distribution PSI between corpus halves: fixed char-bin
    // buckets, Laplace-smoothed shares, terms summed on the 1e-10 grid
    "corpus_length_psi" -> {
      val bw = graft.operators.Curation.PsiBucketChars
      val cap = graft.operators.Curation.PsiMaxBucket
      s"""
WITH md AS (SELECT max(doc_id) AS max_doc FROM documents),
b AS (
  SELECT CAST(least(floor(n_chars / $bw), $cap) AS BIGINT) AS bucket,
    (doc_id * 2 <= max_doc) AS is_ref
  FROM documents CROSS JOIN md),
counts AS (
  SELECT bucket,
    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM b GROUP BY 1),
tots AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
    CAST(sum(n_cur) AS BIGINT) AS tot_cur, count(*)::BIGINT AS nb
  FROM counts),
terms AS (
  SELECT bucket, n_ref, n_cur,
    (n_ref + 0.5) / (tot_ref + 0.5 * nb) AS p,
    (n_cur + 0.5) / (tot_cur + 0.5 * nb) AS q
  FROM counts CROSS JOIN tots),
wt AS (
  SELECT bucket, n_ref, n_cur, round(p, 6) AS p_ref, round(q, 6) AS p_cur,
    round((p - q) * ln(p / q), 6) AS psi_term,
    CAST(round((p - q) * ln(p / q), 10) AS DECIMAL(18,10)) AS t10
  FROM terms),
tot AS (SELECT round(CAST(sum(t10) AS DOUBLE), 6) AS psi_total FROM wt)
SELECT bucket, n_ref, n_cur, p_ref, p_cur, psi_term, psi_total
FROM wt CROSS JOIN tot ORDER BY bucket"""
    },
    "corpus_signal_ensemble" -> ensembleSql,
    // order-insensitive manifest: bit_xor of per-doc content hashes
    "corpus_checksum" -> s"""
WITH $toksCte,
h AS (
  SELECT doc_id,
    ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 8))::BIGINT AS h,
    len(tk)::BIGINT AS n_tokens
  FROM toks)
SELECT count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
  bit_xor(h)::BIGINT AS content_xor,
  bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' || h::VARCHAR), 1, 8))::BIGINT)::BIGINT
    AS content_id_xor
FROM h""",
    // temperature mixture plan: T=2 => sqrt tempering (IEEE-exact in
    // both engines); the normalizer sums 12-decimal-truncated weights
    // so it is order-independent, mirroring the Spark decimal sum
    "corpus_mixture_plan" -> s"""
WITH $toksCte,
pl AS (
  SELECT lang, count(*)::BIGINT AS n_docs, sum(len(tk))::BIGINT AS n_tokens
  FROM toks GROUP BY lang),
tt AS (SELECT sum(n_tokens)::BIGINT AS total_tokens FROM pl),
tp AS (
  SELECT lang, n_docs, n_tokens,
    n_tokens::DOUBLE / total_tokens AS share,
    sqrt(n_tokens::DOUBLE / total_tokens) AS tw
  FROM pl CROSS JOIN tt),
nz AS (SELECT CAST(CAST(sum(CAST(tw AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS z FROM tp)
SELECT lang, n_docs, n_tokens,
  round(share, 6) AS share,
  round(tw / z, 6) AS tempered_share,
  round(tw / z / share, 6) AS sample_factor
FROM tp CROSS JOIN nz ORDER BY lang""",
    "text_quality_filter" -> s"""
WITH $toksCte,
$qualityMCte
SELECT doc_id, n_tokens, mean_word_len, punct_ratio, n_stopwords,
  (n_tokens >= ${Curation.minTokens} AND n_tokens <= ${Curation.maxTokens}) AS r_token_count,
  (mean_word_len >= ${Curation.minMeanWordLen} AND mean_word_len <= ${Curation.maxMeanWordLen}) AS r_mean_word_len,
  (punct_ratio <= ${Curation.maxPunctRatio}) AS r_punct_ratio,
  (n_stopwords >= ${Curation.minStopwords}) AS r_stopwords,
  (r_token_count AND r_mean_word_len AND r_punct_ratio AND r_stopwords) AS keep
FROM m ORDER BY doc_id""",
    // Pareto frontier: pure NOT-EXISTS dominance semantics — the
    // engine's banded running-max plan must hash-match this
    "corpus_pareto_docs" -> s"""
WITH $toksCte,
$qualityMCte,
sig AS (
  SELECT d.lang, m.doc_id, m.n_tokens, m.punct_ratio
  FROM m JOIN documents d ON m.doc_id = d.doc_id)
SELECT lang, doc_id, n_tokens, punct_ratio
FROM sig s1
WHERE NOT EXISTS (
  SELECT 1 FROM sig s2
  WHERE s2.lang = s1.lang
    AND s2.punct_ratio <= s1.punct_ratio
    AND s2.n_tokens >= s1.n_tokens
    AND (s2.punct_ratio < s1.punct_ratio OR s2.n_tokens > s1.n_tokens))
ORDER BY lang, punct_ratio, doc_id""",
    "corpus_report" -> s"""
WITH $toksCte,
$qualityMCte,
fp AS (
  SELECT doc_id,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
  FROM documents),
ff AS (SELECT f, min(doc_id) AS first_doc FROM fp GROUP BY f),
du AS (SELECT doc_id, (fp.doc_id <> ff.first_doc) AS is_dup
  FROM fp JOIN ff USING (f))
SELECT d.lang, d.source, count(*)::BIGINT AS n_docs,
  sum(m.n_tokens)::BIGINT AS total_tokens,
  round(avg(CASE WHEN $qKeepExpr THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END), 6)
    AS quality_keep_rate,
  round(avg(CASE WHEN is_dup THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END), 6)
    AS dup_rate
FROM documents d JOIN m ON d.doc_id = m.doc_id JOIN du ON d.doc_id = du.doc_id
GROUP BY d.lang, d.source ORDER BY d.lang, d.source""",
    "text_length_adaptive" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, lang, len(tk)::BIGINT AS n_tokens FROM toks),
b AS (
  SELECT lang,
    round(quantile_cont(n_tokens, 0.05)::DOUBLE, 6) AS p5,
    round(quantile_cont(n_tokens, 0.95)::DOUBLE, 6) AS p95
  FROM t GROUP BY lang)
SELECT doc_id, t.lang, n_tokens, p5, p95,
  (n_tokens >= p5 AND n_tokens <= p95) AS keep
FROM t JOIN b ON t.lang = b.lang ORDER BY doc_id""",
    "text_repetition" -> s"""
WITH $toksCte,
tok AS (SELECT doc_id, unnest(tk) AS g FROM toks),
tpc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY doc_id, g),
tagg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_token, count(*)::BIGINT AS nd,
    max(c)::BIGINT AS tc
  FROM tpc GROUP BY doc_id),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk), 1)),
    i -> tk[i] || ' ' || tk[i+1])) AS g
  FROM toks WHERE len(tk) >= 2),
bpc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bagg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_bigram, count(*)::BIGINT AS nd,
    max(c)::BIGINT AS tc
  FROM bpc GROUP BY doc_id)
SELECT t.doc_id,
  t.n_token,
  round((t.n_token - t.nd)::DOUBLE / t.n_token, 6) AS dup_token_ratio,
  round(t.tc::DOUBLE / t.n_token, 6) AS top_token_ratio,
  b.n_bigram,
  round((b.n_bigram - b.nd)::DOUBLE / b.n_bigram, 6) AS dup_bigram_ratio,
  round(b.tc::DOUBLE / b.n_bigram, 6) AS top_bigram_ratio
FROM tagg t LEFT JOIN bagg b USING (doc_id)
ORDER BY doc_id""",
    "text_decontaminate" -> (s"\nWITH ${OraclesExt.shinglesCte},\n" + """
ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
tr AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 20),
cnt AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM tr GROUP BY doc_id),
hit AS (
  SELECT tr.doc_id, count(*)::BIGINT AS n_eval_sh
  FROM tr JOIN ev USING (sh) GROUP BY tr.doc_id)
SELECT c.doc_id, c.n_sh,
  coalesce(h.n_eval_sh, 0)::BIGINT AS n_eval_sh,
  round(coalesce(h.n_eval_sh, 0)::DOUBLE / c.n_sh, 6) AS contamination,
  (round(coalesce(h.n_eval_sh, 0)::DOUBLE / c.n_sh, 6) >= 0.5) AS flagged
FROM cnt c LEFT JOIN hit h USING (doc_id)
ORDER BY doc_id"""),
    // Bloom variant: SAME exact SQL — no false negatives means the
    // Bloom-prefiltered engine result must hash-match the plain form
    "text_decontaminate_bloom" -> (s"\nWITH ${OraclesExt.shinglesCte},\n" + """
ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
tr AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 20),
cnt AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM tr GROUP BY doc_id),
hit AS (
  SELECT tr.doc_id, count(*)::BIGINT AS n_eval_sh
  FROM tr JOIN ev USING (sh) GROUP BY tr.doc_id)
SELECT c.doc_id, c.n_sh,
  coalesce(h.n_eval_sh, 0)::BIGINT AS n_eval_sh,
  round(coalesce(h.n_eval_sh, 0)::DOUBLE / c.n_sh, 6) AS contamination,
  (round(coalesce(h.n_eval_sh, 0)::DOUBLE / c.n_sh, 6) >= 0.5) AS flagged
FROM cnt c LEFT JOIN hit h USING (doc_id)
ORDER BY doc_id"""),
    // The capstone: quality gate AND exact-dup representative AND
    // near-dup cluster representative AND decontaminated — assembled
    // from the same CTE fragments the individual oracles use.
    "corpus_curated" -> (
      OraclesExt.minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
$qualityMCte,
qm AS (SELECT doc_id, $qKeepExpr AS q_keep FROM m),
exr AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
dev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
dtr AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 20),
dcnt AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM dtr GROUP BY doc_id),
dhit AS (
  SELECT dtr.doc_id, count(*)::BIGINT AS n_eval_sh
  FROM dtr JOIN dev USING (sh) GROUP BY dtr.doc_id),
dc AS (
  SELECT c.doc_id,
    (round(coalesce(h.n_eval_sh, 0)::DOUBLE / c.n_sh, 6) >= 0.5) AS flagged
  FROM dcnt c LEFT JOIN dhit h USING (doc_id))
SELECT d.doc_id, d.lang, d.source,
  qm.q_keep AS q_keep,
  (exr.doc_id IS NOT NULL) AS is_exact_rep,
  coalesce(cl.cluster_id = d.doc_id, TRUE) AS near_dup_rep,
  coalesce(NOT dc.flagged, TRUE) AS decontaminated,
  (qm.q_keep AND exr.doc_id IS NOT NULL
   AND coalesce(cl.cluster_id = d.doc_id, TRUE)
   AND coalesce(NOT dc.flagged, TRUE)) AS keep
FROM documents d
JOIN qm USING (doc_id)
LEFT JOIN exr ON d.doc_id = exr.doc_id
LEFT JOIN cl ON d.doc_id = cl.doc_id
LEFT JOIN dc ON d.doc_id = dc.doc_id
ORDER BY doc_id"""),
    "pii_scan" -> s"""
WITH aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN
      text || ' contact user' || doc_id::VARCHAR || '@example.com phone 555-'
        || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        || ' ip 10.' || (doc_id % 200)::VARCHAR || '.0.1'
    ELSE text END AS txt
  FROM documents),
m AS (
  SELECT doc_id,
    len(regexp_extract_all(txt, '${Curation.emailPattern}'))::BIGINT AS n_emails,
    len(regexp_extract_all(txt, '${Curation.phonePattern}'))::BIGINT AS n_phones,
    len(regexp_extract_all(txt, '${Curation.ipPattern}'))::BIGINT AS n_ips,
    regexp_replace(
      regexp_replace(
        regexp_replace(txt, '${Curation.emailPattern}', '<EMAIL>', 'g'),
        '${Curation.phonePattern}', '<PHONE>', 'g'),
      '${Curation.ipPattern}', '<IP>', 'g') AS redacted
  FROM aug)
SELECT doc_id, n_emails, n_phones, n_ips,
  (n_emails + n_phones + n_ips > 0) AS has_pii, redacted
FROM m ORDER BY doc_id""",
    "sample_bernoulli" -> s"""
SELECT doc_id, lang, source, sample_bucket FROM (
  SELECT doc_id, lang, source, $sampleKeySql % 100 AS sample_bucket
  FROM documents)
WHERE sample_bucket < 20 ORDER BY doc_id""",
    // systematic sampling: NAIVE global rank over the salted hash
    // order (engine runs the banded scan), every k-th row
    "sample_systematic" -> s"""
WITH base AS (
  SELECT doc_id, lang, source,
    CAST(('0x' || substr(md5('${Curation.sysSalt}' ||
      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM documents),
rk AS (
  SELECT doc_id, lang, source,
    row_number() OVER (ORDER BY h, doc_id)::BIGINT AS rank
  FROM base)
SELECT doc_id, lang, source, rank FROM rk
WHERE (rank - 1) % ${Curation.sysK} = 0 ORDER BY rank""",
    "sample_mixture" -> s"""
SELECT doc_id, lang, source, mix_bucket, n_copies, copy_id FROM (
  SELECT doc_id, lang, source, mix_bucket, n_copies,
    unnest(range(1, n_copies + 1)) AS copy_id
  FROM (
    SELECT doc_id, lang, source, mix_bucket,
      ((rate // 100) + CASE WHEN mix_bucket < rate % 100 THEN 1 ELSE 0 END)::BIGINT AS n_copies
    FROM (
      SELECT doc_id, lang, source,
        ('0x' || substr(md5('${Curation.mixSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS mix_bucket,
        CASE ${Curation.mixWeights.map { case (s, w) => s"WHEN source = '$s' THEN $w" }
          .mkString("\n             ")}
             ELSE ${Curation.mixDefaultPct} END AS rate
      FROM documents)))
ORDER BY doc_id, copy_id""",
    "sample_stratified" -> s"""
SELECT lang, doc_id, sample_key, rn FROM (
  SELECT lang, doc_id, sample_key,
    row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id)::BIGINT AS rn
  FROM (SELECT lang, doc_id, $sampleKeySql AS sample_key FROM documents))
WHERE rn <= 25 ORDER BY lang, rn""",
    // token-budget greedy selection: classifier-score ranking × BPE
    // subword costs, running total in (score DESC, doc_id) order — the
    // oracle's global window states what the engine's two-level
    // score-band scan computes. Version-proofed after the round-4
    // driver divergence: (1) cum_subwords is cast ::BIGINT (DuckDB's
    // HUGEINT window sum converts to pandas float64, hash-mismatching
    // the engine's int64); (2) the classifier margin is restated in
    // exact integer arithmetic — sum the BIGINT weight numerators via
    // a plain join, divide once at the end — because w(j) = k_j/p − ½
    // makes Σw = (Σk)/p − n/2 EXACT, with no list_reduce/list_transform
    // lambdas referencing outer rows (the construct DuckDB versions
    // disagree on); (3) the BPE recursion runs per DISTINCT token;
    // (4) zero-token docs survive via LEFT JOIN + coalesce.
    "corpus_budget_select" -> s"""
WITH RECURSIVE $toksCte${OraclesPacking.bpeDistinctTotalsCtes},
wt AS (
  SELECT j + 1 AS idx,
    ((${TextAnalysis.clsCoeffs._1} * (j + 1) + ${TextAnalysis.clsCoeffs._2}) % ${graft.functions.Portable.P31})::BIGINT AS num
  FROM range(${TextAnalysis.clsDim}) t(j)),
tb AS (
  SELECT doc_id, (('0x' || substr(md5(w), 1, 8))::BIGINT % ${TextAnalysis.clsDim} + 1) AS idx
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks)),
ms AS (
  SELECT tb.doc_id, count(*)::BIGINT AS n_tokens, sum(wt.num)::BIGINT AS wsum
  FROM tb JOIN wt USING (idx) GROUP BY tb.doc_id),
s AS (
  SELECT ms.doc_id,
    round(1.0 / (1.0 + exp(-round((wsum::DOUBLE / ${graft.functions.Portable.P31} - 0.5 * n_tokens) / n_tokens, 6) * 10)), 6) AS score,
    coalesce(bpc.n_subwords, 0)::BIGINT AS n_subwords
  FROM ms LEFT JOIN bpc ON ms.doc_id = bpc.doc_id),
c AS (
  SELECT doc_id, score, n_subwords,
    sum(n_subwords) OVER (ORDER BY score DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_subwords
  FROM s)
SELECT doc_id, score, n_subwords, cum_subwords,
  (cum_subwords <= ${Curation.selectBudget}) AS selected
FROM c ORDER BY doc_id""",
    // CDC/MERGE action plan: same deterministic incoming snapshot, one
    // full-outer hash-compare join
    "corpus_upsert_plan" -> """
WITH inc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 NOT IN (0, 5)
  UNION ALL
  SELECT doc_id, text || ' [rev2]' FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 3),
c AS (SELECT doc_id, md5(text) AS cur_hash FROM documents),
i AS (SELECT doc_id, md5(text) AS inc_hash FROM inc)
SELECT coalesce(c.doc_id, i.doc_id) AS doc_id,
  CASE WHEN c.doc_id IS NULL THEN 'insert'
       WHEN i.doc_id IS NULL THEN 'delete'
       WHEN cur_hash IS NOT DISTINCT FROM inc_hash THEN 'unchanged'
       ELSE 'update' END AS action
FROM c FULL OUTER JOIN i ON c.doc_id = i.doc_id
ORDER BY doc_id""",
    // score-proportional sampling: accept iff the salted uniform draw
    // on [0, 2^32) falls under score * 2^32 (same hash, same sigmoid)
    "sample_weighted" -> s"""
WITH $toksCte${OraclesExt.clsScCtes}
SELECT doc_id, round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score,
  ('0x' || substr(md5('${Curation.weightedSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT AS accept_key,
  ('0x' || substr(md5('${Curation.weightedSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
    < round(1.0 / (1.0 + exp(-margin * 10)), 6) * 4294967296.0 AS accepted
FROM sc ORDER BY doc_id""",
    // curriculum schedule: exact global rank by score (the oracle's
    // global row_number states what the engine's two-level score-band
    // scan computes), equal-stage mapping, salted within-stage key
    "corpus_curriculum" -> s"""
WITH $toksCte${OraclesExt.clsScCtes},
r AS (
  SELECT doc_id, round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score
  FROM sc),
rk AS (
  SELECT doc_id, score,
    row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
    count(*) OVER ()::BIGINT AS n_docs
  FROM r)
SELECT doc_id, score, rank,
  ((rank - 1) * ${Curation.curriculumStages}) // n_docs AS stage,
  ('0x' || substr(md5('${Curation.curriculumSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT AS stage_key
FROM rk ORDER BY doc_id""",
    // Chinchilla compute-optimal budget table: closed-form doubles off
    // one exact token count, giant counts rounded at integer precision
    "corpus_chinchilla" -> {
      val budgets = Curation.ChinchillaBudgets
        .map(_.toString).mkString("[", "::DOUBLE, ", "::DOUBLE]")
      val denom = Curation.ChinchillaFlopsPerTokenParam *
        Curation.ChinchillaTokensPerParam
      val tpp = Curation.ChinchillaTokensPerParam
      s"""
WITH $toksCte,
tot AS (
  SELECT count(*)::BIGINT AS n_docs,
    CAST(sum(len(tk)) AS BIGINT) AS corpus_tokens
  FROM toks),
g AS (SELECT unnest($budgets) AS flops),
r AS (
  SELECT flops,
    round(sqrt(flops / $denom), 0) AS n_params_opt,
    round($tpp * sqrt(flops / $denom), 0) AS d_tokens_opt,
    corpus_tokens,
    round($tpp * sqrt(flops / $denom) / corpus_tokens::DOUBLE, 6)
      AS epochs_needed
  FROM g CROSS JOIN tot)
SELECT flops, n_params_opt, d_tokens_opt, corpus_tokens, epochs_needed,
  epochs_needed <= ${Curation.EpochRepeatCap} AS feasible
FROM r ORDER BY flops"""
    },
  )
}
