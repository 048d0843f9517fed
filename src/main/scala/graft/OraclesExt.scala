package graft

import graft.operators.{Dedup, TextAnalysis}

/** DuckDB oracle SQL for the text-analysis / dedup / similarity
  * operators. Generated from the same Scala constants the Spark side
  * uses ([[TextAnalysis.markers]], [[TextAnalysis.stopwords]],
  * [[Dedup.coeffs]]) so formulas and hash coefficients can never drift.
  *
  * Portability contract (tested): md5 hex is lowercase in both engines;
  * `('0x'||substr(md5(x),1,8))::BIGINT` = Spark `conv(substring(md5(x),
  * 1,8),16,10)::long`; DuckDB `regexp_replace(...,'g')` = Spark's
  * always-global `regexp_replace`; DuckDB parallel `unnest`s zip like
  * Spark `posexplode`; `list_inner_product(DOUBLE[])` sums sequentially
  * like Spark's `aggregate` HOF. */
object OraclesExt {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private val toksCte =
    "toks AS (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)"

  /** Bigram-LM perplexity CTE chain ending in `pp` (doc_id, n_bigrams,
    * perplexity) — shared by text_perplexity and the CCNet tercile
    * partition so the LM definition cannot drift between them. */
  private lazy val perplexityCtes = s"""$toksCte,
bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
  FROM toks WHERE len(tk) >= 2),
lm AS (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY w1, w2
  HAVING count(*) >= ${graft.operators.TextAnalysis.ppMinCount}),
c1 AS (SELECT w1, count(*)::BIGINT AS cnt1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT t)::BIGINT AS n_vocab
  FROM (SELECT unnest(tk) AS t FROM toks)),
scored AS (
  SELECT doc_id,
    ln((coalesce(c12, 0) + ${graft.operators.TextAnalysis.ppK}) /
       (cnt1 + ${graft.operators.TextAnalysis.ppK} * n_vocab)) AS lp
  FROM bg LEFT JOIN lm USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
pp AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
    round(exp(-sum(lp) / count(*)), 6) AS perplexity
  FROM scored GROUP BY doc_id)"""

  /** Hashed-classifier margin CTE chain (`w`, `sc`) — identical
    * weight-table formula, token bucketing and sequential fold as
    * [[graft.operators.TextAnalysis.clsMargin]]. Requires `toks` in
    * scope; shared by `text_classifier` and the budget selection. */
  private[graft] val clsScCtes = s""",
w AS (
  SELECT list(((${TextAnalysis.clsCoeffs._1} * (j + 1) + ${TextAnalysis.clsCoeffs._2}) % ${graft.functions.Portable.P31})::DOUBLE
    / ${graft.functions.Portable.P31} - 0.5 ORDER BY j) AS wv
  FROM range(${TextAnalysis.clsDim}) t(j)),
sc AS (
  SELECT doc_id, len(tk)::BIGINT AS n_tokens,
    round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(tk,
      t -> wv[(('0x' || substr(md5(t), 1, 8))::BIGINT % ${TextAnalysis.clsDim} + 1)::INT])),
      (acc, x) -> acc + x) / len(tk), 6) AS margin
  FROM toks CROSS JOIN w)"""

  // ---------------- text analysis ----------------

  private val langCountExprs: String = TextAnalysis.markers.map {
    case (l, ws) => s"len(list_filter(tk, t -> t IN ${inList(ws)})) AS c_$l"
  }.mkString(",\n    ")

  private val textStatsCte = s"""
WITH $toksCte,
raw AS (
  SELECT doc_id, lang,
    len(tk)::BIGINT AS n_tokens,
    len(regexp_extract_all(text, '${TextAnalysis.bpePattern}'))::BIGINT AS n_bpe_tokens,
    round(len(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len(tk), 4) AS avg_token_len,
    round(len(list_filter(tk, t -> t IN ${inList(TextAnalysis.stopwords)}))::DOUBLE / len(tk), 4) AS stopword_ratio,
    round(len(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))::DOUBLE / n_chars, 4) AS punct_ratio,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
    ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 8))::BIGINT AS fingerprint64,
    list_reduce(list_prepend(0::BIGINT, list_transform(tk,
      t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
      (acc, h) -> (acc * 31 + h) % ${graft.functions.Portable.P31}) AS fingerprint_roll,
    $langCountExprs
  FROM toks),
st AS (
  SELECT doc_id, lang,
    CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
         WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
         WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
         WHEN c_fr > 0 THEN 'fr'
         ELSE 'unk' END AS lang_pred,
    n_tokens, n_bpe_tokens, avg_token_len, stopword_ratio, punct_ratio,
    round(least(n_tokens / 100.0, 1.0) * 0.5 + stopword_ratio * 0.3 +
      (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6) AS quality_score,
    fingerprint, fingerprint64, fingerprint_roll
  FROM raw)
"""

  val text: Map[String, String] = Map(
    "text_stats" -> (textStatsCte + "SELECT * FROM st ORDER BY doc_id"),
    // Flesch scores from three integer counts; per-row double math in
    // the same textual order as the Spark expressions
    "text_readability" -> s"""
WITH $toksCte,
c AS (
  SELECT doc_id,
    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
      AS n_sentences,
    len(tk)::BIGINT AS n_words,
    CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
      AS BIGINT) AS n_syllables
  FROM toks)
SELECT doc_id, n_sentences, n_words, n_syllables,
  round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
    - 84.6 * (n_syllables::DOUBLE / n_words), 4) AS flesch,
  round(0.39 * (n_words::DOUBLE / n_sentences)
    + 11.8 * (n_syllables::DOUBLE / n_words) - 15.59, 4) AS fk_grade
FROM c ORDER BY doc_id""",
    // Zipf rank-frequency profile: per-row ratios over exact counts
    // BM25 against the fixed query terms: per-doc tf/length from one
    // exploded aggregate, one-row corpus stats, round-12 idf grid,
    // fixed term-order score sum, TakeOrdered top-k
    "text_bm25_top" -> {
      val terms = graft.operators.TextAnalysis.Bm25Terms
      val k1 = graft.operators.TextAnalysis.Bm25K1
      val b = graft.operators.TextAnalysis.Bm25B
      val tfs = terms.map(t =>
        s"CAST(sum(CASE WHEN token = '$t' THEN 1 ELSE 0 END)" +
          s" AS BIGINT) AS tf_$t").mkString(",\n    ")
      val dfs = terms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)" +
          s" AS BIGINT) AS df_$t").mkString(",\n    ")
      val score = terms.map { t =>
        s"round(ln((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE)" +
          s" + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0), 12) *\n" +
          s"    (CAST(tf_$t AS DOUBLE) * ${k1 + 1.0}) /\n" +
          s"    (CAST(tf_$t AS DOUBLE) + $k1 * (${1.0 - b} +\n" +
          s"      $b * CAST(dl AS DOUBLE) / avgdl))"
      }.mkString(" +\n  ")
      s"""
WITH ex AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
    AS token
  FROM documents),
pd AS (
  SELECT doc_id, count(*)::BIGINT AS dl,
    $tfs
  FROM ex GROUP BY 1),
st AS (
  SELECT count(*)::BIGINT AS n_docs,
    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
    $dfs
  FROM pd)
SELECT doc_id, dl,
  round($score, 6) AS score
FROM pd CROSS JOIN st
ORDER BY score DESC, doc_id
LIMIT ${graft.operators.TextAnalysis.bm25TopK}"""
    },
    // MI(lang, source): exact joint counts, round-12 log-term grid,
    // NMI normalized by the marginal-entropy geometric mean
    "text_mi_lang_source" -> """
WITH joint AS (
  SELECT lang, source, count(*)::BIGINT AS nls
  FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(sum(nls) AS BIGINT) AS n FROM joint),
ml AS (SELECT lang, CAST(sum(nls) AS BIGINT) AS nl
  FROM joint GROUP BY 1),
ms AS (SELECT source, CAST(sum(nls) AS BIGINT) AS ns
  FROM joint GROUP BY 1),
mi AS (
  SELECT CAST(CAST(sum(CAST(round(
    (CAST(nls AS DOUBLE) / CAST(n AS DOUBLE)) *
      ln((CAST(nls AS DOUBLE) / CAST(n AS DOUBLE)) /
        ((CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)) *
          (CAST(ns AS DOUBLE) / CAST(n AS DOUBLE)))), 12)
    AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS mi
  FROM joint JOIN ml USING (lang) JOIN ms USING (source)
  CROSS JOIN tot),
hl AS (
  SELECT CAST(CAST(sum(CAST(round(-((CAST(nl AS DOUBLE) /
      CAST(n AS DOUBLE)) * ln(CAST(nl AS DOUBLE) /
      CAST(n AS DOUBLE))), 12) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS hl
  FROM ml CROSS JOIN tot),
hs AS (
  SELECT CAST(CAST(sum(CAST(round(-((CAST(ns AS DOUBLE) /
      CAST(n AS DOUBLE)) * ln(CAST(ns AS DOUBLE) /
      CAST(n AS DOUBLE))), 12) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS hs
  FROM ms CROSS JOIN tot)
SELECT n AS n_docs, round(mi, 6) AS mi, round(hl, 6) AS h_lang,
  round(hs, 6) AS h_source,
  round(mi / (CASE WHEN hl * hs > 0.0 THEN sqrt(hl * hs) END), 6)
    AS nmi
FROM tot CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs""",
    // RAKE keywords: stopword-split phrase runs, degree/frequency word
    // scores (plain vocab join — engine runs hotColdJoin, hash proves
    // the rewrite), round-12 phrase-score grid, top-k release
    "text_rake" -> {
      val stopList = graft.operators.TextAnalysis.stopwords
        .map(s => s"'$s'").mkString(", ")
      s"""
WITH tk AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(text), '\\s+')) AS token,
    unnest(range(len(regexp_split_to_array(trim(text), '\\s+'))))
      AS pos
  FROM documents),
marked AS (
  SELECT doc_id, pos, token,
    sum(CASE WHEN token IN ($stopList) THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id,
    token IN ($stopList) AS is_stop
  FROM tk),
members AS (
  SELECT doc_id, pos, token, phrase_id FROM marked WHERE NOT is_stop),
wl AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, phrase_id) AS plen
  FROM members),
ws AS (
  SELECT token, count(*)::BIGINT AS freq,
    CAST(sum(plen) AS BIGINT) AS deg
  FROM wl GROUP BY 1),
ph AS (
  SELECT wl.doc_id, wl.phrase_id,
    string_agg(wl.token, ' ' ORDER BY wl.pos) AS phrase,
    count(*)::BIGINT AS n_words,
    CAST(CAST(sum(CAST(round(CAST(ws.deg AS DOUBLE) /
      CAST(ws.freq AS DOUBLE), 12) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
      AS score
  FROM wl JOIN ws ON wl.token = ws.token
  GROUP BY 1, 2),
gr AS (
  SELECT phrase, max(n_words) AS n_words, count(*)::BIGINT AS n_occur,
    max(score) AS score
  FROM ph GROUP BY 1)
SELECT phrase, n_words, n_occur, round(score, 6) AS score
FROM gr ORDER BY score DESC, phrase
LIMIT ${graft.operators.TextAnalysis.rakeTopK}"""
    },
    "text_zipf" -> s"""
WITH $toksCte,
terms AS (
  SELECT token, count(*)::BIGINT AS freq
  FROM (SELECT unnest(tk) AS token FROM toks) GROUP BY token),
tot AS (SELECT sum(freq)::BIGINT AS n_total FROM terms),
rk AS (
  SELECT token, freq,
    row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS rank
  FROM terms
  QUALIFY rank <= ${graft.operators.TextAnalysis.zipfTopK}),
f1 AS (SELECT freq AS f1 FROM rk WHERE rank = 1)
SELECT rank, token, freq,
  round(freq::DOUBLE / n_total, 6) AS obs_share,
  round(f1::DOUBLE / rank / n_total, 6) AS zipf_share
FROM rk, tot, f1 ORDER BY rank""",
    // Heaps-law vocabulary growth: first-containing-doc reduction
    "text_vocab_growth" -> s"""
WITH $toksCte,
fd AS (
  SELECT token, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(tk) AS token FROM toks) GROUP BY 1),
md AS (SELECT max(doc_id) AS max_doc FROM documents),
st AS (SELECT unnest(range(1, 11)) AS step),
cx AS (
  SELECT fd.first_doc, st.step, (md.max_doc * st.step) // 10 AS cutoff
  FROM fd CROSS JOIN md CROSS JOIN st)
SELECT CAST(step AS BIGINT) AS step,
  CAST(max(cutoff) AS BIGINT) AS max_doc_id,
  count(*)::BIGINT AS vocab_size
FROM cx WHERE first_doc <= cutoff
GROUP BY step ORDER BY step""",
    // per-source TF-IDF keywords: exact counts, one ln per token
    "text_source_keywords" -> s"""
WITH $toksCte,
tf AS (
  SELECT source, token, count(*) AS tf
  FROM (SELECT source, unnest(tk) AS token FROM toks) GROUP BY 1, 2),
dfs AS (SELECT token, count(*) AS df_sources FROM tf GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
sc AS (
  SELECT source, token, CAST(tf AS BIGINT) AS tf,
    CAST(df_sources AS BIGINT) AS df_sources,
    round(tf * ln(n_sources::DOUBLE / df_sources), 6) AS score
  FROM tf JOIN dfs USING (token) CROSS JOIN ns)
SELECT source,
  row_number() OVER (PARTITION BY source
    ORDER BY score DESC, token)::BIGINT AS rank,
  token, tf, df_sources, score
FROM sc
QUALIFY rank <= ${graft.operators.TextAnalysis.keywordsPerSource}
ORDER BY source, rank""",
    // PMI collocations: exact bigram marginals, one ln per row
    "text_pmi_bigrams" -> s"""
WITH $toksCte,
bg AS (
  SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
  FROM toks WHERE len(tk) >= 2),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1),
nb AS (SELECT count(*) AS n_bigrams FROM bg),
rk AS (
  SELECT w1, w2, c12,
    row_number() OVER (ORDER BY c12 DESC, w1, w2)::BIGINT AS rank
  FROM c12
  QUALIFY rank <= ${graft.operators.TextAnalysis.pmiTopK})
SELECT rank, w1, w2, CAST(rk.c12 AS BIGINT) AS c12,
  round(ln(rk.c12::DOUBLE * n_bigrams / (c1.c1 * c2.c2)), 6) AS pmi
FROM rk JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nb
ORDER BY rank""",
    // token burstiness: VMR of per-doc counts for the top tokens
    "text_burstiness" -> s"""
WITH $toksCte,
c AS (
  SELECT token, doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest(tk) AS token FROM toks) GROUP BY 1, 2),
pt AS (
  SELECT token, CAST(sum(c) AS BIGINT) AS total_count,
    CAST(sum(c * c) AS BIGINT) AS sum_sq,
    count(*)::BIGINT AS doc_freq
  FROM c GROUP BY 1),
ndc AS (SELECT count(*) AS n_docs FROM documents),
rk AS (
  SELECT token, total_count, sum_sq, doc_freq,
    row_number() OVER (ORDER BY total_count DESC, token)::BIGINT AS rank
  FROM pt
  QUALIFY rank <= ${graft.operators.TextAnalysis.burstTopK})
SELECT rank, token, total_count, doc_freq,
  round((sum_sq::DOUBLE / n_docs -
      (total_count::DOUBLE / n_docs) * (total_count::DOUBLE / n_docs)) /
    (total_count::DOUBLE / n_docs), 6) AS vmr
FROM rk CROSS JOIN ndc ORDER BY rank""",
    // pairwise source vocabulary Jaccard: exact integer set measures
    "text_source_overlap" -> s"""
WITH $toksCte,
st AS (
  SELECT DISTINCT source, unnest(tk) AS token FROM toks),
sz AS (SELECT source, count(*) AS n_terms FROM st GROUP BY 1),
cm AS (
  SELECT a.source AS source_a, b.source AS source_b,
    count(*) AS n_common
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b,
  sa.n_terms AS terms_a, sb.n_terms AS terms_b,
  n_common::BIGINT AS n_common,
  round(n_common::DOUBLE / (sa.n_terms + sb.n_terms - n_common), 6)
    AS vocab_jaccard
FROM cm
JOIN sz sa ON source_a = sa.source
JOIN sz sb ON source_b = sb.source
ORDER BY source_a, source_b""",
    // Jensen-Shannon divergence per source vs the corpus unigram
    // distribution: integer-count shares, per-token terms rounded to
    // the 1e-12 grid and decimal-summed (order-independent)
    "text_js_divergence" -> s"""
WITH $toksCte,
tk2 AS (SELECT source, unnest(tk) AS token FROM toks),
sc AS (
  SELECT source, token, count(*)::BIGINT AS n_st FROM tk2 GROUP BY 1, 2),
stot AS (
  SELECT source, CAST(sum(n_st) AS BIGINT) AS tot_s,
    count(*)::BIGINT AS vocab_s
  FROM sc GROUP BY 1),
cc AS (SELECT token, CAST(sum(n_st) AS BIGINT) AS n_t FROM sc GROUP BY 1),
ctot AS (SELECT CAST(sum(n_t) AS BIGINT) AS tot_c FROM cc),
grid AS (
  SELECT st.source, st.tot_s, st.vocab_s, cc.n_t, ctot.tot_c,
    coalesce(s2.n_st, 0) AS n_st
  FROM cc CROSS JOIN ctot CROSS JOIN stot st
  LEFT JOIN sc s2 ON s2.source = st.source AND s2.token = cc.token),
terms AS (
  SELECT source, tot_s, vocab_s,
    CAST(round((CASE WHEN n_st > 0 THEN (n_st::DOUBLE / tot_s) *
        ln((n_st::DOUBLE / tot_s) /
          ((n_st::DOUBLE / tot_s + n_t::DOUBLE / tot_c) / 2))
      ELSE 0.0 END +
      (n_t::DOUBLE / tot_c) * ln((n_t::DOUBLE / tot_c) /
        ((n_st::DOUBLE / tot_s + n_t::DOUBLE / tot_c) / 2))) * 0.5, 12)
      AS DECIMAL(18,12)) AS term
  FROM grid)
SELECT source, max(tot_s) AS n_tokens, max(vocab_s) AS vocab_size,
  round(CAST(sum(term) AS DOUBLE), 6) AS js_divergence
FROM terms GROUP BY source ORDER BY source""",
    // per-source language entropy: exact shares, decimal-summed terms
    "text_lang_entropy" -> """
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
t AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS tot,
    count(*)::BIGINT AS n_langs
  FROM c GROUP BY 1)
SELECT source, max(n_langs)::BIGINT AS n_langs,
  CAST(max(tot) AS BIGINT) AS n_docs,
  round(CAST(CAST(sum(CAST(round(-(n::DOUBLE / tot) * ln(n::DOUBLE / tot), 12)
    AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 6) AS lang_entropy
FROM c JOIN t USING (source)
GROUP BY source ORDER BY source""",
    // DSIR-ranked selection: top-N by mean importance log-ratio
    "corpus_dsir_select" -> s"""
WITH $toksCte,
tok AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(t), 1, 8))::BIGINT %
      ${graft.operators.Curation.dsirBuckets} AS bkt
  FROM (SELECT doc_id, lang, unnest(tk) AS t FROM toks)),
rc AS (SELECT bkt, count(*) AS cr FROM tok GROUP BY 1),
tc AS (SELECT bkt, count(*) AS ct FROM tok
  WHERE lang = '${graft.operators.Curation.dsirTargetLang}' GROUP BY 1),
tots AS (
  SELECT count(*) AS rtot,
    count(*) FILTER (lang = '${graft.operators.Curation.dsirTargetLang}')
      AS ttot
  FROM tok),
w AS (
  SELECT bkt,
    ln((coalesce(ct, 0) + 1)::DOUBLE /
        (ttot::DOUBLE + ${graft.operators.Curation.dsirBuckets.toDouble})) -
    ln((cr + 1)::DOUBLE /
        (rtot::DOUBLE + ${graft.operators.Curation.dsirBuckets.toDouble}))
      AS lw
  FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tots),
sc AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
    round(sum(lw) / count(*), 6) AS dsir_logw
  FROM tok JOIN w USING (bkt)
  GROUP BY doc_id)
SELECT doc_id, n_tokens, dsir_logw,
  row_number() OVER (ORDER BY dsir_logw DESC, doc_id)::BIGINT AS rank
FROM sc
ORDER BY dsir_logw DESC, doc_id
LIMIT ${graft.operators.Curation.dsirSelectN}""",
    // tokenizer fertility by language: BPE totals (shared RECURSIVE
    // greedy-match chain) over integer sums
    "text_fertility" -> s"""
WITH RECURSIVE $toksCte${OraclesPacking.bpeTotalsCtes},
f AS (
  SELECT t.lang, len(t.tk)::BIGINT AS nt, bpc.n_subwords AS ns,
    len(regexp_replace(t.text, '\\s+', '', 'g'))::BIGINT AS nc
  FROM toks t JOIN bpc USING (doc_id))
SELECT lang, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
  sum(ns)::BIGINT AS n_subwords,
  round(sum(ns)::DOUBLE / sum(nt), 6) AS fertility,
  round(sum(nc)::DOUBLE / sum(ns), 6) AS chars_per_subword
FROM f GROUP BY lang ORDER BY lang""",
    // DSIR hashed-unigram importance: Laplace-smoothed target/raw
    // log-ratio per bucket (B metadata rows), mean per document
    "corpus_dsir" -> s"""
WITH $toksCte,
tok AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(t), 1, 8))::BIGINT %
      ${graft.operators.Curation.dsirBuckets} AS bkt
  FROM (SELECT doc_id, lang, unnest(tk) AS t FROM toks)),
rc AS (SELECT bkt, count(*) AS cr FROM tok GROUP BY 1),
tc AS (SELECT bkt, count(*) AS ct FROM tok
  WHERE lang = '${graft.operators.Curation.dsirTargetLang}' GROUP BY 1),
tots AS (
  SELECT count(*) AS rtot,
    count(*) FILTER (lang = '${graft.operators.Curation.dsirTargetLang}')
      AS ttot
  FROM tok),
w AS (
  SELECT bkt,
    ln((coalesce(ct, 0) + 1)::DOUBLE /
        (ttot::DOUBLE + ${graft.operators.Curation.dsirBuckets.toDouble})) -
    ln((cr + 1)::DOUBLE /
        (rtot::DOUBLE + ${graft.operators.Curation.dsirBuckets.toDouble}))
      AS lw
  FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tots)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
  round(sum(lw) / count(*), 6) AS dsir_logw
FROM tok JOIN w USING (bkt)
GROUP BY doc_id ORDER BY doc_id""",
    "text_lang_confusion" -> (textStatsCte +
      """SELECT lang, lang_pred, count(*)::BIGINT AS n_docs FROM st
GROUP BY lang, lang_pred ORDER BY lang, lang_pred"""),
    "text_token_hist" -> s"""
WITH $toksCte
SELECT token, count(*)::BIGINT AS freq
FROM (SELECT unnest(tk) AS token FROM toks)
GROUP BY token ORDER BY freq DESC, token LIMIT 20""",
    // vocab coverage: global descending rank + prefix over the term
    // aggregate; integer counts end to end
    "text_vocab_coverage" -> s"""
WITH $toksCte,
terms AS (
  SELECT token, count(*)::BIGINT AS freq
  FROM (SELECT unnest(tk) AS token FROM toks) GROUP BY token),
ranked AS (
  SELECT freq,
    row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS rank,
    sum(freq) OVER (ORDER BY freq DESC, token
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
  FROM terms),
t AS (SELECT sum(freq)::BIGINT AS n_total FROM terms),
ks AS (SELECT unnest([1, 5, 10, 25])::BIGINT AS k)
SELECT k, count(*)::BIGINT AS n_terms,
  max(cum)::BIGINT AS covered_tokens,
  round(max(cum)::DOUBLE / (SELECT n_total FROM t), 6) AS coverage
FROM ks JOIN ranked ON rank <= k
GROUP BY k ORDER BY k""",
    "text_tfidf_top" -> s"""
WITH $toksCte,
tok AS (SELECT doc_id, unnest(tk) AS token FROM toks),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token AS token, tf,
    round(tf * (ln((n_docs + 1)::DOUBLE / (df + 1)) + 1), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token)::BIGINT AS rn
  FROM scored)
SELECT doc_id, token, tf, tfidf, rn FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn""",
    // bigram-LM perplexity: same add-k smoothing / pruning constants as
    // TextAnalysis.perplexity (k, minCount injected from the Scala side)
    "text_perplexity" -> s"""
WITH $perplexityCtes
SELECT doc_id, n_bigrams, perplexity FROM pp ORDER BY doc_id""",
    // CCNet head/middle/tail partition: per-language perplexity
    // terciles over the SAME pp CTE; fraction literals are the Scala
    // doubles both engines parse identically
    "text_ccnet_buckets" -> s"""
WITH $perplexityCtes,
th AS (
  SELECT d.lang,
    quantile_cont(perplexity, ${1.0 / 3}) AS p33,
    quantile_cont(perplexity, ${2.0 / 3}) AS p67
  FROM pp JOIN documents d USING (doc_id) GROUP BY d.lang)
SELECT pp.doc_id, d.lang, pp.perplexity,
  CASE WHEN pp.perplexity <= th.p33 THEN 'head'
       WHEN pp.perplexity <= th.p67 THEN 'middle'
       ELSE 'tail' END AS ccnet_bucket
FROM pp JOIN documents d USING (doc_id) JOIN th ON d.lang = th.lang
ORDER BY pp.doc_id""",
    // hashed linear classifier: identical weight-table formula, token
    // bucketing, and sequential fold as TextAnalysis.classifierScore
    "text_classifier" -> s"""
WITH $toksCte$clsScCtes
SELECT doc_id, n_tokens, margin,
  round(1.0 / (1.0 + exp(-margin * 10)), 6) AS score,
  (margin > 0) AS label
FROM sc ORDER BY doc_id""",
    // tokenizer-aware subword count: the identical greedy longest-match
    // fold over the same merge table, per token, summed per doc
    "text_bpe_count" -> s"""
WITH RECURSIVE $toksCte${OraclesPacking.bpeTotalsCtes}
SELECT t.doc_id, len(t.tk)::BIGINT AS n_tokens, bpc.n_subwords,
  round(bpc.n_subwords::DOUBLE / len(t.tk), 6) AS subwords_per_token
FROM toks t JOIN bpc ON t.doc_id = bpc.doc_id
ORDER BY t.doc_id""",
    // BPE merge induction round 1: adjacent char-pair frequencies over
    // every token occurrence (range(1, len) is EMPTY for <=1-char
    // tokens in DuckDB — the Spark side guards the same way)
    "text_bpe_merges" -> s"""
WITH $toksCte,
tok AS (SELECT unnest(tk) AS w FROM toks),
pr AS (SELECT unnest(list_transform(range(1, len(w)),
  i -> substr(w, i::INT, 2))) AS pair FROM tok)
SELECT pair, count(*)::BIGINT AS freq FROM pr
GROUP BY pair ORDER BY freq DESC, pair LIMIT 20""",
    "text_bigram_hist" -> s"""
WITH $toksCte
SELECT bigram, count(*)::BIGINT AS freq
FROM (SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
        i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks)
GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 30""",
    // lexical diversity: per-doc token frequency table, then TTR and
    // hapax share as exact rationals
    "text_lexical_diversity" -> s"""
WITH $toksCte,
tf AS (
  SELECT doc_id, t, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY doc_id, t)
SELECT doc_id, sum(cnt)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
  sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
  round(count(*)::DOUBLE / sum(cnt), 6) AS ttr,
  round(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE / sum(cnt), 6)
    AS hapax_ratio
FROM tf GROUP BY doc_id ORDER BY doc_id""",
    // corpus entropy rate: unigram entropy + bigram conditional
    // entropy, exact count ratios, 1e-12-grid decimal term sums
    "text_entropy_rate" -> s"""
WITH $toksCte,
bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
    unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
  FROM toks WHERE len(tk) >= 2),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY 1),
nbt AS (SELECT count(*)::BIGINT AS nb FROM bg),
cond AS (
  SELECT round(CAST(CAST(sum(CAST(round(
      -(c12.c12::DOUBLE / nb) * ln(c12.c12::DOUBLE / c1.c1), 12)
      AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 6) AS entropy_rate
  FROM c12 JOIN c1 USING (w1) CROSS JOIN nbt),
u AS (
  SELECT t, count(*)::BIGINT AS c
  FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1),
mt AS (
  SELECT CAST(sum(c) AS BIGINT) AS m, count(*)::BIGINT AS vocab FROM u),
uni AS (
  SELECT m, vocab,
    round(CAST(CAST(sum(CAST(round(-(c::DOUBLE / m) * ln(c::DOUBLE / m), 12)
      AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 6) AS unigram_entropy
  FROM u CROSS JOIN mt GROUP BY 1, 2)
SELECT m AS n_tokens, vocab, unigram_entropy, entropy_rate,
  round(unigram_entropy - entropy_rate, 6) AS mutual_info
FROM uni CROSS JOIN cond""",
    // n-gram novelty: the same post-hash-distinct shingle universe as
    // the dedup family, df = 1 means "this 3-gram exists nowhere else"
    "text_novelty" -> s"""
WITH $toksCte,
shj AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM toks)),
dfc AS (SELECT h, count(*)::BIGINT AS df FROM shj GROUP BY h)
SELECT doc_id, count(*)::BIGINT AS n_shingles,
  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
  round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
    AS novelty
FROM shj JOIN dfc USING (h)
GROUP BY doc_id ORDER BY doc_id""",
    // duplicated n-gram census per source (n = 3 and 8): exact counts,
    // dup_share = re-occurrence fraction
    "text_dup_ngrams" -> {
      def block(n: Int): String = {
        val gram = (1 until n).foldLeft("tk[i]")((acc, j) =>
          s"$acc || ' ' || tk[i+$j]")
        s"""
g$n AS (
  SELECT source, unnest(list_transform(range(1, len(tk) - ${n - 2}),
    i -> $gram)) AS gram
  FROM toks WHERE len(tk) >= $n),
c$n AS (SELECT source, gram, count(*)::BIGINT AS cnt
  FROM g$n GROUP BY 1, 2),
r$n AS (
  SELECT $n::BIGINT AS n, source, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
    count(*)::BIGINT AS n_distinct, max(cnt)::BIGINT AS max_repeat,
    round((sum(cnt) - count(*))::DOUBLE / sum(cnt), 6) AS dup_share
  FROM c$n GROUP BY source)"""
      }
      val ns = graft.operators.TextAnalysis.DupNgramNs
      s"""
WITH $toksCte,${ns.map(block).mkString(",")}
${ns.map(n => s"SELECT * FROM r$n").mkString("\nUNION ALL\n")}
ORDER BY n, source"""
    },
    // stopword-profile drift: per-source share + cosine to the corpus
    // stopword-frequency vector (1e-12-grid decimal term sums)
    "text_stopword_profile" -> {
      val sw = graft.operators.TextAnalysis.stopwords
        .map(w => s"'$w'").mkString("(", ", ", ")")
      s"""
WITH $toksCte,
grid AS (
  SELECT source, token, count(*)::BIGINT AS n_st
  FROM (SELECT source, unnest(tk) AS token FROM toks)
  WHERE token IN $sw GROUP BY 1, 2),
tt AS (SELECT source, CAST(sum(len(tk)) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1),
ct AS (SELECT token, CAST(sum(n_st) AS BIGINT) AS n_ct
  FROM grid GROUP BY 1),
cc AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_corpus FROM tt),
terms AS (
  SELECT g.source, t.n_tokens, g.n_st,
    CAST(round((g.n_st::DOUBLE / t.n_tokens) *
      (c.n_ct::DOUBLE / cc.n_corpus), 12) AS DECIMAL(28,12)) AS pq,
    CAST(round((g.n_st::DOUBLE / t.n_tokens) *
      (g.n_st::DOUBLE / t.n_tokens), 12) AS DECIMAL(28,12)) AS pp,
    CAST(round((c.n_ct::DOUBLE / cc.n_corpus) *
      (c.n_ct::DOUBLE / cc.n_corpus), 12) AS DECIMAL(28,12)) AS qq
  FROM grid g JOIN tt t USING (source) JOIN ct c USING (token)
  CROSS JOIN cc),
a AS (
  SELECT source, max(n_tokens) AS n_tokens,
    CAST(sum(n_st) AS BIGINT) AS stop_tokens,
    CAST(sum(pq) AS DOUBLE) AS spq, CAST(sum(pp) AS DOUBLE) AS spp,
    CAST(sum(qq) AS DOUBLE) AS sqq
  FROM terms GROUP BY source)
SELECT source, n_tokens, stop_tokens,
  round(stop_tokens::DOUBLE / n_tokens, 6) AS stop_share,
  CASE WHEN sqrt(spp) * sqrt(sqq) > 0 THEN
    round(spq / (CASE WHEN sqrt(spp) * sqrt(sqq) > 0
      THEN sqrt(spp) * sqrt(sqq) END), 6) END AS profile_cosine
FROM a ORDER BY source"""
    },
    // Heaps-law fit: ln-ln OLS over the ten vocab-growth checkpoints,
    // decimal moment sums, guarded closed form
    "text_heaps_fit" -> s"""
WITH $toksCte,
fd AS (
  SELECT token, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(tk) AS token FROM toks) GROUP BY 1),
md AS (SELECT max(doc_id) AS max_doc FROM documents),
st AS (SELECT unnest(range(1, 11)) AS step),
vg AS (
  SELECT step, count(*)::BIGINT AS vocab_size
  FROM (SELECT fd.first_doc, st.step, (md.max_doc * st.step) // 10 AS cutoff
        FROM fd CROSS JOIN md CROSS JOIN st)
  WHERE first_doc <= cutoff GROUP BY step),
pt AS (
  SELECT st.step, CAST(sum(len(tk)) AS BIGINT) AS prefix_tokens
  FROM toks CROSS JOIN md CROSS JOIN st
  WHERE doc_id <= (md.max_doc * st.step) // 10 GROUP BY st.step),
pts AS (
  SELECT CAST(round(ln(prefix_tokens::DOUBLE), 12) AS DECIMAL(28,12)) AS x,
    CAST(round(ln(vocab_size::DOUBLE), 12) AS DECIMAL(28,12)) AS y
  FROM vg JOIN pt USING (step)),
p2 AS (
  SELECT x, y,
    CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
      AS DECIMAL(28,12)) AS xy,
    CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
      AS DECIMAL(28,12)) AS xx,
    CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 12)
      AS DECIMAL(28,12)) AS yy
  FROM pts),
m AS (
  SELECT count(*)::BIGINT AS n_steps,
    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
    CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx,
    CAST(sum(yy) AS DOUBLE) AS syy
  FROM p2),
f AS (
  SELECT n_steps, sx, sy,
    sxx - sx * sx / CAST(n_steps AS DOUBLE) AS vx,
    syy - sy * sy / CAST(n_steps AS DOUBLE) AS vy,
    sxy - sx * sy / CAST(n_steps AS DOUBLE) AS cxy
  FROM m)
SELECT n_steps,
  round(cxy / (CASE WHEN vx <> 0 THEN vx END), 6) AS heaps_beta,
  round(exp((sy - (cxy / (CASE WHEN vx <> 0 THEN vx END)) * sx) /
    CAST(n_steps AS DOUBLE)), 6) AS heaps_k,
  CASE WHEN vx <> 0 AND vy <> 0 THEN
    round(cxy * cxy / (CASE WHEN vx * vy <> 0 THEN vx * vy END), 6)
  END AS r2
FROM f""",
    // segmental TTR: full 50-token segments, per-segment distinct
    // ratio, decimal-summed doc and source means
    "text_sttr" -> {
      val seg = graft.operators.TextAnalysis.SttrSegment
      s"""
WITH $toksCte,
st AS (
  SELECT source, doc_id, u.p // $seg AS seg, u.t AS token
  FROM (SELECT source, doc_id,
          unnest(list_transform(range(1, len(tk) + 1),
            i -> {'p': i - 1, 't': tk[i]})) AS u
        FROM toks)),
ss AS (
  SELECT source, doc_id, seg, count(*)::BIGINT AS n_tok,
    count(DISTINCT token)::BIGINT AS n_types
  FROM st GROUP BY 1, 2, 3
  HAVING count(*) = $seg),
dt AS (
  SELECT source, doc_id, count(*)::BIGINT AS n_segments,
    CAST(CAST(sum(CAST(round(n_types::DOUBLE / $seg, 12) AS DECIMAL(18,12)))
      AS VARCHAR) AS DOUBLE) / count(*) AS doc_sttr
  FROM ss GROUP BY 1, 2)
SELECT source, count(*)::BIGINT AS n_docs_measured,
  round(CAST(CAST(sum(CAST(round(doc_sttr, 12) AS DECIMAL(18,12)))
    AS VARCHAR) AS DOUBLE) / count(*), 6) AS mean_sttr
FROM dt GROUP BY source ORDER BY source"""
    },
  )

  // ---------------- dedup ----------------

  private[graft] val shinglesCte = s"""$toksCte,
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM toks))"""

  private val minhashExprs: String = Dedup.coeffs.zipWithIndex.map {
    case ((a, b), i) => s"min(($a * h + $b) % ${graft.functions.Portable.P31}) AS mh_$i"
  }.mkString(",\n    ")

  private val bandSelects: String = (0 until Dedup.numBands).map { b =>
    val key = (0 until Dedup.rowsPerBand)
      .map(r => s"mh_${b * Dedup.rowsPerBand + r}")
      .mkString(" || ',' || ")
    s"SELECT doc_id, $b AS band, $key AS key FROM sigs"
  }.mkString("\n  UNION ALL ")

  private val minhashCte = s"""
WITH $shinglesCte,
shh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
sigs AS (
  SELECT doc_id,
    $minhashExprs
  FROM shh GROUP BY doc_id)
"""

  private val jaccardTail = s"""
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
com AS (
  SELECT doc_a, doc_b, count(*) AS n_common
  FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
            JOIN sh sb ON cand.doc_b = sb.doc_id AND sa.sh = sb.sh
  GROUP BY doc_a, doc_b),
jac AS MATERIALIZED (
  SELECT doc_a, doc_b,
    round(n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
  FROM com JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
"""

  /** Shared CTE chain ending in `jac` (candidate pairs with exact
    * Jaccard) — used by the pairs query, the clusters query, and the
    * curated-corpus capstone ([[OraclesCuration]]). The expensive
    * links (sigs, cand, jac) are MATERIALIZED: DuckDB inlines
    * multiply-referenced CTEs per reference (the round-9 sim-family
    * lesson), and threshold_sweep's per-threshold UNION blocks would
    * otherwise re-run the whole LSH chain once per threshold — pure
    * caching, values unchanged. */
  private[graft] val minhashPairsCtes: String = (minhashCte + """,
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
    AND a.doc_id < b.doc_id),""" + jaccardTail)
    .replace("cand AS MATERIALIZED (",
      s"bk AS (\n  $bandSelects),\ncand AS MATERIALIZED (")
    .replace("sigs AS (", "sigs AS MATERIALIZED (")

  // 64-bit simhash as two 32-bit halves (sim_lo from md5 chars 1-8,
  // sim_hi from chars 9-16) — mirrors Dedup.simhash exactly; no half
  // ever touches the BIGINT sign bit.
  private def simhashBitSums(h: String, p: String): String = (0 until 32)
    .map(j => s"sum((($h >> $j) % 2) * 2 - 1) AS ${p}_$j").mkString(",\n    ")
  private def simhashAssemble(p: String): String = (0 until 32)
    .map(j => s"(CASE WHEN ${p}_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  private val simhashCte = s"""
WITH $toksCte,
th AS (SELECT DISTINCT doc_id, token FROM (SELECT doc_id, unnest(tk) AS token FROM toks)),
hh AS (SELECT doc_id,
  ('0x' || substr(md5(token), 1, 8))::BIGINT AS h1,
  ('0x' || substr(md5(token), 9, 8))::BIGINT AS h2 FROM th),
bs AS (
  SELECT doc_id,
    ${simhashBitSums("h1", "lo")},
    ${simhashBitSums("h2", "hi")}
  FROM hh GROUP BY doc_id),
sig AS (SELECT doc_id,
  (${simhashAssemble("lo")})::BIGINT AS sim_lo,
  (${simhashAssemble("hi")})::BIGINT AS sim_hi FROM bs)
"""

  val dedup: Map[String, String] = Map(
    "dedup_exact" -> """
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
  min(doc_id) AS rep_doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY fingerprint ORDER BY rep_doc_id""",
    "dedup_minhash_sigs" -> (minhashCte +
      "SELECT * FROM sigs ORDER BY doc_id"),
    "dedup_minhash_pairs" -> (minhashPairsCtes +
      "SELECT * FROM jac WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b"),
    // winnowing (MOSS) fingerprint pairs: rightmost-window-min k-gram
    // hashes via the packed (h, -pos) integer argmin, df-capped
    // fingerprint equi-join, exact integer overlaps
    "dedup_winnowing" -> {
      val cap = graft.operators.Dedup.winnowPosCap
      val wm1 = graft.operators.Dedup.winnowW - 1
      s"""
WITH $toksCte,
grams AS (
  SELECT doc_id, pg['pos'] - 1 AS pos,
    ('0x' || substr(md5(pg['gram']), 1, 8))::BIGINT AS h
  FROM (
    SELECT doc_id,
      unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
        i -> {'pos': i,
          'gram': tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]})) AS pg
    FROM toks)),
sel AS (
  SELECT doc_id, pos,
    min(h * $cap + (${cap - 1} - pos)) OVER ww AS selkey
  FROM grams
  WINDOW ww AS (PARTITION BY doc_id ORDER BY pos
    ROWS BETWEEN $wm1 PRECEDING AND CURRENT ROW)),
fps AS (
  SELECT DISTINCT doc_id, selkey // $cap AS h
  FROM sel WHERE pos >= $wm1),
counts AS (SELECT doc_id, count(*)::BIGINT AS n_fp FROM fps GROUP BY 1),
kept AS (
  SELECT f.doc_id, f.h FROM fps f JOIN (
    SELECT h FROM fps GROUP BY h
    HAVING count(*) <= ${graft.operators.Dedup.winnowMaxDf}) d
  USING (h)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    count(*)::BIGINT AS n_shared
  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= ${graft.operators.Dedup.winnowMinShared})
SELECT doc_a, doc_b, n_shared, ca.n_fp AS n_fp_a, cb.n_fp AS n_fp_b,
  round(CAST(n_shared AS DOUBLE) /
    CAST(least(ca.n_fp, cb.n_fp) AS DOUBLE), 6) AS containment
FROM pairs
JOIN counts ca ON doc_a = ca.doc_id
JOIN counts cb ON doc_b = cb.doc_id
ORDER BY doc_a, doc_b"""
    },
    // shingle df histogram: the observability that sizes jaccardMaxDf
    "dedup_df_profile" -> (minhashCte + s""",
dfh AS (SELECT h, count(DISTINCT doc_id) AS df FROM shh GROUP BY 1),
hist AS (SELECT df, count(*) AS n_shingles FROM dfh GROUP BY 1),
tot AS (SELECT CAST(sum(n_shingles) AS BIGINT) AS n_total FROM hist)
SELECT CAST(df AS BIGINT) AS df,
  CAST(n_shingles AS BIGINT) AS n_shingles,
  CAST(sum(n_shingles) OVER cw AS BIGINT) AS cum_shingles,
  round(CAST(sum(n_shingles) OVER cw AS DOUBLE) / n_total, 6)
    AS cum_share,
  (df <= ${graft.operators.Dedup.jaccardMaxDf}) AS under_cap
FROM hist CROSS JOIN tot
WINDOW cw AS (ORDER BY df ROWS BETWEEN UNBOUNDED PRECEDING
  AND CURRENT ROW)
ORDER BY df"""),
    // threshold sweep: five conditional aggregates over one verified
    // pair set
    "dedup_threshold_sweep" -> (minhashPairsCtes + {
      val blocks = graft.operators.Dedup.SweepThresholds.map { t =>
        s"""
SELECT CAST($t AS DOUBLE) AS threshold,
  count(*)::BIGINT AS n_candidates,
  count(*) FILTER (jaccard >= $t)::BIGINT AS n_pairs,
  count(DISTINCT doc_b) FILTER (jaccard >= $t)::BIGINT
    AS n_docs_dropped,
  round(count(*) FILTER (jaccard >= $t)::DOUBLE / count(*), 6)
    AS cand_precision
FROM jac"""
      }.mkString("\nUNION ALL")
      blocks + "\nORDER BY threshold"
    }),
    // duplicate-cluster size histogram: components chain + two
    // cluster-sized aggregates + the singleton difference row
    "dedup_cluster_sizes" -> (minhashPairsCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
  FROM reach GROUP BY node),
bs AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
  FROM cl GROUP BY 1),
h AS (SELECT cluster_size, count(*)::BIGINT AS n_clusters
  FROM bs GROUP BY 1),
sing AS (
  SELECT 1::BIGINT AS cluster_size,
    CAST((SELECT count(*) FROM documents) -
      (SELECT count(*) FROM cl) AS BIGINT) AS n_clusters),
u AS (
  SELECT cluster_size, n_clusters FROM h
  UNION ALL
  SELECT cluster_size, n_clusters FROM sing WHERE n_clusters > 0)
SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
  CAST(cluster_size * sum(n_clusters) AS BIGINT) AS n_docs
FROM u GROUP BY cluster_size ORDER BY cluster_size"""),
    // cross-source duplication matrix: verified near-dup pairs rolled
    // up to unordered (source, source) cells
    "dedup_source_matrix" -> (minhashPairsCtes + """
SELECT least(da.source, db.source) AS source_a,
  greatest(da.source, db.source) AS source_b,
  count(*)::BIGINT AS n_pairs
FROM jac
JOIN documents da ON jac.doc_a = da.doc_id
JOIN documents db ON jac.doc_b = db.doc_id
WHERE jaccard >= 0.5
GROUP BY 1, 2 ORDER BY source_a, source_b"""),
    // edit-distance verification of the LSH candidates: both engines'
    // levenshtein is the same integer DP metric on the same bounded
    // prefix, so every row is exact
    "dedup_edit_pairs" -> (minhashPairsCtes + {
      val cap = graft.operators.Dedup.editMaxChars
      s"""
SELECT c.doc_a, c.doc_b,
  length(substr(da.text, 1, $cap))::BIGINT AS len_a,
  length(substr(db.text, 1, $cap))::BIGINT AS len_b,
  levenshtein(substr(da.text, 1, $cap), substr(db.text, 1, $cap))::BIGINT
    AS edit_distance,
  CASE WHEN greatest(length(substr(da.text, 1, $cap)),
      length(substr(db.text, 1, $cap))) > 0 THEN
    round(1.0 - levenshtein(substr(da.text, 1, $cap),
        substr(db.text, 1, $cap))::DOUBLE /
      greatest(length(substr(da.text, 1, $cap)),
        length(substr(db.text, 1, $cap))), 6)
  ELSE 1.0 END AS edit_sim
FROM cand c
JOIN documents da ON c.doc_a = da.doc_id
JOIN documents db ON c.doc_b = db.doc_id
ORDER BY doc_a, doc_b"""
    }),
    // MinHash estimator calibration: signature-agreement estimate vs
    // exact Jaccard over the candidate set; decimal-exact error sums
    "dedup_lsh_recall" -> (minhashPairsCtes + s""",
est AS (
  SELECT c.doc_a, c.doc_b,
    (${(0 until graft.operators.Dedup.numHashes)
        .map(i => s"CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END")
        .mkString(" + ")})
      / ${graft.operators.Dedup.numHashes}.0 AS est_j
  FROM cand c JOIN sigs sa ON c.doc_a = sa.doc_id
              JOIN sigs sb ON c.doc_b = sb.doc_id),
pr AS (
  SELECT e.est_j, j.jaccard
  FROM est e JOIN jac j ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b)
SELECT count(*)::BIGINT AS n_candidates,
  count(*) FILTER (jaccard >= 0.5)::BIGINT AS n_verified,
  round(count(*) FILTER (jaccard >= 0.5)::DOUBLE / count(*), 6)
    AS cand_precision,
  round(CAST(CAST(sum(CAST(round(abs(est_j - jaccard), 6) AS DECIMAL(18,6)))
    AS VARCHAR) AS DOUBLE) / count(*), 6) AS est_mae,
  round(CAST(CAST(sum(CAST(round(est_j - jaccard, 6) AS DECIMAL(18,6)))
    AS VARCHAR) AS DOUBLE) / count(*), 6) AS est_bias
FROM pr"""),
    // leakage-free split: the dedup_clusters recursive chain gives each
    // doc its near-dup group; the split hash is taken on the GROUP id
    // (same salt/thresholds as sample_split) so clusters cannot straddle
    "corpus_split_leakfree" -> (minhashPairsCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
g AS (
  SELECT d.doc_id, d.lang, d.source,
    coalesce(cl.cluster_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
SELECT doc_id, lang, source, group_id, split_bucket,
  CASE WHEN split_bucket < 90 THEN 'train'
       WHEN split_bucket < 95 THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT *, ('0x' || substr(md5('${graft.operators.Packing.splitSalt}' || group_id::VARCHAR), 1, 8))::BIGINT % 100 AS split_bucket
      FROM g)
ORDER BY doc_id"""),
    // pairs -> components: recursive min-label propagation; cluster_id =
    // min doc_id reachable (the representative the dedup keeps)
    // near-dup rate per (lang, source): the dedup_clusters CC joined
    // back to the document metadata and folded into per-segment rates
    "corpus_dedup_rates" -> (minhashPairsCtes
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id
  FROM reach GROUP BY node)
SELECT d.lang, d.source, count(*)::BIGINT AS n_docs,
  count(*) FILTER (cc.doc_id IS NOT NULL)::BIGINT AS n_clustered,
  count(*) FILTER (cc.doc_id IS NULL OR cc.cluster_id = d.doc_id)::BIGINT
    AS n_kept,
  round(1 - (count(*) FILTER (cc.doc_id IS NULL OR
    cc.cluster_id = d.doc_id))::DOUBLE / count(*), 6) AS dup_share
FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
GROUP BY d.lang, d.source
ORDER BY d.lang, d.source"""),
    "dedup_clusters" -> (minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + """
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id"""),
    // canonical selection within duplicate clusters: keeper = longest
    // member (ties to the smallest doc_id) via a stated window rule;
    // the Spark side's min(struct(-n_chars, doc_id)) is the identical
    // (exact-integer) ordering
    "dedup_keep_best" -> (minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + """
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
  FROM reach GROUP BY node),
mem AS (
  SELECT cl.doc_id, cl.cluster_id, d.n_chars
  FROM cl JOIN documents d USING (doc_id)),
kp AS MATERIALIZED (
  SELECT cluster_id, doc_id AS keeper_id
  FROM mem
  QUALIFY row_number() OVER (PARTITION BY cluster_id
    ORDER BY n_chars DESC, doc_id) = 1)
SELECT m.doc_id, m.cluster_id, k.keeper_id,
  m.doc_id = k.keeper_id AS keep
FROM mem m JOIN kp k USING (cluster_id)
ORDER BY doc_id"""),
    // token-savings accounting under the keeper rule: the keep_best
    // chain joined back onto per-source token budgets, exact integers
    "corpus_dedup_savings" -> (minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
, np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
edges(a, b) AS (SELECT doc_a, doc_b FROM np UNION SELECT doc_b, doc_a FROM np),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cl AS (SELECT node AS doc_id, min(label) AS cluster_id
  FROM reach GROUP BY node),
mem AS (
  SELECT cl.doc_id, cl.cluster_id, d.n_chars
  FROM cl JOIN documents d USING (doc_id)),
kp AS MATERIALIZED (
  SELECT cluster_id, doc_id AS keeper_id
  FROM mem
  QUALIFY row_number() OVER (PARTITION BY cluster_id
    ORDER BY n_chars DESC, doc_id) = 1),
kept AS (
  SELECT m.doc_id, m.doc_id = k.keeper_id AS keep
  FROM mem m JOIN kp k USING (cluster_id)),
tl AS (
  SELECT doc_id, source,
    len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens
  FROM documents),
g AS (
  SELECT tl.source, count(*)::BIGINT AS n_docs,
    CAST(sum(tl.n_tokens) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN coalesce(k.keep, true) THEN tl.n_tokens
      ELSE 0 END) AS BIGINT) AS n_tokens_kept
  FROM tl LEFT JOIN kept k USING (doc_id)
  GROUP BY 1)
SELECT source, n_docs, n_tokens, n_tokens_kept,
  n_tokens - n_tokens_kept AS tokens_saved,
  CASE WHEN n_tokens > 0 THEN
    round((n_tokens - n_tokens_kept) / CAST(n_tokens AS DOUBLE), 6) END
    AS savings_share
FROM g ORDER BY source"""),
    // df cap mirrors Dedup.jaccardMaxDf: shingles in more than maxDf docs
    // are dropped from the universe before the self-join (skew bound).
    // hashed-shingle Jaccard: hash each shingle to 32 bits first (same
    // md5 prefix as the Spark side), then df-cap + self-join on the hash
    "dedup_jaccard_pairs" -> (s"\nWITH $toksCte,\n" + s"""
shj AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM toks)),
rare AS (SELECT h FROM shj GROUP BY h HAVING count(*) <= ${Dedup.jaccardMaxDf}),
shc AS (SELECT s.doc_id, s.h FROM shj s JOIN rare USING (h)),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
com AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b),
jacj AS (
  SELECT doc_a, doc_b,
    round(n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
  FROM com JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
SELECT * FROM jacj WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b"""),
    // asymmetric containment over the same capped hashed universe as
    // dedup_jaccard_pairs (catches subset-duplicates Jaccard misses)
    "dedup_containment_pairs" -> (s"\nWITH $toksCte,\n" + s"""
shj AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM toks)),
rare AS (SELECT h FROM shj GROUP BY h HAVING count(*) <= ${Dedup.jaccardMaxDf}),
shc AS (SELECT s.doc_id, s.h FROM shj s JOIN rare USING (h)),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
com AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b),
ctm AS (
  SELECT doc_a, doc_b,
    round(n_common::DOUBLE / ca.n_sh, 6) AS containment_a,
    round(n_common::DOUBLE / cb.n_sh, 6) AS containment_b,
    round(n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
  FROM com JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
SELECT * FROM ctm
WHERE greatest(containment_a, containment_b) >= ${Dedup.containmentThreshold}
ORDER BY doc_a, doc_b"""),
    // incremental batch-vs-index dedup: exact fingerprint first, then
    // LSH+Jaccard near-dup vs any earlier doc (same CTE chain as pairs)
    "dedup_incremental" -> (minhashPairsCtes + s""",
fp AS (
  SELECT doc_id,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents),
ff AS (SELECT fingerprint, min(doc_id) AS first_doc FROM fp GROUP BY fingerprint),
ex AS (
  SELECT doc_id, first_doc AS exact_dup_of FROM fp JOIN ff USING (fingerprint)
  WHERE doc_id >= ${Dedup.incBatchMinId} AND first_doc < doc_id),
nd AS (
  SELECT doc_b AS doc_id, min(doc_a) AS near_dup_of FROM jac
  WHERE jaccard >= 0.5 AND doc_b >= ${Dedup.incBatchMinId} GROUP BY doc_b)
SELECT d.doc_id,
  CASE WHEN exact_dup_of IS NOT NULL THEN 'exact_dup'
       WHEN near_dup_of IS NOT NULL THEN 'near_dup'
       ELSE 'new' END AS status,
  coalesce(exact_dup_of, near_dup_of) AS dup_of
FROM documents d LEFT JOIN ex ON d.doc_id = ex.doc_id
  LEFT JOIN nd ON d.doc_id = nd.doc_id
WHERE d.doc_id >= ${Dedup.incBatchMinId}
ORDER BY d.doc_id"""),
    // span-level dedup: the oracle states the classic row_number-per-
    // fingerprint form; the engine computes the same first-occurrence
    // rule with one min(struct) hash aggregation (no window, no sort)
    "dedup_paragraphs" -> s"""
WITH $toksCte,
sp AS (
  SELECT doc_id,
    unnest(range((len(tk) + ${Dedup.spanTokens} - 1) // ${Dedup.spanTokens})) AS span_idx,
    tk
  FROM toks),
spans AS (
  SELECT doc_id, span_idx,
    array_to_string(tk[span_idx * ${Dedup.spanTokens} + 1 : span_idx * ${Dedup.spanTokens} + ${Dedup.spanTokens}], ' ') AS span_text
  FROM sp),
rk AS (
  SELECT doc_id, span_idx, span_text,
    row_number() OVER (PARTITION BY md5(span_text)
      ORDER BY doc_id, span_idx) AS rn
  FROM spans)
SELECT doc_id, count(*)::BIGINT AS n_spans,
  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
  coalesce(string_agg(span_text, ' ' ORDER BY span_idx)
    FILTER (WHERE rn = 1), '') AS clean_text
FROM rk GROUP BY doc_id ORDER BY doc_id""",
    // substring-level dedup: unaligned windows, classic row_number form
    // for first-occurrence, coverage expanded per window offset
    "dedup_substrings" -> s"""
WITH $toksCte,
tkd AS (SELECT doc_id, tk, len(tk)::BIGINT AS n FROM toks),
wins AS (
  SELECT doc_id, i, md5(array_to_string(tk[i + 1 : i + ${Dedup.subW}], ' ')) AS hh
  FROM (SELECT doc_id, tk, unnest(range(n - ${Dedup.subW} + 1)) AS i
        FROM tkd WHERE n >= ${Dedup.subW})),
rk AS (
  SELECT doc_id, i,
    row_number() OVER (PARTITION BY hh ORDER BY doc_id, i) AS rn
  FROM wins),
cov AS (
  SELECT DISTINCT doc_id, unnest(range(i, i + ${Dedup.subW})) AS pos
  FROM rk WHERE rn > 1),
tok AS (
  SELECT doc_id, unnest(range(len(tk))) AS pos, unnest(tk) AS tok
  FROM tkd),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM cov c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
ka AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
    string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, d.n AS n_tokens,
  (d.n - coalesce(ka.n_kept, 0))::BIGINT AS n_removed,
  coalesce(ka.clean_text, '') AS clean_text
FROM tkd d LEFT JOIN ka ON d.doc_id = ka.doc_id
ORDER BY d.doc_id""",
    "dedup_simhash" -> (simhashCte + "SELECT * FROM sig ORDER BY doc_id"),
    "dedup_simhash_pairs" -> (simhashCte + """,
sb AS (
  SELECT doc_id, sim_lo, sim_hi, band,
    CASE band WHEN 0 THEN sim_lo % 65536 WHEN 1 THEN sim_lo >> 16
              WHEN 2 THEN sim_hi % 65536 ELSE sim_hi >> 16 END AS key
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band)),
sp AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    (bit_count(xor(a.sim_lo, b.sim_lo)) +
     bit_count(xor(a.sim_hi, b.sim_hi)))::BIGINT AS hamming
  FROM sb a JOIN sb b ON a.band = b.band AND a.key = b.key
    AND a.doc_id < b.doc_id)
SELECT * FROM sp WHERE hamming <= 3 ORDER BY doc_a, doc_b"""),
    // content-defined chunking census: 8-byte rolling-window boundary
    // hash (mod 64), chunk extents via per-doc lag, md5 chunk identity
    "dedup_cdc_chunks" -> {
      val win = graft.operators.Dedup.CdcWindow
      val div = graft.operators.Dedup.CdcDivisor
      val salt = graft.operators.Dedup.CdcSalt
      s"""
WITH wp AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text) - ${win - 2}),
    i -> {'i': i, 'w': substr(text, CAST(i AS INT), $win)})) AS u
  FROM documents WHERE length(text) >= $win),
be AS (
  SELECT doc_id, CAST(u.i + ${win - 1} AS BIGINT) AS e FROM wp
  WHERE ('0x' || substr(md5('$salt' || u.w), 1, 8))::BIGINT % $div = 0),
le AS (
  SELECT doc_id, length(text)::BIGINT AS e FROM documents
  WHERE length(text) >= 1),
en AS (SELECT DISTINCT doc_id, e FROM
  (SELECT * FROM be UNION ALL SELECT * FROM le)),
ex AS (
  SELECT doc_id,
    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s, e
  FROM en),
ch AS (
  SELECT d.source, x.doc_id, x.e - x.s + 1 AS clen,
    md5(substr(d.text, CAST(x.s AS INT), CAST(x.e - x.s + 1 AS INT)))
      AS chash
  FROM ex x JOIN documents d USING (doc_id))
SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
  count(*)::BIGINT AS n_chunks,
  count(DISTINCT chash)::BIGINT AS n_distinct_chunks,
  round(sum(clen)::DOUBLE / count(*), 2) AS avg_chunk_len,
  round((count(*) - count(DISTINCT chash))::DOUBLE / count(*), 6)
    AS dedup_rate
FROM ch GROUP BY source ORDER BY source"""
    },
    // 1-bit minhash fidelity: low-bit agreement over the 16 seeds on
    // every LSH candidate, estimator max(2A/16 - 1, 0) vs exact Jaccard
    "dedup_bbit_minhash" -> (minhashPairsCtes + s""",
bb AS (
  SELECT j.doc_a, j.doc_b, j.jaccard,
    CAST(${(0 until graft.operators.Dedup.coeffs.length).map(i =>
        s"(CASE WHEN sa.mh_$i % 2 = sb.mh_$i % 2 THEN 1 ELSE 0 END)")
        .mkString(" + ")} AS BIGINT) AS agree_bits
  FROM jac j JOIN sigs sa ON j.doc_a = sa.doc_id
  JOIN sigs sb ON j.doc_b = sb.doc_id)
SELECT doc_a, doc_b, jaccard, agree_bits,
  round(greatest(2.0 * (agree_bits::DOUBLE /
    ${graft.operators.Dedup.coeffs.length}) - 1.0, 0.0), 6)
    AS jaccard_bbit,
  round(abs(greatest(2.0 * (agree_bits::DOUBLE /
    ${graft.operators.Dedup.coeffs.length}) - 1.0, 0.0) - jaccard), 6)
    AS abs_err
FROM bb ORDER BY doc_a, doc_b"""),
  )

  // ---------------- similarity ----------------

  /** Unit-normalize then single dot per pair — identical float path to
    * [[graft.operators.Similarity.unitize]]/`cosineUnit` (elementwise
    * x/√(v·v), then sequential double dot, rounded 6). */
  private def unitSql(v: String) =
    s"list_transform($v, x -> x / sqrt(list_inner_product($v, $v)))"
  private def cosSql(a: String, b: String) =
    s"round(list_inner_product($a, $b), 6)"

  private val simBase = s"""
WITH base AS (
  SELECT vec_id, label, ${unitSql("embedding::DOUBLE[]")} AS ev
  FROM embeddings),
q AS (
  SELECT vec_id AS query_id, ev AS qv FROM base WHERE vec_id < 20)
"""

  /** Unrolled spherical-k-means CTE chain (seeds → kmIters Lloyd
    * iterations), generated from the same constants as
    * [[graft.operators.Similarity.kmeans]]. Ends with `asg<iters>`
    * (vec_id, ev, cell) and `c<iters>` (cell, centroid). */
  /** The IVF cell count the sim oracles unroll Lloyd at. The ENGINE
    * derives cells from the corpus via `Similarity.autoCells` →
    * `sizedCells` (4 at sf0.01/sf0.1 — the driver-gate scales — 40 at
    * sf1); a static SQL oracle cannot count rows, so a scaled sweep
    * sets `-Dgraft.oracle.simCells=<sizedCells(n)>` before the Verify
    * dump and the generated chains state the same constant. Default
    * (`kmK` = 4) keeps the driver's sf0.01 gate flag-free. NOT the PQ
    * codebook size: per-subspace codebooks are fixed-k by design and
    * keep reading `kmK` directly. */
  private def simOracleCells: Int = sys.props.get("graft.oracle.simCells")
    .map(_.toInt).getOrElse(graft.operators.Similarity.kmK)

  private def kmeansCtes: String = {
    val k = simOracleCells
    val iters = graft.operators.Similarity.kmIters
    val salt = graft.operators.Similarity.kmSalt
    val sb = new StringBuilder
    sb.append(s""",
sd AS MATERIALIZED (
  SELECT vec_id, ev,
    ('0x' || substr(md5('$salt' || vec_id::VARCHAR), 1, 8))::BIGINT AS hk
  FROM base),
c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cell, ev AS centroid
  FROM (SELECT * FROM sd ORDER BY hk, vec_id LIMIT $k))""")
    for (i <- 1 to iters) {
      sb.append(s""",
asg$i AS MATERIALIZED (
  SELECT vec_id, ev, cell FROM (
    SELECT b.vec_id, b.ev, c.cell,
      row_number() OVER (PARTITION BY b.vec_id
        ORDER BY list_inner_product(b.ev, c.centroid) DESC, c.cell) AS rn
    FROM base b CROSS JOIN c${i - 1} c)
  WHERE rn = 1),
cm$i AS MATERIALIZED (
  SELECT cell, pos, CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
  FROM (SELECT cell, unnest(ev) AS v, unnest(range(len(ev))) AS pos FROM asg$i)
  GROUP BY cell, pos),
c$i AS MATERIALIZED (
  SELECT cell, list_transform(centroid,
    x -> x / sqrt(list_inner_product(centroid, centroid))) AS centroid
  FROM (SELECT cell, list(cv ORDER BY pos) AS centroid FROM cm$i GROUP BY cell))""")
    }
    sb.toString
  }

  /** Unrolled product-quantization build: per subspace s, the identical
    * raw-Lloyd iterations as [[graft.operators.Similarity.pqBuild]] —
    * seeds by the shared salted hash, assignment by minimum L2 distance
    * expanded as v·v − 2·v·c + c·c (the exact IEEE expression the Spark
    * side evaluates), ties by cell, decimal-exact non-unitized means.
    * Ends with `pa{s}{iters}` (vec_id, v, cell) and `pc{s}{iters}`
    * (cell, centroid) for each subspace. */
  private def pqChainCtes(src: String, vcol: String, sdName: String,
      subP: String, cP: String, aP: String, mP: String): String = {
    val m = graft.operators.Similarity.pqM
    val sd = graft.operators.Similarity.pqSubDim
    val k = graft.operators.Similarity.kmK
    val iters = graft.operators.Similarity.kmIters
    val salt = graft.operators.Similarity.pqSalt
    val sb = new StringBuilder
    // the seed hash depends only on vec_id, so it always reads base —
    // the residual chains share the raw chains' seed ROWS (same ids)
    // while their seed CENTROIDS are those ids' vectors from `src`
    sb.append(s""",
$sdName AS (
  SELECT vec_id,
    ('0x' || substr(md5('$salt' || vec_id::VARCHAR), 1, 8))::BIGINT AS hk
  FROM base)""")
    for (s <- 0 until m) {
      val lo = s * sd + 1
      val hi = (s + 1) * sd
      sb.append(s""",
$subP$s AS (SELECT vec_id, $vcol[$lo:$hi] AS v FROM $src),
$cP${s}0 AS (
  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cell, v AS centroid
  FROM (SELECT b.vec_id, b.v, p.hk FROM $subP$s b JOIN $sdName p USING (vec_id)
        ORDER BY hk, vec_id LIMIT $k))""")
      for (i <- 1 to iters) {
        sb.append(s""",
$aP$s$i AS (
  SELECT vec_id, v, cell FROM (
    SELECT b.vec_id, b.v, c.cell,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        list_inner_product(b.v, b.v) - 2 * list_inner_product(b.v, c.centroid)
          + list_inner_product(c.centroid, c.centroid) ASC, c.cell) AS rn
    FROM $subP$s b CROSS JOIN $cP$s${i - 1} c)
  WHERE rn = 1),
$mP$s$i AS (
  SELECT cell, pos, CAST(CAST(sum(CAST(x AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
  FROM (SELECT cell, unnest(v) AS x, unnest(range(len(v))) AS pos FROM $aP$s$i)
  GROUP BY cell, pos),
$cP$s$i AS (SELECT cell, list(cv ORDER BY pos) AS centroid FROM $mP$s$i GROUP BY cell)""")
      }
    }
    sb.toString
  }

  private val pqCtes: String =
    pqChainCtes("base", "ev", "psd", "sub", "pc", "pa", "pm")

  /** The same Lloyd chains over the IVFADC residuals (v − the assigned
    * cell's decimal-exact NON-unitized mean — the least-squares center;
    * `cmm` reassembles it from the final iteration's `cm` CTE): `resid`
    * holds (vec_id, rv) and the chains are prefixed r*. */
  private val residPqCtes: String = s""",
cmm AS (SELECT cell, list(cv ORDER BY pos) AS mcent
  FROM cm${graft.operators.Similarity.kmIters} GROUP BY cell),
resid AS MATERIALIZED (
  SELECT a.vec_id,
    list_transform(range(len(a.ev)), i -> a.ev[i + 1] - m.mcent[i + 1]) AS rv
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN cmm m USING (cell))""" +
    pqChainCtes("resid", "rv", "rsd", "rsub", "rpc", "rpa", "rpm")

  /** SRP signature chain shared by the LSH top-k and banded near-dup
    * oracles — regenerates the identical hyperplanes from the same
    * universal-hash coefficients as [[graft.operators.Similarity]]. */
  private val srpCtes = s""",
coef AS (SELECT * FROM (VALUES ${
      graft.operators.Similarity.srpCoeffs.zipWithIndex
        .map { case ((a, b), j) => s"($j, ${a}::BIGINT, ${b}::BIGINT)" }
        .mkString(", ")}) t(j, a, b)),
pw AS (
  SELECT j, list(((a * (d + 1) + b) % 2147483647)::DOUBLE / 2147483647 - 0.5
    ORDER BY d) AS plane
  FROM coef, generate_series(0, 63) s(d) GROUP BY j),
sigs AS (
  SELECT b.vec_id,
    sum(CASE WHEN list_inner_product(b.ev, p.plane) > 0
        THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS sig
  FROM base b CROSS JOIN pw p GROUP BY b.vec_id),
sb AS (
  SELECT base.vec_id, ev, sig % 256 AS band0, sig // 256 AS band1
  FROM base JOIN sigs USING (vec_id))"""

  def similarity: Map[String, String] = Map(
    "sim_bruteforce_topk" -> (simBase + s""",
scored AS (
  SELECT query_id, vec_id AS neighbor_id, ${cosSql("qv", "ev")} AS cosine
  FROM base CROSS JOIN q WHERE vec_id <> query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    // JL sign-projection fidelity: interpolated ±1 sign lists,
    // 1e-12-grid projection sums, projected-vs-true cosine on the
    // brute-force pair set
    "sim_jl_projection" -> (simBase + {
      val svRows = (0 until graft.operators.Similarity.jlDim).map { j =>
        s"SELECT $j AS j, " +
          graft.operators.Similarity.jlSigns(j)
            .mkString("[", ", ", "]") + " AS sv"
      }.mkString("\n  UNION ALL ")
      s""",
sgn AS (
  $svRows),
up AS (
  SELECT vec_id, unnest(ev) AS v, unnest(range(len(ev))) AS pos
  FROM base),
pr AS (
  SELECT up.vec_id, sgn.j,
    CAST(CAST(sum(CAST(sgn.sv[pos + 1] * up.v AS DECIMAL(28,12)))
      AS VARCHAR) AS DOUBLE) AS pv
  FROM up CROSS JOIN sgn GROUP BY 1, 2),
pl AS (SELECT vec_id, list(pv ORDER BY j) AS p FROM pr GROUP BY 1),
pun AS (
  SELECT vec_id,
    list_transform(p, x -> x / sqrt(list_inner_product(p, p))) AS pu
  FROM pl),
scored AS (
  SELECT query_id, vec_id AS neighbor_id, ${cosSql("qv", "ev")} AS cosine
  FROM base CROSS JOIN q WHERE vec_id <> query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT
    AS rank
  FROM scored)
SELECT r.query_id, r.neighbor_id, r.rank, r.cosine,
  round(list_inner_product(qp.pu, np.pu), 6) AS jl_cosine,
  round(abs(r.cosine - round(list_inner_product(qp.pu, np.pu), 6)), 6)
    AS abs_err
FROM ranked r
JOIN pun qp ON r.query_id = qp.vec_id
JOIN pun np ON r.neighbor_id = np.vec_id
WHERE r.rank <= 5
ORDER BY query_id, rank"""
    }),
    "sim_hard_negatives" -> (simBase + s""",
ql AS (
  SELECT vec_id AS query_id, label AS qlabel, ev AS qv
  FROM base WHERE vec_id < 20),
scored AS (
  SELECT query_id, vec_id AS neighbor_id, label::BIGINT AS neighbor_label,
    ${cosSql("qv", "ev")} AS cosine
  FROM base CROSS JOIN ql WHERE vec_id <> query_id AND label <> qlabel),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, neighbor_label, cosine, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    // cell balance: counts over the unrolled k-means assignment
    "sim_cell_balance" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
cb AS (SELECT cell, count(*)::BIGINT AS n_vecs FROM asg$it GROUP BY cell),
tt AS (SELECT sum(n_vecs)::BIGINT AS n_total, count(*)::BIGINT AS n_cells
  FROM cb)
SELECT cell, n_vecs,
  round(n_vecs::DOUBLE / n_total, 6) AS share,
  round(n_vecs::DOUBLE * n_cells / n_total, 6) AS ratio_to_mean
FROM cb, tt ORDER BY cell"""
    }),
    // cross-modal quality/embedding separation: the labelSeparation
    // diagnostic keyed by the curation verdict (doc_id = vec_id)
    "sim_quality_separation" -> (s"""
WITH toks AS (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents),
${OraclesCuration.qualityMCte},
kp AS MATERIALIZED (SELECT doc_id, ${OraclesCuration.qKeepExpr} AS keep FROM m),
base AS (
  SELECT vec_id, ${unitSql("embedding::DOUBLE[]")} AS ev FROM embeddings),
kb AS (
  SELECT kp.keep, b.vec_id, b.ev
  FROM base b JOIN kp ON b.vec_id = kp.doc_id),
cent AS (
  SELECT keep, ${unitSql("centroid")} AS cunit FROM (
    SELECT keep, list(cv ORDER BY pos) AS centroid FROM (
      SELECT keep, pos,
        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
      FROM (SELECT keep, unnest(ev) AS v, unnest(range(len(ev))) AS pos
        FROM kb)
      GROUP BY keep, pos)
    GROUP BY keep)),
coh AS (
  SELECT kb.keep, count(*)::BIGINT AS n_docs,
    round(CAST(CAST(sum(CAST(list_inner_product(kb.ev, c.cunit)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS cohesion
  FROM kb JOIN cent c ON kb.keep = c.keep GROUP BY kb.keep),
cx AS (
  SELECT a.keep, round(list_inner_product(a.cunit, b.cunit), 6)
    AS cross_cos
  FROM cent a JOIN cent b ON a.keep <> b.keep)
SELECT keep, n_docs, cohesion, cross_cos
FROM coh JOIN cx USING (keep)
ORDER BY keep"""),
    // per-dimension moment profile: decimal-exact, dim-sized output
    "sim_dim_variance" -> """
WITH dv AS (
  SELECT pos, v::DOUBLE AS v FROM (
    SELECT unnest(embedding::DOUBLE[]) AS v,
      unnest(range(len(embedding))) AS pos
    FROM embeddings)),
m AS (
  SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
    CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(v * v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s2
  FROM dv GROUP BY 1)
SELECT pos, n,
  round(s1 / CAST(n AS DOUBLE), 6) AS dim_mean,
  round(greatest(s2 / CAST(n AS DOUBLE) -
    s1 / CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE)), 0.0), 6)
    AS dim_var
FROM m ORDER BY pos""",
    // participation ratio over the 6dp per-dim variances; both folds
    // are VARCHAR-grade decimal sums of grid values
    "sim_participation_ratio" -> """
WITH dv AS (
  SELECT pos, v::DOUBLE AS v FROM (
    SELECT unnest(embedding::DOUBLE[]) AS v,
      unnest(range(len(embedding))) AS pos
    FROM embeddings)),
m AS (
  SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
    CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(v * v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s2
  FROM dv GROUP BY 1),
vars AS (
  SELECT round(greatest(s2 / CAST(n AS DOUBLE) -
    s1 / CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE)), 0.0), 6)
    AS dim_var
  FROM m),
agg AS (
  SELECT count(*)::BIGINT AS n_dims,
    CAST(CAST(sum(CAST(CAST(dim_var AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS vt,
    CAST(CAST(sum(CAST(CAST(round(dim_var * dim_var, 12) AS VARCHAR)
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS v2t
  FROM vars)
SELECT n_dims, round(vt, 6) AS total_var,
  CASE WHEN v2t <> 0.0 THEN round(vt * vt / v2t, 6)
  END AS participation_ratio,
  CASE WHEN v2t <> 0.0 THEN round(vt * vt / v2t / n_dims, 6)
  END AS pr_share
FROM agg""",
    // nearest-centroid classifier self-accuracy per label
    "sim_ncc_accuracy" -> (simBase + s""",
cent AS (
  SELECT label, ${unitSql("centroid")} AS cunit FROM (
    SELECT label, list(cv ORDER BY pos) AS centroid FROM (
      SELECT label, pos,
        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
      FROM (
        SELECT label, unnest(embedding::DOUBLE[]) AS v,
               unnest(range(len(embedding))) AS pos
        FROM embeddings)
      GROUP BY label, pos)
    GROUP BY label)),
pred AS (
  SELECT vec_id, true_label, c_label AS pred_label FROM (
    SELECT b.vec_id, b.label::BIGINT AS true_label,
      c.label::BIGINT AS c_label,
      row_number() OVER (PARTITION BY b.vec_id
        ORDER BY round(list_inner_product(b.ev, c.cunit), 6) DESC,
          c.label) AS rn
    FROM base b CROSS JOIN cent c)
  WHERE rn = 1)
SELECT true_label, count(*)::BIGINT AS n_vecs,
  count(*) FILTER (pred_label = true_label)::BIGINT AS n_correct,
  round(count(*) FILTER (pred_label = true_label)::DOUBLE / count(*), 6)
    AS accuracy
FROM pred GROUP BY true_label ORDER BY true_label"""),
    // simplified centroid silhouette per Lloyd cell
    "sim_silhouette" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
sil_d AS (
  SELECT a.vec_id, a.cell, c.cell AS c_cell,
    1.0 - round(list_inner_product(a.ev, c.centroid), 6) AS d
  FROM asg$it a CROSS JOIN c$it c),
sil_p AS (
  SELECT vec_id, cell,
    max(CASE WHEN cell = c_cell THEN d END) AS a,
    min(CASE WHEN cell <> c_cell THEN d END) AS b
  FROM sil_d GROUP BY 1, 2),
sil_s AS (
  SELECT vec_id, cell,
    CASE WHEN greatest(a, b) > 0.0 THEN (b - a) / greatest(a, b)
      ELSE 0.0 END AS s
  FROM sil_p)
SELECT cell, count(*)::BIGINT AS n_members,
  round(CAST(CAST(sum(CAST(s AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*), 6)
    AS mean_silhouette
FROM sil_s GROUP BY cell ORDER BY cell"""
    }),
    // linear CKA between embedding halves: feature-space d x d
    // cross-moments (never the n x n Gram), per-dim-sum centering
    "sim_cka_halves" -> (simBase + """,
ex AS (
  SELECT vec_id, unnest(ev) AS v, unnest(range(len(ev))) AS pos
  FROM base),
xs AS (SELECT vec_id, pos AS i, v AS xi FROM ex WHERE pos < 32),
ys AS (SELECT vec_id, pos - 32 AS j, v AS yj FROM ex WHERE pos >= 32),
n1 AS (SELECT count(*)::BIGINT AS n FROM base),
si AS (SELECT i, CAST(CAST(sum(CAST(xi AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
  AS si FROM xs GROUP BY 1),
sj AS (SELECT j, CAST(CAST(sum(CAST(yj AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
  AS sj FROM ys GROUP BY 1),
cxy AS (
  SELECT i, j, CAST(CAST(sum(CAST(xi * yj AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
    AS sij
  FROM xs JOIN ys USING (vec_id) GROUP BY 1, 2),
hxy AS (
  SELECT CAST(CAST(sum(CAST(c * c AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS hxy
  FROM (SELECT sij - si.si * sj.sj / CAST(n AS DOUBLE) AS c
    FROM cxy JOIN si USING (i) JOIN sj USING (j) CROSS JOIN n1)),
cxx AS (
  SELECT a.i AS i, b.i AS i2,
    CAST(CAST(sum(CAST(a.xi * b.xi AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sij
  FROM xs a JOIN xs b USING (vec_id) GROUP BY 1, 2),
hxx AS (
  SELECT CAST(CAST(sum(CAST(c * c AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS hxx
  FROM (SELECT sij - s1.si * s2.si / CAST(n AS DOUBLE) AS c
    FROM cxx JOIN si s1 ON cxx.i = s1.i JOIN si s2 ON cxx.i2 = s2.i
    CROSS JOIN n1)),
cyy AS (
  SELECT a.j AS j, b.j AS j2,
    CAST(CAST(sum(CAST(a.yj * b.yj AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sij
  FROM ys a JOIN ys b USING (vec_id) GROUP BY 1, 2),
hyy AS (
  SELECT CAST(CAST(sum(CAST(c * c AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS hyy
  FROM (SELECT sij - s1.sj * s2.sj / CAST(n AS DOUBLE) AS c
    FROM cyy JOIN sj s1 ON cyy.j = s1.j JOIN sj s2 ON cyy.j2 = s2.j
    CROSS JOIN n1))
SELECT n AS n_vectors, round(hxy, 8) AS hsic_xy,
  round(hxx, 8) AS hsic_xx, round(hyy, 8) AS hsic_yy,
  round(hxy / (CASE WHEN hxx * hyy > 0.0 THEN sqrt(hxx * hyy) END), 6)
    AS cka
FROM n1 CROSS JOIN hxy CROSS JOIN hxx CROSS JOIN hyy"""),
    // Davies-Bouldin: per-cell mean centroid distance, pairwise
    // centroid separations, max ratio per cell, global mean
    "sim_davies_bouldin" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
sw AS (
  SELECT a.cell, count(*)::BIGINT AS n_members,
    CAST(CAST(sum(CAST(1.0 - round(list_inner_product(a.ev, c.centroid), 6)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS si
  FROM asg$it a JOIN c$it c ON a.cell = c.cell
  GROUP BY a.cell),
cp AS (
  SELECT i.cell AS ci, j.cell AS cj,
    1.0 - round(list_inner_product(i.centroid, j.centroid), 6) AS m
  FROM c$it i JOIN c$it j ON i.cell <> j.cell),
dm AS (
  SELECT cp.ci AS cell,
    max((s1.si + s2.si) / (CASE WHEN cp.m <> 0.0 THEN cp.m END)) AS di
  FROM cp JOIN sw s1 ON cp.ci = s1.cell JOIN sw s2 ON cp.cj = s2.cell
  GROUP BY 1),
db AS (SELECT CAST(CAST(sum(CAST(di AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) /
  count(*) AS db FROM dm)
SELECT sw.cell, sw.n_members, round(sw.si, 6) AS s_within,
  round(dm.di, 6) AS r_max, round(db.db, 6) AS db_index
FROM sw LEFT JOIN dm ON sw.cell = dm.cell CROSS JOIN db
ORDER BY sw.cell"""
    }),
    // Calinski-Harabasz: spherical within-SS (2-2cos), between-SS vs
    // the per-dim decimal-mean global vector, variance ratio
    "sim_calinski_harabasz" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
w AS (
  SELECT count(*)::BIGINT AS n_vectors,
    CAST(CAST(sum(CAST(2.0 - 2.0 *
      round(list_inner_product(a.ev, c.centroid), 6)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS w_ss
  FROM asg$it a JOIN c$it c ON a.cell = c.cell),
gm AS (
  SELECT pos, CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) /
    count(*) AS gv
  FROM (SELECT unnest(ev) AS v, unnest(range(len(ev))) AS pos
    FROM asg$it)
  GROUP BY pos),
gg AS (SELECT list(gv ORDER BY pos) AS g FROM gm),
sz AS (SELECT cell, count(*)::BIGINT AS n_i FROM asg$it GROUP BY 1),
b AS (
  SELECT count(*)::BIGINT AS k_cells,
    CAST(CAST(sum(CAST(CAST(n_i AS DOUBLE) *
      (1.0 - 2.0 * round(list_inner_product(c.centroid, gg.g), 6) +
        round(list_inner_product(gg.g, gg.g), 6)) AS DECIMAL(28,10)))
      AS VARCHAR) AS DOUBLE) AS b_ss
  FROM c$it c JOIN sz ON c.cell = sz.cell CROSS JOIN gg)
SELECT n_vectors, k_cells, round(w_ss, 6) AS w_ss,
  round(b_ss, 6) AS b_ss,
  round((b_ss / (CASE WHEN CAST(k_cells AS DOUBLE) - 1.0 <> 0.0
      THEN CAST(k_cells AS DOUBLE) - 1.0 END)) /
    (CASE WHEN w_ss / (CASE WHEN CAST(n_vectors AS DOUBLE) -
        CAST(k_cells AS DOUBLE) <> 0.0
        THEN CAST(n_vectors AS DOUBLE) - CAST(k_cells AS DOUBLE) END)
        <> 0.0
      THEN w_ss / (CASE WHEN CAST(n_vectors AS DOUBLE) -
        CAST(k_cells AS DOUBLE) <> 0.0
        THEN CAST(n_vectors AS DOUBLE) - CAST(k_cells AS DOUBLE) END)
      END), 6) AS ch_index
FROM w CROSS JOIN b"""
    }),
    // cluster purity: majority true label per Lloyd cell
    "sim_cluster_purity" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
bl AS (
  SELECT a.cell, e.label::BIGINT AS label, count(*) AS n
  FROM asg$it a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY 1, 2),
sz AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_members FROM bl
  GROUP BY 1)
SELECT bl.cell, sz.n_members, bl.label AS majority_label,
  CAST(bl.n AS BIGINT) AS n_majority,
  round(bl.n::DOUBLE / sz.n_members, 6) AS purity
FROM bl JOIN sz USING (cell)
QUALIFY row_number() OVER (PARTITION BY bl.cell
  ORDER BY bl.n DESC, bl.label) = 1
ORDER BY bl.cell"""
    }),
    // cell medoids: argmax member-vs-centroid cosine per Lloyd cell
    "sim_medoids" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
sc AS (
  SELECT a.cell, a.vec_id,
    round(list_inner_product(a.ev, c.centroid), 6) AS cosine
  FROM asg$it a JOIN c$it c USING (cell)),
sz AS (SELECT cell, count(*)::BIGINT AS n_members FROM asg$it GROUP BY 1)
SELECT sc.cell, sc.vec_id AS medoid_id, sc.cosine, sz.n_members
FROM sc JOIN sz USING (cell)
QUALIFY row_number() OVER (PARTITION BY sc.cell
  ORDER BY sc.cosine DESC, sc.vec_id) = 1
ORDER BY sc.cell"""
    }),
    // drift report: conditional decimal sums per vec_id-parity slice,
    // one unnest pass, shared scalar math on the cast-once doubles
    "sim_drift_report" -> """
WITH d AS (
  SELECT vec_id % 2 AS h, pos, v FROM (
    SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
           unnest(range(len(embedding))) AS pos
    FROM embeddings)),
agg AS (
  SELECT pos::BIGINT AS dim,
    count(*) FILTER (h = 0)::BIGINT AS n_a,
    count(*) FILTER (h = 1)::BIGINT AS n_b,
    CAST(sum(CASE WHEN h = 0 THEN CAST(v AS DECIMAL(28,10)) END)
      AS DOUBLE) AS sa,
    CAST(sum(CASE WHEN h = 1 THEN CAST(v AS DECIMAL(28,10)) END)
      AS DOUBLE) AS sb
  FROM d GROUP BY pos)
SELECT dim, n_a, n_b,
  round(sa / n_a, 6) AS mean_a,
  round(sb / n_b, 6) AS mean_b,
  round(abs(sa / n_a - sb / n_b), 6) AS abs_shift
FROM agg
ORDER BY abs_shift DESC, dim""",
    // label separation report: shared decimal-exact centroid CTE shape,
    // cohesion as a decimal sum of member-to-centroid cosines, nearest
    // other label via the (cc DESC, label_b) argmax both sides state
    "sim_label_separation" -> (simBase + s""",
cent AS (
  SELECT label, ${unitSql("centroid")} AS cunit FROM (
    SELECT label, list(cv ORDER BY pos) AS centroid FROM (
      SELECT label, pos,
        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv FROM (
        SELECT label, unnest(embedding::DOUBLE[]) AS v,
               unnest(range(len(embedding))) AS pos
        FROM embeddings)
      GROUP BY label, pos)
    GROUP BY label)),
coh AS (
  SELECT b.label::BIGINT AS label, count(*)::BIGINT AS n_vecs,
    round(CAST(CAST(sum(CAST(list_inner_product(b.ev, c.cunit)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS cohesion
  FROM base b JOIN cent c ON b.label = c.label GROUP BY b.label),
pairs AS (
  SELECT a.label AS label, b.label AS label_b,
    round(list_inner_product(a.cunit, b.cunit), 6) AS cc
  FROM cent a JOIN cent b ON a.label <> b.label),
nearest AS (
  SELECT label::BIGINT AS label, label_b::BIGINT AS nearest_label,
    cc AS nearest_cos FROM (
    SELECT *, row_number() OVER (PARTITION BY label
      ORDER BY cc DESC, label_b) AS rn FROM pairs) WHERE rn = 1)
SELECT label, n_vecs, cohesion, nearest_label, nearest_cos
FROM coh JOIN nearest USING (label)
ORDER BY label"""),
    "sim_ivf_topk" -> (simBase + s""",
cent AS (
  SELECT label, ${unitSql("centroid")} AS cunit FROM (
    SELECT label, list(cv ORDER BY pos) AS centroid FROM (
      SELECT label, pos,
        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv FROM (
        SELECT label, unnest(embedding::DOUBLE[]) AS v,
               unnest(range(len(embedding))) AS pos
        FROM embeddings)
      GROUP BY label, pos)
    GROUP BY label)),
probes AS (
  SELECT query_id, qv, label FROM (
    SELECT q.query_id, q.qv, cent.label,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${cosSql("q.qv", "cent.cunit")} DESC, cent.label) AS crank
    FROM q CROSS JOIN cent)
  WHERE crank <= 2),
scored AS (
  SELECT query_id, vec_id AS neighbor_id, ${cosSql("qv", "ev")} AS cosine
  FROM base JOIN probes ON base.label = probes.label
  WHERE vec_id <> query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    "sim_lsh_topk" -> (simBase + srpCtes + s""",
q2 AS (
  SELECT vec_id AS query_id, ev AS qv, band0 AS qb0, band1 AS qb1
  FROM sb WHERE vec_id < 20),
scored AS (
  SELECT query_id, sb.vec_id AS neighbor_id, ${cosSql("qv", "ev")} AS cosine
  FROM sb JOIN q2 ON (sb.band0 = q2.qb0 OR sb.band1 = q2.qb1)
    AND sb.vec_id <> q2.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    // k-means IVF: the SAME Lloyd iterations unrolled as chained CTEs
    // (seeds by salted hash, decimal-exact means, re-unitized, argmax
    // ties by cell) — the build pass itself is oracle-verified.
    "sim_ivf_kmeans_topk" -> (simBase + kmeansCtes + s""",
q3 AS (SELECT vec_id AS query_id, ev AS qu FROM asg${graft.operators.Similarity.kmIters} WHERE vec_id < 20),
probes AS (
  SELECT query_id, qu, cell FROM (
    SELECT q3.query_id, q3.qu, c.cell,
      row_number() OVER (PARTITION BY q3.query_id
        ORDER BY round(list_inner_product(q3.qu, c.centroid), 6) DESC, c.cell) AS crank
    FROM q3 CROSS JOIN c${graft.operators.Similarity.kmIters} c)
  WHERE crank <= 2),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id,
    round(list_inner_product(qu, a.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    // per-label centroid outliers: decimal-exact dimension-wise means
    // (the kmeans cm/c chain over label instead of cell), unitized,
    // bottom-k cosine per label
    "sim_outliers" -> (simBase + s""",
cm AS (
  SELECT label, pos, CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv
  FROM (SELECT label, unnest(ev) AS v, unnest(range(len(ev))) AS pos FROM base)
  GROUP BY label, pos),
ct AS (
  SELECT label, list_transform(c0,
    x -> x / sqrt(list_inner_product(c0, c0))) AS centroid
  FROM (SELECT label, list(cv ORDER BY pos) AS c0 FROM cm GROUP BY label)),
sc AS (
  SELECT b.label, b.vec_id, ${cosSql("b.ev", "c.centroid")} AS cosine
  FROM base b JOIN ct c ON b.label = c.label),
rk AS (
  SELECT label, vec_id, cosine,
    row_number() OVER (PARTITION BY label ORDER BY cosine, vec_id)::BIGINT AS rn
  FROM sc)
SELECT label, vec_id, cosine, rn FROM rk WHERE rn <= 5 ORDER BY label, rn"""),
    // SemDeDup: the same unrolled Lloyd chain as sim_ivf_kmeans_topk,
    // then in-cell pairs -> per-vector max cosine + keep-first-by-id
    "sim_semdedup" -> (simBase + kmeansCtes + s""",
pr AS (
  SELECT a.vec_id AS vid, b.vec_id AS nbr,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN asg${graft.operators.Similarity.kmIters} b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
pv AS (
  SELECT vid, max(cosine) AS max_cell_cosine,
    min(CASE WHEN cosine >= ${graft.operators.Similarity.semThreshold}
             AND nbr < vid THEN nbr END) AS dup_of
  FROM pr GROUP BY vid)
SELECT a.vec_id, a.cell, pv.max_cell_cosine, pv.dup_of,
  (pv.dup_of IS NULL) AS is_kept
FROM asg${graft.operators.Similarity.kmIters} a
LEFT JOIN pv ON a.vec_id = pv.vid
ORDER BY a.vec_id"""),
    // corpus-wide kNN graph: same Lloyd chain, in-cell pairs, top-k per
    // vector in the classic row_number form
    "sim_knn_graph" -> (simBase + kmeansCtes + s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN asg${graft.operators.Similarity.kmIters} b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp)
SELECT vec_id, neighbor_id, cosine, rank FROM kr WHERE rank <= 3
ORDER BY vec_id, rank"""),
    // kNN-graph hubness: exact-integer in-degree moments (zero-indegree
    // vectors included via the left join), pinned-order closed forms,
    // skew's 3/2 power stated as m2*sqrt(m2) on both engines
    "sim_hubness" -> (simBase + kmeansCtes + s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN asg${graft.operators.Similarity.kmIters} b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ind AS (
  SELECT coalesce(g.d, 0)::BIGINT AS d
  FROM base b LEFT JOIN (
    SELECT neighbor_id, count(*)::BIGINT AS d
    FROM kr WHERE rank <= 3 GROUP BY 1) g
  ON b.vec_id = g.neighbor_id),
m AS (
  SELECT count(*)::BIGINT AS n_vecs,
    CAST(sum(d) AS BIGINT) AS sd,
    CAST(sum(d * d) AS BIGINT) AS sd2,
    CAST(sum(d * d * d) AS BIGINT) AS sd3,
    max(d)::BIGINT AS max_indeg,
    count(*) FILTER (d = 0)::BIGINT AS n_antihubs
  FROM ind),
mm AS (
  SELECT n_vecs, max_indeg, n_antihubs,
    sd / CAST(n_vecs AS DOUBLE) AS mean,
    sd2 / CAST(n_vecs AS DOUBLE) -
      sd / CAST(n_vecs AS DOUBLE) * (sd / CAST(n_vecs AS DOUBLE)) AS m2,
    sd3 / CAST(n_vecs AS DOUBLE) -
      3.0 * (sd / CAST(n_vecs AS DOUBLE)) * (sd2 / CAST(n_vecs AS DOUBLE)) +
      2.0 * (sd / CAST(n_vecs AS DOUBLE)) * (sd / CAST(n_vecs AS DOUBLE)) *
        (sd / CAST(n_vecs AS DOUBLE)) AS m3
  FROM m)
SELECT n_vecs, round(mean, 6) AS mean_indeg, round(m2, 6) AS var_indeg,
  CASE WHEN m2 > 0.0 THEN round(m3 / (m2 * sqrt(m2)), 6) END
    AS skew_indeg,
  max_indeg, n_antihubs,
  round(n_antihubs / CAST(n_vecs AS DOUBLE), 6) AS antihub_share
FROM mm"""),
    // embedding norm health report: the proven-parity sequential dot,
    // decimal moment sums (VARCHAR crossings), pinned-order closing
    // stats
    "sim_norm_stats" -> s"""
WITH norms AS (
  SELECT sqrt(list_inner_product(embedding::DOUBLE[],
    embedding::DOUBLE[])) AS nm
  FROM embeddings),
m AS (
  SELECT count(*)::BIGINT AS n_vecs,
    CAST(CAST(sum(CAST(CAST(nm AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(CAST(nm * nm AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS s2,
    min(nm) AS mn, max(nm) AS mx
  FROM norms)
SELECT n_vecs,
  round(s1 / CAST(n_vecs AS DOUBLE), 6) AS mean_norm,
  round(sqrt(greatest(s2 / CAST(n_vecs AS DOUBLE) -
    s1 / CAST(n_vecs AS DOUBLE) * (s1 / CAST(n_vecs AS DOUBLE)),
    0.0)), 6) AS sd_norm,
  round(mn, 6) AS min_norm, round(mx, 6) AS max_norm,
  CASE WHEN s1 / CAST(n_vecs AS DOUBLE) <> 0.0 THEN
    round(sqrt(greatest(s2 / CAST(n_vecs AS DOUBLE) -
      s1 / CAST(n_vecs AS DOUBLE) * (s1 / CAST(n_vecs AS DOUBLE)),
      0.0)) / (s1 / CAST(n_vecs AS DOUBLE)), 6) END AS norm_cv
FROM m""",
    // hapax/vocabulary-richness report: exact integer counts from two
    // hash aggregates, ln on exact longs, pinned-order Honore R
    // head coverage: integer token-mass sums at the rank cuts; the
    // rank order (freq desc, token) is a stated total order
    "text_head_coverage" -> {
      val shares = graft.operators.TextAnalysis.HeadKs.map(k =>
        s"round(sum(CASE WHEN rank <= $k THEN freq ELSE 0 END) /" +
          s" CAST(sum(freq) AS DOUBLE), 6) AS top${k}_share").mkString(",\n  ")
      s"""
WITH $toksCte,
tf AS (
  SELECT lang, token, count(*)::BIGINT AS freq
  FROM (SELECT lang, unnest(tk) AS token FROM toks)
  GROUP BY 1, 2),
rk AS (
  SELECT lang, freq,
    row_number() OVER (PARTITION BY lang
      ORDER BY freq DESC, token) AS rank
  FROM tf)
SELECT lang, CAST(sum(freq) AS BIGINT) AS n_tokens,
  count(*)::BIGINT AS vocab,
  $shares
FROM rk GROUP BY lang ORDER BY lang"""
    },
    // Yule/Simpson: the second moments ride int128 (HUGEINT — DuckDB's
    // twin of the Spark side's DECIMAL(38,0) grid): fm·m² overflows
    // BIGINT once a head token's frequency passes ~3e9, and both wide
    // grids are exact integers, so the final doubles agree bit-for-bit
    "text_yule_simpson" -> s"""
WITH $toksCte,
tf AS (
  SELECT lang, token, count(*)::BIGINT AS freq
  FROM (SELECT lang, unnest(tk) AS token FROM toks)
  GROUP BY 1, 2),
fof AS (
  SELECT lang, freq AS m, count(*)::BIGINT AS fm FROM tf GROUP BY 1, 2),
agg AS (
  SELECT lang, CAST(sum(m * fm) AS BIGINT) AS n_tokens,
    CAST(sum(fm) AS BIGINT) AS vocab,
    sum(fm * CAST(m AS HUGEINT) * m) AS s2,
    sum(fm * CAST(m AS HUGEINT) * (m - 1)) AS rep2
  FROM fof GROUP BY 1)
SELECT lang, n_tokens, vocab,
  round(10000.0 * CAST(s2 - n_tokens AS DOUBLE) /
    (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yule_k,
  CASE WHEN n_tokens > 1 THEN round(CAST(rep2 AS DOUBLE) /
    (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)), 6)
  END AS simpson_d
FROM agg ORDER BY lang""",
    "text_hapax" -> s"""
WITH $toksCte,
tf AS (
  SELECT lang, token, count(*)::BIGINT AS freq
  FROM (SELECT lang, unnest(tk) AS token FROM toks)
  GROUP BY 1, 2),
m AS (
  SELECT lang, CAST(sum(freq) AS BIGINT) AS n_tokens,
    count(*)::BIGINT AS vocab,
    count(*) FILTER (freq = 1)::BIGINT AS hapax
  FROM tf GROUP BY 1)
SELECT lang, n_tokens, vocab, hapax,
  round(vocab / CAST(n_tokens AS DOUBLE), 6) AS ttr,
  round(hapax / CAST(vocab AS DOUBLE), 6) AS hapax_share,
  CASE WHEN hapax < vocab THEN
    round(100.0 * ln(CAST(n_tokens AS DOUBLE)) /
      (1.0 - hapax / CAST(vocab AS DOUBLE)), 6) END AS honore_r
FROM m ORDER BY lang""",
    // multi-probe kNN graph: membership from the Lloyd assignment,
    // probes = top-2 cells vs the FINAL centroids (rounded cosine,
    // ties by cell) — the ivfKmeansTopK probe rule applied corpus-wide
    "sim_knn_graph_mp" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
mpr AS (
  SELECT vec_id, ev, cell FROM (
    SELECT a.vec_id, a.ev, c.cell,
      row_number() OVER (PARTITION BY a.vec_id
        ORDER BY round(list_inner_product(a.ev, c.centroid), 6) DESC, c.cell) AS crank
    FROM asg$it a CROSS JOIN c$it c)
  WHERE crank <= 2),
kp AS MATERIALIZED (
  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(p.ev, b.ev), 6) AS cosine
  FROM mpr p JOIN asg$it b ON b.cell = p.cell AND b.vec_id <> p.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp)
SELECT vec_id, neighbor_id, cosine, rank FROM kr WHERE rank <= 3
ORDER BY vec_id, rank"""
    }),
    // mutual kNN: edges reciprocated in both top-k lists (self-join of
    // the ranked edge set on the reversed pair)
    "sim_mutual_knn" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id, cosine FROM kr WHERE rank <= 3)
SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b, a.cosine
FROM ged a JOIN ged b
  ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
WHERE a.vec_id < a.neighbor_id
ORDER BY vec_a, vec_b"""
    }),
    // rich-club coefficient: mutual-kNN degrees, per-threshold club
    // membership, phi = 2 E_t / (n_t (n_t - 1))
    "sim_rich_club" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val branches = (1 to 3).map { t =>
        s"""SELECT $t::BIGINT AS min_degree,
  (SELECT count(*)::BIGINT FROM dg WHERE deg >= $t) AS n_club,
  (SELECT count(*)::BIGINT FROM med e
    JOIN dg da ON e.vec_a = da.node AND da.deg >= $t
    JOIN dg db ON e.vec_b = db.node AND db.deg >= $t) AS e_club"""
      }.mkString("\nUNION ALL\n")
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
dg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT vec_a AS node FROM med
    UNION ALL SELECT vec_b AS node FROM med)
  GROUP BY 1),
grid AS (
$branches)
SELECT min_degree, n_club, e_club,
  round(2.0 * CAST(e_club AS DOUBLE) /
    (CASE WHEN n_club > 1
      THEN CAST(n_club * (n_club - 1) AS DOUBLE) END), 6) AS phi
FROM grid ORDER BY min_degree"""
    }),
    // triangles over the mutual-kNN graph: the oracle re-derives the
    // mutual edge set (vec_a < vec_b) and states the compact-forward
    // 3-way join — each triangle appears once as a < b < c.
    "sim_triangles" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id)
SELECT e1.vec_a AS vec_a, e1.vec_b AS vec_b, e2.vec_b AS vec_c
FROM med e1
JOIN med e2 ON e2.vec_a = e1.vec_b
JOIN med e3 ON e3.vec_a = e1.vec_a AND e3.vec_b = e2.vec_b
ORDER BY vec_a, vec_b, vec_c"""
    }),
    // per-node clustering coefficient: same mutual-edge + triangle CTEs,
    // then degree / triangle-membership aggregates and the guarded
    // 2T/(d(d-1)) ratio
    "sim_clustering_coeff" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
tri AS (
  SELECT e1.vec_a AS vec_a, e1.vec_b AS vec_b, e2.vec_b AS vec_c
  FROM med e1
  JOIN med e2 ON e2.vec_a = e1.vec_b
  JOIN med e3 ON e3.vec_a = e1.vec_a AND e3.vec_b = e2.vec_b),
deg AS (
  SELECT vec_id, count(*)::BIGINT AS degree FROM (
    SELECT vec_a AS vec_id FROM med
    UNION ALL SELECT vec_b AS vec_id FROM med)
  GROUP BY vec_id),
tpn AS (
  SELECT vec_id, count(*)::BIGINT AS n_triangles FROM (
    SELECT vec_a AS vec_id FROM tri
    UNION ALL SELECT vec_b AS vec_id FROM tri
    UNION ALL SELECT vec_c AS vec_id FROM tri)
  GROUP BY vec_id)
SELECT d.vec_id, d.degree,
  coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
  CASE WHEN d.degree > 1 THEN
    round(2.0 * coalesce(t.n_triangles, 0) / (d.degree * (d.degree - 1)), 6)
  END AS coeff
FROM deg d LEFT JOIN tpn t ON d.vec_id = t.vec_id
ORDER BY d.vec_id"""
    }),
    // TwoNN intrinsic dimension: rank-1/2 cosines from the cell-pruned
    // kNN chain, ln-ratio terms on the 1e-12 grid, MLE ratio
    "sim_intrinsic_dim" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
cc AS (
  SELECT vec_id,
    max(CASE WHEN rank = 1 THEN cosine END) AS c1,
    max(CASE WHEN rank = 2 THEN cosine END) AS c2
  FROM kr WHERE rank <= 2 GROUP BY 1),
mu AS (
  SELECT CAST(round(0.5 * ln((1.0 - c2) / (1.0 - c1)), 12)
    AS DECIMAL(18,12)) AS t
  FROM cc WHERE c2 IS NOT NULL AND c1 < 1.0),
st AS (
  SELECT count(*)::BIGINT AS n_used, CAST(sum(t) AS DOUBLE) AS slm
  FROM mu),
nv AS (SELECT count(*)::BIGINT AS n_vectors FROM embeddings)
SELECT n_vectors, n_used,
  CASE WHEN slm > 0.0 THEN round(n_used / slm, 6) END AS two_nn_dim
FROM st CROSS JOIN nv"""
    }),
    // degree assortativity: exact integer moment sums over the
    // directed mutual edge list, pinned-order Pearson ratio
    "sim_assortativity" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
adjm AS (
  SELECT vec_a AS src, vec_b AS dst FROM med
  UNION ALL SELECT vec_b AS src, vec_a AS dst FROM med),
deg AS (SELECT src AS vec_id, count(*)::BIGINT AS degree
  FROM adjm GROUP BY 1),
de AS (
  SELECT dx.degree AS dx, dy.degree AS dy
  FROM adjm JOIN deg dx ON adjm.src = dx.vec_id
            JOIN deg dy ON adjm.dst = dy.vec_id),
mm AS (
  SELECT count(*)::BIGINT AS m,
    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
    CAST(sum(dx * dx) AS BIGINT) AS sxx,
    CAST(sum(dy * dy) AS BIGINT) AS syy,
    CAST(sum(dx * dy) AS BIGINT) AS sxy
  FROM de),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM med)
SELECT n_nodes, n_edges,
  CASE WHEN (sxx / CAST(m AS DOUBLE) -
      (sx / CAST(m AS DOUBLE)) * (sx / CAST(m AS DOUBLE))) *
    (syy / CAST(m AS DOUBLE) -
      (sy / CAST(m AS DOUBLE)) * (sy / CAST(m AS DOUBLE))) > 0.0 THEN
    round((sxy / CAST(m AS DOUBLE) -
        (sx / CAST(m AS DOUBLE)) * (sy / CAST(m AS DOUBLE))) /
      sqrt((sxx / CAST(m AS DOUBLE) -
        (sx / CAST(m AS DOUBLE)) * (sx / CAST(m AS DOUBLE))) *
        (syy / CAST(m AS DOUBLE) -
          (sy / CAST(m AS DOUBLE)) * (sy / CAST(m AS DOUBLE)))), 6)
  END AS assortativity
FROM mm CROSS JOIN nn CROSS JOIN ne"""
    }),
    // Adamic–Adar link prediction: mutual edges → adjacency → open
    // wedges (anti-join vs the edge set) → per-pair count + AA score
    // with 1/ln(degree) terms summed on the DECIMAL(28,10) grid
    "sim_link_prediction" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
adjv AS (
  SELECT vec_a AS vec_id, vec_b AS nbr FROM med
  UNION ALL SELECT vec_b AS vec_id, vec_a AS nbr FROM med),
deg AS (SELECT vec_id, count(*)::BIGINT AS degree FROM adjv GROUP BY 1),
wed AS (
  SELECT x.vec_id AS mid, x.nbr AS vec_a, y.nbr AS vec_b
  FROM adjv x JOIN adjv y ON x.vec_id = y.vec_id AND x.nbr < y.nbr),
opn AS (
  SELECT w.mid, w.vec_a, w.vec_b
  FROM wed w LEFT JOIN med m ON w.vec_a = m.vec_a AND w.vec_b = m.vec_b
  WHERE m.vec_a IS NULL)
SELECT o.vec_a, o.vec_b, count(*)::BIGINT AS common_neighbors,
  round(CAST(CAST(sum(CAST(1.0 / ln(d.degree) AS DECIMAL(28,10)))
    AS VARCHAR) AS DOUBLE), 6) AS adamic_adar
FROM opn o JOIN deg d ON o.mid = d.vec_id
GROUP BY 1, 2 ORDER BY vec_a, vec_b"""
    }),
    // PageRank over the kNN graph: unrolled power iterations, inflow
    // sums as DECIMAL(28,10) (order-independent), p/outdeg contribs,
    // dangling mass dropped, teleport via LEFT JOIN + coalesce. The
    // teleport constant is the Scala double (1 - 0.85) interpolated so
    // both engines use the bit-identical IEEE value.
    "sim_pagerank" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val d = graft.operators.Similarity.prDamping
      val tele = (1 - d).toString // exact Scala double round-trip
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id AS src, neighbor_id AS dst FROM kr WHERE rank <= 3),
od AS (SELECT src, count(*)::BIGINT AS outdeg FROM ged GROUP BY src),
nd AS (SELECT DISTINCT node FROM
  (SELECT src AS node FROM ged UNION ALL SELECT dst FROM ged)),
nn AS (SELECT count(*)::BIGINT AS n FROM nd),
pr0 AS (SELECT node, 1.0::DOUBLE / n AS p FROM nd CROSS JOIN nn)""")
      for (i <- 1 to graft.operators.Similarity.prIters) {
        sb.append(s""",
fi$i AS (
  -- VARCHAR-mediated decimal crossings (the engine-wide sub-ulp
  -- convention): shortest-repr in, exact-digits out — found as a
  -- 1-ulp pagerank mismatch at sf0.1 (round-9)
  SELECT ged.dst AS node,
    CAST(CAST(sum(CAST(CAST(p.p / od.outdeg AS VARCHAR)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS inflow
  FROM ged JOIN pr${i - 1} p ON ged.src = p.node
  JOIN od ON ged.src = od.src
  GROUP BY ged.dst),
pr$i AS (
  SELECT nd.node,
    ($tele::DOUBLE / n) + $d::DOUBLE * coalesce(inflow, 0.0::DOUBLE) AS p
  FROM nd CROSS JOIN nn LEFT JOIN fi$i ON nd.node = fi$i.node)""")
      }
      sb.append(s"""
SELECT node AS vec_id,
  CAST(CAST(CAST(CAST(p AS VARCHAR) AS DECIMAL(28,10)) AS VARCHAR)
    AS DOUBLE) AS pagerank
FROM pr${graft.operators.Similarity.prIters} ORDER BY vec_id""")
      sb.toString
    }),
    // personalized PageRank: the pagerank unroll with a seed-set
    // teleport (node % pprSeedMod = 0), same VARCHAR-decimal crossings
    "sim_personalized_pagerank" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val d = graft.operators.Similarity.prDamping
      val tele = (1 - d).toString
      val sm = graft.operators.Similarity.pprSeedMod
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id AS src, neighbor_id AS dst FROM kr WHERE rank <= 3),
od AS (SELECT src, count(*)::BIGINT AS outdeg FROM ged GROUP BY src),
nd AS (SELECT DISTINCT node FROM
  (SELECT src AS node FROM ged UNION ALL SELECT dst FROM ged)),
pr0 AS (SELECT node,
  CASE WHEN node % $sm = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS p
  FROM nd)""")
      for (i <- 1 to graft.operators.Similarity.prIters) {
        sb.append(s""",
fi$i AS (
  SELECT ged.dst AS node,
    CAST(CAST(sum(CAST(CAST(p.p / od.outdeg AS VARCHAR)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS inflow
  FROM ged JOIN pr${i - 1} p ON ged.src = p.node
  JOIN od ON ged.src = od.src
  GROUP BY ged.dst),
pr$i AS (
  SELECT nd.node,
    ($tele::DOUBLE *
      CASE WHEN nd.node % $sm = 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
      + $d::DOUBLE * coalesce(inflow, 0.0::DOUBLE) AS p
  FROM nd LEFT JOIN fi$i ON nd.node = fi$i.node)""")
      }
      sb.append(s"""
SELECT node AS vec_id, node % $sm = 0 AS is_seed,
  CAST(CAST(CAST(CAST(p AS VARCHAR) AS DECIMAL(28,10)) AS VARCHAR)
    AS DOUBLE) AS ppr
FROM pr${graft.operators.Similarity.prIters} ORDER BY vec_id""")
      sb.toString
    }),
    // kNN edges at cosine >= 0.3 -> recursive min-label components
    // (the dedup_clusters oracle pattern over the embedding graph)
    "sim_knn_components" -> ((simBase + kmeansCtes)
      .replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN asg${graft.operators.Similarity.kmIters} b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id, cosine,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ed AS (SELECT vec_id AS a, neighbor_id AS b FROM kr
  WHERE rank <= 3
    AND cosine >= ${graft.operators.Similarity.knnComponentThreshold}),
edges(a, b) AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a)
SELECT node AS vec_id, min(label) AS cluster_id
FROM reach GROUP BY node ORDER BY vec_id"""),
    // DBSCAN: in-cell eps-pairs at rounded cosine >= tau, degree >=
    // minPts cores, recursive min-label components over core-core
    // edges, border = min core-neighbor cluster, rest noise
    "sim_dbscan" -> ((simBase + kmeansCtes)
      .replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
nbrs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg${graft.operators.Similarity.kmIters} a
  JOIN asg${graft.operators.Similarity.kmIters} b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id
  WHERE round(list_inner_product(a.ev, b.ev), 6) >=
    ${graft.operators.Similarity.dbscanTau}),
deg AS (SELECT vec_id, count(*)::BIGINT AS n_nbrs FROM nbrs GROUP BY 1),
cores AS (SELECT vec_id FROM deg
  WHERE n_nbrs >= ${graft.operators.Similarity.dbscanMinPts}),
ce AS (
  SELECT n.vec_id AS a, n.nbr AS b FROM nbrs n
  JOIN cores c1 ON n.vec_id = c1.vec_id
  JOIN cores c2 ON n.nbr = c2.vec_id),
edges(a, b) AS (SELECT a, b FROM ce UNION SELECT b, a FROM ce),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cc AS (SELECT node AS vec_id, min(label) AS cluster_id
  FROM reach GROUP BY node),
core_out AS (
  SELECT c.vec_id,
    coalesce(cc.cluster_id, c.vec_id::BIGINT) AS cluster_id
  FROM cores c LEFT JOIN cc ON c.vec_id = cc.vec_id),
border AS (
  SELECT n.vec_id, min(co.cluster_id) AS cluster_id
  FROM nbrs n
  JOIN core_out co ON n.nbr = co.vec_id
  WHERE n.vec_id NOT IN (SELECT vec_id FROM cores)
  GROUP BY n.vec_id),
lab AS (
  SELECT vec_id, cluster_id, 'core' AS role FROM core_out
  UNION ALL
  SELECT vec_id, cluster_id, 'border' AS role FROM border)
SELECT b.vec_id,
  coalesce(l.role, 'noise') AS role,
  l.cluster_id,
  coalesce(d.n_nbrs, 0) AS n_nbrs
FROM base b
LEFT JOIN lab l ON b.vec_id = l.vec_id
LEFT JOIN deg d ON b.vec_id = d.vec_id
ORDER BY b.vec_id"""),
    // semantic decontamination: exact max cosine of every train vector
    // to the broadcast eval set (q = vec_id < 20), argmax row carries
    // both outputs, ties by eval_id
    "sim_decontaminate" -> (simBase + s""",
tr AS (SELECT vec_id, ev FROM base WHERE vec_id >= 20),
sc AS (
  SELECT tr.vec_id, q.query_id AS eval_id,
    round(list_inner_product(tr.ev, q.qv), 6) AS cosine
  FROM tr CROSS JOIN q),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, eval_id) AS rn
  FROM sc),
ag AS (SELECT vec_id, eval_id AS near_eval_id, cosine AS max_eval_cosine
  FROM rk WHERE rn = 1)
SELECT t.vec_id, ag.max_eval_cosine, ag.near_eval_id,
  coalesce(ag.max_eval_cosine >= ${graft.operators.Similarity.semDeconThreshold},
    false) AS flagged
FROM tr t LEFT JOIN ag USING (vec_id) ORDER BY vec_id"""),
    // 1-bit sign quantization + hamming ranking: the same two-halves
    // bit assembly as dedup_simhash (no BIGINT sign bit touched), ties
    // by neighbor_id (hamming is a small integer — ties are the norm)
    "sim_binary_topk" -> (simBase + {
      def half(off: Int): String = (0 until 32)
        .map(j => s"(CASE WHEN ev[${off + j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s""",
bn AS (
  SELECT vec_id,
    (${half(0)})::BIGINT AS bin_lo,
    (${half(32)})::BIGINT AS bin_hi
  FROM base),
q2 AS (SELECT vec_id AS query_id, bin_lo AS qlo, bin_hi AS qhi
  FROM bn WHERE vec_id < 20),
sc AS (
  SELECT query_id, bn.vec_id AS neighbor_id,
    (bit_count(xor(bin_lo, qlo)) + bit_count(xor(bin_hi, qhi)))::BIGINT AS hamming
  FROM bn CROSS JOIN q2 WHERE bn.vec_id <> q2.query_id),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, neighbor_id)::BIGINT AS rank
  FROM sc)
SELECT query_id, neighbor_id, hamming, rank FROM rk WHERE rank <= 5
ORDER BY query_id, rank"""
    }),
    // two-stage serving: PQ/ADC proposes 50 candidates (rounded-6 adc,
    // ties by neighbor id), the exact cosine reranks them to 5
    "sim_rerank_topk" -> (simBase + pqCtes + {
      val m = graft.operators.Similarity.pqM
      val sd = graft.operators.Similarity.pqSubDim
      val it = graft.operators.Similarity.kmIters
      val joins = (0 until m).map(s =>
        s"JOIN pa$s$it a$s USING (vec_id) JOIN pc$s$it c$s ON a$s.cell = c$s.cell")
        .mkString("\n  ")
      val adc = (0 until m)
        .map(s => s"list_inner_product(q.qv[${s * sd + 1}:${(s + 1) * sd}], c$s.centroid)")
        .mkString(" + ")
      s""",
s1 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY round($adc, 6) DESC, b.vec_id) AS crank
    FROM base b
    $joins
    CROSS JOIN q
    WHERE b.vec_id <> q.query_id)
  WHERE crank <= 50),
ex AS (
  SELECT s1.query_id, s1.neighbor_id,
    round(list_inner_product(q.qv, b.ev), 6) AS cosine
  FROM s1 JOIN q ON s1.query_id = q.query_id
  JOIN base b ON s1.neighbor_id = b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM ex)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""
    }),
    // int8-quantized brute force: same scale/code formulas (floor(x/s+0.5))
    "sim_quantized_topk" -> (simBase + s""",
qz AS (
  SELECT vec_id, qscale,
    list_transform(ev, x -> floor(x / qscale + 0.5)) AS q
  FROM (
    SELECT vec_id, ev,
      list_max(list_transform(ev, x -> abs(x))) / 127.0 AS qscale
    FROM base)),
q2 AS (SELECT vec_id AS query_id, q AS qq, qscale AS qs FROM qz WHERE vec_id < 20),
scored AS (
  SELECT query_id, qz.vec_id AS neighbor_id,
    round(list_inner_product(qq, q) * qs * qscale, 6) AS cosine
  FROM qz CROSS JOIN q2 WHERE qz.vec_id <> q2.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""),
    // PQ/ADC top-k: the unrolled per-subspace Lloyd builds, then
    // approximate cosine = sum over subspaces of q_slice . centroid(code)
    // PQ distortion per subspace: final assignments joined to final
    // codebooks, 1e-12-grid error sums, pinned-order explained ratio
    "sim_pq_distortion" -> (simBase + pqCtes + {
      val it = graft.operators.Similarity.kmIters
      val blocks = (0 until graft.operators.Similarity.pqM).map { s =>
        s"""
SELECT sub, n_vectors, round(mseu, 6) AS mse,
  round(powu, 6) AS sub_power,
  round(1.0 - mseu / powu, 6) AS explained
FROM (
  SELECT $s::BIGINT AS sub, count(*)::BIGINT AS n_vectors,
    CAST(CAST(sum(CAST(round(
      list_inner_product(a.v, a.v) -
        2 * list_inner_product(a.v, c.centroid) +
        list_inner_product(c.centroid, c.centroid), 12)
      AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS mseu,
    CAST(CAST(sum(CAST(round(list_inner_product(a.v, a.v), 12)
      AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS powu
  FROM pa$s$it a JOIN pc$s$it c USING (cell))"""
      }.mkString("\nUNION ALL")
      blocks + "\nORDER BY sub"
    }),
    "sim_pq_topk" -> (simBase + pqCtes + {
      val m = graft.operators.Similarity.pqM
      val sd = graft.operators.Similarity.pqSubDim
      val it = graft.operators.Similarity.kmIters
      val joins = (0 until m).map(s =>
        s"JOIN pa$s$it a$s USING (vec_id) JOIN pc$s$it c$s ON a$s.cell = c$s.cell")
        .mkString("\n  ")
      val adc = (0 until m)
        .map(s => s"list_inner_product(q.qv[${s * sd + 1}:${(s + 1) * sd}], c$s.centroid)")
        .mkString(" + ")
      s""",
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, round($adc, 6) AS cosine
  FROM base b
  $joins
  CROSS JOIN q
  WHERE b.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""
    }),
    // IVF-PQ: the composed oracle — kmeans probe chain + PQ code chains,
    // candidates from probed cells, ADC scoring
    "sim_ivfpq_topk" -> (simBase + kmeansCtes + pqCtes + {
      val m = graft.operators.Similarity.pqM
      val sd = graft.operators.Similarity.pqSubDim
      val it = graft.operators.Similarity.kmIters
      val joins = (0 until m).map(s =>
        s"JOIN pa$s$it a$s USING (vec_id) JOIN pc$s$it c$s ON a$s.cell = c$s.cell")
        .mkString("\n  ")
      val adc = (0 until m)
        .map(s => s"list_inner_product(p.qu[${s * sd + 1}:${(s + 1) * sd}], c$s.centroid)")
        .mkString(" + ")
      s""",
q3 AS (SELECT vec_id AS query_id, ev AS qu FROM asg$it WHERE vec_id < 20),
probes AS (
  SELECT query_id, qu, cell FROM (
    SELECT q3.query_id, q3.qu, c.cell,
      row_number() OVER (PARTITION BY q3.query_id
        ORDER BY round(list_inner_product(q3.qu, c.centroid), 6) DESC, c.cell) AS crank
    FROM q3 CROSS JOIN c$it c)
  WHERE crank <= 2),
scored AS (
  SELECT p.query_id, b.vec_id AS neighbor_id, round($adc, 6) AS cosine
  FROM asg$it b
  JOIN probes p ON b.cell = p.cell
  $joins
  WHERE b.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""
    }),
    // residual IVF-PQ (classic IVFADC): the kmeans probe chain + the
    // residual Lloyd chains, ADC = coarse term q·c(cell) PLUS the
    // subspace sum (parenthesized so both engines associate the float
    // adds identically)
    "sim_ivfpq_residual" -> (simBase + kmeansCtes + residPqCtes + {
      val m = graft.operators.Similarity.pqM
      val sd = graft.operators.Similarity.pqSubDim
      val it = graft.operators.Similarity.kmIters
      val joins = (0 until m).map(s =>
        s"JOIN rpa$s$it a$s USING (vec_id) JOIN rpc$s$it c$s ON a$s.cell = c$s.cell")
        .mkString("\n  ")
      val adc = (0 until m)
        .map(s => s"list_inner_product(p.qu[${s * sd + 1}:${(s + 1) * sd}], c$s.centroid)")
        .mkString(" + ")
      s""",
q3 AS (SELECT vec_id AS query_id, ev AS qu FROM asg$it WHERE vec_id < 20),
probes AS (
  SELECT query_id, qu, cell FROM (
    SELECT q3.query_id, q3.qu, c.cell,
      row_number() OVER (PARTITION BY q3.query_id
        ORDER BY round(list_inner_product(q3.qu, c.centroid), 6) DESC, c.cell) AS crank
    FROM q3 CROSS JOIN c$it c)
  WHERE crank <= 2),
scored AS (
  SELECT p.query_id, b.vec_id AS neighbor_id,
    round(list_inner_product(p.qu, mm.mcent) + ($adc), 6) AS cosine
  FROM asg$it b
  JOIN probes p ON b.cell = p.cell
  JOIN cmm mm ON b.cell = mm.cell
  $joins
  WHERE b.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""
    }),
    // SRP-banded near-dup: identical banding to the Spark plan (candidates
    // share band0 or band1), exact cosine verified within buckets.
    "sim_neardup_pairs" -> (simBase + srpCtes + s""",
bd AS (
  SELECT vec_id, ev, 0 AS band, band0 AS key FROM sb
  UNION ALL
  SELECT vec_id, ev, 1 AS band, band1 AS key FROM sb),
pr AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
    ${cosSql("a.ev", "b.ev")} AS cosine
  FROM bd a JOIN bd b ON a.band = b.band AND a.key = b.key
    AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cosine FROM pr WHERE cosine >= 0.9
ORDER BY vec_a, vec_b"""),
    // Matryoshka fidelity: per truncation dim, each query's overlap@10
    // between truncated-prefix retrieval and full-vector retrieval —
    // three brute-force rankings (rounded cosine, id tiebreak), integer
    // semi-join overlap counts
    "sim_matryoshka" -> (simBase + s""",
fullr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${cosSql("q.qv", "b.ev")} DESC, b.vec_id) AS rank
    FROM q CROSS JOIN base b WHERE b.vec_id <> q.query_id)
  WHERE rank <= 10)""" +
      graft.operators.Similarity.mrlDims.map { d => s""",
t$d AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY round(list_inner_product(
          ${unitSql(s"(q.embedding::DOUBLE[])[1:$d]")},
          ${unitSql(s"(b.embedding::DOUBLE[])[1:$d]")}), 6) DESC,
          b.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings b
    WHERE q.vec_id < 20 AND b.vec_id <> q.vec_id)
  WHERE rank <= 10),
o$d AS (
  SELECT t.query_id, sum(CASE WHEN f.neighbor_id IS NOT NULL
    THEN 1 ELSE 0 END)::BIGINT AS n_overlap
  FROM t$d t LEFT JOIN fullr f
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY t.query_id)"""
      }.mkString + "\n" +
      graft.operators.Similarity.mrlDims.map { d =>
        s"""SELECT query_id, $d::BIGINT AS dim, n_overlap,
  round(n_overlap::DOUBLE / 10, 6) AS overlap_at_k FROM o$d"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY dim, query_id")),
    // Recall@k of the binary / IVF / IVF-PQ rungs vs exact brute force:
    // each variant's retrieval chain is the SAME verified SQL as its own
    // oracle row (CTEs renamed to coexist in one statement); the exact
    // top-k is the spine of each overlap so every query reports recall
    // even when its probed cells return < k candidates.
    "sim_recall_report" -> (simBase + kmeansCtes + pqCtes + {
      val m = graft.operators.Similarity.pqM
      val sd = graft.operators.Similarity.pqSubDim
      val it = graft.operators.Similarity.kmIters
      def binHalf(off: Int): String = (0 until 32)
        .map(j => s"(CASE WHEN ev[${off + j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      val joins = (0 until m).map(s =>
        s"JOIN pa$s$it a$s USING (vec_id) JOIN pc$s$it c$s ON a$s.cell = c$s.cell")
        .mkString("\n  ")
      val adc = (0 until m)
        .map(s => s"list_inner_product(p.qu[${s * sd + 1}:${(s + 1) * sd}], c$s.centroid)")
        .mkString(" + ")
      s""",
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${cosSql("q.qv", "b.ev")} DESC, b.vec_id) AS rank
    FROM q CROSS JOIN base b WHERE b.vec_id <> q.query_id)
  WHERE rank <= 5),
bn AS (
  SELECT vec_id,
    (${binHalf(0)})::BIGINT AS bin_lo,
    (${binHalf(32)})::BIGINT AS bin_hi
  FROM base),
bq2 AS (SELECT vec_id AS query_id, bin_lo AS qlo, bin_hi AS qhi
  FROM bn WHERE vec_id < 20),
bn_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT bq2.query_id, bn.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY bq2.query_id ORDER BY
        bit_count(xor(bin_lo, qlo)) + bit_count(xor(bin_hi, qhi)),
        bn.vec_id) AS rank
    FROM bn CROSS JOIN bq2 WHERE bn.vec_id <> bq2.query_id)
  WHERE rank <= 5),
cent AS (
  SELECT label, ${unitSql("centroid")} AS cunit FROM (
    SELECT label, list(cv ORDER BY pos) AS centroid FROM (
      SELECT label, pos,
        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS cv FROM (
        SELECT label, unnest(embedding::DOUBLE[]) AS v,
               unnest(range(len(embedding))) AS pos
        FROM embeddings)
      GROUP BY label, pos)
    GROUP BY label)),
iv_pr AS (
  SELECT query_id, qv, label FROM (
    SELECT q.query_id, q.qv, cent.label,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY ${cosSql("q.qv", "cent.cunit")} DESC, cent.label) AS crank
    FROM q CROSS JOIN cent)
  WHERE crank <= 2),
iv_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY query_id
        ORDER BY ${cosSql("qv", "ev")} DESC, vec_id) AS rank
    FROM base JOIN iv_pr ON base.label = iv_pr.label
    WHERE vec_id <> query_id)
  WHERE rank <= 5),
pq3 AS (SELECT vec_id AS query_id, ev AS qu FROM asg$it WHERE vec_id < 20),
pq_pr AS (
  SELECT query_id, qu, cell FROM (
    SELECT pq3.query_id, pq3.qu, c.cell,
      row_number() OVER (PARTITION BY pq3.query_id
        ORDER BY round(list_inner_product(pq3.qu, c.centroid), 6) DESC, c.cell) AS crank
    FROM pq3 CROSS JOIN c$it c)
  WHERE crank <= 2),
pq_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, b.vec_id AS neighbor_id,
      row_number() OVER (PARTITION BY p.query_id
        ORDER BY round($adc, 6) DESC, b.vec_id) AS rank
    FROM asg$it b
    JOIN pq_pr p ON b.cell = p.cell
    $joins
    WHERE b.vec_id <> p.query_id)
  WHERE rank <= 5),
ov_bn AS (
  SELECT b.query_id, sum(CASE WHEN v.neighbor_id IS NOT NULL
    THEN 1 ELSE 0 END)::BIGINT AS n_overlap
  FROM bf b LEFT JOIN bn_top v
    ON b.query_id = v.query_id AND b.neighbor_id = v.neighbor_id
  GROUP BY b.query_id),
ov_iv AS (
  SELECT b.query_id, sum(CASE WHEN v.neighbor_id IS NOT NULL
    THEN 1 ELSE 0 END)::BIGINT AS n_overlap
  FROM bf b LEFT JOIN iv_top v
    ON b.query_id = v.query_id AND b.neighbor_id = v.neighbor_id
  GROUP BY b.query_id),
ov_pq AS (
  SELECT b.query_id, sum(CASE WHEN v.neighbor_id IS NOT NULL
    THEN 1 ELSE 0 END)::BIGINT AS n_overlap
  FROM bf b LEFT JOIN pq_top v
    ON b.query_id = v.query_id AND b.neighbor_id = v.neighbor_id
  GROUP BY b.query_id)
SELECT variant, query_id, n_overlap,
  round(n_overlap::DOUBLE / 5, 6) AS recall_at_k
FROM (
  SELECT 'binary' AS variant, query_id, n_overlap FROM ov_bn
  UNION ALL SELECT 'ivf', query_id, n_overlap FROM ov_iv
  UNION ALL SELECT 'ivfpq', query_id, n_overlap FROM ov_pq)
ORDER BY variant, query_id"""
    }),
    // radius search: rounded-cosine floor on the brute-force probe set
    "sim_range_search" -> (simBase + s""",
scored AS (
  SELECT query_id, vec_id AS neighbor_id, ${cosSql("qv", "ev")} AS cosine
  FROM base CROSS JOIN q WHERE vec_id <> query_id)
SELECT query_id, neighbor_id, cosine FROM scored
WHERE cosine >= ${graft.operators.Similarity.rangeTau}
ORDER BY query_id, cosine DESC, neighbor_id"""),
    // label propagation over the kNN graph: clamped seeds, integer
    // majority votes (ties → smallest label), lpIters unrolled rounds
    "sim_label_propagation" -> (lpChainCtes + s"""
SELECT vec_id, (vec_id < ${graft.operators.Similarity.lpSeeds}) AS is_seed,
  lab AS label
FROM l${graft.operators.Similarity.lpIters}
ORDER BY vec_id"""),
    // community-quality report: Newman modularity terms over the
    // symmetrized kNN graph restricted to labeled nodes
    "sim_lp_communities" -> (lpChainCtes + s""",
lf AS (SELECT vec_id, lab FROM l${graft.operators.Similarity.lpIters}
  WHERE lab IS NOT NULL),
und AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
    greatest(vec_id, neighbor_id) AS b
  FROM e),
le AS (
  SELECT u.a, u.b, la.lab AS la, lb.lab AS lb
  FROM und u JOIN lf la ON u.a = la.vec_id
             JOIN lf lb ON u.b = lb.vec_id),
mm AS (SELECT count(*) AS m_edges FROM le),
dg AS (
  SELECT lab, count(*) AS degree_sum FROM (
    SELECT a AS v, la AS lab FROM le
    UNION ALL SELECT b AS v, lb AS lab FROM le)
  GROUP BY 1),
ie AS (SELECT la AS lab, count(*) AS in_edges FROM le WHERE la = lb
  GROUP BY 1),
nd AS (SELECT lab, count(*) AS n_nodes FROM lf GROUP BY 1)
SELECT nd.lab AS community, nd.n_nodes::BIGINT AS n_nodes,
  CAST(coalesce(ie.in_edges, 0) AS BIGINT) AS in_edges,
  CAST(coalesce(dg.degree_sum, 0) AS BIGINT) AS degree_sum,
  round(coalesce(ie.in_edges, 0)::DOUBLE / CAST(m_edges AS DOUBLE) -
    (coalesce(dg.degree_sum, 0)::DOUBLE /
      (2.0 * CAST(m_edges AS DOUBLE))) *
    (coalesce(dg.degree_sum, 0)::DOUBLE /
      (2.0 * CAST(m_edges AS DOUBLE))), 6) AS modularity_term
FROM nd
LEFT JOIN dg USING (lab)
LEFT JOIN ie USING (lab)
CROSS JOIN mm
ORDER BY community"""),
    // per-community conductance: cut/min(vol, 2m−vol) from the SAME
    // community cells as the modularity report — exact integers, one
    // guarded division
    "sim_conductance" -> (lpChainCtes + s""",
lf AS (SELECT vec_id, lab FROM l${graft.operators.Similarity.lpIters}
  WHERE lab IS NOT NULL),
und AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
    greatest(vec_id, neighbor_id) AS b
  FROM e),
le AS (
  SELECT u.a, u.b, la.lab AS la, lb.lab AS lb
  FROM und u JOIN lf la ON u.a = la.vec_id
             JOIN lf lb ON u.b = lb.vec_id),
dg AS (
  SELECT lab, count(*) AS degree_sum FROM (
    SELECT a AS v, la AS lab FROM le
    UNION ALL SELECT b AS v, lb AS lab FROM le)
  GROUP BY 1),
ie AS (SELECT la AS lab, count(*) AS in_edges FROM le WHERE la = lb
  GROUP BY 1),
nd AS (SELECT lab, count(*) AS n_nodes FROM lf GROUP BY 1),
rep AS (
  SELECT nd.lab AS community, nd.n_nodes::BIGINT AS n_nodes,
    CAST(coalesce(ie.in_edges, 0) AS BIGINT) AS in_edges,
    CAST(coalesce(dg.degree_sum, 0) AS BIGINT) AS degree_sum
  FROM nd
  LEFT JOIN dg USING (lab)
  LEFT JOIN ie USING (lab)),
vt AS (SELECT CAST(sum(degree_sum) AS BIGINT) AS vol_total FROM rep)
SELECT community, n_nodes, in_edges, degree_sum,
  CAST(degree_sum - 2 * in_edges AS BIGINT) AS cut_edges,
  round(CAST(degree_sum - 2 * in_edges AS DOUBLE) /
    (CASE WHEN least(degree_sum, vol_total - degree_sum) > 0
      THEN CAST(least(degree_sum, vol_total - degree_sum) AS DOUBLE)
      END), 6) AS conductance
FROM rep CROSS JOIN vt
ORDER BY community"""),
    // convergence-ASSERTED k-core peel: kcoreOracleRounds unrolled
    // drop-and-refilter rounds over the mutual-kNN edge set, with a
    // final error() guard proving the last two rounds agree — SQL
    // cannot loop, so the unroll is generous and the assert makes a
    // too-shallow bound a LOUD failure instead of a vacuous hash
    // match on an under-peeled graph (the Spark side peels to true
    // convergence). Every chain CTE is MATERIALIZED: e_i and keep_i
    // are each referenced twice per round, and DuckDB's default
    // inlining re-expands the whole upstream (kmeans + pair join)
    // EXPONENTIALLY in the round count — measured as a
    // never-finishing sf0.1 oracle before the hint.
    "sim_kcore" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val kk = graft.operators.Similarity.kcoreK
      val rounds = graft.operators.Similarity.kcoreOracleRounds
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
e0 AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
d0 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM
  (SELECT vec_a AS node FROM e0 UNION ALL SELECT vec_b FROM e0)
  GROUP BY 1)""")
      for (i <- 1 to rounds) {
        sb.append(s""",
kp$i AS MATERIALIZED (SELECT node FROM d${i - 1} WHERE deg >= $kk),
e$i AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b FROM e${i - 1} e
  JOIN kp$i ka ON e.vec_a = ka.node
  JOIN kp$i kb ON e.vec_b = kb.node),
d$i AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM
  (SELECT vec_a AS node FROM e$i UNION ALL SELECT vec_b FROM e$i)
  GROUP BY 1)""")
      }
      sb.append(s""",
converged AS MATERIALIZED (
  SELECT CASE WHEN (SELECT count(*) FROM e$rounds) =
                   (SELECT count(*) FROM e${rounds - 1})
    THEN 1 ELSE error('sim_kcore oracle unroll of $rounds rounds did ' ||
      'not converge - raise Similarity.kcoreOracleRounds') END AS ok)
SELECT d0.node AS vec_id, d0.deg AS deg0,
  CAST(coalesce(d$rounds.deg, 0) AS BIGINT) AS deg_final,
  coalesce(d$rounds.deg, 0) >= $kk AS in_core
FROM d0 LEFT JOIN d$rounds ON d0.node = d$rounds.node
WHERE (SELECT ok FROM converged) = 1
ORDER BY vec_id""")
      sb.toString
    }),
    // convergence-ASSERTED k-truss peel over the mutual-kNN edge set:
    // same contract as sim_kcore — unrolled rounds, error() if the
    // last two edge sets differ, every chain CTE MATERIALIZED (und_i
    // and e_i are referenced 2-3 times per round)
    "sim_ktruss" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val kk = graft.operators.Similarity.ktrussK
      val rounds = graft.operators.Similarity.ktrussOracleRounds
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
e0 AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id)""")
      def roundCtes(i: Int): String = s""",
und$i AS MATERIALIZED (
  SELECT vec_a AS u, vec_b AS c FROM e${i - 1}
  UNION ALL SELECT vec_b AS u, vec_a AS c FROM e${i - 1}),
sup$i AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b, count(*)::BIGINT AS support
  FROM e${i - 1} e
  JOIN und$i na ON e.vec_a = na.u
  JOIN und$i nb ON e.vec_b = nb.u AND na.c = nb.c
  GROUP BY 1, 2),
e$i AS MATERIALIZED (
  SELECT vec_a, vec_b FROM sup$i WHERE support >= ${kk - 2})"""
      for (i <- 1 to rounds) sb.append(roundCtes(i))
      sb.append(s""",
sup0 AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b, count(*)::BIGINT AS support
  FROM e0 e
  JOIN und1 na ON e.vec_a = na.u
  JOIN und1 nb ON e.vec_b = nb.u AND na.c = nb.c
  GROUP BY 1, 2),
supf AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b, count(*)::BIGINT AS support
  FROM e$rounds e
  JOIN (SELECT vec_a AS u, vec_b AS c FROM e$rounds
    UNION ALL SELECT vec_b AS u, vec_a AS c FROM e$rounds) na
    ON e.vec_a = na.u
  JOIN (SELECT vec_a AS u, vec_b AS c FROM e$rounds
    UNION ALL SELECT vec_b AS u, vec_a AS c FROM e$rounds) nb
    ON e.vec_b = nb.u AND na.c = nb.c
  GROUP BY 1, 2),
converged AS MATERIALIZED (
  SELECT CASE WHEN (SELECT count(*) FROM e$rounds) =
                   (SELECT count(*) FROM e${rounds - 1})
    THEN 1 ELSE error('sim_ktruss oracle unroll of $rounds rounds did ' ||
      'not converge - raise Similarity.ktrussOracleRounds') END AS ok)
SELECT e0.vec_a, e0.vec_b,
  CAST(coalesce(sup0.support, 0) AS BIGINT) AS sup0,
  CAST(coalesce(supf.support, 0) AS BIGINT) AS sup_final,
  supf.support IS NOT NULL AS in_truss
FROM e0
LEFT JOIN sup0 ON e0.vec_a = sup0.vec_a AND e0.vec_b = sup0.vec_b
LEFT JOIN supf ON e0.vec_a = supf.vec_a AND e0.vec_b = supf.vec_b
WHERE (SELECT ok FROM converged) = 1
ORDER BY e0.vec_a, e0.vec_b""")
      sb.toString
    }),
    // full core decomposition: three convergence-asserted kcore
    // unrolls (thresholds 1..3), core number = highest surviving
    // threshold — all-integer, same MATERIALIZED-chain discipline
    "sim_coreness" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val rounds = graft.operators.Similarity.kcoreOracleRounds
      val maxK = 3
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
e0 AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
d0 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM
  (SELECT vec_a AS node FROM e0 UNION ALL SELECT vec_b FROM e0)
  GROUP BY 1)""")
      for (c <- 1 to maxK) {
        sb.append(s""",
c${c}e0 AS MATERIALIZED (SELECT vec_a, vec_b FROM e0),
c${c}d0 AS MATERIALIZED (SELECT node, deg FROM d0)""")
        for (i <- 1 to rounds) {
          sb.append(s""",
c${c}kp$i AS MATERIALIZED (SELECT node FROM c${c}d${i - 1} WHERE deg >= $c),
c${c}e$i AS MATERIALIZED (
  SELECT e.vec_a, e.vec_b FROM c${c}e${i - 1} e
  JOIN c${c}kp$i ka ON e.vec_a = ka.node
  JOIN c${c}kp$i kb ON e.vec_b = kb.node),
c${c}d$i AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM
  (SELECT vec_a AS node FROM c${c}e$i UNION ALL SELECT vec_b FROM c${c}e$i)
  GROUP BY 1)""")
        }
      }
      val allConv = (1 to maxK).map(c =>
        s"""(SELECT count(*) FROM c${c}e$rounds) =
   (SELECT count(*) FROM c${c}e${rounds - 1})""").mkString(" AND\n  ")
      val coreCase = (maxK to 1 by -1).map(c =>
        s"WHEN coalesce(c${c}f.deg, 0) >= $c THEN $c").mkString("\n    ")
      val joins = (1 to maxK).map(c =>
        s"LEFT JOIN c${c}d$rounds c${c}f ON d0.node = c${c}f.node")
        .mkString("\n")
      sb.append(s""",
converged AS MATERIALIZED (
  SELECT CASE WHEN $allConv
    THEN 1 ELSE error('sim_coreness oracle unroll did not converge - ' ||
      'raise Similarity.kcoreOracleRounds') END AS ok)
SELECT d0.node AS vec_id, d0.deg AS deg0,
  CAST(CASE $coreCase
    ELSE 0 END AS BIGINT) AS coreness
FROM d0
$joins
WHERE (SELECT ok FROM converged) = 1
ORDER BY vec_id""")
      sb.toString
    }),
    // multi-source BFS from component representatives (recursive-CTE
    // min-label CC for the seeds, then a convergence-asserted layered
    // relaxation unroll for the distances)
    "sim_bfs_radius" -> ((simBase + kmeansCtes)
      .replaceFirst("\nWITH ", "\nWITH RECURSIVE ") + {
      val it = graft.operators.Similarity.kmIters
      val rounds = graft.operators.Similarity.bfsOracleRounds
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
e0 AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
bedges AS MATERIALIZED (
  SELECT vec_a AS a, vec_b AS b FROM e0
  UNION SELECT vec_b AS a, vec_a AS b FROM e0),
reach(node, label) AS (
  SELECT a, a FROM bedges
  UNION
  SELECT e.b, r.label FROM reach r JOIN bedges e ON r.node = e.a),
seeds AS MATERIALIZED (
  SELECT DISTINCT min(label) OVER (PARTITION BY node) AS seed
  FROM reach),
bd0 AS MATERIALIZED (
  SELECT seed, seed AS node, 0::BIGINT AS dist FROM seeds)""")
      for (i <- 1 to rounds) {
        sb.append(s""",
bd$i AS MATERIALIZED (
  SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT seed, node, dist FROM bd${i - 1}
    UNION ALL
    SELECT r.seed, e.b AS node, r.dist + 1 AS dist
    FROM bd${i - 1} r JOIN bedges e ON r.node = e.a)
  GROUP BY seed, node)""")
      }
      sb.append(s""",
converged AS MATERIALIZED (
  SELECT CASE WHEN (SELECT count(*) FROM bd$rounds) =
                   (SELECT count(*) FROM bd${rounds - 1})
    THEN 1 ELSE error('sim_bfs_radius oracle unroll of $rounds rounds ' ||
      'did not converge - raise Similarity.bfsOracleRounds') END AS ok)
SELECT seed, count(*)::BIGINT AS n_reached,
  max(dist) AS eccentricity,
  round(CAST(sum(dist) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS mean_dist
FROM bd$rounds
WHERE (SELECT ok FROM converged) = 1
GROUP BY seed
ORDER BY seed""")
      sb.toString
    }),
    // shared-nearest-neighbor pairs: adjacency self-join on the shared
    // neighbor id, SNN Jaccard over k-bounded out-degrees
    "sim_snn_graph" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
od AS (SELECT vec_id, count(*)::BIGINT AS deg FROM ged GROUP BY 1),
sh AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, count(*)::BIGINT AS shared
  FROM ged a JOIN ged b
    ON a.neighbor_id = b.neighbor_id AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT vec_a, vec_b, shared,
  round(shared::DOUBLE / (da.deg + db.deg - shared), 6) AS snn_jaccard
FROM sh JOIN od da ON sh.vec_a = da.vec_id
JOIN od db ON sh.vec_b = db.vec_id
ORDER BY vec_a, vec_b"""
    }),
    // PQ codebook utilization: per-subspace code histogram, entropy on
    // the 1e-12 grid, hottest-code share
    "sim_code_entropy" -> (simBase + pqCtes + {
      val it = graft.operators.Similarity.kmIters
      val k = graft.operators.Similarity.kmK
      val blocks = (0 until graft.operators.Similarity.pqM).map { s =>
        s"""
SELECT $s::BIGINT AS sub, max(nu)::BIGINT AS n_codes_used,
  round(CAST(sum(term) AS DOUBLE), 6) AS code_entropy,
  round(max(nu)::DOUBLE / $k, 6) AS utilization,
  round(max(nm)::DOUBLE / max(tot), 6) AS max_code_share
FROM (
  SELECT CAST(round(-(n::DOUBLE / tot) * ln(n::DOUBLE / tot), 12)
      AS DECIMAL(18,12)) AS term, nu, nm, tot
  FROM (
    SELECT cell, n, sum(n) OVER () AS tot, count(*) OVER () AS nu,
      max(n) OVER () AS nm
    FROM (SELECT cell, count(*)::BIGINT AS n FROM pa$s$it GROUP BY cell)))"""
      }.mkString("\nUNION ALL")
      blocks + "\nORDER BY sub"
    }),
    // HNSW layer census: geometric level draw from the salted-hash
    // uniform, cumulative hierarchy sizes over the bounded level grid
    "sim_hnsw_layers" -> {
      val ml = graft.operators.Similarity.hnswMl
      val cap = graft.operators.Similarity.hnswMaxLevel
      val salt = graft.operators.Similarity.hnswSalt
      s"""
WITH lv AS (
  SELECT least(CAST(floor(-ln(
    ((('0x' || substr(md5('$salt' || vec_id::VARCHAR), 1, 8))::BIGINT)::DOUBLE
      + 0.5) / 4294967296.0) * $ml) AS BIGINT), $cap) AS level
  FROM embeddings),
h AS (SELECT level, count(*)::BIGINT AS n_nodes FROM lv GROUP BY 1),
t AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM h)
SELECT level, n_nodes,
  CAST(sum(n_nodes) OVER (ORDER BY level DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS hierarchy_size,
  round(n_nodes::DOUBLE / n_total, 6) AS share
FROM h CROSS JOIN t ORDER BY level"""
    },
    // directed-kNN reciprocity: mutual-pair count over the edge count
    "sim_reciprocity" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
mp AS (
  SELECT count(*)::BIGINT AS n_pairs
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
t AS (SELECT count(DISTINCT vec_id)::BIGINT AS n_nodes,
  count(*)::BIGINT AS n_edges FROM ged)
SELECT n_nodes, n_edges,
  CAST(n_pairs * 2 AS BIGINT) AS n_reciprocal_edges,
  round((n_pairs * 2)::DOUBLE / n_edges, 6) AS reciprocity
FROM t CROSS JOIN mp"""
    }),
    // spectral radius: SpecIters unrolled power iterations over the
    // symmetrized mutual-kNN adjacency; every decimal crossing is
    // VARCHAR-mediated (the iterated-kernel convention)
    "sim_spectral_radius" -> (simBase + kmeansCtes + {
      val it = graft.operators.Similarity.kmIters
      val iters = graft.operators.Similarity.SpecIters
      val sb = new StringBuilder
      sb.append(s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
kr AS MATERIALIZED (
  SELECT vec_id, neighbor_id,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
  FROM kp),
ged AS MATERIALIZED (SELECT vec_id, neighbor_id FROM kr WHERE rank <= 3),
med AS MATERIALIZED (
  SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b
  FROM ged a JOIN ged b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id),
ed AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM med
  UNION ALL SELECT vec_b, vec_a FROM med),
nd AS (SELECT DISTINCT src AS node FROM ed),
tt AS (SELECT (SELECT count(*) FROM ed)::BIGINT AS n_edges,
  (SELECT count(*) FROM nd)::BIGINT AS n_nodes),
v0 AS (SELECT node, 1.0 / sqrt((SELECT n_nodes FROM tt)::DOUBLE) AS x
  FROM nd)""")
      for (i <- 1 to iters) {
        sb.append(s""",
w$i AS MATERIALIZED (
  SELECT ed.dst AS node,
    CAST(CAST(sum(CAST(CAST(v.x AS VARCHAR) AS DECIMAL(28,10)))
      AS VARCHAR) AS DOUBLE) AS wx
  FROM ed JOIN v${i - 1} v ON ed.src = v.node
  GROUP BY ed.dst),
nm$i AS (
  SELECT sqrt(CAST(CAST(sum(CAST(round(wx * wx, 12) AS DECIMAL(28,12)))
    AS VARCHAR) AS DOUBLE)) AS nrm
  FROM w$i),
v$i AS MATERIALIZED (
  SELECT node, wx / (CASE WHEN nrm <> 0 THEN nrm END) AS x
  FROM w$i CROSS JOIN nm$i)""")
      }
      sb.append(s"""
SELECT n_nodes, n_edges, round(nrm, 6) AS spectral_radius
FROM nm$iters CROSS JOIN tt""")
      sb.toString
    }),
  )

  /** Shared label-propagation CTE chain: simBase + the unrolled Lloyd
    * build + kNN edges (`e`) + vote rounds ending in `l<lpIters>` —
    * one definition for the label query and the community report. */
  private lazy val lpChainCtes: String = simBase + kmeansCtes + {
    val it = graft.operators.Similarity.kmIters
    val seeds = graft.operators.Similarity.lpSeeds
    val k = graft.operators.Similarity.lpK
    val rounds = (1 to graft.operators.Similarity.lpIters).map { r =>
      s""",
v$r AS (
  SELECT e.vec_id, l.lab, count(*) AS c
  FROM e JOIN l${r - 1} l ON e.neighbor_id = l.vec_id
  WHERE l.lab IS NOT NULL GROUP BY 1, 2),
a$r AS (
  SELECT vec_id, lab FROM v$r
  QUALIFY row_number() OVER (PARTITION BY vec_id
    ORDER BY c DESC, lab) = 1),
l$r AS MATERIALIZED (
  SELECT b.vec_id,
    CASE WHEN b.vec_id < $seeds THEN b.label::BIGINT ELSE a$r.lab END
      AS lab
  FROM base b LEFT JOIN a$r ON b.vec_id = a$r.vec_id)"""
    }.mkString
    s""",
kp AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    round(list_inner_product(a.ev, b.ev), 6) AS cosine
  FROM asg$it a
  JOIN asg$it b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
e AS MATERIALIZED (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
      row_number() OVER (PARTITION BY vec_id
        ORDER BY cosine DESC, neighbor_id) AS rank
    FROM kp)
  WHERE rank <= $k),
l0 AS MATERIALIZED (
  SELECT vec_id, CASE WHEN vec_id < $seeds THEN label::BIGINT END AS lab
  FROM base)$rounds"""
  }

  // ---------------- multimodal ----------------

  private val strideConcat: String =
    (0 until 8).map(i => s"substr(text, ${1 + i * 16}, 1)").mkString(" || ")

  /** Metadata-only features over the blob stand-in (payload = UTF-8 text
    * bytes, ASCII ⇒ octet_length = n_chars on both engines). */
  private val resizeConcat: String =
    (0 until 32).map(i =>
      s"substr(text, ($i * octet_length(encode(text))) // 32 + 1, 1)")
      .mkString(" || ")

  /** Twin of Multimodal.phash: 64-point nearest-neighbor byte sample,
    * integer-exact mean-threshold bits (64·bᵢ > Σb), assembled into the
    * four 16-bit bands p0..p3. ASCII payloads ⇒ ord(char) = byte. */
  private def phashBand(b: Int): String =
    s"CAST(list_sum(list_transform(range(16), j -> " +
      s"CASE WHEN 64 * sv[CAST(${16 * b} + j AS INT) + 1] > ssum " +
      s"THEN 1::BIGINT << CAST(j AS INT) ELSE 0::BIGINT END)) AS BIGINT) AS p$b"
  /** Banded candidate pairs as a UNION of eight band equi-joins over
    * a (materialized) fingerprint table: one arm per 8-bit band
    * (lo/hi byte of p0..p3). Identical to the OR-disjunction join --
    * a pair appears iff SOME band matches, and UNION dedups -- but
    * every arm is a hash join where the disjunctive predicate forces
    * DuckDB into a blockwise nested loop (quadratic in docs). */
  private def bandArmUnion(tbl: String): String =
    (0 until 4).flatMap(b => Seq(
      s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM $tbl a " +
        s"JOIN $tbl b ON a.doc_id < b.doc_id AND a.p$b % 256 = b.p$b % 256",
      s"SELECT a.doc_id, b.doc_id FROM $tbl a " +
        s"JOIN $tbl b ON a.doc_id < b.doc_id AND a.p$b // 256 = b.p$b // 256"))
      .mkString("\n  UNION\n  ")

  private val phashCtes: String = s"""
WITH s AS (
  SELECT doc_id,
    list_transform(range(64), i -> CAST(ord(substr(text,
      CAST(i * length(text) // 64 AS INT) + 1, 1)) AS BIGINT)) AS sv
  FROM documents),
t AS (SELECT doc_id, sv, CAST(list_sum(sv) AS BIGINT) AS ssum FROM s),
ph AS (
  SELECT doc_id, ${(0 until 4).map(phashBand).mkString(", ")}
  FROM t)"""

  private def dhashBand(b: Int): String =
    s"CAST(list_sum(list_transform(range(16), j -> " +
      s"CASE WHEN sv65[CAST(${16 * b} + j AS INT) + 2] > " +
      s"sv65[CAST(${16 * b} + j AS INT) + 1] " +
      s"THEN 1::BIGINT << CAST(j AS INT) ELSE 0::BIGINT END)) " +
      s"AS BIGINT) AS d$b"
  private val dhashCtes: String = s"""
s65 AS (
  SELECT doc_id,
    list_transform(range(65), i -> CAST(ord(substr(text,
      CAST(i * length(text) // 65 AS INT) + 1, 1)) AS BIGINT)) AS sv65
  FROM documents),
dh AS (
  SELECT doc_id, ${(0 until 4).map(dhashBand).mkString(", ")}
  FROM s65)"""

  val multimodal: Map[String, String] = Map(
    // dHash: adjacent-sample gradient bits over the 65-point thumbnail
    "mm_dhash" -> s"""
WITH $dhashCtes
SELECT doc_id, d0, d1, d2, d3 FROM dh ORDER BY doc_id""",
    // aHash candidates re-scored under dHash: two-fingerprint
    // agreement tiering before destructive dedup
    "mm_dhash_agreement" -> {
      val bandEq = (0 until 4).flatMap(b => Seq(
        s"a.p$b % 256 = b.p$b % 256", s"a.p$b // 256 = b.p$b // 256"))
        .mkString(" OR ")
      s"""
$phashCtes,
$dhashCtes,
cand0 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(bit_count(xor(a.p0, b.p0)) + bit_count(xor(a.p1, b.p1)) +
         bit_count(xor(a.p2, b.p2)) + bit_count(xor(a.p3, b.p3)) AS BIGINT)
      AS hamming
  FROM ph a JOIN ph b ON a.doc_id < b.doc_id AND ($bandEq)),
cand AS (SELECT DISTINCT doc_a, doc_b, hamming FROM cand0
  WHERE hamming <= 7)
SELECT c.doc_a, c.doc_b, c.hamming,
  CAST(bit_count(xor(da.d0, db.d0)) + bit_count(xor(da.d1, db.d1)) +
       bit_count(xor(da.d2, db.d2)) + bit_count(xor(da.d3, db.d3))
    AS BIGINT) AS dhamming,
  (bit_count(xor(da.d0, db.d0)) + bit_count(xor(da.d1, db.d1)) +
   bit_count(xor(da.d2, db.d2)) + bit_count(xor(da.d3, db.d3))) <= 7
    AS agree
FROM cand c JOIN dh da ON c.doc_a = da.doc_id
JOIN dh db ON c.doc_b = db.doc_id
ORDER BY c.doc_a, c.doc_b"""
    },
    // Twin of Multimodal.decodePartition (the deterministic fake codec):
    // mod-P rolling hash -> dims, byte histogram / n -> feature, exploded
    // to (id, bin, value). ASCII payloads => ord(char) == byte value.
    "mm_decode" -> s"""
WITH bytes AS (
  SELECT doc_id,
    list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))::BIGINT) AS bs,
    length(text)::BIGINT AS n
  FROM documents),
dims AS (
  SELECT doc_id,
    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality, n,
    list_reduce(list_prepend(17::BIGINT, bs),
      (acc, x) -> (acc * 31 + x) % ${graft.functions.Portable.P31}) AS h
  FROM bytes),
meta AS (
  SELECT doc_id, modality, n,
    (64 + h % 64)::BIGINT AS width,
    (64 + (h // 64) % 64)::BIGINT AS height,
    (CASE modality WHEN 'video' THEN n // 256 + 1
                   WHEN 'audio' THEN n // 1024 + 1 ELSE 1 END)::BIGINT AS n_frames
  FROM dims),
bc AS (
  SELECT doc_id, b // 16 AS bin, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(bs) AS b FROM bytes)
  GROUP BY doc_id, bin),
grid AS (SELECT doc_id, unnest(range(16)) AS bin FROM documents)
SELECT m.doc_id AS id, m.modality, m.width, m.height, m.n_frames,
  g.bin::BIGINT AS bin,
  coalesce(c, 0)::DOUBLE / greatest(m.n, 1) AS value
FROM grid g
JOIN meta m ON g.doc_id = m.doc_id
LEFT JOIN bc ON g.doc_id = bc.doc_id AND g.bin = bc.bin
ORDER BY id, bin""",
    // resolution histogram on the (modality, w/16, h/16) grid — exact
    // integer counts over the identical fake-decode metadata
    "mm_resolution_hist" -> s"""
WITH bytes AS (
  SELECT doc_id,
    list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))::BIGINT) AS bs,
    length(text)::BIGINT AS n
  FROM documents),
dims AS (
  SELECT doc_id,
    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality, n,
    list_reduce(list_prepend(17::BIGINT, bs),
      (acc, x) -> (acc * 31 + x) % ${graft.functions.Portable.P31}) AS h
  FROM bytes),
meta AS (
  SELECT doc_id, modality,
    (64 + h % 64)::BIGINT AS width,
    (64 + (h // 64) % 64)::BIGINT AS height,
    (CASE modality WHEN 'video' THEN n // 256 + 1
                   WHEN 'audio' THEN n // 1024 + 1 ELSE 1 END)::BIGINT AS n_frames
  FROM dims)
SELECT modality, width // 16 AS w_bin, height // 16 AS h_bin,
  count(*)::BIGINT AS n_blobs,
  CAST(sum(n_frames) AS BIGINT) AS n_frames,
  round(CAST(sum(n_frames) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
    AS avg_frames
FROM meta GROUP BY 1, 2, 3
ORDER BY modality, w_bin, h_bin""",
    // Twin of Multimodal.sampleFrames: evenly-spaced 8-byte keyframe
    // slices per video blob, up to 4 frames.
    "mm_frame_sample" -> s"""
WITH v AS (
  SELECT doc_id, text, octet_length(encode(text))::BIGINT AS n_bytes
  FROM documents WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'video'),
f AS (
  SELECT doc_id, n_bytes, n_bytes // 256 + 1 AS n_frames
  FROM v),
fr AS (
  SELECT v.doc_id, f.n_frames,
    unnest(range(least(f.n_frames, 4))) AS frame_idx,
    v.text, v.n_bytes
  FROM f JOIN v USING (doc_id))
SELECT doc_id, n_frames, frame_idx::BIGINT AS frame_idx,
  lower(hex(encode(substr(text, (frame_idx * n_bytes // n_frames)::INT + 1, 8)))) AS frame_hex
FROM fr ORDER BY doc_id, frame_idx""",
    "mm_resize" -> s"""
SELECT doc_id, lower(hex(encode($resizeConcat))) AS thumb_hex
FROM documents ORDER BY doc_id""",
    "mm_features" -> s"""
SELECT doc_id,
  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
  octet_length(encode(text))::BIGINT AS n_bytes,
  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
  lower(hex(encode($strideConcat))) AS stride_sample_hex
FROM documents ORDER BY doc_id""",
    "mm_phash" -> s"""
$phashCtes
SELECT doc_id, p0, p1, p2, p3 FROM ph ORDER BY doc_id""",
    "mm_phash_pairs" -> {
      // eight 8-bit band-equality alternatives (lo/hi byte of each pX)
      val bandEq = (0 until 4).flatMap(b => Seq(
        s"a.p$b % 256 = b.p$b % 256", s"a.p$b // 256 = b.p$b // 256"))
        .mkString(" OR ")
      s"""
$phashCtes,
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(bit_count(xor(a.p0, b.p0)) + bit_count(xor(a.p1, b.p1)) +
         bit_count(xor(a.p2, b.p2)) + bit_count(xor(a.p3, b.p3)) AS BIGINT)
      AS hamming
  FROM ph a JOIN ph b ON a.doc_id < b.doc_id AND ($bandEq))
SELECT DISTINCT doc_a, doc_b, hamming FROM cand
WHERE hamming <= 7 ORDER BY doc_a, doc_b"""
    },
    // Hamming histogram over the band-collision candidates: threshold
    // calibration for the phash maxHamming bound.
    // The candidate front is stated as a UNION of eight band
    // equi-joins rather than one OR-disjunction join: DuckDB executes
    // a disjunctive join predicate as a blockwise nested loop --
    // quadratic in docs, hours at sf10's 500k rows -- while the union
    // form hash-joins per band and UNION-dedups, the same banding the
    // engine's LSH path declares. Identical pair set by construction
    // (a pair survives iff SOME band matches); value-invariance
    // re-proven hash-green at sf0.01/sf0.1/sf1 before adoption.
    // ALSO fingerprint-multiplicity compressed (the engine's round-12
    // form): the histogram's wide <=32 radius makes the doc-grain pair
    // front quadratic in copy multiplicity, so both engines state it
    // over DISTINCT signatures -- cross pairs weighted m_a*m_b, plus
    // C(m,2) at Hamming 0 per repeated signature (identical signatures
    // always collide; distinct ones can never sit at Hamming 0, so the
    // two terms partition the pair set). HammingHistSpec proves the
    // compressed form row-identical to the doc-grain statement.
    "mm_hamming_hist" -> s"""
$phashCtes,
phm AS MATERIALIZED (
  SELECT min(doc_id) AS doc_id, p0, p1, p2, p3, count(*)::BIGINT AS m
  FROM ph GROUP BY p0, p1, p2, p3),
bnd AS MATERIALIZED (
  ${bandArmUnion("phm")}),
cand AS (
  SELECT bnd.doc_a, bnd.doc_b,
    CAST(bit_count(xor(pa.p0, pb.p0)) + bit_count(xor(pa.p1, pb.p1)) +
         bit_count(xor(pa.p2, pb.p2)) + bit_count(xor(pa.p3, pb.p3))
      AS BIGINT) AS hamming,
    pa.m * pb.m AS weight
  FROM bnd JOIN phm pa ON pa.doc_id = bnd.doc_a
  JOIN phm pb ON pb.doc_id = bnd.doc_b),
dp AS (
  SELECT hamming, CAST(sum(weight) AS BIGINT) AS n_pairs
  FROM cand WHERE hamming <= 32 GROUP BY 1
  UNION ALL
  SELECT 0::BIGINT AS hamming,
    CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_pairs
  FROM phm WHERE m > 1
  HAVING sum(m * (m - 1) // 2) > 0),
hh AS (SELECT hamming, CAST(sum(n_pairs) AS BIGINT) AS n_pairs
  FROM dp GROUP BY 1),
ht AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_total FROM hh)
SELECT hamming, n_pairs,
  CAST(sum(n_pairs) OVER cw AS BIGINT) AS cum_pairs,
  round(CAST(sum(n_pairs) OVER cw AS DOUBLE) / n_total, 6) AS cum_share,
  (hamming <= 7) AS in_recall_band
FROM hh CROSS JOIN ht
WINDOW cw AS (ORDER BY hamming ROWS BETWEEN UNBOUNDED PRECEDING
  AND CURRENT ROW)
ORDER BY hamming""",
    // media-dedup capstone: recursive-CTE CC over the phash pairs,
    // singletons grouped with themselves. Same union-of-band-equi-join
    // candidate front as mm_hamming_hist, for one more reason here:
    // DuckDB INLINES non-materialized CTEs, so inside WITH RECURSIVE
    // the un-pinned candidate join would be re-expanded into every
    // closure iteration -- the sf10 checker burned 40+ CPU-hours on
    // exactly that before this restatement. MATERIALIZED pins the
    // pair front and the edge list once; the recursion then only
    // scans. The reach/min-label closure itself is the proven
    // dedup_clusters shape (green at sf10).
    "mm_phash_groups" ->
      (phashCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
phm AS MATERIALIZED (SELECT doc_id, p0, p1, p2, p3 FROM ph),
bnd AS MATERIALIZED (
  ${bandArmUnion("phm")}),
cand AS MATERIALIZED (
  SELECT bnd.doc_a, bnd.doc_b
  FROM bnd JOIN phm pa ON pa.doc_id = bnd.doc_a
  JOIN phm pb ON pb.doc_id = bnd.doc_b
  WHERE bit_count(xor(pa.p0, pb.p0)) + bit_count(xor(pa.p1, pb.p1)) +
        bit_count(xor(pa.p2, pb.p2)) + bit_count(xor(pa.p3, pb.p3)) <= 7),
edges(a, b) AS MATERIALIZED (
  SELECT doc_a, doc_b FROM cand UNION SELECT doc_b, doc_a FROM cand),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cc AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(cc.cluster, d.doc_id)::BIGINT AS group_id
FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
ORDER BY d.doc_id"""),
    // constellation landmark census: 32-byte frame energies (integer),
    // strict-left/weak-right local maxima, next-peak pairing within
    // the gap cap, salted landmark hash, per-source discriminability
    "mm_audio_landmarks" -> {
      val n = graft.operators.Multimodal.AlFrameBytes
      val gap = graft.operators.Multimodal.AlMaxGap
      val salt = graft.operators.Multimodal.AlSalt
      s"""
WITH fr AS (
  SELECT source, doc_id, u.j AS j,
    CAST(list_sum(list_transform(range(1, $n + 1),
      p -> ord(substr(u.f, CAST(p AS INT), 1)))) AS BIGINT) AS energy
  FROM (SELECT source, doc_id,
          unnest(list_transform(range(0, length(text) // $n),
            j -> {'j': j, 'f': substr(text, CAST(j * $n + 1 AS INT), $n)}))
            AS u
        FROM documents WHERE length(text) >= $n)),
pk AS (
  SELECT source, doc_id, j, energy FROM (
    SELECT source, doc_id, j, energy,
      coalesce(lag(energy) OVER dw, -1) AS pe,
      coalesce(lead(energy) OVER dw, -1) AS ne
    FROM fr WINDOW dw AS (PARTITION BY doc_id ORDER BY j))
  WHERE energy > pe AND energy >= ne),
lm AS (
  SELECT source, doc_id,
    ('0x' || substr(md5('$salt' || (energy % 256)::VARCHAR || ':' ||
      (e2 % 256)::VARCHAR || ':' || (j2 - j)::VARCHAR), 1, 8))::BIGINT
      AS lm_key
  FROM (
    SELECT source, doc_id, j, energy,
      lead(j) OVER pw AS j2, lead(energy) OVER pw AS e2
    FROM pk WINDOW pw AS (PARTITION BY doc_id ORDER BY j))
  WHERE j2 IS NOT NULL AND j2 - j <= $gap),
fc AS (SELECT source, count(*)::BIGINT AS n_frames FROM fr GROUP BY 1),
pc AS (SELECT source, count(*)::BIGINT AS n_peaks FROM pk GROUP BY 1),
lc AS (SELECT source, count(*)::BIGINT AS n_landmarks,
  count(DISTINCT lm_key)::BIGINT AS n_distinct_keys FROM lm GROUP BY 1)
SELECT fc.source, n_frames,
  coalesce(n_peaks, 0)::BIGINT AS n_peaks,
  coalesce(n_landmarks, 0)::BIGINT AS n_landmarks,
  coalesce(n_distinct_keys, 0)::BIGINT AS n_distinct_keys,
  CASE WHEN n_landmarks > 0 THEN
    round(n_distinct_keys::DOUBLE / n_landmarks, 6) END
    AS key_discriminability
FROM fc LEFT JOIN pc USING (source) LEFT JOIN lc USING (source)
ORDER BY source"""
    },
  )

  def all: Map[String, String] = text ++ dedup ++ similarity ++ multimodal
}
