package graft

import graft.operators.Packing

/** DuckDB oracle SQL for the corpus-assembly operators. The oracle
  * states each result as the plain global-order SQL (one window over the
  * total order); the Spark side computes the same values with the
  * two-level bucketed scan — the comparison proves the distributed form
  * exact, not just plausible. Constants come from [[Packing]] so the two
  * sides can never drift. */
object OraclesPacking {

  private val toksCte =
    "toks AS (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)"

  private val c = Packing.chunkTokens
  private val st = Packing.overlapStride
  private val shuffleKeySql =
    s"('0x' || substr(md5('${Packing.shuffleSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT"
  private val splitKeySql =
    s"('0x' || substr(md5('${Packing.splitSalt}' || doc_id::VARCHAR), 1, 8))::BIGINT"

  private val bucketCase: String =
    Packing.bucketSizes.init
      .map(b => s"WHEN n <= $b THEN ${b}")
      .mkString("CASE ", " ", s" ELSE ${Packing.bucketSizes.last} END")

  /** Greedy BPE piece counting as a RECURSIVE CTE chain ending in per-
    * doc subword totals `bpc` (doc_id, n_subwords) — the DuckDB twin of
    * [[graft.functions.BpeCountImpl.count]], shared by the bpe-count
    * report and the bpe-budget pack assignment. Each recursion step
    * consumes the longest merge-table prefix at `pos` (the CASE chain
    * is generated longest-first from the SAME vocab constant) or one
    * character; a token's row leaves the working set when pos reaches
    * its length, so depth is bounded by the longest token. Stated as a
    * recursive CTE rather than a `list_reduce` fold deliberately:
    * DuckDB's vectorized list_reduce returned INCONSISTENT values for
    * identical inputs when the accumulator lambda referenced the outer
    * row ('customer' → 5/6/7 across rows), so the fold form is not a
    * trustworthy oracle. Queries embedding this chain must start with
    * `WITH RECURSIVE`. */
  private[graft] val bpeTotalsCtes: String = {
    val step = graft.functions.BpeCountImpl.vocab
      .map(v => s"WHEN substr(w, pos::INT + 1, ${v.length}) = '$v' THEN ${v.length}")
      .mkString("CASE ", " ", " ELSE 1 END")
    s""",
tok AS (SELECT doc_id, unnest(range(len(tk))) AS ti, unnest(tk) AS w FROM toks),
bst(doc_id, ti, w, pos, cnt) AS (
  SELECT doc_id, ti, w, 0::BIGINT, 0::BIGINT FROM tok
  UNION ALL
  SELECT doc_id, ti, w, pos + ($step), cnt + 1 FROM bst WHERE pos < len(w)),
bpc AS (
  SELECT doc_id, sum(cnt)::BIGINT AS n_subwords
  FROM bst WHERE pos >= len(w) GROUP BY doc_id)"""
  }

  /** [[bpeTotalsCtes]] restated over DISTINCT tokens: the same greedy
    * recursion runs once per distinct word (not per occurrence), the
    * per-token counts join back and sum per doc in exact BIGINT
    * arithmetic. Same `bpc` (doc_id, n_subwords) interface; used by the
    * budget-selection oracle where the statement also carries the
    * classifier CTEs — shrinking the recursive working set keeps the
    * composed statement robust across DuckDB versions (the driver's
    * DuckDB diverged on the round-4 per-occurrence composition). */
  private[graft] val bpeDistinctTotalsCtes: String = {
    val step = graft.functions.BpeCountImpl.vocab
      .map(v => s"WHEN substr(w, pos::INT + 1, ${v.length}) = '$v' THEN ${v.length}")
      .mkString("CASE ", " ", " ELSE 1 END")
    s""",
dtok AS (SELECT DISTINCT w FROM (SELECT unnest(tk) AS w FROM toks)),
dst(w, pos, cnt) AS (
  SELECT w, 0::BIGINT, 0::BIGINT FROM dtok
  UNION ALL
  SELECT w, pos + ($step), cnt + 1 FROM dst WHERE pos < len(w)),
dwc AS (SELECT w, max(cnt)::BIGINT AS n_sub FROM dst WHERE pos >= len(w) GROUP BY w),
bpc AS (
  SELECT tt.doc_id, sum(dwc.n_sub)::BIGINT AS n_subwords
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks) tt JOIN dwc USING (w)
  GROUP BY tt.doc_id)"""
  }

  val all: Map[String, String] = Map(
    // length-bucketing report: identical integer bucket ladder
    "pack_length_buckets" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, len(tk)::BIGINT AS n FROM toks),
b AS (SELECT doc_id, n, ($bucketCase)::BIGINT AS bucket FROM t)
SELECT bucket, count(*)::BIGINT AS n_docs,
  sum(n)::BIGINT AS total_tokens,
  sum(greatest(bucket - n, 0))::BIGINT AS total_padding,
  round(sum(greatest(bucket - n, 0))::DOUBLE / (bucket * count(*)), 6)
    AS pad_frac
FROM b GROUP BY bucket ORDER BY bucket""",
    "doc_chunks" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, tk, len(tk)::BIGINT AS n FROM toks),
e AS (SELECT doc_id, tk, n,
  unnest(range(0, (n + ${c - 1}) // $c)) AS chunk_id FROM t)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
  least($c, n - chunk_id * $c)::BIGINT AS n_chunk_tokens,
  array_to_string(list_slice(tk, chunk_id * $c + 1, (chunk_id + 1) * $c), ' ') AS chunk_text
FROM e ORDER BY doc_id, chunk_id""",
    // chunk-grain exact dedup: portable 64-bit chunk fingerprints,
    // keep-first-by-(doc,chunk), per-doc duplicate census
    "doc_chunk_dedup" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, tk, len(tk)::BIGINT AS n FROM toks),
e AS (SELECT doc_id, tk, n,
  unnest(range(0, (n + ${c - 1}) // $c)) AS chunk_id FROM t),
ch AS (
  SELECT doc_id, chunk_id::BIGINT AS chunk_id,
    array_to_string(list_slice(tk, chunk_id * $c + 1,
      (chunk_id + 1) * $c), ' ') AS chunk_text
  FROM e),
fp AS (
  SELECT doc_id, chunk_id,
    CAST(('0x' || substr(md5(chunk_text), 1, 8)) AS BIGINT) AS h_lo,
    CAST(('0x' || substr(md5(chunk_text), 9, 8)) AS BIGINT) AS h_hi
  FROM ch),
fst AS (
  SELECT h_lo, h_hi,
    min(doc_id * 1048576 + chunk_id) AS k
  FROM fp GROUP BY 1, 2),
fw AS (
  SELECT f.doc_id, f.chunk_id,
    fst.k // 1048576 AS first_doc, fst.k % 1048576 AS first_chunk
  FROM fp f JOIN fst ON f.h_lo = fst.h_lo AND f.h_hi = fst.h_hi)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
  CAST(sum(CASE WHEN doc_id <> first_doc OR chunk_id <> first_chunk
    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
  CAST(sum(CASE WHEN doc_id <> first_doc THEN 1 ELSE 0 END)
    AS BIGINT) AS n_cross_doc_dups,
  round(CAST(sum(CASE WHEN doc_id <> first_doc OR
      chunk_id <> first_chunk THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(count(*) AS DOUBLE), 6) AS dup_share
FROM fw GROUP BY doc_id ORDER BY doc_id""",
    "doc_chunks_overlap" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, tk, len(tk)::BIGINT AS n FROM toks WHERE len(tk) > 0),
e AS (SELECT doc_id, tk, n,
  unnest(range(0, (greatest(n - $c, 0) + ${st - 1}) // $st + 1)) AS chunk_id FROM t)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
  least($c, n - chunk_id * $st)::BIGINT AS n_chunk_tokens,
  array_to_string(list_slice(tk, chunk_id * $st + 1, chunk_id * $st + $c), ' ') AS chunk_text
FROM e ORDER BY doc_id, chunk_id""",
    "pack_assign" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens FROM toks),
cum AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM t)
SELECT doc_id, n_tokens, cum_tokens,
  ((cum_tokens - n_tokens) // ${Packing.packBudget})::BIGINT AS pack_id
FROM cum ORDER BY doc_id""",
    // per-pack fill/utilization over the same assignment chain
    "pack_efficiency" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens FROM toks),
cum AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM t),
pa AS (
  SELECT doc_id, n_tokens,
    ((cum_tokens - n_tokens) // ${Packing.packBudget})::BIGINT AS pack_id
  FROM cum)
SELECT pack_id, count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS fill_tokens,
  round(sum(n_tokens)::DOUBLE / ${Packing.packBudget}, 6) AS utilization
FROM pa GROUP BY pack_id ORDER BY pack_id""",
    // per-pack within-document attention mass over the same assignment
    // chain: exact integer sums, NULL-guarded closing ratio
    "pack_attention_mass" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens FROM toks),
cum AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM t),
pa AS (
  SELECT doc_id, n_tokens,
    ((cum_tokens - n_tokens) // ${Packing.packBudget})::BIGINT AS pack_id
  FROM cum),
g AS (
  SELECT pack_id, count(*)::BIGINT AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
    CAST(sum(n_tokens * n_tokens) AS BIGINT) AS s2
  FROM pa GROUP BY pack_id)
SELECT pack_id, n_docs, n_tokens,
  -- VARCHAR-DECIMAL round (the stock_vwap idiom): DuckDB's float-scaled
  -- round(x, 6) splits from Spark's BigDecimal HALF_UP at a 6dp
  -- boundary (first seen at sf10: within_share 0.032525 vs 0.032524);
  -- rounding the double's shortest decimal repr through DECIMAL(18,6)
  -- states the same HALF_UP grid Spark uses
  CASE WHEN n_tokens > 0 THEN
    CAST(CAST(CAST(CAST(s2 / CAST(n_tokens * n_tokens AS DOUBLE)
      AS VARCHAR) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) END
    AS within_share,
  CASE WHEN n_tokens > 0 THEN
    CAST(CAST(CAST(CAST(1.0 - s2 / CAST(n_tokens * n_tokens AS DOUBLE)
      AS VARCHAR) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) END
    AS cross_share
FROM g ORDER BY pack_id""",
    // the same global cumsum chain budgeted in greedy merge-table
    // subwords instead of whitespace tokens
    "pack_assign_bpe" -> s"""
WITH RECURSIVE $toksCte$bpeTotalsCtes,
t AS (SELECT doc_id, n_subwords AS n_tokens FROM bpc),
cum AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM t)
SELECT doc_id, n_tokens, cum_tokens,
  ((cum_tokens - n_tokens) // ${Packing.packBudget})::BIGINT AS pack_id
FROM cum ORDER BY doc_id""",
    // same cumsum chain, then one row per pack: docs concatenated in
    // doc_id order with the end-of-document separator
    "pack_sequences" -> s"""
WITH $toksCte,
t AS (SELECT doc_id, text, len(tk)::BIGINT AS n_tokens FROM toks),
cum AS (
  SELECT doc_id, text, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM t)
SELECT ((cum_tokens - n_tokens) // ${Packing.packBudget})::BIGINT AS pack_id,
  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
  string_agg(text, ' ${Packing.eodToken} ' ORDER BY doc_id) AS sequence_text
FROM cum GROUP BY pack_id ORDER BY pack_id""",
    "corpus_shuffle" -> s"""
SELECT doc_id, shuffle_key,
  row_number() OVER (ORDER BY shuffle_key, doc_id)::BIGINT AS ord
FROM (SELECT doc_id, $shuffleKeySql AS shuffle_key FROM documents)
ORDER BY ord""",
    // oracle states the plain per-split window; Spark computes it with
    // the (split, bucket) two-level scan — comparison proves it exact
    "corpus_shards" -> s"""
WITH sp AS (
  SELECT doc_id,
    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id, $splitKeySql % 100 AS b FROM documents)),
ranked AS (
  SELECT doc_id, split, shuffle_key,
    row_number() OVER (
      PARTITION BY split ORDER BY shuffle_key, doc_id)::BIGINT AS split_ord
  FROM (SELECT doc_id, split, $shuffleKeySql AS shuffle_key FROM sp))
SELECT doc_id, split, shuffle_key, split_ord,
  ((split_ord - 1) // ${Packing.shardDocs})::BIGINT AS shard_id
FROM ranked ORDER BY split, split_ord""",
    "corpus_shard_stats" -> s"""
WITH sp AS (
  SELECT doc_id,
    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id, $splitKeySql % 100 AS b FROM documents)),
ranked AS (
  SELECT doc_id, split,
    row_number() OVER (
      PARTITION BY split ORDER BY shuffle_key, doc_id)::BIGINT AS split_ord
  FROM (SELECT doc_id, split, $shuffleKeySql AS shuffle_key FROM sp)),
layout AS (
  SELECT doc_id, split,
    ((split_ord - 1) // ${Packing.shardDocs})::BIGINT AS shard_id
  FROM ranked),
h AS (
  SELECT doc_id,
    ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 8))::BIGINT AS h,
    n_chars
  FROM documents)
SELECT split, shard_id, count(*)::BIGINT AS n_docs,
  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
  sum(n_chars)::BIGINT AS total_chars, bit_xor(h)::BIGINT AS content_xor
FROM layout JOIN h USING (doc_id)
GROUP BY split, shard_id
ORDER BY split, shard_id""",
    "sample_split" -> s"""
SELECT doc_id, lang, source, split_bucket,
  CASE WHEN split_bucket < 90 THEN 'train'
       WHEN split_bucket < 95 THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT doc_id, lang, source, $splitKeySql % 100 AS split_bucket
      FROM documents)
ORDER BY doc_id""",
    // Twin of Packing.zorderLayout: the oracle states the global
    // row_number over (z, doc_id); Spark computes the same rank with
    // the bounded z-cell two-level scan.
    "corpus_zorder" -> {
      val bits = Packing.zorderBits
      val dims = 1L << bits
      val zTerms = (0 until bits).map(i =>
        s"((xb >> $i) & 1) * ${1L << (2 * i)} + " +
          s"((yb >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
      s"""
WITH b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
d AS (
  SELECT doc_id,
    CASE WHEN hi = lo THEN 0::BIGINT
         ELSE least(((n_chars - lo) * $dims) // (hi - lo + 1),
                    ${dims - 1}::BIGINT) END AS xb,
    CAST(substr(source, 4) AS BIGINT) % $dims AS yb
  FROM documents, b),
z AS (SELECT doc_id, xb, yb, CAST($zTerms AS BIGINT) AS z FROM d)
SELECT doc_id, xb, yb, z,
  CAST(row_number() OVER (ORDER BY z, doc_id) - 1 AS BIGINT) AS zrank
FROM z ORDER BY zrank"""
    },
    // T5 span-corruption budget: exact integer arithmetic per doc,
    // guarded ratio columns
    "pack_span_corruption" -> {
      val nn = Packing.CorruptNoiseNumer
      val nd = Packing.CorruptNoiseDenom
      val ms = Packing.CorruptMeanSpan
      s"""
WITH $toksCte,
pd AS (
  SELECT source, doc_id, len(tk)::BIGINT AS n_tokens,
    (len(tk)::BIGINT * $nn) // $nd AS n_corrupted
  FROM toks),
pe AS (
  SELECT source, doc_id, n_tokens, n_corrupted,
    CASE WHEN n_corrupted > 0
      THEN greatest(n_corrupted // $ms, 1) ELSE 0 END AS n_spans
  FROM pd),
pf AS (
  SELECT source, doc_id, n_tokens, n_corrupted, n_spans,
    n_tokens - n_corrupted + n_spans AS input_len,
    n_corrupted + n_spans + 1 AS target_len
  FROM pe),
a AS (
  SELECT source, count(*)::BIGINT AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
    CAST(sum(n_corrupted) AS BIGINT) AS corrupted_tokens,
    CAST(sum(n_spans) AS BIGINT) AS n_spans,
    CAST(sum(input_len) AS BIGINT) AS encoder_tokens,
    CAST(sum(target_len) AS BIGINT) AS decoder_tokens
  FROM pf GROUP BY source)
SELECT source, n_docs, raw_tokens, corrupted_tokens, n_spans,
  encoder_tokens, decoder_tokens,
  round(corrupted_tokens::DOUBLE /
    (CASE WHEN raw_tokens > 0 THEN raw_tokens END), 6)
    AS realized_noise_density,
  round((encoder_tokens + decoder_tokens)::DOUBLE /
    (CASE WHEN raw_tokens > 0 THEN raw_tokens END), 6)
    AS token_overhead
FROM a ORDER BY source"""
    },
  )
}
