"""Corpus-cleaning operators: repetition filters, blocklist scrubbing,
test-set decontamination, and sequence packing.

LLM-pipeline extension surface (SURVEY.md §7.2 M4; the reference cleans
only GPS pings, gtfstransformerSilver.py:41-45 — no text tier exists there).

These are the quality/safety passes an LLM training-data pipeline runs
between raw scraping and tokenization:

- ``q_gopher_repetition``: Gopher-style repetition signals (distinct-token
  fraction, top-token fraction, top-bigram fraction) + a keep flag.  All
  ratios are exact integer-count divisions, so thresholds compare
  identically across engines.
- ``q_blocklist_scrub``: word-boundary regex scrub of a blocklist, with
  per-doc hit counts and an md5 signature of the scrubbed text (md5 is
  bit-identical Spark↔DuckDB, making a text-rewrite pipeline
  oracle-checkable end-to-end).
- ``q_decontaminate``: flag training docs sharing any 5-gram with a
  held-out benchmark split (doc_id % 97 == 0).  Scale shape: the
  benchmark shingle set is small and bounded → broadcast it; one scan
  over the 100 TB train side, no shuffle of the corpus.
- ``q_pack_sequences``: concat-then-chop context-window packing — docs in
  deterministic doc_id order, running token offset, bin = offset DIV
  budget.  Integer-exact.  At scale packing runs per-partition; this
  global-order form is the correctness oracle for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import read_parquet_table
from .text import TOKENS_SQL, tokens_col

# --- repetition signals ---------------------------------------------------


def _run_stats(sorted_arr: F.Column) -> F.Column:
    """Distinct count + longest equal-run over a *sorted* array in one
    linear ``F.aggregate`` pass — ``struct(uniq, maxrun)``.  The max run
    length of a sorted array is the max frequency of any element, so
    sort-then-scan replaces a (doc, gram) count shuffle with per-row
    JVM work inside the scan stage.
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("uniq"),
    )

    def merge(acc: F.Column, x: F.Column) -> F.Column:
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            F.when(same, acc["uniq"]).otherwise(acc["uniq"] + 1).alias("uniq"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        merge,
        lambda acc: F.struct(
            acc["uniq"].alias("uniq"), acc["maxrun"].alias("maxrun")
        ),
    )



@register(
    "q_gopher_repetition",
    f"""
  WITH __toks AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
  ),
  __base AS (
    SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS n_uniq
    FROM __toks
  ),
  __topt AS (
    SELECT doc_id, max(cnt) AS top_tok FROM (
      SELECT doc_id, tok, count(*) AS cnt
      FROM (SELECT doc_id, unnest(toks) AS tok FROM __toks)
      GROUP BY doc_id, tok)
    GROUP BY doc_id
  ),
  __topb AS (
    SELECT doc_id, max(cnt) AS top_bg FROM (
      SELECT doc_id, bg, count(*) AS cnt FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM __toks WHERE len(toks) >= 2)
      GROUP BY doc_id, bg)
    GROUP BY doc_id
  )
  SELECT b.doc_id,
         b.n AS n_tokens,
         round(CAST(b.n_uniq AS DOUBLE) / b.n, 6) AS uniq_frac,
         round(CAST(t.top_tok AS DOUBLE) / b.n, 6) AS top_token_frac,
         round(coalesce(CAST(p.top_bg AS DOUBLE) / nullif(b.n - 1, 0), 0.0),
               6) AS top_bigram_frac,
         (CAST(b.n_uniq AS DOUBLE) / b.n >= 0.2
          AND coalesce(CAST(p.top_bg AS DOUBLE) / nullif(b.n - 1, 0), 0.0)
                <= 0.2) AS keep
  FROM __base b
  JOIN __topt t USING (doc_id)
  LEFT JOIN __topb p USING (doc_id)
""",
    doc="Gopher-style repetition filter: distinct-token fraction, "
    "top-token fraction, top-bigram fraction, and the keep decision — "
    "ZERO shuffles: every signal is per-doc, so tokens/bigrams are "
    "sorted in-array and distinct-count + max-frequency fall out of a "
    "single linear F.aggregate run-length pass inside the scan stage. "
    "Nothing is exploded, nothing leaves the mapper; at 100 TB the "
    "corpus streams through once with no exchange. Ratios are exact "
    "integer divisions so thresholds are engine-stable.",
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    # Zero-shuffle form: per-doc signals need no cross-row state, so the
    # whole query is a map over the scan.  Token/bigram frequencies come
    # from sort + longest-run (_run_stats) instead of exploding every
    # gram into a (doc, kind, gram) shuffle — at 100 TB that explode
    # shuffled ~200 rows per doc; this shuffles nothing.
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n"),
        _run_stats(F.array_sort("toks")).alias("ts"),
        _run_stats(F.array_sort(bigrams)).alias("bs"),
    )
    n = F.col("n")
    uniq_frac = F.col("ts.uniq").cast("double") / n
    bg_frac = F.coalesce(
        F.col("bs.maxrun").cast("double") / F.nullif(n - 1, F.lit(0)),
        F.lit(0.0),
    )
    return stats.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(uniq_frac, 6).alias("uniq_frac"),
        F.round(F.col("ts.maxrun").cast("double") / n, 6).alias(
            "top_token_frac"
        ),
        F.round(bg_frac, 6).alias("top_bigram_frac"),
        ((uniq_frac >= 0.2) & (bg_frac <= 0.2)).alias("keep"),
    )


# --- blocklist scrubbing --------------------------------------------------

#: word-boundary alternation over the scrub list (RE2- and Java-compatible)
_BLOCK_PAT = r"\b(the|a|of|and|is|to|in)\b"


@register(
    "q_blocklist_scrub",
    f"""
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{_BLOCK_PAT}')) AS n_hits,
         md5(trim(regexp_replace(
               regexp_replace(lower(text), '{_BLOCK_PAT}', '', 'g'),
               '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS scrub_sig,
         length(trim(regexp_replace(
               regexp_replace(lower(text), '{_BLOCK_PAT}', '', 'g'),
               '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS n_chars_scrubbed
  FROM documents
""",
    doc="Blocklist scrubbing: word-boundary regexp_replace removes listed "
    "terms, whitespace is re-collapsed, and the rewritten text is "
    "signed with md5 so the full rewrite is oracle-checkable. Pure "
    "map-side pass — one scan, zero shuffles, codegen'd JVM regex.",
)
def q_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scrubbed = F.trim(
        F.regexp_replace(
            F.regexp_replace(low, _BLOCK_PAT, ""), r"[ \t\n\x0b\f\r]+", " "
        )
    )
    return docs.select(
        "doc_id",
        F.regexp_count(low, F.lit(_BLOCK_PAT)).cast("bigint").alias("n_hits"),
        F.md5(scrubbed).alias("scrub_sig"),
        F.length(scrubbed).cast("bigint").alias("n_chars_scrubbed"),
    )


# --- test-set decontamination ---------------------------------------------

#: 5-gram word shingles per doc (DuckDB 1-based list indexing)
_SHINGLE5_SQL = f"""
  __toks AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
  ),
  __sh5 AS (
    SELECT DISTINCT doc_id, sh FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                    || ' ' || toks[i + 3] || ' ' || toks[i + 4])) AS sh
      FROM __toks WHERE len(toks) >= 5)
  )
"""


def _shingles5(docs: DataFrame) -> DataFrame:
    toks = docs.select("doc_id", tokens_col().alias("toks")).filter(
        F.size("toks") >= 5
    )
    # array_distinct BEFORE the explode, not .distinct() after it: the
    # dedup is per-doc (shingles can't collide across doc_ids in the
    # output key), so doing it in-row keeps the corpus out of any
    # shuffle — a post-explode .distinct() would exchange every
    # (doc_id, shingle) of every training doc just to dedupe within
    # single documents
    return toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2),
                        F.element_at("toks", i + 3),
                        F.element_at("toks", i + 4),
                    ),
                )
            )
        ).alias("sh"),
    )


@register(
    "q_decontaminate",
    f"""
  WITH {_SHINGLE5_SQL},
  __held AS (
    SELECT DISTINCT sh FROM __sh5 WHERE doc_id % 97 = 0
  ),
  __hits AS (
    SELECT t.doc_id, count(*) AS n_shared
    FROM __sh5 t JOIN __held h ON t.sh = h.sh
    WHERE t.doc_id % 97 <> 0
    GROUP BY t.doc_id
  )
  SELECT d.doc_id,
         coalesce(h.n_shared, 0) AS n_shared,
         coalesce(h.n_shared, 0) > 0 AS contaminated
  FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
  LEFT JOIN __hits h ON d.doc_id = h.doc_id
""",
    doc="Benchmark decontamination: flag every training doc that shares a "
    "5-gram with the held-out split (doc_id % 97 == 0). The held-out "
    "shingle set is small and bounded, so it broadcasts; the 100 TB "
    "train side is a single scan + broadcast-hash semi-probe — the "
    "corpus itself never shuffles.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    sh = _shingles5(docs)
    held = (
        sh.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    )
    train_docs = docs.filter(F.col("doc_id") % 97 != 0).select("doc_id")
    hits = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(held), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("hits"), F.lit(0)).alias("n_shared"),
        (F.coalesce(F.col("hits"), F.lit(0)) > 0).alias("contaminated"),
    )


# --- sequence packing -----------------------------------------------------

PACK_BUDGET = 2048


@register(
    "q_pack_sequences",
    f"""
  WITH __toks AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len({TOKENS_SQL}) END AS n_tokens
    FROM documents
  ),
  __cum AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_tokens AS start_off
    FROM __toks
  )
  SELECT CAST(floor(start_off / {PACK_BUDGET}) AS BIGINT) AS bin,
         count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS tokens_in_bin,
         min(doc_id) AS first_doc,
         max(doc_id) AS last_doc
  FROM __cum
  GROUP BY 1
""",
    doc="Concat-then-chop sequence packing with a SCALABLE running sum: "
    "docs bucket by doc_id range, the cumsum windows run partitioned "
    "per bucket (parallel), and bucket base offsets come from a TWO-"
    "LEVEL (bucket-of-buckets) prefix sum — the only unpartitioned "
    "window touches n/10⁶ super-bucket rows, so no single-partition "
    "work grows linearly with the corpus. The oracle is the equivalent "
    "global-order form; results are identical because bucket order ∘ "
    "within-bucket order = global doc_id order.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    bucket_span = 1000  # docs per prefix-sum bucket
    toks = docs.select(
        "doc_id",
        F.floor(F.col("doc_id") / bucket_span).alias("bucket"),
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(tokens_col()))
        .cast("bigint")
        .alias("n_tokens"),
    )
    # pass 1: TWO-LEVEL exclusive prefix sum over per-bucket totals.
    # A flat Window.orderBy("bucket") would put |buckets| = n/span rows
    # through ONE partition — linear in the corpus, the single-partition
    # trap this query exists to avoid.  Instead buckets roll up into
    # super-buckets (span² docs each): the only unpartitioned window
    # runs over |super-buckets| = n/span² rows (n/10⁶ — ~10⁵ rows even
    # at 10¹¹ docs), and per-bucket offsets within a super-bucket use a
    # PARTITIONED window.  Extending to a third level is mechanical if
    # corpora ever outgrow this.
    sb_span = 1000  # buckets per super-bucket
    bt = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .withColumn("sb", F.floor(F.col("bucket") / sb_span))
    )
    w_sb = Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, -1)
    sb_bases = (
        bt.groupBy("sb")
        .agg(F.sum("bucket_tokens").alias("sb_tokens"))
        .select(
            "sb",
            F.coalesce(F.sum("sb_tokens").over(w_sb), F.lit(0)).alias(
                "sb_base"
            ),
        )
    )
    w_in_sb = (
        Window.partitionBy("sb")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        bt.join(F.broadcast(sb_bases), "sb")
        .withColumn(
            "base",
            F.col("sb_base")
            + F.coalesce(F.sum("bucket_tokens").over(w_in_sb), F.lit(0)),
        )
        .select("bucket", "base")
    )
    # pass 2: within-bucket running sum, shifted by the bucket base.
    # No broadcast hint on bases: it has n/span rows (NOT broadcastable
    # at 100 TB) — the plain join lets AQE broadcast it while small and
    # degrade to a shuffle join that REUSES the window's hash-by-bucket
    # partitioning at scale (the window below needs that exchange
    # anyway, so the join adds only the tiny bases-side shuffle).
    ww = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        toks.join(bases, "bucket")
        .withColumn(
            "start_off",
            F.col("base") + F.sum("n_tokens").over(ww) - F.col("n_tokens"),
        )
    )
    return (
        cum.withColumn(
            "bin", F.floor(F.col("start_off") / PACK_BUDGET).cast("bigint")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_in_bin"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --- per-language length-outlier filter ----------------------------------


@register(
    "q_length_outlier_filter",
    """
  WITH th AS (
    SELECT lang,
           round(quantile_cont(n_chars, 0.05), 6) AS lo,
           round(quantile_cont(n_chars, 0.95), 6) AS hi
    FROM documents
    GROUP BY lang
  )
  SELECT d.lang,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN d.n_chars >= t.lo AND d.n_chars <= t.hi
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         min(t.lo) AS lo,
         min(t.hi) AS hi
  FROM documents d JOIN th t ON d.lang = t.lang
  GROUP BY d.lang
""",
    doc="Per-language length-outlier filter: exact p5/p95 of n_chars per "
    "language (one aggregate over a low-cardinality key -> tiny result "
    "broadcast back), then each doc is kept iff inside its language's "
    "band — the per-stratum analogue of fixed length cutoffs, robust "
    "to languages with different character economies (zh vs en). At "
    "scale the exact percentile becomes approx_percentile; the oracle "
    "pins the exact path.",
)
def q_length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    th = docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("hi"),
    )
    kept = F.when(
        (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        docs.join(F.broadcast(th), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
        )
    )


# --- training-mixture rebalancing ----------------------------------------


@register(
    "q_source_mix",
    """
  WITH s AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY source
  )
  SELECT source, n_docs, n_chars,
         round(CAST(n_chars AS DOUBLE) / sum(n_chars) OVER (), 6)
           AS actual_share,
         round(1.0 / count(*) OVER (), 6) AS target_share,
         round((1.0 / count(*) OVER ())
               / (CAST(n_chars AS DOUBLE) / sum(n_chars) OVER ()), 6)
           AS weight
  FROM s
""",
    doc="Training-mixture rebalancing: per-source token (char) mass -> "
    "sampling weight that equalizes the mixture (target uniform share "
    "over sources / actual share). The global totals are window "
    "aggregates over the already-reduced per-source table — 20 rows — "
    "so the 'global' pass is free no matter the corpus size; the "
    "weights then drive a hash-sample of the full corpus.",
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    w = Window.partitionBy()
    actual = F.col("n_chars").cast("double") / F.sum("n_chars").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return s.select(
        "source",
        "n_docs",
        "n_chars",
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(target / actual, 6).alias("weight"),
    )


# --- PII scrubbing --------------------------------------------------------

# the synthetic corpus carries no PII, so the query injects a deterministic
# PII suffix (email + phone + IPv4 derived from doc_id) before scrubbing —
# proving detection AND redaction end-to-end, not just a no-op rewrite
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


@register(
    "q_pii_scrub",
    f"""
  WITH __aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 555-01'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
             AS aug
    FROM documents)
  SELECT doc_id,
         len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS n_emails,
         len(regexp_extract_all(
           regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}')) AS n_ips,
         len(regexp_extract_all(
           regexp_replace(
             regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IP}', '<IP>', 'g'),
           '{_PII_PHONE}')) AS n_phones,
         md5(regexp_replace(
           regexp_replace(
             regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IP}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g')) AS scrub_sig
  FROM __aug
""",
    doc="PII scrubbing: email / IPv4 / phone regexes redact to typed "
    "placeholders in a fixed cascade (emails first so their dotted "
    "domains can't be half-eaten by the IP pattern), with per-kind hit "
    "counts and an md5 signature of the fully-scrubbed text. The "
    "corpus is synthetic, so a deterministic PII suffix derived from "
    "doc_id is injected first — every row exercises all three "
    "detectors. Pure map-side regex pass: one scan, zero shuffles.",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    no_email = F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, _PII_IP, "<IP>")
    no_phone = F.regexp_replace(no_ip, _PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(no_email, F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
        F.regexp_count(no_ip, F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.md5(no_phone).alias("scrub_sig"),
    )


# --- mixture-rebalancing downsample (executes q_source_mix's plan) -----


@register(
    "q_mixture_sample",
    """
  WITH __s AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS tot_chars
    FROM documents GROUP BY source
  ),
  __w AS (
    SELECT source, n_docs, tot_chars,
           (1.0 / count(*) OVER ())
             / (CAST(tot_chars AS DOUBLE) / sum(tot_chars) OVER ()) AS w
    FROM __s
  ),
  __p AS (
    SELECT source, n_docs, tot_chars, w / max(w) OVER () AS p FROM __w
  ),
  __kept AS (
    SELECT d.source, p.p, p.n_docs, d.n_chars,
           (CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) / 4294967296.0) < p.p
             AS keep
    FROM documents d JOIN __p p ON d.source = p.source
  )
  SELECT source,
         n_docs,
         round(p, 6) AS sample_prob,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
           AS kept_chars
  FROM __kept
  GROUP BY source, n_docs, p
""",
    doc="Executes the q_source_mix rebalancing plan: per-source sampling "
    "probability = weight normalized so the most-upweighted source keeps "
    "everything (downsample-only — no source is oversampled past its "
    "data), then a DETERMINISTIC md5-uniform per-doc keep decision and "
    "the achieved per-source doc/char counts.  md5-derived uniforms make "
    "the sample reproducible across engines, reruns, and cluster sizes "
    "— the property that lets a 100 TB downsample be audited and "
    "incrementally extended.  Scale shape: the O(|sources|) probability "
    "table broadcasts back over the corpus scan; keep/aggregate is one "
    "map-side-combined pass, no corpus shuffle beyond the per-source "
    "agg.",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("tot_chars"),
    )
    everything = Window.partitionBy()
    share = F.col("tot_chars").cast("double") / F.sum("tot_chars").over(
        everything
    )
    w = (F.lit(1.0) / F.count(F.lit(1)).over(everything)) / share
    probs = per.select(
        "source",
        "n_docs",
        (w / F.max(w).over(everything)).alias("p"),
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
        / F.lit(4294967296.0)
    )
    kept = docs.join(F.broadcast(probs), "source").select(
        "source",
        "n_docs",
        "p",
        "n_chars",
        (u < F.col("p")).alias("keep"),
    )
    return kept.groupBy("source", "n_docs", "p").agg(
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(F.lit(0))).alias(
            "kept_chars"
        ),
    ).select(
        "source",
        "n_docs",
        F.round("p", 6).alias("sample_prob"),
        "n_kept",
        "kept_chars",
    )


# --- per-source quality-threshold calibration ------------------------------


@register(
    "q_quality_calibration",
    """
  WITH __th AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           quantile_cont(CAST(n_chars AS DOUBLE), 0.1) AS p10_chars
    FROM documents GROUP BY source
  )
  SELECT d.source,
         t.n_docs,
         round(t.p10_chars, 6) AS p10_chars,
         CAST(sum(CASE WHEN d.n_chars < t.p10_chars THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dropped,
         round(1.0 - sum(CASE WHEN d.n_chars < t.p10_chars
                              THEN 1.0 ELSE 0.0 END) / t.n_docs, 6)
           AS keep_rate
  FROM documents d JOIN __th t ON d.source = t.source
  GROUP BY d.source, t.n_docs, t.p10_chars
""",
    doc="Per-source quality-threshold calibration: the 10th-percentile "
    "length cutoff per source (linear-interpolated, Spark percentile = "
    "DuckDB quantile_cont semantics) and the drop/keep rates it implies. "
    "Per-domain calibrated thresholds are how corpus filters avoid "
    "one global cutoff erasing a legitimately-short-document domain. "
    "Scale shape: exact percentile per source is a sort within each "
    "source group — at 100 TB swap in approx_percentile (same plan "
    "shape, sketch merge instead of sort) and broadcast the O(|sources|) "
    "threshold table back over the corpus scan, which is exactly the "
    "second-pass join here.",
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    th = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.1)").alias("p10"),
    )
    flagged = docs.join(F.broadcast(th), "source").select(
        "source",
        "n_docs",
        "p10",
        (F.col("n_chars") < F.col("p10")).cast("long").alias("dropped"),
    )
    return flagged.groupBy("source", "n_docs", "p10").agg(
        F.sum("dropped").alias("n_dropped"),
        F.round(
            F.lit(1.0) - F.sum(F.col("dropped").cast("double")) / F.col("n_docs"),
            6,
        ).alias("keep_rate"),
    ).select(
        "source",
        "n_docs",
        F.round("p10", 6).alias("p10_chars"),
        "n_dropped",
        "keep_rate",
    )


# --- corpus-level boilerplate scrub ---------------------------------------

_BP_CHUNK = 10  # tokens per chunk (shared with q_chunk_dedup)
_BP_MIN_DOCS = 3  # a chunk seen in >= this many distinct docs is boilerplate


@register(
    "q_boilerplate_scrub",
    f"""
  WITH __t AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
    WHERE trim(text) <> ''
  ),
  __ch AS (
    SELECT t.doc_id, u.i AS chunk_idx,
           array_to_string(
             list_slice(t.toks, u.i * {_BP_CHUNK} + 1,
                        u.i * {_BP_CHUNK} + {_BP_CHUNK}), ' ') AS chunk
    FROM __t t, UNNEST(range(0,
        CAST(ceil(len(t.toks) / {_BP_CHUNK}.0) AS BIGINT))) AS u(i)
  ),
  __boiler AS (
    SELECT md5(chunk) AS fp FROM __ch
    GROUP BY md5(chunk)
    HAVING count(DISTINCT doc_id) >= {_BP_MIN_DOCS}
  ),
  __flag AS (
    SELECT c.doc_id, c.chunk_idx, c.chunk,
           (b.fp IS NOT NULL) AS is_boiler
    FROM __ch c LEFT JOIN __boiler b ON md5(c.chunk) = b.fp
  )
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
         md5(coalesce(string_agg(CASE WHEN NOT is_boiler THEN chunk END,
                                 ' ' ORDER BY chunk_idx), '')) AS clean_md5
  FROM __flag GROUP BY doc_id
""",
    doc=f"Corpus-level boilerplate scrub (C4-style): {_BP_CHUNK}-token "
    f"chunks occurring in >= {_BP_MIN_DOCS} distinct docs are removed "
    "corpus-wide and each doc's surviving text is reassembled in chunk "
    "order (md5 signature keeps the rewrite oracle-checkable).  Scale "
    "shape: the boilerplate set is the HIGH-frequency tail of the chunk "
    "distribution, so it is small by construction — aggregate chunk "
    "fingerprints (16-byte md5 through the shuffle, never chunk text), "
    "broadcast the flagged set back over the chunked corpus, and "
    "reassemble per doc with an in-row sorted-array join: one corpus "
    "shuffle on doc_id total.  The reassembly is the piece "
    "q_chunk_dedup (retention stats only) does not exercise.",
)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents").filter(
        F.trim("text") != ""
    )
    toks = tokens_col()
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(toks) / F.lit(float(_BP_CHUNK))).cast("int")
                    - 1,
                ),
                lambda i: F.array_join(
                    F.slice(toks, i * _BP_CHUNK + 1, _BP_CHUNK), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    # fingerprint ONCE in chunked: both the boiler aggregation and the
    # flag join reuse the projected column, instead of re-digesting
    # every chunk in the join predicate (md5 over the full chunked
    # corpus twice), and the join becomes a plain equi-join key
    chunked = chunked.withColumn("chunk_fp", F.md5("chunk"))
    boiler = (
        chunked.select(F.col("chunk_fp").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BP_MIN_DOCS)
        .select("fp")
    )
    flagged = chunked.join(
        F.broadcast(boiler),
        F.col("chunk_fp") == F.col("fp"),
        "left",
    ).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.col("fp").isNotNull().alias("is_boiler"),
    )
    kept_in_order = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("is_boiler"),
                        F.struct(F.col("chunk_idx"), F.col("chunk")),
                    )
                )
            ),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_removed"),
        F.md5(kept_in_order).alias("clean_md5"),
    )


# --- DSIR: data selection via importance resampling -----------------------

#: hashed n-gram feature space (md5 buckets — engine-portable, no vocab
#: state, same scheme as q_feature_hashing)
_DSIR_B = 1024
#: the target distribution: docs from this source model the domain the
#: selection steers toward (deterministic pick: lexicographic min)
_DSIR_TARGET = "src0"
#: how many top-weight documents the selection emits
_DSIR_N = 50


@register(
    "q_dsir_select",
    f"""
  WITH __tok AS (
    SELECT doc_id, source,
           CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
                % {_DSIR_B} AS INT) AS bucket
    FROM (SELECT doc_id, source, unnest({TOKENS_SQL}) AS tok
          FROM documents WHERE trim(text) <> '')
  ),
  __ct AS (
    SELECT bucket,
           count(*) AS cs,
           count(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS ct
    FROM __tok GROUP BY bucket
  ),
  __n AS (
    SELECT CAST(sum(cs) AS DOUBLE) AS ns, CAST(sum(ct) AS DOUBLE) AS nt
    FROM __ct
  ),
  __lw AS (
    SELECT bucket,
           round(ln(((ct + 1.0) / (nt + {_DSIR_B}))
                    / ((cs + 1.0) / (ns + {_DSIR_B}))), 6) AS lw
    FROM __ct CROSS JOIN __n
  )
  SELECT t.doc_id,
         count(*) AS n_tokens,
         round(CAST(SUM(CAST(l.lw AS DECIMAL(30,6))) AS DOUBLE), 6)
           AS log_weight
  FROM __tok t JOIN __lw l USING (bucket)
  GROUP BY t.doc_id
  ORDER BY log_weight DESC, t.doc_id
  LIMIT {_DSIR_N}
""",
    doc="DSIR (Xie et al. 2023, arXiv:2302.03169): data selection via "
    "importance resampling — hashed-unigram bag-of-words importance "
    "weights log(p_target/p_raw) per bucket (Laplace-smoothed, md5 "
    f"buckets B={_DSIR_B}), summed decimal-exactly per document, "
    f"top-{_DSIR_N} selected deterministically (weight desc, doc_id). "
    "Scale shape: the bucket LM tables are O(B) aggregates broadcast "
    "back into the token scan — featurization has NO vocabulary state, "
    "so selection over 100 TB is one token pass + one per-doc "
    "partial-aggregated shuffle + a TakeOrdered top-N; the target "
    "corpus enters only through the O(B) count table.",
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import spark_dsum_fast

    docs = read_parquet_table(spark, sf_dir, "documents").filter(
        F.trim("text") != ""
    )
    tok = docs.select(
        "doc_id", "source", F.explode(tokens_col()).alias("tok")
    ).withColumn(
        "bucket",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % _DSIR_B
        ).cast("int"),
    )
    ct = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cs"),
        F.count(F.when(F.col("source") == _DSIR_TARGET, 1)).alias("ct"),
    )
    n = ct.agg(
        F.sum("cs").cast("double").alias("ns"),
        F.sum("ct").cast("double").alias("nt"),
    )
    lw = ct.crossJoin(F.broadcast(n)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.col("nt") + _DSIR_B))
                / ((F.col("cs") + 1.0) / (F.col("ns") + _DSIR_B))
            ),
            6,
        ).alias("lw"),
    )
    return (
        tok.join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # lw terms are round(·,6) 6-decimal exacts — fast contract
            F.round(spark_dsum_fast(F.col("lw"), 6), 6).alias("log_weight"),
        )
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(_DSIR_N)
    )


#: output schema of the zlib compression-ratio kernel (shared by the
#: batch query and the streaming tier's q_stream_compression_ratio)
COMPRESSION_RATIO_SCHEMA = (
    "doc_id long, n_bytes long, zlib_ratio double, keep boolean"
)


def compression_ratio_kernel(batches):
    """Arrow ``mapInPandas`` kernel: per-document zlib compression
    ratio + [0.1, 0.9] keep band.  Module-level so the batch query and
    the Structured Streaming variant run the IDENTICAL kernel."""
    import zlib

    import pandas as pd

    for pdf in batches:
        # NULL text → empty bytes → n_bytes 0, null ratio, keep
        # False (a None in the Arrow batch must not fail the task)
        raw = [
            t.encode("utf-8") if t is not None else b""
            for t in pdf["text"]
        ]
        nb = [len(b) for b in raw]
        # level pinned: zlib output is deterministic per (input,
        # level, strategy) for a given zlib build
        ratio = [
            round(len(zlib.compress(b, 6)) / n, 6) if n else None
            for b, n in zip(raw, nb)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pd.Series(nb, dtype="int64"),
                "zlib_ratio": pd.Series(ratio, dtype="Float64"),
                "keep": pd.Series(
                    [r is not None and 0.1 <= r <= 0.9 for r in ratio],
                    dtype="boolean",
                ),
            }
        )


@register(
    "q_compression_ratio",
    None,  # deliberately rows-only (with its streaming twin
    # q_stream_compression_ratio, the repo's only two): zlib/DEFLATE is
    # not expressible in SQL, so no DuckDB twin exists.  Values are
    # pinned instead by closed-form pytest fixtures (constant text
    # compresses to ~0, hash-chain noise stays near 1 —
    # tests/test_llm_ops.py) and the kernel is deterministic (fixed
    # level, single zlib build in the container).
    doc="zlib compression-ratio quality signal (the Gopher/FineWeb "
    "staple): highly repetitive boilerplate compresses far below "
    "normal prose, random noise barely compresses at all, so a "
    "[0.1, 0.9] band on deflate(text)/len(text) is a cheap first-pass "
    "junk filter.  Scale shape: one Arrow mapInPandas kernel over the "
    "corpus scan (zlib runs at C speed per batch), zero shuffles, no "
    "driver state — the same kind-of-work profile as the media "
    "feature kernel.",
)
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import pin_parallelism

    docs = read_parquet_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    docs = pin_parallelism(docs, "doc_id")
    return docs.mapInPandas(
        compression_ratio_kernel, COMPRESSION_RATIO_SCHEMA
    )
