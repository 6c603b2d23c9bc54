"""Corpus curation operators (SURVEY.md §2.10, X6): the split / pack /
mix / decontaminate stage of a training-data pipeline.

These sit between dedup (X1/X2) and the sink: once a corpus is deduped
and quality-scored, it still has to be (a) split reproducibly into
train/val/test, (b) packed into token-budget sequences, (c) mixed across
sources at target rates, and (d) scrubbed of benchmark contamination.
All four are pure DataFrame dataflow — no Python in the hot path — and
all four have exact DuckDB oracles.

Determinism note: the split/mix bucket uses a PORTABLE multiplicative
hash (Knuth 2654435761 mod 2^32) rather than ``xxhash64`` deliberately —
a train/test split must reproduce bit-for-bit across engines (Spark,
DuckDB, a Rust scorer reading the same lake), and ``xxhash64(seed=42)``
is Spark-private. The hash only has to be uniform-ish over doc ids, not
adversarially strong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register
from ..scratch import persist_scoped

# Shared: portable deterministic bucket in [0, 100) --------------------------


def split_hash(id_col: str | Column) -> Column:
    """Full-resolution (32-bit) portable multiplicative hash of an
    integer id, reproducible in any engine with 64-bit integer
    arithmetic. THE single definition — split_bucket, the mixture
    sampler, and x6g's rank key all derive from it (the matching SQL is
    ``_HASH_SQL``), so the formula can never drift between sites.

    The id is reduced mod 2^31 BEFORE the multiply: the raw product
    ``id * 2654435761`` exceeds int64 for ids >= ~3.47e9, where Spark's
    non-ANSI arithmetic silently wraps while DuckDB raises a BIGINT
    overflow — the two engines would disagree exactly when the corpus
    gets big. (2^31 - 1) * 2654435761 < 2^63 keeps every engine in
    exact-integer territory; the odd constant is still injective on
    the reduced domain, and values for ids < 2^31 are unchanged."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    reduced = col % F.lit(2147483648)
    return (reduced * F.lit(2654435761)) % F.lit(4294967296)


def _hash_sql(col: str = "doc_id") -> str:
    """The split-hash formula as SQL over an arbitrary id expression —
    turned into a builder in r17 (the byte-identity law: _HASH_SQL is
    this builder at its default and is pinned unchanged by pytest) so
    x6q2 can hash the duplicate-family REPRESENTATIVE instead of the
    document id without restating the formula."""
    return f"(({col} % 2147483648) * 2654435761) % 4294967296"


_HASH_SQL = _hash_sql()


def split_bucket(id_col: str | Column) -> Column:
    """Deterministic pseudo-uniform bucket 0-99 (``split_hash`` % 100)."""
    return split_hash(id_col) % F.lit(100)


def _bucket_sql(col: str = "doc_id") -> str:
    return f"{_hash_sql(col)} % 100"


_BUCKET_SQL = _bucket_sql()


# X6a — reproducible train/val/test split ------------------------------------


def _split_case_sql(bucket: str) -> str:
    """The 80/10/10 bucket->split CASE over an arbitrary bucket
    expression — builder split of the _X6_ORACLE law (r17, for x6q2's
    family-keyed split; byte-identity pytest-pinned)."""
    return (
        f"CASE WHEN {bucket} < 80 THEN 'train'\n"
        f"            WHEN {bucket} < 90 THEN 'val'\n"
        f"            ELSE 'test' END"
    )


def split_label(bucket: Column) -> Column:
    """The Spark twin of _split_case_sql over a bucket column — ONE
    site for the 80/10/10 thresholds, shared by x6 and x6q2."""
    return (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )


_X6_ORACLE = f"""
SELECT doc_id,
       CAST({_BUCKET_SQL} AS BIGINT) AS bucket,
       {_split_case_sql(_BUCKET_SQL)}          AS split
FROM documents
"""


@register("x6_deterministic_split", oracle=_X6_ORACLE, tags=("X6",))
def x6_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hashing the document id —
    stateless, join-free, and stable under corpus growth: a document's
    split never changes when other documents arrive, unlike
    ``randomSplit`` (sample-based, partition-order sensitive) or
    row_number modulo (reshuffles every run). Map-only: zero shuffles,
    survives any scale by construction."""
    docs = Catalog(spark, sf_dir).documents
    b = split_bucket("doc_id")
    return docs.select(
        "doc_id",
        b.cast("long").alias("bucket"),
        split_label(b).alias("split"),
    )


# X6b — sequence packing under a token budget --------------------------------

_X6B_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / 2048.0) AS BIGINT) AS chunk_id
FROM t
"""


@register("x6b_sequence_packing", oracle=_X6B_ORACLE, tags=("X6",))
def x6b_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2048-token training sequences: a running
    token count per source (window cumsum in doc_id order) assigns each
    document to the chunk where it starts. One shuffle on source; the
    frame is the default running frame so Spark computes it in a single
    sort-based pass. At 100 TB the partition key becomes
    (source, split_bucket) so no single source serializes into one task
    — same expression, finer key."""
    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    t = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0)
        .cast("long")
        .alias("chunk_id"),
    )


# X6c — mixture sampling at per-stratum rates --------------------------------

_X6C_RATES = {"en": 100, "de": 50, "es": 50, "fr": 25, "zh": 10}

_X6C_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {_BUCKET_SQL} < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                                WHEN 'es' THEN 50 WHEN 'fr' THEN 25
                                WHEN 'zh' THEN 10 ELSE 0 END
"""


@register("x6c_mixture_sample", oracle=_X6C_ORACLE, tags=("X6",))
def x6c_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: downsample each stratum (language) to its target
    rate with the same portable hash as the split — deterministic,
    map-only, and consistent with X6a (a doc sampled out stays out
    across reruns). Rates > 1.0 (upsampling) would explode a repeat
    count instead; same expression family. Zero shuffles."""
    docs = Catalog(spark, sf_dir).documents
    rate = F.lit(0)
    for lang, pct in _X6C_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return docs.filter(split_bucket("doc_id") < rate).select("doc_id", "lang")


# X6d — benchmark decontamination (8-gram overlap) ---------------------------

_X6D_ORACLE = """
WITH grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(string_split(text, ' ')) - 7),
             i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')
         ))) AS gram
  FROM documents
),
bench AS (SELECT DISTINCT gram, doc_id AS bench_id FROM grams WHERE doc_id % 50 = 0),
train AS (SELECT * FROM grams WHERE doc_id % 50 <> 0)
SELECT t.doc_id                        AS train_doc_id,
       count(DISTINCT t.gram)          AS n_shared_grams,
       count(DISTINCT b.bench_id)      AS n_benchmark_docs
FROM train t JOIN bench b ON t.gram = b.gram
GROUP BY t.doc_id
"""


def gram_hash_index(docs: DataFrame, normalize: bool = False) -> DataFrame:
    """(doc_id, gram_h): each document's DISTINCT 8-grams as xxhash64
    longs — the shared gram law of batch (x6d/x6d2) and streaming (t12)
    decontamination. Hashing happens INSIDE the per-doc transform:
    array_distinct, explode, and every downstream join/agg operate on
    8-byte longs, never gram strings. token_shingles guards sub-8-token
    documents (empty gram array, not a sequence(1,0) slice error)."""
    from .dedup import token_shingles

    text: Column = F.col("text")
    if normalize:
        text = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    toks = F.split(text, " ")
    grams_col = F.array_distinct(
        F.transform(token_shingles(toks, 8), lambda s: F.xxhash64(s))
    )
    return docs.select("doc_id", F.explode(grams_col).alias("gram_h"))


def contamination_report(docs: DataFrame, normalize: bool = False) -> DataFrame:
    """Shared decontamination dataflow over a (doc_id, text) frame with a
    doc_id % 50 == 0 benchmark stand-in: distinct 8-grams exploded,
    hashed, equi-joined with the (broadcast) benchmark gram index. With
    ``normalize=True`` the gram alphabet is case-folded and
    punctuation/whitespace-collapsed FIRST, so trivial cosmetic edits
    (case flips, inserted punctuation, doubled spaces) cannot smuggle a
    contaminated document past the filter — the standard practice for
    benchmark decontamination in public training-data pipelines."""
    grams = gram_hash_index(docs, normalize=normalize)
    bench = (
        grams.filter(F.col("doc_id") % 50 == 0)
        .select("gram_h", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(F.broadcast(bench), "gram_h")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(
            F.countDistinct("gram_h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


@register("x6d_decontamination", oracle=_X6D_ORACLE, tags=("X6", "X2"))
def x6d_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    8-gram with the held-out benchmark set (stand-in: doc_id % 50 == 0).
    Inverted-index shape — explode distinct 8-grams, equi-join on the
    gram — so train docs sharing nothing with the benchmark never meet
    it. The benchmark side is tiny by definition (eval sets are KBs-MBs
    against a 100 TB corpus), so the join broadcasts and the corpus
    NEVER shuffles. The join key is ``xxhash64(gram)``, not the gram
    string: the broadcast table and per-row probe payload shrink ~6x for
    a ~1e-10 false-flag rate — acceptable for a filter that errs toward
    dropping. The DuckDB oracle joins on the raw strings; agreement of
    the two forms at the gate's scale is itself evidence the hash
    substitution is sound."""
    return contamination_report(Catalog(spark, sf_dir).documents)


# X6d2 — decontamination over NORMALIZED grams -------------------------------
#
# Raw-cased exact grams (x6d) let contaminated documents escape via
# trivial edits: "The Answer Is 42." vs "the answer is 42" share zero raw
# 8-grams. Public decontamination practice canonicalizes first —
# lowercase, strip punctuation, collapse whitespace — then matches
# n-grams over the normalized token stream. The oracle applies the same
# canonicalization in DuckDB (regexp_replace needs the 'g' flag there;
# Spark's replaces all matches by default).

_X6D2_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(t) - 7),
             i -> array_to_string(t[i:i+7], ' ')
         ))) AS gram
  FROM norm
),
bench AS (SELECT DISTINCT gram, doc_id AS bench_id FROM grams WHERE doc_id % 50 = 0),
train AS (SELECT * FROM grams WHERE doc_id % 50 <> 0)
SELECT t.doc_id                        AS train_doc_id,
       count(DISTINCT t.gram)          AS n_shared_grams,
       count(DISTINCT b.bench_id)      AS n_benchmark_docs
FROM train t JOIN bench b ON t.gram = b.gram
GROUP BY t.doc_id
"""


@register("x6d2_decontamination_normalized", oracle=_X6D2_ORACLE, tags=("X6", "X2"))
def x6d2_decontamination_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over CANONICALIZED 8-grams: lowercase,
    collapse punctuation/whitespace runs to single spaces, then match —
    so a case-flipped or re-punctuated copy of a benchmark document is
    still flagged (pytest plants exactly that mangling in
    tests/test_curation.py). Same inverted-index + broadcast-benchmark
    shape as x6d: normalization is a map-side expression, the corpus
    still never shuffles."""
    return contamination_report(
        Catalog(spark, sf_dir).documents, normalize=True
    )


# X6e — domain mixture reweighting --------------------------------------------
#
# The planning step BEFORE x6c's mixture sampling: given a declared
# per-source priority, compute each source's actual corpus share, its
# target share (priority / total priority over the sources actually
# present), and the sampling weight (target / actual) a downstream
# sampler or repeat-epoch scheduler applies. Weight > 1 means the source
# is under-represented (upsample / extra epochs); < 1 means downsample.

_X6E_PRIORITY_SQL = "CASE source WHEN 'src0' THEN 4 WHEN 'src1' THEN 2 ELSE 1 END"

_X6E_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         count(*)                               AS n_docs,
         max({_X6E_PRIORITY_SQL})               AS priority
  FROM documents
  GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT)                                        AS n_docs,
       round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)        AS actual_frac,
       round(priority / CAST(sum(priority) OVER () AS DOUBLE), 6)    AS target_frac,
       round((priority / CAST(sum(priority) OVER () AS DOUBLE))
             / (n_docs / CAST(sum(n_docs) OVER () AS DOUBLE)), 4)    AS weight
FROM per_src
ORDER BY source
"""


@register("x6e_mixture_reweight", oracle=_X6E_ORACLE, tags=("X6",))
def x6e_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights to hit a declared target mixture.

    One hash-aggregate over the corpus (map-side combine; the shuffle
    carries one row per source) collapses 100 TB to a sources-sized
    table; the share/weight math then runs as unpartitioned windows over
    that TINY aggregate — a single-task stage over ~dozens of rows by
    construction, which is exactly where a global window is safe. The
    priority is a declared CASE expression, so the whole query stays
    relational and the oracle is the same algebra."""
    docs = Catalog(spark, sf_dir).documents
    priority = (
        F.when(F.col("source") == "src0", 4)
        .when(F.col("source") == "src1", 2)
        .otherwise(1)
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(priority).alias("priority"),
    )
    w_all = W.partitionBy()
    actual = F.col("n_docs") / F.sum("n_docs").over(w_all).cast("double")
    target = F.col("priority") / F.sum("priority").over(w_all).cast("double")
    return per_src.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(actual, 6).alias("actual_frac"),
        F.round(target, 6).alias("target_frac"),
        F.round(target / actual, 4).alias("weight"),
    ).orderBy("source")


# X6f — token-length histogram (power-of-two bins) ----------------------------
#
# The corpus shape report a packing/budgeting stage starts from: how
# many documents and tokens live at each length scale. Bins are
# power-of-two token-length ranges; the bin id is computed with exact
# integer arithmetic (length of the binary representation of
# n_tokens + 1) rather than floor(log2(...)), so no float-boundary
# disagreement between engines can move a document across bins.

_X6F_ORACLE = """
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens,
         length(bin(CAST(n_tokens + 1 AS BIGINT))) - 1 AS bin_id
  FROM t
)
SELECT CAST(bin_id AS BIGINT)                          AS bin_id,
       CAST(power(2, bin_id) AS BIGINT) - 1            AS lo_tokens,
       CAST(power(2, bin_id + 1) AS BIGINT) - 2        AS hi_tokens,
       count(*)                                        AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)                   AS total_tokens,
       round(sum(n_tokens) / CAST(sum(sum(n_tokens)) OVER () AS DOUBLE), 6)
                                                       AS token_share
FROM b
GROUP BY bin_id
ORDER BY bin_id
"""


@register("x6f_length_histogram", oracle=_X6F_ORACLE, tags=("X6",))
def x6f_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document/token histogram over power-of-two token-length bins.

    Map-only binning (split/size/bin are all codegen'd; no Python), one
    hash-aggregate whose shuffle carries one row per bin (~60 bins max
    for any corpus — 2^60 tokens is beyond 100 TB), then the share
    window runs over that bins-sized table in a single task. The bin
    id via binary-string length is exact integer math in both engines;
    floor(log2(x)) would ride on libm rounding at bin edges."""
    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("long")
    b = docs.select(
        n_tokens.alias("n_tokens"),
        (F.length(F.bin(n_tokens + F.lit(1))) - F.lit(1)).alias("bin_id"),
    )
    agg = b.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    share = F.col("total_tokens") / F.sum("total_tokens").over(
        W.partitionBy()
    ).cast("double")
    return agg.select(
        F.col("bin_id").cast("long").alias("bin_id"),
        (F.pow(F.lit(2.0), F.col("bin_id")).cast("long") - F.lit(1)).alias("lo_tokens"),
        (F.pow(F.lit(2.0), F.col("bin_id") + F.lit(1)).cast("long") - F.lit(2)).alias("hi_tokens"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round(share, 6).alias("token_share"),
    ).orderBy("bin_id")


# X6g — deterministic per-source uniform sample -------------------------------
#
# The balanced-audit sample: k documents per source, chosen by ranking
# on the portable multiplicative hash so the pick is (a) uniform-ish,
# (b) bit-for-bit reproducible in any engine, and (c) stable per
# document — unlike rand()-based sampling, a given doc's membership
# only changes if a doc with a smaller hash arrives in its source.
# Multiplication by an odd constant is injective on the 31-bit-reduced
# domain (see split_bucket's overflow note), so sort-key collisions need
# ids 2^31 apart; doc_id remains a pinned tiebreak anyway.

_X6G_HASH_SQL = _HASH_SQL

_X6G_ORACLE = f"""
SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_X6G_HASH_SQL}, doc_id) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 5
ORDER BY source, sample_rank
"""


@register("x6g_per_source_sample", oracle=_X6G_ORACLE, tags=("X6",))
def x6g_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 documents per source by hash-order rank. One shuffle on the
    source key; the rank is a window over hash order. At 100 TB the
    window's per-source sort is the cost center, so the production form
    prepends a hash-range pre-filter (keep hash < threshold chosen so
    ~10k survivors per source remain — a map-only 1000x shrink) before
    this exact dataflow; the pre-filter is an upper-bound guess
    validated by the per-source survivor count, falling back to the
    unfiltered window for sources that under-shoot k."""
    docs = Catalog(spark, sf_dir).documents
    h = split_hash("doc_id")
    w = W.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 5)
        .select("doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank"))
        .orderBy("source", "sample_rank")
    )


# X6h — packing efficiency report ---------------------------------------------
#
# The audit over x6b's output: how well do the packed chunks use the
# 2048-token budget? Mean fill, under-full tail, and overflow chunks
# (a document that STARTS inside the budget may run past it — x6b
# assigns by start offset) are the numbers that decide whether the
# packer needs document splitting or a smarter bin-packing pass.

_X6H_ORACLE = f"""
WITH packed AS ({_X6B_ORACLE}),
chunks AS (
  SELECT source, chunk_id, sum(n_tokens) AS fill, count(*) AS n_docs
  FROM packed GROUP BY source, chunk_id
)
SELECT source,
       count(*)                                        AS n_chunks,
       CAST(sum(fill) AS BIGINT)                       AS total_tokens,
       round(avg(CAST(fill AS DOUBLE)) / 2048.0, 4)    AS mean_fill_frac,
       CAST(sum(CASE WHEN fill > 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
       round(avg(CAST(n_docs AS DOUBLE)), 4)           AS avg_docs_per_chunk
FROM chunks
GROUP BY source
ORDER BY source
"""


@register("x6h_packing_efficiency", oracle=_X6H_ORACLE, tags=("X6",))
def x6h_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing-efficiency audit composed directly over the
    registered x6b packer (any change to the packer propagates here, and
    the oracle composes x6b's SQL the same way). Two map-combined
    aggregates collapse chunks then sources — output is sources-sized,
    and the only wide shuffle is x6b's own window partition."""
    packed = x6b_sequence_packing(spark, sf_dir)
    chunks = packed.groupBy("source", "chunk_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("fill").cast("long").alias("total_tokens"),
            F.round(F.avg(F.col("fill").cast("double")) / 2048.0, 4).alias(
                "mean_fill_frac"
            ),
            F.sum(F.when(F.col("fill") > 2048, 1).otherwise(0))
            .cast("long")
            .alias("n_overflow"),
            F.round(F.avg(F.col("n_docs").cast("double")), 4).alias(
                "avg_docs_per_chunk"
            ),
        )
        .orderBy("source")
    )


# X6i — end-to-end corpus funnel ----------------------------------------------
#
# The report a curation run actually ships: starting from every train
# candidate (the non-benchmark universe, x6d's doc_id % 50 convention),
# how many documents survive exact dedup (x1), then the quality gate
# (x4c), then normalized decontamination (x6d2) — and how the clean
# survivors land across the x6 train/val/test split, with their token
# budget. Every stage is a REGISTERED query composed verbatim (the x2k
# pattern, extended to four operators): changing any stage propagates
# here, and the oracle composes the four stages' SQL the same way, so
# the funnel can never drift from the operators it summarizes.

from .dedup import _X1_ORACLE as _X1_ORACLE_REF  # noqa: E402
from .textanalysis import _X4C_ORACLE as _X4C_ORACLE_REF  # noqa: E402

_X6I_ORACLE = f"""
WITH dedup AS ({_X1_ORACLE_REF}),
quality AS ({_X4C_ORACLE_REF}),
contam AS ({_X6D2_ORACLE}),
sp AS ({_X6_ORACLE}),
train AS (
  SELECT doc_id, source, md5(text) AS fingerprint
  FROM documents WHERE doc_id % 50 <> 0
),
staged AS (
  SELECT t.source,
         (t.doc_id = dd.keep_doc_id)        AS is_unique,
         q.passes_quality                   AS passes_quality,
         (c.train_doc_id IS NOT NULL)       AS contaminated,
         sp.split                           AS split,
         q.n_tokens                         AS n_tokens
  FROM train t
  JOIN dedup dd ON t.fingerprint = dd.fingerprint
  JOIN quality q ON t.doc_id = q.doc_id
  LEFT JOIN contam c ON t.doc_id = c.train_doc_id
  JOIN sp ON t.doc_id = sp.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT)                                       AS n_docs,
       CAST(count(*) FILTER (WHERE is_unique) AS BIGINT)              AS n_unique,
       CAST(count(*) FILTER (WHERE is_unique AND passes_quality)
            AS BIGINT)                                                AS n_quality,
       CAST(count(*) FILTER (WHERE is_unique AND passes_quality
                               AND NOT contaminated) AS BIGINT)       AS n_clean,
       CAST(count(*) FILTER (WHERE is_unique AND passes_quality
                               AND NOT contaminated
                               AND split = 'train') AS BIGINT)        AS n_train,
       CAST(count(*) FILTER (WHERE is_unique AND passes_quality
                               AND NOT contaminated
                               AND split = 'val') AS BIGINT)          AS n_val,
       CAST(count(*) FILTER (WHERE is_unique AND passes_quality
                               AND NOT contaminated
                               AND split = 'test') AS BIGINT)         AS n_test,
       CAST(coalesce(sum(n_tokens) FILTER (WHERE is_unique
                               AND passes_quality
                               AND NOT contaminated), 0) AS BIGINT)   AS n_tokens_clean
FROM staged
GROUP BY source
ORDER BY source
"""


@register("x6i_corpus_funnel", oracle=_X6I_ORACLE, tags=("X6", "X1", "X4"))
def x6i_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation funnel over the train-candidate universe:
    raw count -> exact-dedup survivors (doc IS its fingerprint group's
    keeper, so a copy of a benchmark doc is dropped here too) ->
    quality-gate survivors -> decontaminated survivors, plus the clean
    set's split distribution and token budget.

    Scale shape: quality and split are map-only per-doc expressions;
    dedup adds one uniform-key fingerprint hash-agg joined back on
    fingerprint; decontamination keeps x6d2's broadcast-benchmark shape
    (corpus never shuffles for it); the remaining joins are uniform
    doc_id equi-joins and the final aggregate is sources-sized with
    map-side partials. No stage is quadratic; nothing collects."""
    from .dedup import x1_exact_dedup
    from .textanalysis import x4c_quality_score

    docs = Catalog(spark, sf_dir).documents
    train = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source", F.md5("text").alias("fingerprint")
    )
    dd = x1_exact_dedup(spark, sf_dir).select("fingerprint", "keep_doc_id")
    quality = x4c_quality_score(spark, sf_dir).select(
        "doc_id", "passes_quality", "n_tokens"
    )
    contam = x6d2_decontamination_normalized(spark, sf_dir).select(
        F.col("train_doc_id").alias("doc_id"), F.lit(True).alias("flagged")
    )
    sp = x6_deterministic_split(spark, sf_dir).select("doc_id", "split")
    staged = (
        train.join(dd, "fingerprint")
        .join(quality, "doc_id")
        .join(contam, "doc_id", "left")
        .join(sp, "doc_id")
        .select(
            "source",
            (F.col("doc_id") == F.col("keep_doc_id")).alias("is_unique"),
            "passes_quality",
            F.coalesce(F.col("flagged"), F.lit(False)).alias("contaminated"),
            "split",
            "n_tokens",
        )
    )
    clean = (
        F.col("is_unique") & F.col("passes_quality") & ~F.col("contaminated")
    )

    def cnt(cond) -> Column:
        return F.count(F.when(cond, 1))

    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt(F.col("is_unique")).alias("n_unique"),
            cnt(F.col("is_unique") & F.col("passes_quality")).alias("n_quality"),
            cnt(clean).alias("n_clean"),
            cnt(clean & (F.col("split") == "train")).alias("n_train"),
            cnt(clean & (F.col("split") == "val")).alias("n_val"),
            cnt(clean & (F.col("split") == "test")).alias("n_test"),
            F.coalesce(F.sum(F.when(clean, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("n_tokens_clean"),
        )
        .orderBy("source")
    )


# X6j — dedup-aware mixture reweighting ---------------------------------------
#
# The correction x6e's raw-count weights silently need: a source whose
# volume is mostly exact duplicates contributes far fewer EFFECTIVE
# documents than its row count claims, so weights computed on raw
# shares over-sample it after dedup runs. This recomputes the x6e
# weight against each source's unique-fingerprint share (x1's md5
# fingerprint law) next to the raw-share weight, so the mixture planner
# sees both and the dup penalty is explicit.

_X6J_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         count(*)                    AS n_docs,
         count(DISTINCT md5(text))   AS n_unique,
         max({_X6E_PRIORITY_SQL})    AS priority
  FROM documents
  GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT)                                      AS n_docs,
       CAST(n_unique AS BIGINT)                                    AS n_unique,
       round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)      AS raw_frac,
       round(n_unique / CAST(sum(n_unique) OVER () AS DOUBLE), 6)  AS effective_frac,
       round(priority / CAST(sum(priority) OVER () AS DOUBLE), 6)  AS target_frac,
       round((priority / CAST(sum(priority) OVER () AS DOUBLE))
             / (n_docs / CAST(sum(n_docs) OVER () AS DOUBLE)), 4)  AS weight_raw,
       round((priority / CAST(sum(priority) OVER () AS DOUBLE))
             / (n_unique / CAST(sum(n_unique) OVER () AS DOUBLE)), 4) AS weight_effective
FROM per_src
ORDER BY source
"""


@register("x6j_dedup_aware_mixture", oracle=_X6J_ORACLE, tags=("X6", "X1"))
def x6j_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture weights against BOTH the raw share and the
    unique-fingerprint (post-dedup effective) share, same declared
    priority as x6e. One hash-aggregate collapses the corpus to a
    sources-sized table — the distinct-fingerprint count shuffles
    (source, fingerprint) partials on the uniform fingerprint key, the
    x1c shape — and the share/weight math runs as unpartitioned windows
    over that tiny aggregate (single-task-safe by construction, the x6e
    argument)."""
    docs = Catalog(spark, sf_dir).documents
    priority = (
        F.when(F.col("source") == "src0", 4)
        .when(F.col("source") == "src1", 2)
        .otherwise(1)
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.max(priority).alias("priority"),
    )
    w_all = W.partitionBy()
    raw = F.col("n_docs") / F.sum("n_docs").over(w_all).cast("double")
    eff = F.col("n_unique") / F.sum("n_unique").over(w_all).cast("double")
    target = F.col("priority") / F.sum("priority").over(w_all).cast("double")
    return (
        per_src.select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_unique").cast("long").alias("n_unique"),
            F.round(raw, 6).alias("raw_frac"),
            F.round(eff, 6).alias("effective_frac"),
            F.round(target, 6).alias("target_frac"),
            F.round(target / raw, 4).alias("weight_raw"),
            F.round(target / eff, 4).alias("weight_effective"),
        )
        .orderBy("source")
    )


# X6k — incremental admission funnel (the daily-ingest delta report) -----------
#
# The end-to-end story a DAILY ingest run ships, composing the
# incremental and batch layers: the new batch's x2n near-dup admission
# verdicts against the standing corpus LSH index, then the admitted
# documents flowing through the SAME registered gates the full-corpus
# funnel (x6i) uses — x4c quality, x6d2 normalized decontamination, x6
# deterministic split — into a per-source DELTA report. Every leg is a
# registered query composed verbatim, and the oracle nests the legs'
# SQL as CTEs, so the delta funnel can never drift from either the
# admission operator or the batch gates. Benchmark-member ids
# (doc_id % 50 == 0) are excluded from the batch universe: a pipeline
# does not ingest its own eval sets.
#
# Scale shape: x2n's probe is batch-sized against the band index
# (corpus never self-joins, gated); quality and split are map-only;
# decontamination keeps the broadcast-benchmark shape; the remaining
# joins are batch-sized doc_id equi-joins and the aggregate is
# sources-sized.

from .dedup import _X2N_ORACLE as _X2N_ORACLE_REF  # noqa: E402

_X6K_ORACLE = f"""
WITH adm AS ({_X2N_ORACLE_REF}),
quality AS ({_X4C_ORACLE_REF}),
contam AS ({_X6D2_ORACLE}),
sp AS ({_X6_ORACLE}),
staged AS (
  SELECT d.source,
         a.admit                           AS admitted,
         q.passes_quality                  AS passes_quality,
         (c.train_doc_id IS NOT NULL)      AS contaminated,
         sp.split                          AS split,
         q.n_tokens                        AS n_tokens
  FROM adm a
  JOIN documents d ON a.batch_doc_id = d.doc_id
  JOIN quality q   ON a.batch_doc_id = q.doc_id
  LEFT JOIN contam c ON a.batch_doc_id = c.train_doc_id
  JOIN sp          ON a.batch_doc_id = sp.doc_id
  WHERE a.batch_doc_id % 50 <> 0
)
SELECT source,
       CAST(count(*) AS BIGINT)                                      AS n_batch,
       CAST(count(*) FILTER (WHERE admitted) AS BIGINT)              AS n_admitted,
       CAST(count(*) FILTER (WHERE admitted AND passes_quality)
            AS BIGINT)                                               AS n_quality,
       CAST(count(*) FILTER (WHERE admitted AND passes_quality
                               AND NOT contaminated) AS BIGINT)      AS n_clean,
       CAST(count(*) FILTER (WHERE admitted AND passes_quality
                               AND NOT contaminated
                               AND split = 'train') AS BIGINT)       AS n_train,
       CAST(count(*) FILTER (WHERE admitted AND passes_quality
                               AND NOT contaminated
                               AND split = 'val') AS BIGINT)         AS n_val,
       CAST(count(*) FILTER (WHERE admitted AND passes_quality
                               AND NOT contaminated
                               AND split = 'test') AS BIGINT)        AS n_test,
       CAST(coalesce(sum(n_tokens) FILTER (WHERE admitted
                               AND passes_quality
                               AND NOT contaminated), 0) AS BIGINT)  AS n_tokens_clean
FROM staged
GROUP BY source
ORDER BY source
"""


@register("x6k_incremental_admission_funnel", oracle=_X6K_ORACLE, tags=("X6", "X2", "X4"))
def x6k_incremental_admission_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source delta funnel for a new batch: x2n admission verdict
    (not a near-dup of the standing corpus) -> x4c quality gate -> x6d2
    normalized decontamination -> x6 split assignment, with the clean
    delta's token budget. All four legs are the registered operators
    themselves; this query only stitches and aggregates."""
    from .dedup import x2n_incremental_near_dedup
    from .textanalysis import x4c_quality_score

    adm = x2n_incremental_near_dedup(spark, sf_dir).select(
        F.col("batch_doc_id").alias("doc_id"), "admit"
    )
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    quality = x4c_quality_score(spark, sf_dir).select(
        "doc_id", "passes_quality", "n_tokens"
    )
    contam = x6d2_decontamination_normalized(spark, sf_dir).select(
        F.col("train_doc_id").alias("doc_id"), F.lit(True).alias("flagged")
    )
    sp = x6_deterministic_split(spark, sf_dir).select("doc_id", "split")
    staged = (
        adm.filter(F.col("doc_id") % 50 != 0)
        .join(docs, "doc_id")
        .join(quality, "doc_id")
        .join(contam, "doc_id", "left")
        .join(sp, "doc_id")
        .select(
            "source",
            F.col("admit").alias("admitted"),
            "passes_quality",
            F.coalesce(F.col("flagged"), F.lit(False)).alias("contaminated"),
            "split",
            "n_tokens",
        )
    )
    clean = (
        F.col("admitted") & F.col("passes_quality") & ~F.col("contaminated")
    )

    def cnt(cond) -> Column:
        return F.count(F.when(cond, 1))

    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            cnt(F.col("admitted")).alias("n_admitted"),
            cnt(F.col("admitted") & F.col("passes_quality")).alias("n_quality"),
            cnt(clean).alias("n_clean"),
            cnt(clean & (F.col("split") == "train")).alias("n_train"),
            cnt(clean & (F.col("split") == "val")).alias("n_val"),
            cnt(clean & (F.col("split") == "test")).alias("n_test"),
            F.coalesce(F.sum(F.when(clean, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("n_tokens_clean"),
        )
        .orderBy("source")
    )


# X6l — training-shard manifest ------------------------------------------------
#
# The closing step of a curation run: documents land in fixed shard
# buckets per split, and the run ships a MANIFEST the training loader
# (and tomorrow's rerun) can verify shards against — counts, token
# budget, and an order-insensitive content checksum per shard. Shard
# assignment reuses the portable split hash (divided past the split
# digits so shard and split stay independent), so a document's shard —
# like its split — never moves when the corpus grows. The checksum is
# bit_xor over per-doc 60-bit md5 fingerprints: commutative (partition
# order cannot change it), exact-integer in both engines, and any
# single-document change flips it.

_X6L_SHARDS = 8
_X6L_SHARD_SQL = f"({_HASH_SQL} // 100) % {_X6L_SHARDS}"

_X6L_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
              WHEN {_BUCKET_SQL} < 90 THEN 'val'
              ELSE 'test' END                     AS split,
         CAST({_X6L_SHARD_SQL} AS BIGINT)          AS shard_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
  FROM documents
)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       bit_xor(fp)                   AS content_xor
FROM d
GROUP BY split, shard_id
ORDER BY split, shard_id
"""


@register("x6l_shard_manifest", oracle=_X6L_ORACLE, tags=("X6", "X1"))
def x6l_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, shard) manifest: doc count, token budget, and the
    xor-of-fingerprints checksum a loader verifies before training.
    Map-only assignment (hash arithmetic + split CASE) followed by one
    sources*shards-sized hash-agg — zero joins, zero windows; the
    shard key is uniform by construction so no reducer can hotspot."""
    from ..operators.dedup import _md5h60

    docs = Catalog(spark, sf_dir).documents
    b = split_bucket("doc_id")
    shard = (split_hash("doc_id") / 100).cast("long") % _X6L_SHARDS
    d = docs.select(
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
        shard.cast("long").alias("shard_id"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        _md5h60(F.col("text")).alias("fp"),
    )
    return (
        d.groupBy("split", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.bit_xor("fp").alias("content_xor"),
        )
        .orderBy("split", "shard_id")
    )


# X6m — DSIR-style importance-weighted resampling ------------------------------
#
# The public importance-resampling selection step (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling"),
# expressed with unigram LMs and a DETERMINISTIC Gumbel key so the whole
# pass has a full-value oracle:
#
# - target domain  = the corpus's 'en' stratum (DSIR's target corpus,
#   proxied in-corpus so the fixture carries both distributions);
# - importance     log w(d) = log p_target(d) - log p_corpus(d) under
#   Laplace-smoothed unigram LMs sharing the corpus vocabulary V
#   (p(tok) = (n+1)/(T+V)), which factorizes into a per-token
#   ln(n_t+1) - ln(n_c+1) sum plus a closed-form length term —
#   exactly x4j's inverted-index algebra with a second count column;
# - resampling     DSIR's Gumbel top-k, derandomized: the Gumbel noise
#   -ln(-ln(u)) draws u from the portable split hash ((h+0.5)/2^32, the
#   x6a/x6c/x6l law), and selection is THRESHOLDED (key > tau) rather
#   than globally ranked — per-doc, map-only, and growth-stable (a new
#   document never flips an old one's verdict), where a top-k would
#   need a global ranking stage and re-decide everything each ingest.
#
# Scale shape: vocabulary hash-agg with a conditional target count
# (map-side combine; shuffle carries (token, n_c, n_t)) -> token-keyed
# join back (the x4j/x6d inverted-index shape, one corpus shuffle on
# the token key) -> per-doc aggregate -> 1-row broadcast of the LM
# normalizers -> map-only Gumbel + verdict. Catalyst plans the token
# explode THREE times (vocab, the join probe, and the normalizer agg
# re-derives vocab — no subtree sharing), exactly x4j's documented
# shape; a production run at 100 TB would persist the vocab table once
# and reuse it. The 3-scan shape is plan-gated so it cannot silently
# grow worse.

_X6M_TAU = 1.0

_X6M_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, count(*) AS nc,
         count(*) FILTER (WHERE lang = 'en') AS nt
  FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(sum(nc) AS DOUBLE) AS tc, CAST(sum(nt) AS DOUBLE) AS tt,
         CAST(count(*) AS DOUBLE) AS v
  FROM vocab
),
per AS (
  SELECT t.doc_id, t.source, t.lang, count(*) AS n_tokens,
         sum(ln(nt + 1.0) - ln(nc + 1.0)) AS s
  FROM toks t JOIN vocab USING (tok)
  GROUP BY t.doc_id, t.source, t.lang
)
SELECT doc_id, source, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(s + n_tokens * (ln(tc + v) - ln(tt + v)), 4) + 0.0 AS log_ratio,
       round(-ln(-ln(((({_HASH_SQL}) + 0.5) / 4294967296))), 4) + 0.0 AS gumbel,
       (s + n_tokens * (ln(tc + v) - ln(tt + v)))
         - ln(-ln(((({_HASH_SQL}) + 0.5) / 4294967296))) > {_X6M_TAU}
         AS accept
FROM per CROSS JOIN tot
ORDER BY doc_id
"""


@register("x6m_importance_resample", oracle=_X6M_ORACLE, tags=("X6", "X4"))
def x6m_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style selection: per-document target-vs-corpus unigram
    log-likelihood ratio plus a deterministic Gumbel key from the
    portable split hash; accept iff log_ratio + gumbel > tau. The
    accept column uses the UNROUNDED key in both engines."""
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", "source", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
    )
    tot = vocab.agg(
        F.sum("nc").cast("double").alias("tc"),
        F.sum("nt").cast("double").alias("tt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    per = (
        toks.join(vocab, "tok")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log(F.col("nt") + 1.0) - F.log(F.col("nc") + 1.0)
            ).alias("s"),
        )
    )
    length_term = F.col("n_tokens") * (
        F.log(F.col("tc") + F.col("v")) - F.log(F.col("tt") + F.col("v"))
    )
    log_ratio = F.col("s") + length_term
    u = (split_hash("doc_id") + 0.5) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            # + 0.0 collapses IEEE -0.0 to 0.0 identically on both
            # engines (a doc whose ratio rounds to zero from below)
            (F.round(log_ratio, 4) + 0.0).alias("log_ratio"),
            (F.round(gumbel, 4) + 0.0).alias("gumbel"),
            (log_ratio + gumbel > _X6M_TAU).alias("accept"),
        )
        .orderBy("doc_id")
    )


# X6b2 — best-fit-decreasing sequence packing ----------------------------------
#
# x6b packs by running offset in doc_id order (documents may straddle
# chunk boundaries); public training pipelines that refuse to split
# documents pack BEST-FIT-DECREASING instead: sort items by size
# descending, place each into the FULLEST bin it still fits (ties ->
# lowest bin id), else open a new bin. BFD is a sequential greedy — the
# trick that keeps a full-value oracle is the w10/x4o engine-identical
# FOLD law, with the state encoded as a LIST<LIST<BIGINT>> (element 1 =
# bin loads, elements 2.. = [doc_id, bin, tokens] assignments) because
# DuckDB 1.0's list_reduce mis-folds STRUCT accumulators (verified:
# struct state sees the initial acc at every step; list state folds
# correctly). Both engines run the same branch algebra: feasible set =
# filter(loads, b -> b + s <= cap), chosen bin = first position of
# max(feasible), so every tie resolves identically.
#
# Scale shape: one shuffle groups docs per source; each group folds
# O(n_docs * n_bins) entirely inside a JVM/vectorized HOF (no Python).
# Per-group state is the group's assignment list — at 100 TB the key
# becomes (source, split_bucket) exactly as x6b documents, bounding
# every group, and bins stay private to their group (bin packing is
# per-shard in production packers for the same reason).

_X6B2_CAP = 2048

def _x6b2_fold_ctes(t_select: str, prefix: str = "") -> str:
    """The x6b2 BFD fold CTE chain (t -> lst -> folded) parameterized
    on the t source — split out (r16, the byte-identity builder law)
    so e3's pipeline packs its SAMPLED survivors with the registered
    fold; the registered _X6B2_ORACLE is this builder applied to the
    full documents table, proven hash-unchanged. ``prefix`` renames
    the three CTEs (r17, for x6b4's SECOND fold in one oracle — two
    unprefixed chains would collide); the default "" output is
    byte-identical to the r16 builder, pytest-pinned."""
    return f"""{prefix}t AS (
  {t_select}
),
{prefix}lst AS (
  SELECT source,
         [[CAST([] AS BIGINT[])]] ||
         list([[-n_tokens, doc_id]] ORDER BY n_tokens DESC, doc_id) AS l
  FROM {prefix}t GROUP BY source
),
{prefix}folded AS (
  SELECT source,
         list_reduce(l, (acc, x) ->
           CASE WHEN len(list_filter(acc[1], b -> b - x[1][1] <= {_X6B2_CAP})) = 0
           THEN list_concat(list_concat([list_append(acc[1], -x[1][1])], acc[2:]),
                            [[x[1][2], CAST(len(acc[1]) AS BIGINT), -x[1][1]]])
           ELSE list_concat(list_concat(
                  [list_transform(range(1, len(acc[1]) + 1),
                     i -> CASE WHEN i = list_position(acc[1],
                                 list_max(list_filter(acc[1], b -> b - x[1][1] <= {_X6B2_CAP})))
                               THEN acc[1][i] - x[1][1] ELSE acc[1][i] END)],
                  acc[2:]),
                  [[x[1][2], CAST(list_position(acc[1],
                     list_max(list_filter(acc[1], b -> b - x[1][1] <= {_X6B2_CAP}))) - 1 AS BIGINT),
                    -x[1][1]]])
           END) AS st
  FROM {prefix}lst
)"""


_X6B2_T_SELECT = """SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents"""

_X6B2_ORACLE = f"""
WITH {_x6b2_fold_ctes(_X6B2_T_SELECT)}
SELECT source, u[1] AS doc_id, u[3] AS n_tokens, u[2] AS bin_id
FROM (SELECT source, unnest(st[2:]) AS u FROM folded)
ORDER BY source, doc_id
"""


def x6b2_pack(t: DataFrame) -> DataFrame:
    """The Spark half of the x6b2 BFD fold over an arbitrary
    (doc_id, source, n_tokens) frame — factored (r16) so e3's pipeline
    packs its sampled survivors with the registered fold. Returns
    (source, doc_id, n_tokens, bin_id) ordered by (source, doc_id)."""
    lst = (
        t.select("doc_id", "source", "n_tokens")
        .groupBy("source")
        .agg(
            F.sort_array(
                F.collect_list(F.array(-F.col("n_tokens"), F.col("doc_id")))
            ).alias("l")
        )
    )

    cap = F.lit(_X6B2_CAP)

    def merge(acc, x):
        bins = F.element_at(acc, 1)
        s = -F.element_at(x, 1)
        d = F.element_at(x, 2)
        feas = F.filter(bins, lambda b: b + s <= cap)
        rest = F.slice(acc, 2, F.greatest(F.size(acc) - 1, F.lit(0)))
        new_bin = F.concat(
            F.array(F.concat(bins, F.array(s))),
            rest,
            F.array(F.array(d, F.size(bins).cast("long"), s)),
        )
        pos = F.array_position(bins, F.array_max(feas))
        upd = F.transform(
            F.sequence(F.lit(1), F.size(bins)),
            lambda i: F.when(
                i.cast("long") == pos, F.element_at(bins, i) + s
            ).otherwise(F.element_at(bins, i)),
        )
        best = F.concat(
            F.array(upd), rest, F.array(F.array(d, pos - 1, s))
        )
        return F.when(F.size(feas) == 0, new_bin).otherwise(best)

    init = F.expr("array(cast(array() as array<bigint>))")
    folded = lst.select(
        "source", F.aggregate("l", init, merge).alias("st")
    )
    asg = folded.select(
        "source",
        F.explode(
            F.slice(F.col("st"), 2, F.greatest(F.size("st") - 1, F.lit(0)))
        ).alias("u"),
    )
    return asg.select(
        "source",
        F.element_at("u", 1).alias("doc_id"),
        F.element_at("u", 3).alias("n_tokens"),
        F.element_at("u", 2).alias("bin_id"),
    ).orderBy("source", "doc_id")


@register("x6b2_bfd_packing", oracle=_X6B2_ORACLE, tags=("X6",))
def x6b2_bfd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing bin packing of documents into 2048-token
    bins, per source: each document lands in the fullest feasible bin
    (no straddling, unlike x6b). The Spark fold (F.aggregate) and the
    oracle's list_reduce run the identical branch algebra, so every
    greedy decision — including ties — matches bin for bin. The fold
    itself lives in x6b2_pack, shared with the e3 pipeline."""
    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return x6b2_pack(
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    )


# X6h2 — packing-strategy comparison (x6b sequence vs x6b2 BFD) ----------------
#
# The decision table x6b2 exists to produce: per source, chunk/bin
# counts and mean fill for the straddling sequence packer (x6b — may
# overflow 2048, docs keep arrival order) against best-fit-decreasing
# (x6b2 — hard cap, reordered). Both legs compose the REGISTERED
# operators (and the oracle composes their SQL verbatim), so any packer
# change propagates. Aggregates are (source x chunks)-sized.

_X6H2_ORACLE = f"""
WITH packed AS ({_X6B_ORACLE}),
chunks AS (
  SELECT source, chunk_id, sum(n_tokens) AS fill
  FROM packed GROUP BY source, chunk_id
),
seq AS (
  SELECT source, count(*) AS n_seq,
         round(avg(CAST(fill AS DOUBLE)) / 2048.0, 4) AS fill_seq
  FROM chunks GROUP BY source
),
bfd_asg AS ({_X6B2_ORACLE}),
bins AS (
  SELECT source, bin_id, sum(n_tokens) AS fill
  FROM bfd_asg GROUP BY source, bin_id
),
bfd AS (
  SELECT source, count(*) AS n_bfd,
         round(avg(CAST(fill AS DOUBLE)) / 2048.0, 4) AS fill_bfd
  FROM bins GROUP BY source
)
SELECT source,
       CAST(n_seq AS BIGINT)  AS n_chunks_seq,
       fill_seq               AS mean_fill_seq,
       CAST(n_bfd AS BIGINT)  AS n_bins_bfd,
       fill_bfd               AS mean_fill_bfd,
       CAST(n_bfd - n_seq AS BIGINT) AS bin_delta
FROM seq JOIN bfd USING (source)
ORDER BY source
"""


@register("x6h2_packing_comparison", oracle=_X6H2_ORACLE, tags=("X6",))
def x6h2_packing_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing scoreboard: straddling sequence packer (x6b)
    vs best-fit-decreasing bins (x6b2), counts and mean fill side by
    side. bin_delta > 0 is the price BFD pays for never splitting a
    document across the 2048 cap."""
    seq = (
        x6b_sequence_packing(spark, sf_dir)
        .groupBy("source", "chunk_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.round(F.avg(F.col("fill").cast("double")) / 2048.0, 4).alias(
                "fill_seq"
            ),
        )
    )
    bfd = (
        x6b2_bfd_packing(spark, sf_dir)
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bfd"),
            F.round(F.avg(F.col("fill").cast("double")) / 2048.0, 4).alias(
                "fill_bfd"
            ),
        )
    )
    return (
        seq.join(bfd, "source")
        .select(
            "source",
            F.col("n_seq").cast("long").alias("n_chunks_seq"),
            F.col("fill_seq").alias("mean_fill_seq"),
            F.col("n_bfd").cast("long").alias("n_bins_bfd"),
            F.col("fill_bfd").alias("mean_fill_bfd"),
            (F.col("n_bfd") - F.col("n_seq")).cast("long").alias("bin_delta"),
        )
        .orderBy("source")
    )


# X4t — FineWeb-style quality ENSEMBLE (declared-weight mixture of filters) ----
#
# Every public pre-training pipeline (FineWeb, Gopher/MassiveText, DSIR)
# ships not one filter but a weighted mixture; this operator is that
# mixture over five REGISTERED signals, composed verbatim (the x2k/x6i
# pattern — operator and oracle alike re-use the registered stages, so
# the ensemble can never drift from the filters it combines):
#
#   x4c  distinct_ratio, stopword_ratio (lexical diversity / naturalness)
#   x4i  top_word_frac, top_bigram_frac (Gopher repetition rules)
#   x4q  flesch                         (readability)
#   x4s  avg_logprob                    (corpus bigram-LM fluency;
#                                        bigram-less docs take _X4T_LP_FILL)
#   x6m  log_ratio                      (DSIR target-vs-corpus importance)
#
# Bit-exactness across engines: the ensemble consumes ONLY the rounded
# columns the registered stages emit, and both engines combine them with
# the identical left-associated expression tree — so the unrounded score
# is bit-identical and the keep cutoff (score > 0, passes_quality) is
# drift-free; the EMITTED score additionally takes the floor law
# (unbounded quantity). Scale shape: five map-heavy stages joined on
# doc_id — the join keys are unique per stage, so AQE plans plain
# shuffle-hash joins; at 100 TB the stages pipeline per-document with no
# stage materializing more than its signal columns.

_X4T_WEIGHTS = (
    ("distinct_ratio", 2.0),
    ("top_word_frac", -3.0),
    ("top_bigram_frac", -2.0),
    ("stopword_ratio", 1.0),
    ("flesch", 0.01),
    ("avg_logprob", 0.2),
    ("log_ratio", 0.05),
)
_X4T_CUTOFF = 0.0
_X4T_LP_FILL = -10.0

from .textanalysis import (  # noqa: E402
    _X4I_ORACLE as _X4I_ORACLE_REF,
    _X4Q_ORACLE as _X4Q_ORACLE_REF,
    _X4S_ORACLE as _X4S_ORACLE_REF,
)

# signal name -> the SQL expression carrying it (single generation
# site: the oracle's score term list is BUILT from _X4T_WEIGHTS, so a
# weight edit can never desynchronize operator and oracle)
_X4T_SIGNAL_SQL = {
    "distinct_ratio": "c.distinct_ratio",
    "top_word_frac": "r.top_word_frac",
    "top_bigram_frac": "r.top_bigram_frac",
    "stopword_ratio": "c.stopword_ratio",
    "flesch": "q.flesch",
    "avg_logprob": f"coalesce(s.avg_logprob, {_X4T_LP_FILL})",
    "log_ratio": "m.log_ratio",
}

_X4T_SCORE_SQL = " + ".join(
    f"{w}*{_X4T_SIGNAL_SQL[name]}" for name, w in _X4T_WEIGHTS
)

_X4T_ORACLE = f"""
WITH c AS ({_X4C_ORACLE_REF}),
r AS ({_X4I_ORACLE_REF}),
q AS ({_X4Q_ORACLE_REF}),
s AS ({_X4S_ORACLE_REF}),
m AS ({_X6M_ORACLE})
SELECT c.doc_id,
       c.n_tokens,
       floor(({_X4T_SCORE_SQL}) * 10000) / 10000 AS score,
       (c.passes_quality AND ({_X4T_SCORE_SQL}) > {_X4T_CUTOFF}) AS keep
FROM c
JOIN r ON c.doc_id = r.doc_id
JOIN q ON c.doc_id = q.doc_id
LEFT JOIN s ON c.doc_id = s.doc_id
JOIN m ON c.doc_id = m.doc_id
ORDER BY c.doc_id
"""


@register("x4t_quality_ensemble", oracle=_X4T_ORACLE, tags=("X4", "X6"))
def x4t_quality_ensemble(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
    cutoff: float = _X4T_CUTOFF,
) -> DataFrame:
    """Declared-weight quality ensemble over five registered signals
    with a keep verdict (score > cutoff AND the x4c hard gate). The
    ``weights`` override exists for the sensitivity pytest — the
    registered entry always runs the declared defaults."""
    from .textanalysis import (
        x4c_quality_score,
        x4i_repetition_profile,
        x4q_readability,
        x4s_bigram_logprob,
    )

    w = dict(_X4T_WEIGHTS)
    if weights:
        unknown = set(weights) - set(w)
        if unknown:
            raise ValueError(f"unknown ensemble signals: {sorted(unknown)}")
        w.update(weights)
    c = x4c_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "distinct_ratio", "stopword_ratio",
        "passes_quality",
    )
    r = x4i_repetition_profile(spark, sf_dir).select(
        "doc_id", "top_word_frac", "top_bigram_frac"
    )
    q = x4q_readability(spark, sf_dir).select("doc_id", "flesch")
    s = x4s_bigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    m = x6m_importance_resample(spark, sf_dir).select("doc_id", "log_ratio")
    j = (
        c.join(r, "doc_id")
        .join(q, "doc_id")
        .join(s, "doc_id", "left")
        .join(m, "doc_id")
    )
    signals = {
        "distinct_ratio": F.col("distinct_ratio"),
        "top_word_frac": F.col("top_word_frac"),
        "top_bigram_frac": F.col("top_bigram_frac"),
        "stopword_ratio": F.col("stopword_ratio"),
        "flesch": F.col("flesch"),
        "avg_logprob": F.coalesce(F.col("avg_logprob"), F.lit(_X4T_LP_FILL)),
        "log_ratio": F.col("log_ratio"),
    }
    # the Spark-side face of the single-site invariant: adding a signal
    # to _X4T_WEIGHTS without wiring both engines fails loudly here.
    # ValueError, not assert — this is a runtime operator guard and must
    # survive `python -O` (review-caught).
    if not (set(signals) == set(w) == set(_X4T_SIGNAL_SQL)):
        raise ValueError("ensemble signal lists drifted between engines")
    # fixed _X4T_WEIGHTS iteration order = the oracle's left-associated
    # sum, so the unrounded double is bit-identical across engines
    score = None
    for name, _default in _X4T_WEIGHTS:
        term = F.lit(w[name]) * signals[name]
        score = term if score is None else score + term
    return j.select(
        "doc_id",
        "n_tokens",
        (F.floor(score * 10000) / 10000).alias("score"),
        (F.col("passes_quality") & (score > F.lit(cutoff))).alias("keep"),
    ).orderBy("doc_id")


# X6n — temperature-scaled mixture sampling (data-DERIVED rates) ---------------
#
# x6c samples with DECLARED per-stratum rates and x6e computes weights
# toward a declared target mixture; x6n closes the loop with the public
# multilingual recipe (mBERT / XLM-R exponent sampling): the target
# share of source s is n_s^alpha / sum(n^alpha) with alpha = 0.5 — a
# temperature that flattens the source distribution, upweighting
# low-resource sources relative to their natural share — under a total
# token budget of half the corpus, capped at keep-everything (an
# acceptance sampler can only downsample; rate 1.0 = the cap).
#
# Determinism contract: the per-source rate is rounded at 6dp INSIDE
# both engines before the per-document threshold test
# (split_hash(doc) < rate * 2^32, the x6c/x6 portable-hash family), so
# both engines accept the exact same document set. Scale shape: one
# map-combined hash-agg collapses the corpus to a sources-sized table,
# the rate math runs over that tiny frame crossed with a 1-row
# broadcast total, and the acceptance pass is a broadcast equi-join on
# source + a map-side filter — the corpus subtree is planned twice
# (rates + acceptance; persist the per-doc token counts in production,
# the x6m note).

_X6N_ALPHA_SQL = "sqrt"  # alpha = 0.5 == sqrt, bit-exact in both engines
_X6N_BUDGET_FRAC = 0.5

# THE per-document acceptance predicate (one site for the registered
# acc CTE and e3's sampled-survivor CTE)
_X6N_ACCEPT_SQL = f"({_HASH_SQL}) < rate * 4294967296"


def _x6n_chain_sql(d_select: str) -> str:
    """The x6n rate-derivation CTE chain (d -> per -> tot -> rates ->
    acc) parameterized on the d source — split out (r16, the byte-
    identity builder law) so e3's pipeline derives its mixture rates
    from the SURVIVOR set with the registered algebra; the registered
    _X6N_ORACLE is this builder applied to the full documents table,
    proven hash-unchanged."""
    return f"""d AS (
  {d_select}
),
per AS (
  SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tokens
  FROM d GROUP BY source
),
tot AS (
  SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z,
         sum(n_tokens) AS grand
  FROM per
),
rates AS (
  SELECT source, n_docs, n_tokens,
         round(least(1.0,
           ({_X6N_BUDGET_FRAC} * grand)
             * (sqrt(CAST(n_tokens AS DOUBLE)) / z) / n_tokens), 6) AS rate
  FROM per CROSS JOIN tot
),
acc AS (
  SELECT d.source, count(*) AS n_accepted, sum(n_tok) AS tokens_accepted
  FROM d JOIN rates USING (source)
  WHERE {_X6N_ACCEPT_SQL}
  GROUP BY d.source
)"""


_X6N_D_SELECT = (
    "SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok"
    " FROM documents"
)

_X6N_ORACLE = f"""
WITH {_x6n_chain_sql(_X6N_D_SELECT)}
SELECT r.source,
       CAST(r.n_docs AS BIGINT)                        AS n_docs,
       CAST(r.n_tokens AS BIGINT)                      AS n_tokens,
       r.rate                                          AS rate,
       CAST(coalesce(a.n_accepted, 0) AS BIGINT)       AS n_accepted,
       CAST(coalesce(a.tokens_accepted, 0) AS BIGINT)  AS tokens_accepted
FROM rates r LEFT JOIN acc a ON r.source = a.source
ORDER BY r.source
"""


def x6n_rates(d: DataFrame) -> DataFrame:
    """The Spark half of the x6n rate derivation over an arbitrary
    (doc_id, source, n_tok) frame — factored (r16) so e3's pipeline
    derives mixture rates from the SURVIVOR set with the registered
    algebra. Returns (source, n_docs, n_tokens, rate) with the rate
    rounded at 6dp inside the engine (the x6n determinism contract)."""
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    tot = per.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z"),
        F.sum("n_tokens").alias("grand"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            (F.lit(_X6N_BUDGET_FRAC) * F.col("grand"))
            * (F.sqrt(F.col("n_tokens").cast("double")) / F.col("z"))
            / F.col("n_tokens"),
        ),
        6,
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens", rate.alias("rate")
    )


def x6n_accept_filter() -> Column:
    """THE per-document acceptance predicate (Spark half of
    _X6N_ACCEPT_SQL): portable split hash under the 6dp-rounded
    per-source rate scaled to the 32-bit hash range."""
    return split_hash("doc_id") < F.col("rate") * F.lit(4294967296.0)


@register("x6n_temperature_mixture", oracle=_X6N_ORACLE, tags=("X6",))
def x6n_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponent (temperature) sampling: per-source acceptance rates
    derived from n_tokens^0.5 shares under a half-corpus token budget,
    then actually applied per document with the portable hash — the
    multilingual-recipe sampler with its realized per-source yield."""
    docs = Catalog(spark, sf_dir).documents
    d = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    rates = x6n_rates(d)
    acc = (
        d.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(x6n_accept_filter())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_accepted"),
            F.sum("n_tok").alias("tokens_accepted"),
        )
    )
    return (
        rates.join(acc, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "rate",
            F.coalesce(F.col("n_accepted"), F.lit(0))
            .cast("long")
            .alias("n_accepted"),
            F.coalesce(F.col("tokens_accepted"), F.lit(0))
            .cast("long")
            .alias("tokens_accepted"),
        )
        .orderBy("source")
    )


# X6p — data-constrained EPOCH scheduler (repeat factors under a budget) -------
#
# The planning step the public data-constrained-scaling result
# prescribes (Muennighoff et al. 2023: repeating data up to ~4 epochs
# is nearly as good as fresh data; beyond that returns decay fast):
# given each source's natural token supply and a uniform target share
# of a training budget set at 2x the corpus, how many EPOCHS of each
# source does the run schedule, how many tokens does that actually
# deliver once the 4-epoch cap bites, and how much of the target goes
# unfilled? Small sources hit the cap (their shortfall is real and
# reported, never silently absorbed); large sources train under 1
# epoch. All columns derive from integer token counts with floor/ceil
# arithmetic — no float boundary anywhere — so the oracle compares
# exactly.
#
# Scale shape: one map-combined hash-agg collapses the corpus to a
# sources-sized table; everything after is arithmetic on ~dozens of
# rows (the x6e pattern). The budget multiplier and cap are declared
# constants, single-sited for both engines.

_X6P_BUDGET_X = 2  # train on 2x the corpus token count
_X6P_MAX_EPOCHS = 4  # the data-constrained-scaling repeat ceiling

_X6P_ORACLE = f"""
WITH per AS (
  SELECT source, sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS grand, count(*) AS n_src FROM per),
plan AS (
  SELECT source, n_tokens,
         ({_X6P_BUDGET_X} * grand) // n_src AS target_tokens
  FROM per CROSS JOIN tot
)
SELECT source,
       CAST(n_tokens AS BIGINT)      AS n_tokens,
       CAST(target_tokens AS BIGINT) AS target_tokens,
       CAST(least((target_tokens + n_tokens - 1) // n_tokens,
                  {_X6P_MAX_EPOCHS}) AS BIGINT) AS epochs,
       CAST(least(target_tokens, {_X6P_MAX_EPOCHS} * n_tokens) AS BIGINT)
         AS scheduled_tokens,
       CAST(greatest(target_tokens - {_X6P_MAX_EPOCHS} * n_tokens, 0) AS BIGINT)
         AS unfilled_tokens
FROM plan
ORDER BY source
"""


@register("x6p_epoch_schedule", oracle=_X6P_ORACLE, tags=("X6",))
def x6p_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan under a 2x-corpus budget with the 4-epoch
    repeat ceiling: natural tokens, uniform target, epochs scheduled,
    tokens actually delivered, and the cap-induced shortfall. Pure
    integer arithmetic on both engines."""
    docs = Catalog(spark, sf_dir).documents
    per = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("grand"), F.count(F.lit(1)).alias("n_src")
    )
    # integer `div`, never double /: past 2^53 tokens the double loses
    # low-order bits where DuckDB's // stays exact (review-caught)
    target = F.expr(f"({_X6P_BUDGET_X} * grand) div n_src")
    plan = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_tokens", target.alias("target_tokens")
    )
    epochs = F.least(
        F.expr("(target_tokens + n_tokens - 1) div n_tokens"),
        F.lit(_X6P_MAX_EPOCHS),
    )
    return plan.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("target_tokens").cast("long").alias("target_tokens"),
        epochs.cast("long").alias("epochs"),
        F.least(
            F.col("target_tokens"),
            F.lit(_X6P_MAX_EPOCHS) * F.col("n_tokens"),
        )
        .cast("long")
        .alias("scheduled_tokens"),
        F.greatest(
            F.col("target_tokens")
            - F.lit(_X6P_MAX_EPOCHS) * F.col("n_tokens"),
            F.lit(0),
        )
        .cast("long")
        .alias("unfilled_tokens"),
    ).orderBy("source")


# X6s — decontamination-aware mixture (x6d verdicts reshape x6n shares) ---------
#
# x6d flags contaminated documents; x6n derives temperature shares from
# raw source sizes. A pipeline that runs both must derive its mixture
# from what SURVIVES decontamination — a source that loses mass to
# benchmark overlap must not keep its pre-filter share, or the sampler
# re-inflates exactly the contaminated slice. x6s closes that loop: per
# source, the train/contaminated/clean counts (x6d's verdict set,
# composed as a CTE verbatim), then x6n's sqrt-temperature share over
# the CLEAN counts. Same determinism contract as x6n: shares rounded
# 6dp in-engine; clean_frac takes the floor law (count ratio).
#
# Scale shape: x6d's (broadcast benchmark index, corpus never
# shuffles), then everything downstream is sources-sized: one
# hash-agg to per-source counts, a 1-row broadcast normalizer, a
# 20-row output.

_X6S_ORACLE = f"""
WITH contaminated AS ({_X6D_ORACLE}),
train AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 50 <> 0
),
per AS (
  SELECT t.source,
         count(*) AS n_train_docs,
         count(c.train_doc_id) AS n_contaminated
  FROM train t LEFT JOIN contaminated c ON c.train_doc_id = t.doc_id
  GROUP BY t.source
),
z AS (
  SELECT sum(sqrt(CAST(n_train_docs - n_contaminated AS DOUBLE))) AS z
  FROM per
)
SELECT source,
       CAST(n_train_docs AS BIGINT)                    AS n_train_docs,
       CAST(n_contaminated AS BIGINT)                  AS n_contaminated,
       CAST(n_train_docs - n_contaminated AS BIGINT)   AS n_clean,
       floor((n_train_docs - n_contaminated)
             / CAST(n_train_docs AS DOUBLE) * 1e6) / 1e6 AS clean_frac,
       round(sqrt(CAST(n_train_docs - n_contaminated AS DOUBLE)) / z, 6)
         AS target_share
FROM per CROSS JOIN z
ORDER BY source
"""


@register("x6s_decontaminated_mixture", oracle=_X6S_ORACLE, tags=("X6", "X2"))
def x6s_decontaminated_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture shares derived from the documents that
    SURVIVE x6d decontamination: train/contaminated/clean counts plus
    the sqrt-temperature target share over clean mass — the mixture a
    decontaminating pipeline actually samples from."""
    docs = Catalog(spark, sf_dir).documents
    verdicts = contamination_report(docs).select("train_doc_id")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "source")
    per = (
        train.join(
            verdicts.withColumn("_hit", F.lit(1)),
            train.doc_id == verdicts.train_doc_id,
            "left",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    clean = (F.col("n_train_docs") - F.col("n_contaminated")).cast("double")
    z = per.agg(F.sum(F.sqrt(clean)).alias("z"))
    return (
        per.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("n_train_docs").cast("long").alias("n_train_docs"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            clean.cast("long").alias("n_clean"),
            (F.floor(clean / F.col("n_train_docs").cast("double") * 1e6) / 1e6).alias(
                "clean_frac"
            ),
            F.round(F.sqrt(clean) / F.col("z"), 6).alias("target_share"),
        )
        .orderBy("source")
    )


# X6t — quality-annealed curriculum mixture (the multi-PHASE sampler) -----------
#
# Public practice anneals data quality over training: early phases
# sample broadly, the final phase concentrates on the highest-quality
# slice (the FineWeb-Edu / Llama-style annealing stage). x6c/x6n pick
# ONE mixture; x6t emits the per-PHASE plan: each phase declares a
# quality floor (on x4c's REGISTERED 4dp-rounded distinct_ratio — the
# x4w trick, so no unrounded float crosses a comparison) and an
# acceptance rate applied with the portable split hash. The output is
# the (phase, source) manifest — docs, tokens, mean kept quality —
# that a phase-aware trainer consumes. Phase table is ONE module
# constant generating both engines' branches.
#
# Scale shape: x4c's map-only scoring, one hash per doc, then a
# (phase x source)-sized aggregate; the corpus subtree is planned once
# per phase branch (3x here — a production run persists the scored
# corpus, the x6m note).

# (phase, quality floor on rounded distinct_ratio, acceptance %)
_X6T_PHASES = (
    (1, 0.0, 50),
    (2, 0.55, 75),
    (3, 0.7, 100),
)


def _x6t_oracle() -> str:
    branches = []
    for phase, qmin, pct in _X6T_PHASES:
        branches.append(f"""
  SELECT {phase} AS phase, source, doc_id, n_tokens, distinct_ratio
  FROM scored
  WHERE distinct_ratio >= {qmin} AND {_BUCKET_SQL} < {pct}""")
    u = "\nUNION ALL\n".join(branches)
    return f"""
WITH scored AS (
  SELECT d.doc_id, d.source, q.n_tokens, q.distinct_ratio
  FROM documents d JOIN ({_X4C_ORACLE_REF}) q ON q.doc_id = d.doc_id
),
kept AS ({u})
SELECT phase, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       floor(sum(CAST(round(distinct_ratio * 1e4, 0) AS BIGINT))
             / CAST(count(*) AS DOUBLE)) / 1e4 AS mean_quality
FROM kept
GROUP BY phase, source
ORDER BY phase, source
"""


@register("x6t_curriculum_anneal", oracle=_x6t_oracle(), tags=("X6", "X4"))
def x6t_curriculum_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(phase, source) curriculum manifest: each training phase
    keeps documents above its declared quality floor at its declared
    acceptance rate (portable hash) — the annealing schedule where the
    final phase concentrates on the highest-quality slice."""
    from .textanalysis import x4c_quality_score

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    q = x4c_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "distinct_ratio"
    )
    scored = docs.join(q, "doc_id")
    parts = []
    for phase, qmin, pct in _X6T_PHASES:
        parts.append(
            scored.filter(
                (F.col("distinct_ratio") >= qmin)
                & (split_bucket("doc_id") < pct)
            ).select(
                F.lit(phase).cast("int").alias("phase"),
                "source",
                "n_tokens",
                "distinct_ratio",
            )
        )
    kept = parts[0]
    for p in parts[1:]:
        kept = kept.unionByName(p)
    return (
        kept.groupBy("phase", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            # integer-exact mean (review-caught: floor of a float avg
            # sits exactly on the 4dp grid the data hits): each
            # 4dp-rounded ratio re-encodes as an exact integer, the sum
            # is exact, and ONE floored division crosses engines
            (
                F.floor(
                    F.sum(
                        F.round(F.col("distinct_ratio") * 1e4, 0).cast("long")
                    )
                    / F.count(F.lit(1)).cast("double")
                )
                / 1e4
            ).alias("mean_quality"),
        )
        .orderBy("phase", "source")
    )


# X6u — seeded epoch-reshuffle manifest ------------------------------------------
#
# The data-order face of training reproducibility the shard manifest
# (x6l) stops just short of: WITHIN a training run, every epoch must
# visit the same documents in a DIFFERENT but fully deterministic
# order, and the run ships per-(epoch, shard) manifests a loader can
# verify before consuming a shard. The permutation key is the portable
# 60-bit md5 hash of "epoch:doc_id" (_md5h60 — swap doc_id for a
# content fingerprint column and the law composes unchanged), so:
#
# - epoch 0 and epoch 1 are different permutations of the SAME id set
#   (the pytest law);
# - the order is seed-free and engine-portable (md5 is the seed);
# - it is STABLE UNDER CORPUS GROWTH: a document's key never depends
#   on other documents, so adding data never reorders existing pairs
#   — the property a rerun after an incremental ingest needs.
#
# Each epoch's global order is chunked into shards by the x6l law
# shape applied to the epoch key ((ekey div 100) % shards — docs move
# BETWEEN shards across epochs, a true global reshuffle), and the
# manifest pins the within-shard sequence with an ORDER-SENSITIVE
# polynomial checksum h <- (h*131 + doc) mod (2^31-1), folded JVM-side
# with F.aggregate over the sorted per-shard list — bit-identical to
# DuckDB's list_reduce because f(0, x0) == x0 (the proven x6b2
# template; doc ids enter pre-reduced mod p so the first step is
# exact). Cross-engine equality is therefore a proof that the
# distributed fold equals the naive ordered fold.
#
# Scale shape: map-only key derivation (md5 + integer ops), one
# hash-agg on the uniform (epoch, shard) key. The per-shard list lives
# inside one aggregation row — bounded by shard sizing (docs/shards);
# at petabyte shards the same law runs as repartition(epoch, shard) +
# sortWithinPartitions(ekey) + a streaming per-partition fold combined
# by h1*131^n2 + h2 (the checksum is associative under that shift), so
# nothing here is architecturally driver-bound.

_X6U_EPOCHS = 2
_X6U_P = 2147483647  # 2^31 - 1: h*131 + d stays far under 2^63


def x6u_epoch_keys(docs: DataFrame, n_epochs: int = _X6U_EPOCHS) -> DataFrame:
    """(epoch, doc_id, ekey, shard_id, dm) for every document x epoch —
    THE shared law site for the registered query and the permutation
    pytest."""
    from ..operators.dedup import _md5h60

    d = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(n_epochs)])).alias("epoch"),
    )
    ekey = _md5h60(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    return d.select(
        "epoch",
        "doc_id",
        ekey.alias("ekey"),
        (F.col("doc_id") % _X6U_P).alias("dm"),
    ).withColumn(
        # integer div, never float: ekey is 60-bit and a double round
        # trip would corrupt bits past 2^53
        "shard_id",
        F.expr(f"(ekey div 100) % {_X6L_SHARDS}"),
    )


_X6U_EKEY_SQL = (
    "CAST('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' "
    "|| CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
)

_X6U_ORACLE = f"""
WITH d AS (
  SELECT doc_id, e.epoch, {_X6U_EKEY_SQL} AS ekey
  FROM documents,
       (SELECT unnest([{", ".join(str(i) for i in range(_X6U_EPOCHS))}])
        AS epoch) e
),
s AS (
  SELECT epoch, (ekey // 100) % {_X6L_SHARDS} AS shard_id,
         ekey, doc_id, doc_id % {_X6U_P} AS dm
  FROM d
)
SELECT CAST(epoch AS INTEGER) AS epoch,
       CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       list_reduce(list(dm ORDER BY ekey, doc_id),
                   (h, x) -> (h * 131 + x) % {_X6U_P}) AS order_hash
FROM s
GROUP BY epoch, shard_id
ORDER BY epoch, shard_id
"""


@register("x6u_epoch_reshuffle_manifest", oracle=_X6U_ORACLE, tags=("X6",))
def x6u_epoch_reshuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(epoch, shard) reshuffle manifest: doc count plus the
    order-sensitive polynomial checksum of the shard's visit sequence
    under the seeded per-epoch permutation — epoch 0 and epoch 1 are
    provably different orderings of the same corpus (pytest law), and
    a loader verifies a shard's order before training on it."""
    docs = Catalog(spark, sf_dir).documents
    keys = x6u_epoch_keys(docs)
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("ekey"), F.col("doc_id"), F.col("dm")))
    )
    order_hash = F.aggregate(
        F.transform(arr, lambda s: s["dm"]),
        F.lit(0).cast("long"),
        lambda h, d: (h * F.lit(131) + d) % F.lit(_X6U_P),
    )
    return (
        keys.groupBy("epoch", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            order_hash.alias("order_hash"),
        )
        .orderBy("epoch", "shard_id")
    )


# X6v — chunk-with-overlap manifest (RAG ingest) --------------------------------
#
# The packer family (x6b/x6b2) fills fixed token budgets with WHOLE
# documents; RAG ingestion needs the opposite primitive: split each
# document into fixed token-window chunks with a declared overlap so
# retrieval context never cuts mid-thought at a hard boundary. Law:
# window W tokens, overlap V, stride S = W - V; chunk k covers tokens
# [k*S, min(k*S + W, n)); chunk count m = max(1, ceil((n - V) / S)),
# which guarantees every chunk contributes at least one new token and
# the non-overlap spans tile the document exactly (k*S + W = (k+1)*S + V,
# so reconstruction-by-concatenation is a theorem, pytest-pinned).
#
# Each chunk's manifest row pins the reconstructed text byte-for-byte
# via md5 (the x2s trimmed-text idiom): chunk_md5 = md5 of the
# space-joined token slice, identical in Spark and DuckDB because both
# hash the same UTF-8 bytes. Per-source chunk/token totals ride back on
# a broadcast join of the tiny source aggregate.
#
# Scale shape: chunking is MAP-ONLY — split, sequence-explode, slice,
# hash, all inside one stage with no shuffle of document text; the only
# exchanges are the few-row per-source aggregate and its broadcast
# return. At 100 TB this is one pass over the corpus writing ~n/S
# manifest rows per doc, embarrassingly parallel.

_X6V_WINDOW = 16   # tokens per chunk
_X6V_OVERLAP = 4   # tokens shared with the previous chunk
_X6V_STRIDE = _X6V_WINDOW - _X6V_OVERLAP

# THE oracle-side chunk-derivation law (d -> m -> chunks), shared by
# the x6v manifest oracle and the x6x chunk-retrieval oracle — one CTE
# text, so the two oracles can never disagree about what a chunk is
# (the SQL twin of the Spark side's shared overlapped_chunks site).
# Carries `source` for x6v; x6x simply doesn't select it.
_X6V_CHUNK_CTES = f"""d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
m AS (
  SELECT doc_id, source, toks, n_tokens,
         greatest(1, (n_tokens - {_X6V_OVERLAP} + {_X6V_STRIDE} - 1)
                     // {_X6V_STRIDE}) AS n_chunks
  FROM d
),
chunks AS (
  SELECT doc_id, source, k.i AS chunk_id,
         CAST(k.i * {_X6V_STRIDE} AS BIGINT) AS start_tok,
         toks[k.i * {_X6V_STRIDE} + 1 :
              k.i * {_X6V_STRIDE} + {_X6V_WINDOW}] AS ctoks
  FROM m, LATERAL (SELECT unnest(range(n_chunks)) AS i) k
)"""

_X6V_ORACLE = f"""
WITH {_X6V_CHUNK_CTES},
rows_ AS (
  SELECT doc_id, source, chunk_id, start_tok,
         CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
         md5(array_to_string(ctoks, ' ')) AS chunk_md5
  FROM chunks
),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS src_chunks,
         CAST(sum(n_chunk_tokens) AS BIGINT) AS src_chunk_tokens
  FROM rows_ GROUP BY source
)
SELECT r.doc_id, r.chunk_id, r.start_tok, r.n_chunk_tokens, r.chunk_md5,
       r.source, p.src_chunks, p.src_chunk_tokens
FROM rows_ r JOIN per_source p USING (source)
ORDER BY r.doc_id, r.chunk_id
"""


def overlapped_chunks(frame, window: int, overlap: int):
    """THE chunking law shared by x6v (manifest, RAG overlap 4) and x6w
    (scrub, gram-1 overlap 7): explode a frame carrying (toks,
    n_tokens, ...) into fixed token-window chunks — adds n_chunks,
    chunk_id, start_tok, and the ctoks slice, preserving every other
    column. m = max(1, ceil((n - overlap) / stride)) guarantees every
    chunk contributes at least one new token and (for x6w) every tail
    keeps >= overlap + 1 tokens; a fix here serves both operators, so
    the reconstruction and coverage theorems can never diverge."""
    stride = window - overlap
    return (
        frame.withColumn(
            "n_chunks",
            F.greatest(
                F.lit(1),
                F.expr(
                    f"(n_tokens - {overlap} + {stride} - 1) div {stride}"
                ),
            ),
        )
        .withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)),
        )
        .withColumn(
            "start_tok", (F.col("chunk_id") * stride).cast("long")
        )
        .withColumn(
            "ctoks",
            F.slice(
                "toks", F.col("chunk_id") * stride + 1, F.lit(window)
            ),
        )
        .drop("toks", "n_tokens")
    )


@register("x6v_chunk_overlap_manifest", oracle=_X6V_ORACLE, tags=("X6",))
def x6v_chunk_overlap_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunk manifest with declared overlap (W=16, V=4):
    one row per (doc, chunk) carrying the token span and the md5 of the
    reconstructed chunk text, plus per-source chunk/token totals on a
    broadcast fold. Chunking itself is map-only — no shuffle touches
    document text."""
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    chunks = overlapped_chunks(docs, _X6V_WINDOW, _X6V_OVERLAP)
    rows = chunks.select(
        "doc_id",
        "source",
        "chunk_id",
        "start_tok",
        F.size("ctoks").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("ctoks", " ")).alias("chunk_md5"),
    )
    per_source = rows.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_chunks"),
        F.sum("n_chunk_tokens").alias("src_chunk_tokens"),
    )
    return (
        rows.join(F.broadcast(per_source), "source")
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            "n_chunk_tokens",
            "chunk_md5",
            "source",
            "src_chunks",
            "src_chunk_tokens",
        )
        .orderBy("doc_id", "chunk_id")
    )


# X6w — chunk-level decontamination (x6v chunking ∘ x6d gram law) --------------
#
# x6d kills a WHOLE training document when any 8-gram matches the
# benchmark — the safe but wasteful doc-level scrub. A RAG/packing
# pipeline that ingests by chunk can be surgical: flag only the CHUNKS
# carrying benchmark grams and keep the rest of the document. The
# parameter that makes this sound is the chunk OVERLAP: with x6v's
# RAG overlap (V=4 < gram-1) an 8-gram spanning a chunk boundary
# belongs to NO chunk and escapes the scrub, so x6w chunks with its
# own V = 7 = gram - 1 (W=16, stride 9): every 8-token span then falls
# wholly inside at least one chunk, making
#
#   doc flagged by x6d  <=>  doc has >= 1 flagged x6w chunk
#
# a THEOREM (pytest-pinned both directions; forward because every
# doc gram is covered by some chunk, reverse because chunk tokens are
# consecutive doc tokens so chunk grams ⊆ doc grams). The tail-chunk
# arithmetic cooperates: m = ceil((n-7)/9) leaves every tail at least
# 8 tokens, so no chunk is too short to carry a gram.
#
# Scale shape: x6d's inverted-index posture per chunk — the benchmark
# gram index is tiny by definition and BROADCASTS (join key =
# xxhash64(gram), the x6d substitution; the DuckDB oracle joins raw
# strings, so agreement re-evidences the hash soundness); the corpus
# never shuffles for the probe, and the only aggregation is the
# (doc, chunk) hash-agg over matched grams. Chunk derivation is
# map-only (the x6v shape).

_X6W_WINDOW = 16
_X6W_GRAM = 8
_X6W_OVERLAP = _X6W_GRAM - 1  # airtight: no 8-gram can straddle out
_X6W_STRIDE = _X6W_WINDOW - _X6W_OVERLAP  # 9

_X6W_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
bench AS (
  SELECT DISTINCT gram, doc_id AS bench_id FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 7),
               i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')
           ))) AS gram
    FROM documents WHERE doc_id % 50 = 0
  )
),
m AS (
  SELECT doc_id, toks,
         greatest(1, (n_tokens - {_X6W_OVERLAP} + {_X6W_STRIDE} - 1)
                     // {_X6W_STRIDE}) AS n_chunks
  FROM d WHERE doc_id % 50 <> 0
),
chunks AS (
  SELECT doc_id, n_chunks, k.i AS chunk_id,
         CAST(k.i * {_X6W_STRIDE} AS BIGINT) AS start_tok,
         toks[k.i * {_X6W_STRIDE} + 1 :
              k.i * {_X6W_STRIDE} + {_X6W_WINDOW}] AS ctoks
  FROM m, LATERAL (SELECT unnest(range(n_chunks)) AS i) k
),
cgrams AS (
  SELECT doc_id, n_chunks, chunk_id, start_tok,
         unnest(list_distinct(list_transform(
             generate_series(1, len(ctoks) - {_X6W_GRAM - 1}),
             i -> array_to_string(ctoks[i:i + {_X6W_GRAM - 1}], ' ')
         ))) AS gram
  FROM chunks
)
SELECT c.doc_id AS train_doc_id, c.chunk_id, c.start_tok,
       CAST(count(DISTINCT c.gram) AS BIGINT)     AS n_shared_grams,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs,
       CAST(max(c.n_chunks) AS BIGINT)            AS doc_chunks
FROM cgrams c JOIN bench b ON c.gram = b.gram
GROUP BY c.doc_id, c.chunk_id, c.start_tok
ORDER BY train_doc_id, chunk_id
"""


@register("x6w_chunk_decontamination", oracle=_X6W_ORACLE, tags=("X6", "X2"))
def x6w_chunk_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity benchmark decontamination: chunk every training
    document with overlap 7 (= gram size - 1, so no 8-gram can straddle
    out of coverage) and flag each chunk sharing any 8-gram with the
    benchmark side (doc_id % 50 == 0), with per-chunk shared-gram and
    benchmark-doc counts plus the doc's chunk total — the surgical
    "drop these spans, keep the document" report."""
    from .dedup import token_shingles

    docs = Catalog(spark, sf_dir).documents
    bench = (
        gram_hash_index(docs.filter(F.col("doc_id") % 50 == 0))
        .select("gram_h", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    chunks = overlapped_chunks(train, _X6W_WINDOW, _X6W_OVERLAP)
    cgrams = chunks.select(
        "doc_id",
        "n_chunks",
        "chunk_id",
        "start_tok",
        F.explode(
            F.array_distinct(
                F.transform(
                    token_shingles(F.col("ctoks"), _X6W_GRAM),
                    lambda s: F.xxhash64(s),
                )
            )
        ).alias("gram_h"),
    )
    return (
        cgrams.join(F.broadcast(bench), "gram_h")
        .groupBy(
            F.col("doc_id").alias("train_doc_id"),
            "chunk_id",
            "start_tok",
            F.col("n_chunks").alias("doc_chunks"),
        )
        .agg(
            F.countDistinct("gram_h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
        .select(
            "train_doc_id",
            "chunk_id",
            "start_tok",
            "n_shared_grams",
            "n_benchmark_docs",
            F.col("doc_chunks").cast("long").alias("doc_chunks"),
        )
        .orderBy("train_doc_id", "chunk_id")
    )


# X6x — chunk-level BM25 retrieval (x6v chunking ∘ x4u scoring) ----------------
#
# x6v builds the RAG chunk manifest and x4u ranks whole documents; the
# actual RAG query path retrieves CHUNKS. x6x composes the two
# registered laws verbatim: the corpus is the x6v chunk table (W=16,
# V=4 — the same overlapped_chunks site, so a chunking change cannot
# leave retrieval behind), the scorer is x4u's single-site _X4U_W
# formula with the chunk as the scoring unit — n_docs = chunk count,
# df = chunk frequency, dl = chunk length, avgdl = mean chunk length —
# same integer micro-unit flooring, so the per-(query, chunk) sum is
# order-independent and the (doc_id, chunk_id) tie law is exact.
# The V=4 overlap is load-bearing for retrieval quality: a query term
# landing in an overlap span belongs to BOTH adjacent chunks and both
# surface (pytest-pinned), so a hit near a boundary never loses its
# context window.
#
# Scale shape: chunk derivation is map-only (the x6v shape); tf is one
# map-combined hash-agg keyed (doc, chunk, term); the query table and
# the query-pruned df table broadcast into the term-keyed inverted
# index exactly as in x4u — the corpus shuffles once on term and only
# query-term rows survive into scoring; the rank window sees
# |q| x matching-chunks rows, never the corpus.

_X6X_TOPK = 10

from .textanalysis import (  # noqa: E402
    _X4U_VALUES as _X6X_QUERY_VALUES,
    _X4U_W as _X6X_W,
)

# The CTE chain through `ranked` is shared with x4z2's chunk-MMR oracle
# (the x4u/_X4U_CTES precedent at chunk granularity).
_X6X_CTES = f"""
WITH q AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, term
  FROM (VALUES {_X6X_QUERY_VALUES}) v(query_id, term)
),
{_X6V_CHUNK_CTES},
ct AS (SELECT doc_id, chunk_id, unnest(ctoks) AS term FROM chunks),
tf AS (
  SELECT doc_id, chunk_id, term, CAST(count(*) AS BIGINT) AS tf_t
  FROM ct GROUP BY doc_id, chunk_id, term
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term
),
dl AS (
  SELECT doc_id, chunk_id, start_tok,
         CAST(len(ctoks) AS BIGINT) AS dl_t
  FROM chunks
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(ctoks)) AS DOUBLE) / count(*) AS avgdl
  FROM chunks
),
hits AS (
  SELECT q.query_id, tf.doc_id, tf.chunk_id, dl.start_tok,
         {_X6X_W} AS w_micro
  FROM tf
  JOIN q USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id AND tf.chunk_id = dl.chunk_id
  CROSS JOIN stats
),
scores AS (
  SELECT query_id, doc_id, chunk_id, start_tok,
         CAST(sum(w_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS n_hit_terms
  FROM hits GROUP BY query_id, doc_id, chunk_id, start_tok
),
ranked AS (
  SELECT query_id, doc_id, chunk_id, start_tok, score_micro, n_hit_terms,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY score_micro DESC, doc_id, chunk_id
         ) AS rnk
  FROM scores
)"""

_X6X_ORACLE = f"""{_X6X_CTES}
SELECT query_id, rnk, doc_id, chunk_id, start_tok, score_micro, n_hit_terms
FROM ranked
WHERE rnk <= {_X6X_TOPK}
ORDER BY query_id, rnk
"""


@register("x6x_chunk_bm25_retrieval", oracle=_X6X_ORACLE, tags=("X6", "X4"))
def x6x_chunk_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 CHUNKS per declared query under BM25 over the x6v chunk
    table (W=16, V=4): the RAG query path. Chunk = scoring unit (chunk
    count, chunk frequency, chunk length feed the shared x4u formula);
    broadcast-query inverted-index shape; exact (score, doc_id,
    chunk_id) tie law via integer micro-units. The whole pipeline IS
    the shared bm25_topk site, instantiated at chunk granularity —
    x4u's broadcast discipline (incl. the prune-df-before-broadcast
    law) cannot diverge between the retrieval paths."""
    from .textanalysis import _X4U_QUERIES, bm25_topk

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    chunks = overlapped_chunks(docs, _X6V_WINDOW, _X6V_OVERLAP).select(
        "doc_id", "chunk_id", "start_tok", "ctoks"
    )
    toks = chunks.select(
        "doc_id", "chunk_id", F.explode("ctoks").alias("term")
    )
    dl = chunks.select(
        "doc_id", "chunk_id", "start_tok",
        F.size("ctoks").cast("long").alias("dl_t"),
    )
    qdf = spark.createDataFrame(
        list(_X4U_QUERIES), "query_id long, term string"
    )
    return bm25_topk(
        toks, dl, ["doc_id", "chunk_id"], ["start_tok"], qdf, _X6X_TOPK
    )


# X6y — dedup survivorship manifest over the x2e2 closure ----------------------
#
# What a 100 TB dedup run actually SHIPS: not the cluster labels but the
# keep/drop manifest. x2e2's is_canonical keeps the MIN-ID doc of each
# transitive duplicate family — fine as a label anchor, wrong as a
# content policy (the arbitrary id ordering can keep a stub and drop
# the full document). x6y re-decides survivorship with a quality rule —
# keep the LONGEST doc (n_chars desc, doc_id tiebreak) — and reports,
# per doc, the cluster, the verdict, and the chars the cluster frees.
# The planted pytest pins a family where keep != is_canonical, proving
# the policy is a real decision, not a relabeling.
#
# Scale shape: the closure comes from x2e2 verbatim (large-star/small-
# star, no all-pairs — its pair stage is plan-gated at the shared
# site); the policy adds one doc_id-keyed join against the projected
# documents table and two windows over cluster-sized partitions
# (duplicate families are small by construction; the windows never see
# corpus-sized partitions).

from .dedup import _X2E2_CTES as _X2E2_CTES_REF  # noqa: E402

_X6Y_ORACLE = f"""{_X2E2_CTES_REF},
q AS (
  SELECT d.doc_id, d.n_chars, lab.cluster_id, sz.cluster_size
  FROM documents d
  JOIN lab ON d.doc_id = lab.id
  JOIN sz ON lab.cluster_id = sz.cluster_id
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
         ) AS rnk
  FROM q
)
SELECT CAST(doc_id AS BIGINT)       AS doc_id,
       CAST(cluster_id AS BIGINT)   AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(n_chars AS BIGINT)      AS n_chars,
       (rnk = 1)                    AS keep,
       CAST(sum(CASE WHEN rnk > 1 THEN n_chars ELSE 0 END)
            OVER (PARTITION BY cluster_id) AS BIGINT) AS freed_chars
FROM r
ORDER BY doc_id
"""


@register("x6y_dedup_survivorship", oracle=_X6Y_ORACLE, tags=("X6", "X2"))
def x6y_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop manifest over the x2e2 transitive duplicate families:
    one survivor per cluster by the keep-longest policy (n_chars desc,
    doc_id tiebreak), every other member dropped, and the per-cluster
    freed_chars a storage budget reads. Composes the registered x2e2
    operator verbatim for the closure, then adds one projected join
    and two cluster-partitioned windows."""
    from .dedup import x2e2_global_dedup_clusters

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    labels = x2e2_global_dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    q = labels.join(docs, "doc_id")
    w_rank = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    w_clu = W.partitionBy("cluster_id")
    r = q.withColumn("rnk", F.row_number().over(w_rank))
    return (
        r.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("rnk") == 1).alias("keep"),
            F.sum(F.when(F.col("rnk") > 1, F.col("n_chars")).otherwise(0))
            .over(w_clu)
            .cast("long")
            .alias("freed_chars"),
        )
        .orderBy("doc_id")
    )


# X6y2 — survivorship over the UNCAPPED closure (x2e2b) ------------------------
#
# x6y inherits x2e2's doc_id < 200 oracle cap by composition; x6y2 is
# the manifest over the WHOLE corpus — the artifact a 100 TB dedup run
# ships. Same keep-longest policy, composed over the registered x2e2b
# closure; the oracle appends the identical quality-policy CTEs to
# x2e2b's label-propagation chain and carries its closure_converged
# guard through (an unconverged oracle closure mismatches loudly
# instead of silently mislabeling survivors).

from .dedup import _X2E2B_CTES as _X2E2B_CTES_REF  # noqa: E402

_X6Y2_ORACLE = f"""{_X2E2B_CTES_REF},
q AS (
  SELECT d.doc_id, d.n_chars, llab.cluster_id, sz.cluster_size
  FROM documents d
  JOIN llab ON d.doc_id = llab.id
  JOIN sz ON llab.cluster_id = sz.cluster_id
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
         ) AS rnk
  FROM q
)
SELECT CAST(doc_id AS BIGINT)       AS doc_id,
       CAST(cluster_id AS BIGINT)   AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(n_chars AS BIGINT)      AS n_chars,
       (rnk = 1)                    AS keep,
       CAST(sum(CASE WHEN rnk > 1 THEN n_chars ELSE 0 END)
            OVER (PARTITION BY cluster_id) AS BIGINT) AS freed_chars,
       lconv.ok                     AS closure_converged
FROM r CROSS JOIN lconv
ORDER BY doc_id
"""


@register("x6y2_dedup_survivorship_full", oracle=_X6Y2_ORACLE, tags=("X6", "X2"))
def x6y2_dedup_survivorship_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The x6y keep/drop manifest over the UNCAPPED x2e2b closure: one
    survivor per full-corpus duplicate family by the keep-longest
    policy (n_chars desc, doc_id tiebreak) plus per-cluster
    freed_chars. Composes the registered x2e2b operator verbatim, so
    the closure (and its convergence posture) has one site."""
    from .dedup import x2e2b_global_dedup_clusters_full

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    labels = x2e2b_global_dedup_clusters_full(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size", "closure_converged"
    )
    q = labels.join(docs, "doc_id")
    w_rank = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    w_clu = W.partitionBy("cluster_id")
    r = q.withColumn("rnk", F.row_number().over(w_rank))
    return (
        r.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("rnk") == 1).alias("keep"),
            F.sum(F.when(F.col("rnk") > 1, F.col("n_chars")).otherwise(0))
            .over(w_clu)
            .cast("long")
            .alias("freed_chars"),
            "closure_converged",
        )
        .orderBy("doc_id")
    )


# X6y3 — incremental survivorship delta (who loses the crown on admission) -----
#
# x6y/x6y2 answer "who survives" for a FROZEN corpus; x2e3 answers "which
# clusters did the batch touch". x6y3 is their composition — the artifact
# an incremental curation run actually applies: for every batch-touched
# final cluster, the NEW keep-longest survivor, whether the batch
# supplied it, how many STANDING survivors sat in the cluster before
# admission, and how many of them are DETHRONED (were their standing
# family's keeper, are not the final keeper — a merge puts >= 2 old
# keepers in one room, so at least one always loses; a long batch doc
# can dethrone them all). freed_chars follows the x6y accounting over
# final members. Both survivor windows run over the SAME touched-member
# roster in both engines (a standing cluster's members always migrate
# together — its star edges survive into the final closure — so the
# within-roster window equals the global one by construction).
#
# Scale shape: x2e3's shape for the closures (the shared
# x2e3_touched_members site), then one doc_id-keyed join for n_chars and
# two family-sized windows — the x6y posture.

from .dedup import _X2E3_CTES as _X2E3_CTES_REF  # noqa: E402

_X6Y3_ORACLE = f"""{_X2E3_CTES_REF},
q AS (
  SELECT mem.id AS doc_id, mem.cluster_id, mem.is_batch, d.n_chars,
         mlab.cluster_id AS standing_label
  FROM mem
  JOIN touched USING (cluster_id)
  JOIN documents d ON d.doc_id = mem.id
  LEFT JOIN mlab ON mem.id = mlab.id
),
newk AS (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
         ) AS rnk
  FROM q
),
oldk AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
             PARTITION BY standing_label ORDER BY n_chars DESC, doc_id
           ) AS srnk
    FROM q WHERE standing_label IS NOT NULL
  ) WHERE srnk = 1
),
agg AS (
  SELECT n.cluster_id,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(CASE WHEN n.is_batch THEN 1 ELSE 0 END) AS BIGINT)
           AS n_batch_docs,
         CAST(min(CASE WHEN n.rnk = 1 THEN n.doc_id END) AS BIGINT)
           AS keep_doc_id,
         (max(CASE WHEN n.rnk = 1 AND n.is_batch THEN 1 ELSE 0 END) = 1)
           AS keep_is_batch,
         CAST(max(CASE WHEN n.rnk = 1 THEN n.n_chars END) AS BIGINT)
           AS keep_n_chars,
         CAST(sum(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_old_survivors,
         CAST(sum(CASE WHEN o.doc_id IS NOT NULL AND n.rnk > 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_dethroned,
         CAST(sum(CASE WHEN n.rnk > 1 THEN n.n_chars ELSE 0 END)
              AS BIGINT) AS freed_chars
  FROM newk n LEFT JOIN oldk o ON n.doc_id = o.doc_id
  GROUP BY n.cluster_id
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       n_members, n_batch_docs, keep_doc_id, keep_is_batch, keep_n_chars,
       n_old_survivors, n_dethroned, freed_chars,
       (lconv.ok AND mconv.ok) AS closure_converged
FROM agg CROSS JOIN lconv CROSS JOIN mconv
ORDER BY cluster_id
"""


@register("x6y3_incremental_survivorship", oracle=_X6Y3_ORACLE,
          tags=("X6", "X2", "X1"))
def x6y3_incremental_survivorship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survivorship delta for a batch admission: per batch-touched
    final cluster (x2e3's shared membership site), the new keep-longest
    survivor, whether the batch supplied it, the count of standing
    survivors present, and how many were DETHRONED by the admission —
    plus the x6y freed_chars accounting. The oracle recomputes both
    closures from scratch and runs the identical two survivor
    windows."""
    from .dedup import x2e3_touched_members

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("id"), "n_chars"
    )
    # Lazy checkpoint (r18, guide §3.3): q feeds BOTH survivor windows
    # (newk and oldk), and each un-truncated reference replays the
    # touched-members derivation (the membership joins over both
    # closures' label tables). One narrow row per touched member.
    q = (
        x2e3_touched_members(spark, sf_dir)
        .join(docs, "id")
        .localCheckpoint(eager=False)
    )
    w_new = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "id"
    )
    newk = q.withColumn("rnk", F.row_number().over(w_new))
    w_old = W.partitionBy("standing_label").orderBy(
        F.col("n_chars").desc(), "id"
    )
    oldk = (
        q.filter(F.col("standing_label").isNotNull())
        .withColumn("srnk", F.row_number().over(w_old))
        .filter(F.col("srnk") == 1)
        .select(F.col("id").alias("old_keep_id"))
        .withColumn("is_old_survivor", F.lit(1))
    )
    j = newk.join(
        oldk, newk["id"] == oldk["old_keep_id"], "left"
    )
    agg = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.col("is_batch").cast("int")).cast("long").alias("n_batch_docs"),
        F.min(F.when(F.col("rnk") == 1, F.col("id")))
        .cast("long")
        .alias("keep_doc_id"),
        (
            F.max(
                F.when(
                    (F.col("rnk") == 1) & F.col("is_batch"), 1
                ).otherwise(0)
            )
            == 1
        ).alias("keep_is_batch"),
        F.max(F.when(F.col("rnk") == 1, F.col("n_chars")))
        .cast("long")
        .alias("keep_n_chars"),
        F.sum(F.when(F.col("is_old_survivor").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_old_survivors"),
        F.sum(
            F.when(
                F.col("is_old_survivor").isNotNull() & (F.col("rnk") > 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_dethroned"),
        F.sum(F.when(F.col("rnk") > 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("freed_chars"),
    )
    return (
        agg.select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "n_members", "n_batch_docs", "keep_doc_id", "keep_is_batch",
            "keep_n_chars", "n_old_survivors", "n_dethroned", "freed_chars",
            F.lit(True).alias("closure_converged"),
        )
        .orderBy("cluster_id")
    )


# X6z — epoch-capped token-budget waterfilling ---------------------------------
#
# The mixture step x6e/x6n deliberately stop short of: when a declared
# target mixture asks a small source for more tokens than it can give
# (every public LLM data recipe caps upsampling at a few epochs), the
# shortfall must REDISTRIBUTE to the unsaturated sources in proportion
# to their weights — and saturation CASCADES (the redistribution can
# push the next-smallest source over ITS cap). The exact solution is
# waterfilling: sort sources by cap/weight, saturate the prefix, and
# the first source k+1 with R_k * w_{k+1} <= cap_{k+1} * W_rem_k stays
# unsaturated, where R_k is the budget left after the k saturated caps
# and W_rem_k the unsaturated weight mass. Every comparison and
# allocation is BIGINT cross-multiplication / floor division — no float
# touches the decision — so the oracle match is bitwise; the sort key
# alone is a double ratio (monotone, tie-broken by source, identical
# IEEE division in both engines).
#
# The declared weights (64/16/4/1) are skewed so the FIXTURE itself
# exercises a 3-deep cascade: src0 and src1 saturate immediately and
# the redistribution then pushes src2 over its cap — the planted pytest
# pins the same cascade on hand arithmetic.
#
# Scale shape: one map-combined hash-agg collapses the corpus to a
# sources-sized table; everything after (windows, the argmin row, the
# joins) runs over ~dozens of rows — the x6e global-window convention.

_X6Z_MAX_EPOCHS = 4          # never upsample a source past 4 epochs
_X6Z_BUDGET_X = 2            # training budget = 2x the corpus tokens
_X6Z_SCALE = 1_000_000

# single-site declared mixture weights, shared verbatim by both engines
_X6Z_WEIGHT_CASE = (
    "CASE WHEN source = 'src0' THEN 64 WHEN source = 'src1' THEN 16"
    " WHEN source = 'src2' THEN 4 ELSE 1 END"
)

def _x6z_chain_sql(
    budget_x: int,
    docs_src: str = "documents",
    extra_col: str = "",
    extra_from: str = "",
) -> str:
    """THE waterfill oracle chain (per -> tot -> sorted prefix ->
    threshold -> alloc), parameterized on the document roster so x6z
    (raw corpus) and x6z2 (x6y2 survivors) run the identical cascade;
    extra_col/extra_from let a caller carry a guard column through the
    final select. Emitted WITHOUT the WITH keyword so callers can
    prepend their own CTEs."""
    return f"""per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST({_X6Z_WEIGHT_CASE} AS BIGINT) AS weight
  FROM {docs_src} GROUP BY source
),
tot AS (
  SELECT CAST({budget_x} * sum(n_tokens) AS BIGINT) AS budget,
         CAST(sum(weight) AS BIGINT) AS total_w
  FROM per
),
r AS (
  SELECT per.*, CAST({_X6Z_MAX_EPOCHS} * n_tokens AS BIGINT) AS cap_tokens,
         tot.budget, tot.total_w,
         row_number() OVER (
           ORDER BY CAST({_X6Z_MAX_EPOCHS} * n_tokens AS DOUBLE) / weight,
                    source
         ) AS rn
  FROM per CROSS JOIN tot
),
c AS (
  SELECT *, sum(cap_tokens) OVER (ORDER BY rn) AS cum_cap,
            sum(weight)     OVER (ORDER BY rn) AS cum_w
  FROM r
),
u AS (
  SELECT *, (budget - (cum_cap - cap_tokens)) AS r_prev,
            (total_w - (cum_w - weight))      AS w_prev,
            ((budget - (cum_cap - cap_tokens)) * weight
              <= cap_tokens * (total_w - (cum_w - weight))) AS unsat
  FROM c
),
star AS (
  SELECT u.r_prev AS r_star, u.w_prev AS w_star, u.rn AS j_star
  FROM u JOIN (SELECT min(rn) AS j FROM u WHERE unsat) m ON u.rn = m.j
),
alloc AS (
  SELECT u.source, u.n_docs, u.n_tokens, u.weight, u.cap_tokens,
         (s.j_star IS NULL OR u.rn < s.j_star) AS saturated,
         CAST(CASE WHEN s.j_star IS NULL OR u.rn < s.j_star
              THEN u.cap_tokens
              ELSE (u.weight * s.r_star) // s.w_star END AS BIGINT)
           AS alloc_tokens,
         (s.j_star IS NOT NULL) AS budget_feasible
  FROM u LEFT JOIN star s ON true
)
SELECT source, n_docs, n_tokens, weight, cap_tokens, saturated,
       alloc_tokens,
       CAST(({_X6Z_SCALE} * alloc_tokens) // n_tokens AS BIGINT)
         AS epochs_micro,
       budget_feasible{extra_col}
FROM alloc{extra_from}
ORDER BY source
"""


def _x6z_oracle(budget_x: int) -> str:
    """The x6z oracle as a builder keyed on the budget multiplier, so
    the budget==caps boundary law-sync pytest can run the SAME oracle
    branch algebra at the boundary multiplier instead of monkeypatching
    a baked string."""
    return "\nWITH " + _x6z_chain_sql(budget_x)


_X6Z_ORACLE = _x6z_oracle(_X6Z_BUDGET_X)


def _x6z_per_table(docs: DataFrame) -> DataFrame:
    """The per-source (n_docs, n_tokens, weight) table the waterfill
    chain consumes — one site so x6z (raw corpus) and x6z2 (x6y2
    survivors only) count tokens by the same law."""
    return (
        docs.select("source", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            "source", "n_docs", "n_tokens",
            F.expr(_X6Z_WEIGHT_CASE).cast("long").alias("weight"),
        )
    )


def _waterfill_alloc(per: DataFrame, budget_x: int) -> DataFrame:
    """THE waterfill chain (sorted-prefix threshold, BIGINT
    cross-multiplications, floor-division allocations), factored so
    x6z and x6z2 run the identical cascade over different per-source
    rosters. Returns the standard 9-column allocation, unordered."""
    tot = per.agg(
        (F.lit(budget_x) * F.sum("n_tokens")).cast("long").alias("budget"),
        F.sum("weight").cast("long").alias("total_w"),
    )
    # sources-sized table from here on: the global windows are the x6e
    # single-task-over-dozens-of-rows convention, safe by construction
    w_rn = W.orderBy(
        (F.col("cap_tokens").cast("double") / F.col("weight")), "source"
    )
    r = (
        per.withColumn(
            "cap_tokens", (F.lit(_X6Z_MAX_EPOCHS) * F.col("n_tokens")).cast("long")
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(w_rn))
    )
    w_cum = W.orderBy("rn")
    c = r.withColumn("cum_cap", F.sum("cap_tokens").over(w_cum)).withColumn(
        "cum_w", F.sum("weight").over(w_cum)
    )
    u = c.select(
        "*",
        (F.col("budget") - (F.col("cum_cap") - F.col("cap_tokens"))).alias("r_prev"),
        (F.col("total_w") - (F.col("cum_w") - F.col("weight"))).alias("w_prev"),
    ).withColumn(
        "unsat",
        (F.col("r_prev") * F.col("weight"))
        <= (F.col("cap_tokens") * F.col("w_prev")),
    )
    j = u.filter("unsat").agg(F.min("rn").alias("j_star"))
    star = (
        u.join(F.broadcast(j), F.col("rn") == F.col("j_star"))
        .select(
            F.col("r_prev").alias("r_star"),
            F.col("w_prev").alias("w_star"),
            "j_star",
        )
    )
    sat = F.col("j_star").isNull() | (F.col("rn") < F.col("j_star"))
    out = u.join(F.broadcast(star), F.lit(True), "left").select(
        "source", "n_docs", "n_tokens", "weight", "cap_tokens",
        sat.alias("saturated"),
        F.when(sat, F.col("cap_tokens"))
        .otherwise(F.expr("(weight * r_star) div w_star"))
        .cast("long")
        .alias("alloc_tokens"),
        F.col("j_star").isNotNull().alias("budget_feasible"),
    )
    return out.select(
        "source", "n_docs", "n_tokens", "weight", "cap_tokens", "saturated",
        "alloc_tokens",
        F.expr(f"({_X6Z_SCALE} * alloc_tokens) div n_tokens")
        .cast("long")
        .alias("epochs_micro"),
        "budget_feasible",
    )


@register("x6z_token_budget_waterfill", oracle=_X6Z_ORACLE, tags=("X6",))
def x6z_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped mixture allocation by exact waterfilling: each
    source gets min(cap, weight-share) of the token budget, saturated
    caps redistribute to the unsaturated weight mass, and the cascade
    resolves by the sorted-prefix threshold rule. All decisions are
    BIGINT cross-multiplications; alloc and the realized epochs_micro
    are floor divisions — bitwise-identical in both engines."""
    docs = Catalog(spark, sf_dir).documents
    return _waterfill_alloc(
        _x6z_per_table(docs), _X6Z_BUDGET_X
    ).orderBy("source")


# X6z2 — dedup-aware waterfilling (the budget math after survivorship) ---------
#
# x6z allocates against RAW per-source token mass; after a dedup run
# that is the wrong denominator — a source whose mass is mostly
# duplicates gets an inflated cap (cap = 4 epochs x its tokens) and the
# cascade misallocates budget that the surviving corpus cannot absorb at
# the declared epoch ceiling. x6z2 runs the IDENTICAL waterfill cascade
# (shared _waterfill_alloc / _x6z_chain_sql sites — the x6j precedent of
# recomputing mixture math against the deduped corpus) over only the
# x6y2 SURVIVORS, so caps, the budget (2x the surviving tokens) and the
# realized epochs all reflect what training would actually see. The
# survivor roster is the registered x6y2 keep law verbatim; x2e2b's
# convergence guard carries through.

_X6Z2_CHAIN = _x6z_chain_sql(
    _X6Z_BUDGET_X,
    docs_src="(SELECT d.* FROM documents d JOIN surv ON d.doc_id = surv.doc_id)",
    extra_col=",\n       lconv.ok AS closure_converged",
    extra_from=" CROSS JOIN lconv",
)

_X6Z2_ORACLE = f"""{_X2E2B_CTES_REF},
surv AS (
  SELECT doc_id FROM (
    SELECT d.doc_id, row_number() OVER (
             PARTITION BY llab.cluster_id ORDER BY d.n_chars DESC, d.doc_id
           ) AS rnk
    FROM documents d JOIN llab ON d.doc_id = llab.id
  ) WHERE rnk = 1
),
{_X6Z2_CHAIN}"""


@register("x6z2_dedup_aware_waterfill", oracle=_X6Z2_ORACLE,
          tags=("X6", "X2"))
def x6z2_dedup_aware_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The x6z waterfill cascade re-run against the DEDUPED corpus:
    per-source tokens, caps and the 2x budget all count only x6y2's
    keep-longest survivors, so a duplicate-heavy source no longer
    claims budget for mass that dedup removed. Composes the registered
    x6y2 manifest for the roster and the shared waterfill sites for the
    cascade — neither law can diverge from its sibling."""
    surv_ids = (
        x6y2_dedup_survivorship_full(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    docs = Catalog(spark, sf_dir).documents.join(surv_ids, "doc_id", "semi")
    return (
        _waterfill_alloc(_x6z_per_table(docs), _X6Z_BUDGET_X)
        .select("*", F.lit(True).alias("closure_converged"))
        .orderBy("source")
    )


# X4z2 — chunk-level MMR re-rank (dedup-at-serving over the RAG chunks) --------
#
# The x4z law at the granularity RAG actually serves: x6v's overlapped
# chunks GUARANTEE redundancy in x6x's top-k (a term in the 4-token
# overlap span surfaces BOTH adjacent chunks — the pytest-pinned x6x
# property), and stuffing both into a context window wastes a slot on
# ~75%-duplicate text. x4z2 re-ranks x6x's chunk top-10 by greedy MMR:
# the same declared lambda, the same rank-based relevance law, token-set
# Jaccard between CHUNK token sets as redundancy, and THE shared fold —
# mmr_greedy_outputs / _X4Z_MERGE — so the branch algebra is one site
# across granularities. Chunk identity rides the fold as unit =
# doc_id * 1e6 + chunk_id (chunk ids are stride-bounded, orders of
# magnitude below 1e6), whose integer order IS the (doc_id, chunk_id)
# lexicographic tie law.
#
# Scale shape: x6x's shape for retrieval; everything after is
# k-per-query sized (candidate-chunk postings equi-join for the k^2
# sims, a k-element JVM fold per query). No corpus pairs, no driver.

from .textanalysis import (  # noqa: E402
    _X4V_RRF_K as _X4Z2_RRF_K,
    _X4Z_MERGE as _X4Z2_MERGE,
    mmr_greedy_outputs,
)

_X4Z2_UNIT = 1_000_000


def _x4z2_unit_col():
    """Composite chunk identity doc_id*_X4Z2_UNIT+chunk_id as the
    BIGINT `unit` column, with a loud runtime guard (r16, closing an
    r15 advisory; mirrors the x3y ragged-dimension posture): a
    chunk_id >= _X4Z2_UNIT (~12M tokens at stride 12) would silently
    alias two different chunks into one unit and corrupt the MMR
    picks/decoding, so such a row raises instead of mis-folding. The
    guard is a per-row CASE — conforming data pays one comparison and
    the oracle needs no twin (it is an engine-input guard, not a
    value law)."""
    return (
        F.when(
            F.col("chunk_id") < F.lit(_X4Z2_UNIT),
            F.col("doc_id") * _X4Z2_UNIT + F.col("chunk_id"),
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    "x4z2: chunk_id %s >= "
                    + str(_X4Z2_UNIT)
                    + " would alias two chunks into one composite unit",
                    F.col("chunk_id"),
                )
            ).cast("long")
        )
        .cast("long")
        .alias("unit")
    )


_X4Z2_ORACLE = f"""{_X6X_CTES},
cand AS (
  SELECT query_id, CAST(rnk AS BIGINT) AS pa,
         doc_id, chunk_id,
         doc_id * {_X4Z2_UNIT} + chunk_id AS unit,
         CAST(1000000 // ({_X4Z2_RRF_K} + rnk) AS BIGINT) AS rel
  FROM ranked WHERE rnk <= {_X6X_TOPK}
),
ctoksd AS (
  SELECT c.doc_id, c.chunk_id, unnest(list_distinct(c.ctoks)) AS tok
  FROM chunks c
  JOIN (SELECT DISTINCT doc_id, chunk_id FROM cand) cd
    ON c.doc_id = cd.doc_id AND c.chunk_id = cd.chunk_id
),
csizes AS (
  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n
  FROM ctoksd GROUP BY doc_id, chunk_id
),
cinter AS (
  SELECT a.query_id, a.pa AS pa, b.pa AS pb,
         CAST(count(*) AS BIGINT) AS n_common
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.pa < b.pa
  JOIN ctoksd ta ON ta.doc_id = a.doc_id AND ta.chunk_id = a.chunk_id
  JOIN ctoksd tb ON tb.doc_id = b.doc_id AND tb.chunk_id = b.chunk_id
               AND ta.tok = tb.tok
  GROUP BY 1, 2, 3
),
cjac AS (
  SELECT i.query_id, i.pa, i.pb,
         (1000000 * i.n_common) // (sa.n + sb.n - i.n_common) AS sim
  FROM cinter i
  JOIN cand ca ON ca.query_id = i.query_id AND ca.pa = i.pa
  JOIN cand cb ON cb.query_id = i.query_id AND cb.pa = i.pb
  JOIN csizes sa ON sa.doc_id = ca.doc_id AND sa.chunk_id = ca.chunk_id
  JOIN csizes sb ON sb.doc_id = cb.doc_id AND sb.chunk_id = cb.chunk_id
),
cgrid AS (
  SELECT a.query_id, a.pa, b.pa AS pb,
         CASE WHEN a.pa = b.pa THEN 0
              ELSE coalesce(j.sim, 0) END AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id
  LEFT JOIN cjac j ON j.query_id = a.query_id
                  AND j.pa = least(a.pa, b.pa)
                  AND j.pb = greatest(a.pa, b.pa)
),
csimlist AS (
  SELECT query_id, pa, list(sim ORDER BY pb) AS sims
  FROM cgrid GROUP BY query_id, pa
),
crows AS (
  SELECT c.query_id,
         list_concat([c.pa, c.unit, c.rel], s.sims) AS r
  FROM cand c JOIN csimlist s ON c.query_id = s.query_id AND c.pa = s.pa
),
clst AS (
  SELECT query_id,
         list_concat(
           [list_concat([CAST([] AS BIGINT[])], list(r ORDER BY r[1]))],
           list([r] ORDER BY r[1])) AS l
  FROM crows GROUP BY query_id
),
cfolded AS (
  SELECT query_id, list_reduce(l, (acc, x) -> {_X4Z2_MERGE}) AS st FROM clst
),
couts AS (
  SELECT query_id, unnest(st) AS u FROM cfolded
)
SELECT query_id,
       CAST(-u[1] AS INT)           AS mmr_rank,
       u[2] // {_X4Z2_UNIT}         AS doc_id,
       u[2] % {_X4Z2_UNIT}          AS chunk_id,
       CAST(u[3] AS INT)            AS bm25_rnk,
       u[4]                         AS rel_micro,
       u[5]                         AS max_sim_micro,
       u[6]                         AS mmr_micro
FROM couts WHERE u[1] < 0
ORDER BY query_id, mmr_rank
"""


@register("x4z2_chunk_mmr_rerank", oracle=_X4Z2_ORACLE, tags=("X4", "X6"))
def x4z2_chunk_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR re-rank of x6x's chunk-level BM25 top-10 — the
    serving-time dedup step where redundancy is STRUCTURAL (adjacent
    overlapped chunks share the 4-token span that surfaced them both).
    Same declared lambda, rank-relevance and Jaccard-micro laws as
    x4z, THE shared fold site, chunk identity as the integer unit
    doc_id*1e6+chunk_id whose order is the (doc_id, chunk_id) tie
    law."""
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    ranked = x6x_chunk_bm25_retrieval(spark, sf_dir)
    # six consumers below each replayed the whole chunk-BM25 retrieval
    # chain without this persist (r18, guide §3.3) — Q x top-10 rows
    cand = persist_scoped(
        ranked.filter(F.col("rnk") <= _X6X_TOPK).select(
            "query_id",
            F.col("rnk").cast("long").alias("pa"),
            "doc_id", "chunk_id",
            _x4z2_unit_col(),
            F.expr(
                f"CAST(1000000 div ({_X4Z2_RRF_K} + rnk) AS BIGINT)"
            ).alias("rel"),
        )
    )
    chunks = overlapped_chunks(docs, _X6V_WINDOW, _X6V_OVERLAP).select(
        "doc_id", "chunk_id", "ctoks"
    )
    # three consumers (both intersection sides, sizes): persist, or the
    # corpus-wide overlapped-chunk build runs once per consumer
    ctoksd = persist_scoped(
        chunks.join(
            cand.select("doc_id", "chunk_id").distinct(),
            ["doc_id", "chunk_id"],
            "semi",
        )
        .select(
            "doc_id", "chunk_id",
            F.explode(F.array_distinct("ctoks")).alias("tok"),
        )
    )
    csizes = ctoksd.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = cand.alias("a"), cand.alias("b")
    ta, tb = ctoksd.alias("ta"), ctoksd.alias("tb")
    cinter = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.pa") < F.col("b.pa")),
        )
        .join(
            ta,
            (F.col("ta.doc_id") == F.col("a.doc_id"))
            & (F.col("ta.chunk_id") == F.col("a.chunk_id")),
        )
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("b.doc_id"))
            & (F.col("tb.chunk_id") == F.col("b.chunk_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy(
            F.col("a.query_id").alias("query_id"),
            F.col("a.pa").alias("pa"),
            F.col("b.pa").alias("pb"),
            F.col("a.doc_id").alias("da"),
            F.col("a.chunk_id").alias("ca"),
            F.col("b.doc_id").alias("db"),
            F.col("b.chunk_id").alias("cb"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cjac = (
        cinter.join(
            csizes.select(
                F.col("doc_id").alias("da"), F.col("chunk_id").alias("ca"),
                F.col("n").alias("na"),
            ),
            ["da", "ca"],
        )
        .join(
            csizes.select(
                F.col("doc_id").alias("db"), F.col("chunk_id").alias("cb"),
                F.col("n").alias("nb"),
            ),
            ["db", "cb"],
        )
        .select(
            "query_id", "pa", "pb",
            F.expr(
                "CAST((1000000 * n_common) div (na + nb - n_common)"
                " AS BIGINT)"
            ).alias("sim"),
        )
    )
    ga, gb = cand.alias("ga"), cand.alias("gb")
    cgrid = (
        ga.join(gb, F.col("ga.query_id") == F.col("gb.query_id"))
        .select(
            F.col("ga.query_id").alias("query_id"),
            F.col("ga.pa").alias("pa"),
            F.col("gb.pa").alias("pb"),
        )
        .join(
            cjac.select(
                F.col("query_id").alias("jq"),
                F.col("pa").alias("jpa"),
                F.col("pb").alias("jpb"),
                "sim",
            ),
            (F.col("jq") == F.col("query_id"))
            & (F.col("jpa") == F.least("pa", "pb"))
            & (F.col("jpb") == F.greatest("pa", "pb")),
            "left",
        )
        .select(
            "query_id", "pa", "pb",
            F.when(F.col("pa") == F.col("pb"), F.lit(0).cast("long"))
            .otherwise(F.coalesce(F.col("sim"), F.lit(0).cast("long")))
            .alias("sim"),
        )
    )
    csimlist = cgrid.groupBy("query_id", "pa").agg(
        F.transform(
            F.sort_array(F.collect_list(F.array("pb", "sim"))),
            lambda x: F.element_at(x, 2),
        ).alias("sims")
    )
    crows = cand.join(csimlist, ["query_id", "pa"]).select(
        "query_id",
        F.concat(F.array("pa", "unit", "rel"), F.col("sims")).alias("r"),
    )
    clst = crows.groupBy("query_id").agg(
        F.sort_array(F.collect_list("r")).alias("rows")
    )
    outs = mmr_greedy_outputs(clst)
    return (
        outs.select(
            "query_id",
            (-F.element_at("u", 1)).cast("int").alias("mmr_rank"),
            F.expr(f"element_at(u, 2) div {_X4Z2_UNIT}").alias("doc_id"),
            (F.element_at("u", 2) % _X4Z2_UNIT).alias("chunk_id"),
            F.element_at("u", 3).cast("int").alias("bm25_rnk"),
            F.element_at("u", 4).alias("rel_micro"),
            F.element_at("u", 5).alias("max_sim_micro"),
            F.element_at("u", 6).alias("mmr_micro"),
        )
        .orderBy("query_id", "mmr_rank")
    )


# E3 — the end-to-end curation pipeline as ONE registered query ----------------
#
# The reference's own E->T->L framing (reference README.md:20-23) at
# corpus scale: every stage a curation run performs — exact dedup (x1),
# near-dup closure survivorship over the UNCAPPED corpus (x6y2), the
# quality ensemble (x4t), benchmark decontamination (x6d), temperature
# mixture sampling (x6n), and best-fit-decreasing packing (x6b2) —
# composed into ONE DataFrame plan that emits the per-source pack
# manifest with per-stage attrition counts. Each stage is oracle-proven
# alone; this entry is the test that their COLUMN CONTRACTS actually
# compose (composition drift is the remaining untested failure mode the
# r15 verdict named).
#
# Composition law (the x6i waterfall, extended): stage verdicts are
# computed CORPUS-WIDE by the registered operators and composed as a
# cascading intersection — n_exact >= n_closure >= n_quality >= n_clean
# per source by construction. The universe is the train-candidate set
# (doc_id % 50 <> 0, x6d's benchmark convention). The two stages whose
# semantics DEPEND on the surviving set — mixture rates (x6n derives
# rates from the survivor token mass, not the raw corpus) and packing
# (x6b2 folds exactly the sampled docs) — re-use the registered algebra
# through the r16 builder splits (_x6n_chain_sql, _x6b2_fold_ctes, both
# proven byte-identical to the registered strings) and the shared
# Spark halves (x6n_rates / x6n_accept_filter / x6b2_pack).
#
# Scale shape: every stage keeps its registered posture (closure =
# large-star/small-star, never all-pairs; decontamination = broadcast
# benchmark; rates = sources-sized aggregate; packing = per-source
# fold). The composition adds only uniform doc_id equi-joins and one
# sources-sized final aggregate — no new shuffle class appears.

from .dedup import _X1_ORACLE as _E3_X1_ORACLE  # noqa: E402

_E3_SURV_SQL = (
    "SELECT doc_id, source, n_tok FROM staged "
    "WHERE is_unique AND closure_keep AND quality_keep AND NOT contaminated"
)

_E3_ORACLE = f"""
WITH dedup AS ({_E3_X1_ORACLE}),
y AS ({_X6Y2_ORACLE}),
t4 AS ({_X4T_ORACLE}),
con AS ({_X6D_ORACLE}),
staged AS (
  SELECT u.doc_id, u.source, u.n_tok,
         (u.doc_id = dedup.keep_doc_id)   AS is_unique,
         y.keep                           AS closure_keep,
         t4.keep                          AS quality_keep,
         (con.train_doc_id IS NOT NULL)   AS contaminated
  FROM (
    SELECT doc_id, source, md5(text) AS fingerprint,
           len(string_split(text, ' ')) AS n_tok
    FROM documents WHERE doc_id % 50 <> 0
  ) u
  JOIN dedup ON u.fingerprint = dedup.fingerprint
  JOIN y  ON u.doc_id = y.doc_id
  JOIN t4 ON u.doc_id = t4.doc_id
  LEFT JOIN con ON u.doc_id = con.train_doc_id
),
{_x6n_chain_sql(_E3_SURV_SQL)},
samp AS (
  SELECT d.doc_id, d.source, d.n_tok
  FROM d JOIN rates USING (source)
  WHERE {_X6N_ACCEPT_SQL}
),
{_x6b2_fold_ctes(
    "SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tokens FROM samp")},
pk AS (
  SELECT source,
         CAST(len(st[1]) AS BIGINT)                 AS n_bins,
         CAST(list_aggregate(st[1], 'sum') AS BIGINT) AS packed_tokens
  FROM folded
),
base AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (WHERE is_unique) AS BIGINT) AS n_exact,
         CAST(count(*) FILTER (WHERE is_unique AND closure_keep) AS BIGINT)
           AS n_closure,
         CAST(count(*) FILTER (WHERE is_unique AND closure_keep
                                 AND quality_keep) AS BIGINT) AS n_quality,
         CAST(count(*) FILTER (WHERE is_unique AND closure_keep
                                 AND quality_keep AND NOT contaminated)
              AS BIGINT) AS n_clean
  FROM staged GROUP BY source
)
SELECT base.source, base.n_docs AS n_docs, n_exact, n_closure, n_quality,
       n_clean,
       rates.rate AS rate,
       CAST(coalesce(acc.n_accepted, 0) AS BIGINT)      AS n_sampled,
       CAST(coalesce(acc.tokens_accepted, 0) AS BIGINT) AS sampled_tokens,
       CAST(coalesce(pk.n_bins, 0) AS BIGINT)           AS n_bins,
       CAST(coalesce(pk.packed_tokens, 0) AS BIGINT)    AS packed_tokens
FROM base
LEFT JOIN rates ON base.source = rates.source
LEFT JOIN acc   ON base.source = acc.source
LEFT JOIN pk    ON base.source = pk.source
ORDER BY base.source
"""


@register(
    "e3_curation_pipeline", oracle=_E3_ORACLE, tags=("X6", "X2", "X4", "X1")
)
def e3_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation run as one plan: per source, the train-
    candidate count and its attrition through exact dedup -> closure
    survivorship (x6y2) -> quality ensemble (x4t) -> decontamination
    (x6d), then the survivor-derived x6n mixture rate with its sampled
    yield, and the x6b2 BFD pack of the sampled set (bins + packed
    tokens). Every stage composes the registered operator or its
    factored half; the oracle chains the registered SQL under the
    byte-identity builder law."""
    from .dedup import x1_exact_dedup

    docs = Catalog(spark, sf_dir).documents
    uni = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source",
        F.md5("text").alias("fingerprint"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    dd = x1_exact_dedup(spark, sf_dir).select("fingerprint", "keep_doc_id")
    y = x6y2_dedup_survivorship_full(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("closure_keep")
    )
    t4 = x4t_quality_ensemble(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("quality_keep")
    )
    con = x6d_decontamination(spark, sf_dir).select(
        F.col("train_doc_id").alias("doc_id"), F.lit(True).alias("flagged")
    )
    staged = (
        uni.join(dd, "fingerprint")
        .join(y, "doc_id")
        .join(t4, "doc_id")
        .join(con, "doc_id", "left")
        .select(
            "doc_id", "source", "n_tok",
            (F.col("doc_id") == F.col("keep_doc_id")).alias("is_unique"),
            "closure_keep", "quality_keep",
            F.coalesce(F.col("flagged"), F.lit(False)).alias("contaminated"),
        )
        # lazy checkpoint (r18, guide §3.3/§7.3): staged feeds BOTH the
        # survivor pipeline and the per-source attrition aggregate, and
        # each un-truncated reference replays the full x4t quality
        # ensemble and x6d decontamination subtrees (e3's printed plan
        # reached 306 parquet scans / 193 exchanges). One narrow row
        # per doc (id, source, n_tok, 4 bools) — cheap to materialize.
        .localCheckpoint(eager=False)
    )
    clean = (
        F.col("is_unique") & F.col("closure_keep")
        & F.col("quality_keep") & ~F.col("contaminated")
    )
    surv = staged.filter(clean).select("doc_id", "source", "n_tok")
    rates = x6n_rates(surv)
    samp = (
        surv.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(x6n_accept_filter())
        .select("doc_id", "source", "n_tok")
        # referenced by both the BFD pack and the sampled-yield stats
        .localCheckpoint(eager=False)
    )
    packed = x6b2_pack(
        samp.select(
            "doc_id", "source", F.col("n_tok").cast("long").alias("n_tokens")
        )
    )
    pk = packed.groupBy("source").agg(
        F.countDistinct("bin_id").cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("packed_tokens"),
    )
    sampstats = samp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("n_tok").cast("long").alias("sampled_tokens"),
    )

    def cnt(cond) -> Column:
        return F.count(F.when(cond, 1))

    base = staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        cnt(F.col("is_unique")).cast("long").alias("n_exact"),
        cnt(F.col("is_unique") & F.col("closure_keep"))
        .cast("long")
        .alias("n_closure"),
        cnt(
            F.col("is_unique") & F.col("closure_keep") & F.col("quality_keep")
        )
        .cast("long")
        .alias("n_quality"),
        cnt(clean).cast("long").alias("n_clean"),
    )
    return (
        base.join(rates.select("source", "rate"), "source", "left")
        .join(sampstats, "source", "left")
        .join(pk, "source", "left")
        .select(
            "source", "n_docs", "n_exact", "n_closure", "n_quality",
            "n_clean", "rate",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
            F.coalesce("n_bins", F.lit(0)).cast("long").alias("n_bins"),
            F.coalesce("packed_tokens", F.lit(0))
            .cast("long")
            .alias("packed_tokens"),
        )
        .orderBy("source")
    )


# X6y4 — survivor re-election after closure retraction -------------------------
#
# The manifest half of x2e4 (the r15 verdict's task 3 named it: "x6y2's
# manifest gets the matching survivor re-election"): when a takedown
# tombstones docs out of the standing closure, every NEW post-delete
# cluster needs a survivor re-elected under the same keep-longest
# (n_chars desc, doc_id asc) law x6y/x6y2/x6y3 pin — and the ledger
# wants to know whether the OLD survivor was itself tombstoned
# (old_survivor_lost) or merely dethroned by the split (keep_is_old
# false). Composes the shared x2e4_retraction_members site (both
# closures computed once per engine) plus one n_chars join and two
# windows; the oracle extends the shared _X2E4_CTES chain with the
# identical window algebra and carries both convergence guards.
#
# Scale shape: x2e4's touched-components slice bounds everything —
# the n_chars join is doc_id-keyed on touched members only, and both
# windows partition by (standing|new) cluster ids whose groups are
# duplicate families, tiny by construction.

from .dedup import _X2E4_CTES as _X2E4_CTES_REF  # noqa: E402
from .dedup import _X2E4_TOMB as _X2E4_TOMB_REF  # noqa: E402

_X6Y4_ORACLE = f"""{_X2E4_CTES_REF},
ym AS (
  SELECT mem.id, mem.cluster_id AS standing_cluster, mem.is_tomb,
         dlab.cluster_id AS new_label, d.n_chars
  FROM mem
  LEFT JOIN dlab ON mem.id = dlab.id
  JOIN documents d ON mem.id = d.doc_id
),
oldk AS (
  SELECT standing_cluster, id AS old_keep_id, is_tomb AS old_survivor_lost
  FROM (
    SELECT standing_cluster, id, is_tomb,
           row_number() OVER (PARTITION BY standing_cluster
                              ORDER BY n_chars DESC, id) AS rnk
    FROM ym
  ) WHERE rnk = 1
),
newr AS (
  SELECT ym.*, row_number() OVER (PARTITION BY new_label
                                  ORDER BY n_chars DESC, id) AS rnk
  FROM ym WHERE new_label IS NOT NULL
),
agg AS (
  SELECT new_label, min(standing_cluster) AS standing_cluster,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(min(CASE WHEN rnk = 1 THEN id END) AS BIGINT) AS keep_doc_id,
         CAST(max(CASE WHEN rnk = 1 THEN n_chars END) AS BIGINT)
           AS keep_n_chars,
         CAST(sum(CASE WHEN rnk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
           AS freed_chars
  FROM newr GROUP BY new_label
)
SELECT CAST(agg.new_label AS BIGINT)         AS new_cluster,
       CAST(agg.standing_cluster AS BIGINT)  AS standing_cluster,
       agg.n_members, agg.keep_doc_id, agg.keep_n_chars, agg.freed_chars,
       CAST(oldk.old_keep_id AS BIGINT)      AS old_keep_id,
       oldk.old_survivor_lost                AS old_survivor_lost,
       (agg.keep_doc_id = oldk.old_keep_id)  AS keep_is_old,
       (lconv.ok AND dconv.ok)               AS closure_converged
FROM agg JOIN oldk ON agg.standing_cluster = oldk.standing_cluster
CROSS JOIN lconv CROSS JOIN dconv
ORDER BY new_cluster
"""


@register(
    "x6y4_retraction_survivorship", oracle=_X6Y4_ORACLE,
    tags=("X6", "X2", "X1"),
)
def x6y4_retraction_survivorship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survivor re-election after tombstone retraction: per NEW
    post-delete cluster (x2e4's shared members site), the keep-longest
    survivor among the remaining members, the freed_chars accounting,
    the standing cluster it came from, that cluster's OLD survivor,
    whether the takedown removed the old survivor itself
    (old_survivor_lost), and whether the crown moved (keep_is_old).
    The oracle recomputes both closures from scratch and runs the
    identical two windows."""
    from .dedup import x2e4_retraction_members

    docs = Catalog(spark, sf_dir).documents.select(
        F.col("doc_id").alias("id"), "n_chars"
    )
    # Lazy checkpoint (r18, guide §3.3): ym feeds BOTH the old-survivor
    # and the new-survivor windows; un-truncated, each reference
    # replays the retraction-members derivation (touched-cluster
    # semi-joins over both label tables). Narrow rows, touched-members
    # sized.
    ym = (
        x2e4_retraction_members(spark, sf_dir)
        .join(docs, "id")
        .localCheckpoint(eager=False)
    )
    w_old = W.partitionBy("standing_cluster").orderBy(
        F.col("n_chars").desc(), "id"
    )
    oldk = (
        ym.withColumn("rnk", F.row_number().over(w_old))
        .filter(F.col("rnk") == 1)
        .select(
            "standing_cluster",
            F.col("id").alias("old_keep_id"),
            F.col("is_tomb").alias("old_survivor_lost"),
        )
    )
    w_new = W.partitionBy("new_label").orderBy(
        F.col("n_chars").desc(), "id"
    )
    newr = (
        ym.filter(F.col("new_label").isNotNull())
        .withColumn("rnk", F.row_number().over(w_new))
    )
    agg = newr.groupBy("new_label").agg(
        F.min("standing_cluster").alias("standing_cluster"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(F.when(F.col("rnk") == 1, F.col("id")))
        .cast("long")
        .alias("keep_doc_id"),
        F.max(F.when(F.col("rnk") == 1, F.col("n_chars")))
        .cast("long")
        .alias("keep_n_chars"),
        F.sum(F.when(F.col("rnk") > 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("freed_chars"),
    )
    return (
        agg.join(oldk, "standing_cluster")
        .select(
            F.col("new_label").cast("long").alias("new_cluster"),
            F.col("standing_cluster").cast("long").alias("standing_cluster"),
            "n_members", "keep_doc_id", "keep_n_chars", "freed_chars",
            F.col("old_keep_id").cast("long").alias("old_keep_id"),
            "old_survivor_lost",
            (F.col("keep_doc_id") == F.col("old_keep_id")).alias(
                "keep_is_old"
            ),
            F.lit(True).alias("closure_converged"),
        )
        .orderBy("new_cluster")
    )


# X6b3 — takedown repack-cost audit over the packed lake -----------------------
#
# The operational face of retraction AFTER packing: once documents are
# packed into fixed training sequences (x6b2), a takedown does not
# just delete rows — every bin holding a tombstoned doc is DIRTY and
# must be rewritten, dragging its clean co-residents (the collateral)
# through the rewrite. This is the cost report a takedown run files
# before touching storage: per source, total vs dirty bins, tombstoned
# vs collateral docs, tokens freed vs tokens merely rewritten. The
# tombstone predicate is THE shared x2e4 law site (_X2E4_TOMB), so the
# closure-retraction manifest (x2e4/x6y4) and this pack audit can
# never disagree about who is being taken down; the packing is the
# registered x6b2 fold (x6b2_pack / _x6b2_fold_ctes, both shared).
#
# Scale shape: x6b2's per-source fold plus two map-combined integer
# aggregates ((source, bin) then source) — no new shuffle class, all
# BIGINT, exact.

_X6B3_ORACLE = f"""
WITH {_x6b2_fold_ctes(_X6B2_T_SELECT)},
asg AS (
  SELECT source, u[1] AS doc_id, u[3] AS n_tokens, u[2] AS bin_id
  FROM (SELECT source, unnest(st[2:]) AS u FROM folded)
),
flag AS (
  SELECT source, doc_id, n_tokens, bin_id,
         ({_X2E4_TOMB_REF.format(col="doc_id")}) AS is_tomb
  FROM asg
),
binstats AS (
  SELECT source, bin_id,
         max(CASE WHEN is_tomb THEN 1 ELSE 0 END)            AS dirty,
         sum(CASE WHEN is_tomb THEN n_tokens ELSE 0 END)     AS tomb_toks,
         sum(CASE WHEN is_tomb THEN 1 ELSE 0 END)            AS tomb_docs,
         sum(CASE WHEN NOT is_tomb THEN n_tokens ELSE 0 END) AS clean_toks,
         sum(CASE WHEN NOT is_tomb THEN 1 ELSE 0 END)        AS clean_docs
  FROM flag GROUP BY source, bin_id
)
SELECT source,
       CAST(count(*) AS BIGINT)     AS n_bins,
       CAST(sum(dirty) AS BIGINT)   AS n_dirty_bins,
       CAST(sum(CASE WHEN dirty = 1 THEN tomb_docs ELSE 0 END) AS BIGINT)
         AS n_tomb_docs,
       CAST(sum(CASE WHEN dirty = 1 THEN clean_docs ELSE 0 END) AS BIGINT)
         AS n_collateral_docs,
       CAST(sum(CASE WHEN dirty = 1 THEN clean_toks ELSE 0 END) AS BIGINT)
         AS tokens_rewritten,
       CAST(sum(tomb_toks) AS BIGINT) AS tokens_freed
FROM binstats
GROUP BY source
ORDER BY source
"""


@register("x6b3_takedown_pack_audit", oracle=_X6B3_ORACLE, tags=("X6", "X2"))
def x6b3_takedown_pack_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repack cost of the x2e4 takedown over the x6b2
    packed layout: dirty bins (holding >= 1 tombstoned doc), the
    tombstoned and collateral doc counts, tokens freed by the takedown
    and tokens that must merely be rewritten. Composes the registered
    x6b2 fold and the shared x2e4 tombstone law — all-integer, exact."""
    from .dedup import _X2E4_TOMB

    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("long")
    asg = x6b2_pack(
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    )
    flag = asg.select(
        "source", "bin_id", "n_tokens",
        F.expr(_X2E4_TOMB.format(col="doc_id")).alias("is_tomb"),
    )
    binstats = flag.groupBy("source", "bin_id").agg(
        F.max(F.col("is_tomb").cast("int")).alias("dirty"),
        F.sum(F.when(F.col("is_tomb"), F.col("n_tokens")).otherwise(0))
        .alias("tomb_toks"),
        F.sum(F.when(F.col("is_tomb"), 1).otherwise(0)).alias("tomb_docs"),
        F.sum(F.when(~F.col("is_tomb"), F.col("n_tokens")).otherwise(0))
        .alias("clean_toks"),
        F.sum(F.when(~F.col("is_tomb"), 1).otherwise(0)).alias("clean_docs"),
    )
    return (
        binstats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("dirty").cast("long").alias("n_dirty_bins"),
            F.sum(F.when(F.col("dirty") == 1, F.col("tomb_docs")).otherwise(0))
            .cast("long")
            .alias("n_tomb_docs"),
            F.sum(
                F.when(F.col("dirty") == 1, F.col("clean_docs")).otherwise(0)
            )
            .cast("long")
            .alias("n_collateral_docs"),
            F.sum(
                F.when(F.col("dirty") == 1, F.col("clean_toks")).otherwise(0)
            )
            .cast("long")
            .alias("tokens_rewritten"),
            F.sum("tomb_toks").cast("long").alias("tokens_freed"),
        )
        .orderBy("source")
    )


# X6q — train/test split-leakage audit over the near-dup graph -----------------
#
# The check every eval pipeline needs and dedup alone cannot give: the
# x6 deterministic split assigns DOCUMENTS, but near-duplicate PAIRS
# can straddle the split — a test doc whose near-copy sits in train is
# leaked evaluation signal even after per-doc dedup keeps both (they
# may both be survivors of different clusters only under weaker edge
# laws; under the shared-gram law they are one cluster, but a split
# happens BEFORE dedup in many pipelines, and the audit quantifies the
# exposure either way). One row per unordered cross-split class
# (train/test, train/val, val/test): the straddling pair count, the
# distinct documents involved, and their total character mass. Both
# the edge law (the plan-gated x2e2 shared-gram pair site) and the
# split (the registered x6 hash law) are composed, never restated, on
# the Spark side; the oracle composes _grams3_cte + the x2e2b pair SQL
# and wraps the registered _X6_ORACLE verbatim.
#
# Scale shape: the pair site's inverted-index join (never all-pairs) +
# two doc_id-keyed joins against the map-only split + aggregates over
# pair-class keys (at most 3 rows out).

from .dedup import _X2E2_MIN_SHARED as _X6Q_MIN_SHARED  # noqa: E402
from .dedup import _grams3_cte as _x6q_grams3_cte  # noqa: E402

_X6Q_ORACLE = f"""
WITH {_x6q_grams3_cte("TRUE")},
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {_X6Q_MIN_SHARED}
),
sp AS ({_X6_ORACLE}),
x AS (
  SELECT p.id_a, p.id_b,
         least(sa.split, sb.split)    AS split_lo,
         greatest(sa.split, sb.split) AS split_hi
  FROM pairs p
  JOIN sp sa ON p.id_a = sa.doc_id
  JOIN sp sb ON p.id_b = sb.doc_id
  WHERE sa.split <> sb.split
),
pstats AS (
  SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs
  FROM x GROUP BY split_lo, split_hi
),
docs_in AS (
  SELECT DISTINCT split_lo, split_hi, id FROM (
    SELECT split_lo, split_hi, id_a AS id FROM x
    UNION ALL
    SELECT split_lo, split_hi, id_b AS id FROM x
  )
),
dstats AS (
  SELECT split_lo, split_hi,
         CAST(count(*) AS BIGINT)       AS n_docs,
         CAST(sum(d.n_chars) AS BIGINT) AS leaked_chars
  FROM docs_in JOIN documents d ON docs_in.id = d.doc_id
  GROUP BY split_lo, split_hi
)
SELECT p.split_lo, p.split_hi, p.n_pairs, d.n_docs, d.leaked_chars
FROM pstats p JOIN dstats d USING (split_lo, split_hi)
ORDER BY split_lo, split_hi
"""


@register("x6q_split_leakage_audit", oracle=_X6Q_ORACLE, tags=("X6", "X2"))
def x6q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling the x6 train/val/test split, per
    unordered split-class: pair count, distinct documents involved,
    and their character mass — the leaked-evaluation-signal exposure
    report. Composes the plan-gated x2e2 shared-gram pair site and the
    registered x6 split verbatim."""
    from .dedup import x2e2_shared_gram_pairs

    docs = Catalog(spark, sf_dir).documents
    pairs = x2e2_shared_gram_pairs(docs)
    sp = x6_deterministic_split(spark, sf_dir).select("doc_id", "split")
    sa = sp.select(
        F.col("doc_id").alias("src"), F.col("split").alias("split_a")
    )
    sb = sp.select(
        F.col("doc_id").alias("dst"), F.col("split").alias("split_b")
    )
    x = (
        pairs.join(sa, "src")
        .join(sb, "dst")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "src", "dst",
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
    )
    pstats = x.groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    docs_in = (
        x.select("split_lo", "split_hi", F.col("src").alias("id"))
        .unionByName(
            x.select("split_lo", "split_hi", F.col("dst").alias("id"))
        )
        .distinct()
    )
    dstats = (
        docs_in.join(
            docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("leaked_chars"),
        )
    )
    return (
        pstats.join(dstats, ["split_lo", "split_hi"])
        .orderBy("split_lo", "split_hi")
    )


# X6q2 — leakage-free cluster-coherent split (fix what x6q measures) -----------
#
# x6q quantifies the exposure; x6q2 removes it. The reason
# dedup-then-split is a rule in public practice is exactly the pairs
# x6q counts: a per-DOCUMENT hash split lets near-duplicate pairs
# straddle train/test. The fix assigns the split at the duplicate-
# FAMILY level: the split key is the x2e2b cluster REPRESENTATIVE
# (cluster_id = the component's min doc_id — singletons are their own
# representative, so they fall back to the existing x6 doc-hash law by
# construction), pushed through the same portable hash / 80-10-10
# bucket CASE via the builder split of the x6 law (_hash_sql /
# _split_case_sql / split_label — byte-identity pinned). Every member
# of a family then lands in the SAME split, so no x2e2b-edge pair can
# straddle — and the output PROVES it, carrying a recomputed x6q-style
# leakage count over the plan-gated x2e2 pair site that must be zero
# (an all-zero audit column is the artifact's guarantee, not a
# decoration: a drifted split law would surface as a nonzero count and
# a loud hash mismatch). One row per (source, split) with doc and char
# mass — the distribution a mixture planner reads to check the family-
# coherent split stayed ~80/10/10 — plus the leaked_pairs column and
# the closure convergence guard carried through from x2e2b.
#
# Scale shape: x2e2b's closure (log-round edge rewriting, the shared
# plan-gated pair site), then ONE map-side hash/CASE over the label
# table (the x6 posture — the split itself adds zero shuffles), one
# doc_id-keyed join for the distribution aggregate, and the pair site
# joined twice against the map-only split for the audit. Nothing new
# shuffles beyond what x2e2b and x6q already do.

_X6Q2_ORACLE = f"""{_X2E2B_CTES_REF},
spl AS (
  SELECT llab.id AS doc_id,
         {_split_case_sql(_bucket_sql("llab.cluster_id"))} AS split
  FROM llab
),
dist AS (
  SELECT d.source, s.split,
         CAST(count(*) AS BIGINT)       AS n_docs,
         CAST(sum(d.n_chars) AS BIGINT) AS n_chars_total
  FROM documents d JOIN spl s ON d.doc_id = s.doc_id
  GROUP BY d.source, s.split
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS leaked_pairs
  FROM pairs p
  JOIN spl sa ON p.id_a = sa.doc_id
  JOIN spl sb ON p.id_b = sb.doc_id
  WHERE sa.split <> sb.split
)
SELECT dist.source, dist.split, dist.n_docs, dist.n_chars_total,
       leak.leaked_pairs, lconv.ok AS closure_converged
FROM dist CROSS JOIN leak CROSS JOIN lconv
ORDER BY source, split
"""


@register(
    "x6q2_cluster_coherent_split", oracle=_X6Q2_ORACLE, tags=("X6", "X2")
)
def x6q2_cluster_coherent_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: hash the x2e2b duplicate-
    family representative (cluster_id; singletons = their own doc_id —
    the x6 law's fallback) through the portable split hash, so every
    near-dup family lands whole in one split. Emits the per-(source,
    split) doc/char distribution plus a recomputed x6q leakage audit
    over the same x2e2 pair site — provably zero under this split —
    and x2e2b's convergence guard."""
    from .dedup import _x2e2b_frame, x2e2_shared_gram_pairs

    docs = Catalog(spark, sf_dir).documents
    # ONE pair-stage run per query (r18, guide §2.4): the closure's
    # edge law and the recomputed leakage audit need the IDENTICAL
    # shared-gram pair set, so build it once behind a lazy checkpoint
    # (materialized by the closure loop's first convergence count) and
    # feed both consumers. The pair site itself is unchanged and stays
    # plan-gated at its own site.
    pairs = x2e2_shared_gram_pairs(docs).localCheckpoint(eager=False)
    labels = _x2e2b_frame(spark, sf_dir, pairs=pairs).select(
        "doc_id", "cluster_id"
    )
    # spl is consumed three times (the distribution join plus both
    # sides of the leakage join); checkpoint the two narrow columns
    # once instead of replaying the label->split map per consumer.
    spl = labels.select(
        "doc_id",
        split_label(split_bucket(F.col("cluster_id"))).alias("split"),
    ).localCheckpoint(eager=False)
    dist = (
        docs.select("doc_id", "source", "n_chars")
        .join(spl, "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
    )
    leak = (
        pairs.join(
            spl.select(F.col("doc_id").alias("src"), F.col("split").alias("split_a")),
            "src",
        )
        .join(
            spl.select(F.col("doc_id").alias("dst"), F.col("split").alias("split_b")),
            "dst",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_pairs"))
    )
    return (
        dist.crossJoin(F.broadcast(leak))
        .select(
            "source", "split", "n_docs", "n_chars_total", "leaked_pairs",
            F.lit(True).alias("closure_converged"),
        )
        .orderBy("source", "split")
    )


# X6q3 — split-ratio drift: what the family-coherent split costs ---------------
#
# x6q2 buys zero leakage by moving whole duplicate families into one
# split — which skews the 80/10/10 marginals exactly as much as the
# families are big (a 3,000-doc family lands as one atomic unit). This
# is the audit a data planner reads next to x6q2: per split class, the
# doc-level (x6) head count against the family-level (x6q2) head
# count, both as exact ppm of the corpus, and the doc delta. Both
# split laws are composed from the SAME builder sites (_bucket_sql /
# _split_case_sql / split_label / split_bucket), so the audit can
# never drift from the splits it compares; x2e2b's convergence guard
# carries through. A full outer join + coalesced zeros keeps a split
# class visible even if one law empties it on a tiny corpus.
#
# Scale shape: x2e2b's closure (already the x6q2 cost), then two
# map-side hash/CASE passes and three <= 3-row aggregates joined —
# nothing new touches the corpus.

_X6Q3_ORACLE = f"""{_X2E2B_CTES_REF},
spl AS (
  SELECT llab.id AS doc_id,
         {_split_case_sql(_bucket_sql("llab.cluster_id"))} AS split
  FROM llab
),
fam AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs_family
  FROM spl GROUP BY split
),
docl AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs_doc
  FROM ({_X6_ORACLE}) GROUP BY split
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT coalesce(d.split, f.split)                        AS split,
       coalesce(d.n_docs_doc, 0)                         AS n_docs_doc,
       coalesce(f.n_docs_family, 0)                      AS n_docs_family,
       CAST((1000000 * coalesce(d.n_docs_doc, 0)) // n AS BIGINT)
         AS doc_ppm,
       CAST((1000000 * coalesce(f.n_docs_family, 0)) // n AS BIGINT)
         AS family_ppm,
       CAST(coalesce(f.n_docs_family, 0) - coalesce(d.n_docs_doc, 0)
            AS BIGINT)                                   AS doc_delta,
       lconv.ok                                          AS closure_converged
FROM docl d FULL JOIN fam f ON d.split = f.split
CROSS JOIN tot CROSS JOIN lconv
ORDER BY split
"""


@register("x6q3_split_ratio_drift", oracle=_X6Q3_ORACLE, tags=("X6", "X2"))
def x6q3_split_ratio_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per split class: the doc-level (x6) head count vs the
    family-level (x6q2) head count, both in exact ppm of the corpus
    (BIGINT floor division), and the doc delta — the marginal-ratio
    price of the leakage-free split. Both laws composed from the
    shared builder sites; convergence guard carried through."""
    from .dedup import x2e2b_global_dedup_clusters_full

    docs = Catalog(spark, sf_dir).documents
    labels = x2e2b_global_dedup_clusters_full(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    fam = (
        labels.select(
            split_label(split_bucket(F.col("cluster_id"))).alias("split")
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_family"))
    )
    docl = (
        x6_deterministic_split(spark, sf_dir)
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_doc"))
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    z = lambda c: F.coalesce(F.col(c), F.lit(0).cast("long"))
    return (
        docl.join(fam, "split", "full")
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            z("n_docs_doc").alias("n_docs_doc"),
            z("n_docs_family").alias("n_docs_family"),
            F.expr(
                "CAST((1000000 * coalesce(n_docs_doc, CAST(0 AS BIGINT))) "
                "div n AS BIGINT)"
            ).alias("doc_ppm"),
            F.expr(
                "CAST((1000000 * coalesce(n_docs_family, CAST(0 AS BIGINT))) "
                "div n AS BIGINT)"
            ).alias("family_ppm"),
            (z("n_docs_family") - z("n_docs_doc"))
            .cast("long")
            .alias("doc_delta"),
            F.lit(True).alias("closure_converged"),
        )
        .orderBy("split")
    )


# X6b4 — incremental repack of the dirty bins (execute what x6b3 audits) -------
#
# x6b3 prices the takedown's repack; x6b4 is the repack manifest
# itself — the artifact the storage layer applies. The law: bins
# holding >= 1 tombstoned doc (the shared _X2E4_TOMB predicate) are
# DIRTY; their surviving co-residents re-run the REGISTERED x6b2 BFD
# fold per source (x6b2_pack / _x6b2_fold_ctes, prefix-parameterized
# — byte-identity pinned at the default), landing in fresh bins
# numbered from base = 1 + max standing bin id per source (base reads
# the FULL standing layout, so new ids are collision-free and
# independent of which bins happened to be dirty). Every clean bin is
# carried through UNTOUCHED — its rows emitted bit-identically (the
# s20 untouched-partitions idiom; the oracle hash covers every row,
# and the planted pytest pins both the carry-through and the
# collateral migration).
#
# Scale shape: O(dirty), never O(corpus) — the second fold's input is
# only the dirty bins' survivors (collateral docs), reached by one
# (source, bin_id) equi-join against the dirty-bin set; the standing
# layout itself is one x6b2 fold (in production it is a STORED
# manifest — recomputed here only to keep the registered query
# self-contained on the raw fixture tables). Untouched bins never
# enter the repack fold.

_X6B4_ORACLE = f"""
WITH {_x6b2_fold_ctes(_X6B2_T_SELECT)},
asg AS (
  SELECT source, u[1] AS doc_id, u[3] AS n_tokens, u[2] AS bin_id
  FROM (SELECT source, unnest(st[2:]) AS u FROM folded)
),
flag AS (
  SELECT source, doc_id, n_tokens, bin_id,
         ({_X2E4_TOMB_REF.format(col="doc_id")}) AS is_tomb
  FROM asg
),
dirty AS (
  SELECT source, bin_id FROM flag
  GROUP BY source, bin_id
  HAVING max(CASE WHEN is_tomb THEN 1 ELSE 0 END) = 1
),
base AS (
  SELECT source, max(bin_id) + 1 AS base FROM asg GROUP BY source
),
{_x6b2_fold_ctes(
    '''SELECT f.doc_id, f.source, f.n_tokens
  FROM flag f JOIN dirty USING (source, bin_id)
  WHERE NOT f.is_tomb''',
    prefix="r",
)},
migr AS (
  SELECT r.source, u[1] AS doc_id, u[3] AS n_tokens,
         b.base + u[2] AS bin_id, TRUE AS migrated
  FROM (SELECT source, unnest(st[2:]) AS u FROM rfolded) r
  JOIN base b ON r.source = b.source
)
SELECT f.source, f.doc_id, f.n_tokens, f.bin_id, FALSE AS migrated
FROM flag f ANTI JOIN dirty d
  ON f.source = d.source AND f.bin_id = d.bin_id
UNION ALL
SELECT source, doc_id, n_tokens, bin_id, migrated FROM migr
ORDER BY source, doc_id
"""


@register("x6b4_incremental_repack", oracle=_X6B4_ORACLE, tags=("X6", "X2"))
def x6b4_incremental_repack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-takedown repack manifest: clean bins carried through
    bit-identically, dirty bins' surviving docs re-packed by the
    registered x6b2 BFD fold into fresh bins numbered from 1 + the
    per-source max standing bin id. One row per SURVIVING doc
    (source, doc_id, n_tokens, bin_id, migrated) — tombstoned docs are
    gone, untouched docs keep their bin, collateral docs migrate.
    O(dirty): only dirty-bin survivors enter the second fold."""
    from .dedup import _X2E4_TOMB

    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("long")
    asg = x6b2_pack(
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    )
    flag = asg.withColumn(
        "is_tomb", F.expr(_X2E4_TOMB.format(col="doc_id"))
    )
    dirty = (
        flag.groupBy("source", "bin_id")
        .agg(F.max(F.col("is_tomb").cast("int")).alias("d"))
        .filter(F.col("d") == 1)
        .select("source", "bin_id")
    )
    base = asg.groupBy("source").agg(
        (F.max("bin_id") + 1).alias("base")
    )
    collateral = (
        flag.join(dirty, ["source", "bin_id"])
        .filter(~F.col("is_tomb"))
        .select("doc_id", "source", "n_tokens")
    )
    migrated = (
        x6b2_pack(collateral)
        .join(base, "source")
        .select(
            "source", "doc_id", "n_tokens",
            (F.col("base") + F.col("bin_id")).alias("bin_id"),
            F.lit(True).alias("migrated"),
        )
    )
    untouched = flag.join(
        dirty, ["source", "bin_id"], "left_anti"
    ).select(
        "source", "doc_id", "n_tokens", "bin_id",
        F.lit(False).alias("migrated"),
    )
    return untouched.unionByName(migrated).orderBy("source", "doc_id")


# X6b5 — repack reconciliation (x6b3's price vs x6b4's action) ------------------
#
# The audit-then-execute pair needs its closing ledger entry: per
# source, the x6b3 PREDICTION (dirty bins, collateral docs, tokens to
# rewrite) joined against what x6b4 actually DID (docs migrated,
# tokens migrated, fresh bins opened), with the reconciliation
# verdicts as boolean columns. Both sides share the x6b2 fold and the
# _X2E4_TOMB law, so docs_reconcile / tokens_reconcile are true BY
# CONSTRUCTION — the point of emitting them is that a drift in either
# composed law (a changed tombstone predicate, a fold divergence)
# surfaces here as a loud false + hash mismatch before it corrupts a
# real repack. bin_delta (fresh bins minus dirty bins) is data, not a
# law: BFD over the collateral usually packs TIGHTER than the dirty
# layout it replaces, but bin packing gives no one-sided guarantee.
#
# Scale shape: the two registered queries' shapes plus one source-keyed
# join of sources-sized aggregates. Sources the takedown empties
# entirely reconcile with coalesced zeros (left join from the audit).

_X6B5_ORACLE = f"""
WITH audit AS ({_X6B3_ORACLE}),
rep AS ({_X6B4_ORACLE}),
mstats AS (
  SELECT source,
         CAST(count(*) FILTER (WHERE migrated) AS BIGINT)        AS n_migrated_docs,
         CAST(coalesce(sum(n_tokens) FILTER (WHERE migrated), 0)
              AS BIGINT)                                         AS migrated_tokens,
         CAST(count(DISTINCT CASE WHEN migrated THEN bin_id END)
              AS BIGINT)                                         AS n_new_bins
  FROM rep GROUP BY source
)
SELECT a.source,
       a.n_dirty_bins,
       a.n_collateral_docs,
       coalesce(m.n_migrated_docs, 0)  AS n_migrated_docs,
       a.tokens_rewritten,
       coalesce(m.migrated_tokens, 0)  AS migrated_tokens,
       coalesce(m.n_new_bins, 0)       AS n_new_bins,
       coalesce(m.n_migrated_docs, 0) = a.n_collateral_docs AS docs_reconcile,
       coalesce(m.migrated_tokens, 0) = a.tokens_rewritten  AS tokens_reconcile,
       CAST(coalesce(m.n_new_bins, 0) - a.n_dirty_bins AS BIGINT) AS bin_delta
FROM audit a LEFT JOIN mstats m ON a.source = m.source
ORDER BY a.source
"""


@register("x6b5_repack_reconciliation", oracle=_X6B5_ORACLE, tags=("X6", "X2"))
def x6b5_repack_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ledger closing the takedown pair: x6b3's predicted
    repack cost joined to x6b4's executed manifest, with
    docs_reconcile / tokens_reconcile verdicts (true by the shared
    fold + tombstone laws — a drift in either surfaces as false) and
    the bin_delta the new layout actually cost."""
    audit = x6b3_takedown_pack_audit(spark, sf_dir).select(
        "source", "n_dirty_bins", "n_collateral_docs", "tokens_rewritten"
    )
    rep = x6b4_incremental_repack(spark, sf_dir)
    mstats = rep.groupBy("source").agg(
        F.count(F.when(F.col("migrated"), 1))
        .cast("long")
        .alias("n_migrated_docs"),
        F.coalesce(
            F.sum(F.when(F.col("migrated"), F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("migrated_tokens"),
        F.countDistinct(
            F.when(F.col("migrated"), F.col("bin_id"))
        )
        .cast("long")
        .alias("n_new_bins"),
    )
    j = audit.join(mstats, "source", "left")
    z = lambda c: F.coalesce(F.col(c), F.lit(0))
    return (
        j.select(
            "source",
            "n_dirty_bins",
            "n_collateral_docs",
            z("n_migrated_docs").cast("long").alias("n_migrated_docs"),
            "tokens_rewritten",
            z("migrated_tokens").cast("long").alias("migrated_tokens"),
            z("n_new_bins").cast("long").alias("n_new_bins"),
            (z("n_migrated_docs") == F.col("n_collateral_docs")).alias(
                "docs_reconcile"
            ),
            (z("migrated_tokens") == F.col("tokens_rewritten")).alias(
                "tokens_reconcile"
            ),
            (z("n_new_bins") - F.col("n_dirty_bins"))
            .cast("long")
            .alias("bin_delta"),
        )
        .orderBy("source")
    )
