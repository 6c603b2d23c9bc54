"""Scale-safe distribution bucketing: quantile cutpoints + map-only assignment.

The global-window anti-pattern (``ntile``/``row_number`` over an
unpartitioned ORDER BY) funnels the whole table through ONE reducer —
the named scale-killer of SURVEY.md §2.5's W4 family. The scalable twin
is a two-pass shape with no Window node at all:

1. ONE aggregate computes the cutpoints: ``percentile_approx(col,
   probs, accuracy)``. The accuracy knob is an EXACTNESS-vs-MEMORY
   dial: the sketch's rank error is n/accuracy rows, but its retained
   size also grows toward O(min(n, accuracy)) tuples (little
   compression is possible while the error budget is under one row).
   The default here (1e8) buys EXACT nearest-rank quantiles — the
   value at rank ``ceil(p * n)``, which is precisely DuckDB's
   ``quantile_disc`` (verified empirically; both engines return a
   member value, so equality is bit-exact, no interpolation) — at
   every test/oracle scale this repo runs, where the sketch cost is
   trivial. A genuine 100 TB run passes accuracy ~1e4..1e5 instead:
   per-partition sketches stay KB-sized and mergeable, cutpoints land
   within 0.01% rank — far inside what a threshold-selection report
   needs — and the plan is otherwise identical.
2. The 1-row cutpoint fold broadcasts back and a map-side HOF counts
   cutpoints strictly below each value: ``bucket = 1 + sum(v > cut)``.
   No shuffle touches the table beyond the aggregate's partial-agg
   exchange; assignment is embarrassingly parallel.

Both engines derive the law from THIS module (the SQL snippets are
generated here), so there is one site per law, not two.

Cost note: the input subtree is planned twice (once under the cutpoint
aggregate, once under the assignment) — Catalyst does not share it. For
a cheap scan that is two column-pruned parquet passes; for an expensive
upstream (e.g. x4c's tokenizing score), a real pipeline persists the
score column first. Documented in SCALE.md.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# percentile_approx accuracy: rank error <= n / accuracy, so the result
# is exact (error < 1 row) for inputs up to 1e8 rows — at the cost of
# the sketch retaining up to O(min(n, accuracy)) tuples (see module
# docstring). The exact-mode default serves the oracle contract at test
# scales; cluster jobs pass a smaller accuracy explicitly.
EXACT_ACCURACY = 100_000_000


def quantile_cuts(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    accuracy: int = EXACT_ACCURACY,
) -> DataFrame:
    """1-row DataFrame with array column ``cuts``: the nearest-rank
    quantiles of ``df[col]`` at ``probs`` (exact while rows <
    ``accuracy``; sketch-approximate — and sketch-SIZED — beyond)."""
    return df.agg(
        F.percentile_approx(col, list(probs), accuracy).alias("cuts")
    )


def bucket_col(value: Column | str, cuts: Column | str = "cuts") -> Column:
    """Map-side bucket id: 1 + number of cutpoints strictly below the
    value. Ties at a cutpoint land in the LOWER bucket on both engines
    (strict ``>``), so equal values always share a bucket."""
    v = F.col(value) if isinstance(value, str) else value
    c = F.col(cuts) if isinstance(cuts, str) else cuts
    return (
        F.lit(1)
        + F.aggregate(
            c, F.lit(0), lambda acc, cut: acc + F.when(v > cut, 1).otherwise(0)
        )
    ).cast("int")


def with_range_bucket(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    out: str = "bucket",
    accuracy: int = EXACT_ACCURACY,
) -> DataFrame:
    """``df`` + an ``out`` int column bucketing ``col`` by the quantile
    cutpoints at ``probs`` (len(probs)+1 buckets, 1-based). Broadcast
    join of the 1-row fold; no Window, no table-sized shuffle."""
    cuts = quantile_cuts(df, col, probs, accuracy).select(
        F.col("cuts").alias("__cuts")
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(out, bucket_col(col, "__cuts"))
        .drop("__cuts")
    )


def cuts_sql(col: str, probs: Sequence[float]) -> str:
    """DuckDB twin of :func:`quantile_cuts`: a list-valued quantile_disc."""
    return f"quantile_disc({col}, [{', '.join(repr(float(p)) for p in probs)}])"


def bucket_sql(value: str, cuts: str = "cuts") -> str:
    """DuckDB twin of :func:`bucket_col` (same strict-``>`` tie law)."""
    return f"CAST(1 + len(list_filter({cuts}, c -> {value} > c)) AS INT)"
