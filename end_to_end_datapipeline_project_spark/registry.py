"""Query registry: the driver contract's (queries, oracle_sql) pairs.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
declared here as a named ``Query``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables.

Oracle-parity conventions (SURVEY.md §7.4), used by every query:

- double aggregates go through ``CAST(SUM(CAST(x AS DECIMAL(30,6))) AS
  DOUBLE)`` — decimal summation is exact, so the result is bit-identical
  regardless of each engine's summation order;
- per-row doubles that involve libm trig (haversine) are ``round(x, 6)``
  (JVM vs C libm may differ in the last ulp);
- ``unix_timestamp`` ≡ DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``;
- dedup/rank survivors are made deterministic with explicit tiebreaks;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:  # a silent overwrite would shrink the
            raise ValueError(  # parity matrix with no failing signal
                f"duplicate query registration: {name!r}"
            )
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_loaded = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import formats  # noqa: F401
    from . import graph  # noqa: F401
    from . import pipeline_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import spatial  # noqa: F401
    from . import sql_surface  # noqa: F401
    from . import udx  # noqa: F401
    from . import physical  # noqa: F401
    from . import stats  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import timeseries  # noqa: F401
    from .llm_ops import clean, dedup, multimodal, similarity, text  # noqa: F401

    _loaded = True


# shared SQL fragments -----------------------------------------------------

#: decimal-exact sum of a double expression, surfaced as double
def dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


#: Spark-side equivalent of :func:`dsum`
def spark_dsum(col):
    from pyspark.sql import functions as F

    return F.sum(col.cast("decimal(30,6)")).cast("double")


def spark_dsum_fast(col, frac_digits: int, hi_split: int = 28):
    """Decimal-exact sum of a double expression, bit-identical to
    :func:`spark_dsum` but ~10× faster on the hot path.

    Spark's ``sum(decimal(30,6))`` needs a >18-digit precision buffer,
    which falls off the primitive-long fast path onto per-row BigDecimal
    arithmetic outside whole-stage codegen (measured: 10 such sums cost
    1.6 s over 600k rows where 10 double sums cost 0.13 s).  When the
    caller can guarantee the CONTRACT below, the same exact sum can be
    accumulated as two primitive LONG sums that stay inside codegen:

        v  = x · 10^frac_digits          (an exact integer, see contract)
        hi = v >> hi_split,  lo = v & (2^hi_split − 1)
        Σx = (Σhi · 2^hi_split + Σlo) / 10^frac_digits   (exact decimal)

    Contract (caller must verify analytically for the expression):
      * every non-null value of ``col`` is an exact multiple of
        10^−frac_digits, and
      * |x| · 10^frac_digits < 2^53, so the scaling multiply is exact in
        double and the long cast is lossless.
      TPC-H money/rate columns are 2-decimal exacts, so products of two
      are 4-digit exacts (< 2^47 scaled) and of three 6-digit exacts
      (< 2^51 scaled) — all within contract.  The oracle gate verifies
      the guarantee end-to-end: a value off-grid would shift the sum and
      hash-mismatch the DuckDB ``DECIMAL(30,6)`` oracle.

    Overflow headroom (longs): |Σhi| ≤ n·max|v|/2^hi_split and
    |Σlo| < n·2^hi_split — at hi_split=28 the lo-sum holds to n ≈ 3·10^10
    rows PER AGGREGATION GROUP and the hi-sum to n ≈ 2^{81−hi_split−lg
    max|v|}; per-group row counts beyond that need a wider accumulator
    anyway.  The reassembly runs decimal-exact on the one aggregated row:
    division by 10^frac_digits (≤ 6) is exact at scale 6, and the final
    double cast rounds the same exact decimal value spark_dsum rounds.
    Arithmetic shift + mask keep floor/remainder semantics for negative
    values, so signed expressions are fine.
    """
    from pyspark.sql import functions as F

    if not 0 <= frac_digits <= 6:
        raise ValueError("frac_digits must be within the oracle scale 0..6")
    # nearest-integer via floor(x·scale + ½), NOT F.round: Spark's Round
    # on DoubleType converts through BigDecimal per row — the very cost
    # this helper exists to avoid.  The contract puts the true product
    # within 0.25 of the integer N (x = fl(N/10^f) carries ≤2 ulp of
    # relative error through the scale-up, |N| < 2^53), so floor(+½)
    # recovers N exactly for either sign.
    v = F.floor(col * F.lit(float(10**frac_digits)) + F.lit(0.5))
    hi = F.shiftright(v, hi_split)
    lo = v.bitwiseAND(F.lit((1 << hi_split) - 1))
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(
        1 << hi_split
    ) + F.sum(lo).cast("decimal(38,0)")
    # pin the pre-double type to decimal(38,6) — the type spark_dsum's
    # sum produces — so the final decimal→double conversion is the same
    # code path on the same exact value (≤6 frac digits: cast is exact)
    return (
        (total / F.lit(10**frac_digits)).cast("decimal(38,6)").cast("double")
    )


def spark_dsum_rounded(col):
    """Decimal-exact sum for OFF-grid double expressions, bit-identical
    to :func:`spark_dsum` with a primitive-long accumulator.

    When the summed expression is not an exact 10^-f multiple (ratios,
    unrounded log terms), :func:`spark_dsum_fast` cannot be used — its
    float scale-up may land on the wrong side of a .5 rounding boundary
    that the decimal cast resolves from the double's exact binary
    expansion.  This variant keeps the per-row ``cast(x AS
    decimal(30,6))`` — the exact same HALF_UP rounding the oracle's CAST
    performs — but then extracts the unscaled integer exactly (decimal ×
    10^6 → long) and sums THAT as a primitive long, avoiding the
    BigDecimal aggregation buffer.  Measured ~1.4× faster than
    spark_dsum on a 600k-row grouped sum (the per-row cast remains; the
    win is the accumulator), vs ~6× for the on-grid fast path.

    Caller contract: |Σ x| < 2^63/10^6 ≈ 9.2·10^12 per aggregation group
    (the long unscaled-sum bound), comfortably above any rank mass /
    probability-term total this repo sums.
    """
    from pyspark.sql import functions as F

    v = col.cast("decimal(30,6)")  # the oracle's per-term rounding
    scaled = (v * F.lit(10**6)).cast("long")  # exact unscaled extraction
    return (
        (F.sum(scaled).cast("decimal(38,0)") / F.lit(10**6))
        .cast("decimal(38,6)")
        .cast("double")
    )
