"""Deterministic corpus-sampling operators for training-data pipelines:
weighted PPS systematic sampling and temperature-balanced mixture
sampling.

No counterpart in the reference (its only row selection is predicate
filtering, s3logs/src/utils.rs:56 event-type match); these extend the
engine's training-data surface the same way the dedup/ANN families do.

Design constraints shared by both operators:

- **Integer-exact and hash-deterministic.** Selection decisions reduce
  to integer arithmetic over the portable 32-bit content hash
  (functions/hashing.py), so the SAME rows are chosen on any engine,
  any partitioning, any cluster size — the property that makes the
  DuckDB differential gate (and reproducible training runs) possible.
  No RNG, no float comparisons in the selection path.
- **No global single-partition window.** The global prefix sum a
  systematic sample needs is computed segment-wise: the uniform hash
  is range-BINNED arithmetically (bin = h div width — no sampled
  range-partitioner, so bin assignment is deterministic across jobs),
  per-bin totals are one tiny aggregate (≤ num_bins rows, the sanctioned
  bounded collect), and each bin's exclusive offset is broadcast back
  as a literal map. In-bin cumulative sums run under a window keyed by
  bin — parallelism = num_bins, state = one partition's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash32

_HASH_SPACE = 1 << 32


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    num_bins: int = 32,
) -> DataFrame:
    """Probability-proportional-to-size (PPS) systematic sample of ~``k``
    rows: a unit's inclusion probability is proportional to its integer
    ``weight_col`` (survey-sampling PPS systematic; the standard way to
    weight a training corpus by quality/length without float RNG).

    The corpus is laid on a line in hash-of-id order (decorrelating
    position from weight, which systematic sampling requires), each row
    occupying a segment of length = its weight; every ``T``-th point of
    the line is a selection point (``T = total_weight div k``, offset
    ``T div 2``). A row is picked once per selection point inside its
    segment — rows heavier than ``T`` are "certainty units" and can be
    picked multiple times (``n_copies`` > 1), exactly as in the classic
    estimator.

    Entirely integer arithmetic: with nonneg operands Spark's ``div``
    and DuckDB's ``//`` agree, so the oracle replicates selection
    bit-for-bit. Weights must be positive; a nonpositive weight raises
    at execution (selection probabilities would be undefined).

    Plan shape: one pass for per-bin weight totals (map + 32-row agg +
    bounded collect), one pass for the binned cumulative sum + pick
    (window keyed by bin). Returns the selected rows with ``n_copies``.
    """
    if k <= 0:
        raise ValueError(f"weighted_systematic_sample: k must be positive, got {k}")
    w = F.when(
        F.col(weight_col) <= 0,
        F.raise_error(
            F.concat(
                F.lit(f"weighted_systematic_sample: nonpositive weight in {weight_col!r}: "),
                F.col(weight_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col(weight_col).cast("long"))
    bin_width = _HASH_SPACE // num_bins + (1 if _HASH_SPACE % num_bins else 0)
    h = hash32(F.col(id_col).cast("string"))
    d = df.withColumn("__pps_h", h).withColumn("__pps_w", w).withColumn(
        "__pps_bin", (F.col("__pps_h") / F.lit(bin_width)).cast("long")
    )

    totals = {
        r["__pps_bin"]: r["t"]
        for r in d.groupBy("__pps_bin").agg(F.sum("__pps_w").alias("t")).collect()
    }
    total_w = sum(totals.values())
    step = max(1, total_w // k)
    off = step // 2
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    offset_map = F.create_map(
        *[F.lit(x) for b in offsets for x in (b, offsets[b])]
    )

    cum_w = (
        Window.partitionBy("__pps_bin")
        .orderBy("__pps_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.element_at(offset_map, F.col("__pps_bin")), F.lit(0)) + (
        F.coalesce(F.sum("__pps_w").over(cum_w), F.lit(0))
    )

    def f_sel(x: F.Column) -> F.Column:
        # #{m in [0, k) : off + m*step < x} = clamp(ceil((x - off)/step),
        # 0, k); x >= 0 and off < step keep the ceil numerator
        # nonnegative, where integer division == floor division on every
        # engine
        num = x - F.lit(off) + F.lit(step - 1)
        return F.least(F.lit(k), F.greatest(F.lit(0), _div(num, step)))

    n_sel = f_sel(start + F.col("__pps_w")) - f_sel(start)
    out = (
        d.withColumn("n_copies", n_sel)
        .filter(F.col("n_copies") >= 1)
        .drop("__pps_h", "__pps_w", "__pps_bin")
    )
    return out


def _div(num: F.Column, d: int) -> F.Column:
    """Integer division for a NONNEGATIVE numerator column — (num - pmod)
    / d stays in long arithmetic and equals floor division."""
    return ((num - F.pmod(num, F.lit(d))) / F.lit(d)).cast("long")


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k_total: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-balanced mixture sampling: per-group quotas
    proportional to ``count^alpha`` (the multilingual/multi-source
    corpus-mixing rule — alpha < 1 upsamples small sources relative to
    their raw share), filled deterministically by hash-of-id rank.

    Quota math is integer-exact: ``w_g = floor(count_g ^ alpha)``
    (``alpha=0.5`` evaluates via sqrt, which IEEE-754 requires to be
    correctly rounded — so the floor is engine-portable; other alphas
    go through pow, which carries no such guarantee and is therefore
    fine for production but not for the bit-exact oracle), then
    ``quota_g = max(1, k_total * w_g div sum(w))``. Total output is
    ~``k_total`` (floor rounding + the 1-minimum can deviate by a few).

    Plan shape: one count aggregate (tiny — one row per group), a
    scalar total via broadcast cross-join (no collect), quotas broadcast
    back onto the corpus, and one rank window keyed by group. The
    window sorts each group; with quota ≪ group size a hash-threshold
    pre-prune ahead of the window (filter h < bound, verified against
    the exact count) is the refinement at extreme group sizes.

    Returns the selected rows plus ``sample_rank`` and ``quota``.
    """
    if k_total <= 0:
        raise ValueError(f"mixture_sample: k_total must be positive, got {k_total}")
    if alpha == 0.5:
        w_g = F.floor(F.sqrt(F.col("__mx_n").cast("double")))
    else:
        w_g = F.floor(F.pow(F.col("__mx_n").cast("double"), F.lit(float(alpha))))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__mx_n"))
    weights = counts.withColumn("__mx_w", w_g.cast("long"))
    total = weights.agg(F.sum("__mx_w").alias("__mx_tw"))
    quotas = (
        weights.crossJoin(F.broadcast(total))
        .withColumn(
            "quota",
            F.greatest(
                F.lit(1),
                _quota_div(F.lit(k_total) * F.col("__mx_w"), F.col("__mx_tw")),
            ),
        )
        .select(group_col, "quota")
    )
    h = hash32(F.col(id_col).cast("string"))
    rank_w = Window.partitionBy(group_col).orderBy("__mx_h", id_col)
    out = (
        df.withColumn("__mx_h", h)
        .join(F.broadcast(quotas), on=group_col)
        .withColumn("sample_rank", F.row_number().over(rank_w))
        .filter(F.col("sample_rank") <= F.col("quota"))
        .drop("__mx_h")
    )
    return out


def _quota_div(num: F.Column, den: F.Column) -> F.Column:
    """Nonnegative-operand integer division with a COLUMN denominator."""
    return ((num - F.pmod(num, den)) / den).cast("long")
