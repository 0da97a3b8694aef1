"""Temporal joins Spark lacks as primitives: as-of join and range
join, in shuffle-bounded formulations.

Neither exists in the reference (its only temporal op is window
alignment, G1/G2) nor in Spark's join menu — Spark would execute a
raw `a.ts >= b.ts` predicate as a broadcast-nested-loop or sort-merge
over the inequality, both quadratic-ish at scale. These are the two
standard scalable re-expressions:

- **as-of join**: union the two sides, one analytic window per key
  ordered by time, `last(payload, ignorenulls)` carries the most
  recent right row forward onto each left row. ONE shuffle (by key),
  zero join explosion, linear state — the classic
  points-to-latest-dimension match (trade enrichment, sensor
  alignment, "most recent click before this error").
- **range join**: bucketize time into window-width bins; a right row
  matching `(t, t+w]` can only live in the left row's bin or the next
  one, so an equi-join on (key, bin) with the exact predicate as a
  post-filter finds every pair while touching only adjacent-bin
  candidates. Join fan-out is bounded by per-bin density, never all
  pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    inner: bool = True,
) -> DataFrame:
    """For each left row, the most recent right row with
    ``right.time <= left.time`` within the same ``by`` group
    (backward-inclusive as-of semantics, DuckDB/pandas `merge_asof`
    default).

    ``right_cols`` are the right-side columns to carry (default: all
    but the keys/time); they appear suffixed. ``inner=True`` drops
    left rows with no match, like a bare ASOF JOIN; False keeps them
    with NULL payload (ASOF LEFT JOIN).

    Plan shape: union → single hash exchange on ``by`` → one
    analytic window. The payload travels as ONE struct column so all
    carried fields come from the same right row.

    NULL ``by`` keys: join equality (and DuckDB's ASOF JOIN) never
    matches NULL keys, but a window partition would group NULLs
    together and match them — so null-key RIGHT rows are dropped
    up front. Null-key left rows then can't match anything: inner
    drops them, outer keeps them with NULL payload — exactly the
    LEFT-join contract.
    """
    by = list(by)
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != time_col]
    right_cols = list(right_cols)

    payload = F.struct(
        F.col(time_col).alias(time_col),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rt = right.select(
        *by, F.col(time_col), F.lit(0).alias("__asof_side"), payload.alias("__asof_p")
    )
    left_cols = [c for c in left.columns if c not in by and c != time_col]
    lt = left.select(
        *by,
        F.col(time_col),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(rt.schema["__asof_p"].dataType).alias("__asof_p"),
        *left_cols,
    )
    # right rows (side 0) sort before left rows at an equal timestamp,
    # so an exactly-simultaneous right row IS matched (inclusive)
    u = lt.unionByName(rt.select(*by, time_col, "__asof_side", "__asof_p"), allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col), F.col("__asof_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__asof_m", F.last("__asof_p", ignorenulls=True).over(w))
    out = filled.filter(F.col("__asof_side") == 1).drop("__asof_side", "__asof_p")
    if inner:
        out = out.filter(F.col("__asof_m").isNotNull())
    for c in [time_col, *right_cols]:
        out = out.withColumn(f"{c}{suffix}", F.col("__asof_m")[c])
    return out.drop("__asof_m")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    window_seconds: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """All pairs (l, r) in the same ``by`` group with
    ``l.time < r.time <= l.time + window_seconds``.

    Candidate generation: both sides binned to window-width buckets of
    microseconds; a qualifying right row is in the left row's bucket
    or the next one, so the left side explodes ×2 over (bin, bin+1)
    and equi-joins (by, bin). The exact interval predicate filters
    candidates after the join. Shuffle is keyed by (by, bin) — at 100
    TB that is uniform and high-cardinality, and fan-out is bounded by
    actual per-window density (the answer size), never |L|×|R|.
    """
    by = list(by)
    w_us = int(window_seconds) * 1_000_000

    lt = left.withColumn("__rjb_tus", F.unix_micros(F.col(time_col)))
    rt = right.withColumn("__rjb_tus", F.unix_micros(F.col(time_col)))
    rt = rt.withColumn("__rjb_bin", (F.col("__rjb_tus") / w_us).cast("long"))
    cand = lt.withColumn("__rjb_b0", (F.col("__rjb_tus") / w_us).cast("long")).withColumn(
        "__rjb_bin", F.explode(F.array(F.col("__rjb_b0"), F.col("__rjb_b0") + 1))
    )

    keep_r = [c for c in right.columns if c not in by]
    r = rt.select(
        *by, "__rjb_bin", F.col("__rjb_tus").alias("__rjb_tus_r"),
        *[F.col(c).alias(f"{c}{suffix}") for c in keep_r],
    )
    j = cand.join(r, on=[*by, "__rjb_bin"])
    out = j.filter(
        (F.col("__rjb_tus_r") > F.col("__rjb_tus")) & (F.col("__rjb_tus_r") <= F.col("__rjb_tus") + w_us)
    )
    return out.drop("__rjb_tus", "__rjb_tus_r", "__rjb_bin", "__rjb_b0")
