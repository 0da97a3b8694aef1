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

from ..functions.timeops import epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    inner: bool = True,
    skew_chunk_seconds: int | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
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

    Skew: ONE window partition per key means a hot key (one user with
    10⁸ events) serializes onto one task. Pass ``skew_chunk_seconds``
    to route through :func:`asof_join_chunked` — identical semantics,
    parallelism = keys × time-chunks.

    Sizing (measured, PERF.md round 4, 10M rows on local[32]): with
    UNIFORM keys the base plan wins — 3.2 s vs 4.6 s for the best
    chunked run (the chunked variant pays two extra exchanges), so
    leave ``skew_chunk_seconds=None`` when per-key volumes are
    balanced. With a 60%-hot key the base plan serializes and loses
    4×: 20.3 s vs 5.1 s chunked. Crossover rule of thumb: chunk when
    the hottest key's row count exceeds ~10× the per-task average
    (i.e. one task's sort becomes the stage's critical path), and
    pick ``skew_chunk_seconds`` so the hot key lands ~10⁴-10⁵ rows
    per chunk — too coarse leaves serial runs (span/16 measured
    9.1 s), too fine pays carry-join overhead (span/1024: 6.7 s,
    vs span/256: 5.1 s).

    ``direction`` (pandas ``merge_asof`` surface): "backward" (default,
    most recent right at-or-before), "forward" (earliest right
    at-or-after), or "nearest" (smaller absolute gap; ties →
    backward). ``tolerance_seconds`` rejects matches further than the
    given gap (in seconds for timestamp time columns, in the column's
    own units for numeric time) — beyond-tolerance left rows behave as
    unmatched. Both run in the same union → one-exchange → analytic
    window plan ("nearest" evaluates two frames over the one
    exchange). The skew-chunked route supports backward only.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if skew_chunk_seconds is not None:
        if direction != "backward" or tolerance_seconds is not None:
            raise NotImplementedError(
                "asof_join: skew_chunk_seconds currently composes only with "
                "direction='backward' and no tolerance"
            )
        return asof_join_chunked(
            left, right, time_col, by, skew_chunk_seconds, right_cols, suffix, inner
        )
    if direction != "backward" or tolerance_seconds is not None:
        return _asof_general(
            left, right, time_col, by, right_cols, suffix, inner, direction, tolerance_seconds
        )
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


def _asof_general(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: Sequence[str],
    right_cols: Sequence[str] | None,
    suffix: str,
    inner: bool,
    direction: str,
    tolerance_seconds: float | None,
) -> DataFrame:
    """Directional/tolerant as-of: same union → single keyed exchange →
    analytic-window shape as the backward fast path, generalized.

    A numeric time key ``__asof_t`` (epoch micros for timestamp dtypes
    via the NTZ-safe policy, the raw value for numeric time) rides the
    union once; the payload struct carries it so gap arithmetic needs
    no re-derivation. Backward match = ``last(payload)`` over
    [-∞, current] ordered (t, right-first); forward match =
    ``first(payload)`` over [current, +∞] ordered (t, left-first) — the
    side tiebreak makes both directions inclusive of exactly-equal
    timestamps. "nearest" evaluates both frames over the SAME exchange
    (two in-partition sorts, zero extra shuffles) and picks the smaller
    gap, ties toward backward (pandas semantics)."""
    by = list(by)
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != time_col]
    right_cols = list(right_cols)

    dtype = dict(left.dtypes)[time_col]

    def t_num(df: DataFrame) -> F.Column:
        if dtype.startswith("timestamp"):
            return epoch_micros(df, time_col)
        return F.col(time_col).cast("long")

    tol = None
    if tolerance_seconds is not None:
        tol = (
            int(tolerance_seconds * 1_000_000)
            if dtype.startswith("timestamp")
            else tolerance_seconds
        )

    payload = F.struct(
        F.col("__asof_t").alias("_t"),
        F.col(time_col).alias(time_col),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rt = right.withColumn("__asof_t", t_num(right)).select(
        *by,
        F.col(time_col),
        "__asof_t",
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_p"),
    )
    left_cols = [c for c in left.columns if c not in by and c != time_col]
    lt = left.withColumn("__asof_t", t_num(left)).select(
        *by,
        F.col(time_col),
        "__asof_t",
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(rt.schema["__asof_p"].dataType).alias("__asof_p"),
        *left_cols,
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    cols = []
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*by)
            .orderBy(F.col("__asof_t"), F.col("__asof_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cols.append(F.last("__asof_p", ignorenulls=True).over(wb).alias("__asof_mb"))
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy(*by)
            .orderBy(F.col("__asof_t"), F.col("__asof_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        cols.append(F.first("__asof_p", ignorenulls=True).over(wf).alias("__asof_mf"))

    filled = u.select("*", *cols).filter(F.col("__asof_side") == 1).drop(
        "__asof_side", "__asof_p"
    )

    mb = F.col("__asof_mb") if direction in ("backward", "nearest") else None
    mf = F.col("__asof_mf") if direction in ("forward", "nearest") else None
    if tol is not None:
        if mb is not None:
            mb = F.when(F.col("__asof_t") - mb["_t"] <= F.lit(tol), mb)
        if mf is not None:
            mf = F.when(mf["_t"] - F.col("__asof_t") <= F.lit(tol), mf)
    if direction == "backward":
        m = mb
    elif direction == "forward":
        m = mf
    else:
        gap_b = F.col("__asof_t") - mb["_t"]
        gap_f = mf["_t"] - F.col("__asof_t")
        m = F.when(
            mb.isNotNull() & (mf.isNull() | (gap_b <= gap_f)), mb
        ).otherwise(mf)

    out = filled.withColumn("__asof_m", m).drop("__asof_mb", "__asof_mf", "__asof_t")
    if inner:
        out = out.filter(F.col("__asof_m").isNotNull())
    for c in [time_col, *right_cols]:
        out = out.withColumn(f"{c}{suffix}", F.col("__asof_m")[c])
    return out.drop("__asof_m")


def _chunk_col(df: DataFrame, time_col: str, chunk_seconds: int):
    """Time-chunk id for the two-pass as-of: timestamp columns chunk in
    wall seconds; numeric time columns chunk in their own units."""
    if dict(df.dtypes)[time_col].startswith("timestamp"):
        return F.floor(epoch_micros(df, time_col) / F.lit(int(chunk_seconds) * 1_000_000))
    return F.floor(F.col(time_col).cast("long") / F.lit(int(chunk_seconds)))


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    chunk_seconds: int = 3600,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    inner: bool = True,
) -> DataFrame:
    """Skew-safe as-of join: same semantics as :func:`asof_join`, but
    the analytic window is partitioned by (key, time-chunk), so a hot
    key parallelizes across its chunks instead of serializing onto one
    task.

    Two passes, classic segmented-scan decomposition:

    1. **within-chunk**: union → window over (key, chunk) ordered by
       (time, side) → ``last(payload, ignorenulls)`` — each left row
       gets the latest right row *in its own chunk* at-or-before it.
    2. **boundary carry-forward**: per (key, chunk), the latest right
       payload (one aggregate row per key×chunk — tiny); a running max
       over *strictly earlier* chunks gives each chunk its carry-in,
       which fills left rows whose within-chunk match is NULL.

    The carry frame is keys × active-chunks rows — the only per-key
    serial work, linear in the number of chunks, not events. Exchanges:
    (key, chunk) for the window [skew-bounded by chunk width], (key)
    over the tiny carry frame, and a (key, chunk) join of left against
    the carry table. Exact same output as ``asof_join`` for any
    ``chunk_seconds``; pick chunks so a hot key's densest chunk fits a
    task (e.g. hour chunks for ~10⁵ events/key/hour).
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
        *by,
        F.col(time_col),
        _chunk_col(right, time_col, chunk_seconds).alias("__asof_ck"),
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_p"),
    )
    left_cols = [c for c in left.columns if c not in by and c != time_col]
    lt = left.select(
        *by,
        F.col(time_col),
        _chunk_col(left, time_col, chunk_seconds).alias("__asof_ck"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(rt.schema["__asof_p"].dataType).alias("__asof_p"),
        *left_cols,
    )

    # pass 1 — within-chunk as-of (right rows sort first at equal ts →
    # inclusive match, same tiebreak as asof_join)
    u = lt.unionByName(
        rt.select(*by, time_col, "__asof_ck", "__asof_side", "__asof_p"),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(*by, "__asof_ck")
        .orderBy(F.col(time_col), F.col("__asof_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        u.withColumn("__asof_w", F.last("__asof_p", ignorenulls=True).over(w))
        .filter(F.col("__asof_side") == 1)
        .drop("__asof_side", "__asof_p")
    )

    # pass 2 — carry-in per (key, chunk): latest right payload of any
    # strictly-earlier chunk. The payload struct leads with the time
    # column, so max(struct) IS argmax-by-time.
    chunk_last = rt.groupBy(*by, "__asof_ck").agg(F.max("__asof_p").alias("__asof_cl"))
    left_chunks = lt.select(*by, "__asof_ck").distinct()
    all_chunks = left_chunks.unionByName(chunk_last.select(*by, "__asof_ck")).distinct()
    wc = (
        Window.partitionBy(*by)
        .orderBy("__asof_ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_chunks.join(chunk_last, on=[*by, "__asof_ck"], how="left")
        .withColumn("__asof_ci", F.max("__asof_cl").over(wc))
        .select(*by, "__asof_ck", "__asof_ci")
    )

    out = filled.join(carry, on=[*by, "__asof_ck"], how="left").withColumn(
        "__asof_m", F.coalesce(F.col("__asof_w"), F.col("__asof_ci"))
    ).drop("__asof_ck", "__asof_w", "__asof_ci")
    if inner:
        out = out.filter(F.col("__asof_m").isNotNull())
    for c in [time_col, *right_cols]:
        out = out.withColumn(f"{c}{suffix}", F.col("__asof_m")[c])
    return out.drop("__asof_m")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] = ("user_id",),
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    max_span_seconds: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """All pairs (l, r) in the same ``by`` group whose CLOSED intervals
    overlap: ``l.start <= r.end AND r.start <= l.end`` — the general
    interval-overlap join (attribution windows, downtime × request
    spans, sensor validity ranges). Point-in-interval is the degenerate
    case ``right_start == right_end``.

    Scalable formulation (the missing Spark primitive — a raw overlap
    predicate would execute as a quadratic-ish nested-loop/sort-merge
    over inequalities): time is binned at ``max_span_seconds``, a
    declared upper bound on BOTH sides' interval lengths. Each right
    interval lands in exactly one bin (its start's); a left interval
    [ls, le] can only overlap right intervals whose start falls in
    [ls - max_span, le], i.e. bins [bin(ls) - 1 .. bin(le)] — at most
    three, so the left side explodes ≤ 3× into an equi-join on
    (by, bin) with the exact predicate as a post-filter. Each
    candidate pair arises in exactly one bin (the right's), so no
    dedup pass is needed. Shuffle is keyed by (by, bin) — uniform and
    high-cardinality at scale; fan-out is bounded by true per-window
    density.

    The span bound is enforced per row at execution (map-side
    ``raise_error``, no extra job): a silent violation would silently
    drop pairs, the one failure mode a candidate-generation scheme
    must not have. Timestamp columns go through the NTZ-safe
    ``epoch_micros`` policy; numeric time columns bin in their own
    units (``max_span_seconds`` then reads as "max span in column
    units").
    """
    by = list(by)
    w_us_l = _span_unit(left, left_start) * int(max_span_seconds)
    w_us_r = _span_unit(right, right_start) * int(max_span_seconds)
    if w_us_l != w_us_r:
        raise TypeError(
            "interval_join: both sides must use the same time-unit class "
            "(timestamp vs numeric) — left and right bins would not align"
        )
    w_us = w_us_l

    def t_num(df: DataFrame, col: str) -> Column:
        if dict(df.dtypes)[col].startswith("timestamp"):
            return epoch_micros(df, col)
        return F.col(col).cast("long")

    def to_bin(c: Column) -> Column:
        # exact integer floor division (pmod >= 0 makes it floor for
        # negative numeric time too) — no double rounding at boundaries
        return ((c - F.pmod(c, F.lit(w_us))) / F.lit(w_us)).cast("long")

    def guarded_end(df: DataFrame, start: str, end: str, w: int, side: str) -> Column:
        s, e = t_num(df, start), t_num(df, end)
        return F.when(
            (e - s < 0) | (e - s > w),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: {side} interval violates 0 <= span <= "
                        f"max_span ({w} units): start="
                    ),
                    F.col(start).cast("string"),
                    F.lit(" end="),
                    F.col(end).cast("string"),
                )
            ).cast("long"),
        ).otherwise(e)

    rt = right.select(
        *by,
        t_num(right, right_start).alias("__ivj_rs"),
        guarded_end(right, right_start, right_end, w_us, "right").alias("__ivj_re"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in by
        ],
    ).withColumn("__ivj_bin", to_bin(F.col("__ivj_rs")))

    lt = left.select(
        "*",
        t_num(left, left_start).alias("__ivj_ls"),
        guarded_end(left, left_start, left_end, w_us, "left").alias("__ivj_le"),
    )
    lt = lt.withColumn(
        "__ivj_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    to_bin(F.col("__ivj_ls")) - 1,
                    to_bin(F.col("__ivj_ls")),
                    to_bin(F.col("__ivj_le")),
                )
            )
        ),
    )

    j = lt.join(rt, on=[*by, "__ivj_bin"])
    out = j.filter(
        (F.col("__ivj_ls") <= F.col("__ivj_re"))
        & (F.col("__ivj_rs") <= F.col("__ivj_le"))
    )
    return out.drop("__ivj_ls", "__ivj_le", "__ivj_rs", "__ivj_re", "__ivj_bin")


def _span_unit(df: DataFrame, col: str) -> int:
    """Micros per second for timestamp columns, 1 for numeric time."""
    return 1_000_000 if dict(df.dtypes)[col].startswith("timestamp") else 1


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

    def to_bin(c: Column) -> Column:
        # exact integer floor division, aligned with interval_join's
        # binning (pmod >= 0 makes this floor for negative numeric time
        # too; bare `/ w` casts truncate toward zero and mis-bin
        # pre-epoch / negative time by one)
        return ((c - F.pmod(c, F.lit(w_us))) / F.lit(w_us)).cast("long")

    lt = left.withColumn("__rjb_tus", epoch_micros(left, time_col))
    rt = right.withColumn("__rjb_tus", epoch_micros(right, time_col))
    rt = rt.withColumn("__rjb_bin", to_bin(F.col("__rjb_tus")))
    cand = lt.withColumn("__rjb_b0", to_bin(F.col("__rjb_tus"))).withColumn(
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
