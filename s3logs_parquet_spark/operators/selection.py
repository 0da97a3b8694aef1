"""Corpus-selection operators for training-data pipelines: per-group
frequency capping and budget-bounded prefix selection.

No counterpart in the reference (its only row selection is predicate
filtering, s3logs/src/utils.rs:56 event-type match); these extend the
engine's training-data surface the way the dedup/sampling families do:

- :func:`cap_per_group` — "at most N documents per domain", the
  standard guard against a single crawl source dominating a training
  mix (the RefinedWeb/CCNet-style domain cap). Selection within a
  group is deterministic bottom-``cap`` by content hash with id
  tie-break, so the SAME representatives are kept on any engine, any
  partitioning, any cluster size.
- :func:`budget_select` — "take the best documents until the token
  budget is spent": the greedy prefix of a (score DESC, id) total
  order under a cumulative weight budget, the canonical data-selection
  rule when a training run has a fixed token target.

Scale posture shared by both:

- **No global single-reducer window.** ``budget_select`` finds the
  budget BOUNDARY, not a global running sum: scores are binned
  arithmetically (deterministic ``floor(score·B)`` — no sampled range
  partitioner), per-bin weight totals are one tiny aggregate (≤ B
  rows, the sanctioned bounded collect), the driver locates the single
  boundary bin by prefix over B numbers, and only in-bin cumulative
  sums run under a window keyed by bin — parallelism = B, per-task
  state = one bin. Rows in bins strictly above the boundary are
  selected map-side; strictly below, rejected map-side.
- **Skew-safe capping.** ``cap_per_group`` never funnels a hot group
  into one sort task: a first rank window keyed by (group, input
  partition) prunes to ≤ cap rows per group PER PARTITION (a row whose
  local rank exceeds the cap cannot rank inside the cap globally —
  its global rank is at least its local rank), then the final
  per-group rank runs over the ≤ cap·P pre-reduced candidates only.
  Groups already under their cap bypass both windows entirely via the
  per-group count join — at 100 TB the long tail of small domains is
  most of the group mass and it stays map-only.
- **Integer-exact.** Budgets and weights are integers; cumulative
  sums never cross a float; the only float comparison (score order)
  is on values both engines compute identically (the rounded-score
  convention of the quality gates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash32


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int | Column,
    id_col: str,
    *,
    rank_col: str = "cap_rk",
    keep_col: str = "cap_keep",
) -> DataFrame:
    """Flag at most ``cap`` rows per group, chosen deterministically as
    the bottom-``cap`` by (content hash of id, id) within the group.

    ``cap`` may be an int or a Column expression over ``group_col``
    (e.g. a per-domain quota table expressed as a hash-derived
    function) — it must be constant within a group.

    Returns ``df`` plus two columns: ``keep_col`` (boolean — row is
    within its group's cap) and ``rank_col`` (the row's within-group
    hash rank, populated ONLY where the cap binds: rows of over-cap
    groups that made the cut. Under-cap groups bypass ranking — the
    whole point of the count-aware split — and dropped rows never get
    an exact global rank, because the two-level prune discards them
    before the final window; both carry NULL).

    Every input row is preserved (report shape); filter on
    ``keep_col`` for the production cut.
    """
    cap_expr = F.lit(cap) if isinstance(cap, int) else cap
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cg_n"))
    # per-group counts are one row per group — tiny against the corpus;
    # AQE broadcasts the join at runtime when they fit
    base = df.join(counts, group_col).withColumn("_cg_cap", cap_expr)

    under = base.filter(F.col("_cg_n") <= F.col("_cg_cap")).select(
        *df.columns,
        F.lit(None).cast("long").alias(rank_col),
        F.lit(True).alias(keep_col),
    )

    over = base.filter(F.col("_cg_n") > F.col("_cg_cap")).withColumn(
        "_cg_h", hash32(F.col(id_col).cast("string"))
    )
    local_w = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        "_cg_h", id_col
    )
    pruned = over.withColumn("_cg_rn", F.row_number().over(local_w))
    # local rank > cap ⇒ global rank > cap ⇒ dropped, decided map-side
    # after the partition-local window — no second exchange for these
    dropped_early = pruned.filter(F.col("_cg_rn") > F.col("_cg_cap")).select(
        *df.columns,
        F.lit(None).cast("long").alias(rank_col),
        F.lit(False).alias(keep_col),
    )
    final_w = Window.partitionBy(group_col).orderBy("_cg_h", id_col)
    finalists = (
        pruned.filter(F.col("_cg_rn") <= F.col("_cg_cap"))
        .withColumn("_cg_rk", F.row_number().over(final_w))
        .select(
            *df.columns,
            F.when(F.col("_cg_rk") <= F.col("_cg_cap"), F.col("_cg_rk"))
            .cast("long")
            .alias(rank_col),
            (F.col("_cg_rk") <= F.col("_cg_cap")).alias(keep_col),
        )
    )
    return under.unionByName(dropped_early).unionByName(finalists)


def budget_select(
    df: DataFrame,
    score_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    *,
    num_bins: int = 1024,
    selected_col: str = "selected",
) -> DataFrame:
    """Greedy budget-bounded prefix selection: walk rows in
    (``score_col`` DESC, ``id_col`` ASC) order and select while the
    running sum of ``weight_col`` stays ≤ ``budget`` — the standard
    "best docs until the token budget is spent" data-selection rule.

    ``score_col`` values must lie in [0, 1] (the quality-score
    convention); ``weight_col`` must be integral (token counts).
    Zero-weight rows inside the selected prefix are selected (they
    cost nothing); rows with NULL score are never selected.

    Scale shape (see module docstring): deterministic score bins →
    ≤ ``num_bins``-row aggregate collect → driver boundary-bin find →
    one bin-keyed window for in-bin running sums. The single full-data
    exchange is the bin window; rows outside the boundary bin decide
    map-side off the broadcast boundary. A variant that windows ONLY
    the boundary bin (filter + union) trades a second scan for a
    smaller exchange; at narrow row widths the single-window plan
    wins.

    Returns ``df`` plus boolean ``selected_col``. The flag is a pure
    function of the data and the budget — independent of partitioning
    and engine (the boundary is exact, not sampled).
    """
    nb = F.lit(num_bins)
    # guard the NULL-score path explicitly: Spark's least() IGNORES
    # nulls (returns the least non-null), which would silently file
    # null scores into the top bin instead of excluding them
    bin_expr = F.when(
        F.col(score_col).isNotNull(),
        F.least(F.floor(F.col(score_col) * nb).cast("int"), F.lit(num_bins - 1)),
    )
    base = df.withColumn("_bs_bin", bin_expr).withColumn(
        "_bs_w", F.col(weight_col).cast("long")
    )
    totals = {
        int(r["_bs_bin"]): int(r["w"])
        for r in base.filter(F.col("_bs_bin").isNotNull())
        .groupBy("_bs_bin")
        .agg(F.sum("_bs_w").alias("w"))
        .collect()
    }
    cum = 0
    boundary_bin: int | None = None
    boundary_rest = 0
    for b in sorted(totals, reverse=True):
        if cum + totals[b] > budget:
            boundary_bin, boundary_rest = b, budget - cum
            break
        cum += totals[b]
    if boundary_bin is None:
        # the whole corpus fits the budget — map-only, no window
        return df.withColumn(selected_col, F.col(score_col).isNotNull())
    in_bin_w = Window.partitionBy("_bs_bin").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    run = F.sum("_bs_w").over(in_bin_w)
    sel = F.when(F.col("_bs_bin") > boundary_bin, F.lit(True)).otherwise(
        (F.col("_bs_bin") == boundary_bin) & (run <= F.lit(boundary_rest))
    )
    return base.withColumn(selected_col, F.coalesce(sel, F.lit(False))).drop(
        "_bs_bin", "_bs_w"
    )
