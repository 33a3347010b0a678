"""Distributed as-of join — the time-series join Spark lacks natively.

The reference never needs a true as-of join because its grids are validated
gap-free (`/root/reference/mlforecast/core.py:1124-1170` aligns exogenous
columns with a plain time-offset equi join), but real panel pipelines
constantly align IRREGULAR feeds: trades to quotes, sensor readings to the
latest calibration, a forecast origin to the most recent macro print. DuckDB
ships `ASOF JOIN` as a first-class operator; this module is the Spark-native
equivalent (and the pytest oracle runs DuckDB's own ASOF JOIN against it).

Shape — the union-window trick, NO range-explosion and NO per-key collect:
tag right rows 0 and left rows 1, union the two frames on (keys, ts), and
take a running `F.last(struct(right_cols), ignorenulls=True)` over a window
partitioned by the keys and ordered by (ts, tag); left rows then carry the
most recent right row at or before them, in ONE shuffle on the join keys —
the same exchange any per-key window pays, linear in rows, skew-bounded by
rows-per-key. A range join would explode candidates (left x right within
tolerance) and a broadcast loop would cap the right side; the union-window
form is the standard scale-out as-of (same plan family as sessionization).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _block_expr(on: str, dtype: str) -> Optional[Column]:
    """Numeric blocking expression for the ``on`` column, or None when the
    type has no natural numeric axis. Units: the column's own for numerics,
    microseconds for timestamps, days for dates — ``block_size`` is
    expressed in these units."""
    dtype = dtype.lower()
    if dtype in _NUMERIC_DTYPES or dtype.startswith("decimal"):
        return F.col(on)
    if dtype.startswith("timestamp"):
        # unix_micros rejects TIMESTAMP_NTZ; the cast maps NTZ onto the
        # session zone — any monotonic mapping works for blocking
        return F.unix_micros(F.col(on).cast("timestamp"))
    if dtype == "date":
        return F.unix_date(F.col(on))
    return None


def derive_asof_bins(df: DataFrame, on: str, n_bins: Optional[int] = None):
    """Equi-depth bin BOUNDARIES for a keyless as-of over ``df``'s ``on``
    column (one sampled ``approxQuantile`` pass). The returned list can be
    passed as ``asof_join(block_size=boundaries)`` to skip the per-call
    derive — the streaming enrich path computes these ONCE from the
    reference table at query start and reuses them for every micro-batch.
    Returns a (possibly short) list of floats; fewer than 2 distinct
    boundaries means the domain is a single point (callers should fall
    back to ``block_size=None``). Bins only affect parallelism, never
    results, so boundaries derived from one input (or a stale snapshot)
    remain correct for any other."""
    bexpr = _block_expr(on, dict(df.dtypes)[on])
    if bexpr is None:
        raise ValueError(
            f"derive_asof_bins needs a numeric/timestamp/date 'on' column; "
            f"{on!r} is {dict(df.dtypes)[on]}"
        )
    if n_bins is None:
        # clamp: the bin probe is O(n_bins) literal comparisons PER ROW, so
        # on a large cluster (defaultParallelism in the thousands) an
        # unclamped count would turn the projection into the bottleneck;
        # 1024 blocks keep the carry spine tiny and bound the per-row work
        # while still giving the scheduler plenty of parallel partitions
        n_bins = min(
            max(df.sparkSession.sparkContext.defaultParallelism * 8, 64), 1024
        )
    probs = [i / n_bins for i in range(1, n_bins)]
    qs = df.filter(F.col(on).isNotNull()).select(bexpr.alias("_v")).approxQuantile(
        "_v", probs, 0.01
    )
    return sorted(set(qs))


def _derive_block_bins(left, right, on, bexpr) -> Optional[Column]:
    """Auto blocking column for the keyless as-of: EQUI-DEPTH quantile bins
    over the observed ``on`` values of both inputs (one sampled
    ``approxQuantile`` pass — the same sanctioned derive-then-plan pattern
    as ``semantic_dedup``'s ``n_lists``), ~8 bins per core. Equi-depth
    (count of boundaries below the value, a monotone integer — exactly
    what the carry stitch needs) instead of fixed-width ``floor(on / s)``
    because a temporally skewed feed concentrates fixed-width blocks onto
    a few ids and the scan collapses back toward one task; quantile bins
    hold ~equal ROWS per block regardless of the distribution. Returns
    None (single-window fallback) for empty inputs or a single-point
    domain."""
    n_bins = min(
        max(left.sparkSession.sparkContext.defaultParallelism * 8, 64), 1024
    )
    u = left.select(bexpr.alias("_v")).unionByName(right.select(bexpr.alias("_v")))
    probs = [i / n_bins for i in range(1, n_bins)]
    qs = u.approxQuantile("_v", probs, 0.01)
    return _bins_to_expr(qs, bexpr)


def _bins_to_expr(boundaries, bexpr) -> Optional[Column]:
    """Blocking Column from explicit equi-depth boundaries: count of
    boundaries strictly below the value — a monotone integer, exactly what
    the carry stitch needs. None for <2 distinct boundaries."""
    boundaries = sorted({float(b) for b in boundaries})
    if len(boundaries) < 2:
        return None
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    bin_expr = F.aggregate(
        F.transform(arr, lambda b: (bexpr.cast("double") > b).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    # one-element shuffle() barrier: the VALUE is unchanged, but the
    # nondeterministic flag stops InferFiltersFromConstraints from tracing
    # the bin back to the `on` column — with the raw HOF expression as a
    # group key, a downstream IS NOT NULL filter on any output column made
    # that rule manufacture a predicate referencing `on` and push it into
    # the post-aggregation spine, where the attribute no longer exists
    # ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] at execution)
    return F.element_at(F.shuffle(F.array(bin_expr)), 1)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: Optional[Column | int | float] = None,
    suffix: str = "_right",
    block_size: Union[int, float, None, str, Sequence[float]] = "auto",
    left_on: Optional[str] = None,
    right_on: Optional[str] = None,
    left_by: Optional[Sequence[str]] = None,
    right_by: Optional[Sequence[str]] = None,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """pandas.merge_asof semantics on Spark DataFrames.

    For each left row, attach the single right row with the nearest ``on``
    value at-or-before it (``direction='backward'``, the default),
    at-or-after it (``'forward'``), or closest in either direction
    (``'nearest'`` — pandas tie rule: equidistant resolves backward),
    matching within ``by`` groups. ``allow_exact_matches=False`` makes the
    match strictly before/after (both bounds, for nearest).
    ``tolerance`` (same units as ``on``: a number for numeric/long columns,
    or e.g. ``F.expr("INTERVAL 1 HOUR")`` for timestamps) nulls out matches
    further away than the bound — rows keep their left columns, like
    pandas. Right columns arrive suffixed on name collisions.

    Null ``on`` keys: pandas raises; here right rows with a null ``on``
    are dropped (they can never be a nearest match) and left rows with a
    null ``on`` pass through with null right columns — deterministic on
    both the window and blocked paths. Ties among right rows at the same
    (by, on) resolve like pandas.merge_asof on a sorted frame: the LAST
    duplicate in SCAN ORDER for ``backward``, the FIRST for ``forward``.
    Scan order is stable only while the right side's partitioning is —
    after a shuffle, AQE repartitioning, or a different file split the
    chosen duplicate can change between runs. When deterministic duplicate
    resolution matters, pass ``tiebreak='colname'``: a right-side column
    whose values order the duplicates (e.g. a sequence number); the
    largest wins for ``backward``, the smallest for ``forward``,
    regardless of scan order.

    One shuffle on ``by`` (plus the window sort); both inputs are scanned
    once. 100 TB note: skew = rows per ``by`` group, identical to any
    per-series window in this engine. A KEYLESS as-of (``by=()``) would
    funnel every row through one window partition, so BY DEFAULT
    (``block_size='auto'``) it derives EQUI-DEPTH time blocks from the
    observed ``on`` distribution (one sampled ``approxQuantile`` pass,
    ~8 bins per core — equi-depth so a temporally SKEWED feed still
    spreads ~equal rows per block, where fixed-width blocks would
    collapse onto a few ids) and runs the BLOCKED scan: the running match
    is computed per (by, block) in parallel, and block boundaries are
    stitched with a carry-in frame of ONE row per non-empty block (the
    extreme right payload of each block, windowed over the tiny block
    spine and broadcast back) — bit-identical results at any blocking.
    Pass an explicit numeric ``block_size`` for fixed-width
    ``floor(on / block_size)`` blocks (numeric ``on`` units; microseconds
    for timestamps, days for dates — also useful for a KEYED join with
    one giant/skewed key), a list of boundaries from
    :func:`derive_asof_bins` to reuse precomputed equi-depth bins (skips
    the per-call ``approxQuantile`` job — what the streaming enrich path
    does across micro-batches), or ``block_size=None`` to force the
    single-window plan (the only path for non-blockable ``on`` types).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    # pandas-parity kwargs for differently-named keys: rename the RIGHT
    # side's columns to the left's names up front; everything downstream
    # then sees one shared name per key (output uses the left names, like
    # pandas.merge_asof)
    if (left_on is None) != (right_on is None):
        raise ValueError("left_on and right_on must be passed together")
    if left_on is not None:
        if left_on != right_on and left_on in right.columns:
            raise ValueError(
                f"cannot rename right {right_on!r} to {left_on!r}: the right "
                "side already has a column with that name"
            )
        right = right.withColumnRenamed(right_on, left_on)
        on = left_on
    if (left_by is None) != (right_by is None):
        raise ValueError("left_by and right_by must be passed together")
    if left_by is not None:
        left_by, right_by = list(left_by), list(right_by)
        if len(left_by) != len(right_by):
            raise ValueError("left_by and right_by must have the same length")
        for lb, rb in zip(left_by, right_by):
            if lb != rb and lb in right.columns:
                raise ValueError(
                    f"cannot rename right {rb!r} to {lb!r}: the right side "
                    "already has a column with that name"
                )
            right = right.withColumnRenamed(rb, lb)
        by = left_by
    by = list(by)
    if on in by:
        raise ValueError(f"'on' column {on!r} cannot also be a 'by' key")
    bexpr = _block_expr(on, dict(right.dtypes)[on])
    # pandas rejects null merge keys; we drop them from the right (never a
    # valid nearest match) so the running last can't smear a null-ts payload
    right = right.filter(F.col(on).isNotNull())
    blk_expr = None
    if isinstance(block_size, str):
        if block_size != "auto":
            raise ValueError(
                f"block_size must be 'auto', a number, a boundary list or "
                f"None, got {block_size!r}"
            )
        block_size = None
        if not by and bexpr is not None:
            blk_expr = _derive_block_bins(left, right, on, bexpr)
    elif block_size is not None and bexpr is None:
        raise ValueError(
            f"block_size requires a numeric/timestamp/date 'on' column; "
            f"{on!r} is {dict(right.dtypes)[on]}"
        )
    elif isinstance(block_size, (list, tuple)):
        blk_expr = _bins_to_expr(block_size, bexpr)
        block_size = None
    val_cols = [c for c in right.columns if c != on and c not in by]
    if not val_cols:
        raise ValueError("right side has no value columns beyond the join keys")
    out_name = {
        c: (c + suffix if c in left.columns else c) for c in val_cols
    }
    if len(set(out_name.values())) != len(out_name):
        raise ValueError(
            f"suffixed right columns collide: {sorted(out_name.values())}"
        )
    on_right = on + "__asof_r"

    # right rows carry their payload in one struct so every attached value
    # comes from the SAME right row; left rows carry null (ignorenulls skips
    # them in the running last)
    payload = F.struct(
        F.col(on).alias(on_right), *[F.col(c).alias(out_name[c]) for c in val_cols]
    )
    # __asof_s: per-row sequence id on the right — the tiebreaker among
    # right rows tied on (by, on). Default is monotonically_increasing_id
    # (no shuffle; ids follow scan order, so "last/first duplicate" matches
    # pandas on a sorted feed but is only repeatable while the right side's
    # partitioning is); an explicit `tiebreak` column replaces it with a
    # user-owned, scan-order-independent ordering.
    if tiebreak is not None:
        if tiebreak not in right.columns:
            raise ValueError(f"tiebreak column {tiebreak!r} not in right side")
        if tiebreak == on or tiebreak in by:
            raise ValueError(
                f"tiebreak column {tiebreak!r} cannot be a join key"
            )
        seq_expr = F.col(tiebreak)
        seq_type = right.schema[tiebreak].dataType
    else:
        seq_expr = F.monotonically_increasing_id()
        seq_type = "long"
    r = right.select(
        *by,
        F.col(on),
        payload.alias("__asof_p"),
        F.lit(0).alias("__asof_t"),
        seq_expr.alias("__asof_s"),
    )
    l = left.select(
        "*", F.lit(None).cast(r.schema["__asof_p"].dataType).alias("__asof_p"),
        F.lit(1).alias("__asof_t"),
    ).withColumn("__asof_s", F.lit(None).cast(seq_type))
    # align schemas: right side gets nulls for the left-only columns
    for c in left.columns:
        if c not in by and c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)
    u = l.unionByName(r)

    # both sides share ONE ascending ordering axis (so 'nearest' costs one
    # shuffle, not two): the backward match is a running LAST over the
    # preceding frame, the forward match a running FIRST over the following
    # frame. The second sort key encodes exact-match semantics per side —
    # backward+allow_exact needs the equal-ts right row visible in the
    # preceding frame (right sorts before left), forward+allow_exact needs
    # it in the following frame (right sorts after left); strict flips
    # each. The seq tiebreaker only ever compares right rows against right
    # rows (the side keys differ across tags): both frames land on the
    # pandas duplicate — LAST in scan order for backward (last of seq asc
    # in the preceding frame), FIRST for forward (first in the following).
    sides = ["backward", "forward"] if direction == "nearest" else [direction]
    t = F.col("__asof_t")

    def _order(side):
        if side == "backward":
            k2 = t if allow_exact_matches else (1 - t)
        else:
            k2 = (1 - t) if allow_exact_matches else t
        return [F.col(on).asc(), k2.asc(), F.col("__asof_s").asc()]

    if block_size is not None and blk_expr is None:
        blk_expr = F.floor(bexpr / F.lit(block_size)).cast("long")
    if blk_expr is not None:
        matched = _asof_blocked(u, on, by, _order, sides, blk_expr)
    else:
        base = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
        for side in sides:
            w = base.orderBy(*_order(side))
            if side == "backward":
                expr = F.last("__asof_p", ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
            else:
                expr = F.first("__asof_p", ignorenulls=True).over(
                    w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
                )
            u = u.withColumn(f"__asof_m_{side}", expr)
        matched = u.filter(F.col("__asof_t") == 1)

    if direction == "nearest":
        mb, mf = F.col("__asof_m_backward"), F.col("__asof_m_forward")
        db = F.col(on) - mb[on_right]
        df_ = mf[on_right] - F.col(on)
        # pandas tie rule: equidistant -> backward; exact matches arrive via
        # the backward side (distance 0 is unbeatable)
        chosen = F.when(
            mb.isNotNull() & (mf.isNull() | (db <= df_)), mb
        ).otherwise(mf)
        matched = matched.withColumn("__asof_m", chosen)
        gap = F.when(
            F.col("__asof_m")[on_right] <= F.col(on),
            F.col(on) - F.col("__asof_m")[on_right],
        ).otherwise(F.col("__asof_m")[on_right] - F.col(on))
    else:
        matched = matched.withColumn("__asof_m", F.col(f"__asof_m_{direction}"))
        gap = (
            F.col(on) - F.col("__asof_m")[on_right]
            if direction == "backward"
            else F.col("__asof_m")[on_right] - F.col(on)
        )

    # a null-`on` left row has no position on the axis: null match (the
    # forward side's nulls-last position would otherwise hand it the
    # globally-last running payload)
    valid = F.col(on).isNotNull()
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        valid = valid & (gap <= tol)
    m = F.when(valid, F.col("__asof_m"))
    out_cols = [F.col(c) for c in left.columns] + [
        m[out_name[c]].alias(out_name[c]) for c in val_cols
    ]
    return matched.select(*out_cols)


def _asof_blocked(u, on, by, order_fn, sides, blk_expr):
    """Blocked as-of scan: running match per (by, time-block) in parallel +
    a carry-in stitched across blocks, computed for each requested side
    ('backward' / 'forward' / both for nearest) in ONE pass — one in-block
    window per side over the same (by, block) partitioning, one spine
    aggregation carrying both extremes, one broadcast join back.

    The carry frame is ONE row per non-empty (by, block): the extreme right
    payload of the block per side (max_by for backward, min_by for forward
    — any carried match is from a strictly different block, so within-block
    exact-match ordering never applies to it; seq rides in the extreme key
    so duplicate-timestamp ties match the window path: LAST duplicate for
    backward, FIRST for forward). Blocks with no right rows inherit through
    the running last/first over the tiny block spine. The spine join back
    is broadcast; null by-keys join null-safe."""
    u_cols = list(u.columns)
    u = u.withColumn("__asof_b", blk_expr)
    for side in sides:
        w_in = Window.partitionBy(*by, "__asof_b").orderBy(*order_fn(side))
        if side == "backward":
            expr = F.last("__asof_p", ignorenulls=True).over(
                w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            expr = F.first("__asof_p", ignorenulls=True).over(
                w_in.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        u = u.withColumn(f"__asof_run_{side}", expr)

    # spine + per-block extremes in ONE aggregation: the composite key ranks
    # every right row above every left row, so blocks with any right row
    # yield its extreme payload and left-only blocks yield a null payload
    # (their carry comes from the running scan below). No spine-join, no
    # shared-lineage self-join hazard.
    aggs = []
    if "backward" in sides:
        key_b = F.struct(
            (F.col("__asof_t") == 0).cast("int"), F.col(on), F.col("__asof_s")
        )
        aggs.append(F.max_by("__asof_p", key_b).alias("__asof_e_backward"))
    if "forward" in sides:
        key_f = F.struct(
            (F.col("__asof_t") == 1).cast("int"), F.col(on), F.col("__asof_s")
        )
        aggs.append(F.min_by("__asof_p", key_f).alias("__asof_e_forward"))
    spine = u.groupBy(*by, "__asof_b").agg(*aggs)
    w_sp = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
    ).orderBy(F.col("__asof_b").asc())
    carry_cols = []
    for side in sides:
        if side == "backward":
            c = F.last(f"__asof_e_{side}", ignorenulls=True).over(
                w_sp.rowsBetween(Window.unboundedPreceding, -1)
            )
        else:
            c = F.first(f"__asof_e_{side}", ignorenulls=True).over(
                w_sp.rowsBetween(1, Window.unboundedFollowing)
            )
        carry_cols.append(c.alias(f"__asof_c_{side}"))
    carry = spine.select(*by, "__asof_b", *carry_cols).alias("__asof_sp")
    ua = u.alias("__asof_u")
    cond = F.col("__asof_u.__asof_b") == F.col("__asof_sp.__asof_b")
    for c in by:
        cond = cond & F.col(f"__asof_u.`{c}`").eqNullSafe(F.col(f"__asof_sp.`{c}`"))
    joined = ua.join(F.broadcast(carry), cond, "left")
    return joined.filter(F.col("__asof_t") == 1).select(
        *[F.col(f"__asof_u.`{c}`").alias(c) for c in u_cols],
        *[
            F.coalesce(
                F.col(f"__asof_u.__asof_run_{side}"),
                F.col(f"__asof_sp.__asof_c_{side}"),
            ).alias(f"__asof_m_{side}")
            for side in sides
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    lo: str,
    hi: str,
    right_on: str,
    by: Sequence[str] = (),
    block_size: int | float = 1,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair every left row with the right rows
    whose ``right_on`` value lies in ``[left.lo, left.hi]`` (inclusive),
    within ``by`` groups — sessionized events to windows, readings to
    maintenance intervals, prints to embargo ranges.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin /
    cartesian — O(|L| x |R|), a guaranteed 100 TB cliff. This compiles the
    range to an EQUI join instead, the same block trick as the pooled
    rolling-quantile path (`core.py:_apply_pooled_rolling_quantile`): values
    bucket into blocks of ``block_size`` (`floor(v / block_size)`), each
    left interval explodes into the blocks it overlaps
    (`sequence(floor(lo/s), floor(hi/s))` — `width/block_size + 1` rows),
    each right row lands in exactly one, and the range predicate becomes a
    residual filter on the hash join. Pick ``block_size`` near the TYPICAL
    interval width: too small multiplies left rows, too large piles
    unrelated rows into shared buckets — both degrade linearly, never
    quadratically, and the join stays a shuffled hash/sort-merge on
    (by, block). Numeric or epoch-encoded ``on`` columns (cast timestamps
    with ``F.unix_micros`` upstream). ``how='inner'`` (default) emits each
    qualifying (left, right) pair exactly once — a right row lives in
    exactly one block, so the exploded join cannot duplicate pairs.
    ``how='left'`` additionally keeps every left interval that matched
    NOTHING (once, with null right columns — inverted intervals included);
    ``how='left_anti'`` returns ONLY those unmatched left rows. Both are
    the inner result plus/only a left_anti join on the left frame — one
    extra semi-join-shaped pass, never a row explosion.
    """
    if how not in ("inner", "left", "left_anti"):
        raise ValueError(f"how must be 'inner', 'left' or 'left_anti', got {how!r}")
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    by = list(by)
    bad = [c for c in (lo, hi) if c not in left.columns]
    if bad or right_on not in right.columns:
        raise ValueError(f"missing join columns: left {bad}, right {right_on!r}")
    collide = [c for c in right.columns if c in left.columns and c not in by]
    if collide:
        raise ValueError(
            f"overlapping non-key columns {collide}: rename/suffix them first"
        )
    s = F.lit(block_size)
    # qualified aliases keep the join self-join-safe (both sides are often
    # derived from the same scan — Spark's ambiguity check would reject
    # unqualified attribute references)
    # inverted intervals (lo > hi) match nothing, but a bare sequence() would
    # COUNT DOWN floor(lo/s)..floor(hi/s) — a huge candidate explosion the
    # residual filter then discards; gate it so they explode to zero blocks
    # (explode drops null arrays, preserving inner-join semantics)
    l = left.withColumn(
        "__rj_blk",
        F.explode(
            F.when(
                F.col(lo) <= F.col(hi),
                F.sequence(
                    F.floor(F.col(lo) / s).cast("long"),
                    F.floor(F.col(hi) / s).cast("long"),
                ),
            )
        ),
    ).alias("__rj_l")
    r = right.withColumn(
        "__rj_blk", F.floor(F.col(right_on) / s).cast("long")
    ).alias("__rj_r")
    lc = lambda c: F.col(f"__rj_l.`{c}`")  # noqa: E731
    rc = lambda c: F.col(f"__rj_r.`{c}`")  # noqa: E731
    cond = lc("__rj_blk") == rc("__rj_blk")
    for c in by:
        cond = cond & lc(c).eqNullSafe(rc(c))
    cond = cond & (rc(right_on) >= lc(lo)) & (rc(right_on) <= lc(hi))
    joined = l.join(r, cond, "inner")
    inner = joined.select(
        *[lc(c).alias(c) for c in left.columns],
        *[rc(c).alias(c) for c in right.columns if c not in by],
    )
    if how == "inner":
        return inner
    rtypes = dict(right.dtypes)
    # null-safe anti join on RENAMED match keys: `on=` column-name equality
    # is null-unsafe (a left row with any NULL column would never match and
    # leak into `unmatched` even when it produced pairs), and unrenamed refs
    # would be ambiguous (inner derives from left)
    lcols = list(left.columns)
    matched_keys = inner.select(
        *[F.col(c).alias(f"__rj_m_{i}") for i, c in enumerate(lcols)]
    ).dropDuplicates()
    anti_cond = F.lit(True)
    for i, c in enumerate(lcols):
        anti_cond = anti_cond & F.col(c).eqNullSafe(F.col(f"__rj_m_{i}"))
    unmatched = left.join(matched_keys, anti_cond, "left_anti")
    if how == "left_anti":
        return unmatched
    return inner.unionByName(
        unmatched.select(
            "*",
            *[
                F.lit(None).cast(rtypes[c]).alias(c)
                for c in right.columns
                if c not in by
            ],
        )
    )
