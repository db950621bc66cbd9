"""As-of (temporal) join.

The reference delegates range/as-of joins to its embedded engine
(SURVEY §2.2 "Range / as-of / interval joins"); Spark has no built-in
as-of join, so this is a composition of existing DataFrame ops.

Implementation: the union-sort trick — tag both sides, union by name,
and carry the most recent (or next, for ``direction="forward"``)
right-side row across with ``last(..., ignorenulls=True)`` over a
(keys, time)-ordered window.

Scale characteristics (the reason this shape is chosen over a range
self-join): exactly ONE shuffle on the join keys, no range-explosion
cross product, no broadcast requirement on either side
(``direction="nearest"`` adds a second window SORT over the same
partitioning, still one Exchange). Skewed keys behave like any window
partition (AQE does not split windows — salt the key upstream if one
entity dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    *,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach one right row matching on the ``by``
    keys, selected by ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): most recent right row with
      ``right.on <= left.on`` (``<`` when ``strict`` — pandas
      ``allow_exact_matches=False``);
    - ``"forward"``: next right row with ``right.on >= left.on``
      (``>`` when ``strict``);
    - ``"nearest"``: whichever of the two is closer in ``on``; exact
      ties go backward (pandas tie rule).

    ``tolerance`` (same units as ``on``; e.g. seconds when ``on`` is
    cast appropriately) null-outs matches farther than the bound.
    Left rows with no admissible right row keep NULLs (LEFT ASOF JOIN
    semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``on`` must be an identically-named ordering column on both sides;
    ``right_cols`` selects which right columns to attach (default: all
    non-key, non-time columns).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_cols = [c + suffix if c in left.columns else c for c in right_cols]

    lhs = left.withColumn("__is_left", F.lit(1))
    # The whole right row rides in ONE struct (its own time first, for
    # tolerance / nearest distance math): filling the struct with a
    # single last(ignorenulls) guarantees every attached column comes
    # from the SAME right row — per-column fills would skip NULL values
    # in individual columns and stitch a frankenrow across rows.
    rhs = (
        # a NULL time can never satisfy <=/>=; dropping such rows up
        # front also stops them sorting NULLS-FIRST into the backward
        # scan and filling as phantom matches (pandas merge_asof
        # likewise requires non-null keys)
        right.where(F.col(on).isNotNull())
        .select(
            *by,
            F.col(on),
            F.struct(
                F.col(on).alias("__rt"),
                *[F.col(c).alias(a) for c, a in zip(right_cols, out_cols)],
            ).alias("__pack"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    # allowMissingColumns fills each side's missing columns with NULLs.
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    directions = (
        ["backward", "forward"] if direction == "nearest" else [direction]
    )
    filled = unioned
    for d in directions:
        # At equal time the right row must be admissible for non-strict
        # semantics (sort before the left row) and inadmissible for
        # strict — regardless of scan direction.
        tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
        order = F.col(on).asc() if d == "backward" else F.col(on).desc()
        w = (
            Window.partitionBy(*by)
            .orderBy(order, tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = filled.select(
            "*",
            F.last("__pack", ignorenulls=True).over(w).alias(f"__{d}_pack"),
        )

    rows = filled.where(F.col("__is_left") == 1)

    def _valid(d):
        rt = F.col(f"__{d}_pack.__rt")
        # rt non-null implies the pack exists; checking rt (not just the
        # struct) also guards any future path that packs a NULL time
        ok = rt.isNotNull()
        if tolerance is not None:
            dist = (
                F.col(on) - rt if d == "backward" else rt - F.col(on)
            )
            ok = ok & (dist <= F.lit(tolerance))
        return ok

    if direction == "nearest":
        vb, vf = _valid("backward"), _valid("forward")
        b_dist = F.col(on) - F.col("__backward_pack.__rt")
        f_dist = F.col("__forward_pack.__rt") - F.col(on)
        use_b = vb & (~F.coalesce(vf, F.lit(False)) | (b_dist <= f_dist))
        picked = [
            F.when(use_b, F.col(f"__backward_pack.{a}"))
            .when(vf, F.col(f"__forward_pack.{a}"))
            .alias(a)
            for a in out_cols
        ]
    else:
        v = _valid(direction)
        picked = [
            F.when(v, F.col(f"__{direction}_pack.{a}")).alias(a)
            for a in out_cols
        ]
    return rows.select(*left.columns, *picked)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED intervals overlap
    (``l.start <= r.end AND r.start <= l.end``) — the second temporal
    join Spark lacks (as-of attaches a point to ONE row; this pairs
    interval SETS: sessions × incident windows, shifts × outages,
    exposure × event spans).

    A naive formulation is an inequality join — Catalyst can only
    BNL/cartesian it. Instead each interval explodes into the
    fixed-width buckets it covers and pairs meet by BUCKET EQUI-JOIN,
    then verify the exact overlap predicate. A pair sharing several
    buckets would duplicate, so it is kept ONLY in the first bucket
    both intervals cover (``max(floor(ls/w), floor(rs/w))``) — dedup by
    arithmetic, no distinct shuffle.

    ``bucket_width`` trades fan-out for selectivity: ~the typical
    interval length is right (an interval explodes into ~2 buckets);
    at 100 TB the shuffle is the bucketed explode, never |L|·|R|, and
    a hot bucket (everything overlapping one rush hour) is ordinary
    aggregate skew for AQE. Start/end are numeric (cast timestamps to
    epoch units upstream)."""
    w = int(bucket_width)
    out_names = [c + suffix if c in left.columns else c for c in right.columns]
    r = right.select(
        *[F.col(c).alias(a) for c, a in zip(right.columns, out_names)]
    )
    rs, re_ = (
        right_start + suffix if right_start in left.columns else right_start,
        right_end + suffix if right_end in left.columns else right_end,
    )
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w), F.floor(F.col(left_end) / w)
            )
        ),
    )
    rb = r.withColumn(
        "__b",
        F.explode(
            F.sequence(F.floor(F.col(rs) / w), F.floor(F.col(re_) / w))
        ),
    )
    return (
        lb.join(rb, "__b")
        .where(
            (F.col(left_start) <= F.col(re_))
            & (F.col(rs) <= F.col(left_end))
            & (
                F.col("__b")
                == F.greatest(
                    F.floor(F.col(left_start) / w), F.floor(F.col(rs) / w)
                )
            )
        )
        .drop("__b")
    )


def _islands(
    df: DataFrame,
    part_cols: list[str],
    start_col: str,
    end_col: str,
    measure_cols: list[str] | None = None,
) -> DataFrame:
    """One sweep pass: merge overlapping/abutting CLOSED intervals per
    ``part_cols`` group, one output row per merged island with
    ``start_col``/``end_col`` rebound to the island's span and each
    ``measure_cols`` column summed across the island's members.

    The output is a valid INPUT to the same sweep (spans re-merge,
    sums re-sum) — the closure-under-partial-evaluation property that
    makes ``skew.salted_sweep`` legal over it.

    The classic gaps-and-islands shape, two window passes over ONE
    shuffle on the group: an interval opens a new island iff its start
    exceeds the running max end of every earlier interval (rows-frame
    max, order by start then end for deterministic ties); a running
    sum of those flags numbers the islands. No self-join, no pair term
    — per-group cost is linear in that group's interval count.
    """
    w = Window.partitionBy(*part_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new",
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1)
        .otherwise(0),
    )
    islands = flagged.withColumn("__island", F.sum("__new").over(w))
    return (
        islands.groupBy(*part_cols, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            *[F.sum(c).alias(c) for c in measure_cols or []],
        )
        .drop("__island")
    )


def interval_union(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    *,
    engine: str = "sweep",
    n_salts: int = 32,
) -> DataFrame:
    """Merge overlapping/abutting intervals per key and report coverage:
    ``(key, n_islands, covered)`` where ``covered`` sums the merged
    island lengths (same unit as the start/end columns — keep them
    integer, e.g. unix micros, for engine-exact results).

    ``engine="sweep"`` (default): one shuffle on the key, per-key cost
    linear in that key's interval count (see :func:`_islands`) — skewed
    keys behave like any window partition.

    ``engine="salted"``: the whale-key rescue for DEGENERATE key spaces
    (STRESS.md 10 000× rung: 1 B rows over 150 fixed keys crossed the
    per-partition external-sort threshold at ~6.7 M rows/partition).
    Routes through :func:`adhesive_spark.operators.skew.salted_sweep` —
    sweep per (key, endpoint-hash salt), then merge the per-salt island
    sets per key; legal because interval union is hierarchically
    mergeable. Output machine-checked equal to the default
    (tests/test_scale_ops.py, tests/test_property.py). Costs a second
    (tiny, islands-only) shuffle — keep the default for
    high-cardinality key spaces.
    """
    cols = [key_col, start_col, end_col]
    if engine == "salted":
        from adhesive_spark.operators.skew import salted_sweep

        islands = salted_sweep(
            df.select(*cols),
            [key_col],
            lambda fr, parts: _islands(fr, parts, start_col, end_col),
            salt_cols=[start_col, end_col],
            n_salts=n_salts,
        )
    elif engine == "sweep":
        islands = _islands(df.select(*cols), [key_col], start_col, end_col)
    else:
        raise ValueError(f"unknown engine: {engine!r}")
    return islands.groupBy(key_col).agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col(end_col) - F.col(start_col)).cast("long").alias("covered"),
    )


def session_spans(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    *,
    engine: str = "sweep",
    n_salts: int = 32,
) -> DataFrame:
    """Gap-sessionization as a mergeable interval sweep: an event at
    ``t`` holds its session open through ``t + gap - 1`` (closed
    interval, integer time units), so sessions are exactly the merged
    islands — a new session starts iff the next event arrives ``>= gap``
    after the previous one, ``F.session_window``'s boundary rule
    (machine-checked against the built-in in tests/test_scale_ops.py).
    Returns per key: ``n_sessions``, ``n_events`` (an additive count
    measure summed through the merge), and ``span`` = Σ per-session
    (last event − first event).

    Why beside ``session_window``: the built-in sorts each key's FULL
    event set inside one window partition — the same whale-key sort
    cliff interval_union hits at ~6.7 M rows/partition.
    ``engine="salted"`` bounds every sort at ~rows/(keys·n_salts) via
    :func:`adhesive_spark.operators.skew.salted_sweep`; the additive
    ``n_events`` measure demonstrates the merge carrying state beyond
    the span itself.
    """
    base = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__s"),
        (F.col(ts_col) + F.lit(gap) - F.lit(1)).alias("__e"),
        F.lit(1).alias("__n"),
    )

    def sweep(fr, parts):
        return _islands(fr, parts, "__s", "__e", measure_cols=["__n"])

    if engine == "salted":
        from adhesive_spark.operators.skew import salted_sweep

        islands = salted_sweep(
            base, [key_col], sweep, salt_cols=["__s"], n_salts=n_salts
        )
    elif engine == "sweep":
        islands = sweep(base, [key_col])
    else:
        raise ValueError(f"unknown engine: {engine!r}")
    return islands.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("__n").cast("long").alias("n_events"),
        F.sum(F.col("__e") - F.col("__s") - F.lit(gap) + F.lit(1))
        .cast("long")
        .alias("span"),
    )
