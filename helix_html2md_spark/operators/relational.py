"""Relational side-queries (SURVEY.md §2B): scans, filters, joins,
aggregations, windows, sorts/limits over the driver's TPC-H-ish tables.

Money sums are cast to decimal BEFORE aggregation (float summation order
is engine-dependent; decimal arithmetic is not), then the FINAL value is
cast to double: DuckDB's pandas bridge widens SUM(decimal)/HUGEINT to
float64, so double is the one terminal type both engines agree on for
the driver's type-sensitive value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def load(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary with decimal-exact sums."""
    dec = "decimal(18,2)"
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice").cast(dec)
                    * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_orders(orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """Join + global top-k by totalprice (broadcast the small dim)."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "o_orderkey",
            "c_name",
            "c_mktsegment",
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(k)
    )


def region_rollup(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Two broadcast joins + aggregation: customers per region."""
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def region_nation_rollup(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Hierarchical subtotals via ROLLUP grouping sets (region -> nation
    -> grand total): two broadcast joins feed one grouping-sets
    aggregate — Spark expands the rollup into one shuffle with a
    grouping-id column, no Union of per-level scans.  Null grouping
    columns mark subtotal rows, exactly as in ANSI SQL ROLLUP.
    (Named for what it computes: ``.rollup`` emits region/nation,
    region, and grand-total sets — NOT the nation-only sets a CUBE
    would add.)"""
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


def user_event_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via windows: lag -> new-session flag ->
    running session id; per-session aggregates."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND-exact gap arithmetic: unix_timestamp() truncates to
    # whole seconds, so a 1800.5s gap would compare 1800 > 1800 = false
    # and silently merge two sessions the fractional-epoch oracle (and
    # the stateful sessionizer's float .timestamp() compare) would
    # split.  ts is timestamp_ntz; the cast runs under the UTC session
    # timezone build_session pins, matching DuckDB epoch_us exactly.
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.col("prev_ts").cast("timestamp"))
    with_gap = events.withColumn(
        "prev_ts", F.lag("ts").over(w)
    ).withColumn(
        "new_session",
        (F.col("prev_ts").isNull() | (t_us - prev_us > gap)).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w)
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """Aggregation with distinct + filter pushdown-friendly predicate."""
    return (
        events.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    value_cols: list[str],
    strict: bool = True,
    tiebreak: str | None = None,
    hot_key_warn_rows: int | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the LATEST right row whose
    ``on`` is < (``strict``) or <= the left row's, within its ``by``
    group — the time-series primitive Spark's join operators lack
    (Flink temporal joins / DuckDB ASOF JOIN / pandas merge_asof are
    the published equivalents this re-expresses Spark-first).

    Shape: union-tag both sides, ONE shuffle on ``by``, one running
    ``last(ignoreNulls)`` window over (on, side) — linear in rows, no
    per-key row explosion (the naive theta-join is O(n*m) per key and
    unusable at corpus scale).  Left rows with no prior right row keep
    NULLs (left-join semantics).  Right-side ties on (by, on) resolve
    by arrival order unless ``tiebreak`` names a right column — then
    the row with the GREATEST tiebreak value wins deterministically.

    SKEW BOUND: the window partitions by ``by`` alone, so per-key
    ordering serializes each key through ONE task — a pathologically
    hot key (a null/default user owning 30% of events) bounds the
    stage at that key's row count.  That bound is inherent to per-key
    order semantics; mitigations are (a) pre-filter/bucket the hot
    sentinel keys before joining, or (b) :func:`asof_join_slabbed`,
    the implemented two-phase time-slab pass (per-(key, slab) local
    asof + a per-slab boundary carry-forward) — same semantics, two
    shuffles, hot keys fan out across their slabs.
    Pass ``hot_key_warn_rows`` to pay one extra count job that warns
    when any key exceeds the threshold (opt-in: off in pipelines that
    already know their key distribution).

    Returns all left columns plus ``asof_<c>`` for each value col and
    ``asof_<on>`` (the matched right timestamp).

    NULL semantics match DuckDB ASOF JOIN / pandas merge_asof: right
    rows with a NULL ``on`` or NULL ``by`` are dropped before matching
    (NULL never equals NULL in a join key, and a NULL timestamp is not
    "earliest" — without this filter nulls sort first in the window and
    a null-ts right row would silently become every left row's match),
    and left rows with a NULL ``by`` or ``on`` keep NULL match columns.
    """
    right = right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
    if hot_key_warn_rows is not None:
        import warnings

        hot = (
            left.groupBy(by).count()
            .unionByName(right.groupBy(by).count())
            .groupBy(by).agg(F.sum("count").alias("n"))
            .filter(F.col("n") > hot_key_warn_rows)
            .orderBy(F.desc("n"))
            .limit(5)
            .collect()
        )
        if hot:
            warnings.warn(
                "asof_join hot keys (each serializes through one window "
                "task): "
                + ", ".join(f"{r[by]!r}={r['n']} rows" for r in hot),
                stacklevel=2,
            )
    # dedupe: value_cols containing `on` must not emit two asof_<on>
    picked = list(dict.fromkeys([on] + value_cols))
    rv = F.struct(*[F.col(c) for c in picked])
    rv_type = right.select(rv.alias("_rv")).schema["_rv"].dataType
    lv = F.struct(*[F.col(c) for c in left.columns])
    lv_type = left.select(lv.alias("_lv")).schema["_lv"].dataType
    # strict: right rows sort AFTER left at equal ts, so the frame up to
    # the current row never includes an equal-ts right row
    l_side, r_side = (0, 1) if strict else (1, 0)
    tb_type = (
        right.select(F.col(tiebreak).alias("_tb")).schema["_tb"].dataType
        if tiebreak
        else "int"
    )
    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(rv_type).alias("_rv"),
        lv.alias("_lv"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(r_side).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast(tb_type))
        .alias("_tb"),
        rv.alias("_rv"),
        F.lit(None).cast(lv_type).alias("_lv"),
    )
    # tiebreak ascending within a (ts, side) group: last() then picks
    # the greatest tiebreak; left rows carry null (sorted first, and
    # they never share a side group with right rows anyway)
    w = (
        Window.partitionBy("_by")
        .orderBy("_on", "_side", F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tag.unionByName(r_tag).withColumn(
        "_asof", F.last("_rv", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_asof.{c}").alias(f"asof_{c}") for c in picked
    ]
    return matched.filter(F.col("_lv").isNotNull()).select(*out_cols)


def asof_join_slabbed(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    value_cols: list[str],
    slab_width,
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Hot-key-resistant as-of join: semantics identical to
    :func:`asof_join`, execution decomposed into TIME SLABS — the
    mitigation (b) that asof_join's SKEW BOUND documents.

    asof_join serializes each key through one window task (per-key
    total order), so a pathological key owning 30% of events bounds
    the stage at that key's row count.  Here the window partitions by
    ``(key, floor(on / slab_width))``: a hot key's timeline splits
    into independent per-slab tasks, and a second, TINY pass stitches
    slab boundaries — per (key, slab) the latest right row is carried
    forward with a running window over the key's slab sequence (rows =
    slabs per key, not events per key), and left rows whose own slab
    held no prior right row take the carry from the nearest earlier
    slab.  Correctness needs no strict/tie care across slabs: a right
    row in an earlier slab is strictly below the left slab's lower
    bound, and equal ``on`` values always share a slab.

    Two shuffles (the slab-local union-tag pass + the carry join)
    versus asof_join's one — pay it only when the key distribution is
    actually skewed.  ``on`` must be numeric (slab arithmetic; cast
    timestamps to epoch micros first).  Output contract and NULL
    semantics match asof_join exactly; with a UNIQUE ``tiebreak`` the
    results are row-identical.  Without one, (on, tiebreak)-tied right
    rows are unspecified in BOTH variants but resolve differently
    (arrival order there, an arbitrary-but-deterministic pick in the
    carry pass here) — pin a tiebreak when ties are possible.
    """
    if not slab_width or slab_width <= 0:
        raise ValueError("slab_width must be positive")
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    for side_name, side in (("left", left), ("right", right)):
        on_type = side.schema[on].dataType.simpleString()
        if on_type not in numeric and not on_type.startswith("decimal"):
            # validate BOTH sides up front: a raw timestamp on either
            # one would otherwise die mid-plan with an analyzer error
            # instead of this message
            raise ValueError(
                f"asof_join_slabbed needs a numeric `on` column, got "
                f"{on_type} on the {side_name} side: cast timestamps "
                "to epoch micros first"
            )
    slab = (F.col(on) / F.lit(slab_width)).cast("long")
    # right-side null keys/timestamps never match (asof_join's own
    # filter keys off the REAL by column; the composite struct below
    # would otherwise smuggle null-by rows past it)
    right = right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
    # the ONE extra shuffled column is the composite key itself; _slab
    # is recomputed from `on` where needed rather than carried (the
    # union-tag kernel snapshots every left column into its row struct,
    # so dead columns here ride the exchange twice)
    lft = left.withColumn("_bk", F.struct(F.col(by), slab.alias("_s")))
    rgt = right.withColumn("_bk", F.struct(F.col(by), slab.alias("_s")))
    # pass 1: slab-local asof via the shared union-tag kernel, windowed
    # over the composite key — a hot key fans out across its slabs
    local = asof_join(
        lft,
        rgt,
        by="_bk",
        on=on,
        value_cols=value_cols,
        strict=strict,
        tiebreak=tiebreak,
    ).withColumn("_slab", slab)

    picked = list(dict.fromkeys([on] + value_cols))
    rv = F.struct(*[F.col(c) for c in picked])
    tb = (
        F.col(tiebreak)
        if tiebreak
        else F.lit(None).cast("int")
    )
    # pass 2: one carry row per (key, slab) — the slab's latest right
    # row under the (on, tiebreak) order the window used.  max_by keeps
    # the VALUE struct out of the ordering: map-typed value columns
    # stay legal (max(struct(...)) would require them orderable), and
    # (on, tiebreak)-tied rows resolve arbitrarily — the same
    # "unspecified without a unique tiebreak" contract as the window
    # kernel's arrival order (pass a unique tiebreak for determinism).
    carry = (
        rgt.groupBy(
            F.col(by).alias("_cby"), F.col("_bk._s").alias("_cs")
        )
        .agg(
            F.max_by(
                rv, F.struct(F.col(on), tb.alias("_tb"))
            ).alias("_crv")
        )
    )
    # slab universe per key = slabs seen on either side, so every left
    # slab finds its nearest-earlier carry even across empty slabs
    slabs = (
        lft.select(F.col(by).alias("_cby"), F.col("_bk._s").alias("_cs"))
        .union(carry.select("_cby", "_cs"))
        .distinct()
    )
    wprev = (
        Window.partitionBy("_cby")
        .orderBy("_cs")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = (
        slabs.join(carry, ["_cby", "_cs"], "left")
        .withColumn("_prev", F.last("_crv", ignorenulls=True).over(wprev))
        .select("_cby", "_cs", "_prev")
    )
    joined = local.join(
        prev,
        (F.col(by) == F.col("_cby")) & (F.col("_slab") == F.col("_cs")),
        "left",
    )
    # a slab-local miss (asof_<on> NULL — right's on is never null once
    # matched) falls back to the nearest earlier slab's carry
    miss = F.col(f"asof_{on}").isNull()
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.when(miss, F.col(f"_prev.{c}"))
        .otherwise(F.col(f"asof_{c}"))
        .alias(f"asof_{c}")
        for c in picked
    ]
    return joined.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    low: int,
    high: int,
    value_cols: list[str],
    bucket: int | None = None,
) -> DataFrame:
    """Range (interval) join: all right rows whose numeric ``on`` falls
    in [left.on + low, left.on + high] within the same ``by`` group —
    the second join primitive Spark lacks natively (its BroadcastNested
    LoopJoin fallback is O(n*m) per key and unusable at corpus scale).

    Standard binning strategy: bucket width defaults to the window span,
    each left row replicates to the <= 2-3 buckets its window covers
    (bounded fan-out), right rows land in their own bucket, and an
    EQUI-join on (by, bucket) + an exact residual filter does the rest.
    One shuffle per side, shuffle keys carry the bucket so co-ranged
    rows co-locate; inner-join semantics (unmatched left rows drop).

    Returns all left columns plus ``match_<c>`` for each right value
    col and ``match_<on>``.
    """
    if high <= low:
        raise ValueError("high must be greater than low")
    if bucket is not None and bucket <= 0:
        raise ValueError("bucket width must be positive")
    _integral = {"tinyint", "smallint", "int", "bigint"}
    integral = (
        dict(left.dtypes).get(on) in _integral
        and dict(right.dtypes).get(on) in _integral
    )
    # Bucket width: the residual filter is exact, so ANY positive width
    # is correct — width only tunes co-location/fan-out.  The integral
    # `div` path needs an integer >= 1 (int(0.5) == 0 would divide by
    # zero); the fractional path keeps the float width so sub-unit
    # windows (e.g. 0.5-second spans on double timestamps) bin tightly.
    span = float(bucket) if bucket is not None else float(high - low)
    w: float | int = max(1, math.ceil(span)) if integral else span

    def _fdiv(x: str):
        # Exact floor division for integral `on`: subtract the
        # nonnegative pmod remainder so the numerator is an exact
        # multiple of w, then bigint `div` (truncation == floor on
        # exact multiples).  The naive F.floor(x / w) divides in
        # FLOAT64 and silently mis-buckets beyond 2^53 — nanosecond
        # epochs (~1.7e18) would land boundary rows in bucket k±1 and
        # DROP matches the residual filter never sees.
        return F.expr(f"({x} - pmod({x}, {w})) div {w}")

    if integral:
        l_tag = (
            left.withColumn("_xlo", F.col(on).cast("long") + F.lit(low))
            .withColumn("_xhi", F.col(on).cast("long") + F.lit(high))
            .withColumn(
                "_b", F.explode(F.sequence(_fdiv("_xlo"), _fdiv("_xhi")))
            )
            .drop("_xlo", "_xhi")
        )
    else:
        # fractional `on` keeps the double path: its values already
        # quantize at the magnitudes where float division is inexact
        lb = F.floor((F.col(on) + F.lit(low)) / F.lit(w)).cast("long")
        ub = F.floor((F.col(on) + F.lit(high)) / F.lit(w)).cast("long")
        l_tag = left.withColumn("_b", F.explode(F.sequence(lb, ub)))
    # dedupe: value_cols containing `on` must not emit two match_<on>
    # columns (duplicate names are ambiguous downstream)
    picked = list(dict.fromkeys([on] + value_cols))
    r_bucket = (
        _fdiv("_xon")
        if integral
        else F.floor(F.col("_xon") / F.lit(w)).cast("long")
    )
    r_tag = right.withColumn(
        "_xon", F.col(on).cast("long" if integral else "double")
    ).select(
        F.col(by).alias("_rby"),
        r_bucket.alias("_b"),
        *[F.col(c).alias(f"match_{c}") for c in picked],
    )
    # equi-keys are (by, bucket): both sides shuffle on the pair, so a
    # hot time-bucket still spreads across keys (no single-bucket task)
    joined = l_tag.join(
        r_tag,
        on=[
            l_tag[by] == r_tag["_rby"],
            l_tag["_b"] == r_tag["_b"],
        ],
        how="inner",
    ).filter(
        (F.col(f"match_{on}") >= F.col(on) + F.lit(low))
        & (F.col(f"match_{on}") <= F.col(on) + F.lit(high))
    )
    return joined.drop("_b", "_rby")


def grouped_percentiles(
    df: DataFrame,
    *,
    group: str,
    col: str,
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact per-group nearest-rank percentiles WITHOUT a per-group
    sort funnel — the grouped order statistic every corpus profile
    needs (length distributions per source, token counts per language).

    Definition (classic nearest-rank): the p-th percentile of a group
    of n values is the value at sorted position ceil(p * n / 100)
    (1-based) — always an ACTUAL group element, so for integral ``col``
    the output is integer-exact and bit-portable across engines (the
    interpolating variant both engines also offer is float and
    engine-divergent in the last ulp; approx_percentile's t-digest is
    the right 100 TB answer when exactness isn't required but can
    never hash-match an oracle).

    Scale shape — the naive plan sorts every group through one task
    (a window over ROWS, the pack_sequences single-partition class);
    this one never touches row order:

    1. histogram: groupBy (group, col) count — map-side combinable,
       output rows = groups x distinct values, NOT document count;
    2. cumulative counts: a window over the HISTOGRAM ordered by value
       — per-group window rows are bounded by the group's distinct
       values (a length column has thousands, not billions);
    3. targets: per-group totals broadcast back, one row per (group,
       percent) via a literal explode, integer target rank
       (p * n + 99) div 100;
    4. answer: min(value) where cumulative >= target.

    Returns (group, percent, n, value) in long form, ordered.
    """
    if not percents:
        raise ValueError("percents must be non-empty")
    for p in percents:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"percent {p!r} must be an int in 1..100")
    hist = df.groupBy(group, col).agg(F.count("*").alias("_cnt"))
    w = (
        Window.partitionBy(group)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w))
    totals = hist.groupBy(group).agg(F.sum("_cnt").alias("n"))
    cand = (
        cum.join(F.broadcast(totals), group)
        .withColumn(
            "percent", F.explode(F.array(*[F.lit(int(p)) for p in percents]))
        )
        .withColumn("_target", F.expr("(percent * n + 99) div 100"))
        .filter(F.col("_cum") >= F.col("_target"))
    )
    return (
        cand.groupBy(group, "percent", "n")
        .agg(F.min(col).alias("value"))
        .orderBy(group, "percent")
    )
