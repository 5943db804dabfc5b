"""Temporal joins Spark lacks as built-ins: as-of join and interval (range) join.

Neither exists in the reference (its surface is row-wise expressions,
SURVEY.md §2.3) — these are extension operators for the event-stream side of
a training-data pipeline, expressed so Catalyst keeps them shuffle-minimal:

* :func:`asof_join` — point-in-time join ("for each left row, the latest
  right row at-or-before it, per key").  NOT a join node at all: both sides
  are unioned, shuffled ONCE on the key, and a single window pass carries
  the most recent right payload forward onto each left row.  A naive
  ``l.ts >= r.ts`` theta-join would be O(|L|·|R|) per key; this is
  O((|L|+|R|) log) with exactly one Exchange — the shape that survives
  100 TB.  Equivalent to DuckDB/kdb ``ASOF JOIN`` semantics.
* :func:`range_join` — points-in-intervals join with no (or any) equality
  key.  Spark executes a raw ``start <= ts AND ts < end`` join as
  BroadcastNestedLoopJoin (cartesian — the canonical scale-killer).  Here
  every interval is exploded onto the fixed time buckets it covers and every
  point onto its single bucket, turning the theta-join into a bucket
  equi-join + exact refine.  Each point lands in exactly one bucket, so no
  dedup pass is needed.  Bucket width should be ~the typical interval
  length: intervals then explode into O(1) rows each.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_MICROS = "bigint"


def _micros(c: F.Column) -> F.Column:
    return F.unix_micros(c.cast("timestamp"))


def _burst_buckets(df: DataFrame, start_col: str, end_col: str, bucket_micros) -> DataFrame:
    """Explode each row into the fixed-width bucket ids its half-open span
    ``[start, end)`` covers (shared by ``range_join`` / ``interval_join``).

    Empty or inverted spans (``end <= start``) cover no point and are
    DROPPED here — besides matching nothing under half-open semantics,
    they would otherwise feed ``sequence()`` a descending range (Spark
    auto-steps −1) and burst into garbage buckets.
    """
    b = F.lit(bucket_micros)
    s, e = _micros(F.col(start_col)), _micros(F.col(end_col))
    return df.where(s < e).withColumn(
        "__bucket",
        # end is exclusive: a bucket-aligned end needs no extra bucket
        F.explode(F.sequence(F.floor(s / b), F.floor((e - 1) / b))),
    )


def lag_features(
    df,
    key_col: str,
    order_cols: list[str],
    value_cols: list[str],
    *,
    lags: tuple[int, ...] = (1,),
):
    """Append per-key lagged copies of ``value_cols`` (feature engineering).

    The point-in-time feature shape: for each row, the previous ``lags``
    values of each column within its ``key_col`` partition, ordered by
    ``order_cols`` (pass a unique tiebreak column — e.g. the event id — for
    full determinism).  New columns are named ``<col>_lag<k>`` and are null
    where the history is shorter than ``k``.

    ONE keyed window shuffle regardless of how many columns × lags are
    requested — all ``lag()`` expressions share the same window frame, so
    Spark computes them in a single pass over each sorted partition.  No
    self-joins (the naive formulation is a per-lag equi-join each with its
    own shuffle).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    out = df
    for c in value_cols:
        for k in lags:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
    return out


def rolling_time_features(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lookback_micros: int,
    include_current: bool = True,
    prefix: str | None = None,
):
    """Trailing TIME-window features per key: for each row, the count /
    sum / min / max / mean of ``value_col`` over the last
    ``lookback_micros`` of event time (``[ts - lookback, ts]``; rows
    sharing a timestamp are all frame peers, so ties need no tiebreak —
    the other feature-store staple next to :func:`lag_features`, which is
    ROW-based).  ``include_current=False`` makes the frame
    ``[ts - lookback, ts)`` — strictly-before features for leakage-free
    training labels.

    ONE keyed window shuffle with a RANGE frame over ``unix_micros(ts)``;
    all five aggregates share the frame, one pass per sorted partition.
    Cost note: Spark's sliding-frame aggregates re-evaluate the buffered
    frame per row (no retraction), so work is O(rows × avg window
    occupancy) — the right plan for bounded lookbacks (minutes/hours of
    per-key history); for day-scale windows over hot keys, pre-aggregate
    to tumbling buckets first (:func:`~dftly_spark.streaming.tumbling_agg`)
    and roll over the buckets.

    New columns: ``<prefix>_n/_sum/_min/_max/_mean`` (prefix defaults to
    ``<value_col>_trail``); nulls in ``value_col`` are skipped by every
    aggregate (mean = null where the trailing window holds no values).
    """
    from pyspark.sql import Window

    p = prefix or f"{value_col}_trail"
    upper = 0 if include_current else -1
    w = (
        Window.partitionBy(key_col)
        # _micros: same timestamp coercion as asof/range/nearest joins, so
        # the accepted ts input types are consistent across this module
        .orderBy(_micros(F.col(ts_col)))
        .rangeBetween(-lookback_micros, upper)
    )
    v = F.col(value_col)
    return df.select(
        *df.columns,
        F.count(v).over(w).alias(f"{p}_n"),
        F.sum(v).over(w).alias(f"{p}_sum"),
        F.min(v).over(w).alias(f"{p}_min"),
        F.max(v).over(w).alias(f"{p}_max"),
        F.avg(v).over(w).alias(f"{p}_mean"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] | None = "user_id",
    right_on: str | None = None,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: attach to each left row the nearest right row per key.

    ``direction='backward'`` (default) matches the latest right row with
    ``right.ts <= left.ts``; ``'forward'`` the earliest with
    ``right.ts >= left.ts``.  ``tolerance_micros`` bounds the match age.
    ``how='inner'`` drops unmatched left rows (DuckDB ``ASOF JOIN``
    semantics); ``'left'`` keeps them with null right columns.

    Right payload columns (everything but ``by``/``right_on``) come back
    suffixed.  If several right rows share one (key, ts), the one latest in
    (ts, original column order) wins — pre-aggregate the right side if you
    need a different tiebreak.

    Plan shape: union → single hash-Exchange on ``by`` → one window sort.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    bys = [by] if isinstance(by, str) else (list(by) if by else [])
    r_on = right_on or on
    r_payload = [c for c in right.columns if c not in bys and c != r_on]
    payload = F.struct(
        _micros(F.col(r_on)).alias("__rts"),
        F.col(r_on).alias("__rorig"),
        *[F.col(c).alias(c) for c in r_payload],
    )

    def _key():
        if not bys:
            return F.lit(0).alias("__key")
        if len(bys) == 1:
            return F.col(bys[0]).alias("__key")
        return F.struct(*[F.col(b) for b in bys]).alias("__key")

    key = [_key()]
    l_side = left.select(
        *key,
        _micros(F.col(on)).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(
                ["__rts:bigint", f"__rorig:{right.schema[r_on].dataType.simpleString()}"]
                + [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in r_payload]
            ) + ">"
        ).alias("__rrow"),
    )
    for b in bys:
        # SQL equality semantics: a null key matches nothing.  Null-key
        # right rows are dropped here; null-key left rows then find no
        # carried payload (they'd otherwise co-group in the window).
        right = right.where(F.col(b).isNotNull())
    r_key = [_key()]
    r_side = right.select(
        *r_key,
        _micros(F.col(r_on)).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_side.schema["__lrow"].dataType.simpleString()).alias("__lrow"),
        payload.alias("__rrow"),
    )
    both = l_side.unionByName(r_side)

    if direction == "backward":
        # right (side=0) sorts before left at equal ts → visible to it
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__rrow", ignorenulls=True).over(w)
    else:
        # left (side=1) sorts before right at equal ts → sees it in the
        # forward frame
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__rrow", ignorenulls=True).over(w)

    matched = (
        both.withColumn("__match", carried)
        .where(F.col("__side") == 1)
    )
    if tolerance_micros is not None:
        age = (
            F.col("__ts") - F.col("__match.__rts")
            if direction == "backward"
            else F.col("__match.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__match", F.when(age <= tolerance_micros, F.col("__match"))
        )
    if how == "inner":
        matched = matched.where(F.col("__match").isNotNull())

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__match.__rorig").alias(f"{r_on}{suffix}"))
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in r_payload]
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_on: str = "ts",
    start_on: str = "start",
    end_on: str = "end",
    by: str | list[str] | None = None,
    bucket_micros: int = 30 * 60 * 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join points into half-open intervals ``[start, end)`` via time buckets.

    Returns one row per (interval row, contained point row) with all columns
    from both sides (point columns win name clashes — alias beforehand).
    ``by`` adds an equality key to the bucket join.  ``how='left_outer'``
    keeps empty intervals (null point columns).

    The theta-condition never reaches the optimizer: both sides gain an
    explicit bucket column and the join is a plain (bucket [, by]) hash
    equi-join, refined exactly afterwards.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    bys = [by] if isinstance(by, str) else (list(by) if by else [])
    b = F.lit(bucket_micros)
    ivl = _burst_buckets(intervals, start_on, end_on, bucket_micros)
    pts = points.withColumn("__bucket", F.floor(_micros(F.col(point_on)) / b))
    # alias-qualified refs: both sides may share lineage (intervals derived
    # from the points table is the common case) — df["col"] refs would be
    # ambiguous in that self-join
    ivl, pts = ivl.alias("__ivl"), pts.alias("__pts")
    iv = lambda c: F.col(f"__ivl.`{c}`")  # noqa: E731
    pt = lambda c: F.col(f"__pts.`{c}`")  # noqa: E731
    cond = iv("__bucket") == pt("__bucket")
    for bk in bys:
        cond = cond & (iv(bk) == pt(bk))
    cond = (
        cond
        & (_micros(pt(point_on)) >= _micros(iv(start_on)))
        & (_micros(pt(point_on)) < _micros(iv(end_on)))
    )
    joined = ivl.join(pts, cond, "inner")
    keep = [iv(c).alias(c) for c in intervals.columns if c not in bys]
    keep += [iv(bk).alias(bk) for bk in bys]
    keep += [pt(c).alias(c) for c in points.columns if c not in bys]
    out = joined.select(*keep)
    if how == "left_outer":
        # add back intervals with no contained point (null point columns);
        # an inner bin-join + anti add-back, NOT a left join per bucket —
        # that would emit one null row per non-matching covered bucket
        matched_keys = out.select(*[F.col(c) for c in intervals.columns]).distinct()
        empty = intervals.join(matched_keys, intervals.columns, "left_anti")
        for c in points.columns:
            if c not in bys:
                empty = empty.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
        out = out.unionByName(empty)
    return out


_ASOF_OUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("right_ts_us", LongType()),
        StructField("right_value", DoubleType()),
    ]
)
_ASOF_STATE = StructType(
    [
        StructField("right_ts_us", LongType()),
        StructField("right_value", DoubleType()),
    ]
)


def _asof_loop(user_id, pdfs, rts, rval):
    """The per-event as-of loop SHARED by both streaming twins (legacy
    applyInPandasWithState and transformWithStateInPandas) — one
    definition, so ordering and state semantics cannot drift between the
    APIs.  Concatenates chunks BEFORE sorting (a key with more rows than
    Arrow's maxRecordsPerBatch arrives in several chunks; sorting each
    independently could regress state).  Returns (rows, rts, rval)."""
    import pandas as pd

    chunks = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if chunks:
        whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values(["__ts", "__side", "__id"])
        for side, ts, ev, val in zip(
            whole["__side"], whole["__ts"], whole["__id"], whole["__val"]
        ):
            if side == 0:
                rts, rval = int(ts), float(val)
            else:
                out.append((int(ev), int(user_id), int(ts), rts, rval))
    return out, rts, rval


_ASOF_OUT_COLS = ["event_id", "user_id", "ts_us", "right_ts_us", "right_value"]


def _asof_stream_func(
    key: Tuple[Any, ...], pdfs: Iterator, state: GroupState
) -> Iterator:  # pragma: no cover - executor side
    import pandas as pd

    (user_id,) = key
    rts, rval = state.get if state.exists else (None, None)
    out, rts, rval = _asof_loop(user_id, pdfs, rts, rval)
    if rts is not None:
        state.update((rts, rval))
    yield pd.DataFrame(out, columns=_ASOF_OUT_COLS)


def _asof_tagged_union(left, right, on, by, left_id, right_val):
    """Tag and union both streams for per-key stateful processing: right
    rows sort before left rows at equal timestamps (backward as-of)."""
    l_side = left.select(
        F.col(by).alias("__key"),
        _micros(F.col(on)).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_id).cast("long").alias("__id"),
        F.lit(None).cast("double").alias("__val"),
    )
    r_side = right.where(F.col(by).isNotNull()).select(
        F.col(by).alias("__key"),
        _micros(F.col(on)).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__id"),
        F.col(right_val).cast("double").alias("__val"),
    )
    return l_side.unionByName(r_side)


def asof_join_stream(
    left,
    right,
    *,
    on: str = "ts",
    by: str = "user_id",
    left_id: str = "event_id",
    right_val: str = "value",
):
    """Streaming backward as-of join: enrich each left event with the most
    recent right event's value per key (``applyInPandasWithState``).

    The streaming twin of :func:`asof_join`: both streams are tagged and
    unioned, grouped by the key, and per-key state carries (latest right
    ts, value) across micro-batches — O(1) state per key, the same plan
    Spark's built-in stream-stream join cannot express (it buffers BOTH
    sides within a watermark; an as-of needs only the latest right row,
    forever).  Same Spark-4.x API note as ``sessionize_stream``: one
    value-state per key, no timers — ``applyInPandasWithState`` is the
    smaller supported surface; :func:`asof_join_stream_tws` is the
    ``transformWithStateInPandas`` twin.  Like :func:`~dftly_spark.ops.sessions.sessionize_stream`,
    events must arrive time-ordered per key ACROSS micro-batches (sorted
    within each batch here); a production deployment would add a timeout to
    expire idle keys.

    Emits ``(event_id, user_id, ts_us, right_ts_us, right_value)`` with
    nulls when no right event has been seen yet (left-join semantics).
    """
    return (
        _asof_tagged_union(left, right, on, by, left_id, right_val)
        .groupBy("__key")
        .applyInPandasWithState(
            _asof_stream_func,
            outputStructType=_ASOF_OUT,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def asof_join_stream_tws(
    left,
    right,
    *,
    on: str = "ts",
    by: str = "user_id",
    left_id: str = "event_id",
    right_val: str = "value",
):
    """Streaming backward as-of join on the Spark 4
    ``transformWithStateInPandas`` API — the same contract (and the same
    per-event loop, :func:`_asof_loop`) as :func:`asof_join_stream`,
    carried by a ``StatefulProcessor`` with one ``ValueState`` instead of
    the legacy ``applyInPandasWithState`` tuple.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = …RocksDBStateStoreProvider``)
    and ``protobuf`` (the state-server wire protocol; absent in this test
    container, so the parity test auto-skips here and runs on any real
    Spark 4 deployment).  Both paths stay supported; this one is the
    forward-looking default where RocksDB state is already standard (it
    adds named state, timers, and TTL for free when the op grows into
    them — an idle-key timeout is the natural next step here).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _AsofProcessor(StatefulProcessor):  # pragma: no cover - executor
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "asof", "right_ts_us LONG, right_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self._st.exists():
                rts, rval = self._st.get()
            else:
                rts, rval = None, None
            out, rts, rval = _asof_loop(user_id, rows, rts, rval)
            if rts is not None:
                self._st.update((rts, rval))
            yield pd.DataFrame(out, columns=_ASOF_OUT_COLS)

        def close(self) -> None:
            pass

    return (
        _asof_tagged_union(left, right, on, by, left_id, right_val)
        .groupBy("__key")
        .transformWithStateInPandas(
            statefulProcessor=_AsofProcessor(),
            outputStructType=_ASOF_OUT,
            outputMode="append",
            timeMode="none",
        )
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] | None = "user_id",
    right_on: str | None = None,
    tolerance_micros: int | None = None,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Nearest-timestamp join: the closest right row per key, either side.

    Composes the backward and forward :func:`asof_join` passes and keeps,
    per left row, whichever match is temporally closer (ties go backward —
    the earlier mark).  The "snap to nearest checkpoint" primitive that
    ``direction='backward'`` alone can't express.

    Two keyed union+window passes (one per direction) on the same ``by``
    partitioning — the second pass reuses the first's key Exchange
    layout; no pairwise join anywhere.  ``tolerance_micros`` bounds BOTH
    directions; ``how='inner'`` drops left rows with no match either way.
    """
    r_on = right_on or on
    r_payload = [c for c in right.columns if c != r_on and c not in (
        [by] if isinstance(by, str) else (list(by) if by else [])
    )]
    back = asof_join(
        left, right, on=on, by=by, right_on=right_on, direction="backward",
        tolerance_micros=tolerance_micros, how="left", suffix="__b",
    )
    both = asof_join(
        back, right, on=on, by=by, right_on=right_on, direction="forward",
        tolerance_micros=tolerance_micros, how="left", suffix="__f",
    )
    ts_us = _micros(F.col(on))
    bts, fts = F.col(f"{r_on}__b"), F.col(f"{r_on}__f")
    gap_b = ts_us - _micros(bts)
    gap_f = _micros(fts) - ts_us
    use_b = fts.isNull() | (bts.isNotNull() & (gap_b <= gap_f))
    pick = lambda c: F.when(use_b, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f"))
    out = both.select(
        *[F.col(c) for c in left.columns],
        pick(r_on).alias(f"{r_on}{suffix}"),
        *[pick(c).alias(f"{c}{suffix}") for c in r_payload],
    )
    if how == "inner":
        out = out.where(F.col(f"{r_on}{suffix}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    by: str | list[str] | None = None,
    bucket_micros: int = 30 * 60 * 1_000_000,
    suffix: str = "_right",
) -> DataFrame:
    """Overlap-join two interval sets: one row per (left, right) pair whose
    half-open spans intersect (``max(starts) < min(ends)``, plus ``by``
    key equality; empty or inverted spans match nothing and are dropped).
    Right columns clashing with left names get ``suffix``.

    Scale shape: the theta condition never reaches the optimizer.  Both
    sides explode into the fixed-width time buckets they cover and the
    join is a plain (bucket [, by]) hash equi-join refined by the exact
    overlap test.  A pair can share many buckets; instead of a
    dedup-distinct over the join output, each pair is emitted ONLY in the
    bucket containing ``max(ls, rs)`` — a point every overlapping pair
    covers on both sides by construction — so the output is exact with
    zero post-join shuffles.  Explode factor is span/bucket per row: pick
    ``bucket_micros`` near the typical interval length (same tuning rule
    as ``range_join``); AQE's skew split handles hot (key, bucket) cells.
    """
    bys = [by] if isinstance(by, str) else (list(by) if by else [])
    b = F.lit(bucket_micros)
    lf = _burst_buckets(left, left_start, left_end, bucket_micros).alias("__l")
    rf = _burst_buckets(right, right_start, right_end, bucket_micros).alias("__r")
    lc = lambda c: F.col(f"__l.`{c}`")  # noqa: E731
    rc = lambda c: F.col(f"__r.`{c}`")  # noqa: E731
    ls, le = _micros(lc(left_start)), _micros(lc(left_end))
    rs, re_ = _micros(rc(right_start)), _micros(rc(right_end))
    cond = lc("__bucket") == rc("__bucket")
    for bk in bys:
        cond = cond & (lc(bk) == rc(bk))
    cond = (
        cond
        # canonical half-open overlap: max(starts) < min(ends) — empty or
        # inverted spans match nothing (burst already dropped them)
        & (F.greatest(ls, rs) < F.least(le, re_))
        # first-overlap-bucket guard: emit each pair exactly once
        & (lc("__bucket") == F.floor(F.greatest(ls, rs) / b))
    )
    joined = lf.join(rf, cond, "inner")
    keep = [lc(c).alias(c) for c in left.columns]
    taken = set(left.columns)
    keep += [
        rc(c).alias(c + suffix if c in taken else c)
        for c in right.columns
        if c not in bys  # by keys are equal on both sides; keep left's
    ]
    return joined.select(*keep)
