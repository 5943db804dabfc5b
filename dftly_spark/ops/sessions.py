"""Sessionization: gap-based user sessions over an event stream.

Two implementations of the same contract (events → per-event session index):

* :func:`sessionize` — batch, pure window functions (lag + running sum of
  gap-breaks).  Shuffles once on the user key; SQL-expressible, so it is
  oracle-checked against DuckDB.
* :func:`sessionize_stream` — streaming, custom stateful operator via
  ``applyInPandasWithState``: per-user state carries (last event time,
  current session index) across micro-batches.  This is the
  arbitrary-stateful-processing escape hatch for semantics Spark's built-in
  session windows don't cover; state size is O(1) per user and is the only
  Python-touching path besides the multimodal decode stub.

At 100 TB the batch form is a single keyed shuffle + per-partition sort; the
streaming form's state store is partitioned by the group key, and the
watermark-style timeout (not used here) would bound it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sqlgen import portable_round

GAP_MICROS_DEFAULT = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_micros: int = GAP_MICROS_DEFAULT,
) -> DataFrame:
    """Assign a per-user session index to every event (batch).

    A new session starts at the first event and whenever the gap to the
    previous event exceeds ``gap_micros``.  Returns
    ``(id_col, user_col, session_idx)``.
    """
    return df.select(
        F.col(id_col),
        F.col(user_col),
        _session_idx(user_col, ts_col, id_col, gap_micros).alias("session_idx"),
    )


def _session_idx(user_col: str, ts_col: str, id_col: str, gap_micros: int):
    """The gap-break running-sum session index column — the ONE definition
    of the batch gap semantics, shared by sessionize and session_stats so
    the boundary convention cannot drift between them."""
    order = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(order)
    is_break = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_micros),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.sum(is_break).over(running).cast("bigint")


_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_micros", LongType()),
        StructField("session_idx", LongType()),
    ]
)


def _session_loop(user_id, pdfs, last_ts, idx, gap_micros):
    """The per-event sessionization loop SHARED by both streaming twins
    (legacy applyInPandasWithState and transformWithStateInPandas) — one
    definition, so gap semantics and timestamp conversion cannot drift
    between the APIs.  Returns (rows, last_ts, idx)."""
    import pandas as pd

    # Concatenate BEFORE sorting: a key with more rows than Arrow's
    # maxRecordsPerBatch arrives as several chunks, and sorting each chunk
    # independently would process events out of time order (state could
    # even regress).  Memory is bounded by the key's rows per micro-batch
    # — the same bound the output buffer already has.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out_rows = []
    if chunks:
        whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        whole = whole.sort_values(["ts", "event_id"])
        for ev, ts in zip(whole["event_id"], whole["ts"]):
            micros = int(pd.Timestamp(ts).value // 1000)
            if last_ts is None or micros - last_ts > gap_micros:
                idx += 1
            last_ts = micros
            out_rows.append((int(ev), int(user_id), idx))
    return out_rows, last_ts, idx


def _session_func(gap_micros: int):
    def func(
        key: Tuple[Any, ...], pdfs: Iterator, state: GroupState
    ) -> Iterator:  # pragma: no cover - executor side
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, idx = state.get
        else:
            last_ts, idx = None, 0
        out_rows, last_ts, idx = _session_loop(
            user_id, pdfs, last_ts, idx, gap_micros
        )
        state.update((last_ts, idx))
        yield pd.DataFrame(out_rows, columns=["event_id", "user_id", "session_idx"])

    return func


def funnel(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-step funnel: per user, the first time each step completes.

    Step ``i`` completes at the earliest ``steps[i]`` event whose timestamp
    is **>=** the completion time of step ``i-1`` (step 0 at its earliest
    occurrence).  Returns one row per user who performed at least one
    step-0 event: ``(user_col, step_1_ts … step_k_ts, steps_completed)``
    with nulls past the deepest reached step.

    Scale shape: events are filtered to the step types (predicate reaches
    the scan), then ONE hash shuffle on the user key feeds a chain of
    unordered window aggregates — each step's conditional ``min`` reuses
    the same ``hashpartitioning(user)`` Exchange, so adding steps adds no
    shuffles — and the final per-user collapse is satisfied by the same
    partitioning.  No per-user arrays are materialized, so a hot user
    costs O(events), not O(events²) or memory.

    Analogue of the event-funnel analyses the reference's session tooling
    targets (reference ``src/dftly/ops/sessions`` era); the windowed
    sequential-min formulation is Spark-native.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_tp")
    )
    prev: Column | None = None
    names = []
    for i, step in enumerate(steps):
        name = f"step_{i + 1}_ts"
        cond = F.col("_tp") == step
        if prev is not None:
            cond = cond & (F.col("_ts") >= F.col(prev))
        out = out.withColumn(name, F.min(F.when(cond, F.col("_ts"))).over(w))
        prev = name
        names.append(name)
    done = sum(
        F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names
    )
    return (
        out.groupBy(user_col)
        .agg(
            *[F.first(n).alias(n) for n in names],
            F.first(done).alias("steps_completed"),
        )
        .where(F.col(names[0]).isNotNull())
    )


def sessionize_stream(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_micros: int = GAP_MICROS_DEFAULT,
) -> DataFrame:
    """Streaming sessionization with per-user state (``applyInPandasWithState``).

    Same contract as :func:`sessionize`; state per user is (last event time,
    session counter).  Events must arrive time-ordered per user across
    micro-batches (within a batch they are sorted here); production use would
    add a timeout to expire idle users' state.

    API note (Spark 4.x): ``applyInPandasWithState`` remains fully
    supported; its successor ``transformWithStateInPandas`` (4.0+, requires
    the RocksDB state store provider) adds multiple named state variables,
    timers, and TTL.  This op needs exactly one value-state tuple per key
    and no timers, so the legacy API is the smaller surface; the migration
    is mechanical when RocksDB state becomes this deployment's default —
    the state tuple becomes a ``ValueState`` in a ``StatefulProcessor`` and
    the per-group pandas loop is unchanged.
    """
    cols = df.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return cols.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_micros),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    bucket_micros: int = 7 * 86_400 * 1_000_000,
) -> DataFrame:
    """Cohort retention matrix: ``(cohort_bucket, period, n_users)``.

    Users are cohorted by the epoch-aligned bucket (default: week) of
    their FIRST event; ``n_users`` counts distinct users from that cohort
    active ``period`` buckets later (period 0 = the cohort bucket itself —
    the cohort's size).  The product-analytics staple next to
    :func:`funnel` and :func:`sessionize`.

    Three keyed shuffles, all on ``user_col`` or small group keys:
    first-seen is one min-aggregation, activity is a (user, bucket)
    dedup whose exchange co-locates with the first-seen join, and the
    final count groups ≤ cohorts×periods rows with map-side combine.
    Epoch-aligned buckets (not calendar weeks) keep the arithmetic exact
    and engine-replayable.
    """
    u = F.col(user_col)
    # floor-div toward -inf so pre-1970 timestamps bucket correctly
    bkt = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_micros)).cast("bigint")
    first = events.groupBy(u.alias("_u")).agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("_first_us")
    )
    cohort = F.floor(F.col("_first_us") / F.lit(bucket_micros)).cast("bigint")
    act = events.select(u.alias("_u"), bkt.alias("_w")).distinct()
    return (
        act.join(first.select("_u", cohort.alias("_cohort")), "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_bucket"),
            (F.col("_w") - F.col("_cohort")).alias("period"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    *,
    count_col: str = "n_rows",
) -> DataFrame:
    """Union overlapping/touching intervals per key (gaps-and-islands).

    The span-coalescing primitive behind activity timelines, sensor uptime,
    and document-span bookkeeping: intervals ``[start, end)`` that overlap
    or touch (``start <= running max of prior ends``) merge into one span.
    Output: ``(key, span_start, span_end, n_rows)``.

    Classic two-window gaps-and-islands, both windows partitioned by the
    SAME key so the plan has ONE keyed Exchange: a running ``max(end)`` over
    preceding rows detects island breaks, a running sum of breaks numbers
    the islands, and a keyed agg collapses each island.  Per-key state in
    the window is one long — no buffering, no cross-key traffic.  At 100 TB
    this is sort-within-partition dominated, exactly like sessionize.
    """
    w_order = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_break = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(is_break).over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_island", island)
        .groupBy(F.col(key_col), F.col("_island"))
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias(count_col),
        )
        .drop("_island")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-key time-weighted average of a step signal (carry-forward).

    Each value holds from its event until the key's next event; the average
    weights every value by how long it held:
    ``sum(value_i * (t_{i+1} - t_i)) / (t_last - t_first)``.  Keys with a
    single event (no elapsed time) report that value unchanged.  Output:
    ``(key, twa, span_us, n_events)``.

    One keyed window (``lead`` over the same partitioning the final agg
    uses) then one keyed agg — a single Exchange.  The quotient is rounded
    to ``decimals`` because a groupBy's float sum order is
    partition-dependent: rounding puts the ~1e-13 relative wobble far below
    the emitted precision, so results are stable across engines and runs.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us.asc(), F.col(value_col).asc())
    nxt = F.lead(us).over(w)
    seg = df.select(
        F.col(key_col),
        F.col(value_col).cast("double").alias("_v"),
        us.alias("_t"),
        nxt.alias("_nt"),
    )
    return (
        seg.groupBy(key_col)
        .agg(
            F.sum(F.when(F.col("_nt").isNotNull(), F.col("_v") * (F.col("_nt") - F.col("_t")))).alias("_num"),
            (F.max("_t") - F.min("_t")).alias("span_us"),
            F.count(F.lit(1)).alias("n_events"),
            # zero-span fallback: min value (deterministic; F.first is
            # partition-order-dependent under a groupBy)
            F.min("_v").alias("_only"),
        )
        .select(
            F.col(key_col),
            portable_round(
                F.when(F.col("span_us") > 0, F.col("_num") / F.col("span_us"))
                .otherwise(F.col("_only")),
                decimals,
            ).alias("twa"),
            "span_us",
            "n_events",
        )
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    interval: str = "1 hour",
    order_col: str | None = None,
) -> DataFrame:
    """Per-key fixed-interval resample with forward fill.

    Downsamples an irregular event series to a regular grid: one row per
    ``interval``-sized bucket from each key's first to last event bucket,
    carrying the key's LAST observed value at or before the bucket's end
    (``null`` only before a key's first observation — which cannot happen
    here because the grid starts at the first event's bucket).  The
    gap-filling half of pandas ``resample().ffill()`` for feature matrices
    and dashboard series.

    Scale shape: ONE keyed agg collapses raw events to at most one row per
    (key, bucket) — ``max_by`` over the (ts, order) struct picks the
    in-bucket last event deterministically (``order_col`` breaks exact ts
    ties; REQUIRED when (key, ts) can repeat).  Everything after operates
    on the bucket-level frame, whose size is span/interval × keys —
    independent of event count: the per-key grid explodes from a
    ``sequence()`` of the min..max bucket ids, and the fill is one
    ``last(ignorenulls)`` window over the SAME key partitioning the agg
    produced.  Events never meet a window function directly, so a key with
    a billion events costs the agg, not a sort of the raw series.
    """
    ivl = F.expr(f"INTERVAL {interval}")
    # interval width in micros: the DIFFERENCE cancels the epoch literal's
    # session-timezone offset (unix_micros of the shifted epoch alone would
    # embed it — under tz=Asia/Tokyo a '1 hour' interval would come out
    # NEGATIVE; same hazard class as nodes/datetimes.py's midnight-term
    # cancellation)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    ivl_us = F.unix_micros(epoch + ivl) - F.unix_micros(epoch)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ordc = F.col(order_col) if order_col is not None else F.lit(0)
    bucketed = (
        df.select(
            F.col(key_col),
            F.floor(us / ivl_us).cast("bigint").alias("bucket"),
            F.struct(us.alias("_u"), ordc.alias("_o")).alias("_ord"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.max_by("_v", "_ord").alias("_bv"))
    )
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.sequence("_mn", "_mx")).alias("bucket"),
    )
    joined = grid.join(bucketed, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        "bucket",
        (F.col("bucket") * ivl_us).alias("bucket_start_us"),
        F.last("_bv", ignorenulls=True).over(w).alias(value_col),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    *,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Empirical Markov transitions between consecutive states per key.

    Counts each observed ``(state → next_state)`` bigram within a key's
    time-ordered sequence and normalizes per source state:
    ``(from_state, to_state, n, p)``.  The sequence-model / user-journey
    summary next to :func:`funnel` — and because ``p`` is a ratio of two
    counts, every emitted float is a single correctly-rounded IEEE divide:
    bit-identical in any engine, no rounding hedge needed.

    One keyed window (lead over user-time order, tie-broken by
    ``order_cols`` for total order) feeding a tiny ``(from, to)`` keyed agg
    with map-side combine; the matrix is at most |states|² rows.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(F.col(state_col)).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_src)).alias("p"),
    )


def sessionize_stream_tws(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_micros: int = GAP_MICROS_DEFAULT,
) -> DataFrame:
    """Streaming sessionization on the Spark 4 ``transformWithStateInPandas``
    API — the same contract (and the same per-event loop) as
    :func:`sessionize_stream`, carried by a ``StatefulProcessor`` with one
    ``ValueState`` instead of the legacy ``applyInPandasWithState`` tuple.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = …RocksDBStateStoreProvider``)
    — the new API's state backend — and ``protobuf`` (the state-server
    wire protocol; absent in this test container, so the parity test
    auto-skips here and runs on any real Spark 4 deployment).  Both paths stay supported; this one is
    the forward-looking default where RocksDB state is already standard
    (it adds named state, timers, and TTL for free when the op grows into
    them).  Parity with the batch :func:`sessionize` is pinned in
    ``tests/test_sessions.py`` next to the legacy twin's test.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    gap = gap_micros

    class _SessionProcessor(StatefulProcessor):  # pragma: no cover - executor
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "session", "last_ts LONG, idx INT"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self._st.exists():
                last_ts, idx = self._st.get()
            else:
                last_ts, idx = None, 0
            out_rows, last_ts, idx = _session_loop(
                user_id, rows, last_ts, idx, gap
            )
            self._st.update((last_ts, idx))
            yield pd.DataFrame(
                out_rows, columns=["event_id", "user_id", "session_idx"]
            )

        def close(self) -> None:
            pass

    cols = df.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return cols.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def debounce(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    *,
    value_cols: list[str] | None = None,
    within_micros: int = 1_000_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Drop duplicate-burst events: keep a row unless it repeats the
    previous row's ``value_cols`` within ``within_micros`` per key.

    The event-stream debounce (double-clicks, retry storms, at-least-once
    delivery): a row survives iff it is its key's first event, differs
    from the immediately previous event in ANY of ``value_cols``
    (null-safe comparison), or arrives more than ``within_micros`` after
    it.  Chains collapse to their first element — a 5-click burst keeps
    one row even if each gap is under the window — which is the
    debounce contract (contrast :func:`sessionize`, which renumbers).

    ONE keyed window (lag over ``key_col`` ordered by event time +
    ``order_cols`` tie-break); row-local comparisons, no second shuffle.

    Batch/stream parity: rows sharing a ``(key, ts)`` need a total order
    or the keep/drop choice is nondeterministic.  ``order_cols`` defaults
    to ``["event_id"]`` when that column exists — the same tiebreak
    :func:`debounce_stream` hard-wires — so the twins agree out of the
    box; pass ``order_cols`` explicitly for other id columns.
    """
    from pyspark.sql import Window

    if order_cols is None and "event_id" in df.columns:
        order_cols = ["event_id"]
    vals = value_cols if value_cols is not None else [
        c
        for c in df.columns
        if c not in (key_col, ts_col) and c not in (order_cols or [])
    ]
    if not vals:
        raise ValueError(
            "debounce has no value columns to compare (key/ts/order columns "
            "are excluded) — pass value_cols explicitly"
        )
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    keep = (
        prev_ts.isNull()
        | changed
        | (F.unix_micros(F.col(ts_col)) - prev_ts > within_micros)
    )
    return df.withColumn("__keep", keep).where(F.col("__keep")).drop("__keep")


def debounce_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    *,
    value_cols: list[str],
    within_micros: int = 1_000_000,
) -> DataFrame:
    """Streaming :func:`debounce`: per-key (last_ts, last_values) state.

    Same contract as the batch op — a row survives iff it is its key's
    first event, differs from the PREVIOUS event in any ``value_cols``
    (null-safe), or arrives more than ``within_micros`` later — carried
    across micro-batches by ``applyInPandasWithState`` exactly like
    :func:`sessionize_stream`.  State is O(1) per key: one timestamp plus
    the compared values (stringified with a null sentinel — comparison
    state, not payload).  Events must arrive time-ordered per key across
    batches (sorted within each batch here); output carries
    ``(id, key, ts)`` — semi-join back for full rows.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    # key/id schemas come from the INPUT (string device ids work, not
    # just integer keys); only the emitted timestamp is a fixed long.
    out_schema = StructType(
        [
            StructField("event_id", df.schema[id_col].dataType),
            StructField("user_id", df.schema[key_col].dataType),
            StructField("ts_micros", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts_micros", LongType()),
            StructField("last_vals", StringType()),
        ]
    )

    def _ser(rec):
        # Collision-proof comparison state: length-prefixed pieces (no
        # separator to collide with) and distinct markers for null vs NaN
        # — Spark's eqNullSafe treats NaN == NaN but NULL != NaN, and the
        # batch twin must agree.
        import pandas as pd

        parts = []
        for c in value_cols:
            v = getattr(rec, c)
            if v is None:
                parts.append("N!")
            elif isinstance(v, float) and pd.isna(v):
                parts.append("F!")
            else:
                sv = str(v)
                parts.append(f"{len(sv)}:{sv}")
        return "".join(parts)

    def func(key, pdfs, state):  # pragma: no cover - executor side
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, last_vals = state.get
        else:
            last_ts, last_vals = None, None
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # concat before sorting — see _session_loop's chunk note
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            whole = whole.sort_values(["ts", "event_id"])
            for rec in whole.itertuples(index=False):
                micros = int(pd.Timestamp(rec.ts).value // 1000)
                vals = _ser(rec)
                keep = (
                    last_ts is None
                    or vals != last_vals
                    or micros - last_ts > within_micros
                )
                if keep:
                    rows.append((rec.event_id, user_id, micros))
                last_ts, last_vals = micros, vals
        state.update((last_ts, last_vals))
        yield pd.DataFrame(rows, columns=["event_id", "user_id", "ts_micros"])

    cols = df.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        *[F.col(c) for c in value_cols],
    )
    return cols.groupBy("user_id").applyInPandasWithState(
        func,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_micros: int = GAP_MICROS_DEFAULT,
    type_col: str | None = None,
) -> DataFrame:
    """Per-session summary rows: the analytics layer over :func:`sessionize`.

    ``(user, session_idx, n_events, start_us, end_us, duration_us,
    is_bounce[, n_types])`` — session duration, depth, and bounce flag
    (single-event sessions), the standard engagement rollup.

    The session index is computed with the same two windows as
    :func:`sessionize` but ``ts`` is carried through, so the per-session
    aggregation that follows groups on the SAME user-hash partitioning
    the windows established — one keyed Exchange end to end, no join
    back to the event table.
    """
    base = df.select(
        F.col(user_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        _session_idx(user_col, ts_col, id_col, gap_micros).alias("session_idx"),
        *([F.col(type_col)] if type_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
        (F.count(F.lit(1)) == 1).alias("is_bounce"),
    ]
    if type_col:
        aggs.append(F.count_distinct(F.col(type_col)).alias("n_types"))
    return base.groupBy(user_col, "session_idx").agg(*aggs)
