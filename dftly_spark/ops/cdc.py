"""Changelog application: merge a CDC feed into a snapshot (upsert + delete).

Incremental corpus maintenance at 100 TB is "apply this batch of changes to
the stored table", not "rebuild the table".  Without a table format that
implements MERGE (Delta/Iceberg), the relational core is still two keyed
operators:

1. collapse the changelog to the LATEST change per key (one hash shuffle +
   per-key sort — ``row_number`` over ``(seq DESC)``), and
2. a full-outer equi-join of snapshot and collapsed changes on the key
   (both sides hash-partition on the same key, so the join co-locates; with
   bucketed storage on the key the snapshot side's Exchange disappears —
   see :func:`dftly_spark.ops.scale.write_bucketed`).

Rows whose latest change is a delete drop out; other changed keys take the
change's payload wholesale; untouched snapshot rows pass through.  This is
exactly the merge semantics of Delta's ``MERGE WHEN MATCHED [DELETE |
UPDATE SET *] WHEN NOT MATCHED INSERT *`` driven by a deduplicated feed.

The reference's incremental-ingest tooling (cross-corpus index joins,
``minhash_join_index``) covers the *dedup* half of ingest; this op covers
the *state-maintenance* half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changelog: DataFrame,
    key_col: str,
    *,
    seq_col: str = "seq",
) -> DataFrame:
    """Collapse a changelog to one row per key: highest ``seq_col`` wins.

    Ties on ``seq`` are broken deterministically by preferring the larger
    operation string then larger payload ordering is NOT attempted — emit
    unique sequence numbers per key upstream (CDC sources do).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_col: str,
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply ``changelog`` (insert/update/delete rows) onto ``snapshot``.

    ``changelog`` carries the snapshot's columns plus ``seq_col`` (change
    order, larger = newer) and ``op_col`` (``delete_op`` marks deletes; any
    other value is an upsert).  Returns the post-merge table with the
    snapshot's schema.

    The latest change per key is selected first, so a key that is updated
    then deleted within the batch ends deleted, and stale updates lose.
    """
    payload_cols = [c for c in snapshot.columns if c != key_col]
    latest = latest_changes(changelog, key_col, seq_col=seq_col)

    snap = snapshot.alias("s")
    chg = latest.alias("c")
    joined = snap.join(chg, F.col(f"s.{key_col}") == F.col(f"c.{key_col}"), "full_outer")

    has_change = F.col(f"c.{op_col}").isNotNull()
    keep = ~has_change | (F.col(f"c.{op_col}") != delete_op)
    merged = joined.where(keep).select(
        F.coalesce(F.col(f"c.{key_col}"), F.col(f"s.{key_col}")).alias(key_col),
        *[
            F.when(has_change, F.col(f"c.{col}"))
            .otherwise(F.col(f"s.{col}"))
            .alias(col)
            for col in payload_cols
        ],
    )
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same table by key: added/removed/changed.

    The data-versioning primitive: given yesterday's and today's corpus
    (same schema), return one row per key whose state differs —
    ``(key_cols…, change, changed_cols)`` with ``change`` ∈ ``'added'`` /
    ``'removed'`` / ``'changed'`` and ``changed_cols`` a comma-joined sorted
    list of differing columns (empty for added/removed).  Unchanged keys
    produce no row, so the output is |Δ|-sized, not |table|-sized.

    One full-outer equi-join on the key — both sides hash-partition on the
    same columns, so the join co-locates; snapshots bucketed on the key
    (:func:`dftly_spark.ops.scale.write_bucketed`) drop both Exchanges.
    Column comparison is null-safe (``IS DISTINCT FROM``), column by column
    — no row-hash, so the diff is replayable by any engine bit-for-bit.

    Keys must be unique per snapshot (it is a keyed table contract —
    pre-collapse with :func:`latest_changes` if not).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in compare_cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols absent from new snapshot: {missing}")

    # Presence markers survive the outer join even if a key value is null.
    o = old.withColumn("_in_o", F.lit(True)).alias("o")
    nw = new.withColumn("_in_n", F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(nw, cond, "full_outer")

    in_old = F.col("o._in_o").isNotNull()
    in_new = F.col("n._in_n").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in sorted(compare_cols)
    ]
    changed_cols = F.concat_ws(",", F.filter(F.array(*diffs), lambda x: x.isNotNull()))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in keys
            ],
            change.alias("change"),
            F.when(change == "changed", changed_cols).otherwise(F.lit("")).alias(
                "changed_cols"
            ),
        )
        .where(F.col("change").isNotNull())
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    *,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change feed.

    The warehouse-side twin of :func:`merge_upsert`: instead of keeping only
    each key's latest state, keep every DISTINCT state with its validity
    interval.  Consecutive feed rows that repeat the previous state collapse
    (heartbeats/no-op updates don't open versions); each surviving version
    gets ``valid_from`` (its first observation), ``valid_to`` (the next
    version's start, null while current) and ``is_current``.

    Two window passes over the SAME key partitioning — change detection
    (null-safe ``lag`` comparison per value column, so NULL→value and
    value→NULL transitions version correctly) and ``lead`` for interval
    close — means one keyed Exchange; the filter between them only shrinks
    partitions.  Ties in ``ts`` are broken by ``order_cols`` for a total
    order.  At 100 TB this is the sessionize shape: sort-dominated within
    hash partitions, no cross-key state.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in value_cols:
        # null-safe "differs from previous row" per column
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_first = F.row_number().over(w) == 1
    versions = changes.withColumn("_new", is_first | changed).where(F.col("_new"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        versions.select(
            F.col(key_col),
            *[F.col(c) for c in value_cols],
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two snapshots' SCHEMAS: added/removed/retyped/renullabled columns.

    The metadata companion to :func:`snapshot_diff` — run it FIRST when a
    feed regenerates (the testdata here has already flipped a timestamp's
    physical type once): catching ``retyped`` before the value diff saves
    a full-table scan that would fail or, worse, silently coerce.

    Pure metadata — reads both schemas, touches no data, runs no job.
    Returns ``(column, change, old_type, new_type)`` with ``change`` ∈
    ``added`` / ``removed`` / ``retyped`` / ``renullabled``; an empty
    result means the schemas agree exactly.
    """
    spark = old.sparkSession
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    rows = []
    for name in sorted(o.keys() | n.keys()):
        fo, fn = o.get(name), n.get(name)
        if fo is None:
            rows.append((name, "added", None, fn.dataType.simpleString()))
        elif fn is None:
            rows.append((name, "removed", fo.dataType.simpleString(), None))
        elif fo.dataType != fn.dataType:
            rows.append(
                (name, "retyped", fo.dataType.simpleString(),
                 fn.dataType.simpleString())
            )
        elif fo.nullable != fn.nullable:
            rows.append(
                (name, "renullabled",
                 f"nullable={fo.nullable}", f"nullable={fn.nullable}")
            )
    return spark.createDataFrame(
        rows, "column string, change string, old_type string, new_type string"
    )


def scd2_snapshot(
    history: DataFrame,
    at,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time travel over an SCD2 history: the dimension state as of ``at``.

    Row-local validity filter — ``valid_from <= at < valid_to`` (open
    current versions qualify via the null ``valid_to``) — so the snapshot
    pushes into the scan of a stored history table and costs one
    filtered read, never a window or join.  ``at`` is a timestamp-castable
    literal (string or datetime).
    """
    if isinstance(at, str):
        # parse driver-side so a typo'd timestamp fails LOUDLY — under
        # non-ANSI configs a bad string casts to NULL and every validity
        # comparison silently drops all rows ("empty snapshot")
        import datetime as _dt

        _dt.datetime.fromisoformat(at)
    ts = F.lit(at).cast("timestamp")
    return history.where(
        (F.col(from_col).cast("timestamp") <= ts)
        & (F.col(to_col).isNull() | (F.col(to_col).cast("timestamp") > ts))
    ).drop("is_current")
