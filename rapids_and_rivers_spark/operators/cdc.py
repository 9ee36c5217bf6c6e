"""Change-data-capture apply: MERGE semantics (upsert + delete) as one
declarative plan — the batch half of the lakehouse pattern whose
streaming half is the SCD2 changelog (streaming/duals.scd2_stream emits
exactly the upsert stream this operator consumes).

Scale shape: resolving "latest change per key" is a per-key rank window
(keyed shuffle); the apply is ONE full-outer join base ⋈ latest on the
key. Nothing is collected; the result is a new snapshot DataFrame a
writer materializes (at 100 TB with a real table format — Delta/Iceberg
— the same resolution feeds a native MERGE INTO; this operator IS that
semantics for plain parquet snapshots, and its determinism contract
(seq tie-break on a total order) is what makes re-applies reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change stream to its final intent per key: the row
    with the highest ``seq`` wins; ties break deterministically toward
    delete-last (op DESC puts 'U' < 'D'... explicitly: ops sort
    descending lexicographically so 'U'pserts outrank 'D'eletes at equal
    seq — pick a real total order and document it, the property replays
    need). One rank window partitioned by key."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE a change set into a base snapshot: latest 'U' per key
    upserts (insert if absent, replace if present), latest 'D' deletes.
    Payload columns are every change column except ``seq``/``op`` and
    must cover the base schema.

    One rank window + one full-outer join on the key; rows with no
    change pass through, 'U' rows take the change payload, 'D' rows drop.
    """
    latest = latest_changes(changes, key_cols, seq_col, op_col)
    payload_cols = [
        c for c in latest.columns if c not in {seq_col, op_col}
    ]
    lat = latest.select(
        *[F.col(c).alias(f"_c_{c}") for c in payload_cols],
        F.col(op_col).alias("_op"),
    )
    cond = [base[k] == lat[f"_c_{k}"] for k in key_cols]
    joined = base.join(lat, cond, "full_outer")
    out_cols = []
    for c in base.columns:
        out_cols.append(
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(base[c])
            .alias(c)
        )
    return joined.filter(
        F.col("_op").isNull() | (F.col("_op") == "U")
    ).select(*out_cols)
