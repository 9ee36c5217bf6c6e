"""Ingest/egress utilities: JSONL corrupt routing, partition pruning,
bucketed co-located joins (the zero-exchange plan assertion)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from rapids_and_rivers_spark.sources import (
    bucketed_table,
    read_jsonl,
    write_bucketed,
    write_partitioned,
)


def test_read_jsonl_routes_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": 3, "text": unquoted}\n'
        "null\n"
    )
    good, bad = read_jsonl(spark, str(p), schema="doc_id bigint, text string")
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "good"),
        (2, "also good"),
    ]
    bad_lines = sorted(r._corrupt_record for r in bad.collect())
    # the JSON literal `null` parses to a NULL struct, not an object —
    # corrupt under the one-object-per-line contract, never a phantom row
    assert bad_lines == ["null", "this is not json", '{"doc_id": 3, "text": unquoted}']


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", f"t{i}") for i in range(30)],
        "doc_id long, source string, text string",
    )
    out = str(tmp_path / "parted")
    write_partitioned(df, out, ["source"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("source=")
    ) == ["source=src0", "source=src1", "source=src2"]
    read = spark.read.parquet(out).filter(F.col("source") == "src1")
    assert read.count() == 10
    # partition pruning visible in the plan: only one partition's files scanned
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The headline: two tables bucketed on the same key join with ZERO
    shuffles (and with sortBy, no extra sort on the probe side)."""
    facts = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(1000)], "k long, i long, x double"
    )
    dims = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "k long, name string"
    )
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    write_bucketed(facts, "b_facts", str(tmp_path / "bf"), ["k"], 8, sort_cols=["k"])
    write_bucketed(dims, "b_dims", str(tmp_path / "bd"), ["k"], 8, sort_cols=["k"])
    try:
        with_broadcast_off = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {k: spark.conf.get(k) for k in with_broadcast_off}
        for k, v in with_broadcast_off.items():
            spark.conf.set(k, v)
        try:
            joined = bucketed_table(spark, "b_facts").join(
                bucketed_table(spark, "b_dims"), "k"
            )
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            assert joined.count() == 1000
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_compact_parquet_reduces_files(spark, tmp_path):
    from rapids_and_rivers_spark.sources import compact_parquet

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(2000)], "id long, payload string"
    )
    df.repartition(40).write.parquet(src)
    before, after = compact_parquet(
        spark, src, dest, target_bytes=64 << 20, sort_within=["id"]
    )
    assert before == 40 and after == 1
    out = spark.read.parquet(dest)
    assert out.count() == 2000
    assert sorted(r.id for r in out.collect()) == list(range(2000))


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    from rapids_and_rivers_spark.sources import compact_parquet

    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError):
        compact_parquet(spark, p, p + "/")


def test_write_sorted_range_partitioned_global_order(spark, tmp_path):
    from rapids_and_rivers_spark.sources import write_sorted

    out = str(tmp_path / "sorted")
    df = spark.createDataFrame(
        [((i * 7919) % 1000, i) for i in range(1000)], "k long, v long"
    )
    write_sorted(df, out, ["k"], num_files=4)
    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    # global order across files: every key in file i precedes file i+1
    ranges = []
    for f in files:
        ks = [r.k for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks)  # sorted within file
        if ks:
            ranges.append((min(ks), max(ks)))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_write_sorted_rejects_zero_files(spark, tmp_path):
    from rapids_and_rivers_spark.sources import write_sorted

    with pytest.raises(ValueError):
        write_sorted(spark.range(5), str(tmp_path / "x"), ["id"], num_files=0)


def test_csv_routed_splits_good_and_bad(spark, tmp_path):
    from rapids_and_rivers_spark.sources.ingest import read_csv_routed

    p = tmp_path / "in.csv"
    p.write_text("id,score\n1,2.5\n2,notanumber\n3,4.0\n")
    good, bad = read_csv_routed(
        spark, str(p), "id int, score double", header=True
    )
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [
        (1, 2.5),
        (3, 4.0),
    ]
    assert bad.count() == 1
    assert "notanumber" in bad.collect()[0][0]


def test_csv_routed_dlq_is_byte_faithful(spark, tmp_path):
    """Every routed row class lands in bad with its RAW source bytes
    (ADVICE r5): leading zeros, odd quoting, and trailing separators
    must survive exactly — no to_csv re-serialization drift."""
    from rapids_and_rivers_spark.sources.ingest import read_csv_routed

    p = tmp_path / "in.csv"
    # "03,"      -> short/required-null row, leading zero + trailing sep
    # '" 7 ",x'  -> malformed number, quoted padded field
    p.write_text('id,score\n1,2.5\n03,\n" 7 ",x\n')
    good, bad = read_csv_routed(
        spark, str(p), "id int, score double", header=True,
        required=["id", "score"],
    )
    assert [(r["id"], r["score"]) for r in good.collect()] == [(1, 2.5)]
    assert sorted(r[0] for r in bad.collect()) == ['" 7 ",x', "03,"]


def test_csv_routed_multifile_header_drop(spark, tmp_path):
    """Header skipping is per FILE (min physical line of each), not
    per directory — a multi-file ingest drops exactly one header per
    part and no data lines."""
    from rapids_and_rivers_spark.sources.ingest import read_csv_routed

    d = tmp_path / "csvdir"
    d.mkdir()
    (d / "a.csv").write_text("id,score\n1,1.0\n2,2.0\n")
    (d / "b.csv").write_text("id,score\n3,3.0\n")
    good, bad = read_csv_routed(
        spark, str(d), "id int, score double", header=True
    )
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [
        (1, 1.0),
        (2, 2.0),
        (3, 3.0),
    ]
    assert bad.count() == 0


def test_csv_routed_required_routes_short_rows(spark, tmp_path):
    """PERMISSIVE null-pads short rows without marking them corrupt;
    with ``required`` those rows are ROUTED to bad (raw bytes), not
    silently passed through as nulls."""
    from rapids_and_rivers_spark.sources.ingest import read_csv_routed

    p = tmp_path / "in.csv"
    # row "3" is short (missing score) -> null-padded under PERMISSIVE
    p.write_text("id,score\n1,2.5\n3\n2,notanumber\n")
    good, bad = read_csv_routed(
        spark, str(p), "id int, score double", header=True,
        required=["id", "score"],
    )
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [(1, 2.5)]
    bad_rows = [r[0] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("notanumber" in b for b in bad_rows)
    assert any(b.startswith("3") for b in bad_rows)
    # unknown required column is a loud error, not a silent no-op
    import pytest

    with pytest.raises(ValueError, match="required column"):
        read_csv_routed(
            spark, str(p), "id int, score double", required=["nope"]
        )


def test_orc_round_trip_preserves_values_and_pushes_filters(spark, tmp_path):
    from conftest import sf_dir

    from rapids_and_rivers_spark.sources.ingest import read_orc, write_orc
    from rapids_and_rivers_spark.sources import load_table

    ev = load_table(spark, sf_dir(), "events").select(
        "event_id", "event_type", "value"
    )
    out = str(tmp_path / "ev_orc")
    write_orc(ev, out)
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    # predicate pushdown reaches the ORC scan like parquet
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "event_type" in plan


def test_training_shards_deterministic_and_balanced(spark, tmp_path):
    """Two independent writes of the same corpus produce identical
    per-shard row sequences (the reproducible-shuffle contract); shards
    are size-balanced; within-shard order is the md5 permutation; salt
    changes the permutation; maxRecordsPerFile bounds files."""
    import glob
    import os

    import pyarrow.parquet as pq

    from rapids_and_rivers_spark.sources import load_table
    from rapids_and_rivers_spark.sources.ingest import (
        training_shards,
        write_training_shards,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source"
    )
    n = docs.count()

    def dump(path):
        write_training_shards(
            docs, path, "doc_id", n_shards=8, salt="e1", max_records_per_file=40
        )
        out = {}
        for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
            rows = []
            for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                t = pq.read_table(f)
                assert t.num_rows <= 40  # maxRecordsPerFile respected
                rows.extend(
                    zip(t.column("doc_id").to_pylist(),
                        t.column("shuffle_key").to_pylist())
                )
            out[d.rsplit("=", 1)[1]] = rows
        return out

    a = dump(str(tmp_path / "w1"))
    b = dump(str(tmp_path / "w2"))
    assert a == b  # byte-identical shard sequences across runs
    sizes = [len(v) for v in a.values()]
    assert len(sizes) == 8 and sum(sizes) == n
    assert max(sizes) <= 2.0 * (n / 8)  # md5 balance at 500 rows
    for rows in a.values():
        keys = [k for _, k in rows]
        assert keys == sorted(keys)  # the md5 permutation, per shard

    # a different epoch salt is a different permutation of the same rows
    s2 = training_shards(docs, "doc_id", 8, salt="e2")
    first_e2 = s2.filter("shard = 0").limit(3).collect()
    ids_e1_shard0 = {i for i, _ in a.get("0", [])}
    assert {r["doc_id"] for r in first_e2} != set() and (
        {r["doc_id"] for r in first_e2} - ids_e1_shard0 != set()
        or [r["shuffle_key"] for r in first_e2]
        != [k for _, k in a.get("0", [])[:3]]
    )
