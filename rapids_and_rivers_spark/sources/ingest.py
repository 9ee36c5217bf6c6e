"""Batch ingest/egress utilities: JSONL with corrupt-record routing,
partitioned parquet, and bucketed tables for co-located joins.

These complete the lakehouse loop around the engine:

- :func:`read_jsonl` — the LLM-corpus interchange format, read with the
  rapid's DLQ philosophy: bad lines are never silently dropped, they are
  ROUTED (the batch analog of the streaming runtime's unparseable
  verdict channel).
- :func:`write_partitioned` — hive-partitioned parquet output, the shape
  downstream consumers prune on.
- :func:`write_bucketed` / :func:`bucketed_table` — Spark bucketing: two
  tables bucketed on the same key with the same bucket count join with
  ZERO exchanges (verified by test_ingest.py's plan assertion). At 100 TB
  this converts every repeated fact-to-fact join from a full shuffle
  into a local zip of pre-sorted buckets — the single biggest repeatable
  shuffle win a pipeline can bank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines, splitting parseable from corrupt rows.

    Returns ``(good, bad)``: ``good`` carries the declared/inferred
    columns (corrupt rows excluded), ``bad`` carries the raw offending
    line in ``_corrupt_record`` for DLQ landing — the batch analog of the
    streaming runtime's unparseable verdict channel, and the same parse
    shape (text scan + ``from_json``), which sidesteps Spark's
    corrupt-column-only query restriction on native JSON reads. Blank
    lines are skipped like the rapid's tombstone filter.

    Pass an explicit ``schema`` at scale — inference costs a full extra
    pass over the data (done here only when ``schema`` is None).
    """
    if schema is None:
        inferred = spark.read.option("mode", "DROPMALFORMED").json(path).schema
        schema = ",".join(f"`{f.name}` {f.dataType.simpleString()}" for f in inferred)
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    # from_json in PERMISSIVE mode yields null-filled structs (with the
    # embedded corrupt-record field set) for malformed input — EXCEPT the
    # JSON literal `null`, which yields a NULL struct; both are corrupt
    # for a JSONL contract (one object per line), so route both
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value", full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("__row"),
    )
    is_bad = F.col("__row").isNull() | F.col(f"__row.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~is_bad).select("__row.*").drop(CORRUPT_COL)
    bad = parsed.filter(is_bad).select(F.col("value").alias(CORRUPT_COL))
    return good, bad


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet: downstream scans prune on the partition
    columns for free (the lakehouse layout every consumer expects)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    external parquet table.

    Bucketing pre-shuffles ONCE at write time: every future join or
    aggregation on ``bucket_cols`` against an equally-bucketed table
    skips its exchange (and with ``sort_cols``, its sort). The cost model
    at 100 TB: one write-side shuffle buys N shuffle-free reads.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it and re-shuffle)."""
    return spark.table(table_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally-ordered parquet output WITHOUT a single-task global sort.

    ``repartitionByRange`` samples the sort keys and splits rows into
    contiguous key ranges (one shuffle, all tasks parallel), then each
    partition sorts locally — file k holds keys entirely before file k+1,
    and parquet min/max footers become perfectly selective for range
    predicates. An ``orderBy().write`` would plan the same thing, but
    being explicit keeps the parallel-range intent visible and lets the
    file count be pinned. This is the scale-safe way to ship "sorted
    output" at 100 TB; a ``coalesce(1)`` or partition-less window sort is
    the anti-pattern (single task, single file).
    """
    if num_files is not None and num_files <= 0:
        raise ValueError(f"num_files must be positive, got {num_files}")
    parts = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_bytes: int = 128 << 20,
    sort_within: list[str] | None = None,
) -> tuple[int, int]:
    """Small-files compaction: rewrite ``src`` into ``dest`` with file
    sizes near ``target_bytes``. Returns ``(files_before, files_after)``.

    The small-files problem is a first-order 100 TB cost: streaming sinks
    and fine-grained partitions produce thousands of KB-sized parquet
    files, and every downstream scan then pays per-file open/footer
    overhead and schedules tiny tasks. Compaction trades ONE write-side
    shuffle for every future scan reading ~`target_bytes` splits.

    Sizes come from the JVM Hadoop FileSystem (works for any supported
    scheme, not just ``file:``). ``sort_within`` additionally clusters
    rows within each output file (repartition + sortWithinPartitions) so
    min/max footer stats become selective — the poor man's Z-order for
    single-column predicates. ``dest`` must differ from ``src``: Spark
    cannot safely overwrite an input path it is still reading.
    """
    if src.rstrip("/") == dest.rstrip("/"):
        raise ValueError("compact into a different path, then swap atomically")
    df = spark.read.parquet(src)
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    summary = fs.getContentSummary(hpath)
    total = summary.getLength()
    files_before = len(df.inputFiles())
    n_out = max(1, -(-total // target_bytes))  # ceil
    out = df.repartition(int(n_out))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").parquet(dest)
    files_after = len(spark.read.parquet(dest).inputFiles())
    return files_before, files_after


def morton_key(cols: list, bits: int = 16):
    """Z-order (Morton) clustering key: interleave the low ``bits`` bits
    of k integer columns — bit ``i`` of column ``j`` lands at position
    ``i * k + j``.

    Rows close in Morton order are close in EVERY dimension, so a write
    clustered on this key gives parquet min/max footers that are
    selective for predicates on ANY of the interleaved columns (classic
    multi-dimensional data skipping; single-column sort only helps its
    own column). Pure bit arithmetic, codegen-fused.
    """
    if not cols:
        raise ValueError("morton_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {bits * len(cols)} interleaved "
            "bits; must fit a signed 64-bit long (<= 63)"
        )
    k = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        low = c.bitwiseAND(F.lit(mask))
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(low, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet output clustered on the Morton key of ``cols``.

    Same parallel-range shape as :func:`write_sorted` (repartitionByRange
    samples the z-key, each task sorts its range locally — no global
    single-task sort), but each output file becomes a bounded RECTANGLE
    in the interleaved dimensions instead of an interval in one: range
    predicates on any clustered column skip files via footer stats. The
    helper z-key never hits disk.
    """
    zcols = [F.col(c) for c in cols]
    tagged = df.withColumn("__z", morton_key(zcols, bits=bits))
    parts = (
        tagged.repartitionByRange(num_files, "__z")
        if num_files is not None
        else tagged.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def read_csv_routed(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """CSV with the same DLQ philosophy as :func:`read_jsonl`: rows that
    fail the declared schema are ROUTED, not dropped (PERMISSIVE parse +
    corrupt-record column). Schema is REQUIRED — CSV inference costs a
    full extra pass and silently widens types; a 100 TB ingest declares
    its contract up front.

    PERMISSIVE null-pads SHORT rows (too few fields) without setting the
    corrupt column, so by default they pass through ``good`` as nulls —
    pass ``required`` (column names that must be non-null) to route them
    to ``bad`` instead.

    Returns ``(good, bad)``; ``bad`` carries the raw offending line —
    BYTE-FAITHFUL for every routed row class (ADVICE r5: the previous
    native-CSV implementation re-serialized required-null rows via
    ``to_csv``, so quoting/formatting could drift from the source
    bytes). The parse is one text scan + ``from_csv`` — the same shape
    as :func:`read_jsonl` — so the raw line rides next to the parsed
    struct and the DLQ replay contract holds exactly. CSV is
    row-oriented, so this costs no pushdown the native reader had:
    column pruning on CSV only saves parse CPU, never I/O, and
    ``from_csv`` parses the same declared schema.
    """
    data_fields = [
        f.strip().split()[0].strip("`") for f in schema.split(",") if f.strip()
    ]
    null_padded = F.lit(False)
    for c in required or []:
        if c not in data_fields:
            raise ValueError(f"required column {c!r} not in declared schema")
        null_padded = null_padded | F.col(f"__row.{c}").isNull()
    lines = spark.read.text(path)
    if header:
        # drop the first PHYSICAL line of each file: text-source rows
        # keep file order within a split, splits are indexed in offset
        # order, and monotonically_increasing_id embeds the partition
        # index in its high bits — so min id per file IS the header
        # line. The per-file min is a map-side-combinable aggregate
        # (one row per file) broadcast back — NO per-file window, which
        # would shuffle every line of a file to one task.
        ids = lines.select(
            "value",
            F.input_file_name().alias("__f"),
            F.monotonically_increasing_id().alias("__i"),
        )
        headers = ids.groupBy("__f").agg(F.min("__i").alias("__h"))
        lines = (
            ids.join(F.broadcast(headers), "__f")
            .filter(F.col("__i") > F.col("__h"))
            .select("value")
        )
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            "value",
            full_schema,
            {
                "sep": sep,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
            },
        ).alias("__row"),
    )
    is_bad = (
        F.col("__row").isNull()
        | F.col(f"__row.{CORRUPT_COL}").isNotNull()
        | null_padded
    )
    good = parsed.filter(~is_bad).select("__row.*").drop(CORRUPT_COL)
    bad = parsed.filter(is_bad).select(F.col("value").alias(CORRUPT_COL))
    return good, bad


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC egress (built into the Spark distribution — no extra jars):
    the interchange format for Hive/Trino-side consumers. Columnar,
    predicate-pushdown-capable like parquet; the engine treats it as a
    peer sink so a downstream warehouse never forces a format detour
    through a driver-side export.
    """
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — schema carried by the files, pushdown verified by
    test (PushedFilters reaches the OrcScan exactly as with parquet)."""
    return spark.read.orc(path)


def training_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    output — the last stage of a pretraining data pipeline: after
    dedup/filter/pack, examples must land in size-balanced shards in a
    reproducible pseudorandom order.

    ``shard``       = md5-prefix bucket of the example key (the engine's
                      cross-engine hash contract — text.token_hash_bucket;
                      Spark's rand()/sample() are seed+partition dependent
                      and repartition alone is not reproducible).
    ``shuffle_key`` = the full md5 hex of (key || salt): ordering by it
                      within a shard IS a uniform random permutation fixed
                      by the data alone — re-runs, retries and cluster
                      resizes produce byte-identical shard contents.

    ``salt`` reshuffles between epochs ("epoch1", "epoch2", ...) without
    any RNG state. At 100 TB: one hash-partitioned shuffle on the shard
    id, each shard sorts locally (no global sort), writers emit
    sequential runs — pair with write_training_shards for bounded file
    sizes.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    out = df.withColumn("shuffle_key", h).withColumn(
        "shard",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).cast(
            "int"
        ),
    )
    return out.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "shuffle_key"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize :func:`training_shards` as one directory per shard
    (``shard=N/``) with deterministic file contents; setting
    ``max_records_per_file`` bounds individual file sizes so a skewed
    shard still emits readable-sized parquet at scale."""
    w = training_shards(df, key_col, n_shards, salt).write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.partitionBy("shard").parquet(path)
