"""Scheme-aware filesystem helpers for the streaming epoch stores.

Every store operation in :mod:`duals` used to go through ``os.path`` /
``os.walk`` — correct on local disk, silently wrong on S3/HDFS where
``os.path.isdir("s3a://…")`` is False, so a prior-epoch store would be
treated as absent and its anti-join skipped (double-counting replayed
memberships — ADVICE r8, duals.py:3389). These helpers resolve the
path's scheme through the Hadoop ``FileSystem`` API (the same resolver
``spark.read`` uses), so the probe agrees with the read that follows it.

When no Spark session is active AND the path has no scheme (plain local
paths in unit tests before a session exists), they fall back to the
stdlib implementations — behaviorally identical on local disk.

All calls are driver-side, once-per-epoch metadata operations (probe a
store, list snapshot versions, pin a bucket count); the py4j round-trip
cost is irrelevant next to the epoch's own jobs.
"""

from __future__ import annotations

import os

__all__ = [
    "exists",
    "listdir",
    "has_parquet_files",
    "mkdirs",
    "read_text",
    "write_text",
    "delete",
    "rename",
]

_LOCAL_SCHEMES = ("", "file")


def _scheme(path: str) -> str:
    i = path.find("://")
    return path[:i] if i > 0 else ""


def _jfs(path: str):
    """(FileSystem, Path, jvm) for ``path``, or None when no active
    session (caller falls back to stdlib for scheme-less paths)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        if _scheme(path) in _LOCAL_SCHEMES:
            return None
        raise RuntimeError(
            f"no active SparkSession to resolve non-local path {path!r}"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(path: str) -> bool:
    h = _jfs(path)
    if h is None:
        return os.path.exists(path)
    fs, jpath, _ = h
    return bool(fs.exists(jpath))


def listdir(path: str) -> list:
    """Child NAMES of ``path`` (like ``os.listdir``); empty list when the
    path does not exist — probe + list collapse into one call for the
    snapshot-version scans."""
    h = _jfs(path)
    if h is None:
        return sorted(os.listdir(path)) if os.path.isdir(path) else []
    fs, jpath, _ = h
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))


def has_parquet_files(path: str) -> bool:
    """True iff any ``*.parquet`` data file exists under ``path``
    (recursive, short-circuits on the first). An empty epoch write
    leaves only ``_SUCCESS``; schema inference over a part-less store
    throws, so stores are probed with this before ``spark.read``."""
    h = _jfs(path)
    if h is None:
        for r, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False
    fs, jpath, _ = h
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def mkdirs(path: str) -> None:
    h = _jfs(path)
    if h is None:
        os.makedirs(path, exist_ok=True)
        return
    fs, jpath, _ = h
    fs.mkdirs(jpath)


def read_text(path: str) -> str:
    h = _jfs(path)
    if h is None:
        with open(path) as f:
            return f.read()
    fs, jpath, jvm = h
    stream = fs.open(jpath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        out = []
        line = reader.readLine()
        while line is not None:
            out.append(line)
            line = reader.readLine()
        return "\n".join(out)
    finally:
        stream.close()


def write_text(path: str, text: str) -> None:
    h = _jfs(path)
    if h is None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        return
    fs, jpath, _ = h
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def delete(path: str) -> None:
    """Recursive delete; no-op when the path does not exist."""
    h = _jfs(path)
    if h is None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, jpath, _ = h
    if fs.exists(jpath):
        fs.delete(jpath, True)


def rename(src: str, dst: str) -> None:
    """Directory/file rename. Atomic on HDFS and local disk; on object
    stores it is a copy — callers that need crash-safety gate on the
    _SUCCESS-marked source and make the whole sequence resumable (the
    compaction discipline in duals.compact_epoch_store)."""
    h = _jfs(src)
    if h is None:
        os.rename(src, dst)
        return
    fs, jsrc, jvm = h
    if not fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)):
        raise IOError(f"rename failed: {src} -> {dst}")
