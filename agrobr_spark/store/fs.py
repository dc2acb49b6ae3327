"""Hadoop FileSystem helpers for store-path maintenance.

Store paths are plain strings that may point at any Hadoop-supported
filesystem (file://, s3a://, hdfs://...); driver-side maintenance
(existence probes, staging-dir cleanup) must go through the Hadoop FS
API, never ``os``/``shutil`` — those silently only work on the local
filesystem (round-2/round-3 review finding, completed here for the
delete path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved against the session's
    Hadoop configuration — the filesystem is chosen by the path's
    scheme, so s3a:// and hdfs:// resolve to their own clients."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        # LocalFileSystem is a ChecksumFileSystem: it writes .crc
        # sidecars and refuses reads of files modified outside Hadoop.
        # Store metadata must stay readable/tamper-checkable by OUR
        # content verification, not the transport checksum, so turn
        # both off (no-op on object stores, which use ETags instead).
        fs.setWriteChecksum(False)
        fs.setVerifyChecksum(False)
    except Exception:
        pass
    return fs, hpath


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FS API; missing paths are a
    no-op (mirrors ``shutil.rmtree(..., ignore_errors=True)`` for the
    narrow staging-cleanup use). Returns True when something was
    removed."""
    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def read_text(spark: SparkSession, path: str) -> str | None:
    """Small-file text read (store metadata, not data): None when the
    file is absent. Streams through the scheme's FS client, so the
    same metadata convention works on object stores."""
    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        # commons-io ships with Hadoop; one JVM call instead of a py4j
        # round-trip per byte
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Small-file text write (overwrite), parent dirs created by the
    FS client as needed."""
    fs, hpath = hadoop_fs(spark, path)
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def commit_json(path: str, obj: dict) -> None:
    """ATOMIC manifest commit for store metadata: write a temp
    sibling, then ``os.replace`` — readers observe the old or the new
    manifest, never a torn write. This is THE commit primitive behind
    every exactly-once/crash-safe store protocol in the engine
    (posting index epochs + compaction pointer swaps, folded
    streaming-state pointers), so the semantics live in exactly one
    place.

    Local/NFS-posix only by design: ``os.replace`` is atomic there
    (the container for these stores). On an object store, route the
    manifest through its conditional-put primitive instead — the
    layout and the commit protocol are unchanged, only this function
    swaps out."""
    import json
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def read_json(path: str) -> dict | None:
    """Counterpart read for :func:`commit_json` manifests: None when
    absent (same local-posix scope)."""
    import json
    import os

    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)
