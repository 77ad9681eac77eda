"""Thin Hadoop FileSystem wrapper for driver-side METADATA operations.

The durable index layout (mapindex.py: sidecar JSON, bucket directories,
rebucket staging swap) and the CDC file fixtures need a handful of
filesystem primitives — list, read/write a small text file, rename,
recursive delete. Doing these with os/shutil silently pins the whole
subsystem to local/shared-POSIX storage; a 100 TB deployment keeps its
index on HDFS or an object store. Routing them through
``org.apache.hadoop.fs.FileSystem`` (reached via the live JVM, so
whatever connectors the cluster ships — hdfs://, s3a://, file:/ — work
unchanged) makes the layout portable while staying driver-side metadata:
every call here is O(#buckets) names or a few KB of JSON, never data.

S3 semantics note: ``rename`` is atomic on HDFS and POSIX but is a
server-side COPY on object stores (S3A emulates it non-atomically). The
rebucket swap in mapindex.py therefore documents that an object-store
deployment should front the directory swap with a pointer/manifest
update (metastore table location or an Iceberg/Delta-style manifest)
rather than relying on rename atomicity; the layout and call pattern
stay identical.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession


def join(base: str, *parts: str) -> str:
    """URI-safe path join (forward slashes regardless of platform)."""
    return posixpath.join(base, *parts)


class HadoopFS:
    """FileSystem facade bound to one base path's scheme/authority."""

    def __init__(self, spark: SparkSession, path: str):
        self._jvm = spark._jvm
        self._jPath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jPath(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    # -- predicates --------------------------------------------------------

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._jPath(path)))

    def is_dir(self, path: str) -> bool:
        p = self._jPath(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    # -- listing -----------------------------------------------------------

    def list_names(self, path: str) -> list[str]:
        """Child entry NAMES of a directory (the os.listdir analogue)."""
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._jPath(path))
        ]

    # -- small-file IO (sidecars) ------------------------------------------

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._jPath(path))
        try:
            bos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, bos, 4096, False
            )
            return bytes(bos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._jPath(path), True)  # overwrite
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- mutation ----------------------------------------------------------

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._jPath(path))

    def rename(self, src: str, dst: str) -> bool:
        """HDFS/POSIX: atomic directory move. Object stores: a copy — see
        module docstring before relying on this for a commit point."""
        return bool(self._fs.rename(self._jPath(src), self._jPath(dst)))

    def delete(self, path: str) -> bool:
        return bool(self._fs.delete(self._jPath(path), True))

    def set_times(self, path: str, mtime_ms: int) -> None:
        self._fs.setTimes(self._jPath(path), mtime_ms, -1)


def dynamic_overwrite_dropping_emptied(
    spark,
    out,
    path: str,
    partition_col: str,
    dir_for,
    affected,
) -> None:
    """Dynamic-partition-overwrite ``out`` (already repartitioned/sorted)
    into ``path``, then DROP any affected partition directory whose file
    listing is unchanged: dynamic overwrite replaces only partitions
    present in the output, so a partition whose merged content is EMPTY
    (every entry retracted) keeps its old files — the unchanged listing
    detects it and the delete is the filesystem expression of a metastore
    DROP PARTITION. Driver-side metadata only, through the Hadoop FS API
    so the layout lives on hdfs://s3a:// unchanged. Shared by the
    mapindex durable merge and the IVF vector index's cell maintenance.

    ``dir_for(p)`` maps a partition value to its directory; ``affected``
    is the (metadata-scale) list of partition values the merge touches.
    """
    fs = HadoopFS(spark, path)
    before = {
        b: frozenset(fs.list_names(dir_for(b)))
        for b in affected
        if fs.is_dir(dir_for(b))
    }
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    for b, listing in before.items():
        d = dir_for(b)
        if fs.is_dir(d) and frozenset(fs.list_names(d)) == listing:
            fs.delete(d)
