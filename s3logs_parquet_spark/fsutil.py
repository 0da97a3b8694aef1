"""Driver-side filesystem ops through Hadoop ``FileSystem``.

Maintenance paths (staging-dir scan, compaction) need to list, stat,
rename and delete on whatever filesystem the TABLE lives on — s3a://,
hdfs:// or file://. Python ``os`` only speaks the last one, so every
helper here goes through the JVM's Hadoop FS (the same client Spark's
own reads/writes use, so credentials/endpoints are already
configured). All of it is metadata traffic — file names, sizes,
mtimes — never data.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FileInfo:
    path: str  # full URI-style path
    name: str  # basename
    size: int
    mtime: float  # seconds since epoch


def _fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jpath


def list_files(spark, path: str, recursive: bool = False) -> list[FileInfo]:
    """Files under ``path`` (non-recursive lists one directory level).
    Returns [] for a missing path."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[FileInfo] = []
    it = fs.listFiles(jpath, bool(recursive))
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        out.append(
            FileInfo(
                path=p.toString(),
                name=p.getName(),
                size=int(st.getLen()),
                mtime=st.getModificationTime() / 1000.0,
            )
        )
    return sorted(out, key=lambda f: f.path)


def list_dirs(spark, path: str) -> list[str]:
    """Immediate subdirectories of ``path`` (full URI-style paths).
    Returns [] for a missing path."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    )


def exists(spark, path: str) -> bool:
    fs, jpath = _fs(spark, path)
    return bool(fs.exists(jpath))


def rename(spark, src: str, dst: str) -> bool:
    """Hadoop FS rename. Atomic on HDFS/local; on object stores it is
    a copy+delete — callers doing commit-by-rename must account for
    that (or use a manifest/committer)."""
    fs, jsrc = _fs(spark, src)
    jvm = spark._jvm
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def read_text(spark, path: str) -> str | None:
    """Small-file read through Hadoop FS (spec/marker sidecars on
    whatever filesystem the table lives on). None for a missing path."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # py4j cannot fill a Java byte[] in place; commons-io ships
        # with Hadoop and drains the stream JVM-side in one call
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark, path: str, content: str) -> None:
    """Small-file overwrite through Hadoop FS (single create call — as
    atomic as the underlying store's create is)."""
    fs, jpath = _fs(spark, path)
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def delete(spark, path: str, recursive: bool = True) -> bool:
    fs, jpath = _fs(spark, path)
    return bool(fs.delete(jpath, bool(recursive)))
