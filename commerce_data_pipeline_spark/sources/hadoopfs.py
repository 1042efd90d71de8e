"""Hadoop FileSystem access via the session JVM (SURVEY.md §2b P12).

The reference talks to storage through boto3 against S3/LocalStack
(/root/reference/src/pipeline/loaders/s3_loader.py:49-57, LocalStack
harness scripts/setup_localstack.py:30-125). The Spark-native equivalent
of that client boundary is Hadoop's `FileSystem` API: the SAME code path
serves `file:`, `hdfs:`, `s3a:`, `gs:`, `abfs:` — whichever scheme the
path carries — with credentials/endpoints supplied by Hadoop conf
(e.g. `spark.hadoop.fs.s3a.endpoint` for a LocalStack/MinIO emulator),
not by application code. Everything here goes through py4j to the JVM
filesystem objects Spark itself uses for reads and writes, so sink-side
listing/existence/rename logic is scheme-agnostic by construction.

No Python `os.*` calls: local paths work because Hadoop's default
filesystem is `file:///`, not because we special-case them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for one scheme.

    Instantiate with any path; all subsequent calls must use paths of the
    same scheme+authority (Hadoop resolves the filesystem per scheme).
    """

    def __init__(self, spark: SparkSession, path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jpath(path).getFileSystem(self._conf)

    def _jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._jpath(p))

    def is_dir(self, p: str) -> bool:
        jp = self._jpath(p)
        return self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory()

    def listdir(self, p: str) -> list[str]:
        """Child basenames of a directory ([] if it doesn't exist)."""
        jp = self._jpath(p)
        if not self._fs.exists(jp):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(jp)]

    def mkdirs(self, p: str) -> bool:
        return self._fs.mkdirs(self._jpath(p))

    def size(self, p: str) -> int:
        """Total bytes under a path (recursive; 0 if it doesn't exist) —
        a pure namenode/listing call (getContentSummary), never a Spark
        job, so it is safe to consult on a serving path."""
        jp = self._jpath(p)
        if not self._fs.exists(jp):
            return 0
        return int(self._fs.getContentSummary(jp).getLength())

    def rename(self, src: str, dst: str) -> bool:
        """Atomic-per-filesystem rename (true rename on file:/hdfs:;
        object stores emulate with copy+delete — still the correct
        primitive for promote-then-delete swaps)."""
        return self._fs.rename(self._jpath(src), self._jpath(dst))

    def delete(self, p: str, recursive: bool = True) -> bool:
        return self._fs.delete(self._jpath(p), recursive)

    def write_bytes(self, p: str, data: bytes) -> None:
        """Create/overwrite a small file (metadata sidecars, markers)."""
        out = self._fs.create(self._jpath(p), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, p: str) -> bytes:
        stream = self._fs.open(self._jpath(p))
        try:
            ioutils = self._jvm.org.apache.hadoop.io.IOUtils
            baos = self._jvm.java.io.ByteArrayOutputStream()
            ioutils.copyBytes(stream, baos, 65536, False)
            return bytes(baos.toByteArray())
        finally:
            stream.close()


def join_path(*parts: str) -> str:
    """Join URI path segments with '/'. `os.path.join` is wrong for
    Hadoop paths on principle (URIs are always /-separated) — use this
    for anything that may carry a scheme."""
    cleaned = [parts[0].rstrip("/")] + [p.strip("/") for p in parts[1:]]
    return "/".join(cleaned)


def begin_swap(spark: "SparkSession", live: str, tmp: str, old: str,
               what: str = "swap") -> None:
    """Pre-write guard for the rename-aside swap protocol (one shared
    implementation — r13 review: the sequence existed in three diverging
    copies across bucketed/ledger/index maintenance): refuse to start if
    a previous attempt's rename-aside copy exists (it may be the only
    complete copy of the data — recover it first), and clear a stale tmp
    so the caller's write starts clean."""
    fs = HadoopFS(spark, live)
    if fs.exists(old):
        raise RuntimeError(
            f"{what}: {old} already exists — recover or remove the "
            "previous swap's rename-aside copy first"
        )
    if fs.exists(tmp):
        fs.delete(tmp)


def swap_dir(spark: "SparkSession", live: str, tmp: str, old: str,
             what: str = "swap", keep_old: bool = False) -> None:
    """Promote a fully-written `tmp` into `live` with rename-aside
    ordering: `live`→`old`, `tmp`→`live`, delete `old` — a failure
    between any two steps leaves a complete copy of the data under a
    recoverable name, and a failed promotion rolls the live path back.
    All calls go through Hadoop's FileSystem API, so the swap works for
    any scheme Spark can read (file:, hdfs:; on s3a: rename is
    copy+delete — non-atomic but still never destroys the only copy).
    Callers `begin_swap` before writing `tmp`.

    `keep_old=True` defers the final delete: the rename-aside copy stays
    on disk so the caller can later COMMIT (delete `old`) or ROLL BACK
    (delete `live`, rename `old` back) — the gated-rebalance veto path.
    While `old` exists, `begin_swap` refuses a new swap, so a crash in
    the deferred window surfaces as the standard pending-swap recovery."""
    fs = HadoopFS(spark, live)
    if fs.exists(old):
        raise RuntimeError(
            f"{what}: {old} appeared mid-swap — concurrent writer? "
            "The protocol is single-writer; recover manually"
        )
    if not fs.rename(live, old):
        raise RuntimeError(f"{what}: rename {live} -> {old} failed")
    if not fs.rename(tmp, live):
        fs.rename(old, live)  # roll back: restore the live path
        raise RuntimeError(f"{what}: promote {tmp} -> {live} failed")
    if not keep_old:
        fs.delete(old)
        if fs.exists(old):
            # Hadoop's delete returns a boolean and object-store
            # emulations can fail partially; a surviving rename-aside
            # copy must surface NOW — callers reclaim retired data right
            # after a completed swap, and doing so while a stale routing
            # copy exists would make the copy's documented "rename back
            # to roll back" recovery silently wrong. Raising here leaves
            # the deferred-window state (promoted table live, copy + all
            # retired data intact), which every recovery path handles.
            raise RuntimeError(
                f"{what}: promoted {live} but could not remove the "
                f"rename-aside copy {old} — recover or remove it before "
                "any retired data is reclaimed"
            )


def rollback_swap(spark: "SparkSession", live: str, old: str,
                  what: str = "swap") -> None:
    """Undo a `swap_dir(..., keep_old=True)`: demote the promoted `live`
    and restore the rename-aside copy. Ordering keeps a complete copy
    under a recoverable name at every step: delete `live` (the `old`
    copy is intact and `begin_swap`'s guard still refuses re-entry),
    then rename `old` → `live`. A crash between the two leaves ONLY the
    rename-aside copy — exactly the pending-swap state every maintenance
    entrypoint already detects and explains how to recover."""
    fs = HadoopFS(spark, live)
    if not fs.exists(old):
        raise RuntimeError(
            f"{what}: rollback requested but {old} does not exist — "
            "nothing to restore (was the swap already committed?)"
        )
    if fs.exists(live):
        fs.delete(live)
    if not fs.rename(old, live):
        raise RuntimeError(f"{what}: restore {old} -> {live} failed")
