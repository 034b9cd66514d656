"""Filesystem shim for the lake-table metadata path.

The north_rule targets a multi-executor cluster (``spark-submit
--py-files``) over shared storage (HDFS / S3A / ...). Table *data* already
moves exclusively through Spark readers/writers, which speak any Hadoop
path; this shim does the same for the *metadata* side (manifests, version
pointer, lineage log), which round 1 hardwired to POSIX ``os.*`` calls —
a non-starter once driver and executors stop sharing one local disk.

Two backends, one contract:

- ``LocalFS``: plain ``os`` — the sandbox/test default, and the fastest
  option when the table root genuinely is a local path.
- ``HadoopFS``: the JVM ``org.apache.hadoop.fs.FileSystem`` resolved per
  path through the active Spark session's Hadoop configuration — so the
  same engine code runs over ``hdfs://``, ``s3a://``, ``file://`` etc.
  (this is exactly how Iceberg's ``HadoopTableOperations`` does IO).

Atomicity contract: ``write_text_atomic`` must never expose a partial
file. LocalFS gets true atomic replace (``os.replace``). HadoopFS writes
a temp file then renames; where the rename cannot atomically overwrite
(HDFS), the delete+rename window is covered by the table's
``current_version`` fallback, which lists ``metadata/v*.json`` and takes
the max — the pointer file is a fast hint, not the source of truth
(Iceberg's version-hint.text has the same semantics). Single-writer is
assumed throughout (the replay driver).
"""

from __future__ import annotations

import os
import shutil
import uuid


class LocalFS:
    """POSIX backend (tests, local benches, single-node deployments)."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def create_exclusive(self, path: str, data: str) -> bool:
        """Atomically create ``path`` with ``data`` iff it does not exist.
        Returns False if another writer got there first (O_EXCL)."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(data)
        return True

    def rename(self, src: str, dst: str) -> bool:
        """Atomic rename; returns False iff ``src`` does not exist (the
        lock-steal arbitration primitive: of n concurrent renamers of one
        source path, exactly one succeeds)."""
        try:
            os.rename(src, dst)
        except OSError:
            return False
        return True

    def mtime(self, path: str) -> float:
        """Last-modification time (epoch seconds) — the age gate for
        remove_orphan_files."""
        return os.path.getmtime(path)


class HadoopFS:
    """Hadoop FileSystem backend (cluster deployments; also serves
    ``file://`` URIs, which is how the tests exercise it locally)."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    def read_text(self, path: str) -> str:
        fs = self._fs(path)
        stream = fs.open(self._path(path))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536)
            return out.toString("UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, data: str) -> None:
        fs = self._fs(path)
        tmp = self._path(path + f".tmp-{uuid.uuid4().hex}")
        stream = fs.create(tmp, True)
        try:
            stream.write(data.encode("utf-8"))
        finally:
            stream.close()
        dst = self._path(path)
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(tmp, dst):
            raise IOError(f"rename {tmp} -> {dst} failed")

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._path(path))

    def listdir(self, path: str) -> list[str]:
        fs = self._fs(path)
        return [s.getPath().getName() for s in fs.listStatus(self._path(path))]

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def delete(self, path: str) -> None:
        fs = self._fs(path)
        p = self._path(path)
        if fs.exists(p):
            fs.delete(p, True)

    def create_exclusive(self, path: str, data: str) -> bool:
        """Create-if-absent via ``FileSystem.create(overwrite=False)`` —
        atomic on HDFS (namenode-serialized); on S3A it is best-effort
        (object stores lack atomic create-exclusive), which matches the
        advisory nature of the writer lock.

        Only the already-exists outcome maps to False; any other create
        failure (permissions, transient namenode/network errors) propagates
        — reporting it as "another writer holds the lock" would bury the
        real IO error behind a misleading ConcurrentWriterError (r3
        ADVICE)."""
        fs = self._fs(path)
        try:
            stream = fs.create(self._path(path), False)
        except Exception as e:  # py4j wraps the Java exception
            java_cls = ""
            cause = getattr(e, "java_exception", None)
            if cause is not None:
                try:
                    java_cls = cause.getClass().getName()
                except Exception:
                    java_cls = ""
            msg = f"{java_cls} {e}"
            if "AlreadyExists" in msg or "already exists" in msg.lower():
                return False
            raise
        try:
            stream.write(data.encode("utf-8"))
        finally:
            stream.close()
        return True

    def rename(self, src: str, dst: str) -> bool:
        """Rename; False iff the source vanished or the FS refused (HDFS
        rename is namenode-atomic — the lock-steal arbitration primitive)."""
        try:
            return bool(self._fs(src).rename(self._path(src), self._path(dst)))
        except Exception:
            return False

    def mtime(self, path: str) -> float:
        """Last-modification time (epoch seconds) — the age gate for
        remove_orphan_files."""
        return self._fs(path).getFileStatus(self._path(path)).getModificationTime() / 1000.0
