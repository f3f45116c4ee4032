"""Filesystem seam for operators that write OUTSIDE Spark's own
writers (the WARC sink's record-at-a-time archives, versionedParquet's
commit manifest): route every byte through `pyarrow.fs` instead of
bare `open()`, so the same code runs against local disk, `file:` URIs,
and — at deploy time — HDFS/S3/GCS (`pyarrow.fs.FileSystem.from_uri`
resolves the scheme; HadoopFileSystem needs libhdfs on the cluster
image, S3/GCS are built into pyarrow wheels).

Why pyarrow.fs and not py4j `FileSystem.get(...)`: the WARC sink
writes from EXECUTOR-side Python workers, which have no py4j gateway —
only the driver can reach the JVM.  pyarrow.fs is importable in both
processes, so driver and executors share one code path.

Write protocol: ALWAYS write-to-temp + rename (`open_output_atomic`).
A task that dies mid-write leaves a `.inprogress-*` temp, never a
half-written artifact under the final name; speculative/retried tasks
each write their own temp and the rename is last-writer-wins on the
same final name.  (Rename is atomic on local/HDFS; on S3 it is
copy+delete — still safe here because the temp is complete before the
move starts.)

Reference seam documented in round 6 (sources/registry.py `_save_warc`
docstring: "a DFS deploy swaps the open() for a Hadoop FS stream") —
this module makes the swap real.
"""

from __future__ import annotations

import posixpath
import uuid
from contextlib import contextmanager

#: schemes pyarrow.fs.FileSystem.from_uri understands without extra
#: cluster-side setup notes (hdfs needs libhdfs; viewfs etc. do not
#: resolve) — used only for a clearer error message, not a gate
_KNOWN_SCHEMES = ("file", "hdfs", "s3", "s3a", "gs", "gcs", "mock")


def split_scheme(path: str) -> tuple[str, str]:
    """('file', '/p') for 'file:///p'; ('', p) for plain local paths.
    Windows drive letters don't occur on the supported platforms."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme.lower(), rest
    if path.startswith("file:"):
        # Hadoop-style file:/p (single slash) also appears in the wild
        return "file", path[5:]
    return "", path


def is_local(path: str) -> bool:
    scheme, _ = split_scheme(path)
    return scheme in ("", "file")


def local_path(path: str) -> str:
    """The plain filesystem path of a local/`file:` location (rendered
    error otherwise) — for callers that genuinely need OS-level
    facilities (flock) that only exist on local mounts."""
    scheme, rest = split_scheme(path)
    if scheme == "":
        return path
    if scheme == "file":
        return rest if rest.startswith("/") else "/" + rest
    raise ValueError(
        f"{path!r} is not a local/file: location — this operation "
        f"needs OS-level file locking, which {scheme}:// does not "
        f"provide")


def fs_for(path: str):
    """(pyarrow FileSystem, path-within-fs) for a plain path or URI."""
    import pyarrow.fs as pafs
    scheme, _ = split_scheme(path)
    if scheme in ("", "file"):
        # resolve file: locally rather than via from_uri — Hadoop-style
        # single-slash file:/p URIs appear in the wild and from_uri
        # rejects them
        return pafs.LocalFileSystem(), local_path(path)
    try:
        return pafs.FileSystem.from_uri(path)
    except Exception as e:
        hint = ("" if scheme in _KNOWN_SCHEMES else
                f" (scheme {scheme!r} is not one pyarrow.fs resolves: "
                f"{', '.join(_KNOWN_SCHEMES)})")
        raise ValueError(
            f"cannot resolve filesystem for {path!r}{hint}: {e}") from e


def exists(path: str) -> bool:
    import pyarrow.fs as pafs
    fs, p = fs_for(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    import pyarrow.fs as pafs
    fs, p = fs_for(path)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def listdir(path: str) -> list[str]:
    """Base names of the direct children ([] when absent)."""
    import pyarrow.fs as pafs
    fs, p = fs_for(path)
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(p, recursive=False, allow_not_found=True))
    except OSError:  # pragma: no cover
        return []
    return [posixpath.basename(i.path) for i in infos]


def makedirs(path: str) -> None:
    fs, p = fs_for(path)
    fs.create_dir(p, recursive=True)


def delete_file(path: str) -> None:
    fs, p = fs_for(path)
    fs.delete_file(p)


def delete_dir(path: str) -> None:
    fs, p = fs_for(path)
    fs.delete_dir(p)


def read_text(path: str) -> str:
    fs, p = fs_for(path)
    with fs.open_input_stream(p) as fh:
        return fh.read().decode("utf-8")


def write_text_atomic(path: str, content: str) -> None:
    with open_output_atomic(path) as fh:
        fh.write(content.encode("utf-8"))


@contextmanager
def open_output_atomic(path: str):
    """Binary output stream that lands at `path` ATOMICALLY: bytes go
    to `<path>.inprogress-<uuid>`, the rename happens only after a
    clean close; on error the temp is deleted.  Readers never observe
    a partially-written file under the final name."""
    fs, p = fs_for(path)
    tmp = f"{p}.inprogress-{uuid.uuid4().hex[:12]}"
    out = fs.open_output_stream(tmp)
    try:
        yield out
    except BaseException:
        out.close()
        try:
            fs.delete_file(tmp)
        except Exception:  # noqa: BLE001 — best-effort cleanup
            pass
        raise
    else:
        out.close()
        fs.move(tmp, p)
