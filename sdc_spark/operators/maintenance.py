"""Single-writer mutex for persisted-index maintenance.

Every persisted index in the repo (LSH bands/grams, substring grams,
posting lists, IVF cells) follows the same LSM-ish lifecycle:
``append_*`` lays down new files, ``delete_from_*`` appends to a
tombstone log, ``compact_*`` stages the merged content and REPLACES the
old files. The compact stage-then-replace has a window: an append (or a
tombstone write) that lands after compaction has read the raw files but
before it rewrites them would be silently dropped — the classic
lost-update race of any read-modify-write maintenance job.

``index_lock`` serializes the writers. It is an mkdir-based mutex (the
one primitive that is atomic on POSIX filesystems and HDFS alike) held
for the duration of each maintenance operation. READERS never take it:
serving plans only ever see either the old file set or the new one
(tables are re-registered after the staged content is fully written),
so screens/searches keep running during maintenance.

Scope, stated honestly: this guards the common deployments (single
maintenance host, or a shared POSIX/HDFS filesystem where mkdir is
atomic). On object stores without atomic namespace ops (raw S3),
``mkdir`` is not a mutex — there, run maintenance single-actor (one
scheduled job per index, the usual arrangement) or front it with a real
coordination service; the locking call sites make that swap a
one-function change. Locks are reentrant per (process, index) so a
compaction that internally appends never self-deadlocks; a crashed
holder leaves the lock dir behind — ``break_index_lock`` clears it
(document the operational runbook: break only when no maintenance job
is alive).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time

_LOCK_DIRNAME = "_maintenance_lock"
# per-root in-process lock (threads of one session race each other too);
# the mkdir dir below excludes OTHER processes
_proc_locks: dict[str, threading.Lock] = {}
_proc_guard = threading.Lock()
_tls = threading.local()  # per-thread reentrancy depths


def _depths() -> dict:
    d = getattr(_tls, "depths", None)
    if d is None:
        d = _tls.depths = {}
    return d


def _lock_path(index_root: str) -> str:
    return os.path.join(index_root, _LOCK_DIRNAME)


@contextlib.contextmanager
def index_lock(index_lock_root: str, timeout: float = 300.0, poll: float = 0.05):
    """Acquire the maintenance mutex for one persisted index (its root
    directory, e.g. ``{path_root}/{name}``). Two layers: a per-root
    in-process ``threading.Lock`` (threads sharing one SparkSession race
    each other exactly like separate jobs do) and the on-disk mkdir dir
    (other processes). Reentrant per thread. Blocks up to ``timeout``
    seconds, then raises TimeoutError — maintenance jobs should fail
    loudly rather than queue unboundedly behind a stuck peer."""
    root = os.path.abspath(index_lock_root)
    depths = _depths()
    if depths.get(root, 0) > 0:  # reentrant within the thread
        depths[root] += 1
        try:
            yield
        finally:
            depths[root] -= 1
        return

    with _proc_guard:
        plock = _proc_locks.setdefault(root, threading.Lock())
    if not plock.acquire(timeout=timeout):
        raise TimeoutError(
            f"index_lock: in-process lock for {root} held past {timeout}s"
        )
    try:
        os.makedirs(root, exist_ok=True)
        lock = _lock_path(root)
        deadline = time.monotonic() + timeout
        while True:
            try:
                os.mkdir(lock)
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"index_lock: {lock} held past {timeout}s — another "
                        "maintenance job is running (or crashed; see "
                        "break_index_lock)"
                    )
                time.sleep(poll)
        depths[root] = 1
        try:
            yield
        finally:
            depths[root] = 0
            with contextlib.suppress(OSError):
                os.rmdir(lock)
    finally:
        plock.release()


def break_index_lock(index_root: str) -> None:
    """Operational escape hatch: clear a lock left by a crashed
    maintenance job. Only safe when no maintenance job is alive."""
    with contextlib.suppress(OSError):
        os.rmdir(_lock_path(os.path.abspath(index_root)))
