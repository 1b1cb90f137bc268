"""One flock helper for every per-directory critical section.

Two sites grew their own near-identical lock context managers in round
13 (merge._snap_lock over the snapshot metadata, ann_index's maintenance
lock over an IVF index) with silently divergent semantics — one
reentrant, one not. This is the single implementation both build on:
an exclusive ``fcntl.flock`` on ``<dir>/<lockname>``, optionally
REENTRANT within a thread (tracked by a thread-local set keyed on the
resolved path, because flock on a second fd of the same file blocks
even within one thread — same-thread re-acquisition of a non-reentrant
flock is a self-deadlock, not a no-op).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_HELD = threading.local()


@contextmanager
def flock_dir(
    path: str, lockname: str, *, reentrant: bool = False, create: bool = False
):
    """Exclusive flock on ``<path>/<lockname>`` for the block. With
    ``reentrant=True`` a thread already holding this (path, lockname)
    passes straight through (the outermost frame owns the fd).
    ``create=False`` (default) raises FileNotFoundError on a missing
    directory instead of conjuring a phantom one containing only the
    lock file — existence probes elsewhere (isdir guards on index paths)
    must not start passing because somebody tried to LOCK a
    never-built artifact."""
    import fcntl

    key = (os.path.realpath(path), lockname)
    held = getattr(_HELD, "held", None)
    if held is None:
        held = _HELD.held = set()
    if reentrant and key in held:
        yield
        return
    if create:
        os.makedirs(path, exist_ok=True)
    fd = os.open(os.path.join(path, lockname), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        held.add(key)
        try:
            yield
        finally:
            held.discard(key)
    finally:
        os.close(fd)
