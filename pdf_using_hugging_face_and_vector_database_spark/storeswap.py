"""Crash-safe directory-store commit protocol.

POSIX cannot atomically replace a non-empty directory with another
(``os.replace`` raises ENOTEMPTY), so every directory-shaped store in
this repo (upsert sink, MV sink, table maintenance) commits via
rename-aside: rename store -> store.old, rename store.tmp -> store,
delete store.old. Two renames means a crash WINDOW between them in
which no store dir exists — which, uncorrected, makes a restarting
transactional sink believe it is starting from empty and silently
fold a replayed batch into nothing.

The fix is a recovery invariant rather than a (impossible) single
dir-over-dir rename: ``recover_store`` runs BEFORE any store read,
and rolls a dangling ``store.old`` back into place iff the store dir
itself is missing. That makes ``rename(tmp, store)`` the single
logical commit point:

- crash while writing tmp .......... store intact; tmp discarded
- crash after rename(store, old),
  before rename(tmp, store) ........ store missing, old present ->
                                     recovery restores old; the batch
                                     (watermark still pre-batch)
                                     re-applies cleanly
- crash after rename(tmp, store) ... store is the NEW state; recovery
                                     sees it present and only
                                     discards the leftover old/tmp

Either side of the commit point, exactly-once holds: the store is
always the old state + pre-batch watermark, or the new state +
post-batch watermark, never empty and never mixed.

Single-writer protocol: callers are foreachBatch sinks (serialized
per streaming query by Spark) and manual maintenance jobs — one
writer per store at a time. recover/swap are not safe against two
CONCURRENT writers on the same store dir; that coordination belongs
to the scheduler, exactly as with any non-locking table format.
"""

from __future__ import annotations

import os
import shutil


def _aside(store_dir: str, suffix: str) -> str:
    return store_dir.rstrip("/") + suffix


def recover_store(store_dir: str) -> None:
    """Repair a crashed swap: restore a dangling ``.old`` iff the
    store dir is missing (the crash hit between the two renames),
    then discard any leftover ``.old``/``.tmp``. Call before every
    read of the store — in particular before a transactional sink
    reads its batch-id watermark."""
    old = _aside(store_dir, ".old")
    tmp = _aside(store_dir, ".tmp")
    if not os.path.isdir(store_dir) and os.path.isdir(old):
        os.rename(old, store_dir)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def tmp_store(store_dir: str) -> str:
    """The staging path for ``swap_store`` — cleared before use."""
    tmp = _aside(store_dir, ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    return tmp


def swap_store(store_dir: str, tmp: str) -> None:
    """Promote a fully-written ``tmp`` dir to ``store_dir``. Safe
    against a crash at any point provided every reader runs
    ``recover_store`` first (see module docstring for the window
    analysis); ``rename(tmp, store)`` is the commit point."""
    old = _aside(store_dir, ".old")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(store_dir):
        os.rename(store_dir, old)
    os.rename(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)
