"""Generic fingerprint-keyed persisted-result store — THE marker
protocol for every build/probe split in the repo.

The pattern: a derived table that is a pure function of
(source parquet bytes, derivation constants, derivation CODE) is
written ONCE per corpus version and read thereafter — at 100 TB you
never recompute a truth table, a signature table, a code table, or an
index inside every query that consumes it.

Round-8 consolidation (r7 verdict item 5): the five hand-rolled
variants that previously each carried their own copy of the marker
protocol — the MinHash signature store and near-dup groups store
(`operators/dedup.py`), the int8/binary code tables
(`operators/ann.py`), the maintenance fixtures
(`operators/maintenance.ensure_store`), and the RAG chunk store —
now all go through this module: DataFrame-shaped stores through
:func:`persisted_result`, path-shaped builds through
:func:`ensure_store_dir`, and the IVF index (the one store that is
NOT a pure function of its source — appends mutate it under a
two-phase sentinel-fingerprint commit, `operators/ann.py`) through
the low-level :func:`read_marker` / :func:`write_marker_atomic`
primitives, keeping its richer protocol but not its own marker I/O.

Crash-safe ordering: data is written first — into a VERSIONED dir
per fingerprint — and the marker flips to the new version atomically
LAST, so a killed build leaves the previous version untouched and
servable while the stale fingerprint forces a rebuild, and a reader
racing a rebuild sees either complete version, never a
half-overwritten dir (see :func:`ensure_store_dir`). A stale store
(source parquet changed, a derivation constant folded into the
caller's fingerprint salt changed, or — via :func:`code_token` — the
derivation kernel's own source changed) is detected the same way. A
malformed or non-object marker (r7 ADVICE: a marker containing valid
JSON that is not a dict, e.g. ``[1]``) also falls through to rebuild
instead of crashing the caller.

Because every stored result is a pure function of its inputs,
cached-vs-fresh is bit-identical — DuckDB oracle rows that recompute
the same derivation from the raw parquet cannot tell the difference,
and `store_consistency_gate` drives the full contract (build-once,
serve-cached, rebuild-on-salt-change, rebuild-on-malformed-marker)
as a driver-certified query.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def code_token(*objs) -> str:
    """Short digest of the SOURCE of the given modules/functions —
    fold it into a store's fingerprint salt so a change to the
    derivation kernel invalidates the store (r7 ADVICE item 2: a
    fingerprint covering only data + constants keeps serving truth
    computed by an old kernel after a bug fix, surfacing later as a
    confusing oracle mismatch on the consumer). Module-level hashing
    is deliberately coarse: it cannot miss a two-hop helper inside
    the same module, at the cost of an occasional spurious rebuild —
    stores are cheap to rebuild and wrong truth is not.

    When source text is unavailable (``inspect.getsource`` raises
    OSError under zipimport/frozen/.pyc-only deployments — r8 ADVICE),
    fall back to hashing the module file's bytes, then (r9 ADVICE: the
    old name-only last resort was STABLE across code edits, degrading
    to silently serving stale stores in a deployment where neither
    source nor file is readable) to whatever change-sensitive material
    the object still carries — ``__loader__.get_data`` bytes for
    zipimported modules, ``__code__`` bytecode + consts for functions —
    with the qualified name folded in last. A store-backed query must
    degrade to (at worst) a spurious rebuild, never crash at salt
    time."""
    h = hashlib.sha256()
    for obj in objs:
        try:
            h.update(inspect.getsource(obj).encode())
        except (OSError, TypeError):
            mod = obj if inspect.ismodule(obj) else inspect.getmodule(obj)
            f = getattr(obj, "__file__", None) or getattr(mod, "__file__", None)
            try:
                with open(f, "rb") as fh:
                    h.update(fh.read())
            except (OSError, TypeError):
                loader = getattr(mod, "__loader__", None)
                if loader is not None and f and hasattr(loader, "get_data"):
                    try:
                        h.update(loader.get_data(f))
                    except OSError:
                        pass
                code = getattr(obj, "__code__", None)
                if code is not None:
                    _hash_code_object(h, code)
                h.update(
                    f"{getattr(obj, '__module__', '')}:"
                    f"{getattr(obj, '__qualname__', getattr(obj, '__name__', repr(obj)))}".encode()
                )
    return h.hexdigest()[:12]


def _canon_const(const) -> str:
    """PYTHONHASHSEED-independent repr of a code constant: frozenset
    consts (compiled from ``x in {...}`` literals) iterate in a
    hash-seed-dependent order, so a bare ``repr()`` rotates per
    process — the exact per-process instability the nested-code-object
    fix targets (r10 ADVICE). Sort set members by their own canonical
    repr; recurse into tuples, which can nest frozensets."""
    if isinstance(const, (set, frozenset)):
        return "{" + ",".join(sorted(_canon_const(x) for x in const)) + "}"
    if isinstance(const, tuple):
        return "(" + ",".join(_canon_const(x) for x in const) + ")"
    return repr(const)


def _hash_code_object(h, code) -> None:
    """Deterministically fold a code object into ``h``: bytecode plus
    consts, recursing into NESTED code objects (lambdas / inner defs)
    instead of repr()-ing them — a code object's repr embeds its memory
    address, which would rotate the token on every process and turn
    the degraded-deployment fallback into a permanent rebuild tax
    (r10 review finding on the r9-ADVICE fix). Collection consts go
    through :func:`_canon_const` for hash-seed-independent order."""
    import types

    h.update(code.co_code)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            _hash_code_object(h, const)
        else:
            h.update(_canon_const(const).encode())


def _walk_code_names(code):
    """Yield every global name referenced by ``code`` INCLUDING names
    referenced only inside nested code objects (lambdas / inner defs /
    comprehensions) — closure_code_token's traversal must see a helper
    call even when it sits inside a lambda the builder maps over
    (r10 review finding)."""
    import types

    yield from code.co_names
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            yield from _walk_code_names(const)


def closure_code_token(fn, *modules) -> str:
    """:func:`code_token` over ``fn`` AND every same-module function it
    references (transitively, via ``co_names``), plus the given helper
    modules — the granularity between function-level (which misses a
    helper later extracted from the function's body: r9 ADVICE on
    `_neardup_corpus_salt`) and whole-module (which, for a module that
    gains unrelated edits every round, rotates every consumer's store
    fingerprint on each edit, making the fingerprint useless as a
    corpus-version marker). Non-function globals the body reads (e.g.
    derivation constants) are NOT covered — callers fold those into
    the salt explicitly, where the oracle can read them too."""
    import sys

    mod = sys.modules[fn.__module__]
    seen: set[str] = set()
    stack, objs = [fn], []
    while stack:
        f = stack.pop()
        name = getattr(f, "__qualname__", getattr(f, "__name__", ""))
        if name in seen:
            continue
        seen.add(name)
        objs.append(f)
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        for ref in _walk_code_names(code):
            cand = getattr(mod, ref, None)
            if (
                inspect.isfunction(cand)
                and getattr(cand, "__module__", None) == fn.__module__
            ):
                stack.append(cand)
    return code_token(*objs, *modules)


def read_marker(marker: str) -> dict:
    """Parse a store marker; ANY unreadable/malformed marker (missing
    file, bad JSON, JSON that is not an object) returns {} so callers
    uniformly fall through to the documented rebuild path."""
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return {}
    return meta if isinstance(meta, dict) else {}


def write_marker_atomic(marker: str, meta: dict) -> None:
    """Write a marker via tmp-file + atomic rename — the LAST step of
    every store build, so a crash at any earlier point leaves a
    non-matching (or absent) marker, never a valid marker over
    partial data."""
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)


def ensure_store_dir(base_dir: str, fingerprint: str, build) -> str:
    """Path-shaped store core with VERSIONED data dirs (round 8):
    each build writes into ``base_dir/data_<fp-hash>_<nonce>`` and the
    marker flips to the new version atomically LAST, so

    - a crash mid-build leaves the previous marker + previous complete
      version fully servable (nothing was overwritten in place), and
      the stale fingerprint forces a rebuild on the next call;
    - a reader racing a rebuild sees either the old complete version
      or the new complete version, never a half-overwritten dir — the
      in-place ``overwrite`` the pre-r8 stores used had exactly that
      window.

    Every build writes a FRESH dir (fingerprint hash + a per-build
    nonce), so an in-place overwrite never happens — not even when a
    fingerprint recurs (a kernel revert, or a rebuild after a
    malformed marker). The immediately superseded version is RETAINED
    (a reader that resolved the old marker may still be scanning it:
    the marker-named predecessor, or the newest existing version by
    mtime when the marker was unreadable); everything older — and any
    pre-r8 legacy payload dir left behind by the hand-rolled variants
    ('sigs', 'codes', 'groups') — is garbage-collected on the flip.
    Concurrent builders of the SAME fingerprint are the caller's
    job-scheduling problem (the same single-writer assumption as any
    non-transactional bulk load); a production deployment would add
    time-based version retention instead of keep-2.

    Returns the data dir for ``fingerprint``, calling
    ``build(data_dir)`` only when the marker is missing, malformed,
    or carries a different fingerprint."""
    import hashlib as _hashlib
    import shutil as _shutil
    import uuid as _uuid

    marker = os.path.join(base_dir, "meta.json")
    meta = read_marker(marker)
    if meta.get("fingerprint") == fingerprint:
        # "data" is the pre-versioning layout — old stores keep serving
        cur = os.path.join(base_dir, meta.get("data", "data"))
        if os.path.isdir(cur):
            return cur
        # r13 review wave 6: a matching marker over a MISSING payload
        # dir (manual deletion, partial wipe — unreachable by a crash,
        # which always writes data before the marker flips) previously
        # returned the dead path and the consumer's parquet read threw;
        # every other corruption class already falls through to
        # rebuild, so this one must too
    vdir = (
        "data_"
        + _hashlib.sha256(fingerprint.encode()).hexdigest()[:10]
        + "_"
        + _uuid.uuid4().hex[:6]
    )
    data_dir = os.path.join(base_dir, vdir)
    os.makedirs(base_dir, exist_ok=True)
    if meta:
        prev = meta.get("data", "data")  # marker-named predecessor
    else:
        # marker unreadable: the newest existing version may still be
        # serving a racing reader — retain it
        versions = [
            d
            for d in os.listdir(base_dir)
            if d.startswith("data")
            and os.path.isdir(os.path.join(base_dir, d))
        ]
        prev = max(
            versions,
            key=lambda d: os.path.getmtime(os.path.join(base_dir, d)),
            default=None,
        )
    build(data_dir)
    write_marker_atomic(marker, {"fingerprint": fingerprint, "data": vdir})
    # GC touches ONLY names this module owns — the 'data*' version
    # prefix (and the pre-versioning 'data' layout it matches) plus the
    # pre-r8 hand-rolled payload names — never arbitrary sibling dirs
    # (r8 ADVICE: matview/upsert-style roots co-locate 'ckpt'/aux dirs
    # beside meta.json; a future migration onto this core must not
    # silently destroy them).
    _legacy = ("sigs", "codes", "groups")
    for d in os.listdir(base_dir):
        full = os.path.join(base_dir, d)
        if (
            os.path.isdir(full)
            and d not in (vdir, prev)
            and (d.startswith("data") or d in _legacy)
        ):
            _shutil.rmtree(full, ignore_errors=True)
    return data_dir


def persisted_result(
    spark: SparkSession,
    store_name: str,
    fingerprint: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """DataFrame-shaped store: return the stored DataFrame for
    ``store_name`` under INDEX_ROOT if its marker matches
    ``fingerprint``; otherwise call ``build()``, persist the result,
    and return a fresh read of it.

    ``fingerprint`` must cover the source data (content hash), every
    derivation constant (folded into the hash salt by the caller),
    and — for stores whose consumers do not re-certify the kernel on
    every run — a :func:`code_token` of the kernel's module(s); two
    derivations may never serve each other's results.
    """
    # resolved at call time (not import) so tests and deployments can
    # repoint operators.ann.INDEX_ROOT and every store follows
    from .operators import ann as _ann

    from .caching import scoped_caches

    path = os.path.join(_ann.INDEX_ROOT, store_name)
    # any intermediate the build persist_tracked()s (e.g. the PPJoin
    # vocabulary's two-branch cache) is released as soon as the result
    # is on parquet — a warm call enters and exits the scope untouched
    with scoped_caches():
        data_dir = ensure_store_dir(
            path,
            fingerprint,
            lambda d: build().write.mode("overwrite").parquet(d),
        )
    return spark.read.parquet(data_dir)
