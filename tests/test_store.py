"""Generic fingerprint-keyed persisted-result store (store.py):
build-once/read-after semantics and the crash-safe marker ordering
the two LSH audit truth tables rely on."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest

from pdf_using_hugging_face_and_vector_database_spark.operators.ann import INDEX_ROOT
from pdf_using_hugging_face_and_vector_database_spark.store import persisted_result


@pytest.fixture
def store_name():
    name = f"test_store_{uuid.uuid4().hex[:12]}"
    yield name
    shutil.rmtree(os.path.join(INDEX_ROOT, name), ignore_errors=True)


def _counting_build(spark, calls, rows):
    def build():
        calls.append(1)
        return spark.createDataFrame(rows, "k long, v string")

    return build


def test_build_once_then_read(spark, store_name):
    calls = []
    rows = [(1, "a"), (2, "b")]
    build = _counting_build(spark, calls, rows)
    first = persisted_result(spark, store_name, "fp1", build)
    assert sorted((r.k, r.v) for r in first.collect()) == rows
    second = persisted_result(spark, store_name, "fp1", build)
    assert sorted((r.k, r.v) for r in second.collect()) == rows
    assert len(calls) == 1  # second call served from the store


def test_fingerprint_change_rebuilds(spark, store_name):
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    persisted_result(spark, store_name, "fp2", build)
    assert len(calls) == 2
    # marker now records the new fingerprint: fp2 reads, fp1 rebuilds
    persisted_result(spark, store_name, "fp2", build)
    assert len(calls) == 2


def test_killed_build_rebuilds(spark, store_name):
    """Data written but no marker (a build killed before the atomic
    marker rename) must fail the check and rebuild, not serve the
    possibly-partial data."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    os.remove(os.path.join(INDEX_ROOT, store_name, "meta.json"))
    persisted_result(spark, store_name, "fp1", build)
    assert len(calls) == 2


def test_corrupt_marker_rebuilds(spark, store_name):
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    marker = os.path.join(INDEX_ROOT, store_name, "meta.json")
    with open(marker, "w") as f:
        f.write("{not json")
    out = persisted_result(spark, store_name, "fp1", build)
    assert len(calls) == 2
    assert out.count() == 1
    with open(marker) as f:
        assert json.load(f)["fingerprint"] == "fp1"


def test_non_object_json_marker_rebuilds(spark, store_name):
    """r7 ADVICE item 1: a marker that is VALID JSON but not an object
    ('[1]', '"x"') must fall through to rebuild, not crash the caller
    with AttributeError."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    persisted_result(spark, store_name, "fp1", build)
    marker = os.path.join(INDEX_ROOT, store_name, "meta.json")
    for bad in ("[1]", '"x"', "null", "3"):
        with open(marker, "w") as f:
            f.write(bad)
        out = persisted_result(spark, store_name, "fp1", build)
        assert out.count() == 1
    assert len(calls) == 5  # 1 initial + one rebuild per bad marker
    with open(marker) as f:
        assert json.load(f)["fingerprint"] == "fp1"


def test_code_token_tracks_kernel_source():
    """r7 ADVICE item 2: the code token is a pure function of the
    target's SOURCE — same inputs, same token; different function,
    different token — so folding it into a store salt invalidates the
    store exactly when the kernel changes."""
    from pdf_using_hugging_face_and_vector_database_spark import store as st
    from pdf_using_hugging_face_and_vector_database_spark.operators import (
        setjoin,
    )

    t1 = st.code_token(setjoin)
    assert t1 == st.code_token(setjoin)  # deterministic
    assert t1 != st.code_token(st)  # different source, different token
    assert (
        st.code_token(setjoin, st) != t1
    )  # composition covers every named module
    assert len(t1) == 12


def test_read_marker_contract(tmp_path):
    from pdf_using_hugging_face_and_vector_database_spark.store import (
        read_marker,
        write_marker_atomic,
    )

    marker = str(tmp_path / "meta.json")
    assert read_marker(marker) == {}  # missing
    write_marker_atomic(marker, {"fingerprint": "x", "k": 1})
    assert read_marker(marker) == {"fingerprint": "x", "k": 1}
    for bad in ("{oops", "[1]", '"s"', ""):
        with open(marker, "w") as f:
            f.write(bad)
        assert read_marker(marker) == {}


def test_versioned_rebuild_retains_predecessor(spark, store_name):
    """r8 versioned layout: a fingerprint change builds a NEW data dir
    and flips the marker atomically; the immediately superseded
    version is retained (a racing reader may still be scanning it);
    a third version garbage-collects the first."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    base = os.path.join(INDEX_ROOT, store_name)

    def data_dirs():
        return sorted(
            d for d in os.listdir(base)
            if d.startswith("data") and os.path.isdir(os.path.join(base, d))
        )

    persisted_result(spark, store_name, "fp1", build)
    v1 = data_dirs()
    assert len(v1) == 1
    persisted_result(spark, store_name, "fp2", build)
    v2 = data_dirs()
    assert len(v2) == 2 and set(v1) < set(v2)  # predecessor retained
    with open(os.path.join(base, "meta.json")) as f:
        meta = json.load(f)
    assert meta["fingerprint"] == "fp2"
    assert meta["data"] in v2 and meta["data"] not in v1
    # reader of the OLD version is undisturbed by the flip
    old_df = spark.read.parquet(os.path.join(base, v1[0]))
    assert old_df.count() == 1
    persisted_result(spark, store_name, "fp3", build)
    v3 = data_dirs()
    assert len(v3) == 2 and v1[0] not in v3  # oldest GC'd
    assert len(calls) == 3


def test_legacy_unversioned_store_keeps_serving(spark, store_name):
    """A pre-r8 store (payload in 'data', marker without the 'data'
    key) must keep serving without a rebuild."""
    base = os.path.join(INDEX_ROOT, store_name)
    legacy = os.path.join(base, "data")
    spark.createDataFrame([(7, "z")], "k long, v string").write.parquet(legacy)
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "meta.json"), "w") as f:
        json.dump({"fingerprint": "fpL"}, f)
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    out = persisted_result(spark, store_name, "fpL", build)
    assert calls == [] and [(r.k, r.v) for r in out.collect()] == [(7, "z")]


def test_build_caches_released_after_store_build(spark, store_name):
    """r8 review fix: a cold build's persist_tracked intermediates are
    released as soon as the result is on parquet (scoped_caches) —
    and caches registered BEFORE the build survive untouched."""
    from pdf_using_hugging_face_and_vector_database_spark.caching import (
        _PERSISTED,
        persist_tracked,
        release_caches,
    )

    release_caches()
    outer = persist_tracked(spark.createDataFrame([(1,)], "k long"))
    assert len(_PERSISTED) == 1

    def build():
        inner = persist_tracked(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        )
        return inner

    out = persisted_result(spark, store_name, "fp1", build)
    assert out.count() == 2
    # the build's cache is gone; the outer one remains registered
    assert _PERSISTED == [outer]
    release_caches()


def test_malformed_marker_gc_retains_newest_version(spark, store_name):
    """r8 review fix: when the marker is unreadable the predecessor is
    unknown — the GC must retain the NEWEST existing version (a racing
    reader may be scanning it), not fall back to deleting it."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    base = os.path.join(INDEX_ROOT, store_name)
    persisted_result(spark, store_name, "fp1", build)
    with open(os.path.join(base, "meta.json")) as f:
        live = json.load(f)["data"]
    with open(os.path.join(base, "meta.json"), "w") as f:
        f.write("[1]")  # unreadable marker; live version still on disk
    persisted_result(spark, store_name, "fp1", build)
    assert len(calls) == 2
    dirs = {
        d for d in os.listdir(base)
        if d.startswith("data") and os.path.isdir(os.path.join(base, d))
    }
    assert live in dirs  # the last-served version survived the flip
    assert len(dirs) == 2


def test_gc_spares_unowned_sibling_dirs(spark, store_name):
    """r8 ADVICE item 1 (fixed r9): the flip-time GC may delete ONLY
    names the store module owns — 'data*' versions and the pre-r8
    legacy payload names — never a co-located sibling like a
    checkpoint dir. Three flips (enough to trigger keep-2 GC twice)
    must leave 'ckpt' and its contents untouched while legacy payload
    names are swept."""
    calls = []
    build = _counting_build(spark, calls, [(1, "a")])
    base = os.path.join(INDEX_ROOT, store_name)
    os.makedirs(os.path.join(base, "ckpt"), exist_ok=True)
    with open(os.path.join(base, "ckpt", "offsets"), "w") as f:
        f.write("7")
    os.makedirs(os.path.join(base, "sigs"), exist_ok=True)  # legacy name
    for fp in ("fp1", "fp2", "fp3"):
        persisted_result(spark, store_name, fp, build)
    assert os.path.exists(os.path.join(base, "ckpt", "offsets"))
    with open(os.path.join(base, "ckpt", "offsets")) as f:
        assert f.read() == "7"
    assert not os.path.exists(os.path.join(base, "sigs"))  # owned, swept


def test_code_token_survives_missing_source(monkeypatch):
    """r8 ADVICE item 2 (fixed r9): when inspect.getsource raises
    (zipimport/frozen/.pyc-only deployments), code_token must DEGRADE
    — still deterministic, still distinct per module (via file bytes
    or qualified name) — never crash the store-backed query at salt
    time."""
    import inspect as _inspect

    from pdf_using_hugging_face_and_vector_database_spark import store as st
    from pdf_using_hugging_face_and_vector_database_spark.operators import (
        rangejoin,
        setjoin,
    )

    real = _inspect.getsource
    monkeypatch.setattr(
        st.inspect, "getsource",
        lambda obj: (_ for _ in ()).throw(OSError("source unavailable")),
    )
    t_setjoin = st.code_token(setjoin)
    assert t_setjoin == st.code_token(setjoin)  # deterministic
    assert t_setjoin != st.code_token(rangejoin)  # still distinguishes
    assert len(t_setjoin) == 12
    # for whole MODULES the file-bytes fallback hashes the same bytes
    # getsource returns, so a deployment-mode flip does not even force
    # a spurious rebuild — the degraded token is hash-identical
    monkeypatch.setattr(st.inspect, "getsource", real)
    assert st.code_token(setjoin) == t_setjoin


def test_code_token_last_resort_is_change_sensitive():
    """r9 ADVICE item 2 (fixed r10): when NEITHER getsource NOR the
    module file is readable, the last-resort token must still rotate
    on a kernel change — co_code + consts for functions — not degrade
    to a stable name-only hash that silently serves stale stores."""
    from pdf_using_hugging_face_and_vector_database_spark import store as st

    def make(body):
        # exec-compiled with a fake filename: getsource raises, the
        # module file lookup fails -> last-resort branch
        ns = {}
        exec(compile(f"def kernel(x):\n    return {body}\n", "<nofile>", "exec"), ns)
        fn = ns["kernel"]
        fn.__module__ = "__fake_zipimported_module__"
        return fn

    a1, a2, b = make("x + 1"), make("x + 1"), make("x + 2")
    assert st.code_token(a1) == st.code_token(a2)  # deterministic
    assert st.code_token(a1) != st.code_token(b)  # rotates on change
    # constant-only change (same bytecode shape) rotates via co_consts
    c = make("x + 3")
    assert st.code_token(b) != st.code_token(c)


def test_closure_code_token_covers_extracted_helper(tmp_path):
    """r9 ADVICE item 1 (fixed r10): closure_code_token must hash a
    same-module helper the builder calls (so extracting derivation
    logic into a helper cannot silently keep serving old-corpus
    stores), while an edit to an UNREFERENCED function in the same
    module must NOT rotate the token (the reason whole-module hashing
    of queries.py is rejected)."""
    import importlib.util
    import sys

    from pdf_using_hugging_face_and_vector_database_spark import store as st

    def load(name, helper_body, unrelated_body):
        p = tmp_path / f"{name}.py"
        p.write_text(
            f"def _helper(x):\n    return {helper_body}\n\n"
            f"def unrelated(x):\n    return {unrelated_body}\n\n"
            "def builder(x):\n    return _helper(x)\n"
        )
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    base = load("clos_base", "x + 1", "x * 2")
    helper_changed = load("clos_helper", "x + 99", "x * 2")
    unrelated_changed = load("clos_unrel", "x + 1", "x * 777")
    t = st.closure_code_token(base.builder)
    assert t == st.closure_code_token(base.builder)  # deterministic
    assert t != st.closure_code_token(helper_changed.builder)
    assert t == st.closure_code_token(unrelated_changed.builder)
    # extra helper modules fold in
    assert st.closure_code_token(base.builder, st) != t


def test_code_token_last_resort_stable_with_nested_lambdas():
    """r10 review finding: repr() of a nested code object embeds its
    memory address — the last-resort token must instead recurse into
    nested code, staying IDENTICAL for equal sources (across what
    would be different processes: two independent compilations) and
    still rotating when the lambda body changes."""
    from pdf_using_hugging_face_and_vector_database_spark import store as st

    def make(body):
        ns = {}
        exec(
            compile(
                f"def kernel(xs):\n    return list(map(lambda x: {body}, xs))\n",
                "<nofile>",
                "exec",
            ),
            ns,
        )
        fn = ns["kernel"]
        fn.__module__ = "__fake_zipimported_module__"
        return fn

    # two independent compilations of the same source = the same token
    # (the code objects live at different addresses)
    assert st.code_token(make("x + 1")) == st.code_token(make("x + 1"))
    assert st.code_token(make("x + 1")) != st.code_token(make("x + 2"))


def test_closure_code_token_sees_helper_inside_lambda(tmp_path):
    """r10 review finding: a helper referenced ONLY inside a nested
    lambda/inner def of the builder must still rotate the closure
    token (co_names of nested code objects are walked too)."""
    import importlib.util
    import sys

    from pdf_using_hugging_face_and_vector_database_spark import store as st

    def load(name, helper_body):
        p = tmp_path / f"{name}.py"
        p.write_text(
            f"def _helper(x):\n    return {helper_body}\n\n"
            "def builder(xs):\n"
            "    return [y for y in map(lambda x: _helper(x), xs)]\n"
        )
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    a = load("closl_a", "x + 1")
    b = load("closl_b", "x + 99")
    assert st.closure_code_token(a.builder) != st.closure_code_token(b.builder)


def test_dataset_fingerprint_sees_nested_files(tmp_path):
    """r10 review: the fingerprint must cover files inside nested
    partition subdirectories — previously only direct children were
    statted, so a part file rewritten in place inside label=X/ could
    escape staleness detection."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
        dataset_fingerprint,
    )

    root = tmp_path / "ds"
    sub = root / "label=X"
    sub.mkdir(parents=True)
    f = sub / "part-0.parquet"
    f.write_bytes(b"aaaa")
    fp1 = dataset_fingerprint(str(root))
    assert fp1 == dataset_fingerprint(str(root))  # stable
    import os

    os.utime(f, ns=(1, 1))  # in-place rewrite: same name+size, new mtime
    fp2 = dataset_fingerprint(str(root))
    assert fp2 != fp1
    # a sibling partition with identical content under a different
    # relative path is a DIFFERENT dataset
    sub2 = root / "label=Y"
    sub2.mkdir()
    (sub2 / "part-0.parquet").write_bytes(b"aaaa")
    assert dataset_fingerprint(str(root)) != fp2


def test_ivf_fingerprint_covers_constants_and_kernel(tmp_path):
    """r10 review: the IVF staleness key folds in the index constants
    and the ann code token, so a constant change rotates it (the bare
    dataset fingerprint previously kept serving old-kernel cells)."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
        dataset_fingerprint,
        ivf_fingerprint,
    )

    f = tmp_path / "emb.parquet"
    f.write_bytes(b"x")
    base = ivf_fingerprint(str(f), 16, 2, 64)
    assert base == ivf_fingerprint(str(f), 16, 2, 64)
    assert base != ivf_fingerprint(str(f), 32, 2, 64)
    assert base != ivf_fingerprint(str(f), 16, 3, 64)
    assert base != ivf_fingerprint(str(f), 16, 2, 128)
    assert base != ivf_fingerprint(str(f), 16, 2, 64, extra_salt="clustered")
    assert base != dataset_fingerprint(str(f))


def test_code_token_set_consts_stable_across_hash_seeds():
    """r10 ADVICE: the last-resort code-object hash repr()'d consts;
    frozenset consts (compiled from `x in {...}` literals) iterate in
    PYTHONHASHSEED-dependent order, rotating the token per process and
    turning the degraded-deployment fallback into a permanent
    spurious-rebuild tax. Canonicalized consts must yield the SAME
    token under different hash seeds (subprocess per seed)."""
    import subprocess
    import sys

    prog = r"""
import sys
sys.path.insert(0, %r)
from pdf_using_hugging_face_and_vector_database_spark import store as st
ns = {}
exec(compile(
    "def kernel(x):\n    return x in {'alpha', 'beta', 'gamma', 'delta'}\n",
    "<nofile>", "exec"), ns)
fn = ns["kernel"]
fn.__module__ = "__fake_zipimported_module__"
print(st.code_token(fn))
""" % (
        str(__import__("pathlib").Path(__file__).resolve().parents[1]),
    )

    def token(seed):
        import os

        env = dict(os.environ, PYTHONHASHSEED=str(seed))
        out = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True, env=env
        )
        assert out.returncode == 0, out.stderr
        return out.stdout.strip()

    assert token(1) == token(2) == token(12345)


def test_matching_marker_over_missing_payload_rebuilds(tmp_path):
    """r13 review wave 6: a marker whose fingerprint matches but whose
    payload dir is GONE (manual deletion / partial wipe — a crash
    cannot produce this state, data always lands before the marker
    flips) previously returned the dead path and the consumer's read
    threw; every other corruption class falls through to rebuild, so
    this one must too. Fails on the pre-r13 code (one build call,
    missing dir returned)."""
    from pdf_using_hugging_face_and_vector_database_spark.store import (
        ensure_store_dir,
    )

    calls: list[str] = []

    def build(d: str) -> None:
        calls.append(d)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "payload"), "w") as f:
            f.write("x")

    base = str(tmp_path / "store")
    d1 = ensure_store_dir(base, "fp-alpha", build)
    assert len(calls) == 1 and os.path.isdir(d1)
    shutil.rmtree(d1)  # marker stays, payload gone
    d2 = ensure_store_dir(base, "fp-alpha", build)
    assert len(calls) == 2, "missing payload must force a rebuild"
    assert os.path.isdir(d2)
    assert os.path.exists(os.path.join(d2, "payload"))
