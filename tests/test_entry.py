"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, every query executes at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "doc_id", "chunk_index", "source", "score"}
    # scores are cosine values, descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # the vast majority of queries must be oracle-checked
    assert len(o) >= 20


# Queries proven side-effect-free (no persisted store, index root,
# streaming checkpoint, memory sink, or session-conf write anywhere in
# their call graph — audited by the TRANSITIVE closure below, r8: each
# query's source plus every package helper reachable through any chain
# of references, scanned for filesystem/state markers; `stream_*`
# excluded wholesale because their plumbing lives in streaming/). Only
# these run concurrently in the smoke below; anything NOT on this
# list — including any newly registered query — defaults to the serial
# phase, so the list can only ever be too conservative, never unsafe.
# The closure's first run evicted upsert_bucketed (the exact two-hop
# case the r7 advisor predicted: a clean-looking upsert helper calling
# write_bucketed's saveAsTable) and neardup_ppjoin (now store-backed).
# r9: minhash_signatures and neardup_simhash evicted the same way
# (now serve the char7base signature / sim48 fingerprint stores);
# outer_range_join added (pure join, the closure verifies it reaches
# no state).
POOL_SAFE = {
    "above_avg_customers", "acctbal_window_stats", "anomaly_mad",
    "approx_distinct_parts", "approx_percentiles_gate",
    "asof_join_events", "chunk_metadata",
    "chunker_separator", "chunker_stride", "chunker_udtf",
    "clicks_before_purchase", "clicks_in_purchase_window",
    "contamination_check", "corpus_stats", "crossdoc_spans",
    "cube_pricing", "customer_segments", "dataset_split",
    "datasketch_gates", "dedup_exact", "disjunctive_revenue",
    "distinct_parts_per_supplier", "doc_fingerprints", "dsir_select",
    "embed_quantize", "entity_resolution", "equidepth_by_range",
    "events_gapfill", "flagship_e1",
    "events_hourly", "events_json_props", "excess_volume_suppliers",
    "funnel_conversion", "gopher_quality", "grouping_sets_pricing",
    "heavy_hitters_events", "hybrid_search_rrf", "idle_rich_customers",
    "important_parts", "impute_event_values", "lang_id",
    "large_order_customers", "lineitem_skew_report",
    "lm_bigram_quality", "local_supplier_volume", "market_share",
    "min_cost_supplier", "mixture_sample",
    "mmr_diversified_topk", "mv_incremental_refresh",
    "nation_pair_volume", "neardup_embedding",
    "order_count_distribution", "orders_calendar",
    "outer_range_join",
    "pack_sequences", "pages_roundtrip", "percentiles_acctbal",
    "pii_scrub", "pipeline_vectors", "pit_priority_revenue",
    "pivot_order_status", "priority_order_counts", "product_profit",
    "profile_lineitem", "promo_revenue_pct", "q1_cosine_topk",
    "q2_knn_join", "q3_ann_lsh", "q4_filtered_topk", "q5_delete_by_ids",
    "q5_fetch_by_ids", "q6_revenue_band", "quality_gates",
    "retention_cohorts", "returned_items_topk", "revenue_by_nation",
    "rolling_distinct_users", "rolling_distinct_users_sketch",
    "rolling_fingerprint", "rolling_revenue_7d", "rollup_pricing",
    "salted_join_segments", "sample_docs_hash",
    "scd2_customer_priority", "segment_dedup", "semantic_dedup",
    "semi_anti_customers", "session_windows_native",
    "sessionize_events", "setops_parts", "shipmode_priority",
    "small_qty_revenue", "snapshot_diff", "supplier_pagerank",
    "supplier_part_counts", "text_stats", "tfidf_top_terms",
    "token_counts", "top_parts_per_brand", "top_supplier_revenue",
    "top_unshipped_orders", "tpch_q1_pricing", "udaf_median_acctbal",
    "upsert_compact", "value_histogram",
    "video_frame_sample", "vocab_top_tokens", "waiting_suppliers",
    "weighted_sample",
}


def test_all_queries_run(spark, sf_dir):
    """Registry completeness smoke: every registered query executes at
    sf0.001. Two phases: queries that touch shared state (persisted
    stores, index roots, streaming checkpoints) run serially through
    the driver-contract wrappers exactly as before; the audited
    side-effect-free majority runs through a thread pool (Spark's
    scheduler handles concurrent jobs in one session), which cuts this
    test from ~98 s to ~35 s without dropping a single query."""
    from concurrent.futures import ThreadPoolExecutor

    from pdf_using_hugging_face_and_vector_database_spark.caching import (
        release_caches,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        QUERIES,
    )

    from pyspark.sql.types import ArrayType, MapType, StructType

    wrapped = entrymod.queries()
    assert POOL_SAFE <= set(wrapped), sorted(POOL_SAFE - set(wrapped))

    def flat_schema(df, name):
        # driver-canonicalizer contract: the driver's pandas compare
        # sorts and hashes cell values, which cannot handle list/map/
        # struct cells (the round-5 snapshot_diff red row). Every
        # query surface must emit flat scalar columns.
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (ArrayType, MapType, StructType)
            ), f"{name}.{f.name} is {f.dataType.simpleString()}"
        return df

    # phase 1 — stateful/unknown queries, serial, cache-released
    for name, fn in wrapped.items():
        if name not in POOL_SAFE:
            assert flat_schema(fn(spark, sf_dir), name).count() >= 0, name

    # phase 2 — side-effect-free queries, concurrent; unwrapped so one
    # thread's global cache release can't thrash another's working set
    release_caches()

    def run(name):
        return name, flat_schema(QUERIES[name](spark, sf_dir), name).count()

    with ThreadPoolExecutor(max_workers=6) as ex:
        for name, n in ex.map(run, sorted(POOL_SAFE)):
            assert n >= 0, name
    release_caches()


def test_pool_safe_queries_are_still_side_effect_free(spark):
    """Re-derives the POOL_SAFE classification from source at test
    time: no pooled query may reach a filesystem/state marker through
    ANY chain of helpers (transitive closure over every module in the
    package — r7 ADVICE item 3: the old one-hop scan over operators.*
    missed a stateful helper called through a clean-looking
    intermediary, or living outside operators/). If a query on the
    list later grows a persisted store, index write, stream, or conf
    mutation anywhere in its call graph, this fails and the query
    must move to the serial phase — the frozen list can only go stale
    in the safe direction (serial), never the unsafe one (pooled)."""
    import importlib
    import inspect
    import pkgutil
    import re

    import pdf_using_hugging_face_and_vector_database_spark as pkg
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        QUERIES,
    )

    state = re.compile(
        r"persisted_|INDEX_ROOT|writeStream|readStream|foreachBatch"
        r"|\bcheckpoint|\.write\b|\.save\b|rmtree|makedirs|os\.remove"
        r"|os\.replace|conf\.set|merge_into|open\(|tempfile",
        re.I,
    )

    # name -> concatenated sources of every package-level function or
    # class with that name, across ALL modules (operators, functions,
    # sources, streaming, plus top-level queries/store/caching/io/...).
    # Name collisions merge conservatively: if any same-named helper
    # is stateful, every reference counts as stateful.
    helper_src: dict[str, str] = {}
    mods = [f"{pkg.__name__}.{m.name}" for m in pkgutil.iter_modules(pkg.__path__)]
    for sub in ("operators", "functions", "sources", "streaming"):
        subpkg = importlib.import_module(f"{pkg.__name__}.{sub}")
        mods += [
            f"{subpkg.__name__}.{m.name}"
            for m in pkgutil.iter_modules(subpkg.__path__)
        ]
    for modname in mods:
        m = importlib.import_module(modname)
        for nm, obj in vars(m).items():
            if (
                inspect.isfunction(obj) or inspect.isclass(obj)
            ) and getattr(obj, "__module__", "").startswith(pkg.__name__):
                try:
                    src = inspect.getsource(obj)
                except (OSError, TypeError):
                    continue
                helper_src[nm] = helper_src.get(nm, "") + src

    # edge map computed once: helper -> helpers its source references
    ident = re.compile(r"\b[A-Za-z_]\w*\b")
    refs = {
        nm: (set(ident.findall(src)) & set(helper_src)) - {nm}
        for nm, src in helper_src.items()
    }
    # Audited exemptions; anything else that trips the regex moves its
    # callers to serial:
    # - read_table's only regex hit is its idempotent one-shot enable
    #   of spark.sql.legacy.parquet.nanosAsLong (always the same
    #   value, applied during the serial phase before any pooled run).
    # - _reap_stale_scratch (rmtree of dead tmpfs scratch, r16) is
    #   called ONLY from get_spark immediately before a NEW JVM
    #   launch — strictly serial-phase session construction; queries
    #   receive the session and never build one, so the textual chain
    #   query -> read_table (comment mentions get_spark) -> get_spark
    #   -> reaper is not a call path any pooled run can take.
    stateful = {
        nm
        for nm, src in helper_src.items()
        if state.search(src)
        and nm not in {"read_table", "_reap_stale_scratch"}
    }

    def reachable_state(start_src: str) -> str | None:
        seen = set(ident.findall(start_src)) & set(helper_src)
        frontier = list(seen)
        while frontier:
            nm = frontier.pop()
            if nm in stateful:
                return nm
            for nxt in refs[nm]:
                if nxt not in seen:
                    seen.add(nxt)
                    frontier.append(nxt)
        return None

    offenders = []
    for name in sorted(POOL_SAFE):
        if name.startswith("stream_"):
            offenders.append((name, "stream_* must stay serial"))
            continue
        src = inspect.getsource(QUERIES[name])
        if state.search(src):
            offenders.append((name, "state marker in query source"))
            continue
        hit = reachable_state(src)
        if hit:
            offenders.append((name, f"stateful helper reachable: {hit}"))
    assert not offenders, offenders


def test_bench_drift_reference_parsing(tmp_path):
    """The bench's relative-drift rerun rule reads its own last
    committed record; a malformed, missing, or wrong-sf record must
    silently disable the rule ({} reference), never crash the sweep."""
    import json

    from bench import _last_recorded

    rec = tmp_path / "rec.json"
    rec.write_text(json.dumps({"sf": 0.1, "queries": {"a": 1.5, "b": 0.2}}))
    assert _last_recorded(0.1, str(rec)) == {"a": 1.5, "b": 0.2}
    assert _last_recorded(0.01, str(rec)) == {}  # other scale factor
    rec.write_text("{not json")
    assert _last_recorded(0.1, str(rec)) == {}
    assert _last_recorded(0.1, str(tmp_path / "missing.json")) == {}


def test_readme_query_count_matches_registry():
    """The README's 'N named queries' figure must track len(QUERIES)
    — it drifted twice (r4 verdict); now it's pinned by the suite."""
    import os
    import re

    from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        m = re.search(r"(\d+) named queries", f.read())
    assert m, "README must state the named-query count"
    assert int(m.group(1)) == len(QUERIES)


def test_bench_covers_every_registered_query():
    """BENCH_QUERIES claims 'every registered query' — pin it so a new
    registry row can't silently go unbenchmarked (r10: three new rows
    were missing until this test existed)."""
    from bench import BENCH_QUERIES
    from pdf_using_hugging_face_and_vector_database_spark.queries import QUERIES

    assert set(BENCH_QUERIES) == set(QUERIES)
    assert len(BENCH_QUERIES) == len(QUERIES)  # no duplicates either


def test_compare_oracle_rejects_unknown_query_names(tmp_path):
    """r13 review wave 5 (measurement-harness class): a typo'd name in
    the sweep filter previously matched nothing, printed '0 pass,
    0 fail' and exited 0 — a green receipt that verified NOTHING. The
    guard must fail fast (exit 2, before the JVM spins up); fails on
    the pre-r13 code (exit 0).

    The sf dir is a tmp dir created here, NOT a fixture path (ADVICE
    r13): the guard fires before any data read, and with a hardcoded
    absent path the positional arg would fall through into the query
    set and exit 2 for the WRONG reason, masking guard regressions on
    machines without fixtures."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(root, "tools", "compare_oracle.py"),
            str(tmp_path),
            "definitely_not_a_registered_query",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "unknown query name" in proc.stdout


def test_compare_oracle_canon_normalizes_binary_cells():
    """r13 review wave 5: Spark hands binary cells back as bytearray,
    which is unhashable — canon() must normalize bytes/bytearray/
    memoryview to one hashable value or the gate's Counter compare
    crashes instead of comparing. Fails on the pre-r13 code
    (TypeError: unhashable type)."""
    from tools.compare_oracle import canon

    assert canon(b"\x01\x02") == canon(bytearray(b"\x01\x02"))
    assert canon(memoryview(b"ab")) == canon(b"ab")
    hash(canon(bytearray(b"\x01\x02")))  # must be Counter-able
    assert canon((bytearray(b"ab"),)) == (canon(b"ab"),)


def test_read_table_on_bare_session_with_unset_tz():
    """r11 review regression pin: read_table pins session tz UTC, and
    on a session where the key is UNSET (the driver's vanilla session)
    a two-arg conf.get(key, '') VALIDATES '' against the timezone
    converter and throws INVALID_CONF_VALUE — which took down 144/153
    queries in the first vanilla sweep. Exercise the unset-key path in
    a subprocess with a truly bare session."""
    import subprocess
    import sys

    prog = """
import sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
from pdf_using_hugging_face_and_vector_database_spark.io import read_table
n = read_table(spark, "/root/testdata/sf0.001", "events").count()
assert n > 0, n
assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
print("OK", n)
""" % (
        __import__("os").path.dirname(__import__("os").path.dirname(__file__)),
    )
    out = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True, timeout=240
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().startswith("OK")
