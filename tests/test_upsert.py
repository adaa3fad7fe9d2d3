from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import upsert


def _tbl(spark, rows):
    return spark.createDataFrame(rows, ["id", "text", "ingest_version"])


def test_upsert_update_insert_keep(spark):
    existing = _tbl(spark, [("a", "old-a", 1), ("b", "old-b", 1)])
    batch = _tbl(spark, [("a", "new-a", 2), ("c", "new-c", 2)])
    out = {r["id"]: (r["text"], r["ingest_version"]) for r in upsert(existing, batch).collect()}
    assert out == {"a": ("new-a", 2), "b": ("old-b", 1), "c": ("new-c", 2)}


def test_upsert_idempotent(spark):
    existing = _tbl(spark, [("a", "old-a", 1), ("b", "old-b", 1)])
    batch = _tbl(spark, [("a", "new-a", 2)])
    once = upsert(existing, batch)
    twice = upsert(once, batch)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_same_version_batch_wins(spark):
    existing = _tbl(spark, [("a", "old-a", 1)])
    batch = _tbl(spark, [("a", "new-a", 1)])
    out = upsert(existing, batch).collect()
    assert out[0]["text"] == "new-a"


def test_merge_into_update_delete_insert(spark):
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, price double",
    )
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c2", 31.0), (9, "new", 90.0)],
        "id long, name string, price double",
    )
    out = {
        r["id"]: r
        for r in merge_into(
            target,
            source,
            key="id",
            matched_update=lambda t, s: {"price": s["price"]},
            matched_delete=lambda t, s: s["name"] == "c2",
        ).collect()
    }
    assert set(out) == {1, 2, 9}          # 3 deleted, 9 inserted
    assert out[1]["price"] == 10.0        # untouched target survives
    assert out[2]["price"] == 21.0        # updated...
    assert out[2]["name"] == "b"          # ...but only assigned columns
    assert out[9]["name"] == "new"        # insert carries source payload


def test_merge_into_no_insert_mode(spark):
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, 1.0)], "id long, v double")
    source = spark.createDataFrame([(2, 2.0)], "id long, v double")
    out = merge_into(target, source, key="id", insert_unmatched=False).collect()
    assert [r["id"] for r in out] == [1]


def test_merge_into_duplicate_source_keys_error(spark):
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, 1.0)], "id long, v double")
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "id long, v double")
    with pytest.raises(Exception) as ei:
        merge_into(
            target, dup, key="id",
            matched_update=lambda t, s: {"v": s["v"]},
        ).collect()
    assert "multiple source rows" in str(ei.value)


def test_merge_into_duplicate_guard_fires_without_source_refs(spark):
    """ADVICE round 3: a merge whose callbacks never touch the source
    struct (e.g. insert-only) must STILL error on duplicate matched
    source keys, not silently duplicate the target row."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, 1.0)], "id long, v double")
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "id long, v double")
    with pytest.raises(Exception) as ei:
        merge_into(target, dup, key="id").collect()  # no update/delete
    assert "multiple source rows" in str(ei.value)


def test_merge_into_duplicate_guard_survives_delete_predicate(spark):
    """A matched-DELETE predicate that would drop both duplicate rows
    must not swallow the duplicate-source error."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, 1.0)], "id long, v double")
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "id long, v double")
    with pytest.raises(Exception) as ei:
        merge_into(
            target, dup, key="id",
            matched_delete=lambda t, s: F.lit(True),
        ).collect()
    assert "multiple source rows" in str(ei.value)


def test_merge_into_unmatched_duplicates_insert(spark):
    """Delta NOT-MATCHED semantics: duplicate source keys matching no
    target row each insert (no error)."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, 1.0)], "id long, v double")
    dup = spark.createDataFrame([(7, 2.0), (7, 3.0)], "id long, v double")
    out = merge_into(target, dup, key="id").collect()
    assert sorted(r["id"] for r in out) == [1, 7, 7]


def test_merge_into_null_delete_predicate_keeps_row(spark):
    """SQL MERGE: a NULL WHEN MATCHED AND <cond> evaluates as false —
    the row is kept (and updated), never deleted."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    target = spark.createDataFrame([(1, "x", 1.0)], "id long, tag string, v double")
    # source tag is NULL -> predicate (s.tag == 'kill') is NULL
    source = spark.createDataFrame([(1, None, 9.0)], "id long, tag string, v double")
    out = merge_into(
        target,
        source,
        key="id",
        matched_update=lambda t, s: {"v": s["v"]},
        matched_delete=lambda t, s: s["tag"] == "kill",
    ).collect()
    assert len(out) == 1 and out[0]["v"] == 9.0


def test_property_upsert_variants_match_reference(spark):
    """Randomized sweep (fixed seed): upsert (union+window LWW) and
    upsert_cocluster (full-outer MERGE shape) claim IDENTICAL
    last-writer-wins semantics — highest version per id wins, ties
    prefer the batch. Random tables with overlapping/disjoint ids and
    version ties must match a plain-Python reference on both paths."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        upsert_cocluster,
    )

    rng = random.Random(0x10B5)
    ids = [f"id{i}" for i in range(40)]
    existing = [
        (i, f"e:{i}:{rng.randint(0, 9)}", rng.randint(1, 5))
        for i in rng.sample(ids, 30)
    ]
    batch = [
        (i, f"b:{i}:{rng.randint(0, 9)}", rng.randint(1, 5))
        for i in rng.sample(ids, 25)
    ]
    want = {i: (t, v) for i, t, v in existing}
    for i, t, v in batch:
        if i not in want or v >= want[i][1]:  # ties: batch wins
            want[i] = (t, v)

    e = _tbl(spark, existing)
    b = _tbl(spark, batch)
    for fn in (upsert, upsert_cocluster):
        got = {
            r["id"]: (r["text"], r["ingest_version"])
            for r in fn(e, b).collect()
        }
        assert got == want, fn.__name__


def test_scd2_null_transitions(spark):
    """r10 review: change detection must be NULL-safe — a non-NULL ->
    NULL transition OPENS a version (previously silently dropped,
    leaving the old value reading as current), repeated NULLs extend
    one version (previously each opened a spurious one), and a
    NULL -> non-NULL transition closes it."""
    import datetime as dt

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        scd2_from_changelog,
    )

    rows = [
        (1, "a", dt.date(2020, 1, 1)),
        (1, None, dt.date(2020, 2, 1)),   # a -> NULL: new version
        (1, None, dt.date(2020, 3, 1)),   # repeat NULL: extends
        (1, "b", dt.date(2020, 4, 1)),    # NULL -> b: new version
        (2, None, dt.date(2021, 1, 1)),   # first observation is NULL
        (2, None, dt.date(2021, 2, 1)),   # repeat: extends
    ]
    log = spark.createDataFrame(rows, "k int, attr string, t date")
    out = scd2_from_changelog(
        log, key="k", attr="attr", order_cols=["t"], valid_col="t"
    ).collect()
    got = {
        (r.k, r.version): (r.attr, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in out
    }
    assert got == {
        (1, 1): ("a", "2020-01-01", "2020-02-01"),
        (1, 2): (None, "2020-02-01", "2020-04-01"),
        (1, 3): ("b", "2020-04-01", None),
        (2, 1): (None, "2021-01-01", None),
    }


def test_upsert_duplicate_id_version_deterministic(spark):
    """r10 review: duplicate (id, version) rows within one input must
    yield a DETERMINISTIC survivor (full-row-hash tiebreak) — the
    previous arbitrary row_number pick could flip the stored row
    across task retries / replayed micro-batches."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        upsert,
    )

    existing = spark.createDataFrame(
        [("x", "old", 1)], "id string, text string, ingest_version long"
    )
    batch = spark.createDataFrame(
        [("x", "A", 2), ("x", "B", 2), ("x", "C", 2)],
        "id string, text string, ingest_version long",
    )
    picks = {
        tuple(upsert(existing, batch).collect()[0]) for _ in range(5)
    }
    assert len(picks) == 1  # same survivor every run
    # and re-applying the surviving row converges (idempotence)
    survivor = picks.pop()
    table = spark.createDataFrame([survivor], "id string, text string, ingest_version long")
    again = upsert(table, batch).collect()
    assert len(again) == 1 and tuple(again[0]) == survivor


def test_upsert_cocluster_null_version_parity(spark):
    """r10 review: upsert_cocluster must agree with upsert() on every
    NULL-version combination (previously a NULL on either side made
    the comparison NULL and silently kept the existing row)."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        upsert,
        upsert_cocluster,
    )

    schema = "id string, text string, ingest_version long"
    cases = [
        (("x", "e", None), ("x", "b", 5)),     # existing NULL -> batch wins
        (("x", "e", 5), ("x", "b", None)),     # batch NULL -> existing wins
        (("x", "e", None), ("x", "b", None)),  # both NULL -> batch (tie pref)
        (("x", "e", 3), ("x", "b", 5)),        # plain
    ]
    for e_row, b_row in cases:
        e = spark.createDataFrame([e_row], schema)
        b = spark.createDataFrame([b_row], schema)
        via_upsert = sorted(tuple(r) for r in upsert(e, b).collect())
        via_cocluster = sorted(tuple(r) for r in upsert_cocluster(e, b).collect())
        assert via_upsert == via_cocluster, (e_row, b_row)


def test_merge_into_rejects_unknown_assignment(spark):
    """r10 review: a typo'd matched_update column must fail fast like
    Delta's analysis error, not silently drop the update."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        merge_into,
    )

    t = spark.createDataFrame([("x", 1)], "id string, v long")
    s = spark.createDataFrame([("x", 2)], "id string, v long")
    with pytest.raises(ValueError, match="unknown assignment columns"):
        merge_into(t, s, matched_update=lambda tt, ss: {"vv": ss["v"]})


def test_upsert_map_column_tiebreak(spark):
    """r10 ADVICE: the deterministic full-row-hash tiebreak used
    xxhash64 over every column; Spark rejects hashing MapType by
    default (spark.sql.legacy.allowHashOnMapType=false), so a table
    with a map column failed analysis. Map columns now enter the
    tiebreak as canonical JSON text — upsert must work AND stay
    deterministic on duplicate (id, version) rows."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        upsert,
    )

    schema = "id string, props map<string,string>, ingest_version long"
    existing = spark.createDataFrame([("x", {"k": "old"}, 1)], schema)
    batch = spark.createDataFrame(
        [("x", {"k": "A"}, 2), ("x", {"k": "B"}, 2)], schema
    )
    picks = set()
    for _ in range(3):
        rows = upsert(existing, batch).collect()
        assert len(rows) == 1
        picks.add((rows[0]["id"], rows[0]["props"]["k"], rows[0]["ingest_version"]))
    assert len(picks) == 1  # deterministic survivor, no analysis error

    # nested map (struct containing a map) must also be tolerated
    schema2 = (
        "id string, payload struct<tags: map<string,string>, n: long>, "
        "ingest_version long"
    )
    e2 = spark.createDataFrame([("y", {"tags": {"a": "1"}, "n": 1}, 1)], schema2)
    b2 = spark.createDataFrame([("y", {"tags": {"a": "2"}, "n": 2}, 2)], schema2)
    out = upsert(e2, b2).collect()
    assert len(out) == 1 and out[0]["payload"]["n"] == 2


def test_scd2_null_transitions_query_is_adversarial(spark, sf_dir):
    """VERDICT r10 item 3: the registered scd2_null_transitions row
    must (a) run over an input that PROVABLY contains non-NULL→NULL
    transitions, NULL→non-NULL transitions, and consecutive-NULL runs,
    and (b) DISCRIMINATE the r10 bug class — the old `attr != prev` /
    `prev IS NULL` change detection must produce a different result on
    this input (it was bit-identical on the NULL-free fixtures, which
    is how the bug survived three rounds of certification)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdf_using_hugging_face_and_vector_database_spark.io import read_table
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        scd2_null_transitions,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when((F.col("o_orderkey") % 5).isin(0, 3), F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.withColumn("__prev", F.lag("priority").over(w)).withColumn(
        "__rn", F.row_number().over(w)
    )
    to_null = seq.filter(
        F.col("__prev").isNotNull() & F.col("priority").isNull()
    ).count()
    from_null = seq.filter(
        (F.col("__rn") > 1) & F.col("__prev").isNull() & F.col("priority").isNotNull()
    ).count()
    null_runs = seq.filter(
        (F.col("__rn") > 1) & F.col("__prev").isNull() & F.col("priority").isNull()
    ).count()
    assert to_null > 0 and from_null > 0 and null_runs > 0

    # the OLD (pre-r10) change detection on the same input
    old_changed = seq.filter(
        F.col("__prev").isNull() | (F.col("priority") != F.col("__prev"))
    ).count()
    new_rows = scd2_null_transitions(spark, sf_dir).count()
    assert new_rows != old_changed  # the registered row discriminates
    # exact accounting: old drops every →NULL change and opens a
    # spurious version per repeated NULL
    assert old_changed == new_rows - to_null + null_runs


def test_scd2_property_random_changelogs(spark):
    """Property pin for the twice-burned SCD2 kernel (r10 NULL bug,
    r11 adversarial row): on random change logs INCLUDING NULLs and
    repeated values, scd2_from_changelog must equal a direct Python
    reference of the documented semantics — first row opens, null-safe
    value change opens, repeats (incl. repeated NULLs) extend, lead()
    closes intervals, last version is current."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        scd2_from_changelog,
    )

    logs = st.dictionaries(
        keys=st.integers(min_value=0, max_value=2),
        values=st.lists(
            st.sampled_from([None, "a", "b"]), min_size=1, max_size=6
        ),
        min_size=1,
        max_size=3,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(logs)
    def run(log):
        rows = [
            (k, i, a) for k, attrs in log.items() for i, a in enumerate(attrs)
        ]
        df = spark.createDataFrame(rows, "k long, seq long, attr string")
        key_fn = lambda t: (t[0], t[2])  # (key, valid_from) — unique
        got = sorted(
            (
                (r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
                for r in scd2_from_changelog(
                    df, key="k", attr="attr", order_cols=["seq"], valid_col="seq"
                ).collect()
            ),
            key=key_fn,
        )
        want = []
        for k, attrs in log.items():
            kept = [
                (i, a)
                for i, a in enumerate(attrs)
                if i == 0 or not (a is None and attrs[i - 1] is None)
                and not (
                    a is not None and attrs[i - 1] is not None and a == attrs[i - 1]
                )
            ]
            for v, (i, a) in enumerate(kept):
                nxt = kept[v + 1][0] if v + 1 < len(kept) else None
                want.append((k, a, i, nxt, v + 1, nxt is None))
        assert got == sorted(want, key=key_fn)

    run()


def test_upsert_null_id_contracts(spark):
    """r15 review wave 10 (measured, recorded): the two merge paths
    diverge on NULL ids, each following its own standard semantics —
    upsert()'s window partitionBy folds ALL NULL ids into one group
    (one LWW survivor, the same fate a SQL window oracle replays),
    while upsert_cocluster()'s equi-join never matches a NULL key so
    every NULL-id row survives separately (Delta MERGE ON-equality
    semantics). The equivalence claim between the paths is scoped to
    NON-NULL ids; this pin keeps both fates honest."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.upsert import (
        upsert,
        upsert_cocluster,
    )

    e = spark.createDataFrame(
        [(None, 1, "e1"), (None, 2, "e2"), (1, 1, "ev")],
        "id int, ingest_version int, v string",
    )
    b = spark.createDataFrame(
        [(None, 3, "b1"), (1, 2, "bv")], "id int, ingest_version int, v string"
    )
    w = sorted(map(tuple, upsert(e, b).collect()), key=str)
    c = sorted(map(tuple, upsert_cocluster(e, b).collect()), key=str)
    # window path: one survivor for the whole NULL-id group (LWW by
    # version -> the batch's version-3 row)
    assert w == [(1, 2, "bv"), (None, 3, "b1")]
    # merge path: every NULL-id row survives separately
    assert c == [(1, 2, "bv"), (None, 1, "e1"), (None, 2, "e2"), (None, 3, "b1")]
    # and the paths agree exactly on the non-null keys
    assert [r for r in w if r[0] is not None] == [
        r for r in c if r[0] is not None
    ]
