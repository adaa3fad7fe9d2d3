"""S8/S9 — vector upsert sink (reference `streamlit_app.py:97-121`).

The reference upserts id-keyed batches of 100 with 3 retries and
*silently skips* a batch that exhausts retries (at-most-once, partial
ingest — `streamlit_app.py:117-121`). We do not replicate silent data
loss: Spark task retries give all-or-nothing job semantics, and the
upsert itself is an idempotent last-writer-wins compaction keyed on
``id`` ordered by an explicit ``ingest_version`` (SURVEY.md §7 risk
note: never rely on file order).

Without Delta in this container, MERGE is rewritten as
union + row_number; on a Delta/Iceberg table this operator is
``MERGE INTO vectors USING batch ON id WHEN MATCHED UPDATE ...``.

Scale: the compaction shuffles on ``id`` (uniform hash key). With the
table bucketed by ``id``, repeated upserts co-locate and the window
needs no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_cocluster(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    version_col: str = "ingest_version",
) -> DataFrame:
    """MERGE for an id-bucketed table: full-outer join on ``id`` with a
    per-pair version comparison — same last-writer-wins result as
    :func:`upsert` for NON-NULL ids (the scope of the equivalence
    claim; see below), different physical shape. When ``existing`` is
    a bucketed table (io.write_bucketed), its side of the join reads
    buckets directly with NO Exchange; only the (small) batch shuffles
    to match — or broadcasts. The union+window rewrite in
    :func:`upsert` shuffles the WHOLE table every merge; this is the
    one Delta/Iceberg MERGE actually executes on clustered storage,
    and the 100 TB repeated-ingest path (plan-asserted in
    tests/test_io_scale.py). Requires batch ids unique (true of any
    compacted batch; pre-compact with :func:`upsert` if not).

    NULL-id contract (r15 review wave 10, measured): the two merge
    paths genuinely diverge on NULL ids and each follows its OWN
    standard semantics — this join's equi-condition never matches a
    NULL key, so every NULL-id row survives separately (exactly what
    Delta's ``MERGE ... ON t.id = s.id`` does), while :func:`upsert`'s
    window ``partitionBy(id)`` folds ALL NULL ids into one group and
    keeps a single survivor (exactly what the SQL window the oracle
    replays does). Both fates are pinned in
    tests/test_upsert.py::test_upsert_null_id_contracts; callers
    needing path-interchangeability must guarantee NON-NULL ids
    (operators/validation.null_guard is the P1 boundary for that).
    """
    payload = [c for c in existing.columns if c != id_col]
    e = existing.select(id_col, F.struct(*payload).alias("__e"))
    b = batch.select(id_col, F.struct(*payload).alias("__b"))
    j = e.join(b, id_col, "full_outer")
    bv = F.col(f"__b.{version_col}")
    ev = F.col(f"__e.{version_col}")
    # NULL-version parity with upsert() (r10 review): upsert sorts
    # desc(version) NULLS LAST then prefers the batch — so the batch
    # wins when the existing version is NULL (incl. both-NULL, the
    # batch-preference tie) and loses when only ITS version is NULL; a
    # bare `bv >= ev` is NULL in those cases and silently kept the
    # existing row, making the two "equivalent" merge paths diverge
    win = (
        F.when(F.col("__b").isNull(), F.col("__e"))
        .when(F.col("__e").isNull(), F.col("__b"))
        .when(ev.isNull() | (bv.isNotNull() & (bv >= ev)), F.col("__b"))
        .otherwise(F.col("__e"))
    )
    return j.select(id_col, win.alias("__w")).select(id_col, "__w.*")


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str = "id",
    matched_update=None,
    matched_delete=None,
    insert_unmatched: bool = True,
) -> DataFrame:
    """Full MERGE semantics on plain tables — the general form of
    Delta/Iceberg ``MERGE INTO target USING source ON key`` without a
    transactional format in the container:

    - ``matched_delete(t, s) -> Column``: matched rows where this is
      true are dropped (WHEN MATCHED AND <cond> THEN DELETE);
    - ``matched_update(t, s) -> dict[col, Column]``: remaining matched
      rows get these assignments (WHEN MATCHED THEN UPDATE SET);
    - ``insert_unmatched``: source rows with no target match are
      inserted (WHEN NOT MATCHED THEN INSERT) — source must carry the
      target's columns;
    - unmatched target rows always survive.

    ``t`` / ``s`` are struct columns exposing the respective side's
    payload fields. Like Delta, multiple source rows matching one
    target key are an ERROR (raise_error evaluated inside the plan, at
    execution time), because they make the merge non-deterministic.
    The guard is unconditional: it fires even when the merge's
    update/delete callbacks never reference the source struct, and a
    matched-DELETE predicate cannot filter a duplicate away before the
    guard sees it. Duplicate source rows that match NO target key
    follow Delta's NOT-MATCHED semantics instead: each inserts. A NULL
    ``matched_delete`` predicate keeps the row (SQL MERGE treats NULL
    as false), never deletes it.

    100 TB shape: one full-outer shuffle join on the key (or
    shuffle-free when the target is id-bucketed, as upsert_cocluster's
    plan test pins); everything else is a projection. The rewrite of a
    write-side MERGE into a read-side plan is exactly what
    Delta/Iceberg execute under the hood — swap in ``MERGE INTO`` on a
    real lakehouse table and the call sites don't change.
    """
    payload = [c for c in target.columns if c != key]
    t_side = target.select(key, F.struct(*payload).alias("__t"))
    # per-key source cardinality, carried through the join so the
    # duplicate-source error fires lazily like Delta's
    w_cnt = Window.partitionBy(key)
    s_side = source.select(
        key,
        F.struct(*payload).alias("__s"),
        F.count(F.lit(1)).over(w_cnt).alias("__s_cnt"),
    )
    j = t_side.join(s_side, key, "full_outer")
    t, s = F.col("__t"), F.col("__s")
    matched = t.isNotNull() & s.isNotNull()
    # Duplicate-source guard — hoisted to the FIRST branch of the row
    # projection so it fires for every merge shape, not only those
    # whose update/delete callbacks happen to reference the source
    # struct. NULL-safe: target-only rows have __s_cnt NULL → false.
    dup = F.coalesce(F.col("__s_cnt") > 1, F.lit(False))
    dup_raise = F.raise_error(
        F.concat(
            F.lit("merge_into: multiple source rows match target key "),
            F.col(key).cast("string"),
        )
    ).cast(t_side.schema["__t"].dataType)
    # NULL predicate == false (SQL MERGE semantics: keep, not delete);
    # ~dup keeps duplicate rows alive so the guard above raises.
    delete_cond = (
        matched & F.coalesce(matched_delete(t, s), F.lit(False)) & ~dup
        if matched_delete is not None
        else F.lit(False)
    )
    if matched_update is not None:
        assignments = matched_update(t, s)
        # a typo'd assignment key would otherwise be silently ignored
        # (the merge "succeeds" with the update lost); real Delta MERGE
        # fails analysis on an unknown column (r10 review)
        unknown = sorted(set(assignments) - set(payload))
        if unknown:
            raise ValueError(
                f"merge_into: unknown assignment columns {unknown}; "
                f"target payload columns are {sorted(payload)}"
            )
        updated = F.struct(
            *[assignments.get(c, t[c]).alias(c) for c in payload]
        )
    else:
        updated = t
    row = (
        F.when(dup & matched, dup_raise)
        .when(matched, updated)
        .when(t.isNotNull(), t)
        .otherwise(s)  # source-only -> insert
    )
    out = j.filter(~delete_cond)
    if not insert_unmatched:
        out = out.filter(t.isNotNull())
    return out.select(key, row.alias("__r")).select(key, "__r.*")


def upsert(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    version_col: str = "ingest_version",
) -> DataFrame:
    """Last-writer-wins by (id, version): the highest version per id
    survives; ties (same version in both inputs) prefer the batch;
    remaining ties (duplicate (id, version) rows WITHIN one input)
    break on a deterministic full-row hash — without it the window
    picked an arbitrary survivor, so a task retry or a replayed
    streaming micro-batch could flip the stored row between runs
    (r10 review), breaking the idempotence this operator promises.

    Idempotent: re-applying the same batch converges to the same table
    (strictly stronger than the reference's skip-on-failure ingest).
    """
    tagged_existing = existing.withColumn("__is_batch", F.lit(0))
    tagged_batch = batch.withColumn("__is_batch", F.lit(1))
    unioned = tagged_existing.unionByName(tagged_batch)
    # Spark rejects xxhash64 over MapType by default
    # (spark.sql.legacy.allowHashOnMapType=false) — a table with a map
    # column must not fail analysis here (r10 ADVICE), so map columns
    # enter the tiebreak as their canonical JSON text instead. to_json
    # of a map is key-order-stable for a given row value in Spark's
    # UnsafeMapData layout, and even if two semantically-equal maps
    # serialized differently the tiebreak only needs determinism for
    # the SAME physical row across retries, which JSON text gives.
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    payload = [
        F.to_json(F.col(f.name)) if _has_map(f.dataType) else F.col(f.name)
        for f in existing.schema.fields
    ]
    w = Window.partitionBy(id_col).orderBy(
        F.desc(version_col),
        F.desc("__is_batch"),
        F.desc(F.xxhash64(*payload)),
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_batch")
    )


def scd2_from_changelog(
    changes: DataFrame,
    key: str,
    attr: str,
    order_cols: list[str],
    valid_col: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change log:
    per ``key``, order the log by ``order_cols``, keep only rows where
    ``attr`` actually CHANGES (classic SCD2 change detection — repeat
    observations of the same value extend the current interval), and
    emit validity intervals ``[valid_from, valid_to)`` with
    ``valid_to`` NULL on the open current row.

    Scale shape (100 TB): two windows over the SAME
    ``partitionBy(key)`` ordering — Catalyst plans one Exchange +
    one sort and runs both window functions in a single
    WindowExec pipeline; no joins, no second shuffle. Per-key group
    sizes are the change-log depth per entity (bounded), so no skew
    beyond genuinely hot entities.

    Returns ``(key, attr, valid_from, valid_to, version, is_current)``.
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    # NULL-safe change detection (r10 review): `attr != prev` is NULL
    # for a non-NULL -> NULL transition (silently dropping the change:
    # the old value would read as still current), and `prev IS NULL`
    # conflates "first observation" with "previous value was NULL"
    # (repeated NULLs each opening a spurious version). First row is
    # detected by row_number (same window, same WindowExec pipeline);
    # value change by null-safe inequality.
    changed = (
        changes.withColumn("__prev", F.lag(F.col(attr)).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1) | ~F.col(attr).eqNullSafe(F.col("__prev"))
        )
        .drop("__prev", "__rn")
    )
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    return changed.select(
        F.col(key),
        F.col(attr),
        F.col(valid_col).alias("valid_from"),
        F.lead(F.col(valid_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(F.col(valid_col)).over(w2).isNull().alias("is_current"),
    )
