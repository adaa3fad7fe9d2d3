"""Crash-recovery semantics: a restarted streaming query with the
same checkpoint must resume from the offset log (no reprocessing) AND
the state store (no lost aggregation state). Run 2's output equals the
full-history batch aggregate while its INPUT is only the new files —
that equality holds only if both recovery mechanisms work."""

from __future__ import annotations

import duckdb

from pdf_using_hugging_face_and_vector_database_spark.streaming.recovery import (
    run_counts_with_checkpoint,
    user_bucket_counts,
)

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"
N_BUCKETS = 10


def _write_part(con, out_path: str, lo: int, hi: int) -> None:
    con.sql(
        f"COPY (SELECT event_id, user_id, event_type, value "
        f"FROM '{SF_EVENTS}' WHERE event_id >= {lo} AND event_id < {hi} "
        f"ORDER BY event_id) TO '{out_path}' (FORMAT PARQUET)"
    )


def _batch_truth(con, lo: int, hi: int) -> dict[int, tuple[int, float]]:
    rows = con.sql(
        f"SELECT user_id % {N_BUCKETS} AS bucket, count(*) AS n, "
        f"round(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 6) AS s "
        f"FROM '{SF_EVENTS}' WHERE event_id >= {lo} AND event_id < {hi} "
        f"GROUP BY 1"
    ).fetchall()
    return {int(b): (int(n), float(s)) for b, n, s in rows}


def test_restart_resumes_offsets_and_state(spark, tmp_path):
    con = duckdb.connect()
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # run 1: first file
    _write_part(con, str(src / "part1.parquet"), 0, 300)
    out1 = {
        r["bucket"]: (r["n_events"], round(r["value_sum"], 6))
        for r in run_counts_with_checkpoint(
            spark, str(src), ckpt, "recovery_counts_1"
        )
    }
    assert out1 == _batch_truth(con, 0, 300)

    # "crash" (query already terminated); new data lands
    _write_part(con, str(src / "part2.parquet"), 300, 600)

    # run 2: same checkpoint, fresh query — must fold ONLY part2 into
    # the restored state
    out2 = {
        r["bucket"]: (r["n_events"], round(r["value_sum"], 6))
        for r in run_counts_with_checkpoint(
            spark, str(src), ckpt, "recovery_counts_2"
        )
    }
    full = _batch_truth(con, 0, 600)
    part2_only = _batch_truth(con, 300, 600)
    assert out2 == full
    # and the equality is evidence of BOTH mechanisms: counts exceed a
    # from-scratch run over part2 (state restored), and equal the full
    # history exactly (part1 not reprocessed — else double-counted)
    for b, (n, _) in out2.items():
        assert n > part2_only[b][0]


def test_restart_with_no_new_data_emits_nothing(spark, tmp_path):
    con = duckdb.connect()
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_part(con, str(src / "part1.parquet"), 0, 200)
    run_counts_with_checkpoint(spark, str(src), ckpt, "recovery_idle_1")
    out = run_counts_with_checkpoint(spark, str(src), ckpt, "recovery_idle_2")
    # update mode: nothing changed, nothing emitted
    assert len(out) == 0


def test_bucket_counts_match_batch(spark, sf_dir):
    """The aggregation itself (stream==batch function parity) on the
    real events fixture."""
    from pdf_using_hugging_face_and_vector_database_spark.io import read_table

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    got = {
        r["bucket"]: r["n_events"]
        for r in user_bucket_counts(events).collect()
    }
    con = duckdb.connect()
    # the fixture's ts column needs nanos handling in Spark, but the
    # lite projection sidesteps it; duckdb reads it directly
    truth = {
        int(b): int(n)
        for b, n in con.sql(
            f"SELECT user_id % {N_BUCKETS}, count(*) "
            f"FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    assert got == truth
