"""The bench's incremental event-log reader (r16): per-query metric
attribution depends on drain() consuming exactly the bytes appended
since the previous drain and never mis-parsing a partial trailing
line. Pure-Python — no Spark session."""

import json
import os

from bench import _EventLogReader


def _task_end(cpu_ns=2_000_000_000, in_bytes=1_000_000):
    return json.dumps(
        {
            "Event": "SparkListenerTaskEnd",
            "Task Metrics": {
                "Executor CPU Time": cpu_ns,
                "Executor Run Time": 3000,
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 500_000},
                "Shuffle Read Metrics": {
                    "Local Bytes Read": 200_000,
                    "Remote Bytes Read": 100_000,
                },
                "Input Metrics": {"Bytes Read": in_bytes},
            },
        }
    )


def test_incremental_drain_and_partial_lines(tmp_path):
    ev = tmp_path / "app-123"
    r = _EventLogReader(str(tmp_path))
    with open(ev, "w") as f:
        f.write(json.dumps({"Event": "SparkListenerJobStart"}) + "\n")
        f.write(_task_end() + "\n")
    m = r.drain()
    assert m["jobs"] == 1 and m["tasks"] == 1
    assert m["cpu_sec"] == 2.0 and m["run_sec"] == 3.0
    assert m["shuffle_write_mb"] == 0.5 and m["shuffle_read_mb"] == 0.3
    assert m["input_mb"] == 1.0
    # nothing new -> zeros (no double counting)
    assert r.drain()["tasks"] == 0
    # a partial trailing line is NOT consumed until completed
    line = _task_end(cpu_ns=1_000_000_000)
    with open(ev, "a") as f:
        f.write(line[:20])
    assert r.drain()["tasks"] == 0
    with open(ev, "a") as f:
        f.write(line[20:] + "\n")
    m = r.drain()
    assert m["tasks"] == 1 and m["cpu_sec"] == 1.0


def test_rolling_directory_layout(tmp_path):
    d = tmp_path / "eventlog_v2_app"
    d.mkdir()
    with open(d / "events_1_app", "w") as f:
        f.write(json.dumps({"Event": "SparkListenerJobStart"}) + "\n")
    r = _EventLogReader(str(tmp_path))
    assert r.drain()["jobs"] == 1
    with open(d / "events_2_app", "w") as f:
        f.write(json.dumps({"Event": "SparkListenerStageCompleted"}) + "\n")
    m = r.drain()
    assert m["jobs"] == 0 and m["stages"] == 1


def test_missing_dir_degrades_to_zeros(tmp_path):
    r = _EventLogReader(str(tmp_path / "absent"))
    m = r.drain()
    assert m["tasks"] == 0 and m["jobs"] == 0
    # garbage lines are skipped, never raise
    bad = tmp_path / "absent"
    bad.mkdir()
    with open(bad / "app-1", "wb") as f:
        f.write(b"\xff\xfenot json\n")
    assert os.path.getsize(bad / "app-1") > 0
    assert r.drain()["tasks"] == 0
