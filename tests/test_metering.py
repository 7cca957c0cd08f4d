"""Meters + event log: the reference's printed averages (run.py:198-201)
and the structured JSONL stream are a parity surface — pin the format."""
import pytest
import json

from llmrankers_tpu.types import RerankStats
from llmrankers_tpu.utils.metering import EventLog, MeterReport


@pytest.mark.quick
def test_meter_report_averages(capsys):
    rep = MeterReport()
    rep.add_query(RerankStats(comparisons=10, prompt_tokens=100,
                              completion_tokens=20))
    rep.add_query(RerankStats(comparisons=20, prompt_tokens=300,
                              completion_tokens=40))
    rep.wall_s = 4.0
    s = rep.summary()
    assert s == {
        "avg_comparisons": 15.0,
        "avg_prompt_tokens": 200.0,
        "avg_completion_tokens": 30.0,
        "avg_time_per_query_s": 2.0,
        "truncated_rows": 0,
    }
    rep.print_summary()
    out = capsys.readouterr().out.splitlines()
    # The reference driver's exact four lines (run.py:198-201); the
    # truncation line appears ONLY when the context cap cut tokens.
    assert out == [
        "Avg comparisons: 15.0",
        "Avg prompt tokens: 200.0",
        "Avg completion tokens: 30.0",
        "Avg time per query: 2.0",
    ]
    rep.truncated_rows = 7
    rep.print_summary()
    out = capsys.readouterr().out.splitlines()
    assert out[-1] == "Truncated rows: 7"
    assert rep.summary()["truncated_rows"] == 7


def test_meter_report_empty_is_safe():
    assert MeterReport().summary()["avg_comparisons"] == 0.0


def test_event_log_roundtrip(tmp_path):
    p = tmp_path / "events.jsonl"
    log = EventLog(str(p))
    log.emit("query_done", qid="q1", comparisons=7)
    log.emit("run_done", avg_comparisons=7.0)
    log.close()
    # Append mode: a resumed run extends the same file.
    log2 = EventLog(str(p))
    log2.emit("query_done", qid="q2", comparisons=3)
    log2.close()
    rows = [json.loads(l) for l in p.read_text().splitlines()]
    assert [r["event"] for r in rows] == ["query_done", "run_done", "query_done"]
    assert rows[0]["qid"] == "q1" and rows[2]["qid"] == "q2"
    assert all("ts" in r for r in rows)


def test_event_log_disabled_is_noop(tmp_path):
    log = EventLog(None)
    log.emit("anything", x=1)  # must not raise
    log.close()


def test_profiling_trace_and_annotate(tmp_path):
    """--profile_dir capture path: a trace context writes profiler output
    and the no-op path stays silent."""
    import os

    import jax.numpy as jnp

    from llmrankers_tpu.utils import profiling

    with profiling.trace(None):  # disabled: must not create anything
        pass
    d = tmp_path / "trace"
    with profiling.trace(str(d)):
        with profiling.annotate("phase"):
            jnp.ones((8, 8)).sum().block_until_ready()
    found = [f for _, _, fs in os.walk(d) for f in fs]
    assert found, "trace produced no files"
