"""tools/analyze_trace.py: parse a jax.profiler capture and report top ops
(SURVEY §5 tracing — the reference has wall-clock timers only)."""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_analyze_trace_reports_ops(tmp_path, capsys):
    import analyze_trace

    with jax.profiler.trace(str(tmp_path)):
        x = jnp.ones((256, 256))
        jax.block_until_ready(jnp.tanh(x @ x))
    planes = analyze_trace.analyze(str(tmp_path), top=5)
    out = capsys.readouterr().out
    assert planes, "expected at least one populated plane"
    assert "ms" in out and "==" in out
    # per-op aggregation is non-empty and sorted descending
    name, s = planes[0]
    tops = s["per_op_s"].most_common(5)
    assert tops and all(tops[i][1] >= tops[i + 1][1]
                        for i in range(len(tops) - 1))


def test_analyze_empty_dir(tmp_path, capsys):
    import analyze_trace

    assert analyze_trace.analyze(str(tmp_path)) == []
    assert "no planes matched" in capsys.readouterr().err
