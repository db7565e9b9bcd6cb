"""bench.py orchestrator logic (no TPU, no subprocesses — children are
stubbed): the watchdog must forward a healthy value verbatim, retry
exactly once in a fresh process on a suspect (degraded-window) value
keeping the best with both runs recorded, and keep a genuinely low pair
visible as such rather than hiding it."""
import contextlib
import io
import json
import sys
import types

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, ".")
    import bench as b
    monkeypatch.setattr(b, "_probe_backend", lambda: (True, "axon"))
    yield b
    sys.path.remove(".")


class _Result:
    def __init__(self, value, metric, unit):
        self.returncode = 0
        self.stdout = json.dumps({"metric": metric, "value": value,
                                  "unit": unit,
                                  "vs_baseline": value / 100.0}) + "\n"
        self.stderr = ""


def _run(bench, values):
    calls = []

    def fake(_calls=calls, _vals=list(values)):
        calls.append(1)
        return _Result(_vals[len(_calls) - 1], bench.METRIC, bench.UNIT), 0.0

    bench._run_child = fake
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as exc:
            bench._orchestrate()
    return exc.value.code, json.loads(buf.getvalue().strip()), len(calls)


def test_healthy_value_forwards_verbatim(bench):
    rc, payload, n_children = _run(bench, [744.0])
    assert rc == 0 and n_children == 1
    assert payload["value"] == 744.0 and "runs" not in payload


def test_suspect_value_retries_once_and_takes_best(bench):
    rc, payload, n_children = _run(bench, [300.0, 740.0])
    assert rc == 0 and n_children == 2
    assert payload["value"] == 740.0
    assert payload["runs"] == [300.0, 740.0]
    assert "degraded" in payload["note"]


def test_concordant_low_pair_stays_visible(bench):
    # a real regression: both fresh processes are low — the reported
    # value must stay low (no silent masking), with both runs recorded
    rc, payload, n_children = _run(bench, [310.0, 295.0])
    assert rc == 0 and n_children == 2
    assert payload["value"] == 310.0
    assert payload["runs"] == [310.0, 295.0]
