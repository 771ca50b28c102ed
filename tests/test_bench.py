"""bench.py schema behavior under partial backend failure.

BENCH_r03 was lost entirely (rc:124, parsed:null) because run_full was
all-or-nothing while the tunneled backend died mid-round. run_full now
prints each schema row as its own JSON line the moment it completes, so a
mid-schema outage still leaves the already-measured rows on stdout
(VERDICT r3 item 6). These tests simulate the failure by stubbing
run_bench — no device work.
"""

import json

import dip_tpu.bench as bench_mod


def _fake_row(value):
    return {
        "metric": "dip_iters_per_sec_fake",
        "value": value,
        "unit": "iters/s",
        "vs_baseline": 1.0,
    }


def _parse_json_lines(out):
    return [json.loads(line) for line in out.strip().splitlines()
            if line.startswith("{")]


def test_run_full_emits_each_row_immediately(monkeypatch, capsys):
    calls = []

    def fake_run_bench(size, iters, batch=1, print_json=True,
                       compute_dtype=None, **kw):
        calls.append((batch, compute_dtype))
        return _fake_row(100.0 + len(calls))

    monkeypatch.setattr(bench_mod, "run_bench", fake_run_bench)
    result = bench_mod.run_full(size=64, iters=5, batch=8)
    lines = _parse_json_lines(capsys.readouterr().out)
    # 3 per-row lines + 1 combined line
    assert len(lines) == 4
    assert lines[0]["value"] == 101.0  # b1 bf16 first
    combined = lines[-1]
    assert combined["value"] == 101.0
    assert combined["b1_f32"] == 102.0
    assert combined["b8_queue_aggregate"] == 103.0
    assert "incomplete_rows" not in combined
    assert result == combined


def test_run_full_survives_non_headline_row_failure(monkeypatch, capsys):
    def fake_run_bench(size, iters, batch=1, print_json=True,
                       compute_dtype=None, **kw):
        if compute_dtype is None:  # the f32 row dies (simulated outage)
            raise RuntimeError("Unable to initialize backend 'axon'")
        return _fake_row(80.0 if batch == 1 else 75.0)

    monkeypatch.setattr(bench_mod, "run_bench", fake_run_bench)
    result = bench_mod.run_full(size=64, iters=5, batch=8)
    out = capsys.readouterr().out
    lines = _parse_json_lines(out)
    # headline row line + b8 row line + combined line, f32 missing
    assert len(lines) == 3
    assert lines[0]["value"] == 80.0
    combined = lines[-1]
    assert combined["value"] == 80.0
    assert "b1_f32" not in combined
    assert combined["b8_queue_aggregate"] == 75.0
    assert combined["incomplete_rows"] == ["b1_f32"]
    assert result == combined


def test_run_full_headline_failure_still_raises(monkeypatch, capsys):
    def fake_run_bench(*a, **kw):
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench_mod, "run_bench", fake_run_bench)
    try:
        bench_mod.run_full(size=64, iters=5)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("headline failure must propagate (so the "
                             "top-level retry loop can re-attempt)")
