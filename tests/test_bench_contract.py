"""Bench stdout-contract lock (r12 verdict item 8): the driver captures
only the TAIL of bench stdout (~2000 chars), and r11 lost a round's
timings when the telemetry outgrew it.  These tests pin the invariant
structurally: the final stdout line stays parseable JSON within budget
under WORST-CASE tier growth, so no future query registration can
silently reintroduce the truncation.
"""

from __future__ import annotations

import json

import bench


def _line(n_errors: int, err_len: int = 300) -> str:
    timings = {name: 1234.567 for name in bench.HEADLINE}
    slow_timings = {f"slow_query_{i:02d}": 123.456 for i in range(60)}
    spreads = {name: 0.123 for name in bench.HEADLINE}
    slow_load = {f"slow_query_{i:02d}": 31.99 for i in range(60)}
    errors = {
        f"failing_query_with_a_rather_long_name_{i:03d}": "x" * err_len
        for i in range(n_errors)
    }
    return bench._final_stdout_line(
        sum(timings.values()), timings, "0.1", 3, slow_timings,
        [32.0, 31.0, 30.0], [32.0, 31.0, 30.0], spreads, slow_load, errors,
    )


def test_stdout_line_within_budget_clean_run():
    line = _line(0)
    assert len(line) <= 2000, len(line)
    payload = json.loads(line)
    assert payload["metric"] == "headline_queries_total"
    assert set(payload["queries"]) == set(bench.HEADLINE)
    assert payload["unit"] == "sec" and payload["sf"] == 0.1


def test_stdout_line_within_budget_under_mass_errors():
    """Worst case: every tier erroring with driver-truncated (300-char)
    messages — the degradation chain must still land a parseable line
    under the tail capture, keeping at least the contract fields."""
    for n_errors in (5, 40, 120):
        line = _line(n_errors)
        assert len(line) <= 2000, (n_errors, len(line))
        payload = json.loads(line)
        assert payload["metric"] == "headline_queries_total"
        assert "value" in payload and "queries" in payload


def test_headline_growth_guard():
    """The headline set itself is the only stdout-resident per-query
    detail; if it ever grows past what the budget fits (~45 names at
    current precision), the clean-run line overflows into degraded form
    and the per-round comparison loses per-query timings — fail HERE at
    registration time instead."""
    assert len(bench.HEADLINE) <= 45, (
        "headline set grew: re-verify the clean-run stdout line fits "
        "STDOUT_BYTE_BUDGET with per-query timings intact"
    )
    line = _line(0)
    assert set(json.loads(line)["queries"]) == set(bench.HEADLINE)


def test_calibration_normalized_delta_cancels_host_drift():
    """r13 verdict item 5: a host that got uniformly 1.5x slower inflates
    raw deltas by 1.5x but the calibration ratio cancels it exactly;
    a REAL 2x plan regression survives normalization; no previous
    calibration falls back to the raw ratio."""
    # host 1.5x slower, query unchanged: raw 1.5x, normalized 1.0
    d, d_raw = bench._normalized_delta(1.5, 1.0, cal=0.9, prev_cal=0.6)
    assert abs(d - 1.0) < 1e-9 and abs(d_raw - 1.5) < 1e-9
    # host 1.5x slower AND the plan genuinely 2x worse: normalized 2.0
    d, d_raw = bench._normalized_delta(3.0, 1.0, cal=0.9, prev_cal=0.6)
    assert abs(d - 2.0) < 1e-9 and abs(d_raw - 3.0) < 1e-9
    # no previous calibration: normalized == raw
    d, d_raw = bench._normalized_delta(1.5, 1.0, cal=0.9, prev_cal=None)
    assert d == d_raw == 1.5
    # faster host (cal shrank): a raw "improvement" that is pure host
    # speedup normalizes back to 1.0
    d, d_raw = bench._normalized_delta(0.5, 1.0, cal=0.3, prev_cal=0.6)
    assert abs(d - 1.0) < 1e-9 and abs(d_raw - 0.5) < 1e-9


def test_sidecar_protection_and_cli(tmp_path):
    """r14 verdict item 3: only an explicit --sidecar at sf0.1 may name
    the committed quiet record bench_full.json; a default run (the
    driver's bare `python bench.py`), an --out run, and any non-sf0.1
    run all write elsewhere.  --help must not reach Spark (argparse
    exits before the heavy imports in main)."""
    assert bench._detail_json_name(True, None, "0.1") == "bench_full.json"
    assert bench._detail_json_name(False, None, "0.1") == "bench_full_latest.json"
    assert bench._detail_json_name(False, "x.json", "0.1") == "x.json"
    assert bench._detail_json_name(False, None, "0.01") == "bench_full_sf0.01.json"
    # --sidecar at the wrong SF still cannot clobber the sf0.1 record
    assert bench._detail_json_name(True, None, "0.01") == "bench_full_sf0.01.json"
    # defaults: a bare invocation parses to sidecar=False (protection on)
    args = bench._parse_args([])
    assert args.sidecar is False and args.out is None
    import pytest

    with pytest.raises(SystemExit):
        bench._parse_args(["--help"])


def test_sidecar_round_marker_gates_override(tmp_path, monkeypatch):
    """r14 ADVICE: a bench_full.json whose sidecar_round marker does not
    match the round on disk must NOT displace BENCH_rN values in the
    delta comparator; a matching marker must."""
    import json as _json

    (tmp_path / "BENCH_r07.json").write_text(
        _json.dumps({"queries": {"q1": 2.0}, "calibration_s": 0.5})
    )

    def sidecar(round_marker):
        (tmp_path / "bench_full.json").write_text(
            _json.dumps(
                {
                    "sf": 0.1,
                    "sidecar_round": round_marker,
                    "queries": {"q1": 1.0},
                    "calibration_s": 0.25,
                }
            )
        )

    sidecar(7)  # quiet record of the round whose BENCH file is newest
    prev, prev_cal = bench._previous_round_timings(str(tmp_path), "0.1")
    assert prev["q1"] == 1.0 and prev_cal == 0.25
    sidecar(8)  # post-round quiet re-run: also the expected comparator
    prev, prev_cal = bench._previous_round_timings(str(tmp_path), "0.1")
    assert prev["q1"] == 1.0 and prev_cal == 0.25
    sidecar(3)  # stale/stray sidecar: BENCH_rN wins
    prev, prev_cal = bench._previous_round_timings(str(tmp_path), "0.1")
    assert prev["q1"] == 2.0 and prev_cal == 0.5
    sidecar(None)  # markerless (pre-r15) sidecar: BENCH_rN wins
    prev, prev_cal = bench._previous_round_timings(str(tmp_path), "0.1")
    assert prev["q1"] == 2.0 and prev_cal == 0.5


def test_calibration_mismatch_flag_on_contract_line():
    """r17 (verdict item 9): a >25% calibration gap vs the comparator run
    marks the contract line so PERF can discount raw deltas; a
    load-matched pair (or a missing comparator) does not."""
    def payload(cal, prev):
        return json.loads(
            bench._final_stdout_line(
                1.0, {"q": 1.0}, "0.1", 3, {}, [], [], {}, {}, {},
                calibration_s=cal, prev_calibration_s=prev,
            )
        )

    assert payload(0.479, 0.264)["calibration_mismatch"] is True  # the r16 case
    assert payload(0.432, 0.444)["calibration_mismatch"] is False
    assert payload(0.30, 0.44)["calibration_mismatch"] is True
    assert payload(0.44, None)["calibration_mismatch"] is False
    assert payload(None, 0.44)["calibration_mismatch"] is False
