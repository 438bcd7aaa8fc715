"""Ledger classification: the evidence book must match the driver's
record semantics (hash-green vs the sanctioned rows-only vs red)."""

import json

import ledger


def test_entry_status_classes():
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 8550, "oracle_rows": None, "err": "no_oracle"}
    failed_rows_only = {"rows_match": None, "spark_rows": None, "err": "no_oracle"}
    hash_red = {"rows_match": True, "schema_match": True, "hash_match": False,
                "spark_rows": 5, "oracle_rows": 5, "err": None}
    errored = {"rows_match": None, "spark_rows": None, "err": "Boom"}
    assert ledger.entry_status(green) == "green"
    assert ledger.entry_status(rows_only) == "rows_only"
    assert ledger.entry_status(failed_rows_only) == "red"
    assert ledger.entry_status(hash_red) == "red"
    assert ledger.entry_status(errored) == "red"


def test_build_ledger_tracks_green_and_rows_only_separately(tmp_path):
    r1 = {"q": {"rows_match": None, "spark_rows": 3, "err": "no_oracle"}}
    r2 = {"q": {"rows_match": True, "hash_match": True, "spark_rows": 3,
                "oracle_rows": 3, "err": None},
          "p": {"rows_match": True, "hash_match": False, "spark_rows": 3,
                "oracle_rows": 3, "err": None}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    book = ledger.build_ledger(str(tmp_path))
    assert book["q"]["last_rows_only"] == 1
    assert book["q"]["last_green"] == 2
    assert book["p"]["last_green"] is None
    assert book["p"]["statuses"] == {2: "red"}


def test_ledger_matches_checked_in_book():
    """The real book: the never-hash-green residue can only shrink from
    the three entries sanctioned as of r9 (drivernet_permutation clears
    once its r10 golden-oracle pass lands; methylmix_states is rows-only
    by design and combat_adjust is formally superseded, so both stay)."""
    book = ledger.build_ledger()
    never_green = {n for n, row in book.items() if row["last_green"] is None}
    assert never_green <= {"combat_adjust", "drivernet_permutation", "methylmix_states"}
    assert {"combat_adjust", "methylmix_states"} <= never_green


def test_closed_rows_are_registered_and_excluded_from_residues():
    """The formally-closed set must stay consistent: every CLOSED name is
    a registered query (a stale closure for a delisted query is noise),
    and closures only cover queries with a standing richer sibling
    (supersession) or sanctioned rows-only evidence — the two the r10
    verdict named plus the three r11-verdict-item-5 supersession
    closures.  Every supersession closure must additionally have real
    driver hash-green history (a closure may retire a PROVEN query from
    rotation, never hide an unproven one)."""
    assert set(ledger.CLOSED) == {
        "combat_adjust",
        "methylmix_states",
        "text_token_count",
        "text_quality",
        "dedup_fingerprint",
    }
    names = set(ledger.registered_names())
    assert set(ledger.CLOSED) <= names
    book = ledger.build_ledger()
    for name in ("text_token_count", "text_quality", "dedup_fingerprint"):
        assert book[name]["last_green"] is not None, name


def test_bench_stdout_line_fits_tail_capture():
    """The driver's tail capture is 2000 chars; r4 AND r11 both lost
    their round's timings when the stdout JSON outgrew it.  Build the
    WORST-CASE stdout payload (every headline + slow-tier query timed
    at 5 digits, loads populated, a couple of errors) and assert it
    stays under bench.STDOUT_BYTE_BUDGET — so growing the slow tier can
    never silently re-break the driver's perf record."""
    import bench

    timings = {n: 123.456 for n in bench.HEADLINE}
    slow = {n: 123.456 for n in bench.SLOW_TIER}
    spreads = {n: 12.34 for n in [*bench.HEADLINE, *bench.SLOW_TIER]}
    slow_load = {n: 12.34 for n in bench.SLOW_TIER}
    errors = {bench.HEADLINE[0]: "E" * 300, bench.SLOW_TIER[0]: "E" * 300}
    payload = bench._stdout_payload(
        9999.999, timings, "0.1", 5, slow,
        [99.99, 99.99, 99.99], [99.99, 99.99, 99.99],
        spreads, slow_load, errors,
    )
    line = json.dumps(payload)
    # two long errors blow the naive budget; main() degrades by blanking
    # error text — assert the DEGRADED form fits, and the no-error form
    # fits outright
    degraded = json.dumps(
        bench._stdout_payload(
            9999.999, timings, "0.1", 5, slow,
            [99.99] * 3, [99.99] * 3, spreads, slow_load,
            {k: "" for k in errors},
        )
    )
    clean = json.dumps(
        bench._stdout_payload(
            9999.999, timings, "0.1", 5, slow,
            [99.99] * 3, [99.99] * 3, spreads, slow_load, {},
        )
    )
    assert len(clean) < bench.STDOUT_BYTE_BUDGET, len(clean)
    assert len(degraded) < bench.STDOUT_BYTE_BUDGET, len(degraded)
    # and the driver contract fields are all present on the line
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in payload, key
    assert len(payload["queries"]) == len(bench.HEADLINE)
    assert line  # the raw form exists even when over budget (main degrades)
