"""Snapshot inspection + pointer recovery — the operator workflow the
commit units' damage-matrix errors point at but (pre-r16) left manual.

Every refuse-loudly path in :mod:`.sinks` ends with an instruction like
"restore CURRENT to the newest complete version/manifest".  Doing that
by hand means listing the store, parsing manifests, checking every
referenced bucket dir exists, and writing the pointer — each step an
opportunity to restore to an INCOMPLETE generation (a pre-flip crash
leftover), which would surface later as missing rows.  This module is
that workflow as code:

- :func:`snapshot_lineage` — read-only report: layout, pointer state,
  every generation on disk with a completeness verdict, and the newest
  COMPLETE generation (the only safe restore target).
- :func:`restore_current` — write the pointer back, with the guardrails
  the by-hand workflow lacks: refuses when CURRENT is already healthy
  (unless ``force=True`` — rolling back a healthy snapshot is a
  different, deliberate operation), refuses an incomplete or unknown
  target, and flips through the store's conditional put so a writer
  racing the recovery loses loudly (the exact ABA window the r16
  posix token hardening closes).

Completeness is defined by what readers need, per layout:

- bucketed: the manifest parses AND every referenced bucket dir exists
  (an empty bucket map is complete — a fully-tombstoned snapshot);
- full-rewrite: the version dir exists with data.

The reference has no snapshot machinery at all (one-shot writes —
integrative_omics/gizmos.py); north-star operational surface.
"""

from __future__ import annotations

import json

from .commitstore import ABSENT, SnapshotStore, as_store
from .sinks import _MANIFEST_PREFIX, _batch_digits, _pointer


def _manifest_complete(store: SnapshotStore, name: str) -> "tuple[bool, str]":
    got = store.get_text(name)
    if got is None:
        return False, "manifest object missing"
    try:
        man = json.loads(got[0])
    except ValueError:
        return False, "manifest unparseable"
    if not isinstance(man, dict):
        # valid JSON but not an object ('null', '[]', a bare number —
        # truncation/corruption shapes): damaged, not a crash (this
        # module's whole purpose is diagnosing damaged snapshots)
        return False, "manifest unparseable (non-object JSON)"
    missing = [
        rel for rel in man.get("buckets", {}).values()
        if not store.exists_prefix(rel)
    ]
    if missing:
        return False, f"referenced bucket dirs missing: {sorted(missing)[:3]}"
    return True, "complete"


def snapshot_lineage(snapshot_dir: "str | SnapshotStore") -> dict:
    """Read-only lineage report over a snapshot directory/store.

    Returns ``{"layout", "current", "current_complete", "generations":
    [{"name", "batch_id", "complete", "detail"}...] (newest first),
    "newest_complete"}``.  ``layout`` is ``"bucketed"`` when manifests
    exist, ``"full"`` when only version dirs do, ``"empty"`` when
    neither.  Never writes; safe on a live snapshot (a racing commit
    may add a generation mid-listing — the report is a snapshot in
    time, which is all an operator diagnosing a damaged pointer
    needs)."""
    store = as_store(snapshot_dir)
    names = store.list_names()
    manifests = sorted(
        (
            n for n in names
            if n.startswith(_MANIFEST_PREFIX) and n.endswith(".json")
        ),
        reverse=True,
    )
    cur, _ = _pointer(store)
    gens: "list[dict]" = []
    if manifests:
        layout = "bucketed"
        for name in manifests:
            ok, detail = _manifest_complete(store, name)
            gens.append(
                {
                    "name": name,
                    "batch_id": _batch_digits(name),
                    "complete": ok,
                    "detail": detail,
                }
            )
    else:
        # versions listed only on the non-bucketed path — on an object
        # store every exists_prefix is a LIST round-trip, wasted when
        # manifests already decided the layout (r16 review finding)
        versions = sorted(
            (n for n in names if n.startswith("v") and store.exists_prefix(n)),
            reverse=True,
        )
        if not versions:
            layout = "empty"
        else:
            for name in versions:
                # a version dir can be a pre-flip crash's PARTIAL write;
                # Spark's _SUCCESS marker (written at job completion, on
                # by default) is the completeness signal a dir-exists
                # check lacks.  (A deployment that disabled the marker
                # reads as incomplete here — restore with an explicit
                # name after verifying by hand, or re-enable the marker.)
                children = store.list_names(name)
                bucketed_data = any(c.startswith("__bucket=") for c in children)
                if bucketed_data:
                    # __bucket= children mean this snapshot was BUCKETED
                    # and every manifest was lost: the version dir alone
                    # is NOT restorable — CURRENT must name a manifest,
                    # and pointing it at a dir would leave readers with
                    # "manifest is missing" (r16 review finding: this
                    # state previously misclassified as a healthy full
                    # layout and 'restored' to an unusable pointer)
                    ok, detail = False, (
                        "bucket-partitioned version dir whose m*.json "
                        "manifests are all missing — a bucketed snapshot "
                        "cannot be restored without a manifest; "
                        "reconstruct one from the bucket map or re-seed"
                    )
                else:
                    ok = "_SUCCESS" in children
                    detail = (
                        "version dir with _SUCCESS marker"
                        if ok
                        else "version dir without _SUCCESS marker "
                        "(partial write, or markers disabled)"
                    )
                gens.append(
                    {
                        "name": name,
                        "batch_id": _batch_digits(name),
                        "complete": ok,
                        "detail": detail,
                    }
                )
            layout = (
                "bucketed"
                if any("bucket-partitioned" in g["detail"] for g in gens)
                else "full"
            )
    complete_names = [g["name"] for g in gens if g["complete"]]
    cur_complete = cur in complete_names if cur is not None else False
    return {
        "layout": layout,
        "current": cur,
        "current_complete": cur_complete,
        "generations": gens,
        "newest_complete": complete_names[0] if complete_names else None,
    }


def restore_current(
    snapshot_dir: "str | SnapshotStore",
    name: "str | None" = None,
    force: bool = False,
) -> str:
    """Repoint CURRENT at a COMPLETE generation — the recovery step the
    commit units' "restore CURRENT to the newest complete
    version/manifest" errors instruct.  ``name=None`` targets the
    newest complete generation; an explicit ``name`` must itself be
    complete (restoring to a pre-flip crash leftover would read back
    partial data — refused).  When CURRENT already names a complete
    generation the snapshot is NOT damaged and the restore is refused
    unless ``force=True`` (an explicit rollback — note that commits
    after a rollback will be refused as stale until the stream resumes
    from a batch_id above the rolled-back-to one, which is the safe
    default for an operation that rewrites history).  Returns the
    restored name.  The flip is a conditional put on the generation
    read at entry, so a concurrent writer racing the recovery loses
    loudly instead of having its commit silently overwritten."""
    store = as_store(snapshot_dir)
    report = snapshot_lineage(store)
    if report["layout"] == "empty":
        raise FileNotFoundError(
            f"nothing to restore under {store.describe()!r}: no manifests "
            "or version dirs on disk"
        )
    if report["current_complete"] and not force:
        raise RuntimeError(
            f"CURRENT under {store.describe()!r} already names the "
            f"complete generation {report['current']!r} — the snapshot is "
            "not damaged; pass force=True only for a deliberate rollback"
        )
    target = name if name is not None else report["newest_complete"]
    if target is None:
        raise RuntimeError(
            f"no COMPLETE generation under {store.describe()!r} to restore "
            f"to — every candidate is damaged: {report['generations']}"
        )
    verdicts = {g["name"]: g for g in report["generations"]}
    if target not in verdicts:
        raise FileNotFoundError(
            f"generation {target!r} not found under {store.describe()!r}; "
            f"known: {sorted(verdicts)}"
        )
    if not verdicts[target]["complete"]:
        raise RuntimeError(
            f"refusing to restore CURRENT to INCOMPLETE generation "
            f"{target!r} under {store.describe()!r} "
            f"({verdicts[target]['detail']}) — a pre-flip crash leftover "
            "would read back partial data; pick a complete generation "
            "from snapshot_lineage()"
        )
    got = store.get_text("CURRENT")
    # missing pointer → create-only (a pointer created meanwhile means
    # a live writer; overwriting it would drop that commit — lose
    # loudly instead); damaged-but-present pointer → conditional
    # replace on the generation just read, same reasoning
    expect = got[1] if got is not None else ABSENT
    store.put_text("CURRENT", target, expect=expect)
    return target
