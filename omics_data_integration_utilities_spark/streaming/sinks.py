"""Streaming sinks: the write-side conventions the streaming entry
points leave to callers (north-star surface; the reference is strictly
batch — its sinks are plain CSV/SQLite writes,
/root/reference/integrative_omics/gizmos.py's to_csv/to_sql call sites).

Two production shapes:

- :func:`start_parquet_append_sink` — the plain durable feed archive:
  append-mode parquet files + checkpoint, the downstream input for every
  batch recount/verify job in this engine (the Lambda split the
  heavy-hitter and dedup docstrings describe needs the archived feed).

- :func:`start_upsert_sink` — streaming MERGE: each micro-batch upserts
  into a parquet SNAPSHOT via ``operators.joins.upsert_snapshot``
  (anti-join + union — no Delta/Iceberg machinery).  The snapshot is a
  VERSIONED directory with an atomically swapped ``CURRENT`` pointer
  file (the manifest pattern): each batch writes a full new version dir,
  then one ``os.replace`` flips the pointer.  Crash-safe at every
  boundary — a crash before the flip leaves ``CURRENT`` on the previous
  complete version, and Structured Streaming's replay of the
  uncommitted batch re-derives the same next version from it (upsert of
  the same rows is idempotent per key); a replayed ALREADY-committed
  batch merges its rows into a snapshot that already contains them —
  also a no-op.  Readers resolve through :func:`read_snapshot` and only
  ever see a complete version.  (A naive rename-the-live-dir-aside swap
  has a crash window in which the whole snapshot silently disappears —
  found in review and replaced by this layout.)

Scale shape: the upsert's anti-join builds from the micro-batch (small
side) so the snapshot is scanned, never shuffled; snapshot rewrite cost
is O(snapshot + batch) per trigger for the full-rewrite form — the
correct small/medium shape.  The 100 TB shape is
:func:`start_bucketed_upsert_sink` (r13 verdict item 2): version dirs
partitioned by key-hash bucket, a batch rewrites ONLY the buckets it
touches, untouched buckets carry by reference through an atomically
swapped manifest — per-commit cost is O(touched-bucket data + batch),
never O(snapshot) (probe_r14_bucketedupsert16x.py: bytes written per
commit are ~touched/n_buckets of the snapshot at every scale, ~25× less
with 2/64 buckets touched).  Identical MERGE semantics, parity-tested.
One previous version/manifest is retained per flip so in-flight readers
of the superseded generation finish their scan; older generations are
pruned.

CDC apply (r14): :func:`start_cdc_sink` extends both layouts with
DELETE tombstones — each micro-batch carries an op column of
``upsert``/``delete`` rows and commits both in one version flip (one
anti-join drops replaced AND deleted rows, upserts union back: the same
single-shuffle bound as plain MERGE).  This is the right-to-be-forgotten
half a training-data snapshot needs; same-key mixed ops within one
unordered micro-batch are refused loudly rather than applied in an
undefined order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.joins import upsert_snapshot

_CURRENT = "CURRENT"


def _current_version(snapshot_dir: str) -> str | None:
    ptr = os.path.join(snapshot_dir, _CURRENT)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return name or None


def read_snapshot(
    spark: SparkSession, snapshot_dir: str, version: "str | None" = None
) -> DataFrame:
    """Resolve the snapshot's CURRENT pointer and read that version —
    the reader half of :func:`start_upsert_sink`'s manifest contract.

    ``version`` (e.g. ``"v000000000003"``) time-travels to a RETAINED
    previous version instead — the audit/debug read over the
    ``keep_versions`` horizon; a pruned or never-committed version
    raises FileNotFoundError rather than returning an empty relation."""
    cur = version or _current_version(snapshot_dir)
    if cur is None:
        raise FileNotFoundError(
            f"no CURRENT snapshot version under {snapshot_dir!r} "
            "(no batch committed yet?)"
        )
    path = os.path.join(snapshot_dir, cur)
    if version is not None and not os.path.isdir(path):
        raise FileNotFoundError(
            f"snapshot version {version!r} not on disk under "
            f"{snapshot_dir!r} — pruned past keep_versions, or never "
            "committed"
        )
    return spark.read.parquet(path)


def start_parquet_append_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Append-mode parquet archive with checkpointing — the durable feed
    copy batch verifiers recount against.  Returns the started query."""
    writer = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_upsert_sink(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: "list[str]",
    trigger_once: bool = False,
    keep_versions: int = 2,
) -> StreamingQuery:
    """Streaming MERGE into a versioned parquet snapshot: per
    micro-batch, rows replace same-key snapshot rows, new keys insert,
    untouched rows carry (``upsert_snapshot`` semantics).  The batch is
    deduped to one row per key first (which duplicate survives is
    arbitrary under micro-batch semantics — feed a deterministic update
    stream, or pre-aggregate, when per-key ordering matters).

    Consumers read via :func:`read_snapshot`; the newest
    ``keep_versions`` version dirs are retained per flip, so a reader's
    lazy scan survives ``keep_versions - 1`` further commits — raise it
    for long-running readers over a fast-flipping snapshot.  See the
    module docstring for the pointer-swap crash-safety argument;
    ``upsert_batch_into_snapshot`` is the per-batch unit (exposed for
    direct use and tests)."""
    spark = stream.sparkSession
    _require_driver_local(snapshot_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_snapshot(
            spark, batch_df, snapshot_dir, key_cols, batch_id,
            keep_versions=keep_versions,
        )

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _require_driver_local(snapshot_dir: str) -> None:
    """The pointer/prune half of the manifest runs through the DRIVER's
    local filesystem (open/os.replace/shutil) while the data half goes
    through Spark — so the snapshot dir must be a plain driver-visible
    posix path (single-box, or a shared NFS-style mount on a cluster).
    An object-store URI needs a manifest-object swap instead (same
    pattern, different primitive) — refuse it loudly up front rather
    than dying mid-batch on open('s3a://...')."""
    from urllib.parse import urlparse

    scheme = urlparse(snapshot_dir).scheme
    if scheme not in ("", "file"):
        raise ValueError(
            f"start_upsert_sink needs a driver-local (or shared-posix) "
            f"snapshot path; got scheme {scheme!r} in {snapshot_dir!r} — "
            "object stores need a manifest-object swap, not a file rename"
        )


def _flip_pointer(snapshot_dir: str, name: str) -> None:
    """Durably flip CURRENT to ``name``: fsync the tmp file before the
    atomic ``os.replace``, fsync the directory after — a power loss
    can't leave a durable-but-empty CURRENT."""
    tmp_ptr = os.path.join(snapshot_dir, _CURRENT + ".tmp")
    with open(tmp_ptr, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, os.path.join(snapshot_dir, _CURRENT))  # atomic flip
    dir_fd = os.open(snapshot_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)  # make the rename itself durable
    finally:
        os.close(dir_fd)


def _prune_versions(snapshot_dir: str, keep_versions: int) -> None:
    """Retention for the full-rewrite layout: the newest keep_versions
    version dirs stay (an in-flight reader survives keep_versions - 1
    further flips)."""
    versions = sorted(
        (n for n in os.listdir(snapshot_dir) if n.startswith("v")), reverse=True
    )
    for name in versions[max(2, int(keep_versions)):]:
        shutil.rmtree(os.path.join(snapshot_dir, name), ignore_errors=True)


def _refuse_stale_batch(
    cur_name: "str | None", batch_id: int, snapshot_dir: str
) -> None:
    """A batch_id BELOW the committed one can only mean a stream
    restarted against an existing snapshot with a FRESH checkpoint
    (batch ids are monotone per checkpoint).  Proceeding would be
    destructive twice over: mode("overwrite") clobbers a version dir
    that kept manifests still reference, and retention then prunes the
    just-flipped name as lexicographically old, leaving CURRENT
    dangling.  Refuse loudly — resume from the original checkpoint, or
    point the new checkpoint lineage at a NEW snapshot dir."""
    if cur_name is None:
        return
    digits = "".join(c for c in cur_name if c.isdigit())
    if digits and int(batch_id) < int(digits):
        raise RuntimeError(
            f"snapshot at {snapshot_dir!r} is at commit {int(digits)} but "
            f"this stream delivered batch_id={int(batch_id)} — a fresh "
            "checkpoint against an existing snapshot; resume from the "
            "original checkpoint or use a new snapshot dir for the new "
            "lineage"
        )


def upsert_batch_into_snapshot(
    spark: SparkSession,
    batch_df: DataFrame,
    snapshot_dir: str,
    key_cols: "list[str]",
    batch_id: int,
    keep_versions: int = 2,
) -> None:
    """One MERGE commit: read CURRENT, upsert the batch, write the next
    version dir, durably flip the pointer, prune old versions.

    Replay/crash matrix (version name is a pure function of batch_id):

    - CURRENT already names this batch's version → the flip committed
      before the crash; the replay is a NO-OP (reading + overwriting the
      same dir would otherwise wedge the stream on a self-overwrite).
    - version dir exists but CURRENT doesn't name it → pre-flip crash
      leftover; mode("overwrite") rewrites it from the still-current
      base.
    - CURRENT missing/empty while OTHER version dirs exist → a damaged
      pointer (the one state that must not be silently treated as an
      empty snapshot: merging this batch alone and pruning would destroy
      the accumulated state) → raise for operator intervention.

    The pointer write fsyncs the tmp file before the atomic
    ``os.replace`` and fsyncs the directory after, so a power loss
    can't leave a durable-but-empty CURRENT."""
    _require_driver_local(snapshot_dir)
    new_version = f"v{int(batch_id):012d}"
    cur = _current_version(snapshot_dir)
    if cur == new_version:
        return  # replayed already-committed batch: flip already happened
    _refuse_stale_batch(cur, batch_id, snapshot_dir)
    if cur is None and os.path.isdir(snapshot_dir):
        others = [
            n for n in os.listdir(snapshot_dir)
            if n.startswith("v") and n != new_version
        ]
        if others:
            raise RuntimeError(
                f"snapshot at {snapshot_dir!r} has version dirs {others} "
                "but no CURRENT pointer — refusing to reset the snapshot "
                "to a single batch; restore CURRENT to the newest complete "
                "version"
            )
    batch = batch_df.dropDuplicates(key_cols)
    if cur is not None:
        target = spark.read.parquet(os.path.join(snapshot_dir, cur))
        merged = upsert_snapshot(target, batch, key_cols)
    else:
        merged = batch
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, new_version))
    _flip_pointer(snapshot_dir, new_version)
    _prune_versions(snapshot_dir, keep_versions)


# ---------------------------------------------------------------------------
# Bucketed upsert snapshot (r13 verdict item 2): the 100 TB shape the
# full-rewrite sink's docstring promises.  Version dirs are partitioned
# by key-hash bucket and a batch rewrites ONLY the buckets it touches;
# untouched buckets carry by reference through a manifest, so per-batch
# rewrite cost is O(touched-bucket data + batch), never O(snapshot).
# ---------------------------------------------------------------------------

_MANIFEST_PREFIX = "m"


def _bucket_expr(key_cols: "list[str]", n_buckets: int):
    from pyspark.sql import functions as F

    return F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(int(n_buckets))
    )


def _current_manifest(snapshot_dir: str) -> "dict | None":
    """Resolve CURRENT → manifest JSON (the bucketed snapshot's pointer
    names a manifest file instead of a version dir)."""
    import json

    name = _current_version(snapshot_dir)
    if name is None:
        return None
    with open(os.path.join(snapshot_dir, name)) as f:
        return json.load(f)


def read_bucketed_snapshot(
    spark: SparkSession, snapshot_dir: str, manifest: "str | None" = None
) -> DataFrame:
    """Reader half of :func:`start_bucketed_upsert_sink`: resolve the
    CURRENT manifest and union-read the per-bucket dirs it references.
    A manifest only ever names COMPLETE bucket dirs (the flip happens
    after the data write), so readers never see a partial bucket.

    ``manifest`` (e.g. ``"m000000000003.json"``) time-travels to a
    RETAINED previous manifest — referenced bucket dirs are kept alive
    by the reference-counted retention for the ``keep_versions``
    newest manifests."""
    import json

    if manifest is not None:
        man_path = os.path.join(snapshot_dir, manifest)
        if not os.path.isfile(man_path):
            raise FileNotFoundError(
                f"manifest {manifest!r} not on disk under "
                f"{snapshot_dir!r} — pruned past keep_versions, or never "
                "committed"
            )
        with open(man_path) as f:
            man = json.load(f)
    else:
        man = _current_manifest(snapshot_dir)
    if man is None:
        raise FileNotFoundError(
            f"no CURRENT manifest under {snapshot_dir!r} "
            "(no batch committed yet?)"
        )
    paths = sorted({p for p in man["buckets"].values()})
    if not paths:
        # a CDC commit can legitimately empty the snapshot (every key
        # tombstoned) — the manifest then references zero bucket dirs
        # and there is no schema left on disk to infer an empty relation
        # from; say so, instead of Spark's UNABLE_TO_INFER_SCHEMA
        raise FileNotFoundError(
            f"bucketed snapshot at {snapshot_dir!r} is EMPTY (manifest "
            f"{man.get('batch_id')} references no buckets — every row "
            "deleted); there is no schema to produce an empty relation "
            "from"
        )
    return spark.read.parquet(*[os.path.join(snapshot_dir, p) for p in paths])


def start_bucketed_upsert_sink(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: "list[str]",
    n_buckets: int = 16,
    trigger_once: bool = False,
    keep_versions: int = 2,
) -> StreamingQuery:
    """:func:`start_upsert_sink` with bucketed version dirs — identical
    MERGE semantics (parity-tested), different layout: each micro-batch
    rewrites only the key-hash buckets it touches.  Size ``n_buckets``
    so one bucket's data fits a comfortable rewrite unit (O(100 MB–1 GB)
    at scale — the dedup-index guidance); the bucket count is fixed at
    snapshot creation and enforced on every later commit."""
    spark = stream.sparkSession
    _require_driver_local(snapshot_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_bucketed_snapshot(
            spark, batch_df, snapshot_dir, key_cols, batch_id,
            n_buckets=n_buckets, keep_versions=keep_versions,
        )

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_batch_into_bucketed_snapshot(
    spark: SparkSession,
    batch_df: DataFrame,
    snapshot_dir: str,
    key_cols: "list[str]",
    batch_id: int,
    n_buckets: int = 16,
    keep_versions: int = 2,
) -> None:
    """One bucketed MERGE commit: bucket the batch by key hash, read
    ONLY the touched buckets' current data, upsert, write one
    ``v{batch}/__bucket=B/`` dir per touched bucket (a single
    partitionBy job), then atomically flip CURRENT to a new manifest
    that repoints the touched buckets and carries every untouched
    bucket's existing dir by reference.

    Crash/replay matrix (manifest + version names are pure functions of
    batch_id — same argument as :func:`upsert_batch_into_snapshot`):

    - CURRENT names this batch's manifest → committed; replay NO-OPs.
    - version dir / manifest file exist but CURRENT wasn't flipped →
      pre-flip crash leftovers; both are rewritten from the still-
      current base (mode overwrite + tmp/os.replace).
    - CURRENT missing while manifests or version dirs exist → damaged
      pointer; raise rather than silently resetting the snapshot.

    The bucket function is ``pmod(xxhash64(keys), n_buckets)`` —
    deterministic in the keys, so a key's rows land in the same bucket
    in every batch; ``n_buckets`` is pinned in the manifest and a
    mismatched commit is refused (a different modulus would strand
    same-key rows across buckets and break the per-bucket merge)."""
    upserts = batch_df.dropDuplicates(key_cols)
    _bucketed_commit(
        spark, snapshot_dir, key_cols, batch_id, n_buckets, keep_versions,
        upserts, delete_keys=None,
    )


def _bucketed_commit(
    spark: SparkSession,
    snapshot_dir: str,
    key_cols: "list[str]",
    batch_id: int,
    n_buckets: int,
    keep_versions: int,
    upserts: DataFrame,
    delete_keys: "DataFrame | None",
) -> None:
    """The shared bucketed commit engine behind the upsert and CDC
    forms: touched buckets come from upsert ∪ delete keys, ONE anti-join
    drops both replaced and deleted rows from the touched buckets' data,
    upserts union back, one partitionBy job writes the touched buckets,
    and the manifest repoints them — DROPPING any touched bucket the
    commit emptied (a delete-only bucket with nothing left writes no
    subdir and must vanish from the bucket map, not dangle)."""
    import json

    _require_driver_local(snapshot_dir)
    version = f"v{int(batch_id):012d}"
    manifest_name = f"{_MANIFEST_PREFIX}{int(batch_id):012d}.json"
    cur_name = _current_version(snapshot_dir)
    if cur_name == manifest_name:
        return  # replayed already-committed batch
    _refuse_stale_batch(cur_name, batch_id, snapshot_dir)
    cur = _current_manifest(snapshot_dir)
    if cur is None and os.path.isdir(snapshot_dir):
        leftovers = [
            n for n in os.listdir(snapshot_dir)
            if (n.startswith("v") and n != version)
            or (n.startswith(_MANIFEST_PREFIX) and n.endswith(".json")
                and n != manifest_name)
        ]
        if leftovers:
            raise RuntimeError(
                f"bucketed snapshot at {snapshot_dir!r} has {leftovers} "
                "but no CURRENT pointer — refusing to reset the snapshot "
                "to a single batch; restore CURRENT to the newest "
                "complete manifest"
            )
    if cur is not None and int(cur["n_buckets"]) != int(n_buckets):
        raise ValueError(
            f"bucketed snapshot at {snapshot_dir!r} was created with "
            f"n_buckets={cur['n_buckets']}, got {n_buckets} — the bucket "
            "count is fixed for the snapshot's lifetime"
        )
    bucket = _bucket_expr(key_cols, n_buckets)
    all_keys = upserts.select(*key_cols)
    if delete_keys is not None:
        all_keys = all_keys.unionByName(delete_keys.select(*key_cols))
    all_keys = all_keys.dropDuplicates(key_cols)
    touched = sorted(
        r["__bucket"]
        for r in all_keys.select(bucket.alias("__bucket")).distinct().collect()
    )
    old_buckets: "dict[str, str]" = dict(cur["buckets"]) if cur else {}
    written: "set[int]" = set()
    if touched:
        up_b = upserts.withColumn("__bucket", bucket)
        target_paths = sorted(
            {old_buckets[str(b)] for b in touched if str(b) in old_buckets}
        )
        if target_paths:
            target = spark.read.parquet(
                *[os.path.join(snapshot_dir, p) for p in target_paths]
            ).withColumn("__bucket", bucket)  # same pure function of keys
            # one anti-join drops BOTH replaced and deleted rows
            merged = target.join(all_keys, key_cols, "left_anti").unionByName(
                up_b
            )
        else:
            merged = up_b
        # ONE job writes every surviving touched bucket:
        # v{batch}/__bucket=B/...
        merged.write.mode("overwrite").partitionBy("__bucket").parquet(
            os.path.join(snapshot_dir, version)
        )
        vdir = os.path.join(snapshot_dir, version)
        written = {
            int(n.split("=", 1)[1])
            for n in os.listdir(vdir)
            if n.startswith("__bucket=")
        }
    new_buckets = dict(old_buckets)
    for b in touched:
        if b in written:
            new_buckets[str(b)] = f"{version}/__bucket={b}"
        else:
            # the commit emptied this bucket (delete-only, nothing left)
            new_buckets.pop(str(b), None)
    manifest = {
        "batch_id": int(batch_id),
        "n_buckets": int(n_buckets),
        "buckets": new_buckets,
    }
    os.makedirs(snapshot_dir, exist_ok=True)
    tmp_man = os.path.join(snapshot_dir, manifest_name + ".tmp")
    with open(tmp_man, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_man, os.path.join(snapshot_dir, manifest_name))
    _flip_pointer(snapshot_dir, manifest_name)
    # retention: keep the newest keep_versions manifests; a version dir
    # survives while ANY kept manifest references one of its buckets
    # (untouched buckets keep old version dirs alive by reference — the
    # in-flight-reader guarantee is per MANIFEST, same as the
    # full-rewrite sink's per-version one)
    keep = max(2, int(keep_versions))
    manifests = sorted(
        (
            n for n in os.listdir(snapshot_dir)
            if n.startswith(_MANIFEST_PREFIX) and n.endswith(".json")
        ),
        reverse=True,
    )
    kept, pruned_manifests = manifests[:keep], manifests[keep:]
    referenced: "set[str]" = set()
    for name in kept:
        with open(os.path.join(snapshot_dir, name)) as f:
            for rel in json.load(f)["buckets"].values():
                referenced.add(rel.split("/", 1)[0])
    for name in pruned_manifests:
        os.remove(os.path.join(snapshot_dir, name))
    for n in os.listdir(snapshot_dir):
        if n.startswith("v") and os.path.isdir(
            os.path.join(snapshot_dir, n)
        ) and n not in referenced:
            shutil.rmtree(os.path.join(snapshot_dir, n), ignore_errors=True)


# ---------------------------------------------------------------------------
# CDC apply (r14): upsert + DELETE tombstones in one commit — the
# "right to be forgotten" half a real training-data snapshot needs that
# plain MERGE-upsert can't express.  Same crash/replay matrix as the
# upsert sinks (version/manifest names are pure functions of batch_id).
# ---------------------------------------------------------------------------

CDC_UPSERT = "upsert"
CDC_DELETE = "delete"


def _split_cdc(batch_df: DataFrame, key_cols: "list[str]", op_col: str):
    """Validate and split a CDC batch: one op per key per batch (a key
    carrying BOTH an upsert and a delete in one micro-batch has no
    defined order — refused loudly), ops restricted to
    upsert/delete.  Returns (upserts_without_op_col, delete_keys)."""
    from pyspark.sql import functions as F

    # ONE validation job per micro-batch (this sits on the streaming hot
    # path): per-key op sets folded into (all distinct ops, max ops per
    # key) — an empty batch yields ([], NULL) and validates clean
    row = (
        batch_df.groupBy(*key_cols)
        .agg(F.collect_set(F.col(op_col)).alias("__ops"))
        .agg(
            F.array_distinct(F.flatten(F.collect_list("__ops"))).alias(
                "__all_ops"
            ),
            F.max(F.size("__ops")).alias("__max_ops"),
        )
        .collect()[0]
    )
    bad = [o for o in (row["__all_ops"] or []) if o not in (CDC_UPSERT, CDC_DELETE)]
    if bad:
        raise ValueError(
            f"CDC batch has unknown ops {bad!r} in column {op_col!r} — "
            f"allowed: {CDC_UPSERT!r}, {CDC_DELETE!r}"
        )
    if (row["__max_ops"] or 0) > 1:
        raise ValueError(
            "CDC batch carries BOTH an upsert and a delete for the same "
            "key — micro-batches are unordered, so apply order would be "
            "undefined; resolve per key upstream (keep the latest op)"
        )
    upserts = (
        batch_df.where(F.col(op_col) == CDC_UPSERT)
        .drop(op_col)
        .dropDuplicates(key_cols)
    )
    deletes = (
        batch_df.where(F.col(op_col) == CDC_DELETE)
        .select(*key_cols)
        .dropDuplicates(key_cols)
    )
    return upserts, deletes


def apply_cdc_batch_into_snapshot(
    spark: SparkSession,
    batch_df: DataFrame,
    snapshot_dir: str,
    key_cols: "list[str]",
    batch_id: int,
    op_col: str = "op",
    keep_versions: int = 2,
) -> None:
    """One CDC commit into the full-rewrite snapshot: delete-key rows
    vanish, upsert rows replace/insert, untouched rows carry.  Exactly
    :func:`upsert_batch_into_snapshot`'s commit/replay/crash contract
    (a CDC batch with no deletes is bit-identical to an upsert batch);
    deleting an absent key is a no-op by anti-join semantics."""
    _require_driver_local(snapshot_dir)
    new_version = f"v{int(batch_id):012d}"
    cur = _current_version(snapshot_dir)
    if cur == new_version:
        return  # replayed already-committed batch
    _refuse_stale_batch(cur, batch_id, snapshot_dir)
    if cur is None and os.path.isdir(snapshot_dir):
        others = [
            n for n in os.listdir(snapshot_dir)
            if n.startswith("v") and n != new_version
        ]
        if others:
            raise RuntimeError(
                f"snapshot at {snapshot_dir!r} has version dirs {others} "
                "but no CURRENT pointer — refusing to reset the snapshot; "
                "restore CURRENT to the newest complete version"
            )
    upserts, deletes = _split_cdc(batch_df, key_cols, op_col)
    if cur is not None:
        target = spark.read.parquet(os.path.join(snapshot_dir, cur))
        # one anti-join drops BOTH delete targets and to-be-replaced
        # rows (delete keys ∪ upsert keys), then upserts union back —
        # the same single-shuffle bound as the plain MERGE
        all_keys = deletes.unionByName(
            upserts.select(*key_cols)
        ).dropDuplicates(key_cols)
        merged = target.join(all_keys, key_cols, "left_anti").unionByName(
            upserts
        )
    else:
        merged = upserts
    merged.write.mode("overwrite").parquet(
        os.path.join(snapshot_dir, new_version)
    )
    _flip_pointer(snapshot_dir, new_version)
    _prune_versions(snapshot_dir, keep_versions)


def apply_cdc_batch_into_bucketed_snapshot(
    spark: SparkSession,
    batch_df: DataFrame,
    snapshot_dir: str,
    key_cols: "list[str]",
    batch_id: int,
    op_col: str = "op",
    n_buckets: int = 16,
    keep_versions: int = 2,
) -> None:
    """CDC commit into the bucketed snapshot: touched buckets come from
    upsert ∪ delete keys and only those rewrite — per-commit cost stays
    O(touched-bucket data + batch) with deletes in the mix.  A bucket
    the commit empties (delete-only, nothing survives) is DROPPED from
    the manifest, not left dangling.  Same crash/replay matrix and
    n_buckets pin as :func:`upsert_batch_into_bucketed_snapshot`."""
    upserts, deletes = _split_cdc(batch_df, key_cols, op_col)
    _bucketed_commit(
        spark, snapshot_dir, key_cols, batch_id, n_buckets, keep_versions,
        upserts, delete_keys=deletes,
    )


def start_cdc_sink(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: "list[str]",
    op_col: str = "op",
    n_buckets: "int | None" = None,
    trigger_once: bool = False,
    keep_versions: int = 2,
) -> StreamingQuery:
    """Streaming CDC apply: each micro-batch carries an ``op_col`` of
    ``upsert``/``delete`` rows and commits both in ONE version flip —
    the tombstone half (right-to-be-forgotten removals, retraction
    feeds) that plain MERGE-upsert can't express.  ``n_buckets=None``
    uses the full-rewrite layout (read via :func:`read_snapshot`);
    an int uses the bucketed layout (read via
    :func:`read_bucketed_snapshot`).  Idempotent under replay exactly
    like the upsert sinks: version/manifest names are pure functions of
    batch_id."""
    spark = stream.sparkSession
    _require_driver_local(snapshot_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if n_buckets is None:
            apply_cdc_batch_into_snapshot(
                spark, batch_df, snapshot_dir, key_cols, batch_id,
                op_col=op_col, keep_versions=keep_versions,
            )
        else:
            apply_cdc_batch_into_bucketed_snapshot(
                spark, batch_df, snapshot_dir, key_cols, batch_id,
                op_col=op_col, n_buckets=int(n_buckets),
                keep_versions=keep_versions,
            )

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
