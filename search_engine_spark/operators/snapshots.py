"""Snapshot / manifest layer: Iceberg-semantics commits over plain parquet.

SURVEY.md §7.4 item 4 calls for Iceberg table commits (every index
mutation = a snapshot; checkpoint rows record snapshot ids; time travel
and rollback for free). This sandbox has no Iceberg jars, so this module
implements the same *design* natively, exploiting the one property
Iceberg itself relies on: **data files are immutable once written**
(Spark's parquet committer always writes fresh part-files; "overwrite"
unlinks, never edits in place). The mapping:

- Iceberg *manifest / metadata.json*  →  ``snapshots/v{N}/manifest.json``
  (operation, parent id, per-family file list with sizes).
- Iceberg *snapshot data-file reuse*  →  **hardlinks**: a snapshot links
  every live data file into ``snapshots/v{N}/<family>/…`` — zero bytes
  copied, and a later overwrite of the live family only drops the live
  link; the snapshot keeps the inode alive.
- Iceberg *atomic pointer swap*       →  ``snapshots/CURRENT`` written
  via tmp-file + ``os.replace`` (atomic on POSIX).
- Iceberg *time travel*               →  the snapshot tree mirrors the
  index layout, so readers (``SearchEngine.at_snapshot``,
  ``read_snapshot_tables``) just root at ``snapshots/v{N}``.
- Iceberg *rollback*                  →  relink the snapshot's trees over
  the live families, then commit a new snapshot recording the rollback
  (history stays linear and auditable, like Iceberg's
  ``rollback_to_snapshot`` which never erases history).
- Iceberg *expire_snapshots*          →  ``expire_snapshots`` (deleting a
  snapshot dir drops its links; inodes free when the last link dies).

Snapshots capture every top-level non-hidden entry of the index dir
(docs/postings/filters/conv_offsets/lemma_stats/doc_stats AND the
checkpoints/lineage/metrics state tables — lineage rows are refreshed by
upserts, so a point-in-time restore must carry them too). Derived caches
(``.cache_*``) and transient swap dirs (``.old_*``) are hidden and
excluded. At 100 TB this layer is exactly what Iceberg does: manifests
list files, commits swap one pointer, and no snapshot or rollback ever
moves data. Reference analog: the reference has no versioning at all —
re-indexing destroys the previous state (IndexingServiceImpl.java:173-193
clearDataByUrlList); this is the durability layer it lacks.

Crash safety: a snapshot builds in ``snapshots/.tmp_v{N}`` and is
``os.rename``d into place before CURRENT moves — a crash leaves either
the old CURRENT (tmp dir is garbage-collected on the next snapshot) or
the new one, never a half-visible snapshot. ``rollback`` re-run after a
crash converges (families are re-linked from the intact snapshot tree).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from datetime import datetime, timezone


def _snap_root(index_dir: str) -> str:
    return os.path.join(index_dir, "snapshots")


def _current_path(index_dir: str) -> str:
    return os.path.join(_snap_root(index_dir), "CURRENT")


def snapshot_dir(index_dir: str, snapshot_id: int) -> str:
    return os.path.join(_snap_root(index_dir), f"v{int(snapshot_id)}")


def current_snapshot_id(index_dir: str) -> int | None:
    """The committed snapshot the CURRENT pointer names (None = never
    snapshotted)."""
    try:
        with open(_current_path(index_dir)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _write_current(index_dir: str, snapshot_id: int) -> None:
    tmp = _current_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(int(snapshot_id)))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _current_path(index_dir))


def _live_families(index_dir: str) -> list[str]:
    return sorted(
        e
        for e in os.listdir(index_dir)
        if not e.startswith(".") and e != "snapshots"
    )


def _link_tree(src: str, dst: str) -> list[dict]:
    """Hardlink every file under ``src`` into the same relative position
    under ``dst``; returns the manifest file list. Hidden committer
    sidecars (``.…crc``) are linked too — they are immutable together
    with their part-file, and a restored tree must keep them paired or
    LocalFS checksum reads would fail."""
    entries: list[dict] = []
    for root, _dirs, fnames in os.walk(src):
        rel_root = os.path.relpath(root, src)
        out_root = dst if rel_root == "." else os.path.join(dst, rel_root)
        os.makedirs(out_root, exist_ok=True)
        for fn in sorted(fnames):
            sp = os.path.join(root, fn)
            os.link(sp, os.path.join(out_root, fn))
            rel = fn if rel_root == "." else os.path.join(rel_root, fn)
            if not fn.startswith("."):
                entries.append({"path": rel, "bytes": os.path.getsize(sp)})
    return entries


def create_snapshot(
    index_dir: str, operation: str = "commit", run_id: str | None = None
) -> dict:
    """Commit the current live state as snapshot v{parent+1} and move
    CURRENT to it. Zero data copied (hardlinks). Returns the manifest."""
    index_dir = index_dir.rstrip("/")
    root = _snap_root(index_dir)
    os.makedirs(root, exist_ok=True)
    for stale in glob.glob(os.path.join(root, ".tmp_v*")):
        shutil.rmtree(stale, ignore_errors=True)
    parent = current_snapshot_id(index_dir)
    sid = (parent or 0) + 1
    tmp = os.path.join(root, f".tmp_v{sid}")
    families: dict[str, list[dict]] = {}
    for fam in _live_families(index_dir):
        src = os.path.join(index_dir, fam)
        if os.path.isdir(src):
            families[fam] = _link_tree(src, os.path.join(tmp, fam))
        else:  # defensive: a loose file at the top level
            os.makedirs(tmp, exist_ok=True)
            os.link(src, os.path.join(tmp, fam))
            families[fam] = [{"path": fam, "bytes": os.path.getsize(src)}]
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": operation,
        "run_id": run_id,
        "created_at": datetime.now(timezone.utc).isoformat(),
        "families": families,
        "n_files": sum(len(v) for v in families.values()),
        "total_bytes": sum(e["bytes"] for v in families.values() for e in v),
    }
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, snapshot_dir(index_dir, sid))
    _write_current(index_dir, sid)
    return manifest


def read_manifest(index_dir: str, snapshot_id: int) -> dict:
    with open(os.path.join(snapshot_dir(index_dir, snapshot_id),
                           "manifest.json")) as f:
        return json.load(f)


def list_snapshots(index_dir: str) -> list[dict]:
    """All retained manifests, oldest → newest (the history log)."""
    out = []
    for d in glob.glob(os.path.join(_snap_root(index_dir), "v*")):
        base = os.path.basename(d)
        try:
            sid = int(base[1:])
        except ValueError:
            continue
        out.append(read_manifest(index_dir, sid))
    return sorted(out, key=lambda m: m["snapshot_id"])


def read_snapshot_tables(spark, index_dir: str, snapshot_id: int) -> dict:
    """Time-travel read: every parquet family of the snapshot as a
    DataFrame (same keys as ``IndexBuildJob.tables()`` where present)."""
    manifest = read_manifest(index_dir, snapshot_id)
    sdir = snapshot_dir(index_dir, snapshot_id)
    return {
        fam: spark.read.parquet(os.path.join(sdir, fam))
        for fam, files in manifest["families"].items()
        if any(e["path"].endswith(".parquet") for e in files)
    }


def snapshot_diff(
    spark, index_dir: str, from_id: int, to_id: int | None = None
) -> dict:
    """Incremental (CDC) read between two snapshots of the docs family:
    ``{"inserted", "updated", "deleted"}`` DataFrames.

    The Iceberg incremental-scan idea: manifests NAME the data files, so
    the diff reads only the part-files that are new in ``to`` (rewritten
    buckets rewrite every part-file name — the committer always writes
    fresh uuids) plus a bucket-PRUNED read of the from-side for the
    update/delete compare. No full-table scan on either side, at any
    scale: cost is O(changed buckets), not O(index).

    - inserted: rows whose doc_id exceeds from's max (upsert appends
      inserts past the max — operators/upsert.py id pin);
    - updated: same doc_id, text changed (the per-turn content of
      record) — rewritten-but-identical rows of a rebuilt bucket are
      NOT reported;
    - deleted: doc_ids present in from's rewritten buckets but absent
      from to's.
    """
    from pyspark.sql import functions as F

    index_dir = index_dir.rstrip("/")
    if to_id is None:
        to_id = current_snapshot_id(index_dir)
        if to_id is None:
            raise ValueError("index has no snapshots")
    m_from = read_manifest(index_dir, from_id)
    m_to = read_manifest(index_dir, to_id)
    files_from = {
        e["path"] for e in m_from["families"].get("docs", ())
        if e["path"].endswith(".parquet")
    }
    files_to = {
        e["path"] for e in m_to["families"].get("docs", ())
        if e["path"].endswith(".parquet")
    }
    new_paths = sorted(files_to - files_from)
    docs_from_dir = os.path.join(snapshot_dir(index_dir, from_id), "docs")
    docs_to_dir = os.path.join(snapshot_dir(index_dir, to_id), "docs")
    empty = spark.read.parquet(docs_to_dir).limit(0)
    if not new_paths:
        return {"inserted": empty, "updated": empty,
                "deleted": empty.select("doc_id", "conv_id", "turn_idx")}
    max_from = (
        spark.read.parquet(docs_from_dir).agg(F.max("doc_id")).head()[0]
        or 0
    )
    # basePath keeps the bucket partition column when reading file paths
    new_rows = (
        spark.read.option("basePath", docs_to_dir)
        .parquet(*[os.path.join(docs_to_dir, p) for p in new_paths])
    )
    inserted = new_rows.filter(F.col("doc_id") > max_from)
    buckets = sorted(
        {int(p.split("/")[0].split("=")[1]) for p in new_paths if "/" in p}
    )
    # partition-pruned from-side: only the rewritten buckets are read
    old_side = spark.read.parquet(docs_from_dir).filter(
        F.col("bucket").isin(buckets)
    )
    candidates = new_rows.filter(F.col("doc_id") <= max_from)
    updated = (
        candidates.alias("n")
        .join(
            old_side.select(
                "doc_id", F.col("text").alias("_old_text")
            ),
            "doc_id",
        )
        .filter(~F.col("text").eqNullSafe(F.col("_old_text")))
        .drop("_old_text")
    )
    to_side_ids = (
        spark.read.parquet(docs_to_dir)
        .filter(F.col("bucket").isin(buckets))
        .select("doc_id")
    )
    deleted = old_side.select("doc_id", "conv_id", "turn_idx").join(
        to_side_ids, "doc_id", "left_anti"
    )
    return {"inserted": inserted, "updated": updated, "deleted": deleted}


def rollback(index_dir: str, snapshot_id: int) -> dict:
    """Restore the live index to ``snapshot_id``'s state, then commit the
    restored state as a NEW snapshot (operation records the source — the
    pointer only ever moves forward, like Iceberg rollback). Families
    created after the target snapshot are removed; derived ``.cache_*``
    views belong to the abandoned epoch and are dropped. Idempotent under
    crash-rerun: families re-link from the intact snapshot tree."""
    index_dir = index_dir.rstrip("/")
    sdir = snapshot_dir(index_dir, snapshot_id)
    manifest = read_manifest(index_dir, snapshot_id)
    snap_fams = set(manifest["families"])
    for fam in sorted(snap_fams | set(_live_families(index_dir))):
        live = os.path.join(index_dir, fam)
        old = os.path.join(index_dir, f".rollback_old_{fam}")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(live):
            os.rename(live, old)
        if fam in snap_fams:
            src = os.path.join(sdir, fam)
            if os.path.isdir(src):
                _link_tree(src, live)
            else:
                os.link(src, live)
        shutil.rmtree(old, ignore_errors=True)
    for cache in glob.glob(os.path.join(index_dir, ".cache_*")):
        shutil.rmtree(cache, ignore_errors=True)
    return create_snapshot(
        index_dir, operation=f"rollback(to=v{int(snapshot_id)})"
    )


def expire_snapshots(index_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (CURRENT is always
    kept). Returns the expired ids. Disk frees as the last hardlink to
    each superseded data file disappears."""
    cur = current_snapshot_id(index_dir)
    ids = [m["snapshot_id"] for m in list_snapshots(index_dir)]
    keep = set(ids[-max(int(keep_last), 1):])
    if cur is not None:
        keep.add(cur)
    expired = []
    for sid in ids:
        if sid in keep:
            continue
        shutil.rmtree(snapshot_dir(index_dir, sid), ignore_errors=True)
        expired.append(sid)
    return expired
