"""Iceberg-style table layout: snapshot metadata + manifest -> parquet files.

The north rule's corpus lives in "Iceberg tables"; this module gives the
engine Iceberg's *table semantics* — a self-describing metadata tree,
append-only snapshots, file-level manifests, snapshot time travel —
without the Iceberg runtime jars (not in this container).  Deviations
from the real spec are deliberate and documented:

* manifests are JSON, not Avro (no Avro reader here);
* one manifest file per snapshot (no manifest lists);
* field-id bookkeeping is carried but not enforced.

Layout:

    table/
      metadata/version-hint.text      # latest metadata version number
      metadata/v{N}.metadata.json     # schema, snapshots, current id
      metadata/snap-{id}.manifest.json# [{path, record_count, file_bytes}]
      data/part-*.parquet

The reader is plan-friendly: it resolves the snapshot's file list from
metadata alone (the footer-before-data discipline of the reference,
parquet_footer.rs) and hands Spark an explicit file list, so partition
pruning and predicate pushdown work exactly as on any parquet scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _read_version(table: str) -> int:
    with open(os.path.join(_meta_dir(table), "version-hint.text")) as f:
        return int(f.read().strip())


def _load_metadata(table: str, version: int | None = None) -> dict:
    v = version if version is not None else _read_version(table)
    with open(os.path.join(_meta_dir(table), f"v{v}.metadata.json")) as f:
        return json.load(f)


def _load_manifest(table: str, snapshot: dict) -> list[dict]:
    with open(os.path.join(table, snapshot["manifest"])) as f:
        return json.load(f)


def snapshots(table: str) -> list[dict]:
    """All snapshots, oldest first: {snapshot-id, timestamp-ms, manifest,
    summary}."""
    return _load_metadata(table)["snapshots"]


def read_table(spark, table: str, snapshot_id: int | None = None):
    """DataFrame over the table's current (or a historical) snapshot."""
    meta = _load_metadata(table)
    snap_id = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    snap = next((s for s in meta["snapshots"] if s["snapshot-id"] == snap_id), None)
    if snap is None:
        raise KeyError(f"snapshot {snap_id} not in {table} "
                       f"(have {[s['snapshot-id'] for s in meta['snapshots']]})")
    files = [os.path.join(table, e["path"]) for e in _load_manifest(table, snap)]
    if not files:
        return spark.createDataFrame([], meta["schema-ddl"])
    return spark.read.parquet(*files)


def write_table(df, table: str, mode: str = "append") -> dict:
    """Write df as a new snapshot (append = previous files + new ones)."""
    os.makedirs(_meta_dir(table), exist_ok=True)
    prev_meta = None
    try:
        prev_meta = _load_metadata(table)
    except FileNotFoundError:
        pass
    if prev_meta is not None and mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode}")

    data_rel = os.path.join("data", f"batch-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(os.path.join(table, data_rel))
    entries = []
    for fn in sorted(os.listdir(os.path.join(table, data_rel))):
        if fn.endswith(".parquet"):
            full = os.path.join(table, data_rel, fn)
            entries.append({
                "path": os.path.join(data_rel, fn),
                "file_bytes": os.path.getsize(full),
            })
    if prev_meta is not None and mode == "append":
        cur = next(s for s in prev_meta["snapshots"]
                   if s["snapshot-id"] == prev_meta["current-snapshot-id"])
        entries = _load_manifest(table, cur) + entries

    snap_id = int(time.time() * 1000) + len(prev_meta["snapshots"]) if prev_meta else 1
    manifest_rel = os.path.join("metadata", f"snap-{snap_id}.manifest.json")
    with open(os.path.join(table, manifest_rel), "w") as f:
        json.dump(entries, f)

    version = (_read_version(table) + 1) if prev_meta is not None else 1
    meta = {
        "format-version": "boltspark-iceberg-lite-1",
        "schema-ddl": df.schema.simpleString()[7:-1]
        if df.schema.simpleString().startswith("struct<") else df.schema.simpleString(),
        "schema-json": df.schema.json(),
        "current-snapshot-id": snap_id,
        "snapshots": (prev_meta["snapshots"] if prev_meta and mode == "append" else [])
        + [{
            "snapshot-id": snap_id,
            "timestamp-ms": int(time.time() * 1000),
            "manifest": manifest_rel,
            "summary": {"operation": mode, "added-files": len(entries)},
        }],
    }
    with open(os.path.join(_meta_dir(table), f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(_meta_dir(table), "version-hint.text"), "w") as f:
        f.write(str(version))
    return meta
