"""Index snapshot / restore (ES snapshot-and-restore API analog).

The reference delegates durability to ES; this engine's index is a plain
directory tree (parquet + JSON metadata + segment generations), so a
snapshot is a CONSISTENT copy of that tree:

1. Read the segment listing FIRST, copy everything it references, then
   re-read it — if a concurrent ``add_segment`` / ``promote`` landed
   mid-copy, the listing differs and the copy retries (bounded). The
   manifest-before-data order means a snapshot never captures a
   half-written generation: a generation only appears in the listing
   after its files are fully committed (the builder's _SUCCESS
   discipline).
2. ``snapshot_meta.json`` records every file's (relpath, size) plus the
   generation count; ``restore`` verifies the inventory before declaring
   the restored tree usable and refuses to overwrite a non-empty target.

Driver-side file ops only — snapshots are an operational concern, not a
Spark job (on a real deployment the tree lives on S3/HDFS and the same
inventory-verify pattern applies over the object-store listing).
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _tree_inventory(root: str) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def _segment_listing(index_dir: str) -> list[str]:
    from gazetteer_search_spark.index import segments as segs

    return [str(s) for s in segs.list_segments(index_dir)]


def snapshot_index(
    index_dir: str, out_dir: str, max_retries: int = 3
) -> dict:
    """Copy the index tree to ``out_dir`` with a consistency check: the
    segment listing must be identical before and after the copy, else
    retry. Returns the snapshot metadata dict (also written to
    ``out_dir/snapshot_meta.json``)."""
    if not os.path.exists(os.path.join(index_dir, "index_meta.json")):
        raise ValueError(f"{index_dir} is not an index (no index_meta.json)")
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"snapshot target {out_dir} is not empty")
    last_err = "unknown"
    for _ in range(max_retries):
        before = _segment_listing(index_dir)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        shutil.copytree(index_dir, out_dir)
        after = _segment_listing(index_dir)
        if before == after:
            meta = {
                "created_at": time.time(),
                "source": os.path.abspath(index_dir),
                "generations": len(before) + 1,
                "files": _tree_inventory(out_dir),
            }
            with open(
                os.path.join(out_dir, "snapshot_meta.json"), "w"
            ) as f:
                json.dump(meta, f)
            return meta
        last_err = (
            f"segment listing changed during copy ({before} -> {after})"
        )
    raise RuntimeError(
        f"snapshot_index: no consistent copy after {max_retries} "
        f"attempts — {last_err}"
    )


def restore_snapshot(snap_dir: str, out_dir: str) -> dict:
    """Restore a snapshot into ``out_dir`` (must not exist or be empty)
    and VERIFY the file inventory against snapshot_meta.json — any
    missing or size-changed file fails the restore before a query ever
    touches it."""
    meta_path = os.path.join(snap_dir, "snapshot_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(f"{snap_dir} is not a snapshot (no snapshot_meta)")
    with open(meta_path) as f:
        meta = json.load(f)
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"restore target {out_dir} is not empty")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    shutil.copytree(snap_dir, out_dir)
    os.remove(os.path.join(out_dir, "snapshot_meta.json"))
    want = {tuple(x) for x in meta["files"]}
    want = {
        (p, s) for p, s in want if p != "snapshot_meta.json"
    }
    got = set(_tree_inventory(out_dir))
    missing = want - got
    if missing:
        raise RuntimeError(
            f"restore_snapshot: {len(missing)} files missing or "
            f"size-mismatched, e.g. {sorted(missing)[:3]}"
        )
    return {
        "restored_to": os.path.abspath(out_dir),
        "files": len(got),
        "generations": meta.get("generations"),
    }
