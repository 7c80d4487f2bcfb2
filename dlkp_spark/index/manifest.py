"""Checkpointed segment manifests — the engine's resumability layer.

Behavioral analog of the reference's checkpoint detect/resume
(`/root/reference/src/dlkp/extraction/train_eval_kp_tagger.py:61-77`:
``get_last_checkpoint`` + resume): every index-build shard commits a
manifest JSON after its parquet output is atomically renamed into place;
a restarted build skips shards whose manifest exists and whose config hash
matches. Manifests also carry per-partition lineage and metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

On a real deployment these parquet datasets + manifests map 1:1 onto an
Iceberg table (manifests → Iceberg snapshots/manifest lists); Iceberg jars
are not in this environment, so the layout is file-based but the contract
(atomic commit, lineage, resume) is the same.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any


def config_hash(cfg: Any) -> str:
    return hashlib.blake2b(repr(cfg).encode(), digest_size=8).hexdigest()


def commit_dataset(tmp_dir: str, final_dir: str) -> None:
    """THE commit point for a dataset directory: staged output → visible.

    All index writers stage their parquet under a ``_tmp``/``._tmp`` path
    and make it visible through this single function, so swapping the
    commit mechanism swaps it everywhere:

    - here (POSIX local fs): ``os.replace`` — atomic rename; readers see
      either the old dataset or the new one, never a partial write.
    - Iceberg deployment (the north-star layout): replace the body with a
      catalog snapshot commit (``table.newOverwrite()...commit()`` /
      ``df.writeTo(tbl).overwritePartitions()``) — same contract: the
      snapshot pointer swap is the atomic commit, staged data files are
      invisible until it lands.
    - object stores without atomic rename (S3): write to a new prefix and
      commit via the manifest pointer (write_shard_manifest is already the
      source of truth for what is committed — completed_shards ignores
      data not referenced by a manifest).
    """
    import shutil

    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    os.replace(tmp_dir, final_dir)


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifests")


def shard_manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"shard_{shard:05d}.json")


def write_shard_manifest(index_dir: str, shard: int, payload: dict) -> None:
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = shard_manifest_path(index_dir, shard)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic commit


def read_shard_manifest(index_dir: str, shard: int) -> dict | None:
    path = shard_manifest_path(index_dir, shard)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def completed_shards(index_dir: str, cfg_hash: str) -> set[int]:
    """Shards with a committed manifest matching this build config."""
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.startswith("shard_") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            if m.get("config_hash") == cfg_hash and m.get("status") == "committed":
                done.add(int(m["shard"]))
    return done


def write_global(index_dir: str, name: str, payload: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_global(index_dir: str, name: str) -> dict | None:
    path = os.path.join(index_dir, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
