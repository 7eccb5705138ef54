"""Disk cache for the heavy SLAM integration fixtures.

A fixture's full SLAM run is deterministic given (package source, test
config, test module) — re-running an unchanged suite costs real minutes
per fixture on one CPU. Cache each run's outcome on disk keyed by a
hash of the package source tree + the fixture config + the test module
source; ANY change to any of those re-runs the fixture from scratch
(VERDICT r2 item 6: "cache fixture results across tests" — the warm
suite restores results, a cold/post-change suite recomputes).

The SLAM object itself is restored through the project's own
checkpoint machinery (slam/checkpoint.py + system.resume_from), so a
warm suite also exercises the save/load round-trip. Auxiliary
picklables (results dicts, spy counters) ride in aux.pkl.

Set MIPS_FIXTURE_CACHE=0 to force recomputation.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import pickle
import shutil

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(_ROOT, ".pytest_slam_cache")


# Package modules that can NEVER affect a fixture's SLAM-run numerics
# (no cached_run compute() touches meshing, mesh evaluation, or the
# image/trajectory logger — those run per-test on the restored object).
# Excluding them from the key means a mesher/logger edit does not
# re-run every multi-minute SLAM fixture cold (VERDICT r4 item 5).
_KEY_EXCLUDE = (
    os.path.join("mipsfusion_tpu", "mesher") + os.sep,
    os.path.join("mipsfusion_tpu", "eval", "recon.py"),
    os.path.join("mipsfusion_tpu", "slam", "logger.py"),
)


def _source_hash(extra_files=()):
    h = hashlib.sha256()
    paths = sorted(glob.glob(os.path.join(_ROOT, "mipsfusion_tpu", "**",
                                          "*.py"), recursive=True))
    paths = [p for p in paths
             if not any(os.path.relpath(p, _ROOT).startswith(e) or
                        os.path.relpath(p, _ROOT) == e
                        for e in _KEY_EXCLUDE)]
    # this module defines the cache format: changing it invalidates
    paths.append(os.path.abspath(__file__))
    for p in list(paths) + list(extra_files):
        h.update(os.path.relpath(p, _ROOT).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h


def cache_key(tag, cfg, extra_files=(), extra_key=""):
    h = _source_hash(extra_files)
    h.update(tag.encode())
    h.update(extra_key.encode())
    h.update(json.dumps(cfg, sort_keys=True, default=str).encode())
    return h.hexdigest()[:24]


def cached_run(tag, cfg, make_slam, compute, extra_files=(), extra_key=""):
    """Run (or restore) an expensive SLAM fixture.

    make_slam() -> a fresh, un-run MIPSFusionTPU.
    compute(slam) -> aux dict (picklable) after driving the run.

    Returns (slam, aux). On a cache hit the slam is rebuilt by
    make_slam() and restored from the cached checkpoint; on a miss
    compute() runs and its outcome is cached for next time.
    """
    if os.environ.get("MIPS_FIXTURE_CACHE", "1") == "0":
        slam = make_slam()
        return slam, compute(slam)

    key = cache_key(tag, cfg, extra_files, extra_key)
    entry = os.path.join(CACHE_DIR, f"{tag}-{key}")
    ckpt_dir = os.path.join(entry, "ckpt")
    aux_path = os.path.join(entry, "aux.pkl")

    if os.path.exists(aux_path):
        slam = make_slam()
        slam.resume_from(ckpt_dir)
        with open(aux_path, "rb") as f:
            saved = pickle.load(f)
        slam.optim_cur = saved["_optim_cur"]
        slam.track_losses = saved.get("_track_losses", [])
        return slam, saved["aux"]

    slam = make_slam()
    aux = compute(slam)

    # drop stale entries for this tag before writing the new one
    for old in glob.glob(os.path.join(CACHE_DIR, f"{tag}-*")):
        shutil.rmtree(old, ignore_errors=True)
    os.makedirs(entry, exist_ok=True)
    from mipsfusion_tpu.slam.checkpoint import save_ckpt
    save_ckpt(ckpt_dir, slam.state, slam.submap_params,
              extra={"active_id": slam.active_id},
              opt_state=slam.map_opt_state)
    with open(aux_path + ".tmp", "wb") as f:
        pickle.dump({"aux": aux, "_optim_cur": bool(slam.optim_cur),
                     "_track_losses": [float(x) for x in
                                       slam.track_losses]}, f)
    os.replace(aux_path + ".tmp", aux_path)
    return slam, aux
