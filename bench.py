"""Benchmark: tracked FPS of the full SLAM loop on TPU.

Four profiles, ONE JSON line (run one standalone with --only):

  * steady state, fast profile (configs/synthetic/orbit_fast.yaml:
    4 RO iters x 1024 particles x 192 px; 8 GO iters x 512 rays x 39
    z-samples; BA every 3 frames, 8 iters x 1424 rays) — the operating
    point; ATE-validated against the full-budget run (BASELINE.md).
  * steady state at the reference's compute budgets
    (configs/synthetic/orbit.yaml: 5x2000x384 RO, 10x1000x75 GO,
    15x2600x75 BA — /root/reference/configs/FastCaMo-synth budgets).
  * multi-submap WHOLE-SYSTEM profile (configs/synthetic/outback_fast):
    200-frame out-and-back trajectory whose timed window contains msg3
    new-submap inits (500-iter fits) and the organic switch-back (ICP
    rectification + switch BA + PGO) — the frames the steady-state
    window excludes (VERDICT r2 item 2). Reported: amortized FPS + ATE
    from an unsynced pass, per-frame latency percentiles + the worst
    switch frame from a synced pass (each synced frame pays the remote
    tunnel's ~RTT once — reported raw), and final meshing wall time.
  * scale-envelope profile (configs/synthetic/snake_fast.yaml): the
    reference's regime — 600 frames, localMLP_num: 20, many submaps,
    organic switch-backs both ways — with the manager keyframe stage
    timed against the live submap count (superlinear growth would show
    here first).

The fast/full profiles also report per-stage DEVICE time
(`stage_device_times`: stages dispatched back-to-back, one block at the
end, tunnel RTT amortized out) so chip-perf claims decouple from
tunnel-weather wall-clock spread.

"value" is the fast-profile steady FPS; vs_baseline is value / 30 fps
(the north-star target in BASELINE.json — the reference publishes no
numbers of its own).
"""

import json
import os
import time

from mipsfusion_tpu.compile_cache import enable_compile_cache
enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from mipsfusion_tpu.config import load_config  # noqa: E402
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset  # noqa: E402
from mipsfusion_tpu.slam.system import MIPSFusionTPU  # noqa: E402

N_WARM = 16     # a full keyframe cycle: covers every jit shape
                # (track, BA, keyframe add, manager predicates)
N_BENCH = 30    # timed steady-state frames per repeat
N_REPEAT = 3    # timed windows per profile (median reported — the
                # remote-tunnel session variance is ~1.5x, VERDICT r3 #6)


def _stats(xs):
    xs = sorted(xs)
    return {"median": xs[len(xs) // 2] if len(xs) % 2 else
            0.5 * (xs[len(xs) // 2 - 1] + xs[len(xs) // 2]),
            "min": xs[0], "max": xs[-1]}


def run_profile(cfg_path: str):
    cfg = load_config(cfg_path)
    cfg["data"]["output"] = None
    n_frames = N_WARM + N_REPEAT * N_BENCH + 1
    ds = SyntheticDataset(cfg, n_frames=n_frames, trajectory="orbit",
                          span=n_frames / 400.0)
    # pre-render all frames on device so data generation is off the clock
    for i in range(n_frames):
        ds.packed(i)

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    # warm pass: a FULL drive of the sequence on a throwaway instance
    # charges every program variant (incl. manager decisions that first
    # occur deep into the sequence — a 16-frame warm-up left
    # first-occurrence compile/cache-load hiccups inside the timed
    # windows); the timed instance then reuses the in-process programs
    warm = MIPSFusionTPU(cfg, dataset=ds)
    for i in range(n_frames):
        warm.process_frame(frame(i), i)
    jax.block_until_ready(warm.state.est_c2w)

    slam = MIPSFusionTPU(cfg, dataset=ds)
    slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
    for i in range(1, N_WARM + 1):
        slam.process_frame(frame(i), i)
    jax.block_until_ready(slam.state.est_c2w)

    # N_REPEAT consecutive timed windows of the steady state
    fps_list = []
    i0 = N_WARM + 1
    for _rep in range(N_REPEAT):
        t0 = time.perf_counter()
        for i in range(i0, i0 + N_BENCH):
            slam.process_frame(frame(i), i)
        jax.block_until_ready(slam.state.est_c2w)
        fps_list.append(N_BENCH / (time.perf_counter() - t0))
        i0 += N_BENCH

    ate = slam.evaluate(i0 - 1)["absolute_translational_error.rmse"]
    return _stats(fps_list), ate


def stage_device_times(cfg_path: str, reps: int = 30, overrides=None):
    """Per-stage device time, decoupled from tunnel weather (VERDICT r4
    item 9): each jitted stage is dispatched `reps` times back-to-back
    with ONE block at the end, so the remote tunnel's per-sync RTT
    amortizes to ~0 and the quotient is the stage's device compute
    (tools/profile_stages.py methodology). Reported alongside the
    wall-clock FPS so chip-performance claims survive the 1.5-2x
    session-to-session wall-clock spread."""
    import jax.numpy as jnp

    from mipsfusion_tpu.slam import tracker
    from mipsfusion_tpu.slam.system import _get_ba_step

    cfg = load_config(cfg_path)
    cfg["data"]["output"] = None
    if overrides:
        from mipsfusion_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, overrides)
    n_warm = 17
    ds = SyntheticDataset(cfg, n_frames=n_warm + 1, trajectory="orbit",
                          span=(n_warm + 1) / 400.0)
    for i in range(n_warm + 1):
        ds.packed(i)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    slam.first_frame_mapping({"frame_id": 0, "c2w": ds.gt_pose(0)},
                             slam.mcfg.first_iters)
    for i in range(1, n_warm):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    jax.block_until_ready(slam.state.est_c2w)

    st, packed = slam.state, ds.packed(n_warm)
    params = slam.submap_params[slam.active_id]

    def timeit(fn):
        jax.block_until_ready(fn(0))
        t0 = time.perf_counter()
        out = None
        for r in range(reps):
            out = fn(r)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    def track_var(n_ro, n_go):
        def fn(r):
            return tracker.track_frame(
                params, slam.fcfg_track, slam.consts, slam.rcfg, slam.gcfg,
                slam.pst, jax.random.PRNGKey(r), packed[..., 3:6],
                packed[..., 6], packed[..., :3], st.est_c2w,
                jnp.asarray(n_warm - 1), jnp.asarray(True), slam.lw,
                n_ro, n_go)
        return fn

    step = _get_ba_step(
        slam.fcfg, slam.mcfg, slam.lw,
        slam._round_rays(slam.mcfg.sample + slam.mcfg.pixels_cur),
        slam._ray_sharding)
    cur_rays = packed.reshape(-1, 7)

    def ba_fn(r):
        _, p2, _ = step(st, params, slam.map_opt_state, cur_rays,
                        n_warm - 1, slam.consts, slam._ba_key,
                        slam._kf_frames_dev)
        return p2

    t_ro = timeit(track_var(slam.rcfg.n_iters, 0))
    t_go = timeit(track_var(0, slam.gcfg.n_iters))
    t_track = timeit(track_var(slam.rcfg.n_iters, slam.gcfg.n_iters))
    t_ba = timeit(ba_fn)
    amort = t_track + t_ba / slam.map_every
    return {"ro_ms": round(t_ro, 2), "go_ms": round(t_go, 2),
            "track_ms": round(t_track, 2), "ba_ms": round(t_ba, 2),
            "steady_frame_ms": round(amort, 2),
            "device_fps": round(1e3 / amort, 2)}


def _build_outback(cfg_path: str):
    cfg = load_config(cfg_path)
    cfg["data"]["output"] = None
    n = cfg["synthetic"]["n_frames"]
    traj = cfg["synthetic"].get("trajectory", "outback")
    ds = SyntheticDataset(cfg, n_frames=n, trajectory=traj, span=1.0)
    for i in range(n):
        ds.packed(i)
    return cfg, ds, n


def _drive(cfg, ds, n, synced: bool):
    """One full outback run. Returns (slam, per-frame ms, event frames,
    total wall s)."""
    slam = MIPSFusionTPU(cfg, dataset=ds)
    events = {"new": [], "back": []}
    orig_new = slam.active_submap_switch_new
    orig_back = slam.active_submap_switch

    def spy_new(frame, i, kf_id):
        events["new"].append(i)
        return orig_new(frame, i, kf_id)

    def spy_back(frame, i, kf_id):
        events["back"].append(i)
        return orig_back(frame, i, kf_id)

    slam.active_submap_switch_new = spy_new
    slam.active_submap_switch = spy_back

    def frame(i):
        return {"frame_id": i, "c2w": ds.gt_pose(i)}

    per_ms = np.zeros(n)
    events["wait_armed"], events["wait_matured"] = [], []
    mgr = getattr(slam, "manager", None)
    was_wait = False
    t_all = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        slam.process_frame(frame(i), i)
        if synced:
            jax.block_until_ready(slam.state.est_c2w)
        per_ms[i] = (time.perf_counter() - t0) * 1e3
        # organic wait-loop arming/maturing (ref Manager.py:494-518):
        # arm = case 5.2 (re-entry whose overlap verify failed), mature
        # = a later keyframe's wait-loop verify succeeding -> switch
        if mgr is not None:
            if mgr.wait_loop and not was_wait:
                events["wait_armed"].append(i)
            if was_wait and not mgr.wait_loop and \
                    events["back"] and events["back"][-1] == i:
                events["wait_matured"].append(i)
            was_wait = mgr.wait_loop
    jax.block_until_ready(slam.state.est_c2w)
    total_s = time.perf_counter() - t_all
    return slam, per_ms, events, total_s


def run_multisubmap(cfg_path: str):
    cfg, ds, n = _build_outback(cfg_path)

    # pass 1 (warm): charge every jit variant incl. the switch-back
    # machinery (ICP, switch BA, PGO) to the compile caches
    _drive(cfg, ds, n, synced=False)
    # timed unsynced passes (xN_REPEAT): amortized whole-system FPS
    fps_list, ate_list, backs_list = [], [], []
    for _rep in range(N_REPEAT):
        slam, _, events, total_s = _drive(cfg, ds, n, synced=False)
        fps_list.append((n - 1) / total_s)
        ate_list.append(float(slam.evaluate(n - 1)[
            "absolute_translational_error.rmse"]))
        backs_list.append(len(events["back"]))
    fps_stats = _stats(fps_list)
    ate_stats = _stats(ate_list)
    fps, ate = fps_stats["median"], ate_stats["median"]
    n_submaps = int(np.asarray(slam.state.localMLP_info[:, 0]).sum())
    # pass 3 (synced): per-frame latency distribution (each frame pays
    # one tunnel RTT; switch/init frames dwarf it)
    slam3, per_ms, ev3, _ = _drive(cfg, ds, n, synced=True)
    switch_frames = sorted(ev3["new"] + ev3["back"])
    switch_ms = float(max((per_ms[i] for i in switch_frames), default=0.0))
    new_ms = float(max((per_ms[i] for i in ev3["new"]), default=0.0))
    back_ms = float(max((per_ms[i] for i in ev3["back"]), default=0.0))

    t0 = time.perf_counter()
    verts, faces, _ = slam3.extract_mesh()
    mesh_s = time.perf_counter() - t0

    from mipsfusion_tpu.eval.recon import evaluate_synthetic_mesh
    mesh_metrics = evaluate_synthetic_mesh(slam3, n_gt_samples=20000,
                                           verts=verts)

    return {
        "multi_submap_fps": round(fps, 3),
        "multi_submap_fps_min": round(fps_stats["min"], 3),
        "multi_submap_fps_max": round(fps_stats["max"], 3),
        "multi_submap_ate_rmse_m": round(float(ate), 5),
        "multi_submap_ate_min_m": round(ate_stats["min"], 5),
        "multi_submap_ate_max_m": round(ate_stats["max"], 5),
        "n_submaps": n_submaps,
        "n_switch_backs": int(sorted(backs_list)[len(backs_list) // 2]),
        "n_switch_backs_list": backs_list,
        "p50_frame_ms": round(float(np.percentile(per_ms, 50)), 2),
        "p99_frame_ms": round(float(np.percentile(per_ms, 99)), 2),
        "switch_frame_ms": round(switch_ms, 2),
        "switch_new_frame_ms": round(new_ms, 2),
        "switch_back_frame_ms": round(back_ms, 2),
        "mesh_wall_s": round(mesh_s, 2),
        "mesh_accuracy_m": round(mesh_metrics["mesh_accuracy_m"], 4),
        "mesh_completion@5cm": round(mesh_metrics["mesh_completion@5cm"],
                                     4),
    }


def run_scale_envelope(cfg_path: str):
    """Scale-envelope profile (VERDICT r4 item 4): the reference's
    regime — hundreds of frames, many submaps at localMLP_num: 20
    capacity (ref configs/FastCaMo-large/floor1.yaml:8), multiple
    organic switch-backs — on the snake serpentine scene. One warm pass,
    one timed unsynced pass (amortized FPS + ATE), one synced pass that
    times the manager keyframe stage per call, tagged with the live
    submap count, to check the decision engine does not grow
    superlinearly with M (top-3 exclusion + fixed-capacity tables should
    make it ~flat)."""
    cfg, ds, n = _build_outback(cfg_path)
    _drive(cfg, ds, n, synced=False)                     # warm
    slam, _, events, total_s = _drive(cfg, ds, n, synced=False)
    fps = (n - 1) / total_s
    ate = float(slam.evaluate(n - 1)["absolute_translational_error.rmse"])
    n_submaps = int(np.asarray(slam.state.localMLP_info[:, 0]).sum())

    # synced pass: per-keyframe manager stage time vs submap count
    slam3 = MIPSFusionTPU(cfg, dataset=ds)
    mgr_ms, mgr_m = [], []
    orig_pk = slam3.manager.process_keyframe

    def timed_pk(st, depth, direction, pose, i, kf_id, force=False):
        jax.block_until_ready(st.est_c2w)
        t0 = time.perf_counter()
        out = orig_pk(st, depth, direction, pose, i, kf_id, force=force)
        jax.block_until_ready(out[0].est_c2w)
        mgr_ms.append((time.perf_counter() - t0) * 1e3)
        mgr_m.append(int(np.asarray(out[0].localMLP_info[:, 0]).sum()))
        return out

    slam3.manager.process_keyframe = timed_pk
    for i in range(n):
        slam3.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    mgr_ms_arr, mgr_m_arr = np.asarray(mgr_ms), np.asarray(mgr_m)
    lo, hi = mgr_m_arr <= 3, mgr_m_arr >= max(4, mgr_m_arr.max() - 2)
    return {
        "scale_n_frames": n,
        "scale_fps": round(fps, 3),
        "scale_ate_rmse_m": round(ate, 5),
        "scale_n_submaps": n_submaps,
        "scale_switch_backs": len(events["back"]),
        "scale_wait_armed": len(events["wait_armed"]),
        "scale_wait_matured": len(events["wait_matured"]),
        "scale_manager_p50_ms": round(float(np.percentile(mgr_ms_arr, 50)),
                                      2),
        "scale_manager_p99_ms": round(float(np.percentile(mgr_ms_arr, 99)),
                                      2),
        # manager keyframe stage, few-submaps vs many-submaps medians:
        # flat => the decision engine is O(1) in live submap count
        "scale_manager_ms_at_low_M": round(
            float(np.median(mgr_ms_arr[lo])) if lo.any() else 0.0, 2),
        "scale_manager_ms_at_high_M": round(
            float(np.median(mgr_ms_arr[hi])) if hi.any() else 0.0, 2),
    }


def run_multisubmap_ate(cfg_path: str):
    """One untimed pass: ATE of the multi-submap scene at FULL budgets
    (validates that the fast profile's multi-submap ATE is honest —
    VERDICT r2 item 4)."""
    cfg, ds, n = _build_outback(cfg_path)
    slam, _, events, _ = _drive(cfg, ds, n, synced=False)
    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]
    return float(ate), len(events["back"])


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=["fast", "full", "multi", "scale"],
                    help="run one profile standalone (default: all, the "
                         "driver's single-JSON-line contract)")
    args = ap.parse_args()
    parts = ([args.only] if args.only
             else ["fast", "full", "multi", "scale"])

    out = {}
    if "fast" in parts:
        fast_fps, fast_ate = run_profile("configs/synthetic/orbit_fast.yaml")
        dev_fast = stage_device_times("configs/synthetic/orbit_fast.yaml")
        out.update({
            "metric": "tracked_fps",
            "value": round(fast_fps["median"], 3),
            "unit": "frames/s",
            "vs_baseline": round(fast_fps["median"] / 30.0, 4),
            "config": "configs/synthetic/orbit_fast.yaml (ATE-validated "
                      "fast profile; process_frame incl. manager; median "
                      f"of {N_REPEAT} windows)",
            "fps_min": round(fast_fps["min"], 3),
            "fps_max": round(fast_fps["max"], 3),
            "ate_rmse_m": round(fast_ate, 5),
            "stage_device_ms": dev_fast,
        })
    if "full" in parts:
        full_fps, full_ate = run_profile("configs/synthetic/orbit.yaml")
        dev_full = stage_device_times("configs/synthetic/orbit.yaml")
        out.update({
            "full_budget_fps": round(full_fps["median"], 3),
            "full_budget_fps_min": round(full_fps["min"], 3),
            "full_budget_fps_max": round(full_fps["max"], 3),
            "full_budget_ate_rmse_m": round(full_ate, 5),
            "full_budget_stage_device_ms": dev_full,
        })
    if "multi" in parts:
        multi = run_multisubmap("configs/synthetic/outback_fast.yaml")
        ms_full_ate, ms_full_backs = run_multisubmap_ate(
            "configs/synthetic/outback.yaml")
        multi["multi_submap_full_budget_ate_m"] = round(ms_full_ate, 5)
        multi["multi_submap_full_budget_switch_backs"] = ms_full_backs
        out.update(multi)
    if "scale" in parts:
        out.update(run_scale_envelope("configs/synthetic/snake_fast.yaml"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
