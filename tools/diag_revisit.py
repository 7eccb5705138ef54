"""Tune the 'revisit' wait-loop scene (VERDICT r4 item 2, organic half).

Runs the revisit trajectory (outback-style out-and-back whose return leg
carries a yaw offset that peaks mid-return and eases out) and reports
every manager transition: case taken per keyframe, wait-loop arm/mature
events, double-binding counter, final ATE. The goal is a scene where
case 5.2 arms the wait loop (verify fails on min_pts at first re-entry)
and a LATER keyframe matures it into the msg1 wait switch — the
reference's primary loop-closure arming mechanism
(/root/reference/Manager.py:494-518).

    python tools/diag_revisit.py --amp 0.9 --n 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mipsfusion_tpu.compile_cache import enable_compile_cache  # noqa: E402
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", type=float, default=0.9)
    ap.add_argument("--phase", type=float, default=0.5)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--config", default="configs/synthetic/outback_fast.yaml")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mipsfusion_tpu.config import load_config
    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = load_config(args.config)
    cfg["data"]["output"] = None
    cfg["synthetic"].update({"trajectory": "revisit", "n_frames": args.n,
                             "revisit_amp": args.amp,
                             "revisit_phase": args.phase})
    n = args.n
    ds = SyntheticDataset(cfg, n_frames=n, trajectory="revisit", span=1.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    mgr = slam.manager

    log = []
    orig_pk = mgr.process_keyframe

    def spy_pk(st, depth, direction, pose, i, kf_id, force=False):
        was_wait = mgr.wait_loop
        st2, flag = orig_pk(st, depth, direction, pose, i, kf_id,
                            force=force)
        ev = {"i": i, "kf": kf_id, "flag": flag, "wait_before": was_wait,
              "wait_after": mgr.wait_loop, "db": mgr.double_binding_counter}
        if was_wait and flag == 1:
            ev["MATURED"] = True
        if not was_wait and mgr.wait_loop:
            ev["ARMED"] = True
        log.append(ev)
        print(ev, flush=True)
        return st2, flag

    mgr.process_keyframe = spy_pk
    for i in range(n):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    ate = slam.evaluate(n - 1)["absolute_translational_error.rmse"]
    armed = any(e.get("ARMED") for e in log)
    matured = any(e.get("MATURED") for e in log)
    import numpy as np
    used = int(np.asarray(slam.state.localMLP_info[:, 0]).sum())
    print(f"\nATE {ate*1e3:.1f} mm  submaps={used}  "
          f"wait_armed={armed}  wait_matured={matured}")


if __name__ == "__main__":
    main()
