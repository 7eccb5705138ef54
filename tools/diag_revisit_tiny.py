"""Tune the 'revisit' wait-loop scene at the tests' tiny scale (CPU).

Same goal as tools/diag_revisit.py (organic case-5.2 wait-loop arming +
later maturation, ref Manager.py:494-518) but on the tiny loop_config
the e2e tests use, so the resulting numbers transfer directly into
tests/test_wait_loop_e2e.py.

    python tools/diag_revisit_tiny.py --amp 0.9 --n 220
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", type=float, default=0.9)
    ap.add_argument("--n", type=int, default=220)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from test_loop_closure_e2e import loop_config

    from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
    from mipsfusion_tpu.slam.system import MIPSFusionTPU

    cfg = loop_config(args.n)
    cfg["synthetic"].update({"trajectory": "revisit", "n_frames": args.n,
                             "revisit_amp": args.amp})
    ds = SyntheticDataset(cfg, n_frames=args.n, trajectory="revisit",
                          span=1.0)
    slam = MIPSFusionTPU(cfg, dataset=ds)
    mgr = slam.manager

    log = []
    orig_pk = mgr.process_keyframe

    def spy_pk(st, depth, direction, pose, i, kf_id, force=False):
        was_wait = mgr.wait_loop
        st2, flag = orig_pk(st, depth, direction, pose, i, kf_id,
                            force=force)
        ev = {"i": i, "kf": kf_id, "flag": flag,
              "wait_before": was_wait, "wait_after": mgr.wait_loop,
              "db": mgr.double_binding_counter}
        if was_wait and flag == 1:
            ev["MATURED"] = True
        if not was_wait and mgr.wait_loop:
            ev["ARMED"] = True
        log.append(ev)
        print(ev, flush=True)
        return st2, flag

    mgr.process_keyframe = spy_pk
    for i in range(args.n):
        slam.process_frame({"frame_id": i, "c2w": ds.gt_pose(i)}, i)
    ate = slam.evaluate(args.n - 1)["absolute_translational_error.rmse"]
    used = int(np.asarray(slam.state.localMLP_info[:, 0]).sum())
    armed = any(e.get("ARMED") for e in log)
    matured = any(e.get("MATURED") for e in log)
    print(f"\namp={args.amp} ATE {float(ate)*1e3:.1f} mm  submaps={used}  "
          f"wait_armed={armed}  wait_matured={matured}")


if __name__ == "__main__":
    main()
