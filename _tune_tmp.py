import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time, jax, numpy as np
from mipsfusion_tpu.config import load_config
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU

isf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.04
n_ro = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cfg = load_config("configs/synthetic/orbit_fast.yaml")
cfg["data"]["output"] = None
cfg["tracking"]["RO"]["initial_scaling_factor"] = isf
cfg["tracking"]["iter_RO"] = n_ro
N = 120
ds = SyntheticDataset(cfg, n_frames=N, trajectory="orbit", span=120/200.0)
for i in range(N): ds.packed(i)
slam = MIPSFusionTPU(cfg, dataset=ds)
def frame(i): return {"frame_id": i, "c2w": ds.gt_pose(i)}
slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
for i in range(1, 17): slam.process_frame(frame(i), i)
jax.block_until_ready(slam.state.est_c2w)
t0 = time.perf_counter()
for i in range(17, N): slam.process_frame(frame(i), i)
jax.block_until_ready(slam.state.est_c2w)
el = time.perf_counter()-t0
res = slam.evaluate(N-1)
print(f"isf={isf} iter_RO={n_ro}: {(N-17)/el:.2f} fps, ATE {res['absolute_translational_error.rmse']*1000:.1f} mm, submaps {res.get('n_submaps','?')}")
