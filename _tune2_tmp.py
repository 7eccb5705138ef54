import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import time, jax, numpy as np
from mipsfusion_tpu.config import load_config
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
cfg = load_config("configs/synthetic/orbit_fast.yaml")
cfg["data"]["output"] = None
cfg["tracking"]["RO"]["initial_scaling_factor"] = 0.04
N_WARM, N_BENCH = 16, 30
N = N_WARM + N_BENCH + 1
ds = SyntheticDataset(cfg, n_frames=N, trajectory="orbit", span=N/400.0)
for i in range(N): ds.packed(i)
slam = MIPSFusionTPU(cfg, dataset=ds)
def frame(i): return {"frame_id": i, "c2w": ds.gt_pose(i)}
slam.first_frame_mapping(frame(0), slam.mcfg.first_iters)
for i in range(1, N): slam.process_frame(frame(i), i)
jax.block_until_ready(slam.state.est_c2w)
res = slam.evaluate(N-1)
print(f"isf=0.04 slow motion: ATE {res['absolute_translational_error.rmse']*1000:.2f} mm")
