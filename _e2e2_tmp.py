import os, sys, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
os.environ["MIPS_DEBUG_MANAGER"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "tests")
import numpy as np
from mipsfusion_tpu.datasets.synthetic import SyntheticDataset
from mipsfusion_tpu.slam.system import MIPSFusionTPU
from test_loop_closure_e2e import loop_config

cfg = loop_config()
cfg["debug_loop"] = True
cfg["parallel"] = {"sharded_refine": False}
import jax as _j
_j.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
ds = SyntheticDataset(cfg, n_frames=cfg["synthetic"]["n_frames"], trajectory="outback", span=1.0)
slam = MIPSFusionTPU(cfg, dataset=ds)
switches = []
orig = slam.active_submap_switch
def spy(frame, i, kf_id):
    switches.append(i); return orig(frame, i, kf_id)
slam.active_submap_switch = spy
results = slam.run(verbose=False)
print("switches:", switches, "n_submaps:", results["n_submaps"], "ATE", results["absolute_translational_error.rmse"])
