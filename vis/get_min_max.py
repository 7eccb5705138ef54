"""Print the axis-aligned bounding box of a mesh's vertices.

Counterpart of the reference's vis/get_min_max.py (hard-coded path +
open3d); argparse CLI over the framework's own PLY reader.

Usage: python vis/get_min_max.py mesh.ply
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mipsfusion_tpu.mesher.mesher import load_mesh_ply


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mesh", help="PLY mesh path")
    args = ap.parse_args()
    verts, faces, _ = load_mesh_ply(args.mesh)
    if not len(verts):
        sys.exit("mesh has no vertices")
    print(f"{len(verts)} verts, {len(faces)} faces")
    print("xyz_min:", np.min(verts, axis=0).tolist())
    print("xyz_max:", np.max(verts, axis=0).tolist())


if __name__ == "__main__":
    main()
