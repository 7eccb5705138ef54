"""Concatenate per-submap mesh clips into one whole-scene PLY.

Counterpart of the reference's vis/mesh_concat.py (which hard-codes a
run directory and uses trimesh/open3d); this version is an argparse CLI
over the framework's own PLY IO — no external mesh dependencies.

Usage:
    python vis/mesh_concat.py OUT_DIR            # concat OUT_DIR/clip_*.ply
    python vis/mesh_concat.py a.ply b.ply -o whole.ply
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mipsfusion_tpu.mesher.mesher import (concat_meshes, load_mesh_ply,
                                          save_mesh_ply)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+",
                    help="PLY files, or one directory containing clip_*.ply")
    ap.add_argument("-o", "--output", default=None,
                    help="output path (default: <dir>/color_whole_mesh.ply)")
    args = ap.parse_args()

    if len(args.inputs) == 1 and os.path.isdir(args.inputs[0]):
        mesh_dir = args.inputs[0]
        paths = sorted(glob.glob(os.path.join(mesh_dir, "clip_*.ply"))) or \
            sorted(glob.glob(os.path.join(mesh_dir, "*.ply")))
        out = args.output or os.path.join(mesh_dir, "color_whole_mesh.ply")
    else:
        paths = args.inputs
        out = args.output or "color_whole_mesh.ply"
    if not paths:
        sys.exit("no input meshes found")

    meshes = [load_mesh_ply(p) for p in paths]
    verts, faces, colors = concat_meshes(meshes)
    save_mesh_ply(out, verts, faces, colors)
    print(f"wrote {out}: {len(verts)} verts, {len(faces)} faces "
          f"from {len(paths)} clips")
    if len(verts):
        print("xyz_min:", np.min(verts, axis=0).tolist())
        print("xyz_max:", np.max(verts, axis=0).tolist())


if __name__ == "__main__":
    main()
