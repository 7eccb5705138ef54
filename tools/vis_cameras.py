"""Camera frustum / bound visualization for debugging.

Matplotlib equivalent of the reference's open3d tool
(/root/reference/tools/vis_cameras.py:38-85): draws camera frusta for a
set of poses plus an axis-aligned bound, to a PNG (headless-friendly —
open3d is not available in this environment).

Usage: python tools/vis_cameras.py --traj <tum_file> [--out cams.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def frustum_lines(c2w, scale=0.1, aspect=1.333):
    """5 frustum corner points -> line segments in world coords."""
    w = scale * aspect
    h = scale
    corners = np.array([
        [0, 0, 0], [-w, -h, -2 * scale], [w, -h, -2 * scale],
        [w, h, -2 * scale], [-w, h, -2 * scale]])
    pts = corners @ c2w[:3, :3].T + c2w[:3, 3]
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[a], pts[b]) for a, b in segs]


def draw_cameras(poses, bound=None, out_path="cameras.png",
                 every=1, title=""):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Line3DCollection

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    segs = []
    for i in range(0, len(poses), every):
        segs.extend([np.stack(s) for s in frustum_lines(poses[i])])
    ax.add_collection3d(Line3DCollection(segs, colors="tab:blue",
                                         linewidths=0.5))
    traj = np.asarray([p[:3, 3] for p in poses])
    ax.plot(traj[:, 0], traj[:, 1], traj[:, 2], "r-", lw=1.0)
    if bound is not None:
        b = np.asarray(bound)
        for s, e in [((0, 0, 0), (1, 0, 0)), ((0, 0, 0), (0, 1, 0)),
                     ((0, 0, 0), (0, 0, 1)), ((1, 1, 1), (0, 1, 1)),
                     ((1, 1, 1), (1, 0, 1)), ((1, 1, 1), (1, 1, 0)),
                     ((1, 0, 0), (1, 1, 0)), ((1, 0, 0), (1, 0, 1)),
                     ((0, 1, 0), (1, 1, 0)), ((0, 1, 0), (0, 1, 1)),
                     ((0, 0, 1), (1, 0, 1)), ((0, 0, 1), (0, 1, 1))]:
            p0 = [b[d, s[d]] for d in range(3)]
            p1 = [b[d, e[d]] for d in range(3)]
            ax.plot(*zip(p0, p1), "k-", lw=0.5)
    lo, hi = traj.min(0) - 0.5, traj.max(0) + 0.5
    ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.set_title(title)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--traj", type=str, required=True,
                        help="TUM trajectory file")
    parser.add_argument("--out", type=str, default="cameras.png")
    parser.add_argument("--every", type=int, default=5)
    args = parser.parse_args()

    import jax.numpy as jnp
    from mipsfusion_tpu.ops.geometry import quaternion_to_matrix
    from tools.eval_ate import read_tum

    data = read_tum(args.traj)
    poses = []
    for t in sorted(data):
        tx, ty, tz, qx, qy, qz, qw = data[t]
        R = np.asarray(quaternion_to_matrix(
            jnp.asarray([qw, qx, qy, qz])))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [tx, ty, tz]
        poses.append(T)
    draw_cameras(poses, out_path=args.out, every=args.every,
                 title=os.path.basename(args.traj))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
