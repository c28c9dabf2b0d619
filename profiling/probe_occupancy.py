"""Measure the cell-sort compaction occupancy of the bench operating point.

The static widths max_unique_cells_per_frame (stage-1 groups) and
max_unique_per_frame (stage-2 voxels) bound the sort sizes — stage 2 sorts
8*u_cell rows, the largest remaining per-frame cost at the round-3 bench
point.  This prints, per frame of the 48-frame lounge-analog scene at the
bench settings, the TRUE group/voxel counts (pure numpy on the dataset —
occupancy is a property of the data, so no TPU needed), plus the safe
width recommendation.

WARNING (measured, round 3): this probe computes coords in numpy FLOAT64
and UNDERCOUNTS the device's f32 semantics by ~25% at the bench operating
point — scene surfaces that land exactly on grid planes (the ground slab)
get `ceil(c) > floor(c)` under f32 rounding but not f64, which adds a
whole extra corner layer (~25k voxels/frame).  Real per-frame unique is
109834 max, not 80117; sizing max_unique_per_frame from this probe's
numbers truncates ~15k REAL voxels per frame.  Use
profiling/probe_seg_count.py (measures on-device, f32, and cross-checks
the seg_reduce kernel's counts) for width sizing; keep this probe for the
cheap no-TPU approximation only.

Usage: python profiling/probe_occupancy.py [voxel_size] [n_frames]
"""

import os
import sys

# ASSIGN, not setdefault: the global env already carries axon (CLAUDE.md)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    vs = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from bnv_fusion_tpu import geometry
    from bnv_fusion_tpu import voxel as vx
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset

    cfg = load_config([
        f"model.voxel_size={vs}", f"dataset.num_images={nf}",
        "dataset.img_res=[480,640]",
    ])
    ds = get_dataset(cfg, "val")
    min_c, max_c, n_xyz = vx.get_world_range(ds.dimensions, vs)
    n_xyz = np.asarray(n_xyz)
    s0, s1 = int(n_xyz[1] * n_xyz[2]), int(n_xyz[2])

    g_max = u_max = 0
    gs, us = [], []
    frame_keys = []   # per-frame unique corner-voxel key sets (batch stats)
    for i in range(len(ds)):
        f = ds[i]
        depth = np.asarray(f["depth"], np.float32)
        intr = np.asarray(f["intr_mat"], np.float32)
        T_wc = np.asarray(f["T_wc"], np.float32)
        xyz = np.asarray(geometry.depth_to_xyz(depth, intr)).reshape(-1, 3)
        pts = np.asarray(geometry.transform_points(T_wc, xyz))
        valid = (depth > 0).reshape(-1)
        inside = np.all((pts > min_c + vs) & (pts < max_c - vs), 1) & valid
        coords = (pts - min_c) / vs
        fl = np.floor(coords)
        mi = (np.ceil(coords) > fl).astype(np.int64)
        fi = fl.astype(np.int64)
        inside &= np.all(fi >= 0, 1) & np.all(fi + mi < n_xyz, 1)
        cell = fi[:, 0] * s0 + fi[:, 1] * s1 + fi[:, 2]
        mcode = mi[:, 0] * 4 + mi[:, 1] * 2 + mi[:, 2]
        gk = np.unique((cell * 8 + mcode)[inside])     # (cell, mcode) groups
        # unique corner voxels (collapsed-key semantics)
        pat = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.int64)
        moff = np.stack([(gk % 8) // 4, (gk % 8) // 2 % 2, gk % 8 % 2], 1)
        ck = (gk // 8)[:, None] + (pat[None] * moff[:, None, :]) @ \
            np.array([s0, s1, 1], np.int64)
        uk = np.unique(ck)
        frame_keys.append(uk)
        gs.append(len(gk))
        us.append(len(uk))
        g_max = max(g_max, len(gk))
        u_max = max(u_max, len(uk))
    print(f"voxel {vs}, {len(ds)} frames:")
    print(f"  stage-1 groups/frame: max {g_max}, mean {np.mean(gs):.0f} "
          f"(width max_unique_cells_per_frame)")
    print(f"  unique voxels/frame:  max {u_max}, mean {np.mean(us):.0f} "
          f"(width max_unique_per_frame)")
    for head in (1.1, 1.25, 1.5):
        w = 1 << int(np.ceil(np.log2(g_max * head)))
        print(f"  u_cell with {head:.2f}x headroom -> pow2 {w} "
              f"(vs current default 65536: {65536 / w:.2f}x smaller sort2)")

    # cross-frame MERGED unique counts per K-frame batch: this is what
    # max_unique_per_batch (default 2*max_unique_per_frame) must cover for
    # the batch merge in fusion.fuse_frames_merged to drop nothing
    for k in (8, 16, 24):
        bu = [len(np.unique(np.concatenate(frame_keys[i:i + k])))
              for i in range(0, len(frame_keys) - k + 1, k)]
        if bu:
            print(f"  K={k} batch-merged unique voxels: max {max(bu)}, "
                  f"mean {np.mean(bu):.0f} (width max_unique_per_batch; "
                  f"2048-aligned 1.1x fit = "
                  f"{2048 * int(np.ceil(max(bu) * 1.1 / 2048))})")


if __name__ == "__main__":
    main()
