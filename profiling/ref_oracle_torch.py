"""Torch-CPU transliteration of the PyTorch reference, end to end (item 2).

Every quality number so far was scored against this repo's own round-3
protocol point; this harness produces an ACTUAL PyTorch-reference output to
score against.  It reimplements the reference's non-tcnn end-to-end flow
(reference src/run_e2e.py:205-296) in torch CPU, with a sorted-array find
standing in for the Open3D hash map (reference src/models/sparse_volume.py:
484-766), exactly like tests/test_fusion.py's numpy oracle but through
optimize + meshing:

* dataset semantics  — reference src/datasets/fusion_inference_dataset.py:
  40-92 (kornia depth_to_normals/depth_to_3d transliterated: sobel/8,
  replicate pad, n = cross(dx, dy)) and 368-405 (ray sampling).
* encoder + integrate — reference local_point_fusion.py:83-151 (bound mask,
  8-neighbor relative xyz, per-point PointNet, scatter-mean per voxel,
  min-pts filter) and 647-673 (clip(n/32), running mean).
* TSDF prior — reference third_parties/fusion.py:22-294 CPU path +
  run_e2e.py prepare_tsdf_volume (x 5*tsdf_vs, clip +-trunc, x 0.1).
* optimization — reference run_e2e.py:113-162 (Adam lr 1e-3 on features) +
  render_utils.py:77-230,431-606 (lift/camera rays, hierarchical sampling,
  neighborhood-corrected truncated-L1) + sparse_volume.py:625-640
  count_optim and 768-836 decode_pts (incl. the F.grid_sample nearest
  prior lookup with feature-grid normalization).
* meshing — reference sparse_volume.py:697-766: half-voxel lattice decode
  with the +voxel_size masked fallback.  Triangulation runs through this
  repo's marching-tetrahedra utilities (skimage is not installed here);
  vertex positions may differ from skimage marching_cubes by sub-lattice
  (< voxel/2) offsets, which is inside the 1 cm scoring threshold.

Protocol (sized for the single-core CPU host; run `ours` with the SAME
settings): synthetic demo scene, 16 frames at 240x320, voxel 0.02,
pretrained/pointnet.ckpt (the non-tcnn checkpoint both sides can load),
1024 rays/iter, reference iteration formula 16 * skip(1) * 2 = 32 iters.

Usage:
    python profiling/ref_oracle_torch.py ref    # torch oracle -> /tmp/ref_oracle/
    python profiling/ref_oracle_torch.py ours   # our pipeline, same protocol
    python profiling/ref_oracle_torch.py score  # F(ours vs oracle) + vs GT

`ref`/`score` force the CPU jax backend; `ours` runs on the default (TPU)
backend.  Artifacts: oracle_mesh.ply, ours_mesh.ply, score.json.
"""

import json
import os
import sys
import time

OUT_DIR = "/tmp/ref_oracle"
ROLE = sys.argv[1] if len(sys.argv) > 1 else "ref"
if ROLE in ("ref", "score"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# -- protocol ---------------------------------------------------------------
CKPT = "/root/reference/pretrained/pointnet.ckpt"
SMOKE = os.environ.get("BNV_ORACLE_SMOKE") == "1"
IMG_RES = (120, 160) if SMOKE else (240, 320)
N_FRAMES = 4 if SMOKE else 16
VOXEL = 0.04 if SMOKE else 0.02
FEAT = 8
MIN_PTS = 8
N_RAYS = 256 if SMOKE else 1024
RAY_SPLITS = N_RAYS          # single chunk (reference: 1000 of 5000)
N_ITERS = N_FRAMES * 1 * 2  # run_e2e.py:284-287 with skip_images=1
LR = 1e-3
RAY_MAX = 3.0
TRUNC_UNITS = 10
TRUNC_DIST = min(TRUNC_UNITS * VOXEL * 0.5, 0.1)   # run_e2e.py:58
TSDF_VS = 0.025
SDF_DELTA_W = 0.1
SEED = 0

OVERRIDES = [
    f"model.voxel_size={VOXEL}",
    f"dataset.num_images={N_FRAMES}",
    f"dataset.img_res=[{IMG_RES[0]},{IMG_RES[1]}]",
    f"dataset.num_pixels={N_RAYS}",
    f"model.train_ray_splits={RAY_SPLITS}",
    f"trainer.checkpoint={CKPT}",
]


def get_world_range(dimensions, voxel_size):
    """reference voxel_utils.py:83-88."""
    mn = -np.asarray(dimensions, np.float64) / 2 - voxel_size
    mx = np.asarray(dimensions, np.float64) / 2 + voxel_size
    n_xyz = np.ceil((mx - mn) / voxel_size).astype(int)
    mx = mn + voxel_size * n_xyz
    return mn.astype(np.float32), mx.astype(np.float32), n_xyz


# -- torch building blocks ---------------------------------------------------

def make_frames():
    from bnv_fusion_tpu.config import load_config
    from bnv_fusion_tpu.datasets import get_dataset

    cfg = load_config(OVERRIDES)
    ds = get_dataset(cfg, "val")
    return cfg, ds


def torch_modules():
    import torch

    from bnv_fusion_tpu.checkpoint import load_torch_checkpoint

    sd = {k: torch.from_numpy(v.copy())
          for k, v in load_torch_checkpoint(CKPT)["state_dict"].items()}

    def encoder(x):
        """PointNetEncoder eval forward (pointnet_utils.py:246-266),
        x [N, 6] -> [N, F]."""
        t = x.T.unsqueeze(0)
        import torch.nn.functional as F
        for i in range(1, 5):
            t = F.conv1d(t, sd[f"pointnet_backbone.conv{i}.weight"],
                         sd[f"pointnet_backbone.conv{i}.bias"])
            t = F.batch_norm(
                t, sd[f"pointnet_backbone.bn{i}.running_mean"],
                sd[f"pointnet_backbone.bn{i}.running_var"],
                sd[f"pointnet_backbone.bn{i}.weight"],
                sd[f"pointnet_backbone.bn{i}.bias"], training=False)
            if i < 4:
                t = torch.relu(t)
        return t[0].T

    def decoder(local_xyz, feats):
        """LocalNeRFModel geo path (modules.py:657-662,952-960):
        pe = [x, sin x, cos x] (num_fn=1), 4 relu layers + fc_alpha."""
        import torch.nn.functional as F
        pe = torch.cat([local_xyz, torch.sin(local_xyz),
                        torch.cos(local_xyz)], dim=-1)
        h = torch.cat([pe, feats], dim=-1)
        for i in range(4):
            h = torch.relu(F.linear(h, sd[f"nerf.geo_layer{i}.weight"],
                                    sd[f"nerf.geo_layer{i}.bias"]))
        return F.linear(h, sd["nerf.fc_alpha.weight"], sd["nerf.fc_alpha.bias"])

    return encoder, decoder


def depth_to_xyz_map(depth, intr):
    h, w = depth.shape
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    x = (uu - intr[0, 2]) / intr[0, 0] * depth
    y = (vv - intr[1, 2]) / intr[1, 1] * depth
    return np.stack([x, y, depth], axis=-1)


def kornia_normals(depth, intr):
    """kornia.geometry.depth.depth_to_normals transliterated
    (fusion_inference_dataset.py:52-55): sobel/8 gradients with replicate
    padding on the back-projected xyz map, n = cross(d/dx, d/dy),
    L2-normalized.  NOT re-oriented — for a front-facing wall the result
    points away from the camera, which is the convention the pretrained
    encoder was trained with (the dataset's '* -1' remark)."""
    import torch
    import torch.nn.functional as F

    xyz = torch.from_numpy(depth_to_xyz_map(depth, intr))   # [H, W, 3]
    kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]]) / 8.0
    ky = kx.T.contiguous()
    inp = xyz.permute(2, 0, 1).unsqueeze(1)                 # [3, 1, H, W]
    inp = F.pad(inp, (1, 1, 1, 1), mode="replicate")
    dx = F.conv2d(inp, kx.view(1, 1, 3, 3))[:, 0]           # [3, H, W]
    dy = F.conv2d(inp, ky.view(1, 1, 3, 3))[:, 0]
    n = torch.cross(dx.permute(1, 2, 0), dy.permute(1, 2, 0), dim=-1)
    n = n / torch.clamp(torch.linalg.norm(n, dim=-1, keepdim=True), min=1e-12)
    return n.numpy()


NEIGHBOR_OFFSETS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                        indexing="ij"), -1).reshape(8, 3)


def get_neighbors_floor_ceil(coords):
    """modules/sparse_volume get_neighbors: the 8 floor/ceil combinations.
    coords [..., 3] -> [8, ..., 3].  floor+offset equals the floor/ceil
    enumeration except at exact integers, where ceil==floor — reproduced
    with an explicit ceil."""
    import torch

    fl = torch.floor(coords)
    ce = torch.ceil(coords)
    outs = []
    for off in NEIGHBOR_OFFSETS:
        parts = [ce[..., i] if off[i] else fl[..., i] for i in range(3)]
        outs.append(torch.stack(parts, dim=-1))
    return torch.stack(outs, dim=0)


class OracleVolume:
    """Dict/sorted-array stand-in for the reference SparseVolume
    (sparse_volume.py:484-766)."""

    def __init__(self, dimensions):
        import torch

        self.min_coords, self.max_coords, self.n_xyz = get_world_range(
            np.asarray(dimensions), VOXEL)
        self.map = {}      # flat int -> [feats np[F], weight, num_hits]
        self.torch = torch
        # to_tensor state
        self.active_flat = None
        self.features = None
        self.weights = None
        self.num_hits = None

    def flatten(self, ijk):
        n = self.n_xyz
        return (ijk[..., 0] * (n[1] * n[2]) + ijk[..., 1] * n[2]
                + ijk[..., 2]).astype(np.int64)

    def query(self, keys):
        out_f = np.zeros((len(keys), FEAT), np.float32)
        out_w = np.zeros((len(keys), 1), np.float32)
        out_h = np.zeros((len(keys), 1), np.float32)
        for i, fk in enumerate(self.flatten(keys)):
            row = self.map.get(int(fk))
            if row is not None:
                out_f[i] = row[0]
                out_w[i] = row[1]
                out_h[i] = row[2]
        return out_f, out_w, out_h

    def insert(self, keys, feats, weights, num_hits):
        flat = self.flatten(keys)
        for i, fk in enumerate(flat):
            self.map[int(fk)] = [feats[i], float(weights[i]),
                                 float(num_hits[i])]

    def to_tensor(self):
        torch = self.torch
        flat = np.sort(np.fromiter(self.map.keys(), np.int64,
                                   count=len(self.map)))
        feats = np.stack([self.map[int(k)][0] for k in flat])
        w = np.asarray([self.map[int(k)][1] for k in flat], np.float32)
        h = np.asarray([self.map[int(k)][2] for k in flat], np.float32)
        self.active_flat = flat
        self.features = torch.nn.Parameter(torch.from_numpy(feats))
        self.weights = torch.from_numpy(w)
        self.num_hits = torch.from_numpy(h)
        n = self.n_xyz
        ijk = np.stack([flat // (n[1] * n[2]),
                        (flat // n[2]) % n[1],
                        flat % n[2]], -1)
        self.active_coords = ijk.astype(np.int64)

    def find_rows(self, keys_np):
        """tensor_indexer.find: [N, 3] int -> (rows, found)."""
        flat = self.flatten(keys_np)
        pos = np.searchsorted(self.active_flat, flat)
        pos = np.clip(pos, 0, len(self.active_flat) - 1)
        found = self.active_flat[pos] == flat
        return pos, found


def encode_frame(vol, encoder, frame, stats):
    """encode_pointcloud + _integrate (local_point_fusion.py:83-151,647-673)."""
    import torch

    depth = frame["depth"].astype(np.float32)
    T_wc = frame["T_wc"].astype(np.float32)
    intr = frame["intr_mat"].astype(np.float32)
    mask = (depth > 0) & (depth < RAY_MAX)
    normal_c = kornia_normals(depth, intr)
    xyz_c = depth_to_xyz_map(depth, intr)
    pts_w = xyz_c.reshape(-1, 3) @ T_wc[:3, :3].T + T_wc[:3, 3]
    nrm_w = normal_c.reshape(-1, 3) @ T_wc[:3, :3].T
    sel = mask.reshape(-1)
    in_xyz, in_nrm = pts_w[sel], nrm_w[sel]

    bm, bx = vol.min_coords, vol.max_coords
    inb = np.all((in_xyz > bm + VOXEL) & (in_xyz < bx - VOXEL), axis=-1)
    in_xyz, in_nrm = in_xyz[inb], in_nrm[inb]
    if len(in_xyz) == 0:
        return

    xyz_n = torch.from_numpy((in_xyz - bm) / VOXEL)          # voxel units
    grid = get_neighbors_floor_ceil(xyz_n)                   # [8, N, 3]
    rel = xyz_n.unsqueeze(0) - grid                          # voxel units
    nrm = torch.from_numpy(in_nrm).unsqueeze(0).expand(8, -1, -1)
    # forward(normalize=True) divides xyz by voxel_size after the dataset
    # multiplied it back — net input is [rel in voxel units, normal]
    pn_in = torch.cat([rel, nrm], dim=-1).reshape(-1, 6)
    with torch.no_grad():
        pfeats = encoder(pn_in)                              # [8N, F]

    flat = vol.flatten(grid.numpy().astype(np.int64).reshape(-1, 3))
    uniq, inv, counts = np.unique(flat, return_inverse=True,
                                  return_counts=True)
    sums = np.zeros((len(uniq), FEAT), np.float32)
    np.add.at(sums, inv, pfeats.numpy())
    mean = sums / counts[:, None]
    mean[counts < MIN_PTS] = 0.0
    keep = counts >= MIN_PTS
    stats.append(float(counts.mean()))
    if not keep.any():
        return
    uniq, mean, counts = uniq[keep], mean[keep], counts[keep]
    n = vol.n_xyz
    keys = np.stack([uniq // (n[1] * n[2]), (uniq // n[2]) % n[1],
                     uniq % n[2]], -1)

    new_w = np.minimum(counts.astype(np.float32) / 32.0, 1.0)
    old_f, old_w, old_h = vol.query(keys)
    upd_w = old_w[:, 0] + new_w
    upd_f = (old_f * old_w + mean * new_w[:, None]) / upd_w[:, None]
    vol.insert(keys, upd_f.astype(np.float32), upd_w, old_h[:, 0])


class OracleTSDF:
    """third_parties/fusion.py TSDFVolume CPU path."""

    def __init__(self, dimensions):
        mn, mx, _ = get_world_range(np.asarray(dimensions), TSDF_VS)
        self.origin = mn
        self.trunc = 5 * TSDF_VS
        self.dim = np.ceil((mx - mn) / TSDF_VS).astype(int)
        self.tsdf = np.full(self.dim, -self.trunc, np.float32)
        self.w = np.zeros(self.dim, np.float32)
        xx, yy, zz = np.meshgrid(*[np.arange(d) for d in self.dim],
                                 indexing="ij")
        self.vox = np.stack([xx, yy, zz], -1).reshape(-1, 3)
        self.world = self.origin + self.vox * TSDF_VS

    def integrate(self, depth, intr, T_wc):
        h, w = depth.shape
        T_cw = np.linalg.inv(T_wc)
        cam = self.world @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = cam[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            px = np.round(cam[:, 0] * intr[0, 0] / z + intr[0, 2]).astype(int)
            py = np.round(cam[:, 1] * intr[1, 1] / z + intr[1, 2]).astype(int)
        ok = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
        dval = np.zeros(len(z), np.float32)
        dval[ok] = depth[py[ok], px[ok]]
        diff = dval - z
        upd = (dval > 0) & (diff >= -self.trunc)
        dist = np.minimum(1.0, diff / self.trunc)[upd]
        i, j, k = self.vox[upd].T
        w_old = self.w[i, j, k]
        w_new = w_old + 1.0
        self.tsdf[i, j, k] = (w_old * self.tsdf[i, j, k] + dist) / w_new
        self.w[i, j, k] = w_new

    def delta_volume(self):
        """run_e2e.py prepare_tsdf_volume."""
        import torch

        v = self.tsdf * (TSDF_VS * 5)
        v = np.clip(v, -TRUNC_DIST, TRUNC_DIST) * SDF_DELTA_W
        return torch.from_numpy(v).unsqueeze(0).unsqueeze(0)


def decode_pts(vol, decoder, pts_w, sdf_delta, bump_weights=False):
    """sparse_volume.py decode_pts + render_with_rays count_optim.

    pts_w: torch [..., 3] world points.  Returns torch alpha [...]."""
    import torch
    import torch.nn.functional as F

    coords = (pts_w - torch.from_numpy(vol.min_coords)) / VOXEL
    nbrs = get_neighbors_floor_ceil(coords)                  # [8, ..., 3]
    local = coords.unsqueeze(0) - nbrs
    w_tri = torch.prod(1 - torch.abs(local), dim=-1, keepdim=True)

    keys = nbrs.detach().numpy().astype(np.int64).reshape(-1, 3)
    rows, found = vol.find_rows(keys)
    if bump_weights:  # count_optim (sparse_volume.py:625-640)
        vol.weights[np.unique(rows[found])] += 1.0

    rows_t = torch.from_numpy(rows.astype(np.int64))
    found_t = torch.from_numpy(found)
    flat_feats = torch.zeros((len(keys), FEAT))
    flat_feats[found_t] = vol.features[rows_t[found_t]]
    flat_w = torch.zeros((len(keys),))
    flat_w[found_t] = vol.weights[rows_t[found_t]]
    feats = flat_feats.reshape(nbrs.shape[:-1] + (FEAT,))
    wts = flat_w.reshape(nbrs.shape[:-1] + (1,))

    mask = torch.min(wts, dim=0)[0] >= MIN_PTS               # [..., 1]
    alpha = decoder(local, feats) * VOXEL                    # [8, ..., 1]
    w_tri = w_tri / torch.sum(w_tri, dim=0, keepdim=True)
    alpha = torch.sum(alpha * w_tri, dim=0)
    alpha = torch.where(mask, alpha, torch.zeros_like(alpha) + VOXEL)

    if sdf_delta is not None:
        n_xyz = torch.from_numpy(vol.n_xyz.astype(np.float32))
        g = nbrs / (n_xyz - 1) * 2 - 1
        g = g[..., [2, 1, 0]]
        # grid shape [1, 8, M, S, 3] like the reference's [1, 8, n, steps, 3]
        g5 = g.reshape(1, 8, -1, 1, 3)
        d = F.grid_sample(sdf_delta, g5, mode="nearest",
                          padding_mode="zeros", align_corners=True)
        d = d[0, 0, :, :, 0].reshape(nbrs.shape[:-1] + (1,))
        alpha = alpha + torch.sum(d * w_tri, dim=0)
    return alpha[..., 0]


def lift_rays(uv, T_wc, intr):
    """render_utils.py get_camera_params/lift."""
    import torch

    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy, sk = intr[0, 2], intr[1, 2], intr[0, 1]
    x, y = uv[:, 0], uv[:, 1]
    xl = (x - cx + cy * sk / fy - sk * y / fy) / fx
    yl = (y - cy) / fy
    pc = torch.stack([xl, yl, torch.ones_like(x), torch.ones_like(x)], -1)
    pw = (torch.from_numpy(T_wc) @ pc.T).T[:, :3]
    cam_loc = torch.from_numpy(T_wc[:3, 3].copy())
    dirs = pw - cam_loc
    dirs = dirs / torch.linalg.norm(dirs, dim=-1, keepdim=True)
    return dirs, cam_loc


def stratified(n_pts, n_samples, distances, gen):
    """render_utils.py:77-94; distances [N, 1] -> [N, S, 1]."""
    import torch

    iv = torch.linspace(0, 1, n_samples).unsqueeze(0) * distances  # [N, S]
    mids = 0.5 * (iv[:, 1:] + iv[:, :-1])
    upper = torch.cat([mids, iv[:, -1:]], -1)
    lower = torch.cat([iv[:, :1], mids], -1)
    t = torch.rand(n_pts, n_samples, generator=gen)
    return (lower + (upper - lower) * t).unsqueeze(-1)


def sample_rays(frame, gen, ds):
    """IterableInferenceDataset._sample_key_frame."""
    import torch

    depth = frame["depth"].astype(np.float32)
    T_wc = frame["T_wc"].astype(np.float32)
    intr = frame["intr_mat"].astype(np.float32)
    h, w = depth.shape
    mask = ((depth > 0) & (depth < RAY_MAX)).astype(np.float32)
    xyz_c = depth_to_xyz_map(depth, intr)
    pts_w = (xyz_c.reshape(-1, 3) @ T_wc[:3, :3].T + T_wc[:3, 3]).astype(
        np.float32)
    sel = torch.randperm(h * w, generator=gen)[:N_RAYS].numpy()
    uv_all = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1)  # x, y
    uv = uv_all.reshape(-1, 2)[sel].astype(np.float32)
    gt = pts_w[sel]
    m = mask.reshape(-1)[sel]

    # 3x3 neighborhood (clipped at borders)
    xym = pts_w.reshape(h, w, 3)
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1]), -1).reshape(-1, 2)
    px = np.clip(uv[:, None, 0].astype(int) + offs[None, :, 0], 0, w - 1)
    py = np.clip(uv[:, None, 1].astype(int) + offs[None, :, 1], 0, h - 1)
    nb = xym[py, px]                                         # [N, 9, 3]
    nbm = mask[py, px]                                       # [N, 9]
    return dict(uv=uv, gt=gt, mask=m, nb=nb, nbm=nbm, T_wc=T_wc, intr=intr)


def optimize(vol, decoder, frames, tsdf, gen):
    """run_e2e.py optimize + render_utils calculate_loss."""
    import torch

    vol.to_tensor()
    sdf_delta = tsdf.delta_volume()
    opt = torch.optim.Adam([vol.features], lr=LR)
    n_fine, n_coarse = TRUNC_UNITS * 2, int(RAY_MAX * 5)
    for it in range(N_ITERS):
        fid = int(torch.randint(0, len(frames), (1,), generator=gen))
        rays = sample_rays(frames[fid], gen, None)
        opt.zero_grad()
        uv = torch.from_numpy(rays["uv"])
        dirs, cam = lift_rays(uv, rays["T_wc"], rays["intr"])
        gt = torch.from_numpy(rays["gt"])
        gt_d = torch.linalg.norm(gt - cam, dim=-1)           # [N]

        # hierarchical_sampling (render_utils.py:191-230)
        off = torch.where(gt_d - TRUNC_DIST < 0, gt_d,
                          torch.full_like(gt_d, TRUNC_DIST))
        start = gt - off.unsqueeze(-1) * dirs
        start_d = torch.linalg.norm(start - cam, dim=-1)
        fine = stratified(N_RAYS, n_fine,
                          torch.full((N_RAYS, 1), 2 * TRUNC_DIST), gen)
        fine = fine + start_d.reshape(-1, 1, 1)
        coarse = stratified(N_RAYS, n_coarse, gt_d.unsqueeze(-1), gen)
        d_all, _ = torch.sort(torch.cat([fine, coarse], 1), 1)  # [N, S, 1]
        pts = cam + d_all * dirs.unsqueeze(1)                # [N, S, 3]

        pred = decode_pts(vol, decoder, pts, sdf_delta, bump_weights=True)

        # compute_sdf_loss (render_utils.py:508-549)
        depths = torch.linalg.norm(pts - cam, dim=-1)        # [N, S]
        gt_sdf = torch.clip(gt_d.unsqueeze(-1) - depths,
                            -TRUNC_DIST, TRUNC_DIST)
        valid = gt_sdf > max(-TRUNC_DIST * 0.5, -0.05)
        nb = torch.from_numpy(rays["nb"]).float()            # [N, 9, 3]
        nbm = torch.from_numpy(rays["nbm"]).float()
        dd = torch.linalg.norm(nb.unsqueeze(1) - pts.unsqueeze(2), dim=-1)
        dd = torch.where(nbm.unsqueeze(1).bool(), dd,
                         torch.full_like(dd, 10000.0))
        nearest = torch.min(dd, dim=-1)[0]                   # [N, S]
        sign = torch.where(gt_sdf > 0, 1.0, -1.0)
        gt_corr = torch.clip(nearest * sign, -TRUNC_DIST, TRUNC_DIST)
        m = torch.from_numpy(rays["mask"]).float()
        n_valid = m.sum() + 1e-4
        loss = (torch.abs(pred - gt_corr) * valid * m.unsqueeze(-1)
                ).sum() / n_valid
        loss.backward()
        opt.step()
        if it % 8 == 0:
            print(f"  iter {it}: loss {float(loss):.5f}", flush=True)


def run_ref():
    import torch

    torch.manual_seed(SEED)
    gen = torch.Generator().manual_seed(SEED)
    os.makedirs(OUT_DIR, exist_ok=True)
    cfg, ds = make_frames()
    frames = [ds[i] for i in range(len(ds))]
    encoder, decoder = torch_modules()
    vol = OracleVolume(ds.dimensions)
    tsdf = OracleTSDF(ds.dimensions)

    stats = []
    t0 = time.time()
    for i, f in enumerate(frames):
        encode_frame(vol, encoder, f, stats)
        tsdf.integrate(f["depth"].astype(np.float32),
                       f["intr_mat"].astype(np.float32),
                       f["T_wc"].astype(np.float32))
        print(f"frame {i}: {len(vol.map)} active voxels", flush=True)
    print(f"local fusion: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    optimize(vol, decoder, frames, tsdf, gen)
    print(f"optimize {N_ITERS} iters: {time.time()-t0:.1f}s", flush=True)

    # meshing through the shared lattice/triangulation tooling, decode
    # semantics above (reference meshlize; no weight gate on the lattice)
    import torch as _t

    from bnv_fusion_tpu import mesh as mesh_mod

    sdf_delta = tsdf.delta_volume()

    def decode_fn(batch):
        c = np.asarray(batch, np.float32)   # voxel coords
        pw = c * VOXEL + vol.min_coords
        with _t.no_grad():
            out = decode_pts(vol, decoder, _t.from_numpy(pw), sdf_delta)
        return out.numpy()

    t0 = time.time()
    m = mesh_mod.extract_mesh(decode_fn, vol.active_coords,
                              vol.min_coords, VOXEL, use_native=True)
    print(f"mesh: {time.time()-t0:.1f}s, "
          f"{0 if m is None else len(m.vertices)} verts", flush=True)
    mesh_mod.save_ply(os.path.join(OUT_DIR, "oracle_mesh.ply"), m)
    print("oracle mesh written", flush=True)


def run_ours():
    import jax  # default (TPU) backend

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bnv_fusion_tpu import mesh as mesh_mod
    from bnv_fusion_tpu.checkpoint import load_pretrained
    from bnv_fusion_tpu.pipeline import NeuralMap

    os.makedirs(OUT_DIR, exist_ok=True)
    cfg, ds = make_frames()
    frames = [ds[i] for i in range(len(ds))]
    params = load_pretrained(CKPT)
    nm = NeuralMap(ds.dimensions, cfg, params)
    for f in frames:
        nm.integrate(f)
    nm.optimize(N_ITERS, lr=LR)
    m = nm.extract_mesh(use_delta=True)
    mesh_mod.save_ply(os.path.join(OUT_DIR, "ours_mesh.ply"), m)
    print("our mesh written", flush=True)


def run_score():
    from bnv_fusion_tpu import mesh as mesh_mod
    from bnv_fusion_tpu.evaluation import fscore_points
    from bnv_fusion_tpu.mesh import sample_surface

    cfg, ds = make_frames()
    oracle = mesh_mod.load_ply(os.path.join(OUT_DIR, "oracle_mesh.ply"))
    ours = mesh_mod.load_ply(os.path.join(OUT_DIR, "ours_mesh.ply"))
    o_pts = sample_surface(oracle, 100000, seed=0)
    u_pts = sample_surface(ours, 100000, seed=0)
    gt = ds.gt_observed_points(100000, seed=0)

    out = {}
    for name, a, b in (("ours_vs_ref", u_pts, o_pts),
                       ("ours_vs_gt", u_pts, gt),
                       ("ref_vs_gt", o_pts, gt)):
        for th, tag in ((0.025, "2p5cm"), (0.01, "1cm")):
            r = fscore_points(a, b, th)
            out[f"{name}_f_{tag}"] = round(r["fscore"], 4)
    for k in ("ours_vs_gt", "ref_vs_gt"):
        a = out[f"{k}_f_2p5cm"]
    out["gap_vs_ref_2p5cm_pct"] = round(
        100 * (out["ours_vs_gt_f_2p5cm"] - out["ref_vs_gt_f_2p5cm"])
        / max(out["ref_vs_gt_f_2p5cm"], 1e-9), 2)
    out["gap_vs_ref_1cm_pct"] = round(
        100 * (out["ours_vs_gt_f_1cm"] - out["ref_vs_gt_f_1cm"])
        / max(out["ref_vs_gt_f_1cm"], 1e-9), 2)
    with open(os.path.join(OUT_DIR, "score.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    {"ref": run_ref, "ours": run_ours, "score": run_score}[ROLE]()
