"""Embedding pretraining: PointNet encoder + SDF decoder on local patches.

Rebuilds the pretraining path of LitFusionPointNet (reference
src/models/fusion/local_point_fusion.py:381-598 and train flow
src/train.py): a local oriented point set is mean-pooled into one latent,
the decoder regresses SDF at query points, trained with truncated-L1 plus a
latent-norm regularizer (reference compute_loss:381-395), Adam + StepLR
(reference configs/optimizer/adam.yaml).

TPU-first: the whole train step (random point-count truncation included) is
one jitted function over a fixed [B, N, 6] batch; point-count truncation is a
mask, not a shape change, so there is exactly one compilation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bnv_fusion_tpu import nn as bnn
from bnv_fusion_tpu.checkpoint import save_state
from bnv_fusion_tpu.models.registry import register
from bnv_fusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def pretrain_loss(params: Dict[str, Any], input_pts: jnp.ndarray,
                  n_keep: jnp.ndarray, training_pts: jnp.ndarray,
                  gt_sdf: jnp.ndarray, reg_weight: float = 1e-3
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Truncated-input global-feature loss (reference
    local_point_fusion.py:397-460 local branch).

    input_pts [B, N, 6]; n_keep [B] — how many leading points to use (the
    reference's random truncation, applied as a mask); training_pts [B, Q, 3]
    in normalized units; gt_sdf [B, Q].
    """
    b, n, _ = input_pts.shape
    keep = jnp.arange(n)[None, :] < n_keep[:, None]
    feats = bnn.encoder_global_apply(params, input_pts, valid=keep)   # [B, F]
    q = training_pts.shape[1]
    feats_b = jnp.broadcast_to(feats[:, None, :], (b, q, feats.shape[-1]))
    pred = bnn.decoder_apply(params, training_pts, feats_b)[..., 0]   # [B, Q]
    bce = jnp.mean(jnp.abs(pred - gt_sdf))
    reg = jnp.mean(jnp.linalg.norm(feats, axis=-1))
    loss = bce + reg_weight * reg
    return loss, {"bce_loss": bce, "reg_loss": reg}


def global_pretrain_loss(params: Dict[str, Any], input_pts: jnp.ndarray,
                         normals: jnp.ndarray, valid: jnp.ndarray,
                         training_pts: jnp.ndarray, gt_sdf: jnp.ndarray,
                         bound_min, bound_max, voxel_size: float,
                         n_xyz, min_pts: int) -> Tuple[jnp.ndarray, Dict]:
    """End-to-end (training_global) loss: encode a whole frame's points into
    a dense grid and regress SDF at world query points
    (reference local_point_fusion.py:421-442)."""
    from bnv_fusion_tpu import dense_grid

    feat_grid, cnt_grid = dense_grid.encode_pointcloud_dense(
        params, input_pts, normals, valid, bound_min, bound_max,
        voxel_size, n_xyz, min_pts)
    coords = (training_pts - bound_min) / voxel_size
    pred = dense_grid.decode_dense_grid(params, feat_grid, cnt_grid, coords,
                                        voxel_size, min_pts)
    bce = jnp.mean(jnp.abs(pred - gt_sdf))
    return bce, {"bce_loss": bce}


@register("lit_fusion_pointnet")
class FusionPointNetTrainer:
    """Train loop driver (the reference's LightningModule + pl.Trainer role)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.training_global = bool(getattr(cfg.model, "training_global",
                                            False))
        self.min_pts = int(cfg.model.min_pts_in_grid)
        self.n_local = int(getattr(cfg.dataset, "n_local_samples", 64))
        self.reg_weight = float(cfg.model.loss.reg_loss)
        lr = float(cfg.optimizer.lr.initial)
        sched = optax.exponential_decay(
            lr, transition_steps=int(cfg.optimizer.lr_scheduler.step_size),
            decay_rate=float(cfg.optimizer.lr_scheduler.gamma),
            staircase=True)
        self.optimizer = optax.adam(sched)
        key = jax.random.key(int(getattr(cfg.trainer, "seed", 0)))
        self.params = bnn.init_model(key)
        self.opt_state = self.optimizer.init(self.params)
        self._step = self._build_step()
        self._key = jax.random.key(1234)

    def _build_step(self):
        reg_w = self.reg_weight
        # trainer.pretrain_devices > 1: shard the patch batch across a DP
        # mesh (parallel/dp.make_sharded_pretrain_step — SURVEY §2.5's
        # pretraining DP surface); identical semantics, batch must divide
        n_dev = int(getattr(self.cfg.trainer, "pretrain_devices", 1) or 1)
        if n_dev > 1:
            from bnv_fusion_tpu.parallel import dp, mesh as pmesh

            return dp.make_sharded_pretrain_step(
                pmesh.make_mesh(n_dev), self.optimizer, reg_weight=reg_w)
        grad_fn = jax.value_and_grad(
            partial(pretrain_loss, reg_weight=reg_w), has_aux=True)
        opt = self.optimizer

        @jax.jit
        def step(params, opt_state, input_pts, n_keep, training_pts, gt_sdf):
            (loss, logs), g = grad_fn(params, input_pts, n_keep,
                                      training_pts, gt_sdf)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, logs

        return step

    def _build_global_step(self, voxel_size: float, n_xyz):
        min_pts = self.min_pts
        n_xyz = tuple(int(v) for v in n_xyz)
        grad_fn = jax.value_and_grad(
            partial(global_pretrain_loss, voxel_size=voxel_size,
                    n_xyz=n_xyz, min_pts=min_pts), has_aux=True)
        opt = self.optimizer

        @jax.jit
        def step(params, opt_state, pts, normals, valid, training_pts, gt,
                 bound_min, bound_max):
            (loss, logs), g = grad_fn(params, pts, normals, valid,
                                      training_pts, gt, bound_min, bound_max)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, logs

        return step

    def train_step_global(self, batch: Dict[str, np.ndarray],
                          voxel_size: float, n_xyz):
        """End-to-end training over one frame (training_global=True branch,
        reference local_point_fusion.py:421-442)."""
        if not hasattr(self, "_gstep"):
            self._gstep = self._build_global_step(voxel_size, n_xyz)
        self.params, self.opt_state, loss, logs = self._gstep(
            self.params, self.opt_state,
            jnp.asarray(batch["input_pts"][..., :3]),
            jnp.asarray(batch["input_pts"][..., 3:]),
            jnp.asarray(batch.get("valid",
                                  np.ones(batch["input_pts"].shape[:-1],
                                          bool))),
            jnp.asarray(batch["training_pts"]), jnp.asarray(batch["gt"]),
            jnp.asarray(batch["bound_min"]), jnp.asarray(batch["bound_max"]))
        return float(loss), {k: float(v) for k, v in logs.items()}

    def train_step(self, batch: Dict[str, np.ndarray]):
        self._key, k = jax.random.split(self._key)
        b = batch["input_pts"].shape[0]
        # reference: random truncation in [min_pts/2, n_local_samples)
        n_keep = jax.random.randint(k, (b,), self.min_pts // 2, self.n_local)
        self.params, self.opt_state, loss, logs = self._step(
            self.params, self.opt_state,
            jnp.asarray(batch["input_pts"]), n_keep,
            jnp.asarray(batch["training_pts"]), jnp.asarray(batch["gt"]))
        return float(loss), {k2: float(v) for k2, v in logs.items()}

    @partial(jax.jit, static_argnums=0)
    def _eval_loss(self, params, input_pts, training_pts, gt_sdf):
        b, n, _ = input_pts.shape
        loss, logs = pretrain_loss(
            params, input_pts, jnp.full((b,), n), training_pts, gt_sdf,
            self.reg_weight)
        return logs["bce_loss"]

    def eval_step(self, batch: Dict[str, np.ndarray]) -> float:
        return float(self._eval_loss(
            self.params, jnp.asarray(batch["input_pts"]),
            jnp.asarray(batch["training_pts"]), jnp.asarray(batch["gt"])))

    def export_validation_meshes(self, val_ds, out_dir: str, epoch: int,
                                 n_patches: int = 4, grid: int = 24):
        """Mesh a few validation patches from their global latents — the
        reference's per-epoch visual check (meshing_local_patch /
        validation_step exports, local_point_fusion.py:492-552)."""
        import os

        from bnv_fusion_tpu import dense_grid
        from bnv_fusion_tpu.mesh import Mesh, marching_tetrahedra, save_ply
        from bnv_fusion_tpu.utils.vis import (colorize_normals,
                                              save_pointcloud_ply)

        os.makedirs(out_dir, exist_ok=True)
        lin = np.linspace(-1, 1, grid + 1, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        q = np.stack([gx, gy, gz], -1).reshape(1, -1, 3)
        corner_off = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                               for z in (0, 1)])
        cells = np.stack(np.meshgrid(*[np.arange(grid)] * 3, indexing="ij"),
                         -1).reshape(-1, 3)
        for i in range(min(n_patches, len(val_ds))):
            item = val_ds[i]
            pts = jnp.asarray(item["input_pts"][None])
            feats = bnn.encoder_global_apply(self.params, pts)
            sdf = np.asarray(dense_grid.global_feature_decode(
                self.params, feats, jnp.asarray(q)))[0]
            vol = sdf.reshape(grid + 1, grid + 1, grid + 1)
            cs = np.stack([vol[cells[:, 0] + o[0], cells[:, 1] + o[1],
                               cells[:, 2] + o[2]] for o in corner_off], -1)
            keep = (cs.min(1) < 0) & (cs.max(1) > 0)
            out = marching_tetrahedra(cells[keep], cs[keep])
            if len(out.vertices):
                verts = out.vertices / grid * 2 - 1
                save_ply(os.path.join(out_dir, f"patch{i}_{epoch}.ply"),
                         Mesh(verts.astype(np.float32), out.faces))
            # GT oriented points, normal-colored (the reference's *_gt.ply)
            ip = np.asarray(item["input_pts"])
            save_pointcloud_ply(
                os.path.join(out_dir, f"patch{i}_{epoch}_gt.ply"),
                ip[:, :3], colorize_normals(ip[:, 3:6]))

    def fit(self, train_ds, val_ds, max_epochs: int, batch_size: int,
            ckpt_dir: str, log_every: int = 50):
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        terminate_on_nan = bool(getattr(self.cfg.trainer,
                                        "terminate_on_nan", True))
        best = float("inf")
        step = 0
        for epoch in range(max_epochs):
            for batch in iterate_batches(train_ds, batch_size, shuffle=True,
                                         seed=epoch):
                loss, logs = self.train_step(batch)
                if terminate_on_nan and not np.isfinite(loss):
                    # reference trainer config: terminate_on_nan: True
                    raise FloatingPointError(
                        f"non-finite loss {loss} at epoch {epoch} step {step}")
                if step % log_every == 0:
                    log.info(f"epoch {epoch} step {step} "
                             f"loss {loss:.4f} bce {logs['bce_loss']:.4f}")
                step += 1
            val = np.mean([self.eval_step(b) for b in
                           iterate_batches(val_ds, batch_size)])
            log.info(f"epoch {epoch} val_loss {val:.4f}")
            if bool(getattr(self.cfg.trainer, "export_val_meshes", False)):
                self.export_validation_meshes(
                    val_ds, os.path.join(ckpt_dir, "plots"), epoch)
            save_state(os.path.join(ckpt_dir, "last.npz"),
                       {"params": self.params})
            if val < best:
                best = val
                save_state(os.path.join(ckpt_dir, "best.npz"),
                           {"params": self.params})
        return best


def iterate_batches(dataset, batch_size: int, shuffle: bool = False,
                    seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for s in range(0, len(idx) - batch_size + 1, batch_size):
        items = [dataset[int(i)] for i in idx[s:s + batch_size]]
        yield {k: np.stack([it[k] for it in items]) for k in items[0]}
