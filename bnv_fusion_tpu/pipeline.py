"""NeuralMap: the online bi-level fusion pipeline (integrate / optimize / mesh).

Rebuilds the reference's NeuralMap orchestrator (reference
src/run_e2e.py:27-194) TPU-first:

* ``integrate`` consumes the RAW frame (depth, T_wc, intr) and runs
  back-projection, normal estimation, bound masking, PointNet encoding,
  hash insert and the running-mean update as ONE jitted device step —
  the reference does back-projection/normals in DataLoader workers and
  crosses the host/device boundary per hash operation,
* ``optimize`` is the global-level fusion: a jitted Adam step over the
  table latents per sampled frame (see bnv_fusion_tpu.optimize),
* ``extract_mesh`` decodes the SDF on a deduplicated half-voxel lattice in
  fixed-size device batches and runs vectorized marching tetrahedra on host,
* per-phase wall-clock timing mirrors the reference's Timer/fps printout
  (src/run_e2e.py:242-290).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bnv_fusion_tpu import checkpoint as ckpt_io
from bnv_fusion_tpu import fusion, geometry, mesh as mesh_mod, optimize, sampler, tsdf
from bnv_fusion_tpu import tables as tbl
from bnv_fusion_tpu import voxel as vx


class Timer:
    """Accumulating phase timer (reference src/utils/common.py:12-21)."""

    def __init__(self, names):
        self.times = {n: 0.0 for n in names}
        self._start: Dict[str, float] = {}

    def start(self, name):
        self._start[name] = time.time()

    def log(self, name):
        self.times[name] += time.time() - self._start.pop(name)


# ---------------------------------------------------------------------------
# Cross-instance jit memo.  Tracing the fused batch step costs ~3.5 s and the
# optimize step ~2 s of single-core host time; a fresh NeuralMap per scene
# (scripts/run_inference.py batches, the e2e bench) re-paid it per instance
# even though the executables were already in the in-process XLA cache.  The
# memo shares the traced jit WRAPPERS across instances, keyed by every static
# the closures bake in (config scalars, frustum window, params identity where
# captured).  Measured: e2e fresh-pipeline retrace ~6 s -> ~0 (RESULTS.md).
_JIT_MEMO: Dict[Any, Any] = {}


def _memo(key, build):
    if key not in _JIT_MEMO:
        _JIT_MEMO[key] = build()
    return _JIT_MEMO[key]


def _params_fingerprint(params) -> tuple:
    """Identity key for a params pytree whose arrays a closure captures.

    Captured jnp arrays are baked into the traced program as constants, so
    wrappers may only be shared between instances holding the SAME arrays
    (same checkpoint load).  The memoized closure keeps the arrays alive,
    so the ids cannot be recycled while the cache entry exists."""
    return tuple(id(x) for x in jax.tree_util.tree_leaves(params))


def _frame_points(depth, T_wc, intr):
    """Back-project one raw frame to oriented world points.

    The pretrained encoder's convention (determined empirically on a fused
    plane): decoded SDF is positive OPPOSITE the input normal.  The
    pipeline needs SDF positive on the camera side — consistent with the
    render loss (gt_depth - sample_depth) and the TSDF prior — so the
    camera-facing normals are negated here.  (The reference carries the
    same quirk: its dataset notes the normals need a *-1 "due to a bug in
    data preparation", reference src/datasets/fusion_inference_dataset.py:
    64-66.)"""
    xyz_cam = geometry.depth_to_xyz(depth, intr)
    valid = (depth > 0).reshape(-1)
    normals_cam = geometry.normals_from_depth(depth, intr, mask=depth > 0)
    pts_w = geometry.transform_points(T_wc, xyz_cam.reshape(-1, 3))
    normals_w = -geometry.rotate_vectors(T_wc, normals_cam.reshape(-1, 3))
    return pts_w, normals_w, valid


class NeuralMap:
    def __init__(self, dimensions: np.ndarray, config, params: Dict[str, Any],
                 working_dir: str = ".", capacity: Optional[int] = None):
        m = config.model
        self.config = config
        self.params = params
        self.working_dir = working_dir
        self.voxel_size = float(m.voxel_size)
        self.feat_dims = int(m.feature_vector_size)
        self.min_pts_in_grid = int(m.min_pts_in_grid)
        self.ray_max_dist = float(m.ray_tracer.ray_max_dist)
        self.truncated_units = int(m.ray_tracer.truncated_units)
        self.truncated_dist = min(
            self.truncated_units * self.voxel_size * 0.5, 0.1)
        self.sdf_delta_weight = float(m.sdf_delta_weight)
        self.train_ray_splits = int(m.train_ray_splits)
        self.sampling_size = int(config.dataset.num_pixels)
        self.dimensions = np.asarray(dimensions, np.float32)

        min_c, max_c, n_xyz = vx.get_world_range(self.dimensions,
                                                 self.voxel_size)
        self.bound_min = jnp.asarray(min_c)
        self.bound_max = jnp.asarray(max_c)
        self.n_xyz = jnp.asarray(n_xyz.astype(np.int32))

        if capacity is None:
            capacity = int(getattr(m, "table_capacity", 1 << 21))
        # table layout routing (VERDICT round-3 item 3): "auto" = the
        # dense/blocks routing of tables.create_table; "spatial" = the map
        # sharded by scene region over trainer.fuse_devices chips
        # (parallel/spatial.py) — the beyond-one-chip-HBM scene story.
        # trainer.fuse_devices > 1 with the default layout = DP local fusion
        # (points sharded, table replicated; parallel/dp.py).
        fd_cfg = getattr(config.trainer, "fuse_devices", 1)
        self._fuse_devices = (jax.device_count()
                              if str(fd_cfg) in ("all", "0") else int(fd_cfg))
        layout = str(getattr(m, "table_layout", "auto"))
        self._spatial_mesh = None
        self._points_fuse_step = None
        if layout == "spatial":
            if self._fuse_devices <= 1:
                raise ValueError("model.table_layout=spatial needs "
                                 "trainer.fuse_devices > 1")
            from bnv_fusion_tpu.parallel import make_mesh
            from bnv_fusion_tpu.parallel import spatial as _sp

            d = self._fuse_devices
            # pad the grid's minor axis so n_vox divides the mesh: padded
            # voxels lie beyond bound_max and are never observed
            nz = int(np.ceil(n_xyz[2] / d) * d) if \
                int(np.prod(n_xyz)) % d else int(n_xyz[2])
            n_xyz = np.asarray([n_xyz[0], n_xyz[1], nz], n_xyz.dtype)
            self.n_xyz = jnp.asarray(n_xyz.astype(np.int32))
            capacity = int(np.ceil(capacity / d) * d)
            self._spatial_mesh = make_mesh(d, axis_name="sp")
            self.table = _sp.create_spatial_table(
                self._spatial_mesh, n_xyz, capacity, self.feat_dims)
        else:
            self.table = tbl.create_table(self.feat_dims, capacity,
                                          n_xyz=n_xyz)

        self.tsdf_voxel_size = float(getattr(m, "tsdf_voxel_size", 0.025))
        # optional RGB fusion into the prior volume (reference frames are
        # rgbd and third_parties/fusion.py fuses color; geometry is unaffected)
        self.fuse_color = bool(getattr(m, "fuse_color", False))
        # prior layout: dense [X,Y,Z] for small scenes; block-major bricks
        # with frustum-exact sparse updates (tsdf.integrate_blocks) once the
        # prior grid outgrows the frustum (model.tsdf_layout=auto routing)
        layout = str(getattr(m, "tsdf_layout", "auto"))
        min_c2, max_c2, _ = vx.get_world_range(self.dimensions,
                                               self.tsdf_voxel_size)
        prior_vox = int(np.prod(np.ceil(
            (max_c2 - min_c2) / self.tsdf_voxel_size)))
        use_blocks = (layout == "blocks" or
                      (layout == "auto" and prior_vox >= 8_000_000))
        if use_blocks:
            self.tsdf_vol, _ = tsdf.create_tsdf_volume_bm(
                self.dimensions, self.tsdf_voxel_size,
                with_color=self.fuse_color)
        else:
            self.tsdf_vol, _ = tsdf.create_tsdf_volume(
                self.dimensions, self.tsdf_voxel_size,
                with_color=self.fuse_color)

        # compaction widths: ints from config, or "auto" = sized from a
        # device-f32 occupancy probe of the first batch (round-4 item 2;
        # the numpy-f64 probe undercounts ~25%, RESULTS.md) with
        # model.width_margin headroom, widened x2 + recompiled if overflow
        # still appears (lag-checked so no launch ever blocks on a fetch)
        mu_raw = getattr(m, "max_unique_per_frame", 1 << 17)
        muc_raw = getattr(m, "max_unique_cells_per_frame", None)
        self._auto_widths = (str(mu_raw).lower() == "auto" or
                             str(muc_raw).lower() == "auto")
        self._width_margin = float(getattr(m, "width_margin", 1.5))
        if self._auto_widths:
            self._widths = None
        else:
            self._widths = (int(mu_raw),
                            int(muc_raw) if muc_raw else None)
        self._overflow_seen = 0
        self._overflow_lag: List[Any] = []

        self.frames: List[Dict[str, Any]] = []
        # fuse-epoch token: bumped on every integrate; the optimize-phase
        # mesh-lattice prefetch is only valid for the epoch it snapshotted
        self._fuse_epoch = 0
        self._mesh_prefetch = None
        # incremental-mesh device snapshot: (weights, num_hits, features)
        # copies + the row count at the last extract_mesh_incremental
        self._inc_prev = None
        self._inc_prev_n = None
        self._fuse_step = None
        self._optim_step = None
        self._optim = None
        self._decode_jit = None
        self._rng_key = jax.random.key(int(getattr(config.trainer, "seed", 0)))
        self.timer = Timer(["local", "global"])
        self._stats: List[float] = []
        self._pending_stats: List[Any] = []

    # ------------------------------------------------------------------
    # local fusion
    # ------------------------------------------------------------------

    def _tsdf_window_for(self, frame) -> tuple | None:
        """Static frustum window for the TSDF prior, when it pays.

        Windowed integration is EXACT (tsdf.frustum_window_shape); it is
        enabled when the frustum covers < 70% of the prior grid (big
        scenes).  The window shape is baked from the first frame's
        intrinsics; integrate() guards that later frames' intrinsics match.
        """
        if frame is None or not bool(getattr(self.config.model,
                                             "tsdf_frustum_window", True)):
            return None
        if isinstance(self.tsdf_vol, tsdf.TSDFVolumeBM):
            return None  # block volumes use frustum-exact sparse updates
        intr = np.asarray(frame["intr_mat"], np.float32)
        hw = np.asarray(frame["depth"]).shape
        shape = self.tsdf_vol.sdf.shape
        window = tsdf.frustum_window_shape(intr, hw, self.ray_max_dist,
                                           self.tsdf_voxel_size, shape)
        if np.prod(window) >= 0.7 * np.prod(shape):
            return None
        self._window_intr = intr
        return window

    def _check_window_intr(self, frames):
        """Rebuild without the frustum window if intrinsics drift (the
        static window was sized for the build-time intrinsics)."""
        if getattr(self, "_window_intr", None) is None:
            return
        for f in frames:
            intr = np.asarray(f["intr_mat"], np.float32)
            if np.abs(intr - self._window_intr).max() > \
                    1e-2 * max(self._window_intr[0, 0],
                               self._window_intr[1, 1]):
                self._window_intr = None
                self._fuse_step = None
                self._fuse_batch_steps = {}
                self._window_disabled = True
                return

    def _tsdf_max_blocks(self, frame0) -> int | None:
        """Static active-block bound for the block-major prior (from the
        build-time frame's intrinsics; drift guarded like the window)."""
        if not isinstance(self.tsdf_vol, tsdf.TSDFVolumeBM):
            return None
        if frame0 is None:
            raise ValueError("block TSDF volume needs a frame to size the "
                             "frustum block budget")
        intr = np.asarray(frame0["intr_mat"], np.float32)
        self._window_intr = intr
        return tsdf.frustum_max_blocks(
            intr, np.asarray(frame0["depth"]).shape, self.ray_max_dist,
            self.tsdf_voxel_size, self.tsdf_vol.nb_xyz)

    def _fuse_step_body(self, frame0=None):
        """The per-frame fusion computation (unjitted; shared by the
        per-frame and batched launchers)."""
        vs = self.voxel_size
        min_pts = self.min_pts_in_grid
        # static compaction width of the sort-reduce fuse path: bounds the
        # number of DISTINCT voxels one frame may touch (overflowing voxels
        # are dropped+counted and picked up by later frames).  Typical frames
        # touch 30-150k voxels; padded ops scale with this, so keep it tight.
        # mu_cells: cell-group width of the cell-keyed path (unique CELLS <=
        # unique corner voxels, so a tighter width shrinks the stage-2 sort)
        max_unique, mu_cells = self._width_values()
        tsdf_vs = self.tsdf_voxel_size
        fuse_dtype = jnp.bfloat16 if str(getattr(
            self.config.model, "fuse_dtype", "float32")) == "bfloat16" \
            else jnp.float32
        algorithm = str(getattr(self.config.model, "fuse_algorithm", "cell"))
        window = (None if getattr(self, "_window_disabled", False)
                  else self._tsdf_window_for(frame0))
        max_blocks = self._tsdf_max_blocks(frame0)
        max_depth = self.ray_max_dist

        fuse_color = self.fuse_color

        def body(table, tsdf_vol, params, depth, T_wc, intr,
                 bound_min, bound_max, rgb=None):
            pts_w, normals_w, valid = _frame_points(depth, T_wc, intr)
            table, stats = fusion.fuse_frame(
                table, params, pts_w, normals_w, valid, bound_min, bound_max,
                vs, min_pts, compute_dtype=fuse_dtype,
                max_unique=max_unique, algorithm=algorithm,
                max_unique_cells=mu_cells)
            if max_blocks is not None:
                tsdf_vol = tsdf.integrate_blocks(
                    tsdf_vol, depth, intr, T_wc, tsdf_vs, max_blocks,
                    max_depth, rgb=rgb if fuse_color else None)
            elif window is not None:
                tsdf_vol = tsdf.integrate_windowed(
                    tsdf_vol, depth, intr, T_wc, tsdf_vs, window, max_depth,
                    rgb=rgb if fuse_color else None)
            else:
                tsdf_vol = tsdf.integrate(
                    tsdf_vol, depth, intr, T_wc, tsdf_vs,
                    rgb=rgb if fuse_color else None)
            return table, tsdf_vol, stats

        return body

    def _fuse_statics_key(self, frame0) -> tuple:
        """Every static the fuse-step closures bake in (memo key part)."""
        m = self.config.model
        max_unique, mu_cells = self._width_values()
        mu_batch = getattr(m, "max_unique_per_batch", None)
        if str(mu_batch).lower() == "auto":
            mu_batch = None  # derived (2x max_unique) inside fusion
        window = (None if getattr(self, "_window_disabled", False)
                  else self._tsdf_window_for(frame0))
        return (
            self.voxel_size, self.min_pts_in_grid,
            max_unique, mu_cells,
            int(mu_batch) if mu_batch else None,
            self.tsdf_voxel_size,
            str(getattr(m, "fuse_dtype", "float32")),
            str(getattr(m, "fuse_algorithm", "cell")),
            self.fuse_color, self.ray_max_dist,
            window, self._tsdf_max_blocks(frame0),
            int(getattr(m, "tsdf_every", 1)),
            str(getattr(m, "use_seg_reduce_kernel", "auto")).lower(),
            bool(getattr(m, "fuse_sort_bf16", False)),
            bool(getattr(m, "fuse_sort1_gather", False)),
            bool(getattr(m, "fuse_batch_merge", True)),
            int(getattr(m, "fuse_front_chunks", 1)),
        )

    # ------------------------------------------------------------------
    # compaction-width sizing (model.max_unique_per_frame=auto)
    # ------------------------------------------------------------------

    def _width_values(self) -> tuple:
        """(max_unique_per_frame, max_unique_cells_per_frame) — resolved."""
        if self._widths is None:
            raise RuntimeError(
                "auto compaction widths not sized yet — the first "
                "integrate/integrate_batch call probes them")
        return self._widths

    @staticmethod
    def _next_pow2(x: int) -> int:
        return 1 << max(int(x) - 1, 1).bit_length()

    def _probe_width_counts(self, depths, T_wcs, intrs):
        """Device-f32 occupancy of a frame batch: per-frame (unique cell
        groups, unique corner voxels) as [K] arrays (fusion.frame_width_counts
        vmapped; one compile per frame shape, memoized)."""
        vs = self.voxel_size
        n_vox = int(np.prod(np.asarray(self.n_xyz)))
        n_xyz, bound_min, bound_max = self.n_xyz, self.bound_min, \
            self.bound_max

        key = ("widthprobe", vs, n_vox,
               np.asarray(n_xyz).tobytes(),
               np.asarray(self.bound_min).tobytes(),
               np.asarray(self.bound_max).tobytes())

        def build():
            @jax.jit
            def probe(depths, T_wcs, intrs):
                def one(depth, T_wc, intr):
                    pts_w, _, valid = _frame_points(depth, T_wc, intr)
                    return fusion.frame_width_counts(
                        pts_w, valid, bound_min, bound_max, vs, n_xyz, n_vox)

                return jax.vmap(one)(depths, T_wcs, intrs)

            return probe

        return _memo(key, build)(depths, T_wcs, intrs)

    def _size_widths(self, depths, T_wcs, intrs):
        """Set self._widths from a probe of this batch + width_margin:
        u_cell -> next pow2 (the stage-2 sort input is 8*u_cell and
        lax.sort's bitonic network pads to pow2 anyway), corner width ->
        4096 multiple capped at 8*u_cell."""
        g, c = self._probe_width_counts(depths, T_wcs, intrs)
        g_max, c_max = int(np.max(np.asarray(g))), int(np.max(np.asarray(c)))
        m = self._width_margin
        u_cell = self._next_pow2(max(int(g_max * m), 4096))
        mu = min(-(-int(c_max * m) // 4096) * 4096, 8 * u_cell)
        self._widths = (mu, u_cell)
        log_msg = (f"auto widths: probed g_max={g_max} c_max={c_max} over "
                   f"{len(np.asarray(g))} frames -> "
                   f"max_unique_per_frame={mu} cells={u_cell}")
        from bnv_fusion_tpu.utils.logging import get_logger
        get_logger(__name__).info(log_msg)

    def _note_overflow(self, flush: bool = False):
        """Lag-checked overflow monitor (auto mode): enqueue the current
        device counter; fetch entries >= 2 launches old (already computed —
        the fetch never stalls the dispatch pipeline).  On growth, widen
        from a re-probe of the latest batch and rebuild the fuse steps."""
        if not self._auto_widths:
            return
        # detach: the table is DONATED to the next fuse launch, which
        # deletes this buffer before the lagged fetch below would read it
        # (jnp.sum: the spatial layout keeps a per-shard counter array)
        self._overflow_lag.append(jnp.sum(self.table.overflow) + 0)
        depth = 0 if flush else 2
        while len(self._overflow_lag) > depth:
            val = int(np.asarray(self._overflow_lag.pop(0)))
            if val > self._overflow_seen:
                self._overflow_seen = val
                self._widen()

    def _widen(self):
        """Overflow appeared despite the probe: re-probe the latest staged
        batch and grow widths to max(probe*margin, 1.5x current)."""
        from bnv_fusion_tpu.utils.logging import get_logger

        cur_mu, cur_cell = self._widths
        new_mu, new_cell = int(cur_mu * 1.5), self._next_pow2(cur_cell + 1)
        staged = getattr(self, "_last_staged_dev", None)
        if staged is not None:
            g, c = self._probe_width_counts(*staged)
            m = self._width_margin
            new_cell = max(new_cell,
                           self._next_pow2(int(np.max(np.asarray(g)) * m)))
            new_mu = max(new_mu, -(-int(np.max(np.asarray(c)) * m)
                                   // 4096) * 4096)
        new_mu = min(-(-new_mu // 4096) * 4096, 8 * new_cell)
        get_logger(__name__).warning(
            f"table overflow {self._overflow_seen} with widths "
            f"({cur_mu}, {cur_cell}) — widening to ({new_mu}, {new_cell}) "
            f"and recompiling the fuse step")
        self._widths = (new_mu, new_cell)
        self._fuse_step = None
        self._fuse_batch_steps = {}
        self._points_fuse_step = None
        # counters already enqueued (and the table's cumulative counter
        # itself) record drops under the OLD widths; fast-forward the
        # monitor so they cannot trigger a second spurious widen — each
        # widen costs a full fuse-step recompile (20-400 s remote)
        self._overflow_lag.clear()
        self._overflow_seen = max(
            self._overflow_seen,
            int(np.sum(np.asarray(self.table.overflow))))

    @property
    def overflow(self) -> int:
        """Total voxels/cells dropped by the static compaction widths (0 =
        every observation landed; surfaced at end of run by run_e2e)."""
        return int(np.sum(np.asarray(self.table.overflow)))

    def _build_fuse_step(self, frame0=None):
        key = ("fuse1",) + self._fuse_statics_key(frame0)
        return _memo(key, lambda: jax.jit(self._fuse_step_body(frame0),
                                          donate_argnums=(0, 1)))

    def _build_fuse_batch_step(self, k: int, frame0=None):
        key = ("fuseK", k) + self._fuse_statics_key(frame0)
        return _memo(key, lambda: self._build_fuse_batch_step_uncached(
            k, frame0))

    def _build_fuse_batch_step_uncached(self, k: int, frame0=None):
        single = self._fuse_step_body(frame0)
        m = self.config.model
        algorithm = str(getattr(m, "fuse_algorithm", "cell"))
        merged = bool(getattr(m, "fuse_batch_merge", True)) and \
            algorithm.startswith("cell")
        if not merged:
            @partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
            def step(table, tsdf_vol, params, depths, T_wcs, intrs,
                     bound_min, bound_max, rgbs=None):
                def body(carry, frame):
                    table, tsdf_vol = carry
                    depth, T_wc, intr = frame[0], frame[1], frame[2]
                    rgb = frame[3] if len(frame) > 3 else None
                    table, tsdf_vol, stats = single(
                        table, tsdf_vol, params, depth, T_wc, intr,
                        bound_min, bound_max, rgb=rgb)
                    return (table, tsdf_vol), stats

                xs = (depths, T_wcs, intrs) if rgbs is None else \
                    (depths, T_wcs, intrs, rgbs)
                (table, tsdf_vol), stats = jax.lax.scan(
                    body, (table, tsdf_vol), xs)
                return table, tsdf_vol, stats

            return step

        # merged fast path: ONE table insert+update for the whole K-frame
        # batch (fusion.fuse_frames_merged; the per-frame scatter update was
        # the largest cost of the scanned launch — 17 ms/frame on v5e).
        # The TSDF prior stays a per-frame scan (dense elementwise update).
        vs = self.voxel_size
        min_pts = self.min_pts_in_grid
        max_unique, mu_cells = self._width_values()
        mu_batch = getattr(m, "max_unique_per_batch", None)
        if str(mu_batch).lower() == "auto":
            mu_batch = None
        mu_batch = int(mu_batch) if mu_batch else None
        tsdf_vs = self.tsdf_voxel_size
        fuse_dtype = jnp.bfloat16 if str(getattr(
            m, "fuse_dtype", "float32")) == "bfloat16" else jnp.float32
        fuse_color = self.fuse_color
        window = (None if getattr(self, "_window_disabled", False)
                  else self._tsdf_window_for(frame0))
        max_blocks = self._tsdf_max_blocks(frame0)
        max_depth = self.ray_max_dist
        tsdf_every = int(getattr(m, "tsdf_every", 1))

        # batched Pallas segmented-reduce kernel: a pallas_call costs ~4 ms
        # FIXED on the tunneled TPU runtime, so the kernel only pays when
        # the K frames of a launch share one call (fusion.
        # _cellsort_reduce_batched); "auto" = on for TPU, off for CPU
        sk_cfg = str(getattr(m, "use_seg_reduce_kernel", "auto")).lower()
        if sk_cfg == "auto":
            seg_kernel = jax.devices()[0].platform != "cpu"
        elif sk_cfg == "interpret":
            seg_kernel = "interpret"
        else:
            seg_kernel = sk_cfg in ("true", "1")

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(table, tsdf_vol, params, depths, T_wcs, intrs,
                 bound_min, bound_max, rgbs=None):
            pts_w, normals_w, valid = jax.vmap(_frame_points)(
                depths, T_wcs, intrs)
            table, stats = fusion.fuse_frames_merged(
                table, params, pts_w, normals_w, valid, bound_min,
                bound_max, vs, min_pts, compute_dtype=fuse_dtype,
                max_unique=max_unique, max_unique_cells=mu_cells,
                max_unique_batch=mu_batch, seg_kernel=seg_kernel,
                sort_bf16=bool(getattr(m, "fuse_sort_bf16", False)),
                sort1_gather=bool(getattr(m, "fuse_sort1_gather", False)),
                front_chunks=int(getattr(m, "fuse_front_chunks", 1)))

            # TSDF prior stays a per-frame scan: the vmapped single-pass
            # variant (tsdf.integrate_batch) materializes K dense
            # intermediates and measured slightly SLOWER on v5e (21.4 vs
            # 21.95 fps at K=8); the scan's sequential read-modify-write of
            # the 6 MB volume wins.
            # model.tsdf_every=e subsamples the prior's temporal cadence
            # (every e-th frame at obs_weight=e — same total weight); the
            # depth gather is the update's irreducible cost and scales
            # directly with cadence
            def tsdf_body(vol, frame):
                depth, T_wc, intr = frame[0], frame[1], frame[2]
                rgb = frame[3] if len(frame) > 3 else None
                if max_blocks is not None:
                    vol = tsdf.integrate_blocks(
                        vol, depth, intr, T_wc, tsdf_vs, max_blocks,
                        max_depth, obs_weight=float(tsdf_every),
                        rgb=rgb if fuse_color else None)
                elif window is not None:
                    vol = tsdf.integrate_windowed(
                        vol, depth, intr, T_wc, tsdf_vs, window, max_depth,
                        obs_weight=float(tsdf_every),
                        rgb=rgb if fuse_color else None)
                else:
                    vol = tsdf.integrate(vol, depth, intr, T_wc, tsdf_vs,
                                         obs_weight=float(tsdf_every),
                                         rgb=rgb if fuse_color else None)
                return vol, None

            xs = (depths, T_wcs, intrs) if rgbs is None else \
                (depths, T_wcs, intrs, rgbs)
            if tsdf_every > 1:
                xs = jax.tree.map(lambda x: x[::tsdf_every], xs)
            tsdf_vol, _ = jax.lax.scan(tsdf_body, tsdf_vol, xs)
            return table, tsdf_vol, stats

        return step

    def _stack_batch(self, keep: List[Dict[str, Any]]):
        """Host-side numpy stacking of a frame batch (the only serial host
        work of integrate_batch — ~2 ms/frame at 480x640; integrate_batches
        overlaps it with the previous batch's device compute)."""
        out = {}
        if all(f.get("depth_raw") is not None for f in keep):
            scales = {float(f.get("depth_scale", 1000.0)) for f in keep}
            if len(scales) != 1:
                raise ValueError("mixed depth_scale within one batch")
            out["raw"] = np.stack(
                [np.asarray(f["depth_raw"], np.uint16) for f in keep])
            out["scale"] = next(iter(scales))
        else:
            out["depth"] = np.stack(
                [np.asarray(f["depth"], np.float32) for f in keep])
        out["T_wc"] = np.stack(
            [np.asarray(f["T_wc"], np.float32) for f in keep])
        out["intr"] = np.stack(
            [np.asarray(f["intr_mat"], np.float32) for f in keep])
        if self.fuse_color:
            out["rgb"] = np.stack([self._frame_rgb(f) for f in keep])
        return out

    def integrate_batch(self, frames: List[Dict[str, Any]], staged=None):
        """Fuse K frames in ONE device launch (lax.scan, sequential
        semantics identical to per-frame integrate).

        On the tunneled TPU runtime each launch costs ~65 ms of dispatch
        overhead on top of ~65 ms of device compute per 480x640 frame;
        batching amortizes the former.  Latency is bounded by K frames —
        per-frame `integrate` remains the low-latency online path.
        ``staged`` optionally passes the _stack_batch result (prefetched
        on another thread by integrate_batches).
        """
        k = len(frames)
        if k == 0:
            return
        if self._fuse_devices > 1:
            # multi-chip fuse paths are per-frame steps (the K-merge is a
            # single-chip dispatch-amortization; sharded launches already
            # amortize over the mesh)
            for f in frames:
                self.integrate(f)
            return
        key = ("batch", k)
        if getattr(self, "_fuse_batch_steps", None) is None:
            self._fuse_batch_steps = {}
        keep = [f for f in frames
                if not np.any(np.isnan(np.asarray(f["T_wc"])))]
        if not keep:
            return
        self._check_window_intr(keep)
        if staged is None or len(keep) != len(frames):
            staged = self._stack_batch(keep)
        if "raw" in staged:
            # sensor-native uint16 depth (4x less tunnel traffic than f32),
            # converted on device; the f32 stays device-resident for the
            # optimization ray pool
            depths = self._convert_raw_depth(jnp.asarray(staged["raw"]),
                                             staged["scale"])
        else:
            depths = jnp.asarray(staged["depth"])
        T_wcs = jnp.asarray(staged["T_wc"])
        intrs = jnp.asarray(staged["intr"])
        rgbs = jnp.asarray(staged["rgb"]) if "rgb" in staged else None
        if self._auto_widths:
            if self._widths is None:
                self._size_widths(depths, T_wcs, intrs)
            self._last_staged_dev = (depths, T_wcs, intrs)
        if key not in self._fuse_batch_steps:
            self._fuse_batch_steps[key] = self._build_fuse_batch_step(
                k, keep[0])
        self.table, self.tsdf_vol, stats = self._fuse_batch_steps[key](
            self.table, self.tsdf_vol, self.params, depths, T_wcs, intrs,
            self.bound_min, self.bound_max, rgbs)
        self._note_overflow()
        # keep the DEVICE array: fetching it here would synchronize the
        # dispatch pipeline every launch (~12 ms/frame measured on the
        # tunneled runtime); consumers read ``stats`` lazily at end of run
        self._pending_stats.append(stats.n_avg_pts)
        self._fuse_epoch += 1
        for f, d, t, i in zip(keep, depths, T_wcs, intrs):
            self.frames.append({"depth": d, "T_wc": t, "intr": i,
                                "frame_id": f.get("frame_id")})

    def integrate_batches(self, batches: List[List[Dict[str, Any]]]):
        """Fuse several K-frame batches, overlapping each batch's host-side
        numpy stacking with the previous batch's (async) device dispatch —
        the streaming condition where sensor frames arrive while the chip
        fuses.  Semantics identical to sequential integrate_batch calls."""
        import concurrent.futures as _cf

        if not batches:
            return
        with _cf.ThreadPoolExecutor(max_workers=1) as pool:
            nxt = None
            for i, b in enumerate(batches):
                staged = nxt.result() if nxt is not None else None
                if i + 1 < len(batches):
                    nb = [f for f in batches[i + 1]
                          if not np.any(np.isnan(np.asarray(f["T_wc"])))]
                    nxt = (pool.submit(self._stack_batch, nb)
                           if len(nb) == len(batches[i + 1]) else None)
                else:
                    nxt = None
                self.integrate_batch(b, staged=staged)

    def integrate(self, frame: Dict[str, Any]):
        """Fuse one frame (reference run_e2e.py:78-109) and keep its raw
        depth + pose for the global optimization ray pool."""
        # NaN poses are skipped defensively (reference run_e2e.py:121,253);
        # checked on host input to avoid a device sync in the hot loop
        if np.any(np.isnan(np.asarray(frame["T_wc"]))):
            return None
        self._check_window_intr([frame])
        if self._fuse_devices > 1:
            return self._integrate_points_sharded(frame)
        depth = jnp.asarray(frame["depth"], jnp.float32)
        T_wc = jnp.asarray(frame["T_wc"], jnp.float32)
        intr = jnp.asarray(frame["intr_mat"], jnp.float32)
        if self._auto_widths:
            if self._widths is None:
                self._size_widths(depth[None], T_wc[None], intr[None])
            self._last_staged_dev = (depth[None], T_wc[None], intr[None])
        if self._fuse_step is None:
            self._fuse_step = self._build_fuse_step(frame)
        rgb = jnp.asarray(self._frame_rgb(frame)) if self.fuse_color else None
        self.table, self.tsdf_vol, stats = self._fuse_step(
            self.table, self.tsdf_vol, self.params, depth, T_wc, intr,
            self.bound_min, self.bound_max, rgb)
        self._note_overflow()
        self._stats.append(float(stats.n_avg_pts))
        self._fuse_epoch += 1
        self.frames.append({"depth": depth, "T_wc": T_wc, "intr": intr,
                            "frame_id": frame.get("frame_id")})

    # ------------------------------------------------------------------
    # multi-chip local fusion (trainer.fuse_devices > 1)
    # ------------------------------------------------------------------

    def _frame_points_jit(self, n_pad: int):
        """Memoized jit: raw frame -> oriented world points, padded to a
        multiple of the fuse mesh size (pad rows carry valid=False)."""
        key = ("framepts", n_pad)

        def build():
            @jax.jit
            def fn(depth, T_wc, intr):
                pts, normals, valid = _frame_points(depth, T_wc, intr)
                pad = n_pad - pts.shape[0]
                if pad:
                    pts = jnp.concatenate(
                        [pts, jnp.zeros((pad, 3), pts.dtype)])
                    normals = jnp.concatenate(
                        [normals, jnp.zeros((pad, 3), normals.dtype)])
                    valid = jnp.concatenate(
                        [valid, jnp.zeros((pad,), valid.dtype)])
                return pts, normals, valid

            return fn

        return _memo(key, build)

    def _tsdf_prior_jit(self, frame0):
        """Memoized jitted TSDF-prior update for the sharded fuse paths
        (the single-chip path fuses it into _fuse_step_body)."""
        tsdf_vs = self.tsdf_voxel_size
        window = (None if getattr(self, "_window_disabled", False)
                  else self._tsdf_window_for(frame0))
        max_blocks = self._tsdf_max_blocks(frame0)
        max_depth = self.ray_max_dist
        key = ("tsdfprior", tsdf_vs, window, max_blocks, max_depth)

        def build():
            @jax.jit
            def fn(vol, depth, T_wc, intr):
                if max_blocks is not None:
                    return tsdf.integrate_blocks(vol, depth, intr, T_wc,
                                                 tsdf_vs, max_blocks,
                                                 max_depth)
                if window is not None:
                    return tsdf.integrate_windowed(vol, depth, intr, T_wc,
                                                   tsdf_vs, window, max_depth)
                return tsdf.integrate(vol, depth, intr, T_wc, tsdf_vs)

            return fn

        return _memo(key, build)

    def _integrate_points_sharded(self, frame):
        """One frame through the points-sharded fuse step: DP (replicated
        table, parallel/dp.py) or spatial (sharded table, parallel/spatial
        .py) depending on model.table_layout — the multi-chip local-fusion
        paths (VERDICT round-3 items 3 and 6)."""
        from bnv_fusion_tpu.parallel import dp as _dp
        from bnv_fusion_tpu.parallel import make_mesh
        from bnv_fusion_tpu.parallel import spatial as _sp

        depth = jnp.asarray(frame["depth"], jnp.float32)
        T_wc = jnp.asarray(frame["T_wc"], jnp.float32)
        intr = jnp.asarray(frame["intr_mat"], jnp.float32)
        if self._auto_widths and self._widths is None:
            self._size_widths(depth[None], T_wc[None], intr[None])
        d = self._fuse_devices
        n = int(np.prod(depth.shape))
        n_pad = int(np.ceil(n / d) * d)
        pts, normals, valid = self._frame_points_jit(n_pad)(depth, T_wc, intr)
        if self._points_fuse_step is None:
            max_unique, mu_cells = self._width_values()
            spatial = self._spatial_mesh is not None
            key = ("ptsfuse", spatial, d, self.voxel_size,
                   self.min_pts_in_grid, max_unique, mu_cells,
                   _params_fingerprint(self.params))
            if spatial:
                self._points_fuse_step = _memo(
                    key, lambda: _sp.make_spatial_fuse_frame(
                        self._spatial_mesh, self.params, self.voxel_size,
                        self.min_pts_in_grid, max_unique=max_unique,
                        max_unique_cells=mu_cells))
            else:
                self._points_fuse_step = _memo(
                    key, lambda: _dp.make_sharded_fuse_frame(
                        make_mesh(d), self.params, self.voxel_size,
                        self.min_pts_in_grid, example_table=self.table,
                        max_unique=max_unique, max_unique_cells=mu_cells))
        self.table, stats = self._points_fuse_step(
            self.table, pts, normals, valid, self.bound_min, self.bound_max)
        self.tsdf_vol = self._tsdf_prior_jit(frame)(
            self.tsdf_vol, depth, T_wc, intr)
        if self._auto_widths:
            self._last_staged_dev = (depth[None], T_wc[None], intr[None])
        self._note_overflow()
        self._pending_stats.append(stats.n_avg_pts)
        self._fuse_epoch += 1
        self.frames.append({"depth": depth, "T_wc": T_wc, "intr": intr,
                            "frame_id": frame.get("frame_id")})

    def _spatial_view(self):
        """A standard-semantics view of the spatially sharded table: the
        slot map rewritten to GLOBAL value rows (shard * capacity_per_shard
        + local slot), counters summed.  Decode/optimize run the exact
        single-device code on this view — XLA's partitioner turns the row
        gathers into cross-shard collectives."""
        d = self._fuse_devices

        def build():
            @jax.jit
            def view(table):
                nv_shard = table.slot_map.shape[0] // d
                cap_shard = table.features.shape[0] // d
                shard = (jnp.arange(table.slot_map.shape[0], dtype=jnp.int32)
                         // nv_shard)
                gmap = jnp.where(table.slot_map >= 0,
                                 table.slot_map + shard * cap_shard, -1)
                return table.replace(
                    slot_map=gmap,
                    n_alloc=jnp.sum(table.n_alloc),
                    overflow=jnp.sum(table.overflow))

            return view

        return _memo(("spview", d), build)(self.table)

    def _convert_raw_depth(self, raw, scale: float):
        """uint16 sensor depth -> metric f32 on device (same semantics as
        datasets.canonical.load_depth_png: /scale, zero at >= max_depth)."""
        if getattr(self, "_raw_depth_jit", None) is None:
            max_depth = self.ray_max_dist

            @jax.jit
            def conv(raw, scale):
                d = raw.astype(jnp.float32) / scale
                return jnp.where(d < max_depth, d, 0.0)

            self._raw_depth_jit = conv
        return self._raw_depth_jit(raw, jnp.float32(scale))

    @property
    def stats(self) -> List[float]:
        """Per-frame n_avg_pts values (device fetches deferred to here)."""
        if self._pending_stats:
            for s in self._pending_stats:
                self._stats.extend(np.asarray(s).reshape(-1).tolist())
            self._pending_stats = []
        return self._stats

    def _frame_rgb(self, frame) -> np.ndarray:
        """RGB for a frame (loaded lazily from img_path if not inline)."""
        if frame.get("rgb") is not None:
            return np.asarray(frame["rgb"], np.float32)
        path = frame.get("img_path")
        if path and os.path.exists(path):
            import cv2

            img = cv2.imread(path, cv2.IMREAD_COLOR)[..., ::-1]
            h, w = np.asarray(frame["depth"]).shape
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            return img.astype(np.float32)
        raise ValueError(
            "model.fuse_color is on but the frame carries neither 'rgb' nor "
            "a readable 'img_path'")

    # ------------------------------------------------------------------
    # global fusion
    # ------------------------------------------------------------------

    def optimize(self, n_iters: int, last_frame: int = -1,
                 lr: float = 1e-3, frame_order: str | None = None):
        """Render-loss optimization of the latents
        (reference run_e2e.py:111-162).

        ``frame_order``: "random" draws frames i.i.d. from the pool (the
        online loop, reference run_e2e.py:116); "epoch" sweeps the pool
        sequentially, wrapping — the reference refiner's full per-epoch
        pass over all frames (fusion_refiner.py:288-315).  ``None`` reads
        ``trainer.optim_frame_order`` (default random).

        ``trainer.optim_early_stop`` treats ``n_iters`` as a CEILING and
        stops when the render loss plateaus: per launch group the mean
        loss is fetched one launch LATE (the value is already computed, so
        the fetch never stalls the dispatch pipeline) and the loop exits
        after ``optim_es_patience`` consecutive groups without a relative
        improvement of at least ``optim_es_rel`` over the best seen.  The
        reference has no such control — its iteration count is the fixed
        n_frames*skip(*2) formula (run_e2e.py:284-287)."""
        if not self.frames:
            return
        if frame_order is None:
            frame_order = str(getattr(self.config.trainer,
                                      "optim_frame_order", "random"))
        # overlap the mesh sample-lattice build (pure host work on the
        # immutable key set) with the optimize launches — the final
        # extract_mesh consumes it and skips its longest serial stage
        self.prefetch_mesh_lattice()
        n_dev = self._optimize_devices()
        if n_dev > 1:
            return self._optimize_sharded(n_iters, last_frame, lr,
                                          frame_order, n_dev)
        error_guided = bool(getattr(self.config.model,
                                    "error_guided_sampling", False))
        if getattr(self, "_optim_lr", None) != lr:
            self._optim_step = None  # lr is baked into the jitted step
            self._optim_lr = lr
        if self._optim_step is None:
            kwargs = dict(
                voxel_size=self.voxel_size,
                min_pts_in_grid=self.min_pts_in_grid,
                truncated_units=self.truncated_units,
                truncated_dist=self.truncated_dist,
                ray_max_dist=self.ray_max_dist, n_rays=self.sampling_size,
                train_ray_splits=self.train_ray_splits, lr=lr,
                neighbor_kernel=int(getattr(self.config.model,
                                            "neighbor_kernel", 3)),
                # render-loss forward/backward precision (Adam state and
                # the latent features themselves stay float32 either way)
                compute_dtype=(jnp.bfloat16 if str(getattr(
                    self.config.model, "optim_dtype", "float32"))
                    == "bfloat16" else jnp.float32),
                error_guided=error_guided,
                decode_layout=str(getattr(self.config.model,
                                          "decode_layout", "rows")),
                parallel_chunks=bool(getattr(
                    self.config.model, "parallel_ray_chunks", False)),
                # 0 = the reference sample-count formula (fine=2*units,
                # coarse=5/m); nonzero overrides are a gated speed knob
                n_fine=int(getattr(self.config.model.ray_tracer,
                                   "n_fine", 0) or 0),
                n_coarse=int(getattr(self.config.model.ray_tracer,
                                     "n_coarse", 0) or 0),
                # sort-reduced cotangent accumulation (float-reassociation-
                # only deviation, quality-gated; "scatter" = plain path)
                grad_scatter=str(getattr(self.config.model,
                                         "grad_scatter", "sortreduce")))
            # the step closures capture self.params -> key by identity
            key = (("optim", _params_fingerprint(self.params))
                   + tuple(sorted(kwargs.items())))
            self._optim, self._optim_step, self._optim_multi = _memo(
                key, lambda: optimize.make_optimize_step(
                    self.params, **kwargs))
        sdf_delta = tsdf.prepare_sdf_delta(
            self.tsdf_vol, self.tsdf_voxel_size, self.truncated_dist,
            self.sdf_delta_weight)
        # spatial tables optimize through the global-row view (same code,
        # XLA partitions the gathers); features/weights rows are global in
        # both layouts so the write-back below is layout-agnostic
        opt_table = (self._spatial_view() if self._spatial_mesh is not None
                     else self.table)
        # NOTE: state.features aliases self.table.features, and the first
        # donated launch DELETES that buffer (the step only reads features
        # through state; the table arg's features leaf is pruned).  Nothing
        # may read self.table.features until the replace() at the end of
        # this method re-points it at the live state buffer.
        state = optimize.init_optim_state(self._optim, opt_table)

        lo = 0 if last_frame < 0 else max(0, last_frame)
        frame_pool = self.frames[lo:]
        if error_guided and getattr(self, "_error_maps", None) is None:
            self._error_maps = {}

        def frame_error_map(global_i, depth_shape):
            if global_i not in self._error_maps:
                patch = int(getattr(self.config.model, "error_patch", 16))
                self._error_maps[global_i] = sampler.create_error_maps(
                    1, depth_shape, patch)[0]
            return self._error_maps[global_i]

        # group iterations per device launch (amortizes dispatch overhead)
        group = int(getattr(self.config.model, "optim_iters_per_launch", 4))
        es_on = bool(getattr(self.config.trainer, "optim_early_stop", False))
        es_rel = float(getattr(self.config.trainer, "optim_es_rel", 0.005))
        es_patience = int(getattr(self.config.trainer, "optim_es_patience", 3))
        es_pending: List[Any] = []   # (iters-at-launch, device losses)
        es_best, es_stale = float("inf"), 0
        rng = np.random.RandomState(
            int(jax.random.randint(self._rng_key, (), 0, 2 ** 31 - 1)))
        self._rng_key, _ = jax.random.split(self._rng_key)
        lr_scales = self._optim_lr_scales(n_iters)
        done = 0
        while done < int(n_iters):
            k = min(group, int(n_iters) - done)
            if frame_order == "epoch":
                fis = (done + np.arange(k)) % len(frame_pool)
            else:
                fis = rng.randint(0, len(frame_pool), size=k)
            lss = jnp.asarray(lr_scales[done:done + k])
            depths = jnp.stack([frame_pool[i]["depth"] for i in fis])
            T_wcs = jnp.stack([frame_pool[i]["T_wc"] for i in fis])
            intrs = jnp.stack([frame_pool[i]["intr"] for i in fis])
            self._rng_key, k_step = jax.random.split(self._rng_key)
            keys = jax.random.split(k_step, k)
            if error_guided:
                emaps = jnp.stack([
                    frame_error_map(lo + i, frame_pool[i]["depth"].shape)
                    for i in fis])
            if k == group:
                if error_guided:
                    state, losses, new_maps = self._optim_multi(
                        state, opt_table, depths, T_wcs, intrs,
                        self.bound_min, self.n_xyz, sdf_delta, keys, emaps,
                        lr_scales=lss)
                    for j, i in enumerate(fis):
                        self._error_maps[lo + i] = new_maps[j]
                else:
                    state, losses = self._optim_multi(
                        state, opt_table, depths, T_wcs, intrs,
                        self.bound_min, self.n_xyz, sdf_delta, keys,
                        lr_scales=lss)
            else:  # remainder: per-iteration launches (no extra compiles)
                for j in range(k):
                    if error_guided:
                        state, _, new_map = self._optim_step(
                            state, opt_table, depths[j], T_wcs[j], intrs[j],
                            self.bound_min, self.n_xyz, sdf_delta, keys[j],
                            emaps[j], lr_scale=lss[j])
                        self._error_maps[lo + fis[j]] = new_map
                    else:
                        state, _ = self._optim_step(
                            state, opt_table, depths[j], T_wcs[j], intrs[j],
                            self.bound_min, self.n_xyz, sdf_delta, keys[j],
                            lr_scale=lss[j])
            done += k
            if es_on and k == group:
                es_pending.append(losses)
                # fetch one launch late: the value is computed by the time
                # the NEXT launch is dispatched, so np.asarray returns
                # without draining the async queue
                if len(es_pending) > 1:
                    val = float(np.mean(np.asarray(es_pending.pop(0))))
                    if val < es_best * (1.0 - es_rel):
                        es_best, es_stale = val, 0
                    else:
                        es_stale += 1
                    if es_stale >= es_patience:
                        break
        self.last_optimize_iters = done
        # write optimized features (and bumped weights) back into the map
        self.table = self.table.replace(features=state.features,
                                        weights=state.weights)

    def _optim_lr_scales(self, n_iters: int) -> np.ndarray:
        """Per-iteration lr multipliers (``trainer.optim_lr_schedule``).

        "const" (default) = the reference's fixed Adam lr
        (run_e2e.py:118); "cosine"/"linear" decay to
        ``trainer.optim_lr_end_frac`` x lr over the ``n_iters`` horizon
        (the ceiling when early stopping is on).  Applied as an exact
        per-iteration update scale (optimize.make_optimize_step lr_scale),
        so "const" is bit-identical to the unscheduled step."""
        sched = str(getattr(self.config.trainer, "optim_lr_schedule",
                            "const"))
        n = max(int(n_iters), 1)
        if sched == "const":
            return np.ones(n, np.float32)
        end = float(getattr(self.config.trainer, "optim_lr_end_frac", 0.1))
        t = np.arange(n, dtype=np.float32) / max(n - 1, 1)
        if sched == "cosine":
            s = end + (1.0 - end) * 0.5 * (1.0 + np.cos(np.pi * t))
        elif sched == "linear":
            s = 1.0 + (end - 1.0) * t
        else:
            raise ValueError(
                f"unknown trainer.optim_lr_schedule: {sched!r} "
                "(const | cosine | linear)")
        return s.astype(np.float32)

    def _optimize_devices(self) -> int:
        """trainer.optimize_devices: 1 = single chip (default), N = shard
        rays over an N-device DP mesh, "all"/0 = every visible device."""
        cfg = getattr(self.config.trainer, "optimize_devices", 1)
        if str(cfg) in ("all", "0"):
            return jax.device_count()
        return int(cfg)

    def _optimize_sharded(self, n_iters: int, last_frame: int, lr: float,
                          frame_order: str, n_dev: int):
        """Ray-DP global fusion over an n_dev mesh
        (parallel.make_sharded_optimize_iter; VERDICT round-2 item 2).

        Iteration semantics match the single-device path exactly (shared
        RNG structure, psum-ed masked mean, pmax bumps) — see
        tests/test_parallel.py::test_neural_map_sharded_optimize."""
        from bnv_fusion_tpu.parallel import (make_mesh,
                                             make_sharded_optimize_iter)

        if bool(getattr(self.config.model, "error_guided_sampling", False)):
            raise ValueError(
                "error_guided_sampling is not supported with "
                "trainer.optimize_devices > 1 (the per-frame error maps are "
                "host state); set one or the other")
        if self._spatial_mesh is not None:
            raise ValueError(
                "trainer.optimize_devices > 1 (ray DP) cannot be combined "
                "with model.table_layout=spatial — the spatial layout "
                "already owns the device mesh; spatial maps optimize "
                "through the single-program path (XLA partitions it)")
        key_cfg = (n_dev, lr)
        if getattr(self, "_sharded_optim_key", None) != key_cfg:
            mesh = make_mesh(n_dev)
            self._sharded_opt, self._sharded_step = \
                make_sharded_optimize_iter(
                    mesh, self.params, self.voxel_size, self.min_pts_in_grid,
                    self.truncated_units, self.truncated_dist,
                    self.ray_max_dist, n_rays=self.sampling_size,
                    train_ray_splits=self.train_ray_splits,
                    example_table=self.table, lr=lr,
                    neighbor_kernel=int(getattr(self.config.model,
                                                "neighbor_kernel", 3)),
                    n_fine=int(getattr(self.config.model.ray_tracer,
                                       "n_fine", 0) or 0),
                    n_coarse=int(getattr(self.config.model.ray_tracer,
                                         "n_coarse", 0) or 0))
            self._sharded_optim_key = key_cfg
        sdf_delta = tsdf.prepare_sdf_delta(
            self.tsdf_vol, self.tsdf_voxel_size, self.truncated_dist,
            self.sdf_delta_weight)
        state = optimize.init_optim_state(self._sharded_opt, self.table)

        lo = 0 if last_frame < 0 else max(0, last_frame)
        frame_pool = self.frames[lo:]
        # consume frame indices and PRNG keys in the exact same group
        # structure as the single-device loop, so for a given seed both
        # paths optimize identical (frame, ray) sequences
        group = int(getattr(self.config.model, "optim_iters_per_launch", 4))
        rng = np.random.RandomState(
            int(jax.random.randint(self._rng_key, (), 0, 2 ** 31 - 1)))
        self._rng_key, _ = jax.random.split(self._rng_key)
        lr_scales = self._optim_lr_scales(n_iters)
        done = 0
        while done < int(n_iters):
            k = min(group, int(n_iters) - done)
            if frame_order == "epoch":
                fis = (done + np.arange(k)) % len(frame_pool)
            else:
                fis = rng.randint(0, len(frame_pool), size=k)
            self._rng_key, k_step = jax.random.split(self._rng_key)
            keys = jax.random.split(k_step, k)
            for j in range(k):
                f = frame_pool[fis[j]]
                state, _ = self._sharded_step(
                    state, self.table, f["depth"], f["T_wc"], f["intr"],
                    self.bound_min, self.n_xyz, sdf_delta, keys[j],
                    lr_scale=jnp.asarray(lr_scales[done + j], jnp.float32))
            done += k
        self.last_optimize_iters = done
        self.table = self.table.replace(features=state.features,
                                        weights=state.weights)

    # ------------------------------------------------------------------
    # meshing / io
    # ------------------------------------------------------------------

    def prefetch_mesh_lattice(self):
        """Build the mesh sample lattice in a background thread, overlapped
        with the optimize phase (measured 1.4 s of single-core host work at
        the bench operating point — the mesh phase's longest serial stage).

        Exact semantics: the lattice is built over ALL allocated voxels (the
        key set is immutable during optimize — optimize only writes
        features/weights), and extract_mesh filters its CELLS to the exact
        post-optimize gate.  Each lattice cell is owned by exactly one
        voxel (mesh.cell_owner_voxel), so filtering a superset lattice
        yields the identical cell set, corner positions and SDF values the
        direct build would produce — the mesh is bit-identical.

        Dense slot-map tables only (stable slot order; keys live in
        slot_flat, which optimize never donates).  Other layouts fall back
        to the in-line build.  Called automatically by optimize(); a no-op
        when a prefetch for the current fuse epoch already exists or
        model.mesh_prefetch=false."""
        m = self.config.model
        if not bool(getattr(m, "mesh_prefetch", True)):
            return
        if self._spatial_mesh is not None or \
                not hasattr(self.table, "slot_flat"):
            return
        scale = int(getattr(m, "mesh_lattice_scale", 2))
        pf = self._mesh_prefetch
        if pf is not None and pf["epoch"] == self._fuse_epoch and \
                pf["scale"] == scale:
            return
        import threading

        n = int(self.table.n_alloc)
        if n == 0:
            self._mesh_prefetch = None
            return
        slot_flat = self.table.slot_flat  # not donated; fetch in-thread
        n_xyz = np.asarray(self.n_xyz, np.int64)
        box: Dict[str, Any] = {"epoch": self._fuse_epoch, "scale": scale,
                               "n": n}

        def work():
            try:
                flat = np.asarray(slot_flat[:n], np.int64)
                keys = np.stack([flat // (n_xyz[1] * n_xyz[2]),
                                 (flat // n_xyz[2]) % n_xyz[1],
                                 flat % n_xyz[2]], axis=-1).astype(np.int32)
                box["keys"] = keys
                lattice = mesh_mod.build_sample_lattice(keys, scale)
                # map every cell to its owner voxel's ROW, so the exact
                # post-optimize gate filters cells with one O(M) gather
                owner = mesh_mod.cell_owner_voxel(lattice[2], scale)
                kk = mesh_mod.coord_key3(keys.astype(np.int64))
                order = np.argsort(kk)
                pos = np.searchsorted(kk[order],
                                      mesh_mod.coord_key3(owner))
                box["owner_rows"] = order[np.clip(pos, 0, n - 1)]
                box["lattice"] = lattice
            except Exception as e:  # fall back to the in-line build
                box["error"] = e

        t = threading.Thread(target=work, daemon=True)
        box["thread"] = t
        t.start()
        self._mesh_prefetch = box

    def _prefetched_lattice(self):
        """(points, corner_idx, cells, keys) of a valid prefetch, or None."""
        box = self._mesh_prefetch
        if box is None or box["epoch"] != self._fuse_epoch:
            return None
        if box["scale"] != int(getattr(self.config.model,
                                       "mesh_lattice_scale", 2)):
            return None
        box["thread"].join()
        if "lattice" not in box or int(self.table.n_alloc) != box["n"]:
            return None
        return box

    def _build_decode(self, use_delta: bool):
        vs = self.voxel_size
        min_pts = self.min_pts_in_grid
        # optional Pallas fused decode (measured slower than XLA for this
        # tiny decoder on v5e — see kernels/fused_decode.py; off by default)
        use_fused = (jax.devices()[0].platform != "cpu" and
                     bool(getattr(self.config.model,
                                  "use_fused_decode_kernel", False)))

        # mesh decode is forward-only: the feature-major layout's optimize-
        # loop loss (backward relayouts, RESULTS.md round 2) doesn't apply,
        # so it gets its own knob (default follows decode_layout)
        layout = str(getattr(self.config.model, "mesh_decode_layout", None)
                     or getattr(self.config.model, "decode_layout", "rows")
                     or "rows")
        # fetch dtype for the mesh-lattice SDF: the decoded array rides the
        # TPU tunnel to the host mesher, and the transfer scales with bytes
        # (RESULTS.md round 4) — float16 halves it (rel. step 5e-4, far
        # below the marching-tets interpolation tolerance); float32 = exact
        fetch_dt = str(getattr(self.config.model,
                               "mesh_fetch_dtype", "float32"))
        # the closure captures params, bound_min and n_xyz as constants
        key = ("decode", use_delta, use_fused, layout, vs, min_pts, fetch_dt,
               _params_fingerprint(self.params),
               np.asarray(self.bound_min).tobytes(),
               np.asarray(self.n_xyz).tobytes())
        params, bound_min, n_xyz = self.params, self.bound_min, self.n_xyz

        def build():
            @jax.jit
            def decode(features, table, sdf_delta, coords):
                out = fusion.decode_points(
                    features, table, params, coords,
                    bound_min, vs, min_pts,
                    sdf_delta=sdf_delta if use_delta else None,
                    n_xyz=n_xyz, is_coords=True,
                    use_fused_kernel=use_fused,
                    masked_fill=float("nan"), layout=layout)
                if fetch_dt != "float32":
                    out = out.astype(jnp.dtype(fetch_dt))
                return out

            return decode

        return _memo(key, build)

    def _decode_for(self, use_delta: bool):
        """Cached jitted decode, keyed by use_delta (it is baked in)."""
        if getattr(self, "_decode_cache", None) is None:
            self._decode_cache = {}
        if use_delta not in self._decode_cache:
            self._decode_cache[use_delta] = self._build_decode(use_delta)
        return self._decode_cache[use_delta]

    def extract_mesh(self, use_delta: bool = True,
                     batch_size: int | None = None) -> Optional[mesh_mod.Mesh]:
        if batch_size is None:
            # bigger batches = fewer decode launches; the tunneled runtime
            # pays ~64 ms dispatch per launch, so 9 launches of 2^18 cost
            # ~0.6 s of pure overhead at the bench point (RESULTS.md)
            batch_size = int(getattr(self.config.model,
                                     "mesh_decode_batch", 1 << 18))
        prof = os.environ.get("BNV_MESH_PROFILE") in ("1", "2")
        t0 = time.time()
        self._decode_jit = self._decode_for(use_delta)
        sdf_delta = tsdf.prepare_sdf_delta(
            self.tsdf_vol, self.tsdf_voxel_size, self.truncated_dist,
            self.sdf_delta_weight)
        if prof:
            print(f"[mesh] decode-jit+delta: {time.time()-t0:.2f}s",
                  flush=True)
            t0 = time.time()
        # optimize-overlapped lattice (prefetch_mesh_lattice): filter its
        # cells with the exact post-optimize gate — the resulting mesh is
        # identical to the in-line build (cells are uniquely owned, corner
        # positions/SDF values are position-deterministic)
        box = (None if self._spatial_mesh is not None
               else self._prefetched_lattice())
        require_obs = bool(getattr(self.config.model,
                                   "mesh_require_observation", False))
        lattice = None
        if box is not None:
            n = box["n"]
            weights = np.asarray(self.table.weights[:n])
            hits = np.asarray(self.table.num_hits[:n])
            gate = weights >= self.min_pts_in_grid
            if require_obs:
                gate &= hits > 0
            if not gate.any():
                return None
            points, corner_idx, cells = box["lattice"]
            sel = gate[box["owner_rows"]]
            lattice = (points, corner_idx[sel], cells[sel])
            active = None
            if prof:
                print(f"[mesh] prefetched lattice: gate {int(gate.sum())} of "
                      f"{n} voxels -> {int(sel.sum())} cells: "
                      f"{time.time()-t0:.2f}s", flush=True)
                t0 = time.time()
        else:
            # the gate below only needs keys/weights/hits — skip the [n, F]
            # feature fetch (the dominant tunnel transfer of this step)
            if self._spatial_mesh is not None:
                from bnv_fusion_tpu.parallel import spatial as _sp
                keys, _, weights, hits = _sp.spatial_active_entries(
                    self.table, self._fuse_devices)
            else:
                keys, _, weights, hits, _ = tbl.active_entries(
                    self.table, with_features=False)
            if prof:
                print(f"[mesh] active_entries ({len(keys)}): "
                      f"{time.time()-t0:.2f}s", flush=True)
            # only voxels that accumulated real fusion weight carry surface
            gate = weights >= self.min_pts_in_grid
            if require_obs:
                # exclude voxels whose weight comes ONLY from count_optim
                # bumps (never had a >= min_pts fused observation): their
                # latents are trained from render loss alone and can
                # hallucinate surface
                gate &= hits > 0
            active = keys[gate]
            if len(active) == 0:
                return None
            active = active.astype(np.int32)
        dec_table = (self._spatial_view() if self._spatial_mesh is not None
                     else self.table)
        decode_fn = partial(self._decode_jit, dec_table.features, dec_table,
                            sdf_delta)
        mesh = mesh_mod.extract_mesh(
            decode_fn, active,
            np.asarray(self.bound_min), self.voxel_size,
            batch_size=batch_size, mask_sentinel=True,
            lattice_scale=int(getattr(self.config.model,
                                      "mesh_lattice_scale", 2)),
            lattice=lattice)
        if mesh is not None and self.fuse_color and len(mesh.vertices):
            colors = tsdf.sample_color(
                tsdf.as_dense(self.tsdf_vol), jnp.asarray(mesh.vertices),
                self.tsdf_voxel_size)
            mesh = mesh._replace(colors=np.asarray(colors))
        return mesh

    def _inc_changed_mask(self) -> np.ndarray:
        """Device-side latent-change mask for the incremental mesher.

        Diffs the table's (weights, num_hits, features) against a device
        snapshot inside one jitted program and fetches only the [n] bool
        mask — the [n, F] feature block (the dominant tunnel transfer of a
        demo-mode mesh event, 0.8-1.9 s measured) never leaves the chip.
        The snapshot triple is made of jit OUTPUTS (fresh buffers, +0), so
        holding it does not block fuse/optimize donation of the live table.
        """
        t = self.table
        key = ("incdiff", t.weights.shape, t.num_hits.shape,
               t.features.shape, str(t.features.dtype))

        def build():
            @jax.jit
            def diff(w, h, f, pw, ph, pf):
                changed = (w != pw) | (h != ph) | \
                    (f != pf).any(axis=-1)
                return changed, w + 0, h + 0, f + 0

            return diff

        fn = _memo(key, build)
        prev = self._inc_prev
        fresh = (prev is None or prev[0].shape != t.weights.shape or
                 prev[2].shape != t.features.shape or
                 prev[2].dtype != t.features.dtype)
        if fresh:  # self-compare; the host mask below overrides to all-True
            prev = (t.weights, t.num_hits, t.features)
        mask_dev, pw, ph, pf = fn(t.weights, t.num_hits, t.features, *prev)
        self._inc_prev = (pw, ph, pf)
        n = int(t.n_alloc)
        mask = np.asarray(mask_dev[:n]).copy()
        n_prev = self._inc_prev_n
        if fresh or n_prev is None:
            mask[:] = True
        elif n > n_prev:
            # new allocations flip their corners' decode sentinel even when
            # the slot values happen to match the snapshot's zeros
            mask[n_prev:] = True
        self._inc_prev_n = n
        return mask

    def extract_mesh_incremental(self, use_delta: bool = True,
                                 batch_size: int = 1 << 18):
        """Demo-mode mesh preview: only re-decodes voxels whose latents OR
        TSDF-prior cells changed since the last call (the reference
        VolumeList mesh-cache role).  Change detection is exact: per-row
        feature comparison plus a dilated diff of the dense prior
        (model.incremental_delta_tol bounds how small a prior move still
        triggers a re-decode; default 0.0 = every change).
        """
        from bnv_fusion_tpu.incremental_mesh import IncrementalMesher

        prof = os.environ.get("BNV_INC_PROFILE") == "1"
        t0 = time.time()
        self._decode_jit = self._decode_for(use_delta)
        if getattr(self, "_inc_mesher", None) is None:
            self._inc_mesher = IncrementalMesher(
                np.asarray(self.bound_min), self.voxel_size,
                batch_size=batch_size, n_xyz=np.asarray(self.n_xyz),
                delta_tol=float(getattr(self.config.model,
                                        "incremental_delta_tol", 0.0)))
        sdf_delta = tsdf.prepare_sdf_delta(
            self.tsdf_vol, self.tsdf_voxel_size, self.truncated_dist,
            self.sdf_delta_weight)
        if self._spatial_mesh is not None:
            # same host-side view as extract_mesh's spatial branch: global
            # keys/rows from the sharded slot maps, decode through the
            # global-row table view (XLA partitions the row gathers)
            from bnv_fusion_tpu.parallel import spatial as _sp
            keys, feats, weights, hits = _sp.spatial_active_entries(
                self.table, self._fuse_devices)
            feats = np.asarray(feats, np.float32)
            changed_rows = None  # sharded snapshots not kept: host diff
            dec_table = self._spatial_view()
        else:
            # dense path: diff on device, fetch only the bool mask — the
            # [n, F] feature block stays on chip (_inc_changed_mask)
            changed_rows = self._inc_changed_mask()
            keys, feats, weights, hits, _ = tbl.active_entries(
                self.table, with_features=False)
            dec_table = self.table
        if prof:
            print(f"[inc] fetch active_entries ({len(keys)}): "
                  f"{time.time()-t0:.2f}s", flush=True)
        if bool(getattr(self.config.model, "mesh_require_observation", False)):
            # same fused-evidence gate as extract_mesh: zeroing the weight
            # keeps bump-only voxels below min_weight for the mesher
            weights = np.where(hits > 0, weights, 0.0)
        decode_fn = partial(self._decode_jit, dec_table.features, dec_table,
                            sdf_delta)
        mesh = self._inc_mesher.update(
            decode_fn, keys.astype(np.int32), weights, feats,
            min_weight=self.min_pts_in_grid,
            sdf_delta=np.asarray(sdf_delta) if use_delta else None,
            changed_rows=changed_rows)
        return mesh if len(mesh.vertices) else None

    def save(self, path_prefix: str):
        if self._spatial_mesh is not None:
            from bnv_fusion_tpu.parallel import spatial as _sp
            keys, feats, weights, hits = _sp.spatial_active_entries(
                self.table, self._fuse_devices)
        else:
            keys, feats, weights, hits, _ = tbl.active_entries(self.table)
        ckpt_io.save_state(path_prefix + "_sparse_volume.npz", {
            "active_coordinates": keys,
            "features": feats,
            "weights": weights,
            "num_hits": hits,
            "dimensions": self.dimensions,
            "voxel_size": np.float32(self.voxel_size),
        })
        np.save(path_prefix + "_tsdf.npy",
                np.asarray(tsdf.as_dense(self.tsdf_vol).sdf) *
                (self.tsdf_voxel_size * 5))

    def load_volume(self, path: str):
        data = ckpt_io.load_state(path)
        self.table = tbl.load_entries(
            self.table, data["active_coordinates"],
            data["features"], data["weights"], data["num_hits"])

    def load_map(self, path_prefix: str):
        """Resume a saved map: sparse volume + TSDF prior (the counterpart of
        ``save``; enables mid-sequence resume of the online loop, which the
        reference lacks — SURVEY §5 checkpoint/resume)."""
        self.load_volume(path_prefix + "_sparse_volume.npz")
        metric = np.load(path_prefix + "_tsdf.npy")
        normalized = metric / (self.tsdf_voxel_size * 5.0)
        if isinstance(self.tsdf_vol, tsdf.TSDFVolumeBM):
            if tuple(normalized.shape) != tuple(self.tsdf_vol.vol_dim):
                raise ValueError(
                    f"tsdf prior shape {normalized.shape} != volume "
                    f"{self.tsdf_vol.vol_dim}")
            self.tsdf_vol = self.tsdf_vol.replace(
                sdf=tsdf.dense_to_bm(self.tsdf_vol,
                                     jnp.asarray(normalized, jnp.float32)),
                weight=jnp.ones_like(self.tsdf_vol.weight))
            return
        if normalized.shape != self.tsdf_vol.sdf.shape:
            raise ValueError(
                f"tsdf prior shape {normalized.shape} != volume "
                f"{self.tsdf_vol.sdf.shape}")
        self.tsdf_vol = self.tsdf_vol.replace(
            sdf=jnp.asarray(normalized, jnp.float32),
            weight=jnp.ones_like(self.tsdf_vol.weight))
