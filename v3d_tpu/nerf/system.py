"""NeuS training system (counterpart of
mesh_recon/systems/neus_videonvs.py:37-503 'videonvs-neus-system').

Per step: sample random pixels across all frames -> rays -> fixed-budget
NeuS render -> loss suite (rgb MSE, mask BCE, eikonal, DPT-normal cosine,
sparsity, curvature, 3D normal smoothness, opaque, distortion) -> AdamW with
per-group LRs and constant->exponential decay schedule.

TPU adaptation of "dynamic ray sampling" (neus_videonvs.py:191-199): ray
count still adapts to the live-sample budget but is rounded to a power of
two so only a bounded set of jit specializations exist.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v3d_tpu.nerf.encoding import progressive_fd_eps, progressive_level_mask
from v3d_tpu.nerf.fields import (VarianceNetwork, VolumeDensity,
                                 VolumeRadiance, VolumeRadianceBg, VolumeSDF)
from v3d_tpu.nerf.occupancy import OccupancyGrid
from v3d_tpu.nerf.renderer import BgRenderer, NeusRenderer


@dataclasses.dataclass
class NeusConfig:
    """configs/videonvs.yaml model/system blocks."""

    radius: float = 1.0
    num_samples_per_ray: int = 1024
    train_num_rays: int = 256
    max_train_num_rays: int = 8192
    dynamic_ray_sampling: bool = True
    cos_anneal_end: int = 20000
    background_color: str = "black"
    grid_prune: bool = True
    grid_prune_occ_thre: float = 0.001
    use_occ_lookup: bool = True   # mask samples by the occupancy grid; off
                                  # on TPU (1M-row gathers; alpha from the
                                  # SDF already kills empty-space samples)
    # >0: surface-guided coarse-to-fine sampling — the TPU empty-space
    # skipping (renderer.sample_points_coarse_to_fine).  Probes this many
    # sdf-only points per ray, then spends num_samples_per_ray inside the
    # zero-crossing band.
    coarse_to_fine_samples: int = 0
    variance_init: float = 0.3
    # learned background (neus.py:70-84,193-270; configs ship it off —
    # capability parity for non-white-background scenes)
    learned_background: bool = False
    num_samples_per_ray_bg: int = 64
    near_plane_bg: float = 0.1
    far_plane_bg: float = 1e3
    lambda_distortion_bg: float = 0.0
    # geometry field (reference: hashgrid+FD; TPU-fast: frequency+analytic —
    # XLA TPU gathers make hashgrid lookups the bottleneck)
    geometry_encoding: str = "hashgrid"
    grad_type: str = "finite_difference"
    n_frequencies: int = 8
    geo_neurons: int = 64
    geo_hidden_layers: int = 1
    freq_masking_steps: int = 0
    ray_chunk: int = 0
    # hashgrid / progressive schedule
    n_levels: int = 10
    start_level: int = 4
    start_step: int = 0
    update_steps: int = 1000
    base_resolution: int = 32
    per_level_scale: float = 1.3195079107728942
    # losses (system.loss)
    lambda_rgb_mse: float = 0.5
    lambda_rgb_l1: float = 0.0
    lambda_mask: float = 1.0
    lambda_eikonal: float = 0.2
    lambda_normal: float = 1.0
    lambda_3d_normal_smooth: float = 1.0
    lambda_curvature: float = 0.0
    lambda_sparsity: float = 0.5
    lambda_distortion: float = 0.0
    lambda_opaque: float = 0.0
    sparsity_scale: float = 100.0
    normal_p_ratio: float = 0.8
    # optimizer (system.optimizer / scheduler)
    lr: float = 0.01
    lr_geometry: float = 0.001
    lr_variance: float = 0.001
    constant_steps: int = 500
    max_steps: int = 3000
    lr_decay_target: float = 0.1


def ranking_loss(error: jnp.ndarray, penalize_ratio: float = 0.7,
                 mask: Optional[jnp.ndarray] = None,
                 reduction: str = "mean") -> jnp.ndarray:
    """systems/neus_ortho.py:18-29: keep only the smallest ``penalize_ratio``
    fraction of per-element errors (robust trimming).  Static-shape variant:
    invalid entries (mask=0) are pushed to +inf and excluded."""
    n = error.shape[0]
    if mask is not None:
        error = jnp.where(mask, error, jnp.inf)
        n_valid = jnp.sum(mask)
    else:
        n_valid = jnp.asarray(n)
    k = jnp.minimum((penalize_ratio * n_valid).astype(jnp.int32),
                    jnp.asarray(n, jnp.int32))
    sorted_err = jnp.sort(error)
    keep = jnp.arange(n) < k
    vals = jnp.where(keep & jnp.isfinite(sorted_err), sorted_err, 0.0)
    if reduction == "mean":
        return jnp.sum(vals) / jnp.maximum(k, 1)
    return jnp.sum(vals)


def binary_cross_entropy(pred, target):
    return -(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


class NeusTrainer:
    """Owns field params, occupancy grid, optimizer state, and the jitted
    train step.  Dataset tensors (images/masks/normals/rays) live on device."""

    def __init__(self, images: np.ndarray, fg_masks: np.ndarray,
                 directions: np.ndarray, c2ws: np.ndarray,
                 normals: Optional[np.ndarray] = None,
                 origins: Optional[np.ndarray] = None,
                 view_weights: Optional[np.ndarray] = None,
                 config: NeusConfig = NeusConfig(), seed: int = 0):
        """images (N, H, W, 3) in [0,1]; fg_masks (N, H, W); directions
        (H, W, 3) camera-space (shared intrinsics) or (N, H, W, 3) for
        per-frame intrinsics (the pinhole-scene recipe,
        systems/neus_pinhole.py:89-94); c2ws (N, 4, 4) OpenGL.
        ``origins`` (H, W, 3): per-pixel camera-space ray origins for
        orthographic cameras (the Wonder3D ortho-neus system,
        systems/neus_ortho.py; None = pinhole).  ``view_weights`` (N,):
        per-view loss weights (Wonder3D view_weights, neus_ortho.py —
        front=1.0 down to right=0.2)."""
        self.cfg = config
        cfg = config
        self.geometry = VolumeSDF(
            radius=cfg.radius, encoding_type=cfg.geometry_encoding,
            n_levels=cfg.n_levels, base_resolution=cfg.base_resolution,
            per_level_scale=cfg.per_level_scale,
            n_frequencies=cfg.n_frequencies, grad_type=cfg.grad_type,
            n_neurons=cfg.geo_neurons, n_hidden_layers=cfg.geo_hidden_layers)
        self.texture = VolumeRadiance()
        self.variance = VarianceNetwork(init_val=cfg.variance_init)
        self.renderer = NeusRenderer(radius=cfg.radius,
                                     num_samples=cfg.num_samples_per_ray,
                                     ray_chunk=cfg.ray_chunk,
                                     coarse_samples=cfg.coarse_to_fine_samples)
        self.occ = OccupancyGrid(radius=cfg.radius,
                                 occ_threshold=cfg.grid_prune_occ_thre)
        if cfg.learned_background:
            self.geometry_bg = VolumeDensity(radius=cfg.radius)
            self.texture_bg = VolumeRadianceBg()
            self.bg_renderer = BgRenderer(
                radius=cfg.radius, num_samples=cfg.num_samples_per_ray_bg,
                near_plane=cfg.near_plane_bg, far_plane=cfg.far_plane_bg)

        self.images = jnp.asarray(images, jnp.float32)
        self.fg_masks = jnp.asarray(fg_masks, jnp.float32)
        self.normals = None if normals is None else jnp.asarray(normals, jnp.float32)
        self.directions = jnp.asarray(directions, jnp.float32)
        self.origins = (None if origins is None
                        else jnp.asarray(origins, jnp.float32))
        self.view_weights = (None if view_weights is None
                             else jnp.asarray(view_weights, jnp.float32))
        self.c2ws = jnp.asarray(c2ws, jnp.float32)
        self.n_images, self.h, self.w = images.shape[:3]

        rng = jax.random.PRNGKey(seed)
        r1, r2, r3, self.rng = jax.random.split(rng, 4)
        pts = jnp.zeros((8, 3))
        self.params = {
            "geometry": self.geometry.init(r1, pts, eps=1e-3),
            "texture": self.texture.init(r2, jnp.zeros((8, 13)), jnp.zeros((8, 3))),
            "variance": self.variance.init(r3),
        }
        if cfg.learned_background:
            rb1, rb2, self.rng = jax.random.split(self.rng, 3)
            self.params["geometry_bg"] = self.geometry_bg.init(rb1, pts)
            self.params["texture_bg"] = self.texture_bg.init(
                rb2, jnp.zeros((8, 13)), jnp.zeros((8, 3)))

        schedule = self._make_schedule()
        transforms = {
            "geometry": optax.adamw(lambda s: cfg.lr_geometry * schedule(s),
                                    b1=0.9, b2=0.99, eps=1e-15),
            "texture": optax.adamw(lambda s: cfg.lr * schedule(s),
                                   b1=0.9, b2=0.99, eps=1e-15),
            "variance": optax.adamw(lambda s: cfg.lr_variance * schedule(s),
                                    b1=0.9, b2=0.99, eps=1e-15),
        }
        if cfg.learned_background:
            # bg fields train at the texture lr (instant-nsr-pl convention)
            transforms["geometry_bg"] = optax.adamw(
                lambda s: cfg.lr * schedule(s), b1=0.9, b2=0.99, eps=1e-15)
            transforms["texture_bg"] = optax.adamw(
                lambda s: cfg.lr * schedule(s), b1=0.9, b2=0.99, eps=1e-15)
        self.opt = optax.multi_transform(transforms,
                                         {k: k for k in transforms})
        self.opt_state = self.opt.init(self.params)
        self.global_step = 0
        self.train_num_rays = cfg.train_num_rays
        self._train_jit = jax.jit(self._train_step,
                                  static_argnames=("num_rays",))
        self._chunk_jit = jax.jit(self._train_chunk,
                                  static_argnames=("num_rays",))
        self._occ_eval_jit = jax.jit(self._occ_eval)

    # ------------------------------------------------------------------
    def _make_schedule(self):
        cfg = self.cfg
        # ConstantLR then ExponentialLR with gamma s.t. total decay = 0.1
        decay_steps = cfg.max_steps - cfg.constant_steps
        gamma = cfg.lr_decay_target ** (1.0 / max(decay_steps, 1))

        def schedule(step):
            s = jnp.maximum(step - cfg.constant_steps, 0)
            return jnp.power(gamma, s)

        return schedule

    def _level_mask(self):
        if self.cfg.geometry_encoding == "frequency":
            from v3d_tpu.nerf.encoding import VanillaFrequency

            return jnp.asarray(VanillaFrequency(
                self.cfg.n_frequencies,
                self.cfg.freq_masking_steps).mask(self.global_step))
        return jnp.asarray(progressive_level_mask(
            self.global_step, self.cfg.n_levels, 2, self.cfg.start_level,
            self.cfg.start_step, self.cfg.update_steps))

    def _fd_eps(self):
        return progressive_fd_eps(
            self.global_step, self.cfg.radius, self.cfg.base_resolution,
            self.cfg.per_level_scale, self.cfg.start_level,
            self.cfg.start_step, self.cfg.update_steps, self.cfg.n_levels)

    def cos_anneal_ratio(self):
        end = self.cfg.cos_anneal_end
        return 1.0 if end == 0 else min(1.0, self.global_step / end)

    def _occ_eval(self, params, pts, level_mask):
        sdf = self.geometry.apply(params["geometry"], pts, method="sdf",
                                  level_mask=level_mask)
        inv_s = jnp.clip(self.variance.apply(params["variance"]), 1e-6, 1e6)
        step = self.renderer.step_size
        prev_cdf = jax.nn.sigmoid((sdf + step * 0.5) * inv_s)
        next_cdf = jax.nn.sigmoid((sdf - step * 0.5) * inv_s)
        return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)

    # ------------------------------------------------------------------
    def _sample_batch(self, rng, num_rays: int):
        r1, r2, r3 = jax.random.split(rng, 3)
        idx = jax.random.randint(r1, (num_rays,), 0, self.n_images)
        x = jax.random.randint(r2, (num_rays,), 0, self.w)
        y = jax.random.randint(r3, (num_rays,), 0, self.h)
        dirs_cam = (self.directions[idx, y, x] if self.directions.ndim == 4
                    else self.directions[y, x])
        c2w = self.c2ws[idx]
        # d_world = R_c2w @ d_cam
        rays_d = jnp.einsum("nij,nj->ni", c2w[:, :3, :3], dirs_cam)
        rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
        if self.origins is not None:  # orthographic (get_ortho_rays)
            o_cam = self.origins[y, x]
            rays_o = jnp.einsum("nij,nj->ni", c2w[:, :3, :3], o_cam) + c2w[:, :3, 3]
        else:
            rays_o = c2w[:, :3, 3]
        rgb = self.images[idx, y, x]
        fg = self.fg_masks[idx, y, x]
        normal = (self.normals[idx, y, x] if self.normals is not None
                  else jnp.zeros((num_rays, 3)))
        vw = (self.view_weights[idx] if self.view_weights is not None
              else jnp.ones((num_rays,)))
        return rays_o, rays_d, rgb, fg, normal, vw

    def _train_step(self, params, opt_state, rng, binary, level_mask,
                    fd_eps, cos_ratio, step, num_rays: int):
        cfg = self.cfg
        rng_batch, rng_render, rng_sparse, rng_perturb = jax.random.split(rng, 4)
        rays_o, rays_d, rgb_gt, fg, normal_gt, view_w = self._sample_batch(
            rng_batch, num_rays)
        bg = jnp.zeros(3) if cfg.background_color == "black" else jnp.ones(3)
        if not cfg.learned_background:
            # constant-background training composites GT onto bg; with a
            # learned bg the raw pixels ARE the target (neus.py:385-397)
            rgb_gt = rgb_gt * fg[:, None] + bg[None] * (1 - fg[:, None])

        def loss_fn(params):
            inv_s = jnp.clip(self.variance.apply(params["variance"]), 1e-6, 1e6)

            # remat: field activations for rays*samples*(1+6 FD) points would
            # otherwise be stored for backward (measured 22GB at the
            # reference budget) — recompute instead
            @jax.checkpoint
            def sdf_grad_feat(pts):
                sdf, grad, feat = self.geometry.apply(
                    params["geometry"], pts, eps=fd_eps, level_mask=level_mask)
                return sdf, grad, feat

            @jax.checkpoint
            def rgb_fn(feat, nrm):
                return self.texture.apply(params["texture"], feat, nrm)

            rng_fg, rng_bg = jax.random.split(rng_render)
            out = self.renderer(
                rays_o, rays_d, sdf_grad_feat, rgb_fn, inv_s,
                cos_anneal_ratio=cos_ratio,
                occupancy_binary=binary if cfg.use_occ_lookup else None,
                background_color=None if cfg.learned_background else bg,
                rng=rng_fg,
                sdf_fn=lambda p: self.geometry.apply(
                    params["geometry"], p, method="sdf",
                    level_mask=level_mask))

            if cfg.learned_background:
                # bg NeRF behind the SDF: full = fg + bg * (1 - fg opacity)
                # (neus.py:391-395 out_full)
                out_bg = self.bg_renderer(
                    rays_o, rays_d,
                    lambda p: self.geometry_bg.apply(params["geometry_bg"], p),
                    lambda f, d: self.texture_bg.apply(
                        params["texture_bg"], f, d),
                    background_color=bg, rng=rng_bg)
                comp_rgb = (out.comp_rgb
                            + out_bg.comp_rgb * (1.0 - out.opacity)[:, None])
                rays_valid = out.rays_valid | (out_bg.opacity > 0)
            else:
                out_bg = None
                comp_rgb = out.comp_rgb
                rays_valid = out.rays_valid

            losses = {}
            # rgb (mse on valid rays, neus_videonvs.py:200-213)
            rgb_mask = rays_valid & (fg >= 0)  # rgb_mask==all here
            err = jnp.sum((comp_rgb - rgb_gt) ** 2, axis=-1) * view_w
            losses["rgb_mse"] = ranking_loss(err, 1.0, rgb_mask) * cfg.lambda_rgb_mse
            # normal cosine loss weighted by exp(|cos(view, gt_normal)|)
            if self.normals is not None and cfg.lambda_normal > 0:
                cosines = jnp.sum(rays_d * normal_gt, axis=-1)
                cosines = jnp.where(cosines > -0.1, 0.0, cosines)
                nmask = (fg > 0) & (cosines < -0.1)
                nrm_a = jnp.sqrt(jnp.sum(out.comp_normal**2, axis=-1) + 1e-12)
                nrm_b = jnp.sqrt(jnp.sum(normal_gt**2, axis=-1) + 1e-12)
                nerr = 1.0 - jnp.sum(out.comp_normal * normal_gt, axis=-1) / (
                    nrm_a * nrm_b)
                # per-view weights multiply in like neus_ortho.py's
                # ranking_loss(extra_weights=view_weights[mask])
                w = jnp.exp(jnp.abs(cosines)) * view_w
                nerr = nerr * w / jnp.maximum(jnp.sum(w), 1e-12)
                losses["normal"] = ranking_loss(
                    nerr, cfg.normal_p_ratio, nmask,
                    reduction="sum") * cfg.lambda_normal
            # eikonal on all sample grads (neus_videonvs.py:242-246); safe
            # sqrt: FD grads are exactly 0 for samples clamped outside the
            # cube, where norm's backward would be NaN
            gnorm = jnp.sqrt(jnp.sum(out.sdf_grad**2, axis=-1) + 1e-12)
            losses["eikonal"] = jnp.mean((gnorm - 1.0) ** 2) * cfg.lambda_eikonal
            # mask bce
            opac = jnp.clip(out.opacity, 1e-3, 1 - 1e-3)
            losses["mask"] = (jnp.sum(
                binary_cross_entropy(opac, fg) * view_w)
                / jnp.maximum(jnp.sum(view_w), 1e-12)) * cfg.lambda_mask
            if cfg.lambda_opaque > 0:
                losses["opaque"] = jnp.mean(
                    binary_cross_entropy(opac, opac)) * cfg.lambda_opaque
            # sparsity on random points (neus.py:329-335)
            rand_pts = jax.random.uniform(
                rng_sparse, (num_rays, 3), minval=-cfg.radius, maxval=cfg.radius)
            rand_sdf, rand_grad, _ = sdf_grad_feat(rand_pts)
            losses["sparsity"] = jnp.mean(
                jnp.exp(-cfg.sparsity_scale * jnp.abs(rand_sdf))) * cfg.lambda_sparsity
            # 3D normal smoothness (neus_videonvs.py:305-324)
            if cfg.lambda_3d_normal_smooth > 0:
                perturb = rand_pts + jax.random.normal(
                    rng_perturb, rand_pts.shape) * 1e-2
                _, grad_p, _ = sdf_grad_feat(perturb)
                losses["3d_normal_smooth"] = jnp.mean(
                    jnp.abs(rand_grad - grad_p)) * cfg.lambda_3d_normal_smooth
            # distortion (flatten_eff_distloss equivalent, static-shape)
            if cfg.lambda_distortion > 0:
                losses["distortion"] = distortion_loss(
                    out.weights, out.midpoints, out.intervals) * cfg.lambda_distortion
            # bg distortion (lambda_distortion_bg, videonvs.yaml:92)
            if cfg.learned_background and cfg.lambda_distortion_bg > 0:
                losses["distortion_bg"] = distortion_loss(
                    out_bg.weights, out_bg.midpoints,
                    out_bg.intervals) * cfg.lambda_distortion_bg

            total = sum(losses.values())
            n_live = jnp.sum(out.sample_mask)
            return total, (losses, n_live, out.opacity)

        (loss, (losses, n_live, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, losses, n_live

    def _train_chunk(self, params, opt_state, rng, binary, level_masks,
                     fd_epss, cos_ratios, steps, num_rays: int):
        """lax.scan over _train_step — one dispatch per chunk (the tunneled
        TPU costs ~50ms per dispatch).  Per-step schedule values
        (progressive level mask, FD eps, cos-anneal) arrive as stacked
        arrays computed host-side for the chunk's step range."""

        def body(carry, xs):
            params, opt_state = carry
            r, lm, eps, cr, st = xs
            params, opt_state, loss, losses, n_live = self._train_step(
                params, opt_state, r, binary, lm, eps, cr, st,
                num_rays=num_rays)
            return (params, opt_state), (loss, losses, n_live)

        rngs = jax.random.split(rng, steps.shape[0])
        (params, opt_state), (loss, losses, n_live) = jax.lax.scan(
            body, (params, opt_state),
            (rngs, level_masks, fd_epss, cos_ratios, steps))
        return params, opt_state, loss, losses, n_live

    def train_chunk(self, n: int) -> Dict:
        """Run ``n`` training steps in one compiled program.  Requires
        static ray counts (cfg.dynamic_ray_sampling off — the TPU recipe)
        and no occupancy-lookup grid updates inside the chunk."""
        cfg = self.cfg
        assert not cfg.dynamic_ray_sampling, (
            "train_chunk needs a static ray count; use train_iter or "
            "disable dynamic_ray_sampling")
        steps = self.global_step + np.arange(n)
        saved = self.global_step
        lms, epss, crs = [], [], []
        for s in steps:
            self.global_step = int(s)
            lms.append(np.asarray(self._level_mask()))
            epss.append(self._fd_eps())
            crs.append(self.cos_anneal_ratio())
        self.global_step = saved
        self.rng, rng_chunk = jax.random.split(self.rng)
        num_rays = self._quantized_rays()
        self.params, self.opt_state, loss, losses, n_live = self._chunk_jit(
            self.params, self.opt_state, rng_chunk, self.occ.binary,
            jnp.asarray(np.stack(lms)), jnp.asarray(np.asarray(epss, np.float32)),
            jnp.asarray(np.asarray(crs, np.float32)),
            jnp.asarray(steps), num_rays=num_rays)
        self.global_step += n
        return {"loss": loss[-1], "num_rays": num_rays,
                **{k: v[-1] for k, v in losses.items()}}

    def train(self, num_steps: int, chunk: int = 50, log_every: int = 0,
              log_fn=None) -> Dict:
        """Chunked training driver.  Chunk boundaries respect occupancy-grid
        update points (when the lookup is enabled) and logging points; falls
        back to per-iter stepping when dynamic ray sampling is on."""
        cfg = self.cfg
        stats: Dict = {}
        if cfg.dynamic_ray_sampling:
            for _ in range(num_steps):
                stats = self.train_iter()
                if log_every and log_fn and self.global_step % log_every == 0:
                    log_fn(stats)
            return stats
        if cfg.grid_prune and cfg.use_occ_lookup:
            # the occupancy lookup needs its per-step host update cadence
            for _ in range(num_steps):
                stats = self.train_iter()
                if log_every and log_fn and self.global_step % log_every == 0:
                    log_fn(stats)
            return stats
        end = self.global_step + num_steps
        while self.global_step < end:
            it = self.global_step
            nxt = end
            if log_every:
                nxt = min(nxt, (it // log_every + 1) * log_every)
            seg = nxt - it
            # one compiled scan length only; remainder reuses the per-iter jit
            while seg >= chunk > 1:
                stats = self.train_chunk(chunk)
                seg -= chunk
            for _ in range(seg):
                stats = self.train_iter()
            if log_every and log_fn and self.global_step % log_every == 0:
                log_fn(stats)
        return stats

    # ------------------------------------------------------------------
    def train_iter(self) -> Dict:
        cfg = self.cfg
        self.rng, rng_step, rng_occ = jax.random.split(self.rng, 3)
        level_mask = self._level_mask()
        # occupancy grid update (jitted eval over cell centers); pointless
        # when the renderer doesn't consume the mask (TPU config)
        if cfg.grid_prune and cfg.use_occ_lookup:
            self.occ.update(
                self.global_step,
                lambda pts: self._occ_eval_jit(self.params, pts, level_mask),
                rng_occ)
        num_rays = self._quantized_rays()
        self.params, self.opt_state, loss, losses, n_live = self._train_jit(
            self.params, self.opt_state, rng_step, self.occ.binary, level_mask,
            self._fd_eps(), self.cos_anneal_ratio(),
            jnp.asarray(self.global_step), num_rays=num_rays)
        self.global_step += 1
        # dynamic ray-count adaptation toward a fixed sample budget (this
        # branch syncs on n_live; with it off the step stays fully async)
        if cfg.dynamic_ray_sampling:
            budget = cfg.train_num_rays * 64
            live = max(float(n_live), 1.0)
            target = int(num_rays * budget / live)
            self.train_num_rays = min(
                int(self.train_num_rays * 0.9 + target * 0.1),
                cfg.max_train_num_rays)
        # losses stay LAZY device scalars: float()-ing the whole dict here
        # costs one tunnel round trip PER COMPONENT per step (callers
        # float() on demand; f-string formatting works directly)
        return {"loss": loss, "num_rays": num_rays, **losses}

    def _quantized_rays(self) -> int:
        """Round the adaptive ray count to a power of two (bounded number of
        jit specializations on TPU)."""
        n = max(self.cfg.train_num_rays, min(self.train_num_rays,
                                             self.cfg.max_train_num_rays))
        return 1 << int(np.floor(np.log2(n)))

    # ------------------------------------------------------------------
    def vertex_colors(self, verts: np.ndarray,
                      chunk: int = 65536) -> np.ndarray:
        """RGB for mesh vertices from the radiance field (the NeuS export
        path, models/neus.py:424-441): ONE jitted fixed-shape chunk program
        (tail zero-padded) instead of eager per-chunk geometry/texture
        applies — at ~1.4M verts the eager loop paid ~22 chunks x ~30 op
        dispatches through the ~50 ms tunnel."""
        if not hasattr(self, "_vcol_jit"):
            @jax.jit
            def _vcol(params, pts, eps, level_mask):
                sdf, grad, feat = self.geometry.apply(
                    params["geometry"], pts, eps=eps, level_mask=level_mask)
                nrm = grad / (jnp.linalg.norm(grad, axis=-1,
                                              keepdims=True) + 1e-10)
                return self.texture.apply(params["texture"], feat, nrm)

            self._vcol_jit = _vcol
        lm = self._level_mask()
        eps = jnp.asarray(self._fd_eps(), jnp.float32)
        out = []
        for s in range(0, len(verts), chunk):
            seg = np.asarray(verts[s:s + chunk], np.float32)
            pts = np.zeros((chunk, 3), np.float32)
            pts[:len(seg)] = seg
            rgb = np.asarray(self._vcol_jit(self.params, jnp.asarray(pts),
                                            eps, lm))
            out.append(rgb[:len(seg)])
        return np.concatenate(out) if out else np.zeros((0, 3), np.float32)

    # ------------------------------------------------------------------
    def render_image(self, c2w: np.ndarray, chunk: int = 4096,
                     view_idx: int = 0):
        """Full-frame render for validation (neus_videonvs.py:340-400).
        ``view_idx`` selects the intrinsics when per-frame directions are
        in use (pinhole scenes)."""
        dirs = np.asarray(self.directions)
        if dirs.ndim == 4:
            dirs = dirs[view_idx]
        dirs = dirs.reshape(-1, 3)
        c2w = jnp.asarray(c2w, jnp.float32)
        rays_d = dirs @ np.asarray(c2w[:3, :3]).T
        rays_d = rays_d / (np.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
        rays_o = np.broadcast_to(np.asarray(c2w[:3, 3]), rays_d.shape)
        level_mask = self._level_mask()
        inv_s = jnp.clip(self.variance.apply(self.params["variance"]), 1e-6, 1e6)
        bg = jnp.zeros(3) if self.cfg.background_color == "black" else jnp.ones(3)
        outs = []
        for s in range(0, rays_d.shape[0], chunk):
            e = min(s + chunk, rays_d.shape[0])
            ro = jnp.asarray(rays_o[s:e])
            rd = jnp.asarray(rays_d[s:e])

            def sdf_grad_feat(pts):
                return self.geometry.apply(self.params["geometry"], pts,
                                           eps=self._fd_eps(),
                                           level_mask=level_mask)

            def rgb_fn(feat, nrm):
                return self.texture.apply(self.params["texture"], feat, nrm)

            out = self.renderer(
                ro, rd, sdf_grad_feat, rgb_fn, inv_s,
                cos_anneal_ratio=self.cos_anneal_ratio(),
                occupancy_binary=self.occ.binary,
                background_color=None if self.cfg.learned_background else bg,
                sdf_fn=lambda p: self.geometry.apply(
                    self.params["geometry"], p, method="sdf",
                    level_mask=level_mask))
            comp_rgb = out.comp_rgb
            if self.cfg.learned_background:
                out_bg = self.bg_renderer(
                    ro, rd,
                    lambda p: self.geometry_bg.apply(
                        self.params["geometry_bg"], p),
                    lambda f, d: self.texture_bg.apply(
                        self.params["texture_bg"], f, d),
                    background_color=bg)
                comp_rgb = (comp_rgb
                            + out_bg.comp_rgb * (1.0 - out.opacity)[:, None])
            outs.append((np.asarray(comp_rgb), np.asarray(out.opacity),
                         np.asarray(out.depth)))
        rgb = np.concatenate([o[0] for o in outs]).reshape(self.h, self.w, 3)
        opac = np.concatenate([o[1] for o in outs]).reshape(self.h, self.w)
        depth = np.concatenate([o[2] for o in outs]).reshape(self.h, self.w)
        return rgb, opac, depth

    # ------------------------------------------------------------------
    # checkpoint / elastic recovery (reference: Lightning ModelCheckpoint +
    # --resume, mesh_recon/launch.py:93,127-131)
    def capture(self) -> Dict:
        """Full resumable state: fields + Adam moments + occupancy grid +
        step + RNG key + adaptive ray count.  Unlike Lightning's ckpt this
        includes the sampling RNG, so a restored run draws the same ray
        batches the uninterrupted run would have."""
        return {"params": self.params, "opt_state": self.opt_state,
                "step": self.global_step, "rng": self.rng,
                "occs": self.occ.occs, "binary": self.occ.binary,
                "train_num_rays": self.train_num_rays}

    def restore(self, tree: Dict) -> None:
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        self.global_step = int(tree["step"])
        self.rng = jnp.asarray(tree["rng"])
        self.occ.occs = jnp.asarray(tree["occs"])
        self.occ.binary = jnp.asarray(tree["binary"])
        self.train_num_rays = int(tree["train_num_rays"])

    def save(self, path: str) -> None:
        from v3d_tpu.core.checkpoint import save_pytree

        save_pytree(path, self.capture())

    def load(self, path: str) -> None:
        from v3d_tpu.core.checkpoint import load_pytree

        self.restore(load_pytree(path, target=self.capture()))

    def sdf_grid(self, lo=None, hi=None, resolution: int = 128) -> np.ndarray:
        """Dense SDF on a regular (res, res, res) grid in ONE jitted
        program, for marching-cubes export (geometry.py isosurface path).

        The grid coordinates are generated ON DEVICE — at the reference's
        384^3 export resolution the previous host chunk loop uploaded
        ~680 MB of point coordinates through the ~110 MB/s tunnel across
        216 eager dispatches; here the only transfer is the single (res^3)
        f32 result fetch.  lax.map over x-slices bounds the working set
        (one slice = res^2 points).  ``lo``/``hi`` default to the scene
        cube [-radius, radius]^3; the signature doubles as
        ``grid_fn(lo, hi, res)`` for meshops.mcubes.isosurface."""
        import functools

        r = self.cfg.radius
        if lo is None:
            lo = np.array([-r] * 3, np.float32)
        if hi is None:
            hi = np.array([r] * 3, np.float32)
        if not hasattr(self, "_sdf_grid_jit"):
            @functools.partial(jax.jit, static_argnums=(3,))
            def _grid(gparams, lo, hi, res, level_mask):
                step = (hi - lo) / (res - 1)
                y = lo[1] + jnp.arange(res, dtype=jnp.float32) * step[1]
                z = lo[2] + jnp.arange(res, dtype=jnp.float32) * step[2]
                yy, zz = jnp.meshgrid(y, z, indexing="ij")

                def slice_sdf(ix):
                    x = jnp.full_like(yy, lo[0] + ix * step[0])
                    pts = jnp.stack([x, yy, zz], -1).reshape(-1, 3)
                    return self.geometry.apply(gparams, pts, method="sdf",
                                               level_mask=level_mask)

                vals = jax.lax.map(
                    slice_sdf, jnp.arange(res, dtype=jnp.float32))
                return vals.reshape(res, res, res)

            self._sdf_grid_jit = _grid
        out = self._sdf_grid_jit(
            self.params["geometry"], jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32), int(resolution),
            self._level_mask())
        return np.asarray(out)


def distortion_loss(weights: jnp.ndarray, midpoints: jnp.ndarray,
                    intervals: jnp.ndarray) -> jnp.ndarray:
    """MipNeRF-360 distortion (torch_efficient_distloss equivalent) on the
    static (R, S) layout: intra-interval + pairwise terms via the standard
    O(S) prefix-sum form."""
    w = weights
    m = midpoints
    loss_intra = jnp.sum(w * w * intervals, axis=-1) / 3.0
    wm = w * m
    w_cum = jnp.cumsum(w, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    loss_inter = 2.0 * jnp.sum(
        w * (m * (w_cum - w) - (wm_cum - wm)), axis=-1)
    return jnp.mean(loss_intra + loss_inter)
