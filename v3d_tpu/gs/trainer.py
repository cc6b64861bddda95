"""3DGS fitting loop (counterpart of recon/train_from_vid.py:38-208).

Jitted render+loss+Adam step over fixed-capacity gaussian arrays; parameters
and densification statistics stay on device — only the rare densify/prune
events (every ``densification_interval`` iters) round-trip to host, where
slot rewriting happens in numpy followed by optimizer-moment surgery
(reference's _prune_optimizer / cat_tensors_to_optimizer,
gaussian_model.py:375-445, becomes masked moment zeroing on changed slots).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v3d_tpu.gs.densify import DensifyState, densify_and_prune, reset_opacity
from v3d_tpu.gs.gaussians import GaussianParams, from_pcd, random_init_pcd
from v3d_tpu.gs.losses import l1_loss, ssim
from v3d_tpu.gs.render import RasterizeConfig, project_gaussians, rasterize

FLOAT_FIELDS = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")


@dataclasses.dataclass
class GSTrainConfig:
    """OptimizationParams (recon/arguments/__init__.py:88-108) +
    train_from_vid defaults; V3D runs 4000 iters, lambda_dssim=1.0,
    lambda_lpips=2.0 (readme step 4)."""

    iterations: int = 4000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lambda_dssim: float = 0.2
    lambda_lpips: float = 0.0
    lambda_opacity: float = 0.1
    percent_dense: float = 0.01
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    white_background: bool = True
    # opacity-reset policy.  "hard" is the reference semantics
    # (gaussian_model.py:273-280 clamp to 0.01 every reset_interval + at
    # densify_from on white bg) — it costs a ~10 dB holdout transient at
    # each event (quality_refpoint_gs.json iters 500/3000).  "none" skips
    # resets entirely; combined with opacity_decay<1 (gentle per-step
    # multiplicative decay, the floater pressure without the shock) it is
    # the transient-free recipe (VERDICT r4 task 5).
    opacity_reset_mode: str = "hard"
    opacity_decay: float = 1.0
    max_per_tile: int = 256
    tile_chunk: int = 32
    coarse_factor: int = 8
    max_per_coarse: int = 2048
    random_background: bool = False
    # lax.scan chunk for GSTrainer.train — amortizes the ~50ms per-dispatch
    # cost of the tunneled TPU; must divide densification_interval so chunk
    # ends align with event boundaries
    chunk_size: int = 50
    # debug switch: run densification on host (numpy reference path)
    host_densify: bool = False


def expon_lr(step, lr_init, lr_final, lr_delay_mult=1.0, lr_delay_steps=0,
             max_steps=1_000_000):
    """recon/utils/general_utils.py get_expon_lr_func."""
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    return delay * log_lerp


def camera_extent(cameras: List) -> float:
    """getNerfppNorm (recon/scene/dataset_readers.py): 1.1 * max distance of
    camera centers from their mean."""
    centers = np.stack([c.camera_center for c in cameras])
    center = centers.mean(0)
    return float(1.1 * np.linalg.norm(centers - center, axis=1).max())


class GSTrainer:
    """Fits gaussians to a set of posed images (the VideoNVS scene)."""

    def __init__(self, cameras: List, config: GSTrainConfig = GSTrainConfig(),
                 num_pts: int = 100_000, capacity: Optional[int] = None,
                 seed: int = 0, sh_degree: int = 0, radius: float = 2.0,
                 lpips_fn=None):
        self.cams = cameras
        self.cfg = config
        self.rng = np.random.RandomState(seed)
        self.extent = camera_extent(cameras)
        self.lpips_fn = lpips_fn
        xyz, colors = random_init_pcd(self.rng, num_pts, radius=radius)
        g = from_pcd(xyz, colors, sh_degree=sh_degree,
                     capacity=capacity or int(num_pts * 2))
        self.alive = jnp.asarray(g.alive)
        self.params = {k: jnp.asarray(getattr(g, k)) for k in FLOAT_FIELDS}
        cap = g.capacity
        # densification statistics live on device (gaussian_model.py:107-110)
        self.stats = {
            "grad_accum": jnp.zeros((cap,)),
            "denom": jnp.zeros((cap,)),
            "max_radii": jnp.zeros((cap,)),
        }
        self.images = jnp.asarray(
            np.stack([c.image for c in cameras]).astype(np.float32))
        self.cam_wvt = jnp.asarray(np.stack([c.world_view_transform for c in cameras]))
        self.cam_fpt = jnp.asarray(np.stack([c.full_proj_transform for c in cameras]))
        self.cam_center = jnp.asarray(np.stack([c.camera_center for c in cameras]))
        self.template_cam = cameras[0]
        self.step_count = 0

        lr_scale = self.extent
        self.opt = optax.multi_transform(
            {
                "xyz": optax.adam(lambda s: expon_lr(
                    s, config.position_lr_init * lr_scale,
                    config.position_lr_final * lr_scale,
                    config.position_lr_delay_mult,
                    max_steps=config.position_lr_max_steps), eps=1e-15),
                "f_dc": optax.adam(config.feature_lr, eps=1e-15),
                "f_rest": optax.adam(config.feature_lr / 20.0, eps=1e-15),
                "opacity": optax.adam(config.opacity_lr, eps=1e-15),
                "scaling": optax.adam(config.scaling_lr, eps=1e-15),
                "rotation": optax.adam(config.rotation_lr, eps=1e-15),
            },
            {k: k for k in FLOAT_FIELDS},
        )
        self.opt_state = self.opt.init(self.params)
        self._step_jit = jax.jit(self._train_step, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def _make_cam(self, wvt, fpt, center):
        return dataclasses.replace(
            self.template_cam, world_view_transform=wvt,
            full_proj_transform=fpt, camera_center=center, image=None)

    def _render(self, fp: Dict, alive, wvt, fpt, center, screen_offset, bg):
        g = GaussianParams(alive=alive, **{k: fp[k] for k in FLOAT_FIELDS})
        cam = self._make_cam(wvt, fpt, center)
        proj = project_gaussians(g, cam)
        out = rasterize(
            proj, cam.height, cam.width, bg,
            RasterizeConfig(self.cfg.max_per_tile, self.cfg.tile_chunk,
                            self.cfg.coarse_factor, self.cfg.max_per_coarse),
            screen_offset=screen_offset)
        return out

    def _train_step(self, fp, opt_state, stats, alive, wvt, fpt, center,
                    target, bg):
        cfg = self.cfg
        capacity = alive.shape[0]

        def loss_fn(fp, screen_offset):
            out = self._render(fp, alive, wvt, fpt, center, screen_offset, bg)
            ll1 = l1_loss(out.image, target)
            loss = (1.0 - cfg.lambda_dssim) * ll1
            if cfg.lambda_dssim > 0:
                loss = loss + cfg.lambda_dssim * (1.0 - ssim(out.image, target))
            if cfg.lambda_lpips > 0 and self.lpips_fn is not None:
                loss = loss + cfg.lambda_lpips * self.lpips_fn(
                    out.image[None], target[None])
            op = jax.nn.sigmoid(fp["opacity"][:, 0]) * alive
            loss = loss + cfg.lambda_opacity * jnp.sum(op) / jnp.maximum(
                jnp.sum(alive), 1)
            return loss, out

        screen_offset = jnp.zeros((capacity, 2))
        (loss, out), (grads, screen_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(fp, screen_offset)
        updates, opt_state = self.opt.update(grads, opt_state, fp)
        fp = optax.apply_updates(fp, updates)
        if cfg.opacity_decay < 1.0:
            # per-step multiplicative opacity decay: continuous floater
            # pressure replacing the hard reset's shock; surface gaussians
            # re-learn instantly at opacity_lr=0.05 while unsupported ones
            # drift under min_opacity and get pruned at densify events
            op = jax.nn.sigmoid(fp["opacity"])
            op = jnp.clip(op * cfg.opacity_decay, 1e-6, 1 - 1e-6)
            fp = {**fp, "opacity": jnp.log(op / (1 - op))}
        visible = out.radii > 0
        # on-device densification stats (gaussian_model.py:566-569).
        # The CUDA rasterizer's backward accumulates dL/d(mean2D) in NDC
        # units (diff-gaussian-rasterization backward.cu: ddelx_dx = 0.5*W),
        # and densify_grad_threshold=0.0002 is calibrated for that scale.
        # Our screen_offset is in PIXELS, so rescale by (W/2, H/2) — without
        # this the stat is ~W/2 x too small and densification never fires
        # (round-2 quality run: alive grew only 20k->46k, fit stuck at
        # 16.5 dB).
        ndc_scale = jnp.asarray(
            [0.5 * self.template_cam.width, 0.5 * self.template_cam.height])
        gnorm = jnp.linalg.norm(screen_grads * ndc_scale, axis=-1)
        stats = {
            "grad_accum": stats["grad_accum"] + jnp.where(visible, gnorm, 0.0),
            "denom": stats["denom"] + visible.astype(jnp.float32),
            "max_radii": jnp.maximum(stats["max_radii"],
                                     jnp.where(visible, out.radii, 0.0)),
        }
        return fp, opt_state, stats, loss

    def _train_chunk(self, fp, opt_state, stats, alive, images, wvts, fpts,
                     centers, cam_idxs, bgs):
        """lax.scan over _train_step: many iterations in ONE dispatch.
        Per-call dispatch over the tunneled TPU costs ~50ms — more than the
        compiled step itself — so the production path runs chunks of steps
        between densification events.  Camera/image stacks are ARGUMENTS
        (closing over them would bake 56MB of targets into the program)."""

        def body(carry, xs):
            fp, opt_state, stats = carry
            idx, bg = xs
            fp, opt_state, stats, loss = self._train_step(
                fp, opt_state, stats, alive,
                wvts[idx], fpts[idx], centers[idx], images[idx], bg)
            return (fp, opt_state, stats), loss

        (fp, opt_state, stats), losses = jax.lax.scan(
            body, (fp, opt_state, stats), (cam_idxs, bgs))
        return fp, opt_state, stats, losses

    def train_chunk(self, n: int,
                    cam_indices: Optional[np.ndarray] = None) -> Dict:
        """Run ``n`` train iterations in one compiled program.  Does NOT
        cross densification/opacity-reset boundaries — the caller schedules
        chunks between events (see apps/recon_gs.py)."""
        cfg = self.cfg
        if cam_indices is None:
            cam_indices = self.rng.randint(len(self.cams), size=n)
        cam_idxs = jnp.asarray(np.asarray(cam_indices, np.int32))
        if cfg.random_background:
            bgs = jnp.asarray(self.rng.rand(n, 3).astype(np.float32))
        else:
            base = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
            bgs = jnp.tile(base[None], (n, 1))
        if not hasattr(self, "_chunk_jit"):
            self._chunk_jit = jax.jit(self._train_chunk,
                                      donate_argnums=(0, 1, 2))
        self.params, self.opt_state, self.stats, losses = self._chunk_jit(
            self.params, self.opt_state, self.stats, self.alive,
            self.images, self.cam_wvt, self.cam_fpt, self.cam_center,
            cam_idxs, bgs)
        self.step_count += n
        stats = {"loss": losses[-1], "losses": losses,
                 "iter": self.step_count}
        self._maybe_events(stats)
        return stats

    # ------------------------------------------------------------------
    def train_iter(self, cam_idx: Optional[int] = None) -> Dict:
        cfg = self.cfg
        self.step_count += 1
        it = self.step_count
        if cam_idx is None:
            cam_idx = int(self.rng.randint(len(self.cams)))
        bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
        if cfg.random_background:
            bg = jnp.asarray(self.rng.rand(3).astype(np.float32))

        self.params, self.opt_state, self.stats, loss = self._step_jit(
            self.params, self.opt_state, self.stats, self.alive,
            self.cam_wvt[cam_idx], self.cam_fpt[cam_idx],
            self.cam_center[cam_idx], self.images[cam_idx], bg)

        # keep the loss LAZY (device scalar): float() here would force a
        # device->host round trip per iteration, which over the tunneled TPU
        # costs more than the whole compiled step (callers float() on demand)
        stats = {"loss": loss, "iter": it}

        self._maybe_events(stats)
        return stats

    def _maybe_events(self, stats: Dict) -> None:
        """Densify / opacity-reset events due at the CURRENT step count."""
        cfg = self.cfg
        it = self.step_count
        if it < cfg.densify_until_iter:
            if it > cfg.densify_from_iter and it % cfg.densification_interval == 0:
                stats.update(self._densify_event())
            if cfg.opacity_reset_mode == "hard" and (
                    it % cfg.opacity_reset_interval == 0 or (
                    cfg.white_background and it == cfg.densify_from_iter)):
                params_np = {k: np.array(v) for k, v in self.params.items()}
                params_np = reset_opacity(params_np)
                self.params = {k: jnp.asarray(v) for k, v in params_np.items()}
                self._surgery(np.ones(self.alive.shape[0], bool),
                              fields=("opacity",))

    def train(self, num_iters: int, log_every: int = 0,
              log_fn=None) -> Dict:
        """Event-aware chunked training: lax.scan chunks of steps between
        densify / opacity-reset / logging boundaries — one TPU dispatch per
        chunk instead of per iteration.  Only ONE scan length is ever
        compiled (``chunk_size``); remainder steps reuse the per-iter jit.
        Events fire inside train_chunk/train_iter at exact multiples."""
        cfg = self.cfg
        C = self.cfg.chunk_size
        end = self.step_count + num_iters
        stats: Dict = {}
        while self.step_count < end:
            it = self.step_count
            nxt = end
            boundaries = []
            if it < cfg.densify_until_iter:
                boundaries.append((it // cfg.densification_interval + 1)
                                  * cfg.densification_interval)
                boundaries.append((it // cfg.opacity_reset_interval + 1)
                                  * cfg.opacity_reset_interval)
                if cfg.white_background and it < cfg.densify_from_iter:
                    boundaries.append(cfg.densify_from_iter)
            if log_every:
                boundaries.append((it // log_every + 1) * log_every)
            nxt = min([nxt] + [b for b in boundaries if b > it])
            seg = nxt - it
            while seg >= C > 1:
                stats = self.train_chunk(C)
                seg -= C
            for _ in range(seg):
                stats = self.train_iter()
            if log_every and log_fn and (
                    self.step_count % log_every == 0
                    or self.step_count >= end):
                log_fn(stats)
        return stats

    def _densify_event(self) -> Dict:
        """Densify/prune every ~100 iters.  Default path runs ON DEVICE
        (gs/densify.densify_and_prune_jnp) — the host version round-trips
        ~35MB of params through the tunnel per event, which costs more than
        the 100 train steps in between.  cfg.host_densify keeps the numpy
        reference path selectable."""
        cfg = self.cfg
        it = self.step_count
        if not cfg.host_densify:
            return self._densify_event_device()
        alive_np = np.array(self.alive)
        g_np = {k: np.array(v) for k, v in self.params.items()}
        g_np["alive"] = alive_np
        state = DensifyState(np.array(self.stats["grad_accum"]),
                             np.array(self.stats["denom"]),
                             np.array(self.stats["max_radii"]))
        # reference: screen-size pruning arms after the first opacity reset
        # (train_from_vid.py:193).  With reset_mode != "hard" there is no
        # reset; arming it suddenly mid-fit dumped ~7k oversized gaussians
        # at once (12 dB probe shock at iter 3100,
        # quality_refpoint_gs_noreset.json r4) — apply it continuously from
        # densify start instead.
        if cfg.opacity_reset_mode == "hard":
            size_thresh = 20.0 if it > cfg.opacity_reset_interval else 0.0
        else:
            size_thresh = 20.0
        g_np, _, dstats = densify_and_prune(
            g_np, state, self.rng, max_grad=cfg.densify_grad_threshold,
            min_opacity=cfg.min_opacity, extent=self.extent,
            max_screen_size=size_thresh, percent_dense=cfg.percent_dense)
        changed = g_np["alive"] != alive_np
        self.alive = jnp.asarray(g_np["alive"])
        self.params = {k: jnp.asarray(g_np[k]) for k in FLOAT_FIELDS}
        cap = alive_np.shape[0]
        self.stats = {"grad_accum": jnp.zeros((cap,)),
                      "denom": jnp.zeros((cap,)),
                      "max_radii": jnp.zeros((cap,))}
        self._surgery(changed)
        dstats["num_alive"] = int(g_np["alive"].sum())
        return dstats

    def _densify_event_device(self) -> Dict:
        cfg = self.cfg
        it = self.step_count
        # reference: screen-size pruning arms after the first opacity reset
        # (train_from_vid.py:193).  With reset_mode != "hard" there is no
        # reset; arming it suddenly mid-fit dumped ~7k oversized gaussians
        # at once (12 dB probe shock at iter 3100,
        # quality_refpoint_gs_noreset.json r4) — apply it continuously from
        # densify start instead.
        if cfg.opacity_reset_mode == "hard":
            size_thresh = 20.0 if it > cfg.opacity_reset_interval else 0.0
        else:
            size_thresh = 20.0
        if not hasattr(self, "_densify_jit"):
            import functools

            from v3d_tpu.gs.densify import densify_and_prune_jnp

            self._densify_jit = jax.jit(
                functools.partial(
                    densify_and_prune_jnp,
                    max_grad=cfg.densify_grad_threshold,
                    min_opacity=cfg.min_opacity, extent=self.extent,
                    percent_dense=cfg.percent_dense),
                static_argnames=("max_screen_size",))
            self._jax_key = jax.random.PRNGKey(int(self.rng.randint(2**31)))
        self._jax_key, sub = jax.random.split(self._jax_key)
        old_alive = self.alive
        new_params, new_alive, touched, dstats = self._densify_jit(
            self.params, old_alive, self.stats["grad_accum"],
            self.stats["denom"], self.stats["max_radii"], sub,
            max_screen_size=size_thresh)
        self.params = new_params
        self.alive = new_alive
        cap = new_alive.shape[0]
        self.stats = {"grad_accum": jnp.zeros((cap,)),
                      "denom": jnp.zeros((cap,)),
                      "max_radii": jnp.zeros((cap,))}
        self._surgery(touched | (old_alive != new_alive))
        out = dict(dstats)
        out["num_alive"] = jnp.sum(new_alive)  # lazy device scalar
        return out

    def _surgery(self, changed: np.ndarray, fields=FLOAT_FIELDS) -> None:
        """Zero Adam moments on changed slots (reference optimizer-state
        surgery, gaussian_model.py:375-445)."""
        flat, treedef = jax.tree_util.tree_flatten(
            self.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))

        def fix(leaf):
            if isinstance(leaf, optax.ScaleByAdamState):
                mu = dict(leaf.mu)
                nu = dict(leaf.nu)
                for k in fields:
                    if k in mu and hasattr(mu[k], "shape"):
                        mask = jnp.asarray(changed).reshape(
                            (-1,) + (1,) * (mu[k].ndim - 1))
                        mu[k] = jnp.where(mask, 0.0, mu[k])
                        nu[k] = jnp.where(mask, 0.0, nu[k])
                return leaf._replace(mu=mu, nu=nu)
            return leaf

        flat = [fix(leaf) for leaf in flat]
        self.opt_state = jax.tree_util.tree_unflatten(treedef, flat)

    # ------------------------------------------------------------------
    def render_view(self, cam_idx: int, bg: Optional[jnp.ndarray] = None):
        bg = bg if bg is not None else (
            jnp.ones(3) if self.cfg.white_background else jnp.zeros(3))
        return self._render(self.params, self.alive,
                            self.cam_wvt[cam_idx], self.cam_fpt[cam_idx],
                            self.cam_center[cam_idx], None, bg)

    def gaussians_np(self) -> Dict[str, np.ndarray]:
        out = {k: np.array(v) for k, v in self.params.items()}
        out["alive"] = np.array(self.alive)
        return out

    # ------------------------------------------------------------------
    # checkpoint / elastic recovery (reference: gaussians.capture()/restore()
    # tuples via torch.save, recon/train_from_vid.py:53-55,203-208 +
    # gaussian_model.py:91-141)
    def capture(self) -> Dict:
        """Full resumable state as one pytree (params + Adam moments +
        densification stats + alive mask + step).  Camera-sampling RNG is
        not captured — the reference's torch.save capture doesn't either."""
        return {"params": self.params, "opt_state": self.opt_state,
                "stats": self.stats, "alive": self.alive,
                "step": self.step_count}

    def restore(self, tree: Dict) -> None:
        self.params = {k: jnp.asarray(v) for k, v in tree["params"].items()}
        self.opt_state = tree["opt_state"]
        self.stats = {k: jnp.asarray(v) for k, v in tree["stats"].items()}
        self.alive = jnp.asarray(tree["alive"])
        self.step_count = int(tree["step"])

    def save(self, path: str) -> None:
        from v3d_tpu.core.checkpoint import save_pytree

        save_pytree(path, self.capture())

    def load(self, path: str) -> None:
        from v3d_tpu.core.checkpoint import load_pytree

        self.restore(load_pytree(path, target=self.capture()))
