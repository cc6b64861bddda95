"""Full-generation A/B of the r5 perf levers (VERDICT r4 task 3).

Variants, each timed as the COMPLETE 18-view 512^2 generation (25 EDM
steps + temporal VAE decode) on the attached chip — only the full program
settles routing questions (CLAUDE.md):

  baseline        measured auto routing (r4: 11.695 s), two programs
  flashjax_ds1    route the >=1024-token spatial levels to the stock jax
                  flash kernel (won the r5 standalone A/B at ds1: 12.128
                  vs 12.455 ms incl. transposes, attention_packed_r5.json)
  bhsd            QKV projections emit (b,h,s,d) directly (einsum
                  epilogue, models/attention_blocks._QKVProjBHSD) — the
                  attention layout copies vanish; auto kernel picks
  bhsd_flashjax   bhsd layout + stock jax kernel at both spatial levels
                  (consumes (b,h,s,d) natively, zero copies)
  fused_decode    sampling + VAE decode in ONE jitted program (kills the
                  inter-program dispatch; the chip has one TensorCore, so
                  any win is dispatch/scheduling, not overlap)
  split_ds1       shipped r5 routing (bhsd+flash_jax) + decoder skip-concat
                  convs evaluated as two square convs at ds1 only (the
                  640->320 convs XLA emits at ~43% MFU, ARCHITECTURE §4b)
  split_all       same but at every decoder level

(The channel-packed Pallas kernel is untestable on this toolchain: Mosaic
requires minor block dims divisible by 128 or full-width, so a (bq, 64)
block carved from a 320-wide array is rejected — negative result recorded
in attention_packed_r5.json.)

Results append to benchmarks/results/generation_variants_r5.json after
EVERY variant (partial evidence survives timeouts).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp

os.makedirs(os.path.join(repo, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.path.join(repo, "benchmarks", "results",
                   "generation_variants_r5.json")


def build():
    from v3d_tpu.engines.builder import build_v3d_engine

    t, steps = 18, 25
    engine = build_v3d_engine(num_frames=t, num_steps=steps,
                              dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: engine.unet.init(
        rng, jnp.zeros((2 * t, 64, 64, 8)), jnp.zeros((2 * t,)),
        jnp.zeros((2 * t, 1, 1024)), jnp.zeros((2 * t, 768)),
        num_video_frames=t, image_only_indicator=jnp.zeros((2, t))))
    unet_params = jax.device_put(jax.tree_util.tree_map(
        lambda sh: np.zeros(sh.shape, np.dtype("bfloat16")), shapes))
    params = {"unet": unet_params}
    c = {"crossattn": jnp.ones((t, 1, 1024), jnp.float32),
         "concat": jnp.ones((t, 64, 64, 4), jnp.float32) * 0.1,
         "vector": jnp.ones((t, 768), jnp.float32)}
    uc = {"crossattn": jnp.zeros((t, 1, 1024), jnp.float32),
          "concat": jnp.zeros((t, 64, 64, 4), jnp.float32),
          "vector": jnp.ones((t, 768), jnp.float32)}
    noise = jax.random.normal(jax.random.PRNGKey(1), (t, 64, 64, 4))

    dec = engine.vae_decoder_ctor(t)
    dec_shapes = jax.eval_shape(
        lambda: dec.init(jax.random.PRNGKey(2), jnp.zeros((t, 64, 64, 4))))
    dec_params = jax.device_put(jax.tree_util.tree_map(
        lambda sh: np.zeros(sh.shape, np.dtype("bfloat16")), dec_shapes))
    return engine, dec, params, dec_params, c, uc, noise


def record(row):
    rows = []
    if os.path.exists(OUT) and os.path.getsize(OUT) > 2:
        with open(OUT) as f:
            rows = json.load(f)
    rows.append(row)
    from benchmarks._io import write_json
    write_json(OUT, rows)


def time_two_program(tag, engine, dec, params, dec_params, c, uc, noise):
    @jax.jit
    def generate(params, rng, c, uc, noise):
        return engine.sample_latents(params, jax.random.PRNGKey(0), c, uc,
                                     512, 512, noise=noise)

    @jax.jit
    def decode(dp, zc):
        return dec.apply(dp, zc / engine.scale_factor)

    t0 = time.time()
    z = generate(params, 0, c, uc, noise)
    np.asarray(z[0, 0, 0, 0])
    compile_gen = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        z = generate(params, 0, c, uc, noise)
        np.asarray(z[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    gen_s = min(times)
    t0 = time.time()
    frames = decode(dec_params, z)
    np.asarray(frames[0, 0, 0, 0])
    compile_dec = time.time() - t0
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        frames = decode(dec_params, z)
        np.asarray(frames[0, 0, 0, 0])
        dts.append(time.perf_counter() - t0)
    dec_s = min(dts)
    row = {"variant": tag, "total_s": round(gen_s + dec_s, 3),
           "unet_25step_s": round(gen_s, 3), "vae_decode_s": round(dec_s, 3),
           "compile_s": round(compile_gen + compile_dec, 1)}
    print(json.dumps(row), flush=True)
    record(row)
    return row


def time_fused(tag, engine, dec, params, dec_params, c, uc, noise):
    @jax.jit
    def generate_and_decode(params, dec_params, c, uc, noise):
        z = engine.sample_latents(params, jax.random.PRNGKey(0), c, uc,
                                  512, 512, noise=noise)
        return dec.apply(dec_params, z / engine.scale_factor)

    t0 = time.time()
    frames = generate_and_decode(params, dec_params, c, uc, noise)
    np.asarray(frames[0, 0, 0, 0])
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        frames = generate_and_decode(params, dec_params, c, uc, noise)
        np.asarray(frames[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    row = {"variant": tag, "total_s": round(min(times), 3),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    record(row)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="baseline,flashjax_ds1,bhsd,bhsd_flashjax,"
                            "fused_decode",
                    help="comma list: baseline, flashjax_ds1, bhsd, "
                         "bhsd_flashjax, fused_decode, bhsd_fused")
    args = ap.parse_args()
    from v3d_tpu.models import attention_blocks as ab
    from v3d_tpu.models import layers as mlayers
    from v3d_tpu.ops import attention as attn

    engine, dec, params, dec_params, c, uc, noise = build()
    for v in args.variants.split(","):
        v = v.strip()
        ab.set_proj_layout(
            "bhsd" if v.startswith(("bhsd", "split")) else "bshd")
        attn.set_spatial_override(
            "flash_jax" if v in ("flashjax_ds1", "bhsd_flashjax",
                                 "split_ds1", "split_all") else None)
        mlayers.set_split_skip_conv(
            {"split_ds1": "ds1", "split_all": "all"}.get(v, "0"))
        try:
            if v in ("baseline", "flashjax_ds1", "bhsd", "bhsd_flashjax",
                     "split_ds1", "split_all"):
                time_two_program(v, engine, dec, params, dec_params, c, uc,
                                 noise)
            elif v in ("fused_decode", "bhsd_fused"):
                time_fused(v, engine, dec, params, dec_params, c, uc, noise)
            else:
                raise ValueError(v)
        except Exception as e:
            row = {"variant": v, "error": f"{type(e).__name__}: {e}"[:400]}
            print(json.dumps(row), flush=True)
            record(row)
        finally:
            attn.set_spatial_override(None)
            ab.set_proj_layout("bshd")
            mlayers.set_split_skip_conv("0")


if __name__ == "__main__":
    main()
