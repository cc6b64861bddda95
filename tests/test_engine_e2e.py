"""End-to-end engine tests on a tiny model: image -> cond -> EDM scan ->
temporal VAE decode, single-device and sharded over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params


@pytest.fixture(scope="module")
def tiny():
    engine = build_tiny_engine(num_frames=4, num_steps=2, resolution=64)
    params = init_engine_params(engine, jax.random.PRNGKey(0), 64, 64)
    return engine, params


@pytest.mark.slow
def test_sample_and_decode(tiny):
    engine, params = tiny
    rng = jax.random.PRNGKey(1)
    image = jnp.zeros((1, 64, 64, 3))
    clip_emb, cond_frames = engine.encode_image(params, image, rng, cond_aug=0.02)
    assert clip_emb.shape == (1, 1, 64)
    assert cond_frames.shape == (1, 8, 8, 4)
    c, uc = engine.build_cond(clip_emb, cond_frames, fps_id=1,
                              motion_bucket_id=300, cond_aug=0.02)
    assert c["crossattn"].shape == (4, 1, 64)
    assert c["concat"].shape == (4, 8, 8, 4)
    assert c["vector"].shape == (4, 768)
    assert float(jnp.sum(jnp.abs(uc["crossattn"]))) == 0.0

    z = engine.sample_latents(params, rng, c, uc, height=64, width=64)
    assert z.shape == (4, 8, 8, 4)
    assert np.isfinite(np.asarray(z)).all()

    frames = engine.decode_latents(params, z, decoding_t=2)
    assert frames.shape == (4, 64, 64, 3)
    f = np.asarray(frames)
    assert np.isfinite(f).all() and f.min() >= 0.0 and f.max() <= 1.0


@pytest.mark.slow
def test_sample_jit_and_sharded(tiny):
    """The full sampling loop jitted under a 8-device mesh with the frame
    batch sharded on the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from v3d_tpu.parallel.mesh import make_mesh, replicate

    from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params

    # 8 frames so the frame axis shards evenly over the 8 virtual devices
    engine = build_tiny_engine(num_frames=8, num_steps=2, resolution=64)
    params = init_engine_params(engine, jax.random.PRNGKey(0), 64, 64)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    rng = jax.random.PRNGKey(2)
    image = jnp.zeros((1, 64, 64, 3))
    clip_emb, cond_frames = engine.encode_image(params, image, rng, 0.02)
    c, uc = engine.build_cond(clip_emb, cond_frames, 1, 300, 0.02)

    params_r = replicate(params, mesh)

    @jax.jit
    def run(params, rng, c, uc, noise):
        return engine.sample_latents(params, rng, c, uc, 64, 64, noise=noise)

    noise = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 8, 4))
    with mesh:
        noise_sharded = jax.device_put(
            noise, NamedSharding(mesh, P("data", None, None, None)))
        z = run(params_r, rng, c, uc, noise_sharded)
    z_single = run(params, rng, c, uc, noise)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_single),
                               rtol=1e-2, atol=5e-4)


@pytest.mark.slow
def test_jitted_entry_points_match_eager(tiny):
    """The cached jitted programs the CLIs run (params as ARGUMENTS —
    apps/generate.py, bench.py) must match the eager engine API bitwise-ish.
    Also asserts the minimal-subtree param dicts the CLIs pass are
    sufficient (the programs read only those keys)."""
    engine, params = tiny
    rng = jax.random.PRNGKey(11)
    image = jnp.zeros((1, 64, 64, 3))

    ce_e, cf_e = engine.encode_image(params, image, rng, 0.02)
    ce_j, cf_j = engine.encode_image_jit(
        {"clip": params["clip"], "encoder": params["encoder"]},
        image, rng, 0.02)
    np.testing.assert_allclose(np.asarray(ce_e), np.asarray(ce_j),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cf_e), np.asarray(cf_j),
                               rtol=1e-5, atol=1e-6)

    c, uc = engine.build_cond(ce_e, cf_e, 1, 300, 0.02)
    noise = jax.random.normal(jax.random.PRNGKey(12),
                              engine.latent_shape(64, 64))
    z_e = engine.sample_latents(params, rng, c, uc, noise=noise)
    z_j = engine.sample_latents_jit({"unet": params["unet"]}, rng, c, uc,
                                    noise)
    np.testing.assert_allclose(np.asarray(z_e), np.asarray(z_j),
                               rtol=1e-4, atol=1e-5)

    fs_e = engine.encode_first_stage(params, image, rng)
    fs_j = engine.encode_first_stage_jit({"encoder": params["encoder"]},
                                         image, rng)
    np.testing.assert_allclose(np.asarray(fs_e), np.asarray(fs_j),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_training_loss(tiny):
    engine, params = tiny
    t = engine.num_frames
    latents = jax.random.normal(jax.random.PRNGKey(4), (t, 8, 8, 4))
    cond = {
        "crossattn": jnp.zeros((t, 1, 64)),
        "concat": jnp.zeros((t, 8, 8, 4)),
        "vector": jnp.zeros((t, 768)),
    }
    loss = engine.training_loss(params["unet"], jax.random.PRNGKey(5),
                                latents, cond)
    assert np.isfinite(float(loss))

    grads = jax.grad(
        lambda p: engine.training_loss(p, jax.random.PRNGKey(5), latents, cond)
    )(params["unet"])
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_img2img_partial_denoise(tiny):
    from v3d_tpu.engines.video_diffusion import img2img_latents

    engine, params = tiny
    rng = jax.random.PRNGKey(7)
    image = jnp.zeros((1, 64, 64, 3))
    clip_emb, cond_frames = engine.encode_image(params, image, rng, 0.02)
    c, uc = engine.build_cond(clip_emb, cond_frames, 1, 300, 0.02)
    init = jax.random.normal(jax.random.PRNGKey(8), (4, 8, 8, 4)) * 0.5
    out = img2img_latents(engine, params, rng, init, c, uc, strength=0.5,
                          num_steps=2)
    assert out.shape == init.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_bf16_vs_f32_sampling_psnr():
    """bf16 compute (TPU serving mode) must stay close to f32 on the same
    weights — the scaled-down version of the >=40dB production bar."""
    from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params

    e32 = build_tiny_engine(num_frames=4, num_steps=3, resolution=64)
    p32 = init_engine_params(e32, jax.random.PRNGKey(0), 64, 64)
    e16 = build_tiny_engine(num_frames=4, num_steps=3, resolution=64,
                            dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(1)
    image = jnp.zeros((1, 64, 64, 3))
    clip_emb, cf = e32.encode_image(p32, image, rng, 0.02)
    c, uc = e32.build_cond(clip_emb, cf, 1, 300, 0.02)
    noise = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4))
    z32 = np.asarray(e32.sample_latents(p32, rng, c, uc, 64, 64, noise=noise))
    z16 = np.asarray(e16.sample_latents(p32, rng, c, uc, 64, 64, noise=noise))
    rng_range = np.abs(z32).max()
    psnr = 20 * np.log10(rng_range / np.sqrt(np.mean((z32 - z16) ** 2) + 1e-12))
    assert psnr > 25.0, f"bf16 deviates too much: {psnr:.1f} dB"
