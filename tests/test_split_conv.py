"""Split skip-concat conv (layers.SplitInputConv2D): exactness vs nn.Conv.

The UNet decoder's first conv per block consumes concat([h, skip]); the
split routing evaluates it as two input-channel-slab convs sharing one
kernel (conv is linear in input channels).  These tests pin (a) the module
matches nn.Conv on the same params, (b) the whole VideoUNet is unchanged
when the routing flips on, (c) the param tree is identical (checkpoint
compatibility).
"""

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def _rand_tree(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda sh: jnp.asarray(rng.randn(*sh.shape) * 0.05, sh.dtype), shapes)


def test_split_conv_matches_nn_conv():
    from v3d_tpu.models.layers import SplitInputConv2D, conv_nd

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 12), jnp.float32)
    pad = [(1, 1), (1, 1)]
    ref = conv_nd(6, (3, 3), padding=pad)
    split = SplitInputConv2D(6, (3, 3), 4, pad)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
    # identical param tree -> the same params drive both modules
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(jax.eval_shape(split.init,
                                                    jax.random.PRNGKey(0), x))
    y_ref = jax.jit(ref.apply)(params, x)
    y_split = jax.jit(split.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_video_unet_unchanged_under_split_routing():
    from v3d_tpu.models import layers
    from v3d_tpu.models.video_unet import VideoUNet

    net = VideoUNet(in_channels=8, model_channels=32, out_channels=4,
                    num_res_blocks=1, attention_resolutions=(2, 1),
                    channel_mult=(1, 2), num_head_channels=16,
                    context_dim=64, adm_in_channels=32)
    t = 2
    x = jnp.asarray(np.random.RandomState(1).randn(2 * t, 8, 8, 8),
                    jnp.float32)
    ts = jnp.ones((2 * t,), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(2).randn(2 * t, 1, 64),
                      jnp.float32)
    y = jnp.asarray(np.random.RandomState(3).randn(2 * t, 32), jnp.float32)
    ioi = jnp.zeros((2, t))

    def fwd(params, x):
        return net.apply(params, x, ts, ctx, y, num_video_frames=t,
                         image_only_indicator=ioi)

    def _init_shapes():
        return jax.eval_shape(
            lambda k, x: net.init(k, x, ts, ctx, y, num_video_frames=t,
                                  image_only_indicator=ioi),
            jax.random.PRNGKey(0), x)

    shapes = _init_shapes()
    params = _rand_tree(shapes)

    prev = layers.split_skip_conv_mode()
    try:
        layers.set_split_skip_conv("0")
        base = jax.jit(fwd)(params, x)
        for mode in ("ds1", "all"):
            layers.set_split_skip_conv(mode)
            # param tree must be identical under the routing
            s2 = _init_shapes()
            assert jax.tree_util.tree_structure(s2) == \
                jax.tree_util.tree_structure(shapes)
            out = jax.jit(fwd)(params, x)
            np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                       atol=2e-5, rtol=2e-5)
    finally:
        layers.set_split_skip_conv(prev)
