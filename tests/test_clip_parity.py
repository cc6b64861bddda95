"""Parity test for the CLIP vision transformer.

open_clip isn't installed, so the golden model is a small torch ViT built
here with the exact open_clip VisionTransformer semantics (patchify conv,
cls+pos, ln_pre, pre-norm blocks with nn.MultiheadAttention, ln_post, cls
pooling, projection).  This validates both our flax implementation and the
in_proj packed-qkv weight conversion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

WIDTH, LAYERS, HEADS, PATCH, IMG, OUT = 64, 2, 4, 8, 32, 48


class TorchViT(tnn.Module):
    """Mirror of open_clip.transformer.VisionTransformer (tok pooling)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, WIDTH, PATCH, PATCH, bias=False)
        n_tok = (IMG // PATCH) ** 2 + 1
        self.class_embedding = tnn.Parameter(torch.randn(WIDTH) * 0.1)
        self.positional_embedding = tnn.Parameter(torch.randn(n_tok, WIDTH) * 0.1)
        self.ln_pre = tnn.LayerNorm(WIDTH)
        self.blocks = tnn.ModuleList()
        for _ in range(LAYERS):
            blk = tnn.Module()
            blk.ln_1 = tnn.LayerNorm(WIDTH)
            blk.attn = tnn.MultiheadAttention(WIDTH, HEADS, batch_first=True)
            blk.ln_2 = tnn.LayerNorm(WIDTH)
            blk.mlp = tnn.Module()
            blk.mlp.c_fc = tnn.Linear(WIDTH, WIDTH * 4)
            blk.mlp.c_proj = tnn.Linear(WIDTH * 4, WIDTH)
            self.blocks.append(blk)
        self.ln_post = tnn.LayerNorm(WIDTH)
        self.proj = tnn.Parameter(torch.randn(WIDTH, OUT) * 0.05)

    def forward(self, x):
        x = self.conv1(x)  # (n, w, g, g)
        x = x.reshape(x.shape[0], WIDTH, -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding[None]
        x = self.ln_pre(x)
        for blk in self.blocks:
            h = blk.ln_1(x)
            h, _ = blk.attn(h, h, h, need_weights=False)
            x = x + h
            h = blk.ln_2(x)
            x = x + blk.mlp.c_proj(tnn.functional.gelu(blk.mlp.c_fc(h)))
        x = self.ln_post(x)
        return x[:, 0] @ self.proj


def _to_openclip_sd(net):
    """Rename the mirror's keys to the open_clip layout the converter expects."""
    sd = {}
    for k, v in net.state_dict().items():
        k2 = k.replace("blocks.", "transformer.resblocks.")
        sd["model.visual." + k2] = v
    return sd


def test_clip_vit_parity():
    from v3d_tpu.core.convert import convert_clip_visual
    from v3d_tpu.models.clip_vit import CLIPVisionTransformer

    torch.manual_seed(0)
    ref = TorchViT().eval()
    params = {"params": convert_clip_visual(_to_openclip_sd(ref))}
    jnet = CLIPVisionTransformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                                 patch_size=PATCH, image_size=IMG,
                                 output_dim=OUT)
    x = np.random.RandomState(0).randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(jnet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    rel = np.abs(out_ref - out).max() / (np.abs(out_ref).mean() + 1e-8)
    assert rel < 1e-3, rel


def test_clip_preprocess_range():
    from v3d_tpu.models.clip_vit import clip_preprocess

    x = jnp.zeros((1, 256, 256, 3))  # mid-gray in [-1, 1]
    out = clip_preprocess(x)
    assert out.shape == (1, 224, 224, 3)
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, rtol=1e-4)


def test_concat_timestep_embedder():
    from v3d_tpu.models.conditioner import ConcatTimestepEmbedderND
    from v3d_tpu.models.layers import timestep_embedding

    emb = ConcatTimestepEmbedderND(outdim=8)
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    out = emb(x)
    assert out.shape == (2, 16)
    ref0 = timestep_embedding(jnp.asarray([1.0]), 8)[0]
    np.testing.assert_allclose(out[0, :8], ref0, rtol=1e-5)


def test_general_conditioner_routing():
    from v3d_tpu.models.conditioner import (
        ConcatTimestepEmbedderND,
        EmbedderSpec,
        GeneralConditioner,
        IdentityEncoder,
        repeat_cond_per_frame,
    )

    cond = GeneralConditioner(embedders=(
        EmbedderSpec(IdentityEncoder(), "clip_emb"),        # (b, 1, d) -> crossattn
        EmbedderSpec(ConcatTimestepEmbedderND(4), "fps_id"),     # vector
        EmbedderSpec(ConcatTimestepEmbedderND(4), "motion"),     # vector
        EmbedderSpec(IdentityEncoder(), "cond_frames"),     # (b, h, w, c) -> concat
    ))
    batch = {
        "clip_emb": jnp.ones((2, 1, 16)),
        "fps_id": jnp.ones((2,)),
        "motion": jnp.zeros((2,)),
        "cond_frames": jnp.ones((2, 8, 8, 4)),
    }
    c, uc = cond.get_unconditional_conditioning(
        batch, force_uc_zero_embeddings=["clip_emb", "cond_frames"])
    assert c["crossattn"].shape == (2, 1, 16)
    assert c["vector"].shape == (2, 8)
    assert c["concat"].shape == (2, 8, 8, 4)
    assert float(uc["crossattn"].sum()) == 0.0
    assert float(uc["concat"].sum()) == 0.0
    assert float(uc["vector"].sum()) == float(c["vector"].sum())

    c_rep = repeat_cond_per_frame(c, 3)
    assert c_rep["crossattn"].shape == (6, 1, 16)
    assert c_rep["concat"].shape == (6, 8, 8, 4)
    assert c_rep["vector"].shape == (2, 8)
