"""Flax CLIP ViT-B/32 image encoder for on-device feature extraction.

The reference never runs CLIP on the accelerator: Flickr features come from
precomputed pickles (CLIP-DDPM.py:123-126) and the COCO evaluator calls a
CPU-resident HF CLIP once per image inside __getitem__
(COCO_BLEU.py:217-226) — the slowest possible arrangement. This module is
the TPU-native replacement (BASELINE.json north-star config #5): a clean
Flax implementation of the CLIP visual tower (ViT-B/32) that jit-compiles
and batches the encode on device.

Architecture (Radford et al. 2021, ViT-B/32 visual tower):
    32x32 patch conv (no bias) -> class token + learned pos embed ->
    pre-LN transformer x12 (width 768, 12 heads, MLP 4x, QuickGELU) ->
    ln_post on the class token -> 768->512 projection (no bias) ->
    optional L2 normalization (COCO_BLEU.py:221 normalizes).

Weights can be converted from a HF ``openai/clip-vit-base-patch32``
checkpoint with ``models.hf_convert.convert_clip_vision`` when the asset is
available; random init otherwise (the math path is identical).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

from diffusion_image_captioning_tpu.models.distilbert import mha_reference

Dtype = Any


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPVitBlock(nn.Module):
    """Pre-LN CLIP transformer block; ``causal=True`` gives the text tower's
    autoregressive masking (vision uses full attention)."""

    width: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        N, L, _ = x.shape
        dh = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_1")(x)
        q = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="q_proj")(h)
        k = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="k_proj")(h)
        v = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(h)
        reshape = lambda t: t.reshape(N, L, self.heads, dh).transpose(0, 2, 1, 3)  # noqa: E731
        if self.causal:
            qh, kh, vh = reshape(q), reshape(k), reshape(v)
            scores = jnp.einsum("nhqd,nhkd->nhqk", qh, kh) / jnp.sqrt(dh).astype(
                qh.dtype
            )
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            causal = jnp.tril(jnp.ones((L, L), bool))
            scores = jnp.where(causal[None, None], scores.astype(jnp.float32), neg)
            weights = nn.softmax(scores, axis=-1).astype(qh.dtype)
            attn = jnp.einsum("nhqk,nhkd->nhqd", weights, vh)
        else:
            ones = jnp.ones((N, L), jnp.float32)
            attn = mha_reference(reshape(q), reshape(k), reshape(v), ones)
        attn = attn.transpose(0, 2, 1, 3).reshape(N, L, self.width)
        x = x + nn.Dense(
            self.width, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj"
        )(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_proj")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    """Image [B, H, W, 3] (values already CLIP-normalized) -> [B, embed_dim]."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        B = pixels.shape[0]
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(B, -1, self.width)  # [B, 49, width]
        cls = self.param(
            "class_embedding", initializers.normal(0.02), (self.width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            initializers.normal(0.02),
            (x.shape[1], self.width),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_pre"
        )(x)
        for i in range(self.layers):
            x = CLIPVitBlock(
                width=self.width, heads=self.heads, dtype=self.dtype, name=f"block_{i}"
            )(x)
        cls_out = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_post"
        )(x[:, 0])
        proj = self.param(
            "visual_projection",
            initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        feats = cls_out.astype(jnp.float32) @ proj
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats


class CLIPTextEncoder(nn.Module):
    """CLIP ViT-B/32 text tower: token ids [B, L] -> [B, embed_dim].

    The reference consumes precomputed text CLIP features at train time
    (text_all_final.pickle, CLIP-DDPM.py:124-126) produced off-pipeline by
    its companion feature-extraction repo. This is the on-device equivalent:
    token+positional embeddings -> 12 pre-LN CAUSAL blocks (width 512,
    8 heads, QuickGELU) -> ln_final -> features taken at the EOT position
    (the argmax token id, as in Radford et al. 2021) -> 512->512 projection
    (no bias) -> optional L2 normalization.

    Weights convert from a local HF ``openai/clip-vit-base-patch32`` via
    ``models.hf_convert.convert_clip_text``; tokenization via
    ``data.clip_bpe.CLIPBPETokenizer``.
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        B, L = ids.shape
        tok = self.param(
            "token_embedding",
            initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        pos = self.param(
            "positional_embedding",
            initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = tok[ids].astype(self.dtype) + pos[:L].astype(self.dtype)[None]
        for i in range(self.layers):
            x = CLIPVitBlock(
                width=self.width,
                heads=self.heads,
                dtype=self.dtype,
                causal=True,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln_final"
        )(x)
        # EOT pooling: the end-of-text token carries the highest id in the
        # CLIP vocabulary, so argmax over ids finds its position.
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        feats = pooled.astype(jnp.float32) @ proj
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats


# CLIP's published preprocessing constants (for host-side image prep).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """[B, 224, 224, 3] uint8 -> CLIP-normalized float32 (resize/crop are
    host-side; this handles scale/normalize on device)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std
