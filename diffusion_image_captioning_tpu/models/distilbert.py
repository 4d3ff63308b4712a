"""DistilBERT-style denoiser encoder for continuous token embeddings.

The reference wraps HF ``DistilBertForMaskedLM`` with identity input/output
embeddings so the transformer consumes and produces raw 768-d float vectors
(reference: CLIP-DDPM.py:249-250). The behavioral contract this module
reproduces (clean-room, in Flax linen):

  * "embeddings" stage = learned positional embeddings added to the continuous
    input, then LayerNorm(eps=1e-12) + dropout — exactly what HF's Embeddings
    module still does after word embeddings are replaced by identity
    (SURVEY.md section 2, fidelity note 1).
  * 6 post-LN transformer blocks (MHA + FFN(GELU, 3072)), hidden 768, 12 heads
    (stock DistilBertConfig, CLIP-DDPM.py:326,330).
  * a "transform head" Linear(768,768) -> GELU -> LayerNorm — what remains of
    the MLM head once the vocab projector is identity (CLIP-DDPM.py:250,312).
  * a separate vocab head (Linear dim->vocab, zero bias) used only for the
    rounding loss and decoding (CLIP-DDPM.py:246-247,323). Kept OUT of this
    module: it is a frozen parameter owned by the full model (denoiser.py) so
    the optimizer partition can exclude it.

TPU-first choices: everything is static-shape; compute dtype is bf16 with fp32
params and fp32 LayerNorm statistics; the attention half routes through the
fused Pallas half-block (ops/attn_block.py), the attention-only Pallas core
(ops/attention_core.py), or plain XLA einsum (identical math).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax.nn import initializers

Dtype = Any


def mha_reference(q, k, v, mask, *, dropout_fn=None):
    """Plain-XLA scaled-dot-product attention.

    q, k, v: [N, H, L, Dh] (q may have fewer rows L_q).
    mask:    [N, L] float/bool padding mask over KEYS (1 = attend).
    Matches HF DistilBERT masking: masked scores set to a large negative
    before softmax (finite, so fully-masked rows stay NaN-free).
    """
    dh = q.shape[-1]
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(dh).astype(q.dtype)
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    scores = jnp.where(mask[:, None, None, :] > 0, scores, neg)
    weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_fn is not None:
        weights = dropout_fn(weights)
    return jnp.einsum("nhqk,nhkd->nhqd", weights, v)


class MultiHeadSelfAttention(nn.Module):
    dim: int
    n_heads: int
    dropout: float
    dtype: Dtype = jnp.bfloat16
    initializer_range: float = 0.02
    use_fused_core: bool = True  # Pallas attention_core on TPU

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        """x: FLAT [N*L, D] activations (see DenoiserEncoder — the flat
        layout dodges sublane padding at tiny L); mask: [N, L]."""
        from diffusion_image_captioning_tpu.ops.attention_core import (
            attention_core,
        )

        N, L = mask.shape
        init = initializers.normal(self.initializer_range)
        # One fused [D, 3D] projection instead of three [D, D] matmuls
        # (models/hf_convert.py concatenates HF's separate q/k/v matrices
        # into this layout).
        qkv = nn.Dense(
            3 * self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=init,
            name="qkv_lin",
        )(x)
        rate = self.dropout if not deterministic else 0.0
        rng = self.make_rng("dropout") if rate > 0 else None
        out = attention_core(
            qkv,
            mask,
            n_heads=self.n_heads,
            seq_len=L,
            dropout_rate=rate,
            dropout_rng=rng,
            force_xla=not self.use_fused_core,
        )
        return nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=init,
            name="out_lin",
        )(out)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}, fp32) so
    checkpoints and the HF converter see an unchanged layout while the
    compute runs inside the fused FFN op (ops/ffn_block.py)."""

    in_features: int
    features: int
    stddev: float

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            initializers.normal(self.stddev),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _LayerNormParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree ({scale, bias}, fp32)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", initializers.zeros, (self.features,), jnp.float32)
        return s, b


class TransformerBlock(nn.Module):
    """Post-LN block: LN(x + MHA(x)); LN(h + FFN(h)). HF DistilBERT layout.

    The FFN half (lin1 -> GELU -> lin2 -> dropout -> residual -> LN) runs
    through ops/ffn_block.ffn_ln_block. The fused Pallas forward exists and
    is verified, but measured SLOWER in the full train step than XLA's own
    scheduling of the same chain (58.1 vs 53.3 ms/step on v5e — see
    docs/PERF.md), so ``use_fused_ffn`` defaults to False and the call goes
    through the op's XLA composition."""

    dim: int
    n_heads: int
    hidden_dim: int
    dropout: float
    attention_dropout: float
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.bfloat16
    initializer_range: float = 0.02
    use_fused_core: bool = True
    use_fused_ffn: bool = False
    use_fused_attn_block: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        """x: FLAT [N*L, D]; mask [N, L]. Output flat."""
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        if self.use_fused_attn_block:
            # Whole attention half as ONE fused op (ops/attn_block.py).
            # Param holders reproduce the exact tree the unfused modules
            # create ({attention: {qkv_lin, out_lin}}, sa_layer_norm) so
            # checkpoints and the HF converter are layout-invariant.
            x = self._fused_attn_half(x, mask, deterministic)
        else:
            attn_out = MultiHeadSelfAttention(
                dim=self.dim,
                n_heads=self.n_heads,
                dropout=self.attention_dropout,
                dtype=self.dtype,
                initializer_range=self.initializer_range,
                use_fused_core=self.use_fused_core,
                name="attention",
            )(x, mask, deterministic)
            x = nn.LayerNorm(
                epsilon=self.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="sa_layer_norm",
            )(x + attn_out)

        w1, b1 = _DenseParams(
            self.dim, self.hidden_dim, self.initializer_range, name="ffn_lin1"
        )()
        w2, b2 = _DenseParams(
            self.hidden_dim, self.dim, self.initializer_range, name="ffn_lin2"
        )()
        gamma, beta = _LayerNormParams(self.dim, name="output_layer_norm")()
        rate = self.dropout if not deterministic else 0.0
        rng = self.make_rng("dropout") if rate > 0 else None
        return ffn_ln_block(
            x, w1, b1, w2, b2, gamma, beta,
            dropout_rate=rate,
            dropout_rng=rng,
            eps=self.layer_norm_eps,
            force_xla=not self.use_fused_ffn,
        )

    def _fused_attn_half(self, x, mask, deterministic: bool):
        """qkv proj + attention + out proj + residual + LN through
        ops/attn_block.attn_ln_block (fused Pallas fwd on TPU)."""
        from diffusion_image_captioning_tpu.ops.attn_block import attn_ln_block

        class _QkvOut(nn.Module):
            dim: int = self.dim
            stddev: float = self.initializer_range

            @nn.compact
            def __call__(inner):
                wqkv, bqkv = _DenseParams(
                    inner.dim, 3 * inner.dim, inner.stddev, name="qkv_lin"
                )()
                wout, bout = _DenseParams(
                    inner.dim, inner.dim, inner.stddev, name="out_lin"
                )()
                return wqkv, bqkv, wout, bout

        wqkv, bqkv, wout, bout = _QkvOut(name="attention")()
        gamma, beta = _LayerNormParams(self.dim, name="sa_layer_norm")()
        _, L = mask.shape
        rate = self.attention_dropout if not deterministic else 0.0
        rng = self.make_rng("dropout") if rate > 0 else None
        return attn_ln_block(
            x, wqkv, bqkv, wout, bout, gamma, beta, mask,
            n_heads=self.n_heads,
            seq_len=L,
            dropout_rate=rate,
            dropout_rng=rng,
            eps=self.layer_norm_eps,
            force_xla=not self.use_fused_core,
        )


class DenoiserEncoder(nn.Module):
    """Positional embed + LN + dropout, N transformer blocks, transform head.

    Input:  continuous embeddings [N, L, dim], padding mask [N, L].
    Output: transformed hidden states [N, L, dim] (NOT logits — the vocab
    projection is a separate frozen head, see module docstring).
    """

    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    attention_dropout: float = 0.1
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    dtype: Dtype = jnp.bfloat16
    use_fused_core: bool = True
    use_fused_ffn: bool = False
    use_fused_attn_block: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        N, L, _ = x.shape
        pos = self.param(
            "position_embeddings",
            initializers.normal(self.initializer_range),
            (self.max_position_embeddings, self.dim),
            jnp.float32,
        )
        x = x.astype(self.dtype) + pos[:L].astype(self.dtype)[None]
        # Flatten to [N*L, D] for all dense/elementwise work: at tiny L the
        # (sublane, lane) tiling pads L (e.g. 18 -> 32 for bf16), inflating
        # every intermediate ~1.8x; the flat layout tiles perfectly and
        # only the attention core reshapes back (measured -5 ms fwd, -5 ms
        # bwd per step at flagship size on v5e).
        x = x.reshape(N * L, self.dim)
        x = nn.LayerNorm(
            epsilon=self.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="embed_layer_norm",
        )(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)

        block_cls = TransformerBlock
        if self.remat:
            # linen remat argnums count the module instance as arg 0, so
            # `deterministic` (a Python bool) is positional arg 3.
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(self.n_layers):
            x = block_cls(
                dim=self.dim,
                n_heads=self.n_heads,
                hidden_dim=self.hidden_dim,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                initializer_range=self.initializer_range,
                use_fused_core=self.use_fused_core,
                use_fused_ffn=self.use_fused_ffn,
                use_fused_attn_block=self.use_fused_attn_block,
                name=f"layer_{i}",
            )(x, mask, deterministic)

        # MLM transform head with identity vocab projector (CLIP-DDPM.py:250).
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=initializers.normal(self.initializer_range),
            name="vocab_transform",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(
            epsilon=self.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="vocab_layer_norm",
        )(x)
        return x.reshape(N, L, self.dim)
