"""The full CLIP-Diffusion-LM denoiser model.

Clean-room equivalent of the reference's ``DistilBertModel`` wrapper
(CLIP-DDPM.py:227-323): a DistilBERT-style encoder operating on continuous
embeddings, CLIP concat/add fusion, optional classifier-free guidance, a
frozen token-embedding table as the x0-encoder and a frozen vocab head for
the rounding loss — or, under ``train_embedding``, a learned 16-d embedding
with in/out projections (CLIP-DDPM.py:238-243).

Forward contract (CLIP-DDPM.py:271-323):
    __call__(x[N,L,C], image_clip[N,1,512], text_clip[N,1,512], mask[N,L],
             concat_mask[N,2])
      -> (vocab_logits[N, L, V], hidden[N, L', C])
with L' = L+2 under concat fusion. ``hidden`` is what the sampler feeds back;
``vocab_logits`` feed the rounding loss / decoding.

Parameter freezing: the reference's custom ``parameters()`` excludes the
embedding/lm_head from the optimizer when not training embeddings
(CLIP-DDPM.py:258-269). Here that is a *label tree*: ``param_labels()`` maps
each top-level parameter collection to "trainable"/"frozen", consumed by an
optax.multi_transform partition in train.py.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict
from jax.nn import initializers

from diffusion_image_captioning_tpu.config import Config
from diffusion_image_captioning_tpu.models import fusion
from diffusion_image_captioning_tpu.models.distilbert import DenoiserEncoder


class DenoiserOutput(NamedTuple):
    logits: jnp.ndarray  # [N, L, V] fp32
    hidden: jnp.ndarray  # [N, L', C] fp32


class CLIPDiffusionLM(nn.Module):
    cfg: Config
    logits_fn: Optional[Callable] = None  # (hidden[N,L,C], kernel[C,V]) -> logits

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self.encoder = DenoiserEncoder(
            dim=cfg.dim,
            n_layers=cfg.n_layers,
            n_heads=cfg.n_heads,
            hidden_dim=cfg.hidden_dim,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            max_position_embeddings=cfg.max_position_embeddings,
            layer_norm_eps=cfg.layer_norm_eps,
            initializer_range=cfg.initializer_range,
            dtype=dtype,
            use_fused_core=cfg.use_pallas_attention,
            use_fused_ffn=cfg.use_pallas_ffn,
            use_fused_attn_block=cfg.use_pallas_attn_block,
            remat=cfg.remat_denoiser,
            name="encoder",
        )
        init = initializers.normal(cfg.initializer_range)
        # Token-embedding table: the x0-encoder. Frozen copy of the vocab
        # embedding in the shipped config (CLIP-DDPM.py:245), trainable 16-d
        # table under train_embedding (CLIP-DDPM.py:239).
        self.embedding_table = self.param(
            "embedding_table", init, (cfg.vocab_size, cfg.in_channel), jnp.float32
        )
        # Vocab head ("lm_head"): kernel only — the reference zeroes the bias
        # permanently (CLIP-DDPM.py:247), so we never allocate one.
        self.lm_head_kernel = self.param(
            "lm_head_kernel", init, (cfg.in_channel, cfg.vocab_size), jnp.float32
        )
        if cfg.train_embedding:
            self.input_projection = nn.Dense(
                cfg.dim, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=init, name="input_projection",
            )
            self.output_projection = nn.Dense(
                cfg.in_channel, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=init, name="output_projection",
            )
        if cfg.clip_adding_method != "none":
            self.image_linear = nn.Dense(
                cfg.dim, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=init, name="image_linear",
            )
            self.text_linear = nn.Dense(
                cfg.dim, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=init, name="text_linear",
            )
        if cfg.clip_adding_method == "concat":
            self.segment_embedding = self.param(
                "segment_embedding", init, (2, cfg.dim), jnp.float32
            )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids -> x0 embeddings [B, L, in_channel] (CLIP-DDPM.py:459)."""
        return jnp.take(self.embedding_table, input_ids, axis=0)

    def decode_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Vocab logits from (projected) hidden states. The contraction runs
        in the compute dtype (full-rate MXU under bf16) with fp32
        accumulation and output — the loss math downstream stays fp32."""
        if self.logits_fn is not None:
            return self.logits_fn(hidden.astype(jnp.float32), self.lm_head_kernel)
        dt = jnp.dtype(self.cfg.compute_dtype)
        return jax.lax.dot_general(
            hidden.astype(dt),
            self.lm_head_kernel.astype(dt),
            (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        image_clip: jnp.ndarray,
        text_clip: jnp.ndarray,
        mask: jnp.ndarray,
        concat_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_logits: bool = True,
    ) -> DenoiserOutput:
        cfg = self.cfg
        L = cfg.max_length
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)

        if cfg.train_embedding:
            x = self.input_projection(x)

        if cfg.clip_adding_method == "none":
            fused = fusion.fuse_none(x, mask)
        else:
            img_tok = self.image_linear(image_clip.astype(dtype))
            txt_tok = self.text_linear(text_clip.astype(dtype))
            if cfg.clip_adding_method == "concat":
                fused = fusion.fuse_concat(x, img_tok, txt_tok, mask, self.segment_embedding)
            else:
                fused = fusion.fuse_add(x, img_tok, txt_tok, mask)

        out = self.encoder(fused.unguided_x, fused.unguided_mask, deterministic=deterministic)
        if cfg.classifier_free_weight > 0:
            guided_out = self.encoder(
                fused.guided_x, fused.guided_mask, deterministic=deterministic
            )
            out = fusion.cfg_mix(
                out, guided_out, concat_mask[:, 1], cfg.classifier_free_weight
            )

        if cfg.train_embedding:
            out = self.output_projection(out)

        hidden = out.astype(jnp.float32)
        logits = self.decode_logits(hidden[:, :L]) if return_logits else None
        return DenoiserOutput(logits=logits, hidden=hidden)


FROZEN_WHEN_PRETRAINED = ("embedding_table", "lm_head_kernel")


def param_labels(params, cfg: Config):
    """Label tree for the optimizer partition: "frozen" for the embedding
    table and vocab head unless training embeddings (the functional
    equivalent of the reference's custom parameters(), CLIP-DDPM.py:258-269);
    "trainable" for everything else. Consumed by train.partition_params,
    which splits the param pytree itself (no optax.multi_transform)."""

    def label(path, _):
        names = {k.key for k in path if hasattr(k, "key")}
        frozen = cfg.freeze_embedding and not cfg.train_embedding
        if frozen and names & set(FROZEN_WHEN_PRETRAINED):
            return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def init_denoiser(
    cfg: Config,
    key: jax.Array,
    logits_fn: Optional[Callable] = None,
) -> tuple[CLIPDiffusionLM, FrozenDict[str, Any]]:
    """Build module + initialize params with dummy static-shape inputs.
    The fused attention core (ops/attention_core.py) engages on TPU when
    cfg.use_pallas_attention; the XLA composition runs elsewhere."""
    model = CLIPDiffusionLM(cfg=cfg, logits_fn=logits_fn)
    N = 2
    x = jnp.zeros((N, cfg.max_length, cfg.in_channel), jnp.float32)
    clip = jnp.zeros((N, 1, cfg.clip_dim), jnp.float32)
    mask = jnp.ones((N, cfg.max_length), jnp.float32)
    cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (N, 1))
    # DIC_JIT_INIT=1: compile the whole init as ONE program instead of
    # eager op-by-op dispatch — at flagship scale through the remote
    # tunnel the eager form is hundreds of individually-dispatched
    # initializer ops (part of the 63.5 s init+restore leg, VERDICT
    # round-4 next #4). OFF by default: the compiled fusion produces
    # ULP-different initializer bits (measured on TINY, 2026-08-21),
    # and fresh-run trajectories must stay math-identical to the
    # archived grid/regression logs (runs/README.md gate; the round-5
    # "butterfly" finding is why ULP differences matter). Resume paths
    # discard these params (checkpoint restore overwrites), so the flag
    # is always safe for continue_train segments.
    if os.environ.get("DIC_JIT_INIT"):
        init_fn = jax.jit(
            lambda k: model.init(
                k, x, clip, clip, mask, cmask, deterministic=True
            )["params"]
        )
        params = init_fn(key)
    else:
        params = model.init(
            key, x, clip, clip, mask, cmask, deterministic=True
        )["params"]
    return model, params
