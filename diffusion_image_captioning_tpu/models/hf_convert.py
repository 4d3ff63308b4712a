"""HF-checkpoint -> Flax param conversion (pretrained-asset bridge).

The reference loads a locally saved HF ``distilbert-base-uncased`` for its
frozen embedding/vocab head (CLIP-DDPM.py:329-331 — note the *denoiser*
transformer itself is RANDOM-init: ``DistilBertForMaskedLM(config)`` at
:236; only ``get_input_embeddings()``/``get_output_embeddings()`` come from
the pretrained model) and ``openai/clip-vit-base-patch32`` for COCO feature
extraction (COCO_BLEU.py:211-212).

These converters map HF torch state_dicts onto this framework's param trees.
Torch/transformers are imported lazily and every entry point degrades
gracefully when assets are absent (this environment has no network egress),
leaving the random init in place — identical math, untrained weights.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def load_distilbert_state_dict(model_dir: str):
    """state_dict of a local DistilBertForMaskedLM save (the reference's
    ./models/distilbert-base-uncased-local layout, CLIP-DDPM.py:329)."""
    from transformers import DistilBertForMaskedLM  # lazy

    m = DistilBertForMaskedLM.from_pretrained(model_dir, local_files_only=True)
    return m.state_dict()


def convert_embedding_and_head(sd) -> dict:
    """The two pretrained+frozen leaves (CLIP-DDPM.py:245-247): the word-
    embedding table and the vocab projector (bias dropped — the reference
    zeroes it and our head is bias-free by construction)."""
    return {
        ("embedding_table",): _np(sd["distilbert.embeddings.word_embeddings.weight"]),
        ("lm_head_kernel",): _np(sd["vocab_projector.weight"]).T,
    }


def convert_distilbert_encoder(sd, n_layers: int = 6) -> dict:
    """Full encoder conversion (position embeddings, 6 blocks, MLM transform
    head) keyed by this framework's flat param paths under 'encoder'."""
    out: dict = {}

    def put(path, arr):
        out[("encoder",) + path] = arr

    put(("position_embeddings",), _np(sd["distilbert.embeddings.position_embeddings.weight"]))
    put(("embed_layer_norm", "scale"), _np(sd["distilbert.embeddings.LayerNorm.weight"]))
    put(("embed_layer_norm", "bias"), _np(sd["distilbert.embeddings.LayerNorm.bias"]))
    for i in range(n_layers):
        hf = f"distilbert.transformer.layer.{i}"
        # HF keeps separate q/k/v linears; our attention runs one fused
        # [D, 3D] projection (models/distilbert.py) — concatenate.
        qkv_kernel = np.concatenate(
            [
                _np(sd[f"{hf}.attention.{n}.weight"]).T
                for n in ("q_lin", "k_lin", "v_lin")
            ],
            axis=1,
        )
        qkv_bias = np.concatenate(
            [_np(sd[f"{hf}.attention.{n}.bias"]) for n in ("q_lin", "k_lin", "v_lin")]
        )
        put((f"layer_{i}", "attention", "qkv_lin", "kernel"), qkv_kernel)
        put((f"layer_{i}", "attention", "qkv_lin", "bias"), qkv_bias)
        put(
            (f"layer_{i}", "attention", "out_lin", "kernel"),
            _np(sd[f"{hf}.attention.out_lin.weight"]).T,
        )
        put(
            (f"layer_{i}", "attention", "out_lin", "bias"),
            _np(sd[f"{hf}.attention.out_lin.bias"]),
        )
        for ours, theirs in (("ffn_lin1", "ffn.lin1"), ("ffn_lin2", "ffn.lin2")):
            put((f"layer_{i}", ours, "kernel"), _np(sd[f"{hf}.{theirs}.weight"]).T)
            put((f"layer_{i}", ours, "bias"), _np(sd[f"{hf}.{theirs}.bias"]))
        for ln in ("sa_layer_norm", "output_layer_norm"):
            put((f"layer_{i}", ln, "scale"), _np(sd[f"{hf}.{ln}.weight"]))
            put((f"layer_{i}", ln, "bias"), _np(sd[f"{hf}.{ln}.bias"]))
    put(("vocab_transform", "kernel"), _np(sd["vocab_transform.weight"]).T)
    put(("vocab_transform", "bias"), _np(sd["vocab_transform.bias"]))
    put(("vocab_layer_norm", "scale"), _np(sd["vocab_layer_norm.weight"]))
    put(("vocab_layer_norm", "bias"), _np(sd["vocab_layer_norm.bias"]))
    return out


def apply_flat_updates(params, flat_updates: dict):
    """Overlay flat {path tuple: array} onto a nested param dict, verifying
    shapes. Returns a new tree."""
    from flax import traverse_util
    import jax.numpy as jnp

    flat = dict(traverse_util.flatten_dict(params))
    for path, arr in flat_updates.items():
        if path not in flat:
            raise KeyError(f"no param at {path}")
        if tuple(flat[path].shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch at {path}: {flat[path].shape} vs {arr.shape}"
            )
        flat[path] = jnp.asarray(arr, flat[path].dtype)
    return traverse_util.unflatten_dict(flat)


def load_pretrained_embedding(params, model_dir: Optional[str]):
    """Reference-parity init: pretrained frozen embedding + vocab head,
    random encoder (CLIP-DDPM.py:236,245-247,329-331). No-op (with a note)
    when the asset directory is missing."""
    if not model_dir or not os.path.isdir(model_dir):
        return params, False
    sd = load_distilbert_state_dict(model_dir)
    return apply_flat_updates(params, convert_embedding_and_head(sd)), True


def convert_clip_vision(model_dir: str, layers: int = 12) -> dict:
    """HF CLIPModel vision tower -> models/clip.py CLIPVisionEncoder flat
    params. HF conv weight [out,in,kh,kw] -> flax [kh,kw,in,out]."""
    from transformers import CLIPModel  # lazy

    m = CLIPModel.from_pretrained(model_dir, local_files_only=True)
    sd = m.state_dict()
    v = "vision_model"
    out: dict = {
        ("patch_embed", "kernel"): _np(
            sd[f"{v}.embeddings.patch_embedding.weight"]
        ).transpose(2, 3, 1, 0),
        ("class_embedding",): _np(sd[f"{v}.embeddings.class_embedding"]),
        ("positional_embedding",): _np(sd[f"{v}.embeddings.position_embedding.weight"]),
        ("ln_pre", "scale"): _np(sd[f"{v}.pre_layrnorm.weight"]),
        ("ln_pre", "bias"): _np(sd[f"{v}.pre_layrnorm.bias"]),
        ("ln_post", "scale"): _np(sd[f"{v}.post_layernorm.weight"]),
        ("ln_post", "bias"): _np(sd[f"{v}.post_layernorm.bias"]),
        ("visual_projection",): _np(sd["visual_projection.weight"]).T,
    }
    for i in range(layers):
        hf = f"{v}.encoder.layers.{i}"
        blk = f"block_{i}"
        pairs = (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("mlp_fc", "mlp.fc1"),
            ("mlp_proj", "mlp.fc2"),
        )
        for ours, theirs in pairs:
            out[(blk, ours, "kernel")] = _np(sd[f"{hf}.{theirs}.weight"]).T
            out[(blk, ours, "bias")] = _np(sd[f"{hf}.{theirs}.bias"])
        for ours, theirs in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            out[(blk, ours, "scale")] = _np(sd[f"{hf}.{theirs}.weight"])
            out[(blk, ours, "bias")] = _np(sd[f"{hf}.{theirs}.bias"])
    return out


def convert_clip_text(model_dir: str, layers: int = 12) -> dict:
    """HF CLIPModel text tower -> models/clip.py CLIPTextEncoder flat
    params (token/pos embeddings, causal pre-LN blocks, ln_final,
    text_projection)."""
    from transformers import CLIPModel  # lazy

    m = CLIPModel.from_pretrained(model_dir, local_files_only=True)
    sd = m.state_dict()
    t = "text_model"
    out: dict = {
        ("token_embedding",): _np(sd[f"{t}.embeddings.token_embedding.weight"]),
        ("positional_embedding",): _np(
            sd[f"{t}.embeddings.position_embedding.weight"]
        ),
        ("ln_final", "scale"): _np(sd[f"{t}.final_layer_norm.weight"]),
        ("ln_final", "bias"): _np(sd[f"{t}.final_layer_norm.bias"]),
        ("text_projection",): _np(sd["text_projection.weight"]).T,
    }
    for i in range(layers):
        hf = f"{t}.encoder.layers.{i}"
        blk = f"block_{i}"
        pairs = (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("mlp_fc", "mlp.fc1"),
            ("mlp_proj", "mlp.fc2"),
        )
        for ours, theirs in pairs:
            out[(blk, ours, "kernel")] = _np(sd[f"{hf}.{theirs}.weight"]).T
            out[(blk, ours, "bias")] = _np(sd[f"{hf}.{theirs}.bias"])
        for ours, theirs in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            out[(blk, ours, "scale")] = _np(sd[f"{hf}.{theirs}.weight"])
            out[(blk, ours, "bias")] = _np(sd[f"{hf}.{theirs}.bias"])
    return out


def save_model_tokenizer(name: str, models_dir: str = "./models", tokenizers_dir: str = "./tokenizers"):
    """Pretrained-asset fetcher (reference: CLIP-DDPM.py:40-50) — downloads
    and saves an HF model + tokenizer locally. Requires network access."""
    from transformers import AutoModel, AutoTokenizer  # lazy

    tok = AutoTokenizer.from_pretrained(name)
    tok.save_pretrained(os.path.join(tokenizers_dir, f"{name}-local"))
    model = AutoModel.from_pretrained(name)
    model.save_pretrained(os.path.join(models_dir, f"{name}-local"))
