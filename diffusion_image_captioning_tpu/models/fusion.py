"""CLIP-feature fusion and classifier-free-guidance mixing, as pure functions.

The reference fuses CLIP image/text features into the token sequence in one of
two ways (CLIP-DDPM.py:295-307):

  * "concat": project each 512-d CLIP vector to 768-d, append the two vectors
    as extra sequence positions, add a 2-entry segment embedding (0 for the 16
    text positions, 1 for the 2 CLIP positions), and extend the padding mask
    with [1, 1] (guided: text token attended) or [1, 0] (unguided).
  * "add": broadcast-add the projected image vector to every position; guided
    rows also add the projected text vector. Mask unchanged.

Classifier-free guidance (CLIP-DDPM.py:313-317) mixes per-row:
    out[guided] = (1 + w) * f(guided_input) - w * f(unguided_input)
The reference does this with boolean indexing and an in-place write; on TPU we
always run both forwards (static shapes) and blend with a `where` over the row
flags in ``concat_mask[:, 1]`` — identical math, XLA-friendly control flow
(SURVEY.md section 7, hard part (e)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FusedInputs(NamedTuple):
    """Inputs to the encoder for the unguided and guided branches."""

    unguided_x: jnp.ndarray     # [N, L', C]
    guided_x: jnp.ndarray       # [N, L', C]
    unguided_mask: jnp.ndarray  # [N, L']
    guided_mask: jnp.ndarray    # [N, L']


def fuse_concat(x, img_tok, txt_tok, mask, segment_embedding):
    """Concat fusion. x [N,L,768]; img_tok/txt_tok [N,1,768] (already
    projected); mask [N,L]; segment_embedding [2,768].

    Both branches share the same fused sequence; only the mask over the text-
    CLIP position differs (CLIP-DDPM.py:296-302).
    """
    N = x.shape[0]
    seq = jnp.concatenate([x, img_tok.astype(x.dtype), txt_tok.astype(x.dtype)], axis=1)
    seg = jnp.concatenate(
        [
            jnp.broadcast_to(segment_embedding[0], (x.shape[1], x.shape[2])),
            jnp.broadcast_to(segment_embedding[1], (2, x.shape[2])),
        ],
        axis=0,
    ).astype(x.dtype)
    seq = seq + seg[None]
    ones = jnp.ones((N, 1), mask.dtype)
    zeros = jnp.zeros((N, 1), mask.dtype)
    unguided_mask = jnp.concatenate([mask, ones, zeros], axis=1)
    guided_mask = jnp.concatenate([mask, ones, ones], axis=1)
    return FusedInputs(seq, seq, unguided_mask, guided_mask)


def fuse_add(x, img_tok, txt_tok, mask):
    """Add fusion: image feature broadcast-added everywhere; guided branch
    also adds the text feature (CLIP-DDPM.py:303-307)."""
    unguided = x + img_tok.astype(x.dtype)
    guided = unguided + txt_tok.astype(x.dtype)
    return FusedInputs(unguided, guided, mask, mask)


def fuse_none(x, mask):
    """Text-only pipeline (lm-trial): no conditioning at all."""
    return FusedInputs(x, x, mask, mask)


def cfg_mix(unguided_out, guided_out, guided_rows, weight):
    """Per-row classifier-free blend over hidden states.

    unguided_out/guided_out: [N, L', C]; guided_rows: [N] bool/0-1;
    weight: scalar w. Rows with flag 0 pass the unguided output through.
    """
    mixed = (1.0 + weight) * guided_out - weight * unguided_out
    flag = guided_rows.reshape(-1, 1, 1).astype(unguided_out.dtype)
    return flag * mixed + (1.0 - flag) * unguided_out
