"""Numerical parity with HF DistilBERT under the reference's surgery.

The reference replaces HF DistilBERT's input/output embeddings with identity
modules and feeds continuous vectors (CLIP-DDPM.py:249-250,312). This test
builds a RANDOM-INIT torch DistilBertForMaskedLM locally (no downloads),
performs that exact surgery, converts its weights through
models/hf_convert.py, and checks our Flax DenoiserEncoder reproduces the
torch forward numerically — validating both the architecture transcription
and the weight converter in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from diffusion_image_captioning_tpu.models.distilbert import DenoiserEncoder  # noqa: E402
from diffusion_image_captioning_tpu.models.hf_convert import (  # noqa: E402
    convert_distilbert_encoder,
    convert_embedding_and_head,
)

DIM, LAYERS, HEADS, HIDDEN, VOCAB, L, N = 48, 2, 4, 96, 60, 10, 3


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.DistilBertConfig(
        dim=DIM,
        n_layers=LAYERS,
        n_heads=HEADS,
        hidden_dim=HIDDEN,
        vocab_size=VOCAB,
        max_position_embeddings=32,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    m = transformers.DistilBertForMaskedLM(cfg)
    m.eval()
    # snapshot the state dict BEFORE the identity-embedding surgery below
    # mutates the module (module-scoped fixture)
    sd = {k: v.clone() for k, v in m.state_dict().items()}
    return m, sd


def test_identity_embedded_forward_parity(hf_model):
    hf_model, sd = hf_model

    # our encoder with converted weights
    enc = DenoiserEncoder(
        dim=DIM, n_layers=LAYERS, n_heads=HEADS, hidden_dim=HIDDEN,
        max_position_embeddings=32, dtype=jnp.float32,
    )
    x = np.random.default_rng(1).normal(size=(N, L, DIM)).astype(np.float32)
    mask = np.ones((N, L), np.float32)
    mask[:, -2:] = 0.0
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))[
        "params"
    ]
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(params))
    updates = {
        path[1:]: arr  # strip the leading 'encoder' component
        for path, arr in convert_distilbert_encoder(sd, n_layers=LAYERS).items()
    }
    for path, arr in updates.items():
        assert path in flat, path
        assert flat[path].shape == arr.shape, (path, flat[path].shape, arr.shape)
        flat[path] = jnp.asarray(arr)
    params = traverse_util.unflatten_dict(flat)

    ours = enc.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask), True
    )

    # torch forward with the reference's identity-embedding surgery
    hf_model.distilbert.set_input_embeddings(torch.nn.Sequential())
    hf_model.set_output_embeddings(torch.nn.Sequential())
    with torch.no_grad():
        theirs = hf_model(
            torch.tensor(x), attention_mask=torch.tensor(mask)
        )[0].numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_embedding_and_head_conversion_shapes(hf_model):
    _, sd = hf_model
    conv = convert_embedding_and_head(sd)
    assert conv[("embedding_table",)].shape == (VOCAB, DIM)
    assert conv[("lm_head_kernel",)].shape == (DIM, VOCAB)
    # lm_head kernel is the vocab projector transposed
    np.testing.assert_allclose(
        conv[("lm_head_kernel",)].T,
        sd["vocab_projector.weight"].numpy(),
        atol=1e-7,
    )
