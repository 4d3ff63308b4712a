"""flat_adamw must be numerically equivalent to optax.adamw (it replaces
the per-leaf update purely for TPU fusion efficiency — ops/flat_adamw.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_image_captioning_tpu.ops.flat_adamw import flat_adamw

HP = dict(learning_rate=3e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)


def tree():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "a": jax.random.normal(ks[0], (7, 5)),
        "b": {"w": jax.random.normal(ks[1], (3, 4, 2)), "s": jnp.float32(0.5)},
        "c": jax.random.normal(ks[2], (11,)),
    }


def test_matches_optax_adamw_over_steps():
    params_ref = tree()
    params_flat = jax.tree.map(jnp.array, params_ref)
    ref = optax.adamw(**HP)
    flat = flat_adamw(**HP)
    s_ref = ref.init(params_ref)
    s_flat = flat.init(params_flat)
    key = jax.random.PRNGKey(9)
    for _ in range(5):
        key, k = jax.random.split(key)
        grads = jax.tree.map(
            lambda p: jax.random.normal(k, p.shape) * 0.1, params_ref
        )
        u_ref, s_ref = ref.update(grads, s_ref, params_ref)
        params_ref = optax.apply_updates(params_ref, u_ref)
        u_flat, s_flat = flat.update(grads, s_flat, params_flat)
        params_flat = optax.apply_updates(params_flat, u_flat)
    for pr, pf in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_flat)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pf), atol=1e-6)


def test_requires_params():
    flat = flat_adamw(**HP)
    p = tree()
    s = flat.init(p)
    with pytest.raises(ValueError):
        flat.update(p, s, None)


def test_inject_hyperparams_lr_override():
    """train.set_learning_rate pokes opt_state.hyperparams — the flat
    transform must work under inject_hyperparams exactly like adamw."""
    tx = optax.inject_hyperparams(flat_adamw)(**HP)
    p = tree()
    s = tx.init(p)
    hp = dict(s.hyperparams)
    hp["learning_rate"] = jnp.asarray(1e-5, jnp.float32)
    s = s._replace(hyperparams=hp)
    g = jax.tree.map(jnp.ones_like, p)
    u, _ = tx.update(g, s, p)
    ref = optax.inject_hyperparams(optax.adamw)(**HP)
    s2 = ref.init(p)
    hp2 = dict(s2.hyperparams)
    hp2["learning_rate"] = jnp.asarray(1e-5, jnp.float32)
    s2 = s2._replace(hyperparams=hp2)
    u2, _ = ref.update(g, s2, p)
    for a, b in zip(jax.tree.leaves(u), jax.tree.leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
