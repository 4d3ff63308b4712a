#!/usr/bin/env python
"""(Re)capture the golden decode ids for tests/test_golden.py.

Run on the CPU backend from the repo root after a DELIBERATE math change
(and say why in the commit):

    python tests/capture_golden.py

Writes tests/golden_decode_ids.json. The ids are a pure function of the
fixed seeds + TINY config on XLA:CPU; any change to model math, sampler
order, or PRNG handling changes them.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_decode_ids.json")


def capture() -> dict:
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from tests.test_golden import (
        decode_tokens,
        forward_argmax,
        train_loss_trajectory,
    )
    from tests.tiny import TINY

    model, params = init_denoiser(TINY, jax.random.PRNGKey(0))
    return {
        "backend": jax.default_backend(),
        "sampler_decode_ids": decode_tokens(model, params),
        "forward_argmax_ids": forward_argmax(model, params),
        "train_loss_trajectory": train_loss_trajectory(),
    }


if __name__ == "__main__":
    data = capture()
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {OUT}")
