#!/usr/bin/env python
"""On-hardware keep-fraction check for in-kernel dropout (CLAUDE.md rule:
numeric fwd/bwd-consistency tests CANNOT catch a wrong rate, because fwd
and bwd regenerate the same — possibly wrong — mask; the round-1 Mosaic
signed-compare bug shipped 0.5-rate dropout past every parity test).

Probes the fused attention half-block's forward (ops/attn_block.py) by
constructing weights that expose the raw softmax-dropout mask in the
saved ctx output:

    Wqkv = [0 | 0 | I]  ->  q = k = 0  ->  p uniform = 1/L over own keys;
    x[seq j, col c] = L * delta(j == c) for c < L
    =>  ctx[row r, c] = drop[r, c] * keep_scale   (head 0, c < L)

so keep fraction = mean(ctx != 0) and kept values must equal
1/(1-rate). Run:  python bench/dropout_check.py [rate]
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu.ops import attn_block as ab

    rate = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    # N must be a multiple of the kernel tile (TN=20 at L=18): _pallas_fwd
    # is the raw kernel entry with no padding wrapper
    N, L, H, dh = 520, 18, 12, 64
    D = H * dh
    x = np.zeros((N * L, D), np.float32)
    for j in range(L):
        x[j::L, j] = float(L)  # position j lights column j (head 0 range)
    x = jnp.asarray(x, jnp.bfloat16)
    wqkv = jnp.zeros((D, 3 * D), jnp.float32)
    wqkv = wqkv.at[:, 2 * D :].set(jnp.eye(D))  # v = x; q = k = 0
    mask = jnp.ones((N, L), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)

    _, _, ctx, _ = ab._pallas_fwd(
        x, wqkv, jnp.zeros((3 * D,)), jnp.eye(D), jnp.zeros((D,)),
        jnp.ones((D,)), jnp.zeros((D,)), mask, seed,
        H=H, dh=dh, L=L, rate=rate, eps=1e-12, interpret=False,
    )
    vals = np.asarray(ctx[:, :L], np.float32)  # [N*L, L] mask * keep_scale
    kept = vals > 1e-3
    frac = kept.mean()
    scale = vals[kept].mean() if kept.any() else float("nan")
    n = vals.size
    tol = 4.0 * np.sqrt(rate * (1 - rate) / n)  # 4 sigma
    print(
        f"rate={rate}: keep fraction {frac:.4f} (expect {1-rate:.4f} "
        f"+- {tol:.4f}), kept value {scale:.4f} (expect {1/(1-rate):.4f})"
    )
    ok = abs(frac - (1 - rate)) < tol and abs(scale - 1 / (1 - rate)) < 0.02
    print("DROPOUT_OK" if ok else "DROPOUT_BAD")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
