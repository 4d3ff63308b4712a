"""Compile-watchdog for the Pallas attention kernel.

The remote Mosaic compiler serving this environment has been observed to
HANG (not error) on certain kernel forms — e.g. the 2026-08-16 lazy-slicing
variant of ops/attention_core.py never returned from compilation (>9 min)
while the current form compiles in ~1-3 min. A hang inside `bench.py` or a
training run is unrecoverable in-process: the XLA/Mosaic compile is a C++
call that cannot be interrupted from Python.

``attention_kernel_ok()`` therefore compile-checks the kernel in a child
process under a hard timeout before any long-lived program commits to the
Pallas path. The child shares the persistent compile cache (.jax_cache), so
once the kernel has compiled successfully the probe costs seconds.

The result is also memoized per-process, and can be forced either way with
DIC_ATTENTION_BACKEND={pallas,xla} for debugging.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
from diffusion_image_captioning_tpu.ops.attention_core import attention_core
L = {seq_len}
qkv = jnp.zeros((8 * L, 3 * {n_heads} * {head_dim}), jnp.bfloat16)
mask = jnp.ones((8, L), jnp.float32)
out = jax.jit(
    lambda q: attention_core(q, mask, n_heads={n_heads}, seq_len=L)
)(qkv)
g = jax.jit(jax.grad(lambda q: attention_core(
    q, mask, n_heads={n_heads}, seq_len=L).astype(jnp.float32).sum()))(qkv)
# Training compiles the dropout_rate>0 variant — a DIFFERENT Mosaic program
# (in-kernel prng_seed + prng_random_bits per head) that must be
# hang-checked too, or the watchdog passes while the real train-step
# compile hangs.
key = jax.random.PRNGKey(0)
gd = jax.jit(jax.grad(lambda q: attention_core(
    q, mask, n_heads={n_heads}, seq_len=L, dropout_rate=0.1,
    dropout_rng=key).astype(jnp.float32).sum()))(qkv)
jax.block_until_ready((out, g, gd))
print("PALLAS_ATTENTION_OK")
"""

_cached: Optional[bool] = None

_ATTN_BLOCK_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
from diffusion_image_captioning_tpu.ops.attn_block import attn_ln_block
L = {seq_len}
D = {n_heads} * {head_dim}
N = 8
ks = jax.random.split(jax.random.PRNGKey(0), 8)
x = jax.random.normal(ks[0], (N * L, D), jnp.bfloat16)
args = (
    jax.random.normal(ks[1], (D, 3 * D)) * 0.05,
    jnp.zeros((3 * D,)),
    jax.random.normal(ks[2], (D, D)) * 0.05,
    jnp.zeros((D,)),
    jnp.ones((D,)),
    jnp.zeros((D,)),
)
mask = jnp.ones((N, L), jnp.float32)
f = lambda x, rate, rng: attn_ln_block(
    x, *args, mask, n_heads={n_heads}, seq_len=L,
    dropout_rate=rate, dropout_rng=rng,
)
out = jax.jit(lambda x: f(x, 0.0, None))(x)
g = jax.jit(jax.grad(lambda x: f(x, 0.0, None).astype(jnp.float32).sum()))(x)
key = jax.random.PRNGKey(0)
gd = jax.jit(jax.grad(
    lambda x: f(x, 0.1, key).astype(jnp.float32).sum()
))(x)
jax.block_until_ready((out, g, gd))
print("PALLAS_ATTN_BLOCK_OK")
"""

_cached_block: Optional[bool] = None

# Every Mosaic program of the fused rounding family: pallas_logprob (fwd),
# pallas_logprob_savez (fwd, 3 outputs), pallas_dh_from_z (save-z backward).
# The non-save-z backward is an XLA scan (no Mosaic program, cannot hang).
# Like the attention probes this checks the kernel FORM at a small M (the
# documented hang mode is form-level, 2026-08-16); full-size compiles share
# the persistent cache once the form is proven.
_ROUNDING_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
from diffusion_image_captioning_tpu.ops.rounding import (
    fused_logprob, fused_logprob_savez,
)
M, C, V = 256, {dim}, {vocab}
ks = jax.random.split(jax.random.PRNGKey(0), 3)
h = jax.random.normal(ks[0], (M, C), jnp.float32)
W = jax.random.normal(ks[1], (C, V), jnp.float32) * 0.02
idx = jax.random.randint(ks[2], (M,), 0, V, jnp.int32)
f = lambda h: fused_logprob(h, W, idx, 1024, "auto", {dtype!r}).sum()
fz = lambda h: fused_logprob_savez(h, W, idx, 1024, "auto", {dtype!r}).sum()
out = jax.jit(f)(h)
gz = jax.jit(jax.grad(fz))(h)  # compiles savez fwd + pallas_dh_from_z
jax.block_until_ready((out, gz))
print("PALLAS_ROUNDING_OK")
"""

_cached_rounding: Optional[bool] = None


def rounding_kernel_ok(
    *,
    dim: int = 768,
    vocab_size: int = 30522,
    matmul_dtype: str = "bfloat16",
    timeout_s: float = 1800.0,
    verbose: bool = True,
) -> bool:
    """True iff the fused rounding kernels (ops/rounding_pallas.py: streamed
    fwd, save-z fwd, dh-from-z bwd) compile AND run within ``timeout_s`` in
    a sacrificial child — same watchdog rationale as attention_kernel_ok."""
    global _cached_rounding
    forced = os.environ.get("DIC_ROUNDING_BACKEND", "").lower()
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    if _cached_rounding is not None:
        return _cached_rounding

    import jax

    if not any(d.platform in ("tpu", "axon") for d in jax.devices()):
        _cached_rounding = True
        return _cached_rounding

    mark = _marker_path("rounding", (dim, vocab_size, matmul_dtype))
    if _marker_ok(mark):
        _cached_rounding = True
        return _cached_rounding

    repo = _repo_root()
    code = _ROUNDING_PROBE.format(
        repo=repo,
        cache=os.path.join(repo, ".jax_cache"),
        dim=dim,
        vocab=vocab_size,
        dtype=matmul_dtype,
    )
    _cached_rounding = _run_probe(
        code, "PALLAS_ROUNDING_OK", timeout_s, verbose, "rounding"
    )
    if _cached_rounding:
        _marker_write(mark)
    return _cached_rounding


def attn_block_kernel_ok(
    *,
    seq_len: int = 18,
    n_heads: int = 12,
    head_dim: int = 64,
    timeout_s: float = 1800.0,
    verbose: bool = True,
) -> bool:
    """True iff the fused attention half-block kernel (ops/attn_block.py)
    compiles AND runs (fwd + bwd + dropout bwd) within ``timeout_s`` in a
    sacrificial child process — same watchdog rationale as
    attention_kernel_ok (the remote Mosaic compiler can hang)."""
    global _cached_block
    forced = os.environ.get("DIC_ATTN_BLOCK_BACKEND", "").lower()
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    if _cached_block is not None:
        return _cached_block

    import jax

    if not any(d.platform in ("tpu", "axon") for d in jax.devices()):
        _cached_block = True
        return _cached_block

    mark = _marker_path("attn_block", (seq_len, n_heads, head_dim))
    if _marker_ok(mark):
        _cached_block = True
        return _cached_block

    repo = _repo_root()
    code = _ATTN_BLOCK_PROBE.format(
        repo=repo,
        cache=os.path.join(repo, ".jax_cache"),
        seq_len=seq_len,
        n_heads=n_heads,
        head_dim=head_dim,
    )
    _cached_block = _run_probe(
        code, "PALLAS_ATTN_BLOCK_OK", timeout_s, verbose, "attn_block"
    )
    if _cached_block:
        _marker_write(mark)
    return _cached_block


def _ops_tree_hash() -> str:
    """Hash of every ops/*.py source — any kernel edit busts the on-disk
    probe markers below (conservative: unrelated ops edits also bust)."""
    import hashlib

    h = hashlib.sha256()
    ops_dir = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(os.listdir(ops_dir)):
        if name.endswith(".py"):
            with open(os.path.join(ops_dir, name), "rb") as f:
                h.update(name.encode())
                h.update(f.read())
    return h.hexdigest()[:16]


def _marker_path(tag: str, params: tuple) -> str:
    """On-disk memo of a SUCCESSFUL probe. Each probe child is an extra
    tunnel client dial, and dials can wedge (CLAUDE.md) — once a kernel
    form+shape has proven itself on this tree, later runs skip the child
    entirely. Lives in .jax_cache next to the XLA artifacts it implies."""
    cache = os.path.join(_repo_root(), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    key = "-".join(str(p) for p in params)
    return os.path.join(cache, f"guard_{tag}_{key}_{_ops_tree_hash()}.ok")


def _marker_ok(path: str) -> bool:
    return os.path.exists(path)


def _marker_write(path: str) -> None:
    try:
        with open(path, "w") as f:
            f.write("ok\n")
    except OSError:
        pass  # read-only cache dir: just lose the memo


def _run_probe(code: str, marker: str, timeout_s: float, verbose: bool,
               tag: str) -> bool:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        ok = proc.returncode == 0 and marker in proc.stdout
        if not ok and verbose:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(
                f"[pallas_guard] {tag} kernel probe FAILED "
                f"(rc={proc.returncode}): {' | '.join(tail)}",
                file=sys.stderr,
            )
    except subprocess.TimeoutExpired:
        ok = False
        if verbose:
            print(
                f"[pallas_guard] {tag} kernel compile exceeded "
                f"{timeout_s:.0f}s — falling back to XLA",
                file=sys.stderr,
            )
    return ok


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def guard_config(cfg):
    """Downgrade a Config's Pallas flags to XLA fallbacks for any kernel
    whose watchdog probe does not come back — the one call every
    long-lived TPU entry point (bench, CLIs, driver entry) makes before
    compiling a training/eval graph in-process."""
    if cfg.use_pallas_attention and not attention_kernel_ok(
        seq_len=cfg.fused_length, n_heads=cfg.n_heads, head_dim=cfg.head_dim
    ):
        cfg = cfg.replace(use_pallas_attention=False)
    if cfg.use_pallas_attn_block and not attn_block_kernel_ok(
        seq_len=cfg.fused_length, n_heads=cfg.n_heads, head_dim=cfg.head_dim
    ):
        cfg = cfg.replace(use_pallas_attn_block=False)
    if (
        cfg.use_fused_rounding_loss
        and cfg.use_prob_loss
        and not cfg.rounding_max_prob
        and not rounding_kernel_ok(
            dim=cfg.dim,
            vocab_size=cfg.vocab_size,
            matmul_dtype=cfg.compute_dtype,
        )
    ):
        # Emergency fallback only: the dense [N, L, V] logits path
        # (reference semantics, its memory peak included) — correctness
        # over the fused kernel's speed when the remote compiler is sick.
        cfg = cfg.replace(use_fused_rounding_loss=False)
    return cfg


def attention_kernel_ok(
    *,
    seq_len: int = 18,
    n_heads: int = 12,
    head_dim: int = 64,
    timeout_s: float = 1800.0,  # the probe compiles THREE fresh Mosaic
    # programs (fwd, bwd, dropout bwd) at ~3-9 min each on the remote
    # compiler; the persistent cache makes warm probes take seconds, and a
    # timed-out probe still banks its finished compiles for the next run

    verbose: bool = True,
) -> bool:
    """True iff the Pallas attention kernel compiles AND runs (fwd+bwd)
    within ``timeout_s`` in a sacrificial child process."""
    global _cached
    forced = os.environ.get("DIC_ATTENTION_BACKEND", "").lower()
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    if _cached is not None:
        return _cached

    import jax

    if not any(d.platform in ("tpu", "axon") for d in jax.devices()):
        _cached = True  # off-TPU the kernel is the XLA fallback anyway
        return _cached

    mark = _marker_path("attention", (seq_len, n_heads, head_dim))
    if _marker_ok(mark):
        _cached = True
        return _cached

    repo = _repo_root()
    code = _PROBE.format(
        repo=repo,
        cache=os.path.join(repo, ".jax_cache"),
        seq_len=seq_len,
        n_heads=n_heads,
        head_dim=head_dim,
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        ok = proc.returncode == 0 and "PALLAS_ATTENTION_OK" in proc.stdout
        if not ok and verbose:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(
                "[pallas_guard] attention kernel probe FAILED "
                f"(rc={proc.returncode}): {' | '.join(tail)}",
                file=sys.stderr,
            )
    except subprocess.TimeoutExpired:
        ok = False
        if verbose:
            print(
                f"[pallas_guard] attention kernel compile exceeded "
                f"{timeout_s:.0f}s — falling back to XLA attention",
                file=sys.stderr,
            )
    if ok:
        _marker_write(mark)
    _cached = ok
    return ok
