#!/usr/bin/env python
"""Sampler-quality comparison: val BLEU-4 of each sampler from ONE checkpoint.

The reference has exactly one sampler — K-step self-refinement
(CLIP-DDPM.py:616: 5 applications at eval). This framework adds true
reverse-process samplers (ancestral DDPM and DDIM, sample.py) whose
LATENCY is benchmarked in docs/PERF.md but whose caption QUALITY was not;
this probe scores them all against the same checkpoint + val split so the
extension samplers' BLEU is a measured number, not an assumption.

    python bench/sampler_quality.py RUN_NAME --ckpt_dir DIR --world_dir DIR \
        [--samplers refine5,refine10,ddim50,ancestral100]

world_dir is a flickr8k-layout directory (captions.txt + image_clip.npy /
text_clip.npy) — e.g. the correlated synthetic world a runs/ artifact was
trained on. The val split comes from the checkpoint meta, so candidates
are scored on exactly the rows the training run held out.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_name")
    p.add_argument("--ckpt_dir", default=".")
    p.add_argument("--world_dir", required=True)
    p.add_argument(
        "--samplers", default="refine5,refine10,ddim50,ancestral100",
        help="comma list: refineN | ddimN | ancestralN",
    )
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap the val batches per sampler (full split default)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    from diffusion_image_captioning_tpu import checkpoint as ck
    from diffusion_image_captioning_tpu import eval_bleu, sample, schedules
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.data import flickr as flickr_data
    from diffusion_image_captioning_tpu.data.batcher import Batcher
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config
    from diffusion_image_captioning_tpu.pipeline import build_eval_tokenizer

    state, cfg, val_idx = ck.restore(args.ckpt_name, args.ckpt_dir)
    if val_idx is None:
        raise SystemExit("checkpoint meta carries no val split")
    cfg = guard_config(cfg)
    model, _ = init_denoiser(cfg, jax.random.PRNGKey(0))
    params = tr.merge_params(state.trainable, state.frozen)

    imgs, caps, img_feat, txt_feat = flickr_data.load_combined(args.world_dir, None)
    tokenizer = build_eval_tokenizer(
        cfg, None, os.path.join(args.world_dir, "captions.txt")
    )
    columns = flickr_data.make_flickr_dataset(
        imgs, caps, img_feat, txt_feat, tokenizer, cfg.max_length
    )
    val_b = Batcher(columns, np.asarray(val_idx), cfg.batch_size, shuffle=False)
    gt = flickr_data.captions_by_image(imgs, caps)
    abar = schedules.alpha_cumprod_table(cfg)

    def ids_for(name: str, clip, key):
        """Device-side argmax ids for one batch under the named sampler."""
        if name.startswith("refine"):
            return sample.sample_caption_ids(
                model, cfg, params, clip, key, steps=int(name[len("refine"):])
            )
        if name.startswith("ddim"):
            logits, _ = sample.ddim_sample(
                model, cfg, params, abar, clip, key,
                steps=int(name[len("ddim"):]),
            )
        elif name.startswith("ancestral"):
            logits, _ = sample.ancestral_sample(
                model, cfg, params, abar, clip, key,
                steps=int(name[len("ancestral"):]),
            )
        else:
            raise SystemExit(f"unknown sampler {name!r}")
        return np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    results = {}
    for name in args.samplers.split(","):
        name = name.strip()
        key = jax.random.PRNGKey(args.seed)
        acc, n = 0.0, 0
        for batch in val_b:
            key, k = jax.random.split(key)
            ids = ids_for(name, jnp.asarray(batch["image_clip"]), k)
            cands = [tokenizer.decode(r) for r in sample.dedup_consecutive(ids)]
            refs = [gt[img] for img in batch["image"]]
            acc += eval_bleu.flickr_batch_bleu(cands, refs)
            n += 1
            if args.max_batches and n >= args.max_batches:
                break
        results[name] = acc / max(n, 1)
        print(f"{name:>14}: BLEU-4 {results[name]:.4f} ({n} val batches)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
