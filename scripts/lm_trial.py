#!/usr/bin/env python
"""Text-only diffusion LM CLI — the lm-trial precursor (lm-trial/main.py)
as a command. Runs on any CSV with a 'text' column; defaults to the "Don't
Patronize Me" train split bundled with the reference when mounted.

    python scripts/lm_trial.py --train_csv /root/reference/lm-trial/train.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from diffusion_image_captioning_tpu.config import (
        LM_TRIAL,
        add_config_flags,
        config_from_args,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--train_csv", default="/root/reference/lm-trial/train.csv"
    )
    p.add_argument("--out_dir", default=".")
    p.add_argument("--seed", type=int, default=0)
    # Every Config knob as a flag, defaulting to the lm-trial preset
    # (vocab capped at 8000 — the CSV-built vocab's historical CLI default).
    add_config_flags(p, base=LM_TRIAL.replace(vocab_size=8000))
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in "
                        "this image — a startup hook initializes TPU)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from diffusion_image_captioning_tpu.pipeline import run_lm_trial

    cfg = config_from_args(args)

    _, history, _ = run_lm_trial(cfg, args.train_csv, args.out_dir, seed=args.seed)
    if not history:
        print("no epochs ran (epoch_num=0)")
        return
    last = history[-1]
    print(
        f"epoch {last['epoch']} losses: x_t={last['train_x_t']:.4f} "
        f"x_1={last['train_x_1']:.4f} prob={last['train_prob']:.4f}"
    )


if __name__ == "__main__":
    main()
