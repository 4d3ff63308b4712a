"""Configuration system.

The reference configures runs via ~30 module-level constants and serializes the
full configuration into the run name (``MODEL_NAME``) used for log files and
checkpoints (reference: CLIP-DDPM.py:55-119). We replace the mutate-the-source
pattern with a frozen dataclass, but keep the run-name codec **byte-compatible**
so logs produced by this framework are co-plottable with the reference's 34
archived ``trial_*/*.txt`` logs (reference: CLIP-DDPM.py:116-118).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

# The four embedding-distance functions of the main pipeline
# (reference: CLIP-DDPM.py:77-92) plus plain MSE used by the text-only
# precursor (lm-trial/main.py:241, nn.MSELoss).
LOSS_FUNCS = (
    "series_sum_sample_mean",
    "series_sum",
    "mse_series_mean",
    "mse_series_sum",
    "mse_mean",
)

# LR schedule shapes (reference: CLIP-DDPM.py:63-70, 451-456).
SCHEDULERS = ("linspace", "logspace", "cosine_annealing")

# "none" is the text-only lm-trial configuration (no CLIP conditioning at all,
# lm-trial/main.py:54-79); "concat"/"add" per CLIP-DDPM.py:93-94.
CLIP_FUSIONS = ("concat", "add", "none")


def _e0(x: float) -> str:
    """Python's ``'%.0E' % x`` formatting, as used by the reference codec."""
    return "%.0E" % x


def _num(x: float) -> str:
    """Format like a Python f-string renders the value (int stays int)."""
    if isinstance(x, int) or (isinstance(x, float) and x.is_integer() and abs(x) < 1e6):
        # The reference uses the int literal -1 for "dynamic off".
        return str(int(x))
    return str(x)


@dataclasses.dataclass(frozen=True)
class Config:
    """All knobs of the pipeline.

    Field-for-field coverage of the reference constants (CLIP-DDPM.py:55-115)
    plus TPU-specific extensions (marked "TPU:").
    """

    # --- run control (CLIP-DDPM.py:55-56) ---
    debug: bool = False               # break after 1 batch/epoch (smoke mode)
    continue_train: bool = False      # resume from checkpoint + saved val split

    # --- data/batch (CLIP-DDPM.py:57-58, 71) ---
    batch_size: int = 8
    max_length: int = 16              # fixed caption token length
    train_set_ratio: float = 0.8      # notebook "blessed" value is 0.95

    # --- optimization (CLIP-DDPM.py:59-76) ---
    learning_rate: float = 1e-4
    end_learning_rate: float = 5e-5
    scheduler: str = "linspace"       # one of SCHEDULERS
    early_stop_ratio: float = 1.05    # notebook value 1.02
    epoch_num: int = 5                # notebook/README best runs use 15
    dynamic_rounding_weight: float = -1  # <0 disables dynamic lambda
    rounding_weight: float = 0.5      # lambda; README-best 0.3
    weight_decay: float = 0.01        # torch.optim.AdamW default (CLIP-DDPM.py:335)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8

    # --- loss / model structure (CLIP-DDPM.py:77-102) ---
    loss_func: str = "series_sum_sample_mean"  # one of LOSS_FUNCS
    clip_adding_method: str = "concat"         # one of CLIP_FUSIONS
    classifier_free_weight: float = 0.0        # w; <=0 means no guidance
    classifier_free_prob: float = 0.2          # per-row dropout prob of text cond
    train_embedding: bool = False  # learn 16-d embeddings (+ in/out projections)
    freeze_embedding: bool = True  # CLIP-DDPM freezes the 768-d embedding and
    # lm_head (CLIP-DDPM.py:245-247); lm-trial trains them (lm-trial/main.py:61-62)
    rounding_max_prob: bool = False  # lm-trial's rounding term: -log max softmax
    # over the x_1 branch only (lm-trial/main.py:187) instead of gathered CE

    # --- diffusion (CLIP-DDPM.py:104-114) ---
    beta_min: float = 1e-4
    beta_max: float = 0.02
    step_tot: int = 1000              # T
    cosin_schedule: bool = True       # cosine alpha-bar vs linear-beta
    sample_size: int = 100            # S timesteps drawn per optimizer step
    x_0_prediction: bool = True       # predict x0 (vs x_{t-interval})
    x_t_step_interval: int = 100
    use_x_t_loss: bool = True
    use_x_1_loss: bool = True
    use_prob_loss: bool = True

    # --- model dims (stock DistilBertConfig, CLIP-DDPM.py:326,330) ---
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    attention_dropout: float = 0.1
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    clip_dim: int = 512
    initializer_range: float = 0.02

    # --- sampling / eval (CLIP-DDPM.py:592,616; COCO_BLEU.py:252) ---
    refine_steps_eval: int = 5        # model applications per caption at BLEU eval
    refine_steps_demo: int = 10       # demo refinement depth
    bleu_sample_group: int = 1        # TPU extension: fuse G consecutive val
    # batches into ONE device sampling call at BLEU eval (pipeline.run_val_bleu).
    # The per-batch key stream, noise draws, decode and per-batch corpus-BLEU
    # accumulation are preserved exactly — rows never interact inside the
    # sampler — so scores are bit-identical to the reference-shape G=1 loop
    # (tests/test_eval_group.py) while cutting device round-trips and
    # occupancy ~Gx on the largest eval leg (the reference loops batch 8,
    # CLIP-DDPM.py:604-631). 1 = reference-shape loop.
    bleu_draws: int = 1               # TPU extension: from-noise BLEU eval is a
    # stochastic draw (the reference scores ONE noise init, CLIP-DDPM.py:613)
    # with measured ±0.04-0.07 spread at convergence (runs/README.md). >1 runs
    # the val BLEU loop K times from independent noise and logs mean ± sd; the
    # final byte-compatible "BLEU-4 score:" line then carries the mean.
    # Default 1 = reference-exact single draw.
    eval_loss_group: int = 1          # TPU extension: fuse G consecutive val
    # batches into ONE jitted device call in fit()'s per-epoch val-loss loop
    # (the reference loops batch-8 eval steps, CLIP-DDPM.py:488-501 — 4,984
    # dispatches/epoch at combined scale). The grouped call lax.scan's the
    # SAME eval computation over the G batches with their original per-batch
    # keys, carrying the accumulator in the same order, so the summed val
    # metrics are bit-identical to the G=1 loop (tests/test_eval_group.py)
    # while paying ~Gx fewer host dispatches through the remote tunnel.
    # Ignored under a mesh (batches are sharded per-dispatch there).
    # 1 = reference-shape loop.

    # --- TPU: numerics & kernels (extensions; defaults keep reference math) ---
    compute_dtype: str = "bfloat16"   # matmul/activation dtype; params stay fp32
    shared_qsample_noise: bool = True  # reference quirk: one noise draw shared
    # across all S timesteps of a q_sample call (CLIP-DDPM.py:359). False draws
    # fresh noise per timestep sample.
    stable_rounding_loss: bool = True  # log-softmax instead of the reference's
    # numerically naive softmax().log() (CLIP-DDPM.py:436-440).
    dict_char_slice: bool = False  # reference quirk (CLIP-DDPM.py:184): the
    # TRAIN_EMBEDDING item path slices the raw caption STRING to
    # max_length-2 and vocab-maps each CHARACTER (un-lowercased, spaces
    # included) — near-all-UNK sequences. The trial_train_embedding/ logs
    # were trained under this bug; True reproduces it, False (default)
    # tokenizes into words as the vocab build (CLIP-DDPM.py:141-155) does.
    use_pallas_attention: bool = True  # fused attention kernel on TPU
    use_pallas_ffn: bool = False  # fused FFN fwd kernel: measured slower than
    # XLA's scheduling of the same chain in the full step (docs/PERF.md);
    # kept available for A/B on other shapes/hardware
    use_pallas_attn_block: bool = True  # fuse the WHOLE attention half
    # (qkv proj + attention + out proj + residual + LN) into one Pallas
    # forward with an XLA+attention-kernel backward (ops/attn_block.py).
    # v5e full-step A/B: 19.35 steps/s on vs 19.11 off — at the top of the
    # run-to-run noise band, kept ON as never-slower (docs/PERF.md round 2)
    use_fused_rounding_loss: bool = True  # streamed vocab-CE kernel on TPU
    rounding_save_z: bool = True  # rounding backward reads bf16 logits
    # SAVED by the forward instead of recomputing them (one fewer full MXU
    # pass, ~0.8 GB HBM residual at flagship shape). Only engages when the
    # vocab head is frozen (otherwise the dW path would negate the saving);
    # identical math — z is bf16-rounded in both variants' MXU inputs.
    remat_denoiser: bool = False       # jax.checkpoint over encoder blocks
    fast_dropout_rng: bool = True      # rbg PRNG for dropout masks: the
    # threefry default costs ~25% of a train step at this model's size
    # (measured on v5e); rbg is hardware-accelerated. Streams differ from
    # threefry but dropout only needs iid bits.

    ema_decay: float = 0.0            # TPU extension: exponential moving
    # average of the TRAINABLE params, updated on device inside the jitted
    # train step (ema = d*ema + (1-d)*params — ~0.7 ms of pure HBM traffic
    # per step at flagship shape; the frozen partition never moves so it is
    # not tracked). 0 (default) disables — reference-exact: the reference
    # keeps no EMA (CLIP-DDPM.py has no equivalent). When on, the
    # checkpoint payload carries the EMA tree (old non-EMA checkpoints
    # resume fine: the EMA re-seeds from the restored params) and the
    # end-of-run BLEU leg ADDITIONALLY scores the EMA weights as an
    # additive "BLEU-4 ema" log line — the contractual final "BLEU-4
    # score:" line still scores the raw params. Motivated by the v2
    # BLEU-swing investigation (docs/PERF.md round 5: checkpoint-to-
    # checkpoint sample quality moves far more than val loss). NOT in the
    # run-name codec.

    # --- TPU: schedule-correct segmented training (extension) ---
    # The reference's CONTINUE_TRAIN restarts the LR schedule from epoch 0
    # (CLIP-DDPM.py:505-508,520-522) — a 10-epoch run driven as 1-epoch
    # segments therefore trains at CONSTANT learning_rate. These fields give
    # a segment its GLOBAL protocol position instead: the LR array is built
    # over schedule_total_epochs and the segment consumes entries
    # [offset : offset+epoch_num]; the train-batch shuffle stream and the
    # val-loss key chain are advanced to the same position, making a
    # segmented run's loss trajectory match the monolithic anneal
    # epoch-for-epoch (tests/test_schedule_offset.py). Neither field is in
    # the run-name codec (segments must resume the same run name). Defaults
    # (0, 0) keep reference CONTINUE_TRAIN semantics exactly.
    schedule_offset_epochs: int = 0   # global epoch index this run starts at
    schedule_total_epochs: int = 0    # protocol length; 0 = epoch_num

    # --- TPU: parallelism (new capability; SURVEY.md section 2.14) ---
    # mesh_data x mesh_model > 1 makes pipeline.run_flickr_training (and the
    # train CLI) build a Mesh, shard the TrainState (vocab-dim TP for the
    # embedding/lm_head tables when mesh_model > 1) and shard every batch
    # over the data axis inside train.fit. batch_size must be divisible by
    # mesh_data.
    mesh_data: int = 1                # data-parallel axis size
    mesh_model: int = 1               # tensor-parallel axis size (vocab tables)

    # ----- derived -----
    @property
    def in_channel(self) -> int:
        """16-d learned embeddings vs 768-d frozen ones (CLIP-DDPM.py:98-102)."""
        return 16 if self.train_embedding else self.dim

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def fused_length(self) -> int:
        """Sequence length seen by the transformer: +2 CLIP tokens for concat
        fusion (CLIP-DDPM.py:299-300)."""
        if self.clip_adding_method == "concat":
            return self.max_length + 2
        return self.max_length

    @property
    def effective_batch(self) -> int:
        """Rows through the denoiser per optimizer step (CLIP-DDPM.py:396)."""
        return self.sample_size * self.batch_size

    def __post_init__(self):
        if self.loss_func not in LOSS_FUNCS:
            raise ValueError(f"loss_func must be one of {LOSS_FUNCS}, got {self.loss_func!r}")
        if self.scheduler not in SCHEDULERS:
            raise ValueError(f"scheduler must be one of {SCHEDULERS}, got {self.scheduler!r}")
        if self.clip_adding_method not in CLIP_FUSIONS:
            raise ValueError(
                f"clip_adding_method must be one of {CLIP_FUSIONS}, got {self.clip_adding_method!r}"
            )
        if self.dim % self.n_heads:
            raise ValueError("dim must be divisible by n_heads")

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in json.loads(s).items() if k in known})


def add_config_flags(p, base: "Config | None" = None) -> None:
    """Add one ``--<field>`` argparse flag per Config field.

    The reference is configured by editing its module-constant block
    (CLIP-DDPM.py:55-115); the CLIs expose every one of those knobs (and
    the TPU extensions) as flags instead. Defaults come from ``base`` — a
    preset such as ``LM_TRIAL`` — or a default ``Config``.
    """
    base = Config() if base is None else base
    for f in dataclasses.fields(Config):
        default = getattr(base, f.name)
        if f.type in ("bool", bool):
            p.add_argument(
                f"--{f.name}",
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
        elif f.type in ("int", int):
            p.add_argument(f"--{f.name}", type=int, default=default)
        elif f.type in ("float", float):
            p.add_argument(f"--{f.name}", type=float, default=default)
        else:
            p.add_argument(f"--{f.name}", type=str, default=default)


def config_from_args(args) -> Config:
    """Build a Config from parsed argparse flags (non-Config attrs ignored)."""
    names = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in names})


def model_name(cfg: Config) -> str:
    """The run-name codec, byte-compatible with the reference's ``MODEL_NAME``
    f-string (CLIP-DDPM.py:116-118), e.g.::

        epoch15_lossseries_sum_sample_mean_lr1E-04-5E-05_schedulerlinspace_
        round3E-01_dynamic-1_clipconcat_class_weight0E+00_class_prob2E-01_
        train-embedFalse_samplesize100_x_0_predictTrue_X_INTERVAL100_
        use_x_tTrue_use_x_1True_use_probTrue
    """
    return (
        f"epoch{cfg.epoch_num}"
        f"_loss{cfg.loss_func}"
        f"_lr{_e0(cfg.learning_rate)}-{_e0(cfg.end_learning_rate)}"
        f"_scheduler{cfg.scheduler}"
        f"_round{_e0(cfg.rounding_weight)}"
        f"_dynamic{_num(cfg.dynamic_rounding_weight)}"
        f"_clip{cfg.clip_adding_method}"
        f"_class_weight{_e0(cfg.classifier_free_weight)}"
        f"_class_prob{_e0(cfg.classifier_free_prob)}"
        f"_train-embed{cfg.train_embedding}"
        f"_samplesize{cfg.sample_size}"
        f"_x_0_predict{cfg.x_0_prediction}"
        f"_X_INTERVAL{cfg.x_t_step_interval}"
        f"_use_x_t{cfg.use_x_t_loss}"
        f"_use_x_1{cfg.use_x_1_loss}"
        f"_use_prob{cfg.use_prob_loss}"
    )


# The configuration behind the published best results (README.md:15; notebook
# cell 7): 15 epochs, lr 1e-4 -> 5e-5 linspace, rounding weight 0.3.
BLESSED = Config(
    epoch_num=15,
    rounding_weight=0.3,
    train_set_ratio=0.95,
    early_stop_ratio=1.02,
)

# Text-only minimum slice, mirroring lm-trial/main.py:39-52: trainable 768-d
# embeddings, MSE distance, max-prob rounding, linear-beta T=2000, no CLIP.
LM_TRIAL = Config(
    batch_size=16,
    max_length=128,
    learning_rate=5e-5,
    end_learning_rate=5e-5,
    epoch_num=10,
    step_tot=2000,
    cosin_schedule=False,
    sample_size=1,
    freeze_embedding=False,
    rounding_max_prob=True,
    rounding_weight=1.0,  # lm-trial sums the terms unweighted (main.py:242)
    loss_func="mse_mean",
    clip_adding_method="none",
)
