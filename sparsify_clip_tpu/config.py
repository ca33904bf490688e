"""Experiment configuration: dataclass schema + YAML loader.

The reference threads a flat ``dict`` loaded with ``yaml.safe_load``
through every function (reference: sparsify_clip.py:1135-1156) with two
CLI-side fixups (``device_id`` injection and ``learning_rate`` string →
float coercion, sparsify_clip.py:1139-1141).  This module gives that
schema a typed home while parsing all 13 shipped reference YAMLs
unchanged.

Schema source of truth: the key table in SURVEY.md §2.9 (every key the
reference's live code consumes).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Union

import yaml


@dataclasses.dataclass
class ExperimentConfig:
    """Typed view of a reference experiment YAML.

    Field names and defaults mirror the reference config keys
    (sparsify_clip.py:1135-1156 and the per-key consumption sites listed
    in SURVEY.md §2.9).  Extra keys found in a YAML are preserved in
    ``extra`` so forward-compatible configs round-trip.
    """

    # Identifiers
    project_name: str = "Sparsify_experiments"
    run_name: str = "experiment"

    # "Never change" parameters (reference wording)
    seed: int = 42
    learning_rate: float = 1e-4
    batch_size: int = 256
    model: str = "RN50"
    num_train_samples: int = -1
    num_test_samples: int = 512
    epochs: int = 100

    # Experiment-specific parameters
    loss_type: str = "anchor"
    only_lunif_epochs: int = 0
    anchor_temperature: float = 0.1
    anchor_temperature_learnable: bool = False

    # Evaluation and checkpointing
    save_checkpoint_every_n_epochs: int = 20
    resume_checkpoint: Union[bool, str] = False
    resume_epoch: int = 0

    # Mixed precision.  On TPU "fp16: True" selects bfloat16 compute
    # (no GradScaler needed — bf16 has fp32 exponent range), keeping an
    # fp32 path for numerics checks.  Reference: sparsify_clip.py:731,765.
    fp16: bool = True

    # β / α loss-weight schedules (experiments 7-10).
    # Reference: sparsify_clip.py:825-827, 866-873.
    beta_warmup_epoch: int = 20
    beta_decay_epoch: int = 50
    alpha_warmup_epoch: int = 50
    alpha_increment_epoch: int = 50

    # Injected by the CLI in the reference (sparsify_clip.py:1139).
    # Here it selects the lead device / process index.
    device_id: int = 0

    # --- TPU-native extensions (absent from reference YAMLs; defaults
    # reproduce reference behaviour on one chip) ---
    # Mesh shape: data-parallel size -1 = all devices; model (tensor)
    # parallel size 1 = off.
    mesh_data: int = -1
    mesh_model: int = 1
    # Multi-host (multi-process) launch: every host runs the SAME CLI
    # command and jax.distributed.initialize() stitches the processes
    # into one global device mesh (the reference is single-machine
    # DataParallel, sparsify_clip.py:703 — it has no multi-host story).
    # Each process then loads only ITS contiguous slice of every global
    # batch (the loaders' per-(seed, epoch, index) RNG streams make the
    # union bit-identical to a single-process run), assembles global
    # arrays via jax.make_array_from_process_local_data, and the same
    # global-view jit train step runs unchanged.  Logging, plots and
    # weights-npz writes happen on process 0; orbax full-state saves
    # are collective (every process writes its shards).  Proven live by
    # tests/test_multihost_cli.py (two real processes vs one,
    # bit-for-bit trajectory).
    multihost: bool = False
    # Cluster rendezvous for multihost: empty/0/-1 = auto-detect from
    # the environment (TPU pods, GKE, Slurm — jax.distributed's
    # standard cluster detection); set explicitly for bare-metal or
    # tests ("host0:1234", N processes, this process's 0-based id).
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    # Where COCO lives (reference hardcodes ./data/coco, sparsify_clip.py:995-1000).
    data_root: str = "./data/coco"
    # "synthetic" swaps COCO for an on-device generated dataset so the
    # full pipeline runs hermetically (no reference equivalent).
    dataset: str = "coco"
    # Use Pallas fused kernels for the loss block (XLA fallback if False).
    use_pallas: bool = True
    # Per-block rematerialization in the towers.  Measured (BASELINE.md
    # "Round-4 measurements"): every zoo model through ViT-L-14@bs256
    # and RN50x16@bs64 now fits WITHOUT remat, and no-remat is 18-23%
    # faster — leave this off until a config actually hits the 16G
    # memory cliff (per-chip ViT-B batches >= 512 still fit plain).
    remat: bool = False
    # Selective remat policy (when remat is on): "nothing" recomputes
    # whole blocks (max memory savings); "dots" saves matmul results;
    # "dots_no_batch" saves only unbatched dots (dense projections);
    # "attn_out" saves attention outputs, recomputes the MLP half.
    # Measured (BASELINE.md "Round-4 measurements"): "dots_no_batch"
    # is the best true-remat policy (+3.5% over "nothing" on RN50x16);
    # "dots" fails to compile at the sizes where remat matters;
    # no-remat beats every policy wherever it fits for the <=257-token
    # towers — but on the 577-token ViT-L-14-336 "dots_no_batch"
    # BEATS no-remat by 4% at bs32 (the longer sequences make saved
    # activations the HBM bottleneck; big-zoo table in BASELINE.md)
    # (models/layers.py::resolve_remat_policy).
    remat_policy: str = "nothing"
    # Space-to-depth stem for ResNet towers: run stem_conv1 as a 2×2
    # conv over the s2d(2)-repacked input — mathematically identical
    # (the 3×3 kernel is repacked in-graph; same parameter tree), a
    # pure MXU/HBM data-layout experiment.  Measured NEGATIVE on RN50
    # bs256 (1,711 vs 1,719 pairs/s; BASELINE.md "Round-4
    # measurements") — kept as a documented knob, off by default.
    stem_s2d: bool = False
    # Fuse each transformer block's ln_1 into its qkv projection on TPU
    # (ops/pallas_ln_qkv): the normalized activation stays in VMEM
    # instead of round-tripping HBM per block.  Forward-only fusion —
    # backward numerics are exactly the unfused path's.  Measured A/B in
    # BASELINE.md.
    fused_ln_qkv: bool = False
    # Text-tower token-embedding lookup as a one-hot matmul instead of
    # gather/scatter-add (measured A/B in BASELINE.md).
    onehot_embed: bool = False
    # fp32 LayerNorm statistics in the towers (quality default; bf16
    # measured no faster on v5e — knob retained for experimentation).
    ln_fp32: bool = True
    # lax.scan over transformer layers (ViT + text towers): one traced
    # and compiled block body regardless of depth — the compile-time /
    # HLO-size lever for the 32-48 layer towers (ViT-H/g/bigG); the
    # 12-24 layer reference zoo traces fast unrolled and XLA pipelines
    # it better, so the default is off.  Changes the param tree
    # (stacked layer axis): torch interop and checkpoints written with
    # the unrolled layout do not convert.
    scan_layers: bool = False
    # GPipe pipeline parallelism (parallel/pipeline.py): reinterpret the
    # mesh 'model' axis as pipeline STAGES of the transformer trunks
    # instead of tensor-parallel shards — each of the mesh_model devices
    # holds layers/mesh_model consecutive blocks (scan layout sharded on
    # the layer axis) and microbatches flow stage-to-stage over ICI via
    # ppermute.  Requires scan_layers: true, a ViT vision tower, and
    # both towers' depths divisible by mesh_model.  The lever for the
    # 32-48 layer towers when TP's per-layer all-reduces dominate (see
    # docs/SCALING.md); exclusive with TP by construction (one 'model'
    # axis, one meaning).
    pipeline: bool = False
    # Microbatches per pipeline pass (bubble fraction (S-1)/(S-1+M));
    # None -> one per stage.  Global batch must split dp x microbatches.
    pipeline_microbatches: Optional[int] = None
    # Device-side augmentation: the loader ships fixed-size uint8 images
    # (4x smaller transfers) and RandomResizedCrop/flip/normalize run
    # inside the train step's jit (ops/image.py).  Host-side transforms
    # (reference behavior) when False.
    device_augment: bool = False
    # Staging resolution for device_augment uint8 images (host squash-
    # resizes decoded JPEGs to this size before batching).
    device_augment_staging: int = 256
    # GradCache-style gradient accumulation: encoders run in
    # grad_accum_steps sequential microbatches while the contrastive
    # loss still sees the FULL batch's B×B pair matrix (two-pass
    # embedding-cotangent scheme), so activation memory scales with the
    # microbatch but the loss is exactly the large-batch loss.  1 = off
    # (reference semantics; accumulation is an extension — the
    # reference has no equivalent).
    grad_accum_steps: int = 1
    # Under dp>1, microbatches must split per-device (microbatch %
    # mesh_data == 0) or XLA all-gathers the full image batch onto every
    # device — defeating the memory savings accumulation exists for.
    # That degraded layout is an error unless explicitly allowed here.
    allow_accum_gather: bool = False
    # AdamW first-moment (mu) storage dtype: "bfloat16" halves one of
    # the two moment buffers (~25% of optimizer-state HBM) — a memory
    # lever for the billion-param towers (BASELINE.md big-zoo notes).
    # The second moment (nu) stays fp32 deliberately: its EMA update is
    # (1-b2)=1e-3 relative, below bf16's ~4e-3 mantissa resolution, so
    # a bf16 nu would stop accumulating; mu's (1-b1)=10% updates
    # survive bf16 (drift bound: tests/test_train.py
    # ::test_adam_mu_dtype_bf16).  "float32" = exact reference AdamW.
    adam_mu_dtype: str = "float32"
    # ZeRO-1: shard the AdamW moment buffers over the DATA mesh axis
    # instead of replicating them (params/grads stay replicated, so the
    # math is bit-identical — the moments' elementwise update just
    # computes on 1/dp of each buffer per device and XLA all-gathers
    # the param update over ICI).  Optimizer-state HBM scales 1/dp:
    # the lever that fits the billion-param towers under PURE data
    # parallelism (no mesh_model) on a pod slice.  No-op on dp=1.
    shard_opt_state: bool = False
    # FSDP (ZeRO-3-style fully-sharded data parallelism): shard the
    # PARAMS (and with them the AdamW moments) over the DATA mesh axis
    # too — each device stores 1/dp of every weight and XLA inserts the
    # per-layer all-gather (forward/backward) and grad reduce-scatter
    # over ICI, the scaling-book recipe expressed purely as sharding
    # annotations.  Total train-state HBM scales ~1/dp: the lever that
    # fits ViT-bigG-14 (28.4 GiB fp32 state) on a v5e-8 slice WITHOUT
    # tensor parallelism.  Math is the same global-view step — grads
    # reduce in a different (reduce-scatter) order, so trajectories
    # match replicated DP to numerics, not bit-for-bit
    # (tests/test_fsdp.py).  Subsumes shard_opt_state.  No-op on dp=1.
    fsdp: bool = False
    # Persistent XLA compilation cache directory ("" = disabled).  Set
    # it and every jit compile (train step, eval encoders, ...) is
    # written to disk keyed by HLO+flags: process restarts, sweeps over
    # the same model, and resume-after-preemption all skip straight to
    # the cached executable.  On the axon tunnel that is 40-90 s per
    # train-step compile back per restart; on production TPU hosts it
    # is the standard multi-run amortization (cli.py applies it before
    # the first trace).
    compilation_cache_dir: str = ""
    # Optional path to the real CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz).
    bpe_vocab_path: Optional[str] = None
    # Tokenizer backend: "python" (golden; full Unicode), "native" (C++
    # core, ASCII-exact, faster host path), "auto" (native if it builds).
    tokenizer: str = "python"
    # Data-loader backend: "threads" (default) or "grain"
    # (deterministic multi-worker pipelines via google/grain).
    loader_backend: str = "threads"
    # Host image path: "pil" (golden), "native" (C++ libjpeg decode +
    # fused crop/resize/flip/normalize, native/imaging/), "auto"
    # (native when it builds).  Same RNG streams either way.
    image_backend: str = "pil"
    # Logging backend: "jsonl" (always available) and/or "wandb" when installed.
    log_backend: str = "auto"
    log_dir: str = "./logs"
    checkpoint_dir: str = "./models"
    # Background (non-blocking) orbax saves for the periodic full-state
    # checkpoints; the train loop keeps stepping during disk IO.
    async_checkpoint: bool = False
    # Sparse embedding projection (north-star capability; OFF by default
    # — the reference's live code has no such projection, SURVEY.md §8):
    # "topk" keeps sparse_topk components per embedding, "l1" soft-
    # thresholds by sparse_l1; applied on-device once epoch >=
    # sparse_after_epoch.
    sparse_projection: str = "none"
    sparse_topk: int = 64
    sparse_l1: float = 0.01
    sparse_after_epoch: int = 1
    # SigLIP sigmoid contrastive loss (loss_type: "siglip" — framework
    # extension, losses/sigmoid.py; the reference has softmax InfoNCE
    # only).  Both scalars are ALWAYS learnable (the paper's recipe):
    # the scale as log-space t' so exp keeps it positive under AdamW,
    # the bias raw.  Paper inits: scale 10, bias -10.
    siglip_logit_scale_init: float = 10.0
    siglip_logit_bias_init: float = -10.0
    # Host soft-target provider for loss_type "anchor-roberta": an
    # import spec "module:attr" (or dotted "module.attr") resolving to
    # a callable ``fn(captions: Sequence[str]) -> (B, B) array`` of
    # row-stochastic text-similarity targets.  The reference derives
    # these from a RoBERTa sentence encoder it conditionally loads
    # (sparsify_clip.py:711-713, 135-157) but its dispatch branch is
    # commented out; here the provider runs on host per batch and the
    # matrix rides the batch dict onto the device ("" = none — direct
    # callers may still supply batch["soft_targets"] themselves).
    soft_targets_provider: str = ""
    # NaN debugging: jax_debug_nans inside jit (the reference has no
    # sanitizers; SURVEY.md §5).
    debug_nans: bool = False
    # Graceful preemption: catch SIGTERM during training, finish the
    # in-flight step, checkpoint the FULL train state (the
    # resume_checkpoint: "auto" format) and exit 0 — a preempted pod
    # job resumes step-exact instead of losing everything since the
    # last epoch checkpoint (the reference's failure mode, SURVEY.md
    # §5).  Only touches signal handlers on the main thread.
    handle_preemption: bool = True
    # t-SNE/UMAP/PCA embedding plots per eval pass — ON by default like
    # the reference (always-on 3× visualize, sparsify_clip.py:599-620;
    # host-side only; reducers gated on installed libs).  False skips
    # the host plotting work.
    plot_embeddings: bool = True
    # Steps per eval; -1 reproduces reference per-epoch cadence.
    eval_every_n_steps: int = -1
    # Metric-read cadence.  1 (default) = reference parity: every step's
    # scalars are float()-read and logged immediately — which fences the
    # device and serializes dispatch (the reference's per-step wandb.log,
    # sparsify_clip.py:944-951).  n > 1 buffers the device-side metric
    # trees and reads them every n steps, so dispatch runs ahead and the
    # one-step-lookahead prefetch overlaps fully; the JSONL/wandb stream
    # still carries one record per step with identical keys (order and
    # content unchanged — only the read timing batches).  NaNs surface
    # at the next flush instead of the offending step.
    log_every_n_steps: int = 1
    # Add the per-term anchor/lalign/lunif scalars to each step's log
    # record (the reference computes but never logs them; OFF keeps the
    # reference's exact wandb/JSONL schema).
    log_loss_components: bool = False
    # Evaluate with fp32-compute towers (sharing the fp32 params), as
    # the reference does — its evaluate_model runs under no_grad with
    # no autocast (sparsify_clip.py:563-593) — even when training runs
    # bf16 ("fp16: True").  False reuses the training-dtype model for
    # eval (faster; bf16-grade embeddings feeding the fp32 metrics).
    eval_fp32: bool = True
    # Re-draw the 1-of-5 eval caption on every eval pass, as the
    # reference's fresh loader sweep does (collate random.choice,
    # sparsify_clip.py:1050-1057 via :564) — ON by default for parity.
    # False freezes the eval batches once so per-epoch metric curves
    # are comparable across epochs (documented option, PARITY.md).
    eval_redraw_captions: bool = True

    # Unrecognized YAML keys, preserved verbatim.
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # ------------------------------------------------------------------
    @classmethod
    def field_names(cls) -> List[str]:
        return [f.name for f in dataclasses.fields(cls) if f.name != "extra"]

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "ExperimentConfig":
        """Build from a flat dict (as yaml.safe_load returns).

        Applies the reference CLI fixup of coercing ``learning_rate`` to
        float (YAML ``1e-4`` parses as a string; sparsify_clip.py:1141).
        """
        if raw is None:
            raise ValueError(
                "Empty config (the reference's all_experiments.yaml is an "
                "empty TODO and would crash the reference too; "
                "sparsify_clip.py:1150 with config=None)"
            )
        known = set(cls.field_names())
        kwargs: Dict[str, Any] = {}
        extra: Dict[str, Any] = {}
        for key, value in raw.items():
            if key in known:
                kwargs[key] = value
            else:
                extra[key] = value
        if "learning_rate" in kwargs:
            kwargs["learning_rate"] = float(kwargs["learning_rate"])
        cfg = cls(**kwargs, extra=extra)
        cfg.validate()
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d.update(d.pop("extra"))
        return d

    def validate(self) -> None:
        if self.batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {self.batch_size}")
        if self.epochs <= 0:
            raise ValueError(f"epochs must be positive, got {self.epochs}")
        if self.only_lunif_epochs < 0:
            raise ValueError(
                f"only_lunif_epochs must be >= 0, got {self.only_lunif_epochs}"
            )
        if not isinstance(self.learning_rate, float):
            raise ValueError("learning_rate must be a float after coercion")
        if self.loss_type == "siglip":
            if self.anchor_temperature_learnable:
                raise ValueError(
                    "loss_type 'siglip' carries its own learnable "
                    "logit_scale/logit_bias — drop "
                    "anchor_temperature_learnable: true (two competing "
                    "learnable scales would silently diverge from both "
                    "recipes)"
                )
            if self.siglip_logit_scale_init <= 0:
                raise ValueError(
                    "siglip_logit_scale_init must be positive (it is "
                    f"learned in log space), got {self.siglip_logit_scale_init}"
                )
        if self.grad_accum_steps < 1:
            raise ValueError(
                f"grad_accum_steps must be >= 1, got {self.grad_accum_steps}"
            )
        if self.batch_size % self.grad_accum_steps:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by "
                f"grad_accum_steps {self.grad_accum_steps}"
            )
        if self.log_every_n_steps < 1:
            raise ValueError(
                f"log_every_n_steps must be >= 1, got {self.log_every_n_steps}"
            )
        if self.adam_mu_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "adam_mu_dtype must be 'float32' or 'bfloat16', got "
                f"{self.adam_mu_dtype!r}"
            )
        if self.multihost and self.loader_backend == "grain":
            raise ValueError(
                "multihost: true is implemented for the 'threads' loader "
                "backend (per-process batch slicing); grain pipelines "
                "carry their own sharding story — drop loader_backend: "
                "grain or run single-process"
            )

    # Convenience ------------------------------------------------------
    @property
    def resume_requested(self) -> bool:
        return bool(self.resume_checkpoint)


def load_config(path: str, device_id: int = 0) -> ExperimentConfig:
    """Load a single YAML config file.

    Mirrors the reference CLI file branch (sparsify_clip.py:1135-1143):
    safe_load, inject device_id, coerce learning_rate.
    """
    with open(path, "r") as fh:
        raw = yaml.safe_load(fh)
    if raw is None:
        raise ValueError(f"Config file {path} is empty")
    raw["device_id"] = device_id
    return ExperimentConfig.from_dict(raw)


def load_config_dir(path: str, device_id: int = 0) -> List[ExperimentConfig]:
    """Load every ``*.yaml`` in a directory (reference sweep mode,
    sparsify_clip.py:1146-1156).  Empty YAMLs (like the reference's
    ``all_experiments.yaml`` TODO) are skipped with a warning instead of
    crashing mid-sweep.
    """
    configs: List[ExperimentConfig] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".yaml"):
            continue
        full = os.path.join(path, name)
        with open(full, "r") as fh:
            raw = yaml.safe_load(fh)
        if raw is None:
            print(f"[config] skipping empty config {full}")
            continue
        raw["device_id"] = device_id
        configs.append(ExperimentConfig.from_dict(raw))
    return configs
