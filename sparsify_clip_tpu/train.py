"""Training: TrainState, jit'ed train step, and the epoch loop.

TPU-native counterpart of the reference's ``train_model``
(sparsify_clip.py:682-986):

* one **functional, donated, jit'ed step** instead of an eager loop
  body — encoders in bf16 ("fp16: True"), loss block in fp32, AdamW
  (wd 0.01 on every parameter, matching torch defaults at
  sparsify_clip.py:730), cosine LR with warmup + sparsify hold;
* the learnable temperature is the **raw divisor** appended to the
  trainable tree (sparsify_clip.py:716-730) — not a logit scale;
* the warm ("sparsification") phase switch is a traced ``lax.cond``;
  β/α are computed in-graph at the 1-based batch index
  (sparsify_clip.py:755,827);
* no GradScaler: bf16 has fp32 exponent range, so the reference's AMP
  scaffolding (sparsify_clip.py:731,960-963) has no TPU equivalent to
  carry over;
* batches are sharded over the mesh data axis; the global B×B loss
  sees all-gathered embeddings via XLA's partitioner (the mesh work
  lives in :mod:`sparsify_clip_tpu.parallel.mesh`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.losses import LossContext, make_loss_fn
from sparsify_clip_tpu.models import CLIP, create_model
from sparsify_clip_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    param_shardings,
)
from sparsify_clip_tpu.schedules import get_alpha_jax, get_beta_jax, make_lr_schedule
from sparsify_clip_tpu.utils.numerics import l2_normalize


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray                 # 0-based optimizer step count
    params: Any                       # model params (fp32)
    batch_stats: Any                  # BN stats ({} for ViT towers)
    temperature: jnp.ndarray          # raw scalar (trainable iff configured)
    opt_state: Any
    rng: jax.Array
    # Extra learnable loss scalars, or None.  loss_type "siglip" puts
    # {"logit_scale": t' (log-space), "logit_bias": b} here; they join
    # the trainables dict and AdamW updates them like everything else
    # (wd-on-all, matching the framework's temperature treatment).
    loss_scalars: Any = None


@dataclasses.dataclass
class TrainSetup:
    """Everything assembled for a run: model, state, step fn, mesh."""

    config: ExperimentConfig
    model: CLIP
    state: TrainState
    train_step: Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]
    mesh: Any
    steps_per_epoch: int
    total_steps: int
    lr_schedule: Callable
    # set by run_training: True iff the loop returned early because
    # stop_fn fired (a SIGTERM landing after the final step completes
    # normally and must NOT skip the final eval/save)
    stopped_early: bool = False


def _trainables(state: TrainState, learnable_temp: bool):
    tree = {"model": state.params}
    if learnable_temp:
        tree["temperature"] = state.temperature
    if state.loss_scalars is not None:
        tree["loss_scalars"] = state.loss_scalars
    return tree


def build_optimizer(config: ExperimentConfig, total_steps: int):
    """AdamW exactly as the reference configures it: lr from the cosine
    schedule, betas (0.9, 0.999), eps 1e-8, decoupled wd 0.01 applied to
    ALL parameters (torch AdamW default; sparsify_clip.py:730)."""
    num_warmup = int(0.20 * total_steps)  # sparsify_clip.py:735
    schedule = make_lr_schedule(
        base_lr=config.learning_rate,
        num_warmup_steps=num_warmup,
        num_training_steps=total_steps,
        only_lunif_epochs=config.only_lunif_epochs,
    )
    # adam_mu_dtype="bfloat16" stores the first moment in bf16 (~25% of
    # optimizer HBM back; see config.py for why nu must stay fp32).
    mu_dtype = jnp.bfloat16 if config.adam_mu_dtype == "bfloat16" else None
    return optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
        mu_dtype=mu_dtype,
    ), schedule


def make_train_step(
    model: CLIP,
    config: ExperimentConfig,
    optimizer: optax.GradientTransformation,
    steps_per_epoch: int,
    total_steps: int,
    lr_schedule: Callable,
    state_shards=None,
    batch_shards=None,
    image_size: Optional[int] = None,
):
    """Build the jit'ed train step for this experiment's loss_type.

    When shardings are given they are pinned as both in- and
    out-shardings so step N's output layout is exactly step N+1's input
    layout — one compile, zero relayout copies.
    """
    loss_core = make_loss_fn(config.loss_type, use_pallas=config.use_pallas)
    learnable_temp = config.anchor_temperature_learnable
    has_siglip = config.loss_type == "siglip"
    has_bn = model.cfg.vision_kind == "resnet"
    target_size = image_size or model.cfg.image_size
    if config.device_augment:
        # import OUTSIDE the traced step (module-level jnp constants
        # would otherwise capture tracers on first import)
        from sparsify_clip_tpu.ops.image import augment_batch_core

    from sparsify_clip_tpu.ops.sparsify import make_projection

    projection = make_projection(
        config.sparse_projection, config.sparse_topk, config.sparse_l1
    )
    # data-mesh size for the shard-aligned grad-accum microbatch layout
    accum_dp = (
        batch_shards.mesh.shape[DATA_AXIS] if batch_shards is not None else 1
    )
    if config.grad_accum_steps > 1 and accum_dp > 1:
        mb_cfg = config.batch_size // config.grad_accum_steps
        if mb_cfg % accum_dp:
            # the dp=1 contiguous layout all-gathers the full image batch
            # onto every device — never pick it silently
            msg = (
                f"grad_accum_steps={config.grad_accum_steps} gives "
                f"microbatch {mb_cfg}, not divisible by the data-mesh "
                f"size {accum_dp}: the fallback layout all-gathers the "
                f"FULL image batch onto every device, defeating the "
                f"memory savings. Pick grad_accum_steps so that "
                f"(batch_size // grad_accum_steps) % mesh_data == 0, or "
                f"set allow_accum_gather: true to accept the gather."
            )
            if not config.allow_accum_gather:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        # Reference counts batches 1-based for β/α (sparsify_clip.py:755).
        current_batch = state.step + 1
        epoch = state.step // steps_per_epoch
        warm = epoch < config.only_lunif_epochs
        beta = get_beta_jax(
            current_batch, total_steps, config.beta_warmup_epoch, config.beta_decay_epoch
        )
        alpha = get_alpha_jax(
            current_batch, total_steps,
            config.alpha_warmup_epoch, config.alpha_increment_epoch,
        )

        if config.device_augment:
            # crop/flip/normalize on device from uint8 staging images
            aug_key, new_rng = jax.random.split(state.rng)
            images = augment_batch_core(batch["images"], aug_key, target_size)
        else:
            images = batch["images"]
            new_rng = state.rng

        def encode_micro(params, bn, imgs, toks):
            """One (micro)batch through both encoders → normalized embeddings."""
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = bn
                (img, txt), mutated = model.apply(
                    variables, imgs, toks, train=True, mutable=["batch_stats"]
                )
                return l2_normalize(img), l2_normalize(txt), mutated["batch_stats"]
            img, txt = model.apply(variables, imgs, toks, train=True)
            return l2_normalize(img), l2_normalize(txt), bn

        def loss_from_embeddings(img, txt, temp, loss_scalars):
            if projection is not None:
                # north-star sparsification stage: project embeddings
                # once past sparse_after_epoch (lax.cond on traced epoch
                # — no recompile at the boundary)
                active = epoch >= config.sparse_after_epoch
                img, txt = jax.lax.cond(
                    active,
                    lambda i, t: (projection(i), projection(t)),
                    lambda i, t: (i, t),
                    img, txt,
                )
            extra = {}
            if has_siglip:
                # scale is learned in log space; exp here so the loss
                # (and its grads) see the positive multiplier
                extra = {
                    "logit_scale": jnp.exp(loss_scalars["logit_scale"]),
                    "logit_bias": loss_scalars["logit_bias"],
                }
            ctx = LossContext(
                temperature=temp, beta=beta, alpha=alpha, warm=warm,
                # host-supplied (B, B) soft targets for "anchor-roberta"
                soft_targets=batch.get("soft_targets"),
                **extra,
            )
            return loss_core(img, txt, ctx)

        def _temp_of(trainables):
            return (
                trainables["temperature"] if learnable_temp
                else jnp.float32(config.anchor_temperature)
            )

        def _scalars_of(trainables):
            # {} (not None) so value_and_grad over the argument is a
            # no-op rather than an error for non-siglip losses
            return trainables.get("loss_scalars", {})

        def loss_of(trainables):
            img, txt, new_bn = encode_micro(
                trainables["model"], state.batch_stats, images, batch["tokens"]
            )
            loss, aux = loss_from_embeddings(
                img, txt, _temp_of(trainables), _scalars_of(trainables)
            )
            return loss, (aux, new_bn)

        def gradcache_value_and_grad(trainables):
            """GradCache two-pass accumulation (Gao et al. 2021 scheme,
            re-derived for jax.lax.scan): pass 1 streams the encoders
            over ``grad_accum_steps`` microbatches without residuals;
            the B×B loss and its embedding cotangents are computed on
            the FULL batch (exactly the large-batch loss — naive
            microbatch accumulation would change the contrastive
            objective, which couples every pair); pass 2 re-runs each
            microbatch under jax.vjp with its cotangent slice and sums
            the param grads.  Peak activation memory scales with the
            microbatch; compute cost is one extra encoder forward.  For
            BN towers, batch statistics are per-microbatch (the
            standard accumulation semantics — documented delta vs one
            huge batch; train-mode BN only WRITES running stats, so
            pass 2's replay may use any running-stats value).

            Microbatches are **shard-aligned**: microbatch ``i`` takes
            each device's i-th local sub-block (layout
            ``(dp, A, mb/dp)`` on the data-sharded batch axis), so the
            per-step slicing is collective-free — a contiguous slice of
            the global batch would make XLA all-gather the full images
            onto every device, defeating the memory savings.  The
            small (B, D) embedding/cotangent transposes restore the
            original batch order for the loss, so membership is
            numerics-neutral."""
            A = config.grad_accum_steps
            B = images.shape[0]
            if B % A:
                raise ValueError(
                    f"global batch {B} not divisible by grad_accum_steps {A}"
                )
            mb = B // A
            # dp=1 layout (contiguous microbatches) is the fallback when
            # the batch can't split A ways per device; it is correct but
            # makes XLA all-gather the batch under dp>1.
            dp = accum_dp if mb % accum_dp == 0 else 1
            params = trainables["model"]

            def micro(x, i):
                xs = x.reshape(dp, A, mb // dp, *x.shape[1:])
                piece = jax.lax.dynamic_index_in_dim(
                    xs, i, axis=1, keepdims=False
                )
                return piece.reshape(mb, *x.shape[1:])

            def reassemble(e):  # scan-stacked (A, mb, D) → (B, D)
                d = e.shape[-1]
                return (
                    e.reshape(A, dp, mb // dp, d)
                    .transpose(1, 0, 2, 3)
                    .reshape(B, d)
                )

            def split_ct(g):  # (B, D) → (A, mb, D) matching micro()
                d = g.shape[-1]
                return (
                    g.reshape(dp, A, mb // dp, d)
                    .transpose(1, 0, 2, 3)
                    .reshape(A, mb, d)
                )

            def p1(bn, i):
                img, txt, bn_out = encode_micro(
                    params, bn, micro(images, i), micro(batch["tokens"], i)
                )
                return bn_out, (img, txt)

            final_bn, (img_mb, txt_mb) = jax.lax.scan(
                p1, state.batch_stats, jnp.arange(A)
            )
            img_all = reassemble(img_mb)
            txt_all = reassemble(txt_mb)

            (loss, aux), (d_img, d_txt, d_temp, d_scalars) = jax.value_and_grad(
                loss_from_embeddings, argnums=(0, 1, 2, 3), has_aux=True
            )(img_all, txt_all, _temp_of(trainables), _scalars_of(trainables))

            def p2(acc, xs):
                i, di, dti = xs

                def f(p):
                    img, txt, _ = encode_micro(
                        p, state.batch_stats,
                        micro(images, i), micro(batch["tokens"], i),
                    )
                    return img, txt

                _, vjp = jax.vjp(f, params)
                (gp,) = vjp((di, dti))
                return (
                    jax.tree_util.tree_map(lambda a, b: a + b, acc, gp),
                    None,
                )

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads_model, _ = jax.lax.scan(
                p2, zero, (jnp.arange(A), split_ct(d_img), split_ct(d_txt))
            )
            grads = {"model": grads_model}
            if learnable_temp:
                grads["temperature"] = d_temp
            if has_siglip:
                grads["loss_scalars"] = d_scalars
            return (loss, (aux, final_bn)), grads

        trainables = _trainables(state, learnable_temp)
        if config.grad_accum_steps > 1:
            (loss, (aux, new_bn)), grads = gradcache_value_and_grad(trainables)
        else:
            (loss, (aux, new_bn)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(trainables)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, trainables)
        new_trainables = optax.apply_updates(trainables, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_trainables["model"],
            batch_stats=new_bn,
            temperature=(
                new_trainables["temperature"] if learnable_temp else state.temperature
            ),
            opt_state=new_opt_state,
            rng=new_rng,
            loss_scalars=new_trainables.get("loss_scalars", state.loss_scalars),
        )
        metrics = {
            "train_loss": loss,
            "learning_rate": lr_schedule(state.step),
            "beta": beta if not learnable_temp else jnp.float32(0.0),
            "alpha": alpha if not learnable_temp else jnp.float32(0.0),
            "temperature": (
                new_trainables["temperature"] if learnable_temp
                else jnp.float32(config.anchor_temperature)
            ),
            **aux,
        }
        if has_siglip:
            metrics["siglip_scale"] = jnp.exp(
                new_trainables["loss_scalars"]["logit_scale"]
            )
            metrics["siglip_bias"] = new_trainables["loss_scalars"]["logit_bias"]
        return new_state, metrics

    if state_shards is not None:
        jitted = jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(state_shards, batch_shards),
            out_shardings=(state_shards, None),
        )
        mesh = batch_shards.mesh

        def train_step(state, batch):
            # trace under the ambient mesh so mesh-aware kernels
            # (pallas attention) shard_map instead of replicating
            with jax.sharding.set_mesh(mesh):
                return jitted(state, batch)

        train_step._cache_size = jitted._cache_size  # test/introspection hook
        train_step._jitted = jitted  # AOT lower/compile access (tests)
        return train_step
    return jax.jit(step_fn, donate_argnums=(0,))


def state_shardings_for(config: ExperimentConfig, state, mesh) -> Any:
    """NamedSharding pytree for a TrainState under this config's
    parallelism knobs: the TP path rules (or the pipeline stage rule),
    plus FSDP (params AND moments data-sharded) or ZeRO-1 (moments
    only) on top.  ``state`` may hold real arrays or
    ``jax.ShapeDtypeStruct``s — the single source of truth shared by
    the training assembly below, the driver's TPU-export dryrun leg
    (__graft_entry__), and tests/test_tpu_lowering.py, so the lowering
    guards always validate the layout production actually runs.
    """
    state_shards = param_shardings(state, mesh, pipeline=config.pipeline)
    if config.fsdp:
        # FSDP: params AND moments shard over the data axis on top of
        # the TP rules — train-state HBM scales ~1/dp; XLA inserts the
        # per-layer all-gathers and grad reduce-scatters (mesh.py).
        from sparsify_clip_tpu.parallel.mesh import shard_over_data

        state_shards = state_shards.replace(
            params=shard_over_data(state.params, mesh, state_shards.params),
            opt_state=shard_over_data(
                state.opt_state, mesh, state_shards.opt_state
            ),
        )
    elif config.shard_opt_state:
        # ZeRO-1: moments shard over the data axis on top of the TP
        # rules — optimizer HBM scales 1/dp, math unchanged (mesh.py).
        from sparsify_clip_tpu.parallel.mesh import zero1_opt_shardings

        state_shards = state_shards.replace(
            opt_state=zero1_opt_shardings(
                state.opt_state, mesh, state_shards.opt_state
            )
        )
    return state_shards


def create_train_setup(
    config: ExperimentConfig,
    steps_per_epoch: int,
    mesh=None,
    rng: Optional[jax.Array] = None,
    image_size: Optional[int] = None,
) -> TrainSetup:
    """Assemble model, state and step function on a mesh.

    ``steps_per_epoch`` comes from the data pipeline
    (len(train_loader) in the reference, sparsify_clip.py:734).
    """
    if mesh is None:
        mesh = create_mesh(data=config.mesh_data, model=config.mesh_model)
    if rng is None:
        rng = jax.random.PRNGKey(config.seed)
    total_steps = steps_per_epoch * config.epochs

    dtype = jnp.bfloat16 if config.fp16 else jnp.float32
    init_rng, state_rng = jax.random.split(rng)
    pipeline_stages = 1
    if config.pipeline:
        # The mesh 'model' axis becomes the stage axis (one meaning per
        # axis: pipeline and TP are exclusive by construction).
        pipeline_stages = mesh.shape[MODEL_AXIS]
        if pipeline_stages < 2:
            raise ValueError(
                "pipeline: true needs mesh_model >= 2 (the 'model' axis "
                "size is the stage count)"
            )
        if not config.scan_layers:
            raise ValueError(
                "pipeline: true requires scan_layers: true (the stacked "
                "(layers, ...) param layout is the stage split)"
            )
        if config.fsdp:
            raise ValueError(
                "pipeline is exclusive with fsdp: the block stacks are "
                "already sharded over 'model' on the layer axis; adding a "
                "data-axis shard would force a reshard inside every "
                "pipeline pass. Use shard_opt_state for moment sharding."
            )
        if config.grad_accum_steps > 1:
            raise ValueError(
                "pipeline is exclusive with grad_accum_steps > 1: the "
                "GradCache passes run the encoders inside lax.scan, which "
                "must stay collective-free. Use pipeline_microbatches "
                "for microbatching instead — the pipeline schedule is "
                "already activation-memory-bounded per (microbatch, stage)."
            )
        if config.remat:
            raise ValueError(
                "pipeline is exclusive with remat: the GPipe schedule "
                "already checkpoints per (microbatch, stage) — a "
                "remat_policy would be silently ignored by the stage "
                "loop. Drop remat: true (pipeline's memory profile is "
                "one microbatch activation per stage)."
            )
        # Validate the stage split on the registry config BEFORE paying
        # for create_model (init is ~100 s remote-compiled on TPU).
        from sparsify_clip_tpu.models.clip import MODEL_REGISTRY

        reg_cfg = MODEL_REGISTRY[config.model]
        if reg_cfg.vision_kind != "vit":
            raise ValueError(
                "pipeline_stages > 1 pipelines transformer block stacks; "
                f"the {reg_cfg.name} vision tower is a ResNet (stage-"
                "heterogeneous blocks) — use TP (mesh_model) or FSDP instead"
            )
        for tower, depth in (
            ("vision", reg_cfg.vision_layers[0]),
            ("text", reg_cfg.text_layers),
        ):
            if depth % pipeline_stages:
                raise ValueError(
                    f"pipeline: {tower} tower depth {depth} not divisible "
                    f"by {pipeline_stages} stages (mesh_model)"
                )
    model, variables = create_model(
        config.model, dtype=dtype, rng=init_rng, image_size=image_size,
        remat=config.remat, remat_policy=config.remat_policy,
        stem_s2d=config.stem_s2d, ln_fp32=config.ln_fp32,
        fused_ln_qkv=config.fused_ln_qkv, onehot_embed=config.onehot_embed,
        scan_layers=config.scan_layers,
        pipeline_stages=pipeline_stages,
        pipeline_microbatches=config.pipeline_microbatches,
        pipeline_mesh=mesh if pipeline_stages > 1 else None,
    )

    optimizer, schedule = build_optimizer(config, total_steps)
    temperature = jnp.float32(config.anchor_temperature)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    loss_scalars = None
    if config.loss_type == "siglip":
        # SigLIP learnables (losses/sigmoid.py): log-space scale so exp
        # keeps the multiplier positive under unconstrained AdamW, raw
        # bias.  Paper inits: scale 10, bias -10.
        loss_scalars = {
            "logit_scale": jnp.log(jnp.float32(config.siglip_logit_scale_init)),
            "logit_bias": jnp.float32(config.siglip_logit_bias_init),
        }

    trainables = {"model": params}
    if config.anchor_temperature_learnable:
        trainables["temperature"] = temperature
    if loss_scalars is not None:
        trainables["loss_scalars"] = loss_scalars
    opt_state = optimizer.init(trainables)

    state = TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats,
        temperature=temperature,
        opt_state=opt_state,
        rng=state_rng,
        loss_scalars=loss_scalars,
    )

    # Shard the whole state by the TP path rules (everything replicated
    # when the model axis is 1), or by the pipeline stage rule when the
    # model axis means stages.  The rules match the optimizer-moment
    # copies of the kernels too, so mu/nu shard with their params.
    state_shards = state_shardings_for(config, state, mesh)
    state = jax.device_put(state, state_shards)

    train_step = make_train_step(
        model, config, optimizer, steps_per_epoch, total_steps, schedule,
        state_shards=state_shards,
        batch_shards=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(DATA_AXIS)
        ),
        image_size=image_size,
    )
    return TrainSetup(
        config=config,
        model=model,
        state=state,
        train_step=train_step,
        mesh=mesh,
        steps_per_epoch=steps_per_epoch,
        total_steps=total_steps,
        lr_schedule=schedule,
    )


def resolve_soft_targets_provider(spec: str):
    """``"module:attr"`` / ``"module.attr"`` → host soft-target callable.

    The "anchor-roberta" loss (sparsify_clip.py:135-157) needs a
    (B, B) row-stochastic text-similarity matrix the reference computes
    on host from a RoBERTa sentence encoder (:711-713).  The provider
    is user code (any callable taking the batch's caption strings and
    returning the matrix); this resolves the config's import spec once
    per run.  Returns None for the empty spec.
    """
    if not spec:
        return None
    import importlib

    if ":" in spec:
        mod_name, attr_path = spec.split(":", 1)
    else:
        mod_name, _, attr_path = spec.rpartition(".")
    if not mod_name or not attr_path:
        raise ValueError(
            f"soft_targets_provider {spec!r} is not an import spec — "
            "use 'package.module:callable'"
        )
    fn = importlib.import_module(mod_name)
    for part in attr_path.split("."):
        fn = getattr(fn, part)
    if not callable(fn):
        raise TypeError(
            f"soft_targets_provider {spec!r} resolved to non-callable {fn!r}"
        )
    return fn


def _apply_soft_targets(batch, fields, soft_fn):
    """Host-side soft-target computation for one batch (if configured)."""
    if soft_fn is None:
        return fields
    captions = batch.get("captions")
    if captions is None:
        raise ValueError(
            "soft_targets_provider is configured but the loader batch "
            "carries no 'captions' — use a caption-bearing dataset/loader"
        )
    st = np.asarray(soft_fn(captions), dtype=np.float32)
    b = len(captions)
    if st.shape != (b, b):
        raise ValueError(
            f"soft_targets_provider returned shape {st.shape}, "
            f"expected ({b}, {b}) for this batch"
        )
    return {**fields, "soft_targets": st}


def run_training(
    setup: TrainSetup,
    train_batches: Callable[[int], Iterator[Dict[str, Any]]],
    eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
    log_fn: Optional[Callable[[Dict[str, float]], None]] = None,
    checkpoint_fn: Optional[Callable[[TrainState, int], None]] = None,
    start_epoch: int = 0,
    stop_fn: Optional[Callable[[], bool]] = None,
    skip_steps: int = 0,
    end_epoch: Optional[int] = None,
) -> TrainState:
    """The epoch loop (reference: sparsify_clip.py:739-986).

    ``train_batches(epoch)`` yields host batches (dicts of np arrays);
    ``eval_fn`` runs per-epoch evaluation (plus the pre-training eval,
    matching sparsify_clip.py:739-740); ``checkpoint_fn`` fires every
    ``save_checkpoint_every_n_epochs``.

    ``stop_fn`` is polled after every step (graceful preemption — see
    :mod:`sparsify_clip_tpu.utils.preemption`): when it turns true the
    loop finishes the in-flight step, writes a full checkpoint via
    ``checkpoint_fn`` (tagged with the interrupted epoch's 1-based
    index; the orbax state inside is step-exact) and returns early.

    ``skip_steps`` consumes that many batches of the FIRST iterated
    epoch on the host without training them: with the loaders'
    deterministic per-(seed, epoch) streams this reproduces the exact
    remaining data order after a mid-epoch restore — the restarted run
    sees precisely the batches the preempted one never trained.
    ``end_epoch`` (exclusive) overrides the default
    ``start_epoch + config.epochs`` bound; the auto-resume path passes
    ``end_epoch=config.epochs`` so a resumed run COMPLETES the original
    schedule (the restored LR-schedule position assumes the original
    ``total_steps``), while the reference's weights-only resume keeps
    its epochs-more semantics (sparsify_clip.py:751).
    """
    from sparsify_clip_tpu.utils.profiling import ThroughputMeter

    config = setup.config
    state = setup.state
    if eval_fn is not None:
        eval_fn(state)  # pre-training eval (sparsify_clip.py:740)

    soft_fn = resolve_soft_targets_provider(config.soft_targets_provider)

    def device_batches(epoch: int, skip: int = 0):
        """One-step-lookahead device prefetch: the next batch's
        host→device transfer (jax.device_put is async) overlaps the
        current step's compute.  ``skip`` drops leading batches on the
        host, before any device transfer."""
        from sparsify_clip_tpu.parallel.multihost import make_global_batch

        pending = None
        it = train_batches(epoch)
        for _ in range(skip):
            if next(it, None) is None:
                break
        for batch in it:
            # device batch = array fields only (loaders also carry the
            # raw caption strings for debugging/roberta-style losses).
            # make_global_batch degrades to a plain sharded device_put
            # single-process; under multihost each process contributes
            # its local slice of the global batch (parallel/multihost).
            fields = _apply_soft_targets(
                batch, {"images": batch["images"], "tokens": batch["tokens"]},
                soft_fn,
            )
            nxt = make_global_batch(fields, setup.mesh)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    meter = ThroughputMeter()
    t0 = time.time()
    stopped = False
    setup.stopped_early = False
    log_every = max(1, config.log_every_n_steps)
    pending_metrics: list = []

    def flush_metrics():
        # one device→host read per buffered step; the log stream keeps
        # its per-step records and schema regardless of the cadence
        for m in pending_metrics:
            log_fn({k: float(v) for k, v in m.items()})
        pending_metrics.clear()

    last_epoch = (start_epoch + config.epochs) if end_epoch is None else end_epoch
    for epoch in range(start_epoch, last_epoch):
        meter.start()
        for batch in device_batches(
            epoch, skip=skip_steps if epoch == start_epoch else 0
        ):
            state, metrics = setup.train_step(state, batch)
            if log_fn is not None:
                if log_every == 1:
                    # float() reads fence the step — honest pacing +
                    # NaNs surface here (reference parity default)
                    log_fn({k: float(v) for k, v in metrics.items()})
                else:
                    # log_every_n_steps > 1: buffer the device-side
                    # scalars so dispatch runs ahead of the reads and
                    # the lookahead prefetch overlaps fully
                    pending_metrics.append(metrics)
                    if len(pending_metrics) >= log_every:
                        flush_metrics()
            meter.step(config.batch_size)
            if stop_fn is not None and stop_fn():
                stopped = True
                break
            # mid-epoch eval cadence (the reference's commented-out
            # every-N-batches eval, sparsify_clip.py:952-954)
            if (
                eval_fn is not None
                and config.eval_every_n_steps > 0
                and int(state.step) % config.eval_every_n_steps == 0
            ):
                if log_fn is not None:
                    flush_metrics()  # keep step records ahead of eval's
                eval_fn(state)
        if log_fn is not None:
            flush_metrics()  # epoch boundary / preemption: drain the buffer
        if stopped:
            setup.stopped_early = True
            if checkpoint_fn is not None:
                checkpoint_fn(state, epoch + 1)
            print(
                f"[preemption] stopped at step {int(state.step)} "
                f"(epoch {epoch + 1} in progress); full state checkpointed",
                flush=True,
            )
            break
        if log_fn is not None:
            log_fn({
                "pairs_per_sec": meter.pairs_per_sec,
                "pairs_per_sec_per_chip": meter.pairs_per_sec_per_chip,
                "step_time_ms": meter.step_time_ms,
            })
        if eval_fn is not None:
            eval_fn(state)
        if (epoch + 1) % config.save_checkpoint_every_n_epochs == 0:
            if checkpoint_fn is not None:
                checkpoint_fn(state, epoch + 1)
    jax.block_until_ready(state.params)
    elapsed = time.time() - t0
    if log_fn is not None:
        log_fn({"train_time_s": elapsed})
    setup.state = state
    return state
