"""Experiment runner CLI.

Usage parity with the reference (sparsify_clip.py:1127-1156):

    python -m sparsify_clip_tpu.cli --config <file-or-dir> [--device N]

File mode runs one experiment; directory mode sweeps every ``*.yaml``
sequentially (skipping empty ones).  ``--device`` selects the lead
device index for mesh construction (the reference's GPU id).
"""

from __future__ import annotations

import argparse
import os
import random
import time
from typing import Dict, Optional

import numpy as np

from sparsify_clip_tpu.config import ExperimentConfig, load_config, load_config_dir


def set_seed(seed: int) -> None:
    """Host-side RNG seeding (reference: sparsify_clip.py:1071-1078;
    device-side randomness is handled by explicit JAX PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def apply_smoke_overrides(config: ExperimentConfig) -> ExperimentConfig:
    """Shrink any experiment config into a minutes-scale end-to-end
    validation run: synthetic data, 1 epoch, small sample counts.  The
    loss stack, schedules, model and metric paths are untouched, so a
    reference YAML exercises its full experiment wiring hermetically."""
    import dataclasses

    return dataclasses.replace(
        config,
        dataset="synthetic",
        num_train_samples=2 * config.batch_size,
        num_test_samples=config.batch_size,
        epochs=1,
        run_name=f"{config.run_name}-smoke",
        plot_embeddings=False,
        resume_checkpoint=False,  # hermetic: never read external state
    )


def enable_compilation_cache(config: ExperimentConfig) -> None:
    """Point XLA's persistent compilation cache at
    ``config.compilation_cache_dir`` (no-op when unset).  Must run
    before the first trace; executables then persist across process
    restarts — resume, sweeps and preemption recovery skip the
    40-90 s remote compiles this environment pays per fresh process."""
    if not config.compilation_cache_dir:
        return
    import jax

    path = os.path.abspath(os.path.expanduser(config.compilation_cache_dir))
    os.makedirs(path, exist_ok=True)
    rebind = jax.config.jax_compilation_cache_dir not in (None, path)
    jax.config.update("jax_compilation_cache_dir", path)
    if rebind:
        # the cache singleton binds to the dir first used in this
        # process; a later dir change (sweep over experiments with
        # different cache dirs, tests after conftest's suite cache)
        # silently keeps writing to the old one without a reset
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()


def main(config: ExperimentConfig, image_size: Optional[int] = None) -> Dict[str, float]:
    """Full experiment: data → train w/ per-epoch eval → final eval/save
    (reference: main(), sparsify_clip.py:1084-1121)."""
    import jax

    # Multihost first: jax.distributed.initialize must precede the
    # first device query (no-op unless config.multihost).  Every
    # process runs this same function — the device programs (train
    # step, eval encoders, orbax saves) are collective; host side
    # effects (logging, plots, npz writes, prints) belong to process 0.
    from sparsify_clip_tpu.parallel.multihost import initialize_distributed, is_primary

    initialize_distributed(config)
    primary = is_primary()

    enable_compilation_cache(config)

    from sparsify_clip_tpu import checkpoints
    from sparsify_clip_tpu.data import dataset_loader
    from sparsify_clip_tpu.eval import evaluate_model, make_eval_model
    from sparsify_clip_tpu.logging import NullLogger, RunLogger
    from sparsify_clip_tpu.train import create_train_setup, run_training
    from sparsify_clip_tpu.viz import plot_all_methods

    if config.debug_nans:
        from sparsify_clip_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)

    logger = (
        RunLogger(
            project=config.project_name,
            run_name=config.run_name,
            config=config.to_dict(),
            log_dir=config.log_dir,
            backend=config.log_backend,
        )
        if primary
        else NullLogger()
    )
    say = print if primary else (lambda *a, **k: None)
    set_seed(config.seed)
    say("Config:", config.to_dict())
    say("Experiment:", config.run_name)

    from sparsify_clip_tpu.models.clip import MODEL_REGISTRY

    if image_size is None:
        # each registry entry carries its native resolution (RN50x4 is
        # 288px, RN50x16 384px, everything else 224px)
        image_size = MODEL_REGISTRY[config.model].image_size

    say("\nLoading the dataset...")
    train_loader, test_loader = dataset_loader(config, image_size=image_size)
    say("Dataset loaded.\n")

    setup = create_train_setup(
        config, steps_per_epoch=len(train_loader), image_size=image_size
    )
    model = setup.model

    start_epoch = 0
    resume_skip = 0  # mid-epoch batches to skip on exact resume
    resume_end = None  # epoch bound override (auto resume completes the run)
    if config.resume_requested:
        resume_path = str(config.resume_checkpoint)
        if resume_path == "auto" or os.path.isdir(resume_path):
            # exact resume: full train state incl. optimizer moments,
            # schedule position and temperature (beyond the reference's
            # weights-only semantics, SURVEY.md §3.4)
            target = (
                os.path.join(config.checkpoint_dir, config.run_name)
                if resume_path == "auto"
                else resume_path
            )
            import jax as _jax
            import numpy as _np

            setup.state = checkpoints.restore_full(
                target, _jax.tree_util.tree_map(_np.asarray, setup.state)
            )
            start_epoch = int(setup.state.step) // len(train_loader)
            # exact data-order resume: skip the batches the preempted
            # run already trained (the loaders' per-(seed, epoch)
            # streams make the remainder bit-identical), and complete
            # the ORIGINAL epoch schedule — the restored LR-schedule
            # position assumes the original total_steps.
            resume_skip = int(setup.state.step) % len(train_loader)
            resume_end = config.epochs
            say(
                f"Resumed full state from {target} at step "
                f"{int(setup.state.step)} (epoch {start_epoch}, "
                f"skipping {resume_skip} already-trained batches)"
            )
        else:
            # weights-only resume — reference semantics
            # (sparsify_clip.py:719-724): optimizer/schedule/temperature
            # restart from scratch.
            say(f"Resuming weights from {resume_path} at epoch {config.resume_epoch}")
            params = checkpoints.load_weights(setup.state.params, resume_path)
            setup.state = setup.state.replace(params=params)
            start_epoch = config.resume_epoch

    eval_batches = list(test_loader.epoch(0))
    last_eval: Dict[str, float] = {}
    eval_pass = 0
    # fp32 eval towers over the shared fp32 params (reference runs eval
    # with no autocast, sparsify_clip.py:563-593); built once so the
    # jitted eval encoders compile once
    eval_model = make_eval_model(model, config.eval_fp32)

    def eval_fn(state):
        nonlocal last_eval, eval_pass
        if config.eval_redraw_captions and eval_pass > 0:
            # reference semantics: every eval pass re-draws the 1-of-5
            # caption (sparsify_clip.py:1050-1057 via :564)
            batches = list(test_loader.epoch(eval_pass))
        else:
            batches = eval_batches
        this_pass = eval_pass
        eval_pass += 1
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        plot_fn = None
        if config.plot_embeddings and primary:
            def plot_fn(txt, img):
                # pass counter in the tag: two eval passes inside the
                # same wall-clock second must not overwrite each other
                plot_all_methods(
                    txt, img, out_dir=os.path.join(config.log_dir, "plots"),
                    tag=f"{this_pass:04d}_{time.time():.0f}", logger=logger,
                )
        metrics = evaluate_model(
            eval_model, variables, batches,
            plot_embeddings=config.plot_embeddings, plot_fn=plot_fn,
            mesh=setup.mesh,
        )
        say("Evaluation Results:", metrics, "\n")
        logger.log(metrics)
        last_eval = metrics
        return metrics

    def log_fn(metrics):
        if "train_loss" in metrics:
            logger.log_train_step(
                metrics, config.anchor_temperature_learnable,
                include_components=config.log_loss_components,
            )
        else:
            logger.log(metrics)

    def checkpoint_fn(state, epoch):
        os.makedirs(config.checkpoint_dir, exist_ok=True)
        checkpoints.save_weights(
            state.params,
            os.path.join(config.checkpoint_dir, f"{config.run_name}_epoch_{epoch}.npz"),
        )
        full_dir = os.path.join(config.checkpoint_dir, config.run_name)
        if config.async_checkpoint:
            checkpoints.save_full_async(state, full_dir)
        else:
            checkpoints.save_full(state, full_dir)
        say(f"Model saved at epoch {epoch}")

    say("Training the model...")
    from sparsify_clip_tpu.utils.preemption import GracefulShutdown

    shutdown = GracefulShutdown() if config.handle_preemption else None
    if shutdown is not None:
        stop_fn = shutdown.requested_fn
        if config.multihost:
            # collective stop decision: one host's SIGTERM must stop
            # every process at the SAME step, or the survivors deadlock
            # in the next step's collectives (a tiny per-step allgather
            # — negligible next to the step itself)
            from sparsify_clip_tpu.parallel.multihost import any_process_flag

            def stop_fn():  # noqa: F811 — deliberate multihost override
                return any_process_flag(shutdown.requested)
        with shutdown:
            state = run_training(
                setup,
                train_batches=lambda epoch: train_loader.epoch(epoch),
                eval_fn=eval_fn,
                log_fn=log_fn,
                checkpoint_fn=checkpoint_fn,
                start_epoch=start_epoch,
                stop_fn=stop_fn,
                skip_steps=resume_skip,
                end_epoch=resume_end,
            )
        if setup.stopped_early:
            # The loop actually returned early (a signal landing after
            # the final step completes training normally and falls
            # through to the final eval/save below).  Grace windows are
            # short: skip final eval/export, make sure the full-state
            # save (written by run_training) is durable, and leave a
            # resumable run behind.
            checkpoints.wait_for_async_saves()
            logger.log({"preempted": 1.0})
            logger.finish()
            say(
                "Preempted: training state checkpointed under "
                f"{os.path.join(config.checkpoint_dir, config.run_name)}; "
                'restart with resume_checkpoint: "auto" to continue.'
            )
            return last_eval
    else:
        state = run_training(
            setup,
            train_batches=lambda epoch: train_loader.epoch(epoch),
            eval_fn=eval_fn,
            log_fn=log_fn,
            checkpoint_fn=checkpoint_fn,
            start_epoch=start_epoch,
            skip_steps=resume_skip,
            end_epoch=resume_end,
        )
    say("Training complete.\n")

    say("Final evaluation of the model...")
    final_log = eval_fn(state)
    say("Evaluation complete.\n")

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    # in-flight background saves must commit before the run ends
    checkpoints.wait_for_async_saves()
    final_path = checkpoints.save_weights(
        state.params, os.path.join(config.checkpoint_dir, f"{config.run_name}.npz")
    )
    # Attach the final model to the run (reference: wandb.save, :1119).
    logger.save_artifact(final_path)
    logger.finish()
    return final_log


def cli(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Run a sparsify-clip experiment from a yaml config"
    )
    parser.add_argument(
        "--config", type=str, required=True,
        help="Path to a yaml config file or a folder of config files",
    )
    parser.add_argument(
        "--device", type=int, default=0,
        help="Lead device index (reference: GPU id)",
    )
    parser.add_argument(
        "--image-size", type=int, default=None,
        help="Override image resolution (e.g. tiny smoke runs)",
    )
    parser.add_argument(
        "--smoke", action="store_true",
        help="Run the config end-to-end on synthetic data for 1 epoch "
             "(validates an experiment's full wiring in minutes)",
    )
    args = parser.parse_args(argv)

    def run(config):
        if args.smoke:
            config = apply_smoke_overrides(config)
        main(config, image_size=args.image_size)

    if os.path.isfile(args.config):
        run(load_config(args.config, args.device))
    elif os.path.isdir(args.config):
        for config in load_config_dir(args.config, args.device):
            run(config)
    else:
        parser.error(f"--config path not found: {args.config}")


if __name__ == "__main__":
    cli()
