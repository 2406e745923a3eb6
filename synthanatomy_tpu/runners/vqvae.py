"""Stage-1 orchestration: training / extracting / decoding.

Rebuild of the reference entry-point bodies (``training()``
run_vqvae.py:59-392 and ``inference()`` run_vqvae.py:395-535): wires
data loaders, networks, losses, handlers and the jitted steps into a
plain-Python epoch loop (the Ignite/MONAI engine replacement), with the
reference's checkpoint / eval / logging cadences and output contracts:

- extracting → ``*_quantization_i.npy`` uint16 codebook indices + the
  round-trip ``*_reconstruction.nii.gz`` (run_vqvae.py:468-498);
- decoding → ``*_sample.nii.gz`` from loaded latent grids
  (run_vqvae.py:500-514);
- augmentation trace CSV in extracting mode (run_vqvae.py:446-452).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List

import numpy as np

from synthanatomy_tpu.config import VQVAEConfig


def build_vqvae(config: VQVAEConfig, dtype=None):
    import jax.numpy as jnp

    from synthanatomy_tpu.models.vqvae import BaselineVQVAE

    if dtype is None:
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return BaselineVQVAE(
        n_levels=config.no_levels,
        downsample_parameters=config.downsample_parameters,
        upsample_parameters=config.upsample_parameters,
        n_embed=config.levels_num_embeddings,
        embed_dim=config.levels_embedding_dim,
        n_channels=config.no_channels,
        n_res_channels=config.no_channels,
        n_res_layers=config.no_res_layers,
        dropout=config.dropout,
        use_slim_residual=config.use_slim_residual,
        use_subpixel_conv=config.use_subpixel_conv,
        embedding_init=config.embedding_init[0],
        dtype=dtype,
        # True means "auto" (pallas on TPU, XLA elsewhere — incl. the
        # host-CPU init scope); False forces the XLA path everywhere
        use_pallas_vq=None if config.use_pallas_vq else False,
        use_fused_residual=None if config.use_fused_residual else False,
        use_remat=config.use_remat,
    )


def _make_loaders(config: VQVAEConfig, mode: str, shard_id: int, num_shards: int):
    from synthanatomy_tpu.data.datasets import (
        PrefetchLoader,
        VolumeDataset,
        discover_subjects,
    )
    from synthanatomy_tpu.data.transforms import VQVAETransform

    def dataset(subjects_path, augment, patch):
        subjects = discover_subjects(
            subjects_path,
            mode=mode,
            no_augmented_extractions=config.no_augmented_extractions,
        )
        tf = VQVAETransform(
            mode=mode,
            normalize=config.normalize,
            roi=config.roi,
            patch_size=patch,
            augment=augment,
            augmentation_probability=config.augmentation_probability,
            augmentation_strength=config.augmentation_strength,
        )
        return VolumeDataset(
            subjects, tf, load_nii_canonical=config.load_nii_canonical,
            seed=config.seed,
            # on-device augmentation: training only (the inference
            # runners consume host-final volumes)
            device_augment=(
                config.device_augmentation and augment and mode == "training"
            ),
        )

    augment_train = mode == "training" or config.no_augmented_extractions > 0
    train_ds = dataset(config.training_subjects, augment_train, config.patch_size)
    loaders = {
        "train": PrefetchLoader(
            train_ds, config.batch_size, shuffle=mode == "training",
            drop_last=mode == "training", num_workers=config.num_workers,
            prefetch=config.prefetch_factor, shard_id=shard_id,
            num_shards=num_shards, seed=config.seed,
        )
    }
    if config.validation_subjects:
        val_ds = dataset(config.validation_subjects, False, config.eval_patch_size)
        loaders["val"] = PrefetchLoader(
            val_ds, config.eval_batch_size, shuffle=False, drop_last=False,
            num_workers=config.num_workers, prefetch=config.prefetch_factor,
            shard_id=shard_id, num_shards=num_shards, seed=config.seed,
        )
        train_eval_ds = dataset(config.training_subjects, False, config.eval_patch_size)
        loaders["train_eval"] = PrefetchLoader(
            train_eval_ds, config.eval_batch_size, shuffle=False, drop_last=False,
            num_workers=config.num_workers, prefetch=config.prefetch_factor,
            shard_id=shard_id, num_shards=num_shards, seed=config.seed,
        )
    return loaders


def resolve_lpips_params(config: VQVAEConfig, logger):
    """Pretrained LPIPS when ``--lpips_weights`` is given (net kind
    validated against the loss), fixed-random features with a loud
    warning otherwise.  Reference behaviour being matched: the
    perceptual losses construct the pip package's pretrained nets
    (src/losses/vqvae/vqvae.py:836-869, 1656)."""
    import jax

    from synthanatomy_tpu.losses import vqvae as vql
    from synthanatomy_tpu.losses.lpips import init_lpips_params, load_lpips_npz

    if not vql.loss_needs_lpips(config.loss):
        return None
    net = vql.lpips_net_for_loss(config.loss)
    if config.lpips_weights:
        lpips_params = load_lpips_npz(config.lpips_weights)
        if lpips_params.kind != net:
            raise ValueError(
                f"lpips_weights are for {lpips_params.kind!r} but loss "
                f"{config.loss!r} needs {net!r}"
            )
        logger.info(
            f"Loaded pretrained LPIPS ({net}) from {config.lpips_weights}"
        )
        return lpips_params
    lpips_params = init_lpips_params(jax.random.key(0), net)
    logger.warning(
        "LPIPS is running with FIXED RANDOM features — perceptual loss "
        "values will NOT match the paper's pretrained "
        f"{net}Net LPIPS. Provide --lpips_weights=<path.npz> "
        "(see tools/fetch_lpips_weights.py) for exact behaviour."
    )
    return lpips_params


def _scheduled(config: VQVAEConfig, epoch: int, epoch_length: int) -> Dict[str, Any]:
    from synthanatomy_tpu.train import schedulers as S

    gamma = config.gamma
    if gamma == "auto":
        gamma = S.get_gamma(config.learning_rate, config.epochs, epoch_length)
    lr = config.learning_rate * float(gamma) ** (epoch * epoch_length)

    decay = float(config.decay[0])
    if config.decay_warmup == "step":
        mde = config.max_decay_epochs
        if mde == "auto":
            mde = S.get_max_decay_epochs(epoch_length, config.batch_size)
        decay = S.decay_warmup_step(decay, int(mde), epoch)
    elif config.decay_warmup == "linear":
        mde = config.max_decay_epochs
        if mde == "auto":
            mde = S.get_max_decay_epochs(epoch_length, config.batch_size)
        decay = S.decay_warmup_linear(decay, int(mde), epoch)

    gdl = S.linear(
        initial_value=config.initial_factor_value,
        step_constant=config.initial_factor_steps,
        step_max_value=config.max_factor_steps,
        max_value=config.max_factor_value,
        current_step=epoch,
    )
    return {
        "lr": lr,
        "d_lr": config.discriminator_learning_rate,
        "decay": decay,
        "commitment_cost": float(config.commitment_cost[0]),
        "gdl_factor": gdl,
        "epoch": epoch,
    }


def make_finetune_gate(lo: float, hi: float, patience: int):
    """Device-side adversarial finetune gate (AdversarialFinetuneHandler
    semantics, reference src/handlers/vqvae.py:141-170): count the
    consecutive-steps streak of the D loss inside [lo, hi]; once the
    streak reaches ``patience``, generator training is released.

    The in-range streak counter lives on device — a float() on the D
    loss every step would host-sync and serialize dispatch for the
    entire finetune phase.  The release decision is STICKY
    (``released |= streak >= patience``) so a streak that completes
    and then breaks between the runner's periodic host checks is never
    lost — the periodic read only delays the release, it cannot miss
    one.  Returns a jitted ``(counter, released, d_loss) ->
    (counter, released)``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gate_update(counter, released, d_loss):
        in_range = (d_loss >= lo) & (d_loss <= hi)
        counter = jnp.where(in_range, counter + 1, 0)
        return counter, released | (counter >= patience)

    return gate_update


def training(config: VQVAEConfig) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.losses import vqvae as vql
    from synthanatomy_tpu.losses.lpips import init_lpips_params
    from synthanatomy_tpu.metrics import get_ms_ssim_window, mae, ms_ssim_3d, mse
    from synthanatomy_tpu.models.discriminator import BaselineDiscriminator
    from synthanatomy_tpu.parallel.mesh import (
        host_shard_info,
        make_data_mesh_for_batch,
        replicated,
        shard_batch,
    )
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.logging import TBLogger, write_transform_trace_csv
    from synthanatomy_tpu.train.vqvae_steps import (
        create_vqvae_train_state,
        make_vqvae_eval_step,
        make_vqvae_train_step,
    )
    from synthanatomy_tpu.utils.general import basic_initialization, log_network_size
    from synthanatomy_tpu.utils.profiling import StepProfiler, device_memory_summary

    logger, dirs, ckpt_path, starting_epoch, rng = basic_initialization(
        config, "vqvae-training"
    )
    profiler = StepProfiler()
    from synthanatomy_tpu.utils.general import PreemptionGuard

    guard = PreemptionGuard(logger)
    shard_id, num_shards = host_shard_info()
    loaders = _make_loaders(config, "training", shard_id, num_shards)
    epoch_length = config.training_epoch_length or len(loaders["train"])

    # peek one batch for the input shape (reference peeks the loader)
    first_batch = next(iter(loaders["train"].epoch(0)))
    input_shape = first_batch["MRI"].shape[1:4]
    logger.info(f"Input shape: {input_shape}")

    model = build_vqvae(config)
    d_model = (
        BaselineDiscriminator(
            dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32,
            use_split_bn=config.grouped_stat_bn,
        )
        if config.adversarial_component
        else None
    )

    state, g_tx, d_tx = create_vqvae_train_state(
        model, rng, input_shape,
        learning_rate=config.learning_rate,
        d_model=d_model,
        d_learning_rate=config.discriminator_learning_rate,
    )
    log_network_size(state.g_params, logger, config.network)

    if ckpt_path:
        state = C.load_checkpoint(ckpt_path, state)
        logger.info(f"Restored checkpoint from {ckpt_path}")

    lpips_params = resolve_lpips_params(config, logger)

    mesh = make_data_mesh_for_batch(config.batch_size, config.mesh_shape)

    device_aug = getattr(loaders["train"].dataset, "device_augment", False)
    aug_shifts = None
    if device_aug:
        from synthanatomy_tpu.ops.augment import shear_shift_bounds

        ranges = loaders["train"].dataset.transform.affine_ranges()
        if ranges["rotate_range"] < 0.5:
            # TPU-fast 3-pass resampler: static shift bounds cover the
            # whole parameter box (BASELINE.md round 4 — the trilinear
            # gather lowers to a serial loop on TPU)
            aug_shifts = shear_shift_bounds(input_shape, **ranges)
            logger.info(f"device augment: 3-pass resampler, shifts {aug_shifts}")
        else:
            logger.info("device augment: exact-gather resampler "
                        "(rotation range too large for the 3-pass form)")

    def build_step(train_generator: bool):
        fun = make_vqvae_train_step(
            model, g_tx,
            loss_name=config.loss,
            d_model=d_model,
            d_tx=d_tx,
            generator_criterion=config.generator_loss,
            discriminator_criterion=config.discriminator_loss,
            use_adaptive_weight=config.use_adversarial_adaptive_weight,
            adaptive_threshold=config.adaptive_adversarial_weight_threshold,
            adaptive_value=config.adaptive_adversarial_weight_value,
            train_generator=train_generator,
            d_grouped_stats=config.grouped_stat_bn,
        )
        if device_aug:
            from synthanatomy_tpu.ops.augment import augment_batch

            base = fun

            def fun(state, batch, aug, sched, lpips_params=None):
                # augment inside the same jit as the step: one device
                # dispatch, and XLA fuses the photometric tail into the
                # first encoder conv's input read
                return base(
                    state, augment_batch(batch, aug, aug_shifts), sched,
                    lpips_params,
                )

        return jax.jit(fun, donate_argnums=0 if config.donate_state else ())

    finetune_gate = config.finetune_adversarial_component is not None
    g_frozen = finetune_gate
    gate_counter = None
    gate_check_every = 1
    if finetune_gate:
        gate_lo, gate_hi = config.finetune_adversarial_component

        gate_update = make_finetune_gate(
            gate_lo, gate_hi, int(config.finetune_patience)
        )
        gate_counter = jnp.zeros((), jnp.int32)
        gate_released = jnp.zeros((), jnp.bool_)
        gate_check_every = max(1, min(int(config.finetune_patience), 16))
    step_fn = build_step(not g_frozen)
    # eval is forward-only — the fused residual kernel only wins under
    # the remat backward, so the evaluator always takes the XLA path
    eval_step = jax.jit(
        make_vqvae_eval_step(
            model.clone(use_fused_residual=False), loss_name=config.loss
        )
    )

    tb_train = TBLogger(f"{dirs['logs_directory']}/train", enabled=config.rank == 0)
    tb_val = TBLogger(f"{dirs['logs_directory']}/val_eval", enabled=config.rank == 0)
    tb_train_eval = TBLogger(
        f"{dirs['logs_directory']}/train_eval", enabled=config.rank == 0
    )

    try:
        ms_ssim_win = get_ms_ssim_window(
            eval_patch_size=config.eval_patch_size, roi=config.roi,
            input_shape=input_shape,
        )
    except ValueError:
        # inputs too small for a multi-scale pyramid — skip MS-SSIM
        ms_ssim_win = None
        logger.warning("input too small for MS-SSIM; metric disabled")

    # device-side (jitted) eval metrics — eager metric math per batch
    # would dispatch op-by-op through the device tunnel
    if ms_ssim_win is not None:

        @jax.jit
        def eval_metrics_fn(recon, x):
            return (
                mae(recon, x), mse(recon, x),
                ms_ssim_3d(recon, x, win_size=ms_ssim_win),
            )

    else:

        @jax.jit
        def eval_metrics_fn(recon, x):
            return mae(recon, x), mse(recon, x), jnp.zeros(())

    state = jax.device_put(state, replicated(mesh))
    n_mesh_dev = int(np.prod(list(mesh.shape.values())))
    if config.zero1 and n_mesh_dev > 1:
        from synthanatomy_tpu.parallel.sharding_rules import shard_opt_state_zero1

        state = state.replace(
            g_opt_state=shard_opt_state_zero1(mesh, state.g_opt_state),
            d_opt_state=(
                shard_opt_state_zero1(mesh, state.d_opt_state)
                if state.d_opt_state is not None
                else state.d_opt_state
            ),
        )
        logger.info(f"ZeRO-1: Adam moments sharded over {n_mesh_dev} devices")
    history: List[Dict[str, float]] = []
    best_metric = -np.inf
    global_step = int(state.step)

    with jax.set_mesh(mesh):
        for epoch in range(max(starting_epoch, 0), config.epochs):
            sched = _scheduled(config, epoch, epoch_length)
            t_epoch = time.time()
            epoch_metrics: Dict[str, float] = {}
            n_it = 0
            for it, batch in enumerate(loaders["train"].epoch(epoch)):
                if it >= epoch_length:
                    break
                x = shard_batch(mesh, batch["MRI"])
                with profiler.step(global_step):
                    if device_aug:
                        aug = shard_batch(mesh, batch["augment"])
                        state, metrics = step_fn(
                            state, x, aug, sched, lpips_params
                        )
                    else:
                        state, metrics = step_fn(state, x, sched, lpips_params)
                global_step += 1
                n_it += 1
                for k, v in metrics.items():
                    # accumulate scalars on device (float() here would
                    # sync the host to every step)
                    if getattr(v, "ndim", 1) == 0 or isinstance(v, (int, float)):
                        epoch_metrics[k] = epoch_metrics.get(k, 0.0) + v
                # finetune gate (AdversarialFinetuneHandler semantics);
                # counter update is an async jitted op — only the
                # periodic check below touches the host
                if g_frozen and "Loss-Discriminator-Total" in metrics:
                    gate_counter, gate_released = gate_update(
                        gate_counter, gate_released,
                        metrics["Loss-Discriminator-Total"],
                    )
                    if n_it % gate_check_every == 0 and bool(gate_released):
                        g_frozen = False
                        step_fn = build_step(True)
                        logger.info("Finetune gate released: generator training on")

            # epoch-boundary gate check (one host sync per epoch) so a
            # release never slips past an epoch end
            if g_frozen and gate_counter is not None:
                if bool(gate_released):
                    g_frozen = False
                    step_fn = build_step(True)
                    logger.info("Finetune gate released: generator training on")

            epoch_metrics = {
                k: float(v) / max(n_it, 1) for k, v in epoch_metrics.items()
            }
            if (epoch + 1) % config.log_every == 0 and config.rank == 0:
                epoch_metrics.update(device_memory_summary())
                tb_train.scalars(epoch_metrics, epoch + 1)
                tb_train.scalars({"lr": sched["lr"], "decay": sched["decay"]}, epoch + 1, "Sched/")
                logger.info(
                    f"epoch {epoch + 1}/{config.epochs} "
                    f"loss={epoch_metrics.get('Loss-Reconstruction-Total', float('nan')):.4f} "
                    f"({time.time() - t_epoch:.1f}s)"
                )
            history.append(epoch_metrics)

            if (epoch + 1) % config.checkpoint_every == 0 or guard.should_stop:
                host_state = jax.device_get(state)
                C.save_checkpoint(dirs["checkpoint_directory"], host_state, epoch + 1)
            if guard.should_stop:
                logger.warning(f"preempted: checkpointed at epoch {epoch + 1}")
                break

            if "val" in loaders and (epoch + 1) % config.eval_every == 0:

                def run_eval(loader):
                    # metric scalars stay on device inside the loop (a
                    # float() per batch would serialize dispatch — the
                    # banned per-iteration host-sync pattern); one sync
                    # per epoch below
                    vals = {"MAE": [], "MSE": [], "MS-SSIM": []}
                    last = None
                    for batch in loader.epoch(epoch):
                        # eval loaders keep tail batches (drop_last=False);
                        # a tail not divisible by the mesh cannot shard —
                        # run it replicated (exact metrics, one extra
                        # compile) instead of crashing
                        if batch["MRI"].shape[0] % n_mesh_dev == 0:
                            x = shard_batch(mesh, batch["MRI"])
                        else:
                            x = jnp.asarray(batch["MRI"])
                        recon, _ = eval_step(state, x, sched, lpips_params)
                        m_mae, m_mse, m_ssim = eval_metrics_fn(
                            recon.astype(jnp.float32), x
                        )
                        vals["MAE"].append(m_mae)
                        vals["MSE"].append(m_mse)
                        if ms_ssim_win is not None:
                            vals["MS-SSIM"].append(m_ssim)
                        last = (batch["MRI"][0], recon)
                    if last is not None:
                        last = (
                            last[0],
                            np.asarray(
                                jax.device_get(last[1][0]), np.float32
                            ),
                        )
                    # one stacked transfer per metric (not one per
                    # batch scalar — the tunnel's ~3 ms dispatch floor
                    # makes per-scalar fetches N serial round trips)
                    return {
                        k: float(np.asarray(jnp.stack(vs)).mean())
                        for k, vs in vals.items()
                        if vs
                    }, last

                val_metrics, last = run_eval(loaders["val"])
                # clean-transform training-set evaluator (the reference's
                # third engine, run_vqvae.py:300)
                train_eval_metrics = (
                    run_eval(loaders["train_eval"])[0]
                    if "train_eval" in loaders
                    else {}
                )
                if config.rank == 0:
                    tb_val.scalars(val_metrics, epoch + 1)
                    tb_train_eval.scalars(train_eval_metrics, epoch + 1)
                    if last is not None and config.save_2d_images:
                        tb_val.volume_images("originals", last[0], epoch + 1, config.save_2d_images)
                        tb_val.volume_images("reconstructions", last[1], epoch + 1, config.save_2d_images)
                    if last is not None and config.save_3d_images:
                        tb_val.volume_gif("originals_3d", last[0], epoch + 1)
                        tb_val.volume_gif("reconstructions_3d", last[1], epoch + 1)
                    logger.info(f"eval @ {epoch + 1}: val {val_metrics} "
                                f"train_eval {train_eval_metrics}")
                # surface eval metrics to callers (tools/quality_loop.py
                # trains to a val MS-SSIM threshold off this)
                if history:
                    history[-1].update(
                        {f"val_{k}": v for k, v in val_metrics.items()}
                    )
                key = val_metrics.get("MS-SSIM", -val_metrics.get("MSE", np.inf))
                if key > best_metric:
                    best_metric = key
                    C.save_best_checkpoint(
                        dirs["checkpoint_directory"], jax.device_get(state), key
                    )

    profiler.close()
    host_state = jax.device_get(state)
    # skip the final checkpoint_epoch=config.epochs save on preemption:
    # the loop broke at epoch E < config.epochs, and the final name would
    # make auto-resume treat training as complete (epoch-E state was
    # already checkpointed under its true epoch number above)
    if not guard.should_stop:
        C.save_checkpoint(dirs["checkpoint_directory"], host_state, config.epochs)
        if config.rank == 0:
            # the reference also writes a raw one-file state dict next to
            # the engine checkpoint at training end (run_vqvae.py:389-392)
            # — the release-artifact form its README distributes
            from synthanatomy_tpu.interop import (
                export_vqvae_state_dict,
                save_raw_state_dict,
            )

            try:
                out = save_raw_state_dict(
                    os.path.join(
                        dirs["checkpoint_directory"],
                        f"model_state_dict_epoch={config.epochs}",
                    ),
                    export_vqvae_state_dict(
                        host_state.g_params, host_state.vq,
                        n_levels=config.no_levels,
                        n_res_layers=config.no_res_layers,
                        use_subpixel_conv=config.use_subpixel_conv,
                    ),
                )
                logger.info(f"wrote raw state dict {out}")
            except Exception as exc:  # the orbax checkpoint is the
                # durable artifact; a conversion gap must not fail a run
                logger.warning(f"raw state-dict export skipped: {exc}")
    tb_train.close()
    tb_val.close()
    tb_train_eval.close()
    return {"state": host_state, "history": history, "dirs": dirs}


def inference(config: VQVAEConfig) -> Dict[str, Any]:
    """extracting / decoding modes (run_vqvae.py:395-535)."""
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.data.datasets import (
        LatentDataset,
        PrefetchLoader,
        discover_decoding_subjects,
    )
    from synthanatomy_tpu.data.nifti import save_nifti
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.logging import save_npy_outputs, write_transform_trace_csv
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from synthanatomy_tpu.utils.general import basic_initialization

    logger, dirs, ckpt_path, _, rng = basic_initialization(config, f"vqvae-{config.mode}")

    # forward-only modes never fuse the residual layers: XLA's in-graph
    # conv fusion beats the kernel there (BASELINE.md round 5 — the
    # kernel's win is remat-training-only); param structure is identical
    model = build_vqvae(config).clone(use_fused_residual=False)

    # The reference's inference engine also loads the discriminator when
    # adversarial training was on, scores the reconstruction/sample as
    # real and writes the *elementwise* criterion map per sample as
    # ``*_adversarial_loss.npy`` (run_vqvae.py:516-531; criterion
    # functions src/losses/adversarial/adversarial.py:77-105).
    d_model = None
    criterion = None
    if config.adversarial_component:
        from synthanatomy_tpu.losses.adversarial import get_criterion
        from synthanatomy_tpu.models.discriminator import BaselineDiscriminator

        d_model = BaselineDiscriminator(
            dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        )
        criterion = get_criterion(config.generator_loss)

    def _d_vars(state):
        return (
            {"params": state.d_params, "batch_stats": state.d_batch_stats}
            if d_model is not None
            else None
        )

    def _adv_from_logits(logits):
        return criterion(jnp.asarray(logits, jnp.float32), True)

    # ---- multi-device / multi-host inference sharding -----------------
    # the reference shards inference across ranks too (DistributedSampler
    # on the extraction loader, src/utils/vqvae.py:442-446); here hosts
    # split the subject list and each host's batch shards over its local
    # devices under GSPMD (convs partition on the batch axis)
    from synthanatomy_tpu.parallel.mesh import host_shard_info

    shard_id, num_shards = host_shard_info()
    n_local = len(jax.local_devices())

    def _stage(state):
        """(staged state, batch sharding) for the local device set."""
        if n_local > 1:
            from jax.sharding import Mesh as _M
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            lmesh = _M(np.asarray(jax.local_devices()), ("data",))
            logger.info(f"inference batch sharded over {n_local} devices")
            return (
                jax.device_put(state, NamedSharding(lmesh, _P())),
                NamedSharding(lmesh, _P("data")),
            )
        return jax.device_put(state, jax.devices()[0]), None

    # every batch is padded to one static shape (divisible by the local
    # device count): a single compile, tail batches sliced back
    padded_n = -(-config.batch_size // n_local) * n_local

    def _pad(x):
        n_real = x.shape[0]
        if n_real < padded_n:
            x = np.concatenate(
                [x, np.repeat(x[-1:], padded_n - n_real, axis=0)]
            )
        return x, n_real

    written: List[str] = []

    if config.mode == "extracting":
        loaders = _make_loaders(config, "extracting", shard_id, num_shards)
        first = next(iter(loaders["train"].epoch(0)))
        input_shape = first["MRI"].shape[1:4]
        state, _, _ = create_vqvae_train_state(
            model, rng, input_shape, d_model=d_model
        )
        if ckpt_path:
            state = C.load_checkpoint(ckpt_path, state)
            logger.info(f"Loaded checkpoint {ckpt_path}")

        # stage the restored (host-committed) checkpoint onto the
        # accelerator(s) — jit compiles for the committed device of its
        # inputs, so without this extraction would lower for CPU
        state, batch_sharding = _stage(state)
        variables = {"params": state.g_params, "vq": state.vq}

        # the forward-pass strategy object (reference inferer contract,
        # src/inferer/vqvae.py:9-45) inside one jitted call
        from synthanatomy_tpu.inferers import VQVAEExtractionInferer

        inferer = VQVAEExtractionInferer(model, d_model)

        @jax.jit
        def extract(variables, state, x):
            out = inferer(variables, x, _d_vars(state))
            adv = (
                _adv_from_logits(out["adversarial_logits"])
                if d_model is not None
                else None
            )
            return out["quantization_0"], out["reconstruction"][0], adv

        all_traces, all_paths = [], []
        for batch in loaders["train"].epoch(0):
            x, n_real = _pad(np.asarray(batch["MRI"]))
            x = jnp.asarray(x)
            if batch_sharding is not None:
                x = jax.device_put(x, batch_sharding)
            idx, recon, adv = extract(variables, state, x)
            idx = np.asarray(jax.device_get(idx))[:n_real]
            recon = np.asarray(jax.device_get(recon), np.float32)[:n_real]
            if adv is not None:
                adv = jnp.asarray(adv)[:n_real]
            written += save_npy_outputs(
                dirs["outputs_directory"], idx, batch["paths"],
                postfix="quantization_0", dtype=np.uint16,
                augmentation_ids=batch["augmentation_ids"],
            )
            if adv is not None:
                written += save_npy_outputs(
                    dirs["outputs_directory"], np.asarray(jax.device_get(adv), np.float32),
                    batch["paths"], postfix="adversarial_loss", dtype=np.float32,
                    augmentation_ids=batch["augmentation_ids"],
                )
            for b, src in enumerate(batch["paths"]):
                base = src.split("/")[-1].replace(".nii.gz", "").replace(".nii", "")
                out_nii = f"{dirs['outputs_directory']}/{base}_reconstruction.nii.gz"
                save_nifti(out_nii, recon[b, ..., 0], batch["affines"][b])
                written.append(out_nii)
            all_traces += batch["traces"]
            all_paths += batch["paths"]
        trace_csv = write_transform_trace_csv(
            dirs["logs_directory"], all_traces, all_paths, rank=config.rank
        )
        if trace_csv:
            written.append(trace_csv)

    elif config.mode == "decoding":
        subjects = discover_decoding_subjects(config.training_subjects)
        ds = LatentDataset(subjects)
        loader = PrefetchLoader(
            ds, config.batch_size, shuffle=False, drop_last=False,
            num_workers=config.num_workers, collate_keys=("latents",),
            shard_id=shard_id, num_shards=num_shards,
        )
        first = next(iter(loader.epoch(0)))
        latent_shape = first["latents"].shape[1:4]
        # input shape back-computed from total stride
        stride = int(np.prod([p[1] for p in config.downsample_parameters]))
        input_shape = tuple(int(s) * stride for s in latent_shape)
        state, _, _ = create_vqvae_train_state(
            model, rng, input_shape, d_model=d_model
        )
        if ckpt_path:
            state = C.load_checkpoint(ckpt_path, state)
        state, batch_sharding = _stage(state)
        variables = {"params": state.g_params, "vq": state.vq}

        # patient-space orientation for decoded samples: latent .npy
        # files carry no affine (the reference also writes identity
        # here); ``decoding_affine`` names a NIfTI whose affine is
        # stamped on every decoded sample instead
        affine = None
        if config.decoding_affine:
            from synthanatomy_tpu.data.nifti import load_nifti

            affine = np.asarray(
                load_nifti(
                    config.decoding_affine, as_closest_canonical=False
                ).affine
            )
            logger.info(f"Using affine from {config.decoding_affine}")

        from synthanatomy_tpu.inferers import VQVAEDecodingInferer

        inferer = VQVAEDecodingInferer(model, d_model)

        @jax.jit
        def decode(variables, state, idx):
            out = inferer(variables, [idx], _d_vars(state))
            adv = (
                _adv_from_logits(out["adversarial_logits"])
                if d_model is not None
                else None
            )
            return out["sample"][0], adv

        for batch in loader.epoch(0):
            lat, n_real = _pad(np.asarray(batch["latents"]))
            lat = jnp.asarray(lat, jnp.int32)
            if batch_sharding is not None:
                lat = jax.device_put(lat, batch_sharding)
            recon, adv = decode(variables, state, lat)
            recon = np.asarray(jax.device_get(recon), np.float32)[:n_real]
            if adv is not None:
                written += save_npy_outputs(
                    dirs["outputs_directory"],
                    np.asarray(jax.device_get(adv), np.float32)[:n_real],
                    batch["paths"], postfix="adversarial_loss",
                    dtype=np.float32,
                )
            for b, src in enumerate(batch["paths"]):
                base = src.split("/")[-1].replace(".npy", "")
                out_nii = f"{dirs['outputs_directory']}/{base}_sample.nii.gz"
                save_nifti(out_nii, recon[b, ..., 0], affine)
                written.append(out_nii)
    else:
        raise ValueError(f"inference() got mode {config.mode!r}")

    logger.info(f"Wrote {len(written)} outputs to {dirs['outputs_directory']}")
    return {"written": written, "dirs": dirs}
