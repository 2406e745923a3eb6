"""Stage-2 orchestration: training / inference (sampling).

Rebuild of the reference transformer entry-point bodies
(run_transformer.py:47-293 training; :296-402 inference): latent `.npy`
dataflow + conditioning join, latent-grid shape peeked from data, the
Ordering, the Performer, CE training with exponential LR decay and
FAVOR+ projection redraw, and batch sampling written as
``*_sample.npy`` uint16 (run_transformer.py:390-398) — via the
KV-cached fast sampler.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List

import numpy as np

from synthanatomy_tpu.config import TransformerConfig


def build_ordering(config: TransformerConfig, latent_shape):
    from synthanatomy_tpu.models.ordering import Ordering

    return Ordering(
        config.ordering_type,
        3,
        tuple(latent_shape),
        reflected_spatial_dims=config.reflected_spatial_dims or (),
        transpositions_axes=config.transpositions_axes or (),
        rot90_axes=config.rot90_axes or (),
        transformation_order=config.transformation_order,
        seed=config.seed,
    )


def build_performer(
    config: TransformerConfig, ordering, latent_shape, dtype=None,
):
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.models.performer import Performer

    if dtype is None:
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    seq_len = int(np.prod(latent_shape)) + 1  # + BOS (run_transformer.py:74)
    return Performer(
        num_tokens=config.vocab_size + 1,  # + BOS token (run_transformer.py:71)
        max_seq_len=seq_len,
        dim=config.n_embd,
        depth=config.n_layers,
        heads=config.n_head,
        dim_head=config.dim_head,
        local_attn_heads=config.local_attn_heads,
        local_window_size=config.local_window_size,
        nb_features=config.nb_features,
        feature_redraw_interval=config.feature_redraw_interval,
        generalized_attention=config.generalized_attention,
        ff_mult=config.ff_mult,
        ff_glu=config.ff_glu,
        ff_chunks=config.ff_chunks,
        reversible=config.reversible,
        remat_attention=config.remat_attention,
        emb_dropout=config.emb_dropout,
        ff_dropout=config.ff_dropout,
        attn_dropout=config.attn_dropout,
        use_rezero=config.use_rezero,
        use_scalenorm=config.use_scalenorm,
        tie_embed=config.tie_embed,
        qkv_bias=config.qkv_bias,
        attn_out_bias=config.attn_out_bias,
        rotary_position_emb=config.position_emb == "rotary",
        fixed_position_emb=config.position_emb == "fixed",
        axial_position_emb=config.position_emb == "axial",
        spatial_position_emb=config.spatial_position_emb,
        spatial_shape=tuple(latent_shape) if config.spatial_position_emb else None,
        ordering=ordering if config.spatial_position_emb else None,
        conditioning_num_tokens=config.conditioning_num_tokens,
        conditioning_type=(
            config.conditioning_type if config.conditioning_num_tokens else "none"
        ),
        # the kernels are GSPMD-partitionable over (batch, head) via
        # custom_partitioning (ops/partitioning.py), so every mesh —
        # single device, DP, TP, DP×TP — keeps them active
        use_pallas_local=config.use_pallas_local_attn,
        use_pallas_favor=config.use_pallas_favor_attn,
        attn_compute_dtype=(
            jnp.bfloat16
            if config.attn_compute_dtype == "bfloat16"
            else jnp.float32
        ),
        dtype=dtype,
    )


def prepare_batch(latents: np.ndarray, ordering, vocab_size: int):
    """(B, H, W, D) int grids → (inputs, targets) (B, L) with BOS
    left-pad and next-token shift (reference prepare_batch,
    src/utils/transformer.py:239-282)."""
    b = latents.shape[0]
    flat = latents.reshape(b, -1)
    seq = flat[:, ordering.get_sequence_ordering()]
    bos = np.full((b, 1), vocab_size, seq.dtype)
    padded = np.concatenate([bos, seq], axis=1)
    return padded[:, :-1].astype(np.int32), padded[:, 1:].astype(np.int32)


def _make_datasets(config: TransformerConfig, logger):
    from synthanatomy_tpu.data.datasets import (
        LatentDataset,
        discover_subjects,
        load_conditionings,
    )

    def build(path):
        subjects = discover_subjects(path, extension=".npy")
        cond_values = None
        names = [os.path.basename(s["MRI"]) for s in subjects]
        if config.conditioning_path and config.conditionings:
            cond_values, vocab, kept = load_conditionings(
                config.conditioning_path, config.conditionings, names, logger=logger
            )
            subjects = [subjects[i] for i in kept]
        return LatentDataset(
            subjects,
            conditioning_values=cond_values,
            conditioning_names=config.conditionings or (),
        )

    return build(config.training_subjects), (
        build(config.validation_subjects) if config.validation_subjects else None
    )


def training(config: TransformerConfig) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.data.datasets import PrefetchLoader
    from synthanatomy_tpu.models.performer import redraw_projections
    from synthanatomy_tpu.parallel.mesh import (
        host_shard_info,
        make_data_mesh_for_batch,
        replicated,
        shard_batch,
    )
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train import schedulers as S
    from synthanatomy_tpu.train.logging import TBLogger
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_eval_step,
        make_transformer_train_step,
    )
    from synthanatomy_tpu.utils.general import basic_initialization, log_network_size

    logger, dirs, ckpt_path, starting_epoch, rng = basic_initialization(
        config, "transformer-training"
    )
    shard_id, num_shards = host_shard_info()
    train_ds, val_ds = _make_datasets(config, logger)
    if config.conditionings and train_ds.conditioning_num_tokens:
        object.__setattr__(
            config, "conditioning_num_tokens", train_ds.conditioning_num_tokens
        )

    train_loader = PrefetchLoader(
        train_ds, config.batch_size, shuffle=True, drop_last=True,
        num_workers=config.num_workers, prefetch=config.prefetch_factor,
        shard_id=shard_id, num_shards=num_shards, seed=config.seed,
        collate_keys=("latents",),
    )
    val_loader = (
        PrefetchLoader(
            val_ds, config.eval_batch_size, shuffle=False, drop_last=False,
            num_workers=config.num_workers, shard_id=shard_id,
            num_shards=num_shards, collate_keys=("latents",),
        )
        if val_ds
        else None
    )
    epoch_length = len(train_loader)

    # peek the latent grid shape from the data (run_transformer.py:54-56)
    first = next(iter(train_loader.epoch(0)))
    latent_shape = first["latents"].shape[1:4]
    object.__setattr__(config, "latent_shape", tuple(int(s) for s in latent_shape))
    logger.info(f"Latent shape: {latent_shape}")

    ordering = build_ordering(config, latent_shape)
    model = build_performer(config, ordering, latent_shape)
    seq_len = int(np.prod(latent_shape))

    conds0 = (
        [jnp.zeros((1,), jnp.int32) for _ in config.conditionings]
        if config.conditioning_num_tokens
        else None
    )
    state, tx = create_transformer_train_state(
        model, rng, seq_len, learning_rate=config.learning_rate,
        conditionings=conds0,
    )
    log_network_size(state.params, logger, "performer")
    if ckpt_path:
        state = C.load_checkpoint(ckpt_path, state)
        logger.info(f"Restored checkpoint from {ckpt_path}")

    sp_mode = config.sp_shards > 1
    pp_mode = config.pp_stages > 1
    if sp_mode or pp_mode:
        # sequence parallelism: ('data', 'seq') mesh — the token axis
        # shards over 'seq'.  Pipeline parallelism: ('data', 'pipe')
        # mesh — the DEPTH axis shards over 'pipe'.  Either way the
        # remaining devices form the data axis (shrunk to divide the
        # batch, like the DP default).
        from synthanatomy_tpu.parallel.mesh import make_mesh

        n_shards = config.sp_shards if sp_mode else config.pp_stages
        axis_name = "seq" if sp_mode else "pipe"
        n_dev = len(jax.devices())
        if n_dev % n_shards:
            raise ValueError(
                f"{'sp_shards' if sp_mode else 'pp_stages'}={n_shards} "
                f"must divide the device count {n_dev}"
            )
        if pp_mode and config.n_layers % n_shards:
            raise ValueError(
                f"pp_stages={n_shards} must divide n_layers="
                f"{config.n_layers} (contiguous equal stages)"
            )
        par_data = n_dev // n_shards
        while par_data > 1 and config.batch_size % par_data:
            par_data -= 1
        mesh = make_mesh((par_data, n_shards), ("data", axis_name))
    else:
        mesh = make_data_mesh_for_batch(config.batch_size, config.mesh_shape)
    model_size = mesh.shape.get("model", 1)
    pure_dp = model_size == 1 and not sp_mode and not pp_mode
    n_mesh_dev = int(np.prod(list(mesh.shape.values())))
    data_size = mesh.shape.get("data", n_mesh_dev // model_size)
    want_pallas = config.use_pallas_local_attn or config.use_pallas_favor_attn
    tp_manual = False
    donate = 0 if config.donate_state else ()
    if model_size > 1:
        from synthanatomy_tpu.parallel.tensor_parallel import (
            tp_step_compatible,
        )

        ok, why = tp_step_compatible(model, model_size)
        # pure-TP + kernels: prefer the manual Megatron shard_map step
        # (head-packed weights, f/g conjugate collectives, sharded
        # Adam — no partitioner in the loop).  Other meshes use GSPMD;
        # the Pallas kernels stay active there too via
        # custom_partitioning (ops/partitioning.py).
        tp_manual = want_pallas and data_size == 1 and ok
        if want_pallas and not tp_manual:
            logger.info(
                "manual TP step unavailable "
                f"({why or 'DP×TP mesh'}); using GSPMD TP "
                "(Pallas kernels partitioned over batch/heads)"
            )
    if sp_mode:
        # SP train step: params replicated, sequence sharded over
        # 'seq' (and batch over 'data' when it has size > 1); the
        # attention collectives (FAVOR prefix all_gather, local-window
        # ppermute halo) ride ICI.  Uses the XLA attention paths —
        # shard-local Pallas kernels under SP are future work.
        from synthanatomy_tpu.parallel.sequence_parallel import (
            make_sp_train_step,
        )

        if want_pallas:
            logger.info(
                "SP training uses the XLA attention paths (the Pallas "
                "flags apply to non-SP training and sampling)"
            )
        sp_step = make_sp_train_step(
            model, tx, mesh, seq_len,
            axis="seq",
            data_axis="data" if mesh.shape.get("data", 1) > 1 else None,
        )
        step_fn = jax.jit(
            lambda s, i, t, c, sched: sp_step(s, i, t, sched, c),
            donate_argnums=donate,
        )
        logger.info(
            f"sequence-parallel step: {mesh.shape.get('seq')} seq shards"
            + (
                f" × {mesh.shape.get('data')} data shards"
                if mesh.shape.get("data", 1) > 1
                else ""
            )
        )
    elif pp_mode:
        # GPipe pipeline-parallel step: depth sharded over 'pipe',
        # microbatches fill-drain through ppermute; params/moments
        # live in the packed stacked-block layout on device while
        # checkpoints stay canonical (pack after restore / unpack
        # before save — the TP contract).
        from synthanatomy_tpu.parallel.pipeline_parallel import (
            make_pp_train_step,
        )

        if want_pallas:
            logger.info(
                "PP training uses the XLA attention paths (the Pallas "
                "flags apply to non-PP training and sampling)"
            )
        # most microbatches that divide the batch, capped at 2×stages
        # (bubble fraction (P-1)/(M+P-1) shrinks with M; microbatches
        # smaller than that stop paying for their dispatch).  Each
        # microbatch additionally shards over 'data', so M must divide
        # batch // data (mb % data == 0)
        pp_data = mesh.shape.get("data", 1)
        base = config.batch_size // pp_data
        cap = min(base, 2 * config.pp_stages)
        pp_microbatches = next(
            m for m in range(cap, 0, -1) if base % m == 0
        )
        pp_step = make_pp_train_step(
            model, tx, mesh, axis="pipe",
            data_axis="data" if mesh.shape.get("data", 1) > 1 else None,
            n_microbatches=pp_microbatches,
        )
        step_fn = jax.jit(
            lambda s, i, t, c, sched: pp_step(s, i, t, sched, c),
            donate_argnums=donate,
        )
        logger.info(
            f"pipeline-parallel step: {config.pp_stages} stages × "
            f"{pp_microbatches} microbatches"
            + (
                f" × {mesh.shape.get('data')} data shards"
                if mesh.shape.get("data", 1) > 1
                else ""
            )
        )
    elif (
        pure_dp
        and n_mesh_dev > 1
        and want_pallas
        and not config.zero1
    ):
        # pure-DP multi-chip: per-device shard_map step (one kernel
        # instance per device, no partitioner in the loop) — tested
        # equal to the GSPMD step, which also keeps the kernels via
        # custom_partitioning.  NOT used with --zero1: the shard_map
        # specs declare the whole state replicated, which would
        # silently re-replicate the sharded Adam moments; the GSPMD
        # step below honors the ZeRO-1 sharding (and still runs the
        # kernels via custom_partitioning).
        from synthanatomy_tpu.train.transformer_steps import (
            make_transformer_train_step_dp,
        )

        step_fn = jax.jit(
            make_transformer_train_step_dp(model, tx, mesh),
            donate_argnums=donate,
        )
    elif tp_manual:
        from synthanatomy_tpu.parallel.tensor_parallel import (
            make_tp_train_step,
        )

        tp_step = make_tp_train_step(
            model, tx, mesh,
            # the two kernel families are independently flagged; an
            # explicit opt-out of one must not force it back on
            use_pallas_local=config.use_pallas_local_attn,
            use_pallas_favor=config.use_pallas_favor_attn,
        )
        step_fn = jax.jit(
            lambda s, i, t, c, sched: tp_step(s, i, t, sched, c),
            donate_argnums=donate,
        )
        logger.info(
            f"manual Megatron TP step over {model_size} model shards "
            f"(Pallas kernels per shard)"
        )
    else:
        step_fn = jax.jit(
            make_transformer_train_step(model, tx),
            donate_argnums=donate,
        )
    eval_fn = jax.jit(make_transformer_eval_step(model))
    tb_train = TBLogger(f"{dirs['logs_directory']}/train", enabled=config.rank == 0)
    tb_val = TBLogger(f"{dirs['logs_directory']}/val_eval", enabled=config.rank == 0)

    gamma = config.gamma
    if gamma == "auto":
        gamma = S.get_gamma(config.learning_rate, config.epochs, epoch_length)

    # ---- state placement on the mesh ---------------------------------
    # pure DP: replicated (grads psum).  GSPMD TP: params + Adam
    # moments Megatron-sharded over 'model' (the previous replicated
    # put silently wasted the model axis).  Manual TP: head-packed
    # params/moments placed with the shard_map step's specs.
    if tp_manual:
        from jax.sharding import NamedSharding, PartitionSpec

        from synthanatomy_tpu.parallel.sharding_rules import opt_state_shardings
        from synthanatomy_tpu.parallel.tensor_parallel import (
            pack_tp_state,
            tp_param_specs,
            unpack_tp_params,
            unpack_tp_state,
        )

        state = pack_tp_state(model, state, model_size)
        pshard = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            tp_param_specs(state.params),
            is_leaf=lambda x: isinstance(x, PartitionSpec),
        )
        state = state.replace(
            params=jax.device_put(state.params, pshard),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_shardings(mesh, tx, state.opt_state, pshard),
            ),
            favor=jax.device_put(state.favor, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)),
            rng=jax.device_put(state.rng, replicated(mesh)),
        )
        _unpack_params = jax.jit(
            lambda p: unpack_tp_params(model, p, model_size)
        )
        _unpack_state = jax.jit(
            lambda s: unpack_tp_state(model, s, model_size)
        )

        def canonicalize(s):
            """Device → host state in the canonical (checkpoint) head
            layout (permutation runs jitted on device, not eagerly)."""
            return jax.device_get(_unpack_state(s))

        def eval_view(s):
            return s.replace(params=_unpack_params(s.params))

    elif pp_mode:
        from jax.sharding import NamedSharding, PartitionSpec

        from synthanatomy_tpu.parallel.pipeline_parallel import (
            pack_pp_state,
            pp_param_specs,
            unpack_pp_state,
            unpack_pp_tree,
        )
        from synthanatomy_tpu.parallel.sharding_rules import opt_state_shardings

        state = pack_pp_state(model, state)

        def _named(spec_tree):
            return jax.tree.map(
                lambda s: NamedSharding(mesh, s), spec_tree,
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            )

        pshard = _named(pp_param_specs(state.params))
        state = state.replace(
            params=jax.device_put(state.params, pshard),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_shardings(mesh, tx, state.opt_state, pshard),
            ),
            favor=jax.device_put(
                state.favor, _named(pp_param_specs(state.favor))
            ),
            step=jax.device_put(state.step, replicated(mesh)),
            rng=jax.device_put(state.rng, replicated(mesh)),
        )
        _unpack_state = jax.jit(lambda s: unpack_pp_state(model, s))
        _unpack_params = jax.jit(lambda p: unpack_pp_tree(model, p))
        _unpack_favor = jax.jit(lambda f: unpack_pp_tree(model, f))

        def canonicalize(s):
            """Device → host state in the canonical per-block layout
            (unstack runs jitted on device, not eagerly)."""
            return jax.device_get(_unpack_state(s))

        def eval_view(s):
            return s.replace(
                params=_unpack_params(s.params),
                favor=_unpack_favor(s.favor),
            )

    elif model_size > 1:
        from synthanatomy_tpu.parallel.sharding_rules import (
            shard_transformer_state,
        )

        state = shard_transformer_state(mesh, tx, state)
        canonicalize = jax.device_get
        eval_view = lambda s: s  # noqa: E731
    else:
        # pure DP and SP: params replicated
        state = jax.device_put(state, replicated(mesh))
        if config.zero1 and n_mesh_dev > 1:
            from synthanatomy_tpu.parallel.sharding_rules import (
                shard_opt_state_zero1,
            )

            state = state.replace(
                opt_state=shard_opt_state_zero1(mesh, state.opt_state)
            )
            logger.info(f"ZeRO-1: Adam moments sharded over {n_mesh_dev} devices")
        canonicalize = jax.device_get
        eval_view = lambda s: s  # noqa: E731
    # the redraw runs JITTED: the paper config redraws every step
    # (--feature_redraw_interval=1), and the eager per-leaf ORF QRs
    # would serialize training through the device tunnel
    if pp_mode:
        from synthanatomy_tpu.parallel.pipeline_parallel import pack_pp_tree

        _favor_shard = _named(pp_param_specs(state.favor))
        # redraw walks the CANONICAL per-block favor tree (the packed
        # (L, m, d) leaves would get one shared matrix of the wrong
        # shape); unpack → redraw → re-pack is one compiled program
        _redraw = jax.jit(
            lambda f, sub: pack_pp_tree(
                model,
                redraw_projections(
                    {"favor": unpack_pp_tree(model, f)}, sub
                )["favor"],
            ),
            out_shardings=_favor_shard,
        )

        def redraw_state(s, sub):
            return s.replace(favor=_redraw(s.favor, sub))

    else:
        _redraw = jax.jit(
            lambda f, sub: redraw_projections({"favor": f}, sub)["favor"]
        )

        def redraw_state(s, sub):
            return s.replace(favor=_redraw(s.favor, sub))

    history: List[Dict[str, float]] = []
    best_metric = np.inf
    redraw_key = jax.random.key(config.seed + 1234)
    steps_since_redraw = 0
    from synthanatomy_tpu.utils.general import PreemptionGuard
    from synthanatomy_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler()
    global_step = 0
    guard = PreemptionGuard(logger)

    with jax.set_mesh(mesh):
        for epoch in range(max(starting_epoch, 0), config.epochs):
            t0 = time.time()
            lr = config.learning_rate * float(gamma) ** (epoch * epoch_length)
            epoch_loss, n_it = 0.0, 0
            for batch in train_loader.epoch(epoch):
                inputs, targets = prepare_batch(
                    batch["latents"], ordering, config.vocab_size
                )
                conds = (
                    [jnp.asarray(c) for c in batch["conditionings"]]
                    if "conditionings" in batch
                    else None
                )
                xi = shard_batch(mesh, inputs)
                xt = shard_batch(mesh, targets)
                with profiler.step(global_step):
                    state, metrics = step_fn(state, xi, xt, conds, {"lr": lr})
                global_step += 1
                # accumulate on device — a float() here would sync the
                # host to every step and serialize dispatch
                epoch_loss = epoch_loss + metrics["Loss"]
                n_it += 1
                steps_since_redraw += 1
                if (
                    config.feature_redraw_interval
                    and steps_since_redraw >= config.feature_redraw_interval
                ):
                    redraw_key, sub = jax.random.split(redraw_key)
                    state = redraw_state(state, sub)
                    steps_since_redraw = 0

            epoch_loss = float(epoch_loss) / max(n_it, 1)
            history.append({"Loss": epoch_loss})
            if (epoch + 1) % config.log_every == 0 and config.rank == 0:
                tb_train.scalars({"Loss-CE": epoch_loss, "lr": lr}, epoch + 1)
                logger.info(
                    f"epoch {epoch + 1}/{config.epochs} CE={epoch_loss:.4f} "
                    f"({time.time() - t0:.1f}s)"
                )

            if (epoch + 1) % config.checkpoint_every == 0 or guard.should_stop:
                C.save_checkpoint(
                    dirs["checkpoint_directory"], canonicalize(state), epoch + 1
                )
            if guard.should_stop:
                logger.warning(f"preempted: checkpointed at epoch {epoch + 1}")
                break

            if val_loader and (epoch + 1) % config.eval_every == 0:
                vlosses = []
                estate = eval_view(state)
                for batch in val_loader.epoch(epoch):
                    inputs, targets = prepare_batch(
                        batch["latents"], ordering, config.vocab_size
                    )
                    # pure-DP meshes: shard the eval batch instead of
                    # computing it replicated on every device; uneven
                    # tails (drop_last=False) stay replicated — exact
                    # either way
                    shard_eval = (
                        pure_dp
                        and n_mesh_dev > 1
                        and inputs.shape[0] % n_mesh_dev == 0
                    )
                    conds = (
                        [
                            shard_batch(mesh, np.asarray(c))
                            if shard_eval
                            else jnp.asarray(c)
                            for c in batch["conditionings"]
                        ]
                        if "conditionings" in batch
                        else None
                    )
                    if shard_eval:
                        xi_e = shard_batch(mesh, np.asarray(inputs))
                        xt_e = shard_batch(mesh, np.asarray(targets))
                    else:
                        xi_e = jnp.asarray(inputs)
                        xt_e = jnp.asarray(targets)
                    _, m = eval_fn(estate, xi_e, xt_e, conds)
                    # keep the scalar on device; ONE host transfer per
                    # epoch (per-scalar np.asarray would pay the
                    # tunnel's ~3 ms dispatch floor N times)
                    vlosses.append(m["Loss"])
                val_ce = float(np.asarray(jnp.stack(vlosses)).mean())
                # surface the eval CE to callers (tools/quality_loop.py
                # trains the prior to a CE threshold off this)
                if history:
                    history[-1]["val_Loss"] = val_ce
                if config.rank == 0:
                    tb_val.scalars({"Loss-CE": val_ce}, epoch + 1)
                    logger.info(f"eval @ {epoch + 1}: CE={val_ce:.4f}")
                if val_ce < best_metric:
                    best_metric = val_ce
                    C.save_best_checkpoint(
                        dirs["checkpoint_directory"], canonicalize(state), -val_ce
                    )

    profiler.close()
    host_state = canonicalize(state)
    # after a preemption the loop broke at some epoch E < config.epochs;
    # writing the final checkpoint_epoch=config.epochs name here would
    # make auto-resume (starting_epoch=-1 → max epoch) believe training
    # already completed and silently skip the remaining epochs
    if not guard.should_stop:
        C.save_checkpoint(dirs["checkpoint_directory"], host_state, config.epochs)
        if config.rank == 0:
            # the reference's end-of-training raw artifact
            # (run_transformer.py:290-292): one-file torch state dict
            from synthanatomy_tpu.interop import (
                export_performer_state_dict,
                save_raw_state_dict,
            )

            try:
                out = save_raw_state_dict(
                    os.path.join(
                        dirs["checkpoint_directory"],
                        f"model_state_dict_epoch={config.epochs}",
                    ),
                    export_performer_state_dict(
                        host_state.params, depth=config.n_layers,
                        favor=host_state.favor,
                    ),
                )
                logger.info(f"wrote raw state dict {out}")
            except Exception as exc:  # ScaleNorm / TP-packed params have
                # no reference form; the orbax checkpoint stays durable
                logger.warning(f"raw state-dict export skipped: {exc}")
    tb_train.close()
    tb_val.close()
    return {"state": host_state, "history": history, "dirs": dirs, "ordering": ordering}


def inference(config: TransformerConfig) -> Dict[str, Any]:
    """Sampling mode: BOS-seeded batches → latent grids →
    ``*_sample.npy`` uint16 (run_transformer.py:296-402)."""
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.data.datasets import PrefetchLoader
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import create_transformer_train_state
    from synthanatomy_tpu.utils.general import basic_initialization

    logger, dirs, ckpt_path, _, rng = basic_initialization(
        config, "transformer-inference"
    )
    if config.sp_shards > 1 or config.pp_stages > 1:
        # sampling is sequential per token; its scale-out lever is the
        # DP sampler (one fused-kernel instance per chip)
        logger.warning(
            "--sp_shards/--pp_stages are training-only flags; "
            "inference ignores them (sampling scales out data-parallel)"
        )
    train_ds, _ = _make_datasets(config, logger)
    if config.conditionings and train_ds.conditioning_num_tokens:
        object.__setattr__(
            config, "conditioning_num_tokens", train_ds.conditioning_num_tokens
        )
    loader = PrefetchLoader(
        train_ds, config.eval_batch_size, shuffle=False, drop_last=False,
        num_workers=config.num_workers, collate_keys=("latents",),
    )
    first = next(iter(loader.epoch(0)))
    latent_shape = first["latents"].shape[1:4]
    ordering = build_ordering(config, latent_shape)
    model = build_performer(config, ordering, latent_shape)
    seq_len = int(np.prod(latent_shape))

    conds0 = (
        [jnp.zeros((1,), jnp.int32) for _ in config.conditionings]
        if config.conditioning_num_tokens
        else None
    )
    # with a checkpoint to restore, skip the real init entirely: an
    # eval_shape skeleton is a valid orbax restore target and avoids
    # minutes of discarded host-CPU QR factorizations
    state, _ = create_transformer_train_state(
        model, rng, seq_len, conditionings=conds0, abstract=bool(ckpt_path)
    )
    if ckpt_path:
        state = C.load_checkpoint(ckpt_path, state)
        if any(
            isinstance(leaf, jax.ShapeDtypeStruct)
            for leaf in jax.tree.leaves(state)
        ):
            raise ValueError(
                f"checkpoint {ckpt_path} did not cover the full state"
            )
        logger.info(f"Loaded checkpoint {ckpt_path}")
    variables = {"params": state.params, "favor": state.favor}

    n_dev = jax.device_count()
    use_dp_sampler = n_dev > 1 and config.eval_batch_size % n_dev == 0
    # stage the restored (host-resident, committed) checkpoint onto the
    # accelerator(s): jit compiles for the committed device of its
    # inputs, so without this the whole sampler would lower for CPU
    if use_dp_sampler:
        from jax.sharding import NamedSharding, PartitionSpec
        from jax.sharding import Mesh as _Mesh

        _m = _Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))
        variables = jax.device_put(
            variables, NamedSharding(_m, PartitionSpec())
        )
    else:
        variables = jax.device_put(variables, jax.devices()[0])
    if use_dp_sampler:
        # multi-chip serving: one fused-decode program per device under
        # shard_map (batch sharded, N× aggregate throughput)
        from jax.sharding import Mesh

        from synthanatomy_tpu.models.sampling import make_dp_sampler

        dp_mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))
        sampler = make_dp_sampler(
            model, ordering, dp_mesh,
            global_batch=config.eval_batch_size,
            temperature=config.temperature,
            top_k=config.top_k,
            do_sample=config.sample,
            with_conditionings=config.conditioning_num_tokens is not None,
            ring_quant=config.use_int8_rings,
        )
        logger.info(f"DP sampler over {n_dev} devices")
    else:
        # the reference inferer object (src/inferer/transformer.py:32-71)
        # wrapping the compiled KV-cached sampler
        from synthanatomy_tpu.inferers import TransformerInferenceInferer

        sampler = TransformerInferenceInferer(
            model, ordering,
            batch=config.eval_batch_size,
            temperature=config.temperature,
            top_k=config.top_k,
            sample=config.sample,
            with_conditionings=config.conditioning_num_tokens is not None,
            ring_quant=config.use_int8_rings,
        )

    written: List[str] = []
    key = jax.random.key(config.seed)
    for bi, batch in enumerate(loader.epoch(0)):
        n_real = batch["latents"].shape[0]
        # pad the tail batch so the compiled sampler's static batch is
        # kept (extra samples are discarded)
        if n_real < config.eval_batch_size:
            reps = config.eval_batch_size - n_real
            if "conditionings" in batch:
                batch["conditionings"] = [
                    np.concatenate([c, np.repeat(c[-1:], reps, axis=0)])
                    for c in batch["conditionings"]
                ]
        key, sub = jax.random.split(key)
        if config.conditioning_num_tokens is not None:
            conds = [jnp.asarray(c) for c in batch["conditionings"]]
            grids = sampler(variables, sub, conds)
        else:
            grids = sampler(variables, sub)
        grids = np.asarray(jax.device_get(grids)).astype(np.uint16)
        for b, src in enumerate(batch["paths"][:n_real]):
            base = os.path.basename(src).replace(".npy", "")
            out = f"{dirs['outputs_directory']}/{base}_sample.npy"
            np.save(out, grids[b])
            written.append(out)
    logger.info(f"Wrote {len(written)} samples to {dirs['outputs_directory']}")
    return {"written": written, "dirs": dirs}
