import jax
import jax.numpy as jnp
import numpy as np

from synthanatomy_tpu.models.ordering import Ordering
from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.models.vqvae import BaselineVQVAE
from synthanatomy_tpu.pipeline import make_synthesizer


def test_fused_synthesis_pipeline():
    """One compiled program: AR sample → embed → decode; latents stay
    valid codebook indices and volumes have the upsampled geometry."""
    ordering = Ordering("hilbert", 3, (3, 3, 3))
    performer = Performer(
        num_tokens=17, max_seq_len=28, dim=16, depth=1, heads=2, dim_head=8,
        nb_features=128, dtype=jnp.float32, scan_chunk=8,
    )
    vqvae = BaselineVQVAE(
        n_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        n_embed=16, embed_dim=4, n_channels=8, n_res_channels=8,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )
    p_vars = performer.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)},
        jnp.zeros((1, 27), jnp.int32),
    )
    v_vars = vqvae.init(jax.random.key(2), jnp.zeros((1, 12, 12, 12, 1)))

    synth = make_synthesizer(
        performer, vqvae, ordering, batch=2, temperature=1.0, top_k=8
    )
    volumes, grids = synth(p_vars, v_vars, jax.random.key(3))
    assert grids.shape == (2, 3, 3, 3)
    assert int(jnp.max(grids)) < 16  # valid codebook indices, no BOS
    assert volumes.shape == (2, 12, 12, 12, 1)
    assert np.isfinite(np.asarray(volumes, np.float32)).all()

    # different rng → different volumes (stochastic sampling)
    volumes2, _ = synth(p_vars, v_vars, jax.random.key(4))
    assert not np.allclose(
        np.asarray(volumes, np.float32), np.asarray(volumes2, np.float32)
    )


def test_synthesize_cli(tmp_path):
    """tools/synthesize.py loads both checkpoints and writes NIfTI
    volumes + latents in one command."""
    import os

    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from tools.synthesize import run as synth_run

    net_flags = dict(
        vocab_size=16, n_embd=16, n_layers=1, n_head=2, dim_head=8,
        nb_features=128, compute_dtype="float32",
        no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=8, no_res_layers=1,
        num_embeddings=(16,), embedding_dim=(4,), use_pallas_vq=False,
    )

    # fabricate checkpoints in the expected layout
    from synthanatomy_tpu.config import TransformerConfig, VQVAEConfig
    from synthanatomy_tpu.runners.transformer import build_ordering, build_performer
    from synthanatomy_tpu.runners.vqvae import build_vqvae

    t_cfg = TransformerConfig(
        **{k: v for k, v in net_flags.items()
           if k in TransformerConfig.__dataclass_fields__}
    )
    v_cfg = VQVAEConfig(
        mode="decoding", adversarial_component=False,
        **{k: v for k, v in net_flags.items()
           if k in VQVAEConfig.__dataclass_fields__},
    )
    ordering = build_ordering(t_cfg, (3, 3, 3))
    performer = build_performer(t_cfg, ordering, (3, 3, 3))
    vqvae = build_vqvae(v_cfg)
    t_state, _ = create_transformer_train_state(performer, jax.random.key(0), 27)
    v_state, _, _ = create_vqvae_train_state(vqvae, jax.random.key(1), (12, 12, 12))
    t_dir = tmp_path / "exp" / "performer" / "checkpoints"
    v_dir = tmp_path / "exp" / "baseline_vqvae" / "checkpoints"
    os.makedirs(t_dir); os.makedirs(v_dir)
    C.save_checkpoint(str(t_dir), t_state, 1)
    C.save_checkpoint(str(v_dir), v_state, 1)

    out_dir = str(tmp_path / "synth")
    written = synth_run(
        project_directory=str(tmp_path), experiment_name="exp",
        output_directory=out_dir, latent_shape=(3, 3, 3),
        num_volumes=3, batch_size=2, top_k=8, **net_flags,
    )
    assert len(written) == 3
    from synthanatomy_tpu.data.nifti import load_nifti

    img = load_nifti(written[0], as_closest_canonical=False)
    assert img.data.shape == (12, 12, 12)
    assert os.path.exists(os.path.join(out_dir, "synth_0000_latents.npy"))
    lat = np.load(os.path.join(out_dir, "synth_0000_latents.npy"))
    assert lat.dtype == np.uint16 and lat.shape == (3, 3, 3)


def test_synthesize_cli_conditioned(tmp_path):
    """--conditioning_values drives a conditioned prior through the
    one-command synthesizer (the released paper priors are
    conditioned, reference performer.py:252-264)."""
    import os

    from synthanatomy_tpu.config import TransformerConfig, VQVAEConfig
    from synthanatomy_tpu.runners.transformer import (
        build_ordering,
        build_performer,
    )
    from synthanatomy_tpu.runners.vqvae import build_vqvae
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from tools.synthesize import run as synth_run

    net_flags = dict(
        vocab_size=16, n_embd=16, n_layers=1, n_head=2, dim_head=8,
        nb_features=128, compute_dtype="float32",
        conditioning_num_tokens=(5,),
        no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=8, no_res_layers=1,
        num_embeddings=(16,), embedding_dim=(4,), use_pallas_vq=False,
    )
    t_cfg = TransformerConfig(
        **{k: v for k, v in net_flags.items()
           if k in TransformerConfig.__dataclass_fields__}
    )
    v_cfg = VQVAEConfig(
        mode="decoding", adversarial_component=False,
        **{k: v for k, v in net_flags.items()
           if k in VQVAEConfig.__dataclass_fields__},
    )
    ordering = build_ordering(t_cfg, (3, 3, 3))
    performer = build_performer(t_cfg, ordering, (3, 3, 3))
    vqvae = build_vqvae(v_cfg)
    t_state, _ = create_transformer_train_state(
        performer, jax.random.key(0), 27,
        conditionings=[jnp.zeros((1,), jnp.int32)],
    )
    v_state, _, _ = create_vqvae_train_state(vqvae, jax.random.key(1), (12, 12, 12))
    t_dir = tmp_path / "exp" / "performer" / "checkpoints"
    v_dir = tmp_path / "exp" / "baseline_vqvae" / "checkpoints"
    os.makedirs(t_dir); os.makedirs(v_dir)
    C.save_checkpoint(str(t_dir), t_state, 1)
    C.save_checkpoint(str(v_dir), v_state, 1)

    out_dir = str(tmp_path / "synth")
    written = synth_run(
        project_directory=str(tmp_path), experiment_name="exp",
        output_directory=out_dir, latent_shape=(3, 3, 3),
        num_volumes=2, batch_size=2, top_k=8,
        conditioning_values=(2,), **net_flags,
    )
    assert len(written) == 2

    # wrong arity is a loud error, not a silent unconditioned run
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conditioning_values"):
        synth_run(
            project_directory=str(tmp_path), experiment_name="exp",
            output_directory=out_dir, latent_shape=(3, 3, 3),
            num_volumes=2, batch_size=2,
            conditioning_values=(2, 3), **net_flags,
        )

    # OMITTING the values for a conditioned prior is also a loud error
    # (unconditioned sampling from a bos_replacement-trained model is
    # silently out-of-distribution)
    with _pytest.raises(ValueError, match="conditioning_num_tokens"):
        synth_run(
            project_directory=str(tmp_path), experiment_name="exp",
            output_directory=out_dir, latent_shape=(3, 3, 3),
            num_volumes=2, batch_size=2, **net_flags,
        )
