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
