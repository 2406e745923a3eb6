"""Golden parity: a torch model with the reference's exact topology
(baseline.py:150-299) → converted weights → the flax model must
reproduce its outputs (and codebook indices) to float tolerance.
This is the released-checkpoint compatibility guarantee."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from synthanatomy_tpu.models.discriminator import BaselineDiscriminator  # noqa: E402
from synthanatomy_tpu.models.vqvae import BaselineVQVAE  # noqa: E402
from tools.convert_checkpoint import (  # noqa: E402
    convert_discriminator_state_dict,
    convert_vqvae_state_dict,
)

N_LEVELS = 2
N_RES = 2
N_CH = 8
EMBED_DIM = 4
N_EMBED = 16


class TorchResidualLayer(nn.Sequential):
    # reference baseline.py:150-160
    def __init__(self, n_channels, n_res_channels):
        super().__init__(
            nn.Conv3d(n_channels, n_res_channels, kernel_size=3, padding=1),
            nn.ReLU(True),
            nn.Dropout3d(0.0),
            nn.Conv3d(n_res_channels, n_channels, kernel_size=1),
        )

    def forward(self, x):
        return torch.relu(x + super().forward(x))


def build_torch_vqvae():
    """Encoder/decoder Sequentials with the reference's module indices
    (construct_encoder baseline.py:213-246, construct_decoder :257-299)."""
    enc = []
    for i in range(N_LEVELS):
        ch = N_CH // (1 if i == N_LEVELS - 1 else 2)
        in_ch = 1 if i == 0 else N_CH // 2
        enc += [
            nn.Conv3d(in_ch, ch, 4, stride=2, padding=1, dilation=1),
            nn.ReLU(),
            nn.Sequential(*[TorchResidualLayer(ch, ch) for _ in range(N_RES)]),
        ]
    enc.append(nn.Conv3d(N_CH, EMBED_DIM, 3, stride=1, padding=1))

    dec = [nn.Conv3d(EMBED_DIM, N_CH, 3, stride=1, padding=1)]
    for i in range(N_LEVELS):
        ch = N_CH // (1 if i == 0 else 2)
        last = i == N_LEVELS - 1
        dec.append(nn.Sequential(*[TorchResidualLayer(ch, ch) for _ in range(N_RES)]))
        dec.append(
            nn.ConvTranspose3d(
                ch, 1 if last else N_CH // 2, 4, stride=2, padding=1,
                output_padding=0, dilation=1,
            )
        )
        if not last:
            dec.append(nn.ReLU())

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.ModuleList([nn.Sequential(*enc)])
            self.decoder = nn.ModuleList([nn.Sequential(*dec)])
            self.q_embedding = nn.Embedding(N_EMBED, EMBED_DIM)

    return M()


def _flax_model():
    return BaselineVQVAE(
        n_levels=N_LEVELS,
        downsample_parameters=((4, 2, 1, 1),) * N_LEVELS,
        upsample_parameters=((4, 2, 1, 0, 1),) * N_LEVELS,
        n_embed=N_EMBED, embed_dim=EMBED_DIM, n_channels=N_CH,
        n_res_channels=N_CH, n_res_layers=N_RES, dtype=jnp.float32,
        use_pallas_vq=False,
    )


def test_vqvae_conversion_reproduces_torch_outputs():
    torch.manual_seed(0)
    tm = build_torch_vqvae().eval()

    sd = {f"encoder.0.{k}": v for k, v in tm.encoder[0].state_dict().items()}
    sd.update({f"decoder.0.{k}": v for k, v in tm.decoder[0].state_dict().items()})
    sd["quantizer.0.impl.embedding.weight"] = tm.q_embedding.weight
    sd["quantizer.0.impl.N"] = torch.zeros(N_EMBED)
    sd["quantizer.0.impl.embed_avg"] = tm.q_embedding.weight.clone()
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, vq = convert_vqvae_state_dict(sd, n_levels=N_LEVELS, n_res_layers=N_RES)

    model = _flax_model()
    x_np = np.random.default_rng(0).uniform(size=(1, 16, 16, 16, 1)).astype(np.float32)

    # structure check: converted tree must match an init tree exactly
    ref_vars = model.init(jax.random.key(0), jnp.asarray(x_np))
    ref_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert got_paths == ref_paths, (
        f"missing: {ref_paths - got_paths}; extra: {got_paths - ref_paths}"
    )

    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "vq": jax.tree.map(jnp.asarray, vq),
    }

    # ---- encoder parity
    with torch.no_grad():
        t_enc = tm.encoder[0](torch.tensor(x_np).permute(0, 4, 1, 2, 3))
    f_enc = model.apply(variables, jnp.asarray(x_np), method=model.encode)[0]
    np.testing.assert_allclose(
        np.asarray(f_enc),
        t_enc.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )

    # ---- codebook-index exactness
    flat = t_enc.permute(0, 2, 3, 4, 1).reshape(-1, EMBED_DIM)
    w = tm.q_embedding.weight
    with torch.no_grad():
        dist = (
            (flat**2).sum(1, keepdim=True)
            - 2 * flat @ w.t()
            + (w**2).sum(1)[None, :]
        )
        t_idx = dist.argmin(1).reshape(1, 4, 4, 4).numpy()
    f_idx = np.asarray(
        model.apply(variables, jnp.asarray(x_np), method=model.index_quantize)[0]
    )
    np.testing.assert_array_equal(f_idx, t_idx)

    # ---- decoder parity (through embed + decode)
    with torch.no_grad():
        codes = tm.q_embedding(torch.tensor(t_idx)).permute(0, 4, 1, 2, 3)
        t_out = tm.decoder[0](codes)
    f_out = model.apply(variables, [jnp.asarray(t_idx)], method=model.decode_samples)
    np.testing.assert_allclose(
        np.asarray(f_out),
        t_out.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_discriminator_conversion_reproduces_torch_outputs():
    torch.manual_seed(1)
    ndf, n_layers = 8, 3
    seq = [nn.Conv3d(1, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        prev, nf = nf, min(2**n, 8)
        seq += [
            nn.Conv3d(ndf * prev, ndf * nf, 4, 2, 1, bias=False),
            nn.BatchNorm3d(ndf * nf),
            nn.LeakyReLU(0.2, True),
        ]
    prev, nf = nf, min(2**n_layers, 8)
    seq += [
        nn.Conv3d(ndf * prev, ndf * nf, 4, 1, 1, bias=False),
        nn.BatchNorm3d(ndf * nf),
        nn.LeakyReLU(0.2, True),
        nn.Conv3d(ndf * nf, 1, 4, 1, 1),
    ]
    tm = nn.Sequential(*seq).eval()

    sd = {f"main.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = convert_discriminator_state_dict(sd, n_layers=n_layers)

    d = BaselineDiscriminator(ndf=ndf, n_layers=n_layers, dtype=jnp.float32)
    x_np = np.random.default_rng(1).uniform(size=(1, 32, 32, 32, 1)).astype(np.float32)
    ref_vars = d.init(jax.random.key(0), jnp.asarray(x_np), training=False)
    # structural match
    assert set(params) == set(ref_vars["params"])

    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
    }
    with torch.no_grad():
        t_out = tm(torch.tensor(x_np).permute(0, 4, 1, 2, 3))
    f_out = d.apply(variables, jnp.asarray(x_np), training=False)
    np.testing.assert_allclose(
        np.asarray(f_out),
        t_out.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-3, atol=1e-4,
    )


def test_vqvae_export_roundtrip():
    """flax → torch state dict (export_checkpoint) → flax reproduces
    the identical tree: the back-conversion is the exact inverse."""
    from tools.export_checkpoint import export_vqvae_state_dict

    torch.manual_seed(1)
    tm = build_torch_vqvae().eval()
    sd = {f"encoder.0.{k}": v for k, v in tm.encoder[0].state_dict().items()}
    sd.update({f"decoder.0.{k}": v for k, v in tm.decoder[0].state_dict().items()})
    sd["quantizer.0.impl.embedding.weight"] = tm.q_embedding.weight
    sd["quantizer.0.impl.N"] = torch.zeros(N_EMBED)
    sd["quantizer.0.impl.embed_avg"] = tm.q_embedding.weight.clone()
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, vq = convert_vqvae_state_dict(sd, n_levels=N_LEVELS, n_res_layers=N_RES)
    sd_back = export_vqvae_state_dict(
        params, vq, n_levels=N_LEVELS, n_res_layers=N_RES
    )
    assert set(sd_back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd_back[k], sd[k])

    params2, vq2 = convert_vqvae_state_dict(
        sd_back, n_levels=N_LEVELS, n_res_layers=N_RES
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(vq["level_0"].codebook), np.asarray(vq2["level_0"].codebook)
    )


def test_discriminator_export_roundtrip():
    from tools.export_checkpoint import export_discriminator_state_dict

    torch.manual_seed(2)
    ndf, n_layers = 8, 3
    seq = [nn.Conv3d(1, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        prev, nf = nf, min(2**n, 8)
        seq += [
            nn.Conv3d(ndf * prev, ndf * nf, 4, 2, 1, bias=False),
            nn.BatchNorm3d(ndf * nf),
            nn.LeakyReLU(0.2, True),
        ]
    prev, nf = nf, min(2**n_layers, 8)
    seq += [
        nn.Conv3d(ndf * prev, ndf * nf, 4, 1, 1, bias=False),
        nn.BatchNorm3d(ndf * nf),
        nn.LeakyReLU(0.2, True),
        nn.Conv3d(ndf * nf, 1, 4, 1, 1),
    ]
    tm = nn.Sequential(*seq).eval()
    sd = {f"main.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params, bs = convert_discriminator_state_dict(sd, n_layers=n_layers)
    sd_back = export_discriminator_state_dict(params, bs, n_layers=n_layers)
    assert set(sd_back) == {
        k for k in sd if "num_batches_tracked" not in k
    }
    for k in sd_back:
        np.testing.assert_array_equal(sd_back[k], sd[k])


def test_vqvae_export_from_orbax_dir(tmp_path):
    """The export CLI's orbax path: a saved VQ-VAE train checkpoint
    (g_params + vq collection, raw-restored as dicts) exports to the
    reference layout whose back-conversion reproduces the codebook and
    conv kernels exactly."""
    import os

    import jax.numpy as jnp

    from synthanatomy_tpu.models.vqvae import BaselineVQVAE
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from tools.export_checkpoint import _load_source, export_vqvae_state_dict
    from synthanatomy_tpu.ops.vq import VQState

    model = BaselineVQVAE(
        n_levels=N_LEVELS,
        downsample_parameters=((4, 2, 1, 1),) * N_LEVELS,
        upsample_parameters=((4, 2, 1, 0, 1),) * N_LEVELS,
        n_embed=N_EMBED, embed_dim=EMBED_DIM, n_channels=N_CH,
        n_res_channels=N_CH, n_res_layers=N_RES, dtype=jnp.float32,
        use_pallas_vq=False,
    )
    state, _, _ = create_vqvae_train_state(model, jax.random.key(2), (16, 16, 16))
    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir)
    path = C.save_checkpoint(ckdir, state, 1)

    params, aux, _ = _load_source(path, "vqvae")
    # raw orbax restore yields plain dicts for the VQState dataclass
    lv = aux["level_0"]
    if not hasattr(lv, "codebook"):
        aux = {"level_0": VQState(
            codebook=lv["codebook"], cluster_size=lv["cluster_size"],
            embed_avg=lv["embed_avg"],
        )}
    sd = export_vqvae_state_dict(
        params, aux, n_levels=N_LEVELS, n_res_layers=N_RES
    )
    params2, vq2 = convert_vqvae_state_dict(
        sd, n_levels=N_LEVELS, n_res_layers=N_RES
    )
    np.testing.assert_array_equal(
        np.asarray(state.vq["level_0"].codebook),
        np.asarray(vq2["level_0"].codebook),
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params2)[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(state.g_params))[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7,
            err_msg=jax.tree_util.keystr(pa),
        )
