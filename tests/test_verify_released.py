"""End-to-end smoke test of tools/verify_released.py: build the actual
reference torch BaselineVQVAE (from the read-only reference checkout),
save a randomly-initialised checkpoint, and demand the harness reports
codebook-index-exact PASS after conversion.  This proves the harness
works; pointing it at the released .pt files is then one command."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available",
)

TINY = dict(
    n_levels=2,
    downsample_parameters=((4, 2, 1, 1),) * 2,
    upsample_parameters=((4, 2, 1, 0, 1),) * 2,
    n_embed=32,
    embed_dim=8,
    n_channels=16,
    n_res_channels=16,
    n_res_layers=2,
)
TINY_ROI = ((0, 16), (0, 16), (0, 16))


def test_verify_vqvae_harness_roundtrip(tmp_path, monkeypatch):
    import tools.verify_released as vr

    monkeypatch.setattr(vr, "PAPER_VQVAE", TINY)
    monkeypatch.setattr(vr, "PAPER_ROI", TINY_ROI)
    # shrink the synthetic volume too
    monkeypatch.setattr(
        vr, "_load_volume",
        lambda p: np.random.default_rng(0).uniform(size=(16, 16, 16)).astype(np.float32),
    )

    TorchVQVAE = vr._import_reference(REFERENCE)
    tmodel = TorchVQVAE(**TINY)
    # spread the codebook so argmin margins are far above fp noise —
    # random-init codes can near-tie and flip under torch-vs-XLA
    # accumulation order, which trained codebooks (the real use of the
    # harness) don't do
    with torch.no_grad():
        w = tmodel.quantizer[0].impl.embedding.weight
        w.mul_(8.0)
        tmodel.quantizer[0].impl.embed_avg.copy_(w)
    pt = str(tmp_path / "tiny_vqvae.pt")
    torch.save(tmodel.state_dict(), pt)

    row = vr.verify_vqvae(pt, REFERENCE)
    assert row["status"] == "PASS", row


def test_detect_performer_form():
    """The released priors carry the paper flags (ReZero + learned
    spatial tables + conditioning); the harness must detect the form
    from the state dict so it builds matching models."""
    import tools.verify_released as vr

    sd_preln = {
        "token_emb.weight": np.zeros((4, 8), np.float32),
        "performer.net.layers.0.0.fn.norm.weight": np.ones(8, np.float32),
    }
    form = vr.detect_performer_form(sd_preln)
    assert form == {
        "use_rezero": False,
        "spatial_position_emb": None,
        "conditioning_num_tokens": None,
        "nb_features": None,
    }

    sd_paper = {
        "token_emb.weight": np.zeros((4, 8), np.float32),
        "performer.net.layers.0.0.fn.g": np.float32(0.5),
        "performer.net.layers.0.1.fn.g": np.float32(0.5),
        "spatial_position_emb.0.emb.weight": np.zeros((10, 8), np.float32),
        "spatial_position_emb.1.emb.weight": np.zeros((14, 8), np.float32),
        "conditioning_emb.1.weight": np.zeros((7, 8), np.float32),
        "conditioning_emb.0.weight": np.zeros((3, 8), np.float32),
        "performer.net.layers.0.0.fn.fn.fast_attention.projection_matrix":
            np.zeros((266, 64), np.float32),
    }
    form = vr.detect_performer_form(sd_paper)
    assert form == {
        "use_rezero": True,
        "spatial_position_emb": "absolute",
        "conditioning_num_tokens": (3, 7),  # index-sorted
        "nb_features": 266,
    }


def test_convert_performer_favor_roundtrip():
    """The FAVOR projection buffers map into the model's mutable
    'favor' collection with the structure and orientation the flax
    Performer expects (same (m, dh) einsum as performer-pytorch)."""
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.models.performer import Performer
    from tools.convert_performer_checkpoint import convert_performer_favor

    model = Performer(
        num_tokens=9, max_seq_len=12, dim=16, depth=2, heads=2,
        dim_head=8, nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    ref = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)},
        jnp.zeros((1, 8), jnp.int32),
    )
    sd = {}
    for L in range(2):
        sd[
            f"performer.net.layers.{L}.0.fn.fn.fast_attention.projection_matrix"
        ] = np.asarray(ref["favor"][f"block_{L}"]["attn"]["projection"])
    favor = convert_performer_favor(sd, depth=2)

    def paths(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in p) + ":" + str(l.shape)
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(favor) == paths(ref["favor"])
    # converted favor drives the model identically to the original
    x = jnp.zeros((1, 8), jnp.int32)
    a = model.apply({"params": ref["params"], "favor": ref["favor"]}, x)
    b = model.apply(
        {"params": ref["params"], "favor": jax.tree.map(jnp.asarray, favor)},
        x,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
