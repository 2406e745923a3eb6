import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.models.discriminator import BaselineDiscriminator
from synthanatomy_tpu.models.vqvae import BaselineVQVAE
from synthanatomy_tpu.ops.conv3d import conv3d, conv_transpose3d


def _paper_small():
    """2-level small config (fast on CPU)."""
    return BaselineVQVAE(
        n_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        n_embed=32,
        embed_dim=8,
        n_channels=16,
        n_res_channels=16,
        n_res_layers=1,
        dtype=jnp.float32,
        use_pallas_vq=False,
    )


def test_conv_shapes_match_torch_formulas():
    x = jnp.zeros((1, 16, 16, 16, 3))
    w = jnp.zeros((4, 4, 4, 3, 5))
    # conv: floor((16 + 2*1 - 1*(4-1) - 1)/2) + 1 = 8
    assert conv3d(x, w, stride=2, padding=1).shape == (1, 8, 8, 8, 5)
    # transpose: (16-1)*2 - 2*1 + (4-1) + 1 + 0 = 32
    y = jnp.zeros((1, 16, 16, 16, 5))
    wt = jnp.zeros((4, 4, 4, 5, 3))
    assert conv_transpose3d(y, wt, stride=2, padding=1).shape == (1, 32, 32, 32, 3)
    # output_padding extends the trailing edge
    assert conv_transpose3d(y, wt, stride=2, padding=1, output_padding=1).shape == (
        1, 33, 33, 33, 3,
    )


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 5, 7, 3)).astype(np.float32)
    w = rng.normal(size=(4, 4, 4, 3, 2)).astype(np.float32) * 0.1

    got = np.asarray(
        conv_transpose3d(jnp.array(x), jnp.array(w), stride=2, padding=1)
    )

    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)  # NDHWC → NCDHW
    tw = torch.tensor(w).permute(3, 4, 0, 1, 2)  # DHWIO → IODHW
    ref = torch.nn.functional.conv_transpose3d(tx, tw, stride=2, padding=1)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv3d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 8, 2)).astype(np.float32)
    w = rng.normal(size=(4, 4, 4, 2, 3)).astype(np.float32) * 0.1
    got = np.asarray(conv3d(jnp.array(x), jnp.array(w), stride=2, padding=1, dilation=1))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    tw = torch.tensor(w).permute(4, 3, 0, 1, 2)  # DHWIO → OIDHW
    ref = torch.nn.functional.conv3d(tx, tw, stride=2, padding=1).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_vqvae_forward_shapes_and_losses():
    model = _paper_small()
    x = jnp.ones((2, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)
    out, mut = model.apply(
        variables, x, training=True, mutable=["vq", "diagnostics"]
    )
    assert out["reconstruction"][0].shape == (2, 16, 16, 16, 1)
    assert len(out["quantization_losses"]) == 1
    assert np.isfinite(float(out["quantization_losses"][0]))
    # EMA state updated in training mode
    assert not np.allclose(
        np.asarray(mut["vq"]["level_0"].cluster_size),
        np.asarray(variables["vq"]["level_0"].cluster_size),
    )
    # perplexity diagnostic sown
    assert "perplexity" in mut["diagnostics"]


def test_vqvae_eval_does_not_mutate_codebook():
    model = _paper_small()
    x = jnp.ones((1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)
    _, mut = model.apply(variables, x, training=False, mutable=["vq", "diagnostics"])
    np.testing.assert_array_equal(
        np.asarray(mut["vq"]["level_0"].codebook),
        np.asarray(variables["vq"]["level_0"].codebook),
    )


def test_extract_decode_roundtrip():
    """index_quantize → decode_samples must equal forward's
    reconstruction in eval mode (the extracting/decoding contract,
    SURVEY.md §3.2)."""
    model = _paper_small()
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)

    idx = model.apply(variables, x, method=model.index_quantize)
    assert idx[0].shape == (1, 4, 4, 4)
    assert idx[0].dtype == jnp.int32

    recon_via_idx = model.apply(variables, idx, method=model.decode_samples)
    out = model.apply(variables, x, training=False, mutable=["diagnostics"])[0]
    np.testing.assert_allclose(
        np.asarray(recon_via_idx),
        np.asarray(out["reconstruction"][0]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_vqvae_grads_flow_to_encoder_and_decoder():
    model = _paper_small()
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 1))
    variables = model.init(jax.random.key(0), x)
    params = variables["params"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "vq": variables["vq"]},
            x,
            training=True,
            mutable=["vq", "diagnostics"],
        )
        recon = out["reconstruction"][0]
        return jnp.mean((recon - x) ** 2) + out["quantization_losses"][0]

    grads = jax.grad(loss_fn)(params)
    gnorms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    flat = jax.tree.leaves(gnorms)
    assert all(np.isfinite(v) for v in flat)
    # both encoder (through STE) and decoder get gradient
    assert float(jnp.abs(grads["encoder_conv_0"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["decoder_up_1"]["kernel"]).sum()) > 0


def test_subpixel_decoder_shape():
    model = BaselineVQVAE(
        n_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        n_embed=16, embed_dim=8, n_channels=8, n_res_channels=8,
        n_res_layers=1, use_subpixel_conv=True, dtype=jnp.float32,
        use_pallas_vq=False,
    )
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.key(0), x)
    out, _ = model.apply(variables, x, mutable=["diagnostics"])
    assert out["reconstruction"][0].shape == (1, 8, 8, 8, 1)
    assert model.last_layer_name() == "decoder_subpixel"


def test_discriminator_patch_output():
    d = BaselineDiscriminator(ndf=8, n_layers=3, dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 32, 1))
    variables = d.init(jax.random.key(0), x, training=True)
    logits, mut = d.apply(variables, x, training=True, mutable=["batch_stats"])
    # three stride-2 convs: 32 → 16 → 8 → 4; stride-1 k4p1: 3; final: 2
    assert logits.shape == (2, 2, 2, 2, 1)
    assert "batch_stats" in mut
    # eval mode works with running stats
    logits_eval = d.apply(variables, x, training=False)
    assert logits_eval.shape == (2, 2, 2, 2, 1)


def test_conv_transpose_phase_decomposition_exact(monkeypatch):
    """The phase-decomposition fast path must be bit-for-bit equivalent
    to the generic dilated-conv path for (k=4, s=2, p=1)."""
    from synthanatomy_tpu.ops import conv3d as C

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 3, 2)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    # force the generic dilated-conv lowering as the oracle (Co=2 would
    # otherwise route to the thin-output matmul path)
    monkeypatch.setattr(C, "THIN_CONV_TRANSPOSE_MAX_CO", 0)
    generic = C.conv_transpose3d(x, w, stride=2, padding=1, bias=b)
    fast = C._conv_transpose_s2k4p1(x, w, b)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(generic), rtol=1e-5, atol=1e-5)


def test_conv_transpose_thin_output_path_exact(monkeypatch):
    """The taps×phases-packed matmul path (Co ≤ 8 — the paper decoder's
    final 128→1 layer) must match the generic dilated-conv path, in
    values AND in gradients (it runs inside the train step)."""
    from synthanatomy_tpu.ops import conv3d as C

    rng = np.random.default_rng(8)
    for ci, co, shape in ((16, 1, (2, 5, 6, 7)), (3, 2, (1, 4, 3, 5))):
        x = jnp.asarray(rng.normal(size=shape + (ci,)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(4, 4, 4, ci, co)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        thin = C._conv_transpose_s2k4p1_thin(x, w, b)
        monkeypatch.setattr(C, "THIN_CONV_TRANSPOSE_MAX_CO", 0)
        generic = C.conv_transpose3d(x, w, stride=2, padding=1, bias=b)
        monkeypatch.setattr(C, "THIN_CONV_TRANSPOSE_MAX_CO", 8)
        np.testing.assert_allclose(
            np.asarray(thin), np.asarray(generic), rtol=1e-5, atol=1e-5
        )
        # and the public API routes through it with identical grads
        def loss_pub(w):
            return jnp.sum(
                C.conv_transpose3d(x, w, stride=2, padding=1, bias=b) ** 2
            )

        g_thin = jax.grad(loss_pub)(w)
        monkeypatch.setattr(C, "THIN_CONV_TRANSPOSE_MAX_CO", 0)
        g_gen = jax.grad(loss_pub)(w)
        monkeypatch.setattr(C, "THIN_CONV_TRANSPOSE_MAX_CO", 8)
        np.testing.assert_allclose(
            np.asarray(g_thin), np.asarray(g_gen), rtol=1e-4, atol=1e-4
        )


def test_conv_thin_input_path_exact(monkeypatch):
    """The space-to-depth path for thin-INPUT k4/s2/p1 convs (the
    encoder's and discriminator's 1-channel first layers; available
    but default-off — no model-level win, BASELINE.md r4) must match
    the generic lowering in values and gradients, on even and odd
    spatial dims."""
    from synthanatomy_tpu.ops import conv3d as C

    rng = np.random.default_rng(9)
    for ci, co, shape in (
        (1, 8, (2, 8, 6, 10)),
        (1, 5, (1, 7, 9, 5)),
        (2, 4, (1, 6, 7, 8)),
    ):
        x = jnp.asarray(rng.normal(size=shape + (ci,)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(4, 4, 4, ci, co)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        thin = C._conv_s2k4p1_thin_input(x, w, b)
        generic = C.conv3d(x, w, stride=2, padding=1, bias=b)
        assert thin.shape == generic.shape, (thin.shape, generic.shape)
        np.testing.assert_allclose(
            np.asarray(thin), np.asarray(generic), rtol=1e-5, atol=1e-5
        )

        # gradients, with the path forced on through the public API
        def loss_pub(w):
            return jnp.sum(C.conv3d(x, w, stride=2, padding=1, bias=b) ** 2)

        monkeypatch.setattr(C, "THIN_CONV_MAX_CI", 2)
        g_thin = jax.grad(loss_pub)(w)
        monkeypatch.setattr(C, "THIN_CONV_MAX_CI", 0)
        g_gen = jax.grad(loss_pub)(w)
        np.testing.assert_allclose(
            np.asarray(g_thin), np.asarray(g_gen), rtol=1e-4, atol=1e-4
        )


def test_fused_residual_model_parity():
    """use_fused_residual=True (interpret kernel off-TPU) vs the XLA
    conv chain on identical params: forward and parameter gradients
    agree — the fused Pallas path is a drop-in for the module math."""
    def build(fused):
        return BaselineVQVAE(
            n_levels=1,
            downsample_parameters=((4, 2, 1, 1),),
            upsample_parameters=((4, 2, 1, 0, 1),),
            n_embed=32,
            embed_dim=8,
            n_channels=128,
            n_res_channels=128,
            n_res_layers=2,
            dtype=jnp.float32,
            use_pallas_vq=False,
            use_fused_residual=fused,
        )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 32, 1)), jnp.float32
    )
    m_xla = build(False)
    m_fus = build(True)
    variables = m_xla.init(jax.random.key(0), x)

    def recon_loss(model):
        def f(params):
            out = model.apply(
                {"params": params, "vq": variables["vq"]}, x,
            )
            recon = out["reconstruction"][0]
            return jnp.sum(jnp.square(recon.astype(jnp.float32)))
        return f

    l_xla, g_xla = jax.value_and_grad(recon_loss(m_xla))(variables["params"])
    l_fus, g_fus = jax.value_and_grad(recon_loss(m_fus))(variables["params"])
    np.testing.assert_allclose(float(l_fus), float(l_xla), rtol=1e-4)
    flat_xla = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_xla)
    }
    flat_fus = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_fus)
    }
    assert flat_xla.keys() == flat_fus.keys()
    for k in flat_xla:
        a = np.asarray(flat_xla[k], np.float32)
        b = np.asarray(flat_fus[k], np.float32)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(b - a).max() <= 2e-3 * scale, (k, np.abs(b - a).max(), scale)
