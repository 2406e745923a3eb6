import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.losses import vqvae as L
from synthanatomy_tpu.losses.adversarial import (
    discriminator_loss,
    generator_loss,
    get_criterion,
)
from synthanatomy_tpu.losses.lpips import init_lpips_params, lpips_distance
from synthanatomy_tpu.losses.transformer import ce_loss


def _out(y_pred, q=0.1):
    return {
        "reconstruction": [y_pred],
        "quantization_losses": [jnp.asarray(q, jnp.float32)],
    }


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.uniform(0.1, 0.9, (2, 8, 8, 8, 1)).astype(np.float32))
    y_pred = y + 0.05 * jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    return y_pred, y


@pytest.fixture(scope="module")
def lpips_alex():
    return init_lpips_params(jax.random.key(0), "alex")


@pytest.fixture(scope="module")
def lpips_squeeze():
    return init_lpips_params(jax.random.key(0), "squeeze")


def test_mse_matches_closed_form(vol):
    y_pred, y = vol
    loss, s = L.mse_loss(_out(y_pred), y)
    expect = float(jnp.mean((y_pred - y) ** 2)) + 0.1
    assert abs(float(loss) - expect) < 1e-6
    assert "Loss-MSE-Reconstruction" in s


def test_identical_inputs_give_only_q_loss(vol):
    _, y = vol
    for fn, kwargs in [
        (L.mse_loss, {}),
        (L.baur_loss, {"gdl_factor": 2.0}),
        (L.spectral_loss, {}),
        (L.hartley_loss, {}),
        (L.jukebox_loss, {}),
    ]:
        loss, _ = fn(_out(y, q=0.25), y, **kwargs)
        assert abs(float(loss) - 0.25) < 1e-5, fn.__name__


def test_all_losses_finite_and_positive(lpips_alex, lpips_squeeze):
    nprng = np.random.default_rng(0)
    y = jnp.asarray(nprng.uniform(0.1, 0.9, (1, 32, 32, 32, 1)).astype(np.float32))
    y_pred = y + 0.05 * jnp.asarray(nprng.normal(size=y.shape).astype(np.float32))
    rng = jax.random.key(1)
    cases = {
        "mse": dict(),
        "baur": dict(gdl_factor=1.0),
        "spectral": dict(),
        "hartley": dict(),
        "jukebox": dict(),
        "wavegan": dict(),
        "perceptual": dict(lpips_params=lpips_alex, rng=rng),
        "jukebox_perceptual": dict(lpips_params=lpips_alex, rng=rng),
        "hartley_perceptual": dict(lpips_params=lpips_alex, rng=rng),
        "baseline": dict(lpips_params=lpips_squeeze, rng=rng, n_slices=8),
    }
    for name, kwargs in cases.items():
        fn = L.get_vqvae_loss(name)
        loss, summaries = fn(_out(y_pred), y, **kwargs)
        assert np.isfinite(float(loss)), name
        assert float(loss) > 0, name
        assert all(np.isfinite(float(v)) for v in summaries.values()), name


def test_losses_jittable(lpips_alex):
    nprng = np.random.default_rng(2)
    y = jnp.asarray(nprng.uniform(0.1, 0.9, (1, 32, 32, 32, 1)).astype(np.float32))
    y_pred = y + 0.05 * jnp.asarray(nprng.normal(size=y.shape).astype(np.float32))

    @jax.jit
    def f(y_pred, y, gdl):
        loss1, _ = L.baur_loss(_out(y_pred), y, gdl_factor=gdl)
        loss2, _ = L.jukebox_perceptual_loss(
            _out(y_pred), y, lpips_params=lpips_alex, rng=jax.random.key(0)
        )
        return loss1 + loss2

    v1 = f(y_pred, y, 0.0)
    v2 = f(y_pred, y, 5.0)  # scheduled factor changes need no recompile
    assert np.isfinite(float(v1)) and np.isfinite(float(v2))
    assert float(v2) > float(v1)


def test_baur_gdl_factor_scales_gdl(vol):
    y_pred, y = vol
    l0, s0 = L.baur_loss(_out(y_pred, q=0.0), y, gdl_factor=0.0)
    l1, s1 = L.baur_loss(_out(y_pred, q=0.0), y, gdl_factor=3.0)
    assert float(s0["Loss-GDL-Reconstruction"]) == 0.0
    assert float(s1["Loss-GDL-Reconstruction"]) > 0.0
    np.testing.assert_allclose(
        float(l1 - l0), float(s1["Loss-GDL-Reconstruction"]), rtol=1e-5
    )


def test_spectral_matches_torch_reference_formula(vol):
    torch = pytest.importorskip("torch")
    y_pred, y = vol
    loss, _ = L.spectral_loss(_out(y_pred, q=0.0), y)

    ty = torch.tensor(np.asarray(y)).permute(0, 4, 1, 2, 3)
    tp = torch.tensor(np.asarray(y_pred)).permute(0, 4, 1, 2, 3)
    f_y = torch.fft.fftn(ty, dim=(1, 2, 3, 4), norm="ortho")
    f_p = torch.fft.fftn(tp, dim=(1, 2, 3, 4), norm="ortho")
    amp = lambda f: torch.sqrt(f.real**2 + f.imag**2)
    ph = lambda f: torch.atan2(f.imag, f.real)
    a_loss = 0.5 * torch.nn.functional.mse_loss(amp(f_p), amp(f_y))
    p_loss = torch.mean(0.5 * torch.abs((1 - torch.exp(torch.abs(ph(f_p) - ph(f_y)))) ** 2))
    l2 = torch.nn.functional.mse_loss(tp, ty)
    expect = float(a_loss + p_loss + l2)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_lpips_zero_for_identical_and_positive_otherwise(lpips_alex):
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 1)), jnp.float32)
    d_same = lpips_distance(lpips_alex, x, x)
    assert np.allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, 0, 1)
    d_diff = lpips_distance(lpips_alex, x, y)
    assert (np.asarray(d_diff) > 0).all()


def test_lpips_squeeze_channels(lpips_squeeze):
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    d = lpips_distance(lpips_squeeze, x, x)
    assert d.shape == (1,)


def test_adversarial_criteria():
    logits = jnp.asarray([[-2.0, 0.0, 2.0]])
    for name in ("vanilla", "hinge", "least_square"):
        fn = get_criterion(name)
        assert np.isfinite(np.asarray(fn(logits, True))).all()
        assert np.isfinite(np.asarray(fn(logits, False))).all()
    # least-square closed form
    g, _ = generator_loss(logits, criterion="least_square", weight=1.0)
    np.testing.assert_allclose(float(g), np.mean((np.array([-2.0, 0, 2]) - 1) ** 2))
    d, s = discriminator_loss(logits, logits + 1, criterion="least_square", weight=1.0)
    exp = 0.5 * (np.mean(np.array([-2.0, 0, 2]) ** 2) + np.mean((np.array([-1.0, 1, 3]) - 1) ** 2))
    np.testing.assert_allclose(float(d), exp, rtol=1e-6)
    assert "Loss-Adversarial_Discriminator-Originals" in s


def test_perceptual_vanishes_for_identical(lpips_alex):
    y = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 32, 32, 32, 1)), jnp.float32)
    loss, s = L.perceptual_loss(
        _out(y, q=0.0), y, lpips_params=lpips_alex, include_pixel_loss=False
    )
    assert abs(float(loss)) < 1e-6


def test_ce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 7, 11)).astype(np.float32)
    targets = rng.integers(0, 11, size=(2, 7))
    got, _ = ce_loss(jnp.asarray(logits), jnp.asarray(targets))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits).transpose(1, 2), torch.tensor(targets)
    )
    assert abs(float(got) - float(ref)) < 1e-5


def test_ce_loss_mask():
    logits = jnp.zeros((1, 4, 3))
    targets = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    loss, _ = ce_loss(logits, targets, mask=mask)
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-6)
