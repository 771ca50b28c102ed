"""Golden tests for resampling kernels and the separable downsampler."""

import numpy as np
import jax.numpy as jnp
import pytest

from dip_tpu.ops.resample import (
    avg_pool,
    downsample,
    max_pool,
    resample_kernel_1d,
    resample_kernel_2d,
    upsample,
)


def dense_reference_kernel(factor, family, phase, width, support=None, sigma=None):
    """Independent dense 2-D construction straight from the filter math
    (per /root/reference/models/downsampler.py:73-135 semantics), used to
    golden-test the separable fast path."""
    size = width - 1 if (phase == 0.5 and family != "box") else width
    k = np.zeros((size, size))
    center = (width + 1) / 2.0
    for i in range(1, size + 1):
        for j in range(1, size + 1):
            if family == "box":
                k[i - 1, j - 1] = 1.0 / (width * width)
                continue
            if family == "gauss":
                di = (i - center) / 2.0
                dj = (j - center) / 2.0
                k[i - 1, j - 1] = np.exp(-(di * di + dj * dj) / (2 * sigma**2)) / (
                    2 * np.pi * sigma**2
                )
                continue
            if phase == 0.5:
                di = abs(i + 0.5 - center) / factor
                dj = abs(j + 0.5 - center) / factor
            else:
                di = abs(i - center) / factor
                dj = abs(j - center) / factor
            val = 1.0
            if di != 0:
                val *= support * np.sin(np.pi * di) * np.sin(np.pi * di / support)
                val /= np.pi**2 * di**2
            if dj != 0:
                val *= support * np.sin(np.pi * dj) * np.sin(np.pi * dj / support)
                val /= np.pi**2 * dj**2
            k[i - 1, j - 1] = val
    return k / k.sum()


@pytest.mark.parametrize(
    "factor,ktype,phase,width,support,sigma",
    [
        (4, "lanczos", 0.5, 17, 2, None),   # lanczos2, factor 4 (SR default)
        (2, "lanczos", 0.5, 9, 2, None),    # lanczos2, factor 2
        (4, "lanczos", 0.0, 17, 2, None),
        (8, "lanczos", 0.5, 49, 3, None),   # lanczos3, factor 8
        (2, "gauss", 0.0, 7, None, 0.5),    # gauss12
        (2, "gauss", 0.0, 9, None, 1 / np.sqrt(2)),  # gauss1sq2
        (2, "box", 0.5, 5, None, None),
    ],
)
def test_kernel_matches_dense_reference(factor, ktype, phase, width, support, sigma):
    dense = dense_reference_kernel(factor, ktype, phase, width, support, sigma)
    ours = resample_kernel_2d(
        factor, ktype, phase, kernel_width=width, support=support, sigma=sigma
    )
    np.testing.assert_allclose(ours, dense, atol=1e-12)


def test_named_presets_resolve():
    k = resample_kernel_1d(4, "lanczos2", 0.5)
    assert k.shape == (16,)  # width 4*4+1=17, phase .5 -> 16
    assert abs(k.sum() - 1) < 1e-12
    k3 = resample_kernel_1d(2, "lanczos3", 0.5)
    assert k3.shape == (12,)  # width 13 -> 12


def test_downsample_constant_preserved():
    """Kernel sums to 1 -> constant images are fixed points (interior)."""
    x = jnp.full((1, 32, 32, 3), 0.7)
    y = downsample(x, 4, "lanczos2", phase=0.5, preserve_size=True)
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-5)


def test_downsample_separable_equals_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 32, 32, 2)), dtype=jnp.float32)
    y_sep = downsample(x, 4, "lanczos2", phase=0.5, preserve_size=True)

    from jax import lax
    from dip_tpu.ops.pad import pad2d

    k2 = jnp.asarray(resample_kernel_2d(4, "lanczos2", 0.5), dtype=jnp.float32)
    ks = k2.shape[0]
    p = (ks - 4) // 2  # even kernel
    xp = pad2d(x, p, "replication")
    w = jnp.broadcast_to(k2[:, :, None, None], (ks, ks, 1, 2))
    y_dense = lax.conv_general_dilated(
        xp, w, (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
    )
    np.testing.assert_allclose(np.asarray(y_sep), np.asarray(y_dense), atol=1e-5)


def test_downsample_matches_torch_reference_semantics():
    """Cross-check against torch's conv2d with the same dense kernel,
    replication pad, and stride — the reference Downsampler's exact compute."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.random((1, 24, 24, 3)).astype(np.float32)

    ours = np.asarray(downsample(jnp.asarray(x), 2, "lanczos2", 0.5, True))

    k2 = resample_kernel_2d(2, "lanczos2", 0.5).astype(np.float32)
    ks = k2.shape[0]  # 8 (even)
    pad = (ks - 2) // 2
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.functional.pad(xt, (pad, pad, pad, pad), mode="replicate")
    w = torch.zeros(3, 3, ks, ks)
    for c in range(3):
        w[c, c] = torch.from_numpy(k2)
    yt = torch.nn.functional.conv2d(xt, w, stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, yt, atol=1e-5)


def test_upsample_nearest_duplicates():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample(x, 2, "nearest")
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0],
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )


def test_upsample_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.random((1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample(jnp.asarray(x), 2, "bilinear"))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="bilinear", align_corners=False
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, yt, atol=1e-5)


def test_pools_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.random((1, 8, 8, 2)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(avg_pool(jnp.asarray(x), 2)),
        torch.nn.functional.avg_pool2d(xt, 2).numpy().transpose(0, 2, 3, 1),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(max_pool(jnp.asarray(x), 2)),
        torch.nn.functional.max_pool2d(xt, 2).numpy().transpose(0, 2, 3, 1),
        atol=1e-6,
    )


def test_up2_bilinear_shifts_matches_resize():
    """The shifted-adds 2x bilinear upsample == jax.image.resize('bilinear')
    (half-pixel centers), including edge clamping, fwd and grad."""
    import jax

    from dip_tpu.ops.resample import _up2_bilinear_shifts

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 9, 5)), jnp.float32)
    want = jax.image.resize(x, (2, 14, 18, 5), method="bilinear")
    got = _up2_bilinear_shifts(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    g1 = jax.grad(lambda x: jnp.sum(_up2_bilinear_shifts(x) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(jax.image.resize(
        x, (2, 14, 18, 5), method="bilinear") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
