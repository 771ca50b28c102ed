"""Exactness of the fused upsample2x->conv3x3 decoder seam (ops/up_conv.py).

Reference semantics: conv_valid(pad1(upsample(x, 2, mode)), W) with the
package's own unfused ops — upsample (resample.py, torch align_corners=False
bilinear / nearest), pad2d, lax conv. The fused phase form must match in
forward AND gradients for every (mode, pad, size) combination the Skip
decoder can gate it on, including the reflect-pad boundary corrections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from dip_tpu.ops.pad import pad2d
from dip_tpu.ops.resample import upsample
from dip_tpu.ops.up_conv import Up2, up2_conv3x3, up2_moments

_DN = ("NHWC", "HWIO", "NHWC")


def _unfused(x, kernel, up_mode, pad_mode):
    y = upsample(x, 2, up_mode)
    y = pad2d(y, 1, pad_mode)
    return lax.conv_general_dilated(y, kernel, (1, 1), "VALID",
                                    dimension_numbers=_DN,
                                    precision=lax.Precision.HIGHEST)


@pytest.mark.parametrize("impl", ["dots", "conv", "im2col"])
@pytest.mark.parametrize("up_mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("pad_mode", ["reflection", "replication"])
@pytest.mark.parametrize("hw", [(2, 2), (3, 5), (8, 8), (5, 2)])
def test_up2_conv3x3_matches_unfused(impl, up_mode, pad_mode, hw):
    from dip_tpu.ops import dispatch

    h, w = hw
    rng = np.random.default_rng(hash((up_mode, pad_mode, h, w)) % 2**32)
    x = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)).astype(np.float32))

    want = _unfused(x, k, up_mode, pad_mode)
    with dispatch.override(up_conv_impl=impl):
        got = up2_conv3x3(x, k, up_mode, pad_mode)
    assert got.shape == want.shape == (1, 2 * h, 2 * w, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["dots", "conv", "im2col"])
@pytest.mark.parametrize("up_mode", ["bilinear", "nearest"])
def test_up2_conv3x3_gradients_match(impl, up_mode):
    from dip_tpu.ops import dispatch

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 6, 5, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(1, 12, 10, 2)).astype(np.float32))

    def loss_fused(x, k):
        with dispatch.override(up_conv_impl=impl):
            return jnp.sum(up2_conv3x3(x, k, up_mode, "reflection") * cot)

    def loss_ref(x, k):
        return jnp.sum(_unfused(x, k, up_mode, "reflection") * cot)

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("up_mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("hw", [(2, 2), (3, 7), (8, 8)])
def test_up2_moments_exact(up_mode, hw):
    h, w = hw
    rng = np.random.default_rng(h * 100 + w)
    x = jnp.asarray(rng.normal(size=(1, h, w, 6)).astype(np.float32))
    y = upsample(x, 2, up_mode)
    mean, var = up2_moments(x, up_mode)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(jnp.mean(y, axis=(0, 1, 2))),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(jnp.var(y, axis=(0, 1, 2))),
                               rtol=1e-5, atol=1e-6)


def test_up2_affine_commutes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    s = jnp.asarray([1.5, -0.5, 2.0], dtype=jnp.float32)
    t = jnp.asarray([0.1, -0.2, 0.3], dtype=jnp.float32)
    u = Up2(x, "bilinear")
    np.testing.assert_allclose(
        np.asarray(u.affine(s, t).materialize()),
        np.asarray(upsample(x, 2, "bilinear") * s + t),
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fold_bn", [True, False])
@pytest.mark.parametrize("up_mode", ["bilinear", "nearest"])
def test_skip_fused_seam_matches_unfused(fold_bn, up_mode):
    """Whole-model check: Skip with the fused seam on vs off, same params."""
    from dip_tpu.models import Skip
    from dip_tpu.ops import dispatch

    model = Skip(num_channels_down=[8, 8], num_channels_up=[8, 8],
                 num_channels_skip=[2, 2], upsample_mode=up_mode,
                 pad="reflection", fold_bn=fold_bn)
    z = jax.random.normal(jax.random.key(0), (1, 16, 16, 4))
    with dispatch.override(up_conv="off"):
        params = model.init(jax.random.key(1), z)
        want = model.apply(params, z)
    with dispatch.override(up_conv="on"):
        got = model.apply(params, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_skip_fused_seam_grads_match():
    from dip_tpu.models import Skip
    from dip_tpu.ops import dispatch

    model = Skip(num_channels_down=[8, 8], num_channels_up=[8, 8],
                 num_channels_skip=[2, 2], upsample_mode="bilinear",
                 pad="reflection")
    z = jax.random.normal(jax.random.key(0), (1, 16, 16, 4))
    tgt = jax.random.uniform(jax.random.key(2), (1, 16, 16, 3))

    def loss(params, on):
        with dispatch.override(up_conv="on" if on else "off"):
            return jnp.mean((model.apply(params, z) - tgt) ** 2)

    with dispatch.override(up_conv="off"):
        params = model.init(jax.random.key(1), z)
    g_on = jax.grad(lambda p: loss(p, True))(params)
    g_off = jax.grad(lambda p: loss(p, False))(params)
    flat_on = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_on)])
    flat_off = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g_off)])
    # compare globally (L2), per docs: BN shift-invariance makes individual
    # bias grads exact zeros where tiny absolute noise dominates rtol
    assert float(jnp.linalg.norm(flat_on - flat_off)) <= 1e-4 * (
        1 + float(jnp.linalg.norm(flat_off)))


@pytest.mark.parametrize("up_mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("pad_mode", ["reflection", "replication"])
@pytest.mark.parametrize("hw", [(8, 8), (16, 5), (8, 12)])
def test_up2_conv3x3_pallas_matches_unfused(up_mode, pad_mode, hw):
    """The Pallas seam kernel (interpret mode on CPU) vs the unfused
    reference path — forward AND both gradients. h must be a multiple of
    the kernel's row tile (pallas_up_conv.TH); other shapes fall back to
    dots inside up2_conv3x3 (covered by the tests above)."""
    from dip_tpu.ops import dispatch

    h, w = hw
    rng = np.random.default_rng(hash((up_mode, pad_mode, h, w, 7)) % 2**32)
    x = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(1, 2 * h, 2 * w, 4)).astype(np.float32))

    want = _unfused(x, k, up_mode, pad_mode)
    with dispatch.override(up_conv_impl="pallas"):
        got = up2_conv3x3(x, k, up_mode, pad_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_pl(x, k):
        with dispatch.override(up_conv_impl="pallas"):
            return jnp.sum(up2_conv3x3(x, k, up_mode, pad_mode) * cot)

    def loss_ref(x, k):
        return jnp.sum(_unfused(x, k, up_mode, pad_mode) * cot)

    gx_p, gk_p = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=2e-4, atol=2e-4)


def test_up2_conv3x3_pallas_batch():
    """n>1 exercises the kernel's batch grid dimension."""
    from dip_tpu.ops import dispatch

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 8, 6, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)).astype(np.float32))
    want = _unfused(x, k, "bilinear", "reflection")
    with dispatch.override(up_conv_impl="pallas"):
        got = up2_conv3x3(x, k, "bilinear", "reflection")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hw", [(8, 8), (16, 12)])
def test_pallas_kernel_inside_envelope(hw):
    """The above pallas-impl tests use C=5/F=4, which seam_ok rejects
    (128-lane alignment) — they pin the FALLBACK. This one runs the
    actual kernels (interpret mode on CPU) with C=F=128 inside the
    envelope: fwd + both phase-major backward kernels vs the dots
    emission."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.pallas_up_conv import seam_ok

    h, w = hw
    assert seam_ok(1, h, w, 128, 128, 4)
    rng = np.random.default_rng(h * 31 + w)
    x = jnp.asarray(rng.normal(size=(1, h, w, 128)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(3, 3, 128, 128)).astype(np.float32)) * 0.1
    cot = jnp.asarray(
        rng.normal(size=(1, 2 * h, 2 * w, 128)).astype(np.float32))

    # The kernels run MIXED precision on f32 inputs (bf16 MXU operands,
    # f32 VMEM accumulation — pallas_up_conv._mx).  The like-for-like
    # reference is the dots emission under dots_f32_bf16mul, which rounds
    # the SAME operands (x once, the same phase-folded e per tap) to bf16:
    # forward then differs only in accumulation order.  The backward
    # kernels additionally round dz to bf16 before the grad dots (the
    # dots VJP keeps dz f32), so gradients differ at bf16 class.
    def loss(x, k, impl):
        with dispatch.override(up_conv_impl=impl, dots_f32_bf16mul=True):
            z = up2_conv3x3(x, k, "bilinear", "reflection")
        return jnp.sum(z * cot), z

    (lp, zp), (gxp, gkp) = jax.value_and_grad(
        lambda x, k: loss(x, k, "pallas"), argnums=(0, 1),
        has_aux=True)(x, k)
    (ld, zd), (gxd, gkd) = jax.value_and_grad(
        lambda x, k: loss(x, k, "dots"), argnums=(0, 1),
        has_aux=True)(x, k)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zd),
                               rtol=1e-4, atol=1e-4)
    # dz's bf16 rounding leaves a bf16-class spread on the grads (near-
    # zero entries make elementwise rtol meaningless) — assert the same
    # max-normalized relative error the TPU parity tool uses
    for a, b in ((gxp, gxd), (gkp, gkd)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)
        assert rel < 2e-2, rel


def test_seam_vmem_envelope():
    """Wide rows must be rejected by the scoped-VMEM budget: the round-5
    fleet eval (448x704 image -> top seam LR 224x352) hit a Mosaic
    scoped-VMEM compile failure (wgrad tile set 17.19 MiB > 16 MiB) before
    seam_ok was dtype/width-aware. Flagship 256x256 stays inside."""
    from dip_tpu.ops.pallas_up_conv import seam_ok

    for isz in (2, 4):
        assert seam_ok(1, 256, 256, 128, 128, isz)
        assert not seam_ok(1, 224, 352, 128, 128, isz)
    # alignment / tiling constraints unchanged
    assert not seam_ok(1, 64, 56, 32, 64, 2)
    assert not seam_ok(1, 12, 64, 128, 128, 2)


def test_seam_dz_pallas_transform_exact():
    """seam_dz='pallas' routes the backward's HR -> phase-major dz
    transform through ops/pallas_s2d.s2d_pack (fused bf16 cast) — pure
    data movement, so dxp/de must be BIT-identical to the XLA chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dip_tpu.ops import dispatch
    from dip_tpu.ops.pallas_up_conv import up2_conv3x3_pallas

    rng = np.random.default_rng(23)
    for dtype in (jnp.bfloat16, jnp.float32):
        xp = jnp.asarray(rng.normal(size=(1, 18, 12, 128)), dtype)
        e = jnp.asarray(rng.normal(size=(3, 3, 128, 512)) * 0.1, dtype)

        def loss(xp, e):
            return jnp.sum(up2_conv3x3_pallas(xp, e).astype(jnp.float32) ** 2)

        with dispatch.override(seam_dz="xla"):
            gx_ref, ge_ref = jax.grad(loss, (0, 1))(xp, e)
        with dispatch.override(seam_dz="pallas"):
            gx, ge = jax.grad(loss, (0, 1))(xp, e)
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(gx_ref),
                                      err_msg=str(dtype))
        np.testing.assert_array_equal(np.asarray(ge), np.asarray(ge_ref),
                                      err_msg=str(dtype))


def test_seam_carry_exact():
    """up2_conv3x3(carry=y) (Pallas epilogue add) matches
    up2_conv3x3(...) + y in fwd and all three grads; and a Skip forward
    with dispatch.seam_carry on matches the default within bf16-add
    reassociation tolerance (the reflect corrections then apply after the
    carry add instead of before — border strips only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dip_tpu.ops import dispatch
    from dip_tpu.ops.up_conv import up2_conv3x3

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    cr = jnp.asarray(rng.normal(size=(1, 32, 16, 128)), jnp.float32)

    with dispatch.override(up_conv_impl="pallas"):
        ref = np.asarray(up2_conv3x3(x, k) + cr)
        got = np.asarray(up2_conv3x3(x, k, carry=cr))
        # interior identical; border rows/cols differ only by the
        # (corr + carry) reassociation — f32, so ~1e-6 relative
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

        def f_ref(x, k, cr):
            return jnp.sum((up2_conv3x3(x, k) + cr) ** 2)

        def f_got(x, k, cr):
            return jnp.sum(up2_conv3x3(x, k, carry=cr) ** 2)

        g_ref = jax.grad(f_ref, (0, 1, 2))(x, k, cr)
        g_got = jax.grad(f_got, (0, 1, 2))(x, k, cr)
    for a, b, nm in zip(g_got, g_ref, "xkc"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_skip_seam_carry_model_parity():
    """Skip forward+grad with seam_carry on vs off (pallas seam forced):
    same loss to float tolerance on a small flagship-shaped net."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dip_tpu.models import Skip
    from dip_tpu.ops import dispatch

    model = Skip(num_channels_down=[128] * 2, num_channels_up=[128] * 2,
                 num_channels_skip=[4] * 2, fold_bn=True)
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 8)), jnp.float32) * 0.1
    with dispatch.override(up_conv_impl="pallas", conv_impl="dots"):
        params = model.init(jax.random.key(0), z)

        def loss(p, on):
            with dispatch.override(seam_carry=on):
                return jnp.mean(model.apply(p, z) ** 2)

        l_off = loss(params, False)
        l_on = loss(params, True)
        g_off = jax.grad(lambda p: loss(p, False))(params)
        g_on = jax.grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    fl_off = jax.tree_util.tree_leaves(g_off)
    fl_on = jax.tree_util.tree_leaves(g_on)
    for a, b in zip(fl_on, fl_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
