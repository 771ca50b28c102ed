"""Exactness of the border-corrected conv vs materialized pad + conv.

conv2d_borderfix must reproduce conv_valid(pad2d(x, 1, mode)) bit-closely
for every (mode, stride) combination it claims to support, including the
corner cells where row and column ghosts interact — and its gradients must
match too, since it runs inside the DIP autodiff loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.ops.border_conv import can_borderfix, conv2d_borderfix
from dip_tpu.ops.pad import pad2d

DN = ("NHWC", "HWIO", "NHWC")


def _reference(x, kernel, stride, mode):
    xp = pad2d(x, 1, mode)
    return jax.lax.conv_general_dilated(
        xp, kernel, (stride, stride), "VALID", dimension_numbers=DN)


@pytest.mark.parametrize("mode", ["reflection", "replication"])
@pytest.mark.parametrize("stride,h,w", [(1, 12, 16), (1, 13, 11),
                                        (2, 12, 16), (2, 8, 8)])
def test_borderfix_matches_padded_conv(mode, stride, h, w):
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, h, w, 5))
    kernel = jax.random.normal(k2, (3, 3, 5, 7))
    assert can_borderfix(3, stride, h, w, mode)
    got = conv2d_borderfix(x, kernel, stride, mode)
    want = _reference(x, kernel, stride, mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["reflection", "replication"])
@pytest.mark.parametrize("stride", [1, 2])
def test_borderfix_gradients_match(mode, stride):
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k1, (1, 8, 10, 3))
    kernel = jax.random.normal(k2, (3, 3, 3, 4))

    def loss_fast(x, k):
        y = conv2d_borderfix(x, k, stride, mode)
        return jnp.sum(y * ct)

    def loss_ref(x, k):
        y = _reference(x, k, stride, mode)
        return jnp.sum(y * ct)

    out_shape = _reference(x, kernel, stride, mode).shape
    ct = jax.random.normal(k3, out_shape)
    gx1, gk1 = jax.grad(loss_fast, argnums=(0, 1))(x, kernel)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-5, atol=1e-5)


def test_can_borderfix_gating():
    assert not can_borderfix(5, 1, 32, 32, "reflection")      # ks != 3
    assert not can_borderfix(3, 2, 31, 32, "reflection")      # odd H, stride 2
    assert not can_borderfix(3, 1, 32, 32, "zero")            # zero pad
    assert not can_borderfix(3, 3, 32, 32, "reflection")      # stride 3
    assert can_borderfix(3, 1, 3, 3, "replication")


def test_skip_fused_vs_materialized_concat():
    """End-to-end: Skip(fuse_concat=True) == Skip(fuse_concat=False), same
    params (identical tree paths AND values), same output."""
    from dip_tpu.models import Skip
    from dip_tpu.utils.noise import get_noise

    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    kw = dict(num_channels_down=[12] * 2, num_channels_up=[12] * 2,
              num_channels_skip=[4] * 2, upsample_mode="bilinear",
              pad="reflection")
    m1 = Skip(fuse_concat=True, **kw)
    m2 = Skip(fuse_concat=False, **kw)
    v1 = m1.init({"params": jax.random.key(0), "noise": jax.random.key(2)}, z)
    v2 = m2.init({"params": jax.random.key(0), "noise": jax.random.key(2)}, z)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    p2 = jax.tree_util.tree_leaves_with_path(v2)
    assert ([jax.tree_util.keystr(k) for k, _ in p1]
            == [jax.tree_util.keystr(k) for k, _ in p2])
    for (k, a), (_, b) in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))
    o1 = m1.apply(v1, z, rngs={"noise": jax.random.key(3)})
    o2 = m2.apply(v2, z, rngs={"noise": jax.random.key(3)})
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-5, atol=2e-5)


def test_skip_fold_bn_exact():
    """Skip(fold_bn=True) == Skip(fold_bn=False): the post-concat BN folded
    into the decoder conv as a kernel affine is numerically equivalent (and
    the param tree is unchanged). Checked for both concat paths and for a
    grad through the loss."""
    from dip_tpu.models import Skip
    from dip_tpu.utils.noise import get_noise

    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    kw = dict(num_channels_down=[12] * 2, num_channels_up=[12] * 2,
              num_channels_skip=[4] * 2, upsample_mode="bilinear",
              pad="reflection")
    for fuse in (True, False):
        m1 = Skip(fold_bn=True, fuse_concat=fuse, **kw)
        m2 = Skip(fold_bn=False, fuse_concat=fuse, **kw)
        v1 = m1.init({"params": jax.random.key(0), "noise": jax.random.key(2)}, z)
        v2 = m2.init({"params": jax.random.key(0), "noise": jax.random.key(2)}, z)
        k1 = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(v1)]
        k2 = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(v2)]
        assert k1 == k2
        o1 = m1.apply(v1, z, rngs={"noise": jax.random.key(3)})
        o2 = m2.apply(v2, z, rngs={"noise": jax.random.key(3)})
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)
        g1 = jax.grad(lambda v: jnp.sum(
            m1.apply(v, z, rngs={"noise": jax.random.key(3)}) ** 2))(v1)
        g2 = jax.grad(lambda v: jnp.sum(
            m2.apply(v, z, rngs={"noise": jax.random.key(3)}) ** 2))(v2)
        # Compare the full grad vector globally: per-leaf comparison is
        # dominated by leaves whose true grad is exactly 0 (every conv bias
        # that feeds a BN — BN is shift-invariant), where both programs
        # produce only ~1e-5 cancellation noise.
        va = np.concatenate([np.asarray(l).ravel()
                             for l in jax.tree_util.tree_leaves(g1)])
        vb = np.concatenate([np.asarray(l).ravel()
                             for l in jax.tree_util.tree_leaves(g2)])
        denom = float(np.linalg.norm(vb))
        assert float(np.linalg.norm(va - vb)) < 1e-4 * denom, (
            float(np.linalg.norm(va - vb)) / denom)


def test_conv2d_dots_matches_xla():
    """conv-as-shifted-matmuls == lax.conv (fwd + both grads), across
    kernel sizes, strides, and paddings."""
    from dip_tpu.ops.dot_conv import conv2d_dots

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    rng = np.random.default_rng(0)
    for kh, kw, stride, pad in [(3, 3, 1, ((1, 1), (1, 1))),
                                (3, 3, 2, ((1, 0), (1, 0))),
                                (1, 1, 1, "VALID"),
                                (5, 5, 1, ((2, 2), (2, 2))),
                                (3, 3, 1, "VALID")]:
        x = jnp.asarray(rng.normal(size=(1, 12, 10, 5)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(kh, kw, 5, 7)), jnp.float32)

        def f_dots(x, k):
            return jnp.sum(conv2d_dots(x, k, stride, pad) ** 2)

        def f_xla(x, k):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, k, (stride, stride), pad, dimension_numbers=dn) ** 2)

        np.testing.assert_allclose(
            np.asarray(conv2d_dots(x, k, stride, pad)),
            np.asarray(jax.lax.conv_general_dilated(
                x, k, (stride, stride), pad, dimension_numbers=dn)),
            rtol=1e-5, atol=1e-5, err_msg=str((kh, kw, stride, pad)))
        for ga, gb in zip(jax.grad(f_dots, (0, 1))(x, k),
                          jax.grad(f_xla, (0, 1))(x, k)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=str((kh, kw, stride, pad)))


def test_conv2d_dots_s2d_wide_exact():
    """conv_s2d_wide routes wide-channel stride-2 convs through the
    space-to-depth form; it must stay exact vs the strided-tap form
    (fwd + both grads, odd and even spatial extents)."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.dot_conv import conv2d_dots

    rng = np.random.default_rng(3)
    for h, w in [(12, 10), (11, 9)]:
        x = jnp.asarray(rng.normal(size=(1, h, w, 96)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 96, 8)), jnp.float32)
        pad = ((1, 0), (1, 0))

        def f(x, k):
            return jnp.sum(conv2d_dots(x, k, 2, pad) ** 2)

        ref_out = np.asarray(conv2d_dots(x, k, 2, pad))
        ref_gx, ref_gk = jax.grad(f, (0, 1))(x, k)
        with dispatch.override(conv_s2d_wide=True):
            wide_out = np.asarray(conv2d_dots(x, k, 2, pad))
            gx, gk = jax.grad(f, (0, 1))(x, k)
        np.testing.assert_allclose(wide_out, ref_out, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(ref_gk),
                                   rtol=1e-4, atol=1e-4)


def test_conv2d_dots_s2d_packed_exact():
    """s2d_packed contracts the 4-D packed s2d tensor with the remapped
    (qk, qk, 4C, F) kernel; it must stay exact vs the 6-D-view tap form
    (fwd + both grads), across odd/even extents, k=3 and k=5, and both
    the thin-channel (z input) and wide (conv_s2d_wide) routes."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.dot_conv import conv2d_dots

    rng = np.random.default_rng(13)
    for (h, w), ch, kk in [((12, 10), 32, 3), ((11, 9), 32, 3),
                           ((14, 14), 96, 3), ((13, 13), 32, 5)]:
        x = jnp.asarray(rng.normal(size=(1, h, w, ch)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(kk, kk, ch, 8)), jnp.float32)
        pad = ((kk // 2, kk // 2 - 1), (kk // 2, kk // 2 - 1))

        def f(x, k):
            return jnp.sum(conv2d_dots(x, k, 2, pad) ** 2)

        wide = ch > 64
        with dispatch.override(conv_s2d_wide=wide):
            ref_out = np.asarray(conv2d_dots(x, k, 2, pad))
            ref_gx, ref_gk = jax.grad(f, (0, 1))(x, k)
            with dispatch.override(s2d_packed="xla"):
                out = np.asarray(conv2d_dots(x, k, 2, pad))
                gx, gk = jax.grad(f, (0, 1))(x, k)
        np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5,
                                   err_msg=str((h, w, ch, kk)))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=str((h, w, ch, kk)))
        # gk entries are O(1e2-1e3) sums over all output positions; the
        # packed form's different accumulation order leaves ~1e-3 abs noise
        np.testing.assert_allclose(np.asarray(gk), np.asarray(ref_gk),
                                   rtol=1e-4, atol=5e-3,
                                   err_msg=str((h, w, ch, kk)))


def test_pallas_s2d_pack_exact():
    """ops/pallas_s2d.s2d_pack (interpret mode on CPU) is the exact
    (p, q, ci) packing permutation, its VJP is the exact inverse, and the
    end-to-end packed conv path matches the 6-D-view path — including a
    ragged final row tile (H/2 not a multiple of the kernel's row tile)."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.dot_conv import conv2d_dots
    from dip_tpu.ops.pallas_s2d import pack_ok, s2d_pack

    rng = np.random.default_rng(17)
    for h, w in [(32, 32), (34, 18)]:  # 34/2 = 17: ragged tail block
        x = jnp.asarray(rng.normal(size=(1, h, w, 32)), jnp.float32)
        assert pack_ok(1, h, w, 32)
        got = np.asarray(s2d_pack(x))
        want = np.asarray(x).reshape(1, h // 2, 2, w // 2, 2, 32)
        want = want.transpose(0, 1, 3, 2, 4, 5).reshape(
            1, h // 2, w // 2, 128)
        np.testing.assert_array_equal(got, want)
        # VJP = exact inverse permutation
        ct = jnp.asarray(rng.normal(size=got.shape), jnp.float32)
        (dx,) = jax.vjp(s2d_pack, x)[1](ct)
        back = np.asarray(ct).reshape(1, h // 2, w // 2, 2, 2, 32)
        back = back.transpose(0, 1, 3, 2, 4, 5).reshape(1, h, w, 32)
        np.testing.assert_array_equal(np.asarray(dx), back)

        k = jnp.asarray(rng.normal(size=(3, 3, 32, 8)), jnp.float32)
        pad = ((1, 0), (1, 0))
        ref = np.asarray(conv2d_dots(x, k, 2, pad))
        with dispatch.override(s2d_packed="pallas"):
            out = np.asarray(conv2d_dots(x, k, 2, pad))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv2d_dots_custom_vjp_exact():
    """dots_vjp's hand-written backward (dgrad-as-conv + per-tap wgrad
    einsums) matches autodiff of the tap form, for 3x3 pad-1 and the
    stride-1 asymmetric-pad forms the net uses."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.dot_conv import conv2d_dots

    rng = np.random.default_rng(7)
    for pad in [((1, 1), (1, 1)), ((1, 0), (1, 0)), ((2, 2), (2, 2))]:
        kh = 3 if max(pad[0]) < 2 else 5
        x = jnp.asarray(rng.normal(size=(1, 9, 11, 6)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(kh, kh, 6, 5)), jnp.float32)
        co = jnp.asarray(rng.normal(
            size=(1, 9 + sum(pad[0]) - kh + 1, 11 + sum(pad[1]) - kh + 1, 5)),
            jnp.float32)

        def f(x, k):
            return jnp.sum(conv2d_dots(x, k, 1, pad) * co)

        ref_out = np.asarray(conv2d_dots(x, k, 1, pad))
        ref_gx, ref_gk = jax.grad(f, (0, 1))(x, k)
        with dispatch.override(dots_vjp=True):
            out = np.asarray(conv2d_dots(x, k, 1, pad))
            gx, gk = jax.grad(f, (0, 1))(x, k)
        np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5,
                                   err_msg=str(pad))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                                   rtol=1e-4, atol=1e-4, err_msg=str(pad))
        np.testing.assert_allclose(np.asarray(gk), np.asarray(ref_gk),
                                   rtol=1e-4, atol=1e-4, err_msg=str(pad))


def test_conv2d_fast_s2d_f32_dispatch_exact():
    """s2d_f32 routes the f32 thin-channel stride-2 conv through the
    space-to-depth dots form; output must match the XLA conv op path."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.pallas_wgrad import conv2d_fast

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 8)), jnp.float32)
    pad = ((1, 0), (1, 0))
    ref = np.asarray(conv2d_fast(x, k, 2, pad))
    with dispatch.override(s2d_f32=True):
        out = np.asarray(conv2d_fast(x, k, 2, pad))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_thin_conv_emissions_exact():
    """The thin-channel stride-1 3x3 emissions ('conv' op and 'im2col'
    single dot, dispatch.thin_conv) match the tap-dot form exactly in
    fwd and both grads — the decoder's HR skip branch (C=4,
    /root/reference/models/skip.py:46,57-60) is the production shape."""
    from dip_tpu.ops import dispatch
    from dip_tpu.ops.dot_conv import conv2d_dots

    rng = np.random.default_rng(17)
    for (h, w), ch in [((12, 10), 4), ((9, 11), 3), ((8, 8), 16)]:
        x = jnp.asarray(rng.normal(size=(1, h, w, ch)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, ch, 8)), jnp.float32)
        pad = ((1, 1), (1, 1))

        def f(x, k):
            return jnp.sum(conv2d_dots(x, k, 1, pad) ** 2)

        with dispatch.override(thin_conv="dots"):
            ref_out = np.asarray(conv2d_dots(x, k, 1, pad))
            ref_gx, ref_gk = jax.grad(f, (0, 1))(x, k)
        for impl in ("conv", "im2col"):
            with dispatch.override(thin_conv=impl):
                out = np.asarray(conv2d_dots(x, k, 1, pad))
                gx, gk = jax.grad(f, (0, 1))(x, k)
            np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5,
                                       err_msg=str((impl, h, w, ch)))
            np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=str((impl, h, w, ch)))
            np.testing.assert_allclose(np.asarray(gk), np.asarray(ref_gk),
                                       rtol=1e-4, atol=1e-3,
                                       err_msg=str((impl, h, w, ch)))
