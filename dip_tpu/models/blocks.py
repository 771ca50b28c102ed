"""Shared building blocks for the generator zoo (flax.linen, NHWC).

TPU-first re-design of /root/reference/models/common.py: the same
computational vocabulary (pad->conv->optional antialiased downsample, BN,
LeakyReLU/Swish/ELU, center-crop-aligned concat, fresh-noise injection) as
pure functional modules.  Convolutions use torch-style kaiming-uniform
fan-in init so optimization dynamics match the reference's PyTorch 0.4
defaults (DIP is init-sensitive).

BatchNorm here is *always-train-mode*: DIP fits a single image, so batch
statistics act as instance statistics and the reference never meaningfully
calls eval() (models/resnet.py:26-30 even crashes if you try).  Dropping
running averages removes all mutable state, which keeps the whole fit loop a
pure function of (params, rng) — exactly what lax.scan wants.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dip_tpu.ops.border_conv import can_borderfix, conv2d_borderfix
from dip_tpu.ops.pad import pad2d
from dip_tpu.ops.pallas_wgrad import conv2d_fast
from dip_tpu.ops.resample import avg_pool, downsample, max_pool, upsample
from dip_tpu.ops.up_conv import Up2, up2_conv3x3, up2_moments


# ---------------------------------------------------------------------------
# init (torch Conv2d defaults: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """HWIO kernel ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kh, kw, in_f, _ = shape
    bound = 1.0 / np.sqrt(kh * kw * in_f)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def act(x: jnp.ndarray, act_fun: str | Callable = "LeakyReLU") -> jnp.ndarray:
    """Activation dispatcher (common.py:76-92)."""
    if callable(act_fun):
        return act_fun(x)
    if act_fun == "LeakyReLU":
        return nn.leaky_relu(x, negative_slope=0.2)
    if act_fun == "Swish":
        return x * jax.nn.sigmoid(x)
    if act_fun == "ELU":
        return nn.elu(x)
    if act_fun == "ReLU":
        return nn.relu(x)
    if act_fun == "none":
        return x
    raise ValueError(f"unknown activation {act_fun!r}")


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

class TrainBatchNorm(nn.Module):
    """Affine batch norm that always normalizes by current batch statistics.

    Equivalent to torch BatchNorm2d in training mode (the only mode the
    reference uses). Stateless: no running averages to thread through scan.

    Also accepts a *list* of NHWC parts representing a virtual channel
    concat: BN statistics are per-channel, so normalizing each part with the
    corresponding slice of one full-width scale/bias is numerically identical
    to BN(concat(parts)) — while never materializing the concatenated tensor
    (on TPU a 128+4=132-lane tensor pads to 256 lanes and costs ~2x HBM
    traffic on every op that touches it). Parameter shapes are unchanged.
    """

    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, as_affine: bool = False):
        """Normalize x (default), or with `as_affine=True` return
        `(x, s, t)` such that BN(x) == x * s + t per channel — without
        materializing the normalized tensor. A following conv folds (s, t)
        into its kernel/bias (`Conv(in_scale=, in_shift=)`), which removes
        one full-resolution write+read per BN->conv site; exact because
        conv is linear and reflect/replicate padding commutes with
        per-channel affine maps. Parameter shapes/paths are unchanged."""
        parts = isinstance(x, (list, tuple))
        xs = list(x) if parts else [x]
        c = sum(p.shape[-1] for p in xs)
        scale = (self.param("scale", nn.initializers.ones, (c,))
                 if self.use_scale else None)
        bias = (self.param("bias", nn.initializers.zeros, (c,))
                if self.use_bias else None)

        def moments(p):
            # Up2 parts (virtual 2x upsample, ops/up_conv.py): HR moments
            # computed on the LR tensor, the upsampled tensor never exists
            if isinstance(p, Up2):
                return up2_moments(p.x, p.mode)
            from dip_tpu.ops import dispatch

            if dispatch.bn_moments() == "sumsq":
                # single pass over p: sum and sum-of-squares reduce in one
                # fused read (jnp.var re-reads p after the mean is known);
                # f32 accumulation, var = E[p^2] - E[p]^2
                m = p.shape[0] * p.shape[1] * p.shape[2]
                s1 = jnp.einsum("nhwc->c", p,
                                preferred_element_type=jnp.float32)
                s2 = jnp.einsum("nhwc,nhwc->c", p, p,
                                preferred_element_type=jnp.float32)
                mean = s1 / m
                var = jnp.maximum(s2 / m - mean * mean, 0.0)
                return mean.astype(p.dtype), var.astype(p.dtype)
            return jnp.mean(p, axis=(0, 1, 2)), jnp.var(p, axis=(0, 1, 2))

        if as_affine:
            ss, ts, off = [], [], 0
            for p in xs:
                ci = p.shape[-1]
                mean, var = moments(p)
                s = jax.lax.rsqrt(var + self.eps)
                if scale is not None:
                    s = s * scale[off:off + ci]
                t = -mean * s
                if bias is not None:
                    t = t + bias[off:off + ci]
                ss.append(s)
                ts.append(t)
                off += ci
            s_full = jnp.concatenate(ss)
            t_full = jnp.concatenate(ts)
            return (x if parts else xs[0]), s_full, t_full
        out, off = [], 0
        for p in xs:
            ci = p.shape[-1]
            mean, var = moments(p)
            if isinstance(p, Up2):
                # per-channel affines commute with upsampling: stay virtual
                s = jax.lax.rsqrt(var + self.eps)
                if scale is not None:
                    s = s * scale[off:off + ci]
                t = -mean * s
                if bias is not None:
                    t = t + bias[off:off + ci]
                y = p.affine(s, t)
            else:
                y = (p - mean) * jax.lax.rsqrt(var + self.eps)
                if scale is not None:
                    y = y * scale[off:off + ci]
                if bias is not None:
                    y = y + bias[off:off + ci]
            out.append(y)
            off += ci
        return out if parts else out[0]


class InstanceNorm(nn.Module):
    """Per-image, per-channel normalization over (H, W).

    Matches torch InstanceNorm2d defaults (affine=False) used as UNet's
    default norm layer (models/unet.py:39).
    """

    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            y = y * self.param("scale", nn.initializers.ones, (c,))
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


def norm(x: jnp.ndarray, kind: str | None = "batch") -> jnp.ndarray:
    if kind in (None, "none"):
        return x
    if kind == "batch":
        return TrainBatchNorm()(x)
    if kind == "instance":
        return InstanceNorm()(x)
    raise ValueError(f"unknown norm {kind!r}")


# ---------------------------------------------------------------------------
# conv block
# ---------------------------------------------------------------------------

class _ConvParams(nn.Module):
    """Parameter holder that mirrors nn.Conv's param tree ('kernel'/'bias').

    Used by Conv's virtual-concat path: instantiated with name='Conv_0' it
    occupies exactly the path flax would auto-assign to the nn.Conv child, so
    checkpoints, the torch converter, and init RNG streams are bit-identical
    between the fused and materialized code paths.
    """

    kshape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_kernel_init, self.kshape)
        bias = None
        if self.use_bias:
            fan_in = self.kshape[0] * self.kshape[1] * self.kshape[2]
            bias = self.param("bias", torch_conv_bias_init(fan_in),
                              (self.kshape[-1],))
        return kernel, bias


class Conv(nn.Module):
    """Padded conv with optional decoupled antialiased downsampling.

    The reference's conv() (common.py:99-124): when stride != 1 and
    downsample_mode != 'stride', the conv runs at stride 1 and is followed by
    avg/max pooling or a fixed Lanczos downsampler.

    Also accepts a *list* of NHWC parts as a virtual channel concat:
    conv(concat(parts), W) == sum_i conv(part_i, W[:, :, slice_i, :]), so the
    concatenated tensor (whose odd channel count, e.g. 132 = 128 + 4 in the
    skip net, pads to 256 TPU lanes and doubles HBM traffic) is never built.
    The single full-width kernel parameter is declared either way.
    """

    features: int
    kernel_size: int
    stride: int = 1
    bias: bool = True
    pad: str = "zero"
    downsample_mode: str = "stride"

    @nn.compact
    def __call__(self, x, in_scale: jnp.ndarray | None = None,
                 in_shift: jnp.ndarray | None = None) -> jnp.ndarray:
        """`in_scale`/`in_shift` fold a preceding per-channel affine map
        (e.g. train-mode BN, see TrainBatchNorm(as_affine=True)) into the
        conv: conv(x*s + t, W) == conv(x, W*s) + sum_hwi W[h,w,i,:]*t[i].
        Exact for reflect/replicate padding (spatial pad commutes with the
        channel affine) and for 1x1 convs; rejected otherwise."""
        ks = self.kernel_size
        stride = self.stride
        post_down = None
        if stride != 1 and self.downsample_mode != "stride":
            post_down = self.downsample_mode
            stride = 1

        if in_scale is not None and ks > 1 and self.pad not in (
                "reflection", "replication"):
            raise ValueError(
                "affine folding into a zero-padded k>1 conv is not exact "
                "(padded zeros lack the shift); materialize the BN instead")

        to_pad = (ks - 1) // 2
        parts_in = isinstance(x, (list, tuple))
        xs = list(x) if parts_in else [x]
        c_total = sum(p.shape[-1] for p in xs)
        # one full-width kernel param at the same path nn.Conv would use
        kernel, bias_p = _ConvParams(
            (ks, ks, c_total, self.features), self.bias, name="Conv_0")()

        y = None
        off = 0
        for p in xs:
            ci = p.shape[-1]
            kp = kernel[:, :, off:off + ci, :] if parts_in else kernel
            if in_scale is not None:
                kp = kp * in_scale[off:off + ci].astype(kp.dtype)[None, None, :, None]
            if isinstance(p, Up2):
                # fused upsample2x -> conv3x3 (ops/up_conv.py): the upsampled
                # tensor never materializes; the Skip decoder gates creation
                # of Up2 parts on ks == 3, stride == 1, reflect/replicate pad
                assert ks == 3 and stride == 1, (ks, stride)
                from dip_tpu.ops import dispatch as _dispatch

                if y is not None and _dispatch.seam_carry():
                    # fold the accumulated non-seam parts (the skip-branch
                    # conv) into the seam's epilogue add
                    y = up2_conv3x3(p.x, kp, p.mode, self.pad, carry=y)
                    off += ci
                    continue
                yi = up2_conv3x3(p.x, kp, p.mode, self.pad)
            elif self.pad in ("reflection", "replication") and to_pad > 0:
                if can_borderfix(ks, stride, p.shape[1], p.shape[2], self.pad):
                    # zero-pad conv + strip corrections: exact, and never
                    # materializes the (H+2, W+2) padded tensor
                    yi = conv2d_borderfix(p, kp, stride, self.pad)
                else:
                    pp = pad2d(p, to_pad, self.pad)
                    yi = conv2d_fast(pp, kp, stride, "VALID")
            else:
                yi = conv2d_fast(p, kp, stride,
                                 ((to_pad, to_pad), (to_pad, to_pad)))
            y = yi if y is None else y + yi
            off += ci
        if in_shift is not None:
            y = y + jnp.einsum("hwio,i->o", kernel,
                               in_shift.astype(kernel.dtype)).astype(y.dtype)
        if bias_p is not None:
            y = y + bias_p.astype(y.dtype)

        if post_down == "avg":
            y = avg_pool(y, self.stride)
        elif post_down == "max":
            y = max_pool(y, self.stride)
        elif post_down in ("lanczos2", "lanczos3"):
            y = downsample(y, self.stride, kernel_type=post_down, phase=0.5,
                           preserve_size=True)
        elif post_down is not None:
            raise ValueError(f"unknown downsample_mode {post_down!r}")
        return y


class ConvTranspose(nn.Module):
    """Transposed conv (DCGAN generator / UNet 'deconv' up path)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size
        fan_in = ks * ks * x.shape[-1]
        # torch ConvTranspose2d(padding=p) trims p from each spatial edge.
        p = self.padding
        pad_cfg = ((ks - 1 - p, ks - 1 - p), (ks - 1 - p, ks - 1 - p))
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(ks, ks),
            strides=(self.stride, self.stride),
            padding=pad_cfg,
            use_bias=self.bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
        )(x)


# ---------------------------------------------------------------------------
# structural ops
# ---------------------------------------------------------------------------

def crop_to_min(tensors: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Center-crop all NHWC inputs to the smallest common H, W
    (common.py:19-39). Shapes are static under jit, so the crop is free when
    sizes already agree."""
    hs = [t.shape[1] for t in tensors]
    ws = [t.shape[2] for t in tensors]
    th, tw = min(hs), min(ws)
    out = []
    for t in tensors:
        dh = (t.shape[1] - th) // 2
        dw = (t.shape[2] - tw) // 2
        out.append(t[:, dh : dh + th, dw : dw + tw, :])
    return out


def concat_cropped(tensors: Sequence[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Channel-concat after center-cropping to the smallest H, W."""
    return jnp.concatenate(crop_to_min(tensors), axis=axis)


class GenNoise(nn.Module):
    """Emit fresh N(0,1) noise shaped like the input but with `features`
    channels (common.py:45-60). Requires an rng stream named 'noise'."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        key = self.make_rng("noise")
        return jax.random.normal(key, (n, h, w, self.features), dtype=x.dtype)


__all__ = [
    "act",
    "norm",
    "TrainBatchNorm",
    "InstanceNorm",
    "Conv",
    "ConvTranspose",
    "concat_cropped",
    "crop_to_min",
    "GenNoise",
    "upsample",
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
]
