"""TPU parity check for the Pallas fused up-conv seam emission.

CPU exactness of ops/pallas_up_conv.py runs in interpret mode
(tests/test_up_conv.py); this tool asserts fwd + grad parity of the real
compiled kernel against the 'dots' emission ON THE DEVICE, at the flagship
top-seam shape (LR 256^2, C=128 -> F=128 @ 512^2 output) and one
odd-width shape inside the envelope. Run before trusting any
up_conv_impl='pallas' timing (tools/profile_step.py 'bf16_upcp'/'f32_upcp').

Reference seam: conv3x3(pad(upsample2x(u))) in the Skip decoder,
/root/reference/models/skip.py:81-91.
"""

import argparse

import jax
import jax.numpy as jnp

from dip_tpu.ops import dispatch, up_conv


def check(h, w, c, f, dtype, up_mode="bilinear", pad_mode="reflection"):
    key = jax.random.PRNGKey(0)
    kx, kk, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, h, w, c), dtype)
    k = jax.random.normal(kk, (3, 3, c, f), dtype) * 0.1
    ct = jax.random.normal(kg, (1, 2 * h, 2 * w, f), dtype)

    def run(impl):
        with dispatch.override(up_conv_impl=impl):
            def loss_parts(x, k):
                z = up_conv.up2_conv3x3(x, k, up_mode, pad_mode)
                return jnp.vdot(z.astype(jnp.float32),
                                ct.astype(jnp.float32)), z

            (l, z), (dx, dk) = jax.jit(
                lambda x, k: jax.value_and_grad(
                    lambda x, k: loss_parts(x, k), argnums=(0, 1),
                    has_aux=True)(x, k))(x, k)
        return jax.device_get((z, dx, dk))

    za, dxa, dka = run("pallas")
    zb, dxb, dkb = run("dots")
    # bf16 tap sums differ in accumulation dtype (pallas is f32 in VMEM,
    # dots accumulates bf16 for HBM-bandwidth reasons) -> tolerance scales
    # with dtype.  On f32 the kernels run MIXED precision (bf16 MXU
    # operands, f32 accumulation — pallas_up_conv._mx, the same DEFAULT-
    # precision class as the shipped f32 XLA convs) while the 'dots'
    # reference here keeps f32 operands, so f32 parity is bf16-class too.
    rows = []
    for name, a, b in (("fwd", za, zb), ("dx", dxa, dxb), ("dk", dka, dkb)):
        tol = 3e-2
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        rows.append((name, rel))
        assert rel < tol, (name, rel, tol, (h, w, c, f, str(dtype)))
    print(f"  ok {h}x{w} c={c} f={f} {jnp.dtype(dtype).name} "
          + " ".join(f"{n}={r:.2e}" for n, r in rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="flagship shape only")
    args = ap.parse_args()
    print("devices:", jax.devices())
    from dip_tpu.ops import pallas_up_conv

    # narrow channels are OUTSIDE the envelope (Mosaic minor-dim shape
    # casts need 128-aligned C/F) -> up_conv falls back to 'dots'
    assert not pallas_up_conv.seam_ok(1, 64, 56, 32, 64, 2)
    # wide rows overflow scoped VMEM (fleet 448x704's top seam OOMed on
    # v5e at w=352 f32) -> dots fallback
    assert not pallas_up_conv.seam_ok(1, 224, 352, 128, 128, 4)
    assert not pallas_up_conv.seam_ok(1, 224, 352, 128, 128, 2)
    assert pallas_up_conv.seam_ok(1, 256, 256, 128, 128, 2)
    assert pallas_up_conv.seam_ok(1, 256, 256, 128, 128, 4)
    for dtype in (jnp.bfloat16, jnp.float32):
        check(256, 256, 128, 128, dtype)           # flagship top seam
        if not args.quick:
            check(64, 72, 128, 128, dtype)         # non-square, small
            check(64, 64, 128, 128, dtype, up_mode="nearest")
    print("pallas seam parity: PASS")


if __name__ == "__main__":
    main()
