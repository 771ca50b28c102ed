"""Backend numerical-consistency audit.

Runs a battery of tiny 60-iter fits — one per architecture feature that
lowers differently (stride/avg/max/lanczos downsampling, nearest/bilinear
upsampling, deconv, texture pyramid, identity+input) — and prints final
losses as JSON. Run once with DIP_PLATFORM=cpu and once on the TPU, then
compare: a backend miscompile shows up as a loss that converges on CPU but
not on TPU (this is exactly how the grouped-conv autodiff bug manifested).

    python tools/consistency_check.py > tpu.json
    DIP_PLATFORM=cpu python tools/consistency_check.py > cpu.json
    python tools/consistency_check.py --compare tpu.json cpu.json
"""

import argparse
import json
import sys

from dip_tpu.utils.platform import apply_platform_env


def run_battery():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dip_tpu.fit.engine import Engine, FitConfig
    from dip_tpu.models import DCGAN, Identity, Skip, TextureNet, UNet
    from dip_tpu.ops.losses import mse
    from dip_tpu.ops.resample import downsample
    from dip_tpu.utils.noise import get_noise

    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    target = jnp.asarray(
        np.stack([np.sin(xx / 5) * .5 + .5, np.cos(yy / 7) * .5 + .5,
                  (xx + yy) / 64], -1)[None])

    def fit(name, model, depth=8, n=60, loss=None, lr=0.01, opt_input=False,
            z=None):
        cfg = FitConfig(num_iter=n, lr=lr, log_every=n, opt_input=opt_input)
        loss = loss or (lambda p, o, a: mse(o, a))
        eng = Engine(model, loss, cfg)
        if z is None:
            z = get_noise(jax.random.key(1), depth, "noise", (32, 32))
        st = eng.init_state(jax.random.key(0), z)
        st, hist = eng.run(st, target)
        return float(hist["loss"][-1])

    results = {}
    mk = lambda **kw: Skip(num_channels_down=[8, 8], num_channels_up=[8, 8],
                           num_channels_skip=[2, 2], **kw)
    results["skip_stride_nearest"] = fit("s", mk())
    results["skip_avg_bilinear"] = fit("a", mk(downsample_mode="avg",
                                               upsample_mode="bilinear"))
    results["skip_max"] = fit("m", mk(downsample_mode="max"))
    results["skip_lanczos2"] = fit("l", mk(downsample_mode="lanczos2"))
    results["skip_reflection_swish"] = fit("r", mk(pad="reflection",
                                                   act_fun="Swish"))
    results["unet_deconv"] = fit("u", UNet(feature_scale=16,
                                           upsample_mode="deconv",
                                           norm_kind="instance"), depth=3)
    results["texture"] = fit("t", TextureNet(ratios=(2, 1), conv_num=4),
                             depth=3)
    results["identity_input"] = fit("i", Identity(), depth=3, opt_input=True,
                                    lr=0.05)
    # SR-style loss through the downsampler
    lr_t = downsample(target, 4, "lanczos2", 0.5, True)
    results["sr_downsample_loss"] = fit(
        "sr", mk(), loss=lambda p, o, a: mse(
            downsample(o, 4, "lanczos2", 0.5, True), lr_t))

    # learnable degradation kernel in the loss (opt_over='net,down')
    from dip_tpu.models.downsampler import LearnableDownsampler

    ld = LearnableDownsampler(factor=2)
    ld_vars = jax.jit(ld.init)(jax.random.key(5), target)
    lr2 = downsample(target, 2, "lanczos2", 0.5, True)

    def ld_loss(p, o, a):
        return mse(ld.apply({"params": p["down"]}, o), lr2)

    cfg = FitConfig(num_iter=60, lr=0.01, log_every=60)
    eng = Engine(mk(), ld_loss, cfg)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    st = eng.init_state(jax.random.key(0), z,
                        extra_params={"down": ld_vars["params"]})
    st, hist = eng.run(st, None)
    results["learnable_downsampler"] = float(hist["loss"][-1])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        a = json.load(open(args.compare[0]))
        b = json.load(open(args.compare[1]))
        bad = False
        for k in a:
            ra, rb = a[k], b[k]
            ratio = max(ra, rb) / max(min(ra, rb), 1e-12)
            flag = "OK" if ratio < 5 else "MISMATCH"
            bad |= flag != "OK"
            print(f"{k:28s} {ra:.3e} vs {rb:.3e}  x{ratio:8.1f}  {flag}")
        sys.exit(1 if bad else 0)
    apply_platform_env()
    print(json.dumps(run_battery(), indent=1))


if __name__ == "__main__":
    main()
