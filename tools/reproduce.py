"""Reproduce the reference's flagship recipes on its own bundled images.

Runs every headline workload from the reference notebooks on the actual
files under /root/reference/data (denoising.ipynb cell 6, inpainting.ipynb
cell 7, super-resolution.ipynb cell 5, restoration.ipynb cell 7,
flash-no-flash.ipynb) with the exact notebook hyperparameters, records
quality + throughput per recipe, and writes output images to results/.

    python tools/reproduce.py                   # all recipes, full iters
    python tools/reproduce.py --only f16,kate   # subset
    python tools/reproduce.py --quick           # 20-iter smoke of each

Each run appends one JSON line to results/reproduce.jsonl; RESULTS.md is
assembled from those records.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# resolved lazily so a missing mount fails with ONE actionable message
# (main() validates up front via dip_tpu.data.reference_data_dir)
DATA = os.environ.get("DIP_REFERENCE_DATA", "/root/reference/data")
OUTDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results")


def _load(path, d=32):
    from dip_tpu.utils.image_io import crop_image, load_image, pil_to_np

    return pil_to_np(crop_image(load_image(path), d=d))


def _save(name, arr_nhwc):
    from dip_tpu.utils.image_io import nhwc_to_hwc, save_image

    os.makedirs(OUTDIR, exist_ok=True)
    if COMPUTE_DTYPE:  # don't clobber the f32 reference outputs
        name = f"{COMPUTE_DTYPE}_{name}"
    path = os.path.join(OUTDIR, name)
    save_image(path, np.clip(nhwc_to_hwc(arr_nhwc), 0, 1))
    return path


COMPUTE_DTYPE = None  # set by --compute-dtype for bf16 quality validation


def _run(spec, seed=0):
    import jax

    from dip_tpu.tasks.base import run_task

    if COMPUTE_DTYPE:
        import dataclasses

        spec.cfg = dataclasses.replace(spec.cfg, compute_dtype=COMPUTE_DTYPE)

    def cb(it, hist, state):
        msg = f"  iter {it:5d}  loss {hist['loss'][-1]:.6f}"
        for k in ("psnr_gt", "psnr_gt_sm", "psnr_hr", "psnr_full"):
            if k in hist:
                msg += f"  {k} {hist[k][-1]:.2f}"
        print(msg, flush=True)

    t0 = time.time()
    out, state, hist = run_task(spec, jax.random.key(seed), callback=cb)
    dt = time.time() - t0
    return out, state, hist, dt


def _stats(hist, key):
    if key not in hist:
        return {}
    h = np.asarray(hist[key])
    return {f"{key}_final": round(float(h[-1]), 3),
            f"{key}_best": round(float(h.max()), 3)}


# --------------------------------------------------------------------------
# recipes
# --------------------------------------------------------------------------

def recipe_f16(iters=None):
    """denoising.ipynb: F16, sigma=25, 3000 Adam iters (cells 6-10)."""
    from dip_tpu.tasks import denoise
    from dip_tpu.utils.image_io import hwc_to_nhwc

    img = _load(f"{DATA}/denoising/F16_GT.png")
    noisy = denoise.get_noisy_image(img, 25 / 255.0)
    spec = denoise.task(hwc_to_nhwc(noisy), preset="f16",
                        gt=hwc_to_nhwc(img), num_iter=iters)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": "denoise/f16 sigma=25", "image": "F16_GT.png",
           "size": f"{img.shape[1]}x{img.shape[0]}",
           "psnr_noisy_input": round(float(
               -10 * np.log10(np.mean((noisy - img) ** 2))), 3)}
    rec.update(_stats(hist, "psnr_gt"))
    rec.update(_stats(hist, "psnr_gt_sm"))
    rec["out"] = _save("f16_out.png", out)
    _save("f16_ema.png", state.ema_out)
    return rec, hist, dt, spec.cfg.num_iter


def recipe_snail(iters=None):
    """denoising.ipynb blind de-JPEG: snail, 2400 iters, no GT."""
    from dip_tpu.tasks import denoise
    from dip_tpu.utils.image_io import hwc_to_nhwc

    img = _load(f"{DATA}/denoising/snail.jpg")
    spec = denoise.task(hwc_to_nhwc(img), preset="snail", num_iter=iters)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": "denoise/snail (blind de-JPEG)", "image": "snail.jpg",
           "size": f"{img.shape[1]}x{img.shape[0]}",
           "loss_final": round(float(np.asarray(hist["loss"])[-1]), 6)}
    rec["out"] = _save("snail_out.png", state.ema_out)
    return rec, hist, dt, spec.cfg.num_iter


def _inpaint(name, preset, iters):
    from dip_tpu.tasks import inpaint
    from dip_tpu.utils.image_io import hwc_to_nhwc

    img = _load(f"{DATA}/inpainting/{name}.png", d=64)
    mask = _load(f"{DATA}/inpainting/{name}_mask.png", d=64)
    spec = inpaint.task(hwc_to_nhwc(img), hwc_to_nhwc(mask), preset=preset,
                        gt=hwc_to_nhwc(img), num_iter=iters)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": f"inpaint/{preset}", "image": f"{name}.png",
           "size": f"{img.shape[1]}x{img.shape[0]}"}
    rec.update(_stats(hist, "psnr_gt"))
    rec["out"] = _save(f"{name}_inpaint.png", out)
    return rec, hist, dt, spec.cfg.num_iter


def recipe_kate(iters=None):
    """inpainting.ipynb cell 14 'kate': text mask, 6001 iters — the README
    convergence smoke test."""
    return _inpaint("kate", "kate", iters)


def recipe_vase(iters=None):
    """inpainting.ipynb 'vase': meshgrid input, 5001 iters."""
    return _inpaint("vase", "vase", iters)


def recipe_library(iters=None):
    """inpainting.ipynb 'library': deep 6-scale net + weight jitter, 3001."""
    return _inpaint("library", "library", iters)


def _inpaint_net(name, preset, net_type, iters):
    from dip_tpu.tasks import inpaint
    from dip_tpu.utils.image_io import hwc_to_nhwc

    img = _load(f"{DATA}/inpainting/{name}.png", d=64)
    mask = _load(f"{DATA}/inpainting/{name}_mask.png", d=64)
    spec = inpaint.task(hwc_to_nhwc(img), hwc_to_nhwc(mask), preset=preset,
                        net_type=net_type, gt=hwc_to_nhwc(img),
                        num_iter=iters)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": f"inpaint/{preset} [{net_type}]", "image": f"{name}.png",
           "size": f"{img.shape[1]}x{img.shape[0]}"}
    rec.update(_stats(hist, "psnr_gt"))
    rec["out"] = _save(f"{name}_inpaint_{net_type.lower()}.png", out)
    return rec, hist, dt, spec.cfg.num_iter


def recipe_library_unet(iters=None):
    """inpainting.ipynb cell 14 'library' UNET variant (LR 1e-3) — the
    zoo-breadth figure run on the real library image."""
    return _inpaint_net("library", "library", "UNet", iters)


def recipe_library_resnet(iters=None):
    """inpainting.ipynb cell 14 'library' ResNet variant (LR 1e-3)."""
    return _inpaint_net("library", "library", "ResNet", iters)


def recipe_prior_effect(iters=None):
    """sr_prior_effect.ipynb cells 8-10: x4 SR with the skip prior vs NO
    network (identity, OPT_OVER='input' — optimize HR pixels directly).
    The PSNR gap between the two rows is the deep image prior itself."""
    import jax

    from dip_tpu.eval.sr_eval import psnr_y_bbox_protocol
    from dip_tpu.tasks import super_resolve
    from dip_tpu.utils.image_io import hwc_to_nhwc, nhwc_to_hwc

    imgs = super_resolve.load_lr_hr(f"{DATA}/sr/zebra_GT.png", -1, 4, "CROP")
    lr = hwc_to_nhwc(imgs["LR_np"])
    gt = hwc_to_nhwc(imgs["HR_np"])
    scores, dts, n_iters = {}, 0.0, 0
    for net in ("skip", "identity"):
        spec = super_resolve.task(lr, factor=4, hr_gt=gt, num_iter=iters,
                                  net=net)
        out, state, hist, dt = _run(spec, seed=0)
        pred = np.clip(nhwc_to_hwc(out), 0, 1)
        scores[net] = round(psnr_y_bbox_protocol(imgs["HR_np"], pred), 3)
        _save(f"prior_effect_{net}.png", out)
        dts += dt
        n_iters += spec.cfg.num_iter
    rec = {"recipe": "sr_prior_effect/x4 zebra (skip vs identity)",
           "image": "zebra_GT.png",
           "size": f"{imgs['HR_np'].shape[1]}x{imgs['HR_np'].shape[0]}",
           "psnr_y_skip": scores["skip"], "psnr_y_identity": scores["identity"],
           "prior_effect_db": round(scores["skip"] - scores["identity"], 3),
           "out": os.path.join(OUTDIR, "prior_effect_identity.png")}
    return rec, {}, dts, n_iters


def recipe_lbfgs_f16(iters=None):
    """optimize('LBFGS') on a real image (utils/common_utils.py:208-221
    semantics: 100-step Adam warm-up then full-history LBFGS): F16 sigma=25
    denoising with the lbfgs engine mode."""
    import dataclasses

    from dip_tpu.tasks import denoise
    from dip_tpu.utils.image_io import hwc_to_nhwc

    img = _load(f"{DATA}/denoising/F16_GT.png")
    noisy = denoise.get_noisy_image(img, 25 / 255.0)
    spec = denoise.task(hwc_to_nhwc(noisy), preset="f16",
                        gt=hwc_to_nhwc(img), num_iter=iters or 600)
    spec.cfg = dataclasses.replace(spec.cfg, optimizer="lbfgs",
                                   lbfgs_warmup=100, lbfgs_warmup_lr=1e-3,
                                   reg_noise_std=0.0)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": "denoise/f16 sigma=25 [LBFGS]", "image": "F16_GT.png",
           "size": f"{img.shape[1]}x{img.shape[0]}",
           "warmup": 100}
    rec.update(_stats(hist, "psnr_gt"))
    rec["out"] = _save("f16_lbfgs_out.png", out)
    return rec, hist, dt, spec.cfg.num_iter


def recipe_barbara(iters=None):
    """restoration.ipynb cell 7: barbara, 50% pixels dropped, 11000 iters."""
    from dip_tpu.tasks import restore
    from dip_tpu.utils.image_io import hwc_to_nhwc
    from dip_tpu.utils.masks import get_bernoulli_mask

    img = _load(f"{DATA}/restoration/barbara.png", d=64)
    mask = get_bernoulli_mask(img.shape, zero_fraction=0.5)
    spec = restore.task(hwc_to_nhwc(img * mask), hwc_to_nhwc(mask),
                        preset="barbara", num_iter=iters,
                        gt=hwc_to_nhwc(img))
    out, state, hist, dt = _run(spec)
    rec = {"recipe": "restore/barbara 50%", "image": "barbara.png",
           "size": f"{img.shape[1]}x{img.shape[0]}"}
    rec.update(_stats(hist, "psnr_full"))
    rec["out"] = _save("barbara_restore.png", out)
    return rec, hist, dt, spec.cfg.num_iter


def _zebra(factor, iters):
    import jax

    from dip_tpu.eval.sr_eval import psnr_y_bbox_protocol
    from dip_tpu.tasks import super_resolve
    from dip_tpu.tasks.base import run_task
    from dip_tpu.utils.image_io import hwc_to_nhwc, nhwc_to_hwc

    imgs = super_resolve.load_lr_hr(f"{DATA}/sr/zebra_GT.png", -1, factor,
                                    "CROP")
    bicubic, sharp, nearest = super_resolve.get_baselines(
        imgs["LR_pil"], imgs["HR_pil"])
    spec = super_resolve.task(hwc_to_nhwc(imgs["LR_np"]), factor=factor,
                              hr_gt=hwc_to_nhwc(imgs["HR_np"]),
                              num_iter=iters)
    out, state, hist, dt = _run(spec)
    pred = np.clip(nhwc_to_hwc(out), 0, 1)
    hr = imgs["HR_np"]
    rec = {"recipe": f"sr/x{factor} zebra", "image": "zebra_GT.png",
           "size": f"{hr.shape[1]}x{hr.shape[0]}",
           "psnr_y_protocol": round(psnr_y_bbox_protocol(hr, pred), 3),
           "psnr_y_bicubic": round(psnr_y_bbox_protocol(hr, bicubic), 3),
           "psnr_y_nearest": round(psnr_y_bbox_protocol(hr, nearest), 3)}
    rec.update(_stats(hist, "psnr_hr"))
    rec["out"] = _save(f"zebra_x{factor}.png", out)
    return rec, hist, dt, spec.cfg.num_iter


def recipe_zebra4(iters=None):
    """super-resolution.ipynb: zebra x4, 2000 iters, PSNR-Y bbox protocol."""
    return _zebra(4, iters)


def recipe_zebra8(iters=None):
    """super-resolution.ipynb: zebra x8, 4000 iters."""
    return _zebra(8, iters)


def recipe_flash(iters=None):
    """flash-no-flash.ipynb: cave pair, 601 iters, LR 0.1."""
    from dip_tpu.tasks import flash_no_flash
    from dip_tpu.utils.image_io import hwc_to_nhwc

    flash = _load(f"{DATA}/flash_no_flash/cave01_00_flash.jpg")
    noflash = _load(f"{DATA}/flash_no_flash/cave01_01_noflash.jpg")
    spec = flash_no_flash.task(hwc_to_nhwc(flash), hwc_to_nhwc(noflash),
                               num_iter=iters or 601)
    out, state, hist, dt = _run(spec)
    rec = {"recipe": "flash_no_flash/cave", "image": "cave01 pair",
           "size": f"{flash.shape[1]}x{flash.shape[0]}",
           "loss_final": round(float(np.asarray(hist["loss"])[-1]), 6)}
    rec["out"] = _save("cave_out.png", out)
    return rec, hist, dt, spec.cfg.num_iter


RECIPES = {
    "f16": recipe_f16,
    "snail": recipe_snail,
    "kate": recipe_kate,
    "vase": recipe_vase,
    "library": recipe_library,
    "library_unet": recipe_library_unet,
    "library_resnet": recipe_library_resnet,
    "barbara": recipe_barbara,
    "zebra4": recipe_zebra4,
    "zebra8": recipe_zebra8,
    "flash": recipe_flash,
    "prior_effect": recipe_prior_effect,
    "lbfgs_f16": recipe_lbfgs_f16,
}


# Quality gate for dispatch-default flips (VERDICT r3 item 7): a lowering
# change that is exact on CPU can still be numerically different on the TPU
# (bf16 accumulation, fusion reassociation). Before flipping any
# ops/dispatch default, run `python tools/reproduce.py --quick-gate`: three
# real-image recipes at reduced iters in bf16 must clear conservative PSNR
# floors. The floors are far below the full-run numbers (RESULTS.md:
# f16 ~30.7, kate ~37+, zebra4 psnr_hr ~26) but far above what a broken
# lowering produces (single digits / low teens) — a pass means the measured
# numeric path still converges; it does not replace the full sweep.
QUICK_GATE = {  # name -> (reduced_iters, history_key, psnr_floor_dB)
    "f16": (1000, "psnr_gt", 27.0),
    "kate": (1500, "psnr_gt", 27.0),
    "zebra4": (1000, "psnr_hr", 21.0),
}

# bf16 quality budget (VERDICT r4 item 7): bf16 is the headline dtype, so
# its cost vs f32 is a tracked budget, not an anecdote. Policy: at gate
# iters, each recipe's bf16 best PSNR must be >= the f32 best - GATE_DELTA
# dB. The f32 reference rows come from the newest matching f32 rows in
# gate.jsonl (refresh with `--quick-gate --compute-dtype float32` whenever
# an f32-path default changes); the delta is recorded on every bf16 gate
# row as `delta_vs_f32_db`.
GATE_DELTA_DB = 0.75


# gate name -> the "recipe" label its record carries (sans dtype tag)
GATE_LABELS = {
    "f16": "denoise/f16 sigma=25",
    "kate": "inpaint/kate",
    "zebra4": "sr/x4 zebra",
}


def _latest_f32_gate_rows(log_path, names):
    """newest f32 gate row per recipe base name at the gate iters."""
    ref = {}
    if not os.path.exists(log_path):
        return ref
    base = {GATE_LABELS.get(n, n): n for n in names}
    with open(log_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("compute_dtype") != "float32":
                continue
            label = r.get("recipe", "").replace(" [float32]", "")
            name = base.get(label)
            if name is not None and r.get("iters") == QUICK_GATE[name][0]:
                ref[name] = r  # later lines win: newest
    return ref


def main(argv=None):
    from dip_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated subset of " + ",".join(RECIPES))
    p.add_argument("--quick", action="store_true",
                   help="20-iter smoke run of every recipe")
    p.add_argument("--quick-gate", action="store_true",
                   help="bf16 quality gate (f16+kate+zebra4, reduced iters, "
                        "PSNR floors) — required before flipping any "
                        "ops/dispatch default (docs/PERF.md)")
    p.add_argument("--compute-dtype", default=None,
                   help="e.g. bfloat16: run recipes in mixed precision "
                        "(records tagged with the dtype)")
    args = p.parse_args(argv)
    global COMPUTE_DTYPE, DATA
    COMPUTE_DTYPE = args.compute_dtype
    if args.quick_gate:
        if args.only or args.quick:
            p.error("--quick-gate is its own mode (no --only/--quick)")
        COMPUTE_DTYPE = args.compute_dtype or "bfloat16"

    from dip_tpu.data import reference_data_dir

    DATA = reference_data_dir()  # raises with an actionable message if absent

    if args.quick_gate:
        names = list(QUICK_GATE)
    else:
        names = list(RECIPES) if not args.only else args.only.split(",")
    os.makedirs(OUTDIR, exist_ok=True)
    log = os.path.join(OUTDIR,
                       "gate.jsonl" if args.quick_gate else "reproduce.jsonl")
    failures = []
    gate_rows = []
    f32_ref = {}
    if args.quick_gate and COMPUTE_DTYPE == "bfloat16":
        f32_ref = _latest_f32_gate_rows(log, names)
        missing = [n for n in names if n not in f32_ref]
        if missing:
            print(f"note: no f32 gate rows at gate iters for {missing} — "
                  "delta budget unchecked there; refresh with "
                  "`--quick-gate --compute-dtype float32`", flush=True)
    for name in names:
        print(f"=== {name} ===", flush=True)
        if args.quick_gate:
            run_iters = QUICK_GATE[name][0]
        elif args.quick:
            run_iters = 20
        else:
            run_iters = None
        # the tunneled TPU backend has sporadic RPC failures: retry once,
        # and never let one recipe kill the whole sweep
        for attempt in (1, 2):
            try:
                rec, hist, dt, iters = RECIPES[name](run_iters)
                break
            except Exception as e:  # noqa: BLE001
                print(f"attempt {attempt} failed: {e!r}", flush=True)
                if "Unable to initialize backend" in str(e):
                    # the accelerator itself is unreachable (tunnel down):
                    # every further attempt would hang for many minutes and
                    # fail the same way — abort the sweep NOW so it can be
                    # relaunched when the backend recovers
                    print("backend unavailable — aborting sweep", flush=True)
                    raise SystemExit(2)
                if attempt == 2:
                    failures.append(name)
                    rec = None
                time.sleep(30)
        if rec is None:
            continue
        rec.update({"iters": int(iters), "seconds": round(dt, 1),
                    "it_per_s": round(iters / dt, 2),
                    "quick": bool(args.quick)})
        if COMPUTE_DTYPE:
            rec["compute_dtype"] = COMPUTE_DTYPE
            rec["recipe"] += f" [{COMPUTE_DTYPE}]"
        if args.quick_gate:
            _, key, floor = QUICK_GATE[name]
            best = rec.get(f"{key}_best")
            delta = None
            ref_best = f32_ref.get(name, {}).get(f"{key}_best")
            if best is not None and ref_best is not None:
                delta = round(float(best) - float(ref_best), 3)
                rec["f32_ref_best"] = ref_best
                rec["delta_vs_f32_db"] = delta
            gate_rows.append((name, key, best, floor, delta))
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    if failures:
        print(f"FAILED recipes: {failures}", flush=True)
        raise SystemExit(1)
    if args.quick_gate:
        bad = []
        for name, key, best, floor, delta in gate_rows:
            fail_floor = best is None or float(best) < floor
            # the delta budget only binds for the headline dtype run
            fail_delta = (COMPUTE_DTYPE == "bfloat16" and delta is not None
                          and delta < -GATE_DELTA_DB)
            dtxt = ("delta=n/a" if delta is None
                    else f"delta={delta:+.2f}dB(budget -{GATE_DELTA_DB})")
            status = "FAIL" if (fail_floor or fail_delta) else "PASS"
            print(f"gate {name:8s} {key}_best={best} floor={floor} "
                  f"{dtxt} {status}", flush=True)
            if fail_floor or fail_delta:
                bad.append(name)
        if bad:
            print("QUICK-GATE FAILED — do not flip dispatch defaults",
                  flush=True)
            raise SystemExit(3)
        print("QUICK-GATE PASSED", flush=True)


if __name__ == "__main__":
    main()
