"""Set5/Set14 super-resolution evaluation harness.

Runnable re-design of the paper's table generator
(/root/reference/super-resolution_eval_script.py): Y-channel PSNR computed
inside a 4-px margin of the non-zero bounding box of the DIP output
(lines 44-51), emitted per image and averaged.  Unlike the reference script
(hardcoded home paths, undefined `postfixes`, cv2 dependency), this one
takes a directory of images, runs the whole SR pipeline per image, and works
offline.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import jax
import numpy as np

from dip_tpu.ops.losses import psnr_y
from dip_tpu.tasks import super_resolve
from dip_tpu.tasks.base import run_task
from dip_tpu.utils.image_io import hwc_to_nhwc, nhwc_to_hwc

SET14 = ["baboon", "barbara", "bridge", "coastguard", "comic", "face",
         "flowers", "foreman", "lenna", "man", "monarch", "pepper", "ppt3",
         "zebra"]
SET5 = ["baby", "bird", "butterfly", "head", "woman"]


def psnr_y_bbox_protocol(gt_hwc: np.ndarray, pred_hwc: np.ndarray,
                         ref_for_bbox: np.ndarray | None = None,
                         margin: int = 4) -> float:
    """The eval script's protocol: find the non-zero bbox of the prediction
    (or a reference output), shrink by `margin` px, PSNR on studio-swing Y."""
    ref = pred_hwc if ref_for_bbox is None else ref_for_bbox
    q = ref[..., :3].sum(-1)
    cols = np.where(q.sum(0) > 0)[0]
    rows = np.where(q.sum(1) > 0)[0]
    r0, r1 = rows[0] + margin, rows[-1] - margin
    c0, c1 = cols[0] + margin, cols[-1] - margin
    a = gt_hwc[r0:r1, c0:c1, :3]
    b = pred_hwc[r0:r1, c0:c1, :3]
    return float(psnr_y(a[None], b[None]))


@dataclass
class SrEvalResult:
    per_image: dict = field(default_factory=dict)
    mean_psnr_y: float = 0.0

    def latex_row(self, label: str = "dip-tpu") -> str:
        vals = " & ".join(f"${v:.4}$" for v in self.per_image.values())
        return f"\\small{{{label}}} & {vals}"


def eval_sr_dataset(
    image_dir: str,
    factor: int = 4,
    names: list[str] | None = None,
    num_iter: int | None = None,
    seed: int = 0,
    verbose: bool = True,
) -> SrEvalResult:
    """Run DIP SR on every image in `image_dir` and score with the paper
    protocol. Images are HR ground truths; LR observations are produced by
    the same PIL pipeline as the reference (sr_utils.py:54)."""
    paths = sorted(glob.glob(os.path.join(image_dir, "*")))
    if names:
        paths = [p for p in paths
                 if any(n in os.path.basename(p) for n in names)]
    result = SrEvalResult()
    psnrs = []
    for i, path in enumerate(paths):
        imgs = super_resolve.load_lr_hr(path, -1, factor, "CROP")
        spec = super_resolve.task(
            hwc_to_nhwc(imgs["LR_np"]), factor=factor,
            hr_gt=hwc_to_nhwc(imgs["HR_np"]), num_iter=num_iter,
        )
        out, _, _ = run_task(spec, jax.random.key(seed + i))
        pred = np.clip(nhwc_to_hwc(out), 0, 1)
        score = psnr_y_bbox_protocol(imgs["HR_np"], pred)
        name = os.path.splitext(os.path.basename(path))[0]
        result.per_image[name] = score
        psnrs.append(score)
        if verbose:
            print(f"{name}: {score:.3f} dB")
    result.mean_psnr_y = float(np.mean(psnrs)) if psnrs else 0.0
    return result


def eval_sr_dataset_sharded(
    image_dir: str,
    mesh,
    factor: int = 4,
    num_iter: int | None = None,
    seed: int = 0,
    verbose: bool = True,
) -> SrEvalResult:
    """Fleet evaluation: one DIP fit per device over a sharded image list.

    Images are grouped by (cropped) HR shape; each same-shape group runs
    through ONE compiled BatchEngine program with the image axis sharded
    over the mesh's 'data' axis — N images cost the wall-clock of one
    (SURVEY.md §5 distributed row; the capability BASELINE.md's '8 images
    concurrently' promises). Groups larger than the mesh run as sequential
    mesh-size sub-batches of the same program: one image per device is the
    measured-fast regime (vmap folding several per-image nets into one
    chip's convs is ~14x slower — parallel/batch.py header), so a group of
    3 on a 1-chip mesh is three sequential fits, not one b3 vmap. The last
    sub-batch is padded by repeating its final image (padding scores are
    discarded).
    """
    import jax
    import jax.numpy as jnp

    from dip_tpu.parallel.batch import BatchEngine
    from dip_tpu.tasks.base import make_input

    paths = sorted(glob.glob(os.path.join(image_dir, "*")))
    n_dev = int(np.prod([mesh.devices.size])) if mesh is not None else 1

    groups: dict[tuple, list] = {}
    for path in paths:
        imgs = super_resolve.load_lr_hr(path, -1, factor, "CROP")
        groups.setdefault(imgs["LR_np"].shape, []).append((path, imgs))

    result = SrEvalResult()
    psnrs = []
    for shape, items in groups.items():
        names = [os.path.splitext(os.path.basename(p))[0] for p, _ in items]
        n_real = len(items)
        nb = max(n_dev, 1)
        while len(items) % nb:
            items = items + [items[-1]]  # pad the last sub-batch
        spec = super_resolve.task(
            hwc_to_nhwc(items[0][1]["LR_np"]), factor=factor,
            num_iter=num_iter)
        beng = BatchEngine(spec.model, spec.loss_fn, spec.cfg,
                           spec.metrics_fn, mesh=mesh)
        all_keys = jax.random.split(jax.random.key(seed), len(items))
        z_keys = jax.random.split(jax.random.key(seed + 1), len(items))
        outs = []
        for lo in range(0, len(items), nb):  # one image per device per pass
            sub = items[lo:lo + nb]
            zs = jnp.stack([make_input(spec, k)
                            for k in z_keys[lo:lo + nb]])
            auxs = {"lr": jnp.stack([
                hwc_to_nhwc(im["LR_np"]) for _, im in sub])}
            state = beng.init_state(all_keys[lo:lo + nb], zs)
            state, _ = beng.run(state, auxs)
            outs.append(np.asarray(beng.render(state)))  # (nb, 1, H, W, C)
        outs = np.concatenate(outs, axis=0)
        for i in range(n_real):
            pred = np.clip(nhwc_to_hwc(outs[i]), 0, 1)
            score = psnr_y_bbox_protocol(items[i][1]["HR_np"], pred)
            result.per_image[names[i]] = score
            psnrs.append(score)
            if verbose:
                print(f"{names[i]}: {score:.3f} dB")
    result.mean_psnr_y = float(np.mean(psnrs)) if psnrs else 0.0
    return result
