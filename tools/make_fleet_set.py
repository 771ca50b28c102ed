"""Assemble the multi-image SR fleet-eval set from the reference data.

Set5/Set14 (the tables in super-resolution_eval_script.py:16-68) cannot be
downloaded in this environment, so the Set-style multi-image table is run
over every suitable HR source the reference bundles (SURVEY.md §2 #22):
8 images in 5 distinct shapes, which exercises both the shape-grouped
batched path (three 512² images as ONE program) and the singleton groups
of `eval_sr_dataset_sharded`.

    python tools/make_fleet_set.py [--out results/sr_fleet_set]

then:

    python -m dip_tpu eval-sr --dir results/sr_fleet_set --factor 4 --fleet

Images are converted to RGB (barbara is grayscale L); everything else is
left to the eval harness's own CROP-to-divisible handling
(sr_utils.py:18-66 semantics in tasks/super_resolve.py).
"""

from __future__ import annotations

import argparse
import os

from PIL import Image

# name -> path under the reference data dir
SOURCES = {
    "F16": "denoising/F16_GT.png",
    "barbara": "restoration/barbara.png",
    "building": "feature_inversion/building.jpg",
    "kate": "inpainting/kate.png",
    "library": "inpainting/library.png",
    "monkey": "feature_inversion/monkey.jpg",
    "vase": "inpainting/vase.png",
    "zebra": "sr/zebra_GT.png",
}


def make_fleet_set(out_dir: str) -> list:
    from dip_tpu.data import reference_data_dir

    data = reference_data_dir()
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, rel in SOURCES.items():
        src = os.path.join(data, rel)
        dst = os.path.join(out_dir, f"{name}.png")
        Image.open(src).convert("RGB").save(dst)
        written.append(dst)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/sr_fleet_set")
    args = ap.parse_args()
    for path in make_fleet_set(args.out):
        im = Image.open(path)
        print(f"{path}: {im.size[0]}x{im.size[1]}")


if __name__ == "__main__":
    main()
