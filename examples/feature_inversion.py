"""Feature inversion through a frozen classifier (parity: feature_inversion.ipynb).

Reconstructs an image whose deep features (default: AlexNet fc6) match the
content image's. Without a weights checkpoint the backbone is random-init —
pass --weights to a torch .pth for the real effect.

Usage:
    python examples/feature_inversion.py --image building.jpg \
        [--weights alexnet-torch_py3.pth] [--layers fc6]
"""

import argparse

import jax
import numpy as np

from dip_tpu.tasks.base import run_task
from dip_tpu.tasks.feature_inversion import FeatureInversion
from dip_tpu.utils.image_io import get_image, hwc_to_nhwc, nhwc_to_hwc, save_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--backbone", default="alexnet_caffe",
                    choices=["alexnet_caffe", "vgg19_caffe", "vgg16_caffe"])
    ap.add_argument("--layers", default="fc6",
                    help="comma-separated tap names, e.g. 'fc6' or 'conv3,conv4'")
    ap.add_argument("--weights", default=None, help="torch checkpoint path")
    ap.add_argument("--num-iter", type=int, default=3100)
    ap.add_argument("--out", default="inverted.png")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    fi = FeatureInversion(
        backbone=args.backbone,
        layers=tuple(args.layers.split(",")),
        weights_path=args.weights,
        num_iter=args.num_iter,
    )
    _, content = get_image(args.image, fi.imsize)
    spec = fi.spec(hwc_to_nhwc(content))

    def cb(it, hist, state):
        print(f"iter {it:5d}  loss {hist['loss'][-1]:.4f}", flush=True)

    out, _, _ = run_task(spec, jax.random.key(args.seed), callback=cb)
    save_image(args.out, np.clip(nhwc_to_hwc(out), 0, 1))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
