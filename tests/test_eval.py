"""SR evaluation protocol tests (pure host/CPU math)."""

import pytest
import numpy as np

from dip_tpu.data.synthetic import synthetic_image
from dip_tpu.eval.sr_eval import SrEvalResult, psnr_y_bbox_protocol


def test_bbox_protocol_identical_images():
    img = synthetic_image("bands", 64)
    v = psnr_y_bbox_protocol(img, img + 1e-4)
    assert v > 60


def test_bbox_protocol_crops_border():
    """Border corruption outside the 4-px margin must not affect the score."""
    img = synthetic_image("bands", 64)
    pred = img.copy() + 1e-3
    # corrupt a 2-px frame INSIDE the non-zero bbox but within the margin
    pred2 = pred.copy()
    pred2[:2, :, :] = 1.0
    pred2[:, :2, :] = 1.0
    a = psnr_y_bbox_protocol(img, pred)
    b = psnr_y_bbox_protocol(img, pred2, ref_for_bbox=pred)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_bbox_protocol_zero_padding_excluded():
    """put_in_center-style zero padding defines the bbox (eval script :44-51)."""
    img = synthetic_image("gradient", 32) + 0.1
    canvas_gt = np.zeros((64, 64, 3), np.float32)
    canvas_pred = np.zeros((64, 64, 3), np.float32)
    canvas_gt[16:48, 16:48] = img
    canvas_pred[16:48, 16:48] = img + 1e-3
    v = psnr_y_bbox_protocol(canvas_gt, canvas_pred)
    assert v > 50  # zeros outside bbox don't drag the score down


def test_latex_row():
    r = SrEvalResult(per_image={"zebra": 27.1234, "baboon": 22.5})
    row = r.latex_row("ours")
    assert "ours" in row and "27.12" in row


@pytest.mark.slow
def test_eval_sr_dataset_end_to_end(tmp_path):
    """The full per-image fit loop of eval_sr_dataset on two tiny synthetic
    images (round-1 gap: the loop had never executed)."""
    from PIL import Image

    from dip_tpu.eval.sr_eval import eval_sr_dataset

    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        img = (synthetic_image("gradient", 64)
               + rng.uniform(0, 0.1, (64, 64, 3))).clip(0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(tmp_path / f"{name}.png")

    res = eval_sr_dataset(str(tmp_path), factor=4, num_iter=10, verbose=False)
    assert set(res.per_image) == {"a", "b"}
    assert np.isfinite(res.mean_psnr_y)
    assert res.mean_psnr_y > 10  # 10 iters on a smooth target beats garbage
    assert "a" in res.latex_row() or "$" in res.latex_row()
