"""Assemble RESULTS.md from results/reproduce.jsonl.

Reads the per-recipe records written by tools/reproduce.py (and
tools/train_backbone.py) and emits the real-image reproduction table the
round-1 verdict asked for: recipe, iters, quality, throughput, output file.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "results", "reproduce.jsonl")
OUT = os.path.join(ROOT, "RESULTS.md")

HEADER = """# RESULTS — reference-image reproduction (TPU v5e, real data)

Every flagship recipe from the reference notebooks, run on the reference's
own bundled images (`/root/reference/data/...`) with the exact notebook
hyperparameters, by `tools/reproduce.py` on one TPU v5e chip. Output images
are committed under `results/`.

Reference context (the repo publishes no numbers; paper values for scale):
denoising sigma=25 CBSD68 ~29.22 dB; x4 SR Set14 ~27.00 dB (SURVEY.md §6).
Throughput (`it/s`) is whole-recipe wall-clock including compilation AND
the tunneled backend's health at run time — identical recipes swing
several-fold between sweeps (rows 9 vs 40 of reproduce.jsonl span
3.2-18.7 it/s); treat the column as indicative only.  BENCH_r0N.json /
`python bench.py` is the performance record; see docs/PERF.md.  The
measured PyTorch reference loop on this host runs at 0.127 it/s at 512^2
(`results/torch_baseline.json`).

"""


def fmt_quality(r: dict) -> str:
    parts = []
    for key, label in [
        ("psnr_gt_best", "PSNR"), ("psnr_gt_sm_best", "PSNR(EMA)"),
        ("psnr_full_best", "PSNR"), ("psnr_y_protocol", "PSNR-Y"),
        ("psnr_hr_best", "PSNR(HR)"),
        ("backbone_test_acc", "backbone acc"),
    ]:
        if key in r:
            parts.append(f"{label} {r[key]}")
    if "psnr_y_bicubic" in r:
        delta = round(r["psnr_y_protocol"] - r["psnr_y_bicubic"], 2)
        parts.append(f"bicubic {r['psnr_y_bicubic']} ({'+' if delta >= 0 else ''}{delta})")
    if "psnr_y_skip" in r:
        parts.append(f"PSNR-Y skip {r['psnr_y_skip']} vs identity "
                     f"{r['psnr_y_identity']} (prior effect "
                     f"+{r['prior_effect_db']} dB)")
    if "fi_loss_final" in r:
        parts.append(f"fc6 loss {r['fi_loss_first']} -> {r['fi_loss_final']}")
    if "am_loss_final" in r:
        parts.append(f"objective {r['am_loss_first']} -> {r['am_loss_final']}")
    if not parts and "loss_final" in r:
        parts.append(f"final loss {r['loss_final']}")
    return ", ".join(parts) or "-"


def main():
    records = []
    with open(LOG) as f:
        for line in f:
            r = json.loads(line)
            if not r.get("quick"):
                records.append(r)
    # keep the latest record per recipe
    latest = {}
    for r in records:
        latest[r["recipe"]] = r

    lines = [HEADER,
             "| Recipe | Image | Size | Iters | Quality | it/s | Output |",
             "|---|---|---|---|---|---|---|"]
    for r in latest.values():
        out = os.path.relpath(r["out"], ROOT) if "out" in r else "-"
        lines.append(
            f"| {r['recipe']} | {r.get('image', '-')} | {r.get('size', '-')} "
            f"| {r.get('iters', r.get('fi_iters', '-'))} | {fmt_quality(r)} "
            f"| {r.get('it_per_s', '-')} | {out} |")
    lines.append("")
    eval_txt = os.path.join(ROOT, "results", "eval_sr_x4.txt")
    if os.path.exists(eval_txt):
        lines.append("## SR evaluation harness (paper protocol, x4)")
        lines.append("")
        lines.append("`python -m dip_tpu eval-sr --dir "
                     "/root/reference/data/sr --factor 4` — full per-image "
                     "DIP fits, Y-channel studio-swing PSNR inside the "
                     "4-px-cropped non-zero bbox "
                     "(super-resolution_eval_script.py:4-51 protocol), "
                     "LaTeX row output:")
        lines.append("")
        lines.append("```")
        lines.append(open(eval_txt).read().rstrip())
        lines.append("```")
        lines.append("")
    fleet_txt = os.path.join(ROOT, "results", "eval_sr_x4_fleet.txt")
    if os.path.exists(fleet_txt):
        lines.append("## Multi-image fleet SR table (sharded path, x4)")
        lines.append("")
        lines.append("Set5/Set14 cannot be downloaded here (zero egress), "
                     "so the Set-style table runs over every suitable HR "
                     "source the reference bundles (8 images, 5 shapes; "
                     "`tools/make_fleet_set.py`), through "
                     "`eval_sr_dataset_sharded` via "
                     "`python -m dip_tpu eval-sr --dir results/sr_fleet_set "
                     "--fleet`:")
        lines.append("")
        lines.append("```")
        lines.append(open(fleet_txt).read().rstrip())
        lines.append("```")
        lines.append("")
    lines.append("Regenerate with `python tools/reproduce.py && "
                 "python tools/make_results.py`.")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({len(latest)} recipes)")


if __name__ == "__main__":
    main()
