"""CLI argument plumbing (no device work)."""

import os
import tempfile

import pytest

from dip_tpu.cli.config import apply_config, load_config


def test_load_config_yaml():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write("task: denoise\nimage: x.png\nnum-iter: 50\nsigma: 10\n")
        path = f.name
    try:
        cfg = load_config(path)
        assert cfg == {"task": "denoise", "image": "x.png", "num_iter": 50,
                       "sigma": 10}
    finally:
        os.unlink(path)


def test_apply_config_flag_precedence():
    class NS:
        task = None
        image = None
        num_iter = 99  # explicit flag differs from parser default

    defaults = {"task": None, "image": None, "num_iter": None}
    args = apply_config(NS(), {"task": "sr", "image": "a.png",
                               "num_iter": 10}, defaults)
    assert args.task == "sr" and args.image == "a.png"
    assert args.num_iter == 99  # explicit flag wins


def test_apply_config_unknown_key():
    class NS:
        task = None

    with pytest.raises(ValueError):
        apply_config(NS(), {"bogus": 1}, {"task": None})


def test_cli_requires_task(capsys):
    from dip_tpu.cli.main import main

    with pytest.raises(SystemExit):
        main(["fit", "--image", "x.png"])
