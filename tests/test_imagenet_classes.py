"""ImageNet class-map loading + name resolution (activation_maximization
parity: the reference names the maximized class via
data/imagenet1000_clsid_to_human.txt)."""

import os
import tempfile

import pytest

from dip_tpu.data.imagenet_classes import load_class_map, resolve_class

SAMPLE = """{0: 'tench, Tinca tinca',
 1: 'goldfish, Carassius auratus',
 340: 'zebra',
 341: 'hog, pig, grunter, squealer, Sus scrofa'}"""


@pytest.fixture
def cmap_path():
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(SAMPLE)
        path = f.name
    yield path
    os.unlink(path)


def test_load_class_map(cmap_path):
    m = load_class_map(cmap_path)
    assert m[340] == "zebra"
    assert len(m) == 4


def test_resolve_by_name(cmap_path):
    assert resolve_class("zebra", cmap_path) == (340, "zebra")
    assert resolve_class("goldfish", cmap_path)[0] == 1


def test_resolve_by_alias(cmap_path):
    # 'pig' is an alias inside 341's comma list
    assert resolve_class("pig", cmap_path)[0] == 341


def test_resolve_by_index(cmap_path):
    idx, label = resolve_class("340", cmap_path)
    assert (idx, label) == (340, "zebra")
    # integer index works without any map on disk
    idx, _ = resolve_class(7, "/nonexistent/file")
    assert idx == 7


def test_resolve_unknown_raises(cmap_path):
    with pytest.raises(KeyError):
        resolve_class("warp drive", cmap_path)


def test_missing_map_raises():
    os.environ.pop("DIP_IMAGENET_CLASSMAP", None)
    with pytest.raises((FileNotFoundError, KeyError)):
        resolve_class("zebra", "/nonexistent/file")


def test_reference_data_dir_contract(monkeypatch, cmap_path):
    """The reference-data mount is env-overridable and fails actionably
    when absent (VERDICT r2 item 9: no silent hard-coded path)."""
    from dip_tpu.data import reference_data_dir

    monkeypatch.setenv("DIP_REFERENCE_DATA", "/nonexistent/mount")
    assert reference_data_dir(required=False) is None
    with pytest.raises(FileNotFoundError, match="DIP_REFERENCE_DATA"):
        reference_data_dir()
    # class-map default path follows the redirected mount: with the mount
    # absent and no DIP_IMAGENET_CLASSMAP, loading falls through to the
    # actionable error rather than the old hard-coded /root/reference path
    monkeypatch.delenv("DIP_IMAGENET_CLASSMAP", raising=False)
    with pytest.raises(FileNotFoundError):
        load_class_map()
    d = os.path.dirname(cmap_path)
    monkeypatch.setenv("DIP_REFERENCE_DATA", d)
    assert reference_data_dir() == d
