import os

from dip_tpu.data.synthetic import synthetic_image, SYNTHETIC_SET

__all__ = ["synthetic_image", "SYNTHETIC_SET", "reference_data_dir"]

_DEFAULT_REFERENCE_DATA = "/root/reference/data"


def reference_data_dir(required: bool = True) -> str | None:
    """Resolve the reference repo's bundled `data/` directory.

    This framework ships no binary test photos — reproduction tools
    (tools/reproduce.py, eval-sr on the reference set) read the upstream
    repo's own images. The location is `$DIP_REFERENCE_DATA`, falling back
    to the conventional mount at /root/reference/data.

    With required=True (the default), a missing directory raises with an
    actionable message instead of letting callers fail later on an opaque
    per-file FileNotFoundError; required=False returns None so callers can
    fall back to the committed synthetic set (dip_tpu.data.synthetic).
    """
    d = os.environ.get("DIP_REFERENCE_DATA", _DEFAULT_REFERENCE_DATA)
    if os.path.isdir(d):
        return d
    if not required:
        return None
    raise FileNotFoundError(
        f"reference data directory not found: {d!r}. Point "
        "DIP_REFERENCE_DATA at a checkout of the reference repo's data/ "
        "directory (deep-image-prior), or use the committed synthetic "
        "images instead (dip_tpu.data.synthetic / any PNG via the CLI's "
        "--image flag)."
    )
