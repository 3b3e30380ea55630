"""Atomic index-manifest persistence, shared by every index family.

One place for the tmp-write + ``os.replace`` ritual (r12 review: the
block had been copy-pasted into ~10 sites across index/ and
streaming/): the artifact "exists" — or its update lands — only when
the rename does, so a crash mid-write never leaves a torn manifest.
"""

from __future__ import annotations

import json
import os

__all__ = ["write_manifest"]


def write_manifest(path: str, manifest: dict, indent: int | None = None) -> None:
    """Atomically write ``<path>/manifest.json``."""
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=indent)
    os.replace(tmp, os.path.join(path, "manifest.json"))
