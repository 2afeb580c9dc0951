"""Atlas checkpoint/resume.

Replaces the reference's boost-serialization atlas persistence
(``System::SaveAtlas/LoadAtlas`` /root/reference/src/System.cc:1484,1535 with
MD5 sidecar :1607-1626; per-class ``serialize()`` + pointer->id fixups,
KeyFrame.h:56-193). Because the MapState is already arrays-with-indices, the
whole pointer-fixup machinery disappears (SURVEY §5): a checkpoint is one npz
per map + a JSON manifest, with a SHA-256 integrity hash standing in for the
reference's MD5 sidecar.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import atlas as atlas_mod
from ..models import map_state as ms

FORMAT_VERSION = 2


def _flatten_state(state: ms.MapState) -> dict:
    out = {}
    for group in ("kfs", "lms", "obs"):
        nt = getattr(state, group)
        for field, arr in zip(nt._fields, nt):
            out[f"{group}.{field}"] = np.asarray(arr)
    return out


def _unflatten_state(d) -> ms.MapState:
    def build(cls, group):
        return cls(**{f: jnp.asarray(d[f"{group}.{f}"]) for f in cls._fields})

    return ms.MapState(kfs=build(ms.KeyFrames, "kfs"),
                       lms=build(ms.Landmarks, "lms"),
                       obs=build(ms.Observations, "obs"))


def _digest(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_atlas(path: str, atlas: atlas_mod.Atlas):
    """path: directory. Writes map_<i>.npz + manifest.json (with hashes)."""
    os.makedirs(path, exist_ok=True)
    manifest = {"version": FORMAT_VERSION, "current": atlas.current,
                "dims": list(atlas.dims), "maps": []}
    for i, (state, meta) in enumerate(zip(atlas.maps, atlas.meta)):
        fname = f"map_{i}.npz"
        fpath = os.path.join(path, fname)
        extra = {}
        if meta.kf_parent is not None:
            # Spanning-tree parents (essential-graph tree edges) persist
            # with the map, like KeyFrame::mpParent under boost serialize.
            extra["meta.kf_parent"] = np.asarray(meta.kf_parent)
        np.savez_compressed(fpath, **_flatten_state(state), **extra)
        manifest["maps"].append({
            "file": fname, "n_kf": meta.n_kf, "n_lm": meta.n_lm,
            "sha256": _digest(fpath),
        })
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_atlas(path: str) -> atlas_mod.Atlas:
    """Load + integrity-check an atlas checkpoint directory."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported atlas format {manifest['version']}")
    dims = tuple(manifest["dims"])
    atlas = atlas_mod.Atlas(*dims)
    atlas.maps = []
    atlas.meta = []
    for entry in manifest["maps"]:
        fpath = os.path.join(path, entry["file"])
        if _digest(fpath) != entry["sha256"]:
            raise IOError(f"checksum mismatch for {fpath} "
                          "(corrupted checkpoint)")
        with np.load(fpath) as z:
            atlas.maps.append(_unflatten_state(z))
            parent = (np.asarray(z["meta.kf_parent"])
                      if "meta.kf_parent" in z.files else None)
        atlas.meta.append(atlas_mod.MapMeta(n_kf=entry["n_kf"],
                                            n_lm=entry["n_lm"],
                                            kf_parent=parent))
    atlas.current = manifest["current"]
    return atlas
