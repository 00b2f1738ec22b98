"""Index checkpointing: directory-based save/load of the full engine state.

The reference checkpoints via pickle only (/root/reference/src/main.cpp:35-54;
docs/source/tutorial.rst:292-305). Here the canonical state is a dict of numpy
arrays + a JSON manifest, written per-array so billion-scale code arrays stream
to disk without a monolithic pickle buffer. ``Rii`` objects also remain fully
picklable (tests/test_rii.py::test_pickle).
"""

import json
import os

import numpy as np


_MANIFEST = "manifest.json"


def save_index(engine, path):
    """Save a Rii engine to a directory (created if needed)."""
    from rii_tpu.models.opq import OPQ

    os.makedirs(path, exist_ok=True)
    fq = engine.fine_quantizer
    manifest = {
        "format": "rii_tpu.index.v1",
        "codec": type(fq).__name__,
        "M": fq.M,
        "Ks": fq.Ks,
        "Ds": fq.Ds,
        "seed": fq.seed,
        "verbose": engine.verbose,
        "N": engine.N,
        "nlist": engine.nlist,
        "scan_mode": getattr(engine, "scan_mode", "auto"),
        "threshold_coeffs": (
            None if engine.threshold is None
            else [float(c) for c in np.poly1d(engine.threshold).coeffs]
        ),
    }
    arrays = {"codewords": fq.codewords}
    if isinstance(fq, OPQ):
        arrays["rotation_matrix"] = fq.rotation_matrix
    if engine.N > 0:
        arrays["codes"] = engine._consolidated_codes()
        arrays["assignments"] = engine._assignments()
    if engine.nlist > 0:
        arrays["coarse_centers"] = engine._centers
    for name, arr in arrays.items():
        np.save(os.path.join(path, name + ".npy"), arr)
    manifest["arrays"] = sorted(arrays)
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)


def load_index(path):
    """Load a Rii engine saved by :func:`save_index`."""
    from rii_tpu import PQ, OPQ, Rii

    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["format"] == "rii_tpu.index.v1"

    def arr(name):
        return np.load(os.path.join(path, name + ".npy"))

    cls = {"PQ": PQ, "OPQ": OPQ}[manifest["codec"]]
    fq = cls(M=manifest["M"], Ks=manifest["Ks"], verbose=manifest["verbose"],
             seed=manifest["seed"])
    fq.codewords = arr("codewords")
    fq.Ds = manifest["Ds"]
    if manifest["codec"] == "OPQ":
        fq.rotation_matrix = arr("rotation_matrix")

    e = Rii(fine_quantizer=fq)
    e.scan_mode = manifest.get("scan_mode", "auto")
    if "codes" in manifest["arrays"]:
        codes = arr("codes")
        e._code_chunks = [codes]
        e._n = len(codes)
        e._assign_chunks = [arr("assignments")]
    if "coarse_centers" in manifest["arrays"]:
        e._centers = arr("coarse_centers")
    if manifest["threshold_coeffs"] is not None:
        e.threshold = np.poly1d(manifest["threshold_coeffs"])
    e._bump()
    return e
