"""Golden-corpus conformance tests.

tests/corpus/streams holds codestreams produced by the REFERENCE encoder
(grk_compress 9.2.0) across the feature matrix, with MD5 digests of the
reference decoder's own pixel output (tests/corpus/manifest.json) — an
independent golden set in the spirit of the reference's ISO 15444-4 +
md5refs.txt suites (the ISO corpus itself is not redistributable).
Our decoder must reproduce the reference's decode bit-exactly.

tests/corpus/corrupt holds malformed files that must fail gracefully
(typed codec errors or zero-filled output, never crashes) — the analogue
of the reference's fuzzer blacklist corpus.
"""

import glob
import hashlib
import json
import os

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.core.errors import GrokTpuError

CORPUS = os.path.join(os.path.dirname(__file__), "corpus")
MANIFEST = json.load(open(os.path.join(CORPUS, "manifest.json")))


@pytest.mark.parametrize("entry", MANIFEST, ids=[e["name"] for e in MANIFEST])
def test_golden_decode(entry):
    data = open(os.path.join(CORPUS, "streams", entry["name"]), "rb").read()
    # optional decode-side parameters (layer truncation / reduce goldens)
    dp = gk.DecompressParams(**entry.get("decode", {}))
    img = gk.decompress(data, dp)
    assert len(img.components) == entry["ncomps"]
    if "pixels" in entry:
        # irreversible path: the reference's float pipeline rounds a few
        # samples differently; compare pixels within the stated tolerance
        ref = np.load(os.path.join(CORPUS, "streams", entry["pixels"]))
        tol = entry.get("tolerance", 0)
        for i, c in enumerate(img.components):
            r = ref[f"arr_{i}"]
            d = np.abs(c.data.astype(np.int64) - r.astype(np.int64))
            assert d.max() <= tol, (entry["name"], i, int(d.max()))
        return
    from tests.conftest import golden_md5

    assert golden_md5([c.data for c in img.components]) == entry["md5"], (
        entry["name"])


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(CORPUS, "corrupt", "*.j2k"))),
    ids=lambda p: os.path.basename(p),
)
def test_corrupt_graceful(path):
    data = open(path, "rb").read()
    try:
        # corrupt corpus == untrusted input: bound the output size the
        # way a hardened caller would (also keeps bomb entries fast)
        img = gk.decompress(data, gk.DecompressParams(max_pixels=1 << 26))
        # decoding may succeed with zero-filled/partial tiles; the result
        # must still be a well-formed image
        for c in img.components:
            assert c.data is not None
    except (GrokTpuError, ValueError, IndexError, OverflowError, MemoryError):
        pass  # typed, graceful
