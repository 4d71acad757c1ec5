"""Multi-host (jax.distributed, N processes) codec tests — SURVEY §2.3
P8 DCN half. Each test spawns real OS processes that join a coordinator
and exchange tile shards through its KV store (parallel/multihost.py);
parity target: the ordered tile-part stream assembly of
/root/reference/src/lib/jp2/codestream/CodeStreamCompress.cpp:615-699."""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import grok_tpu as gk  # noqa: E402
import multihost_run as mh  # noqa: E402


@pytest.mark.parametrize("cfg", ["lossless53", "ht"])
def test_multihost_encode_decode_identical(cfg):
    h = w = 512
    im = gk.Image.from_array(mh.make_image(h, w))
    ref = gk.compress(im, mh.build_params(cfg))
    stream, info = mh.run_group(2, cfg, h, w, decode=True, timeout=600)
    assert stream == ref, "multihost stream must be byte-identical"
    assert info.get("dec_identical") is True


def test_tile_shard_partition():
    from grok_tpu.parallel.multihost import tile_shard

    for nt in (1, 5, 16, 17):
        for np_ in (1, 2, 3, 4, 8):
            shards = [list(tile_shard(nt, np_, p)) for p in range(np_)]
            flat = [t for s in shards for t in s]
            assert flat == list(range(nt))  # contiguous, ordered, complete
            sizes = [len(s) for s in shards]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_multihost_shared_plane_identical():
    """The shared-filesystem offset-exchange plane (production data
    plane: only length records cross the coordinator) must produce the
    same bytes as single-host compress AND as the KV plane."""
    h = w = 512
    im = gk.Image.from_array(mh.make_image(h, w))
    ref = gk.compress(im, mh.build_params("lossless53"))
    stream, info = mh.run_group(2, "lossless53", h, w, decode=True,
                                plane="shared", timeout=600)
    assert stream == ref
    assert info.get("plane") == "shared"
    assert info.get("dec_identical") is True
