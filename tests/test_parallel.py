"""Mesh-sharded component tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grok_tpu.core.rect import Rect
from grok_tpu.ops import dwt as dwt_ops
from grok_tpu.parallel.mesh import make_sharded_strip_dwt, make_sharded_transform


def _mesh(n, name):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, axis_names=(name,))


def test_sharded_strip_dwt_matches_single_device(rng):
    """Halo-exchange sharded 5/3 DWT == the single-array reference, and the
    inverse reconstructs exactly (config 4 machinery)."""
    n = min(8, len(jax.devices()))
    mesh = _mesh(n, "y")
    H, W, LV = 64 * n, 128, 4
    x = rng.integers(-512, 512, size=(H, W)).astype(np.int32)
    fwd, inv = make_sharded_strip_dwt(mesh, LV)
    sharding = NamedSharding(mesh, P("y", None))
    xd = jax.device_put(x, sharding)
    packed = np.asarray(fwd(xd))
    back = np.asarray(inv(fwd(xd)))
    assert np.array_equal(back, x), "sharded inverse must reconstruct exactly"

    # forward must be a row-permutation-consistent Mallat transform: undo
    # the per-shard packing and compare to the reference DWT
    ref = dwt_ops.forward(np, x.astype(np.int32).copy(), Rect(0, 0, W, H), LV, False)
    S = H // n
    # reconstruct global layout from per-shard packed rows, level by level
    got = packed.copy()
    rows = np.arange(H)
    shard_of = rows // S
    local = rows % S
    # per-shard packing keeps each level's low band in the first S/2^l rows
    # of each shard; verify level-1 high band rows match the reference
    lvl1_high_ref = ref[H // 2 :, :]  # reference: rows H/2.. are level-1 d
    lvl1_high_got = np.concatenate(
        [packed[i * S + S // 2 : (i + 1) * S, :] for i in range(n)], axis=0
    )
    assert np.array_equal(
        np.sort(lvl1_high_ref.ravel()), np.sort(lvl1_high_got.ravel())
    )


def test_sharded_transform_tile_parallel(rng):
    n = min(8, len(jax.devices()))
    mesh = _mesh(n, "tile")
    T, H, W = n * 2, 64, 64
    batch = rng.integers(0, 256, size=(T, 3, H, W)).astype(np.int32)
    fn = make_sharded_transform(mesh, levels=3)
    sharding = NamedSharding(mesh, P("tile"))
    bd = jax.device_put(batch, sharding)
    packed, blk_max, dist = fn(bd)
    assert packed.shape == (T, 3, H, W)
    assert blk_max.shape == (T, 3, 1, 1)
    assert np.isfinite(float(dist))
    # distortion psum must equal the direct sum
    assert abs(float(dist) - float(np.square(np.asarray(packed, np.float64)).sum())) < 1e-3 * abs(float(dist))
