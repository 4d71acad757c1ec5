"""Mesh-sharded codec components (SURVEY §2.3 P1-P8 TPU equivalents).

The reference's parallelism is a single-host thread pool; here the same
axes become mesh axes with XLA collectives:

* tile parallelism (P1/P2): `shard_map` over a "tile" axis — each device
  transforms a batch of tiles; per-tile entropy coding rides the lanes.
* sharded-tile DWT (P4, BASELINE config 4): a tile strip sharded along Y
  across devices, with one-row halo exchanges via `jax.lax.ppermute` per
  lifting step — the distributed generalization of the reference's
  windowed lifting (WaveletReverse.cpp FILTER_WIDTH halos).
* rate-allocation stats (P8): `psum` of distortion / byte counts — the
  collective analogue of RateInfo::synch + the tile min-heap gather.

Everything compiles under jit on a `jax.sharding.Mesh`; tests run on a
virtual 8-device CPU mesh, production on ICI.
"""

from __future__ import annotations

import functools

import numpy as np


def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ------------------------------------------------------------ halo helpers
# n_shards is always static (from the mesh shape) so ppermute gets concrete
# permutation lists.
def _halo_from_next(x, axis_name, n_shards):
    """Receive the first row of the next shard (edge shards get zeros; the
    caller fixes the global boundary with symmetric-extension clamping)."""
    import jax

    perm = [(i, i - 1) for i in range(1, n_shards)]  # shard i sends to i-1
    return jax.lax.ppermute(x, axis_name, perm)


def _halo_from_prev(x, axis_name, n_shards):
    import jax

    perm = [(i, i + 1) for i in range(n_shards - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _is_last(axis_name, n_shards):
    import jax

    return jax.lax.axis_index(axis_name) == n_shards - 1


def _is_first(axis_name):
    import jax

    return jax.lax.axis_index(axis_name) == 0


# ------------------------------------------------- sharded 5/3 lifting DWT
def _fwd53_v_sharded(x, axis_name, n_shards):
    """One vertical 5/3 forward lifting pass on a Y-sharded array.

    x: [S, W] local shard (S even, global row offset even). Returns the
    locally packed [s | d] halves. Needs two one-row halo exchanges."""
    jax, jnp = _jax()
    s = x[0::2]
    d = x[1::2]

    # predict: d[j] -= floor((s[j] + s[j+1]) / 2); the last d of a shard
    # needs the next shard's first s row
    s_next_first = _halo_from_next(s[0:1], axis_name, n_shards)
    last = _is_last(axis_name, n_shards)
    # global symmetric extension: on the last shard, clamp to own last s
    s_next_first = jnp.where(last, s[-1:], s_next_first)
    s_right = jnp.concatenate([s[1:], s_next_first], axis=0)
    d = d - ((s + s_right) >> 1)

    # update: s[i] += floor((d[i-1] + d[i] + 2) / 4); the first s needs the
    # previous shard's last d row
    d_prev_last = _halo_from_prev(d[-1:], axis_name, n_shards)
    first = _is_first(axis_name)
    d_prev_last = jnp.where(first, d[0:1], d_prev_last)
    d_left = jnp.concatenate([d_prev_last, d[:-1]], axis=0)
    s = s + ((d_left + d + 2) >> 2)
    return jnp.concatenate([s, d], axis=0)


def _inv53_v_sharded(y, axis_name, n_shards):
    """Inverse of _fwd53_v_sharded on the locally packed [s | d] halves."""
    jax, jnp = _jax()
    half = y.shape[0] // 2
    s = y[:half]
    d = y[half:]

    d_prev_last = _halo_from_prev(d[-1:], axis_name, n_shards)
    first = _is_first(axis_name)
    d_prev_last = jnp.where(first, d[0:1], d_prev_last)
    d_left = jnp.concatenate([d_prev_last, d[:-1]], axis=0)
    s = s - ((d_left + d + 2) >> 2)

    s_next_first = _halo_from_next(s[0:1], axis_name, n_shards)
    last = _is_last(axis_name, n_shards)
    s_next_first = jnp.where(last, s[-1:], s_next_first)
    s_right = jnp.concatenate([s[1:], s_next_first], axis=0)
    d = d + ((s + s_right) >> 1)

    out = jnp.zeros_like(y)
    out = out.at[0::2].set(s)
    out = out.at[1::2].set(d)
    return out


def _fwd53_h_local(x):
    """Horizontal 5/3 pass (unsharded axis), parity 0, packed output."""
    _, jnp = _jax()
    s = x[:, 0::2]
    d = x[:, 1::2]
    s_right = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    d = d - ((s + s_right) >> 1)
    d_left = jnp.concatenate([d[:, :1], d[:, :-1]], axis=1)
    s = s + ((d_left + d + 2) >> 2)
    return jnp.concatenate([s, d], axis=1)


def _inv53_h_local(y):
    _, jnp = _jax()
    half = y.shape[1] // 2
    s = y[:, :half]
    d = y[:, half:]
    d_left = jnp.concatenate([d[:, :1], d[:, :-1]], axis=1)
    s = s - ((d_left + d + 2) >> 2)
    s_right = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    d = d + ((s + s_right) >> 1)
    out = jnp.zeros_like(y)
    out = out.at[:, 0::2].set(s)
    out = out.at[:, 1::2].set(d)
    return out


def sharded_dwt53_forward(x_local, levels: int, axis_name: str, n_shards: int = 1):
    """Multi-level forward 5/3 DWT of a Y-sharded tile strip.

    Runs inside shard_map. x_local: [S, W] with S divisible by 2^levels and
    W divisible by 2^levels. Layout: per-shard packed — level l's low band
    occupies the first S/2^l rows of every shard (still evenly sharded), so
    each level only exchanges one halo row per lifting step over ICI.
    """
    _, jnp = _jax()
    S, W = x_local.shape
    cur_h, cur_w = S, W
    for _ in range(levels):
        sub = x_local[:cur_h, :cur_w]
        sub = _fwd53_v_sharded(sub, axis_name, n_shards)
        sub = _fwd53_h_local(sub)
        x_local = x_local.at[:cur_h, :cur_w].set(sub)
        cur_h //= 2
        cur_w //= 2
    return x_local


def sharded_dwt53_inverse(y_local, levels: int, axis_name: str, n_shards: int = 1):
    _, jnp = _jax()
    S, W = y_local.shape
    hs = [(S >> l, W >> l) for l in range(levels + 1)]
    for l in range(levels, 0, -1):
        h, w = hs[l - 1]
        sub = y_local[:h, :w]
        sub = _inv53_h_local(sub)
        sub = _inv53_v_sharded(sub, axis_name, n_shards)
        y_local = y_local.at[:h, :w].set(sub)
    return y_local


# --------------------------------------------------- tile-parallel encode
def make_sharded_transform(mesh, levels: int = 5):
    """jit-compiled tile-parallel encode transform: DC shift + RCT + DWT +
    per-codeblock max-magnitude stats, tiles sharded over the mesh's
    'tile' axis; global distortion psum (RateInfo::synch analogue)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..ops import mct as mct_ops

    def per_shard(batch):  # [T_local, 3, H, W] int32
        r, g, b = batch[:, 0], batch[:, 1], batch[:, 2]
        rs = mct_ops.dc_shift_forward(jnp, r, 8, False)
        gs = mct_ops.dc_shift_forward(jnp, g, 8, False)
        bs = mct_ops.dc_shift_forward(jnp, b, 8, False)
        y, cb, cr = mct_ops.rct_forward(jnp, rs, gs, bs)
        comps = jnp.stack([y, cb, cr], axis=1)

        T, C, H, W = comps.shape
        flat = comps.reshape(T * C, H, W)

        from ..core.rect import Rect
        from ..ops import dwt as dwt_ops

        def one(x):
            # the shared multi-level lifting (ops/dwt.py), traced under jit
            return dwt_ops.forward(jnp, x, Rect(0, 0, W, H), levels, False)

        packed = jax.vmap(one)(flat).reshape(T, C, H, W)
        mags = jnp.abs(packed).reshape(T, C, H // 64, 64, W // 64, 64)
        blk_max = mags.max(axis=(3, 5))
        dist = jax.lax.psum(
            jnp.sum(jnp.square(packed.astype(jnp.float32))), "tile"
        )
        return packed, blk_max, dist

    spec = P("tile")
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec,), out_specs=(spec, spec, P()),
    )
    return jax.jit(fn)


def make_sharded_strip_dwt(mesh, levels: int):
    """jit-compiled forward/inverse sharded-strip DWT pair (config 4)."""
    import jax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n = mesh.shape["y"]
    fwd = shard_map(
        functools.partial(sharded_dwt53_forward, levels=levels, axis_name="y",
                          n_shards=n),
        mesh=mesh, in_specs=(P("y", None),), out_specs=P("y", None),
    )
    inv = shard_map(
        functools.partial(sharded_dwt53_inverse, levels=levels, axis_name="y",
                          n_shards=n),
        mesh=mesh, in_specs=(P("y", None),), out_specs=P("y", None),
    )
    return jax.jit(fwd), jax.jit(inv)
