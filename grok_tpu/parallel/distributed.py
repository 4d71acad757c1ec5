"""Distributed (mesh-sharded) encode driver — BASELINE config 4.

Tiles are the natural independent work unit of the codestream (no filtering
crosses a tile boundary), so the production multi-chip axis shards TILES
over the mesh: every device runs the full transform chain (DC shift -> MCT
-> DWT -> quantization) for its tile shard as one jitted shard_map program;
the entropy-coded tile bodies are then assembled on the host in tile order
with a TLM index — the collective analogue of the reference's tile min-heap
stream assembly (CodeStreamCompress.cpp:615-699).

The reversible (5/3) transform is bit-exact between the device batch and
the host path, so ``compress_distributed`` produces a codestream
byte-identical to ``gk.compress`` — asserted by tests/test_parallel.py and
the driver's dryrun_multichip.

Tiles whose shape differs from the dominant tile size (right/bottom edges)
fall back to the per-tile host transform; they still ride the same ordered
assembly.
"""

from __future__ import annotations

import numpy as np

from ..codestream.compress import (
    build_siz,
    build_tcp,
    compress as _compress,
    _extract_tile,
)
from ..codestream.quantizer import apply_band_quant
from ..core.params import CompressParams
from ..tile.tile_processor import TileProcessor


def _make_mesh(n_devices=None):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("tile",))


def compress_distributed(image, params: CompressParams | None = None,
                         mesh=None) -> bytes:
    """Distributed encode over a tile mesh; byte-identical to compress()."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..ops import jax_pipeline

    params = params or CompressParams()
    params.validate()
    image.finalize()
    if params.profile:
        from ..codestream.profile import apply_profile

        apply_profile(params, image)

    siz = build_siz(image, params)
    tcp = build_tcp(image, params)
    mesh = mesh or _make_mesh()
    n_dev = mesh.shape["tile"]

    # group tiles by tile-component geometry; batch the dominant full-size
    # group over the mesh, everything else takes the host fallback
    shapes: dict[tuple, list[int]] = {}
    subsampled = any(c.dx != 1 or c.dy != 1 for c in siz.comps)
    for ti in range(siz.num_tiles):
        tb = siz.tile_bounds(ti)
        shapes.setdefault((tb.width, tb.height), []).append(ti)
    batch_tiles: list[int] = []
    if not subsampled and siz.num_tiles > 1:
        batch_tiles = max(shapes.values(), key=len)
        if len(batch_tiles) < 2:
            batch_tiles = []

    coeff_map: dict[int, list[np.ndarray]] = {}
    if batch_tiles:
        t0 = batch_tiles[0]
        tp0 = TileProcessor(siz, tcp, t0, enc_params=params)
        for c in range(siz.num_comps):
            apply_band_quant(tp0.geoms[c], tcp.tccps[c], tp0._comp_prec(c))
        fwd_one = jax_pipeline.make_forward_fn(
            tp0.geoms, tcp.tccps, siz.comps, tcp.mct
        )

        def batched(stack):  # [T_local, C, H, W]
            def one(tile):
                outs = fwd_one(*[tile[c] for c in range(tile.shape[0])])
                return jnp.stack(outs, axis=0)

            return jax.vmap(one)(stack)

        sharded = jax.jit(
            shard_map(
                batched, mesh=mesh,
                in_specs=(P("tile"),), out_specs=P("tile"),
            )
        )

        stack = np.stack(
            [
                np.stack(
                    [a.astype(np.int32) for a in _extract_tile(image, siz, ti)],
                    axis=0,
                )
                for ti in batch_tiles
            ],
            axis=0,
        )
        # pad the batch to a multiple of the mesh size
        t_total = stack.shape[0]
        pad = (-t_total) % n_dev
        if pad:
            stack = np.concatenate(
                [stack, np.zeros((pad, *stack.shape[1:]), np.int32)], axis=0
            )
        out = np.asarray(sharded(jnp.asarray(stack)))
        for i, ti in enumerate(batch_tiles):
            coeff_map[ti] = [out[i, c] for c in range(out.shape[1])]

    def tile_coeff_fn(ti):
        return coeff_map.get(ti)

    return _compress(image, params, tile_coeff_fn=tile_coeff_fn)
