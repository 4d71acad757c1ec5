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

Tiles are grouped by a transform fingerprint — the per-level (origin
parity, size) chain that determines the DWT split structure — and EVERY
group rides the device, so right/bottom edge tiles of a non-multiple image
shard onto the mesh too (one compiled program per distinct geometry, at
most four for a regular grid: interior, right edge, bottom edge, corner).
The fingerprint, not the raw (w, h), is the grouping key: two same-size
tiles whose origins differ in parity at some level transform differently,
so shape-only grouping would mis-batch them (caught by the odd-tile-size
regression in tests/test_parallel.py).
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


def _device_irrev_default() -> bool:
    """Platform-gated default for ``device_irreversible=None``.

    On TPU the device float (9/7 / custom-MCT) chain rounds identically to
    the host (no FMA contraction on the VPU elementwise path; hardware-
    verified by tools/fma_hw_check.py, re-run as a periodic gate), so lossy
    tiles ride the mesh and the stream stays byte-identical. On the CPU
    simulation backend LLVM FMA contraction can drift ±1 ulp, so the
    default keeps irreversible tiles on the host path there; pass
    ``device_irreversible=True`` explicitly to override."""
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _tile_fingerprint(siz, tcp, ti):
    """Transform-equivalence key: tiles with equal fingerprints run the
    same compiled forward/inverse program (same DWT split structure and
    packed-band layout).

    The wavelet lifting splits on ABSOLUTE coordinate parity, and the
    level-l rect is the ceil-halved level-(l-1) rect, so the per-level
    (x0&1, y0&1, w, h) chain captures exactly what the jitted program
    bakes from the tile rect (ops/jax_pipeline.make_forward_fn uses
    g.rect + band sizes; ref: DWT anchoring in T.800 Annex F)."""
    tb = siz.tile_bounds(ti)
    key = []
    for c in range(siz.num_comps):
        comp = siz.comps[c]
        x0 = -(-tb.x0 // comp.dx)
        y0 = -(-tb.y0 // comp.dy)
        x1 = -(-tb.x1 // comp.dx)
        y1 = -(-tb.y1 // comp.dy)
        lev = []
        for _ in range(tcp.tccps[c].num_resolutions):
            lev.append((x0 & 1, y0 & 1, x1 - x0, y1 - y0))
            x0, y0 = -(-x0 // 2), -(-y0 // 2)
            x1, y1 = -(-x1 // 2), -(-y1 // 2)
        key.append(tuple(lev))
    return tuple(key)


def transform_tiles_on_mesh(image, siz, tcp, params, tiles, mesh,
                            device_irreversible: bool | None = None):
    """Run the forward transform chain (DC shift -> MCT -> DWT -> quant)
    for ``tiles`` as fingerprint-grouped shard_map batches over ``mesh``;
    returns {tile_index: [packed coeff plane per component]}.

    Shared by the single-process distributed encoder and the per-process
    local step of the multi-host encoder (parallel/multihost.py). Tiles
    that cannot batch (subsampled components, irreversible flows on a
    platform where the float chain isn't bit-stable) are simply absent
    from the result — the caller's host path covers them."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..ops import jax_pipeline

    if device_irreversible is None:
        device_irreversible = _device_irrev_default()
    n_dev = mesh.shape["tile"]
    groups: dict[tuple, list[int]] = {}
    subsampled = any(c.dx != 1 or c.dy != 1 for c in siz.comps)
    irrev = bool(tcp.tccps and tcp.tccps[0].irreversible)
    coeff_map: dict[int, list[np.ndarray]] = {}
    if subsampled or (irrev and not device_irreversible):
        return coeff_map
    for ti in tiles:
        groups.setdefault(_tile_fingerprint(siz, tcp, ti), []).append(ti)

    for batch_tiles in groups.values():
        t0 = batch_tiles[0]
        tp0 = TileProcessor(siz, tcp, t0, enc_params=params)
        for c in range(siz.num_comps):
            apply_band_quant(tp0.geoms[c], tcp.tccps[c], tp0._comp_prec(c))
        fwd_one = jax_pipeline.make_forward_fn(
            tp0.geoms, tcp.tccps, siz.comps, tcp.mct
        )

        def batched(stack, fwd_one=fwd_one):  # [T_local, C, H, W]
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
    return coeff_map


def compress_distributed(image, params: CompressParams | None = None,
                         mesh=None, device_irreversible: bool | None = None,
                         entropy_workers: int | None = None,
                         entropy_threads: int | None = None) -> bytes:
    """Distributed encode over a tile mesh; byte-identical to compress()
    under the platform-gated default (see :func:`_device_irrev_default`).

    Reversible (5/3) tiles are byte-identical on every backend (integer
    arithmetic). Irreversible (9/7) tiles ride the mesh by default only
    on TPU, where the device float chain rounds identically to the host
    (hardware-verified by tools/fma_hw_check.py); on the CPU simulation
    backend they default to the host transform because LLVM FMA
    contraction can drift ±1 ulp. Pass ``device_irreversible=True`` to
    force lossy tiles onto a non-TPU mesh (equal quality, possibly not
    byte-equal to the host stream) or ``False`` to force the host path
    everywhere.

    The entropy stage (T1 + T2) fans the mesh-transformed tiles out over
    a host worker pool (the TPU analogue of the reference's per-tile
    T1CompressScheduler fan-out); ``entropy_workers`` pins the pool width
    (default: every available core) and ``entropy_threads`` the
    per-worker native team size — the scaling harness uses
    (n_devices, 1) to model per-host cores that scale with the pod."""
    params = params or CompressParams()
    params.validate()
    image.finalize()
    if params.profile:
        from ..codestream.profile import apply_profile

        apply_profile(params, image)

    siz = build_siz(image, params)
    tcp = build_tcp(image, params)
    mesh = mesh or _make_mesh()
    coeff_map = {}
    if siz.num_tiles > 1:
        coeff_map = transform_tiles_on_mesh(
            image, siz, tcp, params, range(siz.num_tiles), mesh,
            device_irreversible)

    return _compress(image, params, tile_coeff_fn=coeff_map.get,
                     entropy_workers=entropy_workers,
                     entropy_threads=entropy_threads)


def _inverse_key(tcp):
    """Hashable summary of everything the device inverse program depends
    on — tiles with equal keys share one compiled shard_map program."""
    mat = tcp.mct_dec_matrix
    off = tcp.mct_offsets
    return (
        tcp.mct,
        None if mat is None else np.asarray(mat, np.float64).tobytes(),
        None if off is None else tuple(float(o) for o in off),
        tuple(
            (
                t.num_resolutions,
                t.irreversible,
                t.roi_shift,
                int(t.quant_style),
                t.guard_bits,
                tuple(t.step_exps),
                tuple(t.step_mants),
            )
            for t in tcp.tccps
        ),
    )


def decompress_distributed(data, params=None, mesh=None,
                           device_irreversible: bool | None = None,
                           entropy_workers: int | None = None,
                           entropy_threads: int | None = None):
    """Distributed decode over a tile mesh; output identical to
    decompress() under the platform-gated default.

    The mirror of :func:`compress_distributed` (P2): tile bodies are
    entropy-decoded on the host pool into int32 staging planes
    (``TileProcessor.decompress(staging_only=True)``), the staging planes of
    the dominant same-geometry tile group are stacked per component and the
    whole dequant -> ROI -> inverse-DWT -> inverse-MCT -> finish chain runs
    as ONE jitted shard_map program over the mesh (the same program
    ``jax_pipeline.build_inverse`` runs single-chip); the reconstructed
    tiles ride the normal ordered paste. 5/3 tiles are bit-exact vs the
    host path on every backend (integer arithmetic). 9/7 / custom-MCT
    tiles ride the mesh by default only on TPU, where the VPU's f32
    rounding is host-identical (hardware-verified by
    tools/fma_hw_check.py) so the output Image equals ``gk.decompress``
    sample-for-sample; on the CPU simulation backend they default to the
    host inverse (LLVM FMA contraction can drift ±1 LSB on rare
    samples). ``device_irreversible=True`` forces them onto a non-TPU
    mesh anyway; ``False`` forces the host inverse everywhere.

    Tiles that fail entropy decode, differ in geometry/coding params, or
    fall outside the dominant group take the per-tile host path inside the
    same paste loop (identical output either way).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..codestream.decompress import Decoder
    from ..ops import jax_pipeline
    from ..tile.tile_processor import TileProcessor

    if device_irreversible is None:
        device_irreversible = _device_irrev_default()
    dec = Decoder(data, params)
    p = dec.params
    siz = dec.header.siz

    arrays_of: dict[int, list[np.ndarray]] = {}
    groups: dict[tuple, list[int]] = {}
    parsed: dict[int, tuple] = {}
    if p.window is None and siz.num_tiles > 1:
        for ti in range(siz.num_tiles):
            if ti not in dec.index.spans:
                continue
            try:
                tcp, body, packed = dec._parse_tile_headers(ti)
            except Exception:
                continue  # corrupt headers: host path zero-fills it
            irrev = bool(tcp.tccps[0].irreversible)
            if (irrev or tcp.mct == 2) and not device_irreversible:
                continue
            parsed[ti] = (tcp, body, packed)
            k = (_inverse_key(tcp), _tile_fingerprint(siz, tcp, ti))
            groups.setdefault(k, []).append(ti)

    all_tiles = [ti for tiles in groups.values() for ti in tiles]
    staged: dict[int, object] = {}
    tps: dict[int, TileProcessor] = {}
    if all_tiles:
        from concurrent.futures import ThreadPoolExecutor

        from ..core.cpu import host_threads, set_tile_threads

        nw = min(host_threads(p.num_threads), len(all_tiles), 16)
        if entropy_workers is not None:
            nw = max(1, min(entropy_workers, len(all_tiles)))
        per_tile = entropy_threads or max(
            1, host_threads(p.num_threads) // nw)

        def stage_one(ti):
            set_tile_threads(per_tile if nw > 1 else 0)
            tcp, body, packed = parsed[ti]
            tp = TileProcessor(siz, tcp, ti)
            try:
                st = tp.decompress(
                    body, p.max_layers, p.reduce, packed_headers=packed,
                    plt=dec._plt.get(ti), staging_only=True,
                )
            except Exception:
                return ti, None  # host path handles + zero-fills
            tps[ti] = tp
            return ti, st

        if nw > 1:
            with ThreadPoolExecutor(max_workers=nw) as ex:
                staged = dict(ex.map(stage_one, all_tiles))
        else:
            staged = dict(stage_one(ti) for ti in all_tiles)

    for batch in groups.values():
        batch = [ti for ti in batch if staged.get(ti) is not None]
        if not batch:
            continue
        mesh = mesh or _make_mesh()
        n_dev = mesh.shape["tile"]
        tp0 = tps[batch[0]]  # band quant applied by its staging decode
        tcp0 = parsed[batch[0]][0]
        ncomp = siz.num_comps
        inv_one = jax_pipeline.make_inverse_fn(
            tp0.geoms, tcp0.tccps, siz.comps, tcp0.mct, p.reduce,
            mct_dec_matrix=tcp0.mct_dec_matrix, mct_offsets=tcp0.mct_offsets,
        )

        def batched(*stacks, inv_one=inv_one):  # stacks[c]: [T_local, Hc, Wc]
            return jax.vmap(lambda *planes: inv_one(*planes))(*stacks)

        sharded = jax.jit(
            shard_map(batched, mesh=mesh,
                      in_specs=P("tile"), out_specs=P("tile"))
        )
        pad = (-len(batch)) % n_dev
        stacks = []
        for c in range(ncomp):
            planes = [staged[ti][c] for ti in batch]
            planes += [np.zeros_like(planes[0])] * pad
            stacks.append(jnp.asarray(np.stack(planes, axis=0)))
        outs = sharded(*stacks)
        outs = [np.asarray(o) for o in outs]
        for i, ti in enumerate(batch):
            arrays_of[ti] = [
                np.ascontiguousarray(outs[c][i]) for c in range(ncomp)
            ]

    if not arrays_of:
        dec._move_tiles = True
        return dec.decompress()
    return dec.decompress(tile_arrays_fn=arrays_of.get)


def compress_frames(images, params: CompressParams | None = None,
                    mesh=None, device_irreversible: bool | None = None
                    ) -> list[bytes]:
    """Frame-parallel batch encode (P7): a video/DCI sequence of
    same-geometry frames is stacked on the frame axis and sharded over the
    mesh — every device runs the whole transform chain for its frame shard
    in one program, then the per-frame entropy/T2/assembly runs on host
    threads. Each returned codestream is byte-identical to
    ``gk.compress(frame)`` under the platform-gated default (asserted by
    tests/test_parallel.py).

    Frames whose geometry differs from the first frame's, subsampled or
    multi-tile inputs fall back to the per-frame host path (same output).
    Irreversible (9/7) sequences batch on the mesh by default only on
    TPU, where the device float chain rounds identically to the host
    (hardware-verified by tools/fma_hw_check.py) and the byte-identity
    guarantee covers the lossy path too; on the CPU simulation backend
    they default to the host transform (LLVM FMA contraction can drift
    ±1 ulp — equal quality, not byte-equal). ``device_irreversible=True``
    forces mesh batching anyway; ``False`` forces the host transform.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..ops import jax_pipeline

    if device_irreversible is None:
        device_irreversible = _device_irrev_default()
    params = params or CompressParams()
    params.validate()
    if not images:
        return []
    for im in images:
        im.finalize()
    if params.profile:
        from ..codestream.profile import apply_profile

        apply_profile(params, images[0])

    siz = build_siz(images[0], params)
    tcp = build_tcp(images[0], params)
    subsampled = any(c.dx != 1 or c.dy != 1 for c in siz.comps)

    def _same_geometry(im) -> bool:
        return (im.x0, im.y0, im.x1, im.y1) == (
            images[0].x0, images[0].y0, images[0].x1, images[0].y1
        ) and len(im.components) == len(images[0].components) and all(
            (a.prec, a.signed, a.dx, a.dy) == (b.prec, b.signed, b.dx, b.dy)
            for a, b in zip(im.components, images[0].components)
        )

    irrev = bool(tcp.tccps and tcp.tccps[0].irreversible)
    batch_idx = [
        i for i, im in enumerate(images)
        if _same_geometry(im) and not subsampled and siz.num_tiles == 1
    ]
    if irrev and not device_irreversible:
        batch_idx = []
    coeffs_of: dict[int, list[np.ndarray]] = {}
    if len(batch_idx) >= 2:
        mesh = mesh or _make_mesh()
        n_dev = mesh.shape["tile"]
        tp0 = TileProcessor(siz, tcp, 0, enc_params=params)
        for c in range(siz.num_comps):
            apply_band_quant(tp0.geoms[c], tcp.tccps[c], tp0._comp_prec(c))
        fwd_one = jax_pipeline.make_forward_fn(
            tp0.geoms, tcp.tccps, siz.comps, tcp.mct
        )

        def batched(stack):  # [F_local, C, H, W]
            def one(frame):
                outs = fwd_one(*[frame[c] for c in range(frame.shape[0])])
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
                    [c.data.astype(np.int32)
                     for c in images[i].components],
                    axis=0,
                )
                for i in batch_idx
            ],
            axis=0,
        )
        pad = (-stack.shape[0]) % n_dev
        if pad:
            stack = np.concatenate(
                [stack, np.zeros((pad, *stack.shape[1:]), np.int32)], axis=0
            )
        out = np.asarray(sharded(jnp.asarray(stack)))
        for row, i in enumerate(batch_idx):
            coeffs_of[i] = [out[row, c] for c in range(out.shape[1])]

    # per-frame entropy + T2 + assembly on host threads (the native T1/T2
    # calls release the GIL; cap each worker's OpenMP team)
    from concurrent.futures import ThreadPoolExecutor

    from ..core.cpu import host_threads, set_tile_threads

    nw = min(host_threads(getattr(params, "num_threads", 0)), len(images), 8)
    per_frame = max(1, host_threads(getattr(params, "num_threads", 0)) // nw)

    import copy

    def encode_one(i):
        set_tile_threads(per_frame)
        # compress() may (idempotently) mutate params via apply_profile;
        # give each worker its own copy so frames can't race on it
        p = copy.deepcopy(params)
        cf = coeffs_of.get(i)
        if cf is not None:
            return _compress(images[i], p,
                             tile_coeff_fn=lambda ti: cf if ti == 0 else None)
        return _compress(images[i], p)

    if nw > 1 and len(images) > 1:
        with ThreadPoolExecutor(max_workers=nw) as ex:
            return list(ex.map(encode_one, range(len(images))))
    return [encode_one(i) for i in range(len(images))]
