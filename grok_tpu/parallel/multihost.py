"""Multi-host (multi-process) distributed codec — the DCN half of
SURVEY §2.3 P8.

Generalizes the reference's ordered tile-part stream assembly
(/root/reference/src/lib/jp2/codestream/CodeStreamCompress.cpp:615-699 —
tiles encoded by a thread pool, serialized to the output in tile order)
across ``jax.distributed`` processes:

- every process derives the identical SIZ/COD header state from the same
  (image geometry, params) pair, takes a contiguous shard of the tile
  grid, and runs transform + entropy for its shard locally — the
  transform as fingerprint-grouped shard_map batches over its LOCAL
  device mesh (``jax.local_devices()``, the ICI half), the entropy stage
  on its host coder pool;
- per-tile SOT..body blobs plus their TLM/PLM records ride the
  coordinator's key-value store (chunked; the same service that backs
  jax.distributed startup — on a pod this is the DCN control plane);
- process 0 assembles main header + tiles in tile-index order + EOC and
  patches TLM, producing a stream byte-identical to single-host
  ``gk.compress`` (asserted by tools/multihost_run.py and
  tests/test_multihost.py).

Data planes:

- ``compress_multihost(...)`` — tile bodies ride the coordination
  service's KV store (chunked). Control-plane simple, fine for tests
  and small shards.
- ``compress_multihost_shared(..., out_path=...)`` — the production
  plane: only LENGTH RECORDS cross the DCN. Every process computes the
  identical main header locally (it is a pure function of geometry +
  params), publishes its shard's byte length, reads the others',
  derives its absolute offset by prefix sum, and pwrites its tile
  bodies directly into the shared output file. Process 0 writes the
  header, patches TLM from the exchanged per-tile lengths, and appends
  EOC. No tile byte ever transits the coordinator. Byte-identical to
  single-host ``gk.compress`` (tests/test_multihost.py).
"""

from __future__ import annotations

import pickle

import numpy as np

from ..codestream.compress import (
    build_siz,
    build_tcp,
    encode_tile_to_blob,
    write_main_header,
)
from ..codestream import markers as mk
from ..core.params import CompressParams

_EPOCH = [0]
_KV_CHUNK = 1 << 20  # coordination-service values are chunked at 1 MiB


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kw) -> None:
    """Join the process group (thin wrapper over jax.distributed)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kw)


def _client():
    import jax  # noqa: F401  (initialize first)
    from jax._src import distributed

    c = distributed.global_state.client
    if c is None:
        raise RuntimeError(
            "multihost: jax.distributed not initialized "
            "(call multihost.initialize or jax.distributed.initialize)")
    return c


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def tile_shard(num_tiles: int, nproc: int, pid: int) -> range:
    """Contiguous balanced tile shard of process ``pid``."""
    base, rem = divmod(num_tiles, nproc)
    lo = pid * base + min(pid, rem)
    return range(lo, lo + base + (1 if pid < rem else 0))


def _kv_put(client, key: str, blob: bytes, timeout_ms: int) -> None:
    nch = (len(blob) + _KV_CHUNK - 1) // _KV_CHUNK or 1
    client.key_value_set_bytes(f"{key}/n", str(nch).encode())
    for i in range(nch):
        client.key_value_set_bytes(
            f"{key}/{i}", blob[i * _KV_CHUNK:(i + 1) * _KV_CHUNK])


def _kv_get(client, key: str, timeout_ms: int) -> bytes:
    nch = int(client.blocking_key_value_get_bytes(f"{key}/n", timeout_ms))
    return b"".join(
        client.blocking_key_value_get_bytes(f"{key}/{i}", timeout_ms)
        for i in range(nch))


def compress_multihost(image, params: CompressParams | None = None,
                       tile_provider=None, use_local_mesh: bool = True,
                       timeout_ms: int = 600_000) -> bytes | None:
    """N-process distributed encode; returns the codestream on process 0,
    None elsewhere. Byte-identical to single-host ``gk.compress(image)``.

    ``image`` must describe the same canvas geometry in every process;
    pixel data is only read for the tiles of the local shard, so on a
    real pod each host materializes just its shard (supply the planes
    via ``tile_provider(tile_index) -> [comp arrays]`` and leave the
    component data of remote tiles unallocated).

    ``use_local_mesh`` routes the transform of the local shard over the
    process's local device mesh (ICI); the cross-process axis (DCN) only
    ever carries entropy-coded bytes + length records, which is what
    makes the layout production-shaped: collectives ride ICI, the DCN
    hop is one ordered gather of compressed tiles.
    """
    import jax

    params = params or CompressParams()
    params.validate()
    image.finalize()
    if params.profile:
        from ..codestream.profile import apply_profile

        apply_profile(params, image)

    nproc = jax.process_count()
    pid = jax.process_index()
    client = _client()
    _EPOCH[0] += 1
    ep = _EPOCH[0]

    siz = build_siz(image, params)
    tcp = build_tcp(image, params)
    if params.ht:
        siz.rsiz |= 0x4000
    if params.mct_matrix is not None:
        siz.rsiz |= 0x8100

    my_tiles = list(tile_shard(siz.num_tiles, nproc, pid))

    # ---- local transform on the local device mesh (ICI axis)
    coeff_map = {}
    if use_local_mesh and my_tiles and tile_provider is None \
            and siz.num_tiles > 1:
        from jax.sharding import Mesh

        from .distributed import transform_tiles_on_mesh

        local = jax.local_devices()
        mesh = Mesh(np.array(local), ("tile",))
        coeff_map = transform_tiles_on_mesh(
            image, siz, tcp, params, my_tiles, mesh)

    # ---- local entropy + T2 on the host pool
    from concurrent.futures import ThreadPoolExecutor

    from ..core.cpu import host_threads, set_tile_threads

    def enc_one(ti):
        coeffs = coeff_map.get(ti)
        if coeffs is None and tile_provider is not None:
            comp_arrays = tile_provider(ti)
        elif coeffs is None:
            from ..codestream.compress import _extract_tile

            comp_arrays = _extract_tile(image, siz, ti)
        else:
            comp_arrays = None
        return encode_tile_to_blob(siz, tcp, params, ti, comp_arrays, coeffs)

    results = []
    if my_tiles:
        nw = min(host_threads(params.num_threads), len(my_tiles), 8)
        per_tile = max(1, host_threads(params.num_threads) // nw)

        def work(ti):
            set_tile_threads(per_tile)
            return enc_one(ti)

        if nw > 1:
            with ThreadPoolExecutor(max_workers=nw) as ex:
                results = list(ex.map(work, my_tiles))
        else:
            results = [work(ti) for ti in my_tiles]

    # ---- DCN hop: publish the shard, barrier, assemble on process 0
    payload = pickle.dumps(results, protocol=pickle.HIGHEST_PROTOCOL)
    _kv_put(client, f"gkmh/{ep}/shard/{pid}", payload, timeout_ms)
    client.wait_at_barrier(f"gkmh/{ep}/ready", timeout_in_ms=timeout_ms)

    if pid != 0:
        return None

    out, tlm_offset = write_main_header(siz, tcp, params, image)
    tile_part_lengths: list[tuple[int, int]] = []
    tiles_blob = bytearray()
    plm_parts: list[list[int]] = []
    for p in range(nproc):
        shard = (results if p == pid else pickle.loads(
            _kv_get(client, f"gkmh/{ep}/shard/{p}", timeout_ms)))
        for blob, part_lens, plens_list in shard:
            tiles_blob += blob
            tile_part_lengths.extend(part_lens)
            plm_parts.extend(plens_list)

    if params.write_tlm and tlm_offset is not None:
        tlm = mk.write_tlm(
            tile_part_lengths, st=1 if siz.num_tiles <= 255 else 2)
        out[tlm_offset:tlm_offset + len(tlm)] = tlm
    if params.write_plm:
        out += mk.write_plm(plm_parts)
    out += tiles_blob
    out += mk._u16(mk.EOC)
    return bytes(out)


def compress_multihost_shared(image, params: CompressParams | None = None,
                              out_path: str | None = None,
                              tile_provider=None,
                              use_local_mesh: bool = True,
                              timeout_ms: int = 600_000) -> int | None:
    """Shared-filesystem N-process encode (the production data plane).

    Every process encodes its contiguous tile shard and pwrites the
    bodies straight into ``out_path`` at an offset derived from the
    exchanged shard lengths; only (length, TLM/PLM record) metadata
    crosses the coordinator (reference analogue: the ordered stream
    writer, CodeStreamCompress.cpp:615-699, with the serialization
    replaced by offset arithmetic). Returns the stream length on
    process 0, None elsewhere; the bytes in ``out_path`` are
    byte-identical to single-host ``gk.compress``."""
    import jax

    params = params or CompressParams()
    params.validate()
    image.finalize()
    if params.profile:
        from ..codestream.profile import apply_profile

        apply_profile(params, image)
    if out_path is None:
        raise ValueError("compress_multihost_shared requires out_path")

    nproc = jax.process_count()
    pid = jax.process_index()
    client = _client()
    _EPOCH[0] += 1
    ep = _EPOCH[0]

    siz = build_siz(image, params)
    tcp = build_tcp(image, params)
    if params.ht:
        siz.rsiz |= 0x4000
    if params.mct_matrix is not None:
        siz.rsiz |= 0x8100

    my_tiles = list(tile_shard(siz.num_tiles, nproc, pid))

    coeff_map = {}
    if use_local_mesh and my_tiles and tile_provider is None \
            and siz.num_tiles > 1:
        from jax.sharding import Mesh

        from .distributed import transform_tiles_on_mesh

        local = jax.local_devices()
        mesh = Mesh(np.array(local), ("tile",))
        coeff_map = transform_tiles_on_mesh(
            image, siz, tcp, params, my_tiles, mesh)

    from concurrent.futures import ThreadPoolExecutor

    from ..core.cpu import host_threads, set_tile_threads

    def enc_one(ti):
        coeffs = coeff_map.get(ti)
        if coeffs is None and tile_provider is not None:
            comp_arrays = tile_provider(ti)
        elif coeffs is None:
            from ..codestream.compress import _extract_tile

            comp_arrays = _extract_tile(image, siz, ti)
        else:
            comp_arrays = None
        return encode_tile_to_blob(siz, tcp, params, ti, comp_arrays, coeffs)

    results = []
    if my_tiles:
        nw = min(host_threads(params.num_threads), len(my_tiles), 8)
        per_tile = max(1, host_threads(params.num_threads) // nw)

        def work(ti):
            set_tile_threads(per_tile)
            return enc_one(ti)

        if nw > 1:
            with ThreadPoolExecutor(max_workers=nw) as ex:
                results = list(ex.map(work, my_tiles))
        else:
            results = [work(ti) for ti in my_tiles]

    shard_len = sum(len(blob) for blob, _, _ in results)

    # metadata (small, control-plane): shard length + TLM/PLM records
    meta = pickle.dumps(
        (shard_len,
         [pl for _, pl, _ in results],
         [plm for _, _, plm in results]),
        protocol=pickle.HIGHEST_PROTOCOL)
    _kv_put(client, f"gkmh/{ep}/meta/{pid}", meta, timeout_ms)
    client.wait_at_barrier(f"gkmh/{ep}/meta_ready", timeout_in_ms=timeout_ms)

    metas = []
    for p in range(nproc):
        if p == pid:
            metas.append((shard_len, [pl for _, pl, _ in results],
                          [plm for _, _, plm in results]))
        else:
            metas.append(pickle.loads(
                _kv_get(client, f"gkmh/{ep}/meta/{p}", timeout_ms)))

    # every process derives the SAME header (and so the same offsets)
    out, tlm_offset = write_main_header(siz, tcp, params, image)
    if params.write_plm:
        plm_all = [pp for m in metas for plms in m[2] for pp in plms]
        out += mk.write_plm(plm_all)
    header_len = len(out)
    my_off = header_len + sum(m[0] for m in metas[:pid])
    total_len = header_len + sum(m[0] for m in metas) + 2  # + EOC

    # pwrite the local shard at its absolute offset (no cross-host bytes)
    import os as _os

    fd = _os.open(out_path, _os.O_RDWR | _os.O_CREAT, 0o644)
    try:
        _os.ftruncate(fd, total_len)
        off = my_off
        for blob, _, _ in results:
            _os.pwrite(fd, bytes(blob), off)
            off += len(blob)
        if pid == 0:
            if params.write_tlm and tlm_offset is not None:
                tile_part_lengths = [
                    tp for m in metas for pls in m[1] for tp in pls]
                tlm = mk.write_tlm(
                    tile_part_lengths,
                    st=1 if siz.num_tiles <= 255 else 2)
                out[tlm_offset:tlm_offset + len(tlm)] = tlm
            _os.pwrite(fd, bytes(out), 0)
            _os.pwrite(fd, mk._u16(mk.EOC), total_len - 2)
        _os.fsync(fd)
    finally:
        _os.close(fd)
    client.wait_at_barrier(f"gkmh/{ep}/written", timeout_in_ms=timeout_ms)
    return total_len if pid == 0 else None


def decompress_multihost(data: bytes, params=None,
                         timeout_ms: int = 600_000):
    """N-process distributed decode: every process entropy-decodes and
    inverse-transforms its contiguous tile shard (local mesh + host
    pool), the reconstructed planes ride the KV store, process 0 pastes
    them into the full Image (None elsewhere). Sample-identical to
    single-host ``gk.decompress`` (tests/test_multihost.py).

    The pid-0 paste is the window/strip analogue of the encode-side
    ordered assembly; a production pod would keep shards resident per
    host (each host consumes its own window) — the cross-host exchange
    here exists so the dryrun can assert global sample-identity."""
    import jax

    from ..codestream.decompress import Decoder

    nproc = jax.process_count()
    pid = jax.process_index()
    client = _client()
    _EPOCH[0] += 1
    ep = _EPOCH[0]

    dec = Decoder(data, params)
    siz = dec.header.siz
    my_tiles = [ti for ti in tile_shard(siz.num_tiles, nproc, pid)
                if ti in dec.index.spans]

    # decode only the local shard: every other tile keeps its zero fill
    arrays: dict[int, list[np.ndarray]] = {}
    if my_tiles:
        p = dec.params
        from concurrent.futures import ThreadPoolExecutor

        from ..core.cpu import host_threads, set_tile_threads

        nw = min(host_threads(p.num_threads), len(my_tiles), 8)
        per_tile = max(1, host_threads(p.num_threads) // nw)

        def dec_one(ti):
            set_tile_threads(per_tile if nw > 1 else 0)
            return ti, [np.ascontiguousarray(a)
                        for a in dec.decompress_tile(ti)]

        if nw > 1:
            with ThreadPoolExecutor(max_workers=nw) as ex:
                arrays = dict(ex.map(dec_one, my_tiles))
        else:
            arrays = dict(dec_one(ti) for ti in my_tiles)

    payload = pickle.dumps(arrays, protocol=pickle.HIGHEST_PROTOCOL)
    _kv_put(client, f"gkmh/{ep}/dec/{pid}", payload, timeout_ms)
    client.wait_at_barrier(f"gkmh/{ep}/decready", timeout_in_ms=timeout_ms)
    if pid != 0:
        return None

    allarr: dict[int, list[np.ndarray]] = {}
    for p_ in range(nproc):
        shard = (arrays if p_ == 0 else pickle.loads(
            _kv_get(client, f"gkmh/{ep}/dec/{p_}", timeout_ms)))
        allarr.update(shard)
    dec._move_tiles = False
    return dec.decompress(tile_arrays_fn=allarr.get)
