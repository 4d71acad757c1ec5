"""Stream abstraction + strip-streaming encode (reference parity:
util/BufferedStream.h, GrkMappedFile.cpp, IImageFormat.h strip encode)."""

import io

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.codestream.stripe import StripCompressor
from grok_tpu.core.stream import CallbackSource
from tests.conftest import natural_image


def test_decode_sources_equal(tmp_path):
    arr = natural_image(96, 128, 3)
    stream = gk.compress(gk.Image.from_array(arr),
                         gk.CompressParams(num_resolutions=3, write_tlm=True))
    p = tmp_path / "s.j2k"
    p.write_bytes(stream)
    a = gk.decompress(stream).to_array()          # memory
    b = gk.decompress(str(p)).to_array()          # mmap path
    with open(p, "rb") as f:
        c = gk.decompress(f).to_array()           # file object

    reads = []

    def read_fn(off, n):
        reads.append((off, n))
        return stream[off : off + n]

    d = gk.decompress(CallbackSource(read_fn, len(stream), chunk=4096)).to_array()
    assert np.array_equal(a, b) and np.array_equal(a, c) and np.array_equal(a, d)
    assert reads  # the callback source was actually pulled


def test_strip_encode_byte_identical(rng):
    """Row-fed strip encoding produces the exact one-shot codestream while
    holding only one tile row in memory."""
    arr = natural_image(200, 230, 3)
    params = dict(num_resolutions=3, tile_size=(64, 64), write_tlm=True)
    ref = gk.compress(gk.Image.from_array(arr), gk.CompressParams(**params))
    buf = io.BytesIO()
    sc = StripCompressor(buf, 230, 200, 3, 8, gk.CompressParams(**params))
    max_buf_rows = 0
    y = 0
    while y < 200:
        n = min(int(rng.integers(1, 41)), 200 - y)
        sc.push(arr[y : y + n])
        max_buf_rows = max(max_buf_rows, sc._buf.shape[0])
        y += n
    sc.close()
    assert buf.getvalue() == ref
    assert max_buf_rows <= 2 * 64  # bounded by ~one tile row + one strip


def test_strip_encode_to_file(tmp_path, rng):
    arr = natural_image(130, 150)
    path = tmp_path / "strip.j2k"
    sc = StripCompressor(str(path), 150, 130, 1, 8,
                         gk.CompressParams(num_resolutions=3,
                                           tile_size=(64, 64),
                                           write_tlm=True))
    for y in range(0, 130, 13):
        sc.push(arr[y : y + 13])
    sc.close()
    out = gk.decompress(str(path)).to_array()
    assert np.array_equal(out.squeeze(), arr)


def test_strip_encode_io_uring(tmp_path, rng, monkeypatch):
    """File-path strip output rides the kernel io_uring (raw-syscall
    wrapper, reference FileUringIO parity) and stays byte-identical to
    the one-shot stream, TLM patch included."""
    from grok_tpu.core.stream import AsyncWriter
    from grok_tpu.t1.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "uring_writer_create"):
        pytest.skip("native lib unavailable")
    probe = AsyncWriter(str(tmp_path / "probe.bin"))
    uring_ok = probe._uring is not None
    probe.write(b"x")
    probe.close()
    if not uring_ok:
        pytest.skip("io_uring unavailable in this environment")

    arr = natural_image(200, 230, 3)
    params = dict(num_resolutions=3, tile_size=(64, 64), write_tlm=True)
    ref = gk.compress(gk.Image.from_array(arr), gk.CompressParams(**params))
    path = tmp_path / "uring.j2k"
    sc = StripCompressor(str(path), 230, 200, 3, 8,
                         gk.CompressParams(**params), async_io=True)
    assert getattr(sc.out, "_uring", None) is not None
    for y in range(0, 200, 17):
        sc.push(arr[y : y + 17])
    sc.close()
    assert path.read_bytes() == ref

    # forced fallback path (GROK_TPU_URING=0) must produce the same bytes
    monkeypatch.setenv("GROK_TPU_URING", "0")
    path2 = tmp_path / "thread.j2k"
    sc2 = StripCompressor(str(path2), 230, 200, 3, 8,
                          gk.CompressParams(**params), async_io=True)
    assert getattr(sc2.out, "_uring", None) is None
    for y in range(0, 200, 17):
        sc2.push(arr[y : y + 17])
    sc2.close()
    assert path2.read_bytes() == ref


def test_tile_encoder_out_of_order():
    """Per-tile push API (grk_compress_tile parity): tiles pushed in any
    order produce a byte-identical stream to the one-shot encoder."""
    import io

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (150, 220, 3)).astype(np.int32)
    img = gk.Image.from_array(arr)

    def params():
        return gk.CompressParams(num_resolutions=3, tile_size=(96, 64),
                                 write_tlm=True)

    ref = bytes(gk.compress(img, params()))
    from grok_tpu.codestream.compress import TileEncoder

    assert gk.TileEncoder is TileEncoder  # exported at package root
    from grok_tpu.codestream.stripe import StripCompressor as _SC

    assert gk.StripCompressor is _SC

    buf = io.BytesIO()
    te = TileEncoder(buf, img, params())
    for ti in reversed(range(te.siz.num_tiles)):
        tb = te.siz.tile_bounds(ti)
        comp = [np.ascontiguousarray(arr[tb.y0:tb.y1, tb.x0:tb.x1, c])
                for c in range(3)]
        te.compress_tile(ti, comp)
    te.close()
    assert buf.getvalue() == ref
    with pytest.raises(ValueError):
        te2 = TileEncoder(io.BytesIO(), img, params())
        te2.compress_tile(0, comp)
        te2.compress_tile(0, comp)
