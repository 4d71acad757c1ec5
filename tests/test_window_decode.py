"""Sub-tile windowed decode: only codeblocks inside the per-level filter
supports are entropy-decoded, and the windowed inverse DWT (FILTER_WIDTH
halos) reproduces the full decode bit-exactly on the window (parity:
T1DecompressScheduler.cpp:47-52, WaveletReverse.cpp:1890-1925)."""

import time

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.core.rect import Rect
from grok_tpu.ops import dwt as dwt_ops
from tests.conftest import natural_image


@pytest.mark.parametrize("cfg", [
    dict(num_resolutions=5),
    dict(num_resolutions=5, irreversible=True),
    dict(num_resolutions=4, tile_size=(96, 96)),
    dict(num_resolutions=5, ht=True),
])
def test_window_matches_full_decode(cfg, rng):
    arr = natural_image(220, 300, 3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(**cfg))
    full = gk.decompress(stream).to_array()
    for _ in range(3):
        x0 = int(rng.integers(0, 280))
        y0 = int(rng.integers(0, 200))
        x1 = min(300, x0 + int(rng.integers(1, 70)))
        y1 = min(220, y0 + int(rng.integers(1, 70)))
        out = gk.decompress(
            stream, gk.DecompressParams(window=(x0, y0, x1, y1))
        ).to_array()
        assert np.array_equal(out, full[y0:y1, x0:x1])


def test_window_restricts_entropy_decode(rng, monkeypatch):
    """A small window on a large single-tile image must entropy-decode only
    the intersecting codeblocks — count them."""
    arr = natural_image(512, 512)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5))

    import grok_tpu.t1.native as T1N

    counts = []
    orig = T1N.decode_cblks

    def counting(data, lengths, *a, **k):
        counts.append(len(lengths))
        return orig(data, lengths, *a, **k)

    monkeypatch.setattr(T1N, "decode_cblks", counting)
    gk.decompress(stream)
    full_count = counts.pop()
    gk.decompress(stream, gk.DecompressParams(window=(100, 100, 140, 140)))
    win_count = counts.pop()
    assert 0 < win_count < full_count / 2, (win_count, full_count)


def test_window_reduce_combination(rng):
    arr = natural_image(256, 256, 3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5))
    full = gk.decompress(stream, gk.DecompressParams(reduce=1)).to_array()
    out = gk.decompress(
        stream, gk.DecompressParams(reduce=1, window=(64, 64, 160, 160))
    ).to_array()
    assert np.array_equal(out, full[32:80, 32:80])


def test_window_decode_windowed_idwt_unit(rng):
    """inverse_window == full inverse on the window across parities."""
    for _ in range(10):
        h = int(rng.integers(8, 120))
        w = int(rng.integers(8, 120))
        x0 = int(rng.integers(0, 3))
        y0 = int(rng.integers(0, 3))
        rect = Rect(x0, y0, x0 + w, y0 + h)
        nl = int(rng.integers(1, 5))
        irrev = bool(rng.integers(0, 2))
        a = ((rng.standard_normal((h, w)) * 40).astype(np.float32) if irrev
             else rng.integers(-300, 300, (h, w)).astype(np.int32))
        packed = dwt_ops.forward(np, a.copy(), rect, nl, irrev)
        full = dwt_ops.inverse(np, packed.copy(), rect, nl, irrev)
        wx = int(rng.integers(rect.x0, rect.x1))
        wy = int(rng.integers(rect.y0, rect.y1))
        win = Rect(wx, wy, min(wx + 30, rect.x1), min(wy + 30, rect.y1))
        out, orect = dwt_ops.inverse_window(
            np, packed.copy(), rect, nl, irrev, win
        )
        sf = full[win.y0 - rect.y0 : win.y1 - rect.y0,
                  win.x0 - rect.x0 : win.x1 - rect.x0]
        sw = out[win.y0 - orect.y0 : win.y1 - orect.y0,
                 win.x0 - orect.x0 : win.x1 - orect.x0]
        assert np.array_equal(sf, sw)


def test_window_interop_grok(tmp_path, rng):
    """Our windowed decode must match the reference's -d windowed decode."""
    from tests.conftest import have_grok, grk_decompress, read_pgx
    import glob

    if not have_grok():
        pytest.skip("reference binaries not available")
    arr = natural_image(220, 300, 3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5))
    p = tmp_path / "win.j2k"
    p.write_bytes(stream)
    out = tmp_path / "win_ref.pgx"
    r = grk_decompress(["-i", str(p), "-o", str(out), "-d", "40,30,120,100"])
    assert r.returncode == 0, r.stderr
    ours = gk.decompress(
        stream, gk.DecompressParams(window=(40, 30, 120, 100))
    ).to_array()
    refs = [read_pgx(f)
            for f in sorted(glob.glob(str(tmp_path / "win_ref*.pgx")))]
    for i in range(3):
        assert np.array_equal(ours[:, :, i], refs[i])


def test_plt_skip_fast_path(rng):
    """With a PLT index, unwanted packets (window / reduce) are jumped by
    their recorded byte lengths instead of header-parsed (parity:
    cache/PacketLengthMarkers + PacketParser skip)."""
    from grok_tpu.codestream.decompress import Decoder

    arr = natural_image(512, 512)
    im = gk.Image.from_array(arr)
    # small precincts so a sub-tile window excludes whole packets (the
    # skip granularity is the precinct)
    cfg = dict(num_resolutions=5, precinct_sizes=[(6, 6)] * 5)
    stream = bytes(gk.compress(im, gk.CompressParams(**cfg)))
    stream_plt = bytes(gk.compress(
        im, gk.CompressParams(write_plt=True, **cfg)
    ))
    # PCRL: resolution is an inner progression axis, so reduce-dropped
    # packets interleave mid-stream (can't be handled by a suffix break)
    pcrl = dict(progression=gk.ProgressionOrder.PCRL, **cfg)
    stream_pcrl = bytes(gk.compress(im, gk.CompressParams(**pcrl)))
    stream_pcrl_plt = bytes(gk.compress(
        im, gk.CompressParams(write_plt=True, **pcrl)
    ))
    cases = [
        # mid-stream windows / reduces must fire the PLT jump
        (stream_plt, stream, dict(window=(100, 100, 160, 160)), True),
        (stream_plt, stream, dict(reduce=1, window=(300, 300, 380, 380)), True),
        (stream_pcrl_plt, stream_pcrl, dict(reduce=2), True),
        # LRCP reduce: dropped resolutions are a pure suffix — the parser
        # stops reading instead of skipping (strictly better than PLT)
        (stream_plt, stream, dict(reduce=2), False),
    ]
    for splt, sref, dp, expect_skips in cases:
        dec = Decoder(splt, gk.DecompressParams(**dp))
        out = dec.decompress().to_array()
        ref = gk.decompress(sref, gk.DecompressParams(**dp)).to_array()
        assert np.array_equal(out, ref), dp
        if expect_skips:
            assert dec.last_t2_skipped > 0, dp
        else:
            assert dec.last_t2_skipped == 0, dp
    # without PLT the same decode parses-and-drops (no skips), same pixels
    dec = Decoder(stream, gk.DecompressParams(window=(100, 100, 160, 160)))
    dec.decompress()
    assert dec.last_t2_skipped == 0


def test_sparse_canvas_memory():
    """Windowed decode materializes only touched chunks (SparseCanvas
    parity, tile/SparseCanvas.h): allocation stays far below whole-tile
    planes and results match the full decode exactly."""
    import tracemalloc

    arr = natural_image(1024, 1536, 3)
    im = gk.Image.from_array(arr)
    blob = bytes(gk.compress(im, gk.CompressParams(num_resolutions=6)))
    full = gk.decompress(blob).to_array()
    tracemalloc.start()
    out = gk.decompress(
        blob, gk.DecompressParams(window=(600, 500, 728, 628))
    ).to_array()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert np.array_equal(out, full[500:628, 600:728])
    # whole-tile staging alone would be ~19 MB; sparse stays well under
    assert peak < 12e6, peak
