"""Self-roundtrip tests for the full codestream codec (no reference needed)."""

import numpy as np
import pytest

import grok_tpu as gk
from tests.conftest import natural_image


def _lossless_roundtrip(arr, prec=8, **kw):
    im = gk.Image.from_array(arr, prec=prec)
    stream = gk.compress(im, gk.CompressParams(**kw))
    out = gk.decompress(stream).to_array()
    ref = arr if arr.ndim == 3 else arr[:, :, None]
    assert np.array_equal(out, ref)
    return stream


def test_gray_256():
    _lossless_roundtrip(natural_image(256, 256), num_resolutions=6)


def test_rgb_rct():
    _lossless_roundtrip(natural_image(128, 128, nc=3), num_resolutions=5)


def test_odd_sizes():
    _lossless_roundtrip(natural_image(77, 131), num_resolutions=4)


def test_tiny():
    _lossless_roundtrip(natural_image(8, 8), num_resolutions=2)


def test_single_resolution():
    _lossless_roundtrip(natural_image(65, 64), num_resolutions=1)


def test_16bit():
    _lossless_roundtrip(natural_image(96, 96, prec=16), prec=16, num_resolutions=4)


def test_multitile():
    _lossless_roundtrip(
        natural_image(128, 128), num_resolutions=4, tile_size=(96, 96)
    )


@pytest.mark.parametrize(
    "prog",
    [
        gk.ProgressionOrder.LRCP,
        gk.ProgressionOrder.RLCP,
        gk.ProgressionOrder.RPCL,
        gk.ProgressionOrder.PCRL,
        gk.ProgressionOrder.CPRL,
    ],
)
def test_progressions(prog):
    _lossless_roundtrip(natural_image(96, 96), num_resolutions=3, progression=prog)


def test_precincts_sop_eph():
    _lossless_roundtrip(
        natural_image(128, 128),
        num_resolutions=4,
        precinct_sizes=[(6, 6)] * 4,
        use_sop=True,
        use_eph=True,
    )


def test_header_parse():
    arr = natural_image(64, 64)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=3, comment="hello"))
    ps = gk.parse_codestream(stream)
    assert ps.header.siz.x1 == 64
    assert ps.header.default_tcp.num_layers == 1
    assert ps.header.comments and ps.header.comments[0] == b"hello"


def test_tlm_plt_random_access():
    from grok_tpu.codestream.decompress import Decoder

    arr = natural_image(200, 200)
    im = gk.Image.from_array(arr)
    stream = gk.compress(
        im,
        gk.CompressParams(
            num_resolutions=4, tile_size=(96, 96), write_tlm=True, write_plt=True
        ),
    )
    dec = Decoder(stream)
    assert dec.index.from_tlm, "TLM fast path must be used"
    # decode each tile out of order (j2k_random_tile_access parity)
    siz = dec.header.siz
    for ti in reversed(range(siz.num_tiles)):
        arrays = dec.decompress_tile(ti)
        tb = siz.tile_bounds(ti)
        assert np.array_equal(arrays[0], arr[tb.y0 : tb.y1, tb.x0 : tb.x1])


def test_reduce_and_window():
    arr = natural_image(200, 200)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5))
    r = gk.decompress(stream, gk.DecompressParams(reduce=2))
    assert r.components[0].data.shape == (50, 50)
    w = gk.decompress(stream, gk.DecompressParams(window=(40, 60, 120, 110)))
    assert np.array_equal(w.components[0].data, arr[60:110, 40:120])


@pytest.mark.parametrize("mode", [1, 2, 4, 5, 8, 9, 16, 32, 33, 42, 63])
def test_cblk_styles(mode):
    """All Part-1 codeblock styles (BYPASS/RESET/TERMALL/VSC/PTERM/SEGSYM)
    roundtrip, single and multi layer."""
    _lossless_roundtrip(natural_image(96, 96), num_resolutions=3, cblk_style=mode)
    _lossless_roundtrip(
        natural_image(96, 96), num_resolutions=3, cblk_style=mode,
        num_layers=2, layer_rates=[16, 1],
    )


def test_roi_maxshift():
    """Component ROI (RGN marker): lossless maxshift roundtrip.

    Note: the reference's encoder-side ROI is decode-only (its own ROI
    encode->decode is lossy); ours implements the full maxshift path."""
    arr = natural_image(96, 96)
    im = gk.Image.from_array(arr)
    stream = gk.compress(
        im, gk.CompressParams(num_resolutions=3, roi_comp=0, roi_shift=4)
    )
    ps = gk.parse_codestream(stream)
    assert ps.header.default_tcp.tccps[0].roi_shift == 4
    out = gk.decompress(stream).to_array()[:, :, 0]
    assert np.array_equal(out, arr)


def test_subsampled_420():
    from grok_tpu.core.image import Component, Image as GImage

    y = natural_image(128, 160)
    cb = natural_image(64, 80, seed=5)
    cr = natural_image(64, 80, seed=6)
    img = GImage(0, 0, 160, 128)
    img.components = [
        Component(dx=1, dy=1, prec=8, data=y.astype(np.int32)),
        Component(dx=2, dy=2, prec=8, data=cb.astype(np.int32)),
        Component(dx=2, dy=2, prec=8, data=cr.astype(np.int32)),
    ]
    img.finalize()
    stream = gk.compress(img, gk.CompressParams(num_resolutions=4))
    dec = gk.decompress(stream)
    assert np.array_equal(dec.components[0].data, y)
    assert np.array_equal(dec.components[1].data, cb)
    assert np.array_equal(dec.components[2].data, cr)
    # app-level conversions
    from grok_tpu.io.color import force_rgb, upsample_components

    up = upsample_components(dec)
    assert up.components[1].data.shape == (128, 160)
    rgb = force_rgb(dec)
    assert rgb.num_comps == 3
    assert rgb.components[2].data.shape == (128, 160)


def test_poc_progression_changes():
    from grok_tpu.core.params import ProgressionChange

    arr = natural_image(128, 128)
    pocs = [
        ProgressionChange(0, 0, 2, 2, 1, gk.ProgressionOrder.CPRL),
        ProgressionChange(0, 0, 2, 4, 1, gk.ProgressionOrder.LRCP),
    ]
    stream = _lossless_roundtrip(
        arr, num_resolutions=4, num_layers=2, layer_rates=[16, 1],
        progression_changes=pocs,
    )
    ps = gk.parse_codestream(stream)
    assert len(ps.header.default_tcp.pocs) == 2


def test_ppt_packed_headers():
    arr = natural_image(144, 144)
    _lossless_roundtrip(
        arr, num_resolutions=4, write_ppt=True, num_layers=2, layer_rates=[16, 1]
    )


def test_cinema_profile():
    from grok_tpu.core.params import PROFILE_CINEMA_2K, CINEMA_24_CS
    from grok_tpu.codestream.profile import validate_cinema_stream

    arr = natural_image(1080, 2048, nc=3, prec=12)
    im = gk.Image.from_array(arr, prec=12)
    p = gk.CompressParams(profile=PROFILE_CINEMA_2K, framerate=24)
    stream = gk.compress(im, p)
    assert len(stream) <= CINEMA_24_CS, "DCI codestream cap violated"
    assert validate_cinema_stream(stream, p)
    ps = gk.parse_codestream(stream)
    assert ps.header.siz.rsiz == PROFILE_CINEMA_2K
    assert ps.header.default_tcp.progression == gk.ProgressionOrder.CPRL
    t = ps.header.default_tcp.tccps[0]
    assert (1 << t.cblk_w_exp) == 32 and t.irreversible
    out = gk.decompress(stream).to_array()
    mse = np.mean((out.astype(np.float64) - arr) ** 2)
    assert 10 * np.log10((4095**2) / mse) > 30


def test_imf_profile():
    from grok_tpu.core.params import PROFILE_IMF_2K_R

    arr = natural_image(256, 512, nc=3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(profile=PROFILE_IMF_2K_R))
    out = gk.decompress(stream).to_array()
    assert np.array_equal(out, arr), "IMF reversible profile must be lossless"


# ------------------------------------------------------- multi tile-parts
def test_tile_part_divider_roundtrip(rng):
    """Tile-part splitting at component/layer boundaries (+PLM) decodes
    bit-exact; the dividers mirror newTilePartProgressionDivider."""
    from tests.conftest import natural_image

    arr = natural_image(96, 120, 3)
    im = gk.Image.from_array(arr)
    for div, extra in (("C", {}), ("R", {}),
                       ("L", dict(num_layers=3, layer_rates=[16, 8, 2]))):
        p = gk.CompressParams(num_resolutions=3, tp_divider=div,
                              write_tlm=True, write_plm=True,
                              progression=gk.ProgressionOrder.CPRL
                              if div != "L" else gk.ProgressionOrder.LRCP,
                              **extra)
        stream = gk.compress(gk.Image.from_array(arr), p)
        out = gk.decompress(stream)
        if not extra:
            assert np.array_equal(out.to_array(), arr), div
        # the stream must contain multiple SOT markers for tile 0
        import grok_tpu

        info = grok_tpu.parse_codestream(stream)
        assert len(info.tile_parts[0]) > 1, div


def test_jp2_uuid_cdef_write(rng):
    from tests.conftest import natural_image
    from grok_tpu.codestream.jp2 import unwrap_jp2, wrap_jp2

    arr = natural_image(32, 32, 3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=2))
    im.uuid_boxes = [(b"0123456789abcdef", b"payload!")]
    im.channel_defs = [(0, 0, 1), (1, 0, 2), (2, 0, 3)]
    jp2 = wrap_jp2(stream, im)
    info = unwrap_jp2(jp2)
    assert info.uuid == [(b"0123456789abcdef", b"payload!")]
    assert info.channel_defs == [(0, 0, 1), (1, 0, 2), (2, 0, 3)]
    assert info.codestream == stream


@pytest.mark.parametrize("style", [0x01, 0x04, 0x05, 0x15, 0x3F])
def test_numpy_backend_bypass_termall_styles(style, monkeypatch):
    """Numpy reference coder handles BYPASS/TERMALL/PTERM end-to-end
    (native-backend parity; T.800 Table A-19 style bits, reference
    t1/t1_part1/T1Part1.cpp pass termination)."""
    monkeypatch.setenv("GROK_TPU_T1", "numpy")
    rng = np.random.default_rng(style)
    arr = rng.integers(0, 256, size=(67, 91)).astype(np.uint8)
    _lossless_roundtrip(arr, cblk_style=style, num_resolutions=3)


@pytest.mark.parametrize("style", [0x05, 0x15, 0x3F])
def test_numpy_native_stream_parity(style):
    """Numpy and native T1 emit byte-identical streams for raw/termall
    styles and decode each other's output."""
    from grok_tpu.t1 import ebcot_np
    from grok_tpu.t1 import native as t1n

    if not t1n.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(style)
    n, h, w = 4, 24, 28
    coeffs = rng.integers(-200, 200, size=(n, h, w)).astype(np.int64)
    coeffs[rng.random((n, h, w)) < 0.6] = 0
    hs, ws = np.full(n, h), np.full(n, w)
    ors = rng.integers(0, 4, size=n)
    sty = np.full(n, style)
    a = ebcot_np.encode_cblks(coeffs, hs, ws, ors, styles=sty)
    b = t1n.encode_cblks(coeffs, hs, ws, ors, styles=sty.astype(np.int32))
    assert np.array_equal(a.lengths, b.lengths)
    for i in range(n):
        L = int(a.lengths[i])
        assert np.array_equal(a.data[i, :L], b.data[i, :L])


def test_ht_16bit_tlm_random_tile_access():
    """BASELINE driver config 3 shape: 16-bit HTJ2K with TLM/PLT random
    tile access (scaled down from 4K for test time)."""
    arr = natural_image(180, 260, prec=16)
    im = gk.Image.from_array(arr, prec=16)
    stream = gk.compress(
        im,
        gk.CompressParams(num_resolutions=4, ht=True, tile_size=(96, 96),
                          write_tlm=True, write_plt=True),
    )
    full = gk.decompress(stream)
    assert np.array_equal(full.components[0].data, arr)
    from grok_tpu.codestream.decompress import Decoder as _Decoder

    dec = _Decoder(stream)
    assert dec.index.from_tlm
    siz = dec.header.siz
    for ti in reversed(range(siz.num_tiles)):
        arrays = dec.decompress_tile(ti)
        tb = siz.tile_bounds(ti)
        assert np.array_equal(arrays[0], arr[tb.y0:tb.y1, tb.x0:tb.x1]), ti


def test_reduce_matches_independent_llk():
    """Reduced decode equals the independently computed per-tile LL_k
    mosaic (the arbiter tools/fuzz_interop.py uses to attribute the
    reference's broken -r decodes)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "fuzz_interop",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "fuzz_interop.py"))
    fz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fz)
    arr = natural_image(151, 207, nc=3).astype(np.uint8)
    im = gk.Image.from_array(arr.astype(np.int32))
    for tile in (None, (96, 80)):
        p = gk.CompressParams(num_resolutions=4, tile_size=tile)
        stream = gk.compress(im, p)
        for rd in (1, 2, 3):
            ours = gk.decompress(stream,
                                 gk.DecompressParams(reduce=rd)).to_array()
            gt = fz.reduce_ground_truth(arr, 8, stream, rd)
            assert np.array_equal(ours, gt), (tile, rd)


def test_kitchen_sink_everything_at_once():
    """Integration pin: tiles + POC + layers + PLT/TLM + PPT + SOP/EPH +
    custom precincts + ROI + tile-part dividers + 12-bit depth in ONE
    stream, exercised through full/reduced/windowed/truncated decode."""
    from grok_tpu.core.params import ProgressionChange, ProgressionOrder

    arr = natural_image(173, 241, prec=12)
    im = gk.Image.from_array(arr, prec=12)
    p = gk.CompressParams(
        num_resolutions=4,
        tile_size=(96, 112),
        num_layers=2,
        layer_rates=[12.0, 1.0],
        write_tlm=True,
        write_plt=True,
        write_ppt=True,
        use_sop=True,
        use_eph=True,
        precinct_sizes=[(6, 6)] * 33,
        roi_comp=0,
        roi_shift=4,
        tp_divider="R",
        progression=ProgressionOrder.RPCL,
        progression_changes=[
            ProgressionChange(0, 0, 2, 2, 1, ProgressionOrder.LRCP),
            ProgressionChange(2, 0, 2, 4, 1, ProgressionOrder.CPRL),
        ],
    )
    stream = gk.compress(im, p)
    full = gk.decompress(stream)
    assert np.array_equal(full.components[0].data, arr)  # layers are lossless-complete
    # layer truncation decodes deterministically and reduces fidelity
    l1 = gk.decompress(stream, gk.DecompressParams(max_layers=1))
    assert l1.components[0].data.shape == arr.shape
    # reduced decode equals the independent per-tile LL_k mosaic
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "fuzz_interop2",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "fuzz_interop.py"))
    fz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fz)
    r1 = gk.decompress(stream, gk.DecompressParams(reduce=1)).to_array()
    gt = fz.reduce_ground_truth(arr, 12, stream, 1)
    assert np.array_equal(r1[:, :, 0], gt)
    # windowed decode crops exactly
    wdec = gk.decompress(stream, gk.DecompressParams(window=(30, 40, 150, 120)))
    assert np.array_equal(wdec.components[0].data, arr[40:120, 30:150])


def test_bypass_layers_16bit_rate_monotone():
    """Regression: BYPASS multi-segment T2 with a layer boundary at a
    non-terminated pass — the conservative T1 rate estimate could exceed
    the next terminated pass's exact length (locally decreasing rates),
    hanging the native T2 length signalling (fuzz seed 717273)."""
    arr = natural_image(180, 140, prec=16)
    im = gk.Image.from_array(arr, prec=16)
    p = gk.CompressParams(num_resolutions=4, cblk_style=1, num_layers=2,
                          layer_rates=[4.0, 1.0], write_plt=True,
                          precinct_sizes=[(7, 7)] * 33)
    stream = gk.compress(im, p)
    assert np.array_equal(gk.decompress(stream).components[0].data, arr)
    l1 = gk.decompress(stream, gk.DecompressParams(max_layers=1))
    assert l1.components[0].data.shape == arr.shape
