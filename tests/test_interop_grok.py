"""Bit-exact interop vs the reference Grok binaries (skipped if absent).

Strategy per SURVEY.md §4: lossless decode must be bit-exact in BOTH
directions (Grok decodes our streams; we decode Grok's)."""

import glob
import os

import numpy as np
import pytest

import grok_tpu as gk
from tests.conftest import (
    grk_compress,
    grk_decompress,
    have_grok,
    natural_image,
    read_pgx,
    save_pnm,
)

pytestmark = pytest.mark.skipif(not have_grok(), reason="reference grok not built")


def _both_ways(tmp_path, name, arr, prec=8, cparams=None, grk_args=None):
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    ref = arr if arr.ndim == 3 else arr[:, :, None]
    src = str(tmp_path / (f"{name}.pgm" if nc == 1 else f"{name}.ppm"))
    save_pnm(src, arr, prec)

    im = gk.Image.from_array(arr, prec=prec)
    stream = gk.compress(im, cparams or gk.CompressParams(num_resolutions=5))
    ours = str(tmp_path / f"{name}_ours.j2k")
    with open(ours, "wb") as f:
        f.write(stream)

    # 1) grok decodes our stream
    gdec = str(tmp_path / f"{name}_gdec.pgx")
    r = grk_decompress(["-i", ours, "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    outs = sorted(glob.glob(str(tmp_path / f"{name}_gdec*.pgx")))
    comps = [read_pgx(f) for f in outs]
    for i in range(nc):
        assert np.array_equal(comps[i], ref[:, :, i]), f"grok-dec comp {i}"

    # 2) we decode grok's stream
    gj2k = str(tmp_path / f"{name}_grok.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, *(grk_args or [])])
    assert r.returncode == 0, r.stderr + r.stdout
    with open(gj2k, "rb") as f:
        out = gk.decompress(f.read()).to_array()
    assert np.array_equal(out, ref), "we-dec-grok"


def test_gray_lossless(tmp_path):
    _both_ways(tmp_path, "g256", natural_image(256, 256),
               cparams=gk.CompressParams(num_resolutions=6))


def test_rgb_rct(tmp_path):
    _both_ways(tmp_path, "rgb", natural_image(128, 128, nc=3),
               cparams=gk.CompressParams(num_resolutions=5))


def test_odd(tmp_path):
    _both_ways(tmp_path, "odd", natural_image(77, 131),
               cparams=gk.CompressParams(num_resolutions=4))


def test_12bit(tmp_path):
    _both_ways(tmp_path, "g12", natural_image(128, 128, prec=12), prec=12,
               cparams=gk.CompressParams(num_resolutions=5))


def test_multitile(tmp_path):
    _both_ways(tmp_path, "tiles", natural_image(200, 200),
               cparams=gk.CompressParams(num_resolutions=4, tile_size=(96, 96)),
               grk_args=["-t", "96,96"])


@pytest.mark.parametrize("prog", ["RLCP", "RPCL", "PCRL", "CPRL"])
def test_progressions(tmp_path, prog):
    _both_ways(tmp_path, f"p{prog}", natural_image(96, 96),
               cparams=gk.CompressParams(
                   num_resolutions=3,
                   progression=gk.ProgressionOrder[prog]),
               grk_args=["-p", prog])


def test_precincts_sop_eph(tmp_path):
    _both_ways(tmp_path, "prec", natural_image(128, 128),
               cparams=gk.CompressParams(num_resolutions=4,
                                         precinct_sizes=[(6, 6)] * 4,
                                         use_sop=True, use_eph=True),
               grk_args=["-c", "[64,64]", "-S", "-E"])


def test_ht_interop(tmp_path):
    """HTJ2K: grok decodes our stream and vice versa, bit-exact."""
    arr = natural_image(256, 256)
    src = str(tmp_path / "ht.pgm")
    save_pnm(src, arr)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5, ht=True))
    ours = str(tmp_path / "ht_ours.j2k")
    with open(ours, "wb") as f:
        f.write(stream)
    gdec = str(tmp_path / "ht_gdec.pgx")
    r = grk_decompress(["-i", ours, "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    comps = [read_pgx(f) for f in sorted(glob.glob(str(tmp_path / "ht_gdec*.pgx")))]
    assert np.array_equal(comps[0], arr)
    gj2k = str(tmp_path / "ht_grok.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-M", "64"])
    assert r.returncode == 0, r.stderr + r.stdout
    with open(gj2k, "rb") as f:
        out = gk.decompress(f.read()).to_array()[:, :, 0]
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("mode", [1, 2, 4, 8, 16, 32, 42, 63])
def test_cblk_styles_interop(tmp_path, mode):
    """All codeblock styles interop with the reference both ways."""
    _both_ways(tmp_path, f"sty{mode}", natural_image(96, 96),
               cparams=gk.CompressParams(num_resolutions=3, cblk_style=mode),
               grk_args=["-M", str(mode)])


def test_poc_interop(tmp_path):
    from grok_tpu.core.params import ProgressionChange

    arr = natural_image(128, 128)
    _both_ways(tmp_path, "poc", arr,
               cparams=gk.CompressParams(
                   num_resolutions=4,
                   progression_changes=[
                       ProgressionChange(0, 0, 1, 2, 1, gk.ProgressionOrder.CPRL),
                       ProgressionChange(0, 0, 1, 4, 1, gk.ProgressionOrder.LRCP),
                   ]),
               grk_args=["-n", "4", "-P", "T0=0,0,1,2,1,CPRL/T0=0,0,1,4,1,LRCP"])


def test_ppt_grok_decodes(tmp_path):
    arr = natural_image(144, 144)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=4, write_ppt=True))
    f = str(tmp_path / "ppt.j2k")
    with open(f, "wb") as fh:
        fh.write(stream)
    out = str(tmp_path / "ppt_dec.pgx")
    r = grk_decompress(["-i", f, "-o", out])
    assert r.returncode == 0, r.stderr + r.stdout
    comps = [read_pgx(x) for x in sorted(glob.glob(str(tmp_path / "ppt_dec*.pgx")))]
    assert np.array_equal(comps[0], arr)


def test_imf_profile_interop(tmp_path):
    """IMF-profile streams interoperate both ways: the reference's -z 2K_R
    stream decodes bit-exactly here, and our IMF stream (CLI -z parity)
    decodes bit-exactly in the reference with the profile signalled."""
    arr = natural_image(160, 240, nc=3)
    src = str(tmp_path / "imf.ppm")
    save_pnm(src, arr)

    # reference -z 2K -> us
    gj2k = str(tmp_path / "imf_ref.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-z", "2K_R,mainlevel=1"])
    assert r.returncode == 0, r.stderr + r.stdout
    out = gk.decompress(open(gj2k, "rb").read()).to_array()
    assert np.array_equal(out, arr)
    ps = gk.parse_codestream(open(gj2k, "rb").read())
    ref_rsiz = ps.header.siz.rsiz

    # us (CLI -z) -> reference
    from grok_tpu.cli.compress import main as cmain

    ours = str(tmp_path / "imf_ours.j2k")
    assert cmain(["-i", src, "-o", ours, "-z", "2K_R,mainlevel=1"]) == 0
    assert gk.parse_codestream(open(ours, "rb").read()).header.siz.rsiz == ref_rsiz
    gdec = str(tmp_path / "imf_gdec.pgx")
    r = grk_decompress(["-i", ours, "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    comps = [read_pgx(f)
             for f in sorted(glob.glob(str(tmp_path / "imf_gdec*.pgx")))]
    for i in range(3):
        assert np.array_equal(comps[i], arr[:, :, i]), i


def test_broadcast_profile_interop(tmp_path):
    """Broadcast-profile parity: our -U MULTI_R stream decodes bit-exactly
    in the reference and signals the same Rsiz as the reference's -U."""
    arr = natural_image(120, 200, nc=3)
    src = str(tmp_path / "bc.ppm")
    save_pnm(src, arr)

    gj2k = str(tmp_path / "bc_ref.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-U", "MULTI_R,mainlevel=2"])
    assert r.returncode == 0, r.stderr + r.stdout
    out = gk.decompress(open(gj2k, "rb").read()).to_array()
    assert np.array_equal(out, arr)
    ref_rsiz = gk.parse_codestream(open(gj2k, "rb").read()).header.siz.rsiz

    from grok_tpu.cli.compress import main as cmain

    ours = str(tmp_path / "bc_ours.j2k")
    assert cmain(["-i", src, "-o", ours, "-U", "MULTI_R,mainlevel=2"]) == 0
    assert gk.parse_codestream(open(ours, "rb").read()).header.siz.rsiz == ref_rsiz
    gdec = str(tmp_path / "bc_gdec.pgx")
    r = grk_decompress(["-i", ours, "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    comps = [read_pgx(f)
             for f in sorted(glob.glob(str(tmp_path / "bc_gdec*.pgx")))]
    for i in range(3):
        assert np.array_equal(comps[i], arr[:, :, i]), i


def test_one_pixel_tile_row_ht(tmp_path):
    """1-pixel-high boundary tile rows with HT (a config whose encode the
    reference gets wrong in its own roundtrip — docs/STATUS.md reference
    bugs): ours must round-trip bit-exactly and the reference must decode
    OUR stream bit-exactly."""
    arr = natural_image(113, 352)
    im = gk.Image.from_array(arr)
    stream = bytes(gk.compress(im, gk.CompressParams(
        num_resolutions=5, ht=True, tile_size=(165, 56),
        progression=gk.ProgressionOrder.CPRL)))
    out = gk.decompress(stream).to_array()[:, :, 0]
    assert np.array_equal(out, arr)
    p = tmp_path / "px1.j2k"
    p.write_bytes(stream)
    gdec = str(tmp_path / "px1_gdec.pgx")
    r = grk_decompress(["-i", str(p), "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    ref = read_pgx(sorted(glob.glob(str(tmp_path / "px1_gdec*.pgx")))[0])
    assert np.array_equal(ref, arr)


def test_subsampled_component_encode(tmp_path):
    """Encode-side component subsampling (420-style chroma): our stream
    self-roundtrips and the reference decodes every component bit-exactly
    (two components, so the reference's 3-comp sYCC guess stays out of
    the comparison)."""
    from grok_tpu.core.image import Component, Image

    rng = np.random.default_rng(5)
    H, W = 96, 128
    img = Image(0, 0, W, H)
    img.components.append(Component(dx=1, dy=1, prec=8))
    img.components.append(Component(dx=2, dy=2, prec=8))
    img.finalize()
    img.alloc()
    img.components[0].data[:] = rng.integers(0, 256, (H, W))
    img.components[1].data[:] = rng.integers(0, 256, (H // 2, W // 2))
    st = bytes(gk.compress(img, gk.CompressParams(num_resolutions=4, mct=0)))
    out = gk.decompress(st)
    for a, b in zip(out.components, img.components):
        assert np.array_equal(a.data, b.data)
    p = tmp_path / "sub.j2k"
    p.write_bytes(st)
    gdec = str(tmp_path / "sub_gdec.pgx")
    r = grk_decompress(["-i", str(p), "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    refs = [read_pgx(f)
            for f in sorted(glob.glob(str(tmp_path / "sub_gdec*.pgx")))]
    for r_, c in zip(refs, img.components):
        assert np.array_equal(r_, c.data)


def test_cprl_precinct_aligned_tile_origins(tmp_path):
    """Position-progression packet order for tiles whose projected
    resolution origin IS aligned to the precinct grid (T.800 B.12.1.3:
    the y==ty0 special case must NOT fire then — fuzz trial 4242/182).
    The reference's multi-tile CPRL stream with per-resolution precincts
    must decode bit-exactly, and our stream must decode in the
    reference."""
    rng = np.random.default_rng(182)
    arr = rng.integers(0, 256, (41, 273, 3)).astype(np.uint8)
    src = str(tmp_path / "s.png")
    from PIL import Image as PImage

    PImage.fromarray(arr).save(src)
    gj2k = str(tmp_path / "r.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-n", "5", "-p", "CPRL",
                      "-t", "36,63", "-r", "29,1", "-c", "[64,64]"])
    assert r.returncode == 0, r.stderr + r.stdout
    out = gk.decompress(open(gj2k, "rb").read()).to_array()
    assert np.array_equal(out, arr)

    ours = bytes(gk.compress(
        gk.Image.from_array(arr.astype(np.int32)),
        gk.CompressParams(num_resolutions=5,
                          progression=gk.ProgressionOrder.CPRL,
                          tile_size=(36, 63), num_layers=2,
                          layer_rates=[29, 1],
                          precinct_sizes=[(6, 6)] * 33),
    ))
    p = tmp_path / "o.j2k"
    p.write_bytes(ours)
    gdec = str(tmp_path / "o_gdec.pgx")
    r = grk_decompress(["-i", str(p), "-o", gdec])
    assert r.returncode == 0, r.stderr + r.stdout
    refs = [read_pgx(f)
            for f in sorted(glob.glob(str(tmp_path / "o_gdec*.pgx")))]
    for i in range(3):
        assert np.array_equal(refs[i], arr[:, :, i]), i


def test_tile_header_poc_accumulates(tmp_path):
    """POC segments accumulate across main and tile-part headers
    (reference read_poc appends; its encoder writes a zeroed-progression
    tile copy that must stay inert — fuzz trial 7/39)."""
    rng = np.random.default_rng(39)
    arr = rng.integers(0, 256, (43, 43)).astype(np.uint8)
    src = str(tmp_path / "s.png")
    from PIL import Image as PImage

    PImage.fromarray(arr).save(src)
    gj2k = str(tmp_path / "p.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-n", "6", "-p", "PCRL",
                      "-M", "5", "-r", "60,1", "-L", "-c", "[128,128]",
                      "-P", "T0=0,0,2,5,1,RLCP/T0=5,0,2,6,1,RLCP"])
    assert r.returncode == 0, r.stderr + r.stdout
    out = gk.decompress(open(gj2k, "rb").read()).to_array().squeeze()
    assert np.array_equal(out, arr)


def test_poc_stream_lying_plt_fallback(tmp_path):
    """The reference writes PLT indices on POC / multi-tile-part streams
    that do not match its own packet sequence (docs/STATUS.md). Our
    decoder verifies parsed spans against the PLT and falls back to
    header-only parsing: full decode stays bit-exact, and the truncated
    decode keeps at least the reference's fidelity (its -l drops more
    than the layer limit on such streams)."""
    rng = np.random.default_rng(79)
    arr = rng.integers(0, 256, (144, 344)).astype(np.uint8)
    src = str(tmp_path / "s.png")
    from PIL import Image as PImage

    PImage.fromarray(arr).save(src)
    gj2k = str(tmp_path / "p.j2k")
    r = grk_compress(["-i", src, "-o", gj2k, "-n", "5", "-p", "CPRL",
                      "-M", "1", "-r", "38,1", "-L", "-c", "[64,64]",
                      "-P", "T0=0,0,2,2,1,PCRL/T0=2,0,2,5,1,LRCP"])
    assert r.returncode == 0, r.stderr + r.stdout
    data = open(gj2k, "rb").read()
    warns = []
    gk.set_warning_handler(lambda m: warns.append(m))
    try:
        full = gk.decompress(data).to_array().squeeze()
        assert np.array_equal(full, arr)
        l1 = gk.decompress(
            data, gk.DecompressParams(max_layers=1)).to_array().squeeze()
        assert any("PLT lengths disagree" in w for w in warns), warns
    finally:
        gk.set_warning_handler(None)
    # fidelity: our truncation must be at least as good as the reference's
    gdec = str(tmp_path / "l1.pgx")
    r = grk_decompress(["-i", gj2k, "-o", gdec, "-l", "1"])
    assert r.returncode == 0
    ref = read_pgx(sorted(glob.glob(str(tmp_path / "l1*.pgx")))[0])

    def psnr(x):
        mse = ((x.astype(np.float64) - arr.astype(np.float64)) ** 2).mean()
        return 1e9 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    assert psnr(l1) >= psnr(ref) - 0.1


def test_kitchen_sink_stream_ref_decodes(tmp_path):
    """The maximal-feature stream (tiles + POC + layers + TLM/PLT/PPT +
    SOP/EPH + precincts + ROI + tile-part dividers + 12-bit) decodes
    bit-exactly in the reference."""
    from grok_tpu.core.params import ProgressionChange, ProgressionOrder

    arr = natural_image(173, 241, prec=12)
    im = gk.Image.from_array(arr, prec=12)
    p = gk.CompressParams(
        num_resolutions=4, tile_size=(96, 112), num_layers=2,
        layer_rates=[12.0, 1.0], write_tlm=True, write_plt=True,
        write_ppt=True, use_sop=True, use_eph=True,
        precinct_sizes=[(6, 6)] * 33, roi_comp=0, roi_shift=4,
        tp_divider="R", progression=ProgressionOrder.RPCL,
        progression_changes=[
            ProgressionChange(0, 0, 2, 2, 1, ProgressionOrder.LRCP),
            ProgressionChange(2, 0, 2, 4, 1, ProgressionOrder.CPRL),
        ])
    stream = gk.compress(im, p)
    j2k = str(tmp_path / "sink.j2k")
    open(j2k, "wb").write(stream)
    out = str(tmp_path / "sink.pgx")
    r = grk_decompress(["-i", j2k, "-o", out])
    assert r.returncode == 0, r.stderr[-300:]
    f = sorted(glob.glob(str(tmp_path / "sink*.pgx")))[0]
    assert np.array_equal(read_pgx(f), arr)


def test_megapixel_tiled_plt_interop(tmp_path):
    """Megapixel-scale geometry (the randomized fuzzer stays under
    0.2 MP): tiled + TLM/PLT stream, bit-exact both directions."""
    arr = natural_image(900, 1200, nc=3)
    im = gk.Image.from_array(arr.astype(np.int32))
    blob = gk.compress(im, gk.CompressParams(
        num_resolutions=6, tile_size=(384, 512), write_plt=True,
        write_tlm=True))
    j2k = str(tmp_path / "mp.j2k")
    open(j2k, "wb").write(bytes(blob))
    out = str(tmp_path / "mp.pgx")
    assert grk_decompress(["-i", j2k, "-o", out]).returncode == 0
    planes = [read_pgx(f) for f in sorted(glob.glob(str(tmp_path / "mp*.pgx")))]
    ref = np.stack(planes, -1)
    assert np.array_equal(ref, arr)
    # reference -> ours
    src = str(tmp_path / "mp.ppm")
    save_pnm(src, arr, 8)
    j2r = str(tmp_path / "mpr.j2k")
    assert grk_compress(["-i", src, "-o", j2r, "-t", "384,512",
                         "-L"]).returncode == 0
    dec = gk.decompress(open(j2r, "rb").read()).to_array()
    assert np.array_equal(dec, arr)
