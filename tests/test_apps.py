"""JP2 container, format I/O, and CLI tests."""

import subprocess
import sys

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.codestream.jp2 import is_jp2, unwrap_jp2, wrap_jp2
from grok_tpu.io.formats import load_image, save_image
from tests.conftest import GRK_BIN, have_grok, natural_image


def test_jp2_wrap_unwrap():
    arr = natural_image(96, 96, nc=3)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=4))
    jp2 = wrap_jp2(stream, im)
    assert is_jp2(jp2)
    info = unwrap_jp2(jp2)
    assert info.codestream == stream
    assert info.color_space == gk.ColorSpace.SRGB
    out = gk.decompress(info.codestream).to_array()
    assert np.array_equal(out, arr)


def test_pgx_pnm_roundtrip(tmp_path):
    arr = natural_image(40, 56, prec=12)
    im = gk.Image.from_array(arr, prec=12)
    p = str(tmp_path / "x.pgx")
    save_image(p, im)
    back = load_image(p)
    assert np.array_equal(back.components[0].data, arr)
    arr8 = natural_image(33, 47, nc=3)
    p2 = str(tmp_path / "x.ppm")
    save_image(p2, gk.Image.from_array(arr8))
    back2 = load_image(p2)
    assert np.array_equal(back2.to_array(), arr8)


def test_cli_roundtrip(tmp_path):
    from PIL import Image as PImage

    arr = natural_image(64, 80)
    src = str(tmp_path / "in.png")
    PImage.fromarray(arr.astype(np.uint8)).save(src)
    j2 = str(tmp_path / "out.jp2")
    dec = str(tmp_path / "dec.png")
    r = subprocess.run(
        [sys.executable, "-m", "grok_tpu.cli.compress", "-i", src, "-o", j2, "-n", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "grok_tpu.cli.dump", "-i", j2],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0 and "Codestream" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "grok_tpu.cli.decompress", "-i", j2, "-o", dec],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert np.array_equal(np.asarray(PImage.open(dec)), arr)


@pytest.mark.skipif(not have_grok(), reason="no reference build")
def test_grok_reads_our_jp2(tmp_path):
    from tests.conftest import grk_decompress

    arr = natural_image(96, 96)
    im = gk.Image.from_array(arr)
    jp2 = wrap_jp2(gk.compress(im, gk.CompressParams(num_resolutions=4)), im)
    p = str(tmp_path / "x.jp2")
    with open(p, "wb") as f:
        f.write(jp2)
    out = str(tmp_path / "x.pgm")
    r = grk_decompress(["-i", p, "-o", out])
    assert r.returncode == 0, r.stderr + r.stdout
    from PIL import Image as PImage

    assert np.array_equal(np.asarray(PImage.open(out)), arr)


@pytest.mark.skipif(not have_grok(), reason="no reference build")
def test_we_read_grok_jp2(tmp_path):
    from tests.conftest import grk_compress, save_pnm

    arr = natural_image(96, 96)
    src = str(tmp_path / "g.pgm")
    save_pnm(src, arr)
    gj = str(tmp_path / "g.jp2")
    r = grk_compress(["-i", src, "-o", gj])
    assert r.returncode == 0
    with open(gj, "rb") as f:
        data = f.read()
    info = unwrap_jp2(data)
    out = gk.decompress(info.codestream).to_array()[:, :, 0]
    assert np.array_equal(out, arr)


def test_cielab_conversion_neutral_and_primaries():
    """CIELab -> sRGB: neutral axis stays neutral, L extremes map to
    black/white (behavior parity with the reference's lcms-based path)."""
    import numpy as np

    from grok_tpu.core.image import Component, Image
    from grok_tpu.core.params import ColorSpace
    from grok_tpu.io.color import cielab_to_rgb, force_rgb

    cases = {
        (128, 128, 96): None,  # L=50.2, a*=b*=0 -> neutral
        (0, 128, 96): (0, 0, 0),
        (255, 128, 96): (255, 255, 255),
    }
    for (lc, ac, bc), want in cases.items():
        im = Image(0, 0, 2, 2, color_space=ColorSpace.CIELAB)
        for v in (lc, ac, bc):
            im.components.append(Component(
                dx=1, dy=1, prec=8, signed=False,
                data=np.full((2, 2), v, dtype=np.int32)))
        im.finalize()
        out = force_rgb(im)
        px = tuple(int(c.data[0, 0]) for c in out.components)
        if want is None:
            assert max(px) - min(px) <= 1, px  # neutral
        else:
            assert all(abs(p - w) <= 2 for p, w in zip(px, want)), (px, want)


def test_custom_mct_markers_roundtrip(rng):
    """Part-2 array MCT (MCT/MCC/MCO markers): near-orthonormal matrix
    signals + decodes through our codec. (The reference cannot decode
    mct=2 at all — CodeStreamDecompress.cpp:2584 rejects it, including
    streams produced by its own grk_set_MCT.)"""
    import numpy as np

    import grok_tpu as gk
    from tests.conftest import natural_image

    arr = natural_image(96, 128, 3)
    im = gk.Image.from_array(arr)
    theta = 0.4
    c, s = np.cos(theta), np.sin(theta)
    M = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    stream = gk.compress(im, gk.CompressParams(num_resolutions=3, mct_matrix=M))
    out = gk.decompress(stream).to_array()
    mse = ((out.astype(float) - arr) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 40.0, psnr
    # Rsiz must signal Part-2 + MCT extension
    info = gk.parse_codestream(stream)
    assert info.header.siz.rsiz & 0x8100 == 0x8100


def test_broadcast_profiles(rng):
    import numpy as np

    import grok_tpu as gk
    from grok_tpu.core import params as P
    from tests.conftest import natural_image

    arr = natural_image(120, 160, 3)
    s1 = gk.compress(gk.Image.from_array(arr),
                     gk.CompressParams(num_resolutions=4,
                                       profile=P.PROFILE_BC_MULTI_R | 3))
    out = gk.decompress(s1).to_array()
    assert np.array_equal(out, arr)  # MULTI_R stays reversible
    info = gk.parse_codestream(s1)
    assert len(info.tile_parts[0]) == 3  # one tile-part per component


def test_cli_compress_flag_surface(tmp_path):
    """New grk_compress-parity flags parse and produce decodable streams."""
    import numpy as np
    from PIL import Image as PImage

    import grok_tpu as gk
    from grok_tpu.cli.compress import main as cmain

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    src = str(tmp_path / "in.png")
    PImage.fromarray(arr).save(src)

    out1 = str(tmp_path / "a.j2k")
    assert cmain(["-i", src, "-o", out1, "-P", "0,0,1,2,3,RLCP",
                  "-R", "c=0,U=4", "--TP", "R", "-A", "1"]) == 0
    dec = gk.decompress(open(out1, "rb").read()).to_array()
    assert np.array_equal(dec, arr)

    out2 = str(tmp_path / "b.jp2")
    assert cmain(["-i", src, "-o", out2, "-Q", "300,300", "-D", "72,72"]) == 0
    from grok_tpu.codestream.jp2 import unwrap_jp2

    info = unwrap_jp2(open(out2, "rb").read())
    assert info.capture_resolution == (300.0, 300.0)
    assert info.display_resolution == (72.0, 72.0)

    # raw input via -F
    raw = str(tmp_path / "r.raw")
    arr[:, :, 0].tofile(raw)
    out3 = str(tmp_path / "c.j2k")
    assert cmain(["-i", raw, "-o", out3, "-F", "128,96,1,8,u"]) == 0
    assert cmain(["-i", raw, "-o", out3]) == 1  # raw without -F: clean error


def test_cli_decompress_flag_surface(tmp_path):
    """Decompress parity flags: precision forcing, split, batch, XML."""
    import numpy as np
    from PIL import Image as PImage

    import grok_tpu as gk
    from grok_tpu.cli.compress import main as cmain
    from grok_tpu.cli.decompress import main as dmain

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
    src = str(tmp_path / "in.png")
    PImage.fromarray(arr).save(src)
    j2k = str(tmp_path / "x.j2k")
    assert cmain(["-i", src, "-o", j2k]) == 0

    # precision scale to 6 bits
    p6 = str(tmp_path / "p6.png")
    assert dmain(["-i", j2k, "-o", p6, "-p", "6S"]) == 0
    assert np.asarray(PImage.open(p6)).max() <= 63

    # split components
    sp = str(tmp_path / "s.ppm")
    assert dmain(["-i", j2k, "-o", sp, "-s"]) == 0
    assert (tmp_path / "s_0.ppm").exists() and (tmp_path / "s_2.ppm").exists()

    # batch mode
    bat = tmp_path / "bat"
    bat.mkdir()
    (bat / "one.j2k").write_bytes(open(j2k, "rb").read())
    assert dmain(["-y", str(bat), "-a", str(bat), "-O", "png"]) == 0
    assert (bat / "one.png").exists()


def test_trace_spans(monkeypatch):
    """GROK_TPU_TRACE=1 collects per-stage spans with roofline accounting
    (SURVEY §5 tracing subsystem: jax.profiler hook + stage counters)."""
    import io

    monkeypatch.setenv("GROK_TPU_TRACE", "1")
    from grok_tpu.core import trace

    trace.reset()
    arr = natural_image(128, 128, 3)
    im = gk.Image.from_array(arr)
    st = gk.compress(im, gk.CompressParams(num_resolutions=4))
    out = gk.decompress(st).to_array()
    assert np.array_equal(out, arr)
    names = {r["stage"] for r in trace.rows()}
    assert {"enc.mct_dc", "enc.dwt_quant", "enc.t1", "enc.pcrd_t2",
            "dec.t2_parse", "dec.t1", "dec.scatter", "dec.idwt",
            "dec.mct_finish"} <= names, names
    buf = io.StringIO()
    rows = trace.report(file=buf)
    assert "roofline" in buf.getvalue()
    assert all(r["ms"] >= 0 for r in rows)
    trace.reset()
    assert not trace.rows()


def test_exif_transfer_roundtrip(tmp_path):
    """-V EXIF transfer (reference grk -V TransferExifTags parity): input
    EXIF rides a JpgTiffExif->JP2 uuid box and comes back out on decode."""
    from PIL import Image as PImage

    src = tmp_path / "in.jpg"
    pil = PImage.fromarray(natural_image(48, 64, 3).astype(np.uint8))
    ex = PImage.Exif()
    ex[271] = "grok_tpu_make"   # Make
    ex[272] = "grok_tpu_model"  # Model
    pil.save(src, exif=ex.tobytes())

    from grok_tpu.cli.compress import main as cmain
    from grok_tpu.cli.decompress import main as dmain

    jp2 = tmp_path / "o.jp2"
    assert cmain(["-i", str(src), "-o", str(jp2), "-n", "3", "-V"]) == 0
    # uuid box present with the conventional EXIF uuid
    from grok_tpu.codestream.jp2 import EXIF_UUID, unwrap_jp2

    info = unwrap_jp2(jp2.read_bytes())
    assert any(uid == EXIF_UUID for uid, _ in info.uuid)

    back = tmp_path / "back.png"
    assert dmain(["-i", str(jp2), "-o", str(back), "-V"]) == 0
    got = PImage.open(back).getexif()
    assert got[271] == "grok_tpu_make" and got[272] == "grok_tpu_model"

    # without -V the EXIF must NOT be embedded
    jp2n = tmp_path / "n.jp2"
    assert cmain(["-i", str(src), "-o", str(jp2n), "-n", "3"]) == 0
    info2 = unwrap_jp2(jp2n.read_bytes())
    assert not any(uid == EXIF_UUID for uid, _ in info2.uuid)


def test_cli_profile_and_timing_flags(tmp_path):
    """-U BROADCAST / -z IMF profile selection, -J duration loop, -G
    device id and -g plugin path (reference grk_compress flag parity)."""
    from PIL import Image as PImage

    from grok_tpu.cli.compress import main as cmain
    from grok_tpu.core import params as prm

    src = tmp_path / "in.png"
    PImage.fromarray(natural_image(64, 80, 3).astype(np.uint8)).save(src)

    out = tmp_path / "imf.j2k"
    assert cmain(["-i", str(src), "-o", str(out), "-z",
                  "2K,mainlevel=1,sublevel=1,framerate=24"]) == 0
    ps = gk.parse_codestream(out.read_bytes())
    assert ps.header.siz.rsiz == prm.PROFILE_IMF_2K | (1 << 4) | 1

    out2 = tmp_path / "bc.j2k"
    assert cmain(["-i", str(src), "-o", str(out2), "-U",
                  "SINGLE,mainlevel=2"]) == 0
    ps2 = gk.parse_codestream(out2.read_bytes())
    assert ps2.header.siz.rsiz == prm.PROFILE_BC_SINGLE | 2

    # -J: duration-driven repeat still produces a valid stream
    out3 = tmp_path / "dur.j2k"
    assert cmain(["-i", str(src), "-o", str(out3), "-n", "3",
                  "-J", "0.2", "-v"]) == 0
    assert np.array_equal(
        gk.decompress(out3.read_bytes()).to_array(),
        natural_image(64, 80, 3),
    )

    # bad profile value: clean CLI error, not a traceback
    assert cmain(["-i", str(src), "-o", str(out), "-z", "3K"]) == 1


def test_raw_planar_reference_convention(tmp_path):
    """Multi-component raw files use PLANAR component order (reference
    RAWFormat.cpp): a raw file we write must load identically in the
    reference CLI and vice versa."""
    from tests.conftest import grk_compress, have_grok

    from grok_tpu.io.formats import read_raw, write_raw

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (40, 56, 3)).astype(np.int32)
    img = gk.Image.from_array(arr)
    p = tmp_path / "p.raw"
    write_raw(str(p), img)
    back = read_raw(str(p), 56, 40, 3, 8, False)
    assert np.array_equal(back.to_array(), arr)
    if not have_grok():
        pytest.skip("reference binaries not available")
    # the reference reads the same bytes into the same components
    j2k = tmp_path / "p.j2k"
    r = grk_compress(["-i", str(p), "-o", str(j2k), "-F", "56,40,3,8,u",
                      "-Y", "0"])
    assert r.returncode == 0, r.stderr + r.stdout
    dec = gk.decompress(j2k.read_bytes()).to_array()
    assert np.array_equal(dec, arr)


def test_palette_write_roundtrip(tmp_path):
    """Palettized PNG -> index codestream + pclr/cmap JP2 boxes -> decode
    expands through the palette. Write-path parity with the reference's
    FileFormatCompress.cpp:196-265 (it keeps TIFF palettes the same way)."""
    from PIL import Image as PImage

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 16, (48, 64), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    p = PImage.fromarray(idx, mode="P")
    p.putpalette(pal.flatten().tolist())
    src = tmp_path / "in.png"
    p.save(src)

    img = load_image(str(src), keep_palette=True)
    assert img.num_comps == 1 and img.palette is not None
    stream = gk.compress(img, gk.CompressParams(num_resolutions=4))
    jp2 = wrap_jp2(stream, img)
    assert b"pclr" in jp2 and b"cmap" in jp2

    # our decode expands through the palette
    out = gk.decompress(jp2)
    rgb = np.stack([c.data for c in out.components], -1)
    assert np.array_equal(rgb, pal[idx].astype(np.int32))

    # round-trip the palette metadata itself
    info = unwrap_jp2(jp2)
    table, depths, cmap = info.palette
    assert np.array_equal(np.asarray(table), pal.astype(np.int32))
    assert depths == [8, 8, 8]
    assert cmap == [(0, 1, 0), (0, 1, 1), (0, 1, 2)]


@pytest.mark.skipif(not have_grok(), reason="reference binaries not found")
def test_palette_write_reference_interop(tmp_path):
    """The reference decoder must expand our palettized JP2 identically."""
    from PIL import Image as PImage

    rng = np.random.default_rng(12)
    idx = rng.integers(0, 7, (40, 56), dtype=np.uint8)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    p = PImage.fromarray(idx, mode="P")
    p.putpalette(pal.flatten().tolist())
    src = tmp_path / "in.png"
    p.save(src)

    jp2_path = tmp_path / "out.jp2"
    r = subprocess.run(
        [sys.executable, "-m", "grok_tpu.cli.compress", "-i", str(src),
         "-o", str(jp2_path), "--keep_palette"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    ref_out = tmp_path / "ref.ppm"
    from tests.conftest import grk_decompress

    r = grk_decompress(["-i", str(jp2_path), "-o", str(ref_out)])
    assert r.returncode == 0, r.stderr
    ref = np.asarray(PImage.open(ref_out)).astype(np.int32)
    assert np.array_equal(ref, pal[idx].astype(np.int32))


@pytest.mark.skipif(not have_grok(), reason="reference binaries not found")
@pytest.mark.parametrize("cfg", ["plain", "tiled_layers", "precincts", "ht"])
def test_dump_parity_with_reference(cfg, tmp_path, rng):
    """Our dump reports the same codec-state facts as grk_dump (per-comp
    coding params, stepsizes, marker index) — checked semantically by
    tools/compare_dumps.py, the compare_dump_files analogue."""
    import subprocess as sp

    arr = natural_image(96, 128, nc=3)
    im = gk.Image.from_array(arr)
    kw = {"plain": dict(num_resolutions=4),
          "tiled_layers": dict(num_resolutions=3, tile_size=(64, 64),
                               write_tlm=True, num_layers=2,
                               layer_rates=[8.0, 1.0]),
          "precincts": dict(num_resolutions=3,
                            precinct_sizes=[(6, 6)] * 33, use_sop=True),
          "ht": dict(num_resolutions=4, ht=True)}[cfg]
    stream = gk.compress(im, gk.CompressParams(**kw))
    j2k = tmp_path / "s.j2k"
    j2k.write_bytes(stream)

    ref = sp.run([f"{GRK_BIN}/grk_dump", "-i", str(j2k)],
                 capture_output=True, text=True)
    assert ref.returncode == 0
    (tmp_path / "ref.txt").write_text(ref.stdout + ref.stderr)
    ours = sp.run([sys.executable, "-m", "grok_tpu.cli.dump", "-i", str(j2k)],
                  capture_output=True, text=True)
    assert ours.returncode == 0, ours.stderr
    (tmp_path / "ours.txt").write_text(ours.stdout)

    r = sp.run([sys.executable, "tools/compare_dumps.py",
                "-b", str(tmp_path / "ref.txt"), "-t", str(tmp_path / "ours.txt")],
               capture_output=True, text=True)
    assert r.returncode == 0, r.stdout

    # the diff tool must also FAIL on genuinely different streams
    stream2 = gk.compress(im, gk.CompressParams(num_resolutions=2))
    j2k2 = tmp_path / "s2.j2k"
    j2k2.write_bytes(stream2)
    other = sp.run([sys.executable, "-m", "grok_tpu.cli.dump", "-i", str(j2k2)],
                   capture_output=True, text=True)
    (tmp_path / "other.txt").write_text(other.stdout)
    r = sp.run([sys.executable, "tools/compare_dumps.py",
                "-b", str(tmp_path / "ref.txt"), "-t", str(tmp_path / "other.txt")],
               capture_output=True, text=True)
    assert r.returncode == 1
