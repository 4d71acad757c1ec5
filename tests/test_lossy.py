"""Lossy 9/7 + PCRD rate-control tests."""

import numpy as np
import pytest

import grok_tpu as gk
from tests.conftest import natural_image


def psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / mse) if mse > 0 else float("inf")


def test_97_default_near_lossless():
    arr = natural_image(256, 256)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5, irreversible=True))
    out = gk.decompress(stream).to_array()[:, :, 0]
    assert psnr(arr, out) > 42


def test_97_rate_targets_and_layer_progression():
    arr = natural_image(256, 256)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(
        num_resolutions=5, irreversible=True, num_layers=3, layer_rates=[32, 16, 8]
    )
    stream = gk.compress(im, p)
    target = 256 * 256 // 8
    assert len(stream) <= target * 1.02, "rate overshoot"
    assert len(stream) >= target * 0.75, "rate badly undershot"
    prev = 0.0
    for ml in (1, 2, 3):
        out = gk.decompress(stream, gk.DecompressParams(max_layers=ml)).to_array()[:, :, 0]
        q = psnr(arr, out)
        assert q > prev, "PSNR must increase with layers"
        prev = q
    assert prev > 30


def test_53_truncation_layers():
    arr = natural_image(256, 256)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=5, num_layers=2, layer_rates=[16, 1])
    stream = gk.compress(im, p)
    lossy = gk.decompress(stream, gk.DecompressParams(max_layers=1)).to_array()[:, :, 0]
    full = gk.decompress(stream).to_array()[:, :, 0]
    assert np.array_equal(full, arr), "final layer (ratio<=1) must be lossless"
    assert psnr(arr, lossy) > 25


def test_max_layers_non_lrcp_progressions():
    """Layer truncation when layer is NOT the outermost progression axis:
    unwanted layer packets interleave mid-stream and must be
    parsed-and-dropped (or PLT-skipped) so later wanted packets stay
    byte-aligned. Layer allocation depends only on the rates, so layer-1
    pixels must be identical across all five progression orders."""
    arr = natural_image(200, 280, nc=3)
    im = gk.Image.from_array(arr)
    cfg = dict(num_resolutions=4, num_layers=3, layer_rates=[60, 20, 1])
    expected = None
    for prog in gk.ProgressionOrder:
        for plt in (False, True):
            stream = gk.compress(
                im, gk.CompressParams(progression=prog, write_plt=plt, **cfg)
            )
            out = gk.decompress(
                stream, gk.DecompressParams(max_layers=1)
            ).to_array()
            if expected is None:
                expected = out
            assert np.array_equal(out, expected), (prog, plt)


def test_max_layers_non_lrcp_interop():
    """The reference decoder's -l 1 on our RPCL stream must match ours."""
    import glob

    from tests.conftest import grk_decompress, have_grok, read_pgx

    if not have_grok():
        pytest.skip("reference binaries not available")
    import tempfile, os

    arr = natural_image(200, 280, nc=3)
    im = gk.Image.from_array(arr)
    stream = bytes(gk.compress(im, gk.CompressParams(
        progression=gk.ProgressionOrder.RPCL, num_resolutions=4,
        num_layers=3, layer_rates=[60, 20, 1],
    )))
    ours = gk.decompress(stream, gk.DecompressParams(max_layers=1)).to_array()
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "l.j2k")
        with open(p, "wb") as f:
            f.write(stream)
        out = os.path.join(td, "l_ref.pgx")
        r = grk_decompress(["-i", p, "-o", out, "-l", "1"])
        assert r.returncode == 0, r.stderr
        refs = [read_pgx(f)
                for f in sorted(glob.glob(os.path.join(td, "l_ref*.pgx")))]
    for i in range(3):
        assert np.array_equal(ours[:, :, i], refs[i]), i


def test_97_rgb_ict():
    arr = natural_image(128, 128, nc=3)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=4, irreversible=True, num_layers=1, layer_rates=[10])
    stream = gk.compress(im, p)
    out = gk.decompress(stream).to_array()
    assert psnr(arr, out) > 28


# ------------------------------------------------------- exact PCRD / PSNR
def test_exact_rate_target_single_shot(rng):
    """Exact packet simulation lands within 0.5% of the byte budget."""
    import grok_tpu.tile.tile_processor as TP
    from tests.conftest import natural_image

    arr = natural_image(256, 256, 3)
    im = gk.Image.from_array(arr)
    calls = []
    orig = TP.TileProcessor._allocate_layers

    def counting(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    TP.TileProcessor._allocate_layers = counting
    try:
        for rate in (6, 20):
            calls.clear()
            p = gk.CompressParams(num_resolutions=4, num_layers=1,
                                  layer_rates=[rate])
            stream = gk.compress(im, p)
            target = 256 * 256 * 3 / rate
            assert len(stream) <= target * 1.005 + 256
            assert len(stream) >= target * 0.97
            assert len(calls) == 1  # no shrink-retry needed
    finally:
        TP.TileProcessor._allocate_layers = orig


def test_psnr_layer_targets(rng):
    """Fixed-quality layers: decoded PSNR tracks the requested targets."""
    from tests.conftest import natural_image

    arr = natural_image(256, 256, 3)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=4, num_layers=2,
                          layer_psnrs=[28.0, 38.0])
    stream = gk.compress(im, p)
    prev = 0.0
    for L, want in ((1, 28.0), (2, 38.0)):
        out = gk.decompress(stream, gk.DecompressParams(max_layers=L)).to_array()
        mse = ((out.astype(float) - arr) ** 2).mean()
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr > want - 3.0, (L, psnr)
        assert psnr > prev
        prev = psnr


@pytest.mark.parametrize("cblk", [64, 32, 16])
def test_rate_target_small_codeblocks(cblk):
    """PCRD with exact T2 simulation must hit the byte target for small
    codeblocks too (regression: clustered hull slopes made the threshold
    ladder jump from ~9 KB to ~300 B; reference pcrdBisectSimple)."""
    rng = np.random.default_rng(cblk)
    arr = rng.integers(0, 256, (200, 300, 3)).astype(np.int32)
    im = gk.Image.from_array(arr)
    target = arr.size * 8 // (8 * 20)  # 20:1 on 8-bit samples
    p = gk.CompressParams(layer_rates=[20.0], num_layers=1,
                          cblk_width=cblk, cblk_height=cblk)
    blob = gk.compress(im, p)
    assert 0.5 * target < len(blob) <= 1.15 * target, (len(blob), target)


def test_psnr_at_matched_rate_vs_reference(tmp_path):
    """BASELINE target: lossy 9/7 PSNR >= the reference at equal bitrate
    (its working rate-control path; both decoded by our decoder)."""
    import os
    import subprocess

    import pytest

    from tests.conftest import GRK_BIN, have_grok, natural_image, save_pnm

    if not have_grok():
        pytest.skip("reference grok not built")
    arr = natural_image(512, 768, nc=3)
    src = str(tmp_path / "in.ppm")
    save_pnm(src, arr, 8)
    im = gk.Image.from_array(arr.astype(np.int32))

    def psnr(a, b):
        mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255.0 ** 2 / mse)

    for rate in (8, 24):
        p = gk.CompressParams(num_resolutions=6, irreversible=True,
                              num_layers=1, layer_rates=[float(rate)])
        ours = gk.compress(im, p)
        od = gk.decompress(ours).to_array()
        rj = str(tmp_path / f"r{rate}.j2k")
        subprocess.run([os.path.join(GRK_BIN, "grk_compress"), "-i", src,
                        "-o", rj, "-r", str(rate)], capture_output=True)
        rd = gk.decompress(open(rj, "rb").read()).to_array()
        p_ours = psnr(arr, od.reshape(arr.shape))
        p_ref = psnr(arr, rd.reshape(arr.shape))
        # sizes must be comparable for the PSNR comparison to be fair
        assert abs(len(ours) - os.path.getsize(rj)) < 0.03 * len(ours)
        assert p_ours >= p_ref - 0.05, (rate, p_ours, p_ref)
