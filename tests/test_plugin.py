"""dlopen T1 plugin loading (reference plugin-framework parity).

Uses the repo's own native library as the external plugin .so: copied to a
neutral path/name, loaded purely through the dlopen ABI, and driven through
the full codec — streams must be byte-identical to the built-in backend.
"""

import os
import shutil

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu import t1
from grok_tpu.t1 import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture
def plugin_so(tmp_path):
    src = native._build()
    dst = tmp_path / "libcustom_t1.so"
    shutil.copy(src, dst)
    yield str(dst)
    t1.unregister_backend("custom_t1")


def _image():
    rng = np.random.default_rng(5)
    return gk.Image.from_array(
        rng.integers(0, 256, size=(160, 210, 3)).astype(np.int32)
    )


def test_load_plugin_roundtrip(plugin_so, monkeypatch):
    from grok_tpu.t1 import plugin

    backend = plugin.load_plugin(plugin_so)
    assert backend.name == "custom_t1"
    assert backend.SUPPORTED_STYLES == 0x3F
    assert t1.select_backend("custom_t1") is backend

    im = _image()
    params = gk.CompressParams(num_resolutions=4)
    monkeypatch.setenv("GROK_TPU_T1", "native")
    ref_stream = gk.compress(im, params)
    monkeypatch.setenv("GROK_TPU_T1", "custom_t1")
    got_stream = gk.compress(im, params)
    assert got_stream == ref_stream  # byte-identical via the plugin
    out = gk.decompress(got_stream)
    assert np.array_equal(out.to_array(), im.to_array())


def test_env_autoload(plugin_so, monkeypatch):
    monkeypatch.setenv("GROK_TPU_T1_PLUGIN", plugin_so + ":envplug")
    monkeypatch.setenv("GROK_TPU_T1", "envplug")
    try:
        backend = t1.select_backend()
        assert getattr(backend, "name", None) == "envplug"
        im = _image()
        stream = gk.compress(im, gk.CompressParams(num_resolutions=3))
        out = gk.decompress(stream)
        assert np.array_equal(out.to_array(), im.to_array())
    finally:
        t1.unregister_backend("envplug")


def test_broken_plugin_fails_loudly(tmp_path):
    from grok_tpu.t1 import plugin

    bogus = tmp_path / "libnot_a_plugin.so"
    bogus.write_bytes(b"\x7fELF garbage")
    with pytest.raises(OSError):
        plugin.load_plugin(str(bogus))


def test_missing_symbols_fail(tmp_path):
    """A real .so without the T1 entry points must be rejected."""
    from grok_tpu.t1 import plugin

    # libm has no t1_encode_cblks
    for cand in ("/lib/x86_64-linux-gnu/libm.so.6", "/usr/lib/libm.so.6"):
        if os.path.exists(cand):
            with pytest.raises(AttributeError):
                plugin.load_plugin(cand)
            return
    pytest.skip("no system libm found")


def test_cxd_capture():
    """capture_cxd returns per-block MQ (context, decision) streams —
    the grk_plugin_debug_mqc contextStream analogue."""
    from grok_tpu.t1.debug import capture_cxd

    rng = np.random.default_rng(3)
    coeffs = rng.integers(-200, 200, (4, 32, 32)).astype(np.int64)
    hs = np.full(4, 32); ws = np.full(4, 32); os_ = np.zeros(4, np.int64)
    res, streams = capture_cxd(coeffs, hs, ws, os_)
    assert len(streams) == 4
    for s in streams:
        assert s.dtype == np.uint8 and len(s) > 100
        assert int(s.max()) >> 1 <= 18  # 19 MQ contexts

    # determinism: capture must not perturb the coding
    from grok_tpu.t1 import ebcot_np
    plain = ebcot_np.encode_cblks(coeffs, hs, ws, os_)
    assert np.array_equal(plain.lengths, res.lengths)
    assert np.array_equal(plain.data, res.data)


def test_debug_verify_backend_passes_and_catches(plugin_so, monkeypatch):
    """GRK_PLUGIN_STATE_DEBUG analogue: a conforming plugin passes the
    per-batch bit-check; a corrupted one is caught with a CxD report."""
    from grok_tpu.t1 import plugin
    from grok_tpu.t1.debug import BackendMismatch, DebugVerifyBackend

    backend = plugin.load_plugin(plugin_so, "custom_t1")
    monkeypatch.setenv("GROK_TPU_T1", "custom_t1")
    monkeypatch.setenv("GROK_TPU_T1_DEBUG", "1")
    sel = t1.select_backend()
    assert isinstance(sel, DebugVerifyBackend)

    im = _image()
    stream = gk.compress(im, gk.CompressParams(num_resolutions=3))
    out = gk.decompress(stream)
    assert np.array_equal(out.to_array(), im.to_array())

    # a lying backend must be caught
    class Corrupt:
        SUPPORTED_STYLES = 0x3F

        def encode_cblks(self, *a, **kw):
            r = backend.encode_cblks(*a, **kw)
            r.data[0, 3] ^= 0x40  # flip one codeword bit
            return r

        def decode_cblks(self, *a, **kw):
            return backend.decode_cblks(*a, **kw)

    bad = DebugVerifyBackend(Corrupt(), "corrupt")
    rng = np.random.default_rng(1)
    coeffs = rng.integers(-100, 100, (2, 32, 32)).astype(np.int64)
    with pytest.raises(BackendMismatch) as ei:
        bad.encode_cblks(coeffs, np.full(2, 32), np.full(2, 32),
                         np.zeros(2, np.int64))
    assert "cxd tail" in str(ei.value)
