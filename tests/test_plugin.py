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
