"""Loadable-library T1 backend (the dlopen plugin axis).

The reference exposes a plugin framework whose main production use is
swapping the Tier-1 block coder for an accelerated implementation
(plugin/plugin_interface.h:134 generate/decode hooks, plugin_bridge.cpp);
the host keeps rate control and T2. This module is that axis for grok_tpu:
``load_plugin(path)`` dlopens a shared library exporting the batched-T1
C ABI (see ``native.bind_t1_abi``) and registers it as a selectable
backend — ``GROK_TPU_T1=<name>`` or ``select_backend(name)``.

Auto-load: set ``GROK_TPU_T1_PLUGIN=/path/to/lib.so[:name]`` and the
plugin is loaded on first backend selection (name defaults to the file
stem); combine with ``GROK_TPU_T1=<name>`` to route all coding to it.

A conforming plugin exports::

    int t1_encode_cblks(const int32_t* coeffs, const int32_t* heights,
                        const int32_t* widths, const int32_t* orients,
                        const int32_t* styles, int64_t n,
                        int32_t H, int32_t W, uint8_t* out, int64_t max_bytes,
                        int64_t* lengths, int32_t* numbps, int32_t* npasses,
                        int64_t* pass_rates, double* pass_dist,
                        int32_t max_passes, int32_t num_threads);
    /* pass_dist may be NULL: skip distortion accounting (single-layer
       untargeted encodes never read it) */
    int t1_decode_cblks(const uint8_t* data, const int64_t* lengths,
                        const int32_t* numbps, const int32_t* npasses,
                        const int32_t* heights, const int32_t* widths,
                        const int32_t* orients, const int32_t* styles,
                        const int64_t* seg_lengths, int32_t max_segs,
                        int64_t n, int32_t H, int32_t W, int64_t data_stride,
                        int32_t* out, int32_t num_threads);

and optionally ``int32_t t1_supported_styles(void)`` (defaults to 0x3F).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from . import register_backend
from . import native as _native


class PluginBackend:
    """A T1 backend bound to an external shared library."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.lib = ctypes.CDLL(self.path)
        _native.bind_t1_abi(self.lib)
        try:
            fn = self.lib.t1_supported_styles
            fn.restype = ctypes.c_int32
            fn.argtypes = []
            self.SUPPORTED_STYLES = int(fn())
        except AttributeError:
            self.SUPPORTED_STYLES = 0x3F

    def encode_cblks(self, coeffs, heights, widths, orients,
                     num_threads: int = 0, styles=None, want_dist=True):
        # external plugins built against the original ABI may write
        # pass_dist unconditionally: always hand them a valid buffer
        return _native.encode_cblks(
            coeffs, heights, widths, orients,
            num_threads=num_threads, styles=styles, want_dist=True,
            _lib=self.lib,
        )

    def decode_cblks(self, data, lengths, numbps, npasses, heights, widths,
                     orients, block_h, block_w, num_threads: int = 0,
                     styles=None, seg_lengths=None):
        return _native.decode_cblks(
            data, lengths, numbps, npasses, heights, widths, orients,
            block_h, block_w, num_threads=num_threads, styles=styles,
            seg_lengths=seg_lengths, _lib=self.lib,
        )

    def __repr__(self) -> str:  # shown in backend errors
        return f"<T1 plugin {self.path}>"


def load_plugin(path: str, name: str | None = None) -> PluginBackend:
    """dlopen ``path``, validate the T1 ABI, and register it as ``name``
    (default: the library's file stem, minus a ``lib`` prefix)."""
    backend = PluginBackend(path)
    if name is None:
        name = os.path.splitext(os.path.basename(path))[0].removeprefix("lib")
    backend.name = name
    register_backend(name, backend)
    return backend


def autoload_from_env() -> str | None:
    """Honor GROK_TPU_T1_PLUGIN=/path/lib.so[:name]; returns the
    registered name (None if the variable is unset). Errors propagate:
    a requested-but-broken plugin must fail loudly, not fall back."""
    spec = os.environ.get("GROK_TPU_T1_PLUGIN")
    if not spec:
        return None
    path, _, name = spec.partition(":")
    return load_plugin(path, name or None).name
