"""Stream abstractions for codec input/output.

Capability parity with the reference's util/BufferedStream.h +
GrkMappedFile.cpp (file / memory / mmap / callback sources): the decoder
can consume any random-access source without loading it into Python bytes
first (mmap gives zero-copy page-backed views; TLM random tile access then
touches only the pages of the tiles actually decoded). The reference's
io_uring path is Linux-async-specific; buffered writes + mmap reads are
the portable equivalents here.
"""

from __future__ import annotations

import io
import mmap
import os


class MemorySource:
    """bytes/bytearray/memoryview-backed source (zero-copy view)."""

    def __init__(self, data):
        self.view = memoryview(data)

    def __len__(self):
        return len(self.view)

    def close(self):
        pass


class MmapSource:
    """mmap-backed read-only file source (GrkMappedFile analogue)."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self.view = memoryview(self._mm)

    def __len__(self):
        return len(self.view)

    def close(self):
        self.view.release()
        self._mm.close()
        self._f.close()


class FileSource:
    """Buffered whole-file read (for non-mmappable sources, e.g. pipes)."""

    def __init__(self, fileobj):
        self.view = memoryview(fileobj.read())

    def __len__(self):
        return len(self.view)

    def close(self):
        pass


class CallbackSource:
    """Pull-based source: ``read_fn(offset, size) -> bytes``.

    The stream is materialized lazily in chunks; decoding touches only the
    ranges the marker parser and tile index request."""

    def __init__(self, read_fn, size: int, chunk: int = 1 << 20):
        self._read = read_fn
        self._size = size
        self._chunk = chunk
        self._buf = bytearray(size)
        self._have = bytearray((size + chunk - 1) // chunk)
        self.view = _LazyView(self)

    def _ensure(self, start: int, end: int):
        c = self._chunk
        for ci in range(start // c, (max(end - 1, start)) // c + 1):
            if not self._have[ci]:
                off = ci * c
                n = min(c, self._size - off)
                data = self._read(off, n)
                self._buf[off : off + len(data)] = data
                self._have[ci] = 1

    def __len__(self):
        return self._size

    def close(self):
        pass


class _LazyView:
    """Minimal memoryview-compatible facade over CallbackSource."""

    def __init__(self, src: CallbackSource):
        self._src = src

    def __len__(self):
        return self._src._size

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self._src._size)
            self._src._ensure(start, stop)
            return memoryview(self._src._buf)[key]
        self._src._ensure(key, key + 1)
        return self._src._buf[key]

    def tobytes(self):
        self._src._ensure(0, self._src._size)
        return bytes(self._src._buf)


def open_source(src):
    """Normalize any supported input into a source with a .view."""
    if isinstance(src, (bytes, bytearray, memoryview)):
        return MemorySource(src)
    if isinstance(src, str) or isinstance(src, os.PathLike):
        try:
            return MmapSource(os.fspath(src))
        except (OSError, ValueError):
            with open(src, "rb") as f:
                return FileSource(f)
    if hasattr(src, "read"):
        return FileSource(src)
    if hasattr(src, "view"):
        return src
    raise TypeError(f"unsupported stream source: {type(src)!r}")


class OutputStream:
    """Seekable buffered output (file path, file object, or memory)."""

    def __init__(self, dst=None):
        if dst is None:
            self._f = io.BytesIO()
            self._own = True
        elif isinstance(dst, (str, os.PathLike)):
            self._f = open(dst, "wb+")
            self._own = True
        else:
            self._f = dst
            self._own = False
        self.seekable = self._f.seekable()

    def write(self, data) -> int:
        return self._f.write(data)

    def tell(self) -> int:
        return self._f.tell()

    def patch(self, offset: int, data: bytes):
        assert self.seekable
        pos = self._f.tell()
        self._f.seek(offset)
        self._f.write(data)
        self._f.seek(pos)

    def getvalue(self) -> bytes:
        return self._f.getvalue()

    def close(self):
        if self._own and not isinstance(self._f, io.BytesIO):
            self._f.close()


class _UringBackend:
    """Kernel-ring positional writes via the native raw-syscall io_uring
    wrapper (native/uring_io.cpp; reference FileUringIO.cpp:42-76). The
    Python side owns every submitted buffer until its completion token is
    reaped — positional (pwrite) submission makes completion order
    irrelevant, so the TLM/PSOT patch rides the same ring."""

    DEPTH = 32

    def __init__(self, lib, path):
        import ctypes
        import os as _os

        self._ct = ctypes
        self.lib = lib
        self.fd = _os.open(str(path), _os.O_WRONLY | _os.O_CREAT | _os.O_TRUNC,
                           0o644)
        self.h = lib.uring_writer_create(self.fd, self.DEPTH)
        if not self.h:
            _os.close(self.fd)
            raise OSError("io_uring unavailable")
        self._pending: dict[int, bytes] = {}
        self._next_token = 1
        self._tokens = (ctypes.c_uint64 * (self.DEPTH * 2))()

    def _reap(self, wait: bool):
        n = self.lib.uring_writer_reap(self.h, self._tokens,
                                       len(self._tokens), int(wait))
        if n < 0:
            raise OSError("io_uring reap failed")
        for i in range(n):
            self._pending.pop(int(self._tokens[i]), None)

    def submit(self, data: bytes, offset: int):
        tok = self._next_token
        self._next_token += 1
        self._pending[tok] = data  # keep alive until completion
        while True:
            rc = self.lib.uring_writer_write(self.h, data, len(data),
                                             offset, tok)
            if rc == 0:
                break
            if rc == -2:  # ring full: wait for one completion
                self._reap(wait=True)
                continue
            self._pending.pop(tok, None)
            raise OSError("io_uring submit failed")
        self._reap(wait=False)

    def close(self) -> None:
        import os as _os

        nt = self._ct.c_int64(0)
        while self._pending:
            errs = self.lib.uring_writer_drain(self.h, self._tokens,
                                               len(self._tokens),
                                               self._ct.byref(nt))
            if errs < 0:
                break
            for i in range(int(nt.value)):
                self._pending.pop(int(self._tokens[i]), None)
            if errs > 0:
                self.lib.uring_writer_destroy(self.h)
                _os.close(self.fd)
                raise OSError(f"{errs} async write(s) failed")
            if int(nt.value) == 0:
                break
        self.lib.uring_writer_destroy(self.h)
        _os.close(self.fd)


class AsyncWriter:
    """Queued background writes (the analogue of the reference's io_uring
    strip writer, image_format/FileUringIO.cpp:42-76): the caller never
    blocks on disk — chunks go to a kernel io_uring (raw syscalls,
    native/uring_io.cpp) when writing to a file path, or to a writer
    thread with a bounded queue otherwise; close() drains and reports the
    total length. Disable the ring with GROK_TPU_URING=0.

    Used by the strip codecs so entropy coding of tile row N+1 overlaps
    the disk write of tile row N."""

    def __init__(self, dst, queue_depth: int = 8):
        import os as _os
        import queue as _q
        import threading

        self._uring = None
        if isinstance(dst, (str, _os.PathLike)) and _os.environ.get(
                "GROK_TPU_URING", "1") != "0":
            lib = None
            try:
                from ..t1.native import get_lib

                lib = get_lib()
            except Exception:
                lib = None
            if lib is not None and hasattr(lib, "uring_writer_create"):
                try:
                    self._uring = _UringBackend(lib, dst)
                except OSError:
                    self._uring = None
            if self._uring is not None:
                self.seekable = True
                self._written = 0
                return

        self._out = OutputStream(dst)
        self.seekable = self._out.seekable
        self._q: "_q.Queue" = _q.Queue(maxsize=queue_depth)
        self._err = None
        self._written = 0

        def worker():
            while True:
                item = self._q.get()
                if item is None:
                    return
                kind, payload = item
                try:
                    if kind == "w":
                        self._out.write(payload)
                    else:  # ("p", (offset, data))
                        self._out.patch(*payload)
                except Exception as e:  # surfaced on close()
                    self._err = e

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def write(self, data) -> int:
        data = bytes(data)
        if self._uring is not None:
            self._uring.submit(data, self._written)
            self._written += len(data)
            return len(data)
        self._q.put(("w", data))
        self._written += len(data)
        return len(data)

    def tell(self) -> int:
        # logical position: all queued bytes count as written
        return self._written

    def patch(self, offset: int, data: bytes):
        if self._uring is not None:
            self._uring.submit(bytes(data), offset)
            return
        self._q.put(("p", (offset, bytes(data))))

    def close(self) -> int:
        if self._uring is not None:
            self._uring.close()
            return self._written
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err
        self._out.close()
        return self._written

    def getvalue(self) -> bytes:
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err
        return self._out.getvalue()
