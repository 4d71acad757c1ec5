"""MSB-first bit I/O with the JPEG 2000 0xFF stuffing rule (T.800 B.10.1).

Used by packet headers and tag trees. Behavior parity with the reference's
t2/BitIO.{h,cpp}; implemented from the standard's flowcharts.

The stuffing rule: whenever an emitted byte equals 0xFF, the following byte
carries only 7 payload bits (its MSB is a stuffed 0). This guarantees no
two-byte sequence >= 0xFF90 (a marker) appears inside packet headers.
"""

from __future__ import annotations


class BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._buf = 0  # byte being accumulated
        self._ct = 8  # bits still free in _buf

    def write_bit(self, bit: int) -> None:
        if self._ct == 0:
            self._bytes.append(self._buf)
            self._ct = 7 if self._buf == 0xFF else 8
            self._buf = 0
        self._ct -= 1
        if bit:
            self._buf |= 1 << self._ct

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def flush(self) -> None:
        """Byte-align. A header never ends in a pending-stuff state: if the
        final emitted byte is 0xFF, append the stuffed (7-bit) zero byte."""
        if self._ct < 8:
            self._bytes.append(self._buf)
            if self._buf == 0xFF:
                self._bytes.append(0)
        self._buf = 0
        self._ct = 8

    def getvalue(self) -> bytes:
        return bytes(self._bytes)

    def __len__(self) -> int:
        return len(self._bytes) + (1 if self._ct < 8 else 0)


class BitReader:
    def __init__(self, data: bytes | bytearray | memoryview, pos: int = 0) -> None:
        self._data = data
        self._pos = pos
        self._buf = 0
        self._ct = 0
        self._prev_ff = False

    @property
    def byte_pos(self) -> int:
        return self._pos

    def read_bit(self) -> int:
        if self._ct == 0:
            if self._pos >= len(self._data):
                # Tolerate truncation like the reference decoder: feed 1s
                # beyond end-of-data turns into 0xFF-like tail handling; we
                # feed 0s which terminates tag-tree reads safely.
                self._buf = 0
            else:
                self._buf = self._data[self._pos]
                self._pos += 1
            self._ct = 7 if self._prev_ff else 8
            self._prev_ff = self._buf == 0xFF
        self._ct -= 1
        return (self._buf >> self._ct) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        """Byte-align after a header (T.800: if the last consumed byte was
        0xFF, the stuffed byte that follows is also consumed)."""
        self._ct = 0
        if self._prev_ff:
            # consume the stuffed byte
            if self._pos < len(self._data):
                self._pos += 1
            self._prev_ff = False
