"""Pure-Python PNG codec (stdlib zlib + numpy) — the real-codec
fallback for the multimodal stages in codec-less containers.

Scope (all the fixture blobs need, loudly rejected otherwise): 8-bit,
non-interlaced, color types gray / gray+alpha / RGB / RGBA; all five
scanline filters on DECODE (an encoder may have used any of them);
ENCODE always writes filter 0 (None) — simplicity over ratio, the
payloads are tiny fixtures.

This is a REAL codec, not a fake: output bytes are valid PNG files any
external tool can open, and `decode_png` round-trips Pillow-encoded
images (cross-checked in tests when Pillow is present).  The
:data:`PURE_PIL` shim exposes the exact Image-module subset the
multimodal stages use (`open`, `fromarray`, `Resampling.NEAREST`,
`Image.resize/save/getbands/size`, numpy conversion), so
``multimodal._try_pil()`` can hand either implementation to the same
actor code.
"""

import struct
import zlib

import numpy as np

__all__ = ['encode_png', 'decode_png', 'PureImage', 'PURE_PIL']

_SIG = b'\x89PNG\r\n\x1a\n'
_COLOR_FOR_CH = {1: 0, 2: 4, 3: 2, 4: 6}
_CH_FOR_COLOR = {0: 1, 2: 3, 4: 2, 6: 4}
_BANDS = {1: ('L',), 2: ('L', 'A'), 3: ('R', 'G', 'B'),
          4: ('R', 'G', 'B', 'A')}


def _chunk(typ, data):
    return (struct.pack('>I', len(data)) + typ + data
            + struct.pack('>I', zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(arr):
    """uint8 (h, w) or (h, w, ch∈{1,2,3,4}) → PNG bytes (filter 0)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError('encode_png: uint8 input required, got %s'
                         % arr.dtype)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_FOR_CH:
        raise ValueError('encode_png: (h, w[, ch<=4]) required, got shape %s'
                         % (arr.shape,))
    h, w, ch = arr.shape
    raw = b''.join(b'\x00' + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack('>IIBBBBB', w, h, 8, _COLOR_FOR_CH[ch], 0, 0, 0)
    return (_SIG + _chunk(b'IHDR', ihdr)
            + _chunk(b'IDAT', zlib.compress(raw, 6))
            + _chunk(b'IEND', b''))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data):
    """PNG bytes → uint8 (h, w) for grayscale, (h, w, ch) otherwise.

    Raises ValueError for non-PNG input or any feature outside the
    supported profile (palette, 16-bit, interlace, bad CRC)."""
    if data[:8] != _SIG:
        raise ValueError('not a PNG signature')
    pos, idat, hdr = 8, [], None
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], 'big')
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln:pos + 12 + ln], 'big')
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError('PNG chunk CRC mismatch (%r)' % typ)
        if typ == b'IHDR':
            hdr = struct.unpack('>IIBBBBB', chunk)
        elif typ == b'IDAT':
            idat.append(chunk)
        elif typ == b'IEND':
            break
        pos += 12 + ln
    if hdr is None or not idat:
        raise ValueError('PNG missing IHDR/IDAT')
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or color not in _CH_FOR_COLOR or comp or filt or interlace:
        raise ValueError(
            'unsupported PNG profile (depth=%d color=%d interlace=%d): '
            'only 8-bit non-interlaced gray/gray+alpha/RGB/RGBA'
            % (depth, color, interlace))
    ch = _CH_FOR_COLOR[color]
    raw = zlib.decompress(b''.join(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError('PNG scanline payload size mismatch')
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[y * (1 + stride)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (1 + stride) + 1).copy()
        if f == 0:
            rec = row
        elif f == 2:                       # Up (uint8 wraps mod 256)
            rec = row + prev
        elif f == 1:                       # Sub: sequential in left
            rec = row
            for i in range(ch, stride):
                rec[i] = (int(rec[i]) + int(rec[i - ch])) & 0xFF
        elif f == 3:                       # Average
            rec = row
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                rec[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:                       # Paeth
            rec = row
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                rec[i] = (int(row[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError('bad PNG filter byte %d' % f)
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


class PureImage:
    """The Image-object subset the multimodal stages touch."""

    def __init__(self, arr):
        arr = np.ascontiguousarray(arr)
        if arr.dtype != np.uint8:
            raise ValueError('PureImage: uint8 required')
        self._arr = arr

    @property
    def size(self):
        h, w = self._arr.shape[:2]
        return (w, h)

    def getbands(self):
        ch = 1 if self._arr.ndim == 2 else self._arr.shape[2]
        return _BANDS[ch]

    def __array__(self, dtype=None, copy=None):
        return self._arr if dtype is None else self._arr.astype(dtype)

    def resize(self, size, resample=None):
        # nearest-neighbor with the SAME index arithmetic as the MMV1
        # fake path (i * src // dst), so both seams resample identically
        tw, th = int(size[0]), int(size[1])
        a = self._arr if self._arr.ndim == 3 else self._arr[:, :, None]
        h, w = a.shape[:2]
        yi = np.arange(th) * h // th
        xi = np.arange(tw) * w // tw
        out = a[yi][:, xi]
        return PureImage(out if self._arr.ndim == 3 else out[:, :, 0])

    def save(self, fp, format='PNG'):
        if format != 'PNG':
            raise ValueError('PureImage only encodes PNG')
        fp.write(encode_png(self._arr))


class _Resampling:
    NEAREST = 0


class _PurePilModule:
    """Image-module shim: what ``multimodal._try_pil()`` returns when
    Pillow is absent."""

    Resampling = _Resampling

    @staticmethod
    def open(fp):
        return PureImage(decode_png(fp.read()))

    @staticmethod
    def fromarray(arr):
        return PureImage(arr)


PURE_PIL = _PurePilModule()
