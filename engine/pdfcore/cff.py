"""Compact Font Format (CFF) parsing — the subset used for glyph-name
recovery (reference pypdfproc/parser/cff.py; SURVEY.md P8).

The reference parses a full CFF table-of-contents but only consumes the
per-glyph ``{gid, cid, cname}`` assembly (fontcache.py:270-281) to map a
glyph NAME back to its charset code.  This module implements exactly that
slice: header, INDEX structures, Top DICT charset offset, String INDEX,
and charset formats 0/1/2.

Returns a list of dicts with keys ``gid``, ``cid``, ``cname`` for font 0.
"""

import struct

from .cos import PdfError

__all__ = ['parse_cff']

# Standard strings count per CFF spec (Appendix A); SIDs below this index
# into the standard table, above into the String INDEX.
_N_STD_STRINGS = 391

# The standard-string names needed for glyph names are the printable set;
# full table per Adobe Tech Note #5176 Appendix A.
_STD_STRINGS = [
    '.notdef', 'space', 'exclam', 'quotedbl', 'numbersign', 'dollar',
    'percent', 'ampersand', 'quoteright', 'parenleft', 'parenright',
    'asterisk', 'plus', 'comma', 'hyphen', 'period', 'slash', 'zero', 'one',
    'two', 'three', 'four', 'five', 'six', 'seven', 'eight', 'nine', 'colon',
    'semicolon', 'less', 'equal', 'greater', 'question', 'at', 'A', 'B', 'C',
    'D', 'E', 'F', 'G', 'H', 'I', 'J', 'K', 'L', 'M', 'N', 'O', 'P', 'Q',
    'R', 'S', 'T', 'U', 'V', 'W', 'X', 'Y', 'Z', 'bracketleft', 'backslash',
    'bracketright', 'asciicircum', 'underscore', 'quoteleft', 'a', 'b', 'c',
    'd', 'e', 'f', 'g', 'h', 'i', 'j', 'k', 'l', 'm', 'n', 'o', 'p', 'q',
    'r', 's', 't', 'u', 'v', 'w', 'x', 'y', 'z', 'braceleft', 'bar',
    'braceright', 'asciitilde',
]


def _read_index(buf, off):
    """Read one INDEX; returns (items:list[bytes], next_offset)."""
    (count,) = struct.unpack_from('>H', buf, off)
    off += 2
    if count == 0:
        return [], off
    (offsize,) = struct.unpack_from('>B', buf, off)
    off += 1
    offsets = []
    for i in range(count + 1):
        v = 0
        for b in buf[off:off + offsize]:
            v = (v << 8) | b
        offsets.append(v)
        off += offsize
    data_start = off - 1  # offsets are 1-based from here
    items = [buf[data_start + offsets[i]:data_start + offsets[i + 1]]
             for i in range(count)]
    return items, data_start + offsets[count]


def _parse_top_dict(data):
    """Decode Top DICT operators; returns {op: operands}.  Only integer
    operand forms are needed for the charset/CharStrings offsets."""
    out = {}
    operands = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = (12, data[i])
                i += 1
            out[op] = list(operands)
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack_from('>h', data, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from('>i', data, i + 1)[0])
            i += 5
        elif b0 == 30:
            # real number: skip nibbles until 0xf terminator
            i += 1
            while i < n:
                nib = data[i]
                i += 1
                if (nib & 0x0f) == 0x0f or (nib & 0xf0) == 0xf0:
                    break
            operands.append(None)
        else:
            raise PdfError("Unknown CFF dict byte %d" % b0)
    return out


def parse_cff(txt):
    """Parse a CFF payload (latin-1 str or bytes) → glyph list for font 0."""
    if isinstance(txt, str):
        buf = bytes(txt, 'latin-1')
    else:
        buf = bytes(txt)
    if len(buf) < 4:
        raise PdfError("CFF too short")
    hdrsize = buf[2]
    off = hdrsize
    _names, off = _read_index(buf, off)
    topdicts, off = _read_index(buf, off)
    strings, off = _read_index(buf, off)
    _gsubrs, off = _read_index(buf, off)

    top = _parse_top_dict(topdicts[0])
    charstrings_off = top.get(17)
    if not charstrings_off:
        raise PdfError("CFF without CharStrings offset")
    charstrings, _ = _read_index(buf, charstrings_off[0])
    nglyphs = len(charstrings)

    def sid_name(sid):
        if sid < _N_STD_STRINGS:
            if sid < len(_STD_STRINGS):
                return _STD_STRINGS[sid]
            return 'sid%d' % sid
        idx = sid - _N_STD_STRINGS
        if idx < len(strings):
            return strings[idx].decode('latin-1')
        return 'sid%d' % sid

    charset_off = top.get(15, [0])
    co = charset_off[0]
    # charset ids per glyph; gid 0 is .notdef with id 0
    ids = [0]
    if co in (0, 1, 2):
        # predefined charsets: identity over standard strings (ISOAdobe)
        ids = list(range(nglyphs))
    else:
        fmt = buf[co]
        p = co + 1
        if fmt == 0:
            for _ in range(nglyphs - 1):
                ids.append(struct.unpack_from('>H', buf, p)[0])
                p += 2
        elif fmt in (1, 2):
            while len(ids) < nglyphs:
                (first,) = struct.unpack_from('>H', buf, p)
                p += 2
                if fmt == 1:
                    nleft = buf[p]
                    p += 1
                else:
                    (nleft,) = struct.unpack_from('>H', buf, p)
                    p += 2
                for k in range(nleft + 1):
                    if len(ids) >= nglyphs:
                        break
                    ids.append(first + k)
        else:
            raise PdfError("Unknown CFF charset format %d" % fmt)

    glyphs = []
    for gid in range(nglyphs):
        cset = ids[gid] if gid < len(ids) else 0
        glyphs.append({
            'gid': gid,
            'cid': cset,
            'cname': sid_name(cset),
        })
    return glyphs
