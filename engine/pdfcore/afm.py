"""AFM (Adobe Font Metrics) parsing for the 14 standard fonts.

Re-derivation of the reference's AFM tokenizer + parser (pypdfproc/parser/
fontmetrics.py, parser/__init__.py:1129-1222, fontmetrics.py; SURVEY.md
P7/S3/F12) as a direct line/field parser — no lexer framework.

Deliberately cloned quirk: the reference's parser only flushes a character
metric when the *next* ``C`` token arrives, so the LAST CharMetrics row of
every AFM file is dropped (e.g. /Euro in Helvetica).  Width averages and
synthesized width arrays depend on this; we reproduce it.

Only the fields the extraction paths consume are kept: per-character
``C`` (code) and ``W`` (wx, 0), indexed by glyph name.
"""

import re
import zipfile

__all__ = ['parse_afm', 'FontMetrics', 'load_afm_zip']

_TOKEN_SPLIT = re.compile(r'\s*;\s*')


class FontMetrics(object):
    """Parsed metrics for one font: ``char_metrics[name] = {'C':…, 'W':(wx,0)}``."""

    __slots__ = ('font_name', 'char_metrics', '_widths')

    def __init__(self, font_name, char_metrics):
        self.font_name = font_name
        self.char_metrics = char_metrics
        self._widths = None

    def get_widths(self):
        """name → (wx, 0) for every (kept) character (reference
        FontMetricsData.GetWidths).  Memoized: FontMetrics instances are
        corpus-invariant actor state, and the reference rebuilds this dict
        per call only because it never amortizes anything."""
        if self._widths is None:
            self._widths = {k: v['W'] for k, v in self.char_metrics.items()}
        return self._widths

    def get_character(self, name):
        """Metrics dict for a glyph name, or None (reference GetCharacter
        string path)."""
        return self.char_metrics.get(name)


def _intorfloat(v):
    try:
        return int(v)
    except (TypeError, ValueError):
        return float(v)


def parse_afm(txt):
    """Parse AFM text → FontMetrics.

    The CharMetrics section is a sequence of ``;``-separated key/value
    fields per line (``C 32 ; WX 278 ; N space ; B 0 0 0 0 ;``).  Rows are
    accumulated and flushed on the next ``C`` — the last row is never
    flushed (cloned reference bug, parser/__init__.py:1193-1198).
    """
    font_name = None
    char_metrics = {}
    in_char = False
    cur = {}

    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith('FontName '):
            font_name = line[len('FontName '):]
            continue
        if line.startswith('StartCharMetrics'):
            in_char = True
            continue
        if line.startswith('EndCharMetrics'):
            in_char = False
            # NB: deliberately no flush of ``cur`` here (see module docstring)
            continue
        if not in_char:
            continue
        for field in _TOKEN_SPLIT.split(line):
            field = field.strip()
            if not field:
                continue
            if field.startswith('C '):
                if cur:
                    char_metrics[cur['N']] = cur
                    cur = {}
                cur['C'] = _intorfloat(field[2:])
            elif field.startswith('WX '):
                cur['W'] = (_intorfloat(field[3:]), 0)
            elif field.startswith('N '):
                cur['N'] = field[2:].strip()
            # B (bbox), L (ligature) and others are not needed downstream

    return FontMetrics(font_name, char_metrics)


def load_afm_zip(path, fonts=None):
    """Parse every AFM in a zip → {font_name: FontMetrics} (reference
    FontMetricsManager.AddZip)."""
    out = {}
    with zipfile.ZipFile(path) as z:
        for fname in z.namelist():
            name = fname.split('.')[0]
            if fonts is not None and name not in fonts:
                continue
            txt = z.read(fname).decode('latin-1')
            fm = parse_afm(txt)
            if fm.font_name in out:
                raise ValueError("Already loaded font '%s'" % fm.font_name)
            out[fm.font_name] = fm
    return out
