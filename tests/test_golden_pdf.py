"""Golden end-to-end: engine output must be byte-equal to the reference
oracle on every fixture variant (FIXTURES.md §3), including exact float
equality of every glyph-draw position."""

import json
import os
import glob

import pytest

from gen_pdf import build_variant
from engine.pdfcore.extract import extract_turn

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden', 'pdf_text')
_GOLDENS = sorted(glob.glob(os.path.join(_GOLDEN_DIR, '*.json')))


def _load(path):
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize('path', _GOLDENS, ids=[os.path.basename(p)[:-5] for p in _GOLDENS])
def test_variant_matches_oracle(path, shared_fonts):
    g = _load(path)
    pdf = build_variant(g['variant'])
    r = extract_turn(pdf, shared_fonts, collect_spans=True)

    got = [[pg, repr(x), repr(y), u, cid, repr(w)]
           for (pg, x, y, u, cid, w) in r['spans']]

    if g['corrupt']:
        assert r['decode_ok'] is False
        assert r['text'] == ("".join(g['pages']) if g['pages'] is not None else "")
        # spans drawn before the failure must still match the reference
        assert got == (g['events'] or [])
        return

    assert r['decode_ok'] is True, r['error']
    assert r['pages'] == g['pages']
    assert r['text'] == "".join(g['pages'])

    # Exact parity of every glyph draw: page index, float positions
    # (repr-compared), unicode, cid, width
    assert got == g['events']


def test_all_variants_have_goldens():
    from gen_pdf import VARIANTS
    have = {os.path.basename(p)[:-5] for p in _GOLDENS}
    assert have == set(VARIANTS)


def test_width_stat_cache_purity_across_documents():
    """A preset-FirstChar/LastChar font (V23: clipped A-Z synthesis window,
    avg ≈ 700) must not poison the shared BaseFont-keyed width-stat cache
    used by pure synthesis (full Helvetica window, avg ≈ 510): the same
    TJ -300 kern inserts a space only under the full-window stats.  Both
    orders must give order-independent, golden-equal output (fonts.py:94
    purity condition, mirrored in extract.py's change-font callback)."""
    from gen_pdf import _Builder, _skeleton
    from engine.pdfcore.extract import SharedFontState

    def full_window_doc():
        b = _Builder()
        _skeleton(b, [4])
        b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td [(AB) -300 (CD)] TJ ET")
        b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        return b.build()

    clipped = build_variant('V23')
    full = full_window_doc()

    # isolated expectations
    assert extract_turn(clipped, SharedFontState())['text'] == '\nABCD'
    assert extract_turn(full, SharedFontState())['text'] == '\nAB CD'

    # clipped first: must not write clipped stats into the shared cache
    shared = SharedFontState()
    assert extract_turn(clipped, shared)['text'] == '\nABCD'
    assert extract_turn(full, shared)['text'] == '\nAB CD'

    # full first: clipped doc must not read the full-window cache entry
    shared = SharedFontState()
    assert extract_turn(full, shared)['text'] == '\nAB CD'
    assert extract_turn(clipped, shared)['text'] == '\nABCD'
