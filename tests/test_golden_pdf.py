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

    if g['corrupt']:
        assert r['decode_ok'] is False
        assert r['text'] == ("".join(g['pages']) if g['pages'] is not None else "")
        return

    assert r['decode_ok'] is True, r['error']
    assert r['pages'] == g['pages']
    assert r['text'] == "".join(g['pages'])

    # Exact float parity of glyph positions (repr-compared)
    got = [[repr(x), repr(y), u] for (_pg, x, y, u, _cid, _w) in r['spans']]
    assert got == g['events']


def test_all_variants_have_goldens():
    from gen_pdf import VARIANTS
    have = {os.path.basename(p)[:-5] for p in _GOLDENS}
    assert have == set(VARIANTS)
