"""Property-based conformance (SURVEY.md §5.3 level 3): random
content-stream programs from the implemented operator grammar must extract
byte-identically in the engine and the reference oracle.

The grammar stays inside the envelope both implementations support
(Type1 standard fonts, balanced q/Q and BT/ET, escape-free literals);
numbers are drawn from a small decimal grid so serialized text round-trips
identically through both lexers.
"""

import string

import pytest
from hypothesis import given, settings, strategies as st

import oracle
from gen_pdf import _Builder, _skeleton, _HELV, _TIMES
from engine.pdfcore.extract import SharedFontState, extract_turn

pytestmark = pytest.mark.skipif(not oracle.oracle_available(),
                                reason='reference oracle not present')

_SHARED = SharedFontState()

_num = st.integers(min_value=-800, max_value=800).map(lambda n: n / 4.0)
_text = st.text(alphabet=string.ascii_letters + string.digits + ' ',
                min_size=0, max_size=12)


def _fmt(x):
    return (b'%d' % int(x)) if float(x).is_integer() else (b'%.2f' % x)


_op = st.one_of(
    st.tuples(st.just('Td'), _num, _num),
    st.tuples(st.just('TD'), _num, _num.filter(lambda v: v != 0)),
    st.tuples(st.just('T*')),
    st.tuples(st.just('TL'), _num),
    st.tuples(st.just('Tc'), _num),
    st.tuples(st.just('Tw'), _num),
    st.tuples(st.just('Tz'), st.integers(min_value=25, max_value=400)),
    st.tuples(st.just('Tm'), _num, _num, _num, _num, _num, _num),
    st.tuples(st.just('Tj'), _text),
    st.tuples(st.just('TJ'), st.lists(st.one_of(_text, _num), min_size=1, max_size=5)),
    st.tuples(st.just('Tf'), st.sampled_from(['/F1', '/F2']),
              st.integers(min_value=6, max_value=24)),
)


def _render_op(op):
    kind = op[0]
    if kind == 'Td':
        return b'%s %s Td' % (_fmt(op[1]), _fmt(op[2]))
    if kind == 'TD':
        return b'%s %s TD' % (_fmt(op[1]), _fmt(op[2]))
    if kind == 'T*':
        return b'T*'
    if kind in ('TL', 'Tc', 'Tw'):
        return b'%s %s' % (_fmt(op[1]), kind.encode())
    if kind == 'Tz':
        return b'%d Tz' % op[1]
    if kind == 'Tm':
        return b' '.join(_fmt(v) for v in op[1:]) + b' Tm'
    if kind == 'Tj':
        return b'(%s) Tj' % op[1].encode()
    if kind == 'TJ':
        parts = []
        for item in op[1]:
            if isinstance(item, str):
                parts.append(b'(%s)' % item.encode())
            else:
                parts.append(_fmt(item))
        return b'[' + b' '.join(parts) + b'] TJ'
    if kind == 'Tf':
        return b'%s %d Tf' % (op[1].encode(), op[2])
    raise AssertionError(kind)


def _build_pdf(ops_groups, cm):
    prog = bytearray()
    prog += b'q %s %s %s %s %s %s cm ' % tuple(_fmt(v) for v in cm)
    for group in ops_groups:
        prog += b'BT /F1 12 Tf '
        for op in group:
            prog += _render_op(op) + b' '
        prog += b'ET '
    prog += b'Q'
    b = _Builder()
    _skeleton(b, [4], resources=b'<< /Font << /F1 5 0 R /F2 6 0 R >> >>')
    b.add_stream(4, b'', bytes(prog))
    b.add(5, _HELV)
    b.add(6, _TIMES)
    return b.build()


@settings(max_examples=30, deadline=None)
@given(
    ops_groups=st.lists(st.lists(_op, min_size=0, max_size=8), min_size=1, max_size=3),
    cm=st.tuples(st.sampled_from([0.5, 1.0, 2.0]), st.just(0.0), st.just(0.0),
                 st.sampled_from([0.5, 1.0, 2.0]), _num, _num),
)
def test_random_program_matches_oracle(ops_groups, cm):
    pdf = _build_pdf(ops_groups, cm)
    got = extract_turn(pdf.decode('latin-1'), _SHARED)
    want = oracle.oracle_fulltext(pdf)
    assert want['error'] is None, want['error']
    assert got['decode_ok'], got['error']
    assert got['pages'] == want['pages']
