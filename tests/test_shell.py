"""Interactive shell (U2 parity surface): drive ShellState/PdfShell over a
generated fixture — open/cd/ls/pwd/cat navigation of the COS graph, error
envelope as messages (reference __init__.py:831-1218)."""

import io
import os
import sys
import contextlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gen_pdf import v01
from engine.shell import ShellState, PdfShell, ShellError


@pytest.fixture()
def pdf_file(tmp_path):
    p = tmp_path / 'v01.pdf'
    p.write_bytes(v01())
    return str(p)


def test_shell_navigation(pdf_file):
    s = ShellState()
    assert s.pwd() == '/'
    s.open(pdf_file)
    assert 'v01.pdf' in s.ls()
    s.cd('v01.pdf')
    assert s.ls().splitlines() == ['Catalog', 'Objects', 'XRef']
    s.cd('catalog')
    assert s.pwd() == '/v01.pdf/Catalog'
    assert 'Pages' in s.ls()
    s.cd('Pages/Kids/[0]')          # multi-segment cd, Ref auto-resolve
    assert 'Contents' in s.ls()
    s.cd('Contents')
    assert s.ls().splitlines() == ['dict', 'stream', 'streamraw']
    s.cd('stream')
    assert 'Hello World' in s.cat()
    s.cd('..')
    s.cd('streamraw')
    assert 'Hello World' in s.cat()   # v01 stream is uncompressed
    s.cd('/')
    assert s.pwd() == '/'
    s.cd('v01.pdf/objects')
    assert len(s.ls().splitlines()) == 5   # objects 1..5
    s.cd('5')
    assert 'Helvetica' in s.ls()


def test_shell_errors(pdf_file):
    s = ShellState()
    with pytest.raises(ShellError):
        s.open('/nonexistent.pdf')
    s.open(pdf_file)
    with pytest.raises(ShellError):
        s.open(pdf_file)              # duplicate filename
    with pytest.raises(ShellError):
        s.cd('other.pdf')
    s.cd('v01.pdf')
    with pytest.raises(ShellError):
        s.cd('nonsense')
    with pytest.raises(ShellError):
        s.cat()                        # nothing to cat at file root
    s.cd('catalog')
    with pytest.raises(ShellError):
        s.cd('NoSuchKey')
    s.close('v01.pdf')                 # close while inside → cd / first
    assert s.pwd() == '/'
    with pytest.raises(ShellError):
        s.close('v01.pdf')


def test_cmd_wrapper_prints_not_raises(pdf_file):
    sh = PdfShell()
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        sh.onecmd('open %s' % pdf_file)
        sh.onecmd('cd v01.pdf')
        sh.onecmd('ls')
        sh.onecmd('cd bogus')          # ShellError → printed message
        sh.onecmd('pwd')
        assert sh.onecmd('quit') is True
    text = out.getvalue()
    assert 'Catalog' in text
    assert "No PDF root level of 'bogus'" in text
    assert '/v01.pdf' in text
