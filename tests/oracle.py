"""Run the unmodified reference library in-process as the golden oracle.

The reference needs ``ply``; the vendored test-only shim in
``tests/_vendor`` provides the subset it uses (SURVEY.md §5.2).
"""

import io
import os
import sys
import contextlib
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_VENDOR = os.path.join(_HERE, '_vendor')
_REFERENCE = os.environ.get('PYPDFPROC_REFERENCE', '/root/reference')


def _ensure_paths():
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)


def oracle_available():
    return os.path.isdir(os.path.join(_REFERENCE, 'pypdfproc'))


def oracle_fulltext(pdf_bytes):
    """Return {'pages': [...], 'error': str|None} from the reference.

    ``error`` is set when PDF() construction or GetFullText raises
    (document-level failure); page-level exceptions are swallowed by the
    reference's own callback (printed tracebacks suppressed here).
    """
    _ensure_paths()
    import pypdfproc

    fd, path = tempfile.mkstemp(suffix='.pdf')
    try:
        with os.fdopen(fd, 'wb') as f:
            f.write(pdf_bytes)
        sink = io.StringIO()
        try:
            with contextlib.redirect_stderr(sink), contextlib.redirect_stdout(sink):
                p = pypdfproc.PDF(path)
                pages = p.GetFullText()
                p.Close()
            return {'pages': pages, 'error': None,
                    'had_page_exception': 'Traceback' in sink.getvalue()}
        except Exception as e:
            return {'pages': None, 'error': "%s: %s" % (type(e).__name__, e),
                    'had_page_exception': False}
    finally:
        os.unlink(path)
