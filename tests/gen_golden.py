"""Generate committed golden fixtures from the reference oracle.

Usage: python tests/gen_golden.py

Writes tests/golden/pdf_text/{variant}.json with:
  {variant, corrupt, pages|null, error|null,
   events: [[page, x, y, unicode, cid, width], ...]}

``events`` are the oracle's 'glyph draw' callbacks with exact float reprs
(x, y, width) — a float-determinism check stronger than text equality
(SURVEY.md §7.3).  ``page`` is the 0-based index of completed pages at
draw time (incremented at the reference's 'page end' callback), matching
the engine's span page numbering (extract.py).
"""

import io
import os
import json
import sys
import contextlib
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, '_vendor'))
sys.path.insert(0, os.environ.get('PYPDFPROC_REFERENCE', '/root/reference'))

from gen_pdf import VARIANTS, CORRUPT, build_variant  # noqa: E402


def oracle_run(pdf_bytes):
    import pypdfproc

    fd, path = tempfile.mkstemp(suffix='.pdf')
    events = []
    try:
        with os.fdopen(fd, 'wb') as f:
            f.write(pdf_bytes)
        sink = io.StringIO()
        try:
            with contextlib.redirect_stderr(sink), contextlib.redirect_stdout(sink):
                p = pypdfproc.PDF(path)
                pages = p.GetFullText()
                p.Close()

                # Second pass: capture 'glyph draw' events with exact floats.

                p2 = pypdfproc.PDF(path)
                page_no = [0]
                def cb2(s, action, page, *args):
                    if action == 'glyph draw':
                        (x, y), g = args[0], args[1]
                        events.append([page_no[0], repr(x), repr(y),
                                       g.unicode, g.cid, repr(g.width)])
                    elif action == 'page end':
                        page_no[0] += 1
                    elif action == 'change font':
                        # side effect GetFullText relies on: width synthesis
                        p2.GetFontWidths(p2.GetFont(page, args[0]))
                    elif action == 'page exception':
                        return False
                p2.RenderPages(cb2)
                p2.Close()
            return {'pages': pages, 'error': None, 'events': events,
                    'had_page_exception': 'Traceback' in sink.getvalue()}
        except Exception as e:
            return {'pages': None, 'error': "%s: %s" % (type(e).__name__, e),
                    'events': None, 'had_page_exception': False}
    finally:
        os.unlink(path)


def main():
    outdir = os.path.join(_HERE, 'golden', 'pdf_text')
    os.makedirs(outdir, exist_ok=True)
    for vid in sorted(VARIANTS):
        pdf = build_variant(vid)
        o = oracle_run(pdf)
        corrupt = vid in CORRUPT
        if not corrupt:
            assert o['pages'] is not None, "variant %s failed in oracle: %s" % (vid, o['error'])
            assert not o['had_page_exception'], "variant %s raised a page exception in oracle" % vid
        rec = {
            'variant': vid,
            'corrupt': corrupt,
            'pages': o['pages'],
            'error': o['error'],
            'events': o['events'],
        }
        with open(os.path.join(outdir, vid + '.json'), 'w') as f:
            json.dump(rec, f, ensure_ascii=True)
        print(vid, 'pages=%s' % (len(o['pages']) if o['pages'] is not None else None),
              'events=%s' % (len(o['events']) if o['events'] else 0))


if __name__ == '__main__':
    main()
