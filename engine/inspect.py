"""Non-interactive object-graph inspector — the engine's equivalent of the
reference's ``cmd.Cmd`` shell (U2: open/ls/cd/pwd/cat over the COS graph,
reference __init__.py:831-1218), reshaped for scripting:

    python -m engine.inspect file.pdf                 # header + trailer + root
    python -m engine.inspect file.pdf --ls            # objects in the xref map
    python -m engine.inspect file.pdf --cat 5         # one object, resolved
    python -m engine.inspect file.pdf --pages         # page tree (DFS order)
    python -m engine.inspect file.pdf --text          # extracted page text

Pure pdfcore (no Ray): works on any single PDF payload, e.g. one turn's
``text`` column dumped from the transcripts table.
"""

import argparse
import sys

from engine.pdfcore.cos import Ref, Hexstring
from engine.pdfcore.document import PdfDocument
from engine.pdfcore.extract import SharedFontState, extract_turn


def _fmt(doc, v, depth=0, max_depth=3):
    if isinstance(v, Ref):
        return '%d %d R' % (v.objid, v.generation)
    if isinstance(v, Hexstring):
        return '<%s>' % v.string
    if isinstance(v, dict):
        if depth >= max_depth:
            return '<<...>>'
        inner = ' '.join('/%s %s' % (k, _fmt(doc, x, depth + 1, max_depth))
                         for k, x in v.items())
        return '<< %s >>' % inner
    if isinstance(v, list):
        if depth >= max_depth:
            return '[...]'
        return '[' + ' '.join(_fmt(doc, x, depth + 1, max_depth) for x in v) + ']'
    if isinstance(v, str) and len(v) > 60:
        return repr(v[:57] + '...')
    return repr(v)


def main(argv=None):
    ap = argparse.ArgumentParser(description='PDF object-graph inspector')
    ap.add_argument('file')
    ap.add_argument('--ls', action='store_true', help='list xref map entries')
    ap.add_argument('--cat', type=int, metavar='OBJNUM', help='print one object')
    ap.add_argument('--pages', action='store_true', help='page tree in DFS order')
    ap.add_argument('--text', action='store_true', help='extract page text')
    args = ap.parse_args(argv)

    with open(args.file, 'rb') as f:
        payload = f.read().decode('latin-1')

    if args.text:
        r = extract_turn(payload, SharedFontState())
        for i, pg in enumerate(r['pages']):
            print('--- page %d ---' % (i + 1))
            print(pg)
        if r['error']:
            print('error: %s' % r['error'], file=sys.stderr)
        return 0 if r['decode_ok'] else 1

    doc = PdfDocument(payload)
    if args.cat is not None:
        ref = Ref(args.cat, 0)
        print(_fmt(doc, doc.get_object_values(ref), max_depth=6))
        return 0
    if args.ls:
        for (num, gen), loc in sorted(doc.objmap.items()):
            kind = 'objstm' if isinstance(loc, tuple) else 'offset'
            print('%5d %5d  %s %s' % (num, gen, kind, loc))
        return 0
    if args.pages:
        for i, page in enumerate(doc.dfs_pages()):
            print('page %d: %s' % (i + 1, _fmt(doc, page, max_depth=2)))
        return 0

    print('header version: %s' % doc.version)
    print('root: %s' % _fmt(doc, doc.find_root_ref()))
    print('objects: %d' % len(doc.objmap))
    print('pages: %d' % len(doc.dfs_pages()))
    return 0


if __name__ == '__main__':
    sys.exit(main())
