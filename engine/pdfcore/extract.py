"""Per-turn extraction: page rendering driver and full-text assembly.

Re-derivation of the reference's RenderPages/RenderPage/_RenderPage_Tokens
dispatch loop and the GetFullText callback assembler (pypdfproc/__init__.py:
273-620; SURVEY.md I1-I3, T1-T2, U1) plus the literal/hex splitters
(__init__.py:648-740; I10).

The assembler defines BYTE-EXACT per-turn text equality with the reference:

* a newline is emitted whenever a drawn glyph's y differs from the previous
  glyph's y — including before the first glyph of the document (y starts at
  −1.0), and the remembered y carries ACROSS pages;
* an implied space is emitted for a TJ numeric kern when |w| exceeds 50% of
  the current font's average nonzero width;
* page text is joined at 'page end'; a page that raises mid-render leaves
  its partial chars in the buffer, which then leak into the NEXT page's
  string (cloned reference behavior — the buffer is only cleared at 'page
  end').

``extract_turn`` is the engine's per-row kernel: it never raises; failures
are reported in the result dict (decode_ok=False + error).
"""

import os
import traceback

from .cos import PdfError, Ref, Hexstring
from .document import PdfDocument, ResourceView
from .content import Mat, StateStack, tokenize_content
from .fonts import FontCache, get_font_widths
from . import afm as _afm
from . import encodings as _enc

__all__ = ['SharedFontState', 'Renderer', 'extract_turn',
           'split_literal', 'split_hex', 'get_token_string']

# NB: the reference defines an RI_MAP (state.py:36-40, misspelling
# 'Perceptual' as 'Perception') behind a validated property that its own
# 'ri' dispatch never reaches (stray-attribute bug) — so no equivalent
# table exists here; see the 'ri' branch below.


class SharedFontState(object):
    """Corpus-invariant read-only state, loaded ONCE per worker process:
    the 14 standard-font AFM metrics, the encoding maps, and the glyph-name
    map (SURVEY.md S3/F10/F11 → actor-member state).

    In the Ray pipeline this object is built in the actor's ``__init__``
    and shared across every batch the actor processes.
    """

    def __init__(self, afm_zip_path=None):
        if afm_zip_path is None:
            afm_zip_path = os.path.join(_enc.DATA_DIR, 'StandardFonts_AFM.zip')
        self.std_fonts = _afm.load_afm_zip(afm_zip_path)
        # Force-load the JSON tables now (not lazily per batch)
        _enc.encoding_map('Std')
        # Cross-turn cache of (avg, min, max) width stats for fonts whose
        # widths are AFM-synthesized — those depend only on BaseFont, and
        # transcripts repeat fonts heavily (SURVEY.md §3.5 actor-state LRU).
        self.afm_width_stats = {}

    def std_font(self, name):
        if name not in self.std_fonts:
            raise KeyError("Font '%s' has not been loaded yet" % name)
        return self.std_fonts[name]


# ---------------------------------------------------------------------------
# String splitters (reference __init__.py:648-740; I10)

def split_literal(lit):
    """Split a literal string into chars, handling escapes byte-exactly.

    Cloned quirks: the escaped-paren branch references an undefined name in
    the reference (``lis`` typo, __init__.py:697) — reachable via ``\\\\(``
    sequences — and raises accordingly; octal escapes take 1-3 digits; an
    escape at end-of-string raises IndexError."""
    ret = []
    imax = len(lit)
    i = 0
    while i < imax:
        c = lit[i]
        if c == '\\':
            nxt = lit[i + 1]
            if nxt == '\\':
                ret.append(c)
                i += 2
            elif nxt in ('\n', '\r', '\t', '\b', '\f'):
                ret.append(nxt)
                i += 2
            elif nxt == 'n':
                ret.append('\n')
                i += 2
            elif nxt == 'r':
                ret.append('\r')
                i += 2
            elif nxt == 't':
                ret.append('\t')
                i += 2
            elif nxt == 'b':
                ret.append('\b')
                i += 2
            elif nxt == 'f':
                ret.append('\f')
                i += 2
            elif nxt in ('(', ')'):
                # reference: ``ret.append(lis[i+1])`` — NameError
                raise PdfError("name 'lis' is not defined (cloned reference typo)")
            elif nxt.isdigit() and lit[i + 2].isdigit() and lit[i + 3].isdigit():
                ret.append(chr(int(lit[i + 1:i + 4], 8)))
                i += 4
            elif nxt.isdigit() and lit[i + 2].isdigit():
                ret.append(chr(int('0' + lit[i + 1:i + 3], 8)))
                i += 3
            elif nxt.isdigit():
                ret.append(chr(int('00' + nxt, 8)))
                i += 2
            else:
                raise PdfError("Unable to handle literal at index %d" % i)
        else:
            ret.append(c)
            i += 1
    return ret


def split_hex(txt, bytesize):
    """Split a hex string into chars of ``bytesize`` bytes (reference
    SplitHex): odd length grows a trailing '0'; length must then divide
    evenly."""
    if bytesize is None:
        raise PdfError("Byte size not provided, cannot split hex string")
    if len(txt) % 2 == 1:
        txt += '0'
    if len(txt) % (bytesize * 2) != 0:
        raise PdfError("Cannot split hex string (len=%d) into %d-byte chars"
                       % (len(txt), bytesize))
    step = bytesize * 2
    return [chr(int(txt[i:i + step], 16)) for i in range(0, len(txt), step)]


def get_token_string(tok, bytesize=None):
    if tok.type == 'LIT':
        return split_literal(tok.value)
    elif tok.type == 'HEXSTRING':
        return split_hex(tok.value, bytesize)
    raise PdfError("Unrecognized Tj token type: %s" % tok.type)


# ---------------------------------------------------------------------------
# Renderer (reference PDF.RenderPages / RenderPage / _RenderPage_Tokens)

class Renderer(object):
    def __init__(self, doc, shared):
        self.doc = doc
        self.shared = shared
        self.fonts = FontCache(doc, shared)
        self.resources = []     # resource stack (page, then XObjects)

    # -- resource-stack font lookup (reference PDF.GetFont, :128-158) ----

    def get_font(self, fontname):
        for recs in self.resources:
            if not isinstance(recs, ResourceView):
                # reference: attribute error on raw Dictionary / None
                raise PdfError("resource stack entry has no Font attribute")
            fdict = recs.Font
            if fdict is None:
                continue
            if fontname not in fdict:
                raise PdfError("Unrecognize font name (%s)" % (fontname,))
            f = fdict[fontname]
            if isinstance(f, Ref):
                f = self.doc.get_font(f)
            return f
        raise PdfError("Unable to find font '%s'" % (fontname,))

    def get_glyph(self, fontname, cid):
        f = self.get_font(fontname)
        return self.fonts.get_glyph(f, cid)

    def get_graphics_state(self, page, gsname):
        recs = self.doc.page_resources(page)
        eg = recs.ExtGState
        if eg is None or gsname not in eg:
            raise PdfError("Unrecognize external graphics state name (%s)" % gsname)
        g = eg[gsname]
        if isinstance(g, Ref):
            g = self.doc.get_graphics_state(g)
        return g

    # -- page drivers -----------------------------------------------------

    def render_pages(self, callback):
        pages = self.doc.dfs_pages()
        callback(None, 'render pages start', None)
        for page in pages:
            try:
                self.render_page(page, callback)
            except Exception as e:
                ret = callback(None, 'page exception', None, e)
                if ret:
                    raise
        callback(None, 'render pages end', None)

    def render_page(self, page, callback):
        ct = self.doc.page_content_text(page)
        self.resources.append(self.doc.page_resources(page))
        s = StateStack()
        callback(s, 'page start', page)
        toks = tokenize_content(ct)['tokens']
        self._render_tokens(page, callback, toks, s)
        callback(s, 'page end', page)
        self.resources.pop()

    def _render_tokens(self, page, callback, toks, s):
        """The dispatch loop (reference __init__.py:344-543; I2)."""
        for tok in toks:
            tt = tok.type
            if tt == 'q':
                s.push()
            elif tt == 'Q':
                s.pop()

            elif tt == 'i':
                s.S.flatness = bool(tok.value[0].value)
            elif tt == 'd':
                s.S.dashpattern = (tok.value[0], tok.value[1])
            elif tt == 'j':
                s.S.linejoin = tok.value[0].value
            elif tt == 'J':
                s.S.linecap = tok.value[0].value
            elif tt == 'M':
                s.S.miterlimit = tok.value[0].value
            elif tt == 'ri':
                # stray-attribute assignment, UNVALIDATED (cloned quirk:
                # reference `s.S.ri = ...` never hits its renderingintent
                # property, so the RI_MAP validation is dead code)
                s.S.ri = tok.value[0].value
            elif tt == 'w':
                s.S.linewidth = tok.value[0].value
            elif tt == 'gs':
                self._apply_gs(page, s, tok.value[0].value)

            elif tt == 'm':
                s.S.do_m(*[v.value for v in tok.value])
            elif tt == 'h':
                s.S.do_h()
            elif tt == 'l':
                s.S.do_l(*[v.value for v in tok.value])
            elif tt == 'c':
                s.S.do_c(*[v.value for v in tok.value])
            elif tt == 'v':
                s.S.do_v(*[v.value for v in tok.value])
            elif tt == 'y':
                s.S.do_y(*[v.value for v in tok.value])
            elif tt in ('Fstar', 'fstar', 'F', 'f', 'B', 'b', 'Bstar', 'bstar'):
                pass
            elif tt == 'S':
                s.S.do_S()
                callback(s, 'stroke', page, tt)
            elif tt == 's':
                s.S.do_s()
                callback(s, 'stroke', page, tt)
            elif tt == 'n':
                s.S.do_n()
            elif tt == 're':
                s.S.do_re(*[v.value for v in tok.value])
            elif tt in ('W', 'Wstar'):
                pass

            elif tt == 'Do':
                recs = self.doc.page_resources(page)
                xdict = recs.XObject
                x = xdict[tok.value[0].value]
                if isinstance(x, Ref):
                    x = self.doc.get_xobject(x)
                self.resources.append(x.Resources)
                x_toks = tokenize_content(x.Stream)['tokens']
                self._render_tokens(page, callback, x_toks, s)
                self.resources.pop()

            elif tt == 'cs':
                s.S.colorspace = (s.S.colorspace[0], tok.value[0].value)
            elif tt == 'CS':
                s.S.colorspace = (tok.value[0].value, s.S.colorspace[1])
            elif tt == 'sc':
                s.S.color = (s.S.color[0], tok.value[0].value)
            elif tt == 'SC':
                s.S.color = (tok.value[0].value, s.S.color[1])
            elif tt == 'scn':
                s.S.color = (s.S.color[0], tok.value[0].value)
            elif tt == 'SCN':
                s.S.color = (tok.value[0].value, s.S.color[1])
            elif tt == 'G':
                s.S.do_G(tok.value[0].value)
            elif tt == 'g':
                s.S.do_g(tok.value[0].value)
            elif tt == 'RG':
                s.S.do_RG(*[t.value for t in tok.value])
            elif tt == 'rg':
                s.S.do_rg(*[t.value for t in tok.value])
            elif tt == 'K':
                s.S.do_K(*[t.value for t in tok.value])
            elif tt == 'k':
                s.S.do_k(*[t.value for t in tok.value])

            elif tt == 'cm':
                s.S.cm = Mat(*[v.value for v in tok.value])

            elif tt == 'BT':
                s.T.text_begin()
            elif tt == 'ET':
                s.T.text_end()

            elif tt == 'Tc':
                s.T.set_Tc(tok.value[0].value)
            elif tt == 'Tf':
                s.T.Tf = tok.value[0].value
                s.T.set_Tfs(tok.value[1].value)
                callback(s, 'change font', page, s.T.Tf, s.T.Tfs)
            elif tt in ('Tj', 'TJ'):
                callback(s, 'text start', page)
                for subtok in tok.value:
                    if subtok.type in ('INT', 'FLOAT'):
                        s.T.do_Tj(subtok.value, None)
                        callback(s, 'space draw', page, subtok.value)
                    else:
                        if subtok.type == 'HEXSTRING':
                            f = self.get_font(s.T.Tf)
                            if type(f.Encoding) == str:
                                if f.Encoding.startswith('Identity'):
                                    txt = get_token_string(subtok, bytesize=2)
                                else:
                                    raise NotImplementedError(
                                        "Unknown encoding for HEXSTRING: '%s'" % f.Encoding)
                            else:
                                raise NotImplementedError(
                                    "Unknown encoding for HEXSTRING: '%s'" % f.Encoding)
                        else:
                            txt = get_token_string(subtok)

                        callback(s, 'text', page, txt)
                        for t in txt:
                            g = self.get_glyph(s.T.Tf, ord(t))
                            # position BEFORE advancing Tm; NB Tr-as-rise
                            # cloned from reference __init__.py:521.  Only
                            # (E, F) of Mat(Tfs*Tz,0,0,Tfs,0,Tr)*Tm*cm are
                            # consumed — computed scalar-only below with the
                            # reference multiply's exact per-term order
                            # (bit-identical, no Mat allocations per glyph).
                            T = s.T
                            Tm = T._Tm
                            cm = s.S.cm
                            trf = float(T.Tr)
                            m1e = 0.0 * Tm.A + trf * Tm.C + 1.0 * Tm.E
                            m1f = 0.0 * Tm.B + trf * Tm.D + 1.0 * Tm.F
                            m1i = 0.0 * Tm.G + trf * Tm.H + 1.0 * Tm.I
                            x = m1e * cm.A + m1f * cm.C + m1i * cm.E
                            y = m1e * cm.B + m1f * cm.D + m1i * cm.F
                            callback(s, 'glyph draw', page, (x, y), g)
                            s.T.do_Tj(None, g)
                callback(s, 'text end', page)

            elif tt == 'TL':
                s.T.set_TL(tok.value[0].value)
            elif tt == 'Tm':
                s.T.Tm = Mat(*[v.value for v in tok.value])
            elif tt == 'Tr':
                s.T.set_Tr(tok.value[0].value)
            elif tt == 'Ts':
                s.T.set_Ts(tok.value[0].value)
            elif tt == 'Tw':
                s.T.set_Tw(tok.value[0].value)
            elif tt == 'Tz':
                s.T.set_Tz(tok.value[0].value)
            elif tt == 'Td':
                s.T.do_Td(tok.value[0].value, tok.value[1].value)
            elif tt == 'TD':
                s.T.do_TD(tok.value[0].value, tok.value[1].value)
            elif tt == 'Tstar':
                s.T.do_Tstar()
            elif tt in ('BDC', 'EMC'):
                pass

            else:
                raise PdfError("Cannot render '%s' token yet" % tt)

    def _apply_gs(self, page, s, gsname):
        """ExtGState application in Table-4.8 order with the reference's
        NotImplementedError surface (reference __init__.py:373-413)."""
        gs = self.get_graphics_state(page, gsname)
        if gs.LW is not None:
            s.S.linewidth = gs.LW
        if gs.LC is not None:
            s.S.linecap = gs.LC
        if gs.LJ is not None:
            s.S.linejoin = gs.LJ
        if gs.ML is not None:
            s.S.miterlimit = gs.ML
        if gs.D is not None:
            raise NotImplementedError("Graphics state setting dash pattern not implemented yet")
        if gs.RI is not None:
            s.S.ri = gs.RI   # stray-attribute clone, unvalidated (see 'ri' op)

        if gs.OP is not None and gs.op is not None:
            s.S.overprint = (bool(gs.OP), bool(gs.op))
        elif gs.OP is not None:
            s.S.overprint = (bool(gs.OP), bool(gs.OP))
        elif gs.op is not None:
            s.S.overprint = (s.S.overprint[0], bool(gs.op))

        if gs.OPM is not None:
            s.S.overprintmode = bool(gs.OPM)
        if gs.Font is not None:
            s.T.Tf = gs.Font[0]
            s.T.set_Tfs(gs.Font[1])

        for key in ('BG', 'BG2', 'UCR', 'UCR2', 'TR', 'HT'):
            if getattr(gs, key) is not None:
                raise NotImplementedError(
                    "Graphics state setting (%s) not implemented yet" % key)
        if gs.FL is not None:
            s.S.flatness = gs.FL
        if gs.SM is not None:
            s.S.smoothness = gs.SM
        if gs.SA is not None:
            s.S.strokeadjustment = gs.SA
        if gs.BM is not None:
            s.S.blendmode = gs.BM
        if gs.SMask is not None:
            raise NotImplementedError("Graphics state setting (SMask) soft mask not implemented yet")
        if gs.CA is not None:
            s.S.alphaconstant = (gs.CA, s.S.alphaconstant[1])
        if gs.ca is not None:
            s.S.alphaconstant = (s.S.alphaconstant[0], gs.ca)
        if gs.AIS is not None:
            s.S.alphasource = gs.AIS
        if gs.TK is not None:
            raise NotImplementedError("Graphics state setting (TK) text knockout flag not implemented yet")


# ---------------------------------------------------------------------------
# Full-text assembly (reference GetFullText, __init__.py:548-620; T2)

def get_full_text(doc, shared, collect_spans=False):
    """Render all pages → (pages, n_spans, page_errors, spans).

    ``pages``: one string per successfully completed page (byte-equal to
    the reference's GetFullText return).
    """
    rend = Renderer(doc, shared)
    fulltxt = []
    txt = []
    state = {'y': -1.0, 'widths': None}
    n_spans = [0]
    page_errors = []
    spans = [] if collect_spans else None
    page_no = [0]
    stats_by_font = {}   # per-turn: font oid key -> width-stats dict

    def cb(s, action, page, *args):
        if action == 'page exception':
            page_errors.append("%s: %s" % (type(args[0]).__name__, args[0]))
            return False
        elif action == 'change font':
            Tf = args[0]
            f = rend.get_font(Tf)
            okey = f.oid.key()
            cached = stats_by_font.get(okey)
            if cached is not None:
                state['widths'] = cached
                return
            # AFM-synthesized widths depend only on BaseFont → shared cache.
            # Purity requires the SAME condition get_font_widths uses
            # (fonts.py:94): a preset FirstChar/LastChar clips the synthesized
            # window, so such fonts must not populate / read the shared cache
            # (cross-document contamination of state['widths']['avg']).
            synth = (f.Widths is None and f.Subtype in ('TrueType', 'Type1')
                     and f.FirstChar is None and f.LastChar is None)
            if synth:
                cached = shared.afm_width_stats.get(f.BaseFont)
                if cached is not None:
                    get_font_widths(shared, f)   # still synthesize f.Widths
                    stats_by_font[okey] = cached
                    state['widths'] = cached
                    return
            w = get_font_widths(shared, f)
            if type(w) == dict:
                w = [v[0] for v in list(w.values()) if v[0] != 0]
                st = {'avg': sum(w) / float(len(w)), 'min': min(w), 'max': max(w)}
            elif type(w) == list:
                w = [v for v in w if v != 0]
                st = {'avg': sum(w) / float(len(w)), 'min': min(w), 'max': max(w)}
            else:
                raise PdfError("Unrecognized widths object type: '%s'" % str(w))
            stats_by_font[okey] = st
            if synth:
                shared.afm_width_stats[f.BaseFont] = st
            state['widths'] = st
        elif action == 'glyph draw':
            x, y = args[0]
            g = args[1]
            if state['y'] != y:
                txt.append('\n')
                state['y'] = y
            txt.append(g.unicode)
            n_spans[0] += 1
            if spans is not None:
                spans.append((page_no[0], x, y, g.unicode, g.cid, g.width))
        elif action == 'space draw':
            w = args[0]
            if abs(w) > 0.5 * state['widths']['avg']:
                txt.append(' ')
        elif action == 'page end':
            fulltxt.append("".join(txt))
            txt.clear()
            page_no[0] += 1
        else:
            pass

    rend.render_pages(cb)
    return fulltxt, n_spans[0], page_errors, spans


def extract_turn(payload, shared, collect_spans=False):
    """Per-row extraction kernel.  Never raises.

    Returns dict: text (''.join(pages)), pages, n_spans, n_pages,
    decode_ok, error, spans (optional).
    """
    try:
        doc = PdfDocument(payload)
        pages, n_spans, page_errors, spans = get_full_text(doc, shared, collect_spans)
        return {
            'text': "".join(pages),
            'pages': pages,
            'n_spans': n_spans,
            'n_pages': len(pages),
            'decode_ok': not page_errors,
            'error': "; ".join(page_errors),
            'spans': spans,
        }
    except Exception as e:
        return {
            'text': "",
            'pages': [],
            'n_spans': 0,
            'n_pages': 0,
            'decode_ok': False,
            'error': "%s: %s" % (type(e).__name__, e),
            'spans': [] if collect_spans else None,
        }
