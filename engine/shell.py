"""Interactive object-graph shell — parity surface for the reference's
``cmd.Cmd`` CLI (U2, reference __init__.py:831-1218: open/close/cd/ls/pwd/
cat/quit over open PDFs), re-derived over the engine's eager dict/list/Ref
object model instead of the reference's lazy-attribute PDFBase classes.

    python -m engine.shell [file.pdf ...]

Layout navigated (same shape as the reference shell):

    /                          open files
    /<file>                    catalog | objects | xref
    /<file>/catalog            the resolved Catalog dictionary
    /<file>/objects            every object in the xref map (cd <num>)
    /<file>/xref               xref map entries (ls only)
    ... dicts by key, arrays by [index], streams by dict|stream|streamraw

State lives in :class:`ShellState` (scriptable, fully unit-testable);
:class:`PdfShell` is the thin ``cmd.Cmd`` wrapper, mirroring the
reference's PDFCmdState / PDFCmd split.
"""

import cmd
import os
import sys

from engine.pdfcore.cos import Ref, Hexstring, StreamObj
from engine.pdfcore.document import PdfDocument

__all__ = ['ShellState', 'PdfShell', 'ShellError', 'main']


class ShellError(Exception):
    """User-facing command error (bad path, unknown key) — printed as a
    message, never a traceback (reference CmdError)."""


def _fmt_value(v, maxlen=70):
    if isinstance(v, Ref):
        return '%d %d R' % (v.objid, v.generation)
    if isinstance(v, Hexstring):
        return '<%s>' % v.string
    if isinstance(v, StreamObj):
        return 'stream (%d raw chars)' % len(v.raw)
    if isinstance(v, dict):
        return '<<dict: %d keys>>' % len(v)
    if isinstance(v, list):
        return '[array: %d items]' % len(v)
    s = repr(v)
    return s if len(s) <= maxlen else s[:maxlen - 3] + '...'


class ShellState(object):
    """All shell state + command implementations (no I/O loop)."""

    def __init__(self):
        self.files = []      # (fname, abspath, nbytes)
        self.docs = {}       # fname -> PdfDocument
        # stack frames AFTER the file level: (node, label)
        self.stack = []      # [(fname, fname), ('catalog', ...), ...]

    # -- helpers ---------------------------------------------------------

    def _doc(self):
        if not self.stack:
            raise ShellError('not inside a file')
        return self.docs[self.stack[0][1]]

    def _node(self):
        return self.stack[-1][0] if self.stack else None

    def prompt(self):
        return '%s $ ' % (self.stack[-1][1] if self.stack else '/')

    def pwd(self):
        return '/' + '/'.join(label for _, label in self.stack)

    # -- commands --------------------------------------------------------

    def open(self, path):
        path = path.strip()
        if not os.path.exists(path):
            raise ShellError("File '%s' does not exist" % path)
        absf = os.path.abspath(path)
        fname = os.path.basename(absf)
        if fname in self.docs:
            raise ShellError(
                "Cannot open more than one file with the same filename: '%s'"
                % path)
        with open(absf, 'rb') as f:
            payload = f.read().decode('latin-1')
        self.docs[fname] = PdfDocument(payload)
        self.files.append((fname, absf, len(payload)))

    def close(self, name):
        name = name.strip()
        if self.stack and self.stack[0][1] == name:
            self.cd('/')
        for i, f in enumerate(self.files):
            if f[0] == name:
                del self.files[i]
                del self.docs[name]
                return
        raise ShellError("File '%s' not found, cannot close it" % name)

    def cd(self, line):
        line = (line or '').strip()
        if line in ('', '/'):
            self.stack = []
            return
        if line.endswith('/'):
            line = line[:-1]
        for part in line.split('/'):
            self._cd_one(part)

    def _cd_one(self, part):
        if part in ('', '/'):
            self.stack = []
            return
        if part == '.':
            return
        if part == '..':
            if self.stack:
                self.stack.pop()
            return
        if not self.stack:
            if part not in self.docs:
                raise ShellError(
                    "File '%s' not opened, open it first to use it" % part)
            self.stack.append((part, part))
            return
        if len(self.stack) == 1:
            item = part.lower()
            doc = self._doc()
            if item == 'catalog':
                self.stack.append((doc.get_catalog(), 'Catalog'))
            elif item == 'objects':
                self.stack.append(('Objects', 'Objects'))
            elif item == 'xref':
                self.stack.append(('XRef', 'XRef'))
            else:
                raise ShellError("No PDF root level of '%s'" % part)
            return
        node = self._node()
        doc = self._doc()
        if node == 'Objects':
            try:
                num = int(part)
            except ValueError:
                raise ShellError("Object number expected, got '%s'" % part)
            vals = doc.get_object_values(Ref(num, 0))
            v = vals[0] if len(vals) == 1 else list(vals)
            self.stack.append((v, '%d 0 R' % num))
        elif isinstance(node, dict):
            if part not in node:
                raise ShellError("Object does not have property '%s'" % part)
            self.stack.append((doc.resolve(node[part]), part))
        elif isinstance(node, list):
            try:
                idx = int(part.strip('[]'))
            except ValueError:
                raise ShellError("Array index expected, got '%s'" % part)
            if not -len(node) <= idx < len(node):
                raise ShellError('Array index %d out of range' % idx)
            self.stack.append((doc.resolve(node[idx]), '[%d]' % idx))
        elif isinstance(node, StreamObj):
            item = part.lower()
            if item == 'dict':
                self.stack.append((node.dict, 'dict'))
            elif item == 'stream':
                self.stack.append(('Stream', 'stream'))
            elif item == 'streamraw':
                self.stack.append(('StreamRaw', 'streamraw'))
            else:
                raise ShellError("Stream has no property '%s'" % part)
        else:
            raise ShellError("Cannot cd into '%s'" % _fmt_value(node))

    def ls(self):
        if not self.stack:
            lines = ['total %d' % len(self.files)]
            lines += ['%-30s %d bytes' % (f[0], f[2]) for f in self.files]
            return '\n'.join(lines)
        if len(self.stack) == 1:
            return '\n'.join(['Catalog', 'Objects', 'XRef'])
        node = self._node()
        if node == 'Objects':
            doc = self._doc()
            lines = []
            for (num, gen), loc in sorted(doc.objmap.items()):
                kind = 'objstm' if isinstance(loc, tuple) else 'offset'
                lines.append('%5d %5d  %s %s' % (num, gen, kind, loc))
            return '\n'.join(lines)
        if node == 'XRef':
            doc = self._doc()
            return '\n'.join('%5d %5d -> %s' % (num, gen, loc)
                             for (num, gen), loc in sorted(doc.objmap.items()))
        if isinstance(node, dict):
            return '\n'.join('%-20s %s' % (k, _fmt_value(v))
                             for k, v in node.items())
        if isinstance(node, list):
            return '\n'.join('[%d] %s' % (i, _fmt_value(v))
                             for i, v in enumerate(node))
        if isinstance(node, StreamObj):
            return '\n'.join(['dict', 'stream', 'streamraw'])
        return _fmt_value(node)

    def cat(self):
        if len(self.stack) < 2:
            raise ShellError('Nothing to cat at root level')
        node = self._node()
        if node == 'Stream':
            return self.stack[-2][0].stream
        if node == 'StreamRaw':
            return self.stack[-2][0].raw
        if isinstance(node, (dict, list, StreamObj)):
            return _fmt_value(node)
        return str(node)

    def quit(self):
        self.files = []
        self.docs.clear()
        self.stack = []


class PdfShell(cmd.Cmd):
    """cmd.Cmd wrapper: parses lines, delegates to ShellState, prints
    ShellError messages without tracebacks (reference PDFCmd.onecmd)."""

    intro = ("PDF command-line interface. Type 'help' or '?' to get "
             "available commands.")

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.state = ShellState()

    @property
    def prompt(self):
        return self.state.prompt()

    def onecmd(self, line):
        try:
            return cmd.Cmd.onecmd(self, line)
        except SystemExit:
            raise
        except ShellError as e:
            print(e)
        except Exception:
            import traceback
            traceback.print_exc()

    def _show(self, ret):
        if ret:
            print(ret)

    def do_open(self, line):
        """Open a file. Doing so adds it to the root file list."""
        self._show(self.state.open(line))

    def do_close(self, line):
        """Close a file. Doing so removes it from the root file list."""
        self._show(self.state.close(line))

    def do_ls(self, line):
        """List available objects at current location."""
        self._show(self.state.ls())

    def do_cd(self, line):
        """Change directory (catalog/objects/xref, dict keys, [index],
        stream parts; .. and / work as usual)."""
        self._show(self.state.cd(line))

    def do_pwd(self, line):
        """Print current working directory."""
        self._show(self.state.pwd())

    def do_cat(self, line):
        """Print the current node (stream/streamraw contents, leaf values)."""
        self._show(self.state.cat())

    def do_quit(self, line):
        """Quit the command-line interface."""
        self.state.quit()
        return True

    def do_EOF(self, line):
        """Quit the command-line interface (ctrl-d)."""
        print('')
        return self.do_quit(line)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    shell = PdfShell()
    for path in argv:
        shell.onecmd('open %s' % path)
    shell.cmdloop()
    return 0


if __name__ == '__main__':
    sys.exit(main())
