"""Pure-Python PDF extraction semantics (no Ray dependencies).

This package re-derives, from scratch, the observable behavior of the
reference implementation (cmlburnett/pypdfproc) documented operator-by-
operator in SURVEY.md §2. Behavioral parity — including documented quirks —
is validated against the reference running as an in-process oracle in
``tests/`` (golden fixtures; see SURVEY.md §5).
"""

from .extract import SharedFontState, extract_turn  # noqa: F401
