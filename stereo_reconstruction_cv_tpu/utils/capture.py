"""Stdout capture utility — the reference's RedirectText analog (gui.py:10-24).

The reference redirects sys.stdout into a Tk widget + StringIO to surface
algorithm prints. Headless equivalent: a context manager that tees stdout
into a buffer (and still forwards to the terminal), so API consumers can
collect stage logs programmatically. Unlike the reference, the restore is
exception-safe (gui.py:562-567 leaks the redirect on its early-return path
— SURVEY §7 quirks)."""

from __future__ import annotations

import contextlib
import io
import sys
from typing import Iterator


class _Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


@contextlib.contextmanager
def capture_stdout(echo: bool = True) -> Iterator[io.StringIO]:
    """Capture prints into a StringIO; optionally still echo to the tty."""
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = _Tee(buf, old) if echo else buf
    try:
        yield buf
    finally:
        sys.stdout = old
