#!/usr/bin/env python
"""ADVICE.md resolution-state gate (VERDICT r9 item 4).

The advisor's findings file historically carried no closure state: all
four r9 findings were already fixed in code while the file still read as
open, forcing each judge/round to re-derive closure from source. The
contract this tool enforces:

- every finding is a bullet starting ``- **<severity>**``;
- every finding of severity medium or higher must carry a status line
  (``**Status (rN): fixed <commit> ...**`` or ``rejected <why>``) before
  the next finding begins;
- low findings are exempt (still encouraged).

Run standalone (``python tools/check_advice.py``, exit 1 on violation)
or via tests/test_docs_governance.py which calls :func:`unresolved`.
"""

from __future__ import annotations

import os
import re
import sys

_FINDING = re.compile(r"^- \*\*(low|medium|high|critical)\*\*\s+(\S+)", re.M)
_STATUS = re.compile(r"\*\*Status", re.I)


def unresolved(text: str) -> list[str]:
    """Findings of severity medium+ whose chunk has no Status marker.

    A finding's chunk ends at the NEXT finding bullet OR the next
    markdown heading, whichever comes first (review r10: extending the
    last finding to end-of-file let any trailing section containing the
    literal ``**Status`` — a legend, an appended doc block — mark an
    open finding resolved)."""
    matches = list(_FINDING.finditer(text))
    headings = [m.start() for m in re.finditer(r"^#{1,6} ", text, re.M)]
    bad: list[str] = []
    for i, m in enumerate(matches):
        severity, where = m.group(1), m.group(2)
        if severity == "low":
            continue
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        for h in headings:
            if m.start() < h < end:
                end = h
                break
        chunk = text[m.start() : end]
        if not _STATUS.search(chunk):
            bad.append(f"{severity} {where}")
    return bad


def main() -> int:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ADVICE.md",
    )
    try:
        with open(path) as fh:
            text = fh.read()
    except OSError:
        print("ADVICE.md not found — nothing to check")
        return 0
    bad = unresolved(text)
    if bad:
        print("ADVICE.md has medium+ findings with no resolution status:")
        for item in bad:
            print(f"  - {item}")
        return 1
    print("ADVICE.md: all medium+ findings carry a resolution status")
    return 0


if __name__ == "__main__":
    sys.exit(main())
