"""Documentation-governance gates (no Spark session needed).

ADVICE.md resolution state (VERDICT r9 item 4): every medium+ advisor
finding must carry an explicit ``**Status ...**`` line (``fixed <commit>``
or ``rejected <why>``) so closure never has to be re-derived from source.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_advice import unresolved  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_advice_medium_plus_findings_have_status():
    path = os.path.join(REPO, "ADVICE.md")
    if not os.path.exists(path):
        return
    with open(path) as fh:
        text = fh.read()
    bad = unresolved(text)
    assert not bad, (
        "ADVICE.md medium+ findings missing a **Status** line "
        f"(fixed <commit> / rejected <why>): {bad}"
    )


def test_checker_detects_missing_status():
    """The gate itself must not be vacuous."""
    text = (
        "- **medium** foo.py:1 — a problem\n  _fix it_\n"
        "- **low** bar.py:2 — minor\n"
        "- **high** baz.py:3 — bad\n  **Status (r10): fixed abc1234.**\n"
    )
    assert unresolved(text) == ["medium foo.py:1"]


def test_checker_chunk_ends_at_heading():
    """review r10: a trailing section containing the literal **Status
    (a legend, appended docs) must not mark the LAST open finding
    resolved — the chunk ends at the next heading."""
    text = (
        "- **high** baz.py:3 — bad, still open\n  _fix it_\n"
        "\n## Status legend\n\nFindings gain **Status** lines when closed.\n"
    )
    assert unresolved(text) == ["high baz.py:3"]
