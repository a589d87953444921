"""SCALE.md's claim → pin table must not rot.

Every scale claim in SCALE.md maps to a row of the round-8 table; each
row names either real tests (whose disappearance/renaming makes this
meta-test fail) or an explicit `bounded:` justification. This is the
mechanism that keeps SCALE.md honest as the surface grows (r6 item 6 /
r7 item 3): a claim without a living pin is a documentation bug CI can
see.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_MD = os.path.join(REPO, "SCALE.md")

PIN_RE = re.compile(r"(tests/[\w./]+\.py)::(test_\w+)")


def _table_rows() -> list[tuple[str, str]]:
    with open(SCALE_MD) as fh:
        text = fh.read()
    anchor = "## Claim → pin table"
    assert anchor in text, "SCALE.md lost its claim → pin table"
    section = text.split(anchor, 1)[1]
    rows = []
    for line in section.splitlines():
        line = line.strip()
        if not line.startswith("|") or line.startswith("|---"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) != 2 or cells[0] == "claim":
            continue
        rows.append((cells[0], cells[1]))
    return rows


ROWS = _table_rows()


def test_table_is_substantial():
    """A hollow table satisfies nothing: the surface has ~70 claim
    families, and required high-risk claims must each hold a row."""
    assert len(ROWS) >= 60, f"claim table shrank to {len(ROWS)} rows"
    claims = " || ".join(claim.lower() for claim, _ in ROWS)
    for required in [
        "hybrid rrf",          # depth-bounded rank windows (r7 item 3)
        "length_buckets",      # n_buckets-row verdict window
        "zipf",                # vocab-/distinct-bounded sorts
        "corpus_shuffle",      # the two-pass range sort
        "embedding near-dup",  # zero driver collect (r7 item 4)
        "minhash",
        "ivf",
        "streaming",
    ]:
        assert required in claims, f"required claim row missing: {required}"


@pytest.mark.parametrize(
    "claim,pin", ROWS, ids=[c[:40].replace(" ", "_") for c, _ in ROWS]
)
def test_every_claim_row_pins_or_bounds(claim, pin):
    """Each row either names >=1 existing test (file exists AND defines
    the function) or opens with an explicit `bounded:` argument."""
    pins = PIN_RE.findall(pin)
    if not pins:
        assert pin.startswith("bounded:"), (
            f"claim {claim!r} has neither a test pin nor a bounded: note"
        )
        assert len(pin) > len("bounded: x"), f"empty bounded note for {claim!r}"
        return
    for rel, name in pins:
        path = os.path.join(REPO, rel)
        assert os.path.exists(path), f"{claim!r} pins missing file {rel}"
        with open(path) as fh:
            src = fh.read()
        assert f"def {name}(" in src, (
            f"{claim!r} pins {rel}::{name} but no such test exists"
        )


def test_dedup_has_no_driver_collect():
    """r7 verdict item 4's 'Done' bar: no corpus-sized `.collect()` in
    dedup.py — the exact cosine route stages its corpus executor-side.
    Source-level guard, r13 refinement: a collect whose result is
    bounded by construction (the calibrator's |grid|-row aggregate) is
    the same class ann.py's occupancy_stats uses everywhere — but it
    must DECLARE its bound with a same-line `# bounded-collect:`
    annotation, so any new collect is a visible, justified decision
    instead of a silent regression.
    """
    path = os.path.join(
        REPO, "vector_database_in_rust_spark", "operators", "dedup.py"
    )
    with open(path) as fh:
        lines = fh.readlines()
    bad = [
        (i + 1, ln.strip())
        for i, ln in enumerate(lines)
        if ".collect(" in ln and "# bounded-collect:" not in ln
    ]
    assert not bad, (
        "dedup.py regained an unannotated driver collect — stage "
        "corpus-sized data executor-side (see _cosine_pairs_pandas) or "
        f"declare the bound with '# bounded-collect: <why>': {bad}"
    )
