"""Golden-parity corpus: every case must reproduce its committed golden
byte-for-byte (tests/golden/; VERDICT r4 #5 — the standing evidence for
the HTML-parity north star). On drift: audit, then refresh via
`python tools/golden_report.py --update`."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))

import cases  # noqa: E402


@pytest.mark.parametrize("name", cases.all_case_names())
def test_golden_case(name, tmp_path):
    got = cases.run_case(name, str(tmp_path))
    want = cases.load_expected(name)
    assert got == want, (
        f"{name} drifted from its golden — audit the diff, then refresh "
        f"with tools/golden_report.py --update")


def test_report_is_committed():
    assert os.path.exists(os.path.join(cases.HERE, "REPORT.md"))


def test_teds_identity_on_goldens():
    """TEDS self-similarity of every HTML golden is 1.0 (sanity that the
    metric parses the emitted HTML)."""
    from pdf_table_tpu.eval.teds import TEDS

    teds = TEDS()
    for name in cases.all_case_names():
        p = cases.expected_path(name)
        if not p.endswith(".html"):
            continue
        html = cases.load_expected(name)
        if "<table" not in html:
            continue
        assert teds.evaluate(html, html) == pytest.approx(1.0), name
