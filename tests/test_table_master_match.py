"""TableMaster matcher pipeline tests.

Behavior parity targets cited from the reference
(model/ocr_pdf/table/table_master_match.py and table/matcher.py).
"""

import numpy as np


class TestEbTokens:
    def test_all_eleven_rewrites(self):
        from pdf_table_tpu.tasks.table_master_match import deal_eb_token

        # deal_eb_token:523-556 — every PubTabNet empty-bbox token must
        # expand byte-for-byte. NOTE: eb3/eb10 contain U+2028 LINE
        # SEPARATOR, which renders like a plain space in most editors —
        # spelled as escapes here so the parity is visible.
        cases = {
            "<eb></eb>": "<td></td>",
            "<eb1></eb1>": "<td> </td>",
            "<eb2></eb2>": "<td><b> </b></td>",
            "<eb3></eb3>": "<td>\u2028\u2028</td>",
            "<eb4></eb4>": "<td><sup> </sup></td>",
            "<eb5></eb5>": "<td><b></b></td>",
            "<eb6></eb6>": "<td><i> </i></td>",
            "<eb7></eb7>": "<td><b><i></i></b></td>",
            "<eb8></eb8>": "<td><b><i> </i></b></td>",
            "<eb9></eb9>": "<td><i></i></td>",
            "<eb10></eb10>": "<td><b> \u2028 \u2028 </b></td>",
        }
        for eb, html in cases.items():
            got = deal_eb_token(eb)
            assert got == html, (eb, got.encode("unicode_escape"))
        # eb3/eb10 must NOT degrade to plain spaces (U+0020)
        assert "\u2028" in deal_eb_token("<eb3></eb3>")
        assert deal_eb_token("<eb3></eb3>") != "<td>  </td>"
        # eb10 must not be clobbered by the eb1 rule
        assert "<eb" not in deal_eb_token("<tr><eb10></eb10><eb1></eb1></tr>")


class TestTheadFixes:
    def test_isolate_span(self):
        from pdf_table_tpu.tasks.table_master_match import deal_isolate_span

        # deal_isolate_span:587 — broken '<td></td> rowspan..></b></td>'
        assert deal_isolate_span('<td></td> rowspan="2"></b></td>') == \
            '<td rowspan="2"></td>'
        assert deal_isolate_span('<td></td> colspan="3"></b></td>') == \
            '<td colspan="3"></td>'
        assert deal_isolate_span(
            '<td></td> rowspan="2" colspan="3"></b></td>') == \
            '<td rowspan="2" colspan="3"></td>'
        ok = '<td rowspan="2">x</td>'
        assert deal_isolate_span(ok) == ok

    def test_duplicate_bb(self):
        from pdf_table_tpu.tasks.table_master_match import deal_duplicate_bb

        # deal_duplicate_bb:628 — collapse multiple <b> pairs to one
        s = "<td><b>A</b> <b>B</b></td>"
        assert deal_duplicate_bb(s) == "<td><b>A B</b></td>"
        keep = "<td><b>A</b></td>"
        assert deal_duplicate_bb(keep) == keep

    def test_deal_bb_plain_thead(self):
        from pdf_table_tpu.tasks.table_master_match import deal_bb

        # deal_bb:664 branch 1: no spans in thead
        html = "<thead><tr><td>h1</td><td></td></tr></thead>" \
               "<tbody><tr><td>x</td></tr></tbody>"
        out = deal_bb(html)
        assert "<td><b>h1</b></td>" in out
        # empty header cell stays bare (:728)
        assert "<td></td>" in out
        # tbody untouched
        assert "<td>x</td>" in out

    def test_deal_bb_span_thead(self):
        from pdf_table_tpu.tasks.table_master_match import deal_bb

        html = '<thead><tr><td colspan="2">h</td><td>g</td></tr></thead>'
        out = deal_bb(html)
        assert '<td colspan="2"><b>h</b></td>' in out
        assert "<td><b>g</b></td>" in out

    def test_deal_bb_already_bold_text(self):
        from pdf_table_tpu.tasks.table_master_match import deal_bb

        # recognition text may already carry <b>: dedupe (:683-686)
        html = "<thead><tr><td><b>h</b></td></tr></thead>"
        out = deal_bb(html)
        assert out.count("<b>") == 1 and out.count("</b>") == 1


class TestTokenAssembly:
    def test_merge_span_token(self):
        from pdf_table_tpu.tasks.table_master_match import merge_span_token

        toks = ["<tr>", "<td", ' colspan="3"', ">", "</td>", "<td></td>",
                "</tr>", "</tbody>"]
        out = merge_span_token(toks)
        assert out == ["<tr>", '<td colspan="3"></td>', "<td></td>",
                       "</tr>", "</tbody>"]

    def test_merge_span_token_double_span(self):
        from pdf_table_tpu.tasks.table_master_match import merge_span_token

        toks = ["<td", ' rowspan="2"', ' colspan="3"', ">", "</td>"]
        assert merge_span_token(toks) == \
            ['<td rowspan="2" colspan="3"></td>', "</tbody>"]

    def test_insert_text(self):
        from pdf_table_tpu.tasks.table_master_match import \
            insert_text_to_token

        toks = ["<tr>", "<td></td>", "<eb></eb>", "<td></td>", "</tr>",
                "</tbody>"]
        # td slots: 0 -> '<td></td>', 1 -> second '<td></td>' (eb token is
        # not a td slot; insert_text_to_token:561)
        html = insert_text_to_token(toks, {0: "A", 1: "B"})
        assert html == "<tr><td>A</td><td></td><td>B</td></tr></tbody>"


class TestUseMasterPath:
    def _run(self, tokens, cells, texts_boxes):
        from pdf_table_tpu.tasks.table_matcher import TableMatch

        dt_boxes = [b for b, _ in texts_boxes]
        texts = [t for _, t in texts_boxes]
        m = TableMatch(use_master=True)
        return m(tokens, cells, dt_boxes, texts)

    def test_eb_tokens_never_leak(self):
        """VERDICT r2 'done' criterion: master decode with eb tokens in the
        vocab yields HTML with zero '<eb' substrings."""
        tokens = ["<tbody>", "<tr>", "<td></td>", "<eb></eb>", "</tr>",
                  "</tbody>"]
        cells = [[0, 0, 50, 20]]
        html = self._run(tokens, cells, [([2, 2, 48, 18], "hello")])
        assert "<eb" not in html
        assert "<td>hello</td>" in html
        assert "<td></td>" in html  # the eb cell rendered empty

    def test_thead_bolding_applied(self):
        tokens = ["<thead>", "<tr>", "<td></td>", "</tr>", "</thead>",
                  "<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
        cells = [[0, 0, 50, 20], [0, 30, 50, 50]]
        html = self._run(tokens, cells,
                         [([1, 1, 49, 19], "Head"), ([1, 31, 49, 49], "x")])
        assert "<td><b>Head</b></td>" in html
        assert "<td>x</td>" in html

    def test_multi_box_bold_folding(self):
        """Two bold OCR lines in one cell fold to one <b> wrap
        (get_pred_html_master:152-172)."""
        tokens = ["<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
        cells = [[0, 0, 100, 40]]
        html = self._run(tokens, cells,
                         [([2, 2, 96, 18], "<b>Local</b>"),
                          ([2, 20, 96, 38], "<b>unit</b>")])
        assert "<td><b>Local unit</b></td>" in html

    def test_slanet_path_unchanged(self):
        from pdf_table_tpu.tasks.table_matcher import TableMatch

        tokens = ["<tr>", "<td></td>", "</tr>"]
        m = TableMatch()
        html = m(tokens, [[0, 0, 50, 20]], [[1, 1, 49, 19]], ["t"])
        assert html == "<table><tr><td>t</td></tr></table>"


class TestFullMasterMatcher:
    def test_three_rule_match(self):
        from pdf_table_tpu.tasks.table_master_match import \
            match_ocr_to_master

        master = np.array([[0, 0, 50, 20], [60, 0, 110, 20]], np.float64)
        ocr = np.array([
            [5, 5, 45, 15],      # center inside master 0 (rule 1)
            [48, 2, 72, 18],     # straddles: center in gap -> rule 2 IoU
            [200, 200, 220, 210],  # far away -> only via rule 3
        ], np.float64)
        pairs = match_ocr_to_master(ocr, master)
        d = {}
        for i, j in pairs:
            d.setdefault(i, set()).add(j)
        assert 0 in d[0]
        assert 1 in d  # matched by iou rule
        # every master box got at least one partner (rule 3 guarantee)
        assert {j for _, j in pairs} == {0, 1}

    def test_virtual_rows_for_truncated_stream(self):
        """Truncated token stream (no trailing </tbody>): leftover OCR
        lines become virtual <tr><td></td></tr> rows (_format:869-887)."""
        from pdf_table_tpu.tasks.table_master_match import TableMasterMatcher

        tokens = ["<tbody>", "<tr>", "<td></td>"]  # cut by max length
        master = [[0, 0, 50, 20]]
        ocr = [[2, 2, 48, 18], [2, 30, 48, 45], [52, 30, 98, 45]]
        texts = ["in", "left", "right"]
        html = TableMasterMatcher()(tokens, master, ocr, texts)
        assert "<td>in</td>" in html
        assert "<td>left</td>" in html
        assert "<td>right</td>" in html
        assert html.count("<tr>") >= 2
        assert "</tbody>" in html

    def test_complete_stream_no_virtual_rows(self):
        """A complete stream (ends with </tbody>) does NOT grow virtual
        rows even when OCR lines are unmatched (match:861-867)."""
        from pdf_table_tpu.tasks.table_master_match import TableMasterMatcher

        tokens = ["<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
        master = [[0, 0, 50, 20]]
        ocr = [[2, 2, 48, 18], [300, 300, 340, 320]]
        html = TableMasterMatcher()(tokens, master, ocr, ["in", "way-out"])
        assert html.count("<tr>") == 1

    def test_zero_padded_master_boxes_dropped(self):
        from pdf_table_tpu.tasks.table_master_match import TableMasterMatcher

        tokens = ["<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
        master = [[0, 0, 50, 20], [0, 0, 0, 0]]
        html = TableMasterMatcher()(tokens, master, [[2, 2, 48, 18]], ["t"])
        assert "<td>t</td>" in html


class TestTokenPathIntegration:
    def test_table_to_html_master_routing(self):
        from pdf_table_tpu.entity.ocr_cell import OcrCell
        from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask

        tsr = {"structure_tokens":
               ["<tbody>", "<tr>", "<td></td>", "<eb></eb>", "</tr>",
                "</tbody>"],
               "cells": [{"bbox": [0, 0, 50, 20]}],
               "offset": (0, 0), "type": "master"}
        cells = [OcrCell.from_bbox((2, 2, 48, 18), text="v")]
        html = OcrTableToHtmlTask()(tsr, cells)
        assert "<eb" not in html
        assert "<td>v</td>" in html
