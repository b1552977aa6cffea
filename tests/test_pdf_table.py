"""Classical read_pdf (lattice/stream/pdf flavors) tests."""

import numpy as np
import pytest


def make_table_pdf(tmp_path, name="t.pdf", with_lines=True):
    from pdf_table_tpu.pdfio.writer import PdfWriter

    w = PdfWriter()
    page = w.add_page(300, 200)
    if with_lines:
        page.table(20, 180, [80, 80, 80], 30,
                   [["h1", "h2", "h3"], ["a", "b", "c"]])
    else:
        # borderless "stream" style: aligned text runs only
        ys = [170, 140, 110]
        for y, row in zip(ys, [["name", "qty", "price"],
                               ["apple", "2", "3.50"],
                               ["pear", "5", "1.25"]]):
            for x, txt in zip([30, 120, 210], row):
                page.text(x, y, txt, size=10)
    p = str(tmp_path / name)
    w.save(p)
    return p


class TestCore:
    def test_table_grid_and_df(self):
        from pdf_table_tpu.pdf_table import Table

        t = Table([0, 50, 100], [100, 50, 0])
        assert t.shape == (2, 2)
        t.cells[0][0].text = "x"
        assert t.data[0][0] == "x"
        assert t.df.shape == (2, 2)

    def test_span_html(self):
        from pdf_table_tpu.pdf_table import Table

        t = Table([0, 50, 100], [100, 50, 0])
        t.set_all_edges()
        # merge top row horizontally
        t.cells[0][0].right = False
        t.cells[0][1].left = False
        t.set_span()
        html = t.to_html()
        assert 'colspan="2"' in html

    def test_whitespace_stat(self):
        from pdf_table_tpu.pdf_table import Table

        t = Table([0, 50, 100], [100, 50, 0])
        t.cells[0][0].text = "x"
        t.compute_stats()
        assert t.whitespace == 75.0


class TestFlavors:
    def test_pdf_flavor(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = make_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="pdf")
        assert tables.n == 1
        t = tables[0]
        assert t.shape == (2, 3)
        assert t.data[0] == ["h1", "h2", "h3"]
        assert t.data[1] == ["a", "b", "c"]

    def test_lattice_flavor(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = make_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="lattice")
        assert tables.n == 1
        assert tables[0].shape == (2, 3)
        assert tables[0].data[0] == ["h1", "h2", "h3"]

    def test_stream_flavor(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = make_table_pdf(tmp_path, with_lines=False)
        tables = read_pdf(p, flavor="stream")
        assert tables.n == 1
        t = tables[0]
        assert t.shape[1] == 3
        flat = [c for row in t.data for c in row]
        assert "apple" in flat and "3.50" in flat

    def test_bad_flavor(self):
        from pdf_table_tpu.pdf_table import read_pdf

        with pytest.raises(ValueError):
            read_pdf("x.pdf", flavor="nope")

    def test_export_csv(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = make_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="pdf")
        tables.export(str(tmp_path / "out.csv"))
        import os

        assert os.path.exists(tmp_path / "out-0.csv")


class TestSpansFromPdf:
    def test_merged_header_colspan(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf
        from pdf_table_tpu.pdfio.writer import PdfWriter

        w = PdfWriter()
        page = w.add_page(300, 200)
        # hand-drawn 2-row grid: top row has NO middle separator (colspan 2)
        x0, x1, x2 = 50.0, 150.0, 250.0
        y0, y1, y2 = 180.0, 150.0, 120.0
        for y in (y0, y1, y2):
            page.line(x0, y, x2, y)
        for x in (x0, x2):
            page.line(x, y2, x, y0)
        page.line(x1, y2, x1, y1)   # middle separator only in bottom row
        page.text(100, 160, "HEAD", size=10)
        page.text(70, 130, "a", size=10)
        page.text(170, 130, "b", size=10)
        p = str(tmp_path / "span.pdf")
        w.save(p)

        tables = read_pdf(p, flavor="pdf")
        assert tables.n == 1
        html = tables[0].to_html()
        assert 'colspan="2"' in html
        assert "HEAD" in html and ">a</td>" in html


class TestTextEdges:
    """Stream's alignment-edge network (reference table_core.py:85-239)."""

    def _aligned_table_pdf(self, tmp_path, n_rows=7, x_cols=(30, 120, 210),
                           y_top=230, name="edges.pdf", para=True,
                           second=None):
        from pdf_table_tpu.pdfio.writer import PdfWriter

        w = PdfWriter()
        page = w.add_page(300, 400)
        if para:
            page.text(30, 370, "An introductory paragraph line", size=10)
            page.text(30, 355, "continuing across the page width", size=10)
        for r in range(n_rows):
            y = y_top - 18 * r
            for c, x in enumerate(x_cols):
                page.text(x, y, f"r{r}c{c}", size=10)
        if second is not None:
            for r in range(second["rows"]):
                y = second["y_top"] - 18 * r
                for c, x in enumerate(second["x_cols"]):
                    page.text(x, y, f"s{r}c{c}", size=10)
        p = str(tmp_path / name)
        w.save(p)
        return p

    def test_valid_edges_require_elements(self):
        from pdf_table_tpu.pdf_table.stream import TextEdges

        net = TextEdges()
        # 3 aligned rows only -> 2 intersections -> not valid
        bboxes = [(10, 100 - 12 * i, 40, 110 - 12 * i) for i in range(3)]
        net.generate(bboxes, ["word"] * 3)
        assert not any(e.is_valid for e in net.edges["left"])
        # 7 aligned rows -> valid left edge
        net2 = TextEdges()
        bboxes = [(10, 100 - 12 * i, 40, 110 - 12 * i) for i in range(7)]
        net2.generate(bboxes, ["word"] * 7)
        assert any(e.is_valid for e in net2.edges["left"])

    def test_area_inferred_without_bbox(self, tmp_path):
        """A paragraph + a 7-row aligned block: the inferred area holds the
        table rows; the extractor needs no table_areas input."""
        from pdf_table_tpu.pdf_table import read_pdf

        p = self._aligned_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="stream")
        assert tables.n >= 1
        t = tables[0]
        assert t.shape[1] == 3
        flat = [c for row in t.data for c in row]
        assert "r0c0" in flat and "r6c2" in flat
        # the paragraph must stay out of the inferred table area
        assert not any("introductory" in c for c in flat)

    def test_two_separate_tables(self, tmp_path):
        """Two vertically-separated aligned blocks -> two table areas."""
        from pdf_table_tpu.pdf_table import read_pdf

        p = self._aligned_table_pdf(
            tmp_path, n_rows=6, y_top=360, para=False,
            second={"rows": 6, "y_top": 140, "x_cols": (50, 150, 250)})
        tables = read_pdf(p, flavor="stream")
        assert tables.n == 2
        flat0 = [c for row in tables[0].data for c in row]
        flat1 = [c for row in tables[1].data for c in row]
        assert any(c.startswith("r") for c in flat0 if c)
        assert any(c.startswith("s") for c in flat1 if c)


class TestMultiTable:
    """Two separate wired tables on one page -> two Table objects
    (reference _generate_table_bbox region clustering,
    table_extractor_pdf.py:127 + table_bbox_merge)."""

    def _two_table_pdf(self, tmp_path, name="two.pdf"):
        from pdf_table_tpu.pdfio.writer import PdfWriter

        w = PdfWriter()
        page = w.add_page(300, 400)
        page.table(20, 380, [80, 80], 30,
                   [["a1", "a2"], ["a3", "a4"]])
        page.table(20, 160, [60, 60, 60], 25,
                   [["b1", "b2", "b3"], ["b4", "b5", "b6"]])
        p = str(tmp_path / name)
        w.save(p)
        return p

    def test_pdf_flavor_two_tables(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = self._two_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="pdf")
        assert tables.n == 2
        assert tables[0].shape == (2, 2)
        assert tables[1].shape == (2, 3)
        assert tables[0].data == [["a1", "a2"], ["a3", "a4"]]
        assert tables[1].data == [["b1", "b2", "b3"], ["b4", "b5", "b6"]]
        # top-of-page table first
        assert tables[0].bbox[1] > tables[1].bbox[3]

    def test_lattice_flavor_two_tables(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = self._two_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="lattice")
        assert tables.n == 2
        assert tables[0].data == [["a1", "a2"], ["a3", "a4"]]
        assert tables[1].data == [["b1", "b2", "b3"], ["b4", "b5", "b6"]]

    def test_pdf_flavor_two_tables_html(self, tmp_path):
        from pdf_table_tpu.pdf_table import read_pdf

        p = self._two_table_pdf(tmp_path)
        tables = read_pdf(p, flavor="pdf")
        htmls = [t.to_html() for t in tables]
        assert htmls[0].count("<tr>") == 2 and "a4" in htmls[0]
        assert htmls[1].count("<tr>") == 2 and "b6" in htmls[1]
