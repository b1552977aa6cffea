import numpy as np

from pdf_table_tpu.entity import (
    HtmlContentType,
    Line,
    LineDirectionType,
    LineInterval,
    OcrCell,
    Point,
    TableUnit,
)


class TestLineInterval:
    def test_merge_all(self):
        ivs = [LineInterval(5, 9), LineInterval(0, 3), LineInterval(2, 6)]
        merged = LineInterval.merge_all(ivs)
        assert len(merged) == 1
        assert merged[0].start == 0 and merged[0].end == 9

    def test_merge_disjoint(self):
        ivs = [LineInterval(0, 1), LineInterval(5, 6)]
        merged = LineInterval.merge_all(ivs)
        assert len(merged) == 2

    def test_normalizes_order(self):
        iv = LineInterval(9, 1)
        assert iv.start == 1 and iv.end == 9


class TestLine:
    def _h(self, x1, x2, y=10.0):
        return Line(Point(x1, y), Point(x2, y), LineDirectionType.HORIZONTAL)

    def _v(self, y1, y2, x=10.0):
        return Line(Point(x, y1), Point(x, y2), LineDirectionType.VERTICAL)

    def test_merge_horizontal(self):
        lines = [self._h(0, 5), self._h(4, 9), self._h(20, 30)]
        merged = Line.merge_lines(lines, diff=2, direction=LineDirectionType.HORIZONTAL)
        assert len(merged) == 2
        assert merged[0].min_x == 0 and merged[0].max_x == 9
        assert merged[1].min_x == 20

    def test_merge_with_gap_tolerance(self):
        lines = [self._h(0, 5), self._h(6.5, 9)]
        merged = Line.merge_lines(lines, diff=2)
        assert len(merged) == 1

    def test_merge_vertical(self):
        lines = [self._v(0, 5), self._v(5.5, 12)]
        merged = Line.merge_lines(lines, diff=2, direction=LineDirectionType.VERTICAL)
        assert len(merged) == 1
        assert merged[0].min_y == 0 and merged[0].max_y == 12

    def test_merge_segments_1d_vectorized(self):
        segs = np.array([[5, 9], [0, 3], [2.5, 6], [20, 25], [24, 30]])
        out = Line.merge_segments_1d(segs, diff=1.0)
        assert out.shape == (2, 2)
        np.testing.assert_allclose(out[0], [0, 9])
        np.testing.assert_allclose(out[1], [20, 30])

    def test_merge_segments_1d_matches_interval_merge(self, rng):
        starts = rng.uniform(0, 100, size=200)
        lens = rng.uniform(0, 10, size=200)
        segs = np.stack([starts, starts + lens], axis=1)
        fast = Line.merge_segments_1d(segs, diff=0.0)
        slow = LineInterval.merge_all([LineInterval(a, b) for a, b in segs])
        assert len(fast) == len(slow)
        for row, iv in zip(fast, slow):
            np.testing.assert_allclose(row, [iv.start, iv.end])


class TestOcrCell:
    def test_from_bbox(self):
        c = OcrCell.from_bbox([10, 20, 110, 40], text="hello")
        assert c.width == 100 and c.height == 20
        assert c.cell_type == HtmlContentType.TXT
        assert c.text_number == 5
        assert c.text_width == 20.0

    def test_from_poly(self):
        poly = np.array([[0, 0], [10, 1], [10, 11], [0, 10]], dtype=np.float32)
        c = OcrCell.from_poly(poly, text="x")
        assert c.bbox == (0.0, 0.0, 10.0, 11.0)
        assert c.poly.shape == (4, 2)

    def test_raw_data_image(self):
        c = OcrCell(raw_data={"bbox": [0, 0, 5, 5], "is_image": True,
                              "image_info": {"path": "x.png"}})
        assert c.is_image
        assert c.cell_type == HtmlContentType.IMAGE

    def test_contains(self):
        outer = OcrCell.from_bbox([0, 0, 100, 100])
        inner = OcrCell.from_bbox([10, 10, 50, 50])
        assert outer.contains(inner)
        assert not inner.contains(outer)
        assert outer.contains_point(50, 50)

    def test_to_dict_roundtrip(self):
        c = OcrCell.from_bbox([1, 2, 3, 4], text="t")
        d = c.to_dict()
        c2 = OcrCell(raw_data=d)
        assert c2.bbox == c.bbox
        assert c2.text == "t"


class TestTableUnit:
    def test_axes(self):
        u = TableUnit(bbox=[0, 0, 10, 10], logit_axis=[0, 1, 2, 3])
        assert u.start_row == 0 and u.end_row == 1
        assert u.start_col == 2 and u.end_col == 3
