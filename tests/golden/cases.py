"""Golden-parity corpus: ~20 deterministic cases over the exact-host paths.

Standing evidence for the "HTML bit-for-bit" north star
(BASELINE.json north_star; VERDICT r4 #5): every case builds a
deterministic input (digital PDF via pdfio.writer, synthetic raster
grid, or a synthetic structure-token stream), runs a REAL product path
end-to-end, and must reproduce the committed golden byte-for-byte
(tests/golden/expected/). The covered paths are the model-free ones
whose output is meaningful without converted checkpoints:

  - digital PDF -> CLI -> page HTML   (vector text, LineCellPdf tables,
    paragraph merge, multi-page merge; reference ocr_system_task
    pdf_text_extract + table paths)
  - read_pdf lattice/stream/pdf        (classical camelot-lineage flavors)
  - raster wired grid -> LineCell      (cv2 morphology cell extraction;
    straight, deskewed, and quarter-turned variants)
  - structure tokens -> TableMaster matcher HTML (token path incl.
    eb-token rewrites and thead bolding)
  - structure tokens -> SLANet TableMatch HTML (non-master walk)
  - synthetic LORE head output -> snap_to_grid -> cell HTML
  - table HTML -> xlsx worksheet XML
  - result-compare diff report (per-cell buckets + opcode dump)

Model-path cases (LORE/SLANet/...) are exercised structurally in the
main suite; their HTML is only meaningful with converted weights, so
they are not golden-pinned here (weights are hub data, unavailable
offline — see docs/language.md for the same policy on dicts).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
EXPECTED_DIR = os.path.join(HERE, "expected")


# --------------------------------------------------------------------------
# builders
# --------------------------------------------------------------------------


def _writer():
    from pdf_table_tpu.pdfio import writer
    return writer.PdfWriter()


def _save(doc, td: str, name: str) -> str:
    path = os.path.join(td, name + ".pdf")
    doc.save(path)
    return path


def build_digital_simple(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    y = 740
    for i in range(4):
        pg.text(60, y, f"Opening paragraph line {i} with running text.")
        y -= 22
    pg.table(60, 600, [110, 90, 90, 90], 24,
             [["name", "q1", "q2", "q3"],
              ["alpha", "1.0", "2.5", "3.1"],
              ["beta", "4.2", "5.0", "6.8"],
              ["gamma", "7.7", "8.1", "9.9"]])
    pg.text(60, 470, "Closing remark under the table.")
    return _save(doc, td, "digital_simple")


def build_digital_multi_table(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    pg.text(60, 750, "Two tables on one page.")
    pg.table(60, 700, [90, 90], 22,
             [["k", "v"], ["a", "1"], ["b", "2"]])
    pg.text(60, 600, "Interleaved paragraph between the tables.")
    pg.table(60, 560, [70, 70, 70], 22,
             [["x", "y", "z"], ["1", "2", "3"], ["4", "5", "6"],
              ["7", "8", "9"]])
    return _save(doc, td, "digital_multi_table")


def build_digital_text_only(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    y = 740
    for i in range(10):
        pg.text(60, y, f"Plain paragraph number {i}, no tables anywhere.")
        y -= 20
    pg.text(200, 500, "A centered heading", size=16)
    return _save(doc, td, "digital_text_only")


def build_digital_cjk(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    pg.text(60, 740, "中文段落：表格抽取测试。")
    pg.text(60, 716, "第二行文本，包含标点符号！")
    pg.table(60, 660, [100, 100, 100], 24,
             [["项目", "数量", "备注"],
              ["甲", "12", "正常"],
              ["乙", "7", "延期"]])
    return _save(doc, td, "digital_cjk")


def build_digital_wide(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(792, 612)          # landscape
    pg.text(60, 560, "Landscape page with a wide table.")
    rows = [[f"h{c}" for c in range(7)]]
    rows += [[f"{r}.{c}" for c in range(7)] for r in range(3)]
    pg.table(60, 520, [90] * 7, 22, rows)
    return _save(doc, td, "digital_wide")


def build_digital_spans(td: str) -> str:
    """Merged cells: the grid is drawn from SEGMENTS with two separators
    left out — the col-1 divider inside row 0 (colspan=2 header) and the
    row-3 divider inside the last column (rowspan=2 cell) — so
    LineCellPdf's union-find must infer the spans."""
    doc = _writer()
    pg = doc.add_page(612, 792)
    pg.text(60, 740, "Table with merged header cell and merged row cell.")
    x0, y_top, rh = 60, 700, 24
    cw = [100, 100, 100]
    xs = [x0, x0 + cw[0], x0 + cw[0] + cw[1], x0 + sum(cw)]
    n_rows = 4
    y = [y_top - r * rh for r in range(n_rows + 1)]
    for r in (0, 1, 2, 4):                     # full-width horizontals
        pg.line(xs[0], y[r], xs[3], y[r])
    pg.line(xs[0], y[3], xs[2], y[3])          # r=3 sep stops at col 2
    pg.line(xs[0], y[n_rows], xs[0], y[0])
    pg.line(xs[3], y[n_rows], xs[3], y[0])
    pg.line(xs[1], y[n_rows], xs[1], y[1])     # colspan=2 header
    pg.line(xs[2], y[n_rows], xs[2], y[0])
    pg.text(xs[0] + 3, y[1] + 8, "wide header")
    pg.text(xs[2] + 3, y[1] + 8, "h3")
    for r in range(1, n_rows):
        for c in range(3):
            if r >= 2 and c == 2:
                if r == 2:
                    pg.text(xs[c] + 3, y[r + 1] + 8, "tall")
                continue
            pg.text(xs[c] + 3, y[r + 1] + 8, f"r{r}c{c}")
    return _save(doc, td, "digital_spans")


def build_digital_numeric(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    pg.text(60, 740, "Numeric table.")
    pg.table(60, 700, [120, 90, 90], 22,
             [["metric", "2023", "2024"],
              ["revenue", "1,234.5", "2,345.6"],
              ["margin %", "12.3", "14.8"],
              ["(loss)", "-45.0", "-3.2"]])
    return _save(doc, td, "digital_numeric")


def build_digital_multipage(td: str) -> str:
    doc = _writer()
    for p in range(3):
        pg = doc.add_page(612, 792)
        pg.text(60, 740, f"Page {p + 1} heading text.")
        pg.table(60, 700, [90, 90], 22,
                 [["page", "row"], [str(p + 1), "a"], [str(p + 1), "b"]])
    return _save(doc, td, "digital_multipage")


def build_flavor_ruled(td: str) -> str:
    doc = _writer()
    pg = doc.add_page(612, 792)
    pg.table(72, 700, [110, 110, 110], 26,
             [["product", "units", "price"],
              ["widget", "10", "1.50"],
              ["gadget", "4", "22.00"],
              ["doohickey", "7", "3.25"]])
    return _save(doc, td, "flavor_ruled")


def build_flavor_unruled(td: str) -> str:
    """Columnar text with NO ruling lines (stream flavor input)."""
    doc = _writer()
    pg = doc.add_page(612, 792)
    cols = [72, 220, 360]
    rows = [["city", "population", "area"],
            ["springfield", "30700", "40.5"],
            ["shelbyville", "21500", "35.1"],
            ["ogdenville", "12400", "28.9"],
            ["brockway", "9100", "22.0"]]
    y = 700
    for row in rows:
        for x, cell in zip(cols, row):
            pg.text(x, y, cell)
        y -= 24
    return _save(doc, td, "flavor_unruled")


def make_scanned_grid(angle_deg: float = 0.0) -> np.ndarray:
    """Raster wired table: white page, black grid, dark text bars."""
    import cv2

    img = np.full((600, 500, 3), 255, np.uint8)
    x0, y0, cw, rh, nc, nr = 80, 120, 110, 46, 3, 5
    for r in range(nr + 1):
        cv2.line(img, (x0, y0 + r * rh), (x0 + nc * cw, y0 + r * rh),
                 (0, 0, 0), 2)
    for c in range(nc + 1):
        cv2.line(img, (x0 + c * cw, y0), (x0 + c * cw, y0 + nr * rh),
                 (0, 0, 0), 2)
    # text-like DASHES (10x4 px, gaps between) — a solid 60 px bar would
    # itself pass the morphological line kernel (width/15 = 33 px) and
    # slice the row in two; real glyph strokes never do
    for r in range(nr):
        for c in range(nc):
            for k in range(4):
                dx = x0 + c * cw + 12 + k * 16
                cv2.rectangle(img, (dx, y0 + r * rh + 18),
                              (dx + 10, y0 + r * rh + 26),
                              (40, 40, 40), -1)
    if angle_deg:
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, 1.0)
        img = cv2.warpAffine(img, m, (w, h), borderValue=(255, 255, 255))
    return img


SLANET_TOKEN_CASE = {
    # structure tokens as the SLANet decoder emits them (TableLabelDecode
    # convention): colspan split over three tokens, matched through
    # TableMatch's IoU + corner-distance assignment (non-master walk)
    "tokens": ["<tr>", "<td", ' colspan="2"', ">", "</td>", "<td></td>",
               "</tr>", "<tr>", "<td></td>", "<td></td>", "<td></td>",
               "</tr>"],
    "pred_bboxes": [[0, 0, 200, 20], [200, 0, 300, 20],
                    [0, 20, 100, 40], [100, 20, 200, 40],
                    [200, 20, 300, 40]],
    "dt_boxes": [[5, 2, 180, 18], [205, 2, 290, 18],
                 [5, 22, 90, 38], [105, 22, 190, 38],
                 [205, 22, 290, 38]],
    "texts": ["merged head", "h3", "a", "b", "c"],
}


def make_lore_raw():
    """Synthetic LORE head output: a 3x3 grid (one colspan=2 header cell)
    with deterministic +-1 feature-map-px jitter on every cell edge, so
    LorePostProcessor's snap_to_grid must cluster the edges back onto
    shared boundary lines before the HTML grid is consistent."""
    xs = [10.0, 40.0, 70.0, 100.0]          # fmap col boundaries
    ys = [20.0, 35.0, 50.0, 65.0]           # fmap row boundaries
    cells = []                               # (r1, r2, c1, c2)
    cells.append((0, 0, 0, 0))
    cells.append((0, 0, 1, 2))               # colspan=2 header
    for r in (1, 2):
        for c in range(3):
            cells.append((r, r, c, c))
    K = 16
    dets = np.zeros((1, K, 8), np.float32)
    scores = np.zeros((1, K), np.float32)
    valid = np.zeros((1, K), bool)
    logi = np.zeros((1, K, 4), np.float32)
    jit = [0.6, -0.8, 0.4, -0.5, 0.9, -0.3, 0.7, -0.9]   # fmap px
    for i, (r1, r2, c1, c2) in enumerate(cells):
        x1 = xs[c1] + jit[i % 8] * 0.9
        x2 = xs[c2 + 1] + jit[(i + 3) % 8] * 0.9
        y1 = ys[r1] + jit[(i + 5) % 8] * 0.9
        y2 = ys[r2 + 1] + jit[(i + 1) % 8] * 0.9
        dets[0, i] = [x1, y1, x2, y1, x2, y2, x1, y2]
        scores[0, i] = 0.9 - 0.01 * i
        valid[0, i] = True
        logi[0, i] = [r1 + 0.1, r2 - 0.05, c1 + 0.2, c2 + 0.05]
    raw = {"dets": dets, "scores": scores, "valid": valid,
           "stacked_logi": logi}
    meta = {"out_w": 192, "org_shape": (600, 800), "s": 768.0,
            "c": (400.0, 300.0)}
    return raw, meta


COMPARE_CASE = (
    # prediction: one garbled text cell + one span mismatch vs label
    '<table><tr><td colspan="2">head</td></tr>'
    "<tr><td>alpha</td><td>beta</td></tr>"
    "<tr><td>gamma</td><td>delta</td></tr></table>",
    '<table><tr><td colspan="2">head</td></tr>'
    "<tr><td>alpha</td><td>betta</td></tr>"
    '<tr><td rowspan="1">gamma</td><td>delta</td></tr></table>',
)


TOKEN_CASE = {
    # structure tokens as the TableMaster decoder emits them
    # (master_convertor convention), exercising span merge, eb rewrite
    # and thead bolding
    "tokens": ["<thead>", "<tr>", "<td></td>", "<td", ' colspan="2"', ">",
               "</td>", "</tr>", "</thead>", "<tbody>", "<tr>",
               "<td></td>", "<td></td>", "<td></td>", "</tr>", "<tr>",
               "<eb></eb>", "<td></td>", "<eb2></eb2>", "</tr>",
               "</tbody>"],
    # slot ids count '<td'-prefixed tokens only (eb cells are not slots);
    # the drop rules for missing/out-of-range slots are unit-tested in
    # tests/test_table_master_match.py
    "texts": {0: "id", 1: "wide header", 2: "a", 3: "b", 4: "c", 5: "mid"},
}


# --------------------------------------------------------------------------
# runners
# --------------------------------------------------------------------------


def run_digital_case(pdf_path: str, out_dir: str) -> str:
    """Full CLI path (layout model off: tables come from vector lines —
    the deterministic exact-host route, reference LineCellPdf)."""
    from pdf_table_tpu.cli.main import main

    rc = main(["--file_path_or_url", pdf_path, "--output_dir", out_dir,
               "--layout_model", "none"])
    assert rc == 0, f"CLI failed on {pdf_path}"
    base = os.path.splitext(os.path.basename(pdf_path))[0]
    html_path = os.path.join(out_dir, base + ".html")
    with open(html_path, encoding="utf-8") as f:
        return f.read()


def run_flavor_case(pdf_path: str, flavor: str) -> str:
    from pdf_table_tpu.pdf_table import read_pdf

    tables = read_pdf(pdf_path, flavor=flavor)
    assert len(tables) >= 1, f"{flavor} found no table in {pdf_path}"
    if flavor == "pdf":
        return tables[0].to_html()
    return tables[0].df.to_csv(index=False)


def run_scanned_case(img: np.ndarray) -> str:
    """LineCell wired-grid extraction -> synthetic per-cell texts ->
    table HTML (the exact-host raster table path minus the OCR models)."""
    from pdf_table_tpu.entity.ocr_cell import OcrCell
    from pdf_table_tpu.models.line_cell import extract_cells_from_image
    from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask

    r = extract_cells_from_image(img)
    assert r["cells"], "LineCell found no cells"
    texts = []
    for cell in sorted(r["cells"],
                       key=lambda c: (c["logic"][0], c["logic"][2])):
        x1, y1, x2, y2 = cell["bbox"]
        texts.append(OcrCell.from_bbox(
            (x1 + 10, y1 + 14, x1 + 74, y1 + 32),
            text=f"r{cell['logic'][0]}c{cell['logic'][2]}", score=0.99))
    r["offset"] = (0, 0)
    return OcrTableToHtmlTask()(r, texts)


def run_token_case() -> str:
    from pdf_table_tpu.tasks.table_master_match import (deal_bb,
                                                        insert_text_to_token)

    html = insert_text_to_token(TOKEN_CASE["tokens"], TOKEN_CASE["texts"])
    return deal_bb("<table>" + html + "</table>")


def run_slanet_token_case() -> str:
    """SLANet token path: TableMatch (non-master walk; reference
    matcher.py:58) over synthetic structure tokens + OCR boxes."""
    from pdf_table_tpu.tasks.table_matcher import TableMatch

    c = SLANET_TOKEN_CASE
    return TableMatch()(c["tokens"], c["pred_bboxes"], c["dt_boxes"],
                        c["texts"])


def run_lore_snap_case() -> str:
    """LORE decode->snap_to_grid->cell HTML on synthetic head output
    (reference post_process_bbox_and_logits grid-snap path,
    ocr_table_structure_task.py:393-485)."""
    from pdf_table_tpu.entity.ocr_cell import OcrCell
    from pdf_table_tpu.models.lore.config import LoreConfig
    from pdf_table_tpu.models.lore.processor import LorePostProcessor
    from pdf_table_tpu.tasks.table_to_html import OcrTableToHtmlTask

    raw, meta = make_lore_raw()
    r = LorePostProcessor(LoreConfig())(raw, meta)
    assert r["cells"], "LORE post produced no cells"
    texts = []
    for cell in sorted(r["cells"],
                       key=lambda c: (c["logic"][0], c["logic"][2])):
        x1, y1, x2, y2 = cell["bbox"]
        texts.append(OcrCell.from_bbox(
            (x1 + 4, y1 + 6, min(x1 + 40, x2 - 4), y2 - 6),
            text=f"r{cell['logic'][0]}c{cell['logic'][2]}", score=0.95))
    r["offset"] = (0, 0)
    return OcrTableToHtmlTask()(r, texts)


def run_xlsx_case(td: str) -> str:
    """HTML table (with spans) -> xlsx -> extracted sheet XML (the
    deterministic core of the tablepyxl-equivalent writer; zip metadata
    carries timestamps so the golden pins the worksheet part, not the
    container bytes)."""
    import zipfile

    from pdf_table_tpu.utils.xlsx_writer import html_table_to_xlsx

    html = ('<table><tr><td colspan="2">head</td><td>h3</td></tr>'
            '<tr><td>a</td><td rowspan="2">tall</td><td>c</td></tr>'
            "<tr><td>d</td><td>f</td></tr></table>")
    path = os.path.join(td, "golden.xlsx")
    html_table_to_xlsx(html, path)
    with zipfile.ZipFile(path) as z:
        return z.read("xl/worksheets/sheet1.xml").decode("utf-8")


def run_compare_case() -> str:
    """Result-compare diff report over a garbled-text + span-mismatch pair
    (reference TableResultCompare, table_result_compare.py:28)."""
    import json

    from pdf_table_tpu.tasks.result_compare import check_pred_table_html

    flag, metric = check_pred_table_html(*COMPARE_CASE)
    return json.dumps(
        {"flag": flag, "check_type": metric["check_type"],
         "cell_text_diffs": metric["cell_text_diffs"],
         "cell_structure_diffs": metric["cell_structure_diffs"],
         "report": metric["diff_report_html"]},
        indent=1, sort_keys=True, ensure_ascii=False) + "\n"


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

DIGITAL_CASES: Dict[str, Callable[[str], str]] = {
    "digital_simple": build_digital_simple,
    "digital_multi_table": build_digital_multi_table,
    "digital_text_only": build_digital_text_only,
    "digital_cjk": build_digital_cjk,
    "digital_wide": build_digital_wide,
    "digital_spans": build_digital_spans,
    "digital_numeric": build_digital_numeric,
    "digital_multipage": build_digital_multipage,
}

FLAVOR_CASES = {
    "lattice_ruled": (build_flavor_ruled, "lattice"),
    "stream_unruled": (build_flavor_unruled, "stream"),
    "pdf_ruled": (build_flavor_ruled, "pdf"),
    "pdf_spans": (build_digital_spans, "pdf"),   # span inference, pdf flavor
}

SCANNED_CASES = {
    "scanned_wired": 0.0,
    "scanned_deskew": 1.6,     # small-angle skew -> preprocess deskew
    "scanned_rot90": 90.0,     # quarter-turn page -> transposed grid
}

SPECIAL_CASES = {
    "token_master": lambda td: run_token_case(),
    "token_slanet": lambda td: run_slanet_token_case(),
    "lore_snap": lambda td: run_lore_snap_case(),
    "xlsx_sheet": run_xlsx_case,
    "compare_report": lambda td: run_compare_case(),
}


def all_case_names() -> List[str]:
    return (list(DIGITAL_CASES) + list(FLAVOR_CASES) + list(SCANNED_CASES)
            + list(SPECIAL_CASES))


def run_case(name: str, td: str) -> str:
    """Build + run one case; returns the produced artifact string."""
    if name in DIGITAL_CASES:
        pdf = DIGITAL_CASES[name](td)
        return run_digital_case(pdf, os.path.join(td, "out_" + name))
    if name in FLAVOR_CASES:
        build, flavor = FLAVOR_CASES[name]
        return run_flavor_case(build(td), flavor)
    if name in SCANNED_CASES:
        return run_scanned_case(make_scanned_grid(SCANNED_CASES[name]))
    if name in SPECIAL_CASES:
        return SPECIAL_CASES[name](td)
    raise KeyError(name)


_EXTS = {"lattice_ruled": ".csv", "stream_unruled": ".csv",
         "xlsx_sheet": ".xml", "compare_report": ".json"}


def expected_path(name: str) -> str:
    return os.path.join(EXPECTED_DIR, name + _EXTS.get(name, ".html"))


def load_expected(name: str) -> str:
    with open(expected_path(name), encoding="utf-8") as f:
        return f.read()
