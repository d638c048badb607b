"""PDF embedded-picture extraction: /Image XObject placements through the
CTM (pdfx/content.py Do handler).

Reference parity: docling emits PictureItems from its NN layout model
(docling/models/layout_model.py clusters picture regions); for
digital-born PDFs the same regions are declared as image XObjects, so
this deterministic path reproduces the reference's groundtruth bboxes on
its own `picture_classification.pdf` fixture to IoU > 0.9 — no NN.
"""

from __future__ import annotations

import json

from docling_spark.ops.corpus import synth_pdf_images_bytes
from docling_spark.pdfx.extract import extract_pdf_text

REF = "/root/reference/tests/data/pdf"
GT = "/root/reference/tests/data/groundtruth/docling_v2"


def test_synth_law_all_fields():
    for d in (0, 1, 2, 7, 17, 31):
        r = extract_pdf_text(synth_pdf_images_bytes(d), with_pictures=True)
        assert r.status == "success"
        n = 1 + d % 3
        assert len(r.pictures) == n
        for k, p in enumerate(r.pictures):
            assert p["page"] == 1
            assert p["width"] == 8 * (1 + (d + k) % 4) and p["height"] == 8
            x, y = 72 + 20 * k, 100 + 30 * k
            assert p["bbox"] == (x, y, x + 100 + 10 * k, y + 50 + 5 * k)
            assert p["filters"] == (
                ["DCTDecode"] if k % 2 == 0 else ["FlateDecode"]
            )


def test_flag_gated():
    r = extract_pdf_text(synth_pdf_images_bytes(5))
    assert r.status == "success" and r.pictures is None


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def test_reference_groundtruth_iou():
    """XObject bboxes vs the reference's NN-layout PictureItem prov on its
    own fixture: each groundtruth picture is matched by one of ours."""
    blob = open(f"{REF}/picture_classification.pdf", "rb").read()
    r = extract_pdf_text(blob, with_pictures=True)
    assert r.status == "success"
    gt = json.load(open(f"{GT}/picture_classification.json"))
    gt_boxes = [
        (pr["page_no"], (pr["bbox"]["l"], pr["bbox"]["b"], pr["bbox"]["r"], pr["bbox"]["t"]))
        for pic in gt["pictures"]
        for pr in pic["prov"]
    ]
    assert len(gt_boxes) == 2
    for page_no, box in gt_boxes:
        best = max(
            (_iou(box, p["bbox"]) for p in r.pictures if p["page"] == page_no),
            default=0.0,
        )
        assert best > 0.9, (page_no, box, best)


def test_reference_corpus_counts():
    """Stable picture counts across the reference PDF corpus (regression
    pin for the Do-handler and inline-image skip)."""
    expected = {
        "2305.03393v1-pg9.pdf": 0,
        "amt_handbook_sample.pdf": 9,
        "picture_classification.pdf": 2,
        "right_to_left_02.pdf": 1,
        "right_to_left_03.pdf": 1,
    }
    for name, n in expected.items():
        r = extract_pdf_text(open(f"{REF}/{name}", "rb").read(), with_pictures=True)
        assert len(r.pictures or []) == n, (name, len(r.pictures or []))
