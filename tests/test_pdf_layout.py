from mcp_local_rag_spark.operators import pdf_layout as pl


def test_assemble_text_reading_order(spark):
    # two lines: y=700 "Header Line", y=100 "bottom words"
    items = spark.createDataFrame(
        [
            ("d", 1, 50.0, 700.2, 12.0, "Header"),
            ("d", 1, 120.0, 700.4, 12.0, "Line"),
            ("d", 1, 90.0, 100.0, 10.0, "words"),
            ("d", 1, 40.0, 100.3, 10.0, "bottom"),
        ],
        "doc string, page int, x double, y double, font_size double, text string",
    )
    row = pl.assemble_text(items).first()
    assert row.text == "Header Line\nbottom words"


def test_header_footer_hints(spark):
    items = spark.createDataFrame(
        [
            ("d", 1, 10.0, 780.0, 6.0, "tiny header", 800.0),
            ("d", 1, 10.0, 20.0, 6.0, "tiny footer", 800.0),
            ("d", 1, 10.0, 400.0, 12.0, "body big", 800.0),
            ("d", 1, 10.0, 790.0, 12.0, "big header band", 800.0),
        ],
        "doc string, page int, x double, y double, font_size double, text string, page_height double",
    )
    out = {r.text: (r.is_header_hint, r.is_footer_hint) for r in pl.header_footer_hints(items).collect()}
    assert out["tiny header"] == (True, False)
    assert out["tiny footer"] == (False, True)
    assert out["body big"] == (False, False)
    # big font in the band is NOT a hint (font must be < 0.7 * median)
    assert out["big header band"] == (False, False)


def _blocks(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc string, page int, page_width double, page_height double,"
        " kind string, x0 double, y0 double, x1 double, y1 double",
    )


def test_visual_candidate_large_image(spark):
    # 100x100 image on 300x300 page = 11% of area -> candidate via largest
    rows = [("d", 1, 300.0, 300.0, "image", 100.0, 100.0, 200.0, 200.0)]
    out = pl.visual_candidates(_blocks(spark, rows)).first()
    assert out.is_candidate
    # crop = union padded by max(8% of 100pt, 12pt) = 12pt
    assert (out.crop.x0, out.crop.y0, out.crop.x1, out.crop.y1) == (88.0, 88.0, 212.0, 212.0)


def test_visual_candidate_stroke_rule_and_negative(spark):
    strokes = [("d", 2, 300.0, 300.0, "stroke", float(i), 0.0, float(i + 1), 1.0) for i in range(5)]
    tiny_img = [("d", 3, 300.0, 300.0, "image", 0.0, 0.0, 10.0, 10.0)]
    out = {r.page: r for r in pl.visual_candidates(_blocks(spark, strokes + tiny_img)).collect()}
    assert out[2].is_candidate  # 5 strokes
    assert not out[3].is_candidate  # 0.1% image, no strokes
    # page with no image blocks -> crop is full page
    assert (out[2].crop.x1, out[2].crop.y1) == (300.0, 300.0)


def test_visual_candidate_full_page_crop(spark):
    rows = [("d", 4, 100.0, 100.0, "image", 1.0, 1.0, 99.0, 99.0)]  # 96% union
    out = pl.visual_candidates(_blocks(spark, rows)).first()
    assert out.is_candidate
    assert (out.crop.x0, out.crop.y0, out.crop.x1, out.crop.y1) == (0.0, 0.0, 100.0, 100.0)
