"""PDF layout operators over positioned-item tables (reference T5/T6/T10).

The mupdf byte-decode step needs pymupdf (not in this container), but
everything AFTER extraction is relational math over an items table
(doc, page, x, y, font_size, text) or a blocks table (page geometry) —
implemented and tested here against synthetic layouts:

  * T6 text assembly (src/parser/pdf-filter.ts:48-82): group items into
    lines by rounded Y, X-ascending within a line, lines top-down (the
    reference inverts mupdf's Y axis, src/parser/pdf-extract.ts:112).
  * T5 stage 1 header/footer hints (src/parser/pdf-filter.ts:331-403):
    items with font_size < 0.7 * page-median in the top/bottom 10% bands.
  * T10 visual-candidate detection (src/pdf-visual/detector.ts:263-309):
    page is a candidate iff largest effective image block >= 10% page area
    OR total >= 15% OR >= 5 vector strokes; crop rect = padded union
    (8% pad, min 12pt), full page when union > 85%.

All pure DataFrame ops — window/percentile/array_sort — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# T10 constants (src/pdf-visual/detector.ts:27-48)
MIN_LARGEST_IMAGE_RATIO = 0.10
MIN_TOTAL_IMAGE_RATIO = 0.15
MIN_VECTOR_STROKES = 5
CROP_PAD_RATIO = 0.08
CROP_PAD_MIN_PT = 12.0
FULL_PAGE_RATIO = 0.85

# T5 constants (src/parser/pdf-filter.ts:298-303, 331-403)
SMALL_FONT_RATIO = 0.7
EDGE_BAND_RATIO = 0.10


def assemble_text(
    items: DataFrame,
    *,
    doc_col: str = "doc",
    page_col: str = "page",
    y_round: int = 0,
) -> DataFrame:
    """(doc, page, x, y, font_size?, text) -> (doc, page, text).

    Lines = items sharing rounded Y; within a line X ascending; lines in
    reading order (Y descending — PDF origin is bottom-left after the
    reference's inversion). array_sort over collected structs keeps the
    whole assembly deterministic and shuffle-minimal (one groupBy).
    """
    line_items = items.groupBy(
        doc_col, page_col, F.round(F.col("y"), y_round).alias("_line_y")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("x"), F.col("text")))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("_line_text")
    )
    pages = line_items.groupBy(doc_col, page_col).agg(
        F.array_join(
            F.reverse(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_line_y"), F.col("_line_text")))),
                    lambda s: s["_line_text"],
                )
            ),
            "\n",
        ).alias("text")
    )
    return pages


def header_footer_hints(
    items: DataFrame,
    *,
    doc_col: str = "doc",
    page_col: str = "page",
    page_height_col: str = "page_height",
) -> DataFrame:
    """Stage-1 block hints: small-font items in the top/bottom 10% bands.

    Output: (doc, page, y, text, is_header_hint, is_footer_hint).
    Median font size per page via exact percentile (A7).
    """
    med = items.groupBy(doc_col, page_col).agg(
        F.percentile("font_size", F.lit(0.5)).alias("_med_font")
    )
    joined = items.join(med, [doc_col, page_col])
    small = F.col("font_size") < SMALL_FONT_RATIO * F.col("_med_font")
    top_band = F.col("y") >= (1 - EDGE_BAND_RATIO) * F.col(page_height_col)
    bottom_band = F.col("y") <= EDGE_BAND_RATIO * F.col(page_height_col)
    return joined.select(
        doc_col,
        page_col,
        "y",
        "text",
        (small & top_band).alias("is_header_hint"),
        (small & bottom_band).alias("is_footer_hint"),
    )


def visual_candidates(
    blocks: DataFrame,
    *,
    doc_col: str = "doc",
    page_col: str = "page",
) -> DataFrame:
    """T10 page rule over a blocks table:
    (doc, page, page_width, page_height, kind['image'|'stroke'],
     x0, y0, x1, y1).

    Output per page: is_candidate, crop rect (padded union of image blocks,
    full page if the union covers > 85%).
    """
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    page_area = F.col("page_width") * F.col("page_height")
    img = F.col("kind") == "image"
    agg = blocks.groupBy(doc_col, page_col).agg(
        F.max("page_width").alias("page_width"),
        F.max("page_height").alias("page_height"),
        F.max(F.when(img, area)).alias("_largest_img"),
        F.sum(F.when(img, area).otherwise(F.lit(0.0))).alias("_total_img"),
        F.sum(F.when(~img, 1).otherwise(0)).alias("_strokes"),
        F.min(F.when(img, F.col("x0"))).alias("_ux0"),
        F.min(F.when(img, F.col("y0"))).alias("_uy0"),
        F.max(F.when(img, F.col("x1"))).alias("_ux1"),
        F.max(F.when(img, F.col("y1"))).alias("_uy1"),
    )
    pa = F.col("page_width") * F.col("page_height")
    is_cand = (
        (F.coalesce(F.col("_largest_img") / pa, F.lit(0.0)) >= MIN_LARGEST_IMAGE_RATIO)
        | (F.col("_total_img") / pa >= MIN_TOTAL_IMAGE_RATIO)
        | (F.col("_strokes") >= MIN_VECTOR_STROKES)
    )
    union_area = (F.col("_ux1") - F.col("_ux0")) * (F.col("_uy1") - F.col("_uy0"))
    pad = F.greatest(
        CROP_PAD_RATIO * F.greatest(F.col("_ux1") - F.col("_ux0"), F.col("_uy1") - F.col("_uy0")),
        F.lit(CROP_PAD_MIN_PT),
    )
    full_page = (union_area / pa) > FULL_PAGE_RATIO
    crop = F.when(
        F.col("_ux0").isNull() | full_page,
        F.struct(
            F.lit(0.0).alias("x0"), F.lit(0.0).alias("y0"),
            F.col("page_width").alias("x1"), F.col("page_height").alias("y1"),
        ),
    ).otherwise(
        F.struct(
            F.greatest(F.col("_ux0") - pad, F.lit(0.0)).alias("x0"),
            F.greatest(F.col("_uy0") - pad, F.lit(0.0)).alias("y0"),
            F.least(F.col("_ux1") + pad, F.col("page_width")).alias("x1"),
            F.least(F.col("_uy1") + pad, F.col("page_height")).alias("y1"),
        )
    )
    return agg.select(
        doc_col, page_col, is_cand.alias("is_candidate"), crop.alias("crop"),
        (F.col("_total_img") / pa).alias("image_ratio"),
        F.col("_strokes").alias("n_strokes"),
    )
