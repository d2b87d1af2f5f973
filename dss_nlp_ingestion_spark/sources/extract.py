"""S13 article extraction — text-density boilerplate removal.

The reference hands fetched pages to ``newspaper3k`` (``Article.parse``
+ ``.nlp()``, src/utils/google_utils.py:76-93) to pull the article
body out of nav/footer/sidebar chrome. That library isn't in this
container, and its extraction core is exactly the kind of per-block
scoring Spark's JVM expressions handle natively — so this module
re-expresses it as a pure-column pipeline (whole-stage codegen, no
Python in the path), the Boilerpipe/jusText family heuristic:

1. split the page into block-level chunks (``p``/``div``/``li``/
   headings — flat scan; deeply nested markup degrades gracefully to
   smaller blocks);
2. per block, compute TEXT LENGTH (tags stripped) and LINK DENSITY
   (chars inside ``<a>`` / total chars);
3. keep blocks that are long enough (``min_chars``) and not
   link-dominated (``max_link_density``) — navs/footers are short or
   pure links, article paragraphs are long prose;
4. join survivors in page order.

Everything is ``regexp_extract_all`` + higher-order array functions
(``transform``/``filter``/``aggregate``) — at 100 TB this runs inside
codegen with zero shuffles and zero Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: block-level elements whose inner text is a candidate chunk; the
#: backreference keeps open/close tags paired, so a block nested in a
#: div rides inside the div's chunk instead of truncating it.
_BLOCK_RE = r"(?s)<(p|div|li|h[1-6]|article|section)[^>]*>(.*?)</\1>"
_LINK_RE = r"(?s)<a[^>]*>(.*?)</a>"


def _strip(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"<[^>]+>", ""))


def html_block_stats(col: Column) -> Column:
    """Array of structs (text, n_chars, link_chars) — one per block
    chunk of the page, in document order."""
    blocks = F.regexp_extract_all(col, F.lit(_BLOCK_RE), 2)
    return F.transform(
        blocks,
        lambda b: F.struct(
            _strip(b).alias("text"),
            F.length(_strip(b)).alias("n_chars"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_LINK_RE), 1),
                F.lit(0),
                lambda acc, a: acc + F.length(_strip(a)),
            ).alias("link_chars"),
        ),
    )


def extract_article(
    col: Column, min_chars: int = 80, max_link_density: float = 0.33
) -> Column:
    """Article body of an HTML page column: the page's block chunks
    that are ≥ ``min_chars`` of prose with link density ≤
    ``max_link_density``, joined in order with a blank line. Empty
    string when nothing survives (the miss signal, matching the
    reference's empty-article behavior)."""
    kept = F.filter(
        html_block_stats(col),
        lambda s: (s["n_chars"] >= F.lit(min_chars))
        & (
            s["link_chars"].cast("double")
            / F.greatest(s["n_chars"], F.lit(1)).cast("double")
            <= F.lit(max_link_density)
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), "\n\n")
