"""Named query plans.

Importing this package populates the registry (``QUERIES`` /
``ORACLES``) consumed by ``__spark_entry__.py``.
"""

from dss_nlp_ingestion_spark.plans.registry import ORACLES, QUERIES  # noqa: F401

# Import for registration side effects — each module registers its
# queries at import time.
from dss_nlp_ingestion_spark.plans import core_relational  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import text_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import dedup_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import similarity_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import nlp_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import multimodal_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import misc_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import sql_surface  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import rollup_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import fulltext_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import sampling_queries  # noqa: F401,E402


def _rotate_for_driver_sample() -> None:
    """Order the registry so queries WITHOUT a green driver
    correctness row (CORRECTNESS_r*.json in the repo root) come first.

    The driver verifies a fixed-size sample of ``queries()`` per
    round; surfacing not-yet-green queries first rotates hard driver
    coverage across rounds until every query has at least one green
    row. "Green" = the LATEST sampled row hash-matched (or, for
    rows-only queries with no oracle, produced rows without error) —
    keying on "sampled" alone would park a query that errored before
    its oracle existed at the back forever (r3 lesson:
    ``tryadd_exact_dedup``). Self-maintaining: each round's file
    updates the green set; a missing/unreadable file means no
    reordering."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    latest: dict[str, dict] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            for name, row in json.loads(p.read_text()).items():
                latest[name] = row
        except (OSError, ValueError, AttributeError):
            pass
    if not latest:
        return

    def _green(row: dict) -> bool:
        if not isinstance(row, dict):
            return False
        if row.get("hash_match") is True:
            return True
        # rows-only queries (no oracle): green iff sampled cleanly.
        return row.get("err") is None and row.get("spark_rows") is not None

    green = {n for n, row in latest.items() if _green(row)}
    order = sorted(QUERIES, key=lambda n: n in green)  # stable sort
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_rotate_for_driver_sample()
