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
