"""Scalar-function catalog (SURVEY.md §2 B/D/J) — Catalyst expressions first.

Everything here compiles to built-in Spark SQL expressions (whole-stage
codegen, no Python in the hot path). The few semantics that genuinely need
Python (urljoin-based absolutization, HTML parsing) live in
``web_scraper_spark.operators.extract`` as Arrow-vectorized pandas UDFs.
"""

from web_scraper_spark.functions.urls import (  # noqa: F401
    prepare_url,
    domain_from_url,
    canonicalize_url,
    host_of,
    GENERIC_DOMAINS,
)
from web_scraper_spark.functions.names import (  # noqa: F401
    normalize_company_name,
    best_name,
)
from web_scraper_spark.functions.phones import (  # noqa: F401
    clean_phone_number,
    normalize_phone_e164,
)
from web_scraper_spark.functions.social import (  # noqa: F401
    normalize_social_profile,
)
