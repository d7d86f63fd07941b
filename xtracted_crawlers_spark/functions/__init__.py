"""Stable public column-function API: everything a pipeline author needs,
re-exported from the implementing modules. All JVM-side expressions
unless explicitly an Arrow UDF."""

from ..extract import extract_udf, with_extraction  # noqa: F401  (Arrow UDF)
from ..operators.textops import (  # noqa: F401
    fingerprint,
    lang_id,
    occurrences,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_count,
)
from ..urlnorm import (  # noqa: F401
    host,
    netloc,
    root_url,
    salted_host,
    seen_key,
    url_id,
    url_type,
)
