"""Column-expression function library (SURVEY.md §2.2 / §2.8).

Everything here returns pyspark Column expressions (JVM-side, codegen'd) —
the engine's hot path has no Python UDFs. Pandas-UDF variants exist only
where semantics genuinely need Python (see functions.udfs).
"""

from openalex_walden_spark.functions.normalize import (  # noqa: F401
    normalize_boolean,
    normalize_doi,
    normalize_license,
    normalize_title,
)
from openalex_walden_spark.functions.hashing import (  # noqa: F401
    stable_hash64,
    content_hash,
)
from openalex_walden_spark.functions.textstats import (  # noqa: F401
    token_count,
    quality_features,
    fingerprint,
)
