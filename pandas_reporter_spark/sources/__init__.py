"""Source/sink adapters (SURVEY §2.1 S1-S13).

Everything network-shaped is cache-first with an injectable fetcher so
the test suite and the driver run fully offline against committed
fixtures; the live paths use stdlib urllib only (no third-party HTTP
dependency).
"""

from pandas_reporter_spark.sources.url import CensusReporterURL, URLError  # noqa: F401
from pandas_reporter_spark.sources.crjson import (  # noqa: F401
    cr_columns,
    cr_rows,
    cr_frame,
    get_cr_dataframe,
)
from pandas_reporter_spark.sources.citation import make_citation_dict  # noqa: F401
from pandas_reporter_spark.sources.varrep import (  # noqa: F401
    get_ave_weight,
    get_k_val_f,
    moe_from_replicates,
    varrep_frame,
)
