"""Registry bootstrap: importing this module populates
``mathorcup_spark.registry.REGISTRY`` with every declared query.

Add new operator modules here as they land (SURVEY.md §7 milestones).
"""

from ..functions import cars, cluster, corpus, dedup, multimodal, scalar, similarity, text  # noqa: F401
from ..ml import checks, graph_embed, pipelines  # noqa: F401
from ..operators import (  # noqa: F401
    analytics,
    graph,
    lake,
    metrics,
    relational,
    sampling,
    suites,
    temporal,
    tpch_more,
)
from ..streaming import windows  # noqa: F401

# digest builds its oracles FROM already-registered members, so it must
# import after every member module above (including suites/windows)
from ..operators import digest  # noqa: F401  isort: skip

_ALL = [
    cars, cluster, corpus,
    relational, scalar, metrics, sampling, graph, temporal, analytics,
    tpch_more, text, dedup, similarity, multimodal, windows, pipelines,
    checks, graph_embed, lake, suites, digest,
]
