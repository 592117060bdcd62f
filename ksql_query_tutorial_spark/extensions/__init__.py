"""Extension query catalog: the LLM-training-data-pipeline
operators (dedup / similarity / text analysis / corpus curation /
multimodal / events / graph / privacy / retail analytics) as declared
queries over the driver fixtures, with DuckDB oracles where the
semantics are SQL-expressible (otherwise the driver's rows-only check
applies: IVF/PQ-ANN with learned centroids).

Split into per-family modules in r7 (VERDICT r6 #3) — importing them
here in dependency order populates the shared registries in
``_registry``; ``from ksql_query_tutorial_spark.extensions import X``
keeps working for every name the monolith exported.

Thresholds are calibrated to the fixtures: document near-dups are
planted with shingle-Jaccard >= 0.5 (noise pairs < 0.1), embedding
near-neighbors peak at cosine ~ 0.51 — so jaccard_threshold=0.5 and
cosine_threshold=0.4 select the planted structure.
"""

from ._registry import EXTENSION_ORACLES, EXTENSION_QUERIES  # noqa: F401
from ._shared import *  # noqa: F401,F403,E402
from .text_q import *  # noqa: F401,F403,E402
from .dedup_q import *  # noqa: F401,F403,E402
from .similarity_q import *  # noqa: F401,F403,E402
from .joins_q import *  # noqa: F401,F403,E402
from .mm_q import *  # noqa: F401,F403,E402
from .corpus_q import *  # noqa: F401,F403,E402
from .events_q import *  # noqa: F401,F403,E402
from .graph_q import *  # noqa: F401,F403,E402
from .privacy_q import *  # noqa: F401,F403,E402
from .retail_q import *  # noqa: F401,F403,E402
