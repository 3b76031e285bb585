"""Declared operator inventory (SURVEY.md §2B + LLM-pipeline ops).

Importing this package populates the registry in ``ps_datalake_spark.registry``.
"""

from . import relational  # noqa: F401
from . import relational_ext  # noqa: F401
from . import functions_ext  # noqa: F401
from . import tpch_like  # noqa: F401
from . import tpch_full  # noqa: F401
from . import windows_ext  # noqa: F401
from . import sampling_rollup  # noqa: F401
from . import analytics  # noqa: F401
from . import sql_surface  # noqa: F401
from . import semi_structured  # noqa: F401
from . import event_windows  # noqa: F401
from . import llm_ops  # noqa: F401
from . import pipeline_ext  # noqa: F401
from . import pipeline_pack  # noqa: F401
from . import temporal_pack  # noqa: F401
from . import warehouse_pack  # noqa: F401
from . import retrieval_pack  # noqa: F401
from . import curation_pack  # noqa: F401
from . import tokenize_pack  # noqa: F401
from . import boilerplate_pack  # noqa: F401
from . import assembly_pack  # noqa: F401
from . import semantic_pack  # noqa: F401
from . import sketch_pack  # noqa: F401
from . import robust_pack  # noqa: F401
from . import eval_pack  # noqa: F401
from . import lake_ops  # noqa: F401
