"""clickhousebackup_spark — a PySpark-native analytics engine.

Re-expresses every capability of the reference repo
(``NuraNK/clickhouseBackup``, a shell backup orchestrator — see
``SURVEY.md``) as idiomatic Spark DataFrame / SQL operators, plus the
relational surface the reference delegates to ClickHouse and the
large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §3.4): declare logical plans with the
DataFrame API, let Catalyst/Tungsten pick physical strategies; no
custom IR, no RDD surface. Python UDFs only where built-ins cannot
express the semantics, and then Arrow-vectorized.
"""

__version__ = "0.1.0"

from clickhousebackup_spark.registry import all_specs, get_spec, register  # noqa: F401
from clickhousebackup_spark.session import get_spark  # noqa: F401
from clickhousebackup_spark.tables import TABLES, load_table  # noqa: F401
