"""zoom_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the kippnorcal/zoom reference connector
(see /root/reference), re-expressed Spark-first, plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Design principles (SURVEY.md §4, §7):
  * DataFrame/SQL declarative plans — let Catalyst optimize (pushdown,
    pruning, join selection, AQE).
  * Shuffle-aware: broadcast small dims, partial aggregation, no
    driver-side loops over collect() in the data plane.
  * Python only at the edges: Arrow-batched pandas UDFs / mapInPandas
    where built-ins genuinely cannot express the semantics.
"""

from zoom_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
