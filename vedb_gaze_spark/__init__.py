"""vedb_gaze_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the vedb/vedb-gaze pipeline, rebuilt
Spark-first for 100 TB scale.

Reference semantics: /root/reference/vedb_gaze (cited per-function as
``file:line`` in operator docstrings). Architecture: see SURVEY.md.
"""

from vedb_gaze_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
