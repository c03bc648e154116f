"""Pupil-labs gaze-export CSV source.

Re-expresses ``read_pl_gaze_csv`` (vedb_gaze/utils.py:12): the reference
resolves ``<session>/exports/<id><id><id>/gaze_positions.csv`` and hands
it to ``pd.read_csv``. Here the same layout resolves to a Spark CSV scan
with the canonical column set selected BY NAME and cast explicitly —
robust to exporter column reordering and extra columns, exactly like
pandas' name-based access, but distributed.

Scale note: CSV scans split by byte range but support no predicate
pushdown or column pruning at the reader level, so a pipeline ingesting
exports at volume should land them as parquet once (``load_table`` is
the query-side source); this reader is the ingest edge, not the query
path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the pupil-labs gaze_positions.csv canonical columns and their types
GAZE_CSV_COLUMNS: dict[str, str] = {
    "gaze_timestamp": "double",
    "world_index": "bigint",
    "confidence": "double",
    "norm_pos_x": "double",
    "norm_pos_y": "double",
    "base_data": "string",
    "gaze_point_3d_x": "double",
    "gaze_point_3d_y": "double",
    "gaze_point_3d_z": "double",
}


def gaze_csv_path(session_folder: str, output_id: int | str) -> str:
    """The reference's path convention: export id 0 lives in
    ``exports/000`` (utils.py:13 ``str(output_id) * 3``)."""
    return os.path.join(
        session_folder, "exports", str(output_id) * 3, "gaze_positions.csv"
    )


def read_gaze_csv(
    spark: SparkSession, session_folder: str, output_id: int | str = 0
) -> DataFrame:
    """Load a pupil-labs gaze export as a typed DataFrame. Columns are
    selected by NAME from the header (missing canonical columns surface
    as typed nulls rather than positional misreads); extra exporter
    columns are dropped."""
    raw = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(gaze_csv_path(session_folder, output_id))
    )
    cols = [
        (F.col(name) if name in raw.columns else F.lit(None))
        .cast(typ)
        .alias(name)
        for name, typ in GAZE_CSV_COLUMNS.items()
    ]
    return raw.select(*cols)
