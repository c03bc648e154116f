"""Query plans and DuckDB oracles (import submodules directly:
``vedb_gaze_spark.plans.queries``, ``.oracles``, ``.params``) —
kept lazy to avoid operators↔plans import cycles."""
