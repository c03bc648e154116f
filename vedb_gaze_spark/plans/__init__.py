from vedb_gaze_spark.plans.queries import QUERIES, ORACLES, flagship

__all__ = ["QUERIES", "ORACLES", "flagship"]
