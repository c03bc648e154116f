"""Streaming twins: file-source → memory-sink with AvailableNow must equal
the same plan run in batch over the same parquet."""

import pytest

from vedb_gaze_spark.sources.tables import load_table
from vedb_gaze_spark.streaming.sessions import streaming_rate, streaming_sessionize


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.mark.parametrize("op", [streaming_sessionize, streaming_rate])
def test_streaming_matches_batch(op, spark, sf_dir):
    import pyspark.sql.functions as F

    batch = load_table(spark, "events", sf_dir)
    # the file source needs a directory; glob down to the events file and
    # normalize the int64-nanos ts like the batch loader does
    stream_raw = (
        spark.readStream.schema("event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    name = f"mem_{op.__name__}"
    q = _run_stream(op(stream_raw), name)
    try:
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        want = {tuple(r) for r in op(batch).collect()}
        assert got == want
        assert len(want) > 0
    finally:
        q.stop()
