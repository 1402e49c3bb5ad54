"""Drop-zone ingest as a Structured Streaming file source.

Reference behavior: a cron-driven poll "checks whether new files are
available" and no-ops when nothing changed (scripts/sync.py:142-156;
README.md:388-400 cron ``2 2 * * *``), with done-signal files providing
exactly-once, resumable semantics (luigi-pipeline/luigi_commons.py:
38-109). The idiomatic Spark equivalents:

- new-file detection  -> file-source stream, ``trigger(availableNow)``
- done-signals        -> the stream checkpoint (offsets = processed files)
- force re-run        -> delete the checkpoint dir (remove_done_files.sh:3)
- exactly-once sink   -> idempotent ``foreachBatch`` / file-sink commit log
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dropzone_stream(spark: SparkSession, dropzone: str,
                    schema: T.StructType | str, *, sep: str = "\t",
                    header: bool = True) -> DataFrame:
    """Streaming scan of delimited files landing in a drop zone."""
    return (spark.readStream
            .option("sep", sep).option("header", header)
            .option("quote", '"').option("nullValue", "")
            .schema(schema)
            .csv(dropzone))


def run_available_now(stream_df: DataFrame, checkpoint: str, out_dir: str,
                      fmt: str = "parquet") -> None:
    """Process exactly the files available now, then stop — the streaming
    equivalent of one cron tick. Re-running with the same checkpoint
    processes only files that arrived since the last tick (no-op when
    nothing changed)."""
    q = (stream_df.writeStream
         .format(fmt)
         .option("checkpointLocation", checkpoint)
         .option("path", out_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_foreach_batch(stream_df: DataFrame, checkpoint: str, fn) -> None:
    """availableNow tick with a custom idempotent sink. ``fn(df, epoch)``
    must be idempotent per epoch id for exactly-once semantics."""
    q = (stream_df.writeStream
         .foreachBatch(fn)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
