"""Exactly-once file sink via foreachBatch (SURVEY §2.12 production notes).

Spark's streaming file sink is already exactly-once via its commit log, but
object-store deployments often need custom layouts/upserts; the standard
recipe is foreachBatch + an idempotent write keyed by batch_id: replaying a
micro-batch after a crash overwrites its own output instead of duplicating
it. State lives in the checkpoint; the sink directory is the contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_batch_writer(path: str):
    """Returns a foreachBatch function writing each micro-batch to its own
    batch_id=N subdirectory with overwrite — replay-safe (idempotent per
    batch), so the pipeline is exactly-once end-to-end."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(path, f"batch_id={batch_id}"))

    return write_batch


def run_foreach_batch(df: DataFrame, path: str, checkpoint: str) -> None:
    """Drive a streaming frame through the idempotent foreachBatch sink to
    completion (test harness; production would leave the query running)."""
    q = (
        df.writeStream.foreachBatch(idempotent_batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
