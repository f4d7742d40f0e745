"""Driver-side logging helpers for harness scripts (bench, tools).

Not used by the library itself — operators never touch log config.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def silence_benign_scheduler_spam(spark: SparkSession) -> None:
    """Raise the DAGScheduler logger to FATAL.

    Local-mode Spark has a known benign race: unpersisting a cached
    frame while straggler tasks of an already-completed stage finish
    logs ``ERROR DAGScheduler ... Failed to update accumulator ...
    non-existent accumulator`` — rc=0, results unaffected, but every
    bench/correctness artifact tail fills with noise that buries real
    errors.  Genuine job failures still surface as driver exceptions
    (and through every other logger), so scoping ONE logger to FATAL
    in measurement scripts costs nothing.  Best-effort: silently a
    no-op if the log4j2 core API is absent.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:  # noqa: BLE001 — logging config must never fail a run
        pass
