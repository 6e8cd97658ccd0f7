"""Column-level functions: probabilistic aggregation, hashing, text
analysis, vector math. All built on JVM-side `pyspark.sql.functions`
expressions (whole-stage-codegen'd) — no Python UDFs in the hot path.
"""

from hazelcast_jet_contrib_spark.functions.probabilistic import (
    DEFAULT_PRECISION,
    hash64,
    hyper_log_log,
    precision_to_rsd,
)

__all__ = [
    "DEFAULT_PRECISION",
    "hash64",
    "hyper_log_log",
    "precision_to_rsd",
]
