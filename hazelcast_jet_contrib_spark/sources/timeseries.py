"""Time-series measurement connector shape (reference: InfluxDB source,
`influxdb/.../InfluxDbSources.java:79-136`): run a query against a
time-series store, stream results in bounded chunks, and project each
series row via a `(name, tags, columns, values)` projection
(`MeasurementProjection.java:38`) or map to a typed record (the POJO
path, `InfluxDbSources.java:167-221` — which becomes our explicit
StructType).

Output is the long/narrow measurement layout (SURVEY.md §1.1):
``(measurement string, tag string, time timestamp, field string,
val double)`` — one row per (point, field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.sources.builder import batch_source


def measurement_source(
    spark: SparkSession,
    name: str,
    path: str,
    measurement: str,
    time_col: str,
    tag_col: str,
    field_cols: list[str],
    time_from: str | None = None,
    time_to: str | None = None,
) -> DataFrame:
    """Read a measurement from a time-series store as long-format rows.
    The optional time range is pushed into the client scan (the analog of
    putting `WHERE time > ...` in the InfluxQL query text,
    InfluxDbSources.java:57)."""

    import pyarrow.parquet as pq

    n_groups = max(1, pq.ParquetFile(path).metadata.num_row_groups)

    def search(client, part, flt, proj):
        import pandas as pd
        import pyarrow.dataset as ds

        lo, hi = flt
        dataset = ds.dataset(path, format="parquet")
        expr = None
        if lo is not None:
            expr = ds.field(time_col) >= pd.Timestamp(lo)
        if hi is not None:
            e = ds.field(time_col) < pd.Timestamp(hi)
            expr = e if expr is None else (expr & e)
        fragment = next(iter(dataset.get_fragments())).split_by_row_group()[int(part)]
        tbl = fragment.to_table(columns=[time_col, tag_col, *field_cols], filter=expr)
        pdf = tbl.to_pandas()
        # nanosecond store precision -> Spark's microsecond TimestampType
        # (explicit truncation; Arrow rejects an implicit lossy cast)
        pdf[time_col] = pdf[time_col].dt.floor("us")
        # long format: one output row per (point, field) — the reference's
        # series iteration emits one projected item per row+column set
        # (InfluxDbSources.java:293-308)
        frames = []
        for fc in field_cols:
            frames.append(
                pd.DataFrame(
                    {
                        "measurement": measurement,
                        "tag": pdf[tag_col].astype(str),
                        "time": pdf[time_col],
                        "field": fc,
                        "val": pdf[fc].astype(float),
                    }
                )
            )
        yield pd.concat(frames, ignore_index=True)

    return batch_source(
        name,
        schema="measurement string, tag string, time timestamp, field string, val double",
        search_fn=search,
        partitions=list(range(n_groups)),
        filter=(time_from, time_to),
    ).build(spark)
