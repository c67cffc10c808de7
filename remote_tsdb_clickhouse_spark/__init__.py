"""PySpark-native time-series analytics engine.

A brand-new Spark-first implementation of the query and data-processing
capabilities of the reference adapter ``jamessanford/remote-tsdb-clickhouse``
(a Prometheus remote-storage adapter for ClickHouse), plus the operators a
large-scale (100 TB) training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

Design stance (see SURVEY.md):
- The reference's "engine" is ClickHouse; its intellectual content is the
  time-series data model, the Prometheus matcher->SQL translation, the
  hint-driven downsampling policy, and row-stream->series regrouping.
- Here the engine is Spark: matchers compile to Catalyst ``Column``
  predicates, downsampling is a floor-aligned bucket expression, and series
  regrouping is a declarative ``collect_list(struct(t, v))`` aggregation --
  no global sort, no driver-side loops.
"""

from remote_tsdb_clickhouse_spark.model import SAMPLES_SCHEMA, SAMPLES_FIELDS
from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
from remote_tsdb_clickhouse_spark.plans.read_plan import (
    ReadHints,
    ReadQuery,
    downsample_interval_seconds,
    read_query_df,
)

__all__ = [
    "SAMPLES_SCHEMA",
    "SAMPLES_FIELDS",
    "LabelMatcher",
    "MatcherType",
    "ReadHints",
    "ReadQuery",
    "downsample_interval_seconds",
    "read_query_df",
]

__version__ = "0.1.0"
