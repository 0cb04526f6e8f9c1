"""Prepared / parameterized query surface (SURVEY.md §3.2).

The reference speaks the Postgres extended protocol: PARSE caches a
statement with $n placeholders, BIND supplies values, EXECUTE runs it
(/root/reference/src/network/postgres/postgres_network_commands.cpp:221-485).
Spark-first re-expression — two layers:

- ``PreparedSql``: named-placeholder SQL executed through Spark's own
  server-side parameterized-query binding (``spark.sql(text, args=…)``,
  SPARK-41271): parameters are bound as typed literals AFTER parsing,
  so a string parameter can never splice into the statement text
  (the injection guarantee the extended protocol exists to give), and
  the statement text itself is parsed once per execute by Catalyst —
  plan caching is deliberately left to Catalyst/AQE, which re-optimize
  per binding (a constant that lands on a partition filter or a
  broadcast threshold SHOULD re-plan; the reference's cached physical
  plan cannot adapt that way).
- ``prepare``: the same contract over a DataFrame-building function —
  bind-time arguments become plan literals, so repeated executions with
  new parameters rebuild only the logical plan object, never the
  input scan graph.

Both return DataFrames, composing with every operator in the engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PreparedSql:
    """PARSE result: statement text with :name placeholders.

    ``tables`` maps ``{name}`` references in the text to DataFrames
    (Spark's SQL-formatter substitution, SPARK-44140) so a prepared
    statement can close over plan objects instead of global temp views —
    the reference's portal binds to a catalog snapshot the same way.
    """

    spark: SparkSession
    text: str
    defaults: dict[str, Any] = field(default_factory=dict)
    tables: dict[str, DataFrame] = field(default_factory=dict)

    def execute(self, **params: Any) -> DataFrame:
        """BIND + EXECUTE: named args become typed literal bindings."""
        args = {**self.defaults, **params}
        return self.spark.sql(self.text, args=args, **self.tables)


def prepare_sql(
    spark: SparkSession,
    text: str,
    tables: dict[str, DataFrame] | None = None,
    **defaults: Any,
) -> PreparedSql:
    return PreparedSql(spark, text, dict(defaults), dict(tables or {}))


@dataclass
class PreparedPlan:
    """A prepared DataFrame pipeline: builder(spark, **params) → DF."""

    spark: SparkSession
    builder: Callable[..., DataFrame]
    defaults: dict[str, Any] = field(default_factory=dict)

    def execute(self, **params: Any) -> DataFrame:
        args = {**self.defaults, **params}
        return self.builder(self.spark, **args)


def prepare(
    spark: SparkSession, builder: Callable[..., DataFrame], **defaults: Any
) -> PreparedPlan:
    return PreparedPlan(spark, builder, dict(defaults))
