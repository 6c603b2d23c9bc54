"""The E->T->L pipeline abstraction (SURVEY.md §3).

The reference prescribes one connector = one script with three stages
(/root/reference/README.md:20-23,62,73-84). Here a connector is a
declarative ``Pipeline``: a source (any DataFrame-producing callable), a
chain of transforms (DataFrame -> DataFrame), and an audited, validated
sink. The pipeline object builds ONE lazy logical plan — Catalyst sees
extract, transform and load together and optimizes across them (filter
pushdown into the source, pruned columns never fetched).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.sink import InsertReport, validated_insert

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """A declarative connector: extract -> transform* -> load.

    >>> pipe = (Pipeline(name="items", source=read_items)
    ...         .transform(drop_empty)
    ...         .transform(sanitize_fields))
    >>> report = pipe.run(spark, base_dir="/data/lake")   # -> items_raw
    """

    name: str
    source: Callable[[SparkSession], DataFrame]
    transforms: list[Transform] = field(default_factory=list)

    def transform(self, fn: Transform) -> "Pipeline":
        self.transforms.append(fn)
        return self

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The composed lazy plan (no execution)."""
        df = self.source(spark)
        for fn in self.transforms:
            df = fn(df)
        return df

    def run(
        self, spark: SparkSession, base_dir: str, mode: str = "append"
    ) -> InsertReport:
        """Execute extract->transform->load with insert validation
        (README.md:33,106) into ``<name>_raw`` (README.md:27)."""
        return validated_insert(self.dataframe(spark), self.name, base_dir, mode)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Physical-plan text (for plan assertions in tests/benchmarks)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )
