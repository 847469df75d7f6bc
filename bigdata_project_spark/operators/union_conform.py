"""Conformed UNION ALL with a discriminator column (SURVEY.md §2.7 U1).

The reference's silver tables are built as 3-way ``UNION ALL`` of per-zone
tables, each branch tagged with a literal ``zone_level``
('distrito'/'municipio'/'gau') — silver/mitma/mitma_od.py:35-110,
mitma_overnights.py:42-62, mitma_people_day.py:44-69.

Scale note: union is a zero-shuffle operator in Spark — branches are
concatenated at the partition level, and Catalyst pushes filters/projections
down into each branch independently, so a filter on the discriminator
prunes whole branches at plan time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_conform(
    branches: dict[str, DataFrame],
    discriminator: str = "zone_level",
) -> DataFrame:
    """UNION ALL the branch DataFrames, tagging each row with its branch name."""
    tagged = [
        df.withColumn(discriminator, F.lit(name)) for name, df in branches.items()
    ]
    return reduce(DataFrame.unionByName, tagged)
