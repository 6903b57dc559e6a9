"""Bucketed storage for co-located joins (SURVEY 'optimize for scale':
pre-partitioning / bucketing so repeated big-big joins skip the
shuffle).

``write_bucketed`` saves a table bucketed+sorted by the join key;
``bucketed_source`` reads it back.  Two tables bucketed into the same
number of buckets on their join key sort-merge-join with NO Exchange on
either side — at 100 TB that turns the dominant repeated-join cost into
a scan (verify with .explain: no `Exchange hashpartitioning` under the
SortMergeJoin).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from conduino_spark.plans.core import SEQ, Sink, Source


def write_bucketed(table: str, key: str, *, buckets: int = 32,
                   sort: bool = True) -> Sink:
    """Sink: persist the stream as a bucketed managed table."""

    def run(df: DataFrame):
        d = df.drop(SEQ) if SEQ in df.columns else df
        w = d.write.mode("overwrite").bucketBy(buckets, key)
        if sort:
            w = w.sortBy(key)
        w.saveAsTable(table)
        return table

    return Sink(run, name=f"write_bucketed({table})")


def bucketed_source(table: str, *, seq_col: Optional[str] = None) -> Source:
    """Source over a bucketed table; joins on the bucket key need no
    shuffle when bucket counts match."""

    def fn(spark: SparkSession) -> DataFrame:
        df = spark.table(table)
        if seq_col:
            from conduino_spark.plans.core import with_seq_from
            df = with_seq_from(df, seq_col)
        return df

    return Source(fn, name=f"bucketed({table})")
