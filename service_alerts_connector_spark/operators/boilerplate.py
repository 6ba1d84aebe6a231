"""Corpus-level boilerplate removal — drop lines that recur across many
documents (headers, footers, cookie banners) before training.

The frequent-line table is tiny relative to the corpus (it is, by
construction, lines appearing in ≥ ``min_doc_frac`` of documents), so the
removal join broadcasts.  Shuffle census at 100 TB:

1. ``posexplode(split(text))`` — narrow, no shuffle;
2. one (line, doc) ``distinct`` + groupBy(line) — the frequency count,
   map-side combined, O(total lines);
3. broadcast anti-join of exploded lines against the frequent set;
4. groupBy(doc) to reassemble — shuffle on the doc id.

The single corpus-size scalar comes from ``df.count()`` (a bounded driver
action, repo ``.collect()`` policy) rather than a literal-1 join, which
Catalyst would plan as a cross join (banned here).  Line order inside each
document is restored from the exploded position, so removal is a pure
projection of the original text.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_doc_frac: float = 0.2,
) -> DataFrame:
    """Lines occurring in at least ``ceil(min_doc_frac × n_docs)`` distinct
    documents: ``(line, n_docs)``.  Blank lines are ignored (they are
    separators, not boilerplate)."""
    n_docs = df.count()  # bounded: ONE scalar to the driver
    threshold = max(1, math.ceil(min_doc_frac * n_docs))
    lines = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    ).where(F.col("line") != "")
    return (
        lines.distinct()
        .groupBy("line")
        .agg(F.count("_doc").alias("n_docs"))
        .where(F.col("n_docs") >= threshold)
    )


def remove_frequent_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_doc_frac: float = 0.2,
    out_col: str = "cleaned",
) -> DataFrame:
    """Rewrite ``text_col`` with corpus-frequent lines removed, preserving
    the remaining lines' original order.  Documents reduced to nothing keep
    an empty string (row count is preserved)."""
    freq = frequent_lines(df, id_col, text_col, sep, min_doc_frac).select("line")
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    kept = exploded.join(F.broadcast(freq), on="line", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x.getField("line"),
            ),
            sep,
        ).alias(out_col)
    )
    return df.select(id_col).join(rebuilt, on=id_col, how="left").select(
        F.col(id_col), F.coalesce(out_col, F.lit("")).alias(out_col)
    )
