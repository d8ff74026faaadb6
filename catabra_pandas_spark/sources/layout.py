"""Physical data layout: Z-order (Morton) clustering for multi-column
min-max pruning.

Why this is a first-class operator at 100 TB: parquet/ORC scans prune row
groups and files by column min/max statistics, but statistics only help if
the data is CLUSTERED on the filtered columns.  A sort on (a, b) clusters
perfectly on `a` and barely on `b`; interleaving the bits of both columns
into one Morton code and range-partitioning + sorting on it gives every
filtered column locality proportional to its share of the code — the same
trick behind Delta/Iceberg's OPTIMIZE ZORDER, here as a plain DataFrame
transformation + ordinary parquet write.

Everything is integer codegen arithmetic (one small min/max aggregate job
for normalization bounds, then shifts/masks) — no UDFs, deterministic, and
the z-value expression is SQL-replayable for oracle checks.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F

from ..util import as_list


def zorder_value(
    scaled_cols: Sequence[Column],
    bits: int = 16,
) -> Column:
    """Morton code of pre-scaled integer columns (each in [0, 2**bits)):
    bit b of column i lands at position b * ncols + i.  ncols * bits must
    fit a signed long (<= 63)."""
    ncols = len(scaled_cols)
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(scaled_cols):
        x = c.cast("long")
        for b in range(bits):
            bit = F.shiftright(x, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return z


def zorder_scale(col: Column, cmin, cmax, bits: int = 16) -> Column:
    """Scale a numeric column to the integer grid [0, 2**bits) given its
    bounds: scaled = floor((x - min) * 2**bits / (max - min + 1)).

    The product (x - min) * 2**bits must stay within double's exact
    integer range (< 2**52) for the floor to be engine-exact — i.e.
    log2(span) + bits <= 52, amply true for any sane (bounds, bits)
    pairing — so DuckDB/Trino replay the value bit-for-bit."""
    span = int(cmax) - int(cmin) + 1
    return F.floor((col.cast("long") - F.lit(int(cmin))) * F.lit(1 << bits) /
                   F.lit(span)).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: Union[str, Sequence[str]],
    bits: int = 16,
    num_partitions: Optional[int] = None,
    bounds: Optional[Mapping[str, tuple]] = None,
    z_col: str = "__zorder__",
    keep_z: bool = False,
) -> DataFrame:
    """Re-cluster ``df`` on the Z-order curve of ``cols`` so a subsequent
    parquet write yields files/row groups whose min-max statistics prune
    under filters on ANY of the interleaved columns.

    ``bounds`` maps col -> (min, max); when absent they come from one
    min/max aggregate job (collecting 2 scalars per column — never rows).
    The plan is ``repartitionByRange(z)`` (one range exchange, sampled
    boundaries, AQE-compatible) + ``sortWithinPartitions(z)``; write the
    result with ``write_table(..., max_records_per_file=...)`` to bound
    file sizes.  Integer columns only (dates/timestamps: cast to epoch
    first).  ``keep_z=True`` retains the Morton code column."""
    cs = as_list(cols)
    if len(cs) < 2:
        raise ValueError("zorder needs >= 2 columns (use orderBy for one)")
    if bounds is None:
        aggs = []
        for c in cs:
            aggs += [F.min(c).alias(f"__min_{c}__"),
                     F.max(c).alias(f"__max_{c}__")]
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"__min_{c}__"], row[f"__max_{c}__"]) for c in cs}
    scaled = [zorder_scale(F.col(c), bounds[c][0], bounds[c][1], bits)
              for c in cs]
    out = df.withColumn(z_col, zorder_value(scaled, bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, F.col(z_col))
    else:
        out = out.repartitionByRange(F.col(z_col))
    out = out.sortWithinPartitions(z_col)
    return out if keep_z else out.drop(z_col)
