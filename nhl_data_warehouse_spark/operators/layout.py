"""Data-layout operators: Z-order (Morton) interleave keys and
range-partitioned file assignment.

At 100 TB, multi-dimensional locality is a scan-pruning feature:
sorting files by a Z-value over (dim1, dim2) lets min/max file stats
prune on BOTH predicates (the Delta/Iceberg OPTIMIZE ZORDER idea,
done as a plain deterministic sort key, engine-side). The bit
interleave is a fixed sum of shift/mask terms — pure integer
arithmetic inside whole-stage codegen, and the identical expression
is valid ANSI SQL, so oracles reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton Z-value of two non-negative ints already reduced to
    ``bits`` bits: x's bit i lands at 2i, y's at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def z_value_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The same Morton interleave as ANSI SQL text (for oracles and
    pushdown into external engines)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_file_assignment(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Assign each row a target file by Z-order: compute the Morton
    key over (x % 2^bits, y % 2^bits) and split the Z-sorted order
    into ``n_files`` equal ranges (``ntile``), tie-broken on
    ``id_col`` so the assignment is total and deterministic. The
    write path would ``repartitionByRange`` on the same key; this
    operator exposes the assignment itself so layouts are testable.
    """
    mask = (1 << bits) - 1
    zk = z_value(
        F.col(x_col).bitwiseAND(F.lit(mask)),
        F.col(y_col).bitwiseAND(F.lit(mask)),
        bits,
    )
    out = df.withColumn("z_key", zk)
    w = Window.orderBy(F.col("z_key"), F.col(id_col))
    return out.select(
        id_col,
        x_col,
        y_col,
        "z_key",
        F.ntile(n_files).over(w).alias("file_id"),
    )
