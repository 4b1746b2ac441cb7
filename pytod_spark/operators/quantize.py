"""Int8 symmetric quantization of embedding vectors with a
reconstruction-quality report.

The storage/bandwidth step of an ANN pipeline at corpus scale: 4x
smaller vectors (and int8 SIMD kernels downstream) in exchange for a
bounded cosine error. Symmetric linear quantization with one GLOBAL
scale s = max |x| over the corpus:

    q_i = clamp(floor(x_i / s * 127 + 0.5), -127, 127)
    x'_i = q_i * s / 127

100-TB shape: the scale is a single partial-aggregated max (1-row
broadcast); quantize/dequantize/quality are pure per-row array
arithmetic in Catalyst expressions — no shuffle beyond the 1-row
model, no Python. The quality report (per-vector cosine between
original and dequantized, max abs elementwise error) is the
measurement that decides whether the quantized index is usable at a
given similarity threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot as _dot


def global_scale(df: DataFrame, vec_col: str = "features") -> DataFrame:
    """1-row frame with the corpus max-|x| scale."""
    absmax = F.greatest(
        F.abs(F.array_min(F.col(vec_col))), F.abs(F.array_max(F.col(vec_col)))
    )
    return df.agg(F.max(absmax).alias("__scale"))


def quantization_report(
    df: DataFrame, id_col: str = "row_id", vec_col: str = "features"
) -> DataFrame:
    """(id, cos_sim, max_abs_err) between each vector and its int8
    symmetric quantization round-trip."""
    scaled = df.crossJoin(F.broadcast(global_scale(df, vec_col)))
    s = F.col("__scale")
    q = F.transform(
        F.col(vec_col),
        lambda x: F.greatest(
            F.least(F.floor(x / s * 127 + 0.5), F.lit(127)), F.lit(-127)
        )
        * s
        / 127,
    )
    f = F.col(vec_col)
    # q is an expensive per-element transform and Catalyst inlines it
    # into every higher-order consumer (no CSE across HOFs — the
    # documented recompute trap): fuse all three q-consuming terms
    # into ONE zip_with so q evaluates once per row, then reduce the
    # struct array in a single aggregate pass.
    z = F.zip_with(
        f,
        q,
        lambda x, y: F.struct(
            (x * y).alias("fq"), (y * y).alias("qq"), F.abs(x - y).alias("e")
        ),
    )
    res = F.aggregate(
        z,
        F.struct(
            F.lit(0.0).alias("fq"), F.lit(0.0).alias("qq"), F.lit(0.0).alias("e")
        ),
        lambda a, v: F.struct(
            (a.fq + v.fq).alias("fq"),
            (a.qq + v.qq).alias("qq"),
            F.greatest(a.e, v.e).alias("e"),
        ),
        lambda a: F.struct(
            F.round(a.fq / F.sqrt(_dot(f, f) * a.qq), 6).alias("cos_sim"),
            F.round(a.e, 6).alias("max_abs_err"),
        ),
    )
    # inline(array(res)) is a Generate barrier: res (and therefore the
    # whole quantize pass) evaluates exactly once per row — field
    # references in a plain Project would re-inline it per column.
    return scaled.select(id_col, F.inline(F.array(res)))
