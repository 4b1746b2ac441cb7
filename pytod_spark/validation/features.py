"""Per-file numeric feature derivation (BASELINE north_star list:
content sha256 invariant, content length, line count, token entropy
per lang).

sha256/length/line-count are pure Catalyst expressions; token entropy
is the one vectorized Arrow UDF (per-row token histograms need no
shuffle this way — an explode/groupBy formulation would shuffle
O(total tokens) rows, which at 10^12 files is the wrong plan)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _entropy_batch(content: pd.Series) -> pd.Series:
    """Shannon entropy (nats) of the whitespace-token distribution,
    ln(n) - sum(c ln c)/n — same closed form as the SQL oracle in
    queries_text.q_token_entropy.

    Deliberately a plain Counter loop: str.split and Counter are
    C-backed and ~10x faster here than a pandas explode/factorize
    "vectorization" (object-dtype overhead dominates that path;
    measured on 20k docs: 0.37s loop vs 4.3s exploded)."""
    out = []
    for text in content:
        toks = text.lower().split()
        if not toks:
            out.append(0.0)
            continue
        n = len(toks)
        s = sum(c * math.log(c) for c in Counter(toks).values())
        out.append(math.log(n) - s / n)
    return pd.Series(out, dtype="float64")


def token_entropy_udf():
    """Built lazily — pandas_udf registration needs an active session."""
    return pandas_udf(_entropy_batch, "double")


def derive_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append the invariant hash + the drift feature vector."""
    c = F.col(content_col)
    return (
        df.withColumn("content_sha256", F.sha2(c, 256))
        .withColumn("content_length", F.length(c).cast("double"))
        .withColumn("line_count", F.size(F.split(c, "\n")).cast("double"))
        .withColumn("token_entropy", token_entropy_udf()(c))
        .withColumn(
            "features", F.array("content_length", "line_count", "token_entropy")
        )
    )
