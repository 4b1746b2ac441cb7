"""pytod_spark — a PySpark-native schema + constraint validation engine.

Recasts the tensor-operator outlier detectors of the reference
(yzhao062/pytod, read-only at /root/reference) as the distribution-drift
stage of a distributed validation engine over huge code-corpus tables:

* per-partition column stats (null rate, distinct via HLL, min/max,
  quantile sketches)                      -> :mod:`pytod_spark.validation.stats`
* uniqueness / referential integrity     -> :mod:`pytod_spark.validation.constraints`
* drift / outlier flagging (KNN, LOF, HBOS, ECOD, PCA, ABOD with
  pytod score parity)                    -> :mod:`pytod_spark.detectors`
* distributed primitives (two-stage kNN join, distance range join,
  ECDF, histogram, top-k, set ops)       -> :mod:`pytod_spark.operators`
* training-data pipeline ops (dedup, similarity search, text
  analysis, multimodal plumbing)         -> :mod:`pytod_spark.operators.dedup`, ...

Everything is DataFrame-first: Catalyst owns scans/joins/aggregations;
numpy kernels run only inside Arrow-vectorized ``applyInPandas`` /
``mapInPandas`` where relational operators cannot express the math
(pairwise-distance tiles). No per-row Python UDFs anywhere.

The numeric contract is score parity with the reference's detectors
(see ``pytod_spark.oracle`` — a pure-numpy transliteration of the cited
reference lines, used as the test oracle since torch is unavailable).
"""

__version__ = "0.1.0"
