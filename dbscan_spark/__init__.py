"""dbscan_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the capabilities of
irvingc/dbscan-on-spark (distributed density-based clustering), extended
with the relational + LLM-data-pipeline operator surface a large-scale
training-data platform needs (dedup, similarity search, text analysis,
multimodal column plumbing, windowed event analytics).

Design notes
------------
* Everything relational is declared with the DataFrame/SQL API so Catalyst
  does predicate pushdown, column pruning, join selection and AQE handles
  skew/coalescing at scale.
* Python only runs (a) on the driver for two provably-small computations
  (the spatial BSP partitioner and the cluster-merge union-find — mirroring
  the reference's own driver-side steps, see
  reference EvenSplitPartitioner.scala / DBSCANGraph.scala), and (b) inside
  Arrow-batched ``applyInPandas`` / ``mapInPandas`` kernels where DataFrame
  operators genuinely cannot express the semantics (the local DBSCAN kernel,
  multimodal feature extraction).
"""

from dbscan_spark.dbscan import DBSCANModel, dbscan, predict, train
from dbscan_spark.kernel import local_dbscan

__all__ = ["DBSCANModel", "dbscan", "local_dbscan", "predict", "train"]
__version__ = "0.1.0"
