"""dmid_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of the
Rofti/DMID reference (Giraph BSP overlapping-community detection + metrics
toolkit) as idiomatic Spark DataFrame pipelines:

- edge-table construction from a source-code corpus (co-occurrence via shared
  commits and imports), with sha256 ingest invariants and id densification
  (reference: Metrics/src/ocd/metrics/Main.java:911-980 ``cleanBrokenIDs``);
- DMID's three phases (random-walk leader identification, follower-degree
  leader selection, cascading membership) as pure DataFrame/Arrow computations
  (reference: DMID/DMIDComputation.java, DMID/utils/DMIDMasterCompute.java);
- standard link-graph algorithms: PageRank, connected components
  (small-star/large-star), label propagation, triangle counting, k-core/
  coreness, clustering coefficients, assortativity, link prediction, HITS,
  personalized PageRank, SCC, multi-source BFS, sampled harmonic/closeness/
  betweenness centrality, seeded random walks, weighted SSSP;
- cover-quality metrics (extended modularity, overlapping NMI, Spearman
  degree correlation) with algebraic factorizations replacing the reference's
  O(N^2) loops (reference: Metrics/src/ocd/metrics/*.java);
- training-data pipeline operators over document/embedding tables:
  exact/MinHash-LSH/SimHash dedup, ANN similarity search, text quality,
  repetition filters, TF-IDF, and mergeable sketches (HyperLogLog,
  count-min).

Everything is DataFrame-first (Catalyst-optimized); Python appears only in
vectorized pandas/Arrow UDFs (per-partition CSR SpMV kernels) and the driver
iteration loop that replaces Giraph's MasterCompute.
"""

__version__ = "0.1.0"
