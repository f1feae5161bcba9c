"""harvester_fgp_spark — a brand-new PySpark-native spatial-join + tiling engine.

Re-expresses the capabilities of ``open-data/harvester-FGP`` (a per-record
Python CSW metadata harvester: record pull -> bilingual normalization ->
bounding-box extraction) as vectorized Arrow/pandas-UDF stages over
Iceberg/Parquet tables of Common-Crawl-style web pages
``pages(url, warc_ts, html, text, lang)``.

NOT a port: the reference has no planner, no columnar execution and no
parallelism (SURVEY.md §3.1); every operator here is a Spark-first
re-expression of the *semantics* (SURVEY.md §2) using the DataFrame API,
Catalyst/AQE, and Arrow-batched pandas UDFs only where built-ins cannot
express the kernel (text extraction, geo mining, cell encode, exact PIP).

Layout
------
- ``schemas``    fixed StructType constants (SURVEY §1.2)
- ``session``    tuned SparkSession builder (AQE, Arrow, shuffle partitions)
- ``synth``      deterministic seed-42 synthetic pages/polygons (FIXTURES.md)
- ``geo``        pure-numpy kernels: S2-style cells, web-mercator tiles,
                 ray-cast PIP, packed STR R-tree (Spark-free, unit-testable)
- ``functions``  text extraction / mining / language-id / quality / hashing
- ``operators``  DataFrame stages: extract (E1-E7), geo (G1-G7),
                 joins (J1-J7), dedup, similarity, multimodal, text analysis
- ``sources``    pages/polygons/testdata readers (Iceberg in prod, Parquet here)
- ``sinks``      normalized-record sink + checkpoint/lineage + resume filter
- ``plans``      full-pipeline assembly (EP1)
- ``streaming``  v2 seam: Structured Streaming lift of the batch stages
"""

__version__ = "0.1.0"
