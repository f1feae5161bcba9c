"""DataFrame-level operator stages (SURVEY.md §2).

Each module composes built-in pyspark.sql.functions wherever the semantics
allow and drops to Arrow-batched pandas UDFs only for the kernels Spark
lacks (text extraction, geo mining, cell encode, exact PIP). No per-row
Python UDFs, no RDDs, no driver-side collect loops (BASELINE.json:15;
enforced by tests/test_lint.py).
"""
