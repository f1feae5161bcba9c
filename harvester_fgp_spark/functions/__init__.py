"""Pure (Spark-free) kernels wrapped by the pandas-UDF operator layer."""
