"""Pure-numpy geospatial kernels (Spark-free; wrapped by operators.geo).

S2-*style* (NOT S2-compatible) 64-bit quadtree cell ids, web-mercator tile
math, vectorized ray-casting point-in-polygon, and a packed STR R-tree.
Designed so the hot loops are whole-array numpy bit-twiddling — the Spark
layer calls these from Arrow-batched pandas UDFs only (SURVEY.md §2.4, §7.4).
"""
