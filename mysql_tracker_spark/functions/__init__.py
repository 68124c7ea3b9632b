"""Scalar/feature functions: text analysis, sketches, similarity.

All hot-path functions are JVM-side Catalyst expressions; numpy-backed
pandas UDFs appear only where Spark lacks a vectorized built-in
(simhash bit-packing, LSH hyperplane projection).
"""
