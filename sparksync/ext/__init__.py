"""LLM-data-pipeline extensions: operators the reference lacks but a
100 TB training-data pipeline needs (BASELINE.json north star).

All operators are DataFrame -> DataFrame, built on JVM-side functions
(no row-at-a-time Python); shuffle behavior is documented per function.
"""
