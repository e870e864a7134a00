"""Relational-layer operators (SURVEY.md §2.1-§2.7, §2.9) plus the
large-scale data-pipeline extensions (dedup, similarity, text, multimodal).

Every operator is a pure ``DataFrame -> DataFrame`` transform built from
built-in ``pyspark.sql.functions`` so Catalyst can optimize (pushdown,
pruning, partial aggregation) and whole-stage codegen keeps execution
JVM-side. Python UDFs appear only in the solver layer
(:mod:`solar_data_tools_spark.solvers`).
"""
