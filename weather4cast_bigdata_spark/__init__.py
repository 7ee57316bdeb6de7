"""weather4cast_bigdata_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
``jleinonen/weather4cast-bigdata`` (reference at ``/root/reference``),
re-expressed Spark-first: every operator is a pure
``DataFrame -> DataFrame`` (or ``Column -> Column``) transform that
Catalyst can optimize, plus a thin driver-side linear-algebra finisher
for the ensemble ridge solve.

Layout (mirrors SURVEY.md §7):

- ``session``     — SparkSession builder with scale-oriented defaults
- ``functions/``  — scalar / string / array / text column functions
- ``operators/``  — joins, windows, aggregates, set ops, dedup,
                    similarity (multi-column relational transforms)
- ``sources/``    — catalog loaders, file-index scan, NetCDF-decode
                    plumbing, quantized partitioned sink
- ``plans/``      — end-to-end query plans incl. the flagship
                    ``evaluate``-analog and the driver-facing registry
- ``streaming/``  — Structured Streaming forms of the batch pipeline
- ``solve``       — driver-side ridge solvers (p×p, p ≤ 5)
"""

__version__ = "0.1.0"
