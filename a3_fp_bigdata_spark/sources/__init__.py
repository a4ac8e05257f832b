"""Sources & sinks (SURVEY §2.1 S1-S13), Spark-first.

The reference hand-rolls its I/O edge in Python (kafka-python clients,
pandas CSV appends); here every edge is a DataFrame reader/writer so the
same code scales from local[4] tests to a 1000-executor cluster.
"""
