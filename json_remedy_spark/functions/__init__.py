"""Column-expression building blocks (JVM-side, WholeStageCodegen'd)
plus the few pandas-UDF stages that genuinely need Python.

Everything here that is pure `pyspark.sql.functions` has a matching
ANSI-SQL oracle registered in ``__spark_entry__.py``.
"""
