"""eventstreamer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of avodovnik/eventstreamer (reference, read-only at
/root/reference) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the unbounded path, Pandas UDFs
only where built-ins cannot express the semantics.

Layout
------
- ``session``     : SparkSession construction tuned for the target scale
- ``datamodel``   : the reference's DataPoint event model, Spark-typed
                    (reference: src/DispatcherFunction/Common/DataPoint.cs:8-36)
- ``sources``     : batch + streaming readers for the canonical tables
- ``operators``   : windowed aggregation (Tier A parity), relational
                    surface, dedup / similarity / text / multimodal
                    (Tier B, LLM-data-pipeline ops)
- ``functions``   : reusable column expressions (safe casts, hashing,
                    minhash, projections)
- ``streaming``   : Structured Streaming wrappers + stateful parity
                    processor (reference: DispatcherFunction.cs:66-162)
- ``plans``       : plan-inspection helpers (pushdown / broadcast asserts)
"""

__version__ = "0.1.0"
