"""Pure, deterministic page-local functions.

Nothing in this subpackage imports pyspark: every function here is a plain
Python/pandas computation so it can be (a) unit-tested byte-for-byte against
the reference implementation without a SparkSession and (b) executed inside
Arrow-batched pandas UDFs on executors.
"""
