"""Spark-side operators: each module exposes DataFrame → DataFrame functions
that declare logical plans (Catalyst optimizes) and confine non-relational
logic to Arrow-batched pandas UDF bodies."""
