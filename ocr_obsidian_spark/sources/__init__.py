"""Sources & sinks: deterministic fixture corpus generation, parquet IO,
checkpoint-manifest resume."""
