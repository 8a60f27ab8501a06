"""Operator library. Batch and streaming share semantics; every batch operator
here has a DuckDB-oracle-checkable SQL twin declared in the query catalog."""
