"""Engine-agnostic column-expression building blocks (portable across the
Spark plan and the DuckDB oracle): hashing, shingling, vector math."""
