from vector_database_in_rust_spark.sources.tables import load_table, load_tables
from vector_database_in_rust_spark.sources.binary import read_raw_f32

__all__ = ["load_table", "load_tables", "read_raw_f32"]
