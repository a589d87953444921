from vector_database_in_rust_spark.sources.tables import load_table, load_tables
from vector_database_in_rust_spark.sources.binary import read_raw_f32
from vector_database_in_rust_spark.sources.text_formats import read_csv, read_json

__all__ = ["load_table", "load_tables", "read_raw_f32", "read_csv", "read_json"]
