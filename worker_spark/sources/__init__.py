from worker_spark.sources.registry import TPCH_TABLES, load_table, load_tables

__all__ = ["TPCH_TABLES", "load_table", "load_tables"]
