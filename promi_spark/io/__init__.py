from promi_spark.io.ingest import load_table, load_tables, load_event_log

__all__ = ["load_table", "load_tables", "load_event_log"]
