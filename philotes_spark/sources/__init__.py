from philotes_spark.sources.catalog import TABLES, load_table, register_views
