from polymarket_data_ingestor_spark.plans.catalog import CATALOG, QueryDef, table

__all__ = ["CATALOG", "QueryDef", "table"]
