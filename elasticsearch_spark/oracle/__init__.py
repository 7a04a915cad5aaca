from elasticsearch_spark.oracle.pyref import PyRefEngine

__all__ = ["PyRefEngine"]
