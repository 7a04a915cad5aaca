from elasticsearch_spark.fixtures.transcripts import (
    generate_transcripts,
    reference_query_set,
)

__all__ = ["generate_transcripts", "reference_query_set"]
