from elasticsearch_spark.functions.smallfloat import (
    byte315_to_float,
    effective_doc_length,
    float_to_byte315,
    norm_table,
    quantized_length_ranges,
)

__all__ = [
    "byte315_to_float",
    "effective_doc_length",
    "float_to_byte315",
    "norm_table",
    "quantized_length_ranges",
]
