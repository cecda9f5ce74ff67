from restaurant_etl_spark.functions.cleaning import (
    chunk_text,
    clean_item_name,
    flatten_dietary_tags,
    normalize_currency,
    normalize_extracted_text,
    price_display,
    primary_price,
    restaurant_name_from_path,
    token_estimate,
    validity_predicate,
)

__all__ = [
    "chunk_text",
    "clean_item_name",
    "flatten_dietary_tags",
    "normalize_currency",
    "normalize_extracted_text",
    "price_display",
    "primary_price",
    "restaurant_name_from_path",
    "token_estimate",
    "validity_predicate",
]
