from foresttime_builder_spark.functions.helpers import (
    get_division,
    get_province,
    r_if_else,
    r_isin,
)

__all__ = ["get_division", "get_province", "r_if_else", "r_isin"]
