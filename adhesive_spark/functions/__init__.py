from adhesive_spark.functions.ddl import (
    FunctionDefinition,
    is_create_function,
    parse_create_function,
)
from adhesive_spark.functions.factory import FunctionFactory

__all__ = [
    "FunctionDefinition",
    "FunctionFactory",
    "is_create_function",
    "parse_create_function",
]
