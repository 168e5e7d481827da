from . import bitmap
from .batch import RecordBatch, record_batch
from .column import (
    BooleanColumn,
    Column,
    DictionaryColumn,
    NullColumn,
    PrimitiveColumn,
    StringViewColumn,
    boolean,
    dictionary_encode_host,
    from_pylist,
    null_column,
    primitive,
    string_view,
)

__all__ = [
    "bitmap",
    "RecordBatch",
    "record_batch",
    "Column",
    "PrimitiveColumn",
    "BooleanColumn",
    "StringViewColumn",
    "DictionaryColumn",
    "NullColumn",
    "primitive",
    "boolean",
    "from_pylist",
    "string_view",
    "dictionary_encode_host",
    "null_column",
]
