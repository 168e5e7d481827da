"""File formats: CSV, JSON, Arrow IPC (stream+file), Parquet.

Mirrors the reference's L6 format layer (arrow-csv, arrow-json, arrow-ipc,
parquet — SURVEY.md §2.3) with host-side framing/parse and device-resident
columnar products."""

from . import csv, flatbuf, ipc, json, layout, parquet, thrift
from .csv import read_csv, write_csv
from .ipc import (
    FileReader,
    FileWriter,
    StreamReader,
    StreamWriter,
    read_file,
    read_stream,
    write_file,
    write_stream,
)
from .json import read_json, write_json
from .parquet import ParquetFile, WriterProperties, read_parquet, write_parquet

from .parquet_scan import (ArrowPredicate, ColumnPredicate,  # noqa: E402,F401
                           RowFilter, RowSelection, RowSelector,
                           ScanMetrics, scan_parquet)

from . import avro  # noqa: E402,F401
from . import parquet_crypto  # noqa: E402,F401
from . import parquet_push  # noqa: E402,F401
from .parquet_crypto import (FileDecryptionProperties,  # noqa: E402,F401
                             FileEncryptionProperties)
from .parquet_push import ParquetPushDecoder  # noqa: E402,F401
from .avro import AvroFile, read_avro, write_avro  # noqa: E402,F401
