"""arrowtpu — a TPU-native columnar data framework and vectorized
query-execution engine built from scratch in JAX/XLA/Pallas/pjit.

Covers the capability set of apache/arrow-rs (reference mounted read-only at
/root/reference; see SURVEY.md for the structural analysis): Arrow-style
columnar batches with packed validity bitmaps resident in HBM, a compute
kernel plane (selection, fused elementwise predicates/arithmetic with SQL
null semantics, aggregation, sorting over an order-preserving row/key
encoding), hash group-by/join, and multi-host scale-out via hash
partitioning + all-to-all shuffle over a jax.sharding Mesh.
"""

from . import config  # noqa: F401  (enables x64; must import first)
from . import schema
from . import dtype_parse, extension, tensor  # noqa: F401
from .dtype_parse import parse_datatype  # noqa: F401
from .tensor import Tensor  # noqa: F401
from .tensor import tensor as make_tensor  # noqa: F401
from .config import CastOptions, SortOptions, TakeOptions
from .core import (
    BooleanColumn,
    Column,
    DictionaryColumn,
    FixedSizeListColumn,
    ListViewColumn,
    NullColumn,
    PrimitiveColumn,
    RecordBatch,
    StringViewColumn,
    StructColumn,
    bitmap,
    boolean,
    dictionary_encode_host,
    fixed_size_list,
    from_pylist,
    list_view,
    null_column,
    primitive,
    record_batch,
    string_view,
    struct_column,
)
from .core import (
    RunEndColumn,
    UnionColumn,
    run_end_encoded,
    run_end_from_pylist,
    union_column,
)
from . import interop
from .interop import from_pyarrow, to_pyarrow
from .schema import (
    ArrowTpuError,
    DataType,
    Field,
    Schema,
    binary,
    float16,
    float32,
    float64,
    int8,
    int16,
    int32,
    int64,
    uint8,
    uint16,
    uint32,
    uint64,
    utf8,
)

__version__ = "0.1.0"

from .core import validate  # noqa: F401  (untrusted-input validation)
from .core.validate import check_batch, check_column, validate_column  # noqa: F401
from .interop import cdata  # noqa: F401  (Arrow C Data Interface)
from .rowformat.decode import RowConverter  # noqa: F401
from . import integration  # noqa: F401  (archery JSON test format)
