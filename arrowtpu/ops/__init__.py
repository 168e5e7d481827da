"""Compute kernel namespace.

Mirrors the reference's canonical public compute API, the umbrella
`arrow::compute` module (/root/reference/arrow/src/compute/kernels.rs:17-24):
aggregate, arithmetic, arity, bitwise, boolean, numeric, cast, cmp,
partition, rank, sort, concat, filter, interleave, nullif, take, window,
zip — that list is the operator-coverage checklist this package tracks.
"""

from . import aggregate, arity, bitwise, boolean, cmp, numeric, zip as zipmod
from . import coalesce, concat as concatmod, filter as filtermod, take as takemod
from .coalesce import BatchCoalescer, slice_, slice_batch
from .concat import concat, concat_batches, interleave
from .filter import FilterPlan, apply_plan, build_plan, filter_, filter_record_batch
from .take import take, take_record_batch
from . import sort as sortmod
from .sort import (
    lexsort_to_indices,
    partition,
    partition_ranges,
    rank,
    sort,
    sort_batch,
    sort_to_indices,
)
from . import strings
from .strings import (
    bit_length,
    concat_elements,
    contains,
    ends_with,
    ilike,
    length,
    like,
    lower,
    nilike,
    nlike,
    octet_length,
    regexp_is_match,
    starts_with,
    substring,
    upper,
)
from . import cast as castmod
from .cast import can_cast_types, cast, dictionary_decode, dictionary_encode
from . import temporal
from .temporal import date_part
from .aggregate import bool_and, bool_or, count, finalize, max_, min_, product, sum_
from .bitwise import bit_and, bit_not, bit_or, bit_xor, shift_left, shift_right
from .boolean import (
    and_,
    and_kleene,
    and_not,
    is_not_null,
    is_null,
    not_,
    or_,
    or_kleene,
    xor,
)
from .cmp import distinct, eq, gt, gt_eq, lt, lt_eq, neq, not_distinct
from .numeric import (
    add,
    add_checked,
    div,
    div_checked,
    mul,
    mul_checked,
    neg,
    raise_if,
    rem,
    rem_checked,
    sub,
    sub_checked,
)
from .zip import nullif, shift, zip_
from . import dictionary as dictmod, ree, union as unionmod
from .dictionary import (
    garbage_collect_dictionary,
    merge_dictionary_values,
    should_merge_dictionary_values,
)
from .ree import run_end_decode, run_end_decode_to, run_end_encode, take_run
from .union import take_union, union_extract
from . import merge as mergemod
from .merge import merge_batches, merge_indices, merge_n
from . import join as joinmod
from .join import JoinInfo, hash_join

from .equal import equal_batches, equal_columns  # noqa: E402,F401
