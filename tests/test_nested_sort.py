import numpy as np
import arrowtpu as at
from arrowtpu import ops, schema as st

def test_struct_sort_keys():
    data = [{"x": 2, "y": "b"}, {"x": 1, "y": "z"}, None,
            {"x": 1, "y": "a"}, {"x": 2, "y": "a"}]
    c = at.from_pylist(data, st.Struct((st.Field("x", st.int64),
                                        st.Field("y", st.utf8))))
    idx = ops.sort_to_indices(c)
    order = np.asarray(idx.values)[:5].tolist()
    # nulls first (default), then (x, y) lexicographic
    want_vals = [None, (1, "a"), (1, "z"), (2, "a"), (2, "b")]
    got = [data[i] if data[i] is None else (data[i]["x"], data[i]["y"])
           for i in order]
    assert got == want_vals, got

def test_list_sort_keys():
    data = [[2], [1, 5], None, [1], [], [1, 5, 0]]
    c = at.from_pylist(data, st.List(st.int64))
    idx = ops.sort_to_indices(c)
    order = np.asarray(idx.values)[:6].tolist()
    got = [data[i] for i in order]
    assert got == [None, [], [1], [1, 5], [1, 5, 0], [2]], got

def test_list_with_null_elements():
    data = [[1, None], [1, 0], [None], [0]]
    c = at.from_pylist(data, st.List(st.int64))
    idx = ops.sort_to_indices(c)
    got = [data[i] for i in np.asarray(idx.values)[:4].tolist()]
    # null element < any value at same position
    assert got == [[None], [0], [1, None], [1, 0]], got

def test_lexsort_with_struct_secondary():
    prim = at.from_pylist([1, 0, 1, 0], st.int64)
    s = at.from_pylist([{"a": 2}, {"a": 9}, {"a": 1}, {"a": 3}],
                       st.Struct((st.Field("a", st.int64),)))
    idx = ops.lexsort_to_indices([prim, s])
    got = np.asarray(idx.values)[:4].tolist()
    assert got == [3, 1, 2, 0], got  # prim asc, then a asc

if __name__ == "__main__":
    test_struct_sort_keys(); test_list_sort_keys()
    test_list_with_null_elements(); test_lexsort_with_struct_secondary()
    print("nested sort ok")
