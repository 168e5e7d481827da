"""Flight service tests: self round-trips plus interop with STOCK
pyarrow.flight clients/servers (reference test model:
/root/reference/arrow-flight/tests/client.rs + encode_decode.rs against
in-process tonic servers, tests/common/server.rs)."""

import numpy as np
import pyarrow as pa
import pyarrow.flight as paflight
import pytest

import arrowtpu as at
from arrowtpu import flight as fl
from arrowtpu import schema as st
from arrowtpu.interop import from_pyarrow, to_pyarrow


@pytest.fixture
def server():
    s = fl.FlightServer()
    s.tables["demo"] = [
        at.record_batch({"x": [1, 2, None], "s": ["a", None, "long string headed for the arena"]}),
        at.record_batch({"x": [4], "s": ["b"]}),
    ]
    port = s.serve()
    yield s, port
    s.stop()


def test_do_get_own_client(server):
    s, port = server
    c = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    batches = c.do_get(b"demo")
    assert len(batches) == 2
    assert batches[0].to_pydict() == s.tables["demo"][0].to_pydict()
    c.close()


def test_do_put_own_client(server):
    s, port = server
    c = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    b = at.record_batch({"v": [10, None, 30]})
    c.do_put("uploaded", [b])
    assert s.tables["uploaded"][0].to_pydict() == {"v": [10, None, 30]}
    c.close()


def test_get_flight_info_and_list(server):
    s, port = server
    c = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    info = c.get_flight_info("demo")
    assert info["tickets"] == [b"demo"]
    assert info["total_records"] == 4
    flights = c.list_flights()
    assert {"path": ["demo"]} in flights
    c.close()


def test_pyarrow_client_reads_our_server(server):
    """Stock pyarrow.flight client against our grpc service."""
    s, port = server
    client = paflight.connect(f"grpc://127.0.0.1:{port}")
    reader = client.do_get(paflight.Ticket(b"demo"))
    table = reader.read_all()
    assert table.to_pydict() == {
        "x": [1, 2, None, 4],
        "s": ["a", None, "long string headed for the arena", "b"],
    }
    info = client.get_flight_info(paflight.FlightDescriptor.for_path("demo"))
    assert info.total_records == 4
    client.close()


def test_pyarrow_client_puts_to_our_server(server):
    s, port = server
    client = paflight.connect(f"grpc://127.0.0.1:{port}")
    t = pa.table({"y": pa.array([1.5, None], type=pa.float64())})
    desc = paflight.FlightDescriptor.for_path("from_pa")
    writer, _ = client.do_put(desc, t.schema)
    writer.write_table(t)
    writer.close()
    client.close()
    assert s.tables["from_pa"][0].to_pydict() == {"y": [1.5, None]}


class _PaServer(paflight.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        self.table = pa.table({"z": pa.array([7, None, 9], type=pa.int64())})

    def do_get(self, context, ticket):
        return paflight.RecordBatchStream(self.table)


def test_our_client_reads_pyarrow_server():
    s = _PaServer()
    c = fl.FlightClient(f"grpc://127.0.0.1:{s.port}")
    batches = c.do_get(b"anything")
    assert len(batches) >= 1
    total = []
    for b in batches:
        total.extend(b.to_pydict()["z"])
    assert total == [7, None, 9]
    c.close()
    s.shutdown()


def test_dictionary_over_flight(server):
    s, port = server
    d = at.dictionary_encode_host(["a", "b", "a", None], st.Dictionary(st.int32, st.utf8))
    s.tables["dicted"] = [at.record_batch({"d": d})]
    client = paflight.connect(f"grpc://127.0.0.1:{port}")
    table = client.do_get(paflight.Ticket(b"dicted")).read_all()
    assert table.to_pydict() == {"d": ["a", "b", "a", None]}
    client.close()
