"""Flight Handshake / DoExchange and FlightSQL (reference
arrow-flight/src/client.rs:422, sql/server.rs:56, sql/client.rs).
Interop bar: a STOCK pyarrow.flight client runs a FlightSQL statement
query against our server (command descriptor -> flight info -> ticket ->
do_get)."""

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu import flight as fl
from arrowtpu import flightsql as fsql
from arrowtpu import schema as st

pa = pytest.importorskip("pyarrow")
paf = pytest.importorskip("pyarrow.flight")


def _batch(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return at.record_batch({
        "k": at.primitive(rng.integers(0, 10, n), at.schema.int64, length=n),
        "v": at.primitive(rng.integers(-50, 50, n), at.schema.int64,
                          length=n),
    })


@pytest.fixture
def server():
    srv = fsql.FlightSqlServer()
    b = _batch()
    srv.register_table("t", b)
    srv.tables["t"] = [b]
    port = srv.serve()
    yield srv, port, b
    srv.stop()


def test_handshake_roundtrip(server):
    srv, port, b = server
    cl = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    assert cl.handshake(b"hello") == b"hello"
    cl.close()


def test_do_exchange_echo(server):
    srv, port, b = server
    cl = fl.FlightClient(f"grpc://127.0.0.1:{port}")
    out = cl.do_exchange("x", [b])
    assert len(out) == 1
    assert out[0].to_pydict() == b.to_pydict()
    cl.close()


def test_do_exchange_transform(server):
    srv, port, b = server

    class Doubler(fsql.FlightSqlServer):
        def do_exchange_batches(self, descriptor, batches):
            from arrowtpu import ops

            for bb in batches:
                cols = {"k": bb["k"], "v": ops.add(bb["v"], bb["v"])}
                yield at.record_batch(cols)

    srv2 = Doubler()
    port2 = srv2.serve()
    try:
        cl = fl.FlightClient(f"grpc://127.0.0.1:{port2}")
        out = cl.do_exchange("x", [b])
        want = [None if v is None else 2 * v for v in b.to_pydict()["v"]]
        assert out[0].to_pydict()["v"] == want
        cl.close()
    finally:
        srv2.stop()


def test_flightsql_execute_own_client(server):
    srv, port, b = server
    cl = fsql.FlightSqlClient(f"grpc://127.0.0.1:{port}")
    out = cl.execute("SELECT k, v FROM t WHERE v > 0 AND k <= 5 LIMIT 7")
    d = b.to_pydict()
    want = [(k, v) for k, v in zip(d["k"], d["v"]) if v > 0 and k <= 5][:7]
    got = out[0].to_pydict()
    assert list(zip(got["k"], got["v"])) == want
    assert cl.get_tables() == ["t"]
    cl.close()


def test_flightsql_with_stock_pyarrow_client(server):
    """The verdict bar: a stock pyarrow.flight client runs the query."""
    srv, port, b = server
    client = paf.FlightClient(f"grpc://127.0.0.1:{port}")
    desc = paf.FlightDescriptor.for_command(
        fsql.command_statement_query("SELECT v FROM t WHERE v >= 40"))
    info = client.get_flight_info(desc)
    assert info.total_records >= 0
    reader = client.do_get(info.endpoints[0].ticket)
    table = reader.read_all()
    want = [v for v in b.to_pydict()["v"] if v >= 40]
    assert table.column("v").to_pylist() == want
    client.close()


def test_pyarrow_handshake_compat(server):
    """pyarrow clients handshake implicitly on authenticated calls; the
    raw RPC must at least respond without error."""
    srv, port, b = server
    client = paf.FlightClient(f"grpc://127.0.0.1:{port}")
    # wait_for_available issues a no-op RPC (ListFlights under the hood)
    client.wait_for_available(timeout=5)
    client.close()


def test_select_parser_errors(server):
    srv, port, b = server
    with pytest.raises(st.ComputeError):
        fsql.execute_select({"t": b}, "DROP TABLE t")
    with pytest.raises(st.ComputeError):
        fsql.execute_select({"t": b}, "SELECT * FROM missing")
