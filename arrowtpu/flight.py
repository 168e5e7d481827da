"""Arrow Flight: gRPC data plane speaking the arrow.flight.protocol service.

Capability mirror of the reference's arrow-flight crate
(/root/reference/arrow-flight/src/: tonic service from format/Flight.proto
arrow.flight.protocol.rs:435,1026; mid-level FlightClient client.rs:71 with
do_get :213 / do_put :368; FlightDataEncoder encode.rs:145 shipping IPC
message metadata and body in separate protobuf fields; FlightDataDecoder
decode.rs:225).

Implementation notes (TPU-framework stance, SURVEY §5.8): Flight is the
*host-side* ingest/egress plane — on-chip exchange uses ICI collectives
(parallel/shuffle.py), so this module stays pure-Python on grpc.  The
protobuf messages are hand-encoded (protoc-python isn't in this image; the
wire format is a dozen tag/length rules), and the service is registered via
grpc generic handlers under the REAL Flight service name, so stock
pyarrow.flight clients and servers interoperate — that interop is the
compliance test."""

from __future__ import annotations

import struct
import threading
from typing import Dict, Iterable, List, Optional, Tuple

from . import schema as st
from .core import batch as bt
from .formats import ipc

SERVICE = "arrow.flight.protocol.FlightService"

# ---------------------------------------------------------------------------
# mini protobuf (wire format only: varint + length-delimited)
# ---------------------------------------------------------------------------


def _w_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_bytes(out: bytearray, field: int, data: bytes):
    _w_varint(out, (field << 3) | 2)
    _w_varint(out, len(data))
    out += data


def _w_int(out: bytearray, field: int, v: int):
    if v == 0:
        return
    _w_varint(out, field << 3)
    _w_varint(out, v)


def _parse(buf: bytes) -> Dict[int, list]:
    out: Dict[int, list] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            tag |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise st.ArrowTpuError(f"flight: unsupported wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _first(d: Dict[int, list], field: int, default=b""):
    return d[field][0] if field in d else default


# ---------------------------------------------------------------------------
# flight messages
# ---------------------------------------------------------------------------


def encode_ticket(ticket: bytes) -> bytes:
    out = bytearray()
    _w_bytes(out, 1, ticket)
    return bytes(out)


def decode_ticket(buf: bytes) -> bytes:
    return bytes(_first(_parse(buf), 1))


def encode_descriptor(path: List[str] = None, cmd: bytes = None) -> bytes:
    out = bytearray()
    if cmd is not None:
        _w_int(out, 1, 2)  # CMD
        _w_bytes(out, 2, cmd)
    else:
        _w_int(out, 1, 1)  # PATH
        for p in path or []:
            _w_bytes(out, 3, p.encode("utf-8"))
    return bytes(out)


def decode_descriptor(buf: bytes):
    d = _parse(buf)
    dtype = _first(d, 1, 0)
    if isinstance(dtype, (bytes, bytearray)):
        dtype = 0
    return {
        "type": dtype,
        "cmd": bytes(_first(d, 2)),
        "path": [bytes(p).decode("utf-8") for p in d.get(3, [])],
    }


def encode_flight_data(data_header: bytes, data_body: bytes,
                       descriptor: bytes = None, app_metadata: bytes = b"") -> bytes:
    out = bytearray()
    if descriptor:
        _w_bytes(out, 1, descriptor)
    _w_bytes(out, 2, data_header)
    if app_metadata:
        _w_bytes(out, 3, app_metadata)
    _w_bytes(out, 1000, data_body)
    return bytes(out)


def decode_flight_data(buf: bytes):
    d = _parse(buf)
    return {
        "descriptor": bytes(_first(d, 1)),
        "data_header": bytes(_first(d, 2)),
        "app_metadata": bytes(_first(d, 3)),
        "data_body": bytes(_first(d, 1000)),
    }


def _ipc_framed_schema(schema: st.Schema) -> bytes:
    """FlightInfo.schema / SchemaResult.schema carry the IPC-encapsulated
    schema message (continuation + length + flatbuffer)."""
    meta = ipc.encode_schema_message(schema, {})
    return struct.pack("<Ii", ipc.CONTINUATION, len(meta)) + meta


def encode_flight_info(schema: st.Schema, descriptor: bytes, ticket: bytes,
                       total_records: int = -1, total_bytes: int = -1) -> bytes:
    out = bytearray()
    _w_bytes(out, 1, _ipc_framed_schema(schema))
    _w_bytes(out, 2, descriptor)
    ep = bytearray()
    _w_bytes(ep, 1, encode_ticket(ticket))
    _w_bytes(out, 3, bytes(ep))
    if total_records >= 0:
        _w_int(out, 4, total_records)
    if total_bytes >= 0:
        _w_int(out, 5, total_bytes)
    return bytes(out)


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------


class FlightServer:
    """In-process Flight service over a table registry (reference
    FlightService server trait + examples/flight/server).

    Override `do_get_batches(ticket) -> (schema, iter[RecordBatch])` and
    `do_put_batches(descriptor, iter[RecordBatch])` for custom behavior; the
    default serves/stores named datasets in memory."""

    def __init__(self):
        self.tables: Dict[str, List[bt.RecordBatch]] = {}
        self._server = None

    # -- overridables --------------------------------------------------------
    def do_exchange_batches(self, descriptor: dict,
                            batches: Iterable[bt.RecordBatch]):
        """Bidirectional stream hook (reference client.rs:422 do_exchange):
        receives the client's batches, returns response batches.  Default:
        echo."""
        return list(batches)

    def handshake_payload(self, payload: bytes) -> bytes:
        """Auth handshake hook (reference HandshakeRequest/Response).
        Default: echo the client payload (no-auth handshake)."""
        return payload

    def do_get_batches(self, ticket: bytes):
        name = ticket.decode("utf-8")
        batches = self.tables.get(name)
        if batches is None:
            raise KeyError(f"no dataset {name!r}")
        return batches[0].schema, iter(batches)

    def do_put_batches(self, descriptor: dict, batches: Iterable[bt.RecordBatch]):
        name = descriptor["path"][0] if descriptor["path"] else descriptor["cmd"].decode()
        self.tables[name] = list(batches)

    # -- grpc plumbing -------------------------------------------------------
    def _do_get(self, request: bytes, context):
        ticket = decode_ticket(request)
        schema, batches = self.do_get_batches(ticket)
        dict_ids: Dict[str, int] = {}
        yield encode_flight_data(ipc.encode_schema_message(schema, dict_ids), b"")
        sent: set = set()
        for b in batches:
            for meta, body in ipc.encode_batch_messages(b, dict_ids, sent):
                yield encode_flight_data(meta, body)

    def _do_put(self, request_iterator, context):
        decoder = ipc.MessageDecoder()
        descriptor = None
        batches: List[bt.RecordBatch] = []
        for raw in request_iterator:
            fd = decode_flight_data(raw)
            if fd["descriptor"] and descriptor is None:
                descriptor = decode_descriptor(fd["descriptor"])
            if fd["data_header"]:
                out = decoder.decode(fd["data_header"], fd["data_body"])
                if out is not None:
                    batches.append(out)
        self.do_put_batches(descriptor or {"path": [], "cmd": b""}, batches)
        yield b""  # one empty PutResult

    def _get_flight_info(self, request: bytes, context):
        desc = decode_descriptor(request)
        name = desc["path"][0] if desc["path"] else desc["cmd"].decode()
        batches = self.tables.get(name)
        if batches is None:
            raise KeyError(name)
        total = sum(int(b.length) for b in batches)
        return encode_flight_info(
            batches[0].schema, request, name.encode("utf-8"), total_records=total
        )

    def _get_schema(self, request: bytes, context):
        desc = decode_descriptor(request)
        name = desc["path"][0] if desc["path"] else desc["cmd"].decode()
        out = bytearray()
        _w_bytes(out, 1, _ipc_framed_schema(self.tables[name][0].schema))
        return bytes(out)

    def _handshake(self, request_iterator, context):
        for raw in request_iterator:
            d = _parse(raw)
            payload = bytes(_first(d, 2))
            out = bytearray()
            _w_int(out, 1, 1)  # protocol_version
            resp = self.handshake_payload(payload)
            if resp:
                _w_bytes(out, 2, resp)
            yield bytes(out)

    def _do_exchange(self, request_iterator, context):
        decoder = ipc.MessageDecoder()
        descriptor = None
        batches: List[bt.RecordBatch] = []
        for raw in request_iterator:
            fd = decode_flight_data(raw)
            if fd["descriptor"] and descriptor is None:
                descriptor = decode_descriptor(fd["descriptor"])
            if fd["data_header"]:
                out = decoder.decode(fd["data_header"], fd["data_body"])
                if out is not None:
                    batches.append(out)
        result = self.do_exchange_batches(
            descriptor or {"path": [], "cmd": b""}, batches)
        result = list(result)
        if result:
            dict_ids: Dict[str, int] = {}
            sent: set = set()
            yield encode_flight_data(
                ipc.encode_schema_message(result[0].schema, dict_ids), b"")
            for b in result:
                for meta, body in ipc.encode_batch_messages(b, dict_ids, sent):
                    yield encode_flight_data(meta, body)

    def _list_flights(self, request: bytes, context):
        for name, batches in self.tables.items():
            yield encode_flight_info(
                batches[0].schema,
                encode_descriptor(path=[name]),
                name.encode("utf-8"),
                total_records=sum(int(b.length) for b in batches),
            )

    def do_action(self, action_type: str, body: bytes):
        """Application hook (reference FlightService::do_action): return
        an iterable of result-body byte strings."""
        raise st.ComputeError(f"unsupported action {action_type!r}")

    def list_actions(self):
        """Return [(type, description)] (reference ListActions)."""
        return []

    def _do_action(self, request: bytes, context):
        # Action{type=1 string, body=2 bytes} -> stream of Result{body=1}
        d = _parse(request)
        action_type = bytes(_first(d, 1, b"")).decode()
        body = bytes(_first(d, 2, b""))
        for result_body in self.do_action(action_type, body):
            out = bytearray()
            _w_bytes(out, 1, result_body)
            yield bytes(out)

    def _list_actions(self, request: bytes, context):
        for name, desc in self.list_actions():
            out = bytearray()
            _w_bytes(out, 1, name.encode())
            _w_bytes(out, 2, desc.encode())
            yield bytes(out)

    def serve(self, port: int = 0) -> int:
        """Start on localhost; returns the bound port."""
        import grpc
        from concurrent import futures

        ident = lambda x: x
        handlers = {
            "DoAction": grpc.unary_stream_rpc_method_handler(
                self._do_action, request_deserializer=ident, response_serializer=ident
            ),
            "ListActions": grpc.unary_stream_rpc_method_handler(
                self._list_actions, request_deserializer=ident, response_serializer=ident
            ),
            "DoGet": grpc.unary_stream_rpc_method_handler(
                self._do_get, request_deserializer=ident, response_serializer=ident
            ),
            "DoPut": grpc.stream_stream_rpc_method_handler(
                self._do_put, request_deserializer=ident, response_serializer=ident
            ),
            "GetFlightInfo": grpc.unary_unary_rpc_method_handler(
                self._get_flight_info, request_deserializer=ident, response_serializer=ident
            ),
            "GetSchema": grpc.unary_unary_rpc_method_handler(
                self._get_schema, request_deserializer=ident, response_serializer=ident
            ),
            "ListFlights": grpc.unary_stream_rpc_method_handler(
                self._list_flights, request_deserializer=ident, response_serializer=ident
            ),
            "Handshake": grpc.stream_stream_rpc_method_handler(
                self._handshake, request_deserializer=ident, response_serializer=ident
            ),
            "DoExchange": grpc.stream_stream_rpc_method_handler(
                self._do_exchange, request_deserializer=ident, response_serializer=ident
            ),
        }
        server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
        server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, handlers),)
        )
        port = server.add_insecure_port(f"127.0.0.1:{port}")
        server.start()
        self._server = server
        return port

    def stop(self):
        if self._server is not None:
            self._server.stop(grace=None)
            self._server = None


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class FlightClient:
    """reference FlightClient (client.rs:71)."""

    def __init__(self, location: str):
        import grpc

        if location.startswith("grpc://"):
            location = location[len("grpc://"):]
        self._channel = grpc.insecure_channel(location)
        ident = lambda x: x
        self._do_get = self._channel.unary_stream(
            f"/{SERVICE}/DoGet", request_serializer=ident, response_deserializer=ident
        )
        self._do_put = self._channel.stream_stream(
            f"/{SERVICE}/DoPut", request_serializer=ident, response_deserializer=ident
        )
        self._info = self._channel.unary_unary(
            f"/{SERVICE}/GetFlightInfo", request_serializer=ident, response_deserializer=ident
        )
        self._list = self._channel.unary_stream(
            f"/{SERVICE}/ListFlights", request_serializer=ident, response_deserializer=ident
        )
        self._handshake_rpc = self._channel.stream_stream(
            f"/{SERVICE}/Handshake", request_serializer=ident, response_deserializer=ident
        )
        self._exchange_rpc = self._channel.stream_stream(
            f"/{SERVICE}/DoExchange", request_serializer=ident, response_deserializer=ident
        )
        self._action_rpc = self._channel.unary_stream(
            f"/{SERVICE}/DoAction", request_serializer=ident,
            response_deserializer=ident
        )

    def do_action(self, action_type: str, body: bytes = b"") -> List[bytes]:
        """reference client.rs do_action: returns the Result bodies."""
        req = bytearray()
        _w_bytes(req, 1, action_type.encode())
        if body:
            _w_bytes(req, 2, body)
        out = []
        for chunk in self._action_rpc(bytes(req)):
            d = _parse(chunk)
            out.append(bytes(_first(d, 1, b"")))
        return out

    def do_get(self, ticket: bytes) -> List[bt.RecordBatch]:
        """reference client.rs:213."""
        decoder = ipc.MessageDecoder()
        out = []
        for raw in self._do_get(encode_ticket(ticket)):
            fd = decode_flight_data(raw)
            if not fd["data_header"]:
                continue
            b = decoder.decode(fd["data_header"], fd["data_body"])
            if b is not None:
                out.append(b)
        return out

    def do_put(self, path: str, batches: List[bt.RecordBatch]):
        """reference client.rs:368."""
        desc = encode_descriptor(path=[path])
        schema = batches[0].schema
        dict_ids: Dict[str, int] = {}
        sent: set = set()

        def gen():
            yield encode_flight_data(
                ipc.encode_schema_message(schema, dict_ids), b"", descriptor=desc
            )
            for b in batches:
                for meta, body in ipc.encode_batch_messages(b, dict_ids, sent):
                    yield encode_flight_data(meta, body)

        return list(self._do_put(gen()))

    def get_flight_info(self, path: str) -> dict:
        raw = self._info(encode_descriptor(path=[path]))
        d = _parse(raw)
        endpoints = [
            decode_ticket(bytes(_first(_parse(bytes(ep)), 1)))
            for ep in d.get(3, [])
        ]
        total = _first(d, 4, 0)
        return {"tickets": endpoints, "total_records": total if isinstance(total, int) else 0}

    def list_flights(self) -> List[dict]:
        out = []
        for raw in self._list(b""):
            d = _parse(raw)
            desc = decode_descriptor(bytes(_first(d, 2)))
            out.append({"path": desc["path"]})
        return out

    def handshake(self, payload: bytes = b"") -> bytes:
        """reference client.rs handshake: one round trip, returns the
        server's response payload."""
        req = bytearray()
        _w_int(req, 1, 1)
        if payload:
            _w_bytes(req, 2, payload)
        for raw in self._handshake_rpc(iter([bytes(req)])):
            return bytes(_first(_parse(raw), 2))
        return b""

    def do_exchange(self, path: str, batches: List[bt.RecordBatch]):
        """Bidirectional stream (reference client.rs:422): send batches,
        collect the response batches."""
        desc = encode_descriptor(path=[path])
        schema = batches[0].schema
        dict_ids: Dict[str, int] = {}
        sent: set = set()

        def gen():
            yield encode_flight_data(
                ipc.encode_schema_message(schema, dict_ids), b"",
                descriptor=desc)
            for b in batches:
                for meta, body in ipc.encode_batch_messages(b, dict_ids, sent):
                    yield encode_flight_data(meta, body)

        decoder = ipc.MessageDecoder()
        out = []
        for raw in self._exchange_rpc(gen()):
            fd = decode_flight_data(raw)
            if not fd["data_header"]:
                continue
            b = decoder.decode(fd["data_header"], fd["data_body"])
            if b is not None:
                out.append(b)
        return out

    def close(self):
        self._channel.close()
