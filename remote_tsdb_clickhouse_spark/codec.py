"""Snappy+protobuf request/response framing (SURVEY §2.1 S2-S4).

The reference's wire framing (``codec.go:28-78``): whole-body read, raw
(block-format) snappy decode, protobuf unmarshal; responses are marshal +
snappy encode.  Read request bodies are capped at 32 MiB *compressed*
(``codec.go:24`` — ``io.LimitReader`` caps what is read, i.e. the wire
bytes).

Snappy block format here is pyarrow's raw snappy codec — the same format as
Go's ``snappy.Encode`` (not the framed streaming format).  pyarrow's
decompressor needs the decompressed size up front; raw snappy carries it as
the leading uvarint, so we parse that ourselves (with a sanity cap).
"""

from __future__ import annotations

import pyarrow as pa

from remote_tsdb_clickhouse_spark import prompb

#: 32 MiB compressed-body cap for read requests (codec.go:24).
DECODE_READ_LIMIT = 32 * 1024 * 1024

#: Refuse absurd decompressed sizes (zip-bomb guard); the reference relies on
#: the compressed cap only, we add a 1 GiB decompressed ceiling.
MAX_DECOMPRESSED = 1 << 30

_snappy = pa.Codec("snappy")


class BodyTooLargeError(ValueError):
    pass


def _snappy_uncompressed_len(buf: bytes) -> int:
    """Raw snappy block format: leading uvarint = decompressed length."""
    result = 0
    shift = 0
    for i, b in enumerate(buf[:10]):
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result
        shift += 7
    raise ValueError("invalid snappy header")


def snappy_compress(data: bytes) -> bytes:
    return bytes(_snappy.compress(data))


def snappy_decompress(data: bytes) -> bytes:
    n = _snappy_uncompressed_len(data)
    if n > MAX_DECOMPRESSED:
        raise BodyTooLargeError(f"decompressed size {n} exceeds cap")
    return bytes(_snappy.decompress(data, decompressed_size=n))


def decode_write_request(body: bytes) -> prompb.WriteRequest:
    """S2: snappy -> protobuf ``WriteRequest`` (codec.go:28-45)."""
    return prompb.decode_write_request(snappy_decompress(body))


def decode_read_request(body: bytes) -> prompb.ReadRequest:
    """S3: snappy -> protobuf ``ReadRequest`` with the 32 MiB wire cap
    (codec.go:24,49-66)."""
    if len(body) > DECODE_READ_LIMIT:
        raise BodyTooLargeError(
            f"read request body {len(body)} exceeds {DECODE_READ_LIMIT} bytes"
        )
    return prompb.decode_read_request(snappy_decompress(body))


def encode_read_response(resp: prompb.ReadResponse) -> bytes:
    """S4: protobuf ``ReadResponse`` -> snappy (codec.go:69-78)."""
    return snappy_compress(prompb.encode_read_response(resp))


def encode_write_request(req: prompb.WriteRequest) -> bytes:
    """Client-side helper (tests / loadgen): WriteRequest -> wire bytes."""
    return snappy_compress(prompb.encode_write_request(req))


def encode_read_request(req: prompb.ReadRequest) -> bytes:
    """Client-side helper: ReadRequest -> wire bytes."""
    return snappy_compress(prompb.encode_read_request(req))
