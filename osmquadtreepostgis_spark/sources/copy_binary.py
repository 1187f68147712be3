"""PostgreSQL COPY BINARY emitter (F5/F7): the wire-format twin of the
reference's ``pack_hstoretags_binary`` / ``CsvRows(is_binary)`` path
(src/postgiswriter.cpp:225,246: the PGCOPY signature header + per-field
length-prefixed big-endian payloads; src/postgis_python.cpp:347).

Format (PostgreSQL docs, COPY BINARY):
* file header: 11-byte signature ``PGCOPY\\n\\xff\\r\\n\\0``,
  int32 flags (0), int32 header-extension length (0);
* per tuple: int16 field count, then per field int32 byte length
  (-1 for NULL) + payload;
* payloads: int8 -> 8-byte big-endian two's complement, float8 ->
  big-endian IEEE754, text -> utf-8 bytes, bytea -> raw bytes,
  hstore (send format) -> int32 pair count then per pair
  length-prefixed key and value (value length -1 for NULL);
* trailer: int16 -1.

Spark shape: one ``mapInPandas`` pass emits ONE complete PGCOPY stream
per input partition (block column) — each block is a self-contained
``COPY ... FROM ... WITH (FORMAT binary)`` batch, mirroring the
reference's per-block CsvRows batches. All packing is numpy/struct
over Arrow batches; no per-row Python beyond the mandatory byte
assembly loop inside the batch (the same loop the C++ writer runs).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["copy_binary_blocks", "parse_copy_binary", "PGCOPY_SIGNATURE"]

PGCOPY_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"
_HEADER = PGCOPY_SIGNATURE + struct.pack("!ii", 0, 0)
_TRAILER = struct.pack("!h", -1)


def _pack_value(v, kind: str) -> bytes | None:
    # Only a true SQL NULL maps to length -1. Float NaN is a VALID
    # PostgreSQL float8 value and is emitted as its IEEE754 bytes —
    # the emitter runs over Arrow batches (null bitmap intact), so
    # NULL and NaN are distinguishable here (ADVICE r2 #5).
    if v is None:
        return None
    if kind == "long":
        return struct.pack("!q", int(v))
    if kind == "integer":
        return struct.pack("!i", int(v))
    if kind == "double":
        return struct.pack("!d", float(v))
    if kind == "string":
        return str(v).encode("utf-8")
    if kind == "binary":
        return bytes(v)
    if kind == "map":  # hstore send format
        # Arrow map arrays arrive as list-of-(key, value) pairs
        items = sorted(v.items() if isinstance(v, dict) else v)
        out = [struct.pack("!i", len(items))]
        for k, val in items:
            kb = str(k).encode("utf-8")
            out.append(struct.pack("!i", len(kb)))
            out.append(kb)
            if val is None:
                out.append(struct.pack("!i", -1))
            else:
                vb = str(val).encode("utf-8")
                out.append(struct.pack("!i", len(vb)))
                out.append(vb)
        return b"".join(out)
    raise ValueError(f"unsupported COPY BINARY type: {kind}")


def copy_binary_blocks(df: DataFrame) -> DataFrame:
    """df -> one row per partition: (n_rows long, block binary), each
    block a complete PGCOPY stream for that partition's rows.

    Runs over ``mapInArrow`` (not pandas): the Arrow null bitmap keeps
    SQL NULL distinct from float NaN, so NaN round-trips as a real
    float8 value instead of silently collapsing to NULL the way a
    pandas float column would force (ADVICE r2 #5)."""
    import pyarrow as pa

    kinds = [f.dataType.typeName() for f in df.schema.fields]
    ncols = len(kinds)
    out_pa = pa.schema([("n_rows", pa.int64()), ("block", pa.binary())])

    def pack(batches):
        parts = [_HEADER]
        n = 0
        for batch in batches:
            cols = [batch.column(i).to_pylist() for i in range(ncols)]
            for row in zip(*cols):
                parts.append(struct.pack("!h", ncols))
                for v, kind in zip(row, kinds):
                    payload = _pack_value(v, kind)
                    if payload is None:
                        parts.append(struct.pack("!i", -1))
                    else:
                        parts.append(struct.pack("!i", len(payload)))
                        parts.append(payload)
                n += 1
        parts.append(_TRAILER)
        yield pa.RecordBatch.from_pydict(
            {"n_rows": [n], "block": [b"".join(parts)]}, schema=out_pa
        )

    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("block", T.BinaryType(), False),
        ]
    )
    return df.mapInArrow(pack, schema)


def parse_copy_binary(block: bytes, kinds: list[str]) -> list[tuple]:
    """Decode a PGCOPY stream (the pytest round-trip check — what
    ``COPY FROM (FORMAT binary)`` would parse)."""
    assert block[: len(PGCOPY_SIGNATURE)] == PGCOPY_SIGNATURE, "bad signature"
    pos = len(PGCOPY_SIGNATURE)
    flags, extlen = struct.unpack_from("!ii", block, pos)
    pos += 8 + extlen
    rows = []
    while True:
        (nf,) = struct.unpack_from("!h", block, pos)
        pos += 2
        if nf == -1:
            break
        vals = []
        for kind in kinds[:nf]:
            (ln,) = struct.unpack_from("!i", block, pos)
            pos += 4
            if ln == -1:
                vals.append(None)
                continue
            payload = block[pos : pos + ln]
            pos += ln
            if kind == "long":
                vals.append(struct.unpack("!q", payload)[0])
            elif kind == "integer":
                vals.append(struct.unpack("!i", payload)[0])
            elif kind == "double":
                vals.append(struct.unpack("!d", payload)[0])
            elif kind == "string":
                vals.append(payload.decode("utf-8"))
            elif kind == "binary":
                vals.append(payload)
            elif kind == "map":
                (cnt,) = struct.unpack_from("!i", payload, 0)
                p, m = 4, {}
                for _ in range(cnt):
                    (kl,) = struct.unpack_from("!i", payload, p)
                    p += 4
                    k = payload[p : p + kl].decode("utf-8")
                    p += kl
                    (vl,) = struct.unpack_from("!i", payload, p)
                    p += 4
                    if vl == -1:
                        m[k] = None
                    else:
                        m[k] = payload[p : p + vl].decode("utf-8")
                        p += vl
                vals.append(m)
            else:
                raise ValueError(kind)
        rows.append(tuple(vals))
    return rows
